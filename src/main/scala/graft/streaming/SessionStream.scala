package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with custom keyed state — the
  * flatMapGroupsWithState spelling of [[graft.ops.EventQueries.sessionize]]
  * (which computes the same sessions in batch with one window pass).
  *
  * A session is emitted only once the WATERMARK proves it final
  * (end + gap < watermark): until then it stays in state as a pending
  * interval, because an out-of-order but above-watermark event in a
  * LATER micro-batch may still fall inside it and extend or merge it —
  * emitting on first gap evidence (the naive spelling) would split one
  * true session into several. Below-watermark stragglers are DROPPED,
  * matching Spark's aggregate semantics (flatMapGroupsWithState leaves
  * late-data policy to the operator); an undropped straggler could
  * otherwise resurrect an already-emitted session — and arm an
  * event-time timeout at or before the current watermark, which
  * GroupState rejects with an exception that would wedge the query on
  * every checkpoint replay (the timeout is also clamped past the
  * watermark for exactly that reason).
  *
  * State per user is the pending interval list: the open session plus
  * any gap-separated sessions not yet watermark-final — bounded by the
  * watermark delay divided by the gap, per active user, not by event
  * history. That is the property that matters when the stream is
  * 100 TB/day.
  *
  * The reference has no event-time sessionization (WAL order is total,
  * SURVEY.md §2.8 "late/out-of-order: none") — this is the extension
  * surface Structured Streaming adds.
  */
object SessionStream extends Serializable {

  case class Event(user_id: Long, ts: Timestamp, value: Double)

  /** Session accumulator (epoch micros). */
  case class OpenSession(startUs: Long, endUs: Long, n: Long, value: Double)

  /** Keyed state: pending (non-final) sessions, kept sorted by start. */
  case class Pending(sessions: Seq[OpenSession])

  case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      session_value: Double)

  private def us(t: Timestamp): Long = t.getTime * 1000L
  private def ts(u: Long): Timestamp = new Timestamp(u / 1000L)

  /** Sessionize a (watermarked) streaming Dataset[Event]. `events` MUST
    * carry a watermark on `ts` — finality and the state flush both ride
    * the event-time timeout. */
  def sessionize(events: Dataset[Event],
      gapSeconds: Long): Dataset[Session] = {
    val gapUs = gapSeconds * 1000000L
    implicit val stateEnc = Encoders.product[Pending]
    implicit val outEnc = Encoders.product[Session]

    def close(userId: Long, s: OpenSession): Session =
      Session(userId, ts(s.startUs), ts(s.endUs), s.n, s.value)

    /** Gap-merge intervals in start order (sums are commutative, so the
      * within-session fold order cannot affect the result). */
    def mergeAll(items: Seq[OpenSession]): Seq[OpenSession] =
      items.sortBy(s => (s.startUs, s.endUs))
        .foldLeft(Vector.empty[OpenSession]) { (acc, it) =>
          acc.lastOption match {
            case Some(s) if it.startUs - s.endUs <= gapUs =>
              acc.init :+ OpenSession(s.startUs,
                math.max(s.endUs, it.endUs), s.n + it.n, s.value + it.value)
            case _ => acc :+ it
          }
        }

    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[Pending, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event],
         state: GroupState[Pending]) =>
          val wmMs = state.getCurrentWatermarkMs()
          val wmUs = wmMs * 1000L

          /** Emit watermark-final sessions, keep the rest in state with
            * a re-armed timeout at the earliest possible finality. */
          def emitFinal(sessions: Seq[OpenSession]): Iterator[Session] = {
            val (fin, keep) = sessions.partition(_.endUs + gapUs < wmUs)
            if (keep.isEmpty) {
              if (state.exists) state.remove()
            } else {
              state.update(Pending(keep))
              // clamp past the watermark: arming at or before it throws
              // and wedges the query on replay
              state.setTimeoutTimestamp(math.max(
                (keep.map(_.endUs).min + gapUs) / 1000L, wmMs + 1))
            }
            fin.sortBy(_.startUs).map(close(userId, _)).iterator
          }

          val pending = state.getOption.map(_.sessions).getOrElse(Nil)
          if (state.hasTimedOut) emitFinal(pending)
          else {
            // drop below-watermark stragglers (see header)
            val evs = batch.filter(e => us(e.ts) >= wmUs).toSeq
              .map(e => OpenSession(us(e.ts), us(e.ts), 1L, e.value))
            emitFinal(mergeAll(pending ++ evs))
          }
      }
  }
}
