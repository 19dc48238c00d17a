package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with custom keyed state — the
  * flatMapGroupsWithState spelling of [[graft.ops.EventQueries.sessionize]]
  * (which computes the same sessions in batch with one window pass).
  *
  * State per user is just the open session (4 numbers); closed sessions
  * are emitted as soon as a later event proves the gap, and the last open
  * session is flushed by event-time timeout when the watermark passes its
  * end + gap. That bounds state size by the number of concurrently active
  * users, not the event history — the property that matters when the
  * stream is 100 TB/day.
  *
  * The reference has no event-time sessionization (WAL order is total,
  * SURVEY.md §2.8 "late/out-of-order: none") — this is the extension
  * surface Structured Streaming adds.
  */
object SessionStream extends Serializable {

  case class Event(user_id: Long, ts: Timestamp, value: Double)

  /** Open-session accumulator (epoch micros). */
  case class OpenSession(startUs: Long, endUs: Long, n: Long, value: Double)

  case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      session_value: Double)

  private def us(t: Timestamp): Long = t.getTime * 1000L
  private def ts(u: Long): Timestamp = new Timestamp(u / 1000L)

  /** Sessionize a (watermarked) streaming Dataset[Event]. `events` MUST
    * carry a watermark on `ts` — event-time timeout needs it to flush the
    * final session per user. */
  def sessionize(events: Dataset[Event],
      gapSeconds: Long): Dataset[Session] = {
    val gapUs = gapSeconds * 1000000L
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[Session]

    def close(userId: Long, s: OpenSession): Session =
      Session(userId, ts(s.startUs), ts(s.endUs), s.n, s.value)

    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // Watermark passed end + gap: the open session can never
            // extend — flush it.
            val out = state.getOption.map(close(userId, _)).iterator
            state.remove()
            out
          } else {
            // Events within a micro-batch arrive unordered; a session
            // operator must sort its in-batch slice (cheap: one user's
            // slice of one trigger), exactly like the batch window sort.
            // The carried open session joins the merge as an ordinary
            // interval, IN START ORDER: a late (above-watermark) event
            // that predates it must form or extend an EARLIER session,
            // not be absorbed into the open one — the naive
            // `t - end <= gap` guard is trivially true for any t in the
            // past and silently corrupted session starts.
            val sorted = batch.toSeq.sortBy(e => (us(e.ts), e.value))
              .map(e => OpenSession(us(e.ts), us(e.ts), 1L, e.value))
            val items = (state.getOption.toSeq ++ sorted).sortBy(_.startUs)
            val closed = Seq.newBuilder[Session]
            var open: Option[OpenSession] = None
            for (it <- items) {
              open match {
                case Some(s) if it.startUs - s.endUs <= gapUs =>
                  open = Some(OpenSession(s.startUs,
                    math.max(s.endUs, it.endUs),
                    s.n + it.n, s.value + it.value))
                case Some(s) =>
                  closed += close(userId, s)
                  open = Some(it)
                case None =>
                  open = Some(it)
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.endUs + gapUs) / 1000L)
            }
            closed.result().iterator
          }
      }
  }
}
