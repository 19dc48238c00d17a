package graft.streaming

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import scala.util.control.NonFatal

/** Supervised poll driver — the Spark-side analogue of the reference's
  * background-worker restart policy
  * (`/root/reference/src/bgworker.rs:13-14`: the moonlink ingestion
  * service is relaunched 15 s after any crash, forever). The follower
  * family ([[RemoteCdcTailer]], [[DeltaFollower]], [[IcebergFollower]])
  * is crash-safe by construction — batch-then-frontier ordering makes a
  * failed poll re-read the same delta, and keyed application converges
  * on replays — so resilience is purely a DRIVER-LOOP concern: catch
  * the failure, wait the restart delay, poll again, and never surface a
  * transient source error to the caller.
  *
  * Unlike the reference's unconditional forever-restart, a positive
  * `maxConsecutiveFailures` turns a PERMANENT failure (dropped table,
  * revoked credentials) into a loud error instead of an infinite silent
  * retry — set 0 for the reference's exact semantics. The sleeper is
  * injectable so the fault-injection spec runs in virtual time.
  */
final class PollSupervisor(
    pollIntervalMs: Long = 1000L,
    restartDelayMs: Long = 15000L,
    maxConsecutiveFailures: Int = 0,
    sleep: Long => Unit = Thread.sleep(_),
    onFailure: (Throwable, Int) => Unit = (_, _) => ()) {

  @volatile private var stopped = false
  private val consecutive = new AtomicInteger(0)
  private val spooled = new AtomicLong(0L)
  private val polls = new AtomicLong(0L)
  private val failures = new AtomicLong(0L)

  /** Ask a running loop (foreground [[run]] or background [[start]])
    * to exit after its current poll. */
  def stop(): Unit = stopped = true

  /** Rows spooled across all successful polls so far. */
  def totalRows: Long = spooled.get()

  /** Successful polls / caught failures so far. */
  def pollCount: Long = polls.get()
  def failureCount: Long = failures.get()

  /** Drive `poll` until `until()` holds or [[stop]] is called,
    * restarting through failures per the policy. Returns total rows
    * spooled. Throws only when `maxConsecutiveFailures > 0` is
    * exhausted. */
  def run(poll: () => Long, until: () => Boolean = () => false): Long = {
    while (!stopped && !until()) {
      try {
        val n = poll()
        polls.incrementAndGet()
        consecutive.set(0)
        spooled.addAndGet(n)
        if (!stopped && !until()) sleep(pollIntervalMs)
      } catch {
        case NonFatal(e) =>
          failures.incrementAndGet()
          val k = consecutive.incrementAndGet()
          onFailure(e, k)
          if (maxConsecutiveFailures > 0 && k >= maxConsecutiveFailures)
            throw e
          if (!stopped) sleep(restartDelayMs)
      }
    }
    spooled.get()
  }

  /** Detached supervision on a daemon thread — the bgworker shape.
    * Stop with [[stop]]; join the returned thread for a clean exit. */
  def start(name: String)(poll: () => Long): Thread = {
    val t = new Thread(() => { run(poll); () }, name)
    t.setDaemon(true)
    t.start()
    t
  }
}
