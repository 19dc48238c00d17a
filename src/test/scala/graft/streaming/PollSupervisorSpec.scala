package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.lake.Mooncake

/** Fault injection for the supervised poll loop: a transient remote
  * failure must recover WITHOUT caller intervention (the reference's
  * bgworker restart-every-15 s policy), resuming from the persisted
  * spool frontier — no lost rows, no double-spool — while a permanent
  * failure surfaces loudly once the consecutive-failure budget is
  * spent. Runs in virtual time via the injected sleeper. */
class PollSupervisorSpec extends SparkSuite {
  import spark.implicits._

  test("transient remote failure: supervisor restarts, resumes from frontier") {
    val remoteDir = tmpDir("sup-remote")
    val spool = tmpDir("sup-spool")
    val ckpt = tmpDir("sup-ckpt")
    Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("k", "v", "ver")
      .write.mode("append").parquet(remoteDir)

    // remote that throws on specific poll attempts (flaky network)
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val failOn = Set(2, 3) // second and third polls die mid-read
    val remote = (s: org.apache.spark.sql.SparkSession) => {
      val n = attempts.incrementAndGet()
      if (failOn(n)) throw new RuntimeException(s"connection reset #$n")
      s.read.parquet(remoteDir)
    }
    val tailer = new RemoteCdcTailer(remote, "ver", spool)

    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val sup = new PollSupervisor(pollIntervalMs = 1L,
      restartDelayMs = 15000L, sleep = sleeps += _)

    // poll 1 spools the backfill; polls 2-3 fail; poll 4 sees a grown
    // remote and spools ONLY past the frontier — rows arrive while the
    // source is down and are picked up on recovery
    var grown = false
    val total = sup.run(
      poll = () => {
        val n = tailer.pollOnce(spark)
        if (!grown) {
          Seq((3L, "c", 3L)).toDF("k", "v", "ver")
            .write.mode("append").parquet(remoteDir)
          grown = true
        }
        n
      },
      until = () => sup.pollCount >= 2)
    assert(total === 3L, "backfill (2) + growth (1), each spooled once")
    assert(sup.failureCount === 2L, "both transient failures caught")
    // the restart policy actually waited between crashed polls
    assert(sleeps.count(_ == 15000L) === 2,
      s"expected two restart delays, saw sleeps: $sleeps")
    assert(tailer.frontier === Some(3L),
      "frontier advanced past the recovered rows")

    // end-to-end: the spool applies exactly-once into the mirror
    val lake = new Mooncake(tmpDir("sup-wh"))
    lake.createTable(spark, "rt",
      spark.read.parquet(remoteDir).filter(lit(false)), Seq("k"))
    CdcStream.attach(lake, "rt", tailer.changes(spark), ckpt)
      .awaitTermination()
    assert(lake.read(spark, "rt").orderBy("k").as[(Long, String, Long)]
      .collect().map(r => (r._1, r._2)).toSeq ===
      Seq(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("permanent failure surfaces after the consecutive-failure budget") {
    val sup = new PollSupervisor(pollIntervalMs = 1L, restartDelayMs = 1L,
      maxConsecutiveFailures = 3, sleep = _ => ())
    val boom = new RuntimeException("table dropped")
    val e = intercept[RuntimeException] {
      sup.run(poll = () => throw boom)
    }
    assert(e eq boom)
    assert(sup.failureCount === 3L)
  }

  test("a success resets the consecutive-failure counter") {
    var n = 0
    val sup = new PollSupervisor(pollIntervalMs = 1L, restartDelayMs = 1L,
      maxConsecutiveFailures = 2, sleep = _ => ())
    // fail, succeed, fail, succeed... never two in a row → never throws
    val total = sup.run(
      poll = () => { n += 1; if (n % 2 == 1) throw new RuntimeException("x") else 1L },
      until = () => sup.pollCount >= 5)
    assert(total === 5L && sup.failureCount === 5L)
  }

  test("stop() exits a background supervision thread cleanly") {
    val polled = new java.util.concurrent.atomic.AtomicLong(0L)
    val sup = new PollSupervisor(pollIntervalMs = 1L, sleep = _ => ())
    val t = sup.start("graft-follower") { () => polled.incrementAndGet() }
    // wait until it has demonstrably polled, then stop
    val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
    while (polled.get() < 3 && System.nanoTime() < deadline) Thread.`yield`()
    sup.stop()
    t.join(5000)
    assert(!t.isAlive && polled.get() >= 3)
  }
}
