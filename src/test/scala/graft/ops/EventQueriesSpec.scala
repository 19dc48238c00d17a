package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Checks the oracle can't express: sketch accuracy. */
class EventQueriesSpec extends SparkSuite {
  import spark.implicits._

  test("approx_count_distinct (HLL) within its rsd bound of exact") {
    // The query output IS the accuracy check now (the oracle compares
    // the boolean); assert it holds for every group, and that the
    // exact side is genuinely the distinct count.
    val sf = "/root/testdata/sf0.01"
    val rows = EventQueries.approxDistinct(spark, sf)
      .select("event_type", "exact_users", "approx_within_bound")
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._3),
      rows.filterNot(_._3).mkString("out of bound: ", ", ", ""))
    val exact = graft.Tables.load(spark, sf, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    rows.foreach { case (k, ex, _) => assert(exact(k) === ex) }
  }

  test("funnel: stage counts monotone and equal an independent recompute") {
    val sf = "/root/testdata/sf0.001"
    val (nv, nc, np, tot) = EventQueries.funnel(spark, sf)
      .as[(Long, Long, Long, Long)].head()
    assert(nv >= nc && nc >= np && np >= 0, s"monotone: $nv $nc $np")
    assert(tot >= 0L)
    // independent recompute from the raw events
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("t"))
      .as[(Long, String, Long)].collect()
    val byUser = ev.groupBy(_._1)
    def firstAfter(g: Array[(Long, String, Long)], tpe: String,
        after: Long): Option[Long] =
      g.filter(e => e._2 == tpe && e._3 > after).map(_._3).minOption
    var (v, c, p, lat) = (0L, 0L, 0L, 0L)
    byUser.values.foreach { g =>
      g.filter(_._2 == "view").map(_._3).minOption.foreach { t1 =>
        v += 1
        firstAfter(g, "click", t1).foreach { t2 =>
          c += 1
          firstAfter(g, "purchase", t2).foreach { t3 =>
            p += 1; lat += t3 - t1
          }
        }
      }
    }
    assert((nv, nc, np, tot) === ((v, c, p, lat)))
  }

  test("retention: offset-0 row equals the cohort size, offsets >= 0") {
    val sf = "/root/testdata/sf0.001"
    val rows = EventQueries.retention(spark, sf)
      .as[(java.sql.Date, Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall(_._2 >= 0))
    // day-0 cell per cohort = number of users whose first day is that day
    val cohorts = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy("user_id").agg(min(col("day")).as("c"))
      .groupBy("c").count()
      .as[(java.sql.Date, Long)].collect().toMap
    rows.filter(_._2 == 0L).foreach { case (d, _, n) =>
      assert(cohorts(d) === n, s"cohort $d day-0")
    }
    // every cohort has a day-0 row
    assert(rows.count(_._2 == 0L) === cohorts.size)
  }

  test("gapfill: dense minute spine, zeros filled, LOCF carries forward") {
    val sf = "/root/testdata/sf0.001"
    val rows = EventQueries.gapfill(spark, sf)
      .as[(java.sql.Timestamp, Long, Option[Long])].collect()
    assert(rows.nonEmpty)
    // spine is DENSE: consecutive minutes, span-many rows
    val ts = rows.map(_._1.getTime)
    assert(ts.zip(ts.tail).forall { case (a, b) => b - a == 60000L },
      "one row per minute, no gaps")
    assert(rows.length === ((ts.last - ts.head) / 60000L + 1))
    // gaps exist at this sf and carry n = 0
    assert(rows.exists(_._2 == 0L), "fixture has empty minutes")
    // LOCF: filled_cents only changes on minutes with observations,
    // and equals the last observed value otherwise
    var lastSeen: Option[Long] = None
    val purch = graft.Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("minute", col("ts")).as("m"))
      .agg(sum(expr("CAST(value AS DECIMAL(18,2)) * 100")).cast("bigint")
        .as("c"))
      .as[(java.sql.Timestamp, Long)].collect()
      .map { case (t, c) => t.getTime -> c }.toMap
    rows.foreach { case (t, n, filled) =>
      if (purch.contains(t.getTime)) {
        assert(n > 0L)
        lastSeen = Some(purch(t.getTime))
      }
      assert(filled === lastSeen, s"LOCF at $t")
    }
  }

  test("attribution: touch counts and revenue split match a recompute") {
    val sf = "/root/testdata/sf0.001"
    val out = EventQueries.attribution(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("t"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .as[(Long, String, Long, Long)].collect()
    val byUser = ev.groupBy(_._1)
    out.foreach { case (u, np, na, st, ac, oc) =>
      val g = byUser(u)
      val purchases = g.filter(_._2 == "purchase")
      val clicks = g.filter(_._2 == "click").map(_._3)
      assert(np === purchases.length, s"user $u purchase count")
      val touched = purchases.map { p =>
        val n = clicks.count(ct => ct <= p._3 && ct > p._3 - 1800000000L)
        (n, p._4)
      }
      assert(na === touched.count(_._1 > 0), s"user $u attributed")
      assert(st === touched.map(_._1.toLong).sum, s"user $u touches")
      assert(ac === touched.filter(_._1 > 0).map(_._2).sum, s"user $u attr rev")
      assert(oc === touched.filter(_._1 == 0).map(_._2).sum, s"user $u organic")
    }
    // every purchasing user appears — purchases with zero touches survive
    val purchasers = ev.filter(_._2 == "purchase").map(_._1).distinct.sorted
    assert(out.map(_._1).sorted.toSeq === purchasers.toSeq)
  }

  test("anomaly: flagged set equals a direct median/MAD recompute") {
    val sf = "/root/testdata/sf0.001"
    val out = EventQueries.anomaly(spark, sf)
      .as[(java.sql.Timestamp, Long, Long, Long, Long)].collect()
    val counts = graft.Tables.load(spark, sf, "events")
      .groupBy(date_trunc("minute", col("ts")).as("m"))
      .agg(count(lit(1)).as("n"))
      .as[(java.sql.Timestamp, Long)].collect()
    // doubled exact median of a sorted integer sequence
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      if (s.length % 2 == 1) 2 * s(s.length / 2)
      else s(s.length / 2 - 1) + s(s.length / 2)
    }
    val m2 = med2(counts.map(_._2).toSeq)
    val dev2 = counts.map { case (t, n) => (t, n, math.abs(2 * n - m2)) }
    val mad4 = med2(dev2.map(_._3).toSeq)
    val want = dev2.filter(d => 2 * d._3 > 3 * mad4)
      .sortBy(_._1.getTime)
    assert(out.map(r => (r._1, r._2)).toSeq ===
      want.map(d => (d._1, d._2)).toSeq, "flagged minutes")
    out.foreach { case (_, n, o2, od, o4) =>
      assert(o2 === m2); assert(o4 === mad4)
      assert(od === math.abs(2 * n - m2))
    }
    assert(out.nonEmpty, "fixture has spikes")
  }
}
