package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions entry point makes the expression library reachable from
  * pure SQL. Extensions bind at session build time, and getOrCreate
  * reuses any existing default session — so this spec swaps the default
  * out and back rather than stopping the suite-shared context. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("graft_* functions usable from SQL via SparkSessionExtensions") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val row = spark.sql(
        """SELECT graft_poly_hash('abc') AS h,
          |  graft_minhash(graft_shingle_hashes('a b c d e')) AS sig,
          |  graft_simhash(array(1L, 2L, 3L)) AS sh,
          |  graft_jaccard(array('a','b'), array('b','c')) AS j,
          |  graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
          |  graft_word_shingles('a b c d') AS ws,
          |  graft_l2norm(array(3.0F, 4.0F)) AS n,
          |  graft_quantize8(array(3.0F, 4.0F)) AS q
          |""".stripMargin).head()
      var acc = 0L
      "abc".foreach(ch => acc = (acc * 31 + ch) % 1000000007L)
      assert(row.getLong(0) === acc)
      assert(row.getSeq[Long](1).length === 16)
      assert(row.getDouble(3) === 1.0 / 3.0)
      assert(row.getDouble(4) === 1.0)
      assert(row.getSeq[String](5) === Seq("a b c", "b c d"))
      assert(row.getDouble(6) === 5.0)
      assert(row.getSeq[Int](7) === Seq(76, 101)) // floor(3/5*127), floor(4/5*127)
      // Unsuffixed percentage literals parse as DECIMAL(1,1) — must be
      // converted numerically, not cast-crashed (ADVICE r2).
      val pct = spark.sql(
        """SELECT graft_percentiles(v, 0.5, 0.25) AS p
          |FROM VALUES (1.0D), (2.0D), (3.0D), (4.0D) AS t(v)""".stripMargin)
        .head().getSeq[Double](0)
      assert(pct === Seq(2.5, 1.75))
      // Integer input column: implicitly cast to double by the analyzer.
      val intPct = spark.sql(
        """SELECT graft_percentiles(v, 0.5) AS p
          |FROM VALUES (1), (2), (3) AS t(v)""".stripMargin)
        .head().getSeq[Double](0)
      assert(intPct === Seq(2.0))
      // Sketch aggregates + the bloom probe compose in pure SQL: build a
      // filter in a scalar subquery, probe it, and run heavy hitters.
      val bl = spark.sql(
        """WITH keys AS (SELECT CAST(v AS BIGINT) AS k
          |  FROM VALUES (1), (2), (3) AS t(v)),
          |b AS (SELECT graft_bloom_build(k, 16384, 7) AS bloom FROM keys)
          |SELECT graft_bloom_contains(b.bloom, CAST(p.v AS BIGINT), 7) AS hit
          |FROM VALUES (1), (2), (3), (999), (1000) AS p(v), b
          |ORDER BY p.v""".stripMargin).collect().map(_.getBoolean(0))
      assert(bl.take(3).forall(identity), "bloom missed a member")
      assert(!bl.drop(3).exists(identity), "16k-bit filter FP'd on 2 probes")
      val hh = spark.sql(
        """SELECT graft_frequent_items(v, 2) AS f
          |FROM VALUES ('a'), ('a'), ('a'), ('b'), ('c') AS t(v)""".stripMargin)
        .head().getSeq[org.apache.spark.sql.Row](0)
      assert(hh.map(_.getString(0)).contains("a"))
      // Narrower integral key columns implicit-cast to LONG at analysis
      // (no runtime ClassCastException from an INT column).
      val intKey = spark.sql(
        """SELECT graft_bloom_build(v, 16384, 7) AS b
          |FROM VALUES (1), (2) AS t(v)""".stripMargin)
        .head().getAs[Array[Byte]](0)
      assert(intKey.exists(_ != 0))
      // A zero-length filter is the empty set, not a crash.
      assert(!spark.sql(
        "SELECT graft_bloom_contains(CAST('' AS BINARY), CAST(1 AS BIGINT), 7)")
        .head().getBoolean(0))
      // Sizing args must be literals — a column there is a loud error.
      val sizeErr = intercept[Exception] {
        spark.sql(
          """SELECT graft_bloom_build(CAST(v AS BIGINT), v, 7)
            |FROM VALUES (1) AS t(v)""".stripMargin).collect()
      }
      assert(sizeErr.getMessage.contains("literal"))
      // Non-numeric input fails at analysis, not with a runtime CCE.
      val err = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(
          """SELECT graft_percentiles(v, 0.5)
            |FROM VALUES (array(1)), (array(2)) AS t(v)""".stripMargin)
          .collect()
      }
      assert(err.getMessage.toLowerCase.contains("type"))
    } finally {
      // restore the suite-shared session; never stop the shared context
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
