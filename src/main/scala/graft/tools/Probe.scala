package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFunctions => TF}
import graft.functions.expressions.{HashExpressions => HE}

/** Ad-hoc perf probe (dev tool, not part of the library surface):
  * times labelled sub-pipelines of the slow bench queries so
  * optimization targets measurements, not guesses.
  *
  * Usage: sbt "runMain graft.tools.Probe /root/testdata/sf0.1 [probe...]"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.cacheInputs", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach(n => Tables.load(spark, dir, n).count())

    def time(label: String)(f: => Any): Unit =
      if (only.isEmpty || only.exists(label.startsWith)) {
        val t0 = System.nanoTime()
        val r = f
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PROBE $label%-40s $sec%8.3f s  ($r)")
      }

    def noop(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); -1L
    }

    val docs = Tables.load(spark, dir, "documents")

    // --- simhash decomposition -------------------------------------------
    val sh = docs.select(col("doc_id"),
      HE.simhash(HE.poly_hash_array(TF.tokens(col("text")))).as("sh"))
    time("simhash.signatures")(noop(sh))
    time("simhash.distinct_sh")(sh.select("sh").distinct().count())
    time("simhash.distinct_hi")(
      sh.select(shiftright(col("sh"), 16).as("hi")).distinct().count())
    time("simhash.bucket_top")(
      sh.groupBy(shiftright(col("sh"), 16).as("hi")).count()
        .orderBy(desc("count")).limit(3).collect().mkString(","))

    val groups = sh.groupBy("sh")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .withColumn("hi", shiftright(col("sh"), 16))
      .withColumn("lo", col("sh") % 65536)
    time("simhash.groups")(groups.count())
    def halfJoin(key: String) = {
      val a = groups.as("a"); val b = groups.as("b")
      a.join(b, col(s"a.$key") === col(s"b.$key") && col("a.sh") < col("b.sh"))
        .select(col("a.sh").as("sha"), col("b.sh").as("shb"),
          col("a.ids").as("ida"), col("b.ids").as("idb"),
          bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("bigint")
            .as("hamming"))
        .filter(col("hamming") <= 6)
    }
    time("simhash.sig_pairs")(
      halfJoin("hi").unionAll(halfJoin("lo")).dropDuplicates("sha", "shb").count())
    val crossSig = halfJoin("hi").unionAll(halfJoin("lo"))
      .dropDuplicates("sha", "shb")
      .select(explode(col("ida")).as("da"), col("idb"), col("hamming"))
      .select(col("da"), explode(col("idb")).as("db"), col("hamming"))
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"), col("hamming"))
    time("simhash.cross_rows")(crossSig.count())
    val withinSig = groups.filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("doc_a"), col("ids"))
      .select(col("doc_a"), explode(col("ids")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", lit(0L))
    time("simhash.within_rows")(withinSig.count())
    time("simhash.total_nosort")(noop(crossSig.unionAll(withinSig)))
    time("simhash.total_sorted")(
      noop(crossSig.unionAll(withinSig).orderBy("doc_a", "doc_b")))

    // --- filter_like decomposition ---------------------------------------
    val part = Tables.load(spark, dir, "part")
    time("like.count_only")(part.filter(col("p_name").like("%ol%") ||
      col("p_type").ilike("standard%") ||
      col("p_brand").rlike("^Brand#[12]")).count())
    time("like.full_query")(noop(part.filter(col("p_name").like("%ol%") ||
      col("p_type").ilike("standard%") ||
      col("p_brand").rlike("^Brand#[12]"))
      .select("p_partkey", "p_name", "p_type", "p_brand")
      .orderBy("p_partkey")))

    // --- percentile variants ---------------------------------------------
    val li = Tables.load(spark, dir, "lineitem")
    time("pct.three_aggs")(noop(li.groupBy("l_returnflag").agg(
      expr("percentile(l_quantity, 0.5)").as("median_qty"),
      expr("percentile(l_extendedprice, 0.25)").as("p25_price"),
      expr("percentile(l_extendedprice, 0.75)").as("p75_price"))))
    time("pct.two_aggs_array")(noop(li.groupBy("l_returnflag").agg(
      expr("percentile(l_quantity, 0.5)").as("median_qty"),
      expr("percentile(l_extendedprice, array(0.25, 0.75))").as("ps"))))

    // --- window_rank / join_star / sessionize raw ------------------------
    time("misc.window_rank_scan")(li.count())

    // --- lateral join support check ---------------------------------------
    time("lateral.basic")(
      try {
        Tables.load(spark, dir, "customer").createOrReplaceTempView("c_v")
        Tables.load(spark, dir, "orders").createOrReplaceTempView("o_v")
        spark.sql(
          """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
            |FROM c_v c JOIN LATERAL (
            |  SELECT o_orderkey, o_totalprice FROM o_v
            |  WHERE o_custkey = c.c_custkey
            |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
            |WHERE c.c_custkey <= 20""".stripMargin).count()
      } catch { case e: Throwable => s"UNSUPPORTED: ${e.getMessage.take(160)}" })

    // --- recursive CTE support check --------------------------------------
    time("rcte.basic")(
      try spark.sql(
        """WITH RECURSIVE t(n) AS (
          |  SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 10)
          |SELECT sum(n) FROM t""".stripMargin).collect().mkString
      catch { case e: Throwable => s"UNSUPPORTED: ${e.getMessage.take(120)}" })

    // --- embedding cosine distribution -----------------------------------
    {
      import graft.functions.expressions.{SetVectorExpressions => SVE}
      val e = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val a = e.as("a"); val b = e.as("b")
      val pairs = a.join(b, col("a.vec_id") < col("b.vec_id"))
        .select(SVE.cosine_sim(col("a.embedding"), col("b.embedding")).as("cos"))
      time("embed.cos_hist")(pairs
        .groupBy(floor(col("cos") * 20).as("bucket")).count()
        .orderBy(desc("bucket")).limit(8).collect().mkString(" "))
    }

    // --- cdc_apply phases -------------------------------------------------
    {
      import graft.lake.Mooncake
      val lake = new Mooncake(
        java.nio.file.Files.createTempDirectory("graft-probe-cdc").toString)
      val o = Tables.load(spark, dir, "orders")
      time("cdc.create_table")(
        lake.createTable(spark, "om", o, Seq("o_orderkey")).files.size)
      val deletes = o.filter(col("o_orderkey") % 100 === 0)
        .withColumn("__op", lit("D"))
      val updates = o.filter(col("o_orderkey") % 97 === 0 &&
          col("o_orderkey") % 100 =!= 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1)
        .withColumn("__op", lit("U"))
      val changes = deletes.unionByName(updates)
      time("cdc.changes_count")(changes.count())
      time("cdc.apply")(
        lake.applyChanges(spark, "om", changes, version = 2).files.size)
      time("cdc.read_noop")(noop(
        lake.read(spark, "om", atLeastVersion = Some(2))
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")))
    }
    // --- dedup_clusters phases --------------------------------------------
    {
      import graft.ops.{ConnectedComponents, PipelineQueries}
      import org.apache.spark.sql.expressions.Window
      val pairs = PipelineQueries.minhashPairs(spark, dir)
      time("cc.pairs")(pairs.count())
      val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      var labels: DataFrame = null
      time("cc.label_loop")({ labels = ConnectedComponents.label(edges); -1L })
      time("cc.final_window")(noop(labels
        .select(col("id").as("doc_id"), col("comp").as("rep"),
          count(lit(1)).over(Window.partitionBy("comp")).as("csize"))
        .orderBy("doc_id")))
    }
    // --- TPC-H q1 decimal-agg decomposition ---------------------------------
    {
      val li = Tables.load(spark, dir, "lineitem")
      for (i <- 0 until 3) {
        time(s"tpch.count/$i")(li.count())
        time(s"tpch.sum_long/$i")(noop(li.groupBy("l_returnflag", "l_linestatus")
          .agg(sum((col("l_quantity") * 100).cast("long")).as("s"))))
        time(s"tpch.sum_dec/$i")(noop(li.groupBy("l_returnflag", "l_linestatus")
          .agg(sum(col("l_quantity")).as("s"))))
        time(s"tpch.q1_full/$i")(noop(
          graft.ops.RelationalQueries.q1Agg(spark, dir)))
      }
    }
    // --- embed_communities phases -----------------------------------------
    {
      import graft.ops.{ConnectedComponents, PipelineQueries}
      val mutual = PipelineQueries.embedKnnGraph(spark, dir)
        .filter(col("mutual")).select(col("src"), col("dst"))
      time("comm.knn_mutual")(mutual.count())
      val frozen = mutual.localCheckpoint(true)
      var labels: DataFrame = null
      time("comm.cc_loop")({
        labels = ConnectedComponents.label(frozen); -1L })
      time("comm.full_query")(noop(
        PipelineQueries.embedCommunities(spark, dir)))
    }
    // --- quantile_sketch legs ---------------------------------------------
    {
      import org.apache.spark.sql.expressions.Window
      val v = Tables.load(spark, dir, "lineitem")
        .select(col("l_returnflag").as("g"),
          (col("l_extendedprice") * 100).cast("bigint").as("x"))
      val wc = Window.partitionBy("g").orderBy("x")
      val wn = Window.partitionBy("g")
      for (i <- 0 until 3) {
        time(s"qs.scan/$i")(noop(v))
        time(s"qs.sketch_leg/$i")(noop(v.groupBy("g")
          .agg(percentile_approx(col("x"),
            array(lit(0.5), lit(0.9), lit(0.99)), lit(1000)))))
        time(s"qs.sketch_acc200/$i")(noop(v.groupBy("g")
          .agg(percentile_approx(col("x"),
            array(lit(0.5), lit(0.9), lit(0.99)), lit(200)))))
        time(s"qs.counts/$i")(noop(v.groupBy("g", "x").agg(count(lit(1)).as("cnt"))))
        time(s"qs.windows/$i")(noop(v.groupBy("g", "x").agg(count(lit(1)).as("cnt"))
          .select(col("g"), col("x"), col("cnt"),
            sum("cnt").over(wc).as("cum"), sum("cnt").over(wn).as("ntot"))))
        time(s"qs.bkt_leg/$i")(noop(v
          .groupBy(col("g"), expr("x DIV 65536").as("bkt"))
          .agg(count(lit(1)).as("bc"))))
        time(s"qs.full/$i")(noop(graft.ops.RelationalQueries
          .quantileSketch(spark, dir)))
      }
    }
    // --- exact-distinct class decomposition (min-of-3: this box
    // drifts; single shots mislead) -----------------------------------------
    {
      import graft.functions.expressions.{AggExpressions => AE}
      val hits = graft.ops.HitsQueries.hits(spark, dir)
      for (i <- 0 until 3) {
        time(s"hits.scan/$i")(noop(hits.select("dom", "user_id")))
        time(s"hits.group_count/$i")(noop(
          hits.groupBy("dom").agg(count(lit(1)).as("n"))))
        time(s"hits.hll_spark/$i")(noop(hits.groupBy("dom")
          .agg(approx_count_distinct(col("user_id"), 0.02).as("a"))))
        time(s"hits.hll_graft/$i")(noop(hits.groupBy("dom")
          .agg(AE.hll_distinct_long(col("user_id")).as("a"))))
        time(s"hits.exact_only/$i")(noop(hits.groupBy("dom")
          .agg(AE.exact_distinct_long(col("user_id")).as("users"))))
        time(s"hits.uniques_agg/$i")(noop(hits.groupBy("dom")
          .agg(AE.exact_distinct_long(col("user_id")).as("users"),
            count(lit(1)).as("n"),
            AE.hll_distinct_long(col("user_id")).as("a"))))
        time(s"hits.width_exact_only/$i")(noop(hits.groupBy("width")
          .agg(AE.exact_distinct_long(col("user_id")).as("users"))))
        time(s"hits.uniques_q/$i")(noop(
          graft.ops.HitsQueries.uniques(spark, dir)))
        time(s"hits.width_q/$i")(noop(
          graft.ops.HitsQueries.widthHist(spark, dir)))
        time(s"hits.hourly_q/$i")(noop(
          graft.ops.HitsQueries.hourly(spark, dir)))
        time(s"hits.hourly_count/$i")(noop(hits
          .groupBy(date_trunc("hour", col("ts")).as("hour"))
          .agg(count(lit(1)).as("n"))))
        time(s"hits.hourly_nodt/$i")(noop(hits
          .groupBy(col("is_mobile")).agg(count(lit(1)).as("n"),
            sum(col("duration_ms")).as("total_ms"))))
        time(s"hits.topurls_q/$i")(noop(
          graft.ops.HitsQueries.topUrls(spark, dir)))
        time(s"hits.topurls_agg/$i")(noop(hits
          .groupBy("dom", "page").agg(count(lit(1)).as("n"))))
      }
    }

    // --- q3 variants: join order + runtime bloom -------------------------
    if (only.isEmpty || only.exists(_.startsWith("q3"))) {
      import graft.functions.expressions.{AggExpressions => AE}
      val cutoff = lit("1998-06-15").cast("timestamp")
      def c = Tables.load(spark, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      def o = Tables.load(spark, dir, "orders")
        .filter(col("o_orderdate") < cutoff)
      def li = Tables.load(spark, dir, "lineitem")
        .filter(col("l_shipdate") > cutoff)
      def revL = (col("l_extendedprice") * 100 + lit(0.5)).cast("long") *
        (lit(100L) - (col("l_discount") * 100 + lit(0.5)).cast("long"))
      def finish(j: DataFrame): DataFrame = j
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(AE.unscaled_sum_long(revL, 4).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
      for (i <- 1 to 2) {
        time(s"q3.current/$i")(noop(
          graft.ops.RelationalQueries.q3Shipping(spark, dir)))
        time(s"q3.reorder/$i") {
          val oc = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          noop(finish(li.join(oc, li("l_orderkey") === oc("o_orderkey"))))
        }
        time(s"q3.reorder_bloom/$i") {
          import org.apache.spark.sql.graft.ColumnBridge
          import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
          import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
          val oc = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
            .localCheckpoint(true)
          val bloomAgg = ColumnBridge.column(new BloomFilterAggregate(
            ColumnBridge.expression(xxhash64(col("o_orderkey"))),
            Literal(4000000L), Literal(38400000L)).toAggregateExpression())
          val blob = oc.agg(bloomAgg).head().getAs[Array[Byte]](0)
          val liF = li.filter(ColumnBridge.column(new BloomFilterMightContain(
            Literal.create(blob,
              org.apache.spark.sql.types.BinaryType),
            ColumnBridge.expression(xxhash64(col("l_orderkey"))))))
          noop(finish(liF.join(oc, col("l_orderkey") === oc("o_orderkey"))))
        }
      }
    }

    // --- q18 variants: typed-imperative vs codegen sum for the semi agg --
    if (only.isEmpty || only.exists(_.startsWith("q18"))) {
      import graft.functions.expressions.{AggExpressions => AE}
      def li = Tables.load(spark, dir, "lineitem")
      def o = Tables.load(spark, dir, "orders")
      def c = Tables.load(spark, dir, "customer")
      def finish18(big: DataFrame, qty: org.apache.spark.sql.Column) = {
        o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(li, o("o_orderkey") === li("l_orderkey"))
          .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"))
          .agg(qty.as("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
      }
      for (i <- 1 to 2) {
        time(s"q18.current/$i")(noop(
          graft.ops.RelationalQueries.q18Volume(spark, dir)))
        time(s"q18.bigorders_typed/$i")(noop(li.groupBy("l_orderkey")
          .agg(AE.unscaled_sum_long(
            (col("l_quantity") * 100 + lit(0.5)).cast("long"), 2).as("qty"))
          .filter(col("qty") > 150)))
        time(s"q18.bigorders_plain/$i")(noop(li.groupBy("l_orderkey")
          .agg(sum(col("l_quantity")).as("qty"))
          .filter(col("qty") > 150)))
        time(s"q18.plain_full/$i") {
          val big = li.groupBy("l_orderkey")
            .agg(sum(col("l_quantity")).as("qty"))
            .filter(col("qty") > 150).select("l_orderkey")
          noop(finish18(big, sum(col("l_quantity"))))
        }
      }
    }
    spark.stop()
  }
}
