package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Analytics operators beyond the round-1 inventory: PIVOT / UNPIVOT
  * (the PG crosstab / DuckDB PIVOT class), recursive CTEs (WITH RECURSIVE
  * — PG and DuckDB both ship it; Spark 4 plans it as UnionLoop),
  * per-group top-k (the QUALIFY class), and deterministic hash sampling
  * (the scalable stand-in for TABLESAMPLE — the reference's mirror has no
  * sample scans at all, `/root/reference/src/table.rs:541-573`, so
  * repeatable sampling must be an ordinary pushed-down predicate).
  */
object AnalyticsQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** PIVOT: order counts per priority, statuses fanned out to columns.
    * Values are enumerated explicitly — at scale an un-enumerated pivot
    * forces an extra distinct-values job before the real aggregation.
    * Spark leaves never-matched cells NULL where a SQL FILTER count gives
    * 0, so the cells are coalesced. */
  val pivotStatus: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy("o_orderpriority")

  val pivotStatusSql: String =
    """SELECT o_orderpriority,
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
      |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** UNPIVOT (melt): wide customer metrics to (metric, value) rows —
    * a per-row generator, no shuffle. */
  val unpivotCustomer: Q = (s, dir) =>
    t(s, dir, "customer")
      .filter(col("c_custkey") <= 100)
      .select(col("c_custkey"),
        col("c_acctbal").cast("double").as("acctbal"),
        col("c_nationkey").cast("double").as("nationkey"))
      .unpivot(Array(col("c_custkey")),
        Array(col("acctbal"), col("nationkey")), "metric", "value")
      .orderBy("c_custkey", "metric")

  val unpivotCustomerSql: String =
    """SELECT c_custkey, 'acctbal' AS metric, CAST(c_acctbal AS DOUBLE) AS value
      |FROM customer WHERE c_custkey <= 100
      |UNION ALL
      |SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value
      |FROM customer WHERE c_custkey <= 100
      |ORDER BY c_custkey, metric""".stripMargin

  /** WITH RECURSIVE: follow each order key through its key DIV 10 chain
    * down to 0 (a fixed-depth hierarchy walk — the transitive-closure
    * class). Spark 4 executes this as an iterated UnionLoop; each
    * iteration is a distributed step, not a driver loop. */
  val recursiveCte: Q = (s, dir) => {
    t(s, dir, "orders").filter(col("o_orderkey") <= 300)
      .select("o_orderkey").createOrReplaceTempView("rcte_orders")
    s.sql(
      """WITH RECURSIVE chain(start, node, depth) AS (
        |  SELECT o_orderkey, CAST(o_orderkey AS BIGINT), CAST(0 AS BIGINT)
        |  FROM rcte_orders
        |  UNION ALL
        |  SELECT start, node DIV 10, depth + 1 FROM chain WHERE node > 0)
        |SELECT start, max(depth) AS depth_to_zero,
        |  CAST(sum(node) AS BIGINT) AS path_sum
        |FROM chain GROUP BY start ORDER BY start""".stripMargin)
  }

  val recursiveCteSql: String =
    """WITH RECURSIVE chain(start, node, depth) AS (
      |  SELECT o_orderkey, CAST(o_orderkey AS BIGINT), CAST(0 AS BIGINT)
      |  FROM orders WHERE o_orderkey <= 300
      |  UNION ALL
      |  SELECT start, node // 10, depth + 1 FROM chain WHERE node > 0)
      |SELECT start, CAST(max(depth) AS BIGINT) AS depth_to_zero,
      |  CAST(sum(node) AS BIGINT) AS path_sum
      |FROM chain GROUP BY start ORDER BY start""".stripMargin

  /** Per-group top-k (the QUALIFY class): 3 biggest orders per status.
    * One shuffle on the group key; rank + filter, no global sort of the
    * input. */
  val topkPerGroup: Q = (s, dir) => {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= 3)
      .orderBy("o_orderstatus", "rn")
  }

  val topkPerGroupSql: String =
    """SELECT o_orderstatus, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY o_orderstatus
      |                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |FROM orders
      |QUALIFY rn <= 3
      |ORDER BY o_orderstatus, rn""".stripMargin

  /** [[topkPerGroup]]'s SCALE PATH — same semantic, same oracle, the
    * plan a 100 TB fact table needs: the window/QUALIFY spelling
    * shuffles EVERY row of every group and sorts each partition; the
    * bounded-heap aggregate ([[graft.functions.expressions.BoundedTopK]])
    * discards losers MAP-SIDE, so the exchange carries ≤ k rows per
    * group per task and the final merge is k-row-per-buffer work. The
    * posexplode index + 1 reproduces the window's row_number exactly
    * (same (price desc, orderkey asc) ordering, unique tie-break). */
  val topkPerGroupHeap: Q = (s, dir) => {
    import graft.functions.expressions.{AggExpressions => AE}
    t(s, dir, "orders")
      .select(col("o_orderstatus"),
        struct(col("o_totalprice"), col("o_orderkey")).as("r"))
      .groupBy("o_orderstatus")
      .agg(AE.bounded_top_k(col("r"), 3, Seq(true, false)).as("top"))
      .select(col("o_orderstatus"), posexplode(col("top")).as(Seq("i", "r")))
      .select(col("o_orderstatus"),
        col("r.o_orderkey").as("o_orderkey"),
        col("r.o_totalprice").as("o_totalprice"),
        (col("i") + 1).cast("bigint").as("rn"))
      .orderBy("o_orderstatus", "rn")
  }

  /** DISTINCT ON (the Postgres idiom the reference's users write): one
    * row per customer — their single largest order. Spark expresses it
    * as rank-1 over the same ordering; DuckDB ships DISTINCT ON
    * natively. Same one-shuffle shape as [[topkPerGroup]]. */
  val distinctOn: Q = (s, dir) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .filter(col("o_custkey") <= 300)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .orderBy("o_custkey")
  }

  val distinctOnSql: String =
    """SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
      |FROM orders WHERE o_custkey <= 300
      |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  /** LATERAL join (correlated table subquery): each customer's 2 largest
    * orders. Catalyst decorrelates this into a ranked window over one
    * shuffle of the right side — same physical shape as
    * [[topkPerGroup]], but exercising the LATERAL SQL surface (DuckDB
    * and PG both ship it). */
  val joinLateral: Q = (s, dir) => {
    t(s, dir, "customer").createOrReplaceTempView("lat_customer")
    t(s, dir, "orders").createOrReplaceTempView("lat_orders")
    s.sql(
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM lat_customer c JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM lat_orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c.c_custkey <= 500
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
  }

  val joinLateralSql: String =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c JOIN LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t ON true
      |WHERE c.c_custkey <= 500
      |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin

  /** Deterministic ~5% hash sample: affine hash of the key mod 100.
    * Repeatable across runs and engines (unlike rand()-based TABLESAMPLE),
    * prunes at the scan (plain pushed predicate), and co-samples any
    * table sharing the key — the property training-data pipelines need
    * when sampling joined fact tables. */
  val sampleHash: Q = (s, dir) =>
    t(s, dir, "lineitem")
      // key is reduced mod P BEFORE the multiply: (P-1)*2654435761 stays
      // under 2^63, where a raw huge-SF orderkey times the constant
      // would overflow (an ANSI ArithmeticException at exactly the
      // scale this sample exists for)
      .filter(((col("l_orderkey") % 1000000007L) * 2654435761L + 97531L)
        % 1000000007L % 100 < 5)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  val sampleHashSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE (((l_orderkey % 1000000007) * 2654435761 + 97531)
      |  % 1000000007) % 100 < 5
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Boolean + bitwise aggregates (PG bool_and/bool_or/bit_and/bit_or/
    * bit_xor surface). All partial-aggregable: map-side combine, one
    * shuffle of 3 tiny groups. */
  val aggBoolBit: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        bool_and(col("l_quantity") > 0).as("all_pos_qty"),
        bool_or(col("l_discount") > 0.05).as("any_big_disc"),
        bit_and(col("l_linenumber").cast("bigint")).as("ln_and"),
        bit_or(col("l_linenumber").cast("bigint")).as("ln_or"),
        bit_xor(col("l_orderkey")).as("ok_xor"))
      .orderBy("l_returnflag")

  val aggBoolBitSql: String =
    """SELECT l_returnflag,
      |  bool_and(l_quantity > 0) AS all_pos_qty,
      |  bool_or(l_discount > 0.05) AS any_big_disc,
      |  CAST(bit_and(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS ln_and,
      |  CAST(bit_or(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS ln_or,
      |  CAST(bit_xor(l_orderkey) AS BIGINT) AS ok_xor
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Exact correlation / covariance / regression slope, derived from
    * single-pass DECIMAL sums (n, Σx, Σy, Σxy, Σx², Σy²) and finished in
    * identically-structured double arithmetic — bit-exact against the
    * oracle where native corr/covar (order-dependent double accumulation)
    * is not. Same partial-agg shape as any sum. */
  val aggCorr: Q = (s, dir) => {
    val x = RelationalQueries.dec(col("l_extendedprice"))
    val y = RelationalQueries.dec(col("l_quantity"))
    val nD = col("n").cast("double")
    // decimal→double through a string — see RelationalQueries.decToDouble
    // (DuckDB's direct cast double-rounds past 2^53 unscaled)
    def d(c: String) = RelationalQueries.decToDouble(col(c))
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .select(col("l_returnflag"), col("n"),
        ((d("sxy") - d("sx") * d("sy") / nD) / nD).as("covar_pop"),
        ((d("sxy") - d("sx") * d("sy") / nD) / (nD - 1.0)).as("covar_samp"),
        ((nD * d("sxy") - d("sx") * d("sy")) /
          (sqrt(nD * d("sxx") - d("sx") * d("sx")) *
            sqrt(nD * d("syy") - d("sy") * d("sy")))).as("corr_xy"),
        ((nD * d("sxy") - d("sx") * d("sy")) /
          (nD * d("sxx") - d("sx") * d("sx"))).as("regr_slope"))
      .orderBy("l_returnflag")
  }

  val aggCorrSql: String =
    """WITH m AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sx,
      |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sy,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxy,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxx,
      |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS syy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
      |  (CAST(CAST(sxy AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS covar_pop,
      |  (CAST(CAST(sxy AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS covar_samp,
      |  (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)) /
      |    (sqrt(CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) *
      |     sqrt(CAST(n AS DOUBLE) * CAST(CAST(syy AS VARCHAR) AS DOUBLE) - CAST(CAST(sy AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))) AS corr_xy,
      |  (CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)) /
      |    (CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE) - CAST(CAST(sx AS VARCHAR) AS DOUBLE) * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) AS regr_slope
      |FROM m ORDER BY l_returnflag""".stripMargin

  /** Equi-width histogram (the width_bucket class) via integer bucket
    * arithmetic — a pushed-down scan + one tiny-group aggregation. */
  val aggHistogram: Q = (s, dir) =>
    t(s, dir, "orders")
      .select(floor(col("o_totalprice") / 25000.0).cast("bigint").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  val aggHistogramSql: String =
    """SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
      |  count(*) AS n
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  /** GROUPING SETS with GROUPING() markers — how consumers distinguish
    * "NULL because super-aggregate" from data NULLs. */
  val aggGroupingId: Q = (s, dir) => {
    t(s, dir, "orders").createOrReplaceTempView("gid_orders")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
        |  count(*) AS n
        |FROM gid_orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
        |  o_orderpriority NULLS FIRST""".stripMargin)
  }

  val aggGroupingIdSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
      |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
      |  count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
      |  o_orderpriority NULLS FIRST""".stripMargin

  /** nth_value over an explicit full-partition frame (the remaining
    * analytic window function family member). */
  val windowNth: Q = (s, dir) => {
    val w = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders")
      .filter(col("o_orderkey") <= 2000)
      .select(col("o_orderkey"), col("o_orderstatus"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"),
        last(col("o_totalprice")).over(w).as("last_price"))
      .orderBy("o_orderkey")
  }

  val windowNthSql: String =
    """SELECT o_orderkey, o_orderstatus,
      |  nth_value(o_totalprice, 2) OVER w AS second_price,
      |  last_value(o_totalprice) OVER w AS last_price
      |FROM orders WHERE o_orderkey <= 2000
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderkey""".stripMargin

  /** Ordered array_agg per group (PG array_agg / DuckDB list) — sorted
    * for determinism, so map-side partials merge commutatively. The
    * compared column is a canonical CSV encoding of the sorted array:
    * the driver's pandas hash cannot sort raw array cells, and a
    * delimiter-joined string carries the identical semantic (element
    * set AND order) through the hash check on both engines. */
  val aggArray: Q = (s, dir) =>
    t(s, dir, "orders")
      .filter(col("o_custkey") <= 200)
      .groupBy("o_custkey")
      .agg(
        array_join(sort_array(collect_list(col("o_orderkey")))
          .cast("array<string>"), ",").as("order_keys"),
        count(lit(1)).as("n"))
      .orderBy("o_custkey")

  val aggArraySql: String =
    """SELECT o_custkey,
      |  array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
      |  count(*) AS n
      |FROM orders WHERE o_custkey <= 200
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** arg_max / arg_min (max_by/min_by): which order carries each
    * priority's extreme price. The sort value is exact BIGINT
    * arithmetic: price in integer cents times 10^9 plus the unique key
    * — the cents shift dominates any key (keys < 10^9 even at sf100),
    * so the key term ONLY breaks exact-price ties, deterministically
    * and identically in both engines. */
  val aggArgmax: Q = (s, dir) => {
    val rank = round(col("o_totalprice") * 100).cast("bigint") *
      1000000000L + col("o_orderkey")
    t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(max_by(col("o_orderkey"), rank).as("max_price_order"),
        min_by(col("o_orderkey"), rank).as("min_price_order"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy("o_orderpriority")
  }

  val aggArgmaxSql: String =
    """SELECT o_orderpriority,
      |  arg_max(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT)
      |    * 1000000000 + o_orderkey) AS max_price_order,
      |  arg_min(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT)
      |    * 1000000000 + o_orderkey) AS min_price_order,
      |  max(o_totalprice) AS max_price
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Column profiling — the data-quality pass a warehouse runs before
    * trusting a feed: per column, null count, exact distinct count,
    * and numeric min/max (exact in double for these domains). ONE scan
    * feeds every metric (Spark expands the multi-distinct into the
    * standard expand+two-phase aggregate; the oracle computes the same
    * scalars), then a literal stack pivots the scalars into one row
    * per column. At 100 TB exact multi-distinct is the expensive
    * spelling — the bounded-state twin is approx_count_distinct
    * (q_events_approx_distinct's HLL contract); this is the exact
    * baseline the oracle can hash. */
  val profileColumns: Q = (s, dir) => {
    val l = t(s, dir, "lineitem")
    def nulls(c: String) =
      count(when(col(c).isNull, 1)).as(s"n_$c")
    val row = l.agg(
      count(lit(1)).as("n_rows"),
      nulls("l_quantity"), countDistinct(col("l_quantity")).as("d_l_quantity"),
      min(col("l_quantity").cast("double")).as("mn_l_quantity"),
      max(col("l_quantity").cast("double")).as("mx_l_quantity"),
      nulls("l_discount"), countDistinct(col("l_discount")).as("d_l_discount"),
      min(col("l_discount").cast("double")).as("mn_l_discount"),
      max(col("l_discount").cast("double")).as("mx_l_discount"),
      nulls("l_linenumber"),
      countDistinct(col("l_linenumber")).as("d_l_linenumber"),
      min(col("l_linenumber").cast("double")).as("mn_l_linenumber"),
      max(col("l_linenumber").cast("double")).as("mx_l_linenumber"),
      nulls("l_returnflag"), countDistinct(col("l_returnflag")).as("d_l_returnflag"))
    row.selectExpr("n_rows", """stack(4,
      'l_quantity',  n_l_quantity,  d_l_quantity,  mn_l_quantity,  mx_l_quantity,
      'l_discount',  n_l_discount,  d_l_discount,  mn_l_discount,  mx_l_discount,
      'l_linenumber',n_l_linenumber,d_l_linenumber,mn_l_linenumber,mx_l_linenumber,
      'l_returnflag',  n_l_returnflag,  d_l_returnflag,  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
      ) AS (column_name, n_nulls, n_distinct, min_v, max_v)""")
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_v"), col("max_v"))
      .orderBy("column_name")
  }

  val profileColumnsSql: String =
    """WITH a AS (SELECT count(*) AS n_rows,
      |  count(CASE WHEN l_quantity IS NULL THEN 1 END) AS n1,
      |  CAST(count(DISTINCT l_quantity) AS BIGINT) AS d1,
      |  CAST(min(l_quantity) AS DOUBLE) AS mn1,
      |  CAST(max(l_quantity) AS DOUBLE) AS mx1,
      |  count(CASE WHEN l_discount IS NULL THEN 1 END) AS n2,
      |  CAST(count(DISTINCT l_discount) AS BIGINT) AS d2,
      |  CAST(min(l_discount) AS DOUBLE) AS mn2,
      |  CAST(max(l_discount) AS DOUBLE) AS mx2,
      |  count(CASE WHEN l_linenumber IS NULL THEN 1 END) AS n3,
      |  CAST(count(DISTINCT l_linenumber) AS BIGINT) AS d3,
      |  CAST(min(l_linenumber) AS DOUBLE) AS mn3,
      |  CAST(max(l_linenumber) AS DOUBLE) AS mx3,
      |  count(CASE WHEN l_returnflag IS NULL THEN 1 END) AS n4,
      |  CAST(count(DISTINCT l_returnflag) AS BIGINT) AS d4
      | FROM lineitem)
      |SELECT column_name, n_rows, n_nulls, n_distinct, min_v, max_v
      |FROM (
      |  SELECT 'l_quantity' AS column_name, n_rows, n1 AS n_nulls,
      |    d1 AS n_distinct, mn1 AS min_v, mx1 AS max_v FROM a
      |  UNION ALL SELECT 'l_discount', n_rows, n2, d2, mn2, mx2 FROM a
      |  UNION ALL SELECT 'l_linenumber', n_rows, n3, d3, mn3, mx3 FROM a
      |  UNION ALL SELECT 'l_returnflag', n_rows, n4, d4,
      |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM a)
      |ORDER BY column_name""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_profile_columns" -> profileColumns,
    "q_agg_argmax" -> aggArgmax,
    "q_pivot" -> pivotStatus,
    "q_unpivot" -> unpivotCustomer,
    "q_recursive_cte" -> recursiveCte,
    "q_topk_per_group" -> topkPerGroup,
    "q_topk_heap" -> topkPerGroupHeap,
    "q_join_lateral" -> joinLateral,
    "q_distinct_on" -> distinctOn,
    "q_sample_hash" -> sampleHash,
    "q_agg_bool_bit" -> aggBoolBit,
    "q_agg_corr" -> aggCorr,
    "q_agg_histogram" -> aggHistogram,
    "q_agg_grouping_id" -> aggGroupingId,
    "q_window_nth" -> windowNth,
    "q_agg_array" -> aggArray,
  )

  val oracleSql: Map[String, String] = Map(
    "q_profile_columns" -> profileColumnsSql,
    "q_agg_argmax" -> aggArgmaxSql,
    "q_pivot" -> pivotStatusSql,
    "q_unpivot" -> unpivotCustomerSql,
    "q_recursive_cte" -> recursiveCteSql,
    "q_topk_per_group" -> topkPerGroupSql,
    "q_topk_heap" -> topkPerGroupSql,
    "q_join_lateral" -> joinLateralSql,
    "q_distinct_on" -> distinctOnSql,
    "q_sample_hash" -> sampleHashSql,
    "q_agg_bool_bit" -> aggBoolBitSql,
    "q_agg_corr" -> aggCorrSql,
    "q_agg_histogram" -> aggHistogramSql,
    "q_agg_grouping_id" -> aggGroupingIdSql,
    "q_window_nth" -> windowNthSql,
    "q_agg_array" -> aggArraySql,
  )
}
