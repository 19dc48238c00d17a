package graft.ops

import graft.SparkSuite

/** CheckpointScope's steady-state contract: a query-per-second loop
  * over a checkpointing operator holds exactly ONE live checkpoint per
  * call site — repeat invocations release the previous blocks instead
  * of stranding them until the ContextCleaner. */
class CheckpointScopeSpec extends SparkSuite {

  test("repeat invocations of one site keep getPersistentRDDs steady") {
    CheckpointScope.releaseAll()
    val sc = spark.sparkContext
    def invoke(): Unit = {
      val df = CheckpointScope.checkpoint("spec.site",
        spark.range(1000L).selectExpr("id", "id * 2 AS v"))
      df.write.format("noop").mode("overwrite").save()
    }
    invoke()
    val after1 = sc.getPersistentRDDs.size
    (1 to 5).foreach(_ => invoke())
    assert(sc.getPersistentRDDs.size === after1,
      s"6 invocations left ${sc.getPersistentRDDs.size} persistent RDDs, " +
        s"expected the steady-state $after1 — previous checkpoints leak")
    CheckpointScope.releaseAll()
    assert(sc.getPersistentRDDs.size === after1 - 1 ||
      sc.getPersistentRDDs.isEmpty,
      "releaseAll must drop the last live checkpoint")
  }

  test("each invocation recomputes — no result memoization across calls") {
    CheckpointScope.releaseAll()
    val evals = spark.sparkContext.longAccumulator("ckpt-evals")
    val tick = org.apache.spark.sql.functions.udf { (k: Long) =>
      evals.add(1L); k
    }.asNondeterministic()
    def invoke(): Unit = {
      val df = CheckpointScope.checkpoint("spec.recompute",
        spark.range(100L)
          .select(tick(org.apache.spark.sql.functions.col("id")).as("k")))
      df.write.format("noop").mode("overwrite").save()
    }
    invoke(); invoke()
    assert(evals.value === 200L,
      s"two invocations must evaluate the frame twice (got ${evals.value} " +
        "row-evals for 2 x 100 rows) — a checkpoint was reused as a result cache")
    CheckpointScope.releaseAll()
  }
}
