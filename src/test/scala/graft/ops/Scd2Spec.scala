package graft.ops

import graft.SparkSuite

/** SCD2 folding: each key's change rows become contiguous validity
  * intervals — valid_to = next version - 1, open-ended (and flagged
  * current) for the newest row. */
class Scd2Spec extends SparkSuite {
  import spark.implicits._

  test("history assigns contiguous validity intervals per key") {
    val changes = Seq((1L, "a", 1L), (1L, "b", 3L), (2L, "x", 2L))
      .toDF("k", "v", "ver")
    val h = Scd2.history(changes, Seq("k"), "ver")
      .select("k", "v", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(h === Set(
      (1L, "a", 1L, Some(2L), false),
      (1L, "b", 3L, None, true),
      (2L, "x", 2L, None, true)))
  }
}
