package graft.lake

import org.apache.spark.network.util.JavaUtils

import graft.SparkSuite

/** The reference's maximum_memory/maximum_threads GUCs, session-scoped:
  * spark.graft.maxThreads / spark.graft.maxMemory clamp the session's
  * parallelism and working-set knobs at every mooncake entry point. */
class ResourceCapsSpec extends SparkSuite {
  import spark.implicits._

  test("graft caps clamp session knobs at entry points and bind on re-raise") {
    val lake = new Mooncake(tmpDir("caps-wh"))
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevPart = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.graft.maxThreads", "8")
      spark.conf.set("spark.graft.maxMemory", "64m")
      lake.createTable(spark, "caps",
        Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"))
      assert(spark.conf.get("spark.sql.shuffle.partitions").toInt <= 8)
      assert(JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold")) <=
        64L * 1024 * 1024 / 16)
      assert(JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes")) <=
        64L * 1024 * 1024 / 8)

      // caps BIND: raising the knob past the cap snaps back at the
      // next entry
      spark.conf.set("spark.sql.shuffle.partitions", "64")
      assert(lake.read(spark, "caps").count() === 2)
      assert(spark.conf.get("spark.sql.shuffle.partitions").toInt <= 8)

      // values BELOW the cap are left alone (clamp, don't normalize)
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      lake.read(spark, "caps").count()
      assert(spark.conf.get("spark.sql.shuffle.partitions").toInt === 2)

      // malformed values refuse loudly at the entry
      spark.conf.set("spark.graft.maxMemory", "banana")
      intercept[IllegalArgumentException] { lake.read(spark, "caps") }
      spark.conf.set("spark.graft.maxMemory", "64m")
      spark.conf.set("spark.graft.maxThreads", "-3")
      intercept[IllegalArgumentException] { lake.read(spark, "caps") }
    } finally {
      spark.conf.unset("spark.graft.maxThreads")
      spark.conf.unset("spark.graft.maxMemory")
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      prevPart.fold(spark.conf.unset("spark.sql.files.maxPartitionBytes"))(
        v => spark.conf.set("spark.sql.files.maxPartitionBytes", v))
    }
  }
}
