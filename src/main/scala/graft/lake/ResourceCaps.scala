package graft.lake

import org.apache.spark.sql.SparkSession

/** Resource-governor parity — the reference exposes `maximum_memory` /
  * `maximum_threads` GUCs capping its ingestion engine
  * (`/root/reference/CHANGELOG.md:7,14`). Spark already owns process
  * sizing (executor memory, core counts are launch-time), so the
  * session-scope analogs cap what a SESSION may ask of the cluster:
  *
  *   - `spark.graft.maxThreads` (int): ceiling on per-stage parallelism
  *     — clamps `spark.sql.shuffle.partitions` DOWN (never raises).
  *   - `spark.graft.maxMemory` (byte string, e.g. `2g`): working-set
  *     budget — clamps `spark.sql.autoBroadcastJoinThreshold` to 1/16
  *     of it (a broadcast table is materialized per executor) and
  *     `spark.sql.files.maxPartitionBytes` to budget/threads (so the
  *     concurrent scan partitions of one executor fit inside it).
  *
  * [[enforce]] runs at every mooncake entry point (create/read/CDC/
  * optimize and the SQL catalog's scan builder), so the caps bind no
  * matter which surface a query arrives through. Malformed values fail
  * loudly at the entry, not silently deep in a job.
  */
object ResourceCaps {

  val MaxThreadsKey = "spark.graft.maxThreads"
  val MaxMemoryKey = "spark.graft.maxMemory"

  def enforce(spark: SparkSession): Unit = {
    val conf = spark.conf
    val maxThreads = conf.getOption(MaxThreadsKey).map { v =>
      val t = v.toIntOption.filter(_ > 0).getOrElse(
        throw new IllegalArgumentException(
          s"$MaxThreadsKey must be a positive int, got '$v'"))
      val cur = conf.get("spark.sql.shuffle.partitions", "200").toInt
      if (cur > t) conf.set("spark.sql.shuffle.partitions", t.toString)
      t
    }
    conf.getOption(MaxMemoryKey).foreach { v =>
      val bytes =
        try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v)
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"$MaxMemoryKey must be a byte string like '2g', got '$v'", e)
        }
      require(bytes > 0, s"$MaxMemoryKey must be positive, got '$v'")
      val bcCap = math.max(1L, bytes / 16)
      val curBc = org.apache.spark.network.util.JavaUtils
        .byteStringAsBytes(conf.get(
          "spark.sql.autoBroadcastJoinThreshold", "10485760"))
      if (curBc > bcCap)
        conf.set("spark.sql.autoBroadcastJoinThreshold", bcCap.toString)
      val threads = maxThreads.getOrElse(
        spark.sparkContext.defaultParallelism)
      val partCap = math.max(1L, bytes / math.max(1, threads))
      val curPart = org.apache.spark.network.util.JavaUtils
        .byteStringAsBytes(conf.get("spark.sql.files.maxPartitionBytes",
          "134217728"))
      if (curPart > partCap)
        conf.set("spark.sql.files.maxPartitionBytes", partCap.toString)
    }
  }
}
