package org.apache.spark.sql.graft

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.datasources.{FileIndex,
  HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Parquet scan over an EXACT file list with KNOWN sizes — the planning
  * path for manifest/log-backed tables at high file counts.
  *
  * `spark.read.parquet(paths: _*)` treats every path as a ROOT to
  * discover: InMemoryFileIndex walks each path's ancestors (a
  * FileSystem.get per ancestor), stats every file (on RawLocalFileSystem
  * a forked `ls` per file for permission bits), and runs a discovery job
  * over the roots. For a lake table the log already knows the exact
  * files AND their byte sizes — real Delta/Iceberg readers hand the
  * planner that list directly and never touch the filesystem at plan
  * time. Measured on a 10k-file table this path took minutes of driver
  * time; this one is O(N) in-memory list construction.
  *
  * The sizes must be EXACT (the parquet reader seeks `length - 8` for
  * the footer); lake logs carry exact sizes by spec. Falls back to the
  * discovery reader when any size is unknown.
  */
object StaticParquet {

  /** `files`: (absolute path, exact byte size). `schema` is the read
    * (physical) schema — never inferred, per the evolution contract. */
  def read(spark: org.apache.spark.sql.SparkSession,
      files: Seq[(String, Long)], schema: StructType,
      options: Map[String, String] = Map.empty): DataFrame = {
    require(files.nonEmpty, "StaticParquet.read needs at least one file")
    if (files.exists(_._2 <= 0L))
      return spark.read.options(options).schema(schema)
        .parquet(files.map(_._1): _*)
    val cs = spark.asInstanceOf[classic.SparkSession]
    // On a LOCAL filesystem, verify log-carried sizes with a pooled
    // stat (microseconds a file): a foreign log with a sloppy size
    // would otherwise scan a truncated split and SILENTLY drop rows.
    // Remote object stores skip the probe — stats there are paid round
    // trips, and the engines that write those logs record exact sizes
    // by spec (the same trust every production Delta/Iceberg reader
    // extends). A missing local file keeps the log size so the scan
    // fails loudly instead of masking corruption here.
    val isLocal = files.forall { case (p, _) =>
      !p.contains("://") || p.startsWith("file:")
    }
    val checked =
      if (!isLocal) files
      else {
        import scala.jdk.CollectionConverters._
        files.asJava.parallelStream()
          .map[(String, Long)] { case (p, len) =>
            val actual = new java.io.File(p.stripPrefix("file:")).length()
            (p, if (actual > 0L) actual else len)
          }
          .collect(java.util.stream.Collectors
            .toList[(String, Long)]).asScala.toSeq
      }
    val statuses = checked.map { case (p, len) =>
      // modTime 0: nothing downstream keys on it (no catalog cache, no
      // _metadata.file_modification_time consumer in this engine)
      new FileStatus(len, false, 1, 128L << 20, 0L,
        // file: URI form — `_metadata.file_path` and DV/delete-file key
        // matching expect the scheme the discovery reader produces
        new HPath(new java.io.File(p).toURI))
    }.toArray
    val index = new FileIndex {
      override val rootPaths: Seq[HPath] = Seq.empty
      override def listFiles(partitionFilters: Seq[Expression],
          dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
        Seq(PartitionDirectory(InternalRow.empty, statuses))
      // URI form, matching InMemoryFileIndex.inputFiles
      override def inputFiles: Array[String] =
        statuses.map(_.getPath.toString)
      override def refresh(): Unit = ()
      override val sizeInBytes: Long = files.map(_._2).sum
      override val partitionSchema: StructType = StructType(Nil)
    }
    val rel = HadoopFsRelation(index, StructType(Nil), schema, None,
      new ParquetFileFormat, options)(cs)
    classic.Dataset.ofRows(cs, LogicalRelation(rel, isStreaming = false))
  }
}
