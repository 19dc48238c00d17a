package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.lake.{IcebergCompat, Mooncake}

/** Following a foreign Iceberg table: seed from a snapshot, then every
  * later snapshot's row-level delta lands in the mirror through the
  * standard CdcStream — across appends, equality deletes, position
  * deletes, multi-snapshot polls, restarts, and compactions (which must
  * net zero change rows). */
class IcebergFollowerSpec extends SparkSuite {
  import spark.implicits._

  private def mirrorRows(lake: Mooncake): Seq[(Long, String)] =
    lake.read(spark, "im").select("k", "v").as[(Long, String)]
      .collect().sortBy(_._1).toSeq

  private def iceRows(dir: String): Seq[(Long, String)] =
    IcebergCompat.read(spark, dir).select("k", "v").as[(Long, String)]
      .collect().sortBy(_._1).toSeq

  test("mirror follows append/delete/upsert snapshots and restarts") {
    val ice = tmpDir("if-ice")
    val spool = tmpDir("if-spool")
    val ckpt = tmpDir("if-ckpt")
    IcebergCompat.write(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"),
      ice)

    val lake = new Mooncake(tmpDir("if-wh"))
    val follower = new IcebergFollower(ice, spool)
    follower.seed(spark, lake, "im", Seq("k"))
    assert(mirrorRows(lake) === Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    // seeded frontier: nothing to spool yet
    assert(follower.pollOnce(spark) === 0L)

    // an upsert the way streaming Iceberg writers emit it — equality-
    // delete the keys {2 (update), 3 (pure delete)}, append the new
    // image of 2 plus a fresh 9 — followed by ONE poll spanning both
    // snapshots: the sequence-number __seq keeps delete-then-insert
    // ordered so the update converges to the new image
    IcebergCompat.writeEqualityDeletes(spark, ice,
      Seq(2L, 3L).toDF("k"), Seq("k"))
    IcebergCompat.write(Seq((2L, "B"), (9L, "i")).toDF("k", "v"), ice)
    assert(follower.pollOnce(spark) > 0)
    CdcStream.attach(lake, "im", follower.changes(spark), ckpt)
      .awaitTermination()
    assert(mirrorRows(lake) === iceRows(ice))
    assert(mirrorRows(lake) === Seq(1L -> "a", 2L -> "B", 9L -> "i"))

    // position delete: address the LIVE row k=1 by (file, row position)
    // from a raw read of the live data files (raw so eq-deleted row
    // images don't shift _metadata.row_index)
    val victim = spark.read
      .parquet(IcebergCompat.liveDataFiles(ice): _*)
      .select(col("_metadata.file_path"), col("_metadata.row_index"),
        col("k"))
      .as[(String, Long, Long)].collect().find(_._3 == 1L).get
    IcebergCompat.writePositionDeletes(spark, ice,
      Seq((victim._1.stripPrefix("file:"), victim._2)))
    assert(follower.pollOnce(spark) > 0)
    CdcStream.attach(lake, "im", follower.changes(spark), ckpt)
      .awaitTermination()
    assert(mirrorRows(lake) === iceRows(ice))
    assert(!mirrorRows(lake).map(_._1).contains(1L))

    // RESTART both sides: new follower (frontier persists, nothing
    // re-spools), new snapshot, re-attached stream converges
    val follower2 = new IcebergFollower(ice, spool)
    assert(follower2.frontier === follower.frontier)
    assert(follower2.pollOnce(spark) === 0L)
    IcebergCompat.write(Seq((10L, "j")).toDF("k", "v"), ice)
    assert(follower2.pollOnce(spark) > 0)
    CdcStream.attach(lake, "im", follower2.changes(spark), ckpt)
      .awaitTermination()
    assert(mirrorRows(lake) === iceRows(ice))
    assert(mirrorRows(lake).toMap.get(10L) === Some("j"))
  }

  test("a compaction snapshot advances the frontier without rows") {
    val ice = tmpDir("if-cpt-ice")
    val spool = tmpDir("if-cpt-spool")
    IcebergCompat.write(Seq((1L, "a")).toDF("k", "v").coalesce(1), ice)
    IcebergCompat.write(Seq((2L, "b")).toDF("k", "v").coalesce(1), ice)
    val lake = new Mooncake(tmpDir("if-cpt-wh"))
    val follower = new IcebergFollower(ice, spool)
    follower.seed(spark, lake, "im", Seq("k"))
    // rewrite, same rows: the exceptAll diff must cancel exactly
    IcebergCompat.compact(spark, ice)
    assert(follower.pollOnce(spark) === 0L)
    assert(follower.frontier ===
      Some(IcebergCompat.currentSnapshotId(ice)))
  }

  /** Rewrite a (v2-written) table's metadata to a fabricated format-v1
    * log: format-version 1, NO sequence numbers, and snapshot
    * timestamps set to `tsOf(index)` in snapshot-list order. */
  private def fabricateV1(ice: String, tsOf: Int => Long): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaDir = Paths.get(ice, "metadata")
    Files.list(metaDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".metadata.json"))
      .foreach { p =>
        val root = mapper.readTree(Files.readAllBytes(p))
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        root.put("format-version", 1)
        root.path("snapshots").elements().asScala.zipWithIndex.foreach {
          case (s, i) =>
            val o = s.asInstanceOf[
              com.fasterxml.jackson.databind.node.ObjectNode]
            o.remove("sequence-number")
            o.put("timestamp-ms", tsOf(i))
        }
        Files.write(p, mapper.writeValueAsBytes(root))
      }
  }

  test("format-v1: an insert-only chain follows; deletes refuse loudly") {
    val ice = tmpDir("if-v1-ice")
    IcebergCompat.write(Seq((1L, "a")).toDF("k", "v"), ice)
    val s1 = IcebergCompat.currentSnapshotId(ice)
    IcebergCompat.write(Seq((2L, "b")).toDF("k", "v"), ice)
    IcebergCompat.write(Seq((3L, "c")).toDF("k", "v"), ice)
    fabricateV1(ice, i => 1000L * (i + 1))

    // insert-only v1 follow works: changes past s1 are the two appends,
    // ordered by the synthesized timestamp sequence
    val ch = IcebergCompat.readChanges(spark, ice, s1)
      .select(col("k"), col("v"), col("_change_type"),
        col("_sequence_number"))
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(ch === Seq((2L, "b", "insert", 2000L),
      (3L, "c", "insert", 3000L)))
    // plain reads agree
    assert(iceRows(ice) === Seq(1L -> "a", 2L -> "b", 3L -> "c"))

    // a chain whose snapshots REMOVE data files (compaction/delete)
    // refuses: v1 has no sequence numbers to order deletes by
    val dice = tmpDir("if-v1-del-ice")
    IcebergCompat.write(Seq((1L, "a")).toDF("k", "v"), dice)
    IcebergCompat.write(Seq((2L, "b")).toDF("k", "v"), dice)
    IcebergCompat.compact(spark, dice)
    fabricateV1(dice, i => 1000L * (i + 1))
    val e = intercept[UnsupportedOperationException] {
      IcebergCompat.readChanges(spark, dice, -1L).count()
    }
    assert(e.getMessage.contains("insert-only"))

    // non-increasing timestamps: the synthesized order would be
    // ambiguous — refuse rather than guess
    val tice = tmpDir("if-v1-ts-ice")
    IcebergCompat.write(Seq((1L, "a")).toDF("k", "v"), tice)
    IcebergCompat.write(Seq((2L, "b")).toDF("k", "v"), tice)
    fabricateV1(tice, _ => 5000L)
    val e2 = intercept[UnsupportedOperationException] {
      IcebergCompat.readChanges(spark, tice, -1L).count()
    }
    assert(e2.getMessage.contains("strictly increasing"))
  }

  test("readChanges refuses a broken lineage and -1 means from-genesis") {
    val ice = tmpDir("if-rc-ice")
    IcebergCompat.write(Seq((1L, "a")).toDF("k", "v"), ice)
    val s1 = IcebergCompat.currentSnapshotId(ice)
    IcebergCompat.write(Seq((2L, "b")).toDF("k", "v"), ice)
    val all = IcebergCompat.readChanges(spark, ice, -1L)
    assert(all.count() === 2)
    assert(all.filter(col("_change_type") === "insert").count() === 2)
    val tail = IcebergCompat.readChanges(spark, ice, s1)
    assert(tail.select("k").as[Long].collect().toSeq === Seq(2L))
    intercept[IllegalStateException] {
      IcebergCompat.readChanges(spark, ice, 123456789L).count()
    }
  }
}
