package graft.ops

import graft.SparkSuite

/** Multimodal plumbing: binary schema round-trip, partition-batch decode,
  * metadata transforms. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("assets survive a parquet round-trip as binary columns") {
    val assets = Multimodal.assetsFromDocuments(spark, sf)
    val dir = tmpDir("assets")
    assets.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("payload").dataType.typeName === "binary")
    assert(back.count() === assets.count())
  }

  test("decode parses headers and emits normalized features") {
    val f = Multimodal.decodeFeatures(
      Multimodal.assetsFromDocuments(spark, sf))
    val rows = f.collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.width >= 16 && r.height >= 16 && r.n_frames >= 1)
      assert(r.feature.length === 8)
      assert(math.abs(r.feature.sum - 1.0f) < 1e-3f) // histogram normalized
    }
    // deterministic: same input → same checksum
    val again = Multimodal.decodeFeatures(
      Multimodal.assetsFromDocuments(spark, sf))
      .select("doc_id", "checksum").as[(Long, Long)].collect().toMap
    rows.foreach(r => assert(again(r.doc_id) === r.checksum))
  }

  test("resize caps dimensions, frame sampling strides video frames") {
    val f = Multimodal.decodeFeatures(
      Multimodal.assetsFromDocuments(spark, sf))
    val small = Multimodal.resize(f, 64).collect()
    small.foreach(r => assert(math.max(r.width, r.height) <= 64))

    val frames = Multimodal.sampleFrames(f, stride = 5)
    val perDoc = frames.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    val nf = f.select("doc_id", "n_frames").as[(Long, Int)].collect().toMap
    perDoc.foreach { case (id, n) =>
      assert(n === (nf(id) + 4) / 5, s"doc $id frames $n of ${nf(id)}")
    }
  }
}
