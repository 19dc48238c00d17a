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
      if (r.media_type == "image") {
        // real PNG decode: dimensions come from the decoded raster
        assert(r.width === (r.doc_id % 13 + 4).toInt)
        assert(r.height === (r.doc_id % 11 + 4).toInt)
        assert(r.n_frames === 1)
      } else {
        assert(r.width >= 16 && r.height >= 16 && r.n_frames >= 1)
      }
      assert(r.feature.length === 8)
      assert(math.abs(r.feature.sum - 1.0f) < 1e-3f) // histogram normalized
    }
    // deterministic: same input → same checksum
    val again = Multimodal.decodeFeatures(
      Multimodal.assetsFromDocuments(spark, sf))
      .select("doc_id", "checksum").as[(Long, Long)].collect().toMap
    rows.foreach(r => assert(again(r.doc_id) === r.checksum))
  }

  test("image payloads are genuine PNGs and the codec round-trip is lossless") {
    val assets = Multimodal.assetsFromDocuments(spark, sf)
      .filter(_.media_type == "image").collect()
    assert(assets.nonEmpty)
    // PNG magic on every image payload — these are real files any
    // external tool could open
    val magic = Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)
    assets.foreach(a =>
      assert(a.payload.take(4).sameElements(magic), s"doc ${a.doc_id}"))
    // decoded pixels equal the deterministic formula — proves an actual
    // ImageIO decode (not header parsing) produced the values
    val a0 = assets.minBy(_.doc_id)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(a0.payload))
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val expected = ((a0.doc_id * 31 + x * 7 + y * 13) % 256).toInt
      assert((img.getRGB(x, y) & 0xff) === expected, s"pixel ($x,$y)")
    }
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

  test("audio frames: window tiling exact, energies match a direct fold") {
    import spark.implicits._
    val rows = Multimodal.audioFrames(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    def sample(id: Long, i: Long): Long =
      (id * 7919 + i * 104729) % 4096 - 2048
    rows.groupBy(_._1).foreach { case (id, g) =>
      val n = id % 400 + 800
      val nf = (n - 400) / 200 + 1
      assert(g.map(_._2).sorted.toSeq === (0L until nf).toSeq,
        s"doc $id frame tiling")
      g.foreach { case (_, k, e) =>
        val want = (0L until 400L).map { j =>
          val v = sample(id, k * 200 + j); v * v
        }.sum
        assert(e === want, s"doc $id frame $k energy")
      }
    }
  }

  test("WAV codec: real RIFF container, per-sample lossless round-trip") {
    for (id <- Seq(1L, 7L, 400L, 1234L)) {
      val bytes = Multimodal.encodeWav(id)
      // genuine RIFF/WAVE magic — a real container, not a synthetic header
      assert(new String(bytes.take(4), "US-ASCII") === "RIFF")
      assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE")
      // AudioSystem reports the fixture format
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      assert(ais.getFormat.getSampleRate === 16000f)
      assert(ais.getFormat.getChannels === 1)
      // per-sample equality: decode equals the generating formula exactly
      val got = Multimodal.decodeWav(bytes, id)
      val want = Multimodal.pcmSamples(id)
      assert(got.length === want.length, s"doc $id length")
      var i = 0
      while (i < got.length) {
        assert(got(i) === want(i), s"doc $id sample $i")
        i += 1
      }
    }
    // a malformed payload refuses instead of mis-decoding
    intercept[Exception] {
      Multimodal.decodeWav(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8), 0L)
    }
  }

  test("phash: 32-bit halves, near counts match an independent LSH sweep") {
    import spark.implicits._
    val out = Multimodal.phash(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, lo, hi, _) =>
      assert(lo >= 0L && lo < (1L << 32), s"doc $id h_lo range")
      assert(hi >= 0L && hi < (1L << 32), s"doc $id h_hi range")
    }
    // recompute n_near from the emitted hashes with the same banding:
    // 4×16-bit bands, candidates share a band, Hamming ≤ 12
    def bands(lo: Long, hi: Long): Seq[(Int, Long)] =
      Seq((0, lo % 65536), (1, lo / 65536), (2, hi % 65536), (3, hi / 65536))
    val hs = out.map(r => (r._1, r._2, r._3))
    val near = (for {
      a <- hs; b <- hs if a._1 < b._1
      if bands(a._2, a._3).intersect(bands(b._2, b._3)).nonEmpty
      d = java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3)
      if d <= 12
    } yield (a._1, b._1)).toSeq
    val wantCnt = (near.map(_._1) ++ near.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    out.foreach { case (id, _, _, n) =>
      assert(n === wantCnt.getOrElse(id, 0L), s"doc $id n_near")
    }
    // hashing is deterministic across runs
    val again = Multimodal.phash(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(again.toSeq === out.toSeq)
  }
}
