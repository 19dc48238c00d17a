package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, processed by per-partition batch functions — the Scala
  * analog of arrow-batched UDFs (Dataset.mapPartitions over case-class
  * rows keeps one JVM object stream per partition, no per-row closure
  * dispatch).
  *
  * IMAGE assets are REAL PNGs, encoded and decoded with `javax.imageio`
  * (in-JDK, no external codec): the fixture paints deterministic
  * doc_id-derived pixels, the decode stage runs the actual PNG codec,
  * and features/checksums are computed from the DECODED PIXELS — so the
  * oracle (which reproduces the pixel formula arithmetically) proves a
  * lossless encode→binary column→decode round-trip, not just plumbing.
  * AUDIO assets in the frame-energy leg are REAL RIFF/WAVE files,
  * encoded and decoded with `javax.sound.sampled` (in-JDK) — the same
  * real-codec discipline as the PNGs. Video payloads (and the
  * metadata-demo audio header) remain a synthetic 16-byte header + body
  * (the JDK has no Ogg/H.264), with the same batched decode shape a
  * real codec would slot into.
  *
  * Scale: payloads stay columnar (Parquet binary) until the decode stage;
  * decode is per-partition with no shuffle; feature vectors come back as
  * array<float> ready for [[PipelineQueries.embedTopK]]-style ANN.
  */
object Multimodal {

  /** An opaque media payload + routing metadata. */
  case class Asset(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded features (what a real decoder would emit per asset). */
  case class AssetFeatures(
      doc_id: Long,
      media_type: String,
      width: Int,
      height: Int,
      n_frames: Int,
      payload_bytes: Long,
      checksum: Long,
      feature: Array[Float])

  private val MagicV1 = 0x47524654 // "GRFT"

  /** Deterministic grayscale value of pixel (x, y) of doc `id`'s image —
    * the formula the DuckDB oracle reproduces arithmetically. */
  @inline private def pixel(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 256).toInt

  /** Encode doc `id`'s deterministic image as a real PNG. Dimensions
    * stay tiny (≤16×14) — the point is a genuine codec round-trip per
    * row, not IO volume. */
  private def encodePng(id: Long): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache per call
    val w = (id % 13 + 4).toInt
    val h = (id % 11 + 4).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = pixel(id, x, y)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Fabricate deterministic binary assets from the documents fixture:
    * image docs (doc_id % 3 == 0) become real PNGs; audio/video docs a
    * 16-byte header (magic, width, height, n_frames — derived from
    * doc_id) followed by the UTF-8 text as the fake media body. */
  def assetsFromDocuments(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"))
      .as[(Long, String, String)]
      .map { case (id, text, mt) =>
        if (mt == "image") Asset(id, mt, encodePng(id))
        else {
          val body = text.getBytes("UTF-8")
          val buf = ByteBuffer.allocate(16 + body.length)
            .order(ByteOrder.LITTLE_ENDIAN)
          buf.putInt(MagicV1)
          buf.putInt((id % 640 + 16).toInt)  // width
          buf.putInt((id % 480 + 16).toInt)  // height
          buf.putInt((id % 30 + 1).toInt)    // n_frames
          buf.put(body)
          Asset(id, mt, buf.array())
        }
      }
  }

  /** Per-partition batch decode. Images run the REAL `javax.imageio`
    * PNG decoder — dimensions come from the decoded raster and the
    * checksum/histogram fold over decoded pixel values, so any codec
    * drift breaks the oracle hash. Audio/video parse the synthetic
    * header and fold over body bytes (the slot a real audio codec would
    * fill). */
  def decodeFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        if (a.media_type == "image") {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(a.payload))
          require(img != null, s"PNG decode failed for doc ${a.doc_id}")
          val (w, h) = (img.getWidth, img.getHeight)
          val hist = new Array[Float](8)
          var checksum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val g = img.getRGB(x, y) & 0xff
              hist(g % 8) += 1f
              checksum = (checksum * 31 + g) % 1000000007L
              x += 1
            }
            y += 1
          }
          AssetFeatures(a.doc_id, a.media_type, w, h, 1,
            a.payload.length.toLong, checksum,
            hist.map(_ / (w * h).toFloat))
        } else {
          val buf = ByteBuffer.wrap(a.payload).order(ByteOrder.LITTLE_ENDIAN)
          val magic = buf.getInt()
          require(magic == MagicV1, s"bad asset header for doc ${a.doc_id}")
          val (w, h, nf) = (buf.getInt(), buf.getInt(), buf.getInt())
          val hist = new Array[Float](8)
          var checksum = 0L
          var i = 16
          while (i < a.payload.length) {
            val b = a.payload(i) & 0xff
            hist(b % 8) += 1f
            checksum = (checksum * 31 + b) % 1000000007L
            i += 1
          }
          val n = math.max(1, a.payload.length - 16).toFloat
          AssetFeatures(a.doc_id, a.media_type, w, h, nf,
            a.payload.length.toLong, checksum, hist.map(_ / n))
        }
      }
    }
  }

  /** Resize metadata transform (stub: real resize would re-encode the
    * payload; the metadata contract is what downstream schemas consume). */
  def resize(features: Dataset[AssetFeatures], maxDim: Int): Dataset[AssetFeatures] = {
    import features.sparkSession.implicits._
    features.map { f =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(f.width, f.height))
      f.copy(width = math.max(1, (f.width * scale).toInt),
        height = math.max(1, (f.height * scale).toInt))
    }
  }

  /** Frame sampling for video assets: every `stride`-th frame. */
  def sampleFrames(features: Dataset[AssetFeatures], stride: Int): DataFrame = {
    val s = features.sparkSession
    import s.implicits._
    features.toDF()
      .withColumn("frame",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)),
          lit(stride))))
      .select("doc_id", "media_type", "frame", "width", "height")
  }

  /** Pipeline query: fabricate → decode → per-type feature rollup.
    * Oracle-checked: image checksums fold over REAL-PNG-decoded pixels
    * whose values DuckDB reproduces arithmetically (so the codec
    * round-trip must be lossless for the hashes to agree); audio/video
    * checksums fold over the synthetic body bytes. The compared size
    * metric is decoded pixel count (width × height) — PNG byte length
    * is codec-internal and deliberately NOT part of the contract. */
  val features: (SparkSession, String) => DataFrame = (s, dir) => {
    val decoded = decodeFeatures(assetsFromDocuments(s, dir)).toDF()
    decoded.groupBy("media_type")
      .agg(count("*").as("n_assets"),
        sum(col("width").cast("long") * col("height")).cast("bigint")
          .as("total_px"),
        min("checksum").as("min_checksum"),
        max("width").as("max_width"))
      .orderBy("media_type")
  }

  val featuresSql: String =
    """WITH a AS (SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio'
      |         ELSE 'video' END AS media_type,
      |    CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 13 + 4 AS INTEGER)
      |         ELSE CAST(doc_id % 640 + 16 AS INTEGER) END AS width,
      |    CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 11 + 4 AS INTEGER)
      |         ELSE CAST(doc_id % 480 + 16 AS INTEGER) END AS height,
      |    CASE WHEN doc_id % 3 = 0 THEN
      |      list_reduce(list_prepend(CAST(0 AS BIGINT),
      |          list_transform(
      |            range(0, (doc_id % 13 + 4) * (doc_id % 11 + 4)),
      |            i -> (doc_id * 31 + (i % (doc_id % 13 + 4)) * 7
      |                  + (i // (doc_id % 13 + 4)) * 13) % 256)),
      |        (h, c) -> (h * 31 + c) % 1000000007)
      |    ELSE
      |      list_reduce(list_prepend(CAST(0 AS BIGINT),
      |          list_transform(range(1, length(text) + 1),
      |            i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
      |        (h, c) -> (h * 31 + c) % 1000000007)
      |    END AS checksum
      |  FROM documents)
      |SELECT media_type, count(*) AS n_assets,
      |  CAST(sum(CAST(width AS BIGINT) * height) AS BIGINT) AS total_px,
      |  min(checksum) AS min_checksum,
      |  max(width) AS max_width
      |FROM a GROUP BY media_type ORDER BY media_type""".stripMargin

  /** Pipeline query: decode → resize(256) → sample every 5th frame →
    * per-type rollup. Oracle-checked end to end: header fields and the
    * resize/sampling arithmetic all derive from doc_id with identical
    * IEEE double expression structure on both sides, so the oracle pins
    * the transform semantics, not just the plumbing. */
  val framePipeline: (SparkSession, String) => DataFrame = (s, dir) => {
    val decoded = decodeFeatures(assetsFromDocuments(s, dir))
    sampleFrames(resize(decoded, 256), 5)
      .groupBy("media_type")
      .agg(count(lit(1)).as("n_sampled"),
        sum("frame").cast("bigint").as("frame_sum"),
        max("width").as("max_resized_w"))
      .orderBy("media_type")
  }

  val framePipelineSql: String =
    """WITH a AS (SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio'
      |         ELSE 'video' END AS media_type,
      |    CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 13 + 4 AS INTEGER)
      |         ELSE CAST(doc_id % 640 + 16 AS INTEGER) END AS width,
      |    CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 11 + 4 AS INTEGER)
      |         ELSE CAST(doc_id % 480 + 16 AS INTEGER) END AS height,
      |    CASE WHEN doc_id % 3 = 0 THEN 1
      |         ELSE CAST(doc_id % 30 + 1 AS INTEGER) END AS n_frames
      |  FROM documents),
      |r AS (SELECT media_type, n_frames,
      |    GREATEST(1, CAST(floor(width * least(1.0,
      |      256.0 / greatest(width, height))) AS INTEGER)) AS width
      |  FROM a),
      |f AS (SELECT media_type, width,
      |    unnest(range(0, n_frames, 5)) AS frame FROM r)
      |SELECT media_type, count(*) AS n_sampled,
      |  CAST(sum(frame) AS BIGINT) AS frame_sum,
      |  max(width) AS max_resized_w
      |FROM f GROUP BY media_type ORDER BY media_type""".stripMargin

  /** Deterministic samples of doc `id`'s audio (the formula the oracle
    * reproduces arithmetically): (id%400)+800 int16 values of
    * ((id·7919 + i·104729) % 4096) − 2048. */
  private[ops] def pcmSamples(id: Long): Array[Short] = {
    val n = (id % 400 + 800).toInt
    val x = new Array[Short](n)
    var i = 0
    while (i < n) {
      x(i) = (((id * 7919 + i.toLong * 104729) % 4096) - 2048).toShort
      i += 1
    }
    x
  }

  /** 16 kHz, 16-bit signed, mono, little-endian — the canonical speech
    * fixture format. */
  private val WavFormat = new javax.sound.sampled.AudioFormat(
    16000f, 16, 1, true, false)

  /** Encode doc `id`'s deterministic samples as a REAL RIFF/WAVE file
    * through the in-JDK codec (`javax.sound.sampled`) — the audio
    * analog of [[encodePng]]: a genuine container round-trip per row,
    * not a synthetic header. */
  private[ops] def encodeWav(id: Long): Array[Byte] = {
    val x = pcmSamples(id)
    val data = ByteBuffer.allocate(2 * x.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    x.foreach(data.putShort)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data.array()), WavFormat, x.length)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Decode a WAV payload through `AudioSystem` back to int16 samples,
    * refusing anything but the 16-bit mono PCM contract (a real
    * pipeline would transcode here; the fixture must round-trip). */
  private[ops] def decodeWav(payload: Array[Byte], docId: Long): Array[Short] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val f = ais.getFormat
    require(f.getEncoding ==
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
      f.getSampleSizeInBits == 16 && f.getChannels == 1,
      s"doc $docId: unsupported WAV format $f — need 16-bit mono PCM")
    val n = ais.getFrameLength.toInt
    val raw = ais.readNBytes(n * 2)
    require(raw.length == n * 2, s"doc $docId: truncated WAV data")
    val bb = ByteBuffer.wrap(raw).order(
      if (f.isBigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val x = new Array[Short](n)
    var i = 0
    while (i < n) { x(i) = bb.getShort(); i += 1 }
    x
  }

  /** Audio feature extraction: WAV binary column → per-partition batch
    * decode through the REAL in-JDK codec (`javax.sound.sampled`
    * RIFF/WAVE, the audio analog of the PNG leg) → overlapping frame
    * windows (400 samples, hop 200) → integer frame energy Σx² (no
    * sqrt — exact in both engines). The oracle recomputes every sample
    * arithmetically, so the int16 encode→WAV container→decode
    * round-trip and the window indexing are both pinned, not just the
    * plumbing. Zero shuffle until the harness sort; frames per doc
    * ride an iterator, never a materialized array-of-frames. */
  val audioFrames: (SparkSession, String) => DataFrame = (s, dir) => {
    import s.implicits._
    val wav = Tables.load(s, dir, "documents").select(col("doc_id"))
      .filter(col("doc_id") % 3 === 1)
      .as[Long].map(id => Asset(id, "audio", encodeWav(id)))
    wav.mapPartitions { it =>
      it.flatMap { a =>
        val x = decodeWav(a.payload, a.doc_id)
        val nf = (x.length - 400) / 200 + 1
        (0 until nf).iterator.map { k =>
          var e = 0L
          var j = 0
          while (j < 400) { val v = x(k * 200 + j).toLong; e += v * v; j += 1 }
          (a.doc_id, k.toLong, e)
        }
      }
    }.toDF("doc_id", "frame", "energy")
      .orderBy("doc_id", "frame")
  }

  val audioFramesSql: String = {
    val sample = "((doc_id * 7919 + (frame * 200 + j) * 104729) % 4096 - 2048)"
    s"""WITH a AS (SELECT doc_id, CAST(doc_id % 400 + 800 AS BIGINT) AS n
       |  FROM documents WHERE doc_id % 3 = 1),
       |f AS (SELECT doc_id, unnest(range(0, (n - 400) // 200 + 1)) AS frame
       |  FROM a)
       |SELECT doc_id, CAST(frame AS BIGINT) AS frame,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(range(0, 400), j -> $sample * $sample)),
       |    (acc, v) -> acc + v) AS energy
       |FROM f ORDER BY doc_id, frame""".stripMargin
  }

  /** Perceptual-hash image dedup (dHash): each REAL decoded PNG is
    * sampled on a nearest-neighbor 9×8 grid, horizontally adjacent
    * samples compare into 64 gradient bits, and near-duplicate images
    * are found by Hamming distance ≤ 12 over LSH bands — the image-side
    * analog of [[PipelineQueries]]' SimHash text dedup. The 64-bit hash
    * rides as two 32-bit halves (`h_lo`/`h_hi`) so neither engine ever
    * shifts into a BIGINT sign bit; the oracle reproduces the grid
    * sampling and bit packing arithmetically from the pixel formula, so
    * a codec or sampling drift flips a hash cell, not just a count.
    *
    * Scale shape: decode+hash is a per-partition map (no shuffle);
    * candidate generation shuffles once on 16-bit band keys, so
    * candidates ∝ images sharing an intact band — near-duplicates,
    * never all-pairs. Recall is the standard LSH trade: a 12-bit
    * difference that scatters across all 4 bands escapes (13 bands
    * would make recall exact at distance 12); the oracle applies the
    * SAME banding, so the contract it pins is the operator's declared
    * semantics, not an idealized all-pairs sweep. The partner count
    * joins back keyed on doc_id. */
  val phash: (SparkSession, String) => DataFrame = (s, dir) => {
    import s.implicits._
    val imgs = assetsFromDocuments(s, dir).filter(_.media_type == "image")
    val hashed = imgs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(a.payload))
        require(img != null, s"PNG decode failed for doc ${a.doc_id}")
        val (w, h) = (img.getWidth, img.getHeight)
        def g(cx: Int, cy: Int): Int =
          img.getRGB(cx * w / 9, cy * h / 8) & 0xff
        var lo = 0L
        var hi = 0L
        var k = 0
        while (k < 64) {
          val cy = k / 8
          val cx = k % 8
          if (g(cx + 1, cy) > g(cx, cy)) {
            if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
          }
          k += 1
        }
        (a.doc_id, lo, hi)
      }
      // Checkpoint pins the decoded hashes: the frame feeds three
      // plan branches (both self-join sides + the count join-back) and
      // without it EACH branch re-runs the PNG decode — 3× the only
      // expensive work in the query (the ConnectedComponents
      // precedent). 24 bytes/image of state, any corpus size; the
      // PREVIOUS invocation's blocks release on re-entry
      // (CheckpointScope) instead of lingering until ContextCleaner.
    }.toDF("doc_id", "h_lo", "h_hi")
    val pinned = graft.ops.CheckpointScope.checkpoint("phash.hashes", hashed)
    val bands = pinned.select(col("doc_id"), col("h_lo"), col("h_hi"),
      posexplode(array(col("h_lo") % 65536L, expr("h_lo DIV 65536"),
        col("h_hi") % 65536L, expr("h_hi DIV 65536")))
        .as(Seq("band", "bkey")))
    // alias() self-join (not re-select): both sides canonicalize to the
    // same plan, so the band-key exchange is computed once
    // (ReusedExchange) — the dedupEmbedLsh pattern.
    val near = bands.alias("a")
      .join(bands.alias("b"), col("a.band") === col("b.band") &&
        col("a.bkey") === col("b.bkey") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.h_lo").as("alo"), col("a.h_hi").as("ahi"),
        col("b.h_lo").as("blo"), col("b.h_hi").as("bhi")).distinct()
      .filter(expr(
        "bit_count(alo ^ blo) + bit_count(ahi ^ bhi) <= 12"))
    val cnt = near.select(col("da").as("doc_id"))
      .union(near.select(col("db").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_near"))
    pinned.join(cnt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("h_lo"), col("h_hi"),
        coalesce(col("n_near"), lit(0L)).as("n_near"))
      .orderBy("doc_id")
  }

  val phashSql: String = {
    def gAt(cx: String, cy: String): String =
      s"(doc_id*31 + ((($cx)*w)//9)*7 + ((($cy)*h)//8)*13) % 256"
    val bit = s"CASE WHEN ${gAt("k%8+1", "k//8")} > ${gAt("k%8", "k//8")}"
    s"""WITH img AS (SELECT doc_id, CAST(doc_id % 13 + 4 AS BIGINT) AS w,
       |    CAST(doc_id % 11 + 4 AS BIGINT) AS h
       |  FROM documents WHERE doc_id % 3 = 0),
       |hx AS (SELECT doc_id,
       |    CAST(list_sum(list_transform(range(0, 32), k ->
       |      $bit THEN CAST(1 AS BIGINT) << k ELSE 0 END)) AS BIGINT) AS h_lo,
       |    CAST(list_sum(list_transform(range(32, 64), k ->
       |      $bit THEN CAST(1 AS BIGINT) << (k - 32) ELSE 0 END)) AS BIGINT)
       |      AS h_hi
       |  FROM img),
       |b AS (SELECT doc_id, h_lo, h_hi, u.band,
       |    CASE u.band WHEN 0 THEN h_lo % 65536 WHEN 1 THEN h_lo // 65536
       |         WHEN 2 THEN h_hi % 65536 ELSE h_hi // 65536 END AS bkey
       |  FROM hx, unnest([0, 1, 2, 3]) AS u(band)),
       |p AS (SELECT DISTINCT x.doc_id AS da, y.doc_id AS db,
       |    x.h_lo AS alo, x.h_hi AS ahi, y.h_lo AS blo, y.h_hi AS bhi
       |  FROM b x JOIN b y ON x.band = y.band AND x.bkey = y.bkey
       |    AND x.doc_id < y.doc_id),
       |near AS (SELECT da, db FROM p
       |  WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 12),
       |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_near FROM (
       |    SELECT da AS doc_id FROM near
       |    UNION ALL SELECT db AS doc_id FROM near)
       |  GROUP BY doc_id)
       |SELECT hx.doc_id, hx.h_lo, hx.h_hi,
       |  coalesce(cnt.n_near, 0) AS n_near
       |FROM hx LEFT JOIN cnt ON hx.doc_id = cnt.doc_id
       |ORDER BY hx.doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_features" -> features,
    "q_multimodal_frames" -> framePipeline,
    "q_multimodal_audio" -> audioFrames,
    "q_multimodal_phash" -> phash,
  )

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_features" -> featuresSql,
    "q_multimodal_frames" -> framePipelineSql,
    "q_multimodal_audio" -> audioFramesSql,
    "q_multimodal_phash" -> phashSql,
  )
}
