package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for the LLM-data-pipeline surface.
  *
  * Media assets are opaque `binary` columns with a typed metadata struct —
  * the 100 TB shape: bytes stay columnar in parquet, metadata prunes
  * without touching payloads, and per-row decode runs inside
  * `mapPartitions` (one decoder per partition, not per row — the same
  * shape the reference needed for its per-listing HTTP enrichment,
  * pipeline.py:509-523).
  *
  * Four decode paths — one per modality plus a codec-agnostic baseline:
  *  - [[decodeImageFeatures]] — a REAL codec: `javax.imageio` PNG
  *    round-trip (JDK-builtin, no extra dependency), pixel-exact and
  *    oracle-checked against the generative formula of the fixture.
  *  - [[decodeAudioFeatures]] — a REAL codec: `javax.sound.sampled`
  *    WAV/PCM round-trip (also JDK-builtin), sample-exact, same oracle
  *    discipline.
  *  - [[decodeVideoFeatures]] — a REAL codec: `javax.imageio` animated-GIF
  *    multi-frame round-trip with strided frame sampling, palette-exact,
  *    same oracle discipline.
  *  - [[decodeFeatures]] — the original codec-agnostic byte-feature pass,
  *    kept as the baseline for payloads no JDK codec reads. */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))))

  /** Build a media table from `documents`: payload = UTF-8 bytes of the
    * text (a deterministic stand-in for image/audio bytes), metadata
    * derived from doc fields. */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      struct(
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height")).as("meta"))

  /** FAKE decode: deterministic features from raw bytes. All three
    * modalities now have real JDK codecs below (PNG/WAV/GIF); this stays
    * as the codec-agnostic baseline for container formats the JDK can't
    * read — the imperative per-partition loop is the real part. */
  private[operators] def fakeDecode(bytes: Array[Byte]): (Long, Int, Long) = {
    if (bytes == null || bytes.isEmpty) (0L, -1, 0L)
    else {
      var checksum = 0L
      var i = 0
      while (i < bytes.length) { checksum += bytes(i) & 0xff; i += 1 }
      (bytes.length.toLong, bytes(0) & 0xff, checksum % 997)
    }
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("n_bytes", LongType),
    StructField("head_byte", IntegerType),
    StructField("checksum", LongType),
    StructField("n_frames", LongType)))

  /** Per-partition imperative decode → typed feature rows. This is the
    * mapPartitions escape hatch (SURVEY §2.12 last resort) used where it's
    * genuinely warranted: opaque bytes, imperative decoder, one decoder
    * instance per partition. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("doc_id", "media", "meta.kind").rdd.mapPartitions { rows =>
      // per-partition decoder init would go here (codec handles, buffers)
      rows.map { r =>
        val (nBytes, headByte, checksum) = fakeDecode(r.getAs[Array[Byte]]("media"))
        Row(r.getAs[Long]("doc_id"), r.getAs[String]("kind"),
          nBytes, headByte, checksum, nBytes / 1000L + 1L)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Frame-sampling stub: byte offsets every `stride` bytes — the batch
    * shape of video frame extraction (array column per asset), without a
    * codec. Pure expression, no UDF. */
  def frameOffsets(media: DataFrame, stride: Int): DataFrame =
    media.withColumn("frame_offsets",
      sequence(lit(0L), greatest(octet_length(col("media")).cast("long") - 1, lit(0L)),
        lit(stride.toLong)))

  // ── REAL image codec path (JDK javax.imageio — PNG/BMP/GIF/JPEG) ─────

  /** Deterministic synthetic PNG: every channel of pixel (x, y) is a
    * closed-form function of (docId, x, y), so an oracle can recompute
    * the DECODED pixel sums arithmetically while the Spark side really
    * encodes and decodes PNG bytes. PNG is lossless → decode returns
    * exactly these values or the feature sums diverge. */
  private[operators] def syntheticPng(docId: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((docId * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((docId + x * y) % 256).toInt
        val b = ((x + 3 * y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val imageSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType)))

  /** Media table of real PNG payloads, dimensions derived from doc_id
    * (8–16 × 8–14). Encoding runs per partition — the write-side twin of
    * [[decodeImageFeatures]]'s decode loop. */
  def imageTable(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    val rdd = documents.select("doc_id").rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // see decodeImageFeatures
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, syntheticPng(id, 8 + (id % 9).toInt, 8 + (id % 7).toInt))
      }
    }
    spark.createDataFrame(rdd, imageSchema)
  }

  private val imageFeatureSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType)))

  // ── REAL audio codec path (JDK javax.sound.sampled — WAV/PCM) ────────

  /** Deterministic synthetic WAV: 16-bit signed PCM mono where sample i
    * is a closed-form function of (docId, i), encoded through the real
    * `AudioSystem` WAV writer. PCM in a WAV container is lossless →
    * [[decodeAudioFeatures]] must read back exactly these values (and
    * the header's rate/channels/bits), or the feature sums diverge —
    * the audio twin of [[syntheticPng]]. */
  private[operators] def syntheticWav(docId: Long, n: Int, rate: Int): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (((docId * 31 + i * 7919) % 65536) - 32768).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private val audioSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType)))

  /** Media table of real WAV payloads: 40–120 samples at one of three
    * sample rates, both derived from doc_id. Encoding runs per
    * partition — the write-side twin of [[decodeAudioFeatures]]. */
  def audioTable(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    val rdd = documents.select("doc_id").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, syntheticWav(id, 40 + (id % 81).toInt, 8000 + (id % 3).toInt * 4000))
      }
    }
    spark.createDataFrame(rdd, audioSchema)
  }

  private val audioFeatureSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_samples", LongType),
    StructField("sum_abs", LongType),
    StructField("max_abs", LongType)))

  /** REAL decode: `AudioSystem.getAudioInputStream` per asset inside
    * `mapPartitions` → header fields (rate, channels, bits) + amplitude
    * stats over the decoded 16-bit samples (integer sums — the repo's
    * determinism discipline). Undecodable payloads degrade to a
    * (-1, -1, -1, 0, 0, 0) row instead of failing the partition, like
    * the image path. */
  def decodeAudioFeatures(audios: DataFrame): DataFrame = {
    val spark = audios.sparkSession
    val rdd = audios.select("doc_id", "media").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]]("media")
        val decoded =
          try {
            if (bytes == null) None
            else {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(bytes))
              val fmt = ais.getFormat
              val pcm = ais.readAllBytes()
              Some((fmt, pcm))
            }
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => None
            case _: java.io.IOException => None
          }
        decoded match {
          case None => Row(id, -1, -1, -1, 0L, 0L, 0L)
          case Some((fmt, pcm)) =>
            val le = !fmt.isBigEndian
            var sumAbs = 0L; var maxAbs = 0L
            var i = 0
            while (i + 1 < pcm.length) {
              val s =
                if (le) ((pcm(i + 1) << 8) | (pcm(i) & 0xff)).toShort.toInt
                else ((pcm(i) << 8) | (pcm(i + 1) & 0xff)).toShort.toInt
              val a = math.abs(s.toLong)
              sumAbs += a
              if (a > maxAbs) maxAbs = a
              i += 2
            }
            Row(id, fmt.getSampleRate.toInt, fmt.getChannels,
              fmt.getSampleSizeInBits, (pcm.length / 2).toLong, sumAbs, maxAbs)
        }
      }
    }
    spark.createDataFrame(rdd, audioFeatureSchema)
  }

  // ── REAL video codec path (JDK javax.imageio — animated GIF) ─────────

  /** Deterministic synthetic animated GIF: `nFrames` solid-color frames
    * whose RGB is a closed-form function of (docId, frame), written
    * through the real `ImageIO` GIF sequence writer. The JDK GIF encoder
    * is lossless for frames with ≤256 distinct colors (the palette IS the
    * color set), so [[decodeVideoFeatures]] must read back exactly these
    * values — the video sibling of [[syntheticPng]]/[[syntheticWav]]. */
  private[operators] def syntheticGif(docId: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val r = ((docId * 31 + f * 7) % 256).toInt
      val g = ((docId + f * 11) % 256).toInt
      val b = ((docId * 5 + f * 3) % 256).toInt
      val rgb = (r << 16) | (g << 8) | b
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  private val videoSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType)))

  /** Media table of real animated-GIF payloads: 2–6 frames of 4–8 × 4–6
    * pixels, all derived from doc_id. Encoding runs per partition — the
    * write-side twin of [[decodeVideoFeatures]]. */
  def videoTable(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    val rdd = documents.select("doc_id").rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // see decodeImageFeatures
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, syntheticGif(id, 4 + (id % 5).toInt, 4 + (id % 3).toInt,
          2 + (id % 5).toInt))
      }
    }
    spark.createDataFrame(rdd, videoSchema)
  }

  private val videoFeatureSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_frames", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_sampled", LongType),
    StructField("sum_rgb", LongType)))

  /** REAL decode + frame sampling: one GIF `ImageReader` per partition,
    * `getNumImages` for the frame count, then only every `stride`-th
    * frame is decoded (frames 0, stride, 2·stride, …) — the batch shape
    * of production video ingestion, where decoding every frame of every
    * asset is the classic 100 TB mistake. Features: frame count, frame-0
    * dimensions, and the summed RGB mass of the sampled frames (integer
    * sums — the repo's determinism discipline). Undecodable payloads
    * degrade to a (-1, …) row instead of failing the partition. */
  def decodeVideoFeatures(videos: DataFrame, stride: Int = 2): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = videos.sparkSession
    val rdd = videos.select("doc_id", "media").rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      // one reader instance per partition, re-targeted per asset
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]]("media")
        val decoded =
          try {
            if (bytes == null) None
            else {
              reader.setInput(javax.imageio.ImageIO.createImageInputStream(
                new java.io.ByteArrayInputStream(bytes)))
              val n = reader.getNumImages(true)
              if (n <= 0) None
              else {
                var w = -1; var h = -1
                var sampled = 0L; var sumRgb = 0L
                var f = 0
                while (f < n) {
                  val img = reader.read(f)
                  if (f == 0) { w = img.getWidth; h = img.getHeight }
                  var y = 0
                  while (y < img.getHeight) {
                    var x = 0
                    while (x < img.getWidth) {
                      val p = img.getRGB(x, y)
                      sumRgb += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
                      x += 1
                    }
                    y += 1
                  }
                  sampled += 1
                  f += stride
                }
                Some((n.toLong, w, h, sampled, sumRgb))
              }
            }
          } catch { case _: java.io.IOException => None }
        decoded match {
          case None => Row(id, -1L, -1, -1, 0L, 0L)
          case Some((n, w, h, sampled, sumRgb)) => Row(id, n, w, h, sampled, sumRgb)
        }
      }
    }
    spark.createDataFrame(rdd, videoFeatureSchema)
  }

  /** REAL decode: `ImageIO.read` per asset inside `mapPartitions` →
    * (width, height, channels, per-channel pixel sums). Undecodable
    * payloads degrade to a (-1, -1, -1, 0, 0, 0) row instead of failing
    * the partition — at 100 TB a corrupt asset must never kill the job. */
  def decodeImageFeatures(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    val rdd = images.select("doc_id", "media").rdd.mapPartitions { rows =>
      // ImageIO defaults to a DISK-backed stream cache (a temp file per
      // read) — pure overhead for in-memory byte arrays, and the temp-dir
      // traffic serializes a 32-thread decode loop. Per-JVM flag, set
      // once per partition (idempotent).
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]]("media")
        val img =
          try {
            if (bytes == null) null
            else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          } catch { case _: java.io.IOException => null }
        if (img == null) Row(id, -1, -1, -1, 0L, 0L, 0L)
        else {
          val w = img.getWidth
          val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          Row(id, w, h, img.getColorModel.getNumComponents, sr, sg, sb)
        }
      }
    }
    spark.createDataFrame(rdd, imageFeatureSchema)
  }

  private val resizedSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType)))

  /** RESIZE to (outW × outH) by deterministic NEAREST-NEIGHBOR sampling —
    * source pixel (x·srcW ∕ outW, y·srcH ∕ outH), integer floor division,
    * the mapping a replay oracle can recompute exactly (Graphics2D
    * interpolation is platform-vague; a manual loop is bit-pinned). The
    * thumbnail re-encodes as PNG (lossless) next to its RGB sums —
    * decode → transform → re-encode, the full multimodal pipeline hop.
    * mapPartitions like every codec loop here; per-image cost O(outW·outH)
    * regardless of source size. */
  def resizeImages(images: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW >= 1 && outH >= 1, "bad thumbnail dims")
    val spark = images.sparkSession
    val rdd = images.select("doc_id", "media").rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]]("media")
        val img =
          try {
            if (bytes == null) null
            else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          } catch { case _: java.io.IOException => null }
        if (img == null) Row(id, null, -1, -1, 0L, 0L, 0L)
        else {
          val w = img.getWidth
          val h = img.getHeight
          val out = new java.awt.image.BufferedImage(
            outW, outH, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < outH) {
            val sy = y * h / outH
            var x = 0
            while (x < outW) {
              val p = img.getRGB(x * w / outW, sy)
              out.setRGB(x, y, p)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Row(id, bos.toByteArray, outW, outH, sr, sg, sb)
        }
      }
    }
    spark.createDataFrame(rdd, resizedSchema)
  }

  private val dhashSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("dhash", LongType)))

  /** Perceptual difference-hash (dHash) — the image near-dup fingerprint:
    * an 8×8 grayscale grid sampled nearest-neighbor (col x → x·w∕8,
    * row y → y·h∕8), one bit per horizontal neighbor pair
    * (gray[x+1] > gray[x]), 7 bits × 8 rows = 56 bits (BIGINT-positive by
    * construction; bit index y·7+x). Gray is the integer (r+g+b)∕3.
    * Visually identical images at different encodings or mild rescales
    * collide — the multimodal sibling of SimHash; dedup is then an exact
    * groupBy on the hash, no pairwise pass. */
  def dHashImages(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    val rdd = images.select("doc_id", "media").rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]]("media")
        val img =
          try {
            if (bytes == null) null
            else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          } catch { case _: java.io.IOException => null }
        if (img == null) Row(id, null)
        else {
          val w = img.getWidth
          val h = img.getHeight
          def gray(gx: Int, gy: Int): Int = {
            val p = img.getRGB(gx * w / 8, gy * h / 8)
            (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
          }
          var hash = 0L
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 7) {
              if (gray(x + 1, y) > gray(x, y)) hash |= 1L << (y * 7 + x)
              x += 1
            }
            y += 1
          }
          Row(id, hash)
        }
      }
    }
    spark.createDataFrame(rdd, dhashSchema)
  }
}
