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
  * The decode step itself is a clearly-marked deterministic FAKE — this
  * container has no image/audio codecs. The Spark-side plumbing (schema,
  * batching, partition-parallel imperative code, feature schema) is real
  * and tested; swap `fakeDecode` for a codec call in production.
  */
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

  /** FAKE decode: deterministic features from raw bytes. Stands in for
    * "decode image → extract features"; the imperative per-partition loop
    * is the real part. */
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
}
