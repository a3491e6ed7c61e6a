package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compression-ratio quality signal (engine-added): how small a document
  * deflates is a cheap, language-agnostic proxy for repetitiveness —
  * boilerplate, keyword stuffing, and generated spam compress far better
  * than natural prose, so corpus-curation pipelines (Gopher/C4 lineage)
  * gate on it next to the n-gram repetition ratios in
  * [[Curation]]/[[graft.functions.TextFns]].
  *
  * Scale shape: a pure per-row map — one reused `Deflater` (native zlib
  * state) per PARTITION, reset per document, no shuffle, no driver data
  * path. The JDK codec-in-mapPartitions idiom of [[Multimodal]], applied
  * to text.
  */
object Compressibility {

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("raw_len", LongType, nullable = false),
    StructField("deflate_len", LongType, nullable = false),
    StructField("ratio_pct", LongType, nullable = false)))

  /** Per-document deflate stats: UTF-8 byte length, raw-deflate output
    * length at `level`, and the integer percentage
    * floor(100·deflate/raw) (0 for empty docs). Deterministic for a
    * fixed zlib level — the golden oracle pins exact byte counts. */
  def deflateStats(df: DataFrame, idCol: String, textCol: String,
                   level: Int = 9): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol), col(textCol)).rdd.mapPartitions { rows =>
      val defl = new java.util.zip.Deflater(level, /* nowrap = */ true)
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => defl.end()))
      val buf = new Array[Byte](8192)
      rows.map { r =>
        val id = r.getLong(0)
        val text = if (r.isNullAt(1)) "" else r.getString(1)
        val in = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        defl.reset(); defl.setInput(in); defl.finish()
        var n = 0L
        while (!defl.finished()) n += defl.deflate(buf)
        val pct = if (in.length == 0) 0L else 100L * n / in.length
        Row(id, in.length.toLong, n, pct)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
