package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table carries opaque bytes + typed metadata") {
    val media = Multimodal.mediaTable(Tables.documents(spark, sfDir))
    val row = media.orderBy("doc_id").head()
    assert(row.schema("media").dataType.typeName === "binary")
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(Set("image", "audio", "video").contains(meta.getAs[String]("kind")))
  }

  test("decodeFeatures computes byte-exact features via mapPartitions") {
    val docs = Tables.documents(spark, sfDir)
    val feats = Multimodal.decodeFeatures(Multimodal.mediaTable(docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    val raw = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    raw.take(20).foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val f = feats(id)
      assert(f.getAs[Long]("n_bytes") === bytes.length.toLong)
      assert(f.getAs[Int]("head_byte") === (bytes(0) & 0xff))
      assert(f.getAs[Long]("checksum") === bytes.map(_ & 0xff).map(_.toLong).sum % 997)
      assert(f.getAs[Long]("n_frames") === bytes.length / 1000L + 1L)
    }
  }

  test("frame offsets stride the payload") {
    val out = Multimodal.frameOffsets(
        Multimodal.mediaTable(Tables.documents(spark, sfDir)), stride = 100)
      .select($"doc_id", size($"frame_offsets").as("n"), octet_length($"media").as("len"))
      .collect()
    out.foreach { r =>
      assert(r.getInt(1) === (r.getInt(2) - 1) / 100 + 1)
    }
  }
}
