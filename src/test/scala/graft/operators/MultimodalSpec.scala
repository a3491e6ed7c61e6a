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

  test("real PNG codec round-trips pixel-exactly via javax.imageio") {
    val docs = Tables.documents(spark, sfDir).filter($"doc_id" < 50)
    val feats = Multimodal.decodeImageFeatures(Multimodal.imageTable(docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    (0L until 50L).foreach { id =>
      val w = 8 + (id % 9).toInt; val h = 8 + (id % 7).toInt
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        sr += (id * 31 + x * 7 + y * 13) % 256
        sg += (id + x * y) % 256
        sb += (x + 3 * y) % 256
      }
      val f = feats(id)
      assert(f.getInt(1) === w && f.getInt(2) === h)
      assert(f.getInt(3) === 3)
      assert((f.getLong(4), f.getLong(5), f.getLong(6)) === ((sr, sg, sb)))
    }
  }

  test("real WAV codec round-trips sample-exactly via javax.sound.sampled") {
    val docs = Tables.documents(spark, sfDir).filter($"doc_id" < 50)
    val feats = Multimodal.decodeAudioFeatures(Multimodal.audioTable(docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    (0L until 50L).foreach { id =>
      val n = 40 + (id % 81).toInt
      val samples = (0 until n).map(i => (id * 31 + i * 7919) % 65536 - 32768)
      val f = feats(id)
      assert(f.getInt(1) === 8000 + (id % 3).toInt * 4000, s"rate for $id")
      assert(f.getInt(2) === 1 && f.getInt(3) === 16)
      assert(f.getLong(4) === n.toLong)
      assert(f.getLong(5) === samples.map(math.abs).sum, s"sum_abs for $id")
      assert(f.getLong(6) === samples.map(math.abs).max, s"max_abs for $id")
    }
  }

  test("real GIF codec round-trips frames palette-exactly and samples by stride") {
    val docs = Tables.documents(spark, sfDir).filter($"doc_id" < 50)
    val feats = Multimodal.decodeVideoFeatures(Multimodal.videoTable(docs), stride = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    (0L until 50L).foreach { id =>
      val w = 4 + (id % 5).toInt; val h = 4 + (id % 3).toInt
      val n = 2 + (id % 5).toInt
      val sampledFrames = (0 until n by 2)
      val sumRgb = sampledFrames.map { f =>
        w.toLong * h * ((id * 31 + f * 7) % 256 + (id + f * 11) % 256 + (id * 5 + f * 3) % 256)
      }.sum
      val r = feats(id)
      assert(r.getLong(1) === n.toLong, s"n_frames for $id")
      assert(r.getInt(2) === w && r.getInt(3) === h, s"dims for $id")
      assert(r.getLong(4) === sampledFrames.size.toLong, s"n_sampled for $id")
      assert(r.getLong(5) === sumRgb, s"sum_rgb for $id")
    }
  }

  test("stride=1 decodes every frame; undecodable video degrades to a sentinel row") {
    val docs = Tables.documents(spark, sfDir).filter($"doc_id" < 10)
    val all = Multimodal.decodeVideoFeatures(Multimodal.videoTable(docs), stride = 1)
      .collect().map(r => r.getLong(0) -> r).toMap
    (0L until 10L).foreach { id =>
      assert(all(id).getLong(4) === all(id).getLong(1), s"stride=1 samples all frames for $id")
    }
    val junk = Seq((1L, Array[Byte](71, 73, 70, 56)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "media")
    val out = Multimodal.decodeVideoFeatures(junk)
      .collect().map(r => r.getLong(0) -> r).toMap
    Seq(1L, 2L).foreach { id =>
      assert(out(id).getLong(1) === -1L && out(id).getLong(5) === 0L)
    }
  }

  test("undecodable audio degrades to a sentinel row") {
    val junk = Seq((1L, Array[Byte](82, 73, 70, 70)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "media")
    val out = Multimodal.decodeAudioFeatures(junk)
      .collect().map(r => r.getLong(0) -> r).toMap
    Seq(1L, 2L).foreach { id =>
      assert(out(id).getInt(1) === -1 && out(id).getLong(5) === 0L)
    }
  }

  test("undecodable payloads degrade to a sentinel row, never kill the job") {
    val junk = Seq((1L, Array[Byte](1, 2, 3)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "media")
    val out = Multimodal.decodeImageFeatures(junk)
      .collect().map(r => r.getLong(0) -> r).toMap
    Seq(1L, 2L).foreach { id =>
      assert(out(id).getInt(1) === -1 && out(id).getLong(4) === 0L)
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

  test("resize re-encode is lossless; dhash collides exactly on identical pixels") {
    import org.apache.spark.sql.functions._
    val imgs = Multimodal.imageTable(Tables.documents(spark, sfDir).limit(20))
    val resized = Multimodal.resizeImages(imgs, 6, 5).cache()
    // decoding the re-encoded thumbnail must reproduce the sums the
    // resize loop computed — PNG round-trip is lossless or the hash lies
    val redecoded = Multimodal.decodeImageFeatures(
      resized.select(col("doc_id"), col("media")))
    val a = resized.select("doc_id", "sum_r", "sum_g", "sum_b")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val b = redecoded.select("doc_id", "sum_r", "sum_g", "sum_b")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(a === b)
    // identical media bytes hash identically; a planted byte-copy under a
    // new id is found by the exact hash groupBy — no pairwise pass
    val one = imgs.filter(col("doc_id") === 1L)
      .select(lit(100001L).as("doc_id"), col("media"))
    val hashes = Multimodal.dHashImages(imgs.unionByName(one))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) == hashes(100001L))
    resized.unpersist()
  }
}
