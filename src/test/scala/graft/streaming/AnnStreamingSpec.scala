package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class AnnStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streamed ANN enrichment equals the one-shot indexed answer, across 2 micro-batches") {
    val out = AnnStreaming.enrichTopK(spark, sfDir, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val sfKey = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val idxDir = s"${sys.props("user.dir")}/target/ann_index_${sfKey}_c16i2m8k16"
    val qs = Tables.embeddings(spark, sfDir).filter($"vec_id" < 10)
    val oneShot = Similarity.ivfPqTopKIndexed(qs, idxDir, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out === oneShot)
    // the stream really ran as two micro-batches (one per staged file)
    val ckpt = s"${sys.props("user.dir")}/target/tmp/stream/ann_$sfKey/ckpt/offsets"
    val batches = new java.io.File(ckpt).list().count(!_.startsWith("."))
    assert(batches === 2, s"expected 2 micro-batches, saw $batches offset files")
  }
}
