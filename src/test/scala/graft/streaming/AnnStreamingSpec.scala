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

  test("fresh streaming enrichment: batch-2 queries hit batch-1 vectors") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val streamed = rows(AnnStreaming.enrichTopKFresh(spark, sfDir, k = 5))

    // batch replay of the SAME lifecycle: base index over vec_id >= 10,
    // batch a (ids < 5) enriched then appended, batch b enriched against
    // base ∪ a — exact equality, stage by stage
    val embs = Tables.embeddings(spark, sfDir)
    val idx = "/root/repo/target/tmp/spec_annfresh_replay"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
    Similarity.writeIvfPqIndex(embs.filter($"vec_id" >= 10), idx)
    val a = embs.filter($"vec_id" < 5)
    val b = embs.filter($"vec_id" >= 5 && $"vec_id" < 10)
    val wantA = rows(Similarity.ivfPqTopKIndexed(a, idx, k = 5)
      .localCheckpoint(true))
    Similarity.appendToIvfPqIndex(a, idx)
    val wantB = rows(Similarity.ivfPqTopKIndexed(b, idx, k = 5))
    assert(streamed === wantA ++ wantB,
      "streamed enrich-then-append must equal the staged batch lifecycle")

    // freshness is observable, not incidental: stream TWIN vectors —
    // batch x0 re-labels ids 0..4 as 1000.., batch x1 re-labels the SAME
    // embeddings as 2000.. — so each x1 query's nearest neighbour set
    // must contain a vector that only entered the index via x0's append
    val twin0 = a.select(($"vec_id" + 1000L).as("vec_id"), $"embedding")
    val twin1 = a.select(($"vec_id" + 2000L).as("vec_id"), $"embedding")
    val fresh = AnnStreaming.enrichTopKFresh(spark, sfDir, k = 5,
      extraBatches = Seq(twin0, twin1))
    val hit = fresh.filter($"q_id" >= 2000L && $"n_id" >= 1000L && $"n_id" < 2000L)
    assert(hit.count() > 0,
      "a twin query must retrieve its streamed-in twin vector")
  }

  test("retried index append is idempotent under dedupe, even when torn") {
    val embs = Tables.embeddings(spark, sfDir)
    val idx = "/root/repo/target/tmp/spec_annfresh_retry"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idx))
    Similarity.writeIvfPqIndex(embs.filter($"vec_id" >= 10), idx)
    val batch = embs.filter($"vec_id" < 5)
    def sizes() = Seq("lists", "codes", "vectors")
      .map(t => spark.read.parquet(s"$idx/$t").count())
    Similarity.appendToIvfPqIndex(batch, idx, dedupe = true)
    val once = sizes()
    // a full retry (foreachBatch re-fired after an ack-lost crash)
    Similarity.appendToIvfPqIndex(batch, idx, dedupe = true)
    assert(sizes() == once, "a retried append must not double-add")
    // a TORN retry: simulate a crash after lists landed but before
    // codes/vectors by appending a second batch's lists only, then
    // retrying the whole append — the done piece must not duplicate and
    // the missing pieces must complete
    val batch2 = embs.filter($"vec_id" >= 5 && $"vec_id" < 10)
    Similarity.assignClustersQ(Similarity.quantizeCorpus(batch2),
        spark.read.parquet(s"$idx/centroids"))
      .write.mode("append").parquet(s"$idx/lists")
    Similarity.appendToIvfPqIndex(batch2, idx, dedupe = true)
    val after = sizes()
    // lists/vectors hold 1 row per vector, codes m=8: the torn piece
    // (lists) must not duplicate, the missing pieces must complete
    assert(after == Seq(once(0) + 5, once(1) + 40, once(2) + 5),
      s"torn retry must converge, got $once -> $after")
    assert(spark.read.parquet(s"$idx/vectors").select("vec_id")
      .distinct().count() == after(2))
  }
}
