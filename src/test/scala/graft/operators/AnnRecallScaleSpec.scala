package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall@5 for every ANN rung at sf0.1 (2 000 vectors — 4× the sf0.001
  * corpus the per-operator specs pin): list occupancy, bucket width, and
  * shortlist pressure all scale with the corpus, so a floor measured
  * only at the small SF can hide an nprobe / rerank cliff. Floors here
  * sit just under the measured values at BOTH scales; a structural
  * regression (probe ranking, list assignment, shortlist size) lands
  * well below them.
  *
  * Skippable via SPARK_GRAFT_SKIP_SCALE_RECALL=1 for quick local loops;
  * the default run keeps the scale floor continuously asserted. */
class AnnRecallScaleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = Tables.embeddings(spark, "/root/testdata/sf0.1")
  private lazy val queries = embs.filter($"vec_id" < 20)
  private lazy val brute =
    Similarity.bruteForceTopK(embs, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet

  private def recallOf(df: DataFrame): Double = {
    val got = df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    (brute & got).size.toDouble / brute.size
  }

  private def scaleRecallTest(name: String, floor: Double)(mk: => DataFrame): Unit =
    test(s"$name recall@5 at sf0.1 holds its floor") {
      assume(sys.env.get("SPARK_GRAFT_SKIP_SCALE_RECALL").isEmpty)
      val recall = recallOf(mk)
      info(f"$name recall@5 @ sf0.1 = $recall%.3f (floor $floor%.2f)")
      assert(recall >= floor, f"$name recall@5 $recall%.3f below $floor%.2f")
    }

  scaleRecallTest("LSH", 0.80) { Similarity.lshTopK(embs, queries, k = 5) }
  scaleRecallTest("IVF", 0.70) { Similarity.ivfTopK(embs, queries, k = 5) }
  // the scale cliff this suite exists to catch, measured and pinned:
  // PQ's default rerank=64 shortlist is 13% of the sf0.001 corpus but
  // 3% at sf0.1, and 8 4-bit-ish codes rank coarsely — recall drops to
  // ~0.65. The production response is scaling rerank with the corpus,
  // which restores it (asserted below) — the knob exists for exactly
  // this; q_ann_pq's oracle stays pinned at the documented 64.
  scaleRecallTest("PQ (rerank=64)", 0.60) { Similarity.pqTopK(embs, queries, k = 5) }
  scaleRecallTest("PQ (rerank=256)", 0.80) {
    Similarity.pqTopK(embs, queries, k = 5, rerank = 256)
  }
  scaleRecallTest("IVFPQ", 0.65) { Similarity.ivfPqTopK(embs, queries, k = 5) }
  scaleRecallTest("SQ8", 0.90) { Similarity.sq8TopK(embs, queries, k = 5) }
  scaleRecallTest("IVF+SQ8", 0.65) { Similarity.ivfSq8TopK(embs, queries, k = 5) }
}
