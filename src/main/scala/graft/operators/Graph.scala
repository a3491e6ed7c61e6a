package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph computation (engine-added, builder brief): PageRank, the
  * canonical link-graph quality score a web-corpus pipeline assigns to
  * hosts/pages before sampling training data (quality-weighted mixing uses
  * it as a prior).
  */
object Graph {

  /** Integer-quantized PageRank over an edge list.
    *
    * Ranks are held in fixed-point units of `scaleQ` (rank mass of the
    * whole graph ≈ scaleQ) and every step is integer arithmetic:
    *
    *   contrib(e)  = rank(src) div outdeg(src)
    *   rank'(v)    = (15·scaleQ div 100) div n
    *               + (85 · (Σ contrib + dangling div n)) div 100
    *
    * — damping 85/100, dangling mass redistributed uniformly. Integer
    * div/sum are summation-order independent and engine-exact, so the
    * result is bit-identical across partitionings AND across engines (a
    * floating PageRank's low bits depend on reduction order; an oracle
    * could never hash-match it). The quantization error vs the real-valued
    * iteration is ≤ iters·(1 + outdeg) units ≈ 1e-7 relative at the
    * default scale — noise for a quality prior.
    *
    * Scale shape: edges pre-joined with out-degrees once and persisted;
    * each iteration is scan → equi-join on src (rank side is |V|, edge
    * side co-partitions on src) → map-side-combined sum on dst → left join
    * back to the node set. Ranks persist per iteration (the dangling
    * aggregate and the contribution join would otherwise recompute the
    * whole lineage twice per step, exponentially across iterations). The
    * two driver scalars (node count, per-iteration dangling sum) are
    * bounded aggregates, never data.
    *
    * Output: (node: long, rank_q: long), one row per node that appears in
    * any edge. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, scaleQ: Long = 1000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(
      col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("odeg"))
    val eDeg = e.join(outDeg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    val baseQ = (15L * scaleQ / 100L) / n

    var ranks = nodes.select(col("node"), lit(scaleQ / n).as("rank_q"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // One materializing job per iteration: the dangling-share aggregate
    // doubles as the job that populates the current ranks' cache, so the
    // previous iteration's cache can drop right after it (a separate
    // count() per iteration would double the job count — measured 12.6 s
    // → ~8 s at sf0.1, where tiny-table PageRank is pure scheduling).
    var prev: Option[org.apache.spark.sql.DataFrame] = None
    for (_ <- 1 to iters) {
      // dangling nodes: in the node set but source of no edge
      val danglingShare = ranks
        .join(outDeg, ranks("node") === outDeg("src"), "left_anti")
        .agg(coalesce(sum("rank_q"), lit(0L)).as("s"))
        .head().getLong(0) / n
      prev.foreach(_.unpersist()) // ranks is cached now; parent lineage done
      val contribs = ranks
        .join(eDeg, col("node") === col("src"))
        .select(col("dst").as("node"), expr("rank_q div odeg").as("__c"))
        .groupBy("node").agg(sum("__c").as("__insum"))
      val next = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(baseQ) + expr(s"(85 * (coalesce(__insum, 0L) + ${danglingShare}L)) div 100"))
            .cast("long").as("rank_q"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      prev = Some(ranks)
      ranks = next
    }
    ranks.count() // materialize the final ranks off the cached parent
    prev.foreach(_.unpersist())
    nodes.unpersist()
    eDeg.unpersist()
    ranks
  }
}
