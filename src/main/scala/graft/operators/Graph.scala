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

  /** Per-node triangle counts over an undirected graph given as a (possibly
    * directed, possibly multi-) edge list.
    *
    * The classic compact-forward shape: canonicalize edges to undirected
    * distinct pairs, then ORIENT each edge from its lower-(degree, node)
    * endpoint to the higher one. Every node's oriented out-degree is
    * O(sqrt(|E|)) on real graphs, so the wedge self-join
    *   (a→b) ⋈ (a→c), b < c  (by the same total order)
    * stays near-linear instead of exploding on hubs — the reason a naive
    * src-src self-join dies at 100 TB and this one doesn't. A wedge closes
    * into a triangle iff oriented edge b→c exists (left-semi join back on
    * the edge set); each triangle is found exactly once (its vertices are
    * totally ordered), and each of its 3 nodes gets one count.
    *
    * All joins are hash equi-joins on node ids; degree ties break on node
    * id so the orientation — and therefore the plan's intermediate sets —
    * are deterministic. Output: (node: long, n_triangles: long), one row
    * per node in ≥1 triangle. */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges.select(
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("u"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = und.select(col("u").as("node")).union(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient u→v iff (deg(u), u) < (deg(v), v); carry the head's degree so
    // wedges can compare endpoints in the SAME total order (raw node-id
    // order would look for closing edges the orientation never emits)
    val oriented = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b"), col("dv").as("db")))
          .otherwise(struct(col("v").as("a"), col("u").as("b"), col("du").as("db"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"), col("e.db").as("db"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.a") === col("e2.a") &&
        (col("e1.db") < col("e2.db") ||
          (col("e1.db") === col("e2.db") && col("e1.b") < col("e2.b"))))
      .select(col("e1.a").as("ta"), col("e1.b").as("tb"), col("e2.b").as("tc"))
    // (tb, tc) is ordered by (deg, node), so a closing undirected edge is
    // oriented exactly tb→tc — one semi-join probe, no direction retry
    val triangles = wedges.join(
        oriented.select(col("a").as("tb"), col("b").as("tc")),
        Seq("tb", "tc"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // cache the result before dropping the intermediates it was built from
    // (the union reads `triangles` three times; the wedge join reads
    // `oriented` three times — both caches pay for themselves in this one
    // job, and neither outlives the call)
    val out = triangles.select(col("ta").as("node"))
      .union(triangles.select(col("tb").as("node")))
      .union(triangles.select(col("tc").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    triangles.unpersist()
    oriented.unpersist()
    out // cached; ownership passes to the caller (same contract as pageRank)
  }

  /** Single-source shortest paths over a weighted edge list — frontier-
    * optimized distributed Bellman-Ford.
    *
    * Iteration i relaxes ONLY the frontier (nodes whose distance improved
    * in iteration i-1): frontier ⋈ edges on src (hash equi-join; the
    * frontier is the small side and shrinks toward convergence), candidate
    * distances min-combine map-side per dst, and a full-outer merge with
    * the running distance table keeps the minimum and marks improvements.
    * Relaxing only the frontier provably yields the SAME d_i sequence as
    * textbook Bellman-Ford's relax-everything (a non-improved node's
    * re-relaxation can emit nothing its last relaxation didn't), so a
    * fixed-iteration oracle replays it exactly — and at 100 TB the
    * frontier join is the difference between O(|frontier|·deg) and
    * O(|E|) work per wave.
    *
    * Runs exactly `iters` waves unless the frontier empties first (then
    * converged — further waves are no-ops, so the result still equals the
    * fixed-`iters` unrolling). Integer weights make every distance exact
    * and engine-portable. Multi-edges are fine (relaxation min-merges
    * them); negative weights are rejected — with a bounded iteration
    * count they'd silently under-relax instead of failing.
    *
    * Output: (node: long, dist: long) for every node reached within
    * `iters` waves, the source itself at distance 0. */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
                    wCol: String, sourceNode: Long, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(
        col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"),
        col(wCol).cast("long").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    require(e.filter(col("w") < 0).isEmpty,
      "shortestPaths requires non-negative weights")
    var dist = Seq((sourceNode, 0L)).toDF("node", "dist")
    var frontier = dist
    var converged = false
    for (_ <- 1 to iters if !converged) {
      val cand = frontier
        .join(e, frontier("node") === e("src"))
        .select(col("dst").as("node"), (frontier("dist") + col("w")).as("nd"))
        .groupBy("node").agg(min("nd").as("nd"))
      // eager localCheckpoint = the wave's one materializing job AND the
      // lineage cut. The cut is not optional: the previous wave's result
      // feeds BOTH the candidate and the merge path, so without it the
      // logical plan DOUBLES per wave — 2^waves plan nodes that OOM the
      // driver around wave 12 regardless of data size. (On a multi-node
      // cluster prefer reliable checkpoint() to survive executor loss;
      // local blocks are fine for a single-app lifetime.)
      val merged = dist.select(col("node"), col("dist").as("od"))
        .join(cand, Seq("node"), "full_outer")
        .select(col("node"),
          least(coalesce(col("od"), col("nd")),
            coalesce(col("nd"), col("od"))).as("dist"),
          (col("od").isNull ||
            (col("nd").isNotNull && col("nd") < col("od"))).as("__imp"))
        .localCheckpoint(true)
      // bounded driver scalar over the checkpointed blocks
      val improved = merged.filter(col("__imp")).count()
      dist = merged.select("node", "dist")
      frontier = merged.filter(col("__imp")).select("node", "dist")
      converged = improved == 0
    }
    e.unpersist()
    dist // backed by the last wave's checkpoint blocks
  }

  /** Weakly connected components by iterative min-label propagation —
    * the GraphX `connectedComponents` semantics without GraphX: every
    * node starts labelled with its own id; each wave every node takes
    * the minimum of its own label and its neighbours' labels; at
    * fixpoint a component's every node carries the component's smallest
    * node id. Converges in O(diameter) waves.
    *
    * Same execution skeleton as [[shortestPaths]]: symmetrized edges
    * persist once; each wave is one equi-join (labels ⋈ edges on the
    * node) + a map-side-combined min per neighbour + a merge, with an
    * eager localCheckpoint cutting the doubling lineage and a bounded
    * driver scalar detecting convergence (after which further waves
    * no-op, so a fixed-wave oracle unrolling replays it exactly).
    * Min-label is idempotent/commutative, so multi-edges, self-loops
    * and both edge directions are all harmless.
    *
    * Output: (node: long, component: long) — one row per node appearing
    * in any edge; `component` = the smallest node id reached within
    * `iters` waves. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    var converged = false
    for (_ <- 1 to iters if !converged) {
      val nbrMin = labels.join(sym, labels("node") === sym("src"))
        .select(col("dst").as("node"), col("label").as("nl"))
        .groupBy("node").agg(min("nl").as("nl"))
      val merged = labels
        .join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"),
          (col("nl").isNotNull && col("nl") < col("label")).as("__imp"))
        .localCheckpoint(true)
      val improved = merged.filter(col("__imp")).count()
      labels = merged.select("node", "label")
      converged = improved == 0
    }
    sym.unpersist()
    labels.select(col("node"), col("label").as("component"))
  }

  /** k-CORE decomposition by bounded-wave peeling — the density filter a
    * link-graph curation pass runs before trusting PageRank-style
    * priors: the k-core is the maximal subgraph where every node keeps
    * ≥ k neighbours, and peeling (drop nodes with degree < k, repeat)
    * reaches it; spam farms and scrape tangles concentrate in shallow
    * cores, the dense core is the web's backbone.
    *
    * Each wave is one map-side-combined degree count + two left-semi
    * joins (surviving nodes are the SMALL side of both), with the same
    * eager localCheckpoint lineage cut as [[shortestPaths]] — an
    * un-cut peel doubles its plan per wave. The wave's count doubles as
    * the materializing job and the convergence test: once no edge drops,
    * later waves no-op, so a fixed-wave oracle unrolling replays
    * exactly. Edges symmetrize and self-loops drop up front (degree =
    * distinct neighbours).
    *
    * Output: (node: long, core_deg: long) — the k-core's nodes with
    * their degree INSIDE the core; empty when the graph has no k-core.
    * Degrees are ≥ k ONLY once peeling has CONVERGED within `iters`
    * waves: like [[labelPropagation]], convergence is the caller's
    * parameter — an exhausted-but-unconverged run returns the partially
    * peeled graph (a SUPERSET of the k-core, possibly holding nodes of
    * degree < k) and logs a warning. The peel sheds at least one node
    * per non-converged wave, so iters ≥ node count always converges. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            iters: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    var e = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    var ecnt = e.count()
    var converged = ecnt == 0L
    for (_ <- 1 to iters if !converged) {
      val pruned = kCorePrune(e, k).localCheckpoint(true)
      val n = pruned.count()
      converged = n == ecnt
      e = pruned
      ecnt = n
    }
    if (!converged && ecnt > 0L)
      System.err.println(
        s"graft.Graph.kCore: peeling did NOT converge within $iters wave(s) " +
          s"($ecnt directed edges remain) — result is a SUPERSET of the " +
          s"$k-core; raise iters for the exact core")
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("core_deg"))
  }

  /** One k-core peel wave: degree count, then survivors prune both edge
    * ends via LEFT-SEMI joins. Extracted so the plan-audit suite asserts
    * the PRODUCTION wave's physical shape, not a replica. */
  private[graft] def kCorePrune(e: DataFrame, k: Int): DataFrame = {
    val keep = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= k).select("src")
    e.join(keep, Seq("src"), "left_semi")
      .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
      .select("src", "dst")
  }

  /** Synchronous label propagation — community detection over the link
    * graph (mirror clusters, template farms, topic hubs — the structure
    * a curation pass wants BEYOND connectivity, which is all
    * [[connectedComponents]] sees). Every node starts as its own label;
    * each wave every node adopts the most frequent label among its
    * neighbours, ties broken by SMALLEST label — the tie-break makes
    * synchronous LPA fully deterministic (classic async LPA is
    * visit-order dependent and could never hash against an oracle).
    *
    * Each wave: one equi-join (labels ⋈ symmetrized edges) + one
    * map-side-combined (node, label) count + a per-node window (rank 1
    * of count desc, label asc — PARTITIONed by node, never global),
    * with the eager localCheckpoint lineage cut. Synchronous LPA can
    * oscillate on bipartite structures; with a FIXED wave count both
    * engines replay the identical sequence, converged, oscillating or
    * not — determinism is the contract, convergence is the caller's
    * parameter.
    *
    * Output: (node: long, community: long) for every node in any edge. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    for (_ <- 1 to iters)
      labels = lpaWave(labels, sym).localCheckpoint(true)
    sym.unpersist()
    labels.select(col("node"), col("lbl").as("community"))
  }

  /** One synchronous-LPA wave: neighbour label counts, then rank 1 of
    * (count desc, label asc) PER NODE. Extracted so the plan-audit suite
    * asserts the PRODUCTION wave's physical shape, not a replica. */
  private[graft] def lpaWave(labels: DataFrame, sym: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byNode = Window.partitionBy("node")
      .orderBy(col("c").desc, col("lbl"))
    labels.join(sym, labels("node") === sym("src"))
      .groupBy(col("dst").as("node"), col("lbl"))
      .agg(count(lit(1)).as("c"))
      .withColumn("__rn", row_number().over(byNode))
      .filter(col("__rn") === 1)
      .select("node", "lbl")
  }
}
