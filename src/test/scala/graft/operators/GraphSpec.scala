package graft.operators

import graft.SparkSpec

/** Behavior specs for the integer-quantized PageRank: exact agreement with
  * an in-memory reference iteration, dangling-mass handling, and
  * partitioning invariance (the property the integer arithmetic buys).
  */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  /** In-memory replica of the operator's integer iteration. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          scaleQ: Long = 1000000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val odeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val baseQ = (15L * scaleQ / 100L) / n
    var rank = nodes.map(_ -> scaleQ / n).toMap
    for (_ <- 1 to iters) {
      val danglingShare =
        nodes.filterNot(odeg.contains).map(rank).sum / n
      val in = edges
        .map { case (s, d) => d -> rank(s) / odeg(s) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      rank = nodes.map(v =>
        v -> (baseQ + 85L * (in.getOrElse(v, 0L) + danglingShare) / 100L)).toMap
    }
    rank
  }

  test("pageRank matches the integer reference on a hand graph") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (10L, 0L))
    // node 10 has no in-links; nodes 0,2 are hubs; no dangling here
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPageRank(edges, 4))
    // hubs outrank the un-linked node
    assert(got(0L) > got(10L) && got(2L) > got(10L))
  }

  test("pageRank redistributes dangling mass and conserves total within rounding") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L)) // 3 is dangling
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPageRank(edges, 3))
    // mass conservation: total stays within iters·(n + outdeg-rounding) units
    val total = got.values.sum
    assert(math.abs(total - 1000000000L) < 1000L, s"total=$total")
  }

  test("pageRank is partitioning-invariant (integer arithmetic, no float drift)") {
    val edges = (0L until 200L).flatMap(i =>
      Seq((i, (i * 7 + 3) % 200), (i, (i * 13 + 5) % 200)))
    val df1 = edges.toDF("src", "dst").repartition(1)
    val df17 = edges.toDF("src", "dst").repartition(17)
    val r1 = Graph.pageRank(df1, "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r17 = Graph.pageRank(df17, "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == r17)
  }

  private def triangles(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCount(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangleCount: K4 has 4 triangles, 3 per node") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val got = triangles(k4)
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCount: stars have none; direction/duplication don't matter") {
    val star = (1L to 6L).map(i => (0L, i))
    assert(triangles(star).isEmpty)
    // one triangle reported every way an edge list can spell it:
    // reversed, duplicated, self-loop noise
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (2L, 3L))
    assert(triangles(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCount: hub graph stays correct under degree orientation") {
    // hub 0 connects to all of 1..20; ring 1-2, 3-4, ... closes 10 triangles
    val hub = (1L to 20L).map(i => (0L, i))
    val rungs = (1L to 19L by 2).map(i => (i, i + 1))
    val got = triangles(hub ++ rungs)
    assert(got(0L) == 10L)
    assert((1L to 20L).forall(i => got(i) == 1L))
  }

  private def sssp(edges: Seq[(Long, Long, Long)], source: Long,
                   iters: Int): Map[Long, Long] =
    Graph.shortestPaths(edges.toDF("src", "dst", "w"), "src", "dst", "w",
        source, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("shortestPaths: hand graph with a tempting long shortcut") {
    // 0→1→2 costs 2; direct 0→2 costs 10; 3 unreachable from 0
    val edges = Seq((0L, 1L, 1L), (1L, 2L, 1L), (0L, 2L, 10L), (3L, 0L, 1L))
    assert(sssp(edges, 0L, 8) == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
    // from 3 everything is one hop further
    assert(sssp(edges, 3L, 8) == Map(3L -> 0L, 0L -> 1L, 1L -> 2L, 2L -> 3L))
  }

  test("shortestPaths: multi-edges min-merge; cycles terminate; zero weights ok") {
    val edges = Seq((0L, 1L, 5L), (0L, 1L, 2L), (1L, 0L, 1L), (1L, 2L, 0L))
    assert(sssp(edges, 0L, 8) == Map(0L -> 0L, 1L -> 2L, 2L -> 2L))
  }

  test("shortestPaths: converged early-exit equals the fixed-wave unrolling") {
    // a 5-node path converges in 4 waves; 12 must give the same answer
    val path = (0L to 4L).sliding(2).map(p => (p(0), p(1), p(1))).toSeq
    assert(sssp(path, 0L, 4) == sssp(path, 0L, 12))
  }

  test("shortestPaths rejects negative weights") {
    intercept[IllegalArgumentException] {
      sssp(Seq((0L, 1L, -1L)), 0L, 4)
    }
  }

  private def wcc(edges: Seq[(Long, Long)], iters: Int = 12): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("connectedComponents: two components, labels propagate against edge direction") {
    // 5→4→3 chain (direction must not matter) and an isolated pair 10-11
    val got = wcc(Seq((5L, 4L), (4L, 3L), (10L, 11L)))
    assert(got == Map(3L -> 3L, 4L -> 3L, 5L -> 3L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: a long path needs diameter waves — and gets them") {
    // path 0-1-2-...-9: label 0 must walk 9 hops
    val path = (0L to 8L).map(i => (i + 1, i)) // deliberately high→low
    assert(wcc(path, iters = 12).values.toSet == Set(0L))
    // self-loops and duplicate edges are harmless
    assert(wcc(Seq((1L, 1L), (1L, 2L), (2L, 1L))) == Map(1L -> 1L, 2L -> 1L))
  }

  private def core(edges: Seq[(Long, Long)], k: Int,
                   iters: Int = 8): Map[Long, Long] =
    Graph.kCore(edges.toDF("src", "dst"), "src", "dst", k, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kCore: peeling a tail exposes the dense core; cascade removals propagate") {
    // triangle 1-2-3 with a pendant chain 3-4-5: the 2-core is the
    // triangle — removing 5 (deg 1) drops 4 to deg 1, a cascade
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
    assert(core(tri, k = 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // no 3-core anywhere → empty result
    assert(core(tri, k = 3) == Map.empty)
    // k=1 keeps everything with an edge; self-loops don't count as degree
    assert(core(tri :+ ((6L, 6L)), k = 1).keySet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("kCore: direction and duplicate edges are irrelevant (symmetrize + distinct)") {
    val got = core(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L)), k = 2)
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  private def lpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.labelPropagation(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labelPropagation: disjoint triangles settle on their own min labels") {
    val two = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L), (12L, 10L))
    assert(lpa(two, iters = 4) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("labelPropagation: one wave, hand-computed with the min-label tie-break") {
    // star 2-1-3: node 1 sees labels {2,3} (tie -> 2); leaves see {1}
    assert(lpa(Seq((1L, 2L), (1L, 3L)), iters = 1) ==
      Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }
}
