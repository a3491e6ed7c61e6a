package graft.sources

import java.io.File

import graft.SparkSpec
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._

/** Incremental clustered-layout maintenance: the full rewrite records a
  * range sidecar, the incremental pass rewrites ONLY stale + overlapped
  * files, untouched files stay live byte-identically, and the pairwise
  * range-disjointness invariant (pruning quality) survives rounds.
  */
class TxnLayoutSpec extends SparkSpec {

  import spark.implicits._

  private def fresh(name: String): String = {
    val p = s"/root/repo/target/tmp/spec_layout_$name"
    FileUtils.deleteQuietly(new File(p))
    p
  }

  /** 1000 rows spread over the (x, y) grid, both coords < 1024. */
  private def seed(t: String): Unit =
    TxnTable.commit(spark,
      spark.range(0, 1000).select(
        (col("id") * 37 % 1024).as("x"),
        (col("id") * 101 % 1024).as("y"),
        col("id").as("v")),
      t, overwrite = false)

  private def contentOf(t: String): Set[(Long, Long, Long)] =
    TxnTable.read(spark, t).select("x", "y", "v")
      .as[(Long, Long, Long)].collect().toSet

  private def assertDisjoint(spec: TxnLayout.ClusterSpec): Unit = {
    val sorted = spec.ranges.values.toSeq.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) =>
        assert(hiA <= loB, s"overlapping clustered ranges: $sorted")
      case _ => ()
    }
  }

  test("full clustered rewrite records disjoint ranges; clean recluster is a no-op") {
    val t = fresh("full")
    seed(t)
    val before = contentOf(t)
    val v = TxnLayout.optimizeClustered(spark, t, Seq("x", "y"), numFiles = 4)
    assert(v == 2 && contentOf(t) == before)
    val spec = TxnLayout.readSpec(t).get
    assert(spec.cols == Seq("x", "y") && spec.curve == "morton")
    assert(spec.ranges.keySet == TxnTable.liveSplit(t)._1.toSet)
    assertDisjoint(spec)
    val (vNoop, rewrote, kept) = TxnLayout.reclusterIncremental(spark, t)
    assert(vNoop == v && rewrote == 0 && kept == spec.ranges.size,
      "nothing stale: the incremental pass must not commit")
  }

  test("incremental recluster rewrites only stale + overlapped files") {
    val t = fresh("incr")
    seed(t)
    TxnLayout.optimizeClustered(spark, t, Seq("x", "y"), numFiles = 4)
    val clustered = TxnTable.liveSplit(t)._1.toSet
    val before = contentOf(t)

    // far-range append: coords above every seeded code → overlaps nothing
    TxnTable.commit(spark,
      Seq((40000L, 40000L, -1L), (40001L, 40001L, -2L)).toDF("x", "y", "v")
        .coalesce(1), t, overwrite = false)
    val (_, r1, k1) = TxnLayout.reclusterIncremental(spark, t)
    assert(r1 == 1 && k1 == clustered.size,
      s"only the appended file rewrites, got rewrote=$r1 kept=$k1")
    assert(clustered.subsetOf(TxnTable.liveSplit(t)._1.toSet),
      "untouched clustered files must stay live")
    assert(contentOf(t) == before ++ Set((40000L, 40000L, -1L), (40001L, 40001L, -2L)))
    assertDisjoint(TxnLayout.readSpec(t).get)

    // in-range append: duplicate a seeded row → lands inside exactly one
    // clustered file's range, pulling it (and only it) into the rewrite
    val live2 = TxnTable.liveSplit(t)._1.toSet
    TxnTable.commit(spark, Seq((0L, 0L, -3L)).toDF("x", "y", "v").coalesce(1),
      t, overwrite = false) // seed row id=0 has (x,y) = (0,0): code 0 exists
    val (_, r2, k2) = TxnLayout.reclusterIncremental(spark, t)
    assert(r2 == 2, s"stale file + its one covering clustered file, got $r2")
    assert(k2 == live2.size - 1)
    assert(contentOf(t) == before ++
      Set((40000L, 40000L, -1L), (40001L, 40001L, -2L), (0L, 0L, -3L)))
    assertDisjoint(TxnLayout.readSpec(t).get)
  }

  test("range quantization: wide natural domains prune, bounds round-trip, clamped ingest reclusters") {
    // domains ≫ 2^16 — the regime where the curve's low-bit mask
    // aliases (id·1000003 mod 65536 scrambles consecutive ids) and the
    // whole point of clustering dies at scale
    def wide(t: String): Unit =
      TxnTable.commit(spark,
        spark.range(0, 2000).select(
          (col("id") * 1000003L).as("x"),
          (col("id") * 999983L).as("y"),
          col("id").as("v")),
        t, overwrite = false)

    val tQ = fresh("quant"); wide(tQ)
    val tA = fresh("aliased"); wide(tA)
    val before = contentOf(tQ)
    TxnLayout.optimizeClustered(spark, tQ, Seq("x", "y"), numFiles = 8)
    TxnLayout.optimizeClustered(spark, tA, Seq("x", "y"), numFiles = 8,
      quantize = false)
    // the sidecar records the measured bounds and they survive the trip
    val spec = TxnLayout.readSpec(tQ).get
    assert(spec.quant == Seq(("x", 0L, 1999L * 1000003L),
      ("y", 0L, 1999L * 999983L)))
    assert(TxnLayout.readSpec(tA).get.quant.isEmpty)
    assertDisjoint(spec)
    assert(contentOf(tQ) == before && contentOf(tA) == before)
    // head-to-head on the same box over the RAW values: quantized
    // prunes a strict subset, the aliased layout cannot exclude a file
    def openedOf(t: String): (Int, Int) = {
      TxnStats.refresh(spark, t, "x")
      val (toRead, nLive) = TxnStats.pruneFiles(spark, t, "x",
        400L * 1000003L, 800L * 1000003L)
      (toRead.size, nLive)
    }
    val (openQ, totQ) = openedOf(tQ)
    val (openA, totA) = openedOf(tA)
    assert(openA == totA, s"aliased layout unexpectedly pruned: $openA/$totA")
    assert(openQ < totQ, s"quantized layout failed to prune: $openQ/$totQ")
    // ingest BEYOND the recorded bounds clamps to the edge bucket —
    // layout only — and the incremental round sweeps it up with the
    // SAME recorded bounds (content + disjointness survive)
    TxnTable.commit(spark,
      Seq((5000L * 1000003L, 5000L * 999983L, -1L),
          (6000L * 1000003L, 6000L * 999983L, -2L))
        .toDF("x", "y", "v").coalesce(1), tQ, overwrite = false)
    val (_, r1, _) = TxnLayout.reclusterIncremental(spark, tQ)
    assert(r1 >= 1)
    val specAfter = TxnLayout.readSpec(tQ).get
    assert(specAfter.quant == spec.quant,
      "incremental maintenance must reuse the recorded bounds, never re-measure")
    assertDisjoint(specAfter)
    assert(contentOf(tQ) == before ++ Set(
      (5000L * 1000003L, 5000L * 999983L, -1L),
      (6000L * 1000003L, 6000L * 999983L, -2L)))
  }

  test("equi-depth quantization spreads value concentration that range scaling cannot") {
    // 90% of the rows tie over 100 small values, a 10% tail stretches
    // the domain to ~1.2e9: range scaling maps the ENTIRE dense mass
    // to bucket 0 — one tied code repartitionByRange cannot split, one
    // fat file, and any dense-region box reads it whole. Equi-depth
    // boundaries are the column's own quantiles, so the dense region
    // spreads over most of the buckets.
    def data = spark.range(0, 4000).select(
      when(col("id") < 3600, col("id") % 100)
        .otherwise((col("id") - 3600L) * 3000000L).as("x"),
      col("id").as("v"))
      .withColumn("y", col("x"))
      .select("x", "y", "v")
    val tR = fresh("eqd_range"); val tE = fresh("eqd_equi")
    TxnTable.commit(spark, data, tR, overwrite = false)
    TxnTable.commit(spark, data, tE, overwrite = false)
    val before = contentOf(tE)
    TxnLayout.optimizeClustered(spark, tR, Seq("x", "y"), numFiles = 16)
    TxnLayout.optimizeClustered(spark, tE, Seq("x", "y"), numFiles = 16,
      quantMode = "equidepth")
    val spec = TxnLayout.readSpec(tE).get
    assert(spec.qbounds.map(_._1) == Seq("x", "y") && spec.quant.isEmpty)
    spec.qbounds.foreach { case (_, bs) =>
      assert(bs.nonEmpty && bs == bs.distinct.sorted, "strictly increasing")
    }
    assertDisjoint(spec)
    assert(contentOf(tE) == before && contentOf(tR) == before)
    // a box INSIDE the dense region, measured in rows the pruned scan
    // must read (stats are seeded by optimizeClustered)
    def rowsRead(t: String): (Long, Long) = {
      val (toRead, _) = TxnStats.pruneFiles(spark, t, "x", 40L, 60L)
      val counts = TxnTable.liveFileRowCounts(t).toMap
      (toRead.map(counts).sum, counts.values.sum)
    }
    val (rR, tot) = rowsRead(tR)
    val (rE, _) = rowsRead(tE)
    assert(rR > tot / 2,
      s"range scaling should have collapsed the dense mass: $rR of $tot")
    assert(rE * 2 < rR,
      s"equi-depth must read far fewer dense-box rows: $rE vs $rR")
    // incremental rounds bucket stale rows with the RECORDED boundaries
    // (same-distribution append, disjointness + content survive)
    TxnTable.commit(spark,
      Seq((42L, 42L, -1L), (55L, 55L, -2L)).toDF("x", "y", "v").coalesce(1),
      tE, overwrite = false)
    val (_, r1, _) = TxnLayout.reclusterIncremental(spark, tE)
    assert(r1 >= 1)
    assert(TxnLayout.readSpec(tE).get.qbounds == spec.qbounds,
      "incremental maintenance must reuse the recorded boundaries")
    assertDisjoint(TxnLayout.readSpec(tE).get)
    assert(contentOf(tE) == before ++ Set((42L, 42L, -1L), (55L, 55L, -2L)))
  }

  test("by-design clipped outliers never read as clamped mass (no re-optimize loop)") {
    val t = fresh("clipstale")
    // bulk plus ~2% in-distribution outliers far beyond the winsorized
    // bounds: after a CLEAN clipped optimize they fill their own edge
    // files — judging staleness against the scaling bounds would count
    // them clamped forever and loop the re-optimize policy
    TxnTable.commit(spark,
      spark.range(0, 4000).select(
        when(col("id") < 3920, col("id") * 1000003L)
          .otherwise(col("id") * 1000003L * 4096L).as("x"),
        col("id").as("v"))
        .withColumn("y", col("x")).select("x", "y", "v"),
      t, overwrite = false)
    TxnLayout.optimizeClustered(spark, t, Seq("x", "y"), numFiles = 16,
      clipQuantile = 0.01)
    val spec = TxnLayout.readSpec(t).get
    assert(spec.raw.nonEmpty && spec.raw.head._3 > spec.quant.head._3,
      "the sidecar records the unclipped domain alongside the scaling bounds")
    assert(TxnLayout.boundsStaleness(spark, t)._1 == 0L,
      "a freshly optimized clipped layout has zero clamped mass")
    assert(TxnLayout.maintainClustered(spark, t, maxStaleFraction = 0.2,
      maxClampedFraction = 0.01).isEmpty,
      "the policy must decline on a healthy clipped layout even at a tight threshold")
    // genuinely NEW domain still triggers: ingest beyond the RAW bounds
    TxnTable.commit(spark,
      spark.range(100000, 104000).select((col("id") * 1000003L * 4096L).as("x"),
        (col("id") * 1000003L * 4096L).as("y"), col("id").as("v")),
      t, overwrite = false)
    val r = TxnLayout.maintainClustered(spark, t, maxStaleFraction = 0.2,
      maxClampedFraction = 0.4)
    assert(r.isDefined && r.get._3 == 0, s"grown domain must re-optimize, got $r")
  }

  test("tie collapse self-heals: file skew escalates a range layout to equi-depth") {
    // the q_layout_equidepth shape clustered in RANGE mode: the tied
    // 90% collapses into one fat file (codes the range partitioner
    // cannot split), which the metadata skew measure sees — and since
    // re-measuring range bounds would reproduce it, the policy
    // escalates the MODE
    val t = fresh("skewheal")
    TxnTable.commit(spark,
      spark.range(0, 4000).select(
        when(col("id") < 3600, col("id") % 100)
          .otherwise((col("id") - 3600L) * 3000000L).as("x"),
        col("id").as("v"))
        .withColumn("y", col("x")).select("x", "y", "v"),
      t, overwrite = false)
    val before = contentOf(t)
    TxnLayout.optimizeClustered(spark, t, Seq("x", "y"), numFiles = 16)
    assert(TxnLayout.fileSkew(t) > 8.0,
      s"the tied mass should make one fat file: skew ${TxnLayout.fileSkew(t)}")
    val r = TxnLayout.maintainClustered(spark, t, maxStaleFraction = 0.2)
    assert(r.isDefined && r.get._3 == 0, s"full re-optimize expected, got $r")
    val spec = TxnLayout.readSpec(t).get
    assert(spec.qbounds.nonEmpty && spec.quant.isEmpty,
      "the policy must have escalated to equi-depth")
    assert(TxnLayout.fileSkew(t) < 4.0,
      s"equi-depth must rebalance the files: skew ${TxnLayout.fileSkew(t)}")
    assert(contentOf(t) == before)
    // healthy after: the policy declines on the repaired layout
    assert(TxnLayout.maintainClustered(spark, t, maxStaleFraction = 0.2).isEmpty)
    // and a BALANCED range layout never escalates (the existing wide-
    // domain fixtures stay range-mode — their specs pin quant nonEmpty)
    val tOk = fresh("skewheal_ok")
    TxnTable.commit(spark,
      spark.range(0, 2000).select((col("id") * 1000003L).as("x"),
        (col("id") * 999983L).as("y"), col("id").as("v")),
      tOk, overwrite = false)
    TxnLayout.optimizeClustered(spark, tOk, Seq("x", "y"), numFiles = 8)
    assert(TxnLayout.maintainClustered(spark, tOk, maxStaleFraction = 0.2).isEmpty)
    assert(TxnLayout.readSpec(tOk).get.quant.nonEmpty)
  }

  test("growing domain: clamped mass triggers a full re-optimize with fresh bounds") {
    val t = fresh("regrow")
    TxnTable.commit(spark,
      spark.range(0, 1000).select(
        (col("id") * 1000003L).as("x"), (col("id") * 999983L).as("y"),
        col("id").as("v")),
      t, overwrite = false)
    val before = contentOf(t)
    TxnLayout.optimizeClustered(spark, t, Seq("x", "y"), numFiles = 4)
    val spec0 = TxnLayout.readSpec(t).get
    assert(spec0.quant.head._3 == 999L * 1000003L)
    assert(TxnLayout.boundsStaleness(spark, t) == ((0L, 1000L)))
    // a SMALL out-of-bounds batch: its fresh ingest file measures
    // fully-clamped, but below the threshold — maintenance stays
    // incremental and the bounds must not re-measure
    TxnTable.commit(spark,
      spark.range(2000, 2050).select(
        (col("id") * 1000003L).as("x"), (col("id") * 999983L).as("y"),
        col("id").as("v")).coalesce(1),
      t, overwrite = false)
    assert(TxnLayout.boundsStaleness(spark, t) == ((50L, 1050L)))
    assert(TxnLayout.maintainClustered(spark, t,
      maxStaleFraction = 1e-9).isDefined) // the stale-file path ran
    assert(TxnLayout.readSpec(t).get.quant == spec0.quant,
      "below the clamped threshold the bounds must not re-measure")
    // the DOMAIN GROWS: a bulk beyond the bounds crosses the clamped
    // threshold — maintenance re-optimizes in full, re-measuring
    TxnTable.commit(spark,
      spark.range(3000, 5000).select(
        (col("id") * 1000003L).as("x"), (col("id") * 999983L).as("y"),
        col("id").as("v")),
      t, overwrite = false)
    val r = TxnLayout.maintainClustered(spark, t,
      maxStaleFraction = 1e-9, maxClampedFraction = 0.5)
    assert(r.isDefined && r.get._3 == 0, s"full re-optimize expected, got $r")
    val spec1 = TxnLayout.readSpec(t).get
    assert(spec1.quant.head._3 == 4999L * 1000003L,
      s"bounds must cover the grown domain: ${spec1.quant}")
    assert(TxnLayout.boundsStaleness(spark, t)._1 == 0L,
      "after re-measuring nothing is clamped")
    assertDisjoint(spec1)
    // pruning works on the NEW region now — impossible under the old
    // bounds, where every grown row shared the top edge bucket
    val (toRead, nLive) = TxnStats.pruneFiles(spark, t, "x",
      3500L * 1000003L, 4000L * 1000003L)
    assert(toRead.size < nLive, s"grown-domain box must prune: $toRead / $nLive")
    assert(contentOf(t) == before ++
      (2000L until 2050L).map(i => (i * 1000003L, i * 999983L, i)).toSet ++
      (3000L until 5000L).map(i => (i * 1000003L, i * 999983L, i)).toSet)
  }

  test("hilbert curve maintenance: same lifecycle, hilbert code ranges") {
    val t = fresh("hilbert")
    seed(t)
    val before = contentOf(t)
    TxnLayout.optimizeClustered(spark, t, Seq("x", "y"),
      curve = "hilbert", numFiles = 3)
    val spec = TxnLayout.readSpec(t).get
    assert(spec.curve == "hilbert")
    assertDisjoint(spec)
    TxnTable.commit(spark, Seq((40000L, 1L, -9L)).toDF("x", "y", "v")
      .coalesce(1), t, overwrite = false)
    val (_, r, _) = TxnLayout.reclusterIncremental(spark, t)
    assert(r >= 1 && contentOf(t) == before + ((40000L, 1L, -9L)))
    assertDisjoint(TxnLayout.readSpec(t).get)
    // a foreign rewrite's files count as stale and fold back in
    TxnTable.optimize(spark, t, numFiles = 2)
    val (_, r3, k3) = TxnLayout.reclusterIncremental(spark, t)
    assert(r3 >= 1 && k3 == 0,
      "a full optimize stales every clustered file; recluster absorbs it")
    assert(contentOf(t) == before + ((40000L, 1L, -9L)))
    assertDisjoint(TxnLayout.readSpec(t).get)
  }

  test("staleness is metadata-only; maintain policy fires on the row fraction") {
    val t = fresh("maintain")
    seed(t)
    assert(TxnLayout.staleness(t) == ((0, 0, 0L, 0L)),
      "never-clustered: nothing to measure")
    assert(TxnLayout.maintainClustered(spark, t).isEmpty)
    TxnLayout.optimizeClustered(spark, t, Seq("x", "y"), numFiles = 4)
    assert(TxnLayout.staleness(t) == ((4, 0, 0L, 1000L)))

    // 100 stale rows of 1100 ≈ 9%: healthy at 20%, stale at 5%
    TxnTable.commit(spark,
      spark.range(2000, 2100).select((col("id") % 1024).as("x"),
        (col("id") % 1024).as("y"), col("id").as("v")).coalesce(1),
      t, overwrite = false)
    assert(TxnLayout.staleness(t) == ((4, 1, 100L, 1100L)))
    assert(TxnLayout.maintainClustered(spark, t, maxStaleFraction = 0.2).isEmpty,
      "below threshold: maintenance must decline without a commit")
    assert(TxnTable.currentVersion(t) == 3)
    val ran = TxnLayout.maintainClustered(spark, t, maxStaleFraction = 0.05)
    assert(ran.isDefined && ran.get._2 >= 1)
    assert(TxnLayout.staleness(t)._2 == 0, "maintenance leaves nothing stale")

    // the advisor row mirrors the same rule, metadata-only
    val adv = graft.plans.LayoutAdvisor.clusterAdvice(spark, t).head()
    assert(adv.getAs[String]("curve") == "morton" &&
      adv.getAs[Long]("n_stale_files") == 0L &&
      !adv.getAs[Boolean]("recommend_recluster"))
    val advNone = graft.plans.LayoutAdvisor
      .clusterAdvice(spark, fresh("maintain_none")).head()
    assert(advNone.getAs[String]("curve") == "none" &&
      !advNone.getAs[Boolean]("recommend_recluster"))

    // a live deletion vector DECLINES maintenance instead of crashing
    // the policy's cycle (requireNoDv would throw inside the rewrite)
    TxnTable.deleteWhereMor(spark, t, col("v") % 97 === 0L)
    TxnTable.commit(spark,
      spark.range(3000, 3400).select((col("id") % 1024).as("x"),
        (col("id") % 1024).as("y"), col("id").as("v")).coalesce(1),
      t, overwrite = false)
    assert(TxnLayout.maintainClustered(spark, t, maxStaleFraction = 1e-9).isEmpty,
      "DV-blocked maintenance must decline, not throw")
  }

  test("maintenance leaves existing skipping stats fresh") {
    val t = fresh("statsfresh")
    seed(t)
    TxnStats.refresh(spark, t, "v")
    TxnLayout.optimizeClustered(spark, t, Seq("x", "y"), numFiles = 3)
    assert(TxnStats.indexedVersion(t, "v") == TxnTable.currentVersion(t),
      "the full clustered rewrite must re-freshen the v stats")
    TxnTable.commit(spark,
      Seq((50000L, 50000L, 9999L)).toDF("x", "y", "v").coalesce(1),
      t, overwrite = false)
    TxnLayout.reclusterIncremental(spark, t)
    assert(TxnStats.indexedVersion(t, "v") == TxnTable.currentVersion(t),
      "incremental maintenance must re-freshen the stats too")
    // and the freshness is USEFUL: a narrow v-range prunes immediately
    val (toRead, nLive) = TxnStats.pruneFiles(spark, t, "v", 9999L, 9999L)
    assert(toRead.size < nLive,
      s"post-maintenance pruning must skip files, read $toRead of $nLive")
  }

  test("NULL cluster-column rows survive the segmented recluster") {
    val t = fresh("nulls")
    seed(t)
    TxnLayout.optimizeClustered(spark, t, Seq("x", "y"), numFiles = 3)
    // a NULL cluster column null-propagates into the curve code; the
    // segment assignment must keep the row (left join → own segment),
    // or the rewrite silently destroys it with its source file
    TxnTable.commit(spark,
      Seq((Option.empty[Long], Some(5L), Some(-7L))).toDF("x", "y", "v")
        .coalesce(1), t, overwrite = false)
    val (_, r, _) = TxnLayout.reclusterIncremental(spark, t)
    assert(r == 1)
    val nullRows = TxnTable.read(spark, t).filter(col("x").isNull)
      .select("v").as[Long].collect().toSeq
    assert(nullRows == Seq(-7L), "a NULL-coded row must survive the rewrite")
    assert(TxnTable.read(spark, t).count() == 1001)
    assertDisjoint(TxnLayout.readSpec(t).get)
  }

  test("an orphaned stats sidecar never crashes maintenance") {
    val t = fresh("orphan")
    seed(t)
    TxnStats.refresh(spark, t, "v")
    // schema-changing overwrite drops the indexed column: the sidecar
    // is now orphaned and the post-rewrite stats refresh must SKIP it
    TxnTable.commit(spark,
      spark.range(0, 100).select((col("id") % 64).as("x"),
        (col("id") % 32).as("y"), col("id").as("w")),
      t, overwrite = true)
    TxnLayout.optimizeClustered(spark, t, Seq("x", "y"), numFiles = 2)
    assert(TxnTable.read(spark, t).count() == 100)
  }

  test("one rewrite never bridges a gap across a survivor (segmented output)") {
    val t = fresh("seg")
    // bimodal seed with y = 0: the morton code is monotone in x, so
    // file code ranges ARE x ranges and the gap layout is controlled
    TxnTable.commit(spark,
      spark.range(0, 30).select(col("id").as("x"), lit(0L).as("y"),
          col("id").as("v"))
        .union(spark.range(60, 90).select(col("id"), lit(0L), col("id"))),
      t, overwrite = false)
    TxnLayout.optimizeClustered(spark, t, Seq("x", "y"), numFiles = 2)
    assertDisjoint(TxnLayout.readSpec(t).get)
    // ONE stale file holding codes in the gaps on BOTH sides of the
    // second clustered file: an unsegmented rewrite would emit a single
    // output file whose [lo, hi] covers that survivor — breaking the
    // disjointness every pruned box read relies on
    TxnTable.commit(spark,
      Seq((45L, 0L, -1L), (200L, 0L, -2L)).toDF("x", "y", "v").coalesce(1),
      t, overwrite = false)
    val before = contentOf(t)
    val (_, r, _) = TxnLayout.reclusterIncremental(spark, t)
    assert(r >= 1)
    assertDisjoint(TxnLayout.readSpec(t).get)
    assert(contentOf(t) == before)
  }
}
