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
    // sort by (lo, hi): under tie-salting several files legitimately
    // share one boundary code ([c,c] ties plus at most one straddler
    // per side), and (lo, hi) order puts them in containment order so
    // the adjacency check still flags any overlap past a shared
    // endpoint — the invariant pruning actually needs
    val sorted = spec.ranges.values.toSeq.sortBy(r => (r._1, r._2))
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

  test("irreducible tied values: salt escalation bounds file sizes; pruning untouched") {
    // 50% of the rows share ONE value — a mega key no value-monotone
    // code can separate (equi-depth's documented residue): the range
    // partitioner puts equal keys in one partition and one file
    // swallows the tie no matter the requested file count. The
    // policy's second skew rung re-optimizes with the partitioner-only
    // salt: sizes bound again, the code space and every pruning
    // decision unchanged.
    val t = fresh("ties")
    val mega = 777000000L
    TxnTable.commit(spark,
      spark.range(0, 20000).select(
        when(col("id") % 2 === 0, mega).otherwise(col("id") * 1000003L).as("x"),
        col("id").as("v"))
        .withColumn("y", col("x")).select("x", "y", "v"),
      t, overwrite = false)
    TxnLayout.optimizeClustered(spark, t, Seq("x", "y"), numFiles = 16,
      quantMode = "equidepth")
    val skew1 = TxnLayout.fileSkew(t)
    assert(skew1 > 3.0, s"one file must swallow the tied mass: $skew1")
    // rung 2 fires: equi-depth, unsalted, skewed → salted re-optimize
    val r = TxnLayout.maintainClustered(spark, t,
      maxStaleFraction = 1e18, maxFileSkew = 3.0)
    assert(r.isDefined && r.get._3 == 0, s"full salted re-optimize expected: $r")
    val sp = TxnLayout.readSpec(t).get
    assert(sp.salt && sp.qbounds.nonEmpty)
    val skew2 = TxnLayout.fileSkew(t)
    assert(skew2 < 2.5, s"salted sizes must be bounded: $skew1 -> $skew2")
    assertDisjoint(sp) // hi ≤ next lo admits the shared tied code
    // pruning stays exact on the salted layout: the tied point reads
    // exactly the tied rows; a box avoiding it opens a strict subset
    assert(TxnStats.prunedRead(spark, t, "x", mega, mega).count() == 10000L)
    val (toRead, nLive) = TxnStats.pruneFiles(spark, t, "x",
      10001L * 1000003L, 12001L * 1000003L)
    assert(toRead.size < nLive, s"off-tie box must prune: ${toRead.size}/$nLive")
    assert(TxnStats.prunedRead(spark, t, "x",
        10001L * 1000003L, 12001L * 1000003L).count() ==
      TxnTable.read(spark, t)
        .filter(col("x").between(10001L * 1000003L, 12001L * 1000003L)).count())
    // salted and balanced: the policy rests — no re-optimize loop
    assert(TxnLayout.maintainClustered(spark, t,
      maxStaleFraction = 1e18, maxFileSkew = 3.0).isEmpty)
    // incremental maintenance KEEPS salting: more tied ingest spreads
    // instead of re-growing the fat file
    TxnTable.commit(spark,
      spark.range(20000, 22000).select(lit(mega).as("x"), col("id").as("v"))
        .withColumn("y", col("x")).select("x", "y", "v").coalesce(1),
      t, overwrite = false)
    TxnLayout.reclusterIncremental(spark, t)
    val sp2 = TxnLayout.readSpec(t).get
    assert(sp2.salt, "maintenance must not drop the salt mode")
    assertDisjoint(sp2)
    assert(TxnLayout.fileSkew(t) < 2.5,
      s"post-incremental sizes stay bounded: ${TxnLayout.fileSkew(t)}")
    assert(TxnStats.prunedRead(spark, t, "x", mega, mega).count() == 12000L)
    assert(TxnTable.read(spark, t).count() == 22000L)
  }

  test("equi-depth refinement breaks the ~256-file ceiling; lookups read file-grain, not bucket-grain") {
    // ~255 quantile cuts alone cap a column at ~256 distinct codes:
    // repartitionByRange cannot cut inside a tied code, so no matter
    // how many files the caller requests, at most ~257 non-empty ones
    // exist and every point lookup pays a whole 1/256-of-the-mass
    // bucket file. The composed within-bucket position (subBits) lifts
    // the code space back to 2^bits, files reach the requested count,
    // and a lookup reads one target-sized file. bits=8 (rank occupies
    // all bits → subBits=0) IS the old ceiling regime, head-to-head on
    // identical data against the refined bits=16 write.
    val t8 = fresh("ceiling8"); val t16 = fresh("ceiling16")
    // zipf-shaped: 90% of the mass is a DENSE region of distinct values
    // (ids < 54000), the rest a tail stretched 1000× — the dense region
    // is exactly where bucket-grain reads hurt and refinement pays
    val data = spark.range(0, 60000).select(
      when(col("id") < 54000, col("id") * 9973L + 17L)
        .otherwise(col("id") * 9973000L + 17L).as("x"),
      col("id").as("v"))
      .withColumn("y", col("x")).select("x", "y", "v")
    Seq(t8, t16).foreach(t => TxnTable.commit(spark, data, t, overwrite = false))
    TxnLayout.optimizeClustered(spark, t8, Seq("x", "y"), numFiles = 640,
      bits = 8, quantMode = "equidepth")
    TxnLayout.optimizeClustered(spark, t16, Seq("x", "y"), numFiles = 640,
      bits = 16, quantMode = "equidepth")
    assert(TxnLayout.readSpec(t8).get.subBits == 0)
    assert(TxnLayout.readSpec(t16).get.subBits == 8)
    val files8 = TxnTable.liveSplit(t8)._1.size
    val files16 = TxnTable.liveSplit(t16)._1.size
    assert(files8 <= 257,
      s"the bare-rank ceiling: 640 requested, $files8 materialized")
    assert(files16 > 2 * files8,
      s"refined codes must take the layout past the ceiling: $files16 vs $files8")
    // point lookups: rows READ (file granularity through the stats
    // index) drop from bucket-grain to file-grain — summed over eight
    // spread lookups so a boundary straddle can't dominate
    def rowsRead(t: String, keys: Seq[Long]): Long = {
      val counts = TxnTable.liveFileRowCounts(t).toMap
      keys.map { k =>
        TxnStats.pruneFiles(spark, t, "x", k, k)._1.map(counts).sum
      }.sum
    }
    // eight lookups spread across the DENSE region (ids ≤ 48000)
    val keys = (1 to 8).map(i => i * 6000L * 9973L + 17L)
    val (r8, r16) = (rowsRead(t8, keys), rowsRead(t16, keys))
    assert(r16 * 3 < r8 * 2,
      s"refined lookups must read well under bucket grain: $r16 vs $r8")
    // and the lookups lose no row in either layout
    keys.foreach { k =>
      assert(TxnStats.prunedRead(spark, t8, "x", k, k).count() == 1L)
      assert(TxnStats.prunedRead(spark, t16, "x", k, k).count() == 1L)
    }
    assertDisjoint(TxnLayout.readSpec(t16).get)
    // incremental rounds re-compose the identical refined code space
    TxnTable.commit(spark,
      Seq((30000L * 9973L + 18L, 30000L * 9973L + 18L, -1L))
        .toDF("x", "y", "v").coalesce(1), t16, overwrite = false)
    val (_, rewrote, _) = TxnLayout.reclusterIncremental(spark, t16)
    assert(rewrote >= 2)
    assertDisjoint(TxnLayout.readSpec(t16).get)
    assert(TxnTable.read(spark, t16).count() == 60001L)
  }

  test("DATE clustering columns quantize on epoch-day ordinals, pre-1970 included") {
    val t = fresh("dates")
    // 2000 daily rows from 1960-01-01 (epoch day −3653): the leading
    // clustering column of any time-series fact, with negative ordinals
    TxnTable.commit(spark,
      spark.range(0, 2000).select(
        expr("date_add(DATE'1960-01-01', CAST(id AS INT))").as("d"),
        (col("id") * 1000003L).as("k"),
        col("id").as("v")),
      t, overwrite = false)
    val before = TxnTable.read(spark, t).select("v").as[Long].collect().toSet
    TxnLayout.optimizeClustered(spark, t, Seq("d", "k"), numFiles = 8)
    val spec = TxnLayout.readSpec(t).get
    val day0 = java.time.LocalDate.parse("1960-01-01").toEpochDay
    assert(spec.quant.find(_._1 == "d").get._2 == day0,
      s"date bounds are epoch-day ordinals (negative pre-1970): ${spec.quant}")
    assert(spec.quant.find(_._1 == "d").get._3 == day0 + 1999)
    assertDisjoint(spec)
    // the layout serves a DATE window: the typed min-max stats prune a
    // strict file subset, and the pruned read loses no row
    val (lo, hi) = (java.sql.Date.valueOf("1962-01-01"),
      java.sql.Date.valueOf("1962-03-01"))
    val (toRead, nLive) = TxnStats.pruneFiles(spark, t, "d", lo, hi)
    assert(toRead.size < nLive, s"date box must prune: ${toRead.size}/$nLive")
    assert(TxnStats.prunedRead(spark, t, "d", lo, hi).count() ==
      TxnTable.read(spark, t).filter(col("d").between(lo, hi)).count())
    // incremental rounds map stale DATES into the SAME code space
    TxnTable.commit(spark,
      spark.range(500, 520).select(
        expr("date_add(DATE'1960-01-01', CAST(id AS INT))").as("d"),
        (col("id") * 1000003L).as("k"), (col("id") + 100000L).as("v"))
        .coalesce(1),
      t, overwrite = false)
    val (_, rewrote, _) = TxnLayout.reclusterIncremental(spark, t)
    assert(rewrote >= 2, "stale + at least its covering file rewrite")
    assert(TxnLayout.readSpec(t).get.quant == spec.quant,
      "incremental maintenance reuses the recorded date bounds")
    assertDisjoint(TxnLayout.readSpec(t).get)
    assert(TxnTable.read(spark, t).select("v").as[Long].collect().toSet ==
      before ++ (500L until 520L).map(_ + 100000L))
    // GROWING time: a far-future bulk lands clamped (the Date sidecar
    // bounds convert to ordinals), and maintenance re-measures
    TxnTable.commit(spark,
      spark.range(30000, 33000).select(
        expr("date_add(DATE'1960-01-01', CAST(id AS INT))").as("d"),
        (col("id") * 1000003L).as("k"), col("id").as("v")),
      t, overwrite = false)
    val (clamped, total) = TxnLayout.boundsStaleness(spark, t)
    assert(clamped == 3000L && total == 5020L,
      s"future ingest must read as clamped mass: ($clamped, $total)")
    val r = TxnLayout.maintainClustered(spark, t, maxStaleFraction = 1e9,
      maxClampedFraction = 0.5)
    assert(r.isDefined && r.get._3 == 0, s"full re-optimize expected: $r")
    assert(TxnLayout.readSpec(t).get.quant.find(_._1 == "d").get._3 ==
      day0 + 32999, "re-measured bounds cover the grown time domain")
  }

  test("TIMESTAMP and DECIMAL clustering columns ride their micro/unscaled ordinals") {
    val t = fresh("tsdec")
    TxnTable.commit(spark,
      spark.range(0, 1500).select(
        expr("timestamp_seconds(1500000000 + id * 3600)").as("ts"),
        (col("id") * 25).cast("decimal(12,2)").as("price"),
        col("id").as("v")),
      t, overwrite = false)
    TxnLayout.optimizeClustered(spark, t, Seq("ts", "price"), numFiles = 6)
    val spec = TxnLayout.readSpec(t).get
    assert(spec.quant.find(_._1 == "ts").get._2 == 1500000000L * 1000000L,
      s"timestamp bounds are epoch micros: ${spec.quant}")
    assert(spec.quant.find(_._1 == "price").get._3 == 1499L * 25L * 100L,
      s"decimal bounds are unscaled longs (·10^scale): ${spec.quant}")
    assertDisjoint(spec)
    // a time window prunes a strict subset through the typed stats
    val lo = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1500000000L + 100 * 3600))
    val hi = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1500000000L + 200 * 3600))
    val (toRead, nLive) = TxnStats.pruneFiles(spark, t, "ts", lo, hi)
    assert(toRead.size < nLive, s"time window must prune: ${toRead.size}/$nLive")
    assert(TxnStats.prunedRead(spark, t, "ts", lo, hi).count() == 101L)
    // equi-depth mode buckets the ordinal too (rank_bucket over micros)
    TxnLayout.optimizeClustered(spark, t, Seq("ts", "price"), numFiles = 6,
      quantMode = "equidepth")
    val specE = TxnLayout.readSpec(t).get
    assert(specE.qbounds.nonEmpty &&
      specE.qbounds.find(_._1 == "ts").get._2.forall(_ >= 1500000000L * 1000000L),
      "equi-depth cut points live in ordinal space")
    assertDisjoint(specE)
    assert(TxnTable.read(spark, t).count() == 1500L)
  }

  test("STRING clustering rides the binary-prefix ordinal: UTF-8-monotone, pruned reads, tie ladder") {
    import graft.operators.Layout
    import org.apache.spark.sql.types.StringType
    // 1. ORDINAL ORDER == Spark's binary string order, multi-byte and
    //    beyond-prefix edges included. The three 'abcdefgh*' strings
    //    tie (shared 8-byte prefix) — the documented truncation residue
    val tricky = Seq("", "a", "ab", "abcdefgh", "abcdefghi", "abcdefghj",
      "b", "zz", "~tilde", "é", "éa", "ツ", "𝄞clef")
    val got = tricky.toDF("s")
      .select(col("s"), Layout.ordinalExpr(col("s"), StringType).as("o"))
      .orderBy("s").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(_._2).sliding(2).forall(w => w(0) <= w(1)),
      s"ordinals must follow binary string order: ${got.mkString(",")}")
    assert(got.map(_._2).distinct.length == tricky.length - 2,
      s"exactly the shared-8-byte-prefix strings tie: ${got.mkString(",")}")
    assert(tricky.toDF("s")
      .select(Layout.ordinalExpr(lit(null).cast("string"), StringType))
      .head().isNullAt(0), "NULL propagates like every other ordinal")

    // 2. END-TO-END: a host-like string dimension clusters, records
    //    ordinal-space bounds, and serves pruned string-range reads
    val t = fresh("strings")
    def letter = lit("abcdefghijklmnopqrstuvwxyz")
      .substr((col("id") % 26 + 1).cast("int"), lit(1))
    TxnTable.commit(spark,
      spark.range(0, 4000).select(
        concat(lit("host-"), letter, lit("."), col("id")).as("host"),
        (col("id") * 37 % 1024).as("k"),
        col("id").as("v")),
      t, overwrite = false)
    TxnLayout.optimizeClustered(spark, t, Seq("host", "k"), numFiles = 8)
    val spec = TxnLayout.readSpec(t).get
    assert(spec.quant.exists(_._1 == "host"),
      s"string bounds recorded in ordinal space: ${spec.quant}")
    assertDisjoint(spec)
    val (toRead, nLive) = TxnStats.pruneFiles(spark, t, "host",
      "host-c", "host-e")
    assert(toRead.size < nLive,
      s"a host-range box must prune: ${toRead.size}/$nLive")
    assert(TxnStats.prunedRead(spark, t, "host", "host-c", "host-e").count() ==
      TxnTable.read(spark, t)
        .filter(col("host").between("host-c", "host-e")).count())
    // incremental rounds map stale strings into the SAME code space
    TxnTable.commit(spark,
      spark.range(4000, 4050).select(
        concat(lit("host-"), letter, lit("."), col("id")).as("host"),
        (col("id") * 37 % 1024).as("k"), col("id").as("v")).coalesce(1),
      t, overwrite = false)
    val (_, rewrote, _) = TxnLayout.reclusterIncremental(spark, t)
    assert(rewrote >= 2)
    assert(TxnLayout.readSpec(t).get.quant == spec.quant,
      "incremental maintenance reuses the recorded string bounds")
    assert(TxnTable.read(spark, t).count() == 4050L)

    // 3. TIE LADDER: half the rows share ONE mega-URL whose >8-byte
    //    common prefix makes its ordinal an irreducible tied code —
    //    equi-depth buckets the distinct half but one file still
    //    swallows the tie, and the salt rung is what bounds file
    //    sizes, with pruning decisions untouched
    val t2 = fresh("str_tied")
    val mega = "https://mega.example.com/"
    TxnTable.commit(spark,
      spark.range(0, 20000).select(
        when(col("id") % 2 === 0, mega)
          .otherwise(concat(letter, lit("-site."), col("id"))).as("url"),
        col("id").as("v"))
        .withColumn("u2", col("url")).select("url", "u2", "v"),
      t2, overwrite = false)
    TxnLayout.optimizeClustered(spark, t2, Seq("url", "u2"), numFiles = 16,
      quantMode = "equidepth")
    val skew1 = TxnLayout.fileSkew(t2)
    assert(skew1 > 3.0, s"one file must swallow the tied URL mass: $skew1")
    val r = TxnLayout.maintainClustered(spark, t2,
      maxStaleFraction = 1e18, maxFileSkew = 3.0)
    assert(r.isDefined && r.get._3 == 0, s"salted re-optimize expected: $r")
    val sp2 = TxnLayout.readSpec(t2).get
    assert(sp2.salt, "irreducible string ties escalate to the salt rung")
    assert(TxnLayout.fileSkew(t2) < 2.5,
      s"salted sizes bounded: $skew1 -> ${TxnLayout.fileSkew(t2)}")
    // pruning stays exact on the salted layout: the tied point reads
    // exactly the tied rows; a box avoiding it opens a strict subset
    assert(TxnStats.prunedRead(spark, t2, "url", mega, mega).count() == 10000L)
    val (tr2, nl2) = TxnStats.pruneFiles(spark, t2, "url",
      "a-site.", "b-site.~")
    assert(tr2.size < nl2, s"off-tie box must prune: ${tr2.size}/$nl2")
  }

  test("unsupported clustering column types refuse loudly") {
    val t = fresh("badtype")
    TxnTable.commit(spark,
      spark.range(0, 10).select(col("id").cast("string").as("s"),
        col("id").cast("double").as("f"), col("id").as("v")),
      t, overwrite = false)
    val e = intercept[IllegalArgumentException] {
      TxnLayout.optimizeClustered(spark, t, Seq("f", "v"), numFiles = 2)
    }
    assert(e.getMessage.contains("no monotone long ordinal"), e.getMessage)
    // a decimal wider than 18 digits has no long-unscaled form either
    val wide = fresh("badtype_wide")
    TxnTable.commit(spark,
      spark.range(0, 10).select(col("id").cast("decimal(24,2)").as("p"),
        col("id").as("v")),
      wide, overwrite = false)
    intercept[IllegalArgumentException] {
      TxnLayout.optimizeClustered(spark, wide, Seq("p", "v"), numFiles = 2)
    }
  }

  test("boundsStaleness(refresh=false) is strictly read-only and only ever under-counts") {
    val t = fresh("rostale")
    TxnTable.commit(spark,
      spark.range(0, 1000).select(
        (col("id") * 1000003L).as("x"), (col("id") * 999983L).as("y"),
        col("id").as("v")),
      t, overwrite = false)
    TxnLayout.optimizeClustered(spark, t, Seq("x", "y"), numFiles = 4)
    // ingest beyond the recorded bounds — its file is NOT yet indexed
    TxnTable.commit(spark,
      spark.range(2000, 2050).select(
        (col("id") * 1000003L).as("x"), (col("id") * 999983L).as("y"),
        col("id").as("v")).coalesce(1),
      t, overwrite = false)
    def statsState(): Set[(String, Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(t, "_graft_stats"))
        .map(f => (f.getPath, f.length, f.lastModified)).toSet
    }
    val before = statsState()
    // read-only: the advisory path on a read-only mount — no sidecar
    // refresh, so the fresh clamped file counts 0 (under-reports)
    assert(TxnLayout.boundsStaleness(spark, t, refresh = false) == ((0L, 1050L)))
    assert(statsState() == before,
      "refresh=false must not write into the table directory")
    // the default path refreshes and sees the clamped mass
    assert(TxnLayout.boundsStaleness(spark, t) == ((50L, 1050L)))
    assert(statsState() != before, "the default path freshens the sidecars")
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

  test("legacy (pre-r15) sidecar over temporal columns: one documented upgrade, never a mis-map") {
    val t = fresh("legacyord")
    TxnTable.commit(spark,
      spark.range(0, 1200).select(
        expr("timestamp_seconds(1500000000 + id * 3600)").as("ts"),
        (col("id") * 1000003L).as("k"), col("id").as("v")),
      t, overwrite = false)
    TxnLayout.optimizeClustered(spark, t, Seq("ts", "k"), numFiles = 4)
    assert(TxnLayout.readSpec(t).get.ordSpace == 1,
      "fresh writes record the typed ordinal space")
    // forge a pre-r15 sidecar: strip the ordspace field — the parse
    // default (0 = cast-long seconds space) is exactly what an old
    // sidecar reads as. Its recorded micro-space bounds are now LYING
    // about their space, the scenario under test.
    val sf = new File(t, "_graft_stats/cluster.json")
    val body = new String(java.nio.file.Files.readAllBytes(sf.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    java.nio.file.Files.write(sf.toPath,
      body.replace("\"ordspace\":1,", "")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(TxnLayout.readSpec(t).get.ordSpace == 0)
    // stale ingest: incremental maintenance must REFUSE (recomposing
    // micros codes against seconds-space bounds mis-maps every row)
    TxnTable.commit(spark,
      spark.range(100, 110).select(
        expr("timestamp_seconds(1500000000 + id * 3600)").as("ts"),
        (col("id") * 1000003L).as("k"), (col("id") + 5000L).as("v"))
        .coalesce(1),
      t, overwrite = false)
    val e = intercept[IllegalStateException] {
      TxnLayout.reclusterIncremental(spark, t)
    }
    assert(e.getMessage.contains("ordinal space"), e.getMessage)
    // the bounds are unusable → the WHOLE table reads as clamped, so
    // the maintenance policy answers with the one full re-optimize
    // that re-measures bounds and upgrades the sidecar
    val (clamped, total) = TxnLayout.boundsStaleness(spark, t)
    assert(clamped == total && total == 1210L, s"($clamped, $total)")
    val r = TxnLayout.maintainClustered(spark, t, maxStaleFraction = 1e9,
      maxClampedFraction = 0.5)
    assert(r.isDefined && r.get._3 == 0, s"full re-optimize expected: $r")
    val up = TxnLayout.readSpec(t).get
    assert(up.ordSpace == 1, "the re-optimize upgrades the sidecar")
    assert(up.quant.find(_._1 == "ts").get._2 == 1500000000L * 1000000L,
      "re-measured bounds live in micro space")
    assertDisjoint(up)
    // and maintenance works again (no refusal, no clamp)
    assert(TxnLayout.boundsStaleness(spark, t)._1 == 0L)
    val (_, r2, k2) = TxnLayout.reclusterIncremental(spark, t)
    assert(r2 == 0 && k2 > 0)
    assert(TxnTable.read(spark, t).count() == 1210L)
    // an all-integral legacy sidecar never trips the guard: both
    // spaces agree on longs, so old integer layouts stay maintainable
    val ti = fresh("legacyord_int")
    seed(ti)
    TxnLayout.optimizeClustered(spark, ti, Seq("x", "y"), numFiles = 4)
    val sfi = new File(ti, "_graft_stats/cluster.json")
    val bodyI = new String(java.nio.file.Files.readAllBytes(sfi.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    java.nio.file.Files.write(sfi.toPath,
      bodyI.replace("\"ordspace\":1,", "")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(TxnLayout.readSpec(ti).get.ordSpace == 0)
    val (c2, _) = TxnLayout.boundsStaleness(spark, ti)
    assert(c2 == 0L, "integral legacy sidecars stay healthy")
    val (_, ri, ki) = TxnLayout.reclusterIncremental(spark, ti)
    assert(ri == 0 && ki > 0, "integral legacy sidecars stay maintainable")
  }
}
