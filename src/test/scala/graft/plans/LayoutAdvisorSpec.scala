package graft.plans

import graft.SparkSpec
import graft.operators.Layout
import org.apache.spark.sql.functions._

/** The layout advisor's extraction, decision rules, and the CLOSING
  * LOOP: applying a recommendation makes the recommending workload
  * prune (partition pruning / bloom file skipping on the real read
  * path) — which is the only reason to take the advice. */
class LayoutAdvisorSpec extends SparkSpec {
  import spark.implicits._

  private val root = "/root/repo/target/tmp/layout_advisor_spec"

  /** 4 low-card categories, high-card id, ids RANGE-clustered across 4
    * files (so a point lookup is a genuine file-skipping case). */
  private def writeBase(): String = {
    val p = s"$root/base.parquet"
    (0L until 4000L).map(i => (i, s"c${i % 4}", i % 97))
      .toDF("id", "cat", "v")
      .repartitionByRange(4, col("id")).write.mode("overwrite").parquet(p)
    p
  }

  test("extraction: eq / range / join uses attribute to the owning scan") {
    val p = writeBase()
    def base = spark.read.parquet(p)
    val otherP = s"$root/other.parquet"
    (0L until 40L).map(k => (k, k % 5)).toDF("k", "g")
      .write.mode("overwrite").parquet(otherP)
    val uses = LayoutAdvisor.columnUses(
      base.filter(col("cat") === "c1" && col("v") >= 10 && col("v") < 50)
        .join(spark.read.parquet(otherP), col("id") === col("k"))
        .groupBy("g").agg(count(lit(1)).as("n")))
    val byCol = uses.map(u => (u.base, u.column) -> (u.nEq, u.nRange, u.nJoin)).toMap
    assert(byCol(("base.parquet", "cat")) == ((1L, 0L, 0L)))
    assert(byCol(("base.parquet", "v")) == ((0L, 2L, 0L)))
    assert(byCol(("base.parquet", "id")) == ((0L, 0L, 1L)))
    assert(byCol(("other.parquet", "k")) == ((0L, 0L, 1L)))
    // a function of a column is ignored, never misattributed
    val none = LayoutAdvisor.columnUses(
      base.filter(abs(col("v")) === 3).groupBy("cat").agg(count(lit(1)).as("n")))
    assert(none.isEmpty)
  }

  test("decision rules: partition / zorder / bloom / bucket by ndv and use") {
    val p = writeBase()
    def base = spark.read.parquet(p)
    val rec = LayoutAdvisor.recommend(spark, Seq(
      base.filter(col("cat") === "c2").select("id"), // eq, ndv 4
      base.filter(col("id") === 17L).select("cat"), // eq, ndv 4000
      base.filter(col("v") >= 11 && col("v") < 22).select("id"), // range, ndv 97
      base.join(base.select(col("id").as("id2")), col("id") === col("id2"))
        .groupBy("cat").agg(count(lit(1)).as("n"))
    ), maxPartitions = 100L, exactNdv = true).collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[String]("action")).toMap
    assert(rec("cat") == "partition") // low ndv, filtered
    assert(rec("v") == "partition") // ndv 97 <= 100: directory pruning wins
    assert(rec("id") == "bloom") // eq at ndv 4000 > maxPartitions
    val rec2 = LayoutAdvisor.recommend(spark, Seq(
      base.filter(col("v") >= 10).select("id"), // range only
      base.join(base.select(col("id").as("id2")), col("id") === col("id2"))
        .groupBy("cat").agg(count(lit(1)).as("n"))
    ), maxPartitions = 50L, exactNdv = true).collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[String]("action")).toMap
    assert(rec2("v") == "zorder") // ndv 97 > 50 → cluster + min-max skip
    assert(rec2("id") == "bucket") // join-only key
  }

  test("closing the loop: applying the advice makes the workload prune") {
    val p = writeBase()
    def base = spark.read.parquet(p)
    val workload = Seq(
      base.filter(col("cat") === "c3").select("id", "v"),
      base.filter(col("id") === 123L).select("cat"))
    val rec = LayoutAdvisor.recommend(spark, workload, maxPartitions = 100L,
      exactNdv = true)
      .collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[String]("action")).toMap
    assert(rec("cat") == "partition" && rec("id") == "bloom")
    // APPLY partition: rewrite partitioned; the same filter prunes to 1 dir
    val partP = s"$root/base_by_cat"
    base.write.partitionBy("cat").mode("overwrite").parquet(partP)
    val q = spark.read.parquet(partP).filter(col("cat") === "c3")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString()
    assert(scan.contains("PartitionFilters"), scan.take(500))
    assert(q.count() == 1000L)
    // APPLY bloom: index files; a point lookup reads a strict file subset
    val idx = Layout.buildBloomIndex(spark, p, "id", expectedPerFile = 2000)
    val nFiles = new java.io.File(p).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val pruned = Layout.bloomPrunedFiles(idx, Seq(123L))
    assert(pruned.nonEmpty && pruned.length < nFiles, s"$nFiles -> ${pruned.length}")
    assert(Layout.bloomPrunedRead(spark, idx, "id", Seq(123L))
      .filter(col("id") === 123L).count() == 1L)
  }

  test("composite z-order advice: one 3-column recommendation; applying it prunes a box") {
    val p = s"$root/base3.parquet"
    // independent dims (seeded): a linear-mod derivation is a 1-D
    // lattice in 3-space and a small box can miss every point of it
    val rng = new scala.util.Random(13)
    (0L until 4000L).map(i =>
        (i, rng.nextInt(4000).toLong, rng.nextInt(4000).toLong, s"c${i % 4}"))
      .toDF("a", "b", "c", "cat")
      .repartitionByRange(4, col("a")).write.mode("overwrite").parquet(p)
    def base = spark.read.parquet(p)
    val adv = LayoutAdvisor.zorderAdvice(spark, Seq(
      base.filter(col("a") >= 100 && col("a") < 900).select("b"),
      base.filter(col("b") < 500).select("a"),
      base.filter(col("c") >= 2000).select("c"),
      base.filter(col("cat") === "c1").select("a")), // low-NDV eq: partition-served, stays out
      maxPartitions = 100L, exactNdv = true).collect()
    assert(adv.length == 1, adv.mkString(";"))
    assert(adv.head.getAs[String]("cols") == "a,b,c")
    assert(adv.head.getAs[Long]("n_cols") == 3L)
    assert(adv.head.getAs[Long]("n_range") == 4L) // two conjuncts on a
    assert(adv.head.getAs[Boolean]("recommend"))
    // closing the loop: zorderWriteN on exactly the recommended columns
    // makes a 3-dim box open a STRICT subset of the files, no row lost
    val zp = s"$root/base3_z"
    graft.operators.Layout.zorderWriteN(base, Seq("a", "b", "c"), zp,
      numFiles = 16)
    val idx = graft.operators.Layout.buildMinMaxIndexN(spark, zp,
      Seq("a", "b", "c")).localCheckpoint(true)
    val bounds = Seq(("a", 100L, 899L), ("b", 0L, 499L), ("c", 2000L, 2600L))
    val opened = idx.filter(bounds.map { case (cName, lo, hi) =>
      col(s"min_$cName") <= hi && col(s"max_$cName") >= lo }
      .reduce(_ && _)).count()
    assert(opened < idx.count(), s"box opened $opened of ${idx.count()} files")
    val got = graft.operators.Layout.prunedReadBox(spark, idx, bounds).count()
    val want = base.filter(col("a").between(100, 899) &&
      col("b").between(0, 499) && col("c").between(2000, 2600)).count()
    assert(want > 0 && got == want, s"pruned read lost rows: $got vs $want")
  }

  test("4-column advice carries an applyable bits width; the advised row applies end-to-end") {
    val p = s"$root/base4.parquet"
    val rng = new scala.util.Random(17)
    (0L until 4000L).map(i => (i, rng.nextInt(4000).toLong,
        rng.nextInt(4000).toLong, rng.nextInt(4000).toLong))
      .toDF("a", "b", "c", "d")
      .repartitionByRange(4, col("a")).write.mode("overwrite").parquet(p)
    def base = spark.read.parquet(p)
    val adv = LayoutAdvisor.zorderAdvice(spark, Seq(
      base.filter(col("a") >= 100 && col("a") < 900).select("b"),
      base.filter(col("b") < 500).select("a"),
      base.filter(col("c") >= 2000).select("c"),
      base.filter(col("d") >= 10).select("d")), exactNdv = true).collect()
    assert(adv.length == 1, adv.mkString(";"))
    val row = adv.head
    assert(row.getAs[Long]("n_cols") == 4L && row.getAs[Boolean]("recommend"))
    // 4 × 16 = 64 overflows a signed long — the advised width must fit
    assert(row.getAs[Long]("bits") == 15L,
      s"4-column advice must advise bits = 63/4 = 15, got ${row.getAs[Long]("bits")}")
    assert(row.getAs[String]("curve") == "hilbert")
    assert(!row.getAs[Boolean]("clip_recommended"),
      "uniform columns must not recommend winsorized bounds")
    // apply EVERY advised field (cols, curve, bits) — the loop the
    // advisor exists for; at the default bits=16 this application
    // would trip the curve's n·bits ≤ 63 check instead of clustering
    val t = s"$root/txn_adv4"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))
    graft.sources.TxnTable.commit(spark, base, t, overwrite = false)
    val cols = row.getAs[String]("cols").split(",").toSeq
    val want = base.select("a", "b", "c", "d")
      .as[(Long, Long, Long, Long)].collect().toSet
    graft.sources.TxnLayout.optimizeClustered(spark, t, cols,
      curve = row.getAs[String]("curve"), numFiles = 8,
      bits = row.getAs[Long]("bits").toInt)
    assert(graft.sources.TxnTable.read(spark, t).select("a", "b", "c", "d")
      .as[(Long, Long, Long, Long)].collect().toSet == want,
      "clustered rewrite must round-trip content")
    intercept[Exception] {
      graft.sources.TxnLayout.optimizeClustered(spark, t, cols,
        curve = row.getAs[String]("curve"), numFiles = 8, bits = 16)
    }
  }

  test("skew probe: an outlier-dominated composite column recommends winsorized bounds") {
    val p = s"$root/skewed.parquet"
    // bulk in [0, 4000) plus two sentinels near 2^50 on column a — the
    // full span dwarfs the p1–p99 span, the regime plain range
    // quantization collapses on (Layout.rangeScale clipQuantile)
    ((0L until 4000L).map(i => (i, i * 7 % 4000)) ++
      Seq((1L << 50, 0L), ((1L << 50) + 1, 1L)))
      .toDF("a", "b")
      .repartition(2).write.mode("overwrite").parquet(p)
    def base = spark.read.parquet(p)
    val adv = LayoutAdvisor.zorderAdvice(spark, Seq(
      base.filter(col("a") >= 100 && col("a") < 900).select("b"),
      base.filter(col("b") < 500).select("a")), exactNdv = true).collect()
    assert(adv.length == 1, adv.mkString(";"))
    assert(adv.head.getAs[String]("cols") == "a,b")
    assert(adv.head.getAs[Boolean]("clip_recommended"),
      "the sentinel-stretched column must flag winsorized quantization")
    assert(adv.head.getAs[String]("quant_mode") == "range",
      "distinct-valued columns are range territory, not equi-depth")
    // clipRatio = 0 disables the probe entirely (no skew aggregates)
    val off = LayoutAdvisor.zorderAdvice(spark, Seq(
      base.filter(col("a") >= 100 && col("a") < 900).select("b"),
      base.filter(col("b") < 500).select("a")),
      exactNdv = true, clipRatio = 0.0).collect()
    assert(!off.head.getAs[Boolean]("clip_recommended"))
    assert(off.head.getAs[String]("quant_mode") == "range")
  }

  test("concentration probe: a collapsed-IQR column advises equi-depth; the advised row applies") {
    val p = s"$root/conc.parquet"
    // 87.5% of rows tie on value 7 (collapsed IQR) while the remaining
    // 2000 rows carry distinct high values (NDV > 1024, so the column
    // stays zorder territory) — range scaling would put the tied mass
    // in one bucket
    (0L until 16000L).map { i =>
      val a = if (i % 8 != 0) 7L else 100000L + i * 997L
      (a, i % 2000, i)
    }.toDF("a", "b", "v")
      .repartition(2).write.mode("overwrite").parquet(p)
    def base = spark.read.parquet(p)
    val adv = LayoutAdvisor.zorderAdvice(spark, Seq(
      base.filter(col("a") >= 5 && col("a") < 200000).select("v"),
      base.filter(col("b") < 500).select("a")), exactNdv = true).collect()
    assert(adv.length == 1, adv.mkString(";"))
    val row = adv.head
    assert(row.getAs[String]("quant_mode") == "equidepth", row.toString)
    // close the loop: apply EVERY advised field including the mode
    val t = s"$root/txn_conc"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))
    graft.sources.TxnTable.commit(spark, base, t, overwrite = false)
    graft.sources.TxnLayout.optimizeClustered(spark, t,
      row.getAs[String]("cols").split(",").toSeq,
      curve = row.getAs[String]("curve"), numFiles = 8,
      bits = row.getAs[Long]("bits").toInt,
      quantMode = row.getAs[String]("quant_mode"))
    val spec = graft.sources.TxnLayout.readSpec(t).get
    assert(spec.qbounds.nonEmpty, "the applied mode must record boundaries")
    assert(graft.sources.TxnTable.read(spark, t).count() == 16000L)
  }

  test("unsupported-type candidates are NAMED advice, never a composite the apply path refuses") {
    val p = s"$root/unsup.parquet"
    // a wide decimal and a double beside two clusterable longs — the
    // price/measure columns a real fact range-filters constantly
    val rng = new scala.util.Random(23)
    (0L until 4000L).map(i => (i, rng.nextInt(4000).toLong,
        BigDecimal(i) * BigDecimal("1000000000000.01"), i * 1.5))
      .toDF("a", "b", "huge", "dbl")
      .select(col("a"), col("b"),
        col("huge").cast("decimal(38,2)").as("huge"), col("dbl"))
      .repartition(2).write.mode("overwrite").parquet(p)
    def base = spark.read.parquet(p)
    val adv = LayoutAdvisor.zorderAdvice(spark, Seq(
      base.filter(col("a") >= 100 && col("a") < 900).select("b"),
      base.filter(col("b") < 500).select("a"),
      base.filter(col("huge") > 5).select("a"),
      base.filter(col("dbl") > 10.0).select("b")), exactNdv = true).collect()
    assert(adv.length == 1, adv.mkString(";"))
    val row = adv.head
    // the composite names ONLY the applyable dimensions…
    assert(row.getAs[String]("cols") == "a,b", row.toString)
    assert(row.getAs[Boolean]("recommend"))
    // …and the refused ones are NAMED: column, reason, workaround cast
    val u = row.getAs[String]("unsupported_cols")
    assert(u.contains("huge (DECIMAL(38,2)") &&
      u.contains("cast to DECIMAL(18,2)"), u)
    assert(u.contains("dbl (floating-point") &&
      u.contains("scaled LONG surrogate"), u)
    // the advised row applies end-to-end — the whole point of refusing
    // the unsupported columns up front
    val zp = s"$root/unsup_z"
    graft.operators.Layout.zorderWriteRanged(base.select("a", "b"),
      row.getAs[String]("cols").split(",").toSeq, zp, numFiles = 8,
      bits = row.getAs[Long]("bits").toInt)
    assert(spark.read.parquet(zp).count() == 4000L)
    // a base whose EVERY zorder candidate refuses still surfaces, as a
    // refusal-only row (empty composite, recommend false)
    val p2 = s"$root/unsup_only.parquet"
    (0L until 3000L).map(i => (i * 1.5, i)).toDF("dbl", "k")
      .repartition(2).write.mode("overwrite").parquet(p2)
    val adv2 = LayoutAdvisor.zorderAdvice(spark, Seq(
      spark.read.parquet(p2).filter(col("dbl") > 10.0).select("k")),
      exactNdv = true).collect()
    assert(adv2.length == 1, adv2.mkString(";"))
    assert(adv2.head.getAs[String]("cols") == "" &&
      !adv2.head.getAs[Boolean]("recommend") &&
      adv2.head.getAs[String]("unsupported_cols").startsWith("dbl ("),
      adv2.head.toString)
  }

  test("approximate NDV (the 100 TB default) keeps the partition boundary safe") {
    val p = s"$root/approx.parquet"
    (0L until 20000L).map(i => (i % 1000, i % 8))
      .toDF("h", "l").write.mode("overwrite").parquet(p)
    def base = spark.read.parquet(p)
    val workload = Seq(
      base.filter(col("h") === 5L).select("l"),
      base.filter(col("l") === 1L).select("h"))
    def decisions(exact: Boolean) =
      LayoutAdvisor.recommend(spark, workload, maxPartitions = 1024L,
        exactNdv = exact).collect()
        .map(r => r.getAs[String]("col_name") ->
          ((r.getAs[Long]("ndv"), r.getAs[String]("action")))).toMap
    val approx = decisions(exact = false)
    val exact = decisions(exact = true)
    // far from the boundary the sketch cannot flip the decision
    assert(approx("l")._2 == "partition" && exact("l")._2 == "partition")
    // the sketch estimate lands inside its error bound
    assert(math.abs(approx("h")._1 - 1000L) <= (3 * 0.05 * 1000).toLong,
      s"approx ndv ${approx("h")._1} off true 1000")
    // AT the boundary (true ndv 1000 vs budget 1024) a ±5% sketch error
    // could land either side; exact admits partition, the approx rule
    // declines CONSERVATIVELY (1000·1.1 > 1024) and falls back to
    // bloom — the action that stays safe whichever way the sketch
    // erred, since over-partitioning mints runaway directories while
    // bloom merely trades a minor pruning win
    assert(exact("h")._2 == "partition")
    assert(approx("h")._2 == "bloom")
  }

  test("compaction advice: fragmented flags, compacted clears") {
    import graft.operators.Layout
    val p = s"$root/frag.parquet"
    (0L until 2000L).map(i => (i, i % 7)).toDF("id", "v")
      .repartition(40).write.mode("overwrite").parquet(p)
    val a = LayoutAdvisor.compactionAdvice(spark, p, targetRowsPerFile = 1000L)
      .head()
    assert(a.getAs[Long]("n_files") == 40L)
    assert(a.getAs[Long]("total_rows") == 2000L)
    assert(a.getAs[Long]("avg_rows_per_file") == 50L)
    assert(a.getAs[Boolean]("recommend_compact")) // 50 < 500
    Layout.compact(spark, p, targetBytes = 1L << 40)
    val b = LayoutAdvisor.compactionAdvice(spark, p, targetRowsPerFile = 1000L)
      .head()
    assert(b.getAs[Long]("n_files") == 1L)
    assert(b.getAs[Long]("total_rows") == 2000L)
    assert(!b.getAs[Boolean]("recommend_compact"))
    // a healthy single file is never flagged even at a huge target:
    // n_files == 1 means there is nothing to merge
    val c = LayoutAdvisor.compactionAdvice(spark, p,
      targetRowsPerFile = 1000000L).head()
    assert(!c.getAs[Boolean]("recommend_compact"))
  }

  test("txn compaction advice reads the log, agrees with the scan, survives lost sidecars") {
    import graft.sources.TxnTable
    import org.apache.commons.io.FileUtils
    val t = s"$root/txn_comp"
    FileUtils.deleteQuietly(new java.io.File(t))
    TxnTable.commit(spark, (0L until 900L).map(i => (i, i % 5)).toDF("id", "v")
      .repartition(6), t, overwrite = false)
    TxnTable.commit(spark, (900L until 1200L).map(i => (i, i % 5)).toDF("id", "v")
      .repartition(3), t, overwrite = false)
    def adv() = LayoutAdvisor
      .compactionAdviceTxn(spark, t, targetRowsPerFile = 1000L).head()
    val a = adv()
    assert(a.getAs[Long]("n_files") == 9L)
    assert(a.getAs[Long]("total_rows") == 1200L)
    assert(a.getAs[Boolean]("recommend_compact")) // avg 133 < 500
    // lose every stats sidecar (pre-stats table / crashed writer):
    // footer fallback yields the identical verdict
    Option(new java.io.File(t, "_graft_log").listFiles()).get
      .filter(_.getName.startsWith("stats_v")).foreach(_.delete())
    val b = adv()
    assert(b.getAs[Long]("n_files") == 9L &&
      b.getAs[Long]("total_rows") == 1200L &&
      b.getAs[Boolean]("recommend_compact"))
    // optimize clears the flag; the advice prices the NEW snapshot only
    TxnTable.optimize(spark, t, numFiles = 1)
    val c = adv()
    assert(c.getAs[Long]("n_files") == 1L &&
      c.getAs[Long]("total_rows") == 1200L &&
      !c.getAs[Boolean]("recommend_compact"))
  }

  test("vacuum advice prices the dry-run orphans; nothing is deleted") {
    import graft.sources.TxnTable
    import org.apache.commons.io.FileUtils
    val t = s"$root/txn_vac"
    FileUtils.deleteQuietly(new java.io.File(t))
    TxnTable.commit(spark, (0L until 300L).toDF("id").repartition(3), t,
      overwrite = false)
    TxnTable.commit(spark, (0L until 100L).toDF("id").repartition(2), t,
      overwrite = true)
    // the optimize just superseded v1's 3 files entirely
    val a = LayoutAdvisor.vacuumAdvice(spark, t, retainFrom = 2).head()
    assert(a.getAs[Long]("n_referenced_files") == 2L)
    assert(a.getAs[Long]("n_reclaimable_files") == 3L)
    assert(a.getAs[Long]("reclaimable_rows") == 300L)
    assert(a.getAs[Boolean]("recommend_vacuum")) // 300·2 ≥ 100 live
    // ADVICE deletes nothing — time travel to v1 still works after it
    assert(TxnTable.read(spark, t, asOf = Some(1)).count() == 300L)
    // retaining everything reclaims nothing
    val b = LayoutAdvisor.vacuumAdvice(spark, t, retainFrom = 1).head()
    assert(b.getAs[Long]("n_reclaimable_files") == 0L &&
      !b.getAs[Boolean]("recommend_vacuum"))
    // apply path: vacuum deletes exactly what the advice priced, and a
    // re-advice reports a clean table
    assert(TxnTable.vacuum(t, retainFrom = 2) == 3)
    val c = LayoutAdvisor.vacuumAdvice(spark, t, retainFrom = 2).head()
    assert(c.getAs[Long]("n_reclaimable_files") == 0L)
  }
}
