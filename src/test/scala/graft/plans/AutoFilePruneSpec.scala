package graft.plans

import java.io.File

import graft.SparkSpec
import graft.sources.{TxnStats, TxnTable}
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Behavior specs for auto-injected dynamic file pruning: a PLAIN
  * `TxnTable.read(fact).join(dim)` opens strictly fewer files than the
  * live set with results identical to the unpruned join, outer joins
  * prune only the null-extending side, and every gate declines — kill
  * switch, dim size budget, non-deterministic dim, non-txn scans,
  * blocked walks (Aggregate between join and scan). */
class AutoFilePruneSpec extends SparkSpec {

  import spark.implicits._

  private val root = "/root/repo/target/tmp/spec_autodfp"
  private val factT = s"$root/fact"

  // fact: 4 quartile files over k ∈ [0, 400); dim keys hit files 0/2/3
  // (nothing in [100, 200) — the exact-key gap prune under test)
  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftPlanner.register(spark)
    FileUtils.deleteQuietly(new File(root))
    val fact = spark.range(0, 400).select(col("id").as("k"),
      (col("id") * 7L).as("v"))
    Seq(col("k") < 100, col("k") >= 100 && col("k") < 200,
      col("k") >= 200 && col("k") < 300, col("k") >= 300).foreach(p =>
      TxnTable.commit(spark, fact.filter(p).coalesce(1), factT,
        overwrite = false))
    TxnStats.refresh(spark, factT, "k")
  }

  private val dimRows = Seq((5L, "a"), (250L, "b"), (399L, "c"))
  private def dim = dimRows.toDF("dk", "tag")

  /** Files the FACT scan reads in the optimized plan (max over scans —
    * the dim sides here are LocalRelations, never file scans). */
  private def factFiles(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation =>
        lr.relation.asInstanceOf[HadoopFsRelation].location.inputFiles.length
    }.maxOption.getOrElse(0) // 0: Spark folded the scan away entirely

  private def unpruned[A](body: => A): A = {
    spark.conf.set("spark.graft.autoDfp.enabled", "false")
    try body finally spark.conf.unset("spark.graft.autoDfp.enabled")
  }

  test("plain inner join: 3 of 4 files open, result identical to unpruned") {
    def q = TxnTable.read(spark, factT).join(dim, col("k") === col("dk"))
    val expected = unpruned { q.collect().toSet }
    assert(unpruned { factFiles(q) } == 4)
    val pruned = q
    assert(factFiles(pruned) == 3, pruned.queryExecution.optimizedPlan)
    assert(pruned.collect().toSet == expected)
    assert(expected.size == 3)
  }

  test("filters and projections between join and scan don't block the prune") {
    def q = TxnTable.read(spark, factT)
      .filter(col("v") % 2 === 0)
      .select(col("k"), (col("v") + 1).as("v1"))
      .join(dim.filter(col("tag") =!= "zzz"), col("k") === col("dk"))
    assert(factFiles(q) == 3)
    assert(q.collect().toSet == unpruned { q.collect().toSet })
  }

  test("left outer: fact as null-extending side prunes, fact preserved does not") {
    val probe = Seq(5L, 250L, 399L, -1L).toDF("dk")
    def extending = probe.join(TxnTable.read(spark, factT),
      col("dk") === col("k"), "left")
    assert(factFiles(extending) == 3)
    val rows = extending.collect()
    assert(rows.length == 4 && rows.count(_.isNullAt(1)) == 1,
      "null-extended probe row must survive the prune")
    assert(rows.toSet == unpruned { extending.collect().toSet })
    // fact PRESERVED (left of a left join): every fact row must
    // surface, matched or not — never pruned
    def preserved = TxnTable.read(spark, factT).join(probe,
      col("k") === col("dk"), "left")
    assert(factFiles(preserved) == 4)
    assert(preserved.count() == 400)
  }

  test("left anti and semi prune the sound sides") {
    def anti = TxnTable.read(spark, factT).join(dim,
      col("k") === col("dk"), "left_anti")
    // fact is the preserved output of an anti join — right side is the
    // prunable one, but it's a LocalRelation; fact must stay 4 files
    assert(factFiles(anti) == 4)
    assert(anti.count() == 397)
    def semi = TxnTable.read(spark, factT).join(dim,
      col("k") === col("dk"), "left_semi")
    assert(factFiles(semi) == 3)
    assert(semi.collect().map(_.getLong(0)).toSet == Set(5L, 250L, 399L))
  }

  test("dim with no joinable key: scan collapses to one provably-dead file") {
    // a provably-EMPTY dim never reaches the rule: Spark's own
    // PropagateEmptyRelation folds the whole join first (factFiles 0)
    val noKeys = Seq.empty[Long].toDF("dk")
    def q = TxnTable.read(spark, factT).join(noKeys, col("k") === col("dk"))
    assert(factFiles(q) == 0)
    assert(q.count() == 0)
    // an all-NULL parquet dim (Catalyst can't fold a file scan): the
    // rule measures zero joinable keys → the scan keeps ONE provably
    // unjoinable file so the plan shape survives while nothing matches
    val nullDir = s"$root/nulldim"
    Seq(Option.empty[Long], Option.empty[Long]).toDF("dk")
      .coalesce(1).write.mode("overwrite").parquet(nullDir)
    def qn = TxnTable.read(spark, factT)
      .join(spark.read.parquet(nullDir), col("k") === col("dk"))
    assert(factFiles(qn) == 1) // max over fact scan (1 kept) + dim scan (1)
    assert(qn.count() == 0)
  }

  test("gates decline: kill switch, dim budget, non-determinism, non-txn scan, blocked walk") {
    def q = TxnTable.read(spark, factT).join(dim, col("k") === col("dk"))
    unpruned { assert(factFiles(q) == 4) }
    spark.conf.set("spark.graft.autoDfp.maxDimBytes", "1")
    try assert(factFiles(q) == 4, "over-budget dim must decline")
    finally spark.conf.unset("spark.graft.autoDfp.maxDimBytes")
    assert(factFiles(q) == 3, "and prune again once the budget is back")

    // a non-deterministic FILTER below the join (it cannot move): the
    // plan-time key set could disagree with the runtime rows → decline.
    // Two Catalyst traps the scenario must dodge: over a LocalRelation
    // the optimizer evaluates even a rand() filter eagerly
    // (ConvertToLocalRelation) → dim must be parquet-backed; and an
    // always-true comparison (rand() < 2.0) folds away entirely →
    // the threshold must be < 1. The assertion is plan-level, so the
    // filter's random runtime outcome never matters.
    val dimDir = s"$root/dimp"
    dim.coalesce(1).write.mode("overwrite").parquet(dimDir)
    val pdim = spark.read.parquet(dimDir)
    def qr = TxnTable.read(spark, factT).join(pdim.filter(rand() < 0.999999),
      col("k") === col("dk"))
    assert(factFiles(qr) == 4, "non-deterministic dim filter must decline")
    def qs = TxnTable.read(spark, factT).join(pdim.sample(0.999999),
      col("k") === col("dk"))
    assert(factFiles(qs) == 4, "sampled dim must decline")
    // a non-deterministic COLUMN beside the key: whether Catalyst
    // hoists it above the join (prunable) or not (declined) the
    // result must match — pin correctness, not the plan
    def qc = TxnTable.read(spark, factT).join(pdim.withColumn("r", rand()),
      col("k") === col("dk"))
    assert(factFiles(qc) <= 4 &&
      qc.select("k", "dk", "tag").collect().toSet ==
        unpruned { qc.select("k", "dk", "tag").collect().toSet })

    // a plain (non-txn) parquet dir never prunes — no sidecar, no root
    val plainDir = s"$root/plain"
    TxnTable.read(spark, factT).write.mode("overwrite").parquet(plainDir)
    def qp = spark.read.parquet(plainDir).join(dim, col("k") === col("dk"))
    assert(factFiles(qp) ==
      spark.read.parquet(plainDir).inputFiles.length)

    // an Aggregate between the join and the scan blocks the walk —
    // pruning under it could change the aggregated values
    def qa = TxnTable.read(spark, factT).groupBy("k")
      .agg(sum("v").as("sv")).join(dim, col("k") === col("dk"))
    assert(factFiles(qa) == 4)
    assert(qa.count() == 3)
  }

  test("full outer and no-equality joins never prune") {
    def fo = TxnTable.read(spark, factT).join(dim,
      col("k") === col("dk"), "full_outer")
    assert(factFiles(fo) == 4)
    assert(fo.count() == 400 + 0) // every dim key matches a fact row
    def rng = TxnTable.read(spark, factT).join(dim,
      col("k") < col("dk"))
    assert(factFiles(rng) == 4)
  }

  test("SQL surface: a plain spark.sql star over a txn view prunes identically") {
    TxnTable.read(spark, factT).createOrReplaceTempView("autodfp_fact")
    dim.createOrReplaceTempView("autodfp_dim")
    def q = spark.sql(
      """SELECT f.k, f.v, d.tag FROM autodfp_fact f
        |JOIN autodfp_dim d ON f.k = d.dk""".stripMargin)
    assert(factFiles(q) == 3, q.queryExecution.optimizedPlan)
    assert(q.collect().toSet == unpruned { q.collect().toSet })
    // and through a derived VIEW with a filter — the walk descends the
    // SubqueryAlias/Project/Filter stack SQL planning builds
    spark.sql("SELECT k, v FROM autodfp_fact WHERE v >= 0")
      .createOrReplaceTempView("autodfp_fact_view")
    def qv = spark.sql(
      """SELECT f.k FROM autodfp_fact_view f
        |JOIN autodfp_dim d ON f.k = d.dk""".stripMargin)
    assert(factFiles(qv) == 3)
    assert(qv.count() == 3)
  }

  test("conjunctive two-column keys compose: the auto form of multi-column DFP") {
    // a second fact clustered on BOTH (a, b): a 2×2 grid of files; the
    // dim pins one (a-half, b-half) cell per conjunct — each equality
    // prunes its own column and the SAME scan narrows twice (the
    // per-column tag admits the second measurement), landing on the
    // one shared cell: strictly fewer files than either alone
    val gridT = s"$root/grid"
    FileUtils.deleteQuietly(new File(gridT))
    val g = spark.range(0, 400).select(col("id").as("a"),
      (col("id") * 7 % 400).as("b"), col("id").as("v"))
    Seq(col("a") < 200 && col("b") >= 200, col("a") < 200 && col("b") < 200,
      col("a") >= 200 && col("b") >= 200, col("a") >= 200 && col("b") < 200)
      .foreach(p => TxnTable.commit(spark, g.filter(p).coalesce(1), gridT,
        overwrite = false))
    TxnStats.refresh(spark, gridT, "a")
    TxnStats.refresh(spark, gridT, "b")
    // id 50 → (a=50, b=350): the (a<200, b>=200) cell only. Each
    // single-column prune keeps its half (2 files, values interleave
    // inside the half), the conjunction opens the one shared cell
    val d2 = Seq((50L, 350L)).toDF("da", "db")
    def q = TxnTable.read(spark, gridT).join(d2,
      col("a") === col("da") && col("b") === col("db"))
    assert(factFiles(q) == 1, q.queryExecution.optimizedPlan)
    assert(q.select("v").collect().map(_.getLong(0)).toSeq == Seq(50L))
    // one indexed + one UNINDEXED column: only the indexed conjunct
    // prunes (2 of 4), the unindexed one declines — never blind-skips
    val d3 = Seq((50L, 999L)).toDF("da", "dv")
    def qu = TxnTable.read(spark, gridT).join(d3,
      col("a") === col("da") && col("v") === col("dv"))
    assert(factFiles(qu) == 2, qu.queryExecution.optimizedPlan)
    assert(qu.count() == 0)
  }

  test("mixed-width integral keys: the analyzer's widening cast doesn't block the prune") {
    val intT = s"$root/intfact"
    FileUtils.deleteQuietly(new File(intT))
    val f = spark.range(0, 400).select(col("id").cast("int").as("ik"),
      (col("id") * 7L).as("v"))
    Seq(col("ik") < 100, col("ik") >= 100 && col("ik") < 200,
      col("ik") >= 200 && col("ik") < 300, col("ik") >= 300).foreach(p =>
      TxnTable.commit(spark, f.filter(p).coalesce(1), intT,
        overwrite = false))
    TxnStats.refresh(spark, intT, "ik")
    // LONG dim keys against the INT fact column: Catalyst reconciles
    // with cast(ik AS BIGINT) — widening, monotone, prunable
    val dimL = Seq(5L, 250L, 399L).toDF("dk")
    def q = TxnTable.read(spark, intT).join(dimL, col("ik") === col("dk"))
    assert(factFiles(q) == 3, q.queryExecution.optimizedPlan)
    assert(q.collect().toSet == unpruned { q.collect().toSet })
    // a user-written NARROWING cast truncates — raw bounds cannot
    // decide post-cast equality, so it must decline
    def qn = TxnTable.read(spark, factT).join(dimL,
      col("k").cast("int") === col("dk").cast("int"))
    assert(factFiles(qn) == 4, qn.queryExecution.optimizedPlan)
  }

  test("micro-batch bodies decline: foreachBatch joins never pay plan-time dim evaluation") {
    // foreachBatch REPLANS per batch — paying the dim evaluation once
    // per batch against a batch-sized delta is the one regime where
    // plan-time pruning costs more than it saves (measured 3.5× on the
    // streaming bench family). The rule declines by thread; the same
    // join planned on the caller thread afterwards still prunes.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Long]
    @volatile var inBatch = -1
    val q = ms.toDF().writeStream.foreachBatch {
      (_: DataFrame, _: Long) =>
        inBatch = factFiles(
          TxnTable.read(spark, factT).join(dim, col("k") === col("dk")))
    }.start()
    try { ms.addData(1L); q.processAllAvailable() } finally q.stop()
    assert(inBatch == 4,
      s"a micro-batch body must keep the full scan, opened $inBatch")
    assert(factFiles(TxnTable.read(spark, factT)
      .join(dim, col("k") === col("dk"))) == 3,
      "the same join on the caller thread still prunes")
  }

  test("range regime: key count past maxExactKeys still range-prunes") {
    spark.conf.set("spark.graft.autoDfp.maxExactKeys", "2")
    try {
      // 3 distinct keys > cap → range regime [5, 399] overlaps files
      // 0/2/3 AND file 1 ([100,200)) — range alone cannot gap-prune,
      // so all 4 stay: the regime switch is the behavior under test
      def q = TxnTable.read(spark, factT).join(dim, col("k") === col("dk"))
      assert(factFiles(q) == 4)
      // a CONTIGUOUS low dim range-prunes to the one covering file
      val lowDim = Seq(1L, 2L, 3L).toDF("dk")
      def ql = TxnTable.read(spark, factT).join(lowDim, col("k") === col("dk"))
      assert(factFiles(ql) == 1)
      assert(ql.count() == 3)
    } finally spark.conf.unset("spark.graft.autoDfp.maxExactKeys")
  }
}
