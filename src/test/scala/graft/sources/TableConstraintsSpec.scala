package graft.sources

import java.io.File

import graft.SparkSpec
import org.apache.commons.io.FileUtils

/** Declaration, persistence, validation, and matching semantics of the
  * RELY constraint store — the metadata half; the optimizer half lives
  * in ConstraintRulesSpec. */
class TableConstraintsSpec extends SparkSpec {

  import spark.implicits._

  private val root = "/root/repo/target/tmp/spec_constraints_meta"

  override def beforeAll(): Unit = {
    super.beforeAll()
    FileUtils.deleteQuietly(new File(root))
    new File(root).mkdirs()
  }

  private def freshDir(name: String): String = {
    val d = s"$root/$name"
    new File(d).mkdirs()
    d
  }

  test("declare/parse round-trip, multiple constraints, replacement") {
    val dim = freshDir("rt_dim")
    val fact = freshDir("rt_fact")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.mode("overwrite").parquet(dim)
    Seq((1L, 10L), (2L, 20L)).toDF("fk", "m").write.mode("overwrite").parquet(fact)

    TableConstraints.declareUnique(dim, Seq("k"))
    TableConstraints.declareUnique(dim, Seq("k", "v"), rely = false)
    TableConstraints.declareForeignKey(fact, Seq("fk"), dim, Seq("k"))

    assert(TableConstraints.uniques(dim).toSet == Set(
      TableConstraints.Unique(Seq("k"), rely = true),
      TableConstraints.Unique(Seq("k", "v"), rely = false)))
    val fks = TableConstraints.foreignKeys(fact)
    assert(fks.map(f => (f.cols, f.refCols, f.rely)) == Seq((Seq("fk"), Seq("k"), true)))
    assert(fks.head.refTable == new File(dim).getCanonicalPath)

    // re-declaring the same column set REPLACES (rely flips, no dup row)
    TableConstraints.declareUnique(dim, Seq("k"), rely = false)
    assert(TableConstraints.uniques(dim).count(_.cols == Seq("k")) == 1)
    assert(!TableConstraints.uniques(dim).find(_.cols == Seq("k")).get.rely)

    TableConstraints.clear(dim)
    assert(TableConstraints.uniques(dim).isEmpty)
  }

  test("validated declarations refuse on violation; holds-checks are strict") {
    val dup = freshDir("val_dup")
    Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
      .write.mode("overwrite").parquet(dup)
    intercept[IllegalArgumentException] {
      TableConstraints.declareUnique(dup, Seq("k"), validate = Some(spark))
    }
    assert(TableConstraints.uniques(dup).isEmpty) // refusal leaves no row
    // the two-column tuple IS unique — validation admits it
    TableConstraints.declareUnique(dup, Seq("k", "v"), validate = Some(spark))
    assert(TableConstraints.isUniqueOn(dup, Set("k", "v")))

    // strict uniqueness counts NULL tuples too (stronger than SQL UNIQUE)
    val nulldup = freshDir("val_nulldup")
    Seq(Option.empty[java.lang.Long], None, Some(1L): Option[java.lang.Long])
      .toDF("k").write.mode("overwrite").parquet(nulldup)
    assert(!TableConstraints.holdsUnique(spark, nulldup, Seq("k")))

    // FK: null fact keys are unconstrained; a dangling non-null key refuses
    val dim = freshDir("val_fkdim")
    Seq(1L, 2L).toDF("k").write.mode("overwrite").parquet(dim)
    val okFact = freshDir("val_fkok")
    Seq(Some(1L), None, Some(2L)).toDF("fk").write.mode("overwrite").parquet(okFact)
    TableConstraints.declareForeignKey(okFact, Seq("fk"), dim, Seq("k"),
      validate = Some(spark))
    assert(TableConstraints.foreignKeys(okFact).nonEmpty)
    val badFact = freshDir("val_fkbad")
    Seq(Some(1L), Some(99L)).toDF("fk").write.mode("overwrite").parquet(badFact)
    intercept[IllegalArgumentException] {
      TableConstraints.declareForeignKey(badFact, Seq("fk"), dim, Seq("k"),
        validate = Some(spark))
    }
  }

  test("isUniqueOn subset logic and rely gating; fkCovers is exact-cover") {
    val dim = freshDir("match_dim")
    Seq((1L, "a")).toDF("k", "v").write.mode("overwrite").parquet(dim)
    TableConstraints.declareUnique(dim, Seq("k"))
    // unique on fewer columns ⇒ unique on more
    assert(TableConstraints.isUniqueOn(dim, Set("k")))
    assert(TableConstraints.isUniqueOn(dim, Set("k", "v")))
    assert(!TableConstraints.isUniqueOn(dim, Set("v")))
    // a non-RELY declaration never feeds the optimizer
    TableConstraints.declareUnique(dim, Seq("v"), rely = false)
    assert(!TableConstraints.isUniqueOn(dim, Set("v")))

    val fact = freshDir("match_fact")
    Seq((1L, 2L)).toDF("fk", "other").write.mode("overwrite").parquet(fact)
    TableConstraints.declareForeignKey(fact, Seq("fk"), dim, Seq("k"))
    assert(TableConstraints.fkCovers(fact, Set("fk" -> "k"), dim))
    // extra join pair beyond the FK: NOT covered (exact match required)
    assert(!TableConstraints.fkCovers(fact, Set("fk" -> "k", "other" -> "v"), dim))
    assert(!TableConstraints.fkCovers(fact, Set("other" -> "k"), dim))
  }

  test("verify re-checks declared constraints against current data") {
    // a TxnTable root survives overwrite COMMITS (a plain-dir
    // `mode("overwrite")` truncates the directory, constraints file and
    // all — plain-dir declarations share the registrar's-contract
    // lifecycle of plain-dir MV registrations)
    val d = s"$root/verify_dim"
    TxnTable.commit(spark, Seq(1L, 2L).toDF("k"), d, overwrite = false)
    TableConstraints.declareUnique(d, Seq("k"), validate = Some(spark))
    assert(TableConstraints.verify(spark, d) ==
      Seq(("unique(k)", true, true)))
    // data churns under the RELY declaration — verify now reports false
    TxnTable.commit(spark, Seq(1L, 1L).toDF("k"), d, overwrite = true)
    assert(TableConstraints.verify(spark, d).head._3 == false)
  }

  test("NOT NULL: declare/validate/verify/replace; rely gates the optimizer view") {
    val d = freshDir("nn_dim")
    Seq((Some(1L), Some("a")), (Some(2L), None: Option[String]))
      .toDF("k", "v").write.mode("overwrite").parquet(d)
    TableConstraints.declareNotNull(d, Seq("k"), validate = Some(spark))
    assert(TableConstraints.notNulls(d) ==
      Seq(TableConstraints.NotNull(Seq("k"), rely = true)))
    assert(TableConstraints.isNotNullOn(d, "k"))
    assert(!TableConstraints.isNotNullOn(d, "v"))
    // a violated candidate refuses at declare
    intercept[IllegalArgumentException] {
      TableConstraints.declareNotNull(d, Seq("v"), validate = Some(spark))
    }
    // non-RELY documentation never feeds the optimizer
    TableConstraints.declareNotNull(d, Seq("v"), rely = false)
    assert(!TableConstraints.isNotNullOn(d, "v"))
    // replacement by column set, like unique
    TableConstraints.declareNotNull(d, Seq("k"), rely = false)
    assert(TableConstraints.notNulls(d).count(_.cols == Seq("k")) == 1)
    assert(!TableConstraints.isNotNullOn(d, "k"))
    // verify() reports all three families; the violated non-RELY is false
    TableConstraints.declareNotNull(d, Seq("k"), rely = true)
    val v = TableConstraints.verify(spark, d)
    assert(v.contains(("notnull(k)", true, true)))
    assert(v.contains(("notnull(v)", false, false)))
    // coexists with unique/fk rows in one file (round-trips the parser)
    TableConstraints.declareUnique(d, Seq("k"))
    assert(TableConstraints.uniques(d).nonEmpty &&
      TableConstraints.notNulls(d).size == 2)
  }

  test("verifyIncremental audits appended rows only; removals fall back to full") {
    val dim = s"$root/incr_dim"
    val fact = s"$root/incr_fact"
    TxnTable.commit(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dim,
      overwrite = false)
    TxnTable.commit(spark,
      Seq((Some(1L), 10L), (Some(2L), 20L), (None: Option[Long], 0L))
        .toDF("fk", "m"), fact, overwrite = false)
    TableConstraints.declareUnique(dim, Seq("k"), validate = Some(spark))
    TableConstraints.declareForeignKey(fact, Seq("fk"), dim, Seq("k"),
      validate = Some(spark))
    TableConstraints.declareNotNull(fact, Seq("m"), validate = Some(spark))

    // first audit: no watermark yet → FULL, all hold, watermark advances
    val first = TableConstraints.verifyIncremental(spark, fact)
    assert(first.forall(_._3), s"first audit must hold: $first")
    assert(first.forall(_._4 == "full"), s"first audit is full: $first")
    val firstDim = TableConstraints.verifyIncremental(spark, dim)
    assert(firstDim.forall(r => r._3 && r._4 == "full"))

    // clean appends on both sides → INCREMENTAL, all hold
    TxnTable.commit(spark, Seq((3L, "c")).toDF("k", "v"), dim,
      overwrite = false)
    TxnTable.commit(spark,
      Seq((Some(3L), 30L), (None: Option[Long], 1L)).toDF("fk", "m"), fact,
      overwrite = false)
    val incr = TableConstraints.verifyIncremental(spark, fact)
    assert(incr.forall(_._3), s"clean appends must hold: $incr")
    assert(incr.forall(_._4 == "incremental"), s"must be O(Δ): $incr")
    assert(TableConstraints.verifyIncremental(spark, dim)
      .forall(r => r._3 && r._4 == "incremental"))

    // nothing new → incremental no-op, still holds
    assert(TableConstraints.verifyIncremental(spark, fact)
      .forall(r => r._3 && r._4 == "incremental"))

    // a dangling append is CAUGHT incrementally (new rows anti-join ref)
    TxnTable.commit(spark, Seq((Some(99L), 99L)).toDF("fk", "m"), fact,
      overwrite = false)
    val bad = TableConstraints.verifyIncremental(spark, fact)
    val fkRow = bad.find(_._1.startsWith("fk(")).get
    assert(!fkRow._3 && fkRow._4 == "incremental")
    // the violation did NOT advance the watermark: the same Δ re-audits
    val badAgain = TableConstraints.verifyIncremental(spark, fact)
    assert(!badAgain.find(_._1.startsWith("fk(")).get._3)

    // heal by appending the missing dim key; audit goes green again
    TxnTable.commit(spark, Seq((99L, "z")).toDF("k", "v"), dim,
      overwrite = false)
    assert(TableConstraints.verifyIncremental(spark, fact).forall(_._3))

    // a REMOVAL version (overwrite) on the audited table → full fallback
    TxnTable.commit(spark, TxnTable.read(spark, dim), dim, overwrite = true)
    val afterRewrite = TableConstraints.verifyIncremental(spark, dim)
    assert(afterRewrite.forall(_._3))
    assert(afterRewrite.forall(_._4 == "full"),
      s"removals must fall back to a full audit: $afterRewrite")
  }

  test("verifyIncremental catches a duplicate key split across old and new (null-safe)") {
    val d = s"$root/incr_dup"
    TxnTable.commit(spark,
      Seq(Some(1L), Some(2L), None: Option[Long]).toDF("k"), d,
      overwrite = false)
    TableConstraints.declareUnique(d, Seq("k"), validate = None)
    // strict uniqueness holds at v1 (one null tuple) — full pass, wm set
    assert(TableConstraints.verifyIncremental(spark, d).forall(_._3))
    // append a key that duplicates an OLD row: within-new is clean, so
    // only the new-vs-old overlap probe can catch it
    TxnTable.commit(spark, Seq(Some(2L): Option[Long]).toDF("k"), d,
      overwrite = false)
    val dup = TableConstraints.verifyIncremental(spark, d)
    assert(!dup.head._3 && dup.head._4 == "incremental", s"got $dup")
    // and the NULL tuple: strict uniqueness counts nulls, so a second
    // null row is a violation an equi-join would MISS — null-safe probe
    val dn = s"$root/incr_dupnull"
    TxnTable.commit(spark, Seq(Some(1L), None: Option[Long]).toDF("k"), dn,
      overwrite = false)
    TableConstraints.declareUnique(dn, Seq("k"), validate = None)
    assert(TableConstraints.verifyIncremental(spark, dn).forall(_._3))
    TxnTable.commit(spark, Seq(None: Option[Long]).toDF("k"), dn,
      overwrite = false)
    val dupNull = TableConstraints.verifyIncremental(spark, dn)
    assert(!dupNull.head._3, s"null-tuple duplicate must be caught: $dupNull")

    // within-new duplicates are caught too
    val dw = s"$root/incr_dupnew"
    TxnTable.commit(spark, Seq(1L).toDF("k"), dw, overwrite = false)
    TableConstraints.declareUnique(dw, Seq("k"), validate = None)
    assert(TableConstraints.verifyIncremental(spark, dw).forall(_._3))
    TxnTable.commit(spark, Seq(7L, 7L).toDF("k"), dw, overwrite = false)
    assert(!TableConstraints.verifyIncremental(spark, dw).head._3)
  }

  test("verifyIncremental: a post-audit declaration forces a full re-audit") {
    val dim = s"$root/incr_drift_dim"
    val fact = s"$root/incr_drift_fact"
    TxnTable.commit(spark, Seq(1L, 2L).toDF("k"), dim, overwrite = false)
    TxnTable.commit(spark,
      Seq((1L, Some(10L)), (2L, None: Option[Long])).toDF("fk", "m"), fact,
      overwrite = false)
    TableConstraints.declareForeignKey(fact, Seq("fk"), dim, Seq("k"),
      validate = Some(spark))
    assert(TableConstraints.verifyIncremental(spark, fact).forall(_._3))
    // a NOT NULL asserted AFTER the green audit, unvalidated, violated
    // by rows the audit already covered: Δ-only would false-green it —
    // the changed declared set must force a FULL re-audit that reports
    // the violation honestly
    TableConstraints.declareNotNull(fact, Seq("m"))
    val drift = TableConstraints.verifyIncremental(spark, fact)
    val nn = drift.find(_._1 == "notnull(m)").get
    assert(nn._4 == "full" && !nn._3,
      s"post-audit declaration must re-audit fully and catch it: $drift")
  }

  test("verifyIncremental: a DV delete (rows gone, files kept) forces a full FK audit") {
    val dim = s"$root/incr_dv_dim"
    val fact = s"$root/incr_dv_fact"
    TxnTable.commit(spark, Seq(1L, 2L).toDF("k"), dim, overwrite = false)
    TxnTable.commit(spark, Seq(1L, 2L).toDF("fk"), fact, overwrite = false)
    TableConstraints.declareForeignKey(fact, Seq("fk"), dim, Seq("k"),
      validate = Some(spark))
    assert(TableConstraints.verifyIncremental(spark, fact).forall(_._3))
    // a deletion-vector commit removes the referenced key WITHOUT
    // removing files — its log entry has an empty removal list, which
    // the append-only gate must still refuse
    TxnTable.deleteWhereMor(spark, dim, $"k" === 2L)
    val afterDv = TableConstraints.verifyIncremental(spark, fact)
    val fkRow = afterDv.find(_._1.startsWith("fk(")).get
    assert(fkRow._4 == "full" && !fkRow._3,
      s"a DV delete on the ref must force a full FK audit: $afterDv")
  }

  test("verifyIncremental: a ref-side removal forces a full FK audit") {
    val dim = s"$root/incr_refdim"
    val fact = s"$root/incr_reffact"
    TxnTable.commit(spark, Seq(1L, 2L, 3L).toDF("k"), dim, overwrite = false)
    TxnTable.commit(spark, Seq(1L, 2L).toDF("fk"), fact, overwrite = false)
    TableConstraints.declareForeignKey(fact, Seq("fk"), dim, Seq("k"),
      validate = Some(spark))
    assert(TableConstraints.verifyIncremental(spark, fact).forall(_._3))
    // shrink the REF: old fact rows may now dangle — incremental-on-Δ
    // alone would miss it, so the fk row must re-audit FULLY
    TxnTable.commit(spark, Seq(1L).toDF("k"), dim, overwrite = true)
    val afterShrink = TableConstraints.verifyIncremental(spark, fact)
    val fkRow = afterShrink.find(_._1.startsWith("fk(")).get
    assert(fkRow._4 == "full", s"ref removal needs a full fk audit: $afterShrink")
    assert(!fkRow._3, "fk=2 now dangles")
  }

  test("enforced ingest quarantines violators with reasons; the RELY loop stays green") {
    val dim = s"$root/enf_dim"
    val fact = s"$root/enf_fact"
    val quar = s"$root/enf_quar"
    TxnTable.commit(spark, Seq(1L, 2L, 3L).toDF("k"), dim, overwrite = false)
    new File(fact).mkdirs()
    TableConstraints.declareUnique(dim, Seq("k"), validate = Some(spark))
    TableConstraints.declareForeignKey(fact, Seq("fk"), dim, Seq("k"))
    TableConstraints.declareNotNull(fact, Seq("m"))
    TableConstraints.declareUnique(fact, Seq("pk"))
    val b1 = Seq(
      (1L, Some(1L), Some(10L)),  // good
      (2L, Some(2L), Some(20L)),  // good
      (3L, Some(3L), Some(30L)),  // good
      (4L, Some(9L), Some(40L)),  // fk dangling
      (5L, Some(1L), None: Option[Long]), // null measure
      (6L, Some(2L), Some(60L)),  // within-batch dup pk →
      (6L, Some(3L), Some(61L)),  //   BOTH rows quarantine
      (7L, Some(9L), None: Option[Long])  // fk + notnull together
    ).toDF("pk", "fk", "m")
    assert(TableConstraints.commitEnforced(spark, b1, fact, quar) == (3L, 5L))
    val reasons = TxnTable.read(spark, quar).select("pk", "reason").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(reasons(4L) == "fk(fk)")
    assert(reasons(5L) == "notnull(m)")
    assert(reasons(6L) == "unique(pk)")
    assert(reasons(7L) == "notnull(m),fk(fk)", reasons(7L))
    // a later batch colliding with an INSTALLED key quarantines too
    val b2 = Seq((1L, Some(1L), Some(11L)), (8L, Some(2L), Some(80L)))
      .toDF("pk", "fk", "m")
    assert(TableConstraints.commitEnforced(spark, b2, fact, quar) == (1L, 1L))
    assert(TxnTable.read(spark, fact).count() == 4)
    // enforcement kept every declaration TRUE: the O(Δ) audit is green
    assert(TableConstraints.verifyIncremental(spark, fact).forall(_._3))
    // tagged replays are idempotent AS A WHOLE batch: a landed tag
    // skips both commits — a re-evaluated split would see the batch's
    // own keys installed and spuriously quarantine them as collisions
    val b3 = Seq((9L, Some(3L), Some(90L))).toDF("pk", "fk", "m")
    assert(TableConstraints.commitEnforced(spark, b3, fact, quar,
      tag = Some("batch-3")) == (1L, 0L))
    val v = TxnTable.currentVersion(fact)
    val quarN = TxnTable.read(spark, quar).count()
    assert(TableConstraints.commitEnforced(spark, b3, fact, quar,
      tag = Some("batch-3")) == (0L, 0L), "replay must report (0,0)")
    assert(TxnTable.currentVersion(fact) == v, "tagged replay must no-op")
    assert(TxnTable.read(spark, fact).filter($"pk" === 9L).count() == 1)
    assert(TxnTable.read(spark, quar).count() == quarN,
      "a replay must not quarantine the batch's own installed keys")
  }

  test("constraints on a TxnTable live beside the log and read the snapshot") {
    val t = s"$root/txn_tbl"
    TxnTable.commit(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t,
      overwrite = false)
    TableConstraints.declareUnique(t, Seq("k"), validate = Some(spark))
    assert(TableConstraints.isUniqueOn(t, Set("k")))
    // validation reads the SNAPSHOT (multi-version table: head rows only)
    TxnTable.commit(spark, Seq((3L, "c")).toDF("k", "v"), t, overwrite = false)
    assert(TableConstraints.holdsUnique(spark, t, Seq("k")))
    // a duplicating append breaks it — verify sees the head, not v0
    TxnTable.commit(spark, Seq((1L, "dup")).toDF("k", "v"), t, overwrite = false)
    assert(!TableConstraints.holdsUnique(spark, t, Seq("k")))
  }

  test("FK enforcement size gate: a large parent semi-prunes instead of broadcasting, same split") {
    val dim = s"$root/gate_dim"
    val factA = s"$root/gate_fact_a"
    val factB = s"$root/gate_fact_b"
    val quarA = s"$root/gate_quar_a"
    val quarB = s"$root/gate_quar_b"
    TxnTable.commit(spark, (1L to 100L).toDF("k"), dim, overwrite = false)
    Seq(factA, factB).foreach { f =>
      new File(f).mkdirs()
      TableConstraints.declareForeignKey(f, Seq("fk"), dim, Seq("k"))
    }
    val batch = Seq((1L, 5L), (2L, 100L), (3L, 999L), (4L, 777L))
      .toDF("pk", "fk")
    // small-parent path: the parent's distinct keys broadcast —
    // inspect the LAZY probe plan (the package-private core) directly
    spark.conf.set(TableConstraints.BroadcastMaxRowsKey, "1000000")
    val smallProbe = TableConstraints.enforceTagged(spark, batch, factA)._1
    assert(smallProbe.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
      "small parent must broadcast its distinct keys")
    assert(!smallProbe.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
      "small parent must not take the semi-prune path")
    val (gA, bA) = TableConstraints.enforceSplit(spark, batch, factA)
    val goodA = gA.collect().map(_.getLong(0)).toSet
    val badA = bA.select("pk", "reason").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // forced-large path: the parent must NOT broadcast its full
    // distinct key set — it is semi-pruned by the batch's keys first
    spark.conf.set(TableConstraints.BroadcastMaxRowsKey, "0")
    try {
      val largePlan = TableConstraints.enforceTagged(spark, batch, factB)
        ._1.queryExecution.optimizedPlan.toString
      assert(largePlan.contains("LeftSemi"),
        s"large parent must semi-prune by the batch's keys:\n$largePlan")
      val (gB, bB) = TableConstraints.enforceSplit(spark, batch, factB)
      assert(gB.collect().map(_.getLong(0)).toSet == goodA)
      assert(bB.select("pk", "reason").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet == badA)
      assert(badA == Set((3L, "fk(fk)"), (4L, "fk(fk)")))
    } finally spark.conf.unset(TableConstraints.BroadcastMaxRowsKey)
  }

  test("enforceSplit returns materialized (checkpoint-backed) frames — probes never re-run under rewrites") {
    val dim = s"$root/ckpt_dim"
    val fact = s"$root/ckpt_fact"
    TxnTable.commit(spark, Seq(1L, 2L).toDF("k"), dim, overwrite = false)
    new File(fact).mkdirs()
    TableConstraints.declareForeignKey(fact, Seq("fk"), dim, Seq("k"))
    val (good, bad) =
      TableConstraints.enforceSplit(spark,
        Seq((1L, 1L), (2L, 9L)).toDF("pk", "fk"), fact)
    // the probe pipeline (FK join) evaluated INSIDE enforceSplit's
    // rewrite-off scope: the returned frames scan checkpointed blocks,
    // so no later optimizer pass (a violated RELY rewriting its own
    // enforcement probe) can reach into the probe plan
    Seq(good, bad).foreach { df =>
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("Join"),
        s"enforceSplit frames must be checkpoint-backed, not lazy probe plans:\n$plan")
    }
    assert(good.collect().map(_.getLong(0)).toSet == Set(1L))
    assert(bad.select("pk").collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("check declarations: round-trip, replacement by name, refusals") {
    val t = freshDir("check_rt")
    Seq((1L, "AIR"), (2L, "RAIL")).toDF("qty", "mode")
      .write.mode("overwrite").parquet(t)
    TableConstraints.declareCheck(t, "qty_pos", "qty > 0")
    TableConstraints.declareCheck(t, "mode_known",
      "mode IN ('AIR','RAIL')", rely = false)
    assert(TableConstraints.checks(t).toSet == Set(
      TableConstraints.Check("qty_pos", "qty > 0", rely = true),
      TableConstraints.Check("mode_known", "mode IN ('AIR','RAIL')",
        rely = false)))
    // mixed-family file still parses section-exact
    TableConstraints.declareUnique(t, Seq("qty"))
    TableConstraints.declareNotNull(t, Seq("mode"))
    assert(TableConstraints.checks(t).size == 2 &&
      TableConstraints.uniques(t).size == 1 &&
      TableConstraints.notNulls(t).size == 1)
    // re-declaring a NAME replaces its row
    TableConstraints.declareCheck(t, "qty_pos", "qty >= 1")
    assert(TableConstraints.checks(t).count(_.name == "qty_pos") == 1)
    assert(TableConstraints.checks(t).find(_.name == "qty_pos")
      .get.expr == "qty >= 1")
    // refusals: malformed expression, double quotes, bad name — all at
    // declare time, never at first consumption
    intercept[Exception] {
      TableConstraints.declareCheck(t, "bad_syntax", "qty > (")
    }
    intercept[IllegalArgumentException] {
      TableConstraints.declareCheck(t, "bad_quote", "mode = \"AIR\"")
    }
    intercept[IllegalArgumentException] {
      TableConstraints.declareCheck(t, "bad name!", "qty > 0")
    }
    // a TYPO'D COLUMN refuses at declare time too (resolved against the
    // readable schema) — without this, every later commitEnforced /
    // verify on the table dies with an AnalysisException at ingest.
    // The probe needs an EXPLICIT session (resolve or validate): a pure
    // RELY declaration's outcome must never hinge on ambient
    // getActiveSession state
    val typo = intercept[IllegalArgumentException] {
      TableConstraints.declareCheck(t, "typo", "qtyy > 0",
        resolve = Some(spark))
    }
    assert(typo.getMessage.contains("does not resolve"), typo.getMessage)
    assert(!TableConstraints.checks(t).exists(_.name == "typo"))
    // ...so WITHOUT a session the same declaration is accepted
    // deterministically (syntax-gated only) in every environment
    TableConstraints.declareCheck(t, "typo_norelsess", "qtyy > 0")
    assert(TableConstraints.checks(t).exists(_.name == "typo_norelsess"))
    // declare-before-first-commit still works: no readable schema means
    // no resolution probe, only the syntax gate
    val empty = freshDir("check_predeclare")
    TableConstraints.declareCheck(empty, "future_col", "whatever > 0",
      resolve = Some(spark))
    assert(TableConstraints.checks(empty).exists(_.name == "future_col"))
  }

  test("check validation is STRICT: a NULL-evaluating row refuses the declaration") {
    val t = freshDir("check_strict")
    Seq(Some(5L), Some(7L), None).map(Tuple1(_)).toDF("qty")
      .write.mode("overwrite").parquet(t)
    // qty > 0 is UNKNOWN on the null row — SQL CHECK would pass it,
    // strict graft checks refuse (the optimizer rewrites need TRUE)
    intercept[IllegalArgumentException] {
      TableConstraints.declareCheck(t, "qty_pos", "qty > 0",
        validate = Some(spark))
    }
    assert(!TableConstraints.holdsCheck(spark, t, "qty > 0"))
    assert(TableConstraints.holdsCheck(spark, t, "qty > 0 OR qty IS NULL"))
    TableConstraints.declareCheck(t, "qty_pos_or_null",
      "qty > 0 OR qty IS NULL", validate = Some(spark))
    assert(TableConstraints.verify(spark, t) ==
      Seq(("check(qty_pos_or_null)", true, true)))
  }

  test("enforceSplit quarantines check violators with named reasons") {
    val fact = freshDir("check_enf")
    TableConstraints.declareCheck(fact, "qty_pos", "qty > 0")
    TableConstraints.declareCheck(fact, "mode_known", "mode IN ('AIR','RAIL')")
    val batch = Seq(
      (Some(5L), "AIR"), (Some(0L), "RAIL"), (Option.empty[Long], "AIR"),
      (Some(3L), "XXX"), (Some(-1L), "XXX")).toDF("qty", "mode")
    val (good, bad) = TableConstraints.enforceSplit(spark, batch, fact)
    assert(good.collect().map(_.getLong(0)).toSeq == Seq(5L))
    val reasons = bad.select("qty", "reason").collect()
      .map(r => (if (r.isNullAt(0)) -99L else r.getLong(0), r.getString(1)))
      .toSet
    assert(reasons == Set(
      (0L, "check(qty_pos)"),
      (-99L, "check(qty_pos)"), // NULL qty fails strictly
      (3L, "check(mode_known)"),
      (-1L, "check(qty_pos),check(mode_known)")))
  }
}
