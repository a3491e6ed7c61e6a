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
}
