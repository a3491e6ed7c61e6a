package graft.operators

import java.io.File

import graft.SparkSpec
import graft.sources.TxnTable
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._

/** Keyed diff semantics: the four change classes, NULL-safe column
  * attribution, multi-key identity, the summary rollup, and version
  * diff over the txn log. */
class TableDiffSpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  test("added/removed/changed/unchanged with NULL-safe column attribution") {
    val l = Seq(
      (1L, Some("a"), Some(10L)),
      (2L, Some("b"), Some(20L)),
      (3L, Some("c"), Some(30L)),
      (5L, None, Some(50L)),
      (6L, Some("f"), None)).toDF("k", "s", "v")
    val r = Seq(
      (2L, Some("b"), Some(21L)),   // changed: v
      (3L, Some("c"), Some(30L)),   // unchanged
      (4L, Some("d"), Some(40L)),   // added
      (5L, None, Some(50L)),        // unchanged (NULL <=> NULL)
      (6L, Some("g"), Some(60L))).toDF("k", "s", "v") // changed: s AND v (NULL→60)
    val d = TableDiff.diff(l, r, Seq("k"))
    assert(rowsOf(d) == Set(
      (1L, "removed", ""),
      (2L, "changed", "v"),
      (4L, "added", ""),
      (6L, "changed", "s,v")))
    val full = TableDiff.diff(l, r, Seq("k"), includeUnchanged = true)
    assert(full.count() == 6)
    assert(full.filter(col("change") === "unchanged").count() == 2)
  }

  test("multi-column keys identify rows jointly") {
    val l = Seq(("x", 1L, 10L), ("x", 2L, 20L)).toDF("a", "b", "v")
    val r = Seq(("x", 1L, 11L), ("y", 2L, 20L)).toDF("a", "b", "v")
    val d = TableDiff.diff(l, r, Seq("a", "b")).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getString(2))).toSet
    assert(d == Set(("x", 1L, "changed"), ("x", 2L, "removed"),
      ("y", 2L, "added")))
  }

  test("summary counts classes and per-column movement") {
    val l = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "s", "v")
    val r = Seq((1L, "z", 11L), (2L, "b", 20L), (4L, "d", 40L)).toDF("k", "s", "v")
    val m = TableDiff.diffSummary(l, r, Seq("k")).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(m == Map("added" -> 1L, "removed" -> 1L, "changed" -> 1L,
      "unchanged" -> 1L, "col:s" -> 1L, "col:v" -> 1L))
  }

  test("diffVersions reconciles two txn snapshots across many commits") {
    val t = "/root/repo/target/tmp/spec_tdiff_txn"
    FileUtils.deleteQuietly(new File(t))
    TxnTable.commit(spark,
      (1L to 10L).map(i => (i, i * 100L)).toDF("k", "v"), t, overwrite = false)
    // three commits later: delete 3, rewrite 7's value, append 11
    TxnTable.deleteWhere(spark, t, col("k") === 3L)
    TxnTable.commit(spark,
      TxnTable.read(spark, t).withColumn("v",
        when(col("k") === 7L, lit(777L)).otherwise(col("v"))), t,
      overwrite = true)
    TxnTable.commit(spark, Seq((11L, 1100L)).toDF("k", "v"), t,
      overwrite = false)
    val d = TableDiff.diffVersions(spark, t, 1, TxnTable.currentVersion(t),
      Seq("k"))
    assert(rowsOf(d.select(col("k"), col("change"), col("changed_cols"))) ==
      Set((3L, "removed", ""), (7L, "changed", "v"), (11L, "added", "")))
  }

  test("shape misuse refuses loudly") {
    val l = Seq((1L, "a")).toDF("k", "s")
    intercept[IllegalArgumentException] {
      TableDiff.diff(l, Seq((1L, 2L)).toDF("k", "v"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      TableDiff.diff(l, l, Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      TableDiff.diff(l, l, Nil)
    }
  }
}
