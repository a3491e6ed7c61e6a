package graft.operators

import java.io.File

import graft.SparkSpec
import graft.sources.TxnTable
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._

/** Behavior specs for the keyed snapshot diff family: the narrow hash
  * form's classification and null traps, per-column attribution on the
  * detailed form, the summary rollup, version diff over the txn log,
  * and the O(Δ) feed-driven form's equality with the snapshot join. */
class TableDiffSpec extends SparkSpec {

  import spark.implicits._

  test("added / removed / changed / unchanged classify correctly") {
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v")
    val after = Seq((2L, "b", 20.0), (3L, "c", 99.0), (4L, "d", 40.0))
      .toDF("id", "name", "v")
    val got = TableDiff.diff(before, after, Seq("id"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "removed"), (3L, "changed"), (4L, "added")))
  }

  test("null payloads diff by position, not by hash pass-through") {
    val before = Seq((1L, Option.empty[String], Option("x"))).toDF("id", "a", "b")
    val after = Seq((1L, Option("x"), Option.empty[String])).toDF("id", "a", "b")
    // (null, x) -> (x, null): xxhash64 skips nulls, so without the
    // sentinel these would hash equal and the change would vanish
    val got = TableDiff.diff(before, after, Seq("id"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "changed")))
  }

  test("no data value collides with the null encoding — not even NUL") {
    // a literal NUL-byte string vs NULL: an in-band sentinel would hash
    // them identical and the change would vanish
    val before = Seq((1L, Option("\u0000")), (2L, Option("")))
      .toDF("id", "a")
    val after = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "a")
    val got = TableDiff.diff(before, after, Seq("id"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "changed"), (2L, "changed")))
  }

  test("composite keys and identical snapshots") {
    val snap = Seq((1L, 1L, "x"), (1L, 2L, "y")).toDF("k1", "k2", "v")
    assert(TableDiff.diff(snap, snap, Seq("k1", "k2")).isEmpty)
    val moved = Seq((1L, 1L, "x"), (2L, 2L, "y")).toDF("k1", "k2", "v")
    val got = TableDiff.diff(snap, moved, Seq("k1", "k2"))
      .select("k1", "k2", "change").as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 2L, "removed"), (2L, 2L, "added")))
  }

  test("column order never matters; schema mismatch fails loudly") {
    val before = Seq((1L, "a", 2L)).toDF("id", "s", "n")
    val after = Seq((1L, 2L, "a")).toDF("id", "n", "s") // same data, reordered
    assert(TableDiff.diff(before, after, Seq("id")).isEmpty)
    val other = Seq((1L, "a")).toDF("id", "s")
    intercept[IllegalArgumentException] {
      TableDiff.diff(before, other, Seq("id"))
    }
  }

  private def detRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  test("detailed form attributes the moved columns, NULL-safely") {
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
      (6L, Some("g"), Some(60L))).toDF("k", "s", "v") // changed: s AND v
    val d = TableDiff.diffDetailed(l, r, Seq("k"))
    assert(detRows(d) == Set(
      (1L, "removed", ""),
      (2L, "changed", "v"),
      (4L, "added", ""),
      (6L, "changed", "s,v")))
    val full = TableDiff.diffDetailed(l, r, Seq("k"), includeUnchanged = true)
    assert(full.count() == 6)
    assert(full.filter(col("change") === "unchanged").count() == 2)
    // the detailed form never disagrees with the narrow form on classes
    assert(TableDiff.diff(l, r, Seq("k")).as[(Long, String)].collect().toSet ==
      d.select("k", "change").as[(Long, String)].collect().toSet)
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
    val expected = Set((3L, "removed", ""), (7L, "changed", "v"),
      (11L, "added", ""))
    val d = TableDiff.diffVersions(spark, t, 1, TxnTable.currentVersion(t),
      Seq("k"))
    assert(detRows(d) == expected)
    // the O(Δ) feed-driven form gives the identical answer — including
    // across the overwrite commit (payload-hash survivor suppression)
    val incr = TableDiff.diffVersionsIncremental(spark, t, 1,
      TxnTable.currentVersion(t), Seq("k"))
    assert(detRows(incr) == expected)
  }

  test("partitioned diff prunes identical partitions, equals the plain diff") {
    val l = (1L to 40L).map(i => (s"p${i % 4}", i, i * 10L)).toDF("p", "k", "v")
    // touch ONLY p1 (value change) and p3 (remove 3, add 43): p0/p2 must
    // never reach the row level
    val r = l.filter(!(col("k") === 3L))
      .withColumn("v", when(col("k") === 5L, lit(999L)).otherwise(col("v")))
      .unionByName(Seq(("p3", 43L, 430L)).toDF("p", "k", "v"))
    val suspects = TableDiff.suspectPartitions(l, r, "p")
      .collect().map(_.getString(0)).toSet
    assert(suspects == Set("p1", "p3")) // 3 % 4 = 3, 5 % 4 = 1
    val part = TableDiff.diffPartitioned(l, r, Seq("k"), "p")
      .select("k", "change", "changed_cols")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2))).toSet
    val plain = TableDiff.diffDetailed(l, r, Seq("k"))
      .select("k", "change", "changed_cols")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2))).toSet
    assert(part == plain)
    assert(part == Set((3L, "removed", ""), (5L, "changed", "v"),
      (43L, "added", "")))
    // a row MOVING between partitions flags both and classifies changed
    val moved = l.withColumn("p",
      when(col("k") === 8L, lit("p2")).otherwise(col("p"))) // was p0
    assert(TableDiff.suspectPartitions(l, moved, "p")
      .collect().map(_.getString(0)).toSet == Set("p0", "p2"))
    assert(TableDiff.diffPartitioned(l, moved, Seq("k"), "p")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2)))
      .toSet == Set((8L, "changed", "p")))
    // the NULL partition is a legal partition: a change inside it must
    // survive the prune (the semi join is null-safe)
    val ln = l.withColumn("p",
      when(col("k") === 2L, lit(null).cast("string")).otherwise(col("p")))
    val rn = ln.withColumn("v",
      when(col("k") === 2L, lit(888L)).otherwise(col("v")))
    assert(TableDiff.diffPartitioned(ln, rn, Seq("k"), "p")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2)))
      .toSet == Set((2L, "changed", "v")))
  }

  test("schema diff flags presence and type moves, never nullability") {
    val before = Seq((1L, "a", 2.0)).toDF("id", "s", "v")
    val after = before.select(col("id").cast("int").as("id"), col("s"),
      lit(true).as("flag"))
    val got = TableDiff.schemaDiff(spark, before, after).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(got == Set(
      ("flag", "added", "", "BOOLEAN"),
      ("id", "type_changed", "BIGINT", "INT"),
      ("v", "removed", "DOUBLE", "")))
    assert(TableDiff.schemaDiff(spark, before, before).isEmpty)
    // nullability shifts alone (outer-join shapes) flag nothing
    val nullable = before.select(when(col("id") > 0, col("s")).as("s"),
      col("id"), col("v"))
    assert(TableDiff.schemaDiff(spark, before, nullable).isEmpty)
  }

  test("incremental diff folds churn: restored keys and transients vanish") {
    val t = "/root/repo/target/tmp/spec_tdiff_incr"
    FileUtils.deleteQuietly(new File(t))
    TxnTable.commit(spark,
      (1L to 6L).map(i => (i, i * 10L)).toDF("k", "v"), t, overwrite = false)
    // v2: key 2 updated away; key 9 appears (transient)
    TxnTable.commit(spark, TxnTable.read(spark, t).withColumn("v",
        when(col("k") === 2L, lit(999L)).otherwise(col("v")))
      .unionByName(Seq((9L, 90L)).toDF("k", "v")), t, overwrite = true)
    // v3: key 2 restored to its v1 value; key 9 deleted; key 5 MOR-deleted
    TxnTable.commit(spark, TxnTable.read(spark, t)
      .filter(col("k") =!= 9L)
      .withColumn("v", when(col("k") === 2L, lit(20L)).otherwise(col("v"))),
      t, overwrite = true)
    TxnTable.deleteWhereMor(spark, t, col("k") === 5L)
    val expected = Set((5L, "removed", ""))
    val incr = TableDiff.diffVersionsIncremental(spark, t, 1,
      TxnTable.currentVersion(t), Seq("k"))
    assert(detRows(incr) == expected)
    assert(detRows(TableDiff.diffVersions(spark, t, 1,
      TxnTable.currentVersion(t), Seq("k"))) == expected)
    // a narrower window sees the intermediate churn as real change
    val mid = TableDiff.diffVersionsIncremental(spark, t, 1, 2, Seq("k"))
    assert(detRows(mid) == Set((2L, "changed", "v"), (9L, "added", "")))
  }
}
