package graft.operators

import java.io.File

import graft.SparkSpec
import graft.sources.TxnTable
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._

/** MERGE (upsert) behavior: content semantics, file-level rewrite
  * pruning (unmatched files survive byte-identical), append fast path,
  * ambiguity rejection, and time travel across a merge.
  */
class MergeSpec extends SparkSpec {

  import spark.implicits._

  private def fresh(name: String): String = {
    val p = s"/root/repo/target/tmp/spec_merge_$name"
    FileUtils.deleteQuietly(new File(p))
    p
  }

  private def content(t: String, asOf: Option[Int] = None): Set[(Long, Long)] =
    TxnTable.read(spark, t, asOf).select("k", "v").as[(Long, Long)]
      .collect().toSet

  test("upsert updates matched keys, inserts the rest, rewrites only affected files") {
    val t = fresh("basic")
    // 8 files, keys hash-scattered → most files contain NO matched key
    val base = spark.range(0, 800).select(col("id").as("k"), col("id").as("v"))
      .repartition(8, col("k"))
    TxnTable.commit(spark, base, t, overwrite = false)
    val filesBefore = TxnTable.liveFiles(t).toSet
    assert(filesBefore.size == 8)

    val source = Seq((5L, 5000L), (77L, 7700L), (900L, 9000L)) // 2 updates, 1 insert
      .toDF("k", "v")
    val r = Merge.upsert(spark, t, source, Seq("k"))
    assert(r.version == 2)
    // only the files holding k=5 and k=77 were rewritten (≤ 2 of 8)
    assert(r.filesRewritten <= 2 && r.filesRewritten >= 1)
    val survivors = filesBefore.intersect(TxnTable.liveFiles(t).toSet)
    assert(survivors.size == 8 - r.filesRewritten,
      "unmatched files must survive the merge untouched")

    val expected = (0L until 800L).map(k => k ->
      (if (k == 5) 5000L else if (k == 77) 7700L else k)).toSet + (900L -> 9000L)
    assert(content(t) == expected)
    // time travel: the pre-merge snapshot is intact
    assert(content(t, Some(1)) == (0L until 800L).map(k => k -> k).toSet)
  }

  test("a merge with no matches is a pure append — zero files rewritten") {
    val t = fresh("append")
    TxnTable.commit(spark,
      spark.range(0, 100).select(col("id").as("k"), col("id").as("v")),
      t, overwrite = false)
    val before = TxnTable.liveFiles(t).toSet
    val r = Merge.upsert(spark, t,
      Seq((1000L, 1L), (1001L, 2L)).toDF("k", "v"), Seq("k"))
    assert(r.filesRewritten == 0)
    assert(before.subsetOf(TxnTable.liveFiles(t).toSet))
    assert(content(t).size == 102)
  }

  test("evolveSchema merge: new source columns null-extend survivors and history") {
    val t = fresh("evolve")
    TxnTable.commit(spark,
      spark.range(0, 20).select(col("id").as("k"), col("id").as("v")).coalesce(1),
      t, overwrite = false)
    val src = Seq((5L, 500L, 55L), (100L, 100L, 11L)).toDF("k", "v", "score")
    // before any evolution, the same source is rejected without the flag
    intercept[IllegalArgumentException] {
      Merge.upsert(spark, t, src, Seq("k"))
    }
    val r = Merge.upsert(spark, t, src, Seq("k"), evolveSchema = true)
    assert(r.version == 2)
    val full = TxnTable.read(spark, t, mergeSchema = true)
      .select("k", "v", "score").collect()
      .map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toSet
    assert(full.contains((5L, 500L, 55L)), "updated row carries the new column")
    assert(full.contains((100L, 100L, 11L)), "insert carries the new column")
    assert(full.contains((0L, 0L, -1L)), "survivor null-extends")
    assert(full.size == 21)
  }

  test("ambiguous source (duplicate keys) and schema drift are rejected") {
    val t = fresh("reject")
    TxnTable.commit(spark, Seq((1L, 1L)).toDF("k", "v"), t, overwrite = false)
    intercept[IllegalArgumentException] {
      Merge.upsert(spark, t, Seq((1L, 2L), (1L, 3L)).toDF("k", "v"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Merge.upsert(spark, t, Seq((1L, 2L, 9L)).toDF("k", "v", "extra"), Seq("k"))
    }
    assert(content(t) == Set(1L -> 1L), "failed merges must not commit")
  }
}
