package graft.sources

import java.io.File

import graft.SparkSpec
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._

/** Row-level change-feed behavior: per-version keyed diffs, survivor
  * suppression across file rewrites (the MERGE interplay), overwrite
  * deletes with pre-images, and version-range scoping.
  */
class ChangeFeedSpec extends SparkSpec {

  import spark.implicits._

  private def fresh(name: String): String = {
    val p = s"/root/repo/target/tmp/spec_cdf_$name"
    FileUtils.deleteQuietly(new File(p))
    p
  }

  test("change feed: merge survivors suppressed, overwrite emits pre-image deletes") {
    val t = fresh("basic")
    // v1 — ten rows in ONE file so the merge rewrite drags survivors along
    TxnTable.commit(spark,
      spark.range(0, 10).select(col("id").as("k"), col("id").as("v")).coalesce(1),
      t, overwrite = false)
    // v2 — update k=5, insert k=20: the rewritten file carries 0..9, but
    // only (5) actually changed; 0..4,6..9 must cancel by payload hash
    graft.operators.Merge.upsert(spark, t,
      Seq((5L, 50L), (20L, 20L)).toDF("k", "v"), Seq("k"))
    // v3 — overwrite keeps k<5 unchanged: deletes carry the PRE payload
    TxnTable.commit(spark,
      spark.range(0, 5).select(col("id").as("k"), col("id").as("v")),
      t, overwrite = true)

    def feed(from: Int, to: Int): Set[(Int, String, Long, Long)] =
      TxnTable.changeFeed(spark, t, from, to, Seq("k"))
        .select(col("version"), col("change"), col("k"), col("v"))
        .collect().map(r => (r.getInt(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSet

    assert(feed(1, 2) == Set(
      (2, "update", 5L, 50L), (2, "insert", 20L, 20L)))
    assert(feed(2, 3) == Set(
      (3, "delete", 5L, 50L), (3, "delete", 6L, 6L), (3, "delete", 7L, 7L),
      (3, "delete", 8L, 8L), (3, "delete", 9L, 9L), (3, "delete", 20L, 20L)))
    assert(feed(0, 3) == feed(0, 1) ++ feed(1, 2) ++ feed(2, 3))
    assert(feed(0, 1) ==
      (0L until 10L).map(k => (1, "insert", k, k)).toSet)
    intercept[IllegalArgumentException] {
      TxnTable.changeFeed(spark, t, 2, 99, Seq("k"))
    }
  }
}
