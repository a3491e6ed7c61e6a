package graft.sources

import java.io.File

import graft.SparkSpec
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._

/** Incremental min-max stats under the txn log: O(Δ) refresh, pruning
  * correctness, the never-skip-blind freshness rule, and stale-stats
  * inertness across overwrites.
  */
class TxnStatsSpec extends SparkSpec {

  import spark.implicits._

  private def fresh(name: String): String = {
    val p = s"/root/repo/target/tmp/spec_stats_$name"
    FileUtils.deleteQuietly(new File(p))
    p
  }

  private def commitRange(t: String, lo: Long, hi: Long): Unit =
    TxnTable.commit(spark,
      spark.range(lo, hi).select(col("id"), (col("id") % 7).as("payload"))
        .coalesce(1),
      t, overwrite = false)

  test("stats prune range scans exactly; refresh is O(new files); stale rows inert") {
    val t = fresh("basic")
    Seq((0L, 100L), (100L, 200L), (200L, 300L), (300L, 400L))
      .foreach { case (lo, hi) => commitRange(t, lo, hi) }
    assert(TxnStats.refresh(spark, t, "id") == 4)
    assert(TxnStats.indexedVersion(t, "id") == 4)
    assert(TxnStats.refresh(spark, t, "id") == 0, "fresh refresh is a no-op")

    val (toRead, nLive) = TxnStats.pruneFiles(spark, t, "id", 150L, 160L)
    assert(nLive == 4 && toRead.size == 1, s"want 1 of 4 files, got $toRead")
    def ids(lo: Long, hi: Long) =
      TxnStats.prunedRead(spark, t, "id", lo, hi)
        .select("id").as[Long].collect().sorted.toSeq
    assert(ids(150, 160) == (150L to 160L))
    assert(ids(95, 105) == (95L to 105L), "range spanning two files")
    assert(ids(900, 950).isEmpty, "out-of-range reads nothing")

    // a commit the stats have not seen is READ, never skipped
    commitRange(t, 400L, 500L)
    assert(ids(450, 455) == (450L to 455L),
      "unindexed live file must not be skipped")
    assert(TxnStats.refresh(spark, t, "id") == 1, "only the new file indexed")
    val (afterRefresh, _) = TxnStats.pruneFiles(spark, t, "id", 450L, 455L)
    assert(afterRefresh.size == 1)

    // overwrite: stale stats rows for dead files are inert
    TxnTable.commit(spark,
      spark.range(1000L, 1100L).select(col("id"), (col("id") % 7).as("payload")),
      t, overwrite = true)
    assert(ids(150, 160).isEmpty, "overwritten rows must not resurface")
    assert(TxnStats.pruneFiles(spark, t, "id", 0L, 5000L)._2 ==
      TxnTable.liveFiles(t).size)
    TxnStats.refresh(spark, t, "id")
    assert(ids(1000, 1004) == (1000L to 1004L))
  }

  test("a non-BIGINT stats column is refused") {
    val t = fresh("type")
    TxnTable.commit(spark,
      spark.range(0, 10).select(col("id").cast("int").as("id")),
      t, overwrite = false)
    intercept[IllegalArgumentException] {
      TxnStats.refresh(spark, t, "id")
    }
  }
}
