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

  test("applyCdc maintains an aggregate view through updates, deletes, and group death") {
    import graft.operators.{Incremental, Merge}
    val t = fresh("cdcview")
    def rows(ks: Seq[Long], x: Long => Long) =
      ks.map(k => (k, k % 3, x(k))).toDF("k", "g", "x")
    TxnTable.commit(spark, rows(0L until 10L, identity).coalesce(1),
      t, overwrite = false)
    def viewOf(asOf: Int) = TxnTable.read(spark, t, Some(asOf))
      .groupBy("g").agg(count(lit(1)).as("cnt"), sum("x").as("sum_x"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("g", "cnt", "sum_x").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val view1 = viewOf(1)
    // v2: update k=5 (x 5→500), insert k=20 (g=2)
    Merge.upsert(spark, t, Seq((5L, 2L, 500L), (20L, 2L, 20L)).toDF("k", "g", "x"),
      Seq("k"))
    val view2 = Incremental.applyCdc(view1,
      TxnTable.changeFeed(spark, t, 1, 2, Seq("k"), updateImages = true),
      Seq("g"), "cnt", Map("sum_x" -> "x"))
    assert(canon(view2) == canon(viewOf(2)),
      "CDC-refreshed view must equal the recompute")
    // v3: overwrite keeps only k∈{0,1} → group g=2 dies entirely
    TxnTable.commit(spark, rows(Seq(0L, 1L), identity), t, overwrite = true)
    val view3 = Incremental.applyCdc(view2,
      TxnTable.changeFeed(spark, t, 2, 3, Seq("k"), updateImages = true),
      Seq("g"), "cnt", Map("sum_x" -> "x"))
    assert(canon(view3) == canon(viewOf(3)))
    assert(!canon(view3).exists(_._1 == 2L), "zero-count group must leave the view")
    // the STREAMING form: a file stream on the table's own log folds the
    // same history into a live view TxnTable — fresh run covers v1..v3 in
    // one batch (one aggregate for N commits), resume folds only what's new
    val viewT = fresh("cdcview_stream")
    val streamed = graft.streaming.EventsStreaming.cdcViewMaintenance(
      spark, t, viewT, keys = Seq("k"), groupKeys = Seq("g"),
      countCol = "cnt", sums = Map("sum_x" -> "x"))
    assert(canon(streamed) == canon(viewOf(3)),
      "stream-maintained view must equal the recompute")
    // v4 arrives AFTER the stream ran; the resumed run folds only v4
    graft.operators.Merge.upsert(spark, t,
      Seq((0L, 0L, 7000L)).toDF("k", "g", "x"), Seq("k"))
    val resumed = graft.streaming.EventsStreaming.cdcViewMaintenance(
      spark, t, viewT, keys = Seq("k"), groupKeys = Seq("g"),
      countCol = "cnt", sums = Map("sum_x" -> "x"), resume = true)
    assert(canon(resumed) == canon(viewOf(4)))

    // a single-image feed cannot retract old contributions — fails loudly
    // (feed (1,2] carries the k=5 'update' row; (2,3] is deletes only)
    val ex = intercept[Exception] {
      Incremental.applyCdc(view1,
        TxnTable.changeFeed(spark, t, 1, 2, Seq("k")),
        Seq("g"), "cnt", Map("sum_x" -> "x")).collect()
    }
    assert(ex.getMessage.contains("update images") ||
      Option(ex.getCause).exists(_.getMessage.contains("update images")))
  }

  test("CDC view maintenance composes with merge-on-read deletes") {
    import graft.operators.Incremental
    val t = fresh("cdc_mor_src")
    def rows(ks: Seq[Long]) = ks.map(k => (k, k % 3, k)).toDF("k", "g", "x")
    TxnTable.commit(spark, rows(0L until 30L).coalesce(1), t,
      overwrite = false)
    def viewOf(asOf: Int) = TxnTable.read(spark, t, Some(asOf))
      .groupBy("g").agg(count(lit(1)).as("cnt"), sum("x").as("sum_x"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("g", "cnt", "sum_x").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val view1 = viewOf(1)
    // v2: deletion-vector delete — the feed must carry DELETE pre-images
    TxnTable.deleteWhereMor(spark, t, $"k" % 4 === 0L)
    val view2 = Incremental.applyCdc(view1,
      TxnTable.changeFeed(spark, t, 1, 2, Seq("k"), updateImages = true),
      Seq("g"), "cnt", Map("sum_x" -> "x"))
    assert(canon(view2) == canon(viewOf(2)),
      "a MOR delete's feed must retract exactly the deleted contributions")
    // the streaming maintainer folds the dv version like any other
    val viewT = fresh("cdc_mor_view")
    val streamed = graft.streaming.EventsStreaming.cdcViewMaintenance(
      spark, t, viewT, keys = Seq("k"), groupKeys = Seq("g"),
      countCol = "cnt", sums = Map("sum_x" -> "x"))
    assert(canon(streamed) == canon(viewOf(2)))
  }

  test("change feed skips metadata-only re-list versions (lineage squash)") {
    val t = fresh("relist")
    def rows(ks: Seq[Long]) = ks.map(k => (k, k * 10)).toDF("k", "v")
    TxnTable.commit(spark, rows(0L until 5L), t, overwrite = false)   // v1
    TxnTable.commit(spark, rows(5L until 8L), t, overwrite = false)   // v2
    // v3: checkpoint-style squash — re-lists v2's live set, zero row changes
    TxnTable.publishFileList(t, TxnTable.liveFiles(t, Some(2)),
      tag = Some("squash"))
    TxnTable.commit(spark, rows(8L until 10L), t, overwrite = false)  // v4

    def feed(from: Int, to: Int) =
      TxnTable.changeFeed(spark, t, from, to, Seq("k"))
        .select("version", "change", "k", "v").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet

    // squash-only range: zero changes, correct schema, no exception
    val squashOnly = TxnTable.changeFeed(spark, t, 2, 3, Seq("k"))
    assert(squashOnly.columns.toSeq == Seq("version", "change", "k", "v"))
    assert(squashOnly.count() == 0L,
      "a re-list version has zero row-level changes")
    // a range spanning the squash carries ONLY the real appends — before
    // the guard, v3 fed every pre-existing row as a phantom insert and an
    // applyCdc-maintained view double-counted
    assert(feed(2, 4) == (8L until 10L).map(k => (4, "insert", k, k * 10)).toSet)
    assert(feed(0, 4).size == 10, "exactly one insert per real row")

    // a MIXED version (re-listed live files + genuinely new files) is
    // row-level ambiguous — changeFeed must refuse, not guess
    val extraDir = new File(t, "extra")
    rows(Seq(99L)).coalesce(1).write.parquet(extraDir.getPath)
    val extraRel = extraDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => s"extra/${f.getName}").toSeq
    TxnTable.publishFileList(t,
      TxnTable.liveFiles(t, Some(4)).take(1) ++ extraRel)              // v5
    val ex = intercept[IllegalArgumentException] {
      TxnTable.changeFeed(spark, t, 4, 5, Seq("k")).collect()
    }
    assert(ex.getMessage.contains("re-listed"))
  }
}
