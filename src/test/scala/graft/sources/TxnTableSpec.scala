package graft.sources

import java.io.File

import graft.SparkSpec
import org.apache.commons.io.FileUtils

/** Behavior specs for the transaction-log table: snapshot isolation across
  * overwrites, time travel, vacuum's retention trade, and the commit
  * point's crash shape (torn tmp entry is invisible).
  */
class TxnTableSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(name: String): String = {
    val p = s"/root/repo/target/tmp/spec_$name"
    FileUtils.deleteQuietly(new File(p))
    p
  }

  private def rows(table: String, asOf: Option[Int] = None): Set[Long] =
    TxnTable.read(spark, table, asOf).select("id").as[Long].collect().toSet

  test("append, overwrite, time travel") {
    val t = freshTable("tt_basic")
    assert(TxnTable.commit(spark, Seq(1L, 2L).toDF("id"), t, overwrite = false) == 1)
    assert(TxnTable.commit(spark, Seq(3L).toDF("id"), t, overwrite = false) == 2)
    assert(TxnTable.commit(spark, Seq(9L).toDF("id"), t, overwrite = true) == 3)
    assert(TxnTable.commit(spark, Seq(10L).toDF("id"), t, overwrite = false) == 4)

    assert(rows(t) == Set(9L, 10L))              // latest
    assert(rows(t, Some(1)) == Set(1L, 2L))      // first commit
    assert(rows(t, Some(2)) == Set(1L, 2L, 3L))  // pre-overwrite
    assert(rows(t, Some(3)) == Set(9L))
    assert(TxnTable.currentVersion(t) == 4)
  }

  test("snapshotRowCount: footer metadata equals a full count, DVs subtract") {
    val t = freshTable("tt_rowcount")
    TxnTable.commit(spark, (1L to 40L).toDF("id"), t, overwrite = false)
    TxnTable.commit(spark, (41L to 60L).toDF("id"), t, overwrite = false)
    assert(TxnTable.snapshotRowCount(t) == 60L)
    assert(TxnTable.snapshotRowCount(t, asOf = Some(1)) == 40L)
    // a MOR delete adds a vector, rewrites nothing — the footer-side
    // count must agree with what a reader actually sees
    import org.apache.spark.sql.functions.col
    TxnTable.deleteWhereMor(spark, t, col("id") % 4 === 0L)
    assert(TxnTable.snapshotRowCount(t) == TxnTable.read(spark, t).count())
    assert(TxnTable.snapshotRowCount(t) == 45L)
    // time travel still prices the pre-delete snapshot
    assert(TxnTable.snapshotRowCount(t, asOf = Some(2)) == 60L)
    // every commit (incl. the DV commit) recorded a stats sidecar, so
    // the counts above were log reads; dropping the sidecars must not
    // change a single answer (footer fallback)
    val log = new File(t, "_graft_log")
    val sidecars = log.listFiles().filter(_.getName.startsWith("stats_v"))
    assert(sidecars.length == 3)
    sidecars.foreach(_.delete())
    assert(TxnTable.snapshotRowCount(t) == 45L)
    assert(TxnTable.snapshotRowCount(t, asOf = Some(1)) == 40L)
  }

  test("metadata-only re-lists record no stats; vacuum sweeps stats debris") {
    val t = freshTable("tt_stats_relist")
    TxnTable.commit(spark, (1L to 20L).toDF("id"), t, overwrite = false)
    TxnTable.commit(spark, (21L to 30L).toDF("id"), t, overwrite = false)
    val log = new File(t, "_graft_log")
    def sidecars() = log.listFiles().filter(_.getName.startsWith("stats_v"))
    assert(sidecars().length == 2)
    // RESTORE re-lists v1's already-measured files: a zero-copy commit
    // must not pay (or record) a footer sweep of the live set
    TxnTable.restore(spark, t, toVersion = 1)
    assert(TxnTable.currentVersion(t) == 3)
    assert(sidecars().length == 2, "re-list must not add a sidecar")
    assert(TxnTable.snapshotRowCount(t) == 20L) // v3 == v1's content
    // crash debris from a dying stats writer is swept with the orphans
    val debris = new File(log, ".v00009-deadbeef.stats.tmp")
    java.nio.file.Files.write(debris.toPath, "junk".getBytes("UTF-8"))
    TxnTable.vacuum(t, retainFrom = 1)
    assert(!debris.exists())
  }

  test("vacuum deletes only what no retained snapshot references") {
    val t = freshTable("tt_vacuum")
    TxnTable.commit(spark, Seq(1L).toDF("id"), t, overwrite = false)
    TxnTable.commit(spark, Seq(2L).toDF("id"), t, overwrite = true)
    TxnTable.commit(spark, Seq(3L).toDF("id"), t, overwrite = false)

    // retaining from v2 keeps everything v2+ needs; v1's overwritten file dies
    val deleted = TxnTable.vacuum(t, retainFrom = 2)
    assert(deleted >= 1)
    assert(rows(t) == Set(2L, 3L))
    assert(rows(t, Some(2)) == Set(2L))
    // v1 is gone physically: the snapshot read must fail loudly
    intercept[Exception] { rows(t, Some(1)) }
  }

  test("a torn (pre-rename) log entry is invisible to readers") {
    val t = freshTable("tt_torn")
    TxnTable.commit(spark, Seq(1L).toDF("id"), t, overwrite = false)
    // simulate a crash between data write and log publish
    val torn = new File(t, "_graft_log/.v00002.json.tmp")
    FileUtils.writeStringToFile(torn,
      """{"version":2,"added":["data/v00002/part-junk.parquet"],"removed":[]}""",
      java.nio.charset.StandardCharsets.UTF_8)
    assert(TxnTable.currentVersion(t) == 1)
    assert(rows(t) == Set(1L))
    // and the next real commit takes version 2 cleanly
    assert(TxnTable.commit(spark, Seq(2L).toDF("id"), t, overwrite = false) == 2)
    assert(rows(t) == Set(1L, 2L))
  }

  test("a racing writer cannot clobber a published version") {
    val t = freshTable("tt_race")
    TxnTable.commit(spark, Seq(1L).toDF("id"), t, overwrite = false)
    // both writers read v1 and pin expectedVersion = 2; writer A lands
    val a = TxnTable.commit(spark, Seq(2L).toDF("id"), t,
      overwrite = false, expectedVersion = Some(2))
    assert(a == 2)
    // writer B's publish must refuse the existing target, not replace it
    intercept[java.util.ConcurrentModificationException] {
      TxnTable.commit(spark, Seq(99L).toDF("id"), t,
        overwrite = false, expectedVersion = Some(2))
    }
    // A's commit is intact; B's rows never became visible
    assert(rows(t) == Set(1L, 2L))
    // B's orphaned data dir is exactly what vacuum sweeps
    assert(TxnTable.vacuum(t, retainFrom = 1) >= 1)
    assert(rows(t) == Set(1L, 2L))
  }

  test("truly concurrent racers to one version: exactly one publish wins") {
    val t = freshTable("tt_race_parallel")
    TxnTable.commit(spark, Seq(1L).toDF("id"), t, overwrite = false)
    // 8 threads all pin expectedVersion = 2 and publish simultaneously —
    // the commit point must be atomic put-if-absent (link(2)), not an
    // exists-check + rename that two racers can both pass
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val results = Await.result(Future.sequence((0 until 8).map { i =>
      Future {
        barrier.await()
        try Right(TxnTable.commit(spark, Seq(100L + i).toDF("id"), t,
          overwrite = false, expectedVersion = Some(2)))
        catch { case e: java.util.ConcurrentModificationException => Left(e) }
      }
    }), 120.seconds)
    assert(results.count(_.isRight) == 1, s"want exactly 1 winner, got $results")
    // the published v2 is intact and contains exactly the winner's row
    val v2 = rows(t, Some(2))
    assert(v2.size == 2 && v2.contains(1L), v2)
  }

  test("commit tag round-trips; untagged commits read back as None") {
    val t = freshTable("tt_tag")
    TxnTable.commit(spark, Seq(1L).toDF("id"), t, overwrite = false,
      tag = Some("stream-batch-0"))
    TxnTable.commit(spark, Seq(2L).toDF("id"), t, overwrite = false)
    assert(TxnTable.commitTag(t, 1).contains("stream-batch-0"))
    assert(TxnTable.commitTag(t, 2).isEmpty)
    assert(TxnTable.commitTag(t, 99).isEmpty) // nonexistent version
    // tags ride along without disturbing snapshot replay
    assert(rows(t) == Set(1L, 2L))
    // the quote-scan log parser is the contract: reject tags it can't carry
    intercept[IllegalArgumentException] {
      TxnTable.commit(spark, Seq(3L).toDF("id"), t, overwrite = false,
        tag = Some("""bad"tag"""))
    }
  }

  test("a stale rewrite referencing files a concurrent commit removed is refused") {
    val t = freshTable("tt_stale_rewrite")
    TxnTable.commit(spark, Seq(1L, 2L).toDF("id").coalesce(1), t, overwrite = false)
    TxnTable.commit(spark, Seq(3L).toDF("id").coalesce(1), t, overwrite = false)
    // writer A plans a rewrite against this snapshot's files…
    val staleFiles = TxnTable.liveFiles(t)
    // …but a concurrent OPTIMIZE lands first and removes them all
    TxnTable.optimize(spark, t, numFiles = 1)
    // A's rewrite must be refused — publishing it would resurrect rows
    // the optimize's replacement files already carry (double counting)
    intercept[IllegalArgumentException] {
      TxnTable.commitRewrite(spark, Seq(9L).toDF("id"), t, staleFiles)
    }
    assert(rows(t) == Set(1L, 2L, 3L), "the optimize's snapshot is intact")
  }

  test("compactSmall merges only small files; healthy files stay untouched") {
    val t = freshTable("tt_compact_small")
    TxnTable.commit(spark,
      spark.range(0, 20000).toDF("id").coalesce(1), t, overwrite = false)
    val big = TxnTable.liveFiles(t).head
    val bigSize = new File(t, big).length()
    (1 to 4).foreach(i =>
      TxnTable.commit(spark, Seq(100000L + i).toDF("id").coalesce(1),
        t, overwrite = false))
    assert(TxnTable.liveFiles(t).size == 5)
    val v = TxnTable.compactSmall(spark, t, smallBytes = bigSize)
    assert(v == 6)
    val after = TxnTable.liveFiles(t)
    assert(after.size == 2)
    assert(after.contains(big), "the healthy file must not be rewritten")
    assert(rows(t) == (0L until 20000L).toSet ++ (1 to 4).map(100000L + _))
    // a lone small file left → no-op, no empty commit
    assert(TxnTable.compactSmall(spark, t, smallBytes = bigSize) == 6)
  }

  test("restore rolls back with zero data movement; history stays travelable") {
    val t = freshTable("tt_restore")
    TxnTable.commit(spark, Seq(1L, 2L).toDF("id"), t, overwrite = false) // v1
    TxnTable.commit(spark, Seq(3L).toDF("id"), t, overwrite = false)     // v2
    TxnTable.commit(spark, Seq(9L).toDF("id"), t, overwrite = true)      // v3
    def diskFiles(): Set[String] = {
      val root = new File(t, "data")
      Option(root.listFiles()).getOrElse(Array.empty).filter(_.isDirectory)
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
        .filter(f => f.getName.startsWith("part-")).map(_.getPath).toSet
    }
    val before = diskFiles()
    assert(TxnTable.restore(spark, t, toVersion = 2) == 4)
    assert(diskFiles() == before, "restore must move zero data")
    assert(rows(t) == Set(1L, 2L, 3L))
    assert(rows(t, Some(3)) == Set(9L), "the bad version stays travelable")
    assert(rows(t, Some(4)) == Set(1L, 2L, 3L))
    // the restore version's change feed is the rollback diff
    val feed = TxnTable.changeFeed(spark, t, 3, 4, Seq("id"))
      .select("change", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(feed == Set(("delete", 9L), ("insert", 1L), ("insert", 2L),
      ("insert", 3L)))
    // vacuum keeping the restore kills only v3's now-unreferenced file(s)
    assert(TxnTable.vacuum(t, retainFrom = 4) >= 1)
    assert(rows(t) == Set(1L, 2L, 3L))
    // restoring to a future/current version is refused
    intercept[IllegalArgumentException] {
      TxnTable.restore(spark, t, toVersion = 4)
    }
  }

  test("versionAt resolves timestamp time travel from publish mtimes") {
    val t = freshTable("tt_asof_ts")
    TxnTable.commit(spark, Seq(1L).toDF("id"), t, overwrite = false)
    val between = System.currentTimeMillis()
    Thread.sleep(1100) // fs mtime granularity can be a full second
    TxnTable.commit(spark, Seq(2L).toDF("id"), t, overwrite = false)
    assert(TxnTable.versionAt(t, between).contains(1))
    assert(TxnTable.versionAt(t, System.currentTimeMillis()).contains(2))
    assert(TxnTable.versionAt(t, 1000L).isEmpty, "before the table existed")
    assert(rows(t, TxnTable.versionAt(t, between)) == Set(1L))
  }

  test("optimize compacts files without changing rows; change feed cancels to empty") {
    val t = freshTable("tt_optimize")
    (0 until 4).foreach(i =>
      TxnTable.commit(spark,
        Seq(i * 10L, i * 10L + 1L).toDF("id").coalesce(1), t, overwrite = false))
    assert(TxnTable.liveFiles(t).size == 4)
    val before = rows(t)
    val v = TxnTable.optimize(spark, t, numFiles = 1)
    assert(v == 5)
    assert(TxnTable.liveFiles(t).size == 1)
    assert(rows(t) == before)
    assert(rows(t, Some(4)) == before, "pre-optimize snapshot intact")
    // every rewritten row is a byte-identical survivor → empty feed
    assert(TxnTable.changeFeed(spark, t, 4, 5, Seq("id")).count() == 0L)
    // the 4 small files die at vacuum, not before
    assert(TxnTable.vacuum(t, retainFrom = 5) == 4)
    assert(rows(t) == before)
  }

  test("commitChecked: clean data publishes, a violated contract never does") {
    import graft.operators.Contracts
    val t = freshTable("tt_checked")
    assert(TxnTable.commitChecked(spark, Seq(1L, 2L).toDF("id"), t,
      overwrite = false,
      rules = Seq(Contracts.NotNull("id"), Contracts.InRange("id", 0, 100))) == 1)
    // the violating commit writes its attempt dir but must never publish
    val ex = intercept[IllegalStateException] {
      TxnTable.commitChecked(spark, Seq(5L, 500L).toDF("id"), t,
        overwrite = false, rules = Seq(Contracts.InRange("id", 0, 100)))
    }
    assert(ex.getMessage.contains("in_range(id)=1"))
    assert(TxnTable.currentVersion(t) == 1)
    assert(rows(t) == Set(1L, 2L))
    // the rejected attempt is an ordinary vacuum orphan
    assert(TxnTable.vacuum(t, retainFrom = 1) >= 1)
    assert(rows(t) == Set(1L, 2L))
    // Unique needs a global aggregate — rejected upfront, not silently skipped
    intercept[IllegalArgumentException] {
      TxnTable.commitChecked(spark, Seq(9L).toDF("id"), t,
        overwrite = false, rules = Seq(Contracts.Unique("id")))
    }
  }

  test("readers keep their snapshot across a concurrent overwrite") {
    val t = freshTable("tt_isolation")
    TxnTable.commit(spark, Seq(1L, 2L).toDF("id"), t, overwrite = false)
    val reader = TxnTable.read(spark, t) // plan pinned to v1's files
    TxnTable.commit(spark, Seq(9L).toDF("id"), t, overwrite = true)
    // the old plan still reads v1 bytes — nothing was rewritten in place
    assert(reader.select("id").as[Long].collect().toSet == Set(1L, 2L))
    assert(rows(t) == Set(9L))
  }

  test("checkpoint: replay starts from the snapshot, every read unchanged") {
    val t = freshTable("tt_ckpt")
    TxnTable.commit(spark, Seq(1L, 2L).toDF("id"), t, overwrite = false) // v1
    TxnTable.commit(spark, Seq(3L).toDF("id"), t, overwrite = false)     // v2
    TxnTable.commit(spark, Seq(9L).toDF("id"), t, overwrite = true)      // v3
    // snapshots before the checkpoint, to compare after
    val before = (1 to 3).map(v => v -> rows(t, Some(v))).toMap
    assert(TxnTable.checkpoint(t) == 3)
    // commits continue past the checkpoint
    TxnTable.commit(spark, Seq(10L).toDF("id"), t, overwrite = false)    // v4
    // every snapshot — before, at, and after the checkpoint — unchanged
    assert(rows(t, Some(1)) == before(1))
    assert(rows(t, Some(2)) == before(2))
    assert(rows(t, Some(3)) == before(3))
    assert(rows(t) == Set(9L, 10L))
    // idempotent: re-checkpointing the same version is a no-op
    TxnTable.commit(spark, Seq(11L).toDF("id"), t, overwrite = false)    // v5
    assert(TxnTable.checkpoint(t) == 5)
    assert(TxnTable.checkpoint(t) == 5)
    assert(rows(t) == Set(9L, 10L, 11L))
    assert(rows(t, Some(4)) == Set(9L, 10L))
  }

  test("addedFiles yields exactly the appended range; removal ranges refuse") {
    val t = freshTable("tt_added")
    TxnTable.commit(spark, Seq(1L).toDF("id").coalesce(1), t, overwrite = false) // v1
    TxnTable.commit(spark, Seq(2L).toDF("id").coalesce(1), t, overwrite = false) // v2
    TxnTable.commit(spark, Seq(3L).toDF("id").coalesce(1), t, overwrite = false) // v3
    val inc = TxnTable.addedFiles(t, fromExclusive = 1, toInclusive = 3)
    val read = spark.read.parquet(
        inc.map(f => new File(t, f).getPath): _*)
      .select("id").as[Long].collect().toSet
    assert(read == Set(2L, 3L))
    // an overwrite invalidates processed rows — the range must refuse
    TxnTable.commit(spark, Seq(9L).toDF("id"), t, overwrite = true)              // v4
    intercept[IllegalArgumentException] {
      TxnTable.addedFiles(t, fromExclusive = 3, toInclusive = 4)
    }
  }

  test("mergeSchema read null-extends rows from commits before a column existed") {
    val t = freshTable("tt_evolve")
    TxnTable.commit(spark, Seq((1L, "a")).toDF("id", "x"), t, overwrite = false)
    TxnTable.commit(spark, Seq((2L, "b", 7L)).toDF("id", "x", "y"), t,
      overwrite = false)
    val merged = TxnTable.read(spark, t, mergeSchema = true)
      .select("id", "x", "y")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(merged == Set((1L, "a", None), (2L, "b", Some(7L))))
  }

  test("merge-on-read delete: vector applies, zero rewrites, optimize purges") {
    val t = freshTable("tt_mor")
    TxnTable.commit(spark, (1L to 30L).toDF("id").repartition(3), t,
      overwrite = false)
    def dataFileNames = TxnTable.liveSplit(t, None)._1.toSet

    val before = dataFileNames
    val (v, n) = TxnTable.deleteWhereMor(spark, t, $"id" % 3 === 0)
    assert(v == 2 && n == 10)
    assert(rows(t) == (1L to 30L).filter(_ % 3 != 0).toSet)
    // no data file moved — only a dv/ file appeared
    assert(dataFileNames == before)
    assert(TxnTable.liveSplit(t, None)._2.size == 1)
    // time travel before the delete resurrects the rows
    assert(rows(t, Some(1)) == (1L to 30L).toSet)
    // the predicate sees the DV-APPLIED snapshot: re-deleting the same
    // rows is a no-op commit
    assert(TxnTable.deleteWhereMor(spark, t, $"id" % 3 === 0) == ((2, 0L)))
    // a second vector stacks on the first
    val (v3, n3) = TxnTable.deleteWhereMor(spark, t, $"id" === 1L)
    assert(v3 == 3 && n3 == 1)
    assert(rows(t) == (2L to 30L).filter(_ % 3 != 0).toSet)
    // SQL DELETE semantics: NULL predicate rows are KEPT
    val tn = freshTable("tt_mor_null")
    TxnTable.commit(spark,
      Seq[java.lang.Long](1L, 2L, null).toDF("id"), tn, overwrite = false)
    TxnTable.deleteWhereMor(spark, tn, $"id" === 2L)
    assert(TxnTable.read(spark, tn).collect().map(r =>
      if (r.isNullAt(0)) -1L else r.getLong(0)).toSet == Set(1L, -1L))
    // OPTIMIZE materializes the filtered table and purges the vectors
    TxnTable.optimize(spark, t, numFiles = 1)
    assert(TxnTable.liveSplit(t, None)._2.isEmpty)
    assert(rows(t) == (2L to 30L).filter(_ % 3 != 0).toSet)
    // restore to the DV snapshot keeps the dv/ classification (path-based)
    TxnTable.restore(spark, t, toVersion = 3)
    assert(TxnTable.liveSplit(t, None)._2.size == 2)
    assert(rows(t) == (2L to 30L).filter(_ % 3 != 0).toSet)
  }

  test("writers that re-read files directly refuse while vectors live") {
    val t = freshTable("tt_mor_guard")
    TxnTable.commit(spark, (1L to 10L).toDF("id"), t, overwrite = false)
    TxnTable.deleteWhereMor(spark, t, $"id" === 5L)
    intercept[IllegalArgumentException] {
      TxnTable.deleteWhere(spark, t, $"id" === 6L)
    }
    intercept[IllegalArgumentException] {
      TxnTable.compactSmall(spark, t, smallBytes = 1L << 20)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Merge.upsert(spark, t, Seq(5L).toDF("id"), Seq("id"))
    }
    // vacuum keeps a referenced vector; dropping retention past the DV
    // version still keeps it because the CURRENT snapshot references it
    assert(TxnTable.vacuum(t, retainFrom = 2) == 0)
    assert(rows(t) == (1L to 10L).toSet - 5L)
    // after optimize the guards lift
    TxnTable.optimize(spark, t, numFiles = 1)
    val (_, nCow) = TxnTable.deleteWhere(spark, t, $"id" === 6L)
    assert(nCow == 1 && rows(t) == (1L to 10L).toSet -- Set(5L, 6L))
  }

  test("change feed of a MOR delete emits exactly the CoW delete's rows") {
    // same table, same predicate, both delete forms — the feeds must agree
    def feedOf(t: String, mor: Boolean): Set[(String, Long)] = {
      FileUtils.deleteQuietly(new File(t))
      TxnTable.commit(spark, (1L to 30L).toDF("id").repartition(2), t,
        overwrite = false)
      if (mor) TxnTable.deleteWhereMor(spark, t, $"id" % 5 === 0L)
      else TxnTable.deleteWhere(spark, t, $"id" % 5 === 0L)
      TxnTable.changeFeed(spark, t, 1, 2, Seq("id"))
        .select("change", "id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    }
    val mor = feedOf("/root/repo/target/tmp/spec_feed_mor", mor = true)
    val cow = feedOf("/root/repo/target/tmp/spec_feed_cow", mor = false)
    assert(mor == (5L to 30L by 5L).map(("delete", _)).toSet)
    assert(mor == cow, "MOR and CoW deletes must produce the same feed")
    // a stacked second vector feeds only the NEWLY deleted rows
    val t = "/root/repo/target/tmp/spec_feed_mor"
    TxnTable.deleteWhereMor(spark, t, $"id" % 2 === 0L)
    val second = TxnTable.changeFeed(spark, t, 2, 3, Seq("id"))
      .select("change", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(second == (2L to 30L by 2L).filter(_ % 5 != 0)
      .map(("delete", _)).toSet)
  }

  test("DV read plans as a broadcast anti-join — the table never reshuffles") {
    val t = freshTable("tt_mor_plan")
    TxnTable.commit(spark, (1L to 1000L).toDF("id").repartition(2), t,
      overwrite = false)
    TxnTable.deleteWhereMor(spark, t, $"id" % 100 === 0L)
    val plan = TxnTable.read(spark, t).queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.take(2000))
    // the vector is broadcast-sized by construction (O(deleted rows));
    // a SortMergeJoin here would shuffle the WHOLE table per read
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("commitWithRetry: racing appenders all land; exhausted retries rethrow") {
    val t = freshTable("tt_retry")
    TxnTable.commit(spark, Seq(0L).toDF("id"), t, overwrite = false)
    // 4 threads x 3 appends, all racing on the version counter — every
    // batch must land exactly once through the retry loop
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val futures = (1 to 4).flatMap { w =>
      (1 to 3).map { b =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = TxnTable.commitWithRetry(spark,
            Seq(w * 100L + b).toDF("id"), t, overwrite = false,
            maxAttempts = 20)
        })
      }
    }
    futures.foreach(_.get())
    pool.shutdown()
    val expected = Set(0L) ++
      (for (w <- 1 to 4; b <- 1 to 3) yield w * 100L + b).toSet
    assert(rows(t) == expected)
    assert(TxnTable.currentVersion(t) == 13)
    // maxAttempts = 1 with a pre-taken version: the conflict surfaces
    val stale = TxnTable.currentVersion(t) + 1
    TxnTable.commit(spark, Seq(999L).toDF("id"), t, overwrite = false)
    intercept[java.util.ConcurrentModificationException] {
      // direct commit pinned to the now-taken version — what a retry of 1
      // degenerates to under contention
      TxnTable.commit(spark, Seq(1000L).toDF("id"), t, overwrite = false,
        expectedVersion = Some(stale))
    }
  }

  test("tagLanded: incremental index, and a recreated table never false-claims a tag") {
    val t = freshTable("tag_idx")
    assert(!TxnTable.tagLanded(t, "b1"), "empty table holds no tags")
    TxnTable.commit(spark, Seq(1L).toDF("id"), t, overwrite = false,
      tag = Some("b1"))
    TxnTable.commit(spark, Seq(2L).toDF("id"), t, overwrite = false)
    assert(TxnTable.tagLanded(t, "b1"))
    assert(!TxnTable.tagLanded(t, "b2"), "fresh tag must prove absent")
    // versions added AFTER the index was built are picked up (O(new))
    TxnTable.commit(spark, Seq(3L).toDF("id"), t, overwrite = false,
      tag = Some("b2"))
    assert(TxnTable.tagLanded(t, "b2"))
    // recreate the table at the SAME path with the same version count:
    // a stale index claiming b1/b2 would silently DROP those batches
    // on replay — the digest check must rebuild instead
    FileUtils.deleteQuietly(new File(t))
    TxnTable.commit(spark, Seq(10L).toDF("id"), t, overwrite = false)
    TxnTable.commit(spark, Seq(11L).toDF("id"), t, overwrite = false,
      tag = Some("b9"))
    TxnTable.commit(spark, Seq(12L).toDF("id"), t, overwrite = false)
    assert(!TxnTable.tagLanded(t, "b1"),
      "a recreated table must not inherit the old log's tags")
    assert(!TxnTable.tagLanded(t, "b2"))
    assert(TxnTable.tagLanded(t, "b9"))
  }
}
