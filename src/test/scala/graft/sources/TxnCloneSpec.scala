package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import org.apache.commons.io.FileUtils

/** Behavior specs for SHALLOW CLONE: zero-copy by inode identity,
  * bidirectional divergence isolation, survival of the source's vacuum,
  * and deletion vectors travelling with the snapshot.
  */
class TxnCloneSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(name: String): String = {
    val p = s"/root/repo/target/tmp/spec_$name"
    FileUtils.deleteQuietly(new File(p))
    p
  }

  private def rows(table: String, asOf: Option[Int] = None): Set[Long] =
    TxnTable.read(spark, table, asOf).select("id").as[Long].collect().toSet

  private def inode(f: File): Any =
    Files.getAttribute(f.toPath, "unix:ino")

  test("clone equals the source snapshot and shares every inode (zero bytes copied)") {
    val src = freshTable("clone_src")
    val dst = freshTable("clone_dst")
    TxnTable.commit(spark, (1L to 10L).toDF("id"), src, overwrite = false)
    TxnTable.commit(spark, (11L to 20L).toDF("id"), src, overwrite = false)

    assert(TxnTable.cloneShallow(src, dst) == 1)
    assert(rows(dst) == (1L to 20L).toSet)

    // every cloned file is a hard link of the source file — same inode,
    // so the clone wrote exactly zero data bytes
    val files = TxnTable.liveFiles(src, None)
    assert(files.nonEmpty)
    files.foreach { p =>
      assert(inode(new File(dst, p)) == inode(new File(src, p)),
        s"$p was copied, not linked")
    }
  }

  test("clone and source diverge independently; clone v1 stays the genesis snapshot") {
    val src = freshTable("clone_div_src")
    val dst = freshTable("clone_div_dst")
    TxnTable.commit(spark, (1L to 6L).toDF("id"), src, overwrite = false)
    TxnTable.cloneShallow(src, dst)

    // diverge the clone: append, then delete the odd rows (CoW rewrite)
    TxnTable.commit(spark, Seq(100L).toDF("id"), dst, overwrite = false)
    TxnTable.deleteWhere(spark, dst,
      org.apache.spark.sql.functions.col("id") % 2 === 1)
    // diverge the source: append
    TxnTable.commit(spark, Seq(200L).toDF("id"), src, overwrite = false)

    assert(rows(src) == Set(1L, 2L, 3L, 4L, 5L, 6L, 200L))
    assert(rows(dst) == Set(2L, 4L, 6L, 100L))
    // the clone's own history is intact: v1 is the cloned snapshot
    assert(rows(dst, Some(1)) == (1L to 6L).toSet)
  }

  test("vacuuming the source after an overwrite leaves the clone readable") {
    val src = freshTable("clone_vac_src")
    val dst = freshTable("clone_vac_dst")
    TxnTable.commit(spark, (1L to 5L).toDF("id"), src, overwrite = false)
    TxnTable.cloneShallow(src, dst)
    TxnTable.commit(spark, Seq(9L).toDF("id"), src, overwrite = true)

    // the source drops its own directory entries for the overwritten files;
    // the clone's hard links keep the inodes alive
    val deleted = TxnTable.vacuum(src, retainFrom = 2)
    assert(deleted >= 1)
    assert(rows(src) == Set(9L))
    assert(rows(dst) == (1L to 5L).toSet)
  }

  test("deletion vectors clone with the snapshot (table-relative addresses hold)") {
    val src = freshTable("clone_dv_src")
    val dst = freshTable("clone_dv_dst")
    TxnTable.commit(spark, (1L to 8L).toDF("id"), src, overwrite = false)
    TxnTable.deleteWhereMor(spark, src,
      org.apache.spark.sql.functions.col("id") <= 3)
    assert(rows(src) == (4L to 8L).toSet)

    TxnTable.cloneShallow(src, dst)
    assert(rows(dst) == (4L to 8L).toSet)
    // and the clone can stack its own MOR delete on top
    TxnTable.deleteWhereMor(spark, dst,
      org.apache.spark.sql.functions.col("id") === 4)
    assert(rows(dst) == (5L to 8L).toSet)
    assert(rows(src) == (4L to 8L).toSet)
  }

  test("declared constraints travel with the clone, then diverge independently") {
    val src = freshTable("clone_cons_src")
    val dst = freshTable("clone_cons_dst")
    TxnTable.commit(spark, (1L to 20L).toDF("id"), src, overwrite = false)
    TableConstraints.declareUnique(src, Seq("id"), validate = Some(spark))
    TxnTable.cloneShallow(src, dst)
    // the declaration describes the cloned data — it must be there
    assert(TableConstraints.isUniqueOn(dst, Set("id")))
    // COPIED, not linked: a re-declare on the clone leaves the source
    TableConstraints.declareUnique(dst, Seq("id"), rely = false)
    assert(TableConstraints.isUniqueOn(src, Set("id")))
    assert(!TableConstraints.isUniqueOn(dst, Set("id")))
    TableConstraints.clear(dst)
    assert(TableConstraints.uniques(src).nonEmpty)
  }

  test("clone refuses a non-empty target and an empty source") {
    val src = freshTable("clone_ref_src")
    val dst = freshTable("clone_ref_dst")
    intercept[IllegalArgumentException] { TxnTable.cloneShallow(src, dst) }
    TxnTable.commit(spark, Seq(1L).toDF("id"), src, overwrite = false)
    TxnTable.cloneShallow(src, dst)
    intercept[IllegalArgumentException] { TxnTable.cloneShallow(src, dst) }
  }

  test("write-audit-publish: the whole audit lands as ONE main version") {
    val main = freshTable("wap_main")
    val audit = freshTable("wap_audit")
    TxnTable.commit(spark, (1L to 8L).toDF("id"), main, overwrite = false)
    TxnTable.cloneShallow(main, audit)
    // three audit commits: append, append, CoW delete
    TxnTable.commit(spark, Seq(100L).toDF("id"), audit, overwrite = false)
    TxnTable.commit(spark, Seq(101L).toDF("id"), audit, overwrite = false)
    TxnTable.deleteWhere(spark, audit,
      org.apache.spark.sql.functions.col("id") % 2 === 1)

    val v = TxnTable.publishFrom(audit, main, tag = Some("wap"))
    assert(v == 2) // appends + delete collapse into one published version
    assert(rows(main) == Set(2L, 4L, 6L, 8L, 100L))
    // pre-publish snapshot still travelable; publish is tagged
    assert(rows(main, Some(1)) == (1L to 8L).toSet)
    assert(TxnTable.commitTag(main, 2).contains("wap"))
  }

  test("publish refuses when main advanced since the fork; no-op branch is a no-op") {
    val main = freshTable("wap_conflict")
    val audit = freshTable("wap_conflict_audit")
    TxnTable.commit(spark, Seq(1L).toDF("id"), main, overwrite = false)
    TxnTable.cloneShallow(main, audit)
    // un-diverged branch: nothing to publish, version unchanged
    assert(TxnTable.publishFrom(audit, main) == 1)
    assert(TxnTable.currentVersion(main) == 1)
    // a foreign writer advances main → the audit must re-fork
    TxnTable.commit(spark, Seq(2L).toDF("id"), audit, overwrite = false)
    TxnTable.commit(spark, Seq(9L).toDF("id"), main, overwrite = false)
    intercept[IllegalArgumentException] { TxnTable.publishFrom(audit, main) }
    assert(rows(main) == Set(1L, 9L))
    // and a table that was never cloned cannot masquerade as a branch
    val loose = freshTable("wap_loose")
    TxnTable.commit(spark, Seq(7L).toDF("id"), loose, overwrite = false)
    intercept[IllegalArgumentException] { TxnTable.publishFrom(loose, main) }
  }

  test("catalog clone: full history travels, sandbox diverges, zero bytes copied") {
    import graft.sources.TxnCatalog.Write
    val src = freshTable("ccat_src")
    val dst = freshTable("ccat_dst")
    TxnCatalog.commitAll(spark, src, Seq(
      Write("t1", Seq(1L, 2L).toDF("id")),
      Write("t2", Seq(10L).toDF("id"))))                      // txn 1
    TxnCatalog.commitAll(spark, src, Seq(
      Write("t1", Seq(3L).toDF("id"))))                       // txn 2

    assert(TxnCatalog.cloneCatalog(src, dst) == 2)
    def ids(cat: String, t: String, asOf: Option[Int] = None): Set[Long] =
      TxnCatalog.read(spark, cat, t, asOf).select("id").as[Long].collect().toSet
    assert(ids(dst, "t1") == Set(1L, 2L, 3L))
    assert(ids(dst, "t2") == Set(10L))
    // pre-clone history time-travels on the CLONE
    assert(ids(dst, "t1", Some(1)) == Set(1L, 2L))
    // every cloned file shares its inode with the source file
    val linked = java.nio.file.Files.walk(new File(dst).toPath)
    try linked.filter(p => java.nio.file.Files.isRegularFile(p)).forEach { p =>
      val rel = new File(dst).toPath.relativize(p)
      assert(java.nio.file.Files.getAttribute(p, "unix:ino") ==
        java.nio.file.Files.getAttribute(new File(src).toPath.resolve(rel), "unix:ino"))
    } finally linked.close()
    // diverge both sides; neither sees the other
    TxnCatalog.commitAll(spark, dst, Seq(
      Write("t2", Seq(99L).toDF("id"), overwrite = true)))    // sandbox txn 3
    TxnCatalog.commitAll(spark, src, Seq(
      Write("t1", Seq(4L).toDF("id"))))                       // prod txn 3
    assert(ids(src, "t1") == Set(1L, 2L, 3L, 4L))
    assert(ids(src, "t2") == Set(10L))
    assert(ids(dst, "t1") == Set(1L, 2L, 3L))
    assert(ids(dst, "t2") == Set(99L))
    // clone refuses an existing target
    intercept[IllegalArgumentException] { TxnCatalog.cloneCatalog(src, dst) }
  }

  test("catalog WAP: a multi-txn audit squashes into ONE main entry") {
    import graft.sources.TxnCatalog.Write
    val main = freshTable("cwap_main")
    val audit = freshTable("cwap_audit")
    TxnCatalog.commitAll(spark, main, Seq(
      Write("t1", Seq(1L, 2L).toDF("id"))))                   // txn 1
    TxnCatalog.cloneCatalog(main, audit)
    TxnCatalog.commitAll(spark, audit, Seq(
      Write("t1", Seq(3L).toDF("id"))))                       // audit txn 2
    TxnCatalog.commitAll(spark, audit, Seq(
      Write("t2", Seq(10L).toDF("id"))))                      // audit txn 3

    assert(TxnCatalog.publishFrom(audit, main, Some("wap")) == 2)
    assert(TxnCatalog.currentTxn(main) == 2) // squashed, not replayed
    def ids(cat: String, t: String, asOf: Option[Int] = None): Set[Long] =
      TxnCatalog.read(spark, cat, t, asOf).select("id").as[Long].collect().toSet
    assert(ids(main, "t1") == Set(1L, 2L, 3L))
    assert(ids(main, "t2") == Set(10L))
    assert(ids(main, "t1", Some(1)) == Set(1L, 2L))
    // un-diverged branch → no-op; diverged main → refused
    val audit2 = freshTable("cwap_audit2")
    TxnCatalog.cloneCatalog(main, audit2)
    assert(TxnCatalog.publishFrom(audit2, main) == 2)
    TxnCatalog.commitAll(spark, audit2, Seq(
      Write("t1", Seq(4L).toDF("id"))))
    TxnCatalog.commitAll(spark, main, Seq(
      Write("t1", Seq(9L).toDF("id"))))                       // main moved on
    intercept[IllegalArgumentException] { TxnCatalog.publishFrom(audit2, main) }
    assert(ids(main, "t1") == Set(1L, 2L, 3L, 9L))
  }

  test("catalog WAP is table-scoped: disjoint audits both publish; overlap refuses") {
    import graft.sources.TxnCatalog.Write
    val main = freshTable("cwap2_main")
    val a = freshTable("cwap2_a")
    val b = freshTable("cwap2_b")
    TxnCatalog.commitAll(spark, main, Seq(
      Write("tx", Seq(1L).toDF("id")),
      Write("ty", Seq(10L).toDF("id"))))                      // txn 1
    // two audits fork the SAME head and touch DISJOINT tables
    TxnCatalog.cloneCatalog(main, a)
    TxnCatalog.cloneCatalog(main, b)
    TxnCatalog.commitAll(spark, a, Seq(Write("tx", Seq(2L).toDF("id"))))
    TxnCatalog.commitAll(spark, b, Seq(Write("ty", Seq(11L).toDF("id"))))
    TxnCatalog.commitAll(spark, b, Seq(Write("tz", Seq(100L).toDF("id"))))

    assert(TxnCatalog.publishFrom(a, main) == 2)              // first audit lands
    assert(TxnCatalog.publishFrom(b, main) == 3)              // disjoint → also lands
    def ids(cat: String, t: String, asOf: Option[Int] = None): Set[Long] =
      TxnCatalog.read(spark, cat, t, asOf).select("id").as[Long].collect().toSet
    assert(ids(main, "tx") == Set(1L, 2L))
    assert(ids(main, "ty") == Set(10L, 11L))
    assert(ids(main, "tz") == Set(100L))
    // pre-publish history still travels
    assert(ids(main, "ty", Some(2)) == Set(10L))

    // a third audit of tx forked BEFORE a's publish overlaps → refused
    val c = freshTable("cwap2_c")
    TxnCatalog.cloneCatalog(main, c)
    TxnCatalog.commitAll(spark, c, Seq(Write("tx", Seq(3L).toDF("id"))))
    TxnCatalog.commitAll(spark, main, Seq(Write("tx", Seq(9L).toDF("id"))))
    intercept[IllegalArgumentException] { TxnCatalog.publishFrom(c, main) }
    assert(ids(main, "tx") == Set(1L, 2L, 9L))
  }

  test("WAP auto-rebase: overlapping append audits land serially; genuine conflicts refuse") {
    import graft.sources.TxnCatalog.Write
    val main = freshTable("cwap3_main")
    val a = freshTable("cwap3_a")
    val b = freshTable("cwap3_b")
    TxnCatalog.commitAll(spark, main, Seq(
      Write("tx", Seq(1L).toDF("id")),
      Write("ty", Seq(10L).toDF("id"))))                      // txn 1
    // two audits fork the SAME head and BOTH append to tx (overlap)
    TxnCatalog.cloneCatalog(main, a)
    TxnCatalog.cloneCatalog(main, b)
    TxnCatalog.commitAll(spark, a, Seq(Write("tx", Seq(2L).toDF("id"))))
    TxnCatalog.commitAll(spark, b, Seq(Write("tx", Seq(3L).toDF("id")),
      Write("ty", Seq(11L).toDF("id"))))                      // multi-table audit

    assert(TxnCatalog.publishFromOrRebase(a, main) == 2)      // lands plain
    // b now overlaps on tx: plain publish refuses, rebase lands it
    intercept[IllegalArgumentException] { TxnCatalog.publishFrom(b, main) }
    assert(TxnCatalog.publishFromOrRebase(b, main) == 3)
    def ids(cat: String, t: String, asOf: Option[Int] = None): Set[Long] =
      TxnCatalog.read(spark, cat, t, asOf).select("id").as[Long].collect().toSet
    assert(ids(main, "tx") == Set(1L, 2L, 3L), "both appends present")
    assert(ids(main, "ty") == Set(10L, 11L), "non-conflicted table rode along")
    // history: each publish is one txn, pre-rebase snapshots travel
    assert(ids(main, "tx", Some(2)) == Set(1L, 2L))
    assert(ids(main, "tx", Some(1)) == Set(1L))

    // a rebased-clone dir exists as the audit trail; the ORIGINAL branch
    // is untouched (still shows only its own append)
    assert(new File(s"${b}_rebase1").exists())
    assert(ids(b, "tx") == Set(1L, 3L))

    // GENUINE conflict: an audit that OVERWROTE a table main also
    // changed cannot rebase (its removal list addresses the fork's
    // file set, not main's head)
    val c = freshTable("cwap3_c")
    TxnCatalog.cloneCatalog(main, c)
    TxnCatalog.commitAll(spark, c, Seq(
      Write("tx", Seq(99L).toDF("id"), overwrite = true)))
    TxnCatalog.commitAll(spark, main, Seq(Write("tx", Seq(4L).toDF("id"))))
    val ex = intercept[IllegalArgumentException] {
      TxnCatalog.publishFromOrRebase(c, main)
    }
    assert(ex.getMessage.contains("cannot rebase") ||
      ex.getMessage.contains("REMOVED files"), ex.getMessage)
    assert(ids(main, "tx") == Set(1L, 2L, 3L, 4L), "main untouched by refusal")

    // a MOR (deletion-vector) delete has removed=[] but IS a row
    // removal addressed at fork-era positions — must refuse like any
    // other removal, not slip through the pure-append gate
    val dvb = freshTable("cwap3_dv")
    TxnCatalog.cloneCatalog(main, dvb)
    TxnCatalog.deleteWhereMor(spark, dvb, "tx", $"id" === 2L)
    TxnCatalog.commitAll(spark, main, Seq(Write("tx", Seq(5L).toDF("id"))))
    val exDv = intercept[IllegalArgumentException] {
      TxnCatalog.publishFromOrRebase(dvb, main)
    }
    assert(exDv.getMessage.contains("DELETION VECTOR"), exDv.getMessage)

    // two tables CREATED independently on both sides share a name but
    // not content — refuse instead of silently unioning them
    val crt = freshTable("cwap3_crt")
    TxnCatalog.cloneCatalog(main, crt)
    TxnCatalog.commitAll(spark, crt, Seq(Write("tnew", Seq(1L).toDF("id"))))
    TxnCatalog.commitAll(spark, main, Seq(Write("tnew", Seq(2L).toDF("id"))))
    val exCrt = intercept[IllegalArgumentException] {
      TxnCatalog.publishFromOrRebase(crt, main)
    }
    assert(exCrt.getMessage.contains("created independently"), exCrt.getMessage)
  }

  test("catalog clone pins the head and keeps pre-restore versions travelable") {
    import graft.sources.TxnCatalog.Write
    val src = freshTable("cpin_src")
    val dst = freshTable("cpin_dst")
    TxnCatalog.commitAll(spark, src, Seq(Write("t", Seq(1L).toDF("id")))) // txn 1
    TxnCatalog.commitAll(spark, src, Seq(Write("t", Seq(2L).toDF("id")))) // txn 2
    TxnCatalog.restore(src, toTxn = 1)                                    // txn 3 → back to {1}
    assert(TxnCatalog.cloneCatalog(src, dst) == 3)
    def ids(cat: String, asOf: Option[Int] = None): Set[Long] =
      TxnCatalog.read(spark, cat, "t", asOf).select("id").as[Long].collect().toSet
    assert(ids(dst) == Set(1L))
    // txn 2's snapshot references a HIGHER table version than the restored
    // head maps to — the pin must keep it (per-table max over ALL entries,
    // not the head's mapping)
    assert(ids(dst, Some(2)) == Set(1L, 2L))
  }
}
