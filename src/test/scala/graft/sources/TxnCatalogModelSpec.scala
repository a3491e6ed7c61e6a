package graft.sources

import java.io.File

import graft.SparkSpec
import org.apache.commons.io.FileUtils

/** MODEL-BASED test of the catalog: a fixed-seed random sequence of
  * multi-table commits (append/overwrite mixes), catalog restores, and
  * injected CRASHES (per-table commits that never publish a catalog
  * entry) runs against a driver-side reference model. After every
  * transaction each table must equal its model, every historical
  * transaction must still time-travel, and orphans must never surface —
  * the generator reaches interactions (restore over orphans, overwrite
  * after crash, lineage truncation) targeted specs don't.
  */
class TxnCatalogModelSpec extends SparkSpec {

  import spark.implicits._
  import TxnCatalog.Write

  test("random multi-table histories with crashes and restores match the model") {
    val c = "/root/repo/target/tmp/spec_cat_model"
    FileUtils.deleteQuietly(new File(c))
    val rnd = new scala.util.Random(8L)
    val names = Seq("alpha", "beta")
    // model history: txn -> (table -> key set)
    val history = scala.collection.mutable.ArrayBuffer[Map[String, Set[Long]]]()
    def current: Map[String, Set[Long]] =
      history.lastOption.getOrElse(Map.empty)

    def check(): Unit = {
      names.foreach { n =>
        current.get(n) match {
          case Some(want) if want.nonEmpty =>
            val got = TxnCatalog.read(spark, c, n)
              .select("id").as[Long].collect().toSet
            assert(got == want, s"table $n diverged at t${history.size}")
          case _ => ()
        }
      }
    }

    (1 to 18).foreach { i =>
      rnd.nextInt(4) match {
        case 3 if history.size >= 2 &&
          (1 until history.size).exists(t => history(t - 1).exists(_._2.nonEmpty)) =>
          // catalog restore (history indexes catalog txns 1:1, so the
          // model state at txn `to` is history(to - 1))
          val candidates = (1 until history.size)
            .filter(t => history(t - 1).exists(_._2.nonEmpty))
          val to = candidates(rnd.nextInt(candidates.size))
          TxnCatalog.restore(c, toTxn = to)
          history += history(to - 1)
        case 2 if history.nonEmpty =>
          // CRASH: a table commit that never reaches the catalog — no
          // catalog txn, so NO history push; the orphan must stay hidden
          val n = names(rnd.nextInt(names.size))
          TxnTable.commit(spark, Seq(-1000L - i).toDF("id"),
            TxnCatalog.tablePath(c, n), overwrite = rnd.nextBoolean())
        case _ => // a 1- or 2-table transaction
          val ws = names.filter(_ => rnd.nextBoolean()) match {
            case Nil => Seq(names(rnd.nextInt(names.size)))
            case xs => xs
          }
          val writes = ws.map { n =>
            val rows = (0 until 1 + rnd.nextInt(4))
              .map(_ => 100L * i + rnd.nextInt(50)).toSet
            (n, rows, rnd.nextBoolean() && current.contains(n))
          }
          TxnCatalog.commitAll(spark, c, writes.map { case (n, rows, ow) =>
            Write(n, rows.toSeq.toDF("id"), overwrite = ow)
          })
          history += current ++ writes.map { case (n, rows, ow) =>
            n -> (if (ow) rows
                  else current.getOrElse(n, Set.empty) ++ rows)
          }
      }
      check()
    }

    // every historical catalog txn still reads to its model state
    def travelAll(): Unit =
      history.zipWithIndex.foreach { case (state, idx) =>
        val t = idx + 1
        state.foreach { case (n, want) =>
          if (want.nonEmpty) {
            val got = TxnCatalog.read(spark, c, n, asOf = Some(t))
              .select("id").as[Long].collect().toSet
            assert(got == want, s"time travel: table $n at t$t diverged")
          }
        }
      }
    travelAll()

    // catalog vacuum sweeps the crash-stranded orphans (every crash left
    // at least one unreferenced data file) without touching ANY
    // catalog-travelable snapshot — the full history re-check must pass
    val deleted = TxnCatalog.vacuum(c)
    assert(deleted >= 1, "the injected crashes must leave orphan bytes")
    travelAll()
    assert(TxnCatalog.vacuum(c) == 0, "vacuum is idempotent")
  }

  test("random WAP walks: disjoint audits merge, overlaps refuse, all history travels") {
    val root = "/root/repo/target/tmp/spec_cat_wapmodel"
    FileUtils.deleteQuietly(new File(root))
    val main = s"$root/main"
    val rnd = new scala.util.Random(24L)
    val names = Seq("ta", "tb")

    var model = Map.empty[String, Set[Long]]          // main's live state
    val mainLog = scala.collection.mutable.ArrayBuffer[Set[String]]() // per-txn touched tables
    val snapshots = scala.collection.mutable.ArrayBuffer[Map[String, Set[Long]]]()
    def commitMain(n: String, rows: Set[Long]): Unit = {
      TxnCatalog.commitAll(spark, main, Seq(Write(n, rows.toSeq.toDF("id"))))
      model += n -> (model.getOrElse(n, Set.empty) ++ rows)
      mainLog += Set(n); snapshots += model
    }
    commitMain("ta", Set(1L))

    final case class Branch(path: String, forkLen: Int,
                            var st: Map[String, Set[Long]],
                            var touched: Set[String], var commits: Int)
    val branches = scala.collection.mutable.ArrayBuffer[Branch]()
    var nextId = 0
    var nPublished = 0
    var nRefused = 0

    def check(): Unit = model.foreach { case (n, want) =>
      val got = TxnCatalog.read(spark, main, n).select("id").as[Long].collect().toSet
      assert(got == want, s"main table $n diverged from the model")
    }

    (1 to 30).foreach { i =>
      rnd.nextInt(4) match {
        case 0 => // fork a new audit branch off the current head
          nextId += 1
          val b = Branch(s"$root/b$nextId", mainLog.size, model, Set.empty, 0)
          TxnCatalog.cloneCatalog(main, b.path)
          branches += b
        case 1 if branches.nonEmpty => // audit commit on a random branch
          val b = branches(rnd.nextInt(branches.size))
          val n = names(rnd.nextInt(names.size))
          val rows = Set(1000L * i + rnd.nextInt(9))
          TxnCatalog.commitAll(spark, b.path, Seq(Write(n, rows.toSeq.toDF("id"))))
          b.st += n -> (b.st.getOrElse(n, Set.empty) ++ rows)
          b.touched += n; b.commits += 1
        case 2 => // main moves on underneath the audits
          commitMain(names(rnd.nextInt(names.size)), Set(5000L * i + rnd.nextInt(9)))
        case _ if branches.nonEmpty => // publish a random branch, retire it
          val b = branches.remove(rnd.nextInt(branches.size))
          val mainChanged = mainLog.drop(b.forkLen).flatten.toSet
          if (b.commits == 0) {
            TxnCatalog.publishFrom(b.path, main) // no-op: audit wrote nothing
          } else if ((b.touched intersect mainChanged).nonEmpty) {
            intercept[IllegalArgumentException] {
              TxnCatalog.publishFrom(b.path, main)
            }
            nRefused += 1
          } else {
            TxnCatalog.publishFrom(b.path, main)
            model = model ++ b.touched.map(n => n -> b.st(n))
            mainLog += b.touched; snapshots += model
            nPublished += 1
          }
        case _ => ()
      }
      check()
    }
    // the walk must have exercised both outcomes at least once
    assert(nPublished >= 1, "walk never published a disjoint audit")
    assert(nRefused >= 1, "walk never hit an overlapping refusal")
    // every historical main txn (commits AND squashed publishes) travels
    snapshots.zipWithIndex.foreach { case (state, idx) =>
      val t = idx + 1
      state.foreach { case (n, want) =>
        val got = TxnCatalog.read(spark, main, n, asOf = Some(t))
          .select("id").as[Long].collect().toSet
        assert(got == want, s"time travel: main table $n at t$t diverged")
      }
    }
  }
}
