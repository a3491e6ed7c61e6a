package graft.sources

import java.io.File

import graft.SparkSpec
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions.col

/** MODEL-BASED walk over the round's newest catalog surface: random
  * interleavings of appends/overwrites, MOR deletes, multi-table
  * forgets, column RENAMES, a column DROP, lineage checkpoints,
  * restores, and injected crashes — against a driver-side reference
  * tracking both CONTENT and SCHEMA per table. After every transaction
  * each table must present its model's logical columns and ids; at the
  * end every historical transaction must time-travel to its own
  * (schema, content) pair. Reaches interactions (rename → MOR delete on
  * the new name → restore across both; drop → append → checkpoint) that
  * targeted specs can't enumerate. */
class CatalogSchemaModelSpec extends SparkSpec {

  import spark.implicits._
  import TxnCatalog.Write

  // one table's model: logical id-column name, aux column present?, ids
  private case class T(idCol: String, hasAux: Boolean, ids: Set[Long])

  test("random schema-evolving histories with deletes and forgets match the model") {
    val c = "/root/repo/target/tmp/spec_cat_schema_model"
    FileUtils.deleteQuietly(new File(c))
    val rnd = new scala.util.Random(19L)
    val names = Seq("alpha", "beta")
    val idNames = Vector("id", "key", "node")
    val history = scala.collection.mutable.ArrayBuffer[Map[String, T]]()
    def current: Map[String, T] = history.lastOption.getOrElse(Map.empty)
    var nextId = 0L

    def frame(t: T, ids: Set[Long]) = {
      val base = ids.toSeq.map(i => (i, i * 7)).toDF(t.idCol, "aux")
      if (t.hasAux) base else base.drop("aux")
    }

    def check(): Unit = names.foreach { n =>
      current.get(n).filter(_.ids.nonEmpty).foreach { t =>
        val df = TxnCatalog.read(spark, c, n)
        val wantCols = if (t.hasAux) Set(t.idCol, "aux") else Set(t.idCol)
        assert(df.columns.toSet == wantCols,
          s"schema of $n diverged at t${history.size}: ${df.columns.toSeq}")
        val got = df.select(t.idCol).as[Long].collect().toSet
        assert(got == t.ids, s"content of $n diverged at t${history.size}")
      }
    }

    (1 to 26).foreach { i =>
      val live = names.filter(n => current.get(n).exists(_.ids.nonEmpty))
      rnd.nextInt(10) match {
        case k if k <= 3 || live.isEmpty => // append / overwrite
          val n = names(rnd.nextInt(names.size))
          val t = current.getOrElse(n, T("id", hasAux = true, Set.empty))
          val batch = (nextId until nextId + 3 + rnd.nextInt(5)).toSet
          nextId += 10
          val ow = rnd.nextBoolean() && t.ids.nonEmpty
          TxnCatalog.commitAll(spark, c, Seq(
            Write(n, frame(t, batch), overwrite = ow)))
          history += current + (n -> t.copy(
            ids = if (ow) batch else t.ids ++ batch))
        case 4 => // MOR delete on the CURRENT logical id name
          val n = live(rnd.nextInt(live.size))
          val t = current(n)
          val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
          val expected = t.ids.filter(id => id % m == r)
          val (_, marked) = TxnCatalog.deleteWhereMor(spark, c, n,
            col(t.idCol) % m === r.toLong)
          assert(marked == expected.size.toLong)
          if (expected.nonEmpty)
            history += current + (n -> t.copy(ids = t.ids -- expected))
        case 5 if live.size == names.size => // multi-table forget
          val m = 3 + rnd.nextInt(3); val r = rnd.nextInt(m)
          val preds = names.map(n =>
            n -> (col(current(n).idCol) % m === r.toLong)).toMap
          val (_, counts) = TxnCatalog.forgetWhere(spark, c, preds)
          val newState = names.map { n =>
            val t = current(n)
            val gone = t.ids.filter(id => id % m == r)
            assert(counts(n) == gone.size.toLong)
            n -> t.copy(ids = t.ids -- gone)
          }.toMap
          if (newState.exists { case (n, t) => t.ids != current(n).ids })
            history += newState
        case 6 => // rename the id column to the next name in the cycle
          val n = live(rnd.nextInt(live.size))
          val t = current(n)
          val to = idNames((idNames.indexOf(t.idCol) + 1) % idNames.size)
          TxnCatalog.renameColumn(spark, c, n, t.idCol, to)
          history += current + (n -> t.copy(idCol = to))
        case 7 => // drop aux once; re-adding the dropped name must refuse
          val withAux = live.filter(current(_).hasAux)
          if (withAux.nonEmpty) {
            val n = withAux(rnd.nextInt(withAux.size))
            val t = current(n)
            TxnCatalog.dropColumn(spark, c, n, "aux")
            history += current + (n -> t.copy(hasAux = false))
            intercept[IllegalArgumentException] {
              TxnCatalog.commitAll(spark, c, Seq(
                Write(n, Seq((nextId, nextId)).toDF(t.idCol, "aux"))))
            }
          }
        case 8 if live.nonEmpty => // zero-copy lineage checkpoint
          val n = live(rnd.nextInt(live.size))
          TxnCatalog.compactLineage(spark, c, n)
          assert(TxnCatalog.lineageLength(c, n) == 1)
          history += current
        case _ if history.size >= 2 => // restore (schema restores too)
          val candidates = (1 until history.size)
            .filter(t => history(t - 1).exists(_._2.ids.nonEmpty))
          if (candidates.nonEmpty) {
            val to = candidates(rnd.nextInt(candidates.size))
            TxnCatalog.restore(c, toTxn = to)
            history += history(to - 1)
          }
        case _ => ()
      }
      check()
    }

    // every historical txn replays its own (schema, content) pair
    history.zipWithIndex.foreach { case (state, idx) =>
      val t = idx + 1
      state.foreach { case (n, tm) =>
        if (tm.ids.nonEmpty) {
          val df = TxnCatalog.read(spark, c, n, asOf = Some(t))
          val wantCols = if (tm.hasAux) Set(tm.idCol, "aux") else Set(tm.idCol)
          assert(df.columns.toSet == wantCols, s"travel schema $n at t$t")
          assert(df.select(tm.idCol).as[Long].collect().toSet == tm.ids,
            s"travel content $n at t$t")
        }
      }
    }
    assert(history.size >= 15, "the walk should produce a real history")
  }
}
