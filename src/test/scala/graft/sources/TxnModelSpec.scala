package graft.sources

import java.io.File

import graft.SparkSpec
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._

/** MODEL-BASED test of the whole table stack: a fixed-seed random
  * sequence of append / overwrite / merge / delete / optimize / restore
  * runs against BOTH the TxnTable and a driver-side reference model
  * (a plain Map per version). After every operation the table must
  * equal the model — and at the end, EVERY historical version must
  * still time-travel to its recorded model state, and each version's
  * change feed must equal the model diff. One generator exercises the
  * interactions no single-purpose spec covers (merge after restore,
  * delete after optimize, …).
  */
class TxnModelSpec extends SparkSpec {

  import spark.implicits._

  private def table(): String = {
    val p = "/root/repo/target/tmp/spec_txn_model"
    FileUtils.deleteQuietly(new File(p))
    p
  }

  test("random operation sequences: table == model at every version, feeds == diffs") {
    val t = table()
    val rnd = new scala.util.Random(20260814L)
    // model history: version -> Map[key, value]
    val history = scala.collection.mutable.ArrayBuffer[Map[Long, Long]]()
    def current: Map[Long, Long] = history.lastOption.getOrElse(Map.empty)

    def df(m: Map[Long, Long]) =
      if (m.isEmpty) Seq.empty[(Long, Long)].toDF("k", "v")
      else m.toSeq.toDF("k", "v")

    def freshRows(n: Int): Map[Long, Long] =
      (0 until n).map(_ => rnd.nextInt(60).toLong -> rnd.nextInt(1000).toLong)
        .toMap // map semantics dedup keys — matches the keyed contract

    var ops = List.empty[String]
    (1 to 24).foreach { i =>
      val roll = if (history.isEmpty) 0 else rnd.nextInt(6)
      roll match {
        case 0 => // append of brand-new keys only (keyed-table contract)
          val base = 1000L * i
          val rows = (0 until 1 + rnd.nextInt(5))
            .map(j => (base + j) -> rnd.nextInt(1000).toLong).toMap
          TxnTable.commit(spark, df(rows).coalesce(1 + rnd.nextInt(2)), t,
            overwrite = false)
          history += current ++ rows
          ops ::= s"append(${rows.size})"
        case 1 => // overwrite
          val rows = freshRows(1 + rnd.nextInt(6))
          TxnTable.commit(spark, df(rows), t, overwrite = true)
          history += rows
          ops ::= s"overwrite(${rows.size})"
        case 2 => // merge: updates of existing keys + inserts
          val updates = rnd.shuffle(current.keys.toList)
            .take(rnd.nextInt(3)).map(k => k -> rnd.nextInt(1000).toLong)
          val inserts = (0 until rnd.nextInt(3))
            .map(j => (2000L * i + j) -> rnd.nextInt(1000).toLong)
          val src = (updates ++ inserts).toMap
          if (src.nonEmpty) {
            graft.operators.Merge.upsert(spark, t, df(src), Seq("k"))
            history += current ++ src
            ops ::= s"merge(${src.size})"
          }
        case 3 => // copy-on-write delete by predicate
          val m = 2 + rnd.nextInt(4)
          val survivors = current.filterNot { case (k, _) => k % m == 0 }
          if (survivors.nonEmpty) { // an emptied table is a bug by contract
            val (_, rewritten) =
              TxnTable.deleteWhere(spark, t, col("k") % m === 0)
            if (rewritten > 0) { // no-op deletes publish nothing
              history += survivors
              ops ::= s"delete(%$m)"
            }
          }
        case 4 => // optimize (sometimes z-ordered) — content must not move
          if (rnd.nextBoolean() || current.isEmpty)
            TxnTable.optimize(spark, t, numFiles = 1 + rnd.nextInt(2))
          else
            TxnTable.optimizeZorder(spark, t, "k", "v", 1 + rnd.nextInt(2))
          history += current
          ops ::= "optimize"
        case 5 => // restore to a random earlier NON-EMPTY version
          val candidates =
            (1 until history.size).filter(v => history(v - 1).nonEmpty)
          if (candidates.nonEmpty) {
            val to = candidates(rnd.nextInt(candidates.size))
            TxnTable.restore(spark, t, toVersion = to)
            history += history(to - 1)
            ops ::= s"restore($to)"
          }
      }
      // the head must equal the model after EVERY operation
      val got = TxnTable.read(spark, t).select("k", "v")
        .as[(Long, Long)].collect().toMap
      assert(got == current,
        s"head mismatch after ${ops.head} (ops so far: ${ops.reverse.mkString(", ")})")
    }

    // every historical version still time-travels to its recorded state
    history.zipWithIndex.foreach { case (want, idx) =>
      val v = idx + 1
      if (want.nonEmpty) {
        val got = TxnTable.read(spark, t, asOf = Some(v)).select("k", "v")
          .as[(Long, Long)].collect().toMap
        assert(got == want, s"time travel to v$v diverged from the model")
      }
    }

    // every version's change feed equals the model diff at that version
    (2 to history.size).foreach { v =>
      val (pre, post) = (history(v - 2), history(v - 1))
      val want =
        post.view.filterKeys(k => !pre.contains(k))
          .map { case (k, x) => ("insert", k, x) }.toSet ++
        pre.view.filterKeys(k => !post.contains(k))
          .map { case (k, x) => ("delete", k, x) }.toSet ++
        post.view.filterKeys(k => pre.contains(k) && pre(k) != post(k))
          .map { case (k, x) => ("update", k, x) }.toSet
      val got = TxnTable.changeFeed(spark, t, v - 1, v, Seq("k"))
        .select("change", "k", "v").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"change feed at v$v diverged from the model diff")
    }
  }
}
