package graft.sources

import java.io.File

import graft.SparkSpec
import org.apache.commons.io.FileUtils

/** Model-based check for the deletion-vector table: a seeded random
  * sequence of append / MOR-delete / optimize operations must track an
  * in-memory reference set exactly — current snapshot after every op,
  * and TIME TRAVEL back to every recorded version at the end (vectors
  * stack, optimize purges, history replays through all of it). The
  * TxnCatalog sibling of the existing catalog model spec. */
class DvModelSpec extends SparkSpec {

  import spark.implicits._

  test("random append/MOR-delete/optimize sequences match the reference model") {
    val t = "/root/repo/target/tmp/spec_dv_model"
    FileUtils.deleteQuietly(new File(t))
    val rnd = new scala.util.Random(42)
    var model = Set.empty[Long]
    var nextId = 0L
    val snapshots = scala.collection.mutable.ArrayBuffer.empty[(Int, Set[Long])]

    def current(): Set[Long] =
      TxnTable.read(spark, t).as[Long].collect().toSet

    (1 to 24).foreach { step =>
      rnd.nextInt(10) match {
        case k if k <= 4 => // append a batch of fresh ids
          val n = 5 + rnd.nextInt(20)
          val batch = (nextId until nextId + n).toSet
          nextId += n
          TxnTable.commit(spark, batch.toSeq.toDF("id"), t, overwrite = false)
          model ++= batch
        case k if k <= 8 && model.nonEmpty => // MOR delete by residue class
          val m = 2 + rnd.nextInt(6)
          val r = rnd.nextInt(m)
          val expected = model.filter(id => id % m == r)
          val (_, marked) = TxnTable.deleteWhereMor(spark, t,
            $"id" % m === r.toLong)
          assert(marked == expected.size.toLong, s"step $step: marked count")
          model --= expected
        case _ if model.nonEmpty => // optimize purges vectors, keeps rows
          TxnTable.optimize(spark, t, numFiles = 1 + rnd.nextInt(2))
          assert(TxnTable.liveSplit(t, None)._2.isEmpty,
            s"step $step: optimize must purge vectors")
        case _ => () // nothing committed yet and the dice said delete
      }
      if (TxnTable.currentVersion(t) >= 1) {
        assert(current() == model, s"step $step diverged from the model")
        snapshots += TxnTable.currentVersion(t) -> model
      }
    }
    // time travel: every recorded version must replay its own snapshot
    snapshots.foreach { case (v, expected) =>
      val got = TxnTable.read(spark, t, Some(v)).as[Long].collect().toSet
      assert(got == expected, s"time travel to v$v diverged")
    }
    assert(snapshots.map(_._1).distinct.size >= 10,
      "the walk should have produced a real history")
  }
}
