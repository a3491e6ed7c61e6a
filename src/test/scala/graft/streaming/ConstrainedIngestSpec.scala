package graft.streaming

import java.io.File

import graft.SparkSpec
import graft.sources.{TableConstraints, TxnTable}
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Streaming enforce-at-ingest: the split semantics live in
  * TableConstraintsSpec; this suite pins the STREAM lifecycle —
  * micro-batches land as txn versions, violators quarantine, and the
  * replay-tag scoping survives the one scenario an unscoped tag
  * silently corrupts: a CHECKPOINT RESET, after which batchIds restart
  * at 0 and new data must still land instead of being dropped as a
  * phantom replay of old tags. */
class ConstrainedIngestSpec extends SparkSpec {

  import spark.implicits._

  private val root = "/root/repo/target/tmp/spec_constrained_ingest"

  override def beforeAll(): Unit = {
    super.beforeAll()
    FileUtils.deleteQuietly(new File(root))
    new File(root).mkdirs()
  }

  test("ingest lands good rows, quarantines violators, survives a checkpoint reset") {
    val dim = s"$root/dim"
    val fact = s"$root/fact"
    val quar = s"$root/quar"
    val in = s"$root/in"
    new File(in).mkdirs()
    TxnTable.commit(spark, Seq(1L, 2L, 3L).toDF("k"), dim, overwrite = false)
    new File(fact).mkdirs()
    TableConstraints.declareUnique(dim, Seq("k"), validate = Some(spark))
    TableConstraints.declareForeignKey(fact, Seq("fk"), dim, Seq("k"))
    TableConstraints.declareNotNull(fact, Seq("fk"))
    val schema = new StructType().add("fk", LongType).add("m", LongType)

    // wave 1: two good rows, one dangler, one null key
    Seq((Some(1L), 10L), (Some(2L), 20L), (Some(9L), 90L),
        (Option.empty[Long], 5L))
      .toDF("fk", "m").coalesce(1).write.mode("append").parquet(in)
    val (t1, q1) = EventsStreaming.constrainedIngest(spark, in, schema,
      fact, quar)
    assert(t1.count() == 2)
    assert(q1.select("reason").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("fk(fk)", "notnull(fk)"))

    // a RE-RUN with the same checkpoint re-delivers nothing new: the
    // drained source yields no batches, counts are unchanged
    val (t2, q2) = EventsStreaming.constrainedIngest(spark, in, schema,
      fact, quar)
    assert(t2.count() == 2 && q2.count() == 2)

    // CHECKPOINT RESET: batchIds restart at 0. The replay tag is scoped
    // to the checkpoint's UUID, so the new stream's batch 0 must LAND —
    // an unscoped 'enforced-0' tag already exists in the fact's log and
    // would silently swallow this wave as a phantom replay.
    FileUtils.deleteQuietly(new File(s"$fact.ckpt"))
    Seq((Some(3L), 30L)).toDF("fk", "m").coalesce(1)
      .write.mode("append").parquet(in)
    val (t3, q3) = EventsStreaming.constrainedIngest(spark, in, schema,
      fact, quar)
    // the reset checkpoint re-reads EVERYTHING in the source dir; the
    // wave-1 GOOD rows now collide with nothing (no unique constraint
    // on fact), so they append again — the pin here is that the new
    // (3L, 30L) row is present, not dropped as a phantom replay
    assert(t3.filter($"fk" === 3L).count() >= 1,
      "a post-reset batch must land, not phantom-skip on old tags")
    assert(q3.count() >= 3, "violators from the re-read wave quarantine too")
    // the RELY loop stays green through all of it
    assert(TableConstraints.verifyIncremental(spark, fact).forall(_._3))
  }
}
