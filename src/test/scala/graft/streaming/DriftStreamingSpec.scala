package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.Profiling
import org.apache.spark.sql.functions._

class DriftStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streamed per-batch drift equals the batch operator on each parity slice") {
    val out = DriftStreaming.batchDrift(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(out.keys.map(_._1).toSet === Set(0L, 1L))
    val docs = Tables.documents(spark, sfDir)
    Seq(0L, 1L).foreach { p =>
      val batch = Profiling.histogramDrift(
          docs, docs.filter($"doc_id" % 2 === p), "lang", "n_chars", buckets = 64)
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
      batch.foreach { case (lang, v) => assert(out((p, lang)) === v, s"batch $p lang $lang") }
      assert(out.count(_._1._1 == p) === batch.size)
    }
    // the stream really ran as two micro-batches (one per staged file)
    val sfKey = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val ckpt = s"${sys.props("user.dir")}/target/tmp/stream/drift_$sfKey/ckpt/offsets"
    val batches = new java.io.File(ckpt).list().count(!_.startsWith("."))
    assert(batches === 2, s"expected 2 micro-batches, saw $batches offset files")
  }
}
