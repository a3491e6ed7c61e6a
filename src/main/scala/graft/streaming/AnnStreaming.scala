package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Similarity

/** Streaming enrichment against a persisted ANN index: new embedding
  * vectors arrive as a stream and leave tagged with their top-k nearest
  * corpus neighbours — the online half of the batch-built
  * [[Similarity.writeIvfPqIndex]] (tag-incoming-docs-for-dedup /
  * retrieval-candidates-at-ingest, the same deployment split as
  * `Dedup.writeMinHashIndex` + `incrementalNearDups`).
  *
  * Shape: file source → foreachBatch(ivfPqTopKIndexed(batch, index))
  * → append sink. The index is static across batches (daily rebuild in
  * production); each micro-batch probes nprobe lists and scores m codes
  * per candidate, so per-batch cost is O(|batch| · corpus/nClusters ·
  * rerank) — independent of how many batches came before, unlike any
  * stream-stream self-join formulation. Top-k per query vector is a
  * pure per-row enrichment, so batch boundaries cannot change results
  * (asserted by running the fixture as TWO micro-batches and oracling
  * against the one-shot batch answer).
  */
object AnnStreaming {

  private def streamSession(spark: SparkSession): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", "8"))
    s
  }

  /** Enrich the `vec_id < 10` query slice of `sfDir`'s embeddings with
    * their top-5 neighbours from the full-corpus IVFPQ index, as a
    * 2-micro-batch stream (maxFilesPerTrigger=1 over two staged files).
    * Output contract == `Similarity.ivfPqTopKIndexed` == `ivfPqTopK`:
    * (q_id, rank, n_id, sim). */
  def enrichTopK(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    val ss = streamSession(spark)
    val sfKey = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val idxDir = s"${sys.props("user.dir")}/target/ann_index_${sfKey}_c16i2m8k16"
    graft.DerivedCache.ensure(new java.io.File(idxDir),
        Seq(new java.io.File(s"$sfDir/embeddings.parquet")), "codes/_SUCCESS") {
      Similarity.writeIvfPqIndex(graft.Tables.embeddings(ss, sfDir), idxDir)
    }

    val base = s"${sys.props("user.dir")}/target/tmp/stream/ann_$sfKey"
    val (in, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    // two files → two micro-batches: proves per-batch enrichment, and
    // since top-k is per-row the union equals the one-shot answer
    val queries = graft.Tables.embeddings(ss, sfDir).filter(col("vec_id") < 10)
    queries.filter(col("vec_id") < 5)
      .coalesce(1).write.parquet(s"$in/batch_a")
    queries.filter(col("vec_id") >= 5)
      .coalesce(1).write.parquet(s"$in/batch_b")

    val schema = queries.schema
    val src = ss.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(in)
    val q = src.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Similarity.ivfPqTopKIndexed(batch, idxDir, k)
          .write.mode("append").parquet(out)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(out)
  }
}
