package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TxnTable

/** Keyed MERGE (upsert) into a [[graft.sources.TxnTable]] — the Delta
  * `MERGE INTO` essentials (engine-added; the reference's closest shape is
  * pandas `to_sql(if_exists='replace')`, a full-table swap —
  * reference pipeline.py:1068-1144): matched target rows take the source
  * row, unmatched source rows insert, everything else is untouched.
  *
  * The 100 TB shape is FILE-LEVEL rewrite pruning: a merge of a small
  * changeset into a huge table must not rewrite the table. Phase 1 finds
  * the files that actually CONTAIN a matched key (one semi-join of the
  * target scan against the broadcast source keys, grouped by
  * `input_file_name()` — |files| rows back to the driver, a model fetch,
  * never data). Phase 2 rewrites ONLY those files (anti-join out the
  * matched keys, union the source) and commits via
  * [[TxnTable.commitRewrite]], which removes exactly the affected files.
  * Untouched files stay byte-identical — no data movement, full time
  * travel, and snapshot isolation for concurrent readers.
  */
object Merge {

  final case class MergeResult(version: Int, filesRewritten: Int)

  /** Upsert `source` into `table` on equality of `keys`.
    *
    * Requires `source` keys be unique (multiple source rows matching one
    * target row is the ambiguous-merge error Delta throws too) and its
    * schema to cover the table's columns by name. `source` is broadcast
    * for the probe — merges are small-changeset by design; a giant
    * source should go through overwrite instead.
    *
    * `evolveSchema = true` lets the source carry NEW columns (Delta's
    * merge-with-autoMerge): rewritten survivors null-extend; files the
    * merge never touched keep their old footer, so subsequent snapshots
    * read with `TxnTable.read(mergeSchema = true)` — schema evolution
    * without rewriting history, same contract as q_src_txn_evolution. */
  def upsert(spark: SparkSession, table: String, source: DataFrame,
             keys: Seq[String],
             expectedVersion: Option[Int] = None,
             evolveSchema: Boolean = false): MergeResult = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val src = source.cache()
    val nSrc = src.count()
    val nSrcKeys = src.select(keys.map(col): _*).distinct().count()
    require(nSrc == nSrcKeys,
      s"ambiguous merge: $nSrc source rows but $nSrcKeys distinct keys — " +
        "a target row would match more than one source row")

    TxnTable.requireNoDv(table, "MERGE")
    val target = TxnTable.read(spark, table, mergeSchema = evolveSchema)
    if (evolveSchema)
      require(target.columns.toSet.subsetOf(src.columns.toSet),
        s"evolveSchema source must cover every table column; missing " +
          target.columns.toSet.diff(src.columns.toSet).mkString(","))
    else
      require(target.columns.sorted.sameElements(src.columns.sorted),
        s"merge schema mismatch: table has ${target.columns.sorted.mkString(",")} " +
          s"vs source ${src.columns.sorted.mkString(",")}")
    val srcKeys = src.select(keys.map(col): _*).distinct()

    // phase 1 — which live files hold a matched key? |files| rows max.
    val affectedAbs = target
      .withColumn("__file", input_file_name())
      .join(broadcast(srcKeys), keys, "left_semi")
      .select("__file").distinct()
      .collect().map(_.getString(0))

    val tableAbs = new java.io.File(table).getAbsolutePath
    def toRel(uri: String): String = {
      val p = if (uri.startsWith("file:"))
        new java.io.File(new java.net.URI(uri)).getAbsolutePath
      else uri
      require(p.startsWith(tableAbs + "/"),
        s"matched file outside the table root: $p")
      p.stripPrefix(tableAbs + "/")
    }
    val removedRel = affectedAbs.map(toRel).toSeq.sorted

    // phase 2 — rewrite only the affected files; pure append when the
    // merge matched nothing (every source row is an insert)
    val version =
      if (removedRel.isEmpty)
        TxnTable.commit(spark, src, table, overwrite = false,
          expectedVersion = expectedVersion)
      else {
        val reader = if (evolveSchema)
          spark.read.option("mergeSchema", "true") else spark.read
        val survivors = reader.parquet(affectedAbs.toIndexedSeq: _*)
          .join(broadcast(srcKeys), keys, "left_anti")
        TxnTable.commitRewrite(spark,
          survivors.unionByName(src, allowMissingColumns = evolveSchema),
          table, removedRel, expectedVersion = expectedVersion)
      }
    src.unpersist()
    MergeResult(version, removedRel.size)
  }
}
