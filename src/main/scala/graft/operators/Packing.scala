package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Sequence packing — the step between a curated corpus and a training
  * batch: concatenate documents into fixed-token-budget sequences so no
  * context window trains mostly on padding. (Reference scope: engine-
  * added LLM-pipeline surface; the builder brief's training-data ops.)
  *
  * Contract (deterministic, so the DuckDB oracle replays it): within
  * each group, documents are visited in ascending id order and packed
  * greedy-first-fit — a document starts a NEW pack exactly when adding
  * it would push the running token count over `budget` (documents
  * longer than the budget get a pack of their own; the pack counter
  * still advances past them). pack_id numbers packs 0,1,2,… per group.
  *
  * Scale shape: packing is inherently sequential — pack_id depends on
  * every predecessor's length — so the 100 TB form packs WITHIN bounded
  * groups (the shard/language/source cells a real pipeline packs per
  * writer task), never globally: `groupCols` IS that boundary. Each
  * group's documents fold inside ONE `aggregate` higher-order function
  * over the group's collected (id, tokens) pairs — a single hash-
  * aggregate shuffle on the group key, no window, no driver loop, and
  * nothing corpus-sized ever sits on one node (a group is a shard, and
  * only (id, count) pairs are collected — never text). A global pack
  * over 100 TB would serialize the corpus through one task — that is
  * the same accidental-global-window mistake GlobalWindowGuard exists
  * to catch, which is why no ungrouped overload is offered.
  */
object Packing {

  /** (groupCols…, doc_id, n_tokens, pack_id, pack_fill): every document
    * assigned to its pack; `pack_fill` is the pack's running token count
    * AFTER this document (the last row of a pack carries its final
    * fill). `tokensCol` must be a LONG token count column expression
    * (e.g. [[TextFns.tokenCount]] of the text column). */
  /** Release MANIFEST — the integrity record shipped next to an exported
    * dataset: rows shard deterministically by content-hash bucket of the
    * id (layout-invariant, like every sampler here), and each shard
    * reports its row count plus an ORDER-INDEPENDENT content checksum —
    * the sum of each row's leading-8-hex sha256 over the
    * `|`-joined content columns. Any dropped, duplicated, or altered row
    * moves its shard's checksum; a verifier recomputes shard-local sums
    * in any order, no global sort. One hash aggregate, no window. */
  def releaseManifest(docs: DataFrame, idCol: String,
                      contentCols: Seq[String], nShards: Int): DataFrame = {
    require(nShards >= 1 && contentCols.nonEmpty, "bad manifest parameters")
    val rowDigest = conv(
      substring(sha2(
        concat_ws("|", (col(idCol) +: contentCols.map(col))
          .map(_.cast("string")): _*).cast("binary"), 256), 1, 8),
      16, 10).cast("long")
    docs
      .groupBy((graft.operators.Sampling.hashBucket(col(idCol), nShards))
        .as("shard"))
      .agg(count(lit(1)).as("n_rows"), sum(rowDigest).as("content_sum"))
  }

  def packSequences(docs: DataFrame, idCol: String, tokens: Column,
                    groupCols: Seq[String], budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(groupCols.nonEmpty,
      "packing needs a group boundary — a global pack serializes the corpus")
    val ds = docs
      .select((groupCols.map(col) :+ col(idCol).as("__id") :+
        tokens.cast("long").as("__tok")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col("__id"), col("__tok")))).as("__ds"))
    // fold state: (fill of the open pack, current pack id, emitted rows)
    val packed = aggregate(
      col("__ds"),
      struct(lit(0L).as("fill"), lit(0L).as("pack"),
        // empty array<struct<…>>: a one-element array sliced to length 0
        // (a bare array() literal types as array<null> and won't cast)
        slice(array(struct(lit(0L).as("id"), lit(0L).as("tok"),
          lit(0L).as("pack"), lit(0L).as("fill"))), 1, 0).as("out")),
      (acc, d) => {
        val id = d.getField("__id"); val tok = d.getField("__tok")
        val opens = acc.getField("fill") + tok > lit(budget)
        val pack = when(opens && acc.getField("fill") > 0,
          acc.getField("pack") + 1).otherwise(acc.getField("pack"))
        val fill = when(opens && acc.getField("fill") > 0, tok)
          .otherwise(acc.getField("fill") + tok)
        struct(fill.as("fill"), pack.as("pack"),
          concat(acc.getField("out"),
            array(struct(id.as("id"), tok.as("tok"), pack.as("pack"),
              fill.as("fill")))).as("out"))
      },
      acc => acc.getField("out"))
    ds.select((groupCols.map(col) :+ explode(packed).as("__p")): _*)
      .select((groupCols.map(col) :+
        col("__p.id").as(idCol) :+ col("__p.tok").as("n_tokens") :+
        col("__p.pack").as("pack_id") :+ col("__p.fill").as("pack_fill")): _*)
  }

  /** [[packSequences]] over a text column: token counts via the
    * whitespace tokenizer ([[TextFns.tokenCount]]). */
  def packByTokens(docs: DataFrame, idCol: String, textCol: String,
                   groupCols: Seq[String], budget: Long): DataFrame =
    packSequences(docs, idCol, TextFns.tokenCount(col(textCol)), groupCols, budget)
}
