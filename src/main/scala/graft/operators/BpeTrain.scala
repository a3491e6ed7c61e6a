package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge-table LEARNING (engine-added): the other half of
  * [[graft.plans.GreedyTokenize]]'s subword inference — given a corpus,
  * learn the `numMerges` most frequent adjacent-symbol merges (Sennrich
  * et al. 2016, the standard subword-vocab construction every LLM data
  * pipeline runs before pricing/packing a corpus).
  *
  * Scale shape (the reason BPE trainers are feasible at 100 TB): training
  * never iterates the corpus — it iterates the WORD HISTOGRAM. One
  * corpus-sized aggregation builds (word, count); every Lloyd-style merge
  * round then runs on that vocab table (bounded by |distinct words|, not
  * |tokens|), with exactly ONE driver-side row per round (the argmax
  * pair — same boundary argument as PageRank's per-iteration job). Words
  * travel as US-separated symbol strings, and a merge is applied with two
  * sequential `replace` passes — leftmost non-overlapping replace applied
  * twice IS greedy left-to-right pair merging (pass 1 can only skip an
  * occurrence whose left separator was consumed by the preceding match;
  * such skips are never adjacent, so pass 2 catches them all), which
  * keeps the hot loop in codegen'd string builtins instead of a
  * per-row fold.
  *
  * Symbols are restricted to printable-ASCII tokens (`^[!-~]+$`) so the
  * U+001F separator can never collide with payload and Java/RE2 regex
  * semantics agree — the training corpus for a subword vocab is filtered
  * text anyway. Ties break (count DESC, left ASC, right ASC): fully
  * deterministic, so the whole training run is DuckDB-replayable.
  */
object BpeTrain {

  private val SEP = "\u001f"

  /** (w, cnt): each distinct printable-ASCII word as a SEP-delimited
    * character-symbol string (SEP on both ends), weighted by corpus
    * frequency. */
  def vocabInit(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFns.tokens(col(textCol))).as("t"))
      .filter(col("t").rlike("^[!-~]+$"))
      .groupBy("t").agg(count(lit(1)).as("cnt"))
      .select(
        concat(lit(SEP), regexp_replace(col("t"), "(.)", "$1" + SEP)).as("w"),
        col("cnt"))

  /** One merge application: greedy left-to-right replacement of adjacent
    * (l, r) with lr — two leftmost-non-overlapping replaces (see object
    * doc for why two always suffice). */
  private def applyMerge(w: Column, l: String, r: String): Column = {
    val pat = lit(SEP + l + SEP + r + SEP)
    val rep = lit(SEP + l + r + SEP)
    call_function("replace", call_function("replace", w, pat, rep), pat, rep)
  }

  /** Learn the merge table: (rank, l_sym, r_sym, merged, pair_cnt), rank
    * 1..numMerges in learned order. Stops early if the vocab runs out of
    * adjacent pairs. */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = vocabInit(docs, textCol).persist()
    vocab.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var exhausted = false
    for (i <- 1 to numMerges if !exhausted) {
      val syms = filter(split(col("w"), SEP), s => s =!= "")
      val n = size(syms)
      val winner = vocab
        .select(col("cnt"), explode(zip_with(
          slice(syms, lit(1), n - 1), slice(syms, lit(2), n - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("c"))
        .orderBy(desc("c"), col("l"), col("r"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      winner.headOption match {
        case None => exhausted = true
        case Some((l, r, c)) =>
          merges += ((i.toLong, l, r, l + r, c))
          val next = vocab.select(applyMerge(col("w"), l, r).as("w"), col("cnt"))
            .persist()
          next.count()
          vocab.unpersist()
          vocab = next
      }
    }
    vocab.unpersist()
    merges.toSeq.toDF("rank", "l_sym", "r_sym", "merged", "pair_cnt")
  }
}
