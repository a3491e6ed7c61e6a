package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs between raw
  * ingest and export (engine-added, builder brief): benchmark
  * decontamination and repetition/boilerplate quality signals.
  */
object Curation {

  /** Benchmark decontamination: find training documents that share at
    * least one word n-gram with the evaluation set — the overlap filter
    * every serious LLM corpus applies so test questions don't leak into
    * training data.
    *
    * Output: one row per contaminated training doc —
    * (idCol, n_hit_shingles = distinct eval n-grams it contains).
    *
    * Scale shape: the eval side (benchmarks, ~1e6-1e8 n-grams) is
    * `distinct`-ed and broadcast; the 100 TB training side streams
    * scan → explode → broadcast-hash semi-match → partial-agg count, so
    * the big side never shuffles full documents, only the (id, hit)
    * survivors. If the eval n-gram set outgrows broadcast range, drop the
    * `broadcast` hint and the same plan degrades to a shuffled semi-join
    * on the n-gram key. Joining on the raw n-gram string keeps the DuckDB
    * oracle exact; at scale you'd map shingles through xxhash64 first
    * (8-byte keys, ~1e-7 false-hit odds per billion pairs).
    */
  def decontaminate(train: DataFrame, eval: DataFrame,
                    idCol: String, textCol: String,
                    shingleSize: Int): DataFrame = {
    val evalShingles = eval
      .select(explode(TextFns.shingles(col(textCol), shingleSize)).as("sh"))
      .distinct()
    val trainShingles = train
      .select(col(idCol), explode(TextFns.shingles(col(textCol), shingleSize)).as("sh"))
    trainShingles
      .join(broadcast(evalShingles), "sh")
      .groupBy(idCol)
      .agg(count_distinct(col("sh")).as("n_hit_shingles"))
  }

  /** Gopher-family repetition signals per document:
    *
    *  - `total_tokens`  — whitespace token count;
    *  - `dup_2gram_frac` — fraction of repeated word bigrams,
    *    1 − distinct/total (0 for single-token docs) — high values mean
    *    looping/boilerplate text;
    *  - `top_token_frac` — the most frequent token's share of all tokens —
    *    high values mean keyword-stuffed or degenerate text.
    *
    * The bigram signal is a linear per-row expression (stays in the scan's
    * codegen span). The token mode is computed by explode → two partial
    * aggregations — NOT a per-row O(len²) nested HOF — so a 100 KB
    * document costs O(len) and map-side combine absorbs the explosion
    * before the (id, token) shuffle. The final join is id-to-id on
    * co-partitioned aggregates.
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol), TextFns.tokens(col(textCol)).as("ws"))
    val perDoc = base.select(
      col(idCol),
      size(col("ws")).cast("long").as("total_tokens"),
      when(size(col("ws")) >= 2,
        lit(1.0) - size(array_distinct(
            transform(sequence(lit(1), size(col("ws")) - 1),
              i => array_join(slice(col("ws"), i, lit(2)), " "))))
          .cast("double") / (size(col("ws")) - 1))
        .otherwise(lit(0.0)).as("dup_2gram_frac"))
    val mode = base
      .select(col(idCol), explode(col("ws")).as("t"))
      .groupBy(col(idCol), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(
        max(col("c")).as("top_c"), sum(col("c")).as("tot"))
      .select(col(idCol),
        (col("top_c").cast("double") / col("tot")).as("top_token_frac"))
    perDoc.join(mode, idCol)
  }

  /** Sliding-window document chunking — long documents cut into
    * `chunkTokens`-token windows every `strideTokens` tokens (overlap =
    * chunk − stride), the unit a training pipeline feeds a
    * fixed-context-length model and a RAG index stores. Output:
    * (idCol, chunk_id, chunk_text, n_tokens); the tail chunk may be
    * short; docs shorter than one chunk yield exactly one chunk.
    *
    * Shape: pure per-row explode — no shuffle, no state; 100 TB scales
    * linearly. The token array is materialized as its own projection
    * column and the window lambda slices THAT attribute: handing the
    * lambda the raw `split(...)` tree would re-tokenize per chunk after
    * projection collapse (the rollingFingerprint lesson — multi-use
    * aliases are exempt from collapse, single-use trees are not). */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int, strideTokens: Int,
                     carryCols: Seq[String] = Nil): DataFrame = {
    require(chunkTokens >= 1 && strideTokens >= 1 && strideTokens <= chunkTokens,
      s"need 1 <= stride <= chunk, got ($chunkTokens, $strideTokens)")
    // doc-level metadata (source, lang, …) rides the explode via carryCols
    // — at scale that beats re-joining chunks back to a doc dimension
    val carried = carryCols.map(col)
    docs.select(col(idCol) +: carried :+ TextFns.tokens(col(textCol)).as("__w"): _*)
      .select(col(idCol) +: carried :+
        posexplode(transform(
          sequence(lit(1), size(col("__w")), lit(strideTokens)),
          s => slice(col("__w"), s, lit(chunkTokens)))).as(Seq("chunk_id", "__c")): _*)
      .select(col(idCol) +: carried :+ col("chunk_id").cast("long").as("chunk_id") :+
        array_join(col("__c"), " ").as("chunk_text") :+
        size(col("__c")).cast("long").as("n_tokens"): _*)
  }

  /** Corpus-level heavy-hitter tokens: every token with frequency
    * > 1/thetaDen of all tokens, EXACTLY — via the two-pass
    * candidates-then-verify shape. Pass 1 runs the
    * [[graft.functions.MisraGriesAggregator]] sketch (shuffles `capacity`
    * entries per partition, never the vocabulary); its survivors are a
    * guaranteed superset of the θ-heavy items when
    * capacity + 1 ≥ thetaDen (enforced). Pass 2 exact-counts only the
    * ≤ capacity candidates (scan + tiny groupBy) and applies the
    * threshold as an integer compare (cnt·thetaDen > n — no float
    * boundary). The candidate set is driver-collected by construction
    * (bounded by `capacity`, like the cluster-count boundary in
    * nearDupClusters). Output: (term, cnt, frac), frac = one exact IEEE
    * division. */
  def heavyHitterTokens(docs: DataFrame, textCol: String,
                        thetaDen: Int, capacity: Int): DataFrame = {
    require(capacity + 1 >= thetaDen,
      s"superset guarantee needs capacity+1 >= thetaDen, got ($capacity, $thetaDen)")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(
      explode(TextFns.tokens(lower(col(textCol)))).as("term"))
    val mg = new graft.functions.MisraGriesAggregator(capacity)
    val candidates = toks.as[String].select(mg.toColumn).head().keys.toSeq
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "term string, cnt bigint, frac double"))
    if (candidates.isEmpty) empty
    else {
      val total = toks.agg(count(lit(1)).as("__n"))
      toks.filter(col("term").isin(candidates: _*))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(total))
        .filter(col("cnt") * thetaDen > col("__n"))
        .select(col("term"), col("cnt"),
          (col("cnt").cast("double") / col("__n")).as("frac"))
    }
  }
}
