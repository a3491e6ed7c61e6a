package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar layer for the LLM-data-pipeline surface: tokenizing,
  * shingling, quality signals, language-ID heuristics, fingerprinting. All
  * pure Column expressions (codegen-friendly, no UDFs) so they survive
  * whole-stage codegen on a 100 TB scan.
  */
object TextFns {

  /** Whitespace tokenizer — the baseline unit for every op below. Input is
    * trimmed first: split("\\s+") on leading whitespace yields a phantom
    * empty first token that would skew every count/ratio built on top. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** UTF-8 byte length (matches DuckDB octet_length(encode(...))). */
  def byteLength(c: Column): Column = octet_length(c).cast("long")

  /** BPE-ish token estimate: bytes/4 rounded up — the standard ~4 bytes per
    * subword heuristic; deterministic and SQL-expressible. */
  def tokenEstimate(c: Column): Column =
    ceil(octet_length(c) / lit(4.0)).cast("long")

  /** Fraction of tokens found in `stopwords` (quality signal). */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column = {
    val stops = array(stopwords.map(lit): _*)
    val hits = size(filter(tokens(c), t => array_contains(stops, t)))
    hits.cast("double") / size(tokens(c))
  }

  /** Mean token length in bytes (quality signal: gibberish skews long). */
  def meanTokenLen(c: Column): Column = {
    val ts = tokens(c)
    when(size(ts) > 0,
      aggregate(ts, lit(0L), (acc, t) => acc + octet_length(t))
        .cast("double") / size(ts))
      .otherwise(lit(0.0))
  }

  /** Word n-gram shingles ("a b c d", n=2 → ["a b", "b c", "c d"]),
    * de-duplicated — the unit for MinHash/Jaccard near-dup detection. */
  def shingles(c: Column, n: Int): Column = {
    val ws = tokens(c)
    array_distinct(
      when(size(ws) >= n,
        transform(sequence(lit(1), size(ws) - (n - 1)),
          i => array_join(slice(ws, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>")))
  }

  /** Language-ID marker vocabularies (tiny n-gram/stopword heuristic). The
    * priority order below is the deterministic tie-break. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "los", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langScore(c: Column, markers: Seq[String]): Column = {
    val ms = array(markers.map(lit): _*)
    size(filter(tokens(c), t => array_contains(ms, t))).cast("long")
  }

  /** Predicted language: highest marker count wins, ties broken by the
    * LangMarkers order, all-zero → 'und'. */
  def langId(c: Column): Column = {
    val scores = LangMarkers.map { case (lang, ms) => lang -> langScore(c, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best === 0, lit("und"))) { case (acc, (lang, sc)) =>
      acc.when(sc === best, lit(lang))
    }.otherwise(lit("und"))
  }

  /** Document fingerprint: md5 over whitespace-collapsed lowercase text —
    * the exact-dedup key (reference dedups raw rows; at 100 TB a 16-byte
    * digest groups without shuffling full documents). */
  def fingerprint(c: Column): Column =
    md5(lower(regexp_replace(c, "\\s+", " ")).cast("binary"))
}
