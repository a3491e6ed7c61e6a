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
  * corpus-sized aggregation builds (word, count); the histogram (bounded
  * by |distinct words| and the [[vocabCap]] ceiling, not |tokens|)
  * collects to the driver once and every merge round runs there. Words
  * travel as US-separated symbol strings, and a merge is applied with two
  * sequential `replace` passes — leftmost non-overlapping replace applied
  * twice IS greedy left-to-right pair merging (pass 1 can only skip an
  * occurrence whose left separator was consumed by the preceding match;
  * such skips are never adjacent, so pass 2 catches them all).
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

  /** Histogram ceiling for the driver-side merge loop: the top 2²⁰
    * words by weight (deterministic (cnt DESC, w) selection — below the
    * cap, every test SF, the sample IS the exact histogram). Real BPE
    * trainers cap the training vocabulary the same way; tens of MB of
    * strings at most. */
  val vocabCap: Int = 1 << 20

  /** Learn the merge table: (rank, l_sym, r_sym, merged, pair_cnt), rank
    * 1..numMerges in learned order. Stops early if the vocab runs out of
    * adjacent pairs.
    *
    * ONE corpus-scale job builds the word histogram; the merge rounds
    * run ON THE DRIVER over the collected (word, count) array — the
    * [[Similarity.ivfCentroidsQ]] move: a distributed job per round was
    * all scheduling (pair explode + groupBy + TakeOrdered + a persist
    * swap per merge) for arithmetic over a bounded histogram that the
    * driver does in microseconds. Identical semantics, replayed by the
    * same oracle: weighted adjacent-pair counts, argmax with
    * (count DESC, l ASC, r ASC) tie-break (symbols are printable ASCII,
    * so Java string order == UTF8 binary order), and greedy
    * left-to-right merge application via two leftmost-non-overlapping
    * literal replaces (String.replace == Spark's `replace`; see object
    * doc for why two passes suffice). */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab: Array[(String, Long)] = vocabInit(docs, textCol)
      .orderBy(desc("cnt"), col("w")).limit(vocabCap)
      .as[(String, Long)].collect()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var exhausted = false
    for (i <- 1 to numMerges if !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (w, cnt) =>
        val syms = w.split(SEP).filter(_.nonEmpty)
        var j = 0
        while (j + 1 < syms.length) {
          val k = (syms(j), syms(j + 1))
          counts.update(k, counts.getOrElse(k, 0L) + cnt)
          j += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), c) = counts.reduce { (a, b) =>
          val ((al, ar), ac) = a; val ((bl, br), bc) = b
          if (ac > bc) a
          else if (bc > ac) b
          else if (al < bl || (al == bl && ar <= br)) a
          else b
        }
        merges += ((i.toLong, l, r, l + r, c))
        val pat = SEP + l + SEP + r + SEP
        val rep = SEP + l + r + SEP
        vocab = vocab.map { case (w, cnt) =>
          (w.replace(pat, rep).replace(pat, rep), cnt)
        }
      }
    }
    merges.toSeq.toDF("rank", "l_sym", "r_sym", "merged", "pair_cnt")
  }

  /** ENCODE with a learned merge table — the inference half of
    * [[learnMerges]], and the operation every packing/pricing pass runs
    * over the whole corpus: per-document exact BPE token counts.
    *
    * Scale shape: the merge table is a MODEL (a few dozen string pairs),
    * so it inlines into the plan as a literal `replace` chain and the
    * entire encode is ONE map-side projection over the scan — no
    * explode, no shuffle, no join, nothing driver-side. Each document's
    * printable-ASCII words concatenate into a single US-separated symbol
    * string (words end/start with a DOUBLE separator, which no merge
    * pattern `SEP l SEP r SEP` can cross, so one string-level pass IS
    * per-word encoding), then every merge applies in rank order with the
    * same two leftmost-non-overlapping replaces the trainer used.
    * Counting needs no tokenization: symbols = separators − words.
    *
    * Output per document: `n_words` (printable-ASCII words), `n_chars`
    * (their total characters — invariant under merges), `n_tokens`
    * (BPE subwords after all merges; == n_chars at zero merges). */
  def encodeStats(docs: DataFrame, textCol: String, idCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val words = filter(TextFns.tokens(col(textCol)), w => w.rlike("^[!-~]+$"))
    val seq0: Column = array_join(
      transform(words, w => concat(lit(SEP), regexp_replace(w, "(.)", "$1" + SEP))), "")
    val seqN = merges.foldLeft(seq0) { case (c, (l, r)) =>
      val pat = lit(SEP + l + SEP + r + SEP)
      val rep = lit(SEP + l + r + SEP)
      replace(replace(c, pat, rep), pat, rep)
    }
    val nWords = size(words).cast("long")
    val chars = length(replace(seqN, lit(SEP), lit("")))
    val seps = length(seqN) - chars
    docs.select(
      col(idCol),
      nWords.as("n_words"),
      chars.cast("long").as("n_chars"),
      (seps - nWords).cast("long").as("n_tokens"))
  }

  /** Train-then-encode convenience: learn `numMerges` merges from the
    * corpus ([[learnMerges]] — one corpus-scale histogram job + driver
    * rounds), collect the bounded merge table, and encode the same
    * corpus with it ([[encodeStats]] — one map-side pass). */
  def trainAndEncode(docs: DataFrame, textCol: String, idCol: String,
                     numMerges: Int): DataFrame = {
    val merges = learnMerges(docs, textCol, numMerges)
      .orderBy("rank")
      .select("l_sym", "r_sym")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSeq
    encodeStats(docs, textCol, idCol, merges)
  }
}
