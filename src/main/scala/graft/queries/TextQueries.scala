package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.sql
import graft.functions.TextFns
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** LLM-data-pipeline text surface: analysis signals, fingerprinting, and
  * the dedup family over the `documents` table. */
object TextQueries {

  private val stops = Seq("the", "a", "of", "and", "in", "to")
  private val stopsSqlList = stops.map(s => s"'$s'").mkString("[", ", ", "]")

  /** q_text_subword's fixed vocabulary: whole words from the synthetic
    * lexicon, sub-word pieces that partially cover the rest, and a few
    * single chars — ids are vocab positions; everything else is unk (-1).
    * Alternation-safe by construction (alphanumeric + space only). */
  private val SubwordVocab: Seq[String] = Seq(
    "table", "value", "spark", "batch", "merge", "query", "scan", "hash",
    "part", "key", "agg", "row", "the", "er", "in", "an", "st", "ow",
    "a", "e", "t", "s", " ")

  /** Shared oracle CTE chain: shingles → J≥0.5 pairs → symmetrized
    * edges → recursive transitive closure → min-label clusters. Every
    * multiply-referenced CTE is MATERIALIZED (ex self-joins; p feeds
    * both edge branches — DuckDB 1.0 would inline the quadratic join
    * twice). Pairs come from an INVERTED-INDEX join, not all-pairs:
    * shingles explode to (doc, gram) rows, the gram equi-join counts
    * common shingles per pair (lists are distinct, so COUNT(*) IS the
    * intersection size), and zero-overlap pairs — the n² bulk — never
    * materialize at all; they cannot reach J ≥ 0.5. Same result set,
    * ~5× less replica wall. Used by q_dedup_clusters and
    * q_dedup_keep_best. */
  private lazy val clusterOracleCtes: String =
    """WITH RECURSIVE sh AS MATERIALIZED (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 3),
      |                               i -> array_to_string(w[i:i+4], ' '))) AS s
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
      |  WHERE len(w) >= 5),
      |ex AS MATERIALIZED (
      |  SELECT doc_id, len(s) AS ns, unnest(s) AS g FROM sh),
      |p AS MATERIALIZED (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id, a.ns, b.ns
      |  HAVING CAST(COUNT(*) AS DOUBLE) / (a.ns + b.ns - COUNT(*)) >= 0.5),
      |edges AS MATERIALIZED (
      |  SELECT id_a AS src, id_b AS dst FROM p
      |  UNION ALL
      |  SELECT id_b AS src, id_a AS dst FROM p),
      |reach AS (
      |  SELECT src, src AS lbl FROM (SELECT DISTINCT src FROM edges) t
      |  UNION
      |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.src),
      |cl AS (SELECT src AS doc_id, MIN(lbl) AS cluster_id
      |       FROM reach GROUP BY src)""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // ── token counting + quality scoring (length / stopword signals)
    sql("q_text_stats",
      s"""SELECT doc_id,
         |       CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |       CAST(CEIL(octet_length(encode(text)) / 4.0) AS BIGINT) AS est_bpe_tokens,
         |       CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |                            t -> list_contains($stopsSqlList, t))) AS DOUBLE)
         |         / len(regexp_split_to_array(trim(text), '\\s+')) AS stop_ratio
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
          TextFns.tokenCount(col("text")).as("n_tokens"),
          TextFns.byteLength(col("text")).as("n_bytes"),
          TextFns.tokenEstimate(col("text")).as("est_bpe_tokens"),
          TextFns.stopwordRatio(col("text"), stops).as("stop_ratio"))
        .orderBy("doc_id")
    },

    // ── sentence segmentation (the preprocessing unit between whole-doc
    //    ops and token windows): split on terminal-punctuation runs +
    //    whitespace — a lookbehind-free pattern, so DuckDB's RE2 replays
    //    it verbatim; posexplode pins sentence ORDER, not just counts.
    sql("q_text_sentences",
      """WITH p AS (
        |  SELECT doc_id, replace(text, ' the ', '. ') AS text2
        |  FROM documents),
        |sp AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(text2, '[.!?]+\s+'),
        |                     x -> trim(x) <> '') AS ss
        |  FROM p)
        |SELECT doc_id, CAST(i - 1 AS BIGINT) AS sent_idx,
        |       ss[i] AS sentence,
        |       CAST(len(ss[i]) AS BIGINT) AS n_chars
        |FROM sp CROSS JOIN UNNEST(range(1, len(ss) + 1)) t(i)
        |ORDER BY doc_id, sent_idx""".stripMargin) { (s, d) =>
      // the synthetic corpus carries no punctuation — derive a punctuated
      // text IDENTICALLY in both engines (literal replace) so the split
      // is actually exercised, multi-sentence docs included
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.TextFns.sentences(
            expr("replace(text, ' the ', '. ')")).as("ss"))
        .select(col("doc_id"),
          posexplode(col("ss")).as(Seq("sent_idx", "sentence")))
        .select(col("doc_id"), col("sent_idx").cast("long").as("sent_idx"),
          col("sentence"), length(col("sentence")).cast("long").as("n_chars"))
        .orderBy("doc_id", "sent_idx")
    },

    // ── subword-regex token count (GPT-2-pre-tokenizer shape: letter
    //    runs | digit runs | any other non-space char) + punctuation
    //    density — the regex forms next to q_text_stats' whitespace and
    //    bytes/4 counts. \p{Punct} (Java) == [[:punct:]] (RE2): ASCII-only.
    sql("q_text_tokens",
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
        |       CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS BIGINT) AS n_punct,
        |       CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS DOUBLE)
        |         / NULLIF(length(regexp_replace(text, '\s+', '', 'g')), 0) AS punct_ratio
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
          TextFns.tokenCountRegex(col("text")).as("n_bpe_tokens"),
          TextFns.punctCount(col("text")).as("n_punct"),
          TextFns.punctRatio(col("text")).as("punct_ratio"))
        .orderBy("doc_id")
    },

    // ── greedy subword tokenization (native greedy_tokenize expression):
    //    longest-match segmentation against a fixed vocab — the
    //    WordPiece/BPE-inference algorithm a pipeline runs to price a
    //    corpus in tokens. Ground truth: greedy longest-match ==
    //    leftmost-FIRST regex alternation ordered longest-first, so the
    //    DuckDB oracle re-derives the segmentation with RE2 and checks
    //    counts, unknowns, and a position-weighted id sum (order-exact).
    sql("q_text_subword", {
      val alternation = SubwordVocab.sortBy(v => -v.length).mkString("|") + "|."
      val values = SubwordVocab.zipWithIndex
        .map { case (t, i) => s"('$t', $i)" }.mkString(", ")
      s"""WITH v(tok, id) AS (SELECT * FROM (VALUES $values)),
         |tok AS (SELECT doc_id, regexp_extract_all(text, '$alternation') AS ts FROM documents),
         |u AS (SELECT doc_id, unnest(ts) AS t, generate_subscripts(ts, 1) AS i FROM tok),
         |m AS (SELECT u.doc_id, u.i, COALESCE(v.id, -1) AS id FROM u LEFT JOIN v ON u.t = v.tok)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |       CAST(SUM(CASE WHEN id = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
         |       CAST(SUM(i * id) AS BIGINT) AS wsum
         |FROM m GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextFns.greedyTokenize(col("text"), SubwordVocab).as("__ids"))
        .select(col("doc_id"), size(col("__ids")).cast("long").as("n_tokens"),
          expr("""aggregate(__ids, named_struct('i', 0L, 'w', 0L, 'u', 0L),
                 |  (acc, x) -> named_struct(
                 |    'i', acc.i + 1L,
                 |    'w', acc.w + (acc.i + 1L) * x,
                 |    'u', acc.u + IF(x = -1L, 1L, 0L)))""".stripMargin).as("__a"))
        .select(col("doc_id"), col("n_tokens"),
          col("__a.u").as("n_unk"), col("__a.w").as("wsum"))
        .orderBy("doc_id")
    },

    // ── language-ID heuristic: marker-vocabulary argmax with deterministic
    //    priority tie-break (en > es > de > fr > zh), all-zero → 'und'
    sql("q_text_langid", {
      val scoreSql = TextFns.LangMarkers.map { case (lang, ms) =>
        val list = ms.map(m => s"'$m'").mkString("[", ", ", "]")
        s"CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> list_contains($list, t))) AS BIGINT) AS s_$lang"
      }.mkString(",\n       ")
      val langs = TextFns.LangMarkers.map(_._1)
      val best = langs.map(l => s"s_$l").mkString("GREATEST(", ", ", ")")
      val cases = langs.map(l => s"WHEN s_$l = $best THEN '$l'").mkString(" ")
      s"""WITH sc AS (SELECT doc_id, lang, $scoreSql FROM documents)
         |SELECT doc_id, lang,
         |       CASE WHEN $best = 0 THEN 'und' $cases ELSE 'und' END AS predicted
         |FROM sc ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"), col("lang"),
          TextFns.langId(col("text")).as("predicted"))
        .orderBy("doc_id")
    },

    // ── document fingerprint (rolling-hash family, md5 realization)
    sql("q_text_fingerprint",
      """SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextFns.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    // ── rolling k-gram fingerprint (winnowing family): min digest over
    //    16-char windows — edit-robust where the whole-doc digest is not
    sql("q_text_rolling_fp",
      """SELECT doc_id,
        |  CASE WHEN length(lower(regexp_replace(text, '\s+', ' ', 'g'))) >= 16 THEN
        |    list_min(list_transform(
        |      range(1, length(lower(regexp_replace(text, '\s+', ' ', 'g'))) - 14),
        |      i -> md5(substr(lower(regexp_replace(text, '\s+', ' ', 'g')), CAST(i AS INT), 16))))
        |  ELSE md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) END AS rfp
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          lower(regexp_replace(col("text"), "\\s+", " ")).as("norm_text"))
        .select(col("doc_id"),
          TextFns.rollingFingerprintOfNorm(col("norm_text"), 16).as("rfp"))
        .orderBy("doc_id")
    },

    // ── exact dedup over a corpus with planted duplicates (docs ≡ 0 mod 3
    //    re-appear under doc_id+100000): fingerprint groupBy, keep-first
    sql("q_dedup_exact",
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0)
        |SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp,
        |       MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
        |FROM corpus GROUP BY 1 ORDER BY keeper_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val corpus = docs.unionByName(
        docs.filter(col("doc_id") % 3 === 0)
          .withColumn("doc_id", col("doc_id") + 100000))
      Dedup.exactByFingerprint(corpus, "doc_id", "text")
        .orderBy("keeper_id")
    },

    // ── MinHash+LSH near-dup detection, exact-Jaccard verified ≥ 0.5.
    //    The oracle computes ground truth by brute force; LSH recall at
    //    J≥0.5 with 16×4 banding makes the engine output identical.
    sql("q_dedup_minhash", bruteForceOracle) { (s, d) =>
      Dedup.minHashNearDups(Tables.documents(s, d), "doc_id", "text",
          shingleSize = 5, numHashes = 64, bands = 16, tau = 0.5)
        .orderBy("id_a", "id_b")
    },

    // ── duplicated-span detection (exact-substring dedup, Lee et al.
    //    2022): maximal token intervals whose 8-grams also occur in
    //    another document — the per-doc trim list. The engine keys grams
    //    by xxhash64; the oracle keys the strings themselves, so oracle
    //    agreement doubles as the collision check.
    sql("q_dedup_spans",
      """WITH toks AS (
        |  SELECT doc_id, string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |         array_to_string(list_slice(t, CAST(i AS INT), CAST(i AS INT) + 7), ' ') AS gram
        |  FROM toks, UNNEST(range(1, len(t) - 6)) AS u(i)
        |  WHERE len(t) >= 8),
        |dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) > 1),
        |hits AS (SELECT g.doc_id, g.pos AS s, g.pos + 7 AS e FROM g JOIN dup USING (gram)),
        |isl AS (
        |  SELECT doc_id, s, e,
        |         CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY s
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
        |              THEN 1 ELSE 0 END AS brk
        |  FROM hits),
        |ids AS (SELECT doc_id, s, e, SUM(brk) OVER (PARTITION BY doc_id ORDER BY s) AS isle FROM isl)
        |SELECT doc_id, CAST(MIN(s) AS BIGINT) AS span_start, CAST(MAX(e) AS BIGINT) AS span_end
        |FROM ids GROUP BY doc_id, isle
        |ORDER BY doc_id, span_start""".stripMargin) { (s, d) =>
      Dedup.duplicateSpans(Tables.documents(s, d), "doc_id", "text", n = 8)
        .orderBy("doc_id", "span_start")
    },

    // ── n-gram Jaccard brute force over a bounded window (doc_id < 500 on
    //    both sides, so the pair count is scale-invariant): the exact
    //    baseline the LSH paths are measured against, as its own operator
    sql("q_dedup_ngram",
      """WITH sh AS MATERIALIZED (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
        |                               i -> array_to_string(w[i:i+2], ' '))) AS s
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
        |        WHERE doc_id < 500)
        |  WHERE len(w) >= 3),
        |p AS MATERIALIZED (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |           / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jac
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, jac FROM p WHERE jac >= 0.6 ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      Dedup.bruteForceJaccardPairs(
          Tables.documents(s, d).filter(col("doc_id") < 500),
          "doc_id", "text", shingleSize = 3, tau = 0.6)
        .orderBy("id_a", "id_b")
    },

    // ── SimHash near-dup path: banded shingle-simhash candidates, Hamming
    //    prefilter, exact verify. Shares minhash's brute-force ground
    //    truth: both pipelines report exactly the J≥0.5 pairs, by two
    //    different sketches. Candidate recall is corpus-measured (true
    //    pairs at Hamming ≤12 vs hammingMax=16, margin of 4 bits) and the
    //    pipeline is deterministic end-to-end, so the gate is stable.
    sql("q_dedup_simhash", bruteForceOracle) { (s, d) =>
      Dedup.simHashNearDups(Tables.documents(s, d), "doc_id", "text",
          shingleSize = 5, tau = 0.5)
        .orderBy("id_a", "id_b")
    },

    // ── near-dup clustering: connected components over the verified pair
    //    list → keeper (min doc id) per cluster member — the decision step
    //    of dedup. Oracle computes components by recursive-CTE transitive
    //    closure over the same brute-force pairs.
    sql("q_dedup_clusters",
      s"""$clusterOracleCtes
         |SELECT doc_id, cluster_id FROM cl ORDER BY doc_id""".stripMargin) { (s, d) =>
      val pairs = Dedup.minHashNearDups(Tables.documents(s, d), "doc_id", "text",
        shingleSize = 5, numHashes = 64, bands = 16, tau = 0.5)
      Dedup.nearDupClusters(pairs).orderBy("doc_id")
    },

    // ── quality-aware keeper selection (Dedup.keepBest): inside each
    //    near-dup cluster keep the highest-quality copy (word count as
    //    the integral quality score; ties → smallest id), not the
    //    min-id canonical — the decision a real curation pass ships.
    //    Oracle: the shared cluster CTEs + the same argmax window.
    sql("q_dedup_keep_best",
      s"""$clusterOracleCtes,
         |q AS (SELECT doc_id,
         |             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS quality
         |      FROM documents),
         |rk AS (SELECT cl.cluster_id, cl.doc_id, q.quality,
         |              row_number() OVER (PARTITION BY cl.cluster_id
         |                                 ORDER BY q.quality DESC, cl.doc_id) AS rn
         |       FROM cl JOIN q ON cl.doc_id = q.doc_id)
         |SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
         |       CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS keeper_id,
         |       CAST(MAX(CASE WHEN rn = 1 THEN quality END) AS BIGINT) AS keeper_quality
         |FROM rk GROUP BY cluster_id ORDER BY cluster_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minHashNearDups(docs, "doc_id", "text",
        shingleSize = 5, numHashes = 64, bands = 16, tau = 0.5)
      val quality = docs.select(col("doc_id"),
        TextFns.tokenCount(col("text")).as("quality"))
      Dedup.keepBest(Dedup.nearDupClusters(pairs), quality,
          "doc_id", "quality")
        .orderBy("cluster_id")
    },

    // ── BPE merge-table training (BpeTrain.learnMerges): the training is
    //    deterministic end-to-end (word histogram → weighted pair argmax
    //    with (cnt DESC, l, r) tie-break → greedy double-replace merge),
    //    so the oracle replays all rounds as unrolled CTEs — same
    //    chr(31)-delimited symbol strings, same replace-twice merge, same
    //    argmax. A wrong pair count, tie-break, or merge application in
    //    ANY round cascades into every later round and breaks the hash.
    sql("q_text_bpe_train", bpeReplaySql(6)) { (s, d) =>
      graft.operators.BpeTrain.learnMerges(Tables.documents(s, d), "text", 6)
        .orderBy("rank")
    },

    // ── BPE ENCODE (BpeTrain.trainAndEncode): the inference half — learn
    //    the 6-merge table, inline it as a literal replace chain, and
    //    count exact subword tokens per document in ONE map-side
    //    projection (no explode/shuffle/join; word boundaries are double
    //    separators no merge pattern can cross). The oracle re-derives
    //    the merge table with the shared training CTEs and replays the
    //    same replace chain per document — a wrong merge, ordering, or
    //    boundary rule breaks the hash.
    sql("q_text_bpe_encode", bpeEncodeSql(6)) { (s, d) =>
      graft.operators.BpeTrain.trainAndEncode(Tables.documents(s, d), "text", "doc_id", 6)
        .orderBy("doc_id")
    },

    // ── compression-ratio quality signal (Compressibility.deflateStats):
    //    deflate output size as a repetitiveness proxy (Gopher/C4-family
    //    gate). The fixture's four documents are closed-form (constant
    //    run, repeated sentence, LCG pseudo-random, repeated alphabet) so
    //    the oracle pins EXACT deflate byte counts — deterministic for
    //    zlib level 9 raw-deflate (verified byte-identical across two
    //    independent zlib builds); the spec additionally bounds the
    //    operator's behavior on the real documents table.
    sql("q_text_compress",
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |       CAST(raw_len AS BIGINT) AS raw_len,
        |       CAST(deflate_len AS BIGINT) AS deflate_len,
        |       CAST(ratio_pct AS BIGINT) AS ratio_pct
        |FROM (VALUES (1, 4096, 22, 0), (2, 2880, 66, 2),
        |             (3, 4096, 2481, 60), (4, 3700, 69, 1))
        |  AS t(doc_id, raw_len, deflate_len, ratio_pct)
        |ORDER BY doc_id""".stripMargin) { (s, _) =>
      import s.implicits._
      graft.operators.Compressibility
        .deflateStats(compressFixture(s), "doc_id", "text")
        .orderBy("doc_id")
    }
  )

  /** Closed-form compressibility fixture: four documents spanning the
    * ratio range from degenerate (one repeated byte) to incompressible
    * (LCG pseudo-random letters). Deterministic by construction. */
  private[graft] def compressFixture(
      s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val lcg = {
      val sb = new StringBuilder
      var x = 12345L
      var i = 0
      while (i < 4096) {
        x = (x * 1103515245L + 12345L) & 0x7fffffffL
        sb.append(('a' + (x % 26)).toChar)
        i += 1
      }
      sb.toString
    }
    Seq(
      (1L, "a" * 4096),
      (2L, "The quick brown fox jumps over the lazy dog. " * 64),
      (3L, lcg),
      (4L, "abcdefghijklmnopqrstuvwxyz0123456789 " * 100))
      .toDF("doc_id", "text")
  }

  // a def, not a val: the `queries` Seq above initializes first and
  // calls the SQL builders during object init — a val here would still
  // be null at that point
  private def bpeSep = "chr(31)"

  /** Shared training CTE chain (`toks`, `v0`, then per round i
    * `p_i`/`x_i`/`v_i`): the unrolled DuckDB replay of
    * [[graft.operators.BpeTrain.learnMerges]] — word histogram, weighted
    * pair argmax with (cnt DESC, l, r) tie-break, greedy double-replace
    * merge. Used by both the train oracle (reads the `x_i` picks) and
    * the encode oracle (re-applies the `x_i` picks to each document). */
  private def bpeTrainCtes(n: Int): String = {
    val sep = bpeSep
    def pairsOf(v: String) =
      s"""SELECT l, r, SUM(cnt) AS c FROM (
         |    SELECT unnest(syms[1:n-1]) AS l, unnest(syms[2:n]) AS r, cnt FROM (
         |      SELECT string_split(trim(w, $sep), $sep) AS syms,
         |             len(string_split(trim(w, $sep), $sep)) AS n, cnt
         |      FROM $v) s) q
         |  GROUP BY 1, 2""".stripMargin
    val rounds = (1 to n).map { i =>
      val prev = if (i == 1) "v0" else s"v${i - 1}"
      val merge = s"$sep||x.l||$sep||x.r||$sep"
      val into = s"$sep||x.l||x.r||$sep"
      s"""p$i AS (
         |  ${pairsOf(prev)}),
         |x$i AS (SELECT l, r, CAST(c AS BIGINT) AS c FROM p$i
         |        ORDER BY c DESC, l, r LIMIT 1),
         |v$i AS (
         |  SELECT replace(replace(v.w, ${merge.replace("x.", s"x$i.")},
         |                 ${into.replace("x.", s"x$i.")}),
         |                 ${merge.replace("x.", s"x$i.")},
         |                 ${into.replace("x.", s"x$i.")}) AS w, v.cnt
         |  FROM $prev v CROSS JOIN x$i)""".stripMargin
    }.mkString(",\n")
    s"""toks AS (
       |  SELECT t, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
       |    FROM documents) u
       |  WHERE regexp_matches(t, '^[!-~]+${"$"}') GROUP BY t),
       |v0 AS (
       |  SELECT $sep || regexp_replace(t, '(.)', '\\1' || $sep, 'g') AS w, cnt
       |  FROM toks),
       |$rounds""".stripMargin
  }

  /** Train oracle: the `x_i` picks of [[bpeTrainCtes]] as the merge
    * table rows. */
  private def bpeReplaySql(n: Int): String = {
    val out = (1 to n).map(i =>
      s"SELECT CAST($i AS BIGINT) AS rank, l AS l_sym, r AS r_sym, " +
        s"l||r AS merged, c AS pair_cnt FROM x$i").mkString("\n  UNION ALL\n  ")
    s"""WITH ${bpeTrainCtes(n)}
       |SELECT * FROM (
       |  $out) ORDER BY rank""".stripMargin
  }

  /** Encode oracle: re-derive the merge table via [[bpeTrainCtes]], then
    * replay [[graft.operators.BpeTrain.encodeStats]] — each document's
    * printable words concatenate into one SEP-delimited symbol string
    * (double separator at word boundaries, uncrossable by any merge
    * pattern) and every `x_i` pick applies in rank order with the same
    * double replace; token counts fall out of separator arithmetic. */
  private def bpeEncodeSql(n: Int): String = {
    val sep = bpeSep
    val enc = (1 to n).map { i =>
      val prev = if (i == 1) "e0" else s"e${i - 1}"
      val merge = s"$sep||x$i.l||$sep||x$i.r||$sep"
      val into = s"$sep||x$i.l||x$i.r||$sep"
      s"""e$i AS (
         |  SELECT doc_id, n_words,
         |         replace(replace(e.s, $merge, $into), $merge, $into) AS s
         |  FROM $prev e CROSS JOIN x$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${bpeTrainCtes(n)},
       |e0 AS (
       |  SELECT doc_id, CAST(len(wl) AS BIGINT) AS n_words,
       |         array_to_string(list_transform(wl,
       |           t -> $sep || regexp_replace(t, '(.)', '\\1' || $sep, 'g')), '') AS s
       |  FROM (SELECT doc_id,
       |               list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |                           t -> regexp_matches(t, '^[!-~]+${"$"}')) AS wl
       |        FROM documents)),
       |$enc
       |SELECT doc_id, n_words,
       |       CAST(length(replace(s, $sep, '')) AS BIGINT) AS n_chars,
       |       CAST(length(s) - length(replace(s, $sep, '')) - n_words AS BIGINT) AS n_tokens
       |FROM e$n ORDER BY doc_id""".stripMargin
  }

  /** Exact 5-token-shingle Jaccard pairs at J≥0.5 — the ground truth
    * both LSH near-dup pipelines (minhash, simhash) must reproduce
    * exactly. Inverted-index join, not all-pairs: zero-overlap pairs
    * (the n² bulk) never materialize and cannot reach the threshold, so
    * the result set is identical (same rewrite as the cluster CTEs). */
  private lazy val bruteForceOracle: String =
    """WITH sh AS MATERIALIZED (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 3),
      |                               i -> array_to_string(w[i:i+4], ' '))) AS s
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
      |  WHERE len(w) >= 5),
      |ex AS MATERIALIZED (
      |  SELECT doc_id, len(s) AS ns, unnest(s) AS g FROM sh),
      |p AS MATERIALIZED (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |         CAST(COUNT(*) AS DOUBLE) / (a.ns + b.ns - COUNT(*)) AS jac
      |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id, a.ns, b.ns)
      |SELECT id_a, id_b, jac FROM p WHERE jac >= 0.5 ORDER BY id_a, id_b""".stripMargin
}
