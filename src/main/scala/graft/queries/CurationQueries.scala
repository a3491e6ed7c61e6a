package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.sql
import graft.functions.TextFns
import graft.operators.{Curation, Dedup, Sampling}
import org.apache.spark.sql.functions._

/** Corpus-curation wave of the LLM-data-pipeline surface (engine-added,
  * builder brief): benchmark decontamination, repetition signals, PII
  * scrubbing, incremental dedup against an existing corpus, deterministic
  * shard export + sequence packing, and temperature resampling. Every
  * query is DuckDB-oracled on the `documents` table; synthetic PII /
  * batch rows are constructed identically on both sides so the check
  * covers the operator, not the fixture.
  */
object CurationQueries {

  /** first-8-hex-chars-of-md5 bucket, DuckDB side (mirror of
    * Sampling.hashBucket). */
  private def bucketSql(id: String, buckets: Int = 10000) =
    s"CAST(('0x' || substr(md5(CAST($id AS VARCHAR)), 1, 8)) AS BIGINT) % $buckets"

  /** DuckDB word-5-gram shingle list of `w` (an already-split token
    * array) — mirror of TextFns.shingles(_, 5). */
  private val shingle5Sql =
    "list_distinct(list_transform(range(1, len(w) - 3), i -> array_to_string(w[i:i+4], ' ')))"

  /** The BM25 replay CTE chain, terminating in `bm25(doc_id, score_q,
    * n_terms)` — the top-25 for terms [vector, stream, merge] at
    * k1=1.25, b=0.75. Shared by q_search_bm25 and (as the lexical leg)
    * q_search_hybrid in AnnQueries. */
  private[queries] val bm25Ctes: String =
    """toks AS (
      |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ts
      |  FROM documents),
      |d AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl FROM toks),
      |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |                 CAST(CAST(SUM(dl) AS BIGINT) AS DOUBLE) / COUNT(*) AS avgdl
      |          FROM d),
      |tf AS (SELECT doc_id, term,
      |              CAST(len(list_filter(ts, x -> x = term)) AS BIGINT) AS tf
      |       FROM toks, (SELECT unnest(['vector', 'stream', 'merge']) AS term)),
      |m AS (SELECT * FROM tf WHERE tf > 0),
      |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS dfr FROM m GROUP BY term),
      |sc AS (SELECT m.doc_id,
      |         CAST(FLOOR((n_docs - dfr + 0.5) / (dfr + 0.5)
      |              * (tf * 2.25) / (tf + 1.25 * (0.25 + 0.75 * dl / avgdl))
      |              * 1000000.0) AS BIGINT) AS sq
      |       FROM m JOIN df USING (term) JOIN d USING (doc_id) CROSS JOIN stats),
      |bm25 AS (SELECT doc_id, CAST(SUM(sq) AS BIGINT) AS score_q,
      |                CAST(COUNT(*) AS BIGINT) AS n_terms
      |         FROM sc GROUP BY doc_id ORDER BY score_q DESC, doc_id LIMIT 25)""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // ── benchmark decontamination: training docs sharing any 5-gram with
    //    the eval split (doc_id % 50 = 0 plays the benchmark)
    sql("q_text_decontaminate",
      s"""WITH ev AS (
         |  SELECT DISTINCT unnest($shingle5Sql) AS sh
         |  FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS w
         |        FROM documents WHERE doc_id % 50 = 0)
         |  WHERE len(w) >= 5),
         |tr AS (
         |  SELECT doc_id, unnest($shingle5Sql) AS sh
         |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
         |        FROM documents WHERE doc_id % 50 <> 0)
         |  WHERE len(w) >= 5)
         |SELECT tr.doc_id, CAST(COUNT(DISTINCT tr.sh) AS BIGINT) AS n_hit_shingles
         |FROM tr JOIN ev USING (sh)
         |GROUP BY tr.doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      Curation.decontaminate(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", shingleSize = 5)
        .orderBy("doc_id")
    },

    // ── k-anonymity: customers whose (nation, segment) combination has
    //    fewer than 10 peers are re-identifiable and marked suppress —
    //    the release screen after PII redaction
    sql("q_privacy_kanon",
      """WITH g AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_n
        |           FROM customer GROUP BY 1, 2)
        |SELECT c.c_custkey, c.c_nationkey, c.c_mktsegment, g.group_n,
        |       CASE WHEN g.group_n < 10 THEN 'suppress' ELSE 'keep' END AS action
        |FROM customer c JOIN g USING (c_nationkey, c_mktsegment)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Curation.kAnonymity(
          Tables.customer(s, d).select("c_custkey", "c_nationkey", "c_mktsegment"),
          Seq("c_nationkey", "c_mktsegment"), k = 10)
        .select("c_custkey", "c_nationkey", "c_mktsegment", "group_n", "action")
        .orderBy("c_custkey")
    },

    // ── l-diversity screen (Curation.lDiversity): k-anonymity's stronger
    //    sibling — a large-enough group still leaks if everyone in it
    //    shares the sensitive value (homogeneity attack). Sensitive =
    //    account-balance band; groups with < 3 distinct bands suppress.
    sql("q_privacy_ldiv",
      """WITH s AS (SELECT c_custkey, c_nationkey, c_mktsegment,
        |                  CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS sens
        |           FROM customer),
        |g AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_n,
        |             COUNT(DISTINCT sens) AS n_sensitive
        |      FROM s GROUP BY 1, 2)
        |SELECT s.c_custkey, s.c_nationkey, s.c_mktsegment,
        |       g.group_n, g.n_sensitive,
        |       CASE WHEN g.n_sensitive < 3 THEN 'suppress' ELSE 'keep' END AS action
        |FROM s JOIN g USING (c_nationkey, c_mktsegment)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val src = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 2000).cast("long").as("sens"))
      Curation.lDiversity(src, Seq("c_nationkey", "c_mktsegment"), "sens", l = 3)
        .select("c_custkey", "c_nationkey", "c_mktsegment",
          "group_n", "n_sensitive", "action")
        .orderBy("c_custkey")
    },

    // ── deterministic PII tokenization (Curation.tokenizeColumns): the
    //    treatment between redaction and raw — sha2(pepper ‖ value)
    //    preserves joinability and frequency analysis while the raw
    //    value never leaves the scan; rotate the pepper, rotate every
    //    token. Pure scan-side projection.
    sql("q_privacy_tokenize",
      """SELECT c_custkey,
        |       sha256('graft-pepper-1' || c_name) AS c_name,
        |       c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      graft.operators.Curation.tokenizeColumns(
          Tables.customer(s, d).select("c_custkey", "c_name", "c_mktsegment"),
          Seq("c_name"), pepper = "graft-pepper-1")
        .orderBy("c_custkey")
    },

    // ── format-preserving pseudonymization (Curation.pseudonymizeIds):
    //    user ids permute through a 4-round Feistel network — still
    //    numeric, still joinable, reversible with the key, rotated by
    //    re-keying. All 30-bit mask/xor/shift/multiply arithmetic, so
    //    the oracle unrolls the identical rounds in SQL; per-user event
    //    counts prove the mapping is applied consistently (same pseudo
    //    id aggregates the same user).
    sql("q_privacy_fpe",
      """WITH u AS (SELECT user_id AS x, CAST(COUNT(*) AS BIGINT) AS n_events
        |           FROM events GROUP BY 1),
        |f0 AS (SELECT n_events, (x >> 30) & 1073741823 AS l,
        |              x & 1073741823 AS r FROM u),
        |f1 AS (SELECT n_events, r AS l,
        |              xor(l, xor((r * 40503 + 630408902) & 1073741823, r >> 15)) AS r
        |       FROM f0),
        |f2 AS (SELECT n_events, r AS l,
        |              xor(l, xor((r * 40503 + 63619191) & 1073741823, r >> 15)) AS r
        |       FROM f1),
        |f3 AS (SELECT n_events, r AS l,
        |              xor(l, xor((r * 40503 + 570571304) & 1073741823, r >> 15)) AS r
        |       FROM f2),
        |f4 AS (SELECT n_events, r AS l,
        |              xor(l, xor((r * 40503 + 3781593) & 1073741823, r >> 15)) AS r
        |       FROM f3)
        |SELECT (l << 30) + r AS pseudo_id, n_events
        |FROM f4 ORDER BY n_events DESC, pseudo_id LIMIT 32""".stripMargin) { (s, d) =>
      graft.operators.Curation.pseudonymizeIds(
          Tables.events(s, d).select("user_id", "event_id"), Seq("user_id"))
        .groupBy(col("user_id").as("pseudo_id"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy(desc("n_events"), col("pseudo_id"))
        .limit(32)
    },

    // ── referential-integrity contract (Contracts.foreignKey): orphan
    //    fact rows counted by one broadcast left-anti join — the
    //    two-table expectation the single-frame contract rules can't
    //    express. One clean check (orders → customer holds by
    //    construction) and one with planted orphans that must be counted
    //    exactly.
    sql("q_contract_fk",
      """WITH clean AS (
        |  SELECT COUNT(*) AS n_rows,
        |         SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS v
        |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
        |plant AS (
        |  SELECT COUNT(*) AS n_rows,
        |         SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS v
        |  FROM (SELECT CASE WHEN o_orderkey % 100 = 0
        |                    THEN o_custkey + 2000000 ELSE o_custkey END AS k
        |        FROM orders) o
        |  LEFT JOIN customer c ON o.k = c.c_custkey)
        |SELECT * FROM (
        |  SELECT 'foreign_key(k -> c_custkey)' AS rule, n_rows,
        |         CAST(v AS BIGINT) AS n_violations,
        |         CAST(v = 0 AS BIGINT) AS pass FROM plant
        |  UNION ALL
        |  SELECT 'foreign_key(o_custkey -> c_custkey)', n_rows,
        |         CAST(v AS BIGINT), CAST(v = 0 AS BIGINT) FROM clean)
        |ORDER BY rule""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d)
      val cust = Tables.customer(s, d)
      val planted = orders.select(
        when(col("o_orderkey") % 100 === 0, col("o_custkey") + 2000000L)
          .otherwise(col("o_custkey")).as("k"))
      graft.operators.Contracts.foreignKey(planted, "k", cust, "c_custkey")
        .unionByName(graft.operators.Contracts.foreignKey(
          orders, "o_custkey", cust, "c_custkey"))
        .orderBy("rule")
    },

    // ── bloom-prefiltered decontamination: IDENTICAL contract and oracle
    //    as q_text_decontaminate — the broadcast bloom probe
    //    (might_contain, scan-side) only thins the gram stream before the
    //    exact verify join, it never changes the answer. The manual
    //    runtime-filter pattern: at 100 TB the join INPUT is the cost.
    sql("q_text_decontaminate_bloom",
      s"""WITH ev AS (
         |  SELECT DISTINCT unnest($shingle5Sql) AS sh
         |  FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS w
         |        FROM documents WHERE doc_id % 50 = 0)
         |  WHERE len(w) >= 5),
         |tr AS (
         |  SELECT doc_id, unnest($shingle5Sql) AS sh
         |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
         |        FROM documents WHERE doc_id % 50 <> 0)
         |  WHERE len(w) >= 5)
         |SELECT tr.doc_id, CAST(COUNT(DISTINCT tr.sh) AS BIGINT) AS n_hit_shingles
         |FROM tr JOIN ev USING (sh)
         |GROUP BY tr.doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      Curation.decontaminateBloomExact(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", shingleSize = 5)
        .orderBy("doc_id")
    },

    // ── Gopher-family repetition signals: repeated-bigram fraction +
    //    top-token share
    sql("q_text_repetition",
      """WITH base AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |sig AS (
        |  SELECT doc_id, CAST(len(w) AS BIGINT) AS total_tokens,
        |         CASE WHEN len(w) >= 2 THEN
        |           1.0 - CAST(len(list_distinct(list_transform(range(1, len(w)),
        |                   i -> array_to_string(w[i:i+1], ' ')))) AS DOUBLE) / (len(w) - 1)
        |         ELSE 0.0 END AS dup_2gram_frac
        |  FROM base),
        |cnt AS (
        |  SELECT doc_id, t, COUNT(*) AS c
        |  FROM (SELECT doc_id, unnest(w) AS t FROM base) GROUP BY 1, 2),
        |top AS (
        |  SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_token_frac
        |  FROM cnt GROUP BY 1)
        |SELECT s.doc_id, s.total_tokens, s.dup_2gram_frac, t.top_token_frac
        |FROM sig s JOIN top t USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, d) =>
      Curation.repetitionSignals(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")
    },

    // ── PII scrub: plant synthetic emails/phones/IPs deterministically,
    //    then count and redact them. Output is (counts, digest of the
    //    redacted text) — the digest proves the replacement spans match
    //    byte-for-byte, not just the counts.
    sql("q_text_pii", {
      // the runtime regex strings drop into single-quoted DuckDB literals
      // unchanged (DuckDB does not process backslash escapes there)
      val email = TextFns.EmailRegex
      val phone = TextFns.PhoneRegex
      val ip = TextFns.Ipv4Regex
      s"""WITH pii AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 7 = 0 THEN
         |           text || ' contact u' || CAST(doc_id AS VARCHAR)
         |                || '@mail.example.com or ring +44 20 7946 '
         |                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |         WHEN doc_id % 11 = 0 THEN
         |           text || ' served from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
         |                || '.' || CAST(doc_id % 100 AS VARCHAR)
         |         ELSE text END AS t
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(t, '$phone')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(t, '$ip')) AS BIGINT) AS n_ips,
         |  md5(regexp_replace(regexp_replace(regexp_replace(t,
         |        '$email', '<EMAIL>', 'g'),
         |        '$phone', '<PHONE>', 'g'),
         |        '$ip', '<IP>', 'g')) AS red_fp
         |FROM pii ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val withPii = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" contact u"), col("doc_id").cast("string"),
              lit("@mail.example.com or ring +44 20 7946 "),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .when(col("doc_id") % 11 === 0,
            concat(col("text"), lit(" served from 10.0."),
              (col("doc_id") % 256).cast("string"), lit("."),
              (col("doc_id") % 100).cast("string")))
          .otherwise(col("text")).as("t"))
      withPii.select(col("doc_id"),
          TextFns.emailCount(col("t")).as("n_emails"),
          TextFns.phoneCount(col("t")).as("n_phones"),
          TextFns.ipv4Count(col("t")).as("n_ips"),
          md5(TextFns.redactPii(col("t")).cast("binary")).as("red_fp"))
        .orderBy("doc_id")
    },

    // ── incremental dedup: a new crawl batch (some rows copies of the
    //    corpus, some genuinely novel) admitted via fingerprint anti-join —
    //    only the novel rows survive
    sql("q_dedup_incremental",
      """WITH corpus AS (
        |  SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp FROM documents),
        |batch AS (
        |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 200000 AS doc_id,
        |         text || ' batch-novel payload ' || CAST(doc_id AS VARCHAR) AS text
        |  FROM documents WHERE doc_id % 5 = 0),
        |bfp AS (
        |  SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp FROM batch)
        |SELECT doc_id, fp FROM bfp
        |WHERE fp NOT IN (SELECT fp FROM corpus) ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val batch = docs.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat(col("text"), lit(" batch-novel payload "),
              col("doc_id").cast("string")).as("text")))
      Dedup.incrementalNew(batch, docs, "doc_id", "text")
        .orderBy("doc_id")
    },

    // ── incremental NEAR-dup admission: the corpus is LSH-indexed once
    //    (band hashes + shingle sets as parquet); the new batch joins the
    //    index, never the corpus text. Oracle = brute-force cross Jaccard,
    //    exact because candidates are exact-verified (same recall argument
    //    as q_dedup_minhash: true pairs here are planted near-copies)
    sql("q_dedup_incremental_lsh",
      s"""WITH sh AS (
         |  SELECT doc_id, $shingle5Sql AS s
         |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
         |        FROM documents)
         |  WHERE len(w) >= 5),
         |ex AS MATERIALIZED (
         |  SELECT doc_id, len(s) AS ns, unnest(s) AS g FROM sh),
         |p AS (
         |  SELECT b.doc_id AS id_new, c.doc_id AS id_corpus,
         |         CAST(COUNT(*) AS DOUBLE) / (b.ns + c.ns - COUNT(*)) AS jac
         |  FROM ex b JOIN ex c ON b.g = c.g
         |   AND b.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
         |  GROUP BY b.doc_id, c.doc_id, b.ns, c.ns)
         |SELECT id_new, id_corpus, jac FROM p WHERE jac >= 0.5
         |ORDER BY id_new, id_corpus""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val sfKey = d.replaceAll("[^A-Za-z0-9]", "_")
      // index dir keyed by sf AND sketch params: built once, reused across
      // sessions (the production shape — the recurring cost is the batch
      // lookup, not the corpus index; same discipline as
      // ScaleQueries.partitionedEventsDir). A param change re-keys the dir.
      val idxDir = s"${sys.props("user.dir")}/target/minhash_index_${sfKey}_s5h64b16"
      graft.DerivedCache.ensure(new java.io.File(idxDir),
          Seq(new java.io.File(s"$d/documents.parquet")), "shingles/_SUCCESS") {
        Dedup.writeMinHashIndex(docs.filter(col("doc_id") % 10 =!= 0),
          "doc_id", "text", shingleSize = 5, numHashes = 64, bands = 16, idxDir)
      }
      Dedup.incrementalNearDups(docs.filter(col("doc_id") % 10 === 0), idxDir,
          "doc_id", "text", shingleSize = 5, numHashes = 64, bands = 16, tau = 0.5)
        .orderBy("id_new", "id_corpus")
    },

    // ── deterministic shard export: content-hash shard id, write as
    //    shard-partitioned parquet (a real sink), read back and account —
    //    per-shard doc and byte totals prove the export is balanced and
    //    complete
    sql("q_export_shards",
      s"""SELECT ${bucketSql("doc_id", 8)} AS shard_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS n_bytes
         |FROM documents GROUP BY 1 ORDER BY shard_id""".stripMargin) { (s, d) =>
      val out = graft.Scratch.dir("/root/repo/target/tmp/shard_export")
      new java.io.File(out).getParentFile.mkdirs()
      Tables.documents(s, d)
        .withColumn("shard_id", Sampling.shardId(col("doc_id"), 8))
        .write.mode("overwrite").partitionBy("shard_id").parquet(out)
      s.read.parquet(out)
        .groupBy(col("shard_id").cast("long").as("shard_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFns.byteLength(col("text"))).as("n_bytes"))
        .orderBy("shard_id")
    },

    // ── sequence packing: shard → deterministic order → cut a bin every
    //    4096 cumulative (estimated) tokens. Chunk-boundary packing: the
    //    trainer concatenates each bin downstream.
    sql("q_export_packing",
      s"""WITH t AS (
         |  SELECT doc_id, ${bucketSql("doc_id", 8)} AS shard_id,
         |         CAST(CEIL(octet_length(encode(text)) / 4.0) AS BIGINT) AS est_tokens
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, shard_id, est_tokens,
         |         CAST(SUM(est_tokens) OVER (PARTITION BY shard_id
         |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM t)
         |SELECT doc_id, shard_id,
         |       CAST(FLOOR((cum - est_tokens) / 4096.0) AS BIGINT) AS bin_id
         |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      Sampling.packBins(
          Tables.documents(s, d).select(col("doc_id"),
            TextFns.tokenEstimate(col("text")).as("est_tokens")),
          "doc_id", "est_tokens", nShards = 8, capacityTokens = 4096)
        .select("doc_id", "shard_id", "bin_id")
        .orderBy("doc_id")
    },

    // ── temperature resampling (α = 0.5): every language keeps
    //    sqrt(n_min/n_l) of its docs — the majority language is downsampled
    //    hardest, the smallest kept whole
    sql("q_sample_temperature",
      s"""WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
         |r AS (SELECT lang,
         |        CAST(FLOOR(SQRT(CAST((SELECT MIN(n) FROM c) AS DOUBLE) / n) * 10000) AS BIGINT) AS cap
         |      FROM c)
         |SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
         |WHERE ${bucketSql("d.doc_id")} < r.cap
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      Sampling.sqrtTemperatureSample(Tables.documents(s, d), "lang", "doc_id")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // ── BM25 keyword search: rational-idf BM25 (k1=1.25, b=0.75 — exactly
    //    representable, so every intermediate double matches DuckDB's),
    //    per-term scores quantized to longs before the per-doc sum
    sql("q_search_bm25",
      s"""WITH $bm25Ctes
         |SELECT doc_id, score_q, n_terms FROM bm25
         |ORDER BY score_q DESC, doc_id""".stripMargin) {
      (s, d) =>
        graft.operators.Search.bm25TopK(Tables.documents(s, d), "doc_id", "text",
          Seq("vector", "stream", "merge"))
    },

    // ── sliding-window chunking: 16-token windows every 8 tokens — the
    //    fixed-context unit a trainer consumes; tail chunks short, short
    //    docs yield one chunk. Pure explode, no shuffle.
    sql("q_chunk_sliding",
      """WITH w AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |c AS (SELECT doc_id, w, unnest(range(1, len(w) + 1, 8)) AS s FROM w)
        |SELECT doc_id, CAST((s - 1) / 8 AS BIGINT) AS chunk_id,
        |       array_to_string(w[s:s+15], ' ') AS chunk_text,
        |       CAST(len(w[s:s+15]) AS BIGINT) AS n_tokens
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
      graft.operators.Curation.chunkDocuments(
          Tables.documents(s, d), "doc_id", "text",
          chunkTokens = 16, strideTokens = 8)
        .orderBy("doc_id", "chunk_id")
    },

    // ── corpus heavy-hitter tokens, exact via Misra-Gries candidates +
    //    second-pass verify (θ = 2%, capacity 63 ⇒ guaranteed superset)
    sql("q_text_heavyhitters",
      """WITH t AS (
        |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM t),
        |c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY 1)
        |SELECT term, cnt, CAST(cnt AS DOUBLE) / n AS frac
        |FROM c CROSS JOIN tot WHERE cnt * 50 > n ORDER BY term""".stripMargin) { (s, d) =>
      graft.operators.Curation.heavyHitterTokens(
          Tables.documents(s, d), "text", thetaDen = 50, capacity = 63)
        .orderBy("term")
    },

    // ── per-doc top-5 characteristic terms (TF-IDF, rational idf): the
    //    rank-limit idiom — rides WindowGroupLimit/TopKPerKey pruning
    sql("q_tfidf_topterms",
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tfc AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tfv
        |        FROM toks GROUP BY 1, 2),
        |dfr AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS dfv FROM tfc GROUP BY 1),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        |sc AS (
        |  SELECT tfc.doc_id, tfc.term,
        |         CAST(FLOOR(tfv * ((n_docs + 1.0) / (dfv + 1.0)) * 1000000.0) AS BIGINT) AS score_q
        |  FROM tfc JOIN dfr USING (term) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |                ORDER BY score_q DESC, term) AS rank FROM sc)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, score_q
        |FROM r WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin) { (s, d) =>
      graft.operators.Search.tfidfTopTerms(Tables.documents(s, d), "doc_id", "text", k = 5)
        .orderBy("doc_id", "rank")
    },

    // ── top-50 bigram collocations by quantized PMI: the multiword-
    //    expression detector (tokenizer-merge candidates). The score is
    //    a monotone integer transform of PMI computed in one fixed IEEE
    //    operation order, so ranking AND values replay; min-count 5
    //    prunes the degenerate hapax tail before any join.
    sql("q_text_pmi",
      """WITH toks AS (
        |  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |uni AS (SELECT unnest(t) AS w FROM toks),
        |uc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY 1),
        |bi AS (SELECT t[i] AS x, t[i + 1] AS y
        |       FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks)),
        |bc AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cxy
        |       FROM bi GROUP BY 1, 2),
        |tot AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM uni) AS nu,
        |               (SELECT CAST(COUNT(*) AS BIGINT) FROM bi) AS nb)
        |SELECT x, y, cxy,
        |       CAST(FLOOR(CAST(cxy AS DOUBLE) * nu * nu
        |             / (CAST(nb AS DOUBLE) * ux.c * uy.c)
        |             * 1000000.0) AS BIGINT) AS pmi_q
        |FROM bc JOIN uc ux ON bc.x = ux.w JOIN uc uy ON bc.y = uy.w
        |CROSS JOIN tot
        |WHERE cxy >= 5
        |ORDER BY pmi_q DESC, x, y LIMIT 50""".stripMargin) { (s, d) =>
      graft.operators.Curation.pmiCollocations(
        Tables.documents(s, d), "text", minCount = 5L, k = 50)
    },

    // ── exact phrase search from a persisted positional inverted index:
    //    postings join postings (term-pruned scans), documents never
    //    re-read; a match is a position where token i sits at p+i ∀i
    sql("q_search_phrase",
      """WITH w AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |         CAST(len(list_filter(range(1, len(w)),
        |                    i -> w[i:i+1] = ['table', 'hash'])) AS BIGINT) AS n_matches
        |  FROM w)
        |SELECT doc_id, n_matches FROM m WHERE n_matches > 0
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val sfKey = d.replaceAll("[^A-Za-z0-9]", "_")
      // built once per sf, reused across sessions (the search-index
      // contract: queries pay postings lookups, not index builds)
      val idxDir = s"${sys.props("user.dir")}/target/inverted_index_$sfKey"
      graft.DerivedCache.ensure(new java.io.File(idxDir),
          Seq(new java.io.File(s"$d/documents.parquet")), "postings/_SUCCESS") {
        graft.operators.Search.writeInvertedIndex(
          Tables.documents(s, d), "doc_id", "text", idxDir)
      }
      graft.operators.Search.phraseSearch(s, idxDir, "doc_id", Seq("table", "hash"))
        .orderBy("doc_id")
    },

    // ── leakage-safe splits: split assigned by hashing the GROUP key
    //    (source domain here; near-dup cluster / user id in production),
    //    so a group's documents can never straddle train and eval
    sql("q_split_groupwise",
      s"""SELECT doc_id, source,
         |       CASE WHEN ${bucketSql("source")} < 9000 THEN 'train'
         |            WHEN ${bucketSql("source")} < 9500 THEN 'val'
         |            ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Sampling.groupSplit(Tables.documents(s, d), "source",
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .select("doc_id", "source", "split")
        .orderBy("doc_id")
    }
  )
}
