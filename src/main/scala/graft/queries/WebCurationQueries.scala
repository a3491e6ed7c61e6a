package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.sql
import graft.functions.TextFns
import graft.operators.{Curation, Graph}
import org.apache.spark.sql.functions._

/** Web-corpus curation wave (engine-added, builder brief): the document
  * transforms a crawl pipeline applies between fetch and training-mix —
  * boilerplate-line removal, LM-surprisal quality scoring, model-based
  * keep/drop filtering, and URL canonicalization. Structure the synthetic
  * word-soup documents lack (lines, URLs) is planted identically on both
  * engines, so the oracle checks the operator, not the fixture (the
  * q_text_pii discipline).
  */
object WebCurationQueries {

  /** One integer-PageRank oracle iteration (d = dangling share, c = in-link
    * contributions, r = new ranks) — mirrors Graph.pageRank step for step.
    * Every CTE is `AS MATERIALIZED`: DuckDB 1.0 inlines twice-referenced
    * CTEs, so un-hinted chained iterations double the plan per wave
    * (2^iters) — the oracle-side twin of the lineage blowup
    * Graph.scala kills with localCheckpoint. */
  private def prIter(i: Int, prev: String): String = s"""
    |d$i AS MATERIALIZED (SELECT CAST(COALESCE(SUM(rank_q), 0) AS BIGINT) // (SELECT n FROM nn) AS ds
    |       FROM $prev WHERE node NOT IN (SELECT src FROM odeg)),
    |c$i AS MATERIALIZED (SELECT e.dst AS node, CAST(SUM($prev.rank_q // odeg.odeg) AS BIGINT) AS insum
    |       FROM $prev JOIN e ON $prev.node = e.src JOIN odeg ON e.src = odeg.src GROUP BY 1),
    |r$i AS MATERIALIZED (SELECT nodes.node,
    |         (15 * CAST(1000000000 AS BIGINT) // 100) // (SELECT n FROM nn)
    |         + (85 * (COALESCE(c$i.insum, 0) + (SELECT ds FROM d$i))) // 100 AS rank_q
    |       FROM nodes LEFT JOIN c$i ON nodes.node = c$i.node)""".stripMargin

  /** One unrolled Bellman-Ford wave — mirrors Graph.shortestPaths's
    * relax-and-min-merge step for step (the frontier optimization changes
    * work, not results, so the full relaxation replays it exactly). */
  private def bfIter(i: Int): String = s"""
    |s$i AS MATERIALIZED (SELECT node, MIN(dist) AS dist FROM (
    |         SELECT node, dist FROM s${i - 1}
    |         UNION ALL
    |         SELECT e.dst AS node, d.dist + e.w AS dist
    |         FROM s${i - 1} d JOIN e ON d.node = e.src) GROUP BY node)""".stripMargin

  /** One unrolled peel wave — mirrors Graph.kCore: degree-≥6 survivors,
    * then edges with both ends surviving. */
  private def kcIter(i: Int): String = s"""
    |k$i AS MATERIALIZED (SELECT src FROM e${i - 1}
    |       GROUP BY 1 HAVING COUNT(*) >= 6),
    |e$i AS MATERIALIZED (SELECT e.src, e.dst FROM e${i - 1} e
    |       JOIN k$i a ON e.src = a.src JOIN k$i b ON e.dst = b.src)""".stripMargin

  /** One unrolled synchronous-LPA wave — mirrors Graph.labelPropagation:
    * per-neighbour label counts, then rank 1 of (count desc, label asc)
    * per node. */
  private def lpIter(i: Int): String = s"""
    |n$i AS MATERIALIZED (
    |  SELECT e.dst AS node, l.lbl, COUNT(*) AS c
    |  FROM l${i - 1} l JOIN e ON l.node = e.src GROUP BY 1, 2),
    |l$i AS MATERIALIZED (
    |  SELECT node, lbl FROM (
    |    SELECT node, lbl,
    |           row_number() OVER (PARTITION BY node
    |                              ORDER BY c DESC, lbl) AS rn
    |    FROM n$i) WHERE rn = 1)""".stripMargin

  /** One unrolled min-label wave — mirrors Graph.connectedComponents. */
  private def ccIter(i: Int): String = s"""
    |c$i AS MATERIALIZED (SELECT node, MIN(lbl) AS lbl FROM (
    |         SELECT node, lbl FROM c${i - 1}
    |         UNION ALL
    |         SELECT e.dst AS node, c.lbl FROM c${i - 1} c
    |         JOIN e ON c.node = e.src) GROUP BY node)""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // ── integer-quantized PageRank, 3 iterations over a planted link graph
    //    (3 out-links per non-dangling doc; doc_id%10=9 docs are dangling).
    //    Fixed-point arithmetic makes the iteration engine-exact — a
    //    floating PageRank could never hash-match an oracle.
    sql("q_graph_pagerank",
      s"""WITH nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
         |e AS MATERIALIZED (SELECT doc_id AS src, (doc_id * 7 + j * 101) % (SELECT n FROM nn) AS dst
         |      FROM documents CROSS JOIN (SELECT unnest([1, 2, 3]) AS j)
         |      WHERE doc_id % 10 <> 9),
         |nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |odeg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS odeg FROM e GROUP BY 1),
         |r0 AS MATERIALIZED (SELECT node, 1000000000 // (SELECT n FROM nn) AS rank_q FROM nodes),
         |${prIter(1, "r0")},${prIter(2, "r1")},${prIter(3, "r2")}
         |SELECT node, CAST(rank_q AS BIGINT) AS rank_q FROM r3
         |ORDER BY node""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val n = docs.count()
      val edges = docs.filter(col("doc_id") % 10 =!= 9)
        .select(col("doc_id").as("src"),
          explode(array(lit(1), lit(2), lit(3))).as("j"))
        .select(col("src"), ((col("src") * 7 + col("j") * 101) % n).as("dst"))
      Graph.pageRank(edges, "src", "dst", iters = 3).orderBy("node")
    },

    // ── per-node triangle counts (Graph.triangleCount): local clustering
    //    signal over a planted link graph collapsed to 200 hosts — the
    //    graph is bounded at every sf (dense-host regime), the ORACLE cost
    //    is therefore scale-invariant, and the operator itself is the
    //    degree-oriented compact-forward join that survives real graphs.
    sql("q_graph_triangles",
      """WITH e0 AS (
        |  SELECT DISTINCT LEAST(doc_id % 200, (doc_id * 7 + j * 101) % 200) AS u,
        |                  GREATEST(doc_id % 200, (doc_id * 7 + j * 101) % 200) AS v
        |  FROM documents CROSS JOIN (SELECT unnest([1,2,3]) AS j)
        |  WHERE (doc_id % 200) <> ((doc_id * 7 + j * 101) % 200)),
        |deg AS (SELECT node, COUNT(*) AS deg
        |        FROM (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0) GROUP BY 1),
        |o AS (
        |  SELECT CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND u < v) THEN u ELSE v END AS a,
        |         CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND u < v) THEN v ELSE u END AS b,
        |         CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND u < v) THEN dv.deg ELSE du.deg END AS db
        |  FROM e0 JOIN deg du ON e0.u = du.node JOIN deg dv ON e0.v = dv.node),
        |w AS (SELECT e1.a AS ta, e1.b AS tb, e2.b AS tc
        |      FROM o e1 JOIN o e2 ON e1.a = e2.a
        |        AND ((e1.db < e2.db) OR (e1.db = e2.db AND e1.b < e2.b))),
        |t AS (SELECT ta, tb, tc FROM w
        |      WHERE EXISTS (SELECT 1 FROM o WHERE o.a = w.tb AND o.b = w.tc))
        |SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
        |FROM (SELECT ta AS node FROM t UNION ALL SELECT tb FROM t UNION ALL SELECT tc FROM t)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val edges = Tables.documents(s, d)
        .select((col("doc_id") % 200).as("src"),
          explode(array(lit(1), lit(2), lit(3))).as("j"),
          col("doc_id"))
        .select(col("src"), ((col("doc_id") * 7 + col("j") * 101) % 200).as("dst"))
      Graph.triangleCount(edges, "src", "dst").orderBy("node")
    },

    // ── single-source shortest paths (Graph.shortestPaths): weighted
    //    link distances from host 0 over the 200-host collapsed graph —
    //    frontier-optimized Bellman-Ford, 12 waves, every distance a
    //    BIGINT. The oracle unrolls the identical relax-and-min-merge
    //    wave 12 times, so the comparison holds converged or not.
    sql("q_graph_sssp",
      s"""WITH e AS MATERIALIZED (
         |  SELECT u AS src, v AS dst, MIN(w) AS w FROM (
         |    SELECT doc_id % 200 AS u, (doc_id * 7 + j * 101) % 200 AS v,
         |           1 + doc_id % 7 AS w
         |    FROM documents CROSS JOIN (SELECT unnest([1, 2, 3]) AS j)
         |    WHERE (doc_id % 200) <> ((doc_id * 7 + j * 101) % 200))
         |  GROUP BY 1, 2),
         |s0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist),${
           (1 to 12).map(bfIter).mkString(",")}
         |SELECT node, CAST(dist AS BIGINT) AS dist FROM s12
         |ORDER BY node""".stripMargin) { (s, d) =>
      val edges = Tables.documents(s, d)
        .select((col("doc_id") % 200).as("u"),
          explode(array(lit(1), lit(2), lit(3))).as("j"),
          col("doc_id"))
        .select(col("u"), ((col("doc_id") * 7 + col("j") * 101) % 200).as("v"),
          (lit(1) + col("doc_id") % 7).as("w"))
        .filter(col("u") =!= col("v"))
        .groupBy("u", "v").agg(min("w").as("w"))
      Graph.shortestPaths(edges, "u", "v", "w", sourceNode = 0L, iters = 12)
        .orderBy("node")
    },

    // ── weakly connected components (Graph.connectedComponents): the
    //    host graph is planted with 8 residue-class components (every
    //    edge stays within node % 8), so the labelling is non-trivial;
    //    min-label propagation over symmetrized edges, 12 waves, and
    //    the oracle unrolls the identical min-merge — converged or not.
    sql("q_graph_wcc",
      s"""WITH e0 AS (
         |  SELECT doc_id % 200 AS u,
         |         (doc_id % 200 + 8 * (1 + (doc_id * 7 + j * 101) % 24)) % 200 AS v
         |  FROM documents CROSS JOIN (SELECT unnest([1, 2, 3]) AS j)),
         |e AS MATERIALIZED (SELECT u AS src, v AS dst FROM e0
         |      UNION SELECT v, u FROM e0),
         |c0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM e),${
           (1 to 12).map(ccIter).mkString(",")}
         |SELECT node, CAST(lbl AS BIGINT) AS component FROM c12
         |ORDER BY node""".stripMargin) { (s, d) =>
      val edges = Tables.documents(s, d)
        .select((col("doc_id") % 200).as("u"),
          explode(array(lit(1), lit(2), lit(3))).as("j"),
          col("doc_id"))
        .select(col("u"),
          ((col("u") + lit(8) * (lit(1) + (col("doc_id") * 7 + col("j") * 101) % 24)) % 200)
            .as("v"))
      Graph.connectedComponents(edges, "u", "v", iters = 12).orderBy("node")
    },

    // ── k-core decomposition (Graph.kCore): peel nodes of degree < 6
    //    until the dense backbone remains. The 200-host graph is planted
    //    RESIDUE-ONLY (edges derive from u alone), so the peel cascade is
    //    identical at every sf: a 6-regular-ish rim that erodes wave by
    //    wave into the multiples-of-5 dense core (40 nodes, converges in
    //    5 waves; 8 unrolled here, post-convergence waves no-op). The
    //    oracle replays the identical peel, every CTE materialized (the
    //    ccIter lesson).
    sql("q_graph_kcore",
      s"""WITH n AS MATERIALIZED (
         |  SELECT DISTINCT doc_id % 200 AS u FROM documents),
         |eb AS MATERIALIZED (
         |  SELECT u, (u * 7 + j * 53) % 200 AS v
         |  FROM n CROSS JOIN (SELECT unnest([1, 2, 3]) AS j)
         |  WHERE u <> (u * 7 + j * 53) % 200
         |  UNION
         |  SELECT u, (u + 5 * j) % 200 AS v
         |  FROM n CROSS JOIN (SELECT unnest([1, 2, 3]) AS j)
         |  WHERE u % 5 = 0 AND u <> (u + 5 * j) % 200),
         |e0 AS MATERIALIZED (SELECT u AS src, v AS dst FROM eb
         |      UNION SELECT v, u FROM eb),${
           (1 to 8).map(kcIter).mkString(",")}
         |SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS core_deg
         |FROM e8 GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val hosts = Tables.documents(s, d)
        .select((col("doc_id") % 200).as("u")).distinct()
      def planted(h: org.apache.spark.sql.DataFrame) = h
        .select(col("u"), explode(array(lit(1), lit(2), lit(3))).as("j"))
      val rim = planted(hosts)
        .select(col("u"), ((col("u") * 7 + col("j") * 53) % 200).as("v"))
      val dense = planted(hosts.filter(col("u") % 5 === 0))
        .select(col("u"), ((col("u") + col("j") * 5) % 200).as("v"))
      val edges = rim.union(dense).filter(col("u") =!= col("v"))
      Graph.kCore(edges, "u", "v", k = 6, iters = 8).orderBy("node")
    },

    // ── synchronous label propagation (Graph.labelPropagation): the
    //    200-host graph planted as FOUR mod-4 residue communities (six
    //    intra-class neighbours each) plus four cross edges — community
    //    structure connectivity can't see (the graph may be one weak
    //    component; LPA majorities still split it). Residue-only edges,
    //    so the labelling is identical at every sf; 4 waves, the
    //    deterministic (count desc, label asc) tie-break, every oracle
    //    CTE materialized.
    sql("q_graph_lpa",
      s"""WITH n AS MATERIALIZED (
         |  SELECT DISTINCT doc_id % 200 AS u FROM documents),
         |eb AS MATERIALIZED (
         |  SELECT u, (u + 4 * j) % 200 AS v
         |  FROM n CROSS JOIN (SELECT unnest([1, 2, 3]) AS j)
         |  WHERE u <> (u + 4 * j) % 200
         |  UNION
         |  SELECT u, (u + 1) % 200 AS v FROM n WHERE u % 50 = 0),
         |e AS MATERIALIZED (SELECT u AS src, v AS dst FROM eb
         |      UNION SELECT v, u FROM eb),
         |l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM e),${
           (1 to 4).map(lpIter).mkString(",")}
         |SELECT node, CAST(lbl AS BIGINT) AS community FROM l4
         |ORDER BY node""".stripMargin) { (s, d) =>
      val hosts = Tables.documents(s, d)
        .select((col("doc_id") % 200).as("u")).distinct()
      val intra = hosts
        .select(col("u"), explode(array(lit(1), lit(2), lit(3))).as("j"))
        .select(col("u"), ((col("u") + col("j") * 4) % 200).as("v"))
      val cross = hosts.filter(col("u") % 50 === 0)
        .select(col("u"), ((col("u") + 1) % 200).as("v"))
      val edges = intra.union(cross).filter(col("u") =!= col("v"))
      Graph.labelPropagation(edges, "u", "v", iters = 4).orderBy("node")
    },

    // ── Unicode NFC normalization (native normalize_unicode expression):
    //    docs planted with decomposed (e+U+0301) and precomposed (é)
    //    suffixes; NFC makes them byte-identical, byte counts prove the
    //    recomposition happened
    sql("q_clean_nfc",
      """WITH t AS (
        |  SELECT doc_id,
        |    text || CASE WHEN doc_id % 5 = 0
        |                 THEN ' cafe' || chr(769) || ' nai' || chr(776) || 've deja' || chr(768) || ' vu'
        |                 WHEN doc_id % 5 = 1 THEN ' caf' || chr(233) || ' na' || chr(239) || 've'
        |                 ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(t) AS norm_text,
        |       CAST(octet_length(encode(t)) AS BIGINT) AS n_bytes_raw,
        |       CAST(octet_length(encode(nfc_normalize(t))) AS BIGINT) AS n_bytes_norm
        |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
      val planted = Tables.documents(s, d).select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 5 === 0,
            lit(" café naïve dejà vu"))
          .when(col("doc_id") % 5 === 1, lit(" café naïve"))
          .otherwise(lit(""))).as("t"))
      planted.select(col("doc_id"),
          TextFns.normalizeUnicode(col("t")).as("norm_text"),
          TextFns.byteLength(col("t")).as("n_bytes_raw"),
          TextFns.byteLength(TextFns.normalizeUnicode(col("t"))).as("n_bytes_norm"))
        .orderBy("doc_id")
    },

    // ── C4/CCNet boilerplate removal: pages are the docs re-lined every 12
    //    tokens, with a nav header planted on doc_id%4 and a footer on
    //    doc_id%3; any normalized line shared by ≥60 docs is stripped.
    //    (Organic 12-token lines are effectively unique; short tail lines
    //    that do repeat corpus-wide are boilerplate by the definition.)
    sql("q_clean_boilerplate",
      """WITH w AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |pages AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 0 THEN 'Home | About | Contact' || chr(10) ELSE '' END
        |    || array_to_string(list_transform(range(1, len(w) + 1, 12),
        |         s -> array_to_string(w[s:s+11], ' ')), chr(10))
        |    || CASE WHEN doc_id % 3 = 0
        |            THEN chr(10) || 'Follow us on social media | Terms of Service'
        |            ELSE '' END AS t
        |  FROM w),
        |ls AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM pages),
        |ln AS (SELECT DISTINCT doc_id, trim(lower(l)) AS norm
        |       FROM (SELECT doc_id, unnest(ls) AS l FROM ls)
        |       WHERE trim(lower(l)) <> ''),
        |bl AS (SELECT COALESCE(list(norm ORDER BY norm), CAST([] AS VARCHAR[])) AS b
        |       FROM (SELECT norm FROM ln GROUP BY norm HAVING COUNT(*) >= 60)),
        |k AS (SELECT doc_id, ls,
        |        list_filter(ls, x -> NOT list_contains(b, trim(lower(x)))) AS kept
        |      FROM ls CROSS JOIN bl)
        |SELECT doc_id, array_to_string(kept, chr(10)) AS clean_text,
        |       CAST(len(kept) AS BIGINT) AS n_kept,
        |       CAST(len(ls) - len(kept) AS BIGINT) AS n_dropped
        |FROM k ORDER BY doc_id""".stripMargin) { (s, d) =>
      val pages = Tables.documents(s, d)
        .select(col("doc_id"), TextFns.tokens(col("text")).as("__w"))
        .select(col("doc_id"), concat(
          when(col("doc_id") % 4 === 0, lit("Home | About | Contact\n"))
            .otherwise(lit("")),
          array_join(transform(sequence(lit(1), size(col("__w")), lit(12)),
            i => array_join(slice(col("__w"), i, lit(12)), " ")), "\n"),
          when(col("doc_id") % 3 === 0,
              lit("\nFollow us on social media | Terms of Service"))
            .otherwise(lit(""))).as("page"))
      Curation.stripBoilerplate(pages, "doc_id", "page", minDocs = 60)
        .orderBy("doc_id")
    },

    // ── C4 global line dedup: duplicated lines keep their first (doc, pos)
    //    occurrence only. Planted 'Shared quote block k' lines (k = doc%3,
    //    on doc_id%5) duplicate across ~30 docs; organic repeated tail
    //    lines dedup identically on both engines.
    sql("q_dedup_lines",
      """WITH w AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |pages AS (
        |  SELECT doc_id,
        |    array_to_string(list_transform(range(1, len(w) + 1, 12),
        |      s -> array_to_string(w[s:s+11], ' ')), chr(10))
        |    || CASE WHEN doc_id % 5 = 0
        |            THEN chr(10) || 'Shared quote block ' || CAST(doc_id % 3 AS VARCHAR)
        |            ELSE '' END AS t
        |  FROM w),
        |ls AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM pages),
        |ln AS (SELECT doc_id, generate_subscripts(ls, 1) AS pos, unnest(ls) AS line FROM ls),
        |r AS (SELECT doc_id, pos, line,
        |        CASE WHEN trim(lower(line)) = '' THEN 1
        |             ELSE row_number() OVER (PARTITION BY trim(lower(line))
        |                                     ORDER BY doc_id, pos) END AS rn
        |      FROM ln),
        |k AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
        |             CAST(COUNT(*) AS BIGINT) AS n_kept
        |      FROM r WHERE rn = 1 GROUP BY doc_id),
        |tot AS (SELECT doc_id, CAST(len(ls) AS BIGINT) AS total FROM ls)
        |SELECT t.doc_id, COALESCE(k.clean_text, '') AS clean_text,
        |       COALESCE(k.n_kept, 0) AS n_kept,
        |       t.total - COALESCE(k.n_kept, 0) AS n_dropped
        |FROM tot t LEFT JOIN k USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, d) =>
      val pages = Tables.documents(s, d)
        .select(col("doc_id"), TextFns.tokens(col("text")).as("__w"))
        .select(col("doc_id"), concat(
          array_join(transform(sequence(lit(1), size(col("__w")), lit(12)),
            i => array_join(slice(col("__w"), i, lit(12)), " ")), "\n"),
          when(col("doc_id") % 5 === 0,
              concat(lit("\nShared quote block "), (col("doc_id") % 3).cast("string")))
            .otherwise(lit(""))).as("page"))
      Curation.dedupLinesKeepFirst(pages, "doc_id", "page")
        .orderBy("doc_id")
    },

    // ── unigram-LM surprisal (KenLM-filter stand-in): add-one-smoothed
    //    corpus unigram model, per-token surprisal in whole bits via
    //    integer div + bin-length (engine-portable — a floating ln() is
    //    not), vocab capped at the 1000 most frequent terms
    sql("q_text_surprisal",
      """WITH t AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY 1),
        |v AS (SELECT tok, c FROM (
        |        SELECT tok, c, row_number() OVER (ORDER BY c DESC, tok) AS r FROM c)
        |      WHERE r <= 1000),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM c),
        |b AS (SELECT doc_id,
        |        length(bin((n + v) // (COALESCE(c, 0) + 1))) - 1 AS bits
        |      FROM t LEFT JOIN v USING (tok) CROSS JOIN tot)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |       CAST(SUM(bits) AS BIGINT) AS surprisal_bits,
        |       CAST(SUM(bits) AS DOUBLE) / COUNT(*) AS bits_per_token
        |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      Curation.unigramSurprisal(Tables.documents(s, d), "doc_id", "text",
          maxVocab = 1000)
        .orderBy("doc_id")
    },

    // ── hashed-feature linear classifier (fastText-style keep/drop):
    //    md5-bucket feature ids, fixed Knuth-multiplicative integer
    //    weights, integer score sum — one scan-side expression
    sql("q_text_classifier",
      """WITH s AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ts
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
        |    CAST(list_sum(list_transform(ts, x ->
        |      ((CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT) % 4096)
        |        * 2654435761) % 20001 - 10000)) AS BIGINT) AS score_q
        |  FROM s)
        |SELECT doc_id, n_tokens, score_q,
        |       CASE WHEN score_q > 0 THEN 'keep' ELSE 'drop' END AS decision
        |FROM sc ORDER BY doc_id""".stripMargin) { (s, d) =>
      Curation.hashedLinearScore(Tables.documents(s, d), "doc_id", "text",
          dim = 4096, thresholdQ = 0L)
        .orderBy("doc_id")
    },

    // ── HTML → text extraction: docs wrapped in an HTML scaffold with
    //    script/style blocks, block tags, and entities planted; the regex
    //    pipeline (drop script/style → block tags to newlines → strip tags
    //    → decode entities → collapse whitespace) must match byte-for-byte
    sql("q_text_html_extract",
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
        |    || '</title><style>body { color: red; }</style></head><body>'
        |    || '<script type="text/javascript">var x = 1 &amp;&amp; 2;</script>'
        |    || '<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>'
        |    || '<p>' || text || '</p>'
        |    || CASE WHEN doc_id % 3 = 0
        |            THEN '<div>Tom &amp; Jerry &lt;3 &quot;quoted&quot; &#39;s&nbsp;end</div>'
        |            ELSE '' END
        |    || '<ul><li>alpha</li><li>beta</li></ul></body></html>' AS html
        |  FROM documents),
        |x AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(regexp_replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(html,
        |              '(?is)<(script|style)\b[^>]*>.*?</(script|style)>', ' ', 'g'),
        |            '(?i)<(/p|/div|/li|/h[1-6]|/tr|br\s*/?)>', chr(10), 'g'),
        |          '<[^>]*>', ' ', 'g'),
        |      '&nbsp;', ' ', 'g'), '&lt;', '<', 'g'),
        |      '&gt;', '>', 'g'), '&quot;', '"', 'g'), '&#39;', chr(39), 'g'),
        |      '&amp;', '&', 'g'),
        |    '[ ' || chr(9) || ']+', ' ', 'g'),
        |    '\s*' || chr(10) || '\s*', chr(10), 'g'),
        |    '^\s+|\s+$', '', 'g') AS text_out
        |  FROM h)
        |SELECT doc_id, text_out,
        |       CAST(len(string_split(text_out, chr(10))) AS BIGINT) AS n_lines
        |FROM x ORDER BY doc_id""".stripMargin) { (s, d) =>
      val html = Tables.documents(s, d).select(col("doc_id"), concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title><style>body { color: red; }</style></head><body>"),
        lit("<script type=\"text/javascript\">var x = 1 &amp;&amp; 2;</script>"),
        lit("<h1>Doc "), col("doc_id").cast("string"), lit("</h1>"),
        lit("<p>"), col("text"), lit("</p>"),
        when(col("doc_id") % 3 === 0,
            lit("<div>Tom &amp; Jerry &lt;3 &quot;quoted&quot; &#39;s&nbsp;end</div>"))
          .otherwise(lit("")),
        lit("<ul><li>alpha</li><li>beta</li></ul></body></html>")).as("html"))
      html.select(col("doc_id"),
          TextFns.htmlToText(col("html")).as("text_out"))
        .select(col("doc_id"), col("text_out"),
          size(split(col("text_out"), "\n")).cast("long").as("n_lines"))
        .orderBy("doc_id")
    },

    // ── script detection: per-script character counts (unicode ranges, the
    //    signal langId's marker words can't give on open vocabulary) +
    //    dominant script; CJK/Cyrillic/Arabic content planted by doc_id mod
    sql("q_text_scripts",
      """WITH t AS (
        |  SELECT doc_id,
        |    text || CASE WHEN doc_id % 7 = 0 THEN ' 数据处理引擎'
        |                 WHEN doc_id % 7 = 1 THEN ' обработка данных'
        |                 WHEN doc_id % 7 = 2 THEN ' معالجة البيانات'
        |                 ELSE '' END AS t
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z\x{00C0}-\x{024F}]')) AS BIGINT) AS n_latin,
        |  CAST(len(regexp_extract_all(t, '[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}]')) AS BIGINT) AS n_cjk,
        |  CAST(len(regexp_extract_all(t, '[\x{0400}-\x{04FF}]')) AS BIGINT) AS n_cyrillic,
        |  CAST(len(regexp_extract_all(t, '[\x{0600}-\x{06FF}]')) AS BIGINT) AS n_arabic
        |  FROM t)
        |SELECT doc_id, n_latin, n_cjk, n_cyrillic, n_arabic,
        |  CASE WHEN greatest(n_latin, n_cjk, n_cyrillic, n_arabic) = 0 THEN 'und'
        |       WHEN n_latin = greatest(n_latin, n_cjk, n_cyrillic, n_arabic) THEN 'latin'
        |       WHEN n_cjk = greatest(n_latin, n_cjk, n_cyrillic, n_arabic) THEN 'cjk'
        |       WHEN n_cyrillic = greatest(n_latin, n_cjk, n_cyrillic, n_arabic) THEN 'cyrillic'
        |       ELSE 'arabic' END AS script
        |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      val planted = Tables.documents(s, d).select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 7 === 0, lit(" 数据处理引擎"))
          .when(col("doc_id") % 7 === 1, lit(" обработка данных"))
          .when(col("doc_id") % 7 === 2, lit(" معالجة البيانات"))
          .otherwise(lit(""))).as("t"))
      val counted = planted.select(col("doc_id") +:
        TextFns.ScriptClasses.map { case (n, cl) =>
          TextFns.scriptCount(col("t"), cl).as(s"n_$n")
        }: _*)
      counted.select(col("doc_id"), col("n_latin"), col("n_cjk"),
          col("n_cyrillic"), col("n_arabic"),
          TextFns.dominantScriptFrom(
            TextFns.ScriptClasses.map { case (n, _) => n -> col(s"n_$n") })
            .as("script"))
        .orderBy("doc_id")
    },

    // ── q06 flagship: the web-curation chain end-to-end — NFC normalize →
    //    corpus-frequency boilerplate strip → hashed-classifier keep/drop →
    //    per-source corpus accounting. The planted café lines arrive half
    //    decomposed, half precomposed: identical accounting on both engines
    //    PROVES the NFC stage (the classifier hashes the bytes).
    sql("q06_web_curation",
      """WITH w AS (
        |  SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |pages AS (
        |  SELECT doc_id, source, nfc_normalize(
        |    CASE WHEN doc_id % 4 = 0 THEN 'Home | About | Contact' || chr(10) ELSE '' END
        |    || array_to_string(list_transform(range(1, len(w) + 1, 12),
        |         s -> array_to_string(w[s:s+11], ' ')), chr(10))
        |    || CASE WHEN doc_id % 3 = 0
        |            THEN chr(10) || 'Follow us on social media | Terms of Service'
        |            ELSE '' END
        |    || CASE WHEN doc_id % 2 = 0
        |            THEN chr(10) || 'visit cafe' || chr(769) || ' branch ' || CAST(doc_id AS VARCHAR)
        |            ELSE chr(10) || 'visit caf' || chr(233) || ' branch ' || CAST(doc_id AS VARCHAR)
        |       END) AS t
        |  FROM w),
        |ls AS (SELECT doc_id, source, string_split(t, chr(10)) AS ls FROM pages),
        |ln AS (SELECT DISTINCT doc_id, trim(lower(l)) AS norm
        |       FROM (SELECT doc_id, unnest(ls) AS l FROM ls)
        |       WHERE trim(lower(l)) <> ''),
        |bl AS (SELECT COALESCE(list(norm ORDER BY norm), CAST([] AS VARCHAR[])) AS b
        |       FROM (SELECT norm FROM ln GROUP BY norm HAVING COUNT(*) >= 60)),
        |k AS (SELECT doc_id, source,
        |        array_to_string(list_filter(ls, x -> NOT list_contains(b, trim(lower(x)))),
        |          chr(10)) AS clean_text
        |      FROM ls CROSS JOIN bl),
        |dec AS (SELECT doc_id, source,
        |          CAST(len(ts) AS BIGINT) AS n_tokens,
        |          CAST(list_sum(list_transform(ts, x ->
        |            ((CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT) % 4096)
        |              * 2654435761) % 20001 - 10000)) AS BIGINT) AS score_q,
        |          CAST(octet_length(encode(clean_text)) AS BIGINT) AS n_bytes
        |        FROM (SELECT doc_id, source, clean_text,
        |                regexp_split_to_array(trim(lower(clean_text)), '\s+') AS ts
        |              FROM k))
        |SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) FILTER (WHERE score_q > 0) AS BIGINT) AS n_kept,
        |  CAST(COALESCE(SUM(n_tokens) FILTER (WHERE score_q > 0), 0) AS BIGINT) AS tokens_kept,
        |  CAST(COALESCE(SUM(n_bytes) FILTER (WHERE score_q > 0), 0) AS BIGINT) AS bytes_kept
        |FROM dec GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val pages = docs
        .select(col("doc_id"), col("source"), TextFns.tokens(col("text")).as("__w"))
        .select(col("doc_id"), col("source"), concat(
          when(col("doc_id") % 4 === 0, lit("Home | About | Contact\n"))
            .otherwise(lit("")),
          array_join(transform(sequence(lit(1), size(col("__w")), lit(12)),
            i => array_join(slice(col("__w"), i, lit(12)), " ")), "\n"),
          when(col("doc_id") % 3 === 0,
              lit("\nFollow us on social media | Terms of Service"))
            .otherwise(lit("")),
          when(col("doc_id") % 2 === 0, // decomposed e + U+0301
              concat(lit("\nvisit café branch "), col("doc_id").cast("string")))
            .otherwise( // precomposed é
              concat(lit("\nvisit café branch "), col("doc_id").cast("string"))))
          .as("raw"))
        .select(col("doc_id"), col("source"),
          TextFns.normalizeUnicode(col("raw")).as("page"))
      val clean = Curation.stripBoilerplate(pages, "doc_id", "page", minDocs = 60)
      val scored = Curation.hashedLinearScore(
        clean.select(col("doc_id"), col("clean_text")), "doc_id", "clean_text")
      scored
        .join(clean.select(col("doc_id"),
          TextFns.byteLength(col("clean_text")).as("n_bytes")), "doc_id")
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("decision") === "keep", 1)).as("n_kept"),
          coalesce(sum(when(col("decision") === "keep", col("n_tokens"))), lit(0L))
            .as("tokens_kept"),
          coalesce(sum(when(col("decision") === "keep", col("n_bytes"))), lit(0L))
            .as("bytes_kept"))
        .orderBy("source")
    },

    // ── URL canonicalization + host blocklist: planted URLs exercise every
    //    rule — uppercase scheme/host, www., default ports, tracking
    //    params, unsorted params, fragments
    sql("q_url_canonical",
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'http://' END
        |    || source
        |    || CASE WHEN doc_id % 2 = 0 THEN '.Example.COM:443' ELSE '.example.com:80' END
        |    || '/Listing/' || CAST(doc_id AS VARCHAR)
        |    || CASE WHEN doc_id % 3 = 0
        |            THEN '?utm_source=feed&id=' || CAST(doc_id % 7 AS VARCHAR) || '&ref=tw&b=2'
        |            WHEN doc_id % 3 = 1 THEN '?z=1&a=2' ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END AS url
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |  regexp_replace(regexp_replace(
        |      lower(regexp_extract(url, '^[^/]*//([^/?#]+)', 1)),
        |      ':(443|80)$', ''), '^www\.', '') AS host,
        |  regexp_extract(url, '^[^/]*//[^/?#]*([^?#]*)', 1) AS path,
        |  array_to_string(list_sort(list_filter(
        |      string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
        |      p -> p <> '' AND NOT regexp_matches(p, '^(utm_[A-Za-z]+|ref|fbclid|gclid)='))),
        |    '&') AS qs
        |  FROM u)
        |SELECT doc_id,
        |  scheme || '://' || host || path
        |    || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS canon_url,
        |  host,
        |  CASE WHEN host IN ('src3.example.com', 'src7.example.com')
        |       THEN 'block' ELSE 'keep' END AS decision
        |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      val withUrl = Tables.documents(s, d).select(col("doc_id"), concat(
        when(col("doc_id") % 2 === 0, lit("HTTPS://WWW.")).otherwise(lit("http://")),
        col("source"),
        when(col("doc_id") % 2 === 0, lit(".Example.COM:443"))
          .otherwise(lit(".example.com:80")),
        lit("/Listing/"), col("doc_id").cast("string"),
        when(col("doc_id") % 3 === 0,
            concat(lit("?utm_source=feed&id="), (col("doc_id") % 7).cast("string"),
              lit("&ref=tw&b=2")))
          .when(col("doc_id") % 3 === 1, lit("?z=1&a=2"))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit("#section-2")).otherwise(lit("")))
        .as("url"))
      Curation.urlPolicyFilter(withUrl, "doc_id", "url",
          Seq("src3.example.com", "src7.example.com"))
        .orderBy("doc_id")
    }
  )
}
