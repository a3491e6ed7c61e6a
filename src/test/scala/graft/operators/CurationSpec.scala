package graft.operators

import graft.SparkSpec
import graft.functions.TextFns
import graft.operators.Contracts
import org.apache.spark.sql.functions._

/** Behavior specs for the corpus-curation wave (decontamination,
  * repetition signals, PII scrub, incremental dedup, shard export /
  * packing, temperature sampling). The DuckDB gate proves engine parity;
  * these prove the operators' semantic contracts on adversarial inputs.
  */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  // ── decontamination ─────────────────────────────────────────────────

  test("decontaminate flags exactly the docs sharing an n-gram with eval") {
    val eval = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "something about the quick brown fox jumps near here"), // shares 'the quick brown fox jumps'
      (2L, "entirely different words with no overlap at all ok"),
      (3L, "fox jumps over the lazy dog indeed a classic line")    // shares 'jumps over the lazy dog' etc
    ).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, eval, "doc_id", "text", 5)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(out.forall(_.getLong(1) >= 1L))
  }

  test("decontaminate of a clean corpus is empty; short docs never match") {
    val eval = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val train = Seq(
      (2L, "one two three four five six seven"),
      (3L, "alpha beta gamma")  // < shingle size: no shingles, no hit
    ).toDF("doc_id", "text")
    assert(Curation.decontaminate(train, eval, "doc_id", "text", 5).isEmpty)
  }

  test("bloom-prefiltered decontamination equals the plain operator exactly") {
    val docs = graft.Tables.documents(spark, sfDir)
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val eval = docs.filter(col("doc_id") % 50 === 0)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = asMap(Curation.decontaminate(train, eval, "doc_id", "text", 5))
    // the bloom is a prefilter, never a decider — any fpp gives equality
    val loose = asMap(Curation.decontaminateBloomExact(
      train, eval, "doc_id", "text", 5, fpp = 0.5))
    val tight = asMap(Curation.decontaminateBloomExact(
      train, eval, "doc_id", "text", 5, fpp = 0.001))
    assert(loose == plain && tight == plain)
  }

  // ── repetition signals ──────────────────────────────────────────────

  test("repetitionSignals: degenerate loop text maxes both signals") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam"),       // all-one-token
      (2L, "a b c d e f"),                         // all distinct
      (3L, "x y x y x y")                          // repeated bigram
    ).toDF("doc_id", "text")
    val m = Curation.repetitionSignals(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // doc 1: 5 bigrams all "spam spam" -> dup frac 4/5; top token 6/6
    assert(m(1L)._1 == 6L)
    assert(math.abs(m(1L)._2 - 0.8) < 1e-12)
    assert(m(1L)._3 == 1.0)
    // doc 2: all bigrams distinct, all tokens distinct
    assert(m(2L)._2 == 0.0)
    assert(math.abs(m(2L)._3 - 1.0 / 6) < 1e-12)
    // doc 3: bigrams = {x y, y x} over 5 -> 3/5 dup; top token 3/6
    assert(math.abs(m(3L)._2 - 0.6) < 1e-12)
    assert(m(3L)._3 == 0.5)
  }

  // ── PII scrub ───────────────────────────────────────────────────────

  test("redactPii replaces emails, phones, IPs and is idempotent") {
    val df = Seq(
      (1L, "write to jane.doe+x@sub.example.co.uk or call +44 20 7946 0042 from 192.168.0.1"),
      (2L, "no pii here, just 1234 numbers and a.b ellipsis"),
      (3L, "v1.2.3.4.5 is a version, not an ip; +12 is not a phone")
    ).toDF("doc_id", "text")
    val red = df.select(col("doc_id"), TextFns.redactPii(col("text")).as("r"),
      TextFns.emailCount(col("text")).as("e"),
      TextFns.phoneCount(col("text")).as("p"),
      TextFns.ipv4Count(col("text")).as("i"))
    val rows = red.collect().map(r =>
      r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows(1L)._1 == "write to <EMAIL> or call <PHONE> from <IP>")
    assert((rows(1L)._2, rows(1L)._3, rows(1L)._4) == (1L, 1L, 1L))
    assert(rows(2L)._1.contains("1234"))          // untouched
    assert((rows(2L)._2, rows(2L)._3, rows(2L)._4) == (0L, 0L, 0L))
    // a 5-part dotted version over-matches its last 4 parts (documented:
    // RE2 has no lookbehind; over-redaction is the safe direction);
    // short +NN is not a phone
    assert((rows(3L)._2, rows(3L)._3, rows(3L)._4) == (0L, 0L, 1L))
    assert(rows(3L)._1 == "v1.<IP> is a version, not an ip; +12 is not a phone")
    // idempotence: redacting redacted text changes nothing
    val twice = red.select(col("doc_id"), TextFns.redactPii(col("r")).as("rr"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(twice(1L) == rows(1L)._1)
  }

  // ── incremental dedup ───────────────────────────────────────────────

  test("incrementalNew admits only fingerprints absent from the corpus") {
    val corpus = Seq((1L, "seen before"), (2L, "also seen")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "seen   BEFORE"),   // same fingerprint after normalization
      (11L, "genuinely new"),
      (12L, "also seen"),
      (13L, "genuinely new")    // duplicate WITHIN the batch still passes (intra-batch dedup is exactByFingerprint's job)
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalNew(batch, corpus, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(11L, 13L))
  }

  // ── shard export / packing ──────────────────────────────────────────

  test("packBins: bins respect capacity at chunk boundaries and cover all docs") {
    val docs = (0L until 200L).map(i => (i, 100L + (i % 7) * 50)).toDF("doc_id", "est_tokens")
    val packed = Sampling.packBins(docs, "doc_id", "est_tokens",
      nShards = 4, capacityTokens = 1000L)
    assert(packed.count() == 200)
    // bin_id is the floor of the preceding cumulative sum / capacity:
    // within (shard, bin), the sum of tokens minus the last doc is < capacity
    val binSums = packed.groupBy("shard_id", "bin_id")
      .agg(sum("est_tokens").as("s"), max("est_tokens").as("m"))
      .collect()
    binSums.foreach { r =>
      assert(r.getLong(2) - r.getLong(3) < 1000L,
        s"bin overfilled beyond a straddling doc: $r")
    }
    // deterministic: same input -> same assignment
    val again = Sampling.packBins(docs, "doc_id", "est_tokens", 4, 1000L)
    assert(packed.exceptAll(again).isEmpty && again.exceptAll(packed).isEmpty)
  }

  // ── temperature sampling ────────────────────────────────────────────

  test("sqrtTemperatureSample keeps small strata whole-ish and shrinks large ones") {
    val rows = (0L until 1000L).map(i => (i, if (i < 900) "big" else "small"))
    val df = rows.toDF("doc_id", "lang")
    val kept = Sampling.sqrtTemperatureSample(df, "lang", "doc_id")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // small stratum: rate = sqrt(100/100) = 1 -> all 100 kept
    assert(kept("small") == 100L)
    // big stratum: rate = sqrt(100/900) = 1/3 -> ~300 of 900 (hash noise)
    assert(kept("big") > 200L && kept("big") < 400L)
    // deterministic
    val again = Sampling.sqrtTemperatureSample(df, "lang", "doc_id")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == kept)
  }

  test("chunkDocuments: windows, overlap, short tail, single-chunk short docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                     // shorter than one chunk
      (3L, "x")).toDF("doc_id", "text")
    val out = Curation.chunkDocuments(docs, "doc_id", "text",
        chunkTokens = 4, strideTokens = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._3).toSeq === Seq(
      "t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8", "t7 t8 t9 t10", "t9 t10"))
    assert(d1.map(_._4).toSeq === Seq(4L, 4L, 4L, 4L, 2L))
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 0L, "a b", 2L)))
    assert(out.filter(_._1 == 3L).toSeq === Seq((3L, 0L, "x", 1L)))
    // tokenization happens once per row: the materialized __w projection
    // must survive collapse (a split( per chunk would show up twice+)
    val plan = Curation.chunkDocuments(docs, "doc_id", "text", 4, 2)
      .queryExecution.executedPlan.toString
    assert("split\\(".r.findAllIn(plan).size <= 1, plan.take(2000))
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  // ── boilerplate removal ─────────────────────────────────────────────

  test("stripBoilerplate drops corpus-frequent lines, keeps order and uniques") {
    val footer = "Follow us | Terms"
    val docs = (1L to 10L).map { i =>
      (i, s"unique lead $i\n$footer\nunique tail $i")
    } :+ (11L, "no footer here\nanother line")
    val out = Curation.stripBoilerplate(docs.toDF("doc_id", "text"),
        "doc_id", "text", minDocs = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(3L) == (("unique lead 3\nunique tail 3", 2L, 1L)))
    assert(out(11L) == (("no footer here\nanother line", 2L, 0L)))
    // normalized matching: case/whitespace variants of the footer count as
    // the same line
    val varied = ((1L to 10L).map { i =>
      (i, s"unique lead $i\n  ${footer.toUpperCase}  \nunique tail $i")
    } :+ (11L, footer)).toDF("doc_id", "text")
    val v = Curation.stripBoilerplate(varied, "doc_id", "text", minDocs = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v(2L) == "unique lead 2\nunique tail 2")
    assert(v(11L) == "")
  }

  test("stripBoilerplate handles a blacklist far too large to inline") {
    // 3000 distinct boilerplate lines, each shared by 3 docs — the old
    // driver-literal impl would bake a 3000-element array(lit…) probe;
    // the join-shaped impl treats it as data
    val docs = (0L until 300L).map { i =>
      val shared = (0 until 30)
        .map(j => s"boilerplate ${(i / 3) * 30 + j} shared text")
        .mkString("\n")
      (i, s"unique opener $i\n$shared\nunique closer $i")
    }.toDF("doc_id", "text")
    // doc i shares its 30 boilerplate lines with docs in the same i/3 group
    val out = Curation.stripBoilerplate(docs, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.size == 300)
    out.foreach { case (i, (txt, kept, dropped)) =>
      assert(txt == s"unique opener $i\nunique closer $i", s"doc $i: $txt")
      assert(kept == 2L && dropped == 30L, s"doc $i: kept=$kept dropped=$dropped")
    }
  }

  test("stripBoilerplate: empty lines are structure, never boilerplate") {
    val docs = (1L to 6L).map(i => (i, s"a $i\n\nb $i")).toDF("doc_id", "text")
    val out = Curation.stripBoilerplate(docs, "doc_id", "text", minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a 1\n\nb 1")
  }

  // ── global line dedup (keep-first) ──────────────────────────────────

  test("dedupLinesKeepFirst keeps exactly the first (doc,pos) occurrence") {
    val docs = Seq(
      (1L, "alpha\nshared quote\nbeta"),
      (2L, "shared quote\ngamma"),
      (3L, "delta\nSHARED QUOTE"), // normalized match, case differs
      (4L, "shared quote")         // loses its only line
    ).toDF("doc_id", "text")
    val out = Curation.dedupLinesKeepFirst(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == (("alpha\nshared quote\nbeta", 3L, 0L)))
    assert(out(2L) == (("gamma", 1L, 1L)))
    assert(out(3L) == (("delta", 1L, 1L)))
    assert(out(4L) == (("", 0L, 1L)))
  }

  test("dedupLinesKeepFirst: within-doc repeats dedup too; empty lines survive") {
    val docs = Seq(
      (1L, "x\n\nx\n\ny"),
      (2L, "unrelated")).toDF("doc_id", "text")
    val out = Curation.dedupLinesKeepFirst(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // second 'x' dropped, both empty lines kept as structure
    assert(out(1L) == "x\n\n\ny")
    assert(out(2L) == "unrelated")
  }

  // ── unigram surprisal ───────────────────────────────────────────────

  test("unigramSurprisal: rare tokens cost more bits; totals are exact") {
    // corpus: 'the' x9 + 'rarity' x1 -> N=10, V=2
    val docs = (1L to 3L).map(i => (i, "the the the")).toList :+
      (4L, "rarity")
    val out = Curation.unigramSurprisal(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // 'the': floor(log2(12 div 10)) = 0 bits; 'rarity': floor(log2(12 div 2)) = 2
    assert(out(1L) == ((3L, 0L, 0.0)))
    assert(out(4L) == ((1L, 2L, 2.0)))
  }

  test("unigramSurprisal: out-of-vocab tokens score as unseen (c=0)") {
    // maxVocab=1: only the most frequent term is in-vocab; 'z' goes OOV
    // N=5, V=2; in-vocab 'a' (c=4): floor(log2(7 div 5)) = 0;
    // OOV 'z': floor(log2(7 div 1)) = 2
    val docs = Seq((1L, "a a a a"), (2L, "z")).toDF("doc_id", "text")
    val out = Curation.unigramSurprisal(docs, "doc_id", "text", maxVocab = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 0L)
    assert(out(2L) == 2L)
  }

  // ── hashed linear classifier ────────────────────────────────────────

  test("hashedLinearScore: scores are exact token-weight sums, scan-only plan") {
    def w(t: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val f = java.lang.Long.parseLong(md5.take(8), 16) % 4096
      (f * 2654435761L) % 20001 - 10000
    }
    val docs = Seq((1L, "alpha beta beta"), (2L, "gamma")).toDF("doc_id", "text")
    val out = Curation.hashedLinearScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val s1 = w("alpha") + 2 * w("beta")
    assert(out(1L) == ((3L, s1, if (s1 > 0) "keep" else "drop")))
    assert(out(2L)._2 == w("gamma"))
    // the whole classifier is one scan-side projection: no shuffle
    val plan = Curation.hashedLinearScore(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  // ── URL canonicalization ────────────────────────────────────────────

  test("canonicalUrl: scheme/host case, ports, www, tracking params, fragments") {
    val cases = Seq(
      ("HTTPS://WWW.News.Example.COM:443/A/b?utm_source=x&z=1&a=2#frag",
        "https://news.example.com/A/b?a=2&z=1"),
      ("http://example.com:80/", "http://example.com/"),
      ("http://example.com:8080/x", "http://example.com:8080/x"), // non-default port kept
      ("https://example.com/p?ref=tw&fbclid=abc", "https://example.com/p"),
      ("https://example.com", "https://example.com"))
    val df = cases.zipWithIndex.map { case ((u, _), i) => (i.toLong, u) }
      .toDF("id", "url")
    val got = df.select(col("id"), TextFns.canonicalUrl(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((_, want), i) =>
      assert(got(i.toLong) == want, s"case $i")
    }
  }

  test("kAnonymity suppresses exactly the groups below k") {
    val df = (Seq.fill(3)(("uk", "A")) ++ Seq.fill(2)(("uk", "B")) ++
      Seq(("fr", "A"))).zipWithIndex
      .map { case ((n, s), i) => (i.toLong, n, s) }
      .toDF("id", "nation", "segment")
    val got = Curation.kAnonymity(df, Seq("nation", "segment"), k = 3)
      .select("id", "action").as[(Long, String)].collect().toMap
    // (uk,A) n=3 keeps; (uk,B) n=2 and (fr,A) n=1 suppress
    assert(got == Map(0L -> "keep", 1L -> "keep", 2L -> "keep",
      3L -> "suppress", 4L -> "suppress", 5L -> "suppress"))
    // k=1: nothing is ever suppressed
    val all = Curation.kAnonymity(df, Seq("nation", "segment"), k = 1)
      .filter(col("action") === "suppress")
    assert(all.isEmpty)
  }

  test("lDiversity suppresses homogeneous groups that k-anonymity keeps") {
    // (uk,A): 4 rows but only ONE sensitive value — k-anonymous at k=3,
    // yet the homogeneity attack reads the sensitive value off the group
    val df = (Seq((0L, 1L), (1L, 1L), (2L, 1L), (3L, 1L))
      .map { case (i, sv) => (i, "uk", "A", sv) } ++
      Seq((4L, "uk", "B", 1L), (5L, "uk", "B", 2L), (6L, "uk", "B", 3L)))
      .toDF("id", "nation", "segment", "sens")
    val kAnon = Curation.kAnonymity(df, Seq("nation", "segment"), k = 3)
      .select("id", "action").as[(Long, String)].collect().toMap
    assert(kAnon(0L) == "keep") // big-enough group passes k-anonymity...
    val lDiv = Curation.lDiversity(df, Seq("nation", "segment"), "sens", l = 3)
      .select("id", "action").as[(Long, String)].collect().toMap
    // ...but fails l-diversity; the 3-distinct-value group keeps
    assert(lDiv == Map(0L -> "suppress", 1L -> "suppress", 2L -> "suppress",
      3L -> "suppress", 4L -> "keep", 5L -> "keep", 6L -> "keep"))
  }

  test("tokenizeColumns: deterministic, join-preserving, pepper-sensitive, null-safe") {
    val df = Seq((1L, Option("alice")), (2L, Option("alice")),
      (3L, Option("bob")), (4L, Option.empty[String]))
      .toDF("id", "name")
    val t1 = Curation.tokenizeColumns(df, Seq("name"), "pepperA")
      .as[(Long, Option[String])].collect().toMap
    // same value → same token (joinability), different values differ
    assert(t1(1L) === t1(2L))
    assert(t1(1L) !== t1(3L))
    // raw value gone, token is a 64-hex sha2
    assert(t1(1L).get.matches("[0-9a-f]{64}") && t1(1L).get != "alice")
    // null stays null
    assert(t1(4L).isEmpty)
    // rotating the pepper rotates every token
    val t2 = Curation.tokenizeColumns(df, Seq("name"), "pepperB")
      .as[(Long, Option[String])].collect().toMap
    assert(t1(1L) !== t2(1L))
  }

  test("foreignKey counts orphans exactly; null keys are orphans") {
    val dim = Seq(10L, 20L).toDF("ref")
    val fact = Seq(Option(10L), Option(20L), Option(10L),
      Option(99L), Option.empty[Long]).toDF("k")
    val out = Contracts.foreignKey(fact, "k", dim, "ref")
      .select("n_rows", "n_violations", "pass")
      .as[(Long, Long, Long)].head()
    assert(out === ((5L, 2L, 0L))) // 99 and null are orphans
    val clean = Contracts.foreignKey(fact.filter($"k".isin(10L, 20L)), "k", dim, "ref")
      .select("pass").as[Long].head()
    assert(clean === 1L)
  }

  test("urlPolicyFilter blocks canonical-host matches only") {
    val df = Seq(
      (1L, "https://WWW.Bad.example.com/x"),
      (2L, "https://good.example.com/x")).toDF("doc_id", "url")
    val out = Curation.urlPolicyFilter(df, "doc_id", "url",
        Seq("bad.example.com"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(1L -> "block", 2L -> "keep"))
  }

  test("fpe: decrypt inverts encrypt across the domain, including edges") {
    import org.apache.spark.sql.functions.col
    val edge = Seq(0L, 1L, (1L << 30) - 1, 1L << 30, (1L << 60) - 1)
    val vals = (edge ++ (0 until 200).map(i => i * 2654435761L % (1L << 60))).distinct
    val got = vals.toDF("x")
      .select(col("x"), Curation.fpeDecrypt(Curation.fpeEncrypt(col("x"))).as("rt"),
        Curation.fpeEncrypt(col("x")).as("enc"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(0), s"roundtrip broke at ${r.getLong(0)}")
      assert(r.getLong(2) >= 0 && r.getLong(2) < (1L << 60), "left the domain")
    }
    // a permutation never collides
    assert(got.map(_.getLong(2)).distinct.length == vals.length)
    // and it actually moves values (diffusion sanity, not identity)
    assert(got.count(r => r.getLong(2) != r.getLong(0)) > vals.length - 3)
  }

  test("pseudonymizeIds keeps nulls and rejects out-of-domain ids") {
    import org.apache.spark.sql.functions.col
    val ok = Curation.pseudonymizeIds(
        Seq(Some(5L), None).toDF("user_id"), Seq("user_id"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(ok.contains(None) && ok.flatten.forall(_ != 5L))
    intercept[Exception] {
      Curation.pseudonymizeIds(Seq(-1L).toDF("user_id"), Seq("user_id"))
        .collect()
    }
  }
}
