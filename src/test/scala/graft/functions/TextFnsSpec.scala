package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): T =
    Seq(text).toDF("t").select(c(col("t")).as("r")).head().getAs[T]("r")

  test("shingles produce n-grams, deduplicated, empty below n") {
    assert(one[Seq[String]]("a b c d", TextFns.shingles(_, 2)) === Seq("a b", "b c", "c d"))
    assert(one[Seq[String]]("a b a b a b", TextFns.shingles(_, 2)) === Seq("a b", "b a"))
    assert(one[Seq[String]]("a b", TextFns.shingles(_, 5)) === Seq())
  }

  test("token counting and BPE estimate") {
    assert(one[Long]("the quick brown fox", TextFns.tokenCount) === 4L)
    assert(one[Long]("abcd", TextFns.tokenEstimate) === 1L)
    assert(one[Long]("abcde", TextFns.tokenEstimate) === 2L)
  }

  test("regex token count and punctuation signals") {
    // "Hello, world! 42" → [Hello][,][world][!][42]
    assert(one[Long]("Hello, world! 42", TextFns.tokenCountRegex) === 5L)
    // CJK: one token per char (byte-level-BPE shape)
    assert(one[Long]("你好", TextFns.tokenCountRegex) === 2L)
    assert(one[Long]("Hello, world!", TextFns.punctCount) === 2L)
    // 12 non-space chars, 2 punct
    assert(one[Double]("Hello, world!", TextFns.punctRatio) === 2.0 / 12)
  }

  test("stopwordRatio") {
    assert(one[Double]("the cat and the dog", TextFns.stopwordRatio(_, Seq("the", "and"))) === 0.6)
  }

  test("langId picks the marker-richest language with priority tie-break") {
    assert(one[String]("the fast cat", TextFns.langId) === "en")
    assert(one[String]("el gato la casa", TextFns.langId) === "es")
    assert(one[String]("xyzzy quux", TextFns.langId) === "und")
    // 'la' is both es and fr — es wins by priority order
    assert(one[String]("la la", TextFns.langId) === "es")
  }

  test("fingerprint is whitespace/case insensitive but content sensitive") {
    val a = one[String]("The  Quick\tFox", TextFns.fingerprint)
    val b = one[String]("the quick fox", TextFns.fingerprint)
    val c = one[String]("the quick cat", TextFns.fingerprint)
    assert(a === b)
    assert(a !== c)
  }

  test("rolling fingerprint: edit-robust, short-text fallback, norm-column form equal") {
    // shared 16-char window → same rolling fingerprint despite a tail edit
    val base = "abcdefghijklmnop shared window text"
    val edited = base + " trailing addition"
    // both contain every window of `base`, so min-window can only move if
    // the addition introduces a smaller digest — check set containment
    // instead: base's fingerprint must be one of edited's window digests
    import org.apache.spark.sql.functions._
    val df = Seq((1L, base), (2L, edited), (3L, "short")).toDF("id", "text")
    val out = df.select($"id", TextFns.rollingFingerprint($"text", 16).as("rfp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // short text (< 16 chars) falls back to the whole-document digest
    assert(out(3L) === one[String]("short", TextFns.fingerprint))
    // two-projection form (normalize once, then window) is identical
    val viaNorm = df
      .select($"id", lower(regexp_replace($"text", "\\s+", " ")).as("n"))
      .select($"id", TextFns.rollingFingerprintOfNorm($"n", 16).as("rfp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaNorm === out)
  }

  test("native word_shingles equals the HOF reference, edge cases included") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir).limit(200)
      .select($"doc_id".as("id"), $"text")
    val extras = Seq(
      (200001L, "  leading and trailing spaces  "),
      (200002L, "\tleading tab keeps its phantom empty token"),
      (200003L, "a b c d e"), (200004L, "a b c d"), (200005L, ""),
      (200006L, "     "), (200007L, "rep rep rep rep rep rep rep rep"),
      (200008L, "ümläut wörds ünd mörê ünïcödé tökens here"),
      (200009L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val df = docs.unionByName(extras)
    for (n <- Seq(2, 5)) {
      val native = df.select($"id", TextFns.shingles($"text", n).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val hof = df.select($"id", TextFns.shinglesHof($"text", n).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(native === hof, s"n=$n")
    }
  }

  test("native rolling_fp_min equals the HOF reference, including non-ASCII") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir).limit(200)
      .select($"doc_id".as("id"), $"text")
    val extras = Seq(
      (100001L, "Grüße aus München — ümläuts everywhere, ünïcödé wíndöws here"),
      (100002L, "exactly-16-chars!"), (100003L, "short"), (100004L, ""),
      (100005L, "日本語のテキストとASCII mixed content for multibyte windows"))
      .toDF("id", "text")
    val df = docs.unionByName(extras)
      .select($"id", lower(regexp_replace($"text", "\\s+", " ")).as("n"))
    val native = df.select($"id", TextFns.rollingFingerprintOfNorm($"n", 16).as("rfp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val hof = df.select($"id", TextFns.rollingFingerprintOfNormHof($"n", 16).as("rfp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(native === hof)
  }

  test("htmlToText: scripts/styles dropped, blocks become lines, entities decode") {
    val html = "<html><head><style>p { x: 1 }</style></head><body>" +
      "<script>var a = 1 &amp;&amp; 2;</script>" +
      "<h1>Title</h1><p>Tom &amp; Jerry &lt;3</p>" +
      "<ul><li>one</li><li>two</li></ul>" +
      "<p>it&#39;s&nbsp;fine</p></body></html>"
    val out = Seq(html).toDF("h")
      .select(TextFns.htmlToText(col("h"))).head().getString(0)
    assert(out == "Title\nTom & Jerry <3\none\ntwo\nit's fine")
    // &amp; decodes LAST: '&amp;lt;' must yield the literal '&lt;', not '<'
    val tricky = Seq("<p>&amp;lt;</p>").toDF("h")
      .select(TextFns.htmlToText(col("h"))).head().getString(0)
    assert(tricky == "&lt;")
    // multiline script blocks die wholesale ((?s) dotall)
    val ml = Seq("<script>\nline1\nline2\n</script><p>kept</p>").toDF("h")
      .select(TextFns.htmlToText(col("h"))).head().getString(0)
    assert(ml == "kept")
  }

  test("script detection: counts per unicode range, dominant with priority ties") {
    val df = Seq(
      (1L, "hello world"),
      (2L, "数据处理"),
      (3L, "данные и процесс"),
      (4L, "hello 数据 world"),   // latin 10 > cjk 2
      (5L, "12345 .,;")           // no script chars at all
    ).toDF("id", "t")
    val counted = df.select(col("id") +:
      TextFns.ScriptClasses.map { case (n, cl) =>
        TextFns.scriptCount(col("t"), cl).as(s"n_$n") }: _*)
    val out = counted.select(col("id"), TextFns.dominantScriptFrom(
        TextFns.ScriptClasses.map { case (n, _) => n -> col(s"n_$n") }).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "latin", 2L -> "cjk", 3L -> "cyrillic",
      4L -> "latin", 5L -> "und"))
  }
}
