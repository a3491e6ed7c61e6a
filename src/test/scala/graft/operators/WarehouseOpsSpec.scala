package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior specs for the round-7 fifth-wave operators: sessionization,
  * SCD2, incremental join view, fuzzy join, compressibility. */
class WarehouseOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessionize: gap strictly greater than threshold starts a new session") {
    val df = Seq(
      // user 1: 3 events 10 min apart (one session), then a 2h jump
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (2L, ts("2024-01-01 10:10:00"), 1L),
      (3L, ts("2024-01-01 10:20:00"), 1L),
      (4L, ts("2024-01-01 12:20:00"), 1L),
      // user 2: gap EXACTLY the threshold — stays in session
      (5L, ts("2024-01-01 00:00:00"), 2L),
      (6L, ts("2024-01-01 00:30:00"), 2L),
      // ...and one microsecond past it — new session
      (7L, ts("2024-01-01 01:00:00.000001"), 2L))
      .toDF("event_id", "ts", "user_id")
    val out = TimeSeries.sessionize(df, "user_id", "ts", "event_id", 1800L)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L,
      5L -> 1L, 6L -> 1L, 7L -> 2L))

    val summ = TimeSeries.sessionSummaries(df, "user_id", "ts", "event_id", 1800L)
      .select("user_id", "session_idx", "n_events", "duration_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(summ === Set((1L, 1L, 3L, 1200000000L), (1L, 2L, 1L, 0L),
      (2L, 1L, 2L, 1800000000L), (2L, 2L, 1L, 0L)))
  }

  test("native session_window: an event exactly at the previous end MERGES (inclusive boundary)") {
    // measured, not assumed: Spark's session merge treats window.end as
    // inclusive, so the boundary rule MATCHES TimeSeries.sessionize's
    // strict-greater gap test — which is why both queries share one
    // oracle flag (`>`); this spec is the tripwire if Spark ever flips
    // to half-open semantics
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:30:00")),  // exactly at the previous end
      (1L, ts("2024-01-01 01:00:01")),  // 1 s past the extended end
      (2L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-01 00:29:59")))  // inside the window
      .toDF("user_id", "ts")
    val sessions = df
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", $"n").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(sessions(1L) === Seq(1L, 2L)) // boundary merges; +1s splits
    assert(sessions(2L) === Seq(2L))
    // sessionize agrees on every boundary decision
    val strict = TimeSeries.sessionize(
        df.withColumn("event_id", monotonically_increasing_id()),
        "user_id", "ts", "event_id", 1800L)
      .groupBy("user_id").agg(max("session_idx").as("m"))
      .as[(Long, Long)].collect().toMap
    assert(strict(1L) === 2L && strict(2L) === 1L)
  }

  test("scd2Apply: close+open on change, pass-through, insert, history intact") {
    val eff = lit("2024-06-01").cast("timestamp")
    val dim = Seq(
      // key 1: one closed historical version + a current one
      (1L, "A", ts("2023-01-01 00:00:00"), Option(ts("2024-01-01 00:00:00")), false),
      (1L, "B", ts("2024-01-01 00:00:00"), Option.empty[java.sql.Timestamp], true),
      // key 2: current only, unchanged by the batch
      (2L, "C", ts("2024-01-01 00:00:00"), Option.empty[java.sql.Timestamp], true),
      // key 3: current only, batch carries identical attrs (no-op)
      (3L, "D", ts("2024-01-01 00:00:00"), Option.empty[java.sql.Timestamp], true))
      .toDF("k", "segment", "valid_from", "valid_to", "is_current")
    val changes = Seq(
      (1L, "B2"), // real change
      (3L, "D"),  // identical — must NOT version
      (9L, "NEW")) // brand-new key
      .toDF("k", "segment")
    val out = Scd.scd2Apply(dim, changes, "k", Seq("segment"), eff)
      .select($"k", $"segment", date_format($"valid_from", "yyyy-MM-dd"),
        date_format($"valid_to", "yyyy-MM-dd"), $"is_current")
      .as[(Long, String, String, Option[String], Boolean)].collect().toSet
    assert(out === Set(
      (1L, "A", "2023-01-01", Some("2024-01-01"), false),   // history untouched
      (1L, "B", "2024-01-01", Some("2024-06-01"), false),   // closed
      (1L, "B2", "2024-06-01", None, true),                 // opened
      (2L, "C", "2024-01-01", None, true),                  // no batch row
      (3L, "D", "2024-01-01", None, true),                  // identical no-op
      (9L, "NEW", "2024-06-01", None, true)))               // insert
  }

  test("scd2Apply: null-safe attribute compare") {
    val eff = lit("2024-06-01").cast("timestamp")
    val dim = Seq(
      (1L, Option.empty[String], ts("2024-01-01 00:00:00"),
        Option.empty[java.sql.Timestamp], true),
      (2L, Option("X"), ts("2024-01-01 00:00:00"),
        Option.empty[java.sql.Timestamp], true))
      .toDF("k", "segment", "valid_from", "valid_to", "is_current")
    val changes = Seq(
      (1L, Option.empty[String]), // null == null → no-op
      (2L, Option.empty[String])) // X → null is a REAL change
      .toDF("k", "segment")
    val out = Scd.scd2Apply(dim, changes, "k", Seq("segment"), eff)
    assert(out.filter($"k" === 1L).count() === 1)
    assert(out.filter($"k" === 2L).count() === 2)
    assert(out.filter($"k" === 2L && !$"is_current" && $"segment" === "X").count() === 1)
  }

  test("appendJoinView: maintained view equals full recompute; schema gate throws") {
    val fact = Seq((1L, 10L, 5.0), (2L, 20L, 6.0), (3L, 10L, 7.0), (4L, 30L, 8.0))
      .toDF("fid", "kid", "v")
    val dim = Seq((10L, "x"), (20L, "y"), (30L, "z")).toDF("kid", "name")
    val base = fact.filter($"fid" <= 2)
    val delta = fact.filter($"fid" > 2)
    val maintained = Incremental.appendJoinView(
      base.join(dim, Seq("kid")), delta, dim, Seq("kid"))
    val full = fact.join(dim, Seq("kid"))
    assert(maintained.orderBy("fid").collect().toSeq.toSet ===
      full.orderBy("fid").collect().toSeq.toSet)
    intercept[IllegalArgumentException] {
      Incremental.appendJoinView(base.join(dim, Seq("kid")).drop("name"),
        delta, dim, Seq("kid"))
    }
  }

  test("fuzzyPairs: blocked results are exactly the brute pairs that share a block") {
    val names = Seq("red bolt", "ted bolt", "red colt", "blue widget",
      "blue widgets", "green gear", "greon gear").toDF("n")
    val blockFn = (c: org.apache.spark.sql.Column) => split(c, " ").getItem(1)
    val blocked = FuzzyJoin.fuzzyPairs(names, names, "n", blockFn, maxDist = 2)
      .as[(String, String, Long)].collect().toSet
    val brute = FuzzyJoin.fuzzyPairsBrute(names, names, "n", maxDist = 2)
      .as[(String, String, Long)].collect().toSet
    // blocking loses only cross-block pairs
    assert(blocked.subsetOf(brute))
    val sameBlock = brute.filter { case (a, b, _) =>
      a.split(" ")(1) == b.split(" ")(1) }
    assert(blocked === sameBlock)
    assert(blocked.contains(("red bolt", "ted bolt", 1L)))
    assert(blocked.contains(("green gear", "greon gear", 1L)))
    // "blue widget"/"blue widgets" differ in the BLOCK token → lost to
    // blocking (the documented recall trade) but present in brute
    assert(brute.exists { case (a, b, _) => a == "blue widget" && b == "blue widgets" })
    assert(!blocked.exists { case (a, b, _) => a == "blue widget" && b == "blue widgets" })
  }

  test("entities: transitive chains collapse to one entity, singletons self-label") {
    // aaaa↔aabb and aabb↔bbbb are within dist 2, aaaa↔bbbb is 4 — only
    // transitive closure (not pairwise matching) unifies all three
    val names = Seq("aaaa bolt", "aabb bolt", "bbbb bolt", "zz gear")
      .toDF("n")
    val out = FuzzyJoin.entities(names, "n",
        c => split(c, " ").getItem(1), maxDist = 2)
      .as[(String, String)].collect().toMap
    assert(out === Map(
      "aaaa bolt" -> "aaaa bolt",
      "aabb bolt" -> "aaaa bolt",
      "bbbb bolt" -> "aaaa bolt",
      "zz gear" -> "zz gear"))
  }

  test("backfillPartitions: only the target partition's files change") {
    val table = "/root/repo/target/tmp/backfill_spec"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(table))
    val df = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0),
      (4L, "b", 40.0), (5L, "c", 50.0))
      .toDF("id", "day", "v")
    // day b lands corrupted (one row missing)
    df.filter($"day" =!= "b" || $"id" === 3L)
      .write.partitionBy("day").mode("overwrite").parquet(table)
    def filesOf(day: String): Set[String] =
      Option(new java.io.File(s"$table/day=$day").listFiles())
        .getOrElse(Array.empty)
        .filter(_.getName.startsWith("part-"))
        .map(f => f.getName + ":" + f.lastModified).toSet
    val aBefore = filesOf("a"); val cBefore = filesOf("c")
    Layout.backfillPartitions(df.filter($"day" === "b"), table, "day")
    // repaired content
    assert(spark.read.parquet(table).count() === 5)
    assert(spark.read.parquet(table).filter($"day" === "b").count() === 2)
    // untouched partitions keep their exact files
    assert(filesOf("a") === aBefore)
    assert(filesOf("c") === cBefore)
    // idempotent: re-running the same backfill keeps content identical
    Layout.backfillPartitions(df.filter($"day" === "b"), table, "day")
    assert(spark.read.parquet(table).count() === 5)
  }

  test("appendToInvertedIndex: incremental index equals a full rebuild") {
    val base = "/root/repo/target/tmp/idx_incr_spec"
    val full = "/root/repo/target/tmp/idx_full_spec"
    Seq(base, full).foreach(p =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
    val docs = graft.Tables.documents(spark, sfDir)
    Search.writeInvertedIndex(docs.filter($"doc_id" % 3 =!= 0),
      "doc_id", "text", base)
    Search.appendToInvertedIndex(docs.filter($"doc_id" % 3 === 0),
      "doc_id", "text", base)
    Search.writeInvertedIndex(docs, "doc_id", "text", full)
    def norm(dir: String) = spark.read.parquet(s"$dir/postings")
      .select($"term", $"doc_id", $"positions".cast("string"))
      .collect().map(_.toString).sorted.toSeq
    assert(norm(base) === norm(full))
    // and the read side agrees end-to-end
    val a = Search.phraseSearch(spark, base, "doc_id", Seq("table", "hash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Search.phraseSearch(spark, full, "doc_id", Seq("table", "hash"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("minMaxScale: integer positions, constant-group zero, long-only gate") {
    val df = Seq((1L, "a", 0L), (2L, "a", 50L), (3L, "a", 200L),
      (4L, "b", 7L), (5L, "b", 7L))
      .toDF("id", "k", "q")
    val out = Profiling.minMaxScale(df, "k", "q")
      .select("id", "scaled_pct").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 25L, 3L -> 100L, 4L -> 0L, 5L -> 0L))
    intercept[IllegalArgumentException] {
      Profiling.minMaxScale(Seq((1L, "a", 1.5)).toDF("id", "k", "q"), "k", "q")
    }
  }

  test("deflateStats: ratio orders by repetitiveness; empty doc is safe") {
    val docs = Seq(
      (1L, "z" * 1000),
      (2L, "the cat sat on the mat. " * 40),
      (3L, graft.queries.TextQueries.compressFixture(spark)
        .filter($"doc_id" === 3L).head().getString(1)),
      (4L, ""))
      .toDF("doc_id", "text")
    val out = Compressibility.deflateStats(docs, "doc_id", "text")
      .select("doc_id", "raw_len", "deflate_len", "ratio_pct")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._4 < out(2L)._4 && out(2L)._4 < out(3L)._4)
    assert(out(4L)._2 === 0L && out(4L)._4 === 0L)
    // deflate really ran: compressed output is nonempty even for ""
    assert(out(4L)._3 > 0L)
    // real-table smoke: every ratio in [0, 100+ε] and raw_len matches n_chars
    val real = Compressibility.deflateStats(
      graft.Tables.documents(spark, sfDir), "doc_id", "text")
    assert(real.filter($"ratio_pct" < 0 || $"ratio_pct" > 150).count() === 0)
  }
}
