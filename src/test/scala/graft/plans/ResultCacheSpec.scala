package graft.plans

import java.io.File

import graft.SparkSpec
import graft.sources.TxnTable
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The result cache's contract: the key IS the validity check — same
  * query over unchanged snapshots hits, a commit to a scanned table
  * moves the key, unrelated commits don't, and anything a hit could be
  * wrong for never gets a key at all. */
class ResultCacheSpec extends SparkSpec {

  import spark.implicits._

  private val root = "/root/repo/target/tmp/spec_rescache"
  private val tableA = s"$root/ta"
  private val tableB = s"$root/tb"
  private val cacheDir = s"$root/cache"

  override def beforeAll(): Unit = {
    super.beforeAll()
    FileUtils.deleteQuietly(new File(root))
    TxnTable.commit(spark,
      (1L to 300L).map(i => (s"k${i % 5}", i % 11)).toDF("ka", "m"),
      tableA, overwrite = false)
    TxnTable.commit(spark,
      (1L to 100L).map(i => (s"g${i % 3}", i % 7)).toDF("kb", "n"),
      tableB, overwrite = false)
  }

  private def q(): DataFrame =
    TxnTable.read(spark, tableA).groupBy("ka")
      .agg(sum("m").cast("long").as("sm"))

  private def sortedRows(df: DataFrame) =
    df.orderBy("ka").collect().map(_.toSeq).toSeq

  test("identical queries share a key; different constants/tables don't") {
    val k1 = ResultCache.keyOf(q()).get
    val k2 = ResultCache.keyOf(q()).get
    assert(k1 == k2)
    val kFiltered = ResultCache.keyOf(q().filter(col("sm") > 3)).get
    assert(kFiltered != k1)
    val kOther = ResultCache.keyOf(
      TxnTable.read(spark, tableB).groupBy("kb")
        .agg(sum("n").cast("long").as("sm"))).get
    assert(kOther != k1)
  }

  test("keys do not collide past the maxToStringFields elision boundary") {
    // treeString elides argument lists at spark.sql.debug.maxToStringFields
    // (default 25): two projections differing only in their 28th column
    // would render identically and collide on a truncated-text key —
    // the key must hash the FULL plan
    def wide(v: Int): DataFrame =
      TxnTable.read(spark, tableA).select(
        col("ka") +: (1 to 29).map(i =>
          lit(if (i == 28) v else i).as(s"c$i")): _*)
    val kA = ResultCache.keyOf(wide(0)).get
    val kB = ResultCache.keyOf(wide(999)).get
    assert(kA != kB)
    assert(kA == ResultCache.keyOf(wide(0)).get)
  }

  test("uncacheable plans decline: plain parquet, nondeterminism, current_timestamp, dup names") {
    val plain = s"$root/plain.parquet"
    (1 to 10).toDF("x").write.mode("overwrite").parquet(plain)
    assert(ResultCache.keyOf(spark.read.parquet(plain).groupBy("x").count()).isEmpty)
    assert(ResultCache.keyOf(TxnTable.read(spark, tableA).filter(rand() < 0.5)).isEmpty)
    assert(ResultCache.keyOf(
      TxnTable.read(spark, tableA).select(current_timestamp().as("t"))).isEmpty)
    assert(ResultCache.keyOf(
      TxnTable.read(spark, tableA).select(col("m").as("x"), col("ka").as("x"))).isEmpty)
    // a txn scan hiding inside a subquery does NOT make a plain-scan plan cacheable
    val mixed = spark.read.parquet(plain).filter(
      col("x") <= TxnTable.read(spark, tableA).agg(max("m")).first().getLong(0))
    assert(ResultCache.keyOf(mixed).isEmpty)
  }

  test("miss computes and installs; second run hits with identical rows") {
    val first = ResultCache.run(spark, q(), cacheDir)
    assert(!first.hit && first.cacheable)
    val expected = sortedRows(first.df)
    val second = ResultCache.run(spark, q(), cacheDir)
    assert(second.hit && second.key == first.key)
    assert(sortedRows(second.df) == expected)
    // the hit is served from the cache dir, not the table
    // assert on the unambiguous segment: "/ta" alone would also match
    // the "/target/" prefix every path in this checkout carries
    val scanned = second.df.queryExecution.executedPlan.toString()
    assert(scanned.contains("cache") && !scanned.contains("spec_rescache/ta"))
  }

  test("commit to the scanned table moves the key; unrelated commit doesn't") {
    val before = ResultCache.run(spark, q(), cacheDir)
    TxnTable.commit(spark, Seq(("kx", 99L)).toDF("kb", "n"),
      tableB, overwrite = false)
    val unrelated = ResultCache.run(spark, q(), cacheDir)
    assert(unrelated.hit && unrelated.key == before.key)
    TxnTable.commit(spark, Seq(("k9", 5L)).toDF("ka", "m"), tableA, overwrite = false)
    val invalidated = ResultCache.run(spark, q(), cacheDir)
    assert(!invalidated.hit && invalidated.key != before.key)
    assert(invalidated.df.filter(col("ka") === "k9").count() == 1)
    // the old snapshot is still addressable: the asOf read re-resolves
    // to the ORIGINAL pin and hits the surviving entry
    val v1 = TxnTable.read(spark, tableA,
      asOf = Some(TxnTable.currentVersion(tableA) - 1))
      .groupBy("ka").agg(sum("m").cast("long").as("sm"))
    val historical = ResultCache.run(spark, v1, cacheDir)
    assert(historical.hit && historical.key == before.key)
  }

  test("retention drops entries beyond the version lag; pinned readers re-install") {
    val t = s"$root/ret_t"
    val retCache = s"$root/ret_cache"
    TxnTable.commit(spark, Seq(("a", 1L)).toDF("k", "v"), t, overwrite = false)
    def headQ() = TxnTable.read(spark, t).groupBy("k")
      .agg(sum("v").cast("long").as("sv"))
    val e1 = ResultCache.run(spark, headQ(), retCache) // pinned at v1
    (2 to 4).foreach(i => TxnTable.commit(spark,
      Seq(("a", i.toLong)).toDF("k", "v"), t, overwrite = false))
    val e4 = ResultCache.run(spark, headQ(), retCache) // pinned at v4
    assert(e1.key != e4.key)
    // lag(e1) = 3 > 2 → MARKED on the first cycle (a just-served lazy
    // reader may still be scanning), DELETED on the second; lag(e4) = 0
    // → untouched by both
    assert(ResultCache.retain(retCache, maxLag = 2) == 0)
    assert(new File(new File(retCache, e1.key), "_retired").isFile)
    assert(new File(retCache, e1.key).isDirectory)
    assert(ResultCache.retain(retCache, maxLag = 2) == 1)
    assert(!new File(retCache, e1.key).isDirectory)
    assert(new File(retCache, e4.key).isDirectory)
    // an asOf-pinned reader of the dropped snapshot misses once and
    // re-installs — retention never makes a result unreachable
    def v1Q() = TxnTable.read(spark, t, asOf = Some(1)).groupBy("k")
      .agg(sum("v").cast("long").as("sv"))
    val back = ResultCache.run(spark, v1Q(), retCache)
    assert(!back.hit && back.key == e1.key)
    assert(ResultCache.run(spark, v1Q(), retCache).hit)
    // a hit REPRIEVES a marked entry: mark, serve, re-mark — the entry
    // survives as long as readers keep coming
    assert(ResultCache.retain(retCache, maxLag = 2) == 0) // marks e1 again
    assert(new File(new File(retCache, e1.key), "_retired").isFile)
    assert(ResultCache.run(spark, v1Q(), retCache).hit)   // reprieve
    assert(!new File(new File(retCache, e1.key), "_retired").isFile)
    assert(ResultCache.retain(retCache, maxLag = 2) == 0) // mark cycle anew
    assert(new File(retCache, e1.key).isDirectory)
    // nothing within the lag is touched on a re-run
    assert(ResultCache.retain(retCache, maxLag = 5) == 0)
  }

  test("admission: an oversize result is served but never installed") {
    val admCache = s"$root/adm_cache"
    // identity projection = 100% of the pinned rows: over any cap < 1
    def wide() = TxnTable.read(spark, tableA).select("ka", "m")
    val w1 = ResultCache.run(spark, wide(), admCache, maxResultFraction = 0.5)
    assert(!w1.hit && w1.cacheable && !w1.installed)
    assert(!new File(admCache, w1.key).isDirectory)
    assert(w1.df.count() == TxnTable.read(spark, tableA).count())
    // declined is declined every time — no slow leak into the cache
    val w2 = ResultCache.run(spark, wide(), admCache, maxResultFraction = 0.5)
    assert(!w2.hit && !w2.installed && w2.key == w1.key)
    // a genuinely reducing aggregate passes the same cap and installs
    def agg() = TxnTable.read(spark, tableA).groupBy("ka")
      .agg(sum("m").cast("long").as("sm"))
    val a1 = ResultCache.run(spark, agg(), admCache, maxResultFraction = 0.5)
    assert(!a1.hit && a1.installed)
    assert(ResultCache.run(spark, agg(), admCache, maxResultFraction = 0.5).hit)
    // the default admits everything, identity included
    val w3 = ResultCache.run(spark, wide(), admCache)
    assert(!w3.hit && w3.installed)
    assert(ResultCache.run(spark, wide(), admCache).hit)
  }

  test("evictToBudget drops stalest-then-largest until the bytes fit") {
    val t = s"$root/bud_t"
    val budCache = s"$root/bud_cache"
    TxnTable.commit(spark, (1L to 50L).map(i => (s"k${i % 5}", i))
      .toDF("k", "v"), t, overwrite = false)
    def qAgg() = TxnTable.read(spark, t).groupBy("k")
      .agg(sum("v").cast("long").as("sv"))
    def qWide() = TxnTable.read(spark, t).select("k", "v")
    val stAgg = ResultCache.run(spark, qAgg(), budCache)   // stale after commit
    val stWide = ResultCache.run(spark, qWide(), budCache) // stale + larger
    TxnTable.commit(spark, Seq(("k9", 9L)).toDF("k", "v"), t, overwrite = false)
    val fresh = ResultCache.run(spark, qAgg(), budCache)   // pinned at head
    assert(Seq(stAgg, stWide, fresh).forall(_.installed))
    val freshBytes = org.apache.commons.io.FileUtils
      .sizeOfDirectory(new File(budCache, fresh.key))
    // budget that fits only the fresh entry: both stale ones go, the
    // larger stale one first — order provable by a budget that fits
    // fresh + the smaller stale
    val smallStale = math.min(
      org.apache.commons.io.FileUtils.sizeOfDirectory(new File(budCache, stAgg.key)),
      org.apache.commons.io.FileUtils.sizeOfDirectory(new File(budCache, stWide.key)))
    assert(ResultCache.evictToBudget(budCache,
      freshBytes + smallStale) == 1)
    assert(!new File(budCache, stWide.key).isDirectory) // largest stale died
    assert(new File(budCache, stAgg.key).isDirectory)
    assert(ResultCache.evictToBudget(budCache, freshBytes) == 1)
    assert(new File(budCache, fresh.key).isDirectory)
    assert(ResultCache.evictToBudget(budCache, 0L) == 1) // nothing is sacred
    assert(!new File(budCache, fresh.key).isDirectory)
  }

  test("inline literal rows participate in the key — equal rows share, different rows split") {
    // LocalRelation.stringArgs prints only output attrs for non-empty
    // relations, so a key built from the plan text alone would serve
    // one literal set the other's cached rows — the rows must be
    // digested into the template separately
    def withDim(rows: Seq[(String, String)]): DataFrame =
      TxnTable.read(spark, tableA)
        .join(rows.toDF("ka", "seg"), Seq("ka"))
        .groupBy("seg").agg(sum("m").cast("long").as("sm"))
    val d1 = Seq(("k0", "x"), ("k1", "y"))
    val d2 = Seq(("k0", "x"), ("k2", "y")) // same shape, one literal differs
    assert(ResultCache.keyOf(withDim(d1)).get ==
      ResultCache.keyOf(withDim(d1)).get)
    assert(ResultCache.keyOf(withDim(d1)).get !=
      ResultCache.keyOf(withDim(d2)).get)
    // end-to-end: caching d1 must not serve d2's query
    val rc = s"$root/lit_cache"
    assert(!ResultCache.run(spark, withDim(d1), rc).hit)
    val got2 = ResultCache.run(spark, withDim(d2), rc)
    assert(!got2.hit, "a different literal set must MISS")
    assert(got2.df.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      withDim(d2).collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    assert(ResultCache.run(spark, withDim(d1), rc).hit)
    // nested-typed literal cells have no stable serialization: decline
    val arr = Seq(("k0", Seq(1, 2))).toDF("ka", "xs")
    assert(ResultCache.keyOf(
      TxnTable.read(spark, tableA).join(arr, Seq("ka"))).isEmpty)
  }

  test("rollup serves AVG from the broad entry's sum+count pair") {
    val t = s"$root/rolavg_t"
    val rc = s"$root/rolavg_cache"
    TxnTable.commit(spark,
      (1L to 60L).map(i => (s"a${i % 3}", s"b${i % 4}",
          if (i % 3 == 2) None else Some(i)))
        .toDF("ka", "kb", "m"), t, overwrite = false)
    def base() = TxnTable.read(spark, t)
    // the broad entry stores SUM(m) and COUNT(m) — the non-null count,
    // exactly AVG's denominator (count(*) would not serve)
    assert(!ResultCache.runOrRollup(spark, base().groupBy("ka", "kb")
      .agg(sum("m").as("sm"), count(col("m")).as("cm")), rc).hit)
    def avgQ() = base().groupBy("ka").agg(avg("m").as("am"))
    val direct = avgQ().collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toMap
    val served = ResultCache.runOrRollup(spark, avgQ(), rc)
    assert(served.hit, "AVG must be served from the sum+count entry")
    val scanned = served.df.queryExecution.executedPlan.toString()
    assert(scanned.contains("rolavg_cache") && !scanned.contains("rolavg_t/"))
    val got = served.df.collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toMap
    assert(got == direct, s"got $got\nwant $direct")
    // the all-null group: ka=a2 has every m NULL — AVG is NULL, and the
    // late division must take the zero-count guard, not divide by 0
    assert(got("a2").isEmpty)
    assert(got("a0").contains(direct("a0").get))
    // installed under its own key: a plain re-run hits
    assert(ResultCache.run(spark, avgQ(), rc).hit)
    // an entry holding only a stored AVG can NOT serve a different-keyed
    // AVG (avg-of-avgs is wrong): global avg over an avg-only entry at
    // fresh pins must re-aggregate from sum+count or compute from base
    val globalAvg = ResultCache.runOrRollup(spark,
      base().agg(avg("m").as("am")), rc)
    assert(globalAvg.hit) // still servable — from the ORIGINAL sum+count entry
    assert(Option(globalAvg.df.head().get(0)) ==
      Option(base().agg(avg("m")).head().get(0)))
  }

  test("rollup serving: a narrower GROUP BY rolls from the cached broader one") {
    val t = s"$root/roll_t"
    val rc = s"$root/roll_cache"
    TxnTable.commit(spark,
      (1L to 60L).map(i => (s"a${i % 3}", s"b${i % 4}", i, i * 2))
        .toDF("ka", "kb", "m", "m2"), t, overwrite = false)
    def base() = TxnTable.read(spark, t)
    def broad() = base().groupBy("ka", "kb").agg(
      sum("m").as("sm"), count(lit(1)).as("n"), min("m2").as("mn"))
    def narrow() = base().groupBy("ka").agg(
      sum("m").as("sm"), count(lit(1)).as("n"))
    val b = ResultCache.runOrRollup(spark, broad(), rc)
    assert(!b.hit && b.installed)
    val direct = narrow().collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val n1 = ResultCache.runOrRollup(spark, narrow(), rc)
    assert(n1.hit, "narrower aggregate must be served from the broad entry")
    // the served plan reads CACHE storage, never the base table
    val scanned = n1.df.queryExecution.executedPlan.toString()
    assert(scanned.contains("roll_cache") && !scanned.contains("roll_t/"))
    assert(n1.df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet == direct)
    // the rollup installed under its own key: a plain run now hits
    assert(ResultCache.run(spark, narrow(), rc).hit)
    // lattice keeps descending: the GLOBAL aggregate rolls from level 2
    val g = ResultCache.runOrRollup(spark,
      base().agg(sum("m").as("sm"), count(lit(1)).as("n")), rc)
    assert(g.hit)
    assert(g.df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1830L, 60L)))
    // MIN re-aggregates too; a measure the entry lacks falls through
    val mn = ResultCache.runOrRollup(spark,
      base().groupBy("kb").agg(min("m2").as("mn")), rc)
    assert(mn.hit)
    val missing = ResultCache.runOrRollup(spark,
      base().groupBy("ka").agg(max("m2").as("mx")), rc) // no max in entry
    assert(!missing.hit && missing.installed) // computed from base, cached
  }

  test("rollup descends the lattice from the SMALLEST servable level") {
    val t = s"$root/rolsz_t"
    val rc = s"$root/rolsz_cache"
    TxnTable.commit(spark,
      (1L to 90L).map(i => (s"a${i % 30}", s"b${i % 3}", i))
        .toDF("ka", "kb", "m"), t, overwrite = false)
    def base() = TxnTable.read(spark, t)
    // level 2: 90 groups (ka×kb); level 1: 3 groups (kb)
    assert(!ResultCache.runOrRollup(spark, base().groupBy("ka", "kb")
      .agg(sum("m").as("sm")), rc).hit)
    def mid() = base().groupBy("kb").agg(sum("m").as("sm"))
    assert(ResultCache.runOrRollup(spark, mid(), rc).hit) // rolls from level 2
    val midKey = ResultCache.keyOf(mid()).get
    // the GLOBAL rollup must re-aggregate the 3-row kb level, not the
    // 90-row (ka, kb) level — smallest servable wins (white-box: the
    // served frame reads its own installed copy, so source selection is
    // only observable at the finder)
    def global() = base().agg(sum("m").as("sm"))
    val (tpl, pins, qCols) = ResultCache.latticeInfo(global()).get
    val chosen = ResultCache.findRollupSource(rc, tpl, pins, qCols, Nil)
    assert(chosen.map(_._1.getName).contains(midKey))
    val g = ResultCache.runOrRollup(spark, global(), rc)
    assert(g.hit)
    assert(g.df.head().getLong(0) == (1L to 90L).sum)
  }

  test("rollup serves aggregates over JOIN children too") {
    val ft = s"$root/rolj_fact"
    val dt = s"$root/rolj_dim"
    val rc = s"$root/rolj_cache"
    TxnTable.commit(spark,
      (1L to 40L).map(i => (i % 5, i)).toDF("fk", "m"), ft, overwrite = false)
    TxnTable.commit(spark,
      (0L until 5L).map(k => (k, s"seg${k % 2}")).toDF("dk", "seg"), dt,
      overwrite = false)
    def joined() = TxnTable.read(spark, ft)
      .join(TxnTable.read(spark, dt), col("fk") === col("dk"))
    val broad = joined().groupBy("seg", "fk")
      .agg(sum("m").as("sm"), count(lit(1)).as("n"))
    assert(!ResultCache.runOrRollup(spark, broad, rc).hit)
    // the narrower aggregate over the SAME join serves from the entry —
    // the join never re-executes, let alone the base scans
    val nar = ResultCache.runOrRollup(spark,
      joined().groupBy("seg").agg(sum("m").as("sm"), count(lit(1)).as("n")),
      rc)
    assert(nar.hit)
    val scanned = nar.df.queryExecution.executedPlan.toString()
    assert(scanned.contains("rolj_cache") && !scanned.contains("rolj_fact") &&
      !scanned.contains("rolj_dim"))
    val direct = TxnTable.read(spark, ft)
      .join(TxnTable.read(spark, dt), col("fk") === col("dk"))
      .groupBy("seg").agg(sum("m").as("sm"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(nar.df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet == direct)
  }

  test("rollup over DECIMAL sums keeps the direct query's type") {
    val t = s"$root/roldec_t"
    val rc = s"$root/roldec_cache"
    TxnTable.commit(spark,
      (1L to 30L).map(i => (s"a${i % 3}", s"b${i % 2}", i))
        .toDF("ka", "kb", "m0")
        .withColumn("m", col("m0").cast("decimal(12,2)")).drop("m0"),
      t, overwrite = false)
    def base() = TxnTable.read(spark, t)
    assert(!ResultCache.runOrRollup(spark, base().groupBy("ka", "kb")
      .agg(sum("m").as("sm")), rc).hit)
    def nar() = base().groupBy("ka").agg(sum("m").as("sm"))
    val direct = nar()
    val rolled = ResultCache.runOrRollup(spark, nar(), rc)
    assert(rolled.hit)
    // SUM(decimal(12,2)) = decimal(22,2); a naive sum-of-sums would
    // widen to decimal(32,2) and poison every later exact hit
    assert(rolled.df.schema("sm").dataType == direct.schema("sm").dataType)
    assert(ResultCache.run(spark, nar(), rc).hit)
    assert(rolled.df.collect().map(r =>
      (r.getString(0), r.getDecimal(1))).toSet ==
      direct.collect().map(r => (r.getString(0), r.getDecimal(1))).toSet)
  }

  test("filter subsumption: a key-column WHERE replays on the cached entry") {
    val t = s"$root/rollf_t"
    val rc = s"$root/rollf_cache"
    TxnTable.commit(spark,
      (1L to 60L).map(i => (s"a${i % 3}", s"b${i % 4}", i))
        .toDF("ka", "kb", "m"), t, overwrite = false)
    def base() = TxnTable.read(spark, t)
    val b = ResultCache.runOrRollup(spark,
      base().groupBy("ka", "kb").agg(sum("m").as("sm"), count(lit(1)).as("n")),
      rc)
    assert(!b.hit && b.installed)
    // WHERE on one key, GROUP BY the other: filters + rolls from the entry
    def filtered() = base().filter(col("ka") === "a1").groupBy("kb")
      .agg(sum("m").as("sm"))
    val direct = filtered().collect().map(r =>
      (r.getString(0), r.getLong(1))).toSet
    val f1 = ResultCache.runOrRollup(spark, filtered(), rc)
    assert(f1.hit, "key-filtered aggregate must be served from the entry")
    val scanned = f1.df.queryExecution.executedPlan.toString()
    assert(scanned.contains("rollf_cache") && !scanned.contains("rollf_t/"))
    assert(f1.df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      == direct)
    // the filtered result installed under its own (filtered) identity:
    // an identical run is a plain hit…
    assert(ResultCache.run(spark, filtered(), rc).hit)
    // …and it can NEVER serve the unfiltered shape (missing groups):
    // that one rolls from the broad entry instead and must equal direct
    val unf = ResultCache.runOrRollup(spark,
      base().groupBy("kb").agg(sum("m").as("sm")), rc)
    assert(unf.hit)
    assert(unf.df.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      base().groupBy("kb").agg(sum("m").as("sm")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet)
    // range + IN forms replay too
    val rng = ResultCache.runOrRollup(spark,
      base().filter(col("ka") >= "a1" && col("kb").isin("b0", "b2"))
        .groupBy("ka").agg(count(lit(1)).as("n")), rc)
    assert(rng.hit)
    assert(rng.df.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      base().filter(col("ka") >= "a1" && col("kb").isin("b0", "b2"))
        .groupBy("ka").agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet)
    // a filter on a NON-key (aggregated-away) column cannot replay on
    // the summary — computed from base, never served wrong
    val nonKey = ResultCache.runOrRollup(spark,
      base().filter(col("m") > 30).groupBy("ka").agg(count(lit(1)).as("n")),
      rc)
    assert(!nonKey.hit && nonKey.installed)
  }

  test("rollup declines across pins: a commit makes the broad entry unusable") {
    val t = s"$root/rollpin_t"
    val rc = s"$root/rollpin_cache"
    TxnTable.commit(spark, (1L to 20L).map(i => (s"k${i % 2}", s"s${i % 5}", i))
      .toDF("ka", "kb", "m"), t, overwrite = false)
    def broad() = TxnTable.read(spark, t).groupBy("ka", "kb")
      .agg(sum("m").as("sm"))
    def narrow() = TxnTable.read(spark, t).groupBy("ka")
      .agg(sum("m").as("sm"))
    assert(!ResultCache.runOrRollup(spark, broad(), rc).hit)
    TxnTable.commit(spark, Seq(("k0", "s0", 100L)).toDF("ka", "kb", "m"), t,
      overwrite = false)
    // the narrow query now pins the NEW head — the broad entry's pins
    // are one commit behind, serving it would be wrong, so it recomputes
    val n = ResultCache.runOrRollup(spark, narrow(), rc)
    assert(!n.hit && n.installed)
    assert(n.df.filter(col("ka") === "k0").collect().head.getLong(1) ==
      (1L to 20L).filter(_ % 2 == 0).sum + 100L)
  }

  test("crash-safe install: a leftover staging dir never serves, next run clears it") {
    val extra = TxnTable.read(spark, tableA).groupBy("ka")
      .agg(max("m").cast("long").as("mx"))
    val key = ResultCache.keyOf(extra).get
    val staging = new File(cacheDir, s".stage_$key")
    staging.mkdirs()
    new File(staging, "junk").createNewFile()
    val out = ResultCache.run(spark, extra, cacheDir)
    assert(!out.hit) // staging is not an entry
    assert(!staging.exists()) // cleared by the install
    assert(ResultCache.run(spark, extra, cacheDir).hit)
  }

  test("evict drops everything outside the live key set") {
    val live = ResultCache.keyOf(q()).get
    ResultCache.run(spark, q(), cacheDir)
    val entries = new File(cacheDir).listFiles().count(f => f.isDirectory && !f.getName.startsWith("."))
    assert(entries > 1)
    val dropped = ResultCache.evict(cacheDir, Set(live))
    assert(dropped == entries - 1)
    assert(ResultCache.run(spark, q(), cacheDir).hit)
  }
}
