package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = Tables.lineitem(spark, sfDir)

  test("column stats match directly computed aggregates") {
    val got = Profiling.columnStats(li, Seq("l_orderkey", "l_returnflag"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    val n = li.count()
    val ndvOk = li.select("l_orderkey").distinct().count()
    assert(got("l_orderkey") === ((n, 0L, ndvOk,
      li.agg(min("l_orderkey")).head.getLong(0).toString,
      li.agg(max("l_orderkey")).head.getLong(0).toString)))
    assert(got("l_returnflag")._3 === li.select("l_returnflag").distinct().count())
  }

  test("approx-NDV form avoids the multi-distinct Expand and lands near exact") {
    val approx = Profiling.columnStats(li,
      Seq("l_orderkey", "l_suppkey", "l_returnflag"), approxNdv = true)
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profiling should be one aggregate:\n${plan.take(1200)}")
    val exact = Profiling.columnStats(li,
        Seq("l_orderkey", "l_suppkey", "l_returnflag"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    approx.collect().foreach { r =>
      val (c, est) = (r.getString(0), r.getLong(3))
      val e = exact(c).toDouble
      assert(math.abs(est - e) / e < 0.1, s"$c: est $est vs exact $e")
    }
  }

  test("winsorize clips ~2% of rows to the exact cut points; [p0,p100] is a no-op") {
    val in = li.select("l_orderkey", "l_linenumber", "l_extendedprice")
    val cuts = in.agg(
      expr("percentile(l_extendedprice, 0.01)").as("lo"),
      expr("percentile(l_extendedprice, 0.99)").as("hi")).head()
    val (lo, hi) = (cuts.getDouble(0), cuts.getDouble(1))
    val out = Profiling.winsorize(in, "l_extendedprice", 0.01, 0.99)
    val vals = out.select("l_extendedprice").collect().map(_.getDouble(0))
    assert(vals.forall(v => v >= lo && v <= hi))
    val n = vals.length.toDouble
    val clipped = vals.count(v => v == lo || v == hi)
    assert(clipped / n > 0.005 && clipped / n < 0.05, s"clipped $clipped of $n")
    // full-range cut points change nothing
    val noop = Profiling.winsorize(in, "l_extendedprice", 0.0, 1.0)
      .select("l_extendedprice").collect().map(_.getDouble(0))
    val orig = in.select("l_extendedprice").collect().map(_.getDouble(0))
    assert(noop.sorted.toSeq === orig.sorted.toSeq)
  }

  test("winsorize TakeOrdered cut points equal the percentile aggregate bit-for-bit") {
    import spark.implicits._
    // lineitem (real data, interpolated positions) + fixtures with ties,
    // tiny n, and a position landing exactly on an order statistic
    val fixtures: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      ("lineitem", li.select("l_extendedprice")),
      ("ties", Seq(1.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 3.0, 9.0, 9.0).toDF("l_extendedprice")),
      ("tiny", Seq(5.0, 1.0).toDF("l_extendedprice")),
      ("single", Seq(7.0).toDF("l_extendedprice")),
      ("integral-pos", (1 to 101).map(_.toDouble).toDF("l_extendedprice")))
    for ((name, in) <- fixtures; (pLo, pHi) <- Seq((0.01, 0.99), (0.1, 0.9), (0.25, 0.75))) {
      val agg = in.agg(expr(s"percentile(l_extendedprice, array($pLo, $pHi))"))
        .head().getSeq[Double](0)
      val expected = in.withColumn("l_extendedprice",
        when($"l_extendedprice" < agg(0), agg(0))
          .when($"l_extendedprice" > agg(1), agg(1))
          .otherwise($"l_extendedprice"))
        .collect().map(_.getDouble(0)).sorted.toSeq
      val got = Profiling.winsorize(in, "l_extendedprice", pLo, pHi)
        .collect().map(_.getDouble(0)).sorted.toSeq
      assert(got === expected, s"$name at ($pLo, $pHi)")
    }
  }

  test("madOutliers: hand fixture — the fence holds still, the spike is flagged") {
    import spark.implicits._
    // group a: 1..9 plus a 1000 spike. median of 10 values = 5.5,
    // deviations {4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5} -> MAD = 2.5;
    // fence 3*2.5 = 7.5 -> only 1000 (dev 994.5) is out.
    // group b: constant column -> MAD 0, nothing beats a zero fence times 3
    // except any deviation at all; all equal -> 0 outliers.
    val rows = (1 to 9).map(i => ("a", i.toDouble)) ++
      Seq(("a", 1000.0)) ++ Seq.fill(4)(("b", 7.0))
    val df = rows.toDF("g", "v")
    val got = Profiling.madOutliers(df, "g", "v", k = 3.0)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("a") == ((5.5, 2.5, 1L, 10L)))
    assert(got("b") == ((7.0, 0.0, 0L, 4L)))
  }

  test("madOutliers: an input med/mad column never collides with internals") {
    import spark.implicits._
    val rows = ((1 to 9).map(i => ("a", i.toDouble)) ++ Seq(("a", 1000.0)))
      .map { case (g, v) => (g, v, -1.0, -1.0) }
    val df = rows.toDF("g", "v", "med", "mad")
    val got = Profiling.madOutliers(df, "g", "v", k = 3.0)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("a") == ((5.5, 2.5, 1L, 10L)))
  }

  private def sortedRankQuantiles(vals: Seq[Long], qPcts: Seq[Int]): Map[Int, Long] = {
    val sorted = vals.sorted
    qPcts.map { qp =>
      val k = math.floor((qp / 100.0) * (sorted.length - 1)).toLong + 1
      qp -> sorted((k - 1).toInt)
    }.toMap
  }

  test("histogram quantiles equal full-sort rank statistics (skew, ties, heavy tail)") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // heavy-tailed with duplicate runs: ties straddle bucket math hard
    val data = (1 to 5000).map(_ => ("a", math.abs(rng.nextGaussian() * 1000).toLong)) ++
      (1 to 3000).map(_ => ("b", (rng.nextInt(5) * 100).toLong)) ++       // 5 distinct values
      (1 to 100).map(_ => ("c", 42L))                                     // constant group
    val df = data.toDF("g", "v").repartition(13)
    val qs = Seq(1, 25, 50, 75, 99)
    val got = Profiling.exactQuantilesByHistogram(df, "g", "v", qs, buckets = 64)
      .collect().map(r => (r.getString(0), r.getLong(1).toInt) -> r.getLong(3)).toMap
    Seq("a", "b", "c").foreach { g =>
      val expect = sortedRankQuantiles(data.filter(_._1 == g).map(_._2), qs)
      qs.foreach { qp => assert(got((g, qp)) === expect(qp), s"group $g p$qp") }
    }
    // n is reported per group
    val ns = Profiling.exactQuantilesByHistogram(df, "g", "v", Seq(50), buckets = 64)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(ns === Map("a" -> 5000L, "b" -> 3000L, "c" -> 100L))
  }

  test("histogram drift: hand TV, identical=0, absent group=max, out-of-range clamps") {
    import spark.implicits._
    val ref = Seq(("a", 0L), ("a", 0L), ("a", 1L), ("a", 1L),
      ("b", 10L), ("b", 20L)).toDF("g", "v")
    // a: ref [2,2]/4 vs cur [1,3]/4 → TV = ½(¼+¼) = 0.25; worst bin ties → b0
    val cur = Seq(("a", 0L), ("a", 1L), ("a", 1L), ("a", 1L)).toDF("g", "v")
    val got = Profiling.histogramDrift(ref, cur, "g", "v", buckets = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got("a") == ((4L, 4L, 250000L, 0L, 250000L)))
    assert(got("b")._3 === 1000000L)                     // no current rows: full drift
    // identical distribution drifts zero
    val same = Profiling.histogramDrift(ref, ref, "g", "v", buckets = 2)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(same === Map("a" -> 0L, "b" -> 0L))
    // values beyond the reference range clamp into the edge bin
    val wild = Seq(("a", 999L), ("a", -7L)).toDF("g", "v")
    val clamped = Profiling.histogramDrift(ref, wild, "g", "v", buckets = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(clamped("a")._1 === 2L)   // both out-of-range rows landed in edge bins
    assert(clamped("a")._2 === 0L)   // -7→bin0, 999→bin1: [1,1]/2 matches [2,2]/4
  }

  test("incrementally maintained histogram equals a full rescan under frozen bins") {
    import spark.implicits._
    import graft.operators.Incremental
    val base = (0 to 9).flatMap(v => Seq.fill(v + 1)(("a", v.toLong))).toDF("g", "v")
    val delta = Seq(("a", 3L), ("a", 9L), ("a", 42L), ("a", -5L)).toDF("g", "v")
    val frozen = Profiling.referenceStats(base, "g", "v")
    val maintained = Incremental.mergeAdditive(
      Profiling.histogramCounts(base, frozen, "g", "v", 5, clamp = false),
      Profiling.histogramCounts(delta, frozen, "g", "v", 5, clamp = true),
      keys = Seq("__g", "__b"))
    val rescanned = Profiling.histogramCounts(base.unionByName(delta), frozen,
      "g", "v", 5, clamp = true)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(asMap(maintained) === asMap(rescanned))
    // and the drift score off the maintained snapshot matches the direct form
    val cur = Seq(("a", 0L), ("a", 9L)).toDF("g", "v")
    val viaSnapshot = Profiling.driftFromHistogram(maintained, frozen, cur, "g", "v", 5)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val direct = Profiling.histogramDrift(base.unionByName(delta), cur, "g", "v", 5)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // direct recomputes bins over base∪delta (42/-5 widen them), so equality
    // is only guaranteed for the snapshot-vs-rescan pair above; both paths
    // still produce a finite, sane score
    assert(viaSnapshot("a") >= 0L && viaSnapshot("a") <= 1000000L)
    assert(direct("a") >= 0L && direct("a") <= 1000000L)
  }

  test("histogram quantiles at sf0.1: exact vs Spark percentile on 600k prices") {
    // scale stress: wide value domain (cents over ~1e7 range), real skew,
    // 1024 buckets actually pruning — the shape the operator exists for
    import spark.implicits._
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.1")
      .select($"l_returnflag".as("g"),
        floor($"l_extendedprice" * 100).cast("long").as("v"))
    val qs = Seq(25, 50, 75)
    val got = Profiling.exactQuantilesByHistogram(li, "g", "v", qs)
      .collect().map(r => (r.getString(0), r.getLong(1).toInt) -> r.getLong(3)).toMap
    val flags = li.select("g").distinct().as[String].collect()
    flags.foreach { g =>
      val vals = li.filter($"g" === g).select("v").as[Long].collect().sorted
      qs.foreach { qp =>
        val k = math.floor((qp / 100.0) * (vals.length - 1)).toLong + 1
        assert(got((g, qp)) === vals((k - 1).toInt), s"group $g p$qp at sf0.1")
      }
    }
  }

  test("histogram quantiles: single-row group, negatives, and the group bound") {
    import spark.implicits._
    val df = Seq(("a", -5L), ("a", -1L), ("a", 0L), ("b", 99L)).toDF("g", "v")
    val got = Profiling.exactQuantilesByHistogram(df, "g", "v", Seq(0, 50, 100), buckets = 4)
      .collect().map(r => (r.getString(0), r.getLong(1).toInt) -> r.getLong(3)).toMap
    assert(got(("a", 0)) === -5L && got(("a", 50)) === -1L && got(("a", 100)) === 0L)
    assert(got(("b", 0)) === 99L && got(("b", 50)) === 99L && got(("b", 100)) === 99L)
    val wide = (1 to 50).map(i => (s"g$i", i.toLong)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Profiling.exactQuantilesByHistogram(wide, "g", "v", Seq(50), maxGroups = 10)
    }
    assert(e.getMessage.contains("maxGroups"))
  }

  test("linearFitComponents: exact slope on a hand line; constant x flags b_den=0") {
    import spark.implicits._
    // y = 3 + 2x exactly → b_num/b_den = 2; plus one noisy group
    val df = Seq(
      ("line", 0L, 3L), ("line", 1L, 5L), ("line", 2L, 7L), ("line", 3L, 9L),
      ("noisy", 0L, 0L), ("noisy", 1L, 3L), ("noisy", 2L, 3L),
      ("const", 5L, 1L), ("const", 5L, 9L)
    ).toDF("g", "x", "y")
    val got = Profiling.linearFitComponents(df, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (n, bn, bd) = got("line")
    assert(n == 4 && bd != 0 && bn.toDouble / bd == 2.0)
    // noisy: n=3, sx=3, sy=6, sxy=9, sxx=5 → b_num=27-18=9, b_den=15-9=6
    assert(got("noisy") == ((3L, 9L, 6L)))
    assert(got("const")._3 == 0L) // slope undefined, explicitly
    intercept[IllegalArgumentException] {
      Profiling.linearFitComponents(Seq(("g", 1.0, 1L)).toDF("g", "x", "y"),
        "g", "x", "y")
    }
  }
}
