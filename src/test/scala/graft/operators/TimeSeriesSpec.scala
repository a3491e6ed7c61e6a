package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Behavior specs for hourly resample + forward fill: gap materialization,
  * carry-forward values, and per-key spine independence.
  */
class TimeSeriesSpec extends SparkSpec {

  import spark.implicits._

  private def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")

  test("gaps materialize with the last observation carried forward") {
    // key a: hours 1, 4 observed -> 2, 3 filled with hour-1's sum
    // two rows in hour 1 prove the aggregate sums before filling
    val df = Seq(
      ("a", ts(1), 10L), ("a", ts(1), 5L), ("a", ts(4), 7L)
    ).toDF("k", "t", "v")
    val got = TimeSeries.hourlyResampleFfill(df, "k", "t", "v")
      .orderBy("hour_ts")
      .select("val", "is_filled").as[(Long, Boolean)].collect().toSeq
    assert(got == Seq((15L, false), (15L, true), (15L, true), (7L, false)))
  }

  test("each key gets its own spine — no cross-key range bleed") {
    val df = Seq(
      ("a", ts(1), 1L), ("a", ts(5), 1L), // a spans 5 hours
      ("b", ts(3), 2L)                    // b is a single point
    ).toDF("k", "t", "v")
    val got = TimeSeries.hourlyResampleFfill(df, "k", "t", "v")
      .groupBy("k").count().as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 5L, "b" -> 1L))
  }

  test("dense series come back untouched") {
    val df = (1 to 4).map(h => ("a", ts(h), h.toLong)).toDF("k", "t", "v")
    val out = TimeSeries.hourlyResampleFfill(df, "k", "t", "v")
    assert(out.filter($"is_filled").isEmpty)
    assert(out.count() == 4)
  }

  test("linear interpolation: exact integer fill on a hand-computed series") {
    import org.apache.spark.sql.functions._
    // known at hours 0, 3, 5 with values 100, 400, 0: hour 1 -> 200,
    // hour 2 -> 300, hour 4 -> 400 + (0-400)*1 div 2 = 200 (negative
    // delta truncates toward zero identically on both engines)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:30:00")
    def at(h: Int) = new java.sql.Timestamp(
      base.getTime + h * 3600L * 1000L)
    val df = Seq(("a", at(0), 100L), ("a", at(3), 400L), ("a", at(5), 0L))
      .toDF("k", "ts", "v")
    val out = TimeSeries.hourlyResampleInterp(df, "k", "ts", "v")
      .orderBy("hour_ts")
      .collect().map(r => (r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == Seq((100L, false), (200L, true), (300L, true),
      (400L, false), (200L, true), (0L, false)))
  }

  test("mergeIntervals: a long early interval swallows later ones (max, not lag)") {
    val iv = Seq(
      ("a", 1L, 20L),  // covers everything below
      ("a", 2L, 3L), ("a", 5L, 6L), ("a", 20L, 22L), // 20 touches → merges
      ("a", 24L, 25L),                               // gap → new island
      ("b", 1L, 2L), ("b", 4L, 5L)                   // other key untouched
    ).toDF("k", "lo", "hi")
    val got = TimeSeries.mergeIntervals(iv, "k", "lo", "hi")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set(
      ("a", 1L, 22L, 4L), ("a", 24L, 25L, 1L),
      ("b", 1L, 2L, 1L), ("b", 4L, 5L, 1L)))
  }

  test("crossCorrelation: hand correlogram, including zero-overlap lags") {
    // clicks in hours 1 and 2 (counts 2, 1); purchases in hours 2 and 3
    // (counts 1, 3). score(0)=a(2)·b(2)=1; score(1)=a(1)·b(2)+a(2)·b(3)=5;
    // score(2)=a(1)·b(3)=6; score(3)=0 (no overlap)
    val df = Seq(
      ("click", ts(1)), ("click", ts(1)), ("click", ts(2)),
      ("purchase", ts(2)), ("purchase", ts(3)), ("purchase", ts(3)),
      ("purchase", ts(3)), ("view", ts(1))
    ).toDF("event_type", "t")
    val got = TimeSeries.crossCorrelation(df, "t", "event_type",
        "click", "purchase", maxLag = 3)
      .orderBy("lag")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 1L), (1L, 5L), (2L, 6L), (3L, 0L)))
  }
}
