package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior specs for the count-min sketch operator surface: one-sided
  * estimates, unseen candidates, and the domain guard. (Streaming
  * batch-split invariance lives in EventsStreamingSpec; the oracle gate
  * is q_stream_topk.)
  */
class CountMinSpec extends SparkSpec {

  import spark.implicits._

  test("estimates dominate true counts; unseen candidates report, not vanish") {
    val data = Seq(1L, 1L, 1L, 2L, 3L).toDF("x")
    val sk = CountMin.sketch(data, "x")
    val est = CountMin.estimate(Seq(1L, 2L, 99999L).toDF("x"), sk, "x")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est(1L) >= 3L)
    assert(est(2L) >= 1L)
    // a candidate the sketch's input never saw must still be estimated
    // (possibly 0) — an inner join would silently drop it
    assert(est.contains(99999L), "unseen candidate dropped from estimate")
    assert(est(99999L) >= 0L)
  }

  test("out-of-domain items fail identically-loudly instead of wrapping") {
    def crash(v: Long): Unit = {
      val e = intercept[Exception] {
        CountMin.sketch(Seq(v).toDF("x"), "x").collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("count-min item out of")), e.toString)
    }
    crash(-1L)
    crash(CountMin.MaxItem + 1)
    // the boundary itself is admissible
    assert(CountMin.sketch(Seq(CountMin.MaxItem).toDF("x"), "x")
      .agg(sum("cnt")).head().getLong(0) == CountMin.Depth.toLong)
  }
}
