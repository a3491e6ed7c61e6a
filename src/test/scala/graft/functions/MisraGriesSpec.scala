package graft.functions

import graft.SparkSpec
import graft.operators.Curation
import org.apache.spark.sql.functions._

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  test("sketch survivors are a superset of θ-heavy items under eviction pressure") {
    // 200 distinct items >> capacity 9; items h1/h2 hold ~25% and ~15%
    val stream =
      Seq.fill(500)("h1") ++ Seq.fill(300)("h2") ++
        (1 to 1200).map(i => s"tail${i % 200}")
    val n = stream.size
    val mg = new MisraGriesAggregator(capacity = 9)
    // capacity+1 = 10 -> anything over n/10 must survive any order
    Seq(stream, stream.reverse, scala.util.Random.shuffle(stream)).foreach { s =>
      val out = s.toDF("t").repartition(7).as[String].select(mg.toColumn).head()
      assert(out.contains("h1") && out.contains("h2"),
        s"heavy items evicted: ${out.keys.toSeq.sorted}")
      assert(out.size <= 9)
      // lower-bound property: sketch count never exceeds the true count
      assert(out("h1") <= 500 && out("h2") <= 300)
    }
  }

  test("heavyHitterTokens is exact and layout-invariant (verify pass, not sketch counts)") {
    val docs = Seq(
      (1L, "x x x x x y y y z"),
      (2L, "x x y y q r s t u v w a b c d e f g")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Curation.heavyHitterTokens(df, "text", thetaDen = 10, capacity = 9)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val out = run(docs)
    // 27 tokens total: x=7 (25.9%), y=5 (18.5%), others <= 1/10
    assert(out.map(t => t._1 -> t._2) === Set("x" -> 7L, "y" -> 5L))
    assert(out === run(docs.repartition(5)))
  }
}
