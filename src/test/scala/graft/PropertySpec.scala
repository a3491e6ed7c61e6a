package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-driven invariants (raw scalacheck — the scalatest bridge
  * artifact isn't in the offline cache, so Prop/Test are driven directly
  * with a fixed seed; failures print the shrunk counterexample). */
class PropertySpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(100)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def check(label: String, p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, s"$label: ${res.status}")
  }

  // ── HLL sketch algebra (pure: no Spark session involved) ──────────────

  private def hll = new graft.functions.HllAggregator(11)

  private def sketchOf(values: Seq[Long]): Array[Byte] =
    values.foldLeft(hll.zero)((b, v) => hll.reduce(b, v))

  test("property: HLL merge is commutative and zero is the identity") {
    val gen = for {
      a <- Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))
      b <- Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))
    } yield (a, b)
    check("commutative", Prop.forAll(gen) { case (a, b) =>
      // merge mutates its first arg — rebuild sketches per order
      val ab = hll.finish(hll.merge(sketchOf(a), sketchOf(b)))
      val ba = hll.finish(hll.merge(sketchOf(b), sketchOf(a)))
      val withZero = hll.finish(hll.merge(sketchOf(a), hll.zero))
      ab == ba && withZero == hll.finish(sketchOf(a))
    })
  }

  test("property: HLL estimate is invariant to how the input is partitioned") {
    val gen = for {
      vs <- Gen.listOfN(500, Gen.choose(0L, 10000L))
      cut <- Gen.choose(0, 500)
    } yield (vs, cut)
    check("partition-invariant", Prop.forAll(gen) { case (vs, cut) =>
      val (l, r) = vs.splitAt(cut)
      hll.finish(hll.merge(sketchOf(l), sketchOf(r))) == hll.finish(sketchOf(vs))
    })
  }

  test("property: HLL idempotence — duplicates never change the sketch") {
    val gen = Gen.listOf(Gen.choose(0L, 1000L))
    check("idempotent", Prop.forAll(gen) { vs =>
      java.util.Arrays.equals(sketchOf(vs ++ vs), sketchOf(vs)) &&
        java.util.Arrays.equals(sketchOf(vs), sketchOf(vs.distinct))
    })
  }

  // ── AsOfJoin vs an in-memory reference implementation ──────────────────

  test("property: AsOfJoin matches the per-row reference, ties included") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._

    // few keys + few timestamps → collisions (same-key same-ts right rows)
    // are common, exercising the deterministic tie-break
    val rowGen = for {
      k <- Gen.choose(0, 3)
      ts <- Gen.choose(0L, 20L)
      id <- Gen.choose(0L, 1000L)
    } yield (k, ts, id)
    val gen = for {
      left <- Gen.listOfN(30, rowGen)
      right <- Gen.listOfN(30, rowGen)
    } yield (left, right)

    val p = Prop.forAll(gen) { case (left, right) =>
      val lDf = left.toDF("k", "ts", "lid")
      val rDf = right.toDF("k", "ts", "rid")
      val got = graft.operators.AsOfJoin
        .asOf(lDf, rDf, Seq("k"), "ts", "ts", payload = Seq("rid"))
        .select("k", "ts", "lid", "asof_rid")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .sortBy(t => (t._1, t._2, t._3))
      // reference: greatest (ts, rid) among same-key right rows with
      // rts <= lts — the operator's documented tie-break
      val expected = left.map { case (k, lts, lid) =>
        val cands = right.filter(r => r._1 == k && r._2 <= lts)
        (k, lts, lid,
          if (cands.isEmpty) None
          else Some(cands.map(r => (r._2, r._3)).max._2))
      }.sortBy(t => (t._1, t._2, t._3))
      // rows are multiset-compared: duplicate left rows produce duplicates
      got.toSeq.sorted == expected.toSeq.sorted
    }
    val res = SCTest.check(params.withMinSuccessfulTests(12), p)
    assert(res.passed, s"asof: ${res.status}")
  }
}
