package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class CleanFnsSpec extends SparkSpec {
  import spark.implicits._

  private def run1(in: Seq[String], fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Any] =
    in.toDF("c").select(fn(col("c")).as("r")).collect().toSeq.map(r => if (r.isNullAt(0)) null else r.get(0))

  test("U1 toNum strips currency formatting") {
    assert(run1(Seq("£435,000", "POA", "1,234.56", ""), CleanFns.toNum)
      === Seq(435000.0, null, 1234.56, null))
  }

  test("U2 isValidPrice accepts only £,digits strings") {
    assert(run1(Seq("£435,000", "POA", "Offers over £500,000", "£12"), CleanFns.isValidPrice)
      === Seq(true, false, false, true))
  }

  test("U3 adIdFromUrl takes 4th slash segment before query string") {
    assert(run1(Seq("https://www.zoopla.co.uk/for-sale?id=1", "nope"), CleanFns.adIdFromUrl)
      === Seq("for-sale", null))
  }

  test("U5 miles split") {
    assert(run1(Seq("0.3 miles Angel"), CleanFns.milesDistance) === Seq(0.3))
    assert(run1(Seq("0.3 miles Angel", "junk"), CleanFns.milesStation) === Seq("Angel", null))
  }

  test("U6 firstDigits asymmetric defaults") {
    assert(run1(Seq("2 baths", "none"), c => CleanFns.firstDigits(c, 0)) === Seq(2, 0))
    assert(run1(Seq("no digits"), c => CleanFns.firstDigits(c, 1)) === Seq(1))
  }

  test("U13/U14 last-token split-off") {
    assert(run1(Seq("Wimbledon Park 0.4m"), CleanFns.lastToken) === Seq("0.4m"))
    assert(run1(Seq("Wimbledon Park 0.4m"), CleanFns.dropLastToken) === Seq("Wimbledon Park"))
  }

  test("U16 forbidden-carrier cleanup keeps last token only on hit") {
    assert(run1(Seq("London Overground Hackney", "Angel"), c => CleanFns.cleanStationName(c))
      === Seq("Hackney", "Angel"))
  }

  test("U17 repair moves distance out of station only when distance has no digit") {
    val df = Seq(("no digits", "Wimbledon Park 0.4m"), ("0.3m", "Angel 0.9m"))
      .toDF("dist", "station")
    val out = df.select(
      CleanFns.repairedDistance($"dist", $"station").as("d"),
      CleanFns.repairedStation($"dist", $"station").as("s")).collect()
    assert(out(0) === Row("0.4m", "Wimbledon Park"))
    assert(out(1) === Row("0.3m", "Angel 0.9m"))
  }

  test("U18 victoria disambiguation") {
    assert(run1(Seq("Victoria Pimlico", "Brixton Victoria", "Victoria", "Angel"),
      CleanFns.victoriaCleanStop) === Seq("Pimlico", "Victoria", "Victoria", "Angel"))
  }

  test("U19∘U20 composition: '' stays 0, 'None' goes null") {
    val df = Seq("None", "", "3.5").toDF("c")
    val out = df.select(
      CleanFns.emptyToZero(CleanFns.noneToNull($"c")).as("v")).collect().map(r =>
        if (r.isNullAt(0)) null else r.get(0))
    assert(out.toSeq === Seq(0.0, 0.0, 3.5))
  }

  // seeded-generator property tests (the scalatest-scalacheck bridge
  // artifact isn't in the offline cache; a fixed-seed loop keeps the
  // property-test shape and reproducibility)
  private val rng = new scala.util.Random(42)

  test("property: toNum inverts thousand-separated formatting (200 seeds)") {
    val ns = Seq.fill(200)(rng.nextInt(Int.MaxValue).toLong)
    val formatted = ns.map(n => "£" + "%,d".format(n))
    assert(run1(formatted, CleanFns.toNum) === ns.map(_.toDouble))
  }

  test("property: isValidPrice accepts exactly the £/comma/digit alphabet (200 seeds)") {
    val alphabet = "£,0123456789abcXYZ -.&"
    val ss = Seq.fill(200)(
      (0 until 1 + rng.nextInt(12)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    val expected = ss.map(_.forall(ch => ch == '£' || ch == ',' || ch.isDigit))
    assert(run1(ss, CleanFns.isValidPrice) === expected)
  }

  test("property: victoriaCleanStop is total and non-null on non-empty strings (200 seeds)") {
    val words = Seq("Victoria", "Pimlico", "Angel", "Brixton", "Oval")
    val ss = Seq.fill(200)(
      (0 until 1 + rng.nextInt(3)).map(_ => words(rng.nextInt(words.length))).mkString(" "))
    val out = run1(ss, CleanFns.victoriaCleanStop)
    assert(out.size == ss.size && out.forall(_ != null))
  }
}
