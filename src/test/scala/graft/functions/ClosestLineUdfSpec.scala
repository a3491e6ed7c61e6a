package graft.functions

import graft.SparkSpec
import graft.functions.ClosestLineUdf.{closestLine, NearbyTube}

class ClosestLineUdfSpec extends SparkSpec {

  test("two-token station join when token before distance has no space") {
    assert(closestLine(Seq("Wimbledon", "Park", "0.2 miles", "District"))
      === Some(NearbyTube("Wimbledon Park", "0.2 miles", "District")))
  }

  test("single-token path when preceding token already has a space") {
    assert(closestLine(Seq("Angel Station", "0.3 miles", "Northern"))
      === Some(NearbyTube("Angel Station", "0.3 miles", "Northern")))
  }

  test("'London Underground' literal counts as a line") {
    assert(closestLine(Seq("East", "Putney", "0.5 miles", "London Underground"))
      === Some(NearbyTube("East Putney", "0.5 miles", "London Underground")))
  }

  test("no underground entry → None") {
    assert(closestLine(Seq("Croydon", "0.1 miles", "National Rail")) === None)
    assert(closestLine(Seq()) === None)
    assert(closestLine(null) === None)
  }

  test("first hit wins when several lines appear") {
    assert(closestLine(Seq("Angel Station", "0.3 miles", "Northern",
        "Bank Station", "0.9 miles", "Central"))
      === Some(NearbyTube("Angel Station", "0.3 miles", "Northern")))
  }

  test("index-underflow guards: hit at position 0/1 cannot reassemble") {
    assert(closestLine(Seq("Northern")) === None)        // i == 0 skipped
    assert(closestLine(Seq("x", "Northern")) === None)   // window underflow
  }
}
