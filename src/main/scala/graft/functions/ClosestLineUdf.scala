package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** U12 `closest_line` (pipeline.py:480-501) — the one reference op that is
  * genuinely procedural (SURVEY §2.12): scan a token list produced by
  * `sub_values` for the first London-Underground entry and reassemble the
  * (station, distance, line) triple, joining two-token station names.
  *
  * Reference semantics preserved:
  *  - a hit is `tokens(i) == "London Underground"` or `tokens(i)` ∈ the
  *    Underground lines list (pipeline.py:350-351), skipping i == 0;
  *  - if the token two before the hit has no space, the station name spans
  *    two tokens (pipeline.py:485-492) — join tokens(i-3, i-2);
  *  - first hit wins; no hit → null triple (subway_per_house maps it to
  *    NaN, pipeline.py:519-523).
  * Deviation (documented): the reference indexes `i-3` unguarded, which in
  * Python silently wraps around to the list tail; we require the window to
  * exist and treat an underflowing hit as no-hit instead of garbage.
  */
object ClosestLineUdf {

  val UndergroundLines: Set[String] = Set(
    "Bakerloo", "Central", "Circle", "District", "DLR", "Hammersmith & City",
    "Jubilee", "Metropolitan", "Northern", "Piccadilly", "Victoria",
    "Waterloo & City")

  case class NearbyTube(subway_station: String, distance: String, tube_line: String)

  def closestLine(tokens: Seq[String]): Option[NearbyTube] = {
    if (tokens == null) return None
    var i = 1
    while (i < tokens.length) {
      val t = tokens(i)
      if (t == "London Underground" || UndergroundLines.contains(t)) {
        if (i >= 2 && !tokens(i - 2).contains(" ")) {
          if (i >= 3)
            return Some(NearbyTube(s"${tokens(i - 3)} ${tokens(i - 2)}", tokens(i - 1), t))
          // two-token join impossible at the list head: treat as no-hit
        } else if (i >= 2) {
          return Some(NearbyTube(tokens(i - 2), tokens(i - 1), t))
        }
      }
      i += 1
    }
    None
  }

  /** Seq[String] => struct<subway_station,distance,tube_line> (null on no hit). */
  val asUdf: UserDefinedFunction = udf((tokens: Seq[String]) => closestLine(tokens))
}
