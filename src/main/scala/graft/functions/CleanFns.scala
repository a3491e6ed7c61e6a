package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's string-cleaning layer (SURVEY §2.8 "U-ops") as pure
  * `Column => Column` functions — native Catalyst expressions, zero UDFs, so
  * every one of them stays inside whole-stage codegen and is usable in any
  * pushdown-friendly plan.
  *
  * Reference citations are to
  * itsnotcarina/dataengineering_londonhousingmap, file
  * `02_data_processing_and_storing/housing_web_scraping_pipeline_final_all_scrapers.py`
  * (abbreviated pipeline.py).
  */
object CleanFns {

  /** U1 `to_num` (pipeline.py:142-144): strip all non-[0-9.] from a price
    * string and cast ("£435,000" → 435000.0). */
  def toNum(c: Column): Column =
    regexp_replace(c, "[^0-9.]", "").try_cast("double")

  /** U1 money-typed variant — DecimalType for exact warehouse arithmetic. */
  def toMoney(c: Column, precision: Int = 18, scale: Int = 4): Column =
    regexp_replace(c, "[^0-9.]", "").try_cast(DecimalType(precision, scale))

  /** U2 `is_dropped` (pipeline.py:146-150): a price string is VALID iff it
    * contains only £, commas and digits ("POA", "Offers over…" → invalid). */
  def isValidPrice(c: Column): Column = c.rlike("^[£,0-9]+$")

  /** U3 ad-id from URL (pipeline.py:211-213): `split("?")[0].split("/")[3]`. */
  def adIdFromUrl(c: Column): Column =
    try_element_at(split(try_element_at(split(c, "\\?"), lit(1)), "/"), lit(4))

  /** U4 URL prefixing (pipeline.py:219, 409). */
  def prefixUrl(prefix: String, c: Column): Column = concat(lit(prefix), c)

  /** U5 miles split (pipeline.py:253-257): "0.3 miles Angel" →
    * (distance=0.3, station="Angel"). */
  def milesDistance(c: Column): Column =
    try_element_at(split(c, " miles "), lit(1)).try_cast("double")
  def milesStation(c: Column): Column = try_element_at(split(c, " miles "), lit(2))

  /** U6 digit extraction with asymmetric defaults (pipeline.py:388-395):
    * first run of digits, else `default` (bathrooms→0, receptions→1). */
  def firstDigits(c: Column, default: Int): Column = {
    val d = regexp_extract(c, "\\d+", 0)
    when(d === "", lit(default)).otherwise(d.cast("int"))
  }

  /** U7 leading-int parse (pipeline.py:385): `"3 bedrooms"` → 3. */
  def leadingInt(c: Column): Column =
    try_element_at(split(c, " "), lit(1)).try_cast("int")

  /** U8 digit-strip (pipeline.py:428-430): remove all non-digits → int. */
  def digitsOnlyInt(c: Column): Column =
    regexp_replace(c, "\\D", "").try_cast("int")

  /** U9 currency cleanup (pipeline.py:630-631): drop '£' and ','. */
  def stripCurrency(c: Column): Column = translate(c, "£,", "")

  /** U10 unit strip (pipeline.py:632): "0.2m" → 0.2. */
  def stripUnitM(c: Column): Column =
    regexp_replace(c, "m$", "").try_cast("double")

  /** U11 `sub_values` (pipeline.py:464-477): split on \n, drop empties,
    * split each on '-', flatten, trim. Pure higher-order array fns. */
  def subValues(c: Column): Column =
    transform(
      flatten(transform(
        filter(split(c, "\n"), x => x =!= ""),
        x => split(x, "-"))),
      x => trim(x))

  /** U13 `get_tube_dist` (pipeline.py:530-534): last whitespace token. */
  def lastToken(c: Column): Column = try_element_at(split(c, " "), lit(-1))

  /** U14 `strip_tube` (pipeline.py:535-540): all but the last token. */
  def dropLastToken(c: Column): Column = {
    val parts = split(c, " ")
    array_join(slice(parts, lit(1), size(parts) - 1), " ")
  }

  /** U15 `hasNumbers` (pipeline.py:541-542). */
  def hasDigit(c: Column): Column = c.rlike("[0-9]")

  /** U16 `clean_tube_stop_string` (pipeline.py:545-557): if the station
    * string contains a forbidden carrier word, keep only the last token. */
  val ForbiddenCarriers: Seq[String] =
    Seq("London Overground", "Railway", "Network Rail", "Tramlink")
  def cleanStationName(c: Column, forbidden: Seq[String] = ForbiddenCarriers): Column = {
    val hit = forbidden.map(w => c.contains(w)).reduce(_ || _)
    when(hit, lastToken(c)).otherwise(c)
  }

  /** U17 `clean_tube_dist` (pipeline.py:560-576) collapsed to conditional
    * projections: when distance has no digit and station is non-null, the
    * distance leaked into the station string — repair both columns. The
    * reference does filter+row-surgery+merge; one `when` projection replaces
    * all of it (SURVEY F10). */
  def repairedDistance(dist: Column, station: Column): Column =
    when(!hasDigit(dist) && station.isNotNull, lastToken(station)).otherwise(dist)
  def repairedStation(dist: Column, station: Column): Column =
    when(!hasDigit(dist) && station.isNotNull, dropLastToken(station)).otherwise(station)

  /** U18 `victoria_clean_stop` (pipeline.py:579-602): disambiguate "Victoria"
    * as line-prefix vs station, applied only to rows containing 'Victoria'. */
  def victoriaCleanStop(c: Column): Column = {
    val toks = split(c, " ")
    when(c.contains("Victoria"),
      when(try_element_at(toks, lit(1)) === "Victoria" && size(toks) > 1, try_element_at(toks, lit(2)))
        .otherwise(lit("Victoria")))
      .otherwise(c)
  }

  /** U19 null normalization (pipeline.py:290): literal 'None' → NULL.
    * Only 'None' — the reference gives '' its own op (U20, ''→0,
    * pipeline.py:747), so composing U19∘U20 must keep '' = 0. */
  def noneToNull(c: Column): Column =
    when(c === "None", lit(null)).otherwise(c)

  /** U20 empty→zero (pipeline.py:747): air-quality '' value → 0.0. */
  def emptyToZero(c: Column): Column =
    when(c === "" || c.isNull, lit(0.0)).otherwise(c.try_cast("double"))

  /** U22 dict-valued map (google_maps_api.ipynb:175): 1→"Yes", 0→"No". */
  def yesNo(c: Column): Column = when(c === 1, "Yes").otherwise("No")

  /** U24 timestamp slug (pipeline.py:348). */
  def timestampSlug: Column = timestampSlugOf(current_timestamp())
  /** U24 over an arbitrary timestamp — the deterministic, oracle-checkable
    * form (current_timestamp() can't hash-match an oracle run). */
  def timestampSlugOf(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd_HH-mm-ss")

  /** U25 line-name filter (google_maps_api.ipynb:459-469): keep array
    * elements containing " line" but not ending "line)"/"lines)". */
  def keepLineNames(arr: Column): Column =
    filter(arr, x => x.contains(" line") && !x.rlike("lines?\\)$"))
}
