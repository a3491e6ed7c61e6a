package graft.jobs

import graft.functions.{CleanFns, ClosestLineUdf}
import graft.operators.NearestNeighbourJoin
import graft.sources.{Enrichment, HtmlScrapers, RestJson}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference DAG's three branches + the station-dimension notebook as
  * composed Spark jobs (SURVEY §3.1, §7.1): scrape → clean → typed table.
  * Each is one lineage — no CSV staging hop between clean and load
  * (pipeline.py:312-327 → :842-844 collapses into a single plan).
  */
object Jobs {

  /** Zoopla branch (pipeline.py:164-334): S1 scrape → U1-U5 cleaning →
    * F2 national-rail filter → D2 keep-first ad_id dedup → typed listings. */
  def zooplaListings(spark: SparkSession): DataFrame = {
    val raw = HtmlScrapers.zooplaListings(spark)
    val cleaned = raw
      .filter(col("transport_type") =!= "national_rail_station") // F2
      .select(
        CleanFns.adIdFromUrl(col("href")).as("ad_id"), // U3 on the raw href
        CleanFns.prefixUrl("https://www.zoopla.co.uk", col("href")).as("link"), // U4
        when(CleanFns.isValidPrice(col("price_raw")), // U2 gate, U1 parse
          CleanFns.toNum(col("price_raw"))).otherwise(lit(null)).as("price"),
        CleanFns.leadingInt(col("bedrooms_raw")).as("bedrooms"), // U7
        CleanFns.firstDigits(col("bathrooms_raw"), 0).as("bathrooms"), // U6
        CleanFns.firstDigits(col("living_raw"), 1).as("living_rooms"), // U6
        col("address"),
        CleanFns.milesDistance(col("transport_raw")).as("distance"), // U5
        CleanFns.milesStation(col("transport_raw")).as("subway_station")) // U5
      .filter(col("subway_station").isNotNull) // F3 shape guard
    // D2: deterministic keep-first by ad_id (scrape order = link order)
    val w = Window.partitionBy("ad_id").orderBy("link")
    cleaned.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Dexters branch (pipeline.py:354-627): S2 scrape → S3 per-listing
    * enrichment (mapPartitions + retry) → U11 sub_values → U12
    * closest_line → U6/U7 rooms → U9/U10 price/distance parse → U16-U18
    * station cleanup → typed listings. */
  def dextersListings(spark: SparkSession): DataFrame = {
    val raw = HtmlScrapers.dextersListings(spark)
      .withColumn("link", CleanFns.prefixUrl("https://www.dexters.co.uk", col("href")))
    val enriched = Enrichment.fetchPerRow(raw, "link",
      () => new Enrichment.FixtureSubwayClient)
    enriched
      .withColumn("nearby", ClosestLineUdf.asUdf(CleanFns.subValues(col("payload"))))
      .select(
        regexp_extract(col("href"), "([0-9]+)", 1).as("ad_id"),
        col("street_name"),
        CleanFns.toNum(CleanFns.stripCurrency(col("price_raw"))).as("price"), // U9
        col("address"),
        CleanFns.leadingInt(col("bedrooms_raw")).as("bedrooms"), // U7
        CleanFns.firstDigits(col("bathrooms_raw"), 0).as("bathrooms"), // U6
        CleanFns.firstDigits(col("reception_raw"), 1).as("reception"), // U6
        col("link"),
        CleanFns.victoriaCleanStop( // U18
          CleanFns.cleanStationName( // U16
            col("nearby.subway_station"))).as("subway_station"),
        CleanFns.stripUnitM( // U10 "0.2 miles" → "0.2"
          regexp_replace(col("nearby.distance"), " miles", "m")).as("distance"),
        col("nearby.tube_line").as("tube_line"))
  }

  /** Savills branch (reference 01_web_scraping/00_Archive/
    * savills_scraper_main.ipynb — archived upstream; implemented for
    * surface completeness, README.md:20 names it as the third scraper):
    * scrape → address1+' '+address2 concat (the notebook's
    * `adress_extracted`, U23 in spirit) → U9/U1 price parse → typed
    * listings. The archived notebook never loads this branch into the
    * warehouse, so the job stops at the typed table. */
  def savillsListings(spark: SparkSession): DataFrame =
    HtmlScrapers.savillsListings(spark)
      .select(
        col("ad_id"),
        CleanFns.toNum(CleanFns.stripCurrency(col("price_raw"))).as("price"),
        concat_ws(" ", col("address1"), col("address2")).as("address"))

  /** Air-quality branch (pipeline.py:689-816): S4 JSON → JS2 explode →
    * U19 'None'→null → U20 ''→0 → T2 timestamp parse → typed readings. */
  def airQualityReadings(spark: SparkSession): DataFrame =
    RestJson.airQualityRaw(spark)
      .select(col("site_code"), col("measurement_date_gmt"),
        col("species_code"),
        CleanFns.emptyToZero( // U20 ('' and null → 0)
          CleanFns.noneToNull(col("value_raw"))).as("value"), // U19
        to_timestamp(col("measurement_date_gmt"), "yyyy-MM-dd HH:mm").as("ts")) // T2

  /** Station-dimension job (google_maps_api.ipynb cells 3-18): S7 wiki
    * scrape → AR4 sentinel zone segmentation → U25-adjacent line keep →
    * multi-valued Zone explode (the durable PV1/PV2 semantic) → J2
    * name-mapping join → dimension table. */
  def stationDimension(spark: SparkSession): DataFrame = {
    val rows = HtmlScrapers.wikiStationRows(spark)
    // AR4/W2: running sentinel count = Travelcard-zone group id
    val w = Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grouped = rows
      .withColumn("zone_group",
        sum(when(col("is_sentinel"), 1).otherwise(0)).over(w))
      .filter(!col("is_sentinel") && col("station") =!= "")
    // multi-valued Zone ("3,4") → long form directly (SURVEY §2.10 note:
    // the PV1→PV2 round-trip's durable semantic is split+explode)
    grouped
      .select(col("station"), col("lines"), col("zone_group"),
        explode(split(col("zone_raw"), ",")).as("transport_zone"))
      .select(col("station").as("subway_station"),
        col("lines").as("tube_line"),
        col("transport_zone").cast("int").as("transport_zone"),
        col("zone_group").cast("int").as("zone_group"))
  }

  /** station_names_mapping (reference database_schema.sql:61-66;
    * google_maps_api.ipynb:733-734): scraped station name → canonical
    * dimension name. The reference seeds this table by hand in the
    * warehouse; here it is the equivalent literal dimension. */
  def stationNameMapping(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("Angel Station", "Angel"),
      ("Clapham Common Station", "Clapham Common"),
      ("Victoria Station", "Victoria"))
      .toDF("scraped_name", "canonical_name")
  }

  /** Both listing branches united on the flagship's shared columns, with
    * scraped station names canonicalized through the mapping dimension
    * (broadcast left join + coalesce — J2 as the reference's
    * station_names_mapping table applies it). */
  def canonicalListings(spark: SparkSession): DataFrame = {
    val shared = Seq("subway_station", "price", "distance")
    val zoopla = zooplaListings(spark)
      .select(col("subway_station"), col("price").cast("double"),
        col("distance").cast("double"))
    val dexters = dextersListings(spark)
      .select(col("subway_station"), col("price").cast("double"),
        col("distance").cast("double"))
    zoopla.unionByName(dexters)
      .join(broadcast(stationNameMapping(spark)),
        col("subway_station") === col("scraped_name"), "left")
      .withColumn("subway_station",
        coalesce(col("canonical_name"), col("subway_station")))
      .select(shared.map(col): _*)
  }

  /** The flagship join (SURVEY §3.3): multi-source listings ⟕ station
    * dimension on canonical station name, distance < 1 km, avg price per
    * station × line (A1). */
  def flagshipAvgPrice(spark: SparkSession): DataFrame = {
    val listings = canonicalListings(spark)
    val dim = stationDimension(spark)
    // (station, line) projection deduped first — a multi-zone station would
    // otherwise fan out its listings through the join
    val dimLines = dim.select("subway_station", "tube_line").distinct()
    listings
      .filter(col("distance") < 1.0)
      .join(broadcast(dimLines), Seq("subway_station"), "left") // J1
      .groupBy("subway_station", "tube_line")
      .agg(avg("price").as("avg_price"), count(lit(1)).as("n_listings"))
      .orderBy(desc_nulls_last("avg_price"), col("subway_station"))
  }

  /** The second half of the reference's flagship question (README.md:4
    * "enriched with per-station air-pollution readings";
    * database_schema.sql:54-58's site_subway_station_mapping bridge):
    * station dim → S6 places-API coordinate enrichment → J3
    * nearest-neighbour bridge to open monitoring sites → hourly readings
    * rolled up per station × species, joined with the multi-source
    * listings aggregate. One row per station. */
  def airQualityByStation(spark: SparkSession): DataFrame = {
    val stations = stationDimension(spark).select("subway_station").distinct()
    val withCoords = Enrichment.fetchPerRow(stations, "subway_station",
        () => new Enrichment.FixturePlacesClient)
      .select(col("subway_station"),
        split(col("payload"), ",").getItem(0).cast("double").as("lat"),
        split(col("payload"), ",").getItem(1).cast("double").as("lon"))
    val sites = RestJson.openSites(spark)
      .select(col("site_code"), col("latitude"), col("longitude"))
    val bridge = NearestNeighbourJoin.broadcastArgmin(
      left = withCoords, right = sites,
      leftKeys = Seq("subway_station"),
      dist = abs(col("lat") - col("latitude")) + abs(col("lon") - col("longitude")),
      tieBreak = Seq(col("site_code")),
      payload = Seq("site_code" -> col("site_code")))
    // per-site species averages, decimal-exact (sum through DECIMAL(18,2),
    // one IEEE division) so the result is partition-order independent
    def speciesAvg(sp: String, as: String) =
      (sum(when(col("species_code") === sp, col("value"))
          .cast(org.apache.spark.sql.types.DecimalType(18, 2))).cast("double")
        / count(when(col("species_code") === sp, lit(1)))).as(as)
    val bySite = airQualityReadings(spark).groupBy("site_code")
      .agg(speciesAvg("NO2", "avg_no2"), speciesAvg("O3", "avg_o3"),
        speciesAvg("PM25", "avg_pm25"))
    val listings = canonicalListings(spark)
      .filter(col("distance") < 1.0)
      .groupBy("subway_station")
      .agg(avg("price").as("avg_price"), count(lit(1)).as("n_listings"))
    bridge.select("subway_station", "site_code")
      .join(broadcast(listings), Seq("subway_station"), "left")
      .withColumn("n_listings", coalesce(col("n_listings"), lit(0L)))
      .join(broadcast(bySite), Seq("site_code"), "left")
      .select("subway_station", "site_code", "avg_price", "n_listings",
        "avg_no2", "avg_o3", "avg_pm25")
      .orderBy("subway_station")
  }
}
