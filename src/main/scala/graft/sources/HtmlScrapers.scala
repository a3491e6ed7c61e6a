package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTML-extraction sources (SURVEY §2.1 S1/S2/S7), fixture-driven.
  *
  * The reference scrapes live pages with BeautifulSoup
  * (pipeline.py:164-258, :354-414; google_maps_api.ipynb cell 10). This
  * container is zero-egress, so the network boundary is a fixture file and
  * extraction is pure Spark: `wholetext` scan → block split → per-field
  * regexp. At scale the same code runs over a crawl dump (one HTML page
  * per row) — the extraction layer is already distributed; only the
  * fetcher is environment-specific.
  */
object HtmlScrapers {

  val FixturesDir = "/root/repo/fixtures"

  private def attr(block: Column, cls: String): Column =
    regexp_extract(block, s"""class="$cls"[^>]*>([^<]*)<""", 1)

  /** Split one page into per-listing blocks via the DSv2 connector
    * ([[HtmlBlocksSource]]): one InputPartition per page file, one row per
    * block. The leading fragment (page head before the first block marker)
    * is dropped by the callers' "has a href" filter. */
  private def readBlocks(spark: SparkSession, path: String, blockClass: String): DataFrame =
    spark.read.format(classOf[HtmlBlocksSource].getName)
      .option("blockClass", blockClass)
      .load(path)
      .select("block")

  /** S1 Zoopla listing scrape (pipeline.py:164-258): one row per ad with
    * the raw string fields the cleaning layer (U1-U5) expects. */
  def zooplaListings(spark: SparkSession,
                     path: String = s"$FixturesDir/zoopla_listings.html"): DataFrame = {
    val b = col("block")
    readBlocks(spark, path, "listing-result")
      .select(
        regexp_extract(b, """href="([^"]*)"""", 1).as("href"),
        regexp_replace(attr(b, "listing-price"), "&pound;", "£").as("price_raw"),
        attr(b, "listing-beds").as("bedrooms_raw"),
        attr(b, "listing-baths").as("bathrooms_raw"),
        attr(b, "listing-living").as("living_raw"),
        attr(b, "listing-address").as("address"),
        regexp_extract(b, """data-kind="([^"]*)"""", 1).as("transport_type"),
        attr(b, "listing-transport").as("transport_raw"))
      .filter(col("href") =!= "")
  }

  /** S2 Dexters listing scrape (pipeline.py:354-414). */
  def dextersListings(spark: SparkSession,
                      path: String = s"$FixturesDir/dexters_listings.html"): DataFrame = {
    val b = col("block")
    readBlocks(spark, path, "result")
      .select(
        regexp_extract(b, """href="([^"]*)"""", 1).as("href"),
        attr(b, "result-street").as("street_name"),
        regexp_replace(attr(b, "result-price"), "&pound;", "£").as("price_raw"),
        attr(b, "result-address").as("address"),
        attr(b, "result-beds").as("bedrooms_raw"),
        attr(b, "result-baths").as("bathrooms_raw"),
        attr(b, "result-reception").as("reception_raw"))
      .filter(col("href") =!= "")
  }

  /** Savills listing scrape (reference 01_web_scraping/00_Archive/
    * savills_scraper_main.ipynb cell 3 — the archived third scraper branch).
    * The notebook keys its result map by a running 1-based counter
    * (`id += 1` per `li.sv-results-listing__item`), which the connector's
    * within-page `pos` reproduces (pos 0 is the pre-marker page head). Ads
    * missing any of price/address1/address2 are skipped (the notebook's
    * try/except-continue), leaving gaps in the id sequence exactly as the
    * reference does. */
  def savillsListings(spark: SparkSession,
                      path: String = s"$FixturesDir/savills_listings.html"): DataFrame = {
    val b = col("block")
    spark.read.format(classOf[HtmlBlocksSource].getName)
      .option("blockClass", "sv-results-listing__item")
      .load(path)
      .select(
        col("pos").as("ad_id"),
        regexp_replace(attr(b, "sv-property-price__value"), "&pound;", "£").as("price_raw"),
        attr(b, "sv-details__address1").as("address1"),
        attr(b, "sv-details__address2").as("address2"))
      .filter(col("price_raw") =!= "" && col("address1") =!= "" && col("address2") =!= "")
  }

  /** S7 Wikipedia station-table scrape (google_maps_api.ipynb:426-439):
    * emits (pos, station, lines, zone_raw, is_sentinel) rows — the sentinel
    * rows ('Travelcard Zone N') drive the list_divider segmentation (AR4). */
  def wikiStationRows(spark: SparkSession,
                      path: String = s"$FixturesDir/wiki_stations.html"): DataFrame = {
    val row = col("row")
    spark.read.format(classOf[HtmlBlocksSource].getName)
      .option("delimiter", "<tr>")
      .load(path)
      .select(col("pos"), col("block").as("row"))
      .filter(row.contains("station-row") || row.contains("station-cell"))
      .select(
        col("pos"),
        regexp_extract(row, """class="station-cell"[^>]*>([^<]*)<""", 1).as("station"),
        regexp_extract(row, """class="lines-cell"[^>]*>([^<]*)<""", 1).as("lines"),
        regexp_extract(row, """class="zone-cell"[^>]*>([^<]*)<""", 1).as("zone_raw"),
        col("row").contains("Travelcard").as("is_sentinel"),
        regexp_extract(row, """class="station-row"[^>]*>([^<]*)<""", 1).as("sentinel_text"))
  }
}
