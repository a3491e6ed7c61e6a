package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REST-JSON sources (SURVEY §2.1 S4/S5), fixture-driven: the LondonAir
  * payload shapes (@-prefixed attribute keys, nested Data/Site arrays)
  * parsed with declared schemas + explode — pipeline.py:712-765 and
  * LondonAir_site_information_collection.ipynb:46-126 re-expressed as
  * JS1-JS3. The fixture file stands in for the HTTP GET; payload→rows is
  * the engine's job either way.
  */
object RestJson {

  val FixturesDir = "/root/repo/fixtures"

  val readingSchema: StructType = StructType(Seq(
    StructField("AirQualityData", StructType(Seq(
      StructField("@SiteCode", StringType),
      StructField("Data", ArrayType(StructType(Seq(
        StructField("@MeasurementDateGMT", StringType),
        StructField("@SpeciesCode", StringType),
        StructField("@Value", StringType))))))))))

  /** S4 + JS2: per-site air-quality payloads → one row per reading, raw
    * string values (cleaning is the caller's job, as in the reference). */
  def airQualityRaw(spark: SparkSession,
                    path: String = s"$FixturesDir/londonair_site_data.json"): DataFrame =
    spark.read.schema(readingSchema).json(path)
      .select(col("AirQualityData.`@SiteCode`").as("site_code"),
        explode(col("AirQualityData.Data")).as("d"))
      .select(col("site_code"),
        col("d.`@MeasurementDateGMT`").as("measurement_date_gmt"),
        col("d.`@SpeciesCode`").as("species_code"),
        col("d.`@Value`").as("value_raw"))

  val sitesSchema: StructType = StructType(Seq(
    StructField("Sites", StructType(Seq(
      StructField("Site", ArrayType(StructType(Seq(
        StructField("@SiteCode", StringType),
        StructField("@SiteName", StringType),
        StructField("@Latitude", StringType),
        StructField("@Longitude", StringType),
        StructField("@DateClosed", StringType),
        StructField("@SiteType", StringType))))))))))

  /** S5 + JS3 + F4: monitoring-site info → typed site table, open sites
    * only (DateClosed == ''). */
  def openSites(spark: SparkSession,
                path: String = s"$FixturesDir/londonair_sites.json"): DataFrame =
    // the sites payload is one pretty-printed document, not JSON lines —
    // without multiLine the reader yields one corrupt (all-null) record
    // per physical line and the explode silently drops everything
    spark.read.option("multiLine", "true").schema(sitesSchema).json(path)
      .select(explode(col("Sites.Site")).as("s"))
      .select(col("s.`@SiteCode`").as("site_code"),
        col("s.`@SiteName`").as("site_name"),
        col("s.`@Latitude`").cast("double").as("latitude"),
        col("s.`@Longitude`").cast("double").as("longitude"),
        col("s.`@DateClosed`").as("date_closed"),
        col("s.`@SiteType`").as("site_type"))
      .filter(col("date_closed") === "")
}
