package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Per-row enrichment (SURVEY §2.1 S3/S6): the reference loops an HTTP GET
  * per DataFrame row on the driver (pipeline.py:509-523; google_maps_api
  * cell 6, with an IndexError fallback re-query). The scale shape is
  * `mapPartitions`: one client per PARTITION, rows streamed through it,
  * retry local to the partition — n_rows/n_partitions round-trips per
  * task and no driver involvement.
  *
  * `Client` is the network seam. The container is zero-egress, so the
  * shipped client is a deterministic fake keyed on the URL (flaky on first
  * call for every third key, to exercise the retry path for real).
  */
object Enrichment {

  /** One instance per partition; must be Serializable-constructible from
    * the closure (hold no sockets at plan time). */
  trait Client extends Serializable {
    /** Fetch the enrichment payload for a URL. May throw; caller retries. */
    def fetch(url: String): String
  }

  /** Deterministic stand-in for the Dexters per-listing subway fetch
    * (pipeline.py:455-462): returns the `ul.list-information` text the
    * sub_values/closest_line chain consumes. Fails transiently on the
    * first call per flaky key — retry must succeed. */
  final class FixtureSubwayClient extends Client {
    private val seen = scala.collection.mutable.Set[String]()
    override def fetch(url: String): String = {
      val id = url.split("/").last
      if (id.toLong % 3 == 0 && seen.add(url))
        throw new java.io.IOException(s"transient fetch failure for $url")
      id.toLong % 3 match {
        case 0 => "\nWimbledon Park - 0.2 miles - District\n"
        case 1 => "\nAngel Station - 0.3 miles - Northern\n"
        case 2 => "\nCroydon Central - 0.1 miles - National Rail\n"
      }
    }
  }

  /** Deterministic stand-in for the Google-Places station-coordinate
    * fetch (google_maps_api.ipynb cell 6: station name → geometry.location
    * lat/lng): returns "lat,lon" for the fixture stations. A miss throws,
    * exactly like the reference's IndexError on an empty results list. */
  final class FixturePlacesClient extends Client {
    private val coords = Map(
      "Angel" -> "51.5300,-0.0500",
      "Brixton" -> "51.4627,-0.1145",
      "Clapham Common" -> "51.4618,-0.1384",
      "Pimlico" -> "51.4892,-0.1334",
      "Wimbledon Park" -> "51.4343,-0.1992")
    override def fetch(url: String): String =
      coords.getOrElse(url,
        throw new java.util.NoSuchElementException(s"no place result for $url"))
  }

  /** S3/S6: partition-parallel enrichment with bounded retry. Appends
    * `payload` (the fetched text) to each row. */
  def fetchPerRow(df: DataFrame, urlCol: String, mkClient: () => Client,
                  maxRetries: Int = 2): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema.add(StructField("payload", StringType))
    val urlIdx = df.schema.fieldIndex(urlCol)
    val rdd = df.rdd.mapPartitions { rows =>
      val client = mkClient() // one client per partition, not per row
      rows.map { r =>
        val url = r.getString(urlIdx)
        var attempt = 0
        var result: String = null
        var last: Throwable = null
        // a null return counts as a failed attempt too — otherwise a
        // client that maps misses to null would loop forever
        while (result == null && attempt <= maxRetries) {
          attempt += 1
          try result = client.fetch(url)
          catch { case e: Throwable => last = e }
        }
        if (result == null)
          throw (if (last != null) last
                 else new java.io.IOException(s"enrichment returned null for $url"))
        Row.fromSeq(r.toSeq :+ result)
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
