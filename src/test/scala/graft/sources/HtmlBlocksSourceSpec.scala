package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlBlocksSourceSpec extends SparkSpec {

  private val fixture = s"${HtmlScrapers.FixturesDir}/zoopla_listings.html"

  test("DSv2 connector emits byte-identical blocks to wholetext+split") {
    val viaConnector = spark.read
      .format(classOf[HtmlBlocksSource].getName)
      .option("blockClass", "listing-result")
      .load(fixture)
      .orderBy("pos")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val viaSplit = spark.read.option("wholetext", "true").text(fixture)
      .select(posexplode(split(col("value"), """class="listing-result"""")).as(Seq("pos", "block")))
      .orderBy("pos")
      .collect().map(r => (r.getInt(0).toLong, r.getString(1)))
    assert(viaConnector.toSeq === viaSplit.toSeq)
  }

  test("raw-delimiter mode matches the wiki <tr> split with positions") {
    val wiki = s"${HtmlScrapers.FixturesDir}/wiki_stations.html"
    val viaConnector = spark.read
      .format(classOf[HtmlBlocksSource].getName)
      .option("delimiter", "<tr>")
      .load(wiki)
      .orderBy("pos")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val viaSplit = spark.read.option("wholetext", "true").text(wiki)
      .select(posexplode(split(col("value"), "<tr>")).as(Seq("pos", "block")))
      .orderBy("pos")
      .collect().map(r => (r.getInt(0).toLong, r.getString(1)))
    assert(viaConnector.toSeq === viaSplit.toSeq)
  }

  test("scrapers running through the connector still extract the fixture ads") {
    val ads = HtmlScrapers.zooplaListings(spark).collect()
    assert(ads.length > 0)
    assert(ads.forall(_.getAs[String]("href").nonEmpty))
  }

  test("a directory input becomes one partition per page file") {
    val dir = java.nio.file.Files.createTempDirectory("htmlsrc").toFile
    try {
      val src = java.nio.file.Paths.get(fixture)
      java.nio.file.Files.copy(src, dir.toPath.resolve("page1.html"))
      java.nio.file.Files.copy(src, dir.toPath.resolve("page2.html"))
      val df = spark.read.format(classOf[HtmlBlocksSource].getName)
        .option("blockClass", "listing-result")
        .load(dir.toString)
      assert(df.rdd.getNumPartitions === 2)
      val single = spark.read.format(classOf[HtmlBlocksSource].getName)
        .option("blockClass", "listing-result").load(fixture)
      assert(df.count() === 2 * single.count())
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
