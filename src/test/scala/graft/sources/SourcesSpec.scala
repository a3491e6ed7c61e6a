package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {

  private val messySchema = StructType(Seq(
    StructField("record_id", LongType),
    StructField("name", StringType),
    StructField("value", DoubleType)))

  test("quarantined JSON read splits ok/corrupt in one pass, keeping partial fields") {
    // project data columns alongside the corrupt column — Spark (by
    // design) refuses plans whose referenced columns are ONLY the
    // internal corrupt column, so a bare filter+count would throw
    val df = Sources.readJsonQuarantined(spark,
        "/root/repo/fixtures/messy_records.jsonl", messySchema)
      .select(col("record_id"), col("name"), col("value"), col("_corrupt_record"))
    val rows = df.collect()
    val good = rows.filter(_.isNullAt(3))
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(good.length === 5)
    assert(bad.collect().length === 3)
    // a type-mismatched field quarantines the line but keeps what parsed
    val partial = bad.filter(col("record_id") === 4).collect()
    assert(partial.length === 1)
    assert(partial.head.getAs[String]("name") === "gamma")
    assert(partial.head.isNullAt(partial.head.fieldIndex("value")))
    // fully unparseable lines carry their raw text and nothing else
    val raw = bad.filter(col("record_id").isNull)
      .select("_corrupt_record").collect().map(_.getString(0)).toSet
    assert(raw === Set("{record_id: 3, this line is not json",
      "complete garbage line"))
  }
}
