package graft

import org.apache.spark.sql.functions._

/** The schema-fingerprint tripwire on every table accessor: the driver
  * regenerates the testdata between rounds (and has already changed the
  * events timestamp unit once) — a renamed, added, or retyped column must
  * fail at the accessor with a NAMED diff, not as an unresolved-attribute
  * analysis error mid-query. */
class TablesSchemaSpec extends SparkSpec {

  test("every driver table passes its fingerprint on the current vintage") {
    Tables.names.foreach { n =>
      assert(Tables.load(spark, sfDir, n).schema.fields.nonEmpty, n)
    }
  }

  test("a renamed column fails with a diff naming both directions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-schema").toFile
    Tables.region(spark, sfDir)
      .withColumnRenamed("r_name", "r_label")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val e = intercept[IllegalStateException] {
      Tables.region(spark, dir.getPath)
    }
    assert(e.getMessage.contains("schema drift in table 'region'"))
    assert(e.getMessage.contains("missing=[r_name]"))
    assert(e.getMessage.contains("unexpected=[r_label]"))
  }

  test("a retyped column names the offending type") {
    val dir = java.nio.file.Files.createTempDirectory("graft-schema").toFile
    Tables.region(spark, sfDir)
      .withColumn("r_regionkey", col("r_regionkey").cast("string"))
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val e = intercept[IllegalStateException] {
      Tables.region(spark, dir.getPath)
    }
    assert(e.getMessage.contains("retyped=[r_regionkey: string (expected int)]"))
  }

  test("an added column is reported as unexpected") {
    val dir = java.nio.file.Files.createTempDirectory("graft-schema").toFile
    Tables.nation(spark, sfDir)
      .withColumn("n_comment", lit("x"))
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val e = intercept[IllegalStateException] {
      Tables.nation(spark, dir.getPath)
    }
    assert(e.getMessage.contains("unexpected=[n_comment]"))
  }

  test("the accepted timestamp vintages all pass for events.ts") {
    // current vintage reads as one of the accepted forms and normalizes
    val ty = Tables.events(spark, sfDir).schema("ts").dataType
    assert(ty === org.apache.spark.sql.types.TimestampType)
  }
}
