package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join at every salt factor") {
    val facts = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_linenumber")
    val dims = Tables.orders(spark, sfDir)
      .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")
    val plain = facts.join(dims, "l_orderkey")
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    Seq(1, 4, 16).foreach { f =>
      val salted = Skew.saltedJoin(facts, dims, Seq("l_orderkey"),
          saltFrom = "l_linenumber", saltFactor = f)
        .select("l_orderkey", "l_linenumber", "o_orderpriority")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
      assert(salted.toSeq === plain.toSeq, s"saltFactor=$f")
    }
  }

  test("salted join spreads a hot key over the salt space") {
    // one key carries 90% of the fact rows; after salting the hot key's
    // rows occupy several distinct (key, salt) buckets
    val facts = spark.range(10000)
      .select(when($"id" < 9000, 0L).otherwise($"id").as("k"), $"id".as("v"))
    val salts = facts
      .withColumn("__salt", pmod(xxhash64($"v"), lit(8)).cast("int"))
      .filter($"k" === 0).select("__salt").distinct().count()
    assert(salts >= 6, s"hot key only landed in $salts of 8 salt buckets")
  }
}
