package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.sql
import graft.operators.NearestNeighbourJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** J3 nearest-neighbour (argmin-distance) join queries — SURVEY §2.4.
  *
  * The reference maps each station to its L1-closest air-quality site
  * (LondonAir_sites_subway_station_mapping.ipynb:46-80). The testdata has no
  * coordinates, so both sides get deterministic 2-D coords derived from
  * their own columns; the oracle replicates the derivation and checks the
  * argmin with a row_number window. Both engine modes (broadcast and
  * grid-bucketed) must produce the identical result, so they share the
  * oracle SQL text.
  */
object NnQueries {

  private val oracleSql =
    """WITH d AS (
      |  SELECT c_custkey, s_suppkey,
      |         ABS(c_acctbal / 100 - s_acctbal / 100)
      |           + ABS(CAST(c_custkey % 89 AS DOUBLE) - CAST(s_suppkey % 89 AS DOUBLE)) AS dist
      |  FROM customer CROSS JOIN supplier),
      |r AS (SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY dist, s_suppkey) AS rn FROM d)
      |SELECT c_custkey, s_suppkey AS nearest_supp, dist FROM r WHERE rn = 1
      |ORDER BY c_custkey""".stripMargin

  private def leftCoords(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey"),
      (col("c_acctbal") / 100).as("lx"),
      (col("c_custkey") % 89).cast("double").as("ly"))

  private def rightCoords(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d).select(col("s_suppkey"),
      (col("s_acctbal") / 100).as("rx"),
      (col("s_suppkey") % 89).cast("double").as("ry"))

  val all: Seq[QueryDef] = Seq(

    // broadcast mode: crossJoin(broadcast) + one hash aggregate min(struct)
    sql("q_nn_broadcast", oracleSql) { (s, d) =>
      NearestNeighbourJoin.broadcastArgmin(
          left = leftCoords(s, d), right = rightCoords(s, d),
          leftKeys = Seq("c_custkey"),
          dist = abs(col("lx") - col("rx")) + abs(col("ly") - col("ry")),
          tieBreak = Seq(col("s_suppkey")),
          payload = Seq("nearest_supp" -> col("s_suppkey")))
        .orderBy("c_custkey")
    },

    // grid mode: 3×3-cell equi-join + proven-winner check + broadcast
    // fallback — the 100 TB shape; must match the broadcast result exactly
    sql("q_nn_grid", oracleSql) { (s, d) =>
      NearestNeighbourJoin.gridArgmin(
          left = leftCoords(s, d), leftKey = "c_custkey", lx = "lx", ly = "ly",
          right = rightCoords(s, d), rightPayload = "s_suppkey", rx = "rx", ry = "ry",
          cellWidth = 8.0)
        .withColumnRenamed("s_suppkey", "nearest_supp")
        .select("c_custkey", "nearest_supp", "dist")
        .orderBy("c_custkey")
    }
  )
}
