package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.sql
import graft.operators.NearestNeighbourJoin
import graft.queries.RelationalQueries.exactAvg
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The air-quality flagship composite at synthetic scale (reference
  * README.md:4, second half; database_schema.sql:54-58's
  * site_subway_station_mapping bridge): the same operator chain as
  * `Jobs.airQualityByStation` — station dim → NN bridge → per-site
  * readings rollup ⟕ listings aggregate — over tables big enough to bench.
  *
  * Casting: nation=stations, supplier=monitoring sites (coords derived
  * deterministically from keys, exactly like NnQueries), customer=listings
  * (c_nationkey the station FK, c_acctbal the price), lineitem=readings
  * (l_suppkey the site FK, l_returnflag the species, l_quantity the value).
  *
  * Scale shape: both aggregates are map-side-combined hash aggregations
  * shuffled on their FK; the bridge is a broadcast argmin (sites are the
  * reference's ~100-row dimension); the final assembly broadcasts the
  * (|stations|-row) aggregates. One pass over each fact table, no
  * repeated scan, no window.
  */
object CompositeQueries {

  val all: Seq[QueryDef] = Seq(

    sql("q02_air_flagship",
      """WITH st AS (
        |  SELECT n_nationkey, n_name,
        |         CAST((n_nationkey * 13) % 29 AS DOUBLE) AS sx,
        |         CAST((n_nationkey * 7) % 23 AS DOUBLE) AS sy
        |  FROM nation),
        |si AS (
        |  SELECT s_suppkey,
        |         CAST((s_suppkey * 17) % 29 AS DOUBLE) AS rx,
        |         CAST((s_suppkey * 5) % 23 AS DOUBLE) AS ry
        |  FROM supplier),
        |d AS (
        |  SELECT n_nationkey, n_name, s_suppkey,
        |         ABS(sx - rx) + ABS(sy - ry) AS dist
        |  FROM st CROSS JOIN si),
        |b AS (
        |  SELECT *, row_number() OVER (PARTITION BY n_nationkey
        |                               ORDER BY dist, s_suppkey) AS rn
        |  FROM d),
        |bridge AS (
        |  SELECT n_nationkey, n_name, s_suppkey AS site_supp FROM b WHERE rn = 1),
        |l AS (
        |  SELECT c_nationkey,
        |         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |         COUNT(*) AS n_listings
        |  FROM customer GROUP BY c_nationkey),
        |r AS (
        |  SELECT l_suppkey,
        |         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)
        |           / COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS avg_qty_r,
        |         CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)
        |           / COUNT(CASE WHEN l_returnflag = 'A' THEN 1 END) AS avg_qty_a,
        |         CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)
        |           / COUNT(CASE WHEN l_returnflag = 'N' THEN 1 END) AS avg_qty_n
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT bridge.n_name, CAST(bridge.site_supp AS BIGINT) AS site_supp,
        |       l.avg_price, CAST(COALESCE(l.n_listings, 0) AS BIGINT) AS n_listings,
        |       r.avg_qty_r, r.avg_qty_a, r.avg_qty_n
        |FROM bridge
        |LEFT JOIN l ON bridge.n_nationkey = l.c_nationkey
        |LEFT JOIN r ON bridge.site_supp = r.l_suppkey
        |ORDER BY n_name""".stripMargin) { (s, d) =>
      val stations = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"),
        ((col("n_nationkey") * 13) % 29).cast("double").as("sx"),
        ((col("n_nationkey") * 7) % 23).cast("double").as("sy"))
      val sites = Tables.supplier(s, d).select(col("s_suppkey"),
        ((col("s_suppkey") * 17) % 29).cast("double").as("rx"),
        ((col("s_suppkey") * 5) % 23).cast("double").as("ry"))
      val bridge = NearestNeighbourJoin.broadcastArgmin(
        left = stations, right = sites,
        leftKeys = Seq("n_nationkey", "n_name"),
        dist = abs(col("sx") - col("rx")) + abs(col("sy") - col("ry")),
        tieBreak = Seq(col("s_suppkey")),
        payload = Seq("site_supp" -> col("s_suppkey")))
      val listings = Tables.customer(s, d).groupBy("c_nationkey")
        .agg(exactAvg(col("c_acctbal")).as("avg_price"),
          count(lit(1)).as("n_listings"))
      def speciesAvg(flag: String, as: String) =
        (sum(when(col("l_returnflag") === flag, col("l_quantity"))
            .cast(DecimalType(18, 2))).cast("double")
          / count(when(col("l_returnflag") === flag, lit(1)))).as(as)
      val readings = Tables.lineitem(s, d).groupBy("l_suppkey")
        .agg(speciesAvg("R", "avg_qty_r"), speciesAvg("A", "avg_qty_a"),
          speciesAvg("N", "avg_qty_n"))
      bridge.select(col("n_name"), col("n_nationkey"),
          col("site_supp").cast("long").as("site_supp"))
        .join(broadcast(listings),
          col("n_nationkey") === col("c_nationkey"), "left")
        .join(broadcast(readings),
          col("site_supp") === col("l_suppkey"), "left")
        .select(col("n_name"), col("site_supp"), col("avg_price"),
          coalesce(col("n_listings"), lit(0L)).as("n_listings"),
          col("avg_qty_r"), col("avg_qty_a"), col("avg_qty_n"))
        .orderBy("n_name")
    }
  )
}
