package graft.queries

import graft.QueryDef
import graft.QueryDef.sql
import graft.jobs.Jobs
import org.apache.spark.sql.functions._

/** End-to-end DAG-branch replays (SURVEY §5.2): fixture → scrape → clean →
  * typed table, checked against hand-computed golden rows. The fixtures
  * are deterministic, so the oracle is a literal VALUES table — this is
  * the strongest check in the suite: any drift anywhere in a branch's
  * lineage (scraper regex, cleaning op, dedup ordering, join shape)
  * changes some golden cell.
  *
  * The `(spark, sfDir)` contract stands but sfDir is unused — these read
  * repo fixtures, not the synthetic tables.
  */
object E2eQueries {

  val all: Seq[QueryDef] = Seq(

    // ── Zoopla branch: S1 → U1-U5/U7/U6 → F2/F3 → D2 → listings
    sql("q_e2e_zoopla",
      """SELECT CAST(ad_id AS VARCHAR) AS ad_id, link, CAST(price AS DOUBLE) AS price,
        |       CAST(bedrooms AS INT) AS bedrooms, CAST(bathrooms AS INT) AS bathrooms,
        |       CAST(living_rooms AS INT) AS living_rooms, address,
        |       CAST(distance AS DOUBLE) AS distance, subway_station
        |FROM (VALUES
        |  ('61000001', 'https://www.zoopla.co.uk/for-sale/details/61000001?search_identifier=abc',
        |   435000.0, 2, 1, 1, '12 Angel Mews, Islington, London N1', 0.3, 'Angel'),
        |  ('61000002', 'https://www.zoopla.co.uk/for-sale/details/61000002?search_identifier=abc',
        |   NULL, 3, 2, 2, '4 Pimlico Road, London SW1', 0.2, 'Pimlico'),
        |  ('61000004', 'https://www.zoopla.co.uk/for-sale/details/61000004?search_identifier=abc',
        |   687500.0, 3, 1, 1, '3 Brixton Hill, London SW2', 0.4, 'Brixton')
        |) t(ad_id, link, price, bedrooms, bathrooms, living_rooms, address, distance, subway_station)
        |ORDER BY ad_id""".stripMargin) { (s, _) =>
      Jobs.zooplaListings(s).orderBy("ad_id")
    },

    // ── Dexters branch: S2 → S3 enrichment (mapPartitions, retry) → U11 →
    //    U12 UDF → U6/U7/U9/U10/U16/U18 → listings
    sql("q_e2e_dexters",
      """SELECT CAST(ad_id AS VARCHAR) AS ad_id, street_name, CAST(price AS DOUBLE) AS price,
        |       address, CAST(bedrooms AS INT) AS bedrooms, CAST(bathrooms AS INT) AS bathrooms,
        |       CAST(reception AS INT) AS reception, link, subway_station,
        |       CAST(distance AS DOUBLE) AS distance, tube_line
        |FROM (VALUES
        |  ('71000001', 'Wimbledon Park Road', 550000.0, '101 Wimbledon Park Road, London SW18',
        |   2, 1, 1, 'https://www.dexters.co.uk/property/71000001', 'Wimbledon Park', 0.2, 'District'),
        |  ('71000002', 'Angel Lane', 725000.0, '7 Angel Lane, London N1',
        |   3, 2, 1, 'https://www.dexters.co.uk/property/71000002', 'Angel Station', 0.3, 'Northern'),
        |  ('71000003', 'Tramlink Terrace', 390000.0, '22 Tramlink Terrace, Croydon CR0',
        |   NULL, 1, 1, 'https://www.dexters.co.uk/property/71000003', NULL, NULL, NULL)
        |) t(ad_id, street_name, price, address, bedrooms, bathrooms, reception, link, subway_station, distance, tube_line)
        |ORDER BY ad_id""".stripMargin) { (s, _) =>
      Jobs.dextersListings(s).orderBy("ad_id")
    },

    // ── Savills branch (archived in the reference, README.md:20): scrape →
    //    skip-incomplete (ids 2 and 4 are the fixture's gap rows) → address
    //    concat → price parse. Positional ad ids survive the skips.
    sql("q_e2e_savills",
      """SELECT CAST(ad_id AS BIGINT) AS ad_id, CAST(price AS DOUBLE) AS price, address
        |FROM (VALUES
        |  (1, 1250000.0, 'Belgrave Mews North Belgravia, London SW1X'),
        |  (3, 875000.0,  'Clapham Common West Side Clapham, London SW4'),
        |  (5, 960000.0,  'Islington Green Islington, London N1')
        |) t(ad_id, price, address)
        |ORDER BY ad_id""".stripMargin) { (s, _) =>
      Jobs.savillsListings(s).orderBy("ad_id")
    },

    // ── Air-quality branch: S4 → JS2 → U19/U20 → readings
    sql("q_e2e_airquality",
      """SELECT site_code, measurement_date_gmt, species_code, CAST(value AS DOUBLE) AS value
        |FROM (VALUES
        |  ('KC1', '2021-03-01 00:00', 'NO2', 29.9),
        |  ('KC1', '2021-03-01 00:00', 'O3', 55.0),
        |  ('KC1', '2021-03-01 01:00', 'NO2', 0.0),
        |  ('MY1', '2021-03-01 00:00', 'NO2', 38.4),
        |  ('MY1', '2021-03-01 00:00', 'PM25', 12.1),
        |  ('MY1', '2021-03-01 01:00', 'NO2', 41.2),
        |  ('MY1', '2021-03-01 01:00', 'PM25', 11.7),
        |  ('MY1', '2021-03-01 02:00', 'NO2', 0.0)
        |) t(site_code, measurement_date_gmt, species_code, value)
        |ORDER BY site_code, measurement_date_gmt, species_code""".stripMargin) { (s, _) =>
      Jobs.airQualityReadings(s)
        .select("site_code", "measurement_date_gmt", "species_code", "value")
        .orderBy("site_code", "measurement_date_gmt", "species_code")
    },

    // ── Station-dimension job: S7 → AR4 sentinel groups → zone explode
    sql("q_e2e_stationdim",
      """SELECT subway_station, tube_line, CAST(transport_zone AS INT) AS transport_zone,
        |       CAST(zone_group AS INT) AS zone_group
        |FROM (VALUES
        |  ('Angel', 'Northern line', 1, 1),
        |  ('Brixton', 'Victoria line', 2, 2),
        |  ('Clapham Common', 'Northern line', 2, 2),
        |  ('Pimlico', 'Victoria line', 1, 1),
        |  ('Wimbledon Park', 'District line', 3, 2),
        |  ('Wimbledon Park', 'District line', 4, 2)
        |) t(subway_station, tube_line, transport_zone, zone_group)
        |ORDER BY subway_station, transport_zone""".stripMargin) { (s, _) =>
      Jobs.stationDimension(s).orderBy("subway_station", "transport_zone")
    },

    // ── The flagship, end to end: BOTH listing branches unioned behind
    //    the station_names_mapping canonicalization ('Angel Station' from
    //    Dexters only joins the dim after mapping → the 580000 average
    //    proves the mapping ran), ⟕ dim, <1 km, avg £ per station × line —
    //    the reference web app's table (README.md:4)
    sql("q_e2e_flagship",
      """SELECT subway_station, tube_line, CAST(avg_price AS DOUBLE) AS avg_price,
        |       CAST(n_listings AS BIGINT) AS n_listings
        |FROM (VALUES
        |  ('Brixton', 'Victoria line', 687500.0, 1),
        |  ('Angel', 'Northern line', 580000.0, 2),
        |  ('Wimbledon Park', 'District line', 550000.0, 1),
        |  ('Pimlico', 'Victoria line', NULL, 1)
        |) t(subway_station, tube_line, avg_price, n_listings)
        |ORDER BY avg_price DESC NULLS LAST, subway_station""".stripMargin) { (s, _) =>
      Jobs.flagshipAvgPrice(s)
    },

    // ── The flagship's second half (README.md:4 "enriched with
    //    per-station air-pollution readings"): station dim → S6 places
    //    coordinate enrichment → J3 NN bridge to open sites → readings
    //    rollup per station × species ⟕ multi-source listings aggregate.
    //    Reading averages are decimal-exact sums over the fixture values
    //    (KC1 NO2: 29.9+0.0; MY1 NO2: 38.4+41.2+0.0; MY1 PM25: 12.1+11.7)
    //    divided once — written as the same single division here. TH4 has
    //    no readings in the fixture and Clapham Common no listings: both
    //    null paths are part of the check.
    sql("q_e2e_air_flagship",
      """SELECT subway_station, site_code, CAST(avg_price AS DOUBLE) AS avg_price,
        |       CAST(n_listings AS BIGINT) AS n_listings,
        |       CAST(avg_no2 AS DOUBLE) AS avg_no2,
        |       CAST(avg_o3 AS DOUBLE) AS avg_o3,
        |       CAST(avg_pm25 AS DOUBLE) AS avg_pm25
        |FROM (VALUES
        |  ('Angel', 'TH4', 580000.0, 2, NULL, NULL, NULL),
        |  ('Brixton', 'MY1', 687500.0, 1, CAST(79.6 AS DOUBLE)/3, NULL, CAST(23.8 AS DOUBLE)/2),
        |  ('Clapham Common', 'MY1', NULL, 0, CAST(79.6 AS DOUBLE)/3, NULL, CAST(23.8 AS DOUBLE)/2),
        |  ('Pimlico', 'MY1', NULL, 1, CAST(79.6 AS DOUBLE)/3, NULL, CAST(23.8 AS DOUBLE)/2),
        |  ('Wimbledon Park', 'KC1', 550000.0, 1, CAST(29.9 AS DOUBLE)/2, 55.0, NULL)
        |) t(subway_station, site_code, avg_price, n_listings, avg_no2, avg_o3, avg_pm25)
        |ORDER BY subway_station""".stripMargin) { (s, _) =>
      Jobs.airQualityByStation(s)
    }
  )
}
