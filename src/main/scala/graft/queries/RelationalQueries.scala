package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.sql
import graft.functions.CleanFns
import graft.operators.Profiling
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's relational surface (SURVEY §2.1–§2.7, §2.9–§2.10) as
  * driver-verifiable queries over the synthetic testdata tables.
  *
  * Each query is the Spark-first expression of one operator row from
  * SURVEY §2; the oracle is the simplest DuckDB SQL producing the identical
  * result (the oracle need not mirror the mechanism — only the output).
  */
object RelationalQueries {

  /** Exact, order-independent sum of a 2-decimal double column: route the
    * sum through DECIMAL(18,2) so partition/merge order can't flip low bits,
    * then cast back to DOUBLE for a stable output schema. */
  private[queries] def exactSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")
  /** Exact mean built from exactSum / count — one IEEE division, both
    * engines produce the identical double. */
  private[queries] def exactAvg(c: Column): Column = exactSum(c) / count(lit(1))

  val all: Seq[QueryDef] = Seq(

    // ── A1/J1/J5/O3/F: the flagship — avg price per station (<1 km) becomes
    //    avg extendedprice per nation for low-quantity lineitems; two
    //    broadcast dimension joins, group-avg, order, limit.
    //    (reference: README.md:4, webapplication_screens.png)
    sql("q01_flagship",
      """SELECT n_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |       COUNT(*) AS n_listings
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE l_quantity < 25
        |GROUP BY n_name
        |ORDER BY avg_price DESC, n_name
        |LIMIT 10""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val sup = Tables.supplier(s, d)
      val nat = Tables.nation(s, d)
      li.filter(col("l_quantity") < 25)
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(exactAvg(col("l_extendedprice")).as("avg_price"),
             count(lit(1)).as("n_listings"))
        .orderBy(desc("avg_price"), col("n_name"))
        .limit(10)
    },

    // ── A1 simple form (the driver's own example shape)
    sql("q_agg_sum",
      """SELECT l_returnflag, CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty, COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(sum("l_quantity").cast("double").as("sum_qty"), count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")
    },

    // ── A1 multi-measure: exact decimal-routed sums and means
    sql("q_agg_stats",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |       COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").cast("double").as("sum_qty"),
             exactSum(col("l_extendedprice")).as("sum_price"),
             exactAvg(col("l_discount")).as("avg_disc"),
             count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ── Benford first-digit screen (Profiling.benfordFirstDigit): the
    //    fabricated-numbers / broken-ETL tripwire — observed first-digit
    //    frequencies in integer permille against the precomputed
    //    log-uniform expectation (no engine evaluates a log). One digit
    //    projection + one 9-bucket aggregate; always 9 rows.
    sql("q_profile_benford",
      """WITH d AS (
        |  SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders),
        |v AS (SELECT digit FROM d WHERE digit BETWEEN 1 AND 9),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
        |c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
        |e AS (SELECT * FROM (VALUES (1, 301), (2, 176), (3, 125), (4, 97),
        |      (5, 79), (6, 67), (7, 58), (8, 51), (9, 46)) t(digit, exp_permille))
        |SELECT e.digit, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt,
        |       (COALESCE(c.cnt, 0) * 1000) // n AS obs_permille,
        |       CAST(e.exp_permille AS BIGINT) AS exp_permille,
        |       CAST(ABS((COALESCE(c.cnt, 0) * 1000) // n - e.exp_permille) AS BIGINT)
        |         AS dev_permille
        |FROM e LEFT JOIN c USING (digit) CROSS JOIN n
        |ORDER BY digit""".stripMargin) { (s, d) =>
      graft.operators.Profiling.benfordFirstDigit(
        Tables.orders(s, d), "o_totalprice")
    },

    // ── ANALYZE-style column profiling: one scan, all stats together —
    //    the statistics pass behind broadcast/skew/pruning decisions.
    //    Exact NDV here (oracle-checkable); the 100 TB form flips
    //    approxNdv=true and is a single no-Expand aggregate.
    sql("q_profile_stats",
      """SELECT * FROM (
        |  SELECT 'l_orderkey' AS column_name, COUNT(l_orderkey) AS n,
        |         CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |         COUNT(DISTINCT l_orderkey) AS ndv,
        |         CAST(MIN(l_orderkey) AS VARCHAR) AS min_v, CAST(MAX(l_orderkey) AS VARCHAR) AS max_v
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_suppkey', COUNT(l_suppkey),
        |         CAST(SUM(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |         COUNT(DISTINCT l_suppkey),
        |         CAST(MIN(l_suppkey) AS VARCHAR), CAST(MAX(l_suppkey) AS VARCHAR)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag', COUNT(l_returnflag),
        |         CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |         COUNT(DISTINCT l_returnflag),
        |         CAST(MIN(l_returnflag) AS VARCHAR), CAST(MAX(l_returnflag) AS VARCHAR)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_linestatus', COUNT(l_linestatus),
        |         CAST(SUM(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |         COUNT(DISTINCT l_linestatus),
        |         CAST(MIN(l_linestatus) AS VARCHAR), CAST(MAX(l_linestatus) AS VARCHAR)
        |  FROM lineitem)
        |ORDER BY column_name""".stripMargin) { (s, d) =>
      Profiling.columnStats(Tables.lineitem(s, d),
          Seq("l_orderkey", "l_suppkey", "l_returnflag", "l_linestatus"))
        .orderBy("column_name")
    },

    // ── P1 select/reorder (pipeline.py:746)
    sql("q_proj_select",
      "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey") { (s, d) =>
      Tables.nation(s, d).select("n_nationkey", "n_name").orderBy("n_nationkey")
    },

    // ── P2 rename (google_maps_api.ipynb:178)
    sql("q_proj_rename",
      """SELECT s_suppkey AS supplier_id, s_name AS supplier_name
        |FROM supplier ORDER BY supplier_id""".stripMargin) { (s, d) =>
      Tables.supplier(s, d)
        .select(col("s_suppkey").as("supplier_id"), col("s_name").as("supplier_name"))
        .orderBy("supplier_id")
    },

    // ── P3 drop columns (google_maps_api.ipynb cell 7)
    sql("q_proj_drop",
      """SELECT p_partkey, p_brand, p_size, p_retailprice
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).drop("p_name", "p_type").orderBy("p_partkey")
    },

    // ── P4 constant column (pipeline.py:745)
    sql("q_proj_lit",
      """SELECT r_regionkey, r_name, 'wikipedia' AS src, CAST(1 AS INT) AS flag
        |FROM region ORDER BY r_regionkey""".stripMargin) { (s, d) =>
      Tables.region(s, d)
        .withColumn("src", lit("wikipedia")).withColumn("flag", lit(1))
        .orderBy("r_regionkey")
    },

    // ── P5 null-column schema extension (pipeline.py:506)
    sql("q_proj_nullcol",
      """SELECT n_nationkey, CAST(NULL AS DOUBLE) AS distance,
        |       CAST(NULL AS VARCHAR) AS subway_station
        |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      Tables.nation(s, d).select(col("n_nationkey"),
          lit(null).cast("double").as("distance"),
          lit(null).cast("string").as("subway_station"))
        .orderBy("n_nationkey")
    },

    // ── F1-style regex predicate (pipeline.py:146-150 applied as filter)
    sql("q_filter_rlike",
      """SELECT p_partkey, p_name FROM part
        |WHERE regexp_matches(p_name, '^(red|blue) ') ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).filter(col("p_name").rlike("^(red|blue) "))
        .select("p_partkey", "p_name").orderBy("p_partkey")
    },

    // ── F2 inequality filter (pipeline.py:201-202)
    sql("q_filter_neq",
      """SELECT event_id, event_type FROM events
        |WHERE event_type <> 'error' ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d).filter(col("event_type") =!= "error")
        .select("event_id", "event_type").orderBy("event_id")
    },

    // ── F4/F5 equality filter (LondonAir...ipynb:125; google_maps_api:369)
    sql("q_filter_eq",
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderstatus
        |FROM orders WHERE o_orderstatus = 'P' ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).filter(col("o_orderstatus") === "P")
        .select("o_orderkey", "o_orderstatus").orderBy("o_orderkey")
    },

    // ── F8 substring filter (pipeline.py:591)
    sql("q_filter_contains",
      """SELECT p_partkey, p_name FROM part
        |WHERE contains(p_name, 'widget') ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).filter(col("p_name").contains("widget"))
        .select("p_partkey", "p_name").orderBy("p_partkey")
    },

    // ── F7 + U19: null-normalize then non-null filter (pipeline.py:290, :564)
    sql("q_filter_notnull",
      """SELECT p_partkey,
        |       CASE WHEN p_partkey % 5 = 0 THEN 'None' ELSE p_brand END AS brand_raw
        |FROM part
        |WHERE (CASE WHEN p_partkey % 5 = 0 THEN NULL ELSE p_brand END) IS NOT NULL
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      val raw = when(col("p_partkey") % 5 === 0, lit("None")).otherwise(col("p_brand"))
      Tables.part(s, d).withColumn("brand_raw", raw)
        .filter(CleanFns.noneToNull(col("brand_raw")).isNotNull)
        .select("p_partkey", "brand_raw").orderBy("p_partkey")
    },

    // ── F6 + U15: rows whose "distance" has no digit (pipeline.py:562-564)
    sql("q_filter_nodigit",
      """SELECT p_partkey,
        |       CASE WHEN p_partkey % 3 = 0 THEN 'Northern line' ELSE '0.3 miles Angel' END AS dist_raw
        |FROM part
        |WHERE NOT regexp_matches(CASE WHEN p_partkey % 3 = 0 THEN 'Northern line' ELSE '0.3 miles Angel' END, '[0-9]')
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      val raw = when(col("p_partkey") % 3 === 0, lit("Northern line"))
        .otherwise(lit("0.3 miles Angel"))
      Tables.part(s, d).withColumn("dist_raw", raw)
        .filter(!CleanFns.hasDigit(col("dist_raw")))
        .select("p_partkey", "dist_raw").orderBy("p_partkey")
    },

    // ── F9/A6 any-null reduction (google_maps_api cells 9, 15)
    sql("q_any_null",
      """SELECT CAST(MAX(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS INT) AS lang_null,
        |       CAST(MAX(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS INT) AS text_null,
        |       CAST(MAX(CASE WHEN CASE WHEN doc_id % 7 = 0 THEN NULL ELSE source END IS NULL THEN 1 ELSE 0 END) AS INT) AS source_null
        |FROM documents""".stripMargin) { (s, d) =>
      def anyNull(c: Column) = max(when(c.isNull, 1).otherwise(0)).cast("int")
      Tables.documents(s, d)
        .withColumn("source_n", when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("source")))
        .agg(anyNull(col("lang")).as("lang_null"),
             anyNull(col("text")).as("text_null"),
             anyNull(col("source_n")).as("source_null"))
    },

    // ── J1 left equi-join against broadcast dims (google_maps_api.ipynb:914)
    sql("q_join_left_dim",
      """SELECT s_suppkey, s_name, n_name, r_name
        |FROM supplier
        |LEFT JOIN nation ON s_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"), "left")
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"), "left")
        .select("s_suppkey", "s_name", "n_name", "r_name")
        .orderBy("s_suppkey")
    },

    // ── J2 dictionary-map join: Series.map(dict) as a broadcast left join
    //    with non-matches → null (google_maps_api.ipynb:733-734)
    sql("q_join_dict_map",
      """SELECT n_nationkey, n_name, m.mapped
        |FROM nation
        |LEFT JOIN (SELECT n_name, lower(n_name) AS mapped FROM nation WHERE n_nationkey % 2 = 0) m
        |USING (n_name)
        |ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      val nat = Tables.nation(s, d)
      val mapping = nat.filter(col("n_nationkey") % 2 === 0)
        .select(col("n_name"), lower(col("n_name")).as("mapped"))
      nat.join(broadcast(mapping), Seq("n_name"), "left")
        .select("n_nationkey", "n_name", "mapped")
        .orderBy("n_nationkey")
    },

    // ── J4 positional-zip, partitioned variant (the 100 TB-primary form):
    //    i-th row per key zipped with i-th row per key — row_number windows
    //    partitioned by the key on BOTH sides, equi-join on (key, position).
    //    One shuffle per side, parallel across keys.
    sql("q_join_index_aligned_perkey",
      """WITH a AS (SELECT c_nationkey AS nk, c_custkey,
        |                  row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
        |           FROM customer),
        |     b AS (SELECT s_nationkey AS nk, s_suppkey,
        |                  row_number() OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) AS rn
        |           FROM supplier)
        |SELECT a.nk AS nk, CAST(a.rn AS BIGINT) AS rn,
        |       CAST(a.c_custkey AS BIGINT) AS c_custkey,
        |       CAST(b.s_suppkey AS BIGINT) AS s_suppkey
        |FROM a JOIN b ON a.nk = b.nk AND a.rn = b.rn
        |ORDER BY a.nk, a.rn""".stripMargin) { (s, d) =>
      val a = Tables.customer(s, d).select(col("c_nationkey").as("nk"), col("c_custkey"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("nk").orderBy("c_custkey")).cast("long"))
      val b = Tables.supplier(s, d).select(col("s_nationkey").as("nk"), col("s_suppkey"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("nk").orderBy("s_suppkey")).cast("long"))
      a.join(b, Seq("nk", "rn"))
        .select(col("nk"), col("rn"), col("c_custkey").cast("long"),
          col("s_suppkey").cast("long"))
        .orderBy("nk", "rn")
    },

    // ── J4 index-aligned join, SMALL-DATA FORM: positional concat becomes
    //    a row_number equi-join (google_maps_api.ipynb:175, :481-482); the
    //    no-partition windows serialize — fine for the reference's
    //    dimension-sized lists, see q_join_index_aligned_perkey for facts.
    sql("q_join_index_aligned",
      """WITH a AS (SELECT row_number() OVER (ORDER BY n_nationkey) AS rn, n_name FROM nation),
        |     b AS (SELECT row_number() OVER (ORDER BY r_regionkey) AS rn, r_name FROM region)
        |SELECT a.rn, n_name, r_name FROM a JOIN b USING (rn) ORDER BY rn""".stripMargin) { (s, d) =>
      val a = Tables.nation(s, d)
        .withColumn("rn", row_number().over(Window.orderBy("n_nationkey")).cast("long"))
        .select("rn", "n_name")
      val b = Tables.region(s, d)
        .withColumn("rn", row_number().over(Window.orderBy("r_regionkey")).cast("long"))
        .select("rn", "r_name")
      a.join(b, Seq("rn")).orderBy("rn")
    },

    // ── A2 distinct counts (pipeline.py:635)
    sql("q_agg_count_distinct",
      """SELECT CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
        |       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part
        |FROM lineitem""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
             countDistinct(col("l_partkey")).as("n_part"))
    },

    // ── A3 frequency count (00_Archive/dexter_scrapper_20210313.ipynb:604)
    sql("q_agg_freq",
      """SELECT event_type, COUNT(*) AS cnt FROM events
        |GROUP BY event_type ORDER BY cnt DESC, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d).groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("event_type"))
    },

    // ── A4 argmin via min(struct) — deterministic min-by with tie-break
    //    (LondonAir_sites_subway_station_mapping.ipynb:59)
    sql("q_agg_argmin",
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_totalprice
        |FROM orders ORDER BY o_totalprice, o_orderkey LIMIT 1""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .agg(min(struct(col("o_totalprice"), col("o_orderkey"))).as("b"))
        .select(col("b.o_orderkey").as("o_orderkey"), col("b.o_totalprice").as("o_totalprice"))
    },

    // ── A5/M2 scalar count + page arithmetic (pipeline.py:425-434)
    sql("q_agg_scalar_count",
      """SELECT COUNT(*) AS n_rows, CAST(CEIL(COUNT(*) / 18.0) AS BIGINT) AS n_pages
        |FROM lineitem""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .agg(count(lit(1)).as("n_rows"),
             ceil(count(lit(1)) / 18.0).cast("long").as("n_pages"))
    },

    // ── W1 rank-1 per group (J3's window form, SURVEY §2.6)
    sql("q_window_rank1",
      """WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
        |                  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |           FROM orders)
        |SELECT CAST(o_custkey AS BIGINT) AS o_custkey, CAST(o_orderkey AS BIGINT) AS o_orderkey, o_totalprice
        |FROM r WHERE rn = 1 ORDER BY o_custkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d).withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    },

    // ── W2 running group-id — the list_divider sentinel segmentation
    //    (google_maps_api.ipynb:426-438). SMALL-DATA FORM: a no-partition
    //    ordering window funnels every row through one task — correct for
    //    dimension-sized inputs (the reference's case), never for facts.
    //    The 100 TB-primary form is q_window_groupid_perkey below.
    sql("q_window_groupid",
      """SELECT event_id,
        |       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |            OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS group_id
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("group_id",
          sum(when(col("event_type") === "signup", 1).otherwise(0)).over(w).cast("long"))
        .select("event_id", "group_id").orderBy("event_id")
    },

    // ── W2 partitioned variant (the 100 TB-primary form): the same
    //    sentinel segmentation keyed off the natural partition — state is
    //    per-user, so the window shuffles once on user_id and every
    //    partition sorts independently; no single-task funnel.
    sql("q_window_groupid_perkey",
      """SELECT user_id, event_id,
        |       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |            OVER (PARTITION BY user_id ORDER BY event_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS group_id
        |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("group_id",
          sum(when(col("event_type") === "signup", 1).otherwise(0)).over(w).cast("long"))
        .select("user_id", "event_id", "group_id").orderBy("user_id", "event_id")
    },

    // ── O1 multi-column sort (google_maps_api.ipynb:368)
    sql("q_sort_multi",
      """SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier
        |ORDER BY s_nationkey DESC, s_acctbal, s_suppkey""".stripMargin) { (s, d) =>
      Tables.supplier(s, d).select("s_suppkey", "s_nationkey", "s_acctbal")
        .orderBy(desc("s_nationkey"), col("s_acctbal"), col("s_suppkey"))
    },

    // ── O3 top-k — Spark plans TakeOrderedAndProject (app ranking surface)
    sql("q_topk",
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), col("o_orderkey")).limit(10)
    },

    // ── Uα union-all (pipeline.py:447, :763)
    sql("q_union_all",
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity < 3
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 48
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_quantity")
      li.filter(col("l_quantity") < 3)
        .unionByName(li.filter(col("l_quantity") > 48))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ── D1 full-row dedup (pipeline.py:448)
    sql("q_dedup_full",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).select("l_returnflag", "l_linestatus")
        .dropDuplicates().orderBy("l_returnflag", "l_linestatus")
    },

    // ── D2 key dedup with deterministic keep-first (pipeline.py:215;
    //    SURVEY §7.5: row_number over a stable order, not dropDuplicates)
    sql("q_dedup_key",
      """WITH r AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |                  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |           FROM orders)
        |SELECT CAST(o_custkey AS BIGINT) AS o_custkey, CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS first_order_day
        |FROM r WHERE rn = 1 ORDER BY o_custkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, d).withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
                date_format(col("o_orderdate"), "yyyy-MM-dd").as("first_order_day"))
        .orderBy("o_custkey")
    },

    // ── D3 subset dedup, keep-first
    //    (LondonAir_sites_subway_station_mapping.ipynb:232)
    sql("q_dedup_subset",
      """WITH r AS (SELECT lang, doc_id, source,
        |                  row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        |           FROM documents)
        |SELECT lang, doc_id, source FROM r WHERE rn = 1 ORDER BY lang""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("lang").orderBy("doc_id")
      Tables.documents(s, d).withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("lang", "doc_id", "source").orderBy("lang")
    },

    // ── PV1 + U22 one-hot pivot with Yes/No mapping
    //    (google_maps_api.ipynb:175, :492). Pivot values declared explicitly
    //    so no extra distinct-collect job runs.
    sql("q_pivot_onehot",
      """SELECT p_partkey,
        |       CASE WHEN p_type = 'ECONOMY'  THEN 'Yes' ELSE 'No' END AS "ECONOMY",
        |       CASE WHEN p_type = 'LARGE'    THEN 'Yes' ELSE 'No' END AS "LARGE",
        |       CASE WHEN p_type = 'MEDIUM'   THEN 'Yes' ELSE 'No' END AS "MEDIUM",
        |       CASE WHEN p_type = 'PROMO'    THEN 'Yes' ELSE 'No' END AS "PROMO",
        |       CASE WHEN p_type = 'SMALL'    THEN 'Yes' ELSE 'No' END AS "SMALL",
        |       CASE WHEN p_type = 'STANDARD' THEN 'Yes' ELSE 'No' END AS "STANDARD"
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      val types = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
      graft.operators.Reshape.oneHotYesNo(Tables.part(s, d), "p_partkey", "p_type", types)
        .orderBy("p_partkey")
    },

    // ── PV2 melt (unpivot) + F5 availability filter — pivot∘melt round-trip
    //    recovers the original (key, type) pairs (google_maps_api.ipynb:368)
    sql("q_melt",
      "SELECT p_partkey, p_type FROM part ORDER BY p_partkey") { (s, d) =>
      val types = Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
      val oneHot = graft.operators.Reshape.oneHotYesNo(
        Tables.part(s, d), "p_partkey", "p_type", types)
      graft.operators.Reshape.meltPresent(oneHot, "p_partkey", types, "p_type")
        .orderBy("p_partkey")
    },

    // ── JS1 JSON field extraction (pipeline.py:712-716)
    sql("q_json_extract",
      """SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id")
    },

    // ── NATIVE pivot with multiple aggregations (RelationalGroupedDataset
    //    .pivot with DECLARED values — no value-discovery scan, the 100 TB
    //    form): priority × status matrix of order counts and cent-
    //    quantized revenue, one pass. The manual when/otherwise pivot
    //    (q_pivot_onehot) stays as the dynamic-schema sibling.
    sql("q_pivot_matrix",
      """SELECT o_orderpriority,
        |       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f_cnt,
        |       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F'
        |         THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS f_rev_c,
        |       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o_cnt,
        |       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O'
        |         THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS o_rev_c,
        |       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p_cnt,
        |       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P'
        |         THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS p_rev_c
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)).as("cnt"),
          coalesce(sum(floor(col("o_totalprice") * 100).cast("long")), lit(0L))
            .as("rev_c"))
        .select(col("o_orderpriority"),
          coalesce(col("F_cnt"), lit(0L)).as("f_cnt"),
          coalesce(col("F_rev_c"), lit(0L)).as("f_rev_c"),
          coalesce(col("O_cnt"), lit(0L)).as("o_cnt"),
          coalesce(col("O_rev_c"), lit(0L)).as("o_rev_c"),
          coalesce(col("P_cnt"), lit(0L)).as("p_cnt"),
          coalesce(col("P_rev_c"), lit(0L)).as("p_rev_c"))
        .orderBy("o_orderpriority")
    },

    // ── VARIANT (Spark 4's semi-structured type): props parsed ONCE into
    //    the binary-encoded open-schema form, fields then read with typed
    //    variant_get — no per-access string re-parse (get_json_object
    //    re-tokenizes the JSON text per call) and no rigid from_json
    //    schema; at 100 TB this is the shredded semi-structured scan
    //    path. Filter + rollup run on the typed extraction; oracle =
    //    DuckDB's JSON operators over the same text.
    sql("q_json_variant",
      """WITH e AS (SELECT event_type,
        |                  CAST(props->>'k' AS BIGINT) AS k
        |           FROM events)
        |SELECT event_type, COUNT(*) AS cnt,
        |       CAST(SUM(k) AS BIGINT) AS k_sum, MAX(k) AS k_max
        |FROM e WHERE k % 3 = 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"), parse_json(col("props")).as("v"))
        .select(col("event_type"),
          expr("variant_get(v, '$.k', 'bigint')").as("k"))
        .filter(col("k") % 3 === 0)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum("k").cast("long").as("k_sum"),
          max("k").as("k_max"))
        .orderBy("event_type")
    },

    // ── JS2/JS3 nested-array JSON explode (pipeline.py:733-738)
    sql("q_json_explode",
      """SELECT r_regionkey, CAST(r_regionkey * m AS INT) AS s
        |FROM region, (VALUES (1), (10)) t(m)
        |ORDER BY r_regionkey, s""".stripMargin) { (s, d) =>
      val js = concat(lit("[{\"s\":"), col("r_regionkey"),
        lit("},{\"s\":"), col("r_regionkey") * 10, lit("}]"))
      Tables.region(s, d)
        .withColumn("parsed",
          from_json(js, org.apache.spark.sql.types.DataType.fromDDL("array<struct<s:int>>")))
        .select(col("r_regionkey"), explode(col("parsed")).as("e"))
        .select(col("r_regionkey"), col("e.s").as("s"))
        .orderBy("r_regionkey", "s")
    },

    // ── T1 date-window filter + daily rollup (pipeline.py:773-779)
    sql("q_time_window",
      """SELECT strftime(date_trunc('day', l_shipdate), '%Y-%m-%d') AS ship_day, COUNT(*) AS cnt
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-01-31'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1995-01-31").cast("timestamp"))
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("ship_day")
    },

    // ── T2 hourly time-series rollup (database_schema.sql:48)
    sql("q_time_hourly",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_ts, event_type,
        |       COUNT(*) AS cnt,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour_ts"),
                 col("event_type"))
        .agg(count(lit(1)).as("cnt"), exactSum(col("value")).as("sum_value"))
        .orderBy("hour_ts", "event_type")
    },

    // ── exact percentiles (engine capability beyond the reference): Spark's
    //    exact `percentile` and DuckDB's quantile_cont share linear
    //    interpolation over the sorted set — deterministic on both sides
    sql("q_agg_percentile",
      """SELECT l_returnflag,
        |       CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS p50,
        |       CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE) AS p90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
             expr("percentile(l_quantity, 0.9)").as("p90"))
        .orderBy("l_returnflag")
    },

    // ── winsorization: clip l_extendedprice to its [p01, p99] — the
    //    robust-scaling cleanup; cut points from the same exact-percentile
    //    arithmetic as q_agg_percentile, clip is a scan-side projection
    sql("q_clean_winsorize",
      """WITH q AS (
        |  SELECT CAST(quantile_cont(l_extendedprice, 0.01) AS DOUBLE) AS lo,
        |         CAST(quantile_cont(l_extendedprice, 0.99) AS DOUBLE) AS hi
        |  FROM lineitem)
        |SELECT l_orderkey, CAST(l_linenumber AS INT) AS l_linenumber,
        |       CAST(CASE WHEN l_extendedprice < lo THEN lo
        |                 WHEN l_extendedprice > hi THEN hi
        |                 ELSE l_extendedprice END AS DOUBLE) AS l_extendedprice
        |FROM lineitem, q
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Profiling.winsorize(
          Tables.lineitem(s, d)
            .select("l_orderkey", "l_linenumber", "l_extendedprice"),
          "l_extendedprice", 0.01, 0.99)
        .select(col("l_orderkey"), col("l_linenumber").cast("int").as("l_linenumber"),
          col("l_extendedprice"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ── EXACT deep-rank quantiles via histogram pruning
    //    (Profiling.exactQuantilesByHistogram): per-returnflag exact
    //    p25/p50/p75 of price-in-cents WITHOUT a global sort — bounded
    //    group histograms locate each rank's bucket, one pruned scan +
    //    a remnant-sized window reads the exact order statistic. The
    //    oracle sorts outright (fine at oracle scale) and picks the same
    //    1-based rank floor(q·(n−1))+1 — any histogram/bucket/rank-walk
    //    error surfaces as a value mismatch.
    sql("q_profile_quantile_hist",
      """WITH v AS (SELECT l_returnflag AS grp,
        |                  CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS v
        |           FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |n AS (SELECT grp, COUNT(*) AS n FROM v GROUP BY grp),
        |r AS (SELECT grp, v, row_number() OVER (PARTITION BY grp ORDER BY v) AS rk FROM v),
        |qs AS (SELECT unnest([25, 50, 75]) AS q_pct)
        |SELECT r.grp AS l_returnflag, CAST(q.q_pct AS BIGINT) AS q_pct, n.n, r.v
        |FROM r JOIN n USING (grp) CROSS JOIN qs q
        |WHERE r.rk = CAST(FLOOR((q.q_pct / 100.0) * (n.n - 1)) AS BIGINT) + 1
        |ORDER BY l_returnflag, q_pct""".stripMargin) { (s, d) =>
      Profiling.exactQuantilesByHistogram(
          Tables.lineitem(s, d).select(col("l_returnflag"),
            floor(col("l_extendedprice") * 100).cast("long").as("cents")),
          "l_returnflag", "cents", qPcts = Seq(25, 50, 75))
        .orderBy("l_returnflag", "q_pct")
    },

    // ── distribution-drift monitor (Profiling.histogramDrift): per-lang
    //    total-variation distance between the full documents corpus and a
    //    truncation-biased batch (n_chars ≤ 400), binned by the
    //    REFERENCE's frozen equi-width buckets. All-integer arithmetic
    //    (TV in millionths via cross-multiplied counts) → full replay.
    // ── declarative data contracts (Contracts.validate): expectation
    //    checks an ingest runs before trusting a batch — all scalar
    //    rules ride ONE shared scan (sum(when) expressions + a stack
    //    unpivot); uniqueness is priced as its own count−countDistinct
    //    pass. Violations planted deterministically (nulled custkeys,
    //    an off-domain status, a capped range) so every rule has a
    //    non-trivial count the oracle recomputes.
    sql("q_contract_validate",
      """WITH p AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END AS ck,
        |         CASE WHEN o_orderkey % 101 = 0 THEN 'X' ELSE o_orderstatus END AS st,
        |         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
        |         o_orderpriority AS pr
        |  FROM orders),
        |n AS (SELECT COUNT(*) AS n_rows FROM p)
        |SELECT rule, n_rows, n_violations,
        |       CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS pass
        |FROM (
        |  SELECT 'not_null(ck)' AS rule, n.n_rows,
        |         (SELECT CAST(SUM(CASE WHEN ck IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM p) AS n_violations FROM n
        |  UNION ALL
        |  SELECT 'in_set(st)', n.n_rows,
        |         (SELECT CAST(SUM(CASE WHEN st IS NULL OR st NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) FROM p) FROM n
        |  UNION ALL
        |  SELECT 'in_range(cents)', n.n_rows,
        |         (SELECT CAST(SUM(CASE WHEN cents IS NULL OR cents < 150000 OR cents > 20000000 THEN 1 ELSE 0 END) AS BIGINT) FROM p) FROM n
        |  UNION ALL
        |  SELECT 'matches(pr)', n.n_rows,
        |         (SELECT CAST(SUM(CASE WHEN pr IS NULL OR NOT regexp_matches(pr, '^[1-5]-') THEN 1 ELSE 0 END) AS BIGINT) FROM p) FROM n
        |  UNION ALL
        |  SELECT 'unique(ck)', n.n_rows,
        |         (SELECT COUNT(ck) - COUNT(DISTINCT ck) FROM p) FROM n
        |  UNION ALL
        |  SELECT 'unique(o_orderkey)', n.n_rows,
        |         (SELECT COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) FROM p) FROM n)
        |ORDER BY rule""".stripMargin) { (s, d) =>
      import graft.operators.Contracts
      import graft.operators.Contracts._
      val planted = Tables.orders(s, d).select(
        col("o_orderkey"),
        when(col("o_orderkey") % 97 === 0, lit(null)).otherwise(col("o_custkey")).as("ck"),
        when(col("o_orderkey") % 101 === 0, "X").otherwise(col("o_orderstatus")).as("st"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderpriority").as("pr"))
      Contracts.validate(planted, Seq(
          NotNull("ck"),
          InSet("st", Seq("O", "F", "P")),
          InRange("cents", 150000L, 20000000L),
          Matches("pr", "^[1-5]-"),
          Unique("ck"),
          Unique("o_orderkey")))
        .orderBy("rule")
    },

    // ── incrementally-maintained drift monitor: bins FREEZE on the
    //    initial corpus slice (doc_id%3<2); the later delta slice adds
    //    bucket counts via Incremental.mergeAdditive — O(|delta|), the
    //    base never rescans — and today's biased batch scores against
    //    the maintained histogram. The oracle rebuilds the same frozen
    //    binning, sums the two slices' counts (delta clamped), and
    //    replays the TV arithmetic.
    sql("q_drift_incremental",
      """WITH a AS (SELECT lang AS g, n_chars AS v FROM documents
        |           WHERE n_chars IS NOT NULL AND doc_id % 3 < 2),
        |bd AS (SELECT lang AS g, n_chars AS v FROM documents
        |       WHERE n_chars IS NOT NULL AND doc_id % 3 = 2),
        |c AS (SELECT lang AS g, n_chars AS v FROM documents
        |      WHERE n_chars IS NOT NULL AND n_chars <= 400),
        |st AS (SELECT g, MIN(v) AS lo, MAX(v) AS hi FROM a GROUP BY g),
        |ra AS (SELECT a.g, ((v - lo) * 64) // (hi - lo + 1) AS b, COUNT(*) AS rc
        |       FROM a JOIN st USING (g) GROUP BY 1, 2),
        |rd AS (SELECT bd.g, LEAST(GREATEST(((v - lo) * 64) // (hi - lo + 1), 0), 63) AS b,
        |              COUNT(*) AS rc
        |       FROM bd JOIN st USING (g) GROUP BY 1, 2),
        |rb AS (SELECT g, b, CAST(SUM(rc) AS BIGINT) AS rc
        |       FROM (SELECT * FROM ra UNION ALL SELECT * FROM rd) GROUP BY g, b),
        |cb AS (SELECT c.g, LEAST(GREATEST(((v - lo) * 64) // (hi - lo + 1), 0), 63) AS b,
        |              COUNT(*) AS cc
        |       FROM c JOIN st USING (g) GROUP BY 1, 2),
        |j AS (SELECT COALESCE(rb.g, cb.g) AS g, COALESCE(rb.b, cb.b) AS b,
        |             COALESCE(rc, 0) AS rc, COALESCE(cc, 0) AS cc
        |      FROM rb FULL OUTER JOIN cb ON rb.g = cb.g AND rb.b = cb.b),
        |t AS (SELECT g, CAST(SUM(rc) AS BIGINT) AS nr, CAST(SUM(cc) AS BIGINT) AS nc
        |      FROM j GROUP BY g),
        |f AS (SELECT j.g, nr, nc, CAST(SUM(ABS(rc * nc - cc * nr)) AS BIGINT) AS s
        |      FROM j JOIN t USING (g) GROUP BY j.g, nr, nc),
        |w AS (SELECT j.g, b, ABS(rc * nc - cc * nr) AS d,
        |             row_number() OVER (PARTITION BY j.g
        |               ORDER BY ABS(rc * nc - cc * nr) DESC, b) AS rn
        |      FROM j JOIN t USING (g))
        |SELECT f.g AS lang, nr AS n_ref, nc AS n_cur,
        |       CASE WHEN nc = 0 OR nr = 0 THEN 1000000
        |            ELSE (s * 500000) // (nr * nc) END AS tv_q,
        |       w.b AS top_bucket,
        |       CASE WHEN nc = 0 OR nr = 0 THEN 1000000
        |            ELSE (CAST(w.d AS BIGINT) * 1000000) // (nr * nc) END AS top_delta_q
        |FROM f JOIN w ON f.g = w.g AND w.rn = 1
        |ORDER BY lang""".stripMargin) { (s, d) =>
      import graft.operators.Incremental
      val docs = Tables.documents(s, d)
      val base = docs.filter(col("doc_id") % 3 < 2)
      val delta = docs.filter(col("doc_id") % 3 === 2)
      val frozen = Profiling.referenceStats(base, "lang", "n_chars")
      val maintained = Incremental.mergeAdditive(
        Profiling.histogramCounts(base, frozen, "lang", "n_chars", 64, clamp = false),
        Profiling.histogramCounts(delta, frozen, "lang", "n_chars", 64, clamp = true),
        keys = Seq("__g", "__b"))
      Profiling.driftFromHistogram(maintained, frozen,
          docs.filter(col("n_chars") <= 400), "lang", "n_chars", buckets = 64)
        .orderBy("lang")
    },

    sql("q_profile_drift", driftReplaySql("n_chars <= 400", label = None)) { (s, d) =>
      val docs = Tables.documents(s, d)
      Profiling.histogramDrift(docs, docs.filter(col("n_chars") <= 400),
          "lang", "n_chars", buckets = 64)
        .orderBy("lang")
    },

    // ── MAD outlier fences (Profiling.madOutliers): per-priority robust
    //    outlier counts over order totals with a 20× spike planted on
    //    o_orderkey%97 rows — median fences don't move for 1% spikes, so
    //    the planted rows are exactly what gets flagged. Same
    //    exact-percentile arithmetic as winsorize → hash-gateable.
    sql("q_profile_mad",
      """WITH v AS (SELECT o_orderpriority,
        |                  o_totalprice * (CASE WHEN o_orderkey % 97 = 0 THEN 20 ELSE 1 END) AS val
        |           FROM orders),
        |med AS (SELECT o_orderpriority, quantile_cont(val, 0.5) AS med FROM v GROUP BY 1),
        |fen AS (SELECT v.o_orderpriority, quantile_cont(abs(v.val - m.med), 0.5) AS mad,
        |               ANY_VALUE(m.med) AS med
        |        FROM v JOIN med m USING (o_orderpriority) GROUP BY 1)
        |SELECT v.o_orderpriority, f.med, f.mad,
        |       CAST(SUM(CASE WHEN abs(v.val - f.med) > 3.0 * f.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       COUNT(*) AS n_rows
        |FROM v JOIN fen f USING (o_orderpriority)
        |GROUP BY 1, f.med, f.mad ORDER BY 1""".stripMargin) { (s, d) =>
      val planted = Tables.orders(s, d).select(col("o_orderpriority"),
        (col("o_totalprice") *
          when(col("o_orderkey") % 97 === 0, 20).otherwise(1)).as("val"))
      Profiling.madOutliers(planted, "o_orderpriority", "val", k = 3.0)
        .orderBy("o_orderpriority")
    },

    // ── rollup grouping (engine capability): subtotal + grand-total rows
    sql("q_agg_rollup",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), sum("l_quantity").cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_last, col("l_linestatus").asc_nulls_last)
    },

    // ── analytic-window breadth (engine capability): lag/lead, ntile,
    //    percent_rank, cume_dist over a total per-customer order — the
    //    standard analytic vocabulary beyond rank-1/top-k
    sql("q_window_analytics",
      """SELECT o_custkey, o_orderkey,
        |       lag(o_totalprice) OVER w AS prev_price,
        |       lead(o_totalprice) OVER w AS next_price,
        |       CAST(ntile(4) OVER w AS INT) AS quartile,
        |       percent_rank() OVER w AS pr,
        |       cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, d).select(
          col("o_custkey"), col("o_orderkey"),
          lag("o_totalprice", 1).over(w).as("prev_price"),
          lead("o_totalprice", 1).over(w).as("next_price"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ── event-time RANGE frame (engine capability, completing the window
    //    family): per-user trailing-1-hour moving aggregate — the frame is
    //    bounded by event TIME, not row count, so sparse and dense users
    //    get the same semantics. Values quantized to longs before the sum
    //    (floor(v·1000) — same doubles both engines, and integer sums are
    //    order-independent, QueryDef discipline).
    sql("q_window_moving",
      """SELECT user_id, event_id,
        |       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
        |       CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) OVER w AS BIGINT) AS sum_q
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("__us"))
        .rangeBetween(-3600L * 1000 * 1000, 0L)
      Tables.events(s, d)
        .withColumn("__us", unix_micros(col("ts")))
        .withColumn("__q", floor(col("value") * 1000).cast("long"))
        .select(col("user_id"), col("event_id"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("__q")).over(w).as("sum_q"))
        .orderBy("user_id", "event_id")
    },

    // ── cube grouping (all 2^k subtotal combinations — the remaining
    //    member of the rollup/grouping-sets family)
    sql("q_agg_cube",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), sum("l_quantity").cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_last, col("l_linestatus").asc_nulls_last)
    },

    // ── ordered funnel (Funnel.stageReach): signup → click → purchase,
    //    each stage gated at-or-after the user's previous stage time —
    //    per-stage min aggregates + user equi-joins, never a window over
    //    the raw event stream
    sql("q_funnel_stages",
      """WITH s1 AS (SELECT user_id, MIN(ts) AS t FROM events
        |            WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
        |       JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t
        |       WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
        |       JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t
        |       WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT 1 AS stage, 'signup' AS stage_name, (SELECT COUNT(*) FROM s1) AS n_users
        |UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
        |UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
        |ORDER BY stage""".stripMargin) { (s, d) =>
      graft.operators.Funnel.stageReach(Tables.events(s, d),
          "user_id", "ts", "event_type", Seq("signup", "click", "purchase"))
        .select(col("stage").cast("int").as("stage"), col("stage_name"), col("n_users"))
        .orderBy("stage")
    },

    // ── cohort retention: users bucketed by signup week, activity counted
    //    per whole-week offset — integer day arithmetic (floor-div 7), so
    //    the matrix is engine-exact
    sql("q_cohort_retention",
      """WITH first_seen AS (
        |  SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS d0
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |activity AS (
        |  SELECT DISTINCT e.user_id,
        |         date_diff('day', f.d0, CAST(date_trunc('day', e.ts) AS DATE)) // 7 AS wk
        |  FROM events e JOIN first_seen f ON e.user_id = f.user_id
        |  WHERE e.ts >= CAST(f.d0 AS TIMESTAMP))
        |SELECT wk AS week_offset, COUNT(*) AS n_users
        |FROM activity GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val firstSeen = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(to_date(col("ts"))).as("d0"))
      ev.join(firstSeen, "user_id")
        .filter(col("ts") >= col("d0").cast("timestamp"))
        .select(col("user_id"),
          floor(datediff(to_date(col("ts")), col("d0")) / 7).cast("long").as("wk"))
        .distinct()
        .groupBy(col("wk").as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("week_offset")
    },

    // ── hourly resample + forward fill (TimeSeries.hourlyResampleFfill):
    //    the pandas asfreq/ffill pair — sparse per-series hourly sums onto
    //    a generated per-key spine, gaps carry the last observation
    //    forward. Series key = (type, user_id%16) so gaps are real at
    //    every sf; sums long-quantized (QueryDef discipline).
    sql("q_time_ffill",
      """WITH src AS (
        |  SELECT event_type || '_' || CAST(user_id % 16 AS VARCHAR) AS series,
        |         ts, CAST(FLOOR(value * 1000) AS BIGINT) AS q
        |  FROM events),
        |hourly AS (
        |  SELECT series, date_trunc('hour', ts) AS h, SUM(q) AS v
        |  FROM src GROUP BY 1, 2),
        |rng AS (SELECT series, MIN(h) AS lo, MAX(h) AS hi FROM hourly GROUP BY 1),
        |spine AS (SELECT series, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        |          FROM rng),
        |j AS (SELECT s.series, s.h, hourly.v
        |      FROM spine s LEFT JOIN hourly ON s.series = hourly.series AND s.h = hourly.h)
        |SELECT series, strftime(h, '%Y-%m-%d %H:00') AS hour_ts,
        |       CAST(last_value(v IGNORE NULLS) OVER (
        |         PARTITION BY series ORDER BY h
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS val,
        |       v IS NULL AS is_filled
        |FROM j ORDER BY series, h""".stripMargin) { (s, d) =>
      val src = Tables.events(s, d).select(
        concat(col("event_type"), lit("_"), (col("user_id") % 16).cast("string"))
          .as("series"),
        col("ts"), floor(col("value") * 1000).cast("long").as("q"))
      graft.operators.TimeSeries.hourlyResampleFfill(src, "series", "ts", "q")
        .select(col("series"),
          date_format(col("hour_ts"), "yyyy-MM-dd HH:00").as("hour_ts"),
          col("val"), col("is_filled"))
        .orderBy("series", "hour_ts")
    },

    // ── hourly resample + LINEAR interpolation (the asfreq/interpolate
    //    pair next to q_time_ffill): gap hours take the exact integer
    //    prev + (next−prev)·(h−h_prev) div (h_next−h_prev) — truncating
    //    division agrees across engines on negative deltas too, so the
    //    interpolated values hash, not just the known ones.
    sql("q_time_interp",
      """WITH src AS (
        |  SELECT event_type || '_' || CAST(user_id % 16 AS VARCHAR) AS series,
        |         ts, CAST(FLOOR(value * 1000) AS BIGINT) AS q
        |  FROM events),
        |hourly AS (
        |  SELECT series, date_trunc('hour', ts) AS h, SUM(q) AS v
        |  FROM src GROUP BY 1, 2),
        |rng AS (SELECT series, MIN(h) AS lo, MAX(h) AS hi FROM hourly GROUP BY 1),
        |spine AS (SELECT series, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        |          FROM rng),
        |j AS (SELECT s.series, s.h, hourly.v,
        |             epoch_us(s.h) // 3600000000 AS hi
        |      FROM spine s LEFT JOIN hourly ON s.series = hourly.series AND s.h = hourly.h),
        |p AS (SELECT series, h, v, hi,
        |             last_value(v IGNORE NULLS) OVER wp AS pv,
        |             last_value(CASE WHEN v IS NOT NULL THEN hi END IGNORE NULLS) OVER wp AS ph,
        |             first_value(v IGNORE NULLS) OVER wn AS nv,
        |             first_value(CASE WHEN v IS NOT NULL THEN hi END IGNORE NULLS) OVER wn AS nh
        |      FROM j
        |      WINDOW wp AS (PARTITION BY series ORDER BY h
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |             wn AS (PARTITION BY series ORDER BY h
        |                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT series, strftime(h, '%Y-%m-%d %H:00') AS hour_ts,
        |       CAST(CASE WHEN v IS NOT NULL THEN v
        |                 ELSE pv + ((nv - pv) * (hi - ph)) // (nh - ph) END AS BIGINT) AS val,
        |       v IS NULL AS is_filled
        |FROM p ORDER BY series, hour_ts""".stripMargin) { (s, d) =>
      val src = Tables.events(s, d).select(
        concat(col("event_type"), lit("_"), (col("user_id") % 16).cast("string"))
          .as("series"),
        col("ts"), floor(col("value") * 1000).cast("long").as("q"))
      graft.operators.TimeSeries.hourlyResampleInterp(src, "series", "ts", "q")
        .select(col("series"),
          date_format(col("hour_ts"), "yyyy-MM-dd HH:00").as("hour_ts"),
          col("val"), col("is_filled"))
        .orderBy("series", "hour_ts")
    },

    // ── lagged cross-correlation (TimeSeries.crossCorrelation): the full
    //    0..24 h click→purchase correlogram as exact BIGINT products of
    //    hourly counts — lead-lag analysis whose one data pass is the
    //    hourly rollup; the lag expansion touches only the rolled-up
    //    series. Zero-overlap lags emit score 0, keeping 25 rows always.
    sql("q_time_xcorr",
      """WITH e AS (SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS h,
        |                  event_type
        |           FROM events),
        |a AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS ca FROM e
        |      WHERE event_type = 'click' GROUP BY 1),
        |b AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS cb FROM e
        |      WHERE event_type = 'purchase' GROUP BY 1),
        |l AS (SELECT unnest(range(0, 25)) AS lag),
        |x AS (SELECT a.h + l.lag AS hb, l.lag, a.ca FROM a CROSS JOIN l),
        |s AS (SELECT x.lag, CAST(SUM(x.ca * b.cb) AS BIGINT) AS score
        |      FROM x JOIN b ON b.h = x.hb GROUP BY 1)
        |SELECT l.lag AS lag, CAST(COALESCE(s.score, 0) AS BIGINT) AS score
        |FROM l LEFT JOIN s USING (lag)
        |ORDER BY lag""".stripMargin) { (s, d) =>
      graft.operators.TimeSeries.crossCorrelation(
          Tables.events(s, d), "ts", "event_type",
          typeA = "click", typeB = "purchase", maxLag = 24)
        .orderBy("lag")
    },

    // ── interval COALESCING (TimeSeries.mergeIntervals): per-customer
    //    order-activity windows merge into maximal covered spans — the
    //    gaps-and-islands form on INTERVALS, where the island test runs
    //    against the running MAX of prior ends (a lag(hi) would let an
    //    early long window swallow later ones undetected; spec-shaped in
    //    the SQL identically). One per-key window + one aggregate.
    sql("q_time_interval_merge",
      """WITH iv AS (
        |  SELECT o_custkey AS k,
        |         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS lo,
        |         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
        |           + (o_orderkey % 30) + 1 AS BIGINT) AS hi
        |  FROM orders),
        |m AS (SELECT k, lo, hi,
        |             CASE WHEN lo > COALESCE(MAX(hi) OVER (PARTITION BY k ORDER BY lo, hi
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -9223372036854775808)
        |                  THEN 1 ELSE 0 END AS new_i
        |      FROM iv),
        |g AS (SELECT k, lo, hi,
        |             SUM(new_i) OVER (PARTITION BY k ORDER BY lo, hi
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |      FROM m)
        |SELECT k, CAST(MIN(lo) AS BIGINT) AS lo, CAST(MAX(hi) AS BIGINT) AS hi,
        |       COUNT(*) AS n_merged
        |FROM g GROUP BY k, island
        |ORDER BY k, lo""".stripMargin) { (s, d) =>
      val epoch = to_date(lit("1970-01-01"))
      val iv = Tables.orders(s, d).select(
        col("o_custkey").as("k"),
        datediff(to_date(col("o_orderdate")), epoch).cast("long").as("lo"),
        (datediff(to_date(col("o_orderdate")), epoch)
          + col("o_orderkey") % 30 + 1).cast("long").as("hi"))
      graft.operators.TimeSeries.mergeIntervals(iv, "k", "lo", "hi")
        .orderBy("k", "lo")
    },

    // ── event-sequence transition counts: per-user lag over event time
    //    (the Markov/behavioral-analysis primitive); the window partitions
    //    by user so no global-order funnel, ties broken by event_id
    sql("q_event_transitions",
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type, COUNT(*) AS cnt
        |FROM seq WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          lag("event_type", 1).over(w).as("prev_type"))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "event_type").agg(count(lit(1)).as("cnt"))
        .orderBy("prev_type", "event_type")
    },

    // ── grouping sets (engine capability, completing the rollup family):
    //    two independent grouping dimensions in one pass over the fact
    //    table, disambiguated by GROUPING() flags
    sql("q_agg_grouping_sets",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        |       COUNT(*) AS cnt,
        |       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY g_flag, g_status, l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin) { (s, d) =>
      Tables.registerAll(s, d)
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
          |       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
          |       COUNT(*) AS cnt,
          |       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
          |ORDER BY g_flag, g_status,
          |         l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST""".stripMargin)
    },

    // ── M1/M2 abs/add/divide with null-safe division (SURVEY §2.9)
    sql("q_math",
      """SELECT s_suppkey,
        |       CAST(ABS(s_acctbal - 1000.0) + ABS(CAST(s_nationkey AS DOUBLE) - 12.0) AS DOUBLE) AS l1,
        |       s_acctbal / NULLIF(CAST(s_suppkey % 7 AS DOUBLE), 0.0) AS ratio
        |FROM supplier ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      Tables.supplier(s, d).select(
          col("s_suppkey"),
          (abs(col("s_acctbal") - 1000.0) +
            abs(col("s_nationkey").cast("double") - 12.0)).as("l1"),
          (col("s_acctbal") /
            when(col("s_suppkey") % 7 === 0, lit(null))
              .otherwise((col("s_suppkey") % 7).cast("double"))).as("ratio"))
        .orderBy("s_suppkey")
    }
  )

  /** DuckDB replay of [[graft.operators.Profiling.histogramDrift]] over
    * `documents` (ref = whole corpus, group = lang, value = n_chars,
    * 64 bins): current batch = rows matching `curPred`, binned by the
    * reference's frozen equi-width buckets with edge clamping, then the
    * integer TV distance and worst-bin localization. With `label` set,
    * a constant `batch_key` column is added (used by the streaming
    * variant, which unions one replay per micro-batch slice). */
  private[queries] def driftReplaySql(curPred: String, label: Option[Int]): String = {
    val labelCol = label.map(l => s"CAST($l AS BIGINT) AS batch_key, ").getOrElse("")
    val order = if (label.isDefined) "batch_key, lang" else "lang"
    s"""WITH r AS (SELECT lang AS g, n_chars AS v FROM documents WHERE n_chars IS NOT NULL),
       |c AS (SELECT lang AS g, n_chars AS v FROM documents
       |      WHERE n_chars IS NOT NULL AND ($curPred)),
       |st AS (SELECT g, MIN(v) AS lo, MAX(v) AS hi FROM r GROUP BY g),
       |rb AS (SELECT r.g, ((v - lo) * 64) // (hi - lo + 1) AS b, COUNT(*) AS rc
       |       FROM r JOIN st USING (g) GROUP BY 1, 2),
       |cb AS (SELECT c.g, LEAST(GREATEST(((v - lo) * 64) // (hi - lo + 1), 0), 63) AS b,
       |              COUNT(*) AS cc
       |       FROM c JOIN st USING (g) GROUP BY 1, 2),
       |j AS (SELECT COALESCE(rb.g, cb.g) AS g, COALESCE(rb.b, cb.b) AS b,
       |             COALESCE(rc, 0) AS rc, COALESCE(cc, 0) AS cc
       |      FROM rb FULL OUTER JOIN cb ON rb.g = cb.g AND rb.b = cb.b),
       |t AS (SELECT g, CAST(SUM(rc) AS BIGINT) AS nr, CAST(SUM(cc) AS BIGINT) AS nc
       |      FROM j GROUP BY g),
       |f AS (SELECT j.g, nr, nc, CAST(SUM(ABS(rc * nc - cc * nr)) AS BIGINT) AS s
       |      FROM j JOIN t USING (g) GROUP BY j.g, nr, nc),
       |w AS (SELECT j.g, b, ABS(rc * nc - cc * nr) AS d,
       |             row_number() OVER (PARTITION BY j.g
       |               ORDER BY ABS(rc * nc - cc * nr) DESC, b) AS rn
       |      FROM j JOIN t USING (g))
       |SELECT ${labelCol}f.g AS lang, nr AS n_ref, nc AS n_cur,
       |       CASE WHEN nc = 0 OR nr = 0 THEN 1000000
       |            ELSE (s * 500000) // (nr * nc) END AS tv_q,
       |       w.b AS top_bucket,
       |       CASE WHEN nc = 0 OR nr = 0 THEN 1000000
       |            ELSE (CAST(w.d AS BIGINT) * 1000000) // (nr * nc) END AS top_delta_q
       |FROM f JOIN w ON f.g = w.g AND w.rn = 1
       |ORDER BY $order""".stripMargin
  }
}
