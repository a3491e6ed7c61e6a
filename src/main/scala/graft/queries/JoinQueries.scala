package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.sql
import graft.operators.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.functions._

/** Engine-added join surface beyond the reference: as-of (point-in-time)
  * join and the semi/anti forms SURVEY §2.4 notes come free in Spark. */
object JoinQueries {

  val all: Seq[QueryDef] = Seq(

    // ── as-of join: each purchase matched to the user's most recent
    //    prior-or-simultaneous signup. DuckDB has native ASOF JOIN — the
    //    oracle is the real thing.
    sql("q_join_asof",
      """WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
        |     s AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup')
        |SELECT p.event_id AS event_id, CAST(p.user_id AS BIGINT) AS user_id,
        |       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
        |       s.event_id AS asof_event_id
        |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY 1""".stripMargin) { (sess, d) =>
      val events = Tables.events(sess, d)
      val purchases = events.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id")
      val signups = events.filter(col("event_type") === "signup")
        .select("user_id", "ts", "event_id")
      AsOfJoin.asOf(purchases, signups, Seq("user_id"), "ts", "ts",
          payload = Seq("event_id"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
          col("asof_event_id"))
        .orderBy("event_id")
    },

    // ── range (point-in-interval) join: sampled shipments against
    //    order-activity windows (o_orderdate + orderkey%30+1 days),
    //    bucketized to 32-day cells — an equi-join plan, never a
    //    nested loop (asserted in spec). Day arithmetic on both sides.
    sql("q_join_range",
      """WITH iv AS (
        |  SELECT o_orderkey AS win_id,
        |         CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS lo_d,
        |         CAST(o_orderdate AS DATE) - DATE '1970-01-01'
        |           + (o_orderkey % 30) + 1 AS hi_d,
        |         o_totalprice
        |  FROM orders WHERE o_orderkey % 20 = 0),
        |pt AS (
        |  SELECT l_orderkey, CAST(l_linenumber AS INT) AS l_linenumber,
        |         CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS p_d
        |  FROM lineitem WHERE l_orderkey % 20 = 1)
        |SELECT pt.l_orderkey, pt.l_linenumber,
        |       COUNT(*) AS n_windows,
        |       CAST(SUM(CAST(iv.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM pt JOIN iv ON pt.p_d >= iv.lo_d AND pt.p_d <= iv.hi_d
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val epoch = lit("1970-01-01").cast("date")
      val iv = Tables.orders(s, d).filter(col("o_orderkey") % 20 === 0)
        .select(col("o_orderkey").as("win_id"),
          datediff(to_date(col("o_orderdate")), epoch).cast("long").as("lo_d"),
          (datediff(to_date(col("o_orderdate")), epoch)
            + col("o_orderkey") % 30 + 1).cast("long").as("hi_d"),
          col("o_totalprice"))
      val pt = Tables.lineitem(s, d).filter(col("l_orderkey") % 20 === 1)
        .select(col("l_orderkey"), col("l_linenumber").cast("int").as("l_linenumber"),
          datediff(to_date(col("l_shipdate")), epoch).cast("long").as("p_d"))
      RangeJoin.pointInInterval(pt, iv, "p_d", "lo_d", "hi_d", width = 32L)
        .groupBy("l_orderkey", "l_linenumber")
        .agg(count(lit(1)).as("n_windows"),
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("sum_price"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ── interval-overlap join: order-activity windows from two disjoint
    //    order samples, all intersecting (A, B) window pairs. Bucketized to
    //    32-day cells, each pair emitted once (in the cell of the overlap's
    //    left edge) — an equi-join plan; the oracle is the plain
    //    inequality join.
    sql("q_join_interval",
      """WITH a AS (
        |  SELECT o_orderkey AS a_id,
        |         CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS a_lo,
        |         CAST(o_orderdate AS DATE) - DATE '1970-01-01'
        |           + (o_orderkey % 30) + 1 AS a_hi
        |  FROM orders WHERE o_orderkey % 40 = 0),
        |b AS (
        |  SELECT o_orderkey AS b_id,
        |         CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS b_lo,
        |         CAST(o_orderdate AS DATE) - DATE '1970-01-01'
        |           + (o_orderkey % 45) + 1 AS b_hi,
        |         o_totalprice
        |  FROM orders WHERE o_orderkey % 40 = 1)
        |SELECT a.a_id, COUNT(*) AS n_overlaps,
        |       CAST(SUM(CAST(b.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM a JOIN b ON a.a_lo <= b.b_hi AND b.b_lo <= a.a_hi
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val epoch = lit("1970-01-01").cast("date")
      val a = Tables.orders(s, d).filter(col("o_orderkey") % 40 === 0)
        .select(col("o_orderkey").as("a_id"),
          datediff(to_date(col("o_orderdate")), epoch).cast("long").as("a_lo"),
          (datediff(to_date(col("o_orderdate")), epoch)
            + col("o_orderkey") % 30 + 1).cast("long").as("a_hi"))
      val b = Tables.orders(s, d).filter(col("o_orderkey") % 40 === 1)
        .select(col("o_orderkey").as("b_id"),
          datediff(to_date(col("o_orderdate")), epoch).cast("long").as("b_lo"),
          (datediff(to_date(col("o_orderdate")), epoch)
            + col("o_orderkey") % 45 + 1).cast("long").as("b_hi"),
          col("o_totalprice"))
      RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", width = 32L)
        .groupBy("a_id")
        .agg(count(lit(1)).as("n_overlaps"),
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("sum_price"))
        .orderBy("a_id")
    },

    // ── left-semi: customers that have at least one order
    sql("q_join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },

    // ── left-anti: customers with no high-value order (every customer has
    //    SOME order in the testdata — the threshold makes the anti set real)
    sql("q_join_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }
  )
}
