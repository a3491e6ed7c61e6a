package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.sql
import graft.operators.AsOfJoin
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
