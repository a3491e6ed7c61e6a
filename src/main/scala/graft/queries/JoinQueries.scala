package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.sql
import graft.operators.{AsOfJoin, Geo, RangeJoin}
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

    // ── FORWARD as-of join: each click matched to the user's NEXT
    //    purchase at-or-after it — the label-lookahead the backward form
    //    can't express; DuckDB's ASOF with the inequality flipped is the
    //    native oracle.
    sql("q_join_asof_fwd",
      """WITH c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
        |     p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id AS event_id, CAST(c.user_id AS BIGINT) AS user_id,
        |       p.event_id AS next_purchase_id
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts
        |ORDER BY 1""".stripMargin) { (sess, d) =>
      val events = Tables.events(sess, d)
      val clicks = events.filter(col("event_type") === "click")
        .select("user_id", "ts", "event_id")
      val purchases = events.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id")
      AsOfJoin.asOfForward(clicks, purchases, Seq("user_id"), "ts", "ts",
          payload = Seq("event_id"))
        .select(col("event_id"), col("user_id"),
          col("asof_event_id").as("next_purchase_id"))
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
    },

    // ── NULL-SAFE equi-join (<=> / IS NOT DISTINCT FROM): a nullable
    //    join key where NULL must match NULL — the "unknown bucket" join
    //    every cleaned dataset eventually needs. Spark keeps <=> a HASH
    //    join key (null-safe equality is hashable), never a nested-loop
    //    fallback; the '4-NOT SPECIFIED' priority maps to NULL on both
    //    sides and its orders still land in the group.
    sql("q_join_nullsafe",
      """WITH l AS (SELECT NULLIF(o_orderpriority, '4-NOT SPECIFIED') AS pk,
        |                  o_orderkey
        |           FROM orders),
        |r AS (SELECT NULLIF(o_orderpriority, '4-NOT SPECIFIED') AS pk2,
        |             COUNT(*) AS grp_cnt
        |      FROM orders GROUP BY 1)
        |SELECT l.pk, COUNT(*) AS n_orders, CAST(MAX(r.grp_cnt) AS BIGINT) AS grp_cnt
        |FROM l JOIN r ON l.pk IS NOT DISTINCT FROM r.pk2
        |GROUP BY l.pk ORDER BY l.pk""".stripMargin) { (s, d) =>
      val l = Tables.orders(s, d)
        .select(expr("nullif(o_orderpriority, '4-NOT SPECIFIED')").as("pk"),
          col("o_orderkey"))
      val r = Tables.orders(s, d)
        .groupBy(expr("nullif(o_orderpriority, '4-NOT SPECIFIED')").as("pk2"))
        .agg(count(lit(1)).as("grp_cnt"))
      l.join(r, col("pk") <=> col("pk2"))
        .groupBy("pk")
        .agg(count(lit(1)).as("n_orders"), max("grp_cnt").as("grp_cnt"))
        .orderBy("pk")
    },

    // ── spatial containment join (Geo.pointInPolygon): customers at
    //    planted integer coordinates assigned to 4 "borough" polygons (one
    //    non-convex) — the housing-map which-area-is-this-listing-in
    //    question. Grid-bucketed broadcast join + exact integer ray cast;
    //    the oracle replays the identical crossing-number arithmetic over
    //    unnested edges.
    sql("q_geo_pip",
      """WITH pts AS (
        |  SELECT c_custkey, (c_custkey * 7919) % 1000 AS px, (c_custkey * 104729) % 1000 AS py
        |  FROM customer),
        |polys AS (
        |  SELECT * FROM (VALUES
        |    (1, [50,400,400,50], [50,50,400,400]),
        |    (2, [500,900,700], [100,150,450]),
        |    (3, [100,450,450,300,300,100], [500,500,650,650,900,900]),
        |    (4, [700,900,700,500], [600,750,900,750])
        |  ) AS t(poly_id, xs, ys)),
        |edges AS (
        |  SELECT poly_id,
        |         xs[i] AS x1, ys[i] AS y1,
        |         xs[(i % len(xs)) + 1] AS x2, ys[(i % len(xs)) + 1] AS y2
        |  FROM polys, (SELECT unnest(range(1, 7)) AS i) r
        |  WHERE i <= len(xs)),
        |hits AS (
        |  SELECT p.c_custkey, e.poly_id,
        |         SUM(CASE WHEN ((e.y1 > p.py) <> (e.y2 > p.py))
        |                   AND (CASE WHEN e.y2 > e.y1
        |                            THEN (p.px - e.x1) * (e.y2 - e.y1) < (e.x2 - e.x1) * (p.py - e.y1)
        |                            ELSE (p.px - e.x1) * (e.y2 - e.y1) > (e.x2 - e.x1) * (p.py - e.y1)
        |                       END)
        |              THEN 1 ELSE 0 END) AS crossings
        |  FROM pts p, edges e
        |  GROUP BY 1, 2)
        |SELECT c_custkey, CAST(poly_id AS BIGINT) AS poly_id
        |FROM hits WHERE crossings % 2 = 1
        |ORDER BY c_custkey, poly_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val polys = Seq(
        (1L, Seq(50L, 400L, 400L, 50L), Seq(50L, 50L, 400L, 400L)),
        (2L, Seq(500L, 900L, 700L), Seq(100L, 150L, 450L)),
        (3L, Seq(100L, 450L, 450L, 300L, 300L, 100L), Seq(500L, 500L, 650L, 650L, 900L, 900L)),
        (4L, Seq(700L, 900L, 700L, 500L), Seq(600L, 750L, 900L, 750L)))
        .toDF("poly_id", "xs", "ys")
      val pts = Tables.customer(s, d).select(col("c_custkey"),
        ((col("c_custkey") * 7919) % 1000).as("px"),
        ((col("c_custkey") * 104729) % 1000).as("py"))
      Geo.pointInPolygon(pts, "px", "py", polys, cellSize = 100L)
        .select(col("c_custkey"), col("poly_id"))
        .orderBy("c_custkey", "poly_id")
    },

    // ── blocked fuzzy (entity-resolution) join (FuzzyJoin.fuzzyPairs):
    //    near-identical part names matched by Levenshtein ≤ 3 within
    //    last-token blocks — the candidate generator is an EQUI-join on
    //    the block key plus a length-band prune, never an all-pairs scan;
    //    both engines implement the same unit-cost edit distance
    sql("q_join_fuzzy",
      """WITH names AS (SELECT DISTINCT p_name FROM part),
        |b AS (SELECT p_name, split_part(p_name, ' ', 2) AS blk FROM names)
        |SELECT a.p_name AS name_a, bb.p_name AS name_b,
        |       CAST(levenshtein(a.p_name, bb.p_name) AS BIGINT) AS dist
        |FROM b a JOIN b bb ON a.blk = bb.blk AND a.p_name < bb.p_name
        |WHERE abs(length(a.p_name) - length(bb.p_name)) <= 3
        |  AND levenshtein(a.p_name, bb.p_name) <= 3
        |ORDER BY name_a, name_b""".stripMargin) { (s, d) =>
      val names = Tables.part(s, d).select("p_name").distinct()
      graft.operators.FuzzyJoin.fuzzyPairs(names, names, "p_name",
          t => split(t, " ").getItem(1), maxDist = 3)
        .orderBy("name_a", "name_b")
    },

    // ── keyed TABLE DIFF (TableDiff.diff): reconciliation between two
    //    generations of a table — one full-outer hash join on the key,
    //    rows classified added/removed/changed with NULL-safe per-column
    //    attribution. The "after" side is derived deterministically from
    //    orders (delete %10, reprice %7, restatus %14, insert %13 under
    //    shifted keys) so DuckDB rebuilds both sides and the whole diff.
    sql("q_table_diff",
      """WITH base AS MATERIALIZED (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
        |r AS (
        |  SELECT o_orderkey, o_custkey,
        |         CASE WHEN o_orderkey % 14 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
        |         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
        |  FROM base WHERE o_orderkey % 10 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, o_orderstatus, o_totalprice
        |  FROM base WHERE o_orderkey % 13 = 0),
        |d AS (
        |  SELECT COALESCE(l.o_orderkey, r.o_orderkey) AS o_orderkey,
        |    CASE WHEN l.o_orderkey IS NULL THEN 'added'
        |         WHEN r.o_orderkey IS NULL THEN 'removed'
        |         WHEN (l.o_custkey IS DISTINCT FROM r.o_custkey)
        |           OR (l.o_orderstatus IS DISTINCT FROM r.o_orderstatus)
        |           OR (l.o_totalprice IS DISTINCT FROM r.o_totalprice) THEN 'changed'
        |         ELSE 'unchanged' END AS change,
        |    CASE WHEN l.o_orderkey IS NULL OR r.o_orderkey IS NULL THEN ''
        |         ELSE concat_ws(',',
        |           CASE WHEN l.o_custkey IS DISTINCT FROM r.o_custkey THEN 'o_custkey' END,
        |           CASE WHEN l.o_orderstatus IS DISTINCT FROM r.o_orderstatus THEN 'o_orderstatus' END,
        |           CASE WHEN l.o_totalprice IS DISTINCT FROM r.o_totalprice THEN 'o_totalprice' END)
        |    END AS changed_cols
        |  FROM base l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey)
        |SELECT o_orderkey, change, changed_cols FROM d
        |WHERE change <> 'unchanged' ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val (base, right) = diffFixture(s, d)
      graft.operators.TableDiff.diffDetailed(base, right, Seq("o_orderkey"))
        .orderBy("o_orderkey")
    },

    // ── diff SUMMARY (TableDiff.diffSummary): the audit report — class
    //    counts plus one col:<name> row per moved column.
    sql("q_table_diff_summary",
      """WITH base AS MATERIALIZED (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
        |r AS (
        |  SELECT o_orderkey, o_custkey,
        |         CASE WHEN o_orderkey % 14 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
        |         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
        |  FROM base WHERE o_orderkey % 10 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, o_orderstatus, o_totalprice
        |  FROM base WHERE o_orderkey % 13 = 0),
        |d AS MATERIALIZED (
        |  SELECT
        |    CASE WHEN l.o_orderkey IS NULL THEN 'added'
        |         WHEN r.o_orderkey IS NULL THEN 'removed'
        |         WHEN (l.o_custkey IS DISTINCT FROM r.o_custkey)
        |           OR (l.o_orderstatus IS DISTINCT FROM r.o_orderstatus)
        |           OR (l.o_totalprice IS DISTINCT FROM r.o_totalprice) THEN 'changed'
        |         ELSE 'unchanged' END AS change,
        |    CASE WHEN l.o_orderkey IS NULL OR r.o_orderkey IS NULL THEN ''
        |         ELSE concat_ws(',',
        |           CASE WHEN l.o_custkey IS DISTINCT FROM r.o_custkey THEN 'o_custkey' END,
        |           CASE WHEN l.o_orderstatus IS DISTINCT FROM r.o_orderstatus THEN 'o_orderstatus' END,
        |           CASE WHEN l.o_totalprice IS DISTINCT FROM r.o_totalprice THEN 'o_totalprice' END)
        |    END AS changed_cols
        |  FROM base l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey)
        |SELECT metric, n FROM (
        |  SELECT change AS metric, COUNT(*) AS n FROM d GROUP BY 1
        |  UNION ALL
        |  SELECT 'col:' || u.c AS metric, COUNT(*) AS n
        |  FROM d, unnest(string_split(changed_cols, ',')) AS u(c)
        |  WHERE change = 'changed' GROUP BY 1)
        |ORDER BY metric""".stripMargin) { (s, d) =>
      val (base, right) = diffFixture(s, d)
      graft.operators.TableDiff.diffSummary(base, right, Seq("o_orderkey"))
        .orderBy("metric")
    },

    // ── diff over TIME TRAVEL (TableDiff.diffVersions): reconcile two
    //    committed versions of one txn table — a CoW delete and an
    //    append later, the diff names exactly what the commits did.
    sql("q_table_diff_versions",
      """WITH base AS MATERIALIZED (SELECT o_orderkey, o_custkey FROM orders)
        |SELECT o_orderkey, 'removed' AS change, '' AS changed_cols
        |FROM base WHERE o_orderkey % 10 = 0
        |UNION ALL
        |SELECT o_orderkey + 100000000, 'added', '' FROM base WHERE o_orderkey % 13 = 0
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      import graft.sources.TxnTable
      val sfKey = d.replaceAll("[^A-Za-z0-9]", "_")
      val t = graft.Scratch.dir(s"/root/repo/target/tmp/tdiff_txn_$sfKey")
      val base = s.read.parquet(s"$d/orders.parquet")
        .select("o_orderkey", "o_custkey")
      TxnTable.commit(s, base, t, overwrite = false)
      TxnTable.deleteWhere(s, t, col("o_orderkey") % 10 === 0)
      TxnTable.commit(s,
        base.filter(col("o_orderkey") % 13 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L)),
        t, overwrite = false)
      graft.operators.TableDiff.diffVersions(s, t, 1,
          TxnTable.currentVersion(t), Seq("o_orderkey"))
        .orderBy("o_orderkey")
    },

    // ── O(Δ) INCREMENTAL diff (TableDiff.diffVersionsIncremental):
    //    the same reconciliation priced by what changed — folded from
    //    the row-level change feed, so an untouched key never enters
    //    the plan. Lifecycle: CoW delete, shifted-key append, then an
    //    update pass; the fold must agree with the snapshot join (the
    //    spec pins that equality; here DuckDB replays the expectation).
    sql("q_table_diff_incremental",
      """WITH base AS MATERIALIZED (SELECT o_orderkey, o_custkey FROM orders)
        |SELECT o_orderkey, 'removed' AS change, '' AS changed_cols
        |FROM base WHERE o_orderkey % 10 = 0
        |UNION ALL
        |SELECT o_orderkey + 100000000, 'added', ''
        |FROM base WHERE o_orderkey % 13 = 0
        |UNION ALL
        |SELECT o_orderkey, 'changed', 'o_custkey'
        |FROM base WHERE o_orderkey % 10 <> 0 AND o_orderkey % 7 = 0
        |ORDER BY o_orderkey, change""".stripMargin) { (s, d) =>
      import graft.sources.TxnTable
      val sfKey = d.replaceAll("[^A-Za-z0-9]", "_")
      val t = graft.Scratch.dir(s"/root/repo/target/tmp/tdiff_incr_$sfKey")
      val base = s.read.parquet(s"$d/orders.parquet")
        .select("o_orderkey", "o_custkey")
      TxnTable.commit(s, base, t, overwrite = false)
      TxnTable.deleteWhere(s, t, col("o_orderkey") % 10 === 0)
      TxnTable.commit(s,
        base.filter(col("o_orderkey") % 13 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L)),
        t, overwrite = false)
      // the update pass: +1 every %7 custkey (kept keys and shifted
      // appends alike — for ADDED keys the post-image is what counts)
      TxnTable.commit(s, TxnTable.read(s, t)
        .withColumn("o_custkey",
          when(col("o_orderkey") % 7 === 0, col("o_custkey") + 1)
            .otherwise(col("o_custkey"))), t, overwrite = true)
      graft.operators.TableDiff.diffVersionsIncremental(s, t, 1,
          TxnTable.currentVersion(t), Seq("o_orderkey"))
        .orderBy("o_orderkey", "change")
    },

    // ── MERKLE-STYLE partitioned diff (TableDiff.diffPartitioned):
    //    per-partition digests compare first; only the partitions whose
    //    digest moved reach the row-level join — the daily-churn
    //    reconciliation shape (changes confined to '1-URGENT' here; the
    //    other four priorities never leave their digest aggregate).
    sql("q_table_diff_partitioned",
      """WITH base AS MATERIALIZED (
        |  SELECT o_orderkey, o_orderpriority, o_custkey, o_totalprice
        |  FROM orders),
        |u AS (SELECT * FROM base WHERE o_orderpriority = '1-URGENT')
        |SELECT o_orderkey, 'removed' AS change, '' AS changed_cols
        |FROM u WHERE o_orderkey % 10 = 0
        |UNION ALL
        |SELECT o_orderkey, 'changed', 'o_totalprice'
        |FROM u WHERE o_orderkey % 10 <> 0 AND o_orderkey % 7 = 0
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val base = s.read.parquet(s"$d/orders.parquet")
        .select("o_orderkey", "o_orderpriority", "o_custkey", "o_totalprice")
      val urgent = col("o_orderpriority") === "1-URGENT"
      val right = base.filter(!urgent)
        .unionByName(base.filter(urgent && col("o_orderkey") % 10 =!= 0)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 7 === 0, col("o_totalprice") + lit(1.0))
              .otherwise(col("o_totalprice"))))
      graft.operators.TableDiff.diffPartitioned(base, right,
          Seq("o_orderkey"), "o_orderpriority")
        .orderBy("o_orderkey")
    },

    // ── SCHEMA diff (TableDiff.schemaDiff): the metadata half of
    //    reconciliation — presence and type moves between two
    //    generations of a table, driver-side, nothing runs.
    sql("q_table_diff_schema",
      """SELECT * FROM (VALUES
        |  ('o_custkey', 'type_changed', 'BIGINT', 'INT'),
        |  ('o_flag', 'added', '', 'BOOLEAN'),
        |  ('o_totalprice', 'removed', 'DOUBLE', ''))
        |  AS t(col_name, change, before_type, after_type)
        |ORDER BY col_name""".stripMargin) { (s, d) =>
      val base = s.read.parquet(s"$d/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val after = base.select(col("o_orderkey"),
        col("o_custkey").cast("int").as("o_custkey"),
        col("o_orderstatus"), lit(true).as("o_flag"))
      graft.operators.TableDiff.schemaDiff(s, base, after)
        .orderBy("col_name")
    }
  )

  /** The shared q_table_diff fixture: (before, after) sides derived
    * deterministically from orders so the oracle rebuilds both. */
  private def diffFixture(s: org.apache.spark.sql.SparkSession, d: String) = {
    val base = s.read.parquet(s"$d/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val right = base.filter(col("o_orderkey") % 10 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + lit(1.0))
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 14 === 0, lit("X"))
          .otherwise(col("o_orderstatus")))
      .unionByName(base.filter(col("o_orderkey") % 13 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L)))
    (base, right)
  }
}
