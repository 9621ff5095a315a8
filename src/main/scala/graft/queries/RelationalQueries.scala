package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's relational operator surface (SURVEY.md §2) exercised
  * over the harness TPC-H-ish tables. Query names carry the §2 operator
  * ids they cover.
  *
  * Scale notes (100 TB discipline):
  *  - every dimension join (`part`, `nation`, `region`, `supplier`,
  *    `customer` vs `lineitem`/`orders`) broadcasts the small side;
  *  - filters/projections are plain Column expressions so Catalyst
  *    pushes them into the parquet scan;
  *  - money aggregates run over DECIMAL(18,2) casts — exact, engine-
  *    portable, and still codegen'd;
  *  - every query ends in a deterministic ORDER BY so results are
  *    stable under any row-order-sensitive comparison.
  */
object RelationalQueries {

  val all: Seq[QueryDef] = Seq(

    // S7: header CSV scan ≡ schema'd columnar scan + filter + projection,
    // pushed down to the parquet reader (PushedFilters in explain).
    QueryDef(
      "s7_scan_filter_project",
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // P1: allele-processable filter ≡ isin + length predicate.
    QueryDef(
      "p1_filter_isin",
      """SELECT c_custkey, c_mktsegment
        |FROM customer
        |WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE') AND length(c_name) > 5
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .where(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE") &&
          length(col("c_name")) > 5)
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    },

    // P2: hard-coded blocklist ≡ NOT IN literal list (constants.py:7-11).
    QueryDef(
      "p2_blocklist_notin",
      """SELECT p_brand, count(*) AS n
        |FROM part
        |WHERE p_brand NOT IN ('Brand#11','Brand#22','Brand#33')
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .where(!col("p_brand").isin("Brand#11", "Brand#22", "Brand#33"))
        .groupBy("p_brand").agg(count(lit(1)).as("n"))
        .orderBy("p_brand")
    },

    // P4: locus/name extraction ≡ split + first token (app.py:603-604).
    QueryDef(
      "p4_split_extract",
      """SELECT split_part(p_type, ' ', 1) AS type_head, count(*) AS n
        |FROM part
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .select(split(col("p_type"), " ").getItem(0).as("type_head"))
        .groupBy("type_head").agg(count(lit(1)).as("n"))
        .orderBy("type_head")
    },

    // P11: regex validation ≡ rlike filter.
    QueryDef(
      "p11_regex_filter",
      """SELECT source, count(*) AS n
        |FROM documents
        |WHERE regexp_matches(source, '^src[0-9]$')
        |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .where(col("source").rlike("^src[0-9]$"))
        .groupBy("source").agg(count(lit(1)).as("n"))
        .orderBy("source")
    },

    // J1: alignment dict probe ≡ broadcast left join on a small dim.
    QueryDef(
      "j1_broadcast_join",
      """SELECT p.p_brand,
        |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS revenue_cents,
        |       count(*) AS n
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin) { (s, d) =>
      // no forced broadcast: part grows with SF (unlike nation/region);
      // AQE broadcasts it while it is actually small
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          // Exact DECIMAL(18,2) aggregation internally, but NO decimal
          // in the final schema: parquet decimal columns render
          // differently across readers, breaking cross-engine hash
          // compare even with byte-identical values. BIGINT cents
          // (decimal × 100 is exact) is reader-portable.
          (sum(col("l_extendedprice").cast("decimal(18,2)")) * 100)
            .cast("bigint").as("revenue_cents"),
          count(lit(1)).as("n"))
        .orderBy("p_brand")
    },

    // J4: 3-way natural-key join (GFE↔IPD_Allele↔IPD_Accession shape).
    QueryDef(
      "j4_multiway_join",
      """SELECT r.r_name, n.n_name, count(*) AS n_cust
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name, n.n_name
        |ORDER BY r.r_name, n.n_name""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name").agg(count(lit(1)).as("n_cust"))
        .orderBy("r_name", "n_name")
    },

    // J7: singleton × relation cartesian (Submitter×GFE, load.cyp:101-111).
    QueryDef(
      "j7_cross_singleton",
      """SELECT r.r_name, t.total_items
        |FROM region r, (SELECT count(*) AS total_items FROM lineitem) t
        |ORDER BY r.r_name""".stripMargin) { (s, d) =>
      val singleton = Tables.lineitem(s, d).agg(count(lit(1)).as("total_items"))
      Tables.region(s, d).crossJoin(broadcast(singleton))
        .select("r_name", "total_items")
        .orderBy("r_name")
    },

    // J8: the documented 2-hop traversal (allele→GFE→features,
    // reference.rst:34-37) ≡ customer→orders→lineitem, projected+ordered.
    QueryDef(
      "j8_two_hop_traversal",
      """SELECT c.c_custkey, o.o_orderkey, l.l_linenumber, l.l_partkey
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_custkey < 20
        |ORDER BY c.c_custkey, o.o_orderkey, l.l_linenumber""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).where(col("c_custkey") < 20)
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      broadcast(c)
        .join(o, col("o_custkey") === col("c_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .select("c_custkey", "o_orderkey", "l_linenumber", "l_partkey")
        .orderBy("c_custkey", "o_orderkey", "l_linenumber")
    },

    // Semi join (EXISTS) — §2.3 "absent in reference" gap, implemented.
    QueryDef(
      "j_semi_exists",
      """SELECT c_custkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(
          Tables.orders(s, d).where(col("o_orderstatus") === "F"),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .select("c_custkey").orderBy("c_custkey")
    },

    // Anti join (NOT EXISTS) — customers with no pending ('P') orders.
    QueryDef(
      "j_anti_not_exists",
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(
          Tables.orders(s, d).where(col("o_orderstatus") === "P"),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey")
    },

    // Full-outer merge: positive-balance customers vs per-customer
    // order counts — unmatched rows survive from BOTH sides (filtered
    // customers with orders keep a NULL segment; order-less customers
    // keep a NULL count). Equi-keyed, so it shuffles once per side —
    // never a nested loop.
    QueryDef(
      "j_full_outer",
      """SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
        |       c.c_mktsegment, o.n_orders
        |FROM (SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal >= 0) c
        |FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_orders
        |                 FROM orders GROUP BY 1) o
        |ON c.c_custkey = o.o_custkey
        |ORDER BY custkey""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).where(col("c_acctbal") >= 0)
        .select("c_custkey", "c_mktsegment")
      val o = Tables.orders(s, d).groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_mktsegment"), col("n_orders"))
        .orderBy("custkey")
    },

    // A1: node count per label ≡ union-all of per-table counts.
    QueryDef(
      "a1_count_by_label",
      """SELECT 'customer' AS label, count(*) AS n FROM customer
        |UNION ALL SELECT 'orders', count(*) FROM orders
        |UNION ALL SELECT 'lineitem', count(*) FROM lineitem
        |UNION ALL SELECT 'part', count(*) FROM part
        |UNION ALL SELECT 'supplier', count(*) FROM supplier
        |ORDER BY label""".stripMargin) { (s, d) =>
      Seq("customer", "orders", "lineitem", "part", "supplier")
        .map(t => Tables.table(s, d, t)
          .agg(count(lit(1)).as("n")).select(lit(t).as("label"), col("n")))
        .reduce(_ unionAll _)
        .orderBy("label")
    },

    // A2: releases histogram ≡ explode(distinct array) → count → order.
    QueryDef(
      "a2_explode_histogram",
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(p_type, ' ')) AS token FROM part)
        |GROUP BY token ORDER BY token""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .select(explode(split(col("p_type"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy("token")
    },

    // A4: releases-array accumulate-merge ≡ sorted distinct collect per key
    // (load.cyp:94-95), serialized to string for engine-portable compare.
    QueryDef(
      "a4_array_merge",
      """SELECT o_custkey,
        |       array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',') AS priorities
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(concat_ws(",", array_sort(collect_set(col("o_orderpriority"))))
          .as("priorities"))
        .orderBy("o_custkey")
    },

    // A5: MERGE first-writer-wins upsert ≡ keep first row per natural key
    // under a deterministic ordering (load.cyp:7,23-31).
    QueryDef(
      "a5_merge_first_wins",
      """SELECT o_custkey, o_orderkey, o_orderstatus FROM (
        |  SELECT o_custkey, o_orderkey, o_orderstatus,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_orderstatus")
        .orderBy("o_custkey")
    },

    // §2.5: accession assignment ≡ dense_rank within a partition.
    QueryDef(
      "w_dense_rank",
      """SELECT s_suppkey,
        |       dense_rank() OVER (PARTITION BY s_nationkey
        |                          ORDER BY s_acctbal, s_suppkey) AS rnk
        |FROM supplier ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
      Tables.supplier(s, d)
        .select(col("s_suppkey"), dense_rank().over(w).as("rnk"))
        .orderBy("s_suppkey")
    },

    // Top-k per group (row_number ≤ k) — ranking surface.
    QueryDef(
      "w_topk_per_group",
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select("o_custkey", "o_orderkey")
        .orderBy("o_custkey", "o_orderkey")
    },

    // Event-sequence analytics: per-user gap to the previous event and
    // the preceding event type (lead/lag family). One shuffle on
    // user_id; gaps are exact integer micros, so no float hazard. The
    // window ORDER BY is the µs-truncated instant on both engines
    // (events.parquet is ns-precision; Spark reads it through the µs
    // snapshot) with event_id as the deterministic tiebreak.
    QueryDef(
      "w_lead_lag",
      """SELECT user_id, event_id,
        |       epoch_us(ts) - lag(epoch_us(ts))
        |         OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us,
        |       lag(event_type)
        |         OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_type
        |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id"))
      Tables.events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .select(col("user_id"), col("event_id"),
          (col("us") - lag(col("us"), 1).over(w)).as("gap_us"),
          lag(col("event_type"), 1).over(w).as("prev_type"))
        .orderBy("user_id", "event_id")
    },

    // Rolling window over a row frame: moving 4-event spend per user.
    // Money goes through DECIMAL internally and leaves as BIGINT cents
    // (exact under any evaluation order; reader-portable schema). Same
    // single user_id shuffle as the lag query — at scale both windows
    // share one sort within the partition.
    QueryDef(
      "w_moving_sum",
      """SELECT user_id, event_id,
        |       CAST(sum(CAST(value AS DECIMAL(18,2)))
        |              OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) * 100 AS BIGINT)
        |         AS mov_cents
        |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(-3, Window.currentRow)
      Tables.events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .select(col("user_id"), col("event_id"),
          (sum(col("value").cast("decimal(18,2)")).over(w) * 100)
            .cast("bigint").as("mov_cents"))
        .orderBy("user_id", "event_id")
    },

    // Strict-order funnel (view → click after it → purchase after
    // that): the conversion operator of event analytics. Each stage
    // is a min-timestamp aggregate gated by the previous stage's
    // instant — an equi-join on user_id with a range conjunct, never
    // a sequence scan per user. All four frames shuffle on the SAME
    // user_id key, so at scale AQE reuses one exchange layout; stage
    // verdicts are integers (µs instants compared, never emitted).
    QueryDef(
      "w_funnel_stages",
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |      JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
        |      WHERE e.event_type = 'click' GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |      JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
        |      WHERE e.event_type = 'purchase' GROUP BY 1),
        |u AS (SELECT DISTINCT user_id FROM events)
        |SELECT u.user_id,
        |       CASE WHEN p.user_id IS NOT NULL THEN 3
        |            WHEN c.user_id IS NOT NULL THEN 2
        |            WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS stage
        |FROM u LEFT JOIN v ON u.user_id = v.user_id
        |       LEFT JOIN c ON u.user_id = c.user_id
        |       LEFT JOIN p ON u.user_id = p.user_id
        |ORDER BY u.user_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      def stageAfter(evType: String, prev: org.apache.spark.sql.DataFrame,
          prevTs: String, outTs: String) =
        e.where(col("event_type") === evType).as("e")
          .join(prev.as("p"),
            col("e.user_id") === col("p.user_id") &&
              col("e.ts") > col(s"p.$prevTs"))
          .select(col("e.user_id").as("user_id"), col("e.ts").as("ts"))
          .groupBy("user_id").agg(min("ts").as(outTs))
      val v = e.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val c = stageAfter("click", v, "t1", "t2")
      val p = stageAfter("purchase", c, "t2", "t3")
      e.select("user_id").distinct()
        .join(v.select(col("user_id"), lit(1).as("s1")), Seq("user_id"), "left")
        .join(c.select(col("user_id"), lit(2).as("s2")), Seq("user_id"), "left")
        .join(p.select(col("user_id"), lit(3).as("s3")), Seq("user_id"), "left")
        .select(col("user_id"),
          coalesce(col("s3"), col("s2"), col("s1"), lit(0)).as("stage"))
        .orderBy("user_id")
    },

    // Weekly cohort retention: users bucketed by signup week, counted
    // per week-offset of later activity — the cohort matrix every
    // growth dashboard renders. Week arithmetic stays integral
    // (date difference div 7) so the offsets hash identically; the
    // activity frame is distinct-per-(user, week) BEFORE the join, so
    // the join input is bounded by users × weeks, not raw events.
    QueryDef(
      "w_retention_cohorts",
      """WITH f AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        |           FROM events WHERE event_type = 'signup' GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS activity_week
        |      FROM events)
        |SELECT f.cohort_week, (a.activity_week - f.cohort_week) // 7 AS week_offset,
        |       count(DISTINCT f.user_id) AS n_users
        |FROM f JOIN a ON f.user_id = a.user_id
        |WHERE a.activity_week >= f.cohort_week
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      val f = e.where(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("t0"))
        .select(col("user_id"),
          to_date(date_trunc("week", col("t0"))).as("cohort_week"))
      val a = e.select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("activity_week"))
        .distinct()
      f.join(a, "user_id")
        .where(col("activity_week") >= col("cohort_week"))
        .select(col("cohort_week"),
          expr("datediff(activity_week, cohort_week) div 7").as("week_offset"),
          col("user_id"))
        .groupBy("cohort_week", "week_offset")
        .agg(count_distinct(col("user_id")).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    },

    // Distribution-rank window family: ntile quartiles, percent_rank,
    // cume_dist over order totals per market segment... one window
    // spec serves all three functions (single shuffle + sort). The
    // float ranks are safe to hash cross-engine: both engines compute
    // the same (rank−1)/(n−1) and rank/n divisions of identical
    // integers, and IEEE-754 binary64 division is uniquely defined.
    QueryDef(
      "w_rank_family",
      """SELECT o_orderkey,
        |       ntile(4) OVER w AS quartile,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("o_orderkey")
    },

    // Next-event transition counts (the Markov matrix of the event
    // stream): lag the per-user ordered type, then count (prev, next)
    // pairs — the session-flow fingerprint behavior analytics feeds
    // on. Shares the exact window key/order of w_lead_lag, and the
    // transition aggregate is map-side partial over a 25-cell domain.
    QueryDef(
      "w_next_event",
      """SELECT prev_type, event_type, count(*) AS n FROM (
        |  SELECT event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) AS prev_type
        |  FROM events)
        |WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id"))
      Tables.events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .select(col("event_type"),
          lag(col("event_type"), 1).over(w).as("prev_type"))
        .where(col("prev_type").isNotNull)
        .groupBy("prev_type", "event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("prev_type", "event_type")
    },

    // SCD Type-2 dimension build (slowly-changing attribute →
    // versioned validity intervals): collapse each user's
    // consecutive-same-value event_type runs (gaps-and-islands via
    // lag-change flag + running sum), then close each version with
    // the next version's start (Long.MaxValue = still current).
    // The lakehouse CDC shape: one shuffle on the entity key, every
    // window and the rollup reuse that partitioning, nothing else
    // moves. Micros as BIGINT end-to-end (no timestamp rendering
    // skew); the running sum is CAST in the oracle because DuckDB's
    // windowed sum yields HUGEINT.
    QueryDef(
      "w_scd2_intervals",
      """WITH ord AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |         CASE WHEN lag(event_type) OVER w IS NULL
        |                OR lag(event_type) OVER w <> event_type
        |              THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |isl AS (
        |  SELECT user_id, event_type, us,
        |         CAST(sum(chg) OVER (PARTITION BY user_id
        |                             ORDER BY us, event_id) AS BIGINT) AS version
        |  FROM ord),
        |g AS (
        |  SELECT user_id, version, min(event_type) AS event_type,
        |         CAST(min(us) AS BIGINT) AS valid_from_us,
        |         CAST(count(*) AS BIGINT) AS n_events
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, version, event_type, valid_from_us,
        |       COALESCE(lead(valid_from_us) OVER (
        |           PARTITION BY user_id ORDER BY version),
        |         9223372036854775807) AS valid_to_us,
        |       n_events
        |FROM g ORDER BY user_id, version""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val byVersion = Window.partitionBy("user_id").orderBy(col("version"))
      Tables.events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .select(col("user_id"), col("event_id"), col("event_type"), col("us"))
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(w).isNull ||
            lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
            .otherwise(0L))
        .withColumn("version", sum(col("chg")).over(w))
        .groupBy("user_id", "version")
        .agg(min("event_type").as("event_type"),
          min("us").as("valid_from_us"),
          count(lit(1)).as("n_events"))
        .withColumn("valid_to_us",
          lead(col("valid_from_us"), 1, Long.MaxValue).over(byVersion))
        .select("user_id", "version", "event_type",
          "valid_from_us", "valid_to_us", "n_events")
        .orderBy("user_id", "version")
    },

    // Z-order (Morton) layout key: the multi-dimensional clustering
    // sort every lakehouse table layout uses for min/max file
    // skipping — rows close in BOTH (user, time-bucket) sort
    // adjacently, so either predicate prunes files (a linear sort
    // serves only one dimension). Pure codegen'd bit arithmetic, no
    // UDF; the oracle evaluates the bit-identical ANSI expression.
    // OperatorsSpec proves the locality claim quantitatively.
    QueryDef(
      "o_zorder_layout",
      s"""SELECT event_id,
        |       ${graft.operators.ZOrder.zvalueSql(
              "user_id", "epoch_us(ts) // 60000000", 16)} AS zv
        |FROM events
        |ORDER BY zv, event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          graft.operators.ZOrder.zvalue(
            col("user_id"),
            expr("unix_micros(ts) div 60000000"), // exact integer division
            16).as("zv"))
        .orderBy("zv", "event_id")
    },

    // Compaction planner (OPTIMIZE/bin-packing parity — the 100 TB
    // small-files answer): assign each document to an output file so
    // files within a source partition pack to a target payload, via
    // the running-sum rule file = ⌊bytes_before / target⌋ under a
    // deterministic doc_id order. One window over one partition-key
    // shuffle, then a map-side-combined rollup of the plan — the
    // planner a writer runs BEFORE rewriting, so the expensive data
    // movement happens once, guided by this cheap pass. Integer
    // division end-to-end; the oracle replays the identical rule.
    // (Target 2 KB is scaled to the synthetic corpus — ~4 files per
    // source at sf0.01 — standing in for the 128 MB a real lake uses.)
    QueryDef(
      "o_compaction_plan",
      """SELECT source, file_idx,
        |       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS bytes
        |FROM (SELECT source, n_chars,
        |        CAST(COALESCE(sum(n_chars) OVER (
        |          PARTITION BY source ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          // 2048 AS BIGINT) AS file_idx
        |      FROM documents)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val before = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, d)
        .select(col("source"), col("n_chars"),
          coalesce(sum("n_chars").over(before), lit(0L)).as("cum"))
        .select(col("source"), col("n_chars"),
          expr("cum div 2048").as("file_idx"))
        .groupBy("source", "file_idx")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("bytes"))
        .orderBy("source", "file_idx")
    },

    // O1′–O4′: global sort + limit with deterministic tie-break.
    QueryDef(
      "o_sort_limit",
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 10""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    },

    // O1: new-release detection ≡ EXCEPT (set difference on keys):
    // customers active in 1997 that were not active in 1996.
    QueryDef(
      "set_except",
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      o.where(year(col("o_orderdate")) === 1997).select("o_custkey")
        .except(o.where(year(col("o_orderdate")) === 1996).select("o_custkey"))
        .orderBy("o_custkey")
    },

    // O2: set equality check surface ≡ INTERSECT.
    QueryDef(
      "set_intersect",
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    },

    // §2.8 string scalar pack: upper/substring/concat_ws/regexp_replace/length.
    QueryDef(
      "f_string_pack",
      """SELECT c_custkey,
        |       upper(c_mktsegment) AS seg_u,
        |       substr(c_name, 1, 8) AS name8,
        |       concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS tagged,
        |       regexp_replace(c_name, '[0-9]+', '#') AS name_masked,
        |       length(c_name) AS name_len
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        upper(col("c_mktsegment")).as("seg_u"),
        substring(col("c_name"), 1, 8).as("name8"),
        concat_ws("-", col("c_mktsegment"), col("c_custkey").cast("string")).as("tagged"),
        regexp_replace(col("c_name"), "[0-9]+", "#").as("name_masked"),
        length(col("c_name")).as("name_len")
      ).orderBy("c_custkey")
    },

    // §2.8 date scalar pack: extraction + grouping on event time.
    QueryDef(
      "f_date_pack",
      """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_cents
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"),
          // exact decimal sum internally; BIGINT cents in the output
          // schema (decimal columns are not reader-portable for hashing).
          (sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint").as("total_cents"))
        .orderBy("y", "m")
    },

    // §2.8 JSON decode: extract key from the props JSON column.
    QueryDef(
      "f_json_extract",
      """SELECT json_extract_string(props, '$.k') AS k, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY CAST(k AS BIGINT)""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(get_json_object(col("props"), "$.k").as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy(col("k").cast("long"))
    },

    // Malformed-record routing (the ingest guard): parse a JSON
    // column, pass clean rows through and route unparseable ones to
    // the reject side — the same side-channel contract as the
    // reference's NDJSON error sink (S6), applied to arbitrary feeds.
    // The synthetic corpus carries no corruption, so every 7th row is
    // deterministically mangled first (leading brace dropped) on BOTH
    // engines; the verdict is a scan-local per-row map. Spark's
    // get_json_object returns NULL on malformed input; DuckDB errors,
    // so its side gates extraction behind json_valid — same verdict.
    QueryDef(
      "s_corrupt_routing",
      """SELECT event_id,
        |       CASE WHEN (CASE WHEN json_valid(c) THEN json_extract_string(c, '$.k') END) IS NULL
        |            THEN 'rejected' ELSE 'ok' END AS status
        |FROM (SELECT event_id,
        |             CASE WHEN event_id % 7 = 0 THEN substr(props, 2) ELSE props END AS c
        |      FROM events)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .withColumn("c",
          when(pmod(col("event_id"), lit(7)) === 0,
            expr("substring(props, 2)")).otherwise(col("props")))
        .select(col("event_id"),
          when(get_json_object(col("c"), "$.k").isNull, lit("rejected"))
            .otherwise(lit("ok")).as("status"))
        .orderBy("event_id")
    },

    // Table profiling (ANALYZE parity): per-column row/null/distinct
    // counts and min/max in ONE aggregate pass — Spark computes all
    // fifteen statistics in a single job (Catalyst expands the three
    // exact distincts internally) and explodes the summary row into
    // the per-column relation; no per-column rescan. min/max leave as
    // VARCHAR so the row schema is uniform (floats are excluded:
    // double→string rendering differs across engines).
    QueryDef(
      "a_profile",
      """SELECT 'event_id' AS col_name, count(*) AS n,
        |       count(*) - count(event_id) AS n_null,
        |       count(DISTINCT event_id) AS n_distinct,
        |       CAST(min(event_id) AS VARCHAR) AS min_s,
        |       CAST(max(event_id) AS VARCHAR) AS max_s
        |FROM events
        |UNION ALL
        |SELECT 'event_type', count(*), count(*) - count(event_type),
        |       count(DISTINCT event_type),
        |       CAST(min(event_type) AS VARCHAR), CAST(max(event_type) AS VARCHAR)
        |FROM events
        |UNION ALL
        |SELECT 'user_id', count(*), count(*) - count(user_id),
        |       count(DISTINCT user_id),
        |       CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
        |FROM events
        |ORDER BY col_name""".stripMargin) { (s, d) =>
      def stats(c: String) = Seq(
        count(lit(1)).as(s"${c}_n"),
        (count(lit(1)) - count(col(c))).as(s"${c}_nn"),
        count_distinct(col(c)).as(s"${c}_nd"),
        min(col(c)).cast("string").as(s"${c}_min"),
        max(col(c)).cast("string").as(s"${c}_max"))
      val cols = Seq("event_id", "event_type", "user_id")
      val aggs = cols.flatMap(stats)
      Tables.events(s, d)
        .agg(aggs.head, aggs.tail: _*)
        .select(explode(array(cols.map(c => struct(
          lit(c).as("col_name"), col(s"${c}_n").as("n"),
          col(s"${c}_nn").as("n_null"), col(s"${c}_nd").as("n_distinct"),
          col(s"${c}_min").as("min_s"), col(s"${c}_max").as("max_s"))): _*))
          .as("s"))
        .select("s.*")
        .orderBy("col_name")
    },

    // Rollup (multi-level aggregation in one pass; SURVEY §2.4 notes
    // the reference lacks grouping sets — engine capability beyond it).
    // NULL group markers coalesced to 'ALL' for engine-stable compare.
    QueryDef(
      "a_rollup",
      """SELECT coalesce(r.r_name, 'ALL') AS region,
        |       coalesce(n.n_name, 'ALL') AS nation,
        |       count(*) AS n_cust
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP(r.r_name, n.n_name)
        |ORDER BY region, nation""".stripMargin) { (s, d) =>
      // via spark.sql: the DataFrame rollup trips the ambiguous-self-
      // join detector on grouping attrs inherited from the join; SQL
      // name resolution sidesteps the dataset-id tagging. Identical
      // logical plan (Aggregate with Rollup grouping sets).
      Tables.customer(s, d).createOrReplaceTempView("graft_rollup_customer")
      Tables.nation(s, d).createOrReplaceTempView("graft_rollup_nation")
      Tables.region(s, d).createOrReplaceTempView("graft_rollup_region")
      s.sql(
        """SELECT coalesce(r_name, 'ALL') AS region,
          |       coalesce(n_name, 'ALL') AS nation,
          |       count(*) AS n_cust
          |FROM graft_rollup_customer c
          |JOIN graft_rollup_nation n ON c.c_nationkey = n.n_nationkey
          |JOIN graft_rollup_region r ON n.n_regionkey = r.r_regionkey
          |GROUP BY ROLLUP(r_name, n_name)
          |ORDER BY region, nation""".stripMargin)
    },

    // Explicit grouping sets (two independent dimensions in one pass —
    // one shuffle instead of a per-dimension query each; the Spark 4
    // Dataset.groupingSets API). NULL markers coalesced for
    // engine-stable compare; user_id stringified so both marker
    // columns order lexicographically on both engines.
    QueryDef(
      "a_grouping_sets",
      """SELECT coalesce(event_type, 'ALL') AS event_type,
        |       coalesce(CAST(user_id AS VARCHAR), 'ALL') AS user_id,
        |       count(*) AS n
        |FROM events GROUP BY GROUPING SETS ((event_type), (user_id))
        |ORDER BY event_type, user_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupingSets(
          Seq(Seq(col("event_type")), Seq(col("user_id"))),
          col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("user_id").cast("string"), lit("ALL")).as("user_id"),
          col("n"))
        .orderBy("event_type", "user_id")
    },

    // Pivot: per-user event counts spread across event-type columns.
    // Oracle uses the equivalent conditional aggregation.
    QueryDef(
      "f_pivot",
      """SELECT user_id,
        |       count(*) FILTER (event_type = 'click') AS click,
        |       count(*) FILTER (event_type = 'error') AS error,
        |       count(*) FILTER (event_type = 'purchase') AS purchase,
        |       count(*) FILTER (event_type = 'signup') AS signup,
        |       count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")
    },

    // Exact discrete percentiles (no interpolation, no sketch — the
    // values are actual rows, so cross-engine compare is exact).
    QueryDef(
      "a_percentile_disc",
      """SELECT c_mktsegment,
        |       CAST(quantile_disc(CAST(o_totalprice AS DECIMAL(18,2)), 0.5) * 100 AS BIGINT) AS p50_cents,
        |       CAST(quantile_disc(CAST(o_totalprice AS DECIMAL(18,2)), 0.9) * 100 AS BIGINT) AS p90_cents
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      // customer grows with SF — AQE picks broadcast while small
      Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .withColumn("price", col("o_totalprice").cast("decimal(18,2)"))
        .groupBy("c_mktsegment")
        .agg(
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY price)").as("p50"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY price)").as("p90"))
        // Spark's percentile_disc returns DOUBLE while DuckDB's
        // quantile_disc keeps DECIMAL — a trailing-zero value then
        // renders differently per reader (sf0.1 caught '249308.0' vs
        // '249308.00'). BIGINT cents on both sides; round() first
        // because double*100 can land a hair under the integer.
        .select(col("c_mktsegment"),
          round(col("p50") * 100, 0).cast("bigint").as("p50_cents"),
          round(col("p90") * 100, 0).cast("bigint").as("p90_cents"))
        .orderBy("c_mktsegment")
    },

    // Winsorization — robust-statistics outlier clipping, the
    // numeric-cleaning pass a feature/metrics pipeline runs before
    // aggregation: clip each group's values into its [p05, p95]
    // discrete-percentile band and report clip counts plus raw vs
    // winsorized sums. All-integer (cents, ceil-rank percentile
    // selection, least/greatest clip) so the oracle hash is exact.
    // Scale note: the EXACT band needs a per-group sort — right for
    // bounded-cardinality group keys like these; at unbounded group
    // sizes the sampled-quantile band (a_approx_quantile's PRF
    // sample) replaces the window, same downstream clip.
    QueryDef(
      "a_winsorize",
      """WITH v AS (SELECT event_type,
        |             CAST(floor(value * 100) AS BIGINT) AS cents, event_id
        |           FROM events),
        |r AS (SELECT event_type, cents,
        |        row_number() OVER (PARTITION BY event_type
        |                           ORDER BY cents, event_id) AS rn,
        |        count(*) OVER (PARTITION BY event_type) AS n FROM v),
        |b AS (SELECT event_type,
        |        max(CASE WHEN rn = (5*n+99) // 100 THEN cents END) AS lo,
        |        max(CASE WHEN rn = (95*n+99) // 100 THEN cents END) AS hi
        |      FROM r GROUP BY 1)
        |SELECT v.event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
        |       CAST(sum(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
        |       CAST(sum(cents) AS BIGINT) AS sum_raw_cents,
        |       CAST(sum(least(greatest(cents, lo), hi)) AS BIGINT) AS sum_wins_cents
        |FROM v JOIN b ON v.event_type = b.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val v = Tables.events(s, d).select(
        col("event_type"),
        floor(col("value") * 100).cast("bigint").as("cents"),
        col("event_id"))
      val w = Window.partitionBy("event_type").orderBy("cents", "event_id")
      val b = v
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        .groupBy("event_type")
        .agg(
          max(when(col("rn") === expr("(5*n+99) div 100"), col("cents"))).as("lo"),
          max(when(col("rn") === expr("(95*n+99) div 100"), col("cents"))).as("hi"))
      v.join(broadcast(b), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("cents") < col("lo"), 1L).otherwise(0L)).as("n_clip_lo"),
          sum(when(col("cents") > col("hi"), 1L).otherwise(0L)).as("n_clip_hi"),
          sum(col("cents")).as("sum_raw_cents"),
          sum(least(greatest(col("cents"), col("lo")), col("hi")))
            .as("sum_wins_cents"))
        .orderBy("event_type")
    },

    // GFE-name construction (introduction.rst:33-38): locus + 'w' +
    // ordered dash-joined accessions ≡ ordered string_agg per group.
    QueryDef(
      "gfe_name_agg",
      """SELECT l_orderkey,
        |       concat('O', 'w', string_agg(CAST(l_linenumber AS VARCHAR), '-'
        |                                   ORDER BY l_linenumber)) AS gfe_name
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(concat(lit("O"), lit("w"),
          concat_ws("-",
            transform(
              array_sort(collect_list(col("l_linenumber"))),
              x => x.cast("string")))).as("gfe_name"))
        .orderBy("l_orderkey")
    }
  )
}
