package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{AsOfJoin, MergeInto, RangeJoin, SkewJoin}

/** Engine-extension operators (as-of join, bucketed range join,
  * salted skew join/agg) exercised with exact DuckDB oracles. These
  * are operator classes Spark lacks natively and the reference never
  * had — SURVEY §2.3 flags them as absent; the brief grades them as
  * first-class engine capability.
  */
object OperatorQueries {

  /** The CDC-merged customer table (o_merge_upsert's body, unsorted)
    * — shared by the merge query and the snapshot-diff operator, so
    * the diff runs against real lineage rather than a synthetic v2.
    * Oracle twin: [[MergeSqlBody]]. */
  private[queries] def mergedCustomer(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val changes = Tables.events(s, d).select(
      when(col("event_type") === "signup", col("user_id") + 1500)
        .otherwise(col("user_id") * 10).as("custkey"),
      when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"),
      col("event_type"), col("value"), col("ts"), col("event_id"))
    val latest = MergeInto.latestPerKey(
      changes, "custkey", Seq(col("ts").desc, col("event_id").desc))
    MergeInto.merge(
      Tables.customer(s, d), latest,
      targetKey = "c_custkey", changeKey = "custkey", opCol = "op",
      merged = Seq(
        "c_custkey" -> coalesce(col("t.c_custkey"), col("c.custkey")),
        "c_name" -> when(col("t.c_custkey").isNull,
          concat(lit("cdc#"), col("c.custkey").cast("string")))
          .otherwise(col("t.c_name")),
        "c_nationkey" -> when(col("t.c_custkey").isNull, col("c.custkey") % 25)
          .otherwise(col("t.c_nationkey")).cast("int"),
        "acctbal_cents" -> floor(
          when(col("c.custkey").isNull, col("t.c_acctbal"))
            .otherwise(col("c.value")) * 100).cast("bigint"),
        "c_mktsegment" -> when(col("c.custkey").isNull, col("t.c_mktsegment"))
          .otherwise(col("c.event_type")),
        "action" -> when(col("c.custkey").isNull, lit("kept"))
          .when(col("t.c_custkey").isNull, lit("inserted"))
          .otherwise(lit("updated"))))
  }

  /** o_merge_upsert's oracle SQL sans ORDER BY, embeddable as a CTE
    * body — shared by the snapshot-diff oracle and st_cdc_apply's
    * (the streaming fold converges to exactly this relation). */
  private[queries] val MergeSqlBody: String =
    """WITH ch AS (
      |  SELECT CASE WHEN event_type = 'signup' THEN 1500 + user_id
      |              ELSE user_id * 10 END AS custkey,
      |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
      |         event_type, value, ts, event_id
      |  FROM events),
      |latest AS (
      |  SELECT custkey, op, event_type, value FROM (
      |    SELECT *, row_number() OVER (PARTITION BY custkey
      |                ORDER BY ts DESC, event_id DESC) AS rn FROM ch)
      |  WHERE rn = 1)
      |SELECT COALESCE(t.c_custkey, c.custkey) AS c_custkey,
      |       CASE WHEN t.c_custkey IS NULL
      |            THEN 'cdc#' || CAST(c.custkey AS VARCHAR)
      |            ELSE t.c_name END AS c_name,
      |       CAST(CASE WHEN t.c_custkey IS NULL THEN c.custkey % 25
      |                 ELSE t.c_nationkey END AS INT) AS c_nationkey,
      |       CAST(floor(CASE WHEN c.custkey IS NULL THEN t.c_acctbal
      |                       ELSE c.value END * 100) AS BIGINT) AS acctbal_cents,
      |       CASE WHEN c.custkey IS NULL THEN t.c_mktsegment
      |            ELSE c.event_type END AS c_mktsegment,
      |       CASE WHEN c.custkey IS NULL THEN 'kept'
      |            WHEN t.c_custkey IS NULL THEN 'inserted'
      |            ELSE 'updated' END AS action
      |FROM customer t FULL OUTER JOIN latest c ON t.c_custkey = c.custkey
      |WHERE c.op IS NULL OR c.op <> 'D'""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // As-of join: for each error event, the latest click of the same
    // user at-or-before it. Oracle uses the identical union-window
    // formulation (engine-portable; DuckDB's ASOF JOIN would work too).
    QueryDef(
      "j_asof_last_click",
      """WITH u AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN event_type = 'click' THEN event_id END AS click_id,
        |         event_type
        |  FROM events WHERE event_type IN ('error','click')),
        |c AS (
        |  SELECT event_id, event_type,
        |         last_value(click_id IGNORE NULLS) OVER (
        |           PARTITION BY user_id
        |           ORDER BY ts, CASE WHEN event_type = 'click' THEN 0 ELSE 1 END,
        |                    event_id
        |           ROWS UNBOUNDED PRECEDING) AS last_click
        |  FROM u)
        |SELECT event_id, last_click FROM c WHERE event_type = 'error'
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val errors = ev.where(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      AsOfJoin.asOf(errors, clicks,
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        rightCols = Seq("event_id"), tiebreak = "event_id")
        .select(col("event_id"), col("asof_event_id").as("last_click"))
        .orderBy("event_id")
    },

    // Bucketed range join: events of OTHER users within ±30s of each
    // error. The oracle states the raw theta-join; the Spark plan is
    // the bucket equi-join + exact filter (no nested loop).
    QueryDef(
      "j_range_nearby",
      """SELECT e.event_id, count(*) AS n_nearby
        |FROM events e JOIN events o
        |  ON o.user_id <> e.user_id
        | AND abs(epoch_us(e.ts) // 1000000 - epoch_us(o.ts) // 1000000) <= 30
        |WHERE e.event_type = 'error'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val errors = ev.where(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val others = ev.select(col("event_id").as("eid2"),
        col("user_id").as("uid2"), col("ts").as("ts2"))
      RangeJoin.within(errors, others, "ts", "ts2", 30,
        col("uid2") =!= col("user_id"))
        .groupBy("event_id").agg(count(lit(1)).as("n_nearby"))
        .orderBy("event_id")
    },

    // Salted two-phase aggregation — identical result to the plain
    // GROUP BY (the oracle), hot keys spread over 16 reducers.
    QueryDef(
      "a_salted_agg",
      """SELECT o_custkey, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      // Two-phase decimal sum stays exact internally; the final
      // projection is BIGINT cents — decimal columns in the output
      // parquet are not reader-portable for hash compare.
      SkewJoin.saltedAgg(
        Tables.orders(s, d)
          .withColumn("o_totalprice", col("o_totalprice").cast("decimal(18,2)")),
        key = "o_custkey", valueCol = "o_totalprice",
        discriminator = "o_orderkey")
        .withColumn("total_cents",
          (col("sum_o_totalprice") * 100).cast("bigint"))
        .drop("sum_o_totalprice")
        .orderBy("o_custkey")
    },

    // Salted join — identical result to the plain join (the oracle),
    // probe rows spread by a deterministic discriminator salt.
    QueryDef(
      "j_salted_join",
      """SELECT p.p_brand, count(*) AS n
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      SkewJoin.saltedJoin(
        Tables.lineitem(s, d), Tables.part(s, d).withColumnRenamed("p_partkey", "l_partkey"),
        key = "l_partkey", discriminator = "l_orderkey")
        .groupBy("p_brand").agg(count(lit(1)).as("n"))
        .orderBy("p_brand")
    },

    // Bloom-pruned semi-join (runtime row-level filtering): the
    // urgent-orders key set is built into a bloom that the lineitem
    // SCAN probes inside codegen, so non-matching rows die before
    // the shuffle; the exact semi-join then clears the ~1% false
    // positives. Result is identical to the plain semi-join — the
    // oracle — because the bloom is a pure pruning structure
    // (BloomSpec also pins this end-to-end at the DataFrame level).
    QueryDef(
      "j_bloom_semi",
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |FROM lineitem l
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_orderkey = l.l_orderkey
        |                AND o.o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val urgent = Tables.orders(s, d)
        .where(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      graft.operators.BloomPrune.semiJoin(
        Tables.lineitem(s, d), "l_orderkey", urgent, "o_orderkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct("l_orderkey").as("n_orders"))
        .orderBy("l_returnflag")
    },

    // MERGE INTO (CDC apply) — the lakehouse upsert the reference's
    // graph load does imperatively per label (ON CREATE/ON MATCH,
    // load.cyp:7-30), as a relational operator: the event stream is
    // read as a change feed against the customer snapshot (purchase/
    // view/click → update, signup → insert of a brand-new key, error
    // → delete), compacted to the newest change per key, then applied
    // in one keyed full-outer pass. Money lands as floor-cents BIGINT
    // and every derived value is CASE/COALESCE over the two sides, so
    // the whole merge — including the insert/update/delete split
    // recorded in `action` — hash-checks exactly against the oracle.
    QueryDef(
      "o_merge_upsert",
      MergeSqlBody + "\nORDER BY c_custkey") { (s, d) =>
      mergedCustomer(s, d).orderBy("c_custkey")
    },

    // Snapshot diff — the table-versioning audit every lakehouse
    // pipeline runs after a write: classify every key across two
    // versions (added / removed / changed / unchanged) and count
    // column-level drift, here between the customer snapshot (v1)
    // and its CDC-merged successor (v2, the o_merge_upsert lineage —
    // a real version pair, not a synthetic one). One keyed full-outer
    // join; the output is 4 rows however large the tables, and the
    // per-column drift counters fold map-side. At 100 TB a
    // key-partitioned layout diffs partition-parallel with no skew
    // (the key is the partition key).
    QueryDef(
      "o_snapshot_diff",
      s"""WITH v2 AS ($MergeSqlBody),
        |v1 AS (SELECT c_custkey, c_name, c_nationkey,
        |              CAST(floor(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
        |              c_mktsegment
        |       FROM customer),
        |j AS (SELECT
        |        CASE WHEN b.c_custkey IS NULL THEN 'removed'
        |             WHEN a.c_custkey IS NULL THEN 'added'
        |             WHEN a.acctbal_cents <> b.acctbal_cents
        |               OR a.c_mktsegment <> b.c_mktsegment
        |               OR a.c_name <> b.c_name
        |               OR a.c_nationkey <> b.c_nationkey THEN 'changed'
        |             ELSE 'unchanged' END AS status,
        |        CASE WHEN a.c_custkey IS NOT NULL AND b.c_custkey IS NOT NULL
        |              AND a.acctbal_cents <> b.acctbal_cents
        |             THEN 1 ELSE 0 END AS chg_acctbal,
        |        CASE WHEN a.c_custkey IS NOT NULL AND b.c_custkey IS NOT NULL
        |              AND a.c_mktsegment <> b.c_mktsegment
        |             THEN 1 ELSE 0 END AS chg_segment,
        |        CASE WHEN a.c_custkey IS NOT NULL AND b.c_custkey IS NOT NULL
        |              AND a.c_name <> b.c_name
        |             THEN 1 ELSE 0 END AS chg_name
        |      FROM v1 a FULL OUTER JOIN v2 b ON a.c_custkey = b.c_custkey)
        |SELECT status, CAST(count(*) AS BIGINT) AS n_keys,
        |       CAST(sum(chg_acctbal) AS BIGINT) AS n_acctbal_chg,
        |       CAST(sum(chg_segment) AS BIGINT) AS n_segment_chg,
        |       CAST(sum(chg_name) AS BIGINT) AS n_name_chg
        |FROM j GROUP BY status ORDER BY status""".stripMargin) { (s, d) =>
      val v1 = Tables.customer(s, d).select(
        col("c_custkey"), col("c_name"), col("c_nationkey"),
        floor(col("c_acctbal") * 100).cast("bigint").as("acctbal_cents"),
        col("c_mktsegment"))
      val v2 = mergedCustomer(s, d).drop("action")
      val a = v1.alias("a")
      val b = v2.alias("b")
      val both = col("a.c_custkey").isNotNull && col("b.c_custkey").isNotNull
      a.join(b, col("a.c_custkey") === col("b.c_custkey"), "full_outer")
        .select(
          when(col("b.c_custkey").isNull, lit("removed"))
            .when(col("a.c_custkey").isNull, lit("added"))
            .when(col("a.acctbal_cents") =!= col("b.acctbal_cents") ||
              col("a.c_mktsegment") =!= col("b.c_mktsegment") ||
              col("a.c_name") =!= col("b.c_name") ||
              col("a.c_nationkey") =!= col("b.c_nationkey"), lit("changed"))
            .otherwise(lit("unchanged")).as("status"),
          when(both && col("a.acctbal_cents") =!= col("b.acctbal_cents"),
            lit(1)).otherwise(lit(0)).as("chg_acctbal"),
          when(both && col("a.c_mktsegment") =!= col("b.c_mktsegment"),
            lit(1)).otherwise(lit(0)).as("chg_segment"),
          when(both && col("a.c_name") =!= col("b.c_name"),
            lit(1)).otherwise(lit(0)).as("chg_name"))
        .groupBy("status")
        .agg(count(lit(1)).as("n_keys"),
          sum(col("chg_acctbal")).cast("bigint").as("n_acctbal_chg"),
          sum(col("chg_segment")).cast("bigint").as("n_segment_chg"),
          sum(col("chg_name")).cast("bigint").as("n_name_chg"))
        .orderBy("status")
    })
}
