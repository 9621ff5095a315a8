package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions.{hex60, hex60Seeded}

/** Sketch aggregations — the scale substitute for exact distinct
  * counts, heavy hitters, and quantiles. Exact `count(DISTINCT x)`
  * expands every row per aggregate and reshuffles the full key space;
  * a sketch is fixed-size mergeable state with a map-side partial per
  * partition, so the shuffle carries kilobytes per group regardless of
  * input size.
  *
  * Every query here is the DETERMINISTIC integer-exact twin of its
  * engine-specific built-in (the same pattern as `gfe_pagerank`'s
  * integer-scaled PageRank twin): the sketch state is derived from
  * md5 — which Spark and DuckDB spell identically — and every derived
  * number is integer/fixed-point arithmetic, so the DuckDB oracle
  * replays the sketch bit-exactly. The Spark built-ins
  * (`approx_count_distinct`, `hll_sketch_agg`, `count_min_sketch`,
  * `percentile_approx`) stay exercised side-by-side in SketchSpec,
  * which bounds both families against exact answers.
  */
object SketchQueries {

  // ---- deterministic HLL (p = 9, m = 512 registers) ----------------
  //
  // h = 60-bit md5 prefix (graft_hex60); register = h & 511;
  // rho = leading-zero-count of the remaining 51 bits + 1, computed as
  // 52 - len(bin(h >> 9) stripped of leading zeros) — `bin` is
  // unpadded in both engines and ltrim makes w = 0 land on rho = 52.
  // Raw estimate: alpha_m * m^2 / sum_j 2^(-M_j), carried entirely in
  // integers: S = sum_j 2^(52 - M_j) (<= 512 * 2^52 = 2^61, long-safe)
  // and est = A // S // 10^6 with A = alpha_micro * m^2 * 2^52 (a
  // 27-digit constant — DECIMAL(38,0) on the Spark side, HUGEINT in
  // DuckDB; `div` / `//` truncate identically for positive operands).
  // Small-range correction (est <= 2.5m with empty registers) uses
  // linear counting m * ln(m / V) via a 512-entry integer micro-unit
  // table generated from ONE Scala array and interpolated into the
  // oracle SQL, so both engines share the same constants by
  // construction. Long-safe while the true cardinality < ~9e12; beyond
  // that widen the quotient to decimal on both sides.
  private val TwoP52 = 4503599627370496L
  private val AlphaMicro = 719783L // round(1e6 * 0.7213 / (1 + 1.079/512))
  private val ANumStr = (java.math.BigInteger.valueOf(AlphaMicro)
    .multiply(java.math.BigInteger.valueOf(512L * 512L))
    .multiply(java.math.BigInteger.valueOf(TwoP52))).toString
  private val LnMicro: IndexedSeq[Long] =
    (1 to 512).map(v => math.round(math.log(512.0 / v) * 1e6))

  private def hvSql(e: String): String =
    s"CAST(('0x' || substr(md5($e),1,15)) AS BIGINT)"
  private val lnTabSql =
    LnMicro.zipWithIndex.map { case (l, i) => s"(${i + 1},$l)" }.mkString(",")

  private def idxCol(h: Column): Column = h.bitwiseAND(lit(511L))
  private def rhoCol(h: Column): Column =
    lit(52) - length(ltrim(bin(shiftright(h, 9)), "0"))

  /** Deterministic register-HLL distinct count of `value` per `key`:
    * (key, users_est, zero_regs). Public so SketchSpec can drive the
    * raw-estimate path (cardinality > 2.5m) on synthetic data — the
    * fixture groups all land in the linear-counting range.
    */
  def hllDistinct(df: DataFrame, key: String, value: Column): DataFrame =
    hllEstimate(hllRegisters(df, key, value), key)

  /** The mergeable register table (key, idx, mrho) for `value` per
    * `key` — merging two register tables by per-(key, idx) max IS the
    * HLL union, which is what makes incremental/streaming sketch
    * maintenance exact (st_sketch_maintain). */
  private[queries] def hllRegisters(
      df: DataFrame, key: String, value: Column): DataFrame = {
    val h = hex60(value.cast("string"))
    df.select(col(key), idxCol(h).as("idx"), rhoCol(h).as("rho"))
      .groupBy(key, "idx").agg(max("rho").as("mrho"))
  }

  /** (key, idx, mrho) register table -> (key, users_est, zero_regs). */
  private[queries] def hllEstimate(regs: DataFrame, key: String): DataFrame = {
    val lnArr = array(LnMicro.map(lit): _*)
    regs.groupBy(key)
      .agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(52 - mrho AS INT))"))
          .as("s_present"),
        count(lit(1)).as("n_regs"))
      .withColumn("reg_sum",
        col("s_present") + (lit(512L) - col("n_regs")) * lit(TwoP52))
      .withColumn("zero_regs", lit(512L) - col("n_regs"))
      .withColumn("raw_est", expr(
        s"CAST(CAST('$ANumStr' AS DECIMAL(38,0)) div reg_sum div 1000000 AS BIGINT)"))
      // index guarded with greatest(): element_at is 1-based and the
      // value is unused when zero_regs = 0 (the CASE picks raw_est)
      .withColumn("lnm_v",
        element_at(lnArr, greatest(col("zero_regs"), lit(1L)).cast("int")))
      .withColumn("users_est",
        when(col("zero_regs") > 0 && col("raw_est") <= 1280,
          expr("CAST((512 * lnm_v) div 1000000 AS BIGINT)"))
          .otherwise(col("raw_est")))
      .select(col(key), col("users_est"), col("zero_regs"))
  }

  /** Shared estimate SQL over an `mx(key, idx, mrho)` CTE — composed
    * from [[hllEstCtes]], so the estimator constants and the
    * linear-counting branch exist in exactly ONE place (two copies
    * silently drifting would desynchronize a_hll_intersect's oracle
    * from a_hll_distinct's). Ends mid-SELECT at `AS $estCol`: callers
    * append extra projections and the `FROM est ...` tail. */
  private def hllEstimateSql(key: String, estCol: String): String =
    s"""${hllEstCtes(key)},
       |est AS (SELECT hest.$key AS $key, hraw.zero_regs, hest.est
       |        FROM hest JOIN hraw USING ($key))
       |SELECT est.$key,
       |       est.est AS $estCol""".stripMargin

  /** Estimate CTEs over an `mx($key, idx, mrho)` CTE, composable form:
    * emits `hagg`/`ln_tab`/`hraw`/`hest($key, est)` so callers can
    * keep joining (unlike [[hllEstimateSql]], whose text ends in the
    * final SELECT). */
  private def hllEstCtes(key: String): String =
    s"""hagg AS (SELECT $key,
       |        CAST(sum(1::BIGINT << CAST(52 - mrho AS INT)) AS BIGINT)
       |          + (512 - count(*)) * $TwoP52 AS reg_sum,
       |        512 - count(*) AS zero_regs
       |      FROM mx GROUP BY 1),
       |ln_tab(v, lnm) AS (SELECT * FROM (VALUES $lnTabSql)),
       |hraw AS (SELECT $key, zero_regs,
       |        CAST($ANumStr // reg_sum // 1000000 AS BIGINT) AS raw_est
       |      FROM hagg),
       |hest AS (SELECT hraw.$key,
       |        CASE WHEN hraw.zero_regs > 0 AND hraw.raw_est <= 1280
       |             THEN CAST((512 * lt.lnm) // 1000000 AS BIGINT)
       |             ELSE hraw.raw_est END AS est
       |      FROM hraw LEFT JOIN ln_tab lt ON lt.v = hraw.zero_regs)""".stripMargin

  /** a_hll_distinct's oracle — also st_sketch_maintain's: the
    * streaming register fold is a max-merge, so its final estimate is
    * by construction the same relation. */
  private[queries] val HllDistinctSql: String =
    s"""WITH h AS (SELECT event_type,
       |        ${hvSql("CAST(user_id AS VARCHAR)")} AS hv FROM events),
       |regs AS (SELECT event_type, (hv & 511) AS idx,
       |        52 - length(ltrim(bin(hv >> 9),'0')) AS rho FROM h),
       |mx AS (SELECT event_type, idx, max(rho) AS mrho
       |       FROM regs GROUP BY 1, 2),
       |${hllEstimateSql("event_type", "users_est")},
       |       CAST(est.zero_regs AS BIGINT) AS zero_regs
       |FROM est
       |ORDER BY est.event_type""".stripMargin

  // ---- deterministic count-min (d = 4 rows, w = 1024 buckets) ------
  private val CmsD = 4
  private val CmsW = 1024L
  private def cmsBuckets(tok: Column): Column =
    array((0 until CmsD).map(i =>
      hex60Seeded(tok, i).bitwiseAND(lit(CmsW - 1))): _*)
  private def cmsBucketSql(i: Int): String =
    s"(${hvSql(s"token || '#$i'")} & ${CmsW - 1})"

  /** The additive CMS counter table (r, b, cnt) over a documents
    * batch — summing two counter tables per (r, b) IS the CMS merge,
    * the additive mergeability class (vs the HLL registers' max),
    * which is what makes incremental/streaming heavy-hitter state
    * exact (st_cms_maintain). */
  private[queries] def cmsCounters(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ", -1)).as("token"))
      .where(col("token") =!= "")
      .select(posexplode(cmsBuckets(col("token"))).as(Seq("r", "b")))
      .groupBy("r", "b").agg(count(lit(1)).as("cnt"))

  /** Probe `counters` with the corpus' exact top-25 tokens; est =
    * min over the d rows (the CMS contract). */
  private[queries] def cmsProbeTopk(
      counters: DataFrame, docs: DataFrame): DataFrame = {
    val top = docs
      .select(explode(split(col("text"), " ", -1)).as("token"))
      .where(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("token")).limit(25)
    top
      .select(col("token"), col("n_exact"),
        posexplode(cmsBuckets(col("token"))).as(Seq("r", "b")))
      .join(broadcast(counters), Seq("r", "b"))
      .groupBy("token", "n_exact").agg(min("cnt").as("n_cms"))
      .orderBy(col("n_exact").desc, col("token"))
  }

  /** a_cms_topk's oracle — also st_cms_maintain's: the streaming
    * counter fold is a per-(r,b) sum, so its final counter table is
    * by construction the batch one. */
  private[queries] val CmsTopkSql: String =
    s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token
       |              FROM documents),
       |tok AS (SELECT token FROM toks WHERE token <> ''),
       |rb AS (${(0 until CmsD).map(i =>
      s"SELECT $i AS r, ${cmsBucketSql(i)} AS b FROM tok")
      .mkString("\n  UNION ALL ")}),
       |counters AS (SELECT r, b, count(*) AS cnt FROM rb GROUP BY 1, 2),
       |top AS (SELECT token, count(*) AS n_exact FROM tok
       |        GROUP BY 1 ORDER BY n_exact DESC, token LIMIT 25),
       |pr AS (${(0 until CmsD).map(i =>
      s"SELECT token, n_exact, $i AS r, ${cmsBucketSql(i)} AS b FROM top")
      .mkString("\n  UNION ALL ")})
       |SELECT p.token, p.n_exact, CAST(min(c.cnt) AS BIGINT) AS n_cms
       |FROM pr p JOIN counters c ON c.r = p.r AND c.b = p.b
       |GROUP BY 1, 2 ORDER BY p.n_exact DESC, p.token""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // Per-type distinct users via the deterministic register HLL.
    // Register build is one map-side-combinable groupBy (at most
    // groups x 512 rows reach the shuffle regardless of input size);
    // zero_regs is emitted so the oracle cross-checks the register
    // occupancy, not just the estimate.
    QueryDef(
      "a_hll_distinct",
      HllDistinctSql) { (s, d) =>
      hllDistinct(Tables.events(s, d), "event_type", col("user_id"))
        .orderBy("event_type")
    },

    // Mergeable path: per-shard register tables built independently
    // (in production: persisted per release/partition), then merged by
    // register max — which IS the HLL union — before estimating.
    // Distinct counts across shards without re-reading them together.
    QueryDef(
      "a_hll_union",
      s"""WITH h AS (SELECT (event_id % 4) AS shard, event_type,
        |        ${hvSql("CAST(user_id AS VARCHAR)")} AS hv FROM events),
        |regs AS (SELECT shard, event_type, (hv & 511) AS idx,
        |        52 - length(ltrim(bin(hv >> 9),'0')) AS rho FROM h),
        |shard_regs AS (SELECT shard, event_type, idx, max(rho) AS srho
        |       FROM regs GROUP BY 1, 2, 3),
        |mx AS (SELECT event_type, idx, max(srho) AS mrho
        |       FROM shard_regs GROUP BY 1, 2),
        |${hllEstimateSql("event_type", "users")}
        |FROM est
        |ORDER BY est.event_type""".stripMargin) { (s, d) =>
      val h = hex60(col("user_id").cast("string"))
      val shardRegs = Tables.events(s, d)
        .withColumn("shard", pmod(col("event_id"), lit(4)))
        .select(col("shard"), col("event_type"),
          idxCol(h).as("idx"), rhoCol(h).as("rho"))
        .groupBy("shard", "event_type", "idx").agg(max("rho").as("srho"))
      val regs = shardRegs
        .groupBy("event_type", "idx").agg(max("srho").as("mrho"))
      hllEstimate(regs, "event_type")
        .select(col("event_type"), col("users_est").as("users"))
        .orderBy("event_type")
    },

    // Sketch set algebra: pairwise distinct-user OVERLAP between all
    // event-type segments by inclusion-exclusion over the SAME
    // register tables — est(A∩B) = est(A) + est(B) − est(A∪B), union
    // by register max. The whole computation after the one register
    // build runs on groups×512-row tables (kilobytes at any corpus
    // size): this is how segment-overlap matrices get computed at
    // 100 TB without ever co-scanning two segments. All 15 estimates
    // (5 singles + 10 pair unions) go through ONE estimator pass over
    // a generic group key; intersection clamps at 0 (inclusion-
    // exclusion can go negative within sketch error).
    QueryDef(
      "a_hll_intersect",
      s"""WITH h AS (SELECT event_type,
        |        ${hvSql("CAST(user_id AS VARCHAR)")} AS hv FROM events),
        |regs0 AS (SELECT event_type, (hv & 511) AS idx,
        |        52 - length(ltrim(bin(hv >> 9),'0')) AS rho FROM h),
        |mx0 AS (SELECT event_type, idx, max(rho) AS mrho
        |        FROM regs0 GROUP BY 1, 2),
        |types AS (SELECT DISTINCT event_type FROM events),
        |pairs AS (SELECT a.event_type AS ta, b.event_type AS tb
        |          FROM types a JOIN types b ON a.event_type < b.event_type),
        |mx AS (SELECT grp, idx, max(mrho) AS mrho FROM (
        |         SELECT event_type AS grp, idx, mrho FROM mx0
        |         UNION ALL
        |         SELECT p.ta || '|' || p.tb, m.idx, m.mrho
        |         FROM pairs p JOIN mx0 m
        |           ON m.event_type = p.ta OR m.event_type = p.tb)
        |       GROUP BY 1, 2),
        |${hllEstCtes("grp")}
        |SELECT p.ta AS type_a, p.tb AS type_b,
        |       ea.est AS users_a, eb.est AS users_b,
        |       eu.est AS users_union,
        |       greatest(ea.est + eb.est - eu.est, 0) AS users_intersect
        |FROM pairs p
        |JOIN hest ea ON ea.grp = p.ta
        |JOIN hest eb ON eb.grp = p.tb
        |JOIN hest eu ON eu.grp = p.ta || '|' || p.tb
        |ORDER BY type_a, type_b""".stripMargin) { (s, d) =>
      val h = hex60(col("user_id").cast("string"))
      val regs = Tables.events(s, d)
        .select(col("event_type"), idxCol(h).as("idx"), rhoCol(h).as("rho"))
        .groupBy("event_type", "idx").agg(max("rho").as("mrho"))
      val types = regs.select("event_type").distinct()
      val pairs = types.withColumnRenamed("event_type", "ta")
        .crossJoin(types.withColumnRenamed("event_type", "tb"))
        .where(col("ta") < col("tb"))
      val pairRegs = broadcast(pairs)
        .join(regs, col("event_type") === col("ta") ||
          col("event_type") === col("tb"))
        .select(concat_ws("|", col("ta"), col("tb")).as("grp"),
          col("idx"), col("mrho"))
      val grpRegs = regs
        .select(col("event_type").as("grp"), col("idx"), col("mrho"))
        .unionByName(pairRegs)
        .groupBy("grp", "idx").agg(max("mrho").as("mrho"))
      val est = hllEstimate(grpRegs, "grp").select("grp", "users_est")
      val eA = est.select(col("grp").as("ta"), col("users_est").as("users_a"))
      val eB = est.select(col("grp").as("tb"), col("users_est").as("users_b"))
      val eU = est.select(col("grp").as("pg"),
        col("users_est").as("users_union"))
      pairs.join(broadcast(eA), "ta").join(broadcast(eB), "tb")
        .withColumn("pg", concat_ws("|", col("ta"), col("tb")))
        .join(broadcast(eU), "pg")
        .select(col("ta").as("type_a"), col("tb").as("type_b"),
          col("users_a"), col("users_b"), col("users_union"),
          greatest(col("users_a") + col("users_b") - col("users_union"),
            lit(0L)).as("users_intersect"))
        .orderBy("type_a", "type_b")
    },

    // Count-min heavy hitters: token frequencies estimated from a
    // d x w counter table built in ONE pass (posexplode over the d
    // bucket hashes, then a map-side-combinable groupBy — the counter
    // table is d*w = 4096 rows regardless of corpus size, so at
    // 100 TB only kilobytes move). The exact top-25 picks the probe
    // set; the probe is a broadcast join against the counter table —
    // fully distributed, no driver-side sketch object. est(token) =
    // min over rows of counter[h_i(token)], the CMS contract
    // (never undercounts; overcount <= eps*N w.h.p.).
    QueryDef(
      "a_cms_topk",
      CmsTopkSql) { (s, d) =>
      cmsProbeTopk(cmsCounters(Tables.documents(s, d)),
        Tables.documents(s, d))
    },

    // Deterministic sampled quantiles: a 25% md5-Bernoulli sample
    // (the smp_hash_sample PRF, so sampling never reshuffles) ranked
    // once per group, then p50/p90/p99 as DISCRETE percentiles —
    // selected data values at integer ceil-rank targets, no float
    // rank arithmetic on either engine ((k*n + k) // 10^j == ceil of
    // k*n/10^j for positive n). Rank error is the sampling error
    // O(1/sqrt(n_sample)); SketchSpec bounds it and keeps the
    // one-pass built-in (percentile_approx / GK) covered alongside.
    QueryDef(
      "a_approx_quantile",
      """WITH s AS (SELECT event_type, value, event_id FROM events
        |        WHERE substr(md5(CAST(event_id AS VARCHAR)),1,1)
        |              IN ('0','1','2','3')),
        |r AS (SELECT event_type, value,
        |        row_number() OVER (PARTITION BY event_type
        |                           ORDER BY value, event_id) AS rn,
        |        count(*) OVER (PARTITION BY event_type) AS n FROM s)
        |SELECT event_type,
        |  max(CASE WHEN rn = (5*n+9) // 10 THEN value END) AS p50,
        |  max(CASE WHEN rn = (9*n+9) // 10 THEN value END) AS p90,
        |  max(CASE WHEN rn = (99*n+99) // 100 THEN value END) AS p99
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("event_type").orderBy("value", "event_id")
      Tables.events(s, d)
        .where(substring(md5(col("event_id").cast("string")), 1, 1)
          .isin("0", "1", "2", "3"))
        .select(col("event_type"), col("value"), col("event_id"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        .groupBy("event_type")
        .agg(
          max(when(col("rn") === expr("(5*n+9) div 10"), col("value"))).as("p50"),
          max(when(col("rn") === expr("(9*n+9) div 10"), col("value"))).as("p90"),
          max(when(col("rn") === expr("(99*n+99) div 100"), col("value"))).as("p99"))
        .orderBy("event_type")
    })
}
