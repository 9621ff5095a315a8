package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Sketch aggregations — the scale substitute for exact distinct
  * counts and quantiles. Exact `count(DISTINCT x)` expands every row
  * per aggregate and reshuffles the full key space; a sketch is
  * fixed-size mergeable state with a map-side partial per partition,
  * so the shuffle carries kilobytes per group regardless of input
  * size. `hll_union_agg` additionally makes the state reusable: shard-
  * or release-level sketches persist once and merge on demand, the
  * pattern for incremental distinct counts across a growing corpus.
  *
  * Estimates are engine-specific, so these carry no DuckDB oracle
  * (driver records rows>0); SketchSpec bounds each estimate against
  * the exact answer computed on the same data.
  */
object SketchQueries {

  val all: Seq[QueryDef] = Seq(

    // Per-type distinct users: HLL++ (approx_count_distinct) and the
    // Datasketches HLL estimate side by side.
    QueryDef.noOracle("a_hll_distinct")((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          approx_count_distinct(col("user_id")).as("users_approx"),
          hll_sketch_estimate(hll_sketch_agg(col("user_id")))
            .as("users_sketch"))
        .orderBy("event_type")),

    // Mergeable path: build per-shard sketches first (in production:
    // persisted per release/partition), then union — distinct counts
    // without ever re-reading the shards together.
    QueryDef.noOracle("a_hll_union")((s, d) =>
      Tables.events(s, d)
        .withColumn("shard", pmod(col("event_id"), lit(4)))
        .groupBy("shard", "event_type")
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
        .groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("users"))
        .orderBy("event_type")),

    // Count-min heavy hitters: token frequencies estimated from ONE
    // fixed-size mergeable sketch (eps=0.1%, δ=1%) instead of an
    // exact corpus-wide (token, count) aggregation. The sketch is
    // built distributed — map-side partials merge up a tree — and is
    // kilobytes regardless of corpus size, so at 100 TB it's the
    // only part that moves; per-shard sketches would persist and
    // merge exactly like a_hll_union's. The exact counts alongside
    // exist to pick the probe set and let SketchSpec assert the CMS
    // contract (est ≥ true, est ≤ true + eps·N w.h.p.); the 25-token
    // probe loop is driver-side by design — probing a sketch IS a
    // driver/serving-side operation, like the bounded hot-key set in
    // SkewJoin.
    QueryDef.noOracle("a_cms_topk") { (s, d) =>
      val tokens = Tables.documents(s, d)
        .select(explode(split(col("text"), " ", -1)).as("token"))
        .where(col("token") =!= "")
      val skBytes = tokens
        .agg(expr("count_min_sketch(token, 0.001d, 0.99d, 42)"))
        .head().getAs[Array[Byte]](0)
      val cms = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(skBytes))
      val top = tokens.groupBy("token")
        .agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("token"))
        .limit(25).collect()
      import s.implicits._
      top.toSeq
        .map(r => (r.getString(0), r.getLong(1),
          cms.estimateCount(r.getString(0))))
        .toDF("token", "n_exact", "n_cms")
        .orderBy(col("n_exact").desc, col("token"))
    },

    // Quantile sketch (Greenwald-Khanna): p50/p90/p99 of value per
    // event_type in one pass, rank error bounded by 1/accuracy. The
    // sketch is computed once; the three ranks are projected as scalar
    // columns (an array-typed output column is unhashable by the
    // driver's result compare — r3 lesson).
    QueryDef.noOracle("a_approx_quantile")((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(percentile_approx(col("value"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("q"))
        .select(col("event_type"),
          element_at(col("q"), 1).as("p50"),
          element_at(col("q"), 2).as("p90"),
          element_at(col("q"), 3).as("p99"))
        .orderBy("event_type")))
}
