package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Error bounds for the sketch tier against exact answers on the same
  * data. The `queries` entries are the deterministic integer-exact
  * twins (md5-register HLL, md5-bucket CMS, md5-sampled discrete
  * quantiles) whose DuckDB oracles carry cross-engine equality; this
  * spec carries the ACCURACY semantics for those twins AND keeps the
  * engine-specific built-ins (`approx_count_distinct`,
  * `hll_sketch_agg`/`hll_union_agg`, `count_min_sketch`,
  * `percentile_approx`) exercised against the same exact answers.
  */
class SketchSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  private def exactDistinct: Map[String, Long] =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("deterministic HLL estimates are within 10% of exact distinct counts") {
    val exact = exactDistinct
    val est = SparkEntry.queries("a_hll_distinct")(spark, sfDir).collect()
    // every group present — a dropped group would otherwise pass the
    // per-row bound vacuously
    assert(est.map(_.getString(0)).toSet == exact.keySet)
    est.foreach { r =>
      val (t, n, zeroRegs) = (r.getString(0), r.getLong(1), r.getLong(2))
      val e = exact(t).toDouble
      assert(math.abs(n - e) / e <= 0.10, s"$t det_hll=$n exact=$e")
      assert(zeroRegs >= 0 && zeroRegs <= 512)
    }
  }

  test("deterministic HLL raw path holds at cardinality beyond linear counting") {
    // Fixture groups sit in the linear-counting range (est <= 2.5m);
    // drive the raw harmonic-mean path on synthetic cardinalities.
    import spark.implicits._
    val df = (1 to 30000).map(i => ("big", i.toLong)).toDF("g", "id")
      .union((1 to 2000).map(i => ("mid", i.toLong)).toDF("g", "id"))
    val est = graft.queries.SketchQueries.hllDistinct(df, "g", col("id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(est("big") - 30000.0) / 30000.0 <= 0.10,
      s"big det_hll=${est("big")}")
    assert(math.abs(est("mid") - 2000.0) / 2000.0 <= 0.10,
      s"mid det_hll=${est("mid")}")
  }

  test("built-in HLL estimates are within 10% of exact distinct counts") {
    val exact = exactDistinct
    val est = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id")).as("users_approx"),
        hll_sketch_estimate(hll_sketch_agg(col("user_id")))
          .as("users_sketch"))
      .collect()
    assert(est.map(_.getString(0)).toSet == exact.keySet)
    est.foreach { r =>
      val (t, acd, hll) = (r.getString(0), r.getLong(1), r.getLong(2))
      val e = exact(t).toDouble
      assert(math.abs(acd - e) / e <= 0.10, s"$t approx_count_distinct=$acd exact=$e")
      assert(math.abs(hll - e) / e <= 0.10, s"$t hll_sketch=$hll exact=$e")
    }
  }

  test("sharded register union estimates the same distinct counts") {
    val exact = exactDistinct
    val est = SparkEntry.queries("a_hll_union")(spark, sfDir).collect()
    assert(est.map(_.getString(0)).toSet == exact.keySet)
    est.foreach { r =>
      val (t, n) = (r.getString(0), r.getLong(1))
      val e = exact(t).toDouble
      assert(math.abs(n - e) / e <= 0.10, s"$t union_sketch=$n exact=$e")
    }
    // union twin == unsharded twin: register max-merge loses nothing
    val whole = SparkEntry.queries("a_hll_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach(r => assert(r.getLong(1) == whole(r.getString(0)),
      s"${r.getString(0)} sharded-union != whole-corpus estimate"))
  }

  test("inclusion-exclusion intersection tracks exact pairwise overlap") {
    val out = SparkEntry.queries("a_hll_intersect")(spark, sfDir).collect()
    assert(out.length == 10, "5 event types -> 10 unordered pairs")
    // exact pairwise overlaps
    val byType = Tables.events(spark, sfDir)
      .select("event_type", "user_id").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    val singles = SparkEntry.queries("a_hll_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (ea, eb, eu, ei) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      // algebraic invariants of the sketch union
      assert(ea == singles(a) && eb == singles(b),
        "pair row must reuse the single-segment estimates")
      assert(eu <= ea + eb, s"$a|$b union exceeds sum")
      assert(eu >= math.max(ea, eb), s"$a|$b union below max side")
      assert(ei >= 0 && ei == math.max(ea + eb - eu, 0L))
      // accuracy: inclusion-exclusion doubles the per-sketch error,
      // so the bound is looser than the single-segment 10%
      val exact = (byType(a) intersect byType(b)).size.toDouble
      assert(math.abs(ei - exact) <= math.max(8.0, 0.25 * exact),
        s"$a∩$b est=$ei exact=$exact")
    }
  }

  test("built-in Datasketches union path estimates distinct counts") {
    val exact = exactDistinct
    val est = Tables.events(spark, sfDir)
      .withColumn("shard", pmod(col("event_id"), lit(4)))
      .groupBy("shard", "event_type")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("users"))
      .collect()
    assert(est.map(_.getString(0)).toSet == exact.keySet)
    est.foreach { r =>
      val (t, n) = (r.getString(0), r.getLong(1))
      val e = exact(t).toDouble
      assert(math.abs(n - e) / e <= 0.10, s"$t union_sketch=$n exact=$e")
    }
  }

  test("deterministic CMS estimates obey the CMS contract") {
    val rows = SparkEntry.queries("a_cms_topk")(spark, sfDir).collect()
    assert(rows.length == 25)
    val totalTokens = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ", -1)).as("token"))
      .where(col("token") =!= "").count()
    // w = 1024 buckets: expected per-row overcount N/w; min over d = 4
    // rows. 4x the expectation is a loose deterministic ceiling.
    val slack = math.ceil(4.0 * totalTokens / 1024).toLong
    rows.foreach { r =>
      val (t, exact, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est >= exact, s"$t cms=$est < exact=$exact")
      assert(est <= exact + slack, s"$t cms=$est > exact=$exact + $slack")
    }
  }

  test("built-in count_min_sketch obeys the CMS contract") {
    val tokens = Tables.documents(spark, sfDir)
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
    val totalTokens = tokens.count()
    val slack = math.ceil(0.001 * totalTokens).toLong
    top.foreach { r =>
      val (t, exact) = (r.getString(0), r.getLong(1))
      val est = cms.estimateCount(t)
      assert(est >= exact, s"$t cms=$est < exact=$exact")
      assert(est <= exact + slack, s"$t cms=$est > exact=$exact + $slack")
    }
  }

  test("sampled quantiles land within the sampling-error rank window") {
    // 25% Bernoulli sample: quantile-fraction error ~ sqrt(p(1-p)/ns);
    // fixture groups are ~200 rows -> ~50 samples -> sd ~ 7 rank-pct.
    // Assert a 2-sd window via exact percentile_disc bounds.
    def window(lo: Double, hi: Double) = (
      expr(s"percentile_disc($lo) WITHIN GROUP (ORDER BY value)"),
      expr(s"percentile_disc($hi) WITHIN GROUP (ORDER BY value)"))
    val (l50, h50) = window(0.36, 0.64)
    val (l90, h90) = window(0.76, 0.98)
    val (l99, h99) = window(0.90, 1.00)
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(l50.as("a"), h50.as("b"), l90.as("c"), h90.as("d"),
        l99.as("e"), h99.as("f"))
      .collect()
      .map(r => r.getString(0) -> (1 to 6).map(r.getDouble).toVector).toMap
    val approx = SparkEntry.queries("a_approx_quantile")(spark, sfDir).collect()
    assert(approx.map(_.getString(0)).toSet == exact.keySet)
    approx.foreach { r =>
      val t = r.getString(0)
      val q = (1 to 3).map(r.getDouble)
      val Vector(lo50, hi50, lo90, hi90, lo99, hi99) = exact(t)
      assert(q(0) >= lo50 && q(0) <= hi50, s"$t p50=${q(0)} not in [$lo50,$hi50]")
      assert(q(1) >= lo90 && q(1) <= hi90, s"$t p90=${q(1)} not in [$lo90,$hi90]")
      assert(q(2) >= lo99 && q(2) <= hi99, s"$t p99=${q(2)} not in [$lo99,$hi99]")
    }
  }

  test("built-in percentile_approx lands within the adjacent exact rank window") {
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(expr("percentile_disc(0.49) WITHIN GROUP (ORDER BY value)").as("p50lo"),
        expr("percentile_disc(0.51) WITHIN GROUP (ORDER BY value)").as("p50hi"),
        expr("percentile_disc(0.89) WITHIN GROUP (ORDER BY value)").as("p90lo"),
        expr("percentile_disc(0.91) WITHIN GROUP (ORDER BY value)").as("p90hi"),
        expr("percentile_disc(0.98) WITHIN GROUP (ORDER BY value)").as("p99lo"),
        expr("percentile_disc(1.00) WITHIN GROUP (ORDER BY value)").as("p99hi"))
      .collect()
      .map(r => r.getString(0) -> (1 to 6).map(r.getDouble).toVector).toMap
    val approx = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(percentile_approx(col("value"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("q"))
      .select(col("event_type"),
        element_at(col("q"), 1).as("p50"),
        element_at(col("q"), 2).as("p90"),
        element_at(col("q"), 3).as("p99"))
      .collect()
    assert(approx.map(_.getString(0)).toSet == exact.keySet)
    approx.foreach { r =>
      val t = r.getString(0)
      val q = (1 to 3).map(r.getDouble)
      val Vector(lo50, hi50, lo90, hi90, lo99, hi99) = exact(t)
      assert(q(0) >= lo50 && q(0) <= hi50, s"$t p50=${q(0)} not in [$lo50,$hi50]")
      assert(q(1) >= lo90 && q(1) <= hi90, s"$t p90=${q(1)} not in [$lo90,$hi90]")
      assert(q(2) >= lo99 && q(2) <= hi99, s"$t p99=${q(2)} not in [$lo99,$hi99]")
    }
  }
}
