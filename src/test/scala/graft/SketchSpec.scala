package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Error bounds for the sketch aggregations (SketchQueries) against
  * exact answers on the same data — the semantics the driver's
  * rows>0 check can't carry.
  */
class SketchSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  private def exactDistinct: Map[String, Long] =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("HLL estimates are within 10% of exact distinct counts") {
    val exact = exactDistinct
    val est = SparkEntry.queries("a_hll_distinct")(spark, sfDir).collect()
    // every group present — a dropped group would otherwise pass the
    // per-row bound vacuously
    assert(est.map(_.getString(0)).toSet == exact.keySet)
    est.foreach { r =>
      val (t, acd, hll) = (r.getString(0), r.getLong(1), r.getLong(2))
      val e = exact(t).toDouble
      assert(math.abs(acd - e) / e <= 0.10, s"$t approx_count_distinct=$acd exact=$e")
      assert(math.abs(hll - e) / e <= 0.10, s"$t hll_sketch=$hll exact=$e")
    }
  }

  test("sharded sketch union estimates the same distinct counts") {
    val exact = exactDistinct
    val est = SparkEntry.queries("a_hll_union")(spark, sfDir).collect()
    assert(est.map(_.getString(0)).toSet == exact.keySet)
    est.foreach { r =>
      val (t, n) = (r.getString(0), r.getLong(1))
      val e = exact(t).toDouble
      assert(math.abs(n - e) / e <= 0.10, s"$t union_sketch=$n exact=$e")
    }
  }

  test("count-min estimates obey the CMS contract against exact counts") {
    val rows = SparkEntry.queries("a_cms_topk")(spark, sfDir).collect()
    assert(rows.length == 25)
    val totalTokens = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ", -1)).as("token"))
      .where(col("token") =!= "").count()
    val slack = math.ceil(0.001 * totalTokens).toLong
    rows.foreach { r =>
      val (t, exact, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      // CMS never undercounts; overcount bounded by eps·N (w.h.p. —
      // deterministic here: fixed seed, fixed corpus)
      assert(est >= exact, s"$t cms=$est < exact=$exact")
      assert(est <= exact + slack, s"$t cms=$est > exact=$exact + $slack")
    }
  }

  test("approx quantiles land within the adjacent exact rank window") {
    // rank error <= n/accuracy; with accuracy=10000 and fixture-sized
    // groups that is sub-one-rank, but assert the engine's actual
    // contract (value between the exact p±0.01 rank values), not
    // incidental exactness.
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
}
