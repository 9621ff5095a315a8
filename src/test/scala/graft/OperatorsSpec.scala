package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, MergeInto, RangeJoin, SkewJoin}

class OperatorsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOf: latest right row at-or-before each left row, per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:30"), "e1"),
      (1L, ts("2024-01-01 10:02:00"), "e2"),
      (2L, ts("2024-01-01 09:00:00"), "e3") // no prior click
    ).toDF("user_id", "ts", "name")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), "c1"),
      (1L, ts("2024-01-01 10:01:00"), "c2"),
      (1L, ts("2024-01-01 10:02:00"), "c3"), // same instant as e2 -> visible
      (2L, ts("2024-01-01 09:30:00"), "c4") // after e3 -> invisible
    ).toDF("user_id", "ts", "cname")
    val out = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts",
      rightCols = Seq("cname"), tiebreak = "cname")
      .select("name", "asof_cname").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("e1" -> "c1", "e2" -> "c3", "e3" -> null))
  }

  test("range within: bucket replication finds exactly the radius matches") {
    val left = Seq((1L, ts("2024-01-01 00:01:00"))).toDF("lid", "lts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:29")), // 31s before -> out
      (11L, ts("2024-01-01 00:00:30")), // exactly 30s -> in
      (12L, ts("2024-01-01 00:01:15")), // 15s after -> in
      (13L, ts("2024-01-01 00:01:31"))  // 31s after -> out
    ).toDF("rid", "rts")
    val got = RangeJoin.within(left, right, "lts", "rts", 30)
      .select("rid").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(11L, 12L))
  }

  test("range within produces no duplicate pairs across buckets") {
    val left = Seq((1L, ts("2024-01-01 00:00:30"))).toDF("lid", "lts")
    val right = Seq((9L, ts("2024-01-01 00:00:30")))
      .toDF("rid", "rts") // boundary-aligned
    assert(RangeJoin.within(left, right, "lts", "rts", 30).count() == 1)
  }

  test("salted join and salted agg equal their unsalted forms") {
    val d = "/root/testdata/sf0.001"
    val plainJoin = Tables.lineitem(spark, d)
      .join(Tables.part(spark, d),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewJoin.saltedJoin(
      Tables.lineitem(spark, d),
      Tables.part(spark, d).withColumnRenamed("p_partkey", "l_partkey"),
      "l_partkey", "l_orderkey")
      .groupBy("p_brand").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plainJoin)

    val plainAgg = Tables.orders(spark, d)
      .groupBy("o_custkey").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val saltedAgg = SkewJoin.saltedAgg(Tables.orders(spark, d),
      "o_custkey", "o_totalprice", "o_orderkey")
      .select("o_custkey", "n").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(saltedAgg == plainAgg)
  }

  test("frequency-gated salting: hot keys take the salted path, result identical") {
    // key 1 carries half the probe side (≫ 4× mean); keys 2..101 are cold
    val left = (1 to 10000).map(i =>
      (if (i % 2 == 0) 1L else (i % 100).toLong + 2, i.toLong))
      .toDF("k", "disc")
    val right = (1 to 200).map(i => (i.toLong, s"v$i")).toDF("k", "payload")
    val plain = left.join(right, Seq("k"))
      .groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = SkewJoin.saltedJoin(left, right, "k", "disc")
      .groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(plain(1L) == 5000L, "skewed key must be present in the result")
  }

  test("cold-key-only salted join degenerates to the plain join (no replication)") {
    val left = (1 to 1000).map(i => ((i % 100).toLong, i.toLong)).toDF("k", "disc")
    val right = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "payload")
    val out = SkewJoin.saltedJoin(left, right, "k", "disc")
    // uniform keys → no key clears the gate → single plain join, no union
    assert(!out.queryExecution.optimizedPlan.toString.contains("Union"),
      "uniform input must not pay the salted branch")
    assert(out.count() == left.where(col("k") >= 1).count())
  }

  val sfDir = "/root/testdata/sf0.001"

  test("substring-run dedup equals a naive positional comparison") {
    // Naive driver-side recomputation: positional trigrams, stop-gram
    // filter at 20 corpus occurrences, aligned counts per (pair,
    // offset), keep >= 8 — the same constants the query pins.
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    val grams = docs.map { case (id, w) =>
      val n = math.max(w.length - 2, 1)
      id -> (1 to n).map(i => w.slice(i - 1, math.min(i + 2, w.length)).mkString(" "))
    }
    val gramFreq = grams.flatMap { case (_, gs) => gs }
      .groupBy(identity).map { case (g, xs) => g -> xs.length }
    val rare: String => Boolean = g => gramFreq(g) <= 20
    val naive = (for {
      (d1, g1) <- grams
      (d2, g2) <- grams
      if d1 < d2
    } yield {
      val counts = scala.collection.mutable.Map.empty[Long, Long]
      val byGram = g2.zipWithIndex.filter(x => rare(x._1))
        .groupBy(_._1).view.mapValues(_.map(_._2 + 1)).toMap
      g1.zipWithIndex.foreach { case (g, i0) =>
        if (rare(g)) byGram.getOrElse(g, Nil).foreach { p2 =>
          val off = (i0 + 1).toLong - p2
          counts(off) = counts.getOrElse(off, 0L) + 1
        }
      }
      counts.collect { case (off, n) if n >= 8 => (d1, d2, off, n) }
    }).flatten.sortBy(t => (t._1, t._2, t._3))
    val got = SparkEntry.queries("d_substring_runs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == naive.toSeq)
  }

  test("IVF cell-probe ANN recalls most of the exact cosine top-k") {
    val exactTop5 = SparkEntry.queries("v_cosine_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(
        _.sortBy(t => (-t._3, t._2)).take(5).map(_._2).toSet).toMap
    val ivf = SparkEntry.queries("v_ann_ivf")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(ivf.keySet == exactTop5.keySet)
    val recalls = exactTop5.map { case (q, ex) => (ivf(q) & ex).size.toDouble / ex.size }
    assert(recalls.sum / recalls.size >= 0.5,
      s"probing 4/16 cells should keep mean recall >= 0.5: $recalls")
  }

  test("k-means IVF recall beats the random-partition baseline") {
    val exactTop5 = SparkEntry.queries("v_cosine_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(
        _.sortBy(t => (-t._3, t._2)).take(5).map(_._2).toSet).toMap
    def meanRecall(name: String): Double = {
      val got = SparkEntry.queries(name)(spark, sfDir)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert(got.keySet == exactTop5.keySet)
      val rs = exactTop5.map { case (q, ex) => (got(q) & ex).size.toDouble / ex.size }
      rs.sum / rs.size
    }
    val trained = meanRecall("v_ann_kmeans")
    // NOTE: v_ann_ivf's recall is not a fair yardstick here — its
    // "centroids" are corpus vectors 0..15 and the query set is
    // vec_id < 8, so every query is its own centroid and its
    // neighborhood trivially co-locates. The honest bounds: well
    // above the random-partition expectation (nProbe/nCells = 0.25)
    // and at least half the exact neighborhood recovered.
    assert(trained >= 0.5, s"trained-IVF mean recall too low: $trained")
    assert(trained > 0.25 + 0.1,
      s"trained cells no better than a random partition: $trained")
  }

  test("temperature sampling flattens the lang mixture") {
    val kept = SparkEntry.queries("smp_temperature")(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = graft.Tables.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every stratum survives, none grows
    assert(kept.keySet == full.keySet)
    kept.foreach { case (l, k) => assert(k <= full(l)) }
    // flattening: the kept max/min ratio must shrink vs the input's
    val ratio = (m: Map[String, Long]) => m.values.max.toDouble / m.values.min
    assert(ratio(kept) < ratio(full),
      s"kept mixture ${kept} not flatter than input ${full}")
  }

  test("quantized top-k recalls most of the exact cosine top-k") {
    def topSets(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, sfDir).collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topSets("v_cosine_topk")
    val quant = topSets("v_quantized_topk")
    assert(quant.keySet == exact.keySet)
    val recalls = exact.map { case (q, ex) =>
      (quant(q) & ex).size.toDouble / ex.size
    }
    assert(recalls.forall(_ >= 0.4),
      s"a query fell below 4/10 recall: $recalls")
    assert(recalls.sum / recalls.size >= 0.6,
      s"mean recall too low: ${recalls.sum / recalls.size}")
  }

  test("PQ ANN recalls most of the exact cosine top-k after re-rank") {
    def topSets(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, sfDir).collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topSets("v_cosine_topk")
    val pq = topSets("v_pq_topk")
    assert(pq.keySet == exact.keySet)
    val recalls = exact.map { case (q, ex) =>
      (pq(q) & ex).size.toDouble / ex.size
    }
    // measured at fixed seed: min 0.5 / mean 0.74 (sf0.001); the
    // random expectation for a 64-candidate re-rank tier is 64/N≈0.13
    assert(recalls.forall(_ >= 0.4),
      s"a query fell below 4/10 recall: $recalls")
    assert(recalls.sum / recalls.size >= 0.6,
      s"mean recall too low: ${recalls.sum / recalls.size}")
  }

  test("LSH-bucketed ANN beats random bucketing at the same scan fraction") {
    def topSets(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, sfDir).collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topSets("v_cosine_topk")
    val lsh = topSets("v_lsh_topk")
    assert(lsh.keySet == exact.keySet,
      "every query must produce LSH candidates on the fixture")
    val recalls = exact.map { case (q, ex) =>
      (lsh(q) & ex).size.toDouble / ex.size }
    val mean = recalls.sum / recalls.size
    // the probe's honest cost: distinct candidates over the full
    // 8-query × (N−1) pair space — at 16 tables × 6 bits this is the
    // fraction of the corpus an average probe actually touches
    val nVecs = graft.Tables.embeddings(spark, sfDir).count()
    val candFrac = graft.queries.SimilarityQueries
      .lshCandidates(spark, sfDir).count().toDouble /
      (exact.keySet.size.toDouble * (nVecs - 1))
    // measured at sf0.001: recall 0.512 at candidate fraction 0.243;
    // a random partition of the same fraction would recall ≈ candFrac
    assert(candFrac <= 0.35, s"probe scans too much of the corpus: $candFrac")
    assert(mean >= 0.4, s"mean recall too low: $mean ($recalls)")
    assert(mean > candFrac + 0.15,
      s"LSH no better than random bucketing: recall $mean vs frac $candFrac")
  }

  test("kNN graph covers every vector with better-than-random neighbors") {
    val rows = SparkEntry.queries("v_knn_graph")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val e = graft.Tables.embeddings(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    // exact kNN ground truth, same rounding + tie-break as the query
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (ab, aa, bb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) {
        ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1
      }
      BigDecimal(ab / math.sqrt(aa * bb))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val exact = e.map { case (i, vi) =>
      i -> e.iterator.filter(_._1 != i)
        .map { case (jd, vj) => (jd, cos(vi, vj)) }.toSeq
        .sortBy(t => (-t._2, t._1)).take(5).map(_._1).toSet
    }
    val got = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet == exact.keySet,
      "every corpus vector must appear as a kNN-graph source")
    assert(rows.length == 5 * e.size,
      s"expected a full 5-NN graph, got ${rows.length} edges")
    val rs = exact.map { case (i, ex) => (got(i) & ex).size.toDouble / ex.size }
    val mean = rs.sum / rs.size
    // measured 0.559 (sf0.001) / 0.524 (sf0.01) vs the exact graph
    assert(mean >= 0.4, s"kNN-graph mean recall too low: $mean")
  }

  test("z-order: golden Morton codes and measurably better 2-D locality") {
    import graft.operators.ZOrder
    // golden 4x4 grid: x on even bits, y on odd -> the classic Z curve
    val grid = (for (x <- 0 to 3; y <- 0 to 3) yield (x, y)).toDF("x", "y")
    val got = grid.select(col("x"), col("y"),
      ZOrder.zvalue(col("x"), col("y"), 2).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got((0, 0)) == 0 && got((1, 0)) == 1 && got((0, 1)) == 2 &&
      got((1, 1)) == 3 && got((2, 0)) == 4 && got((3, 3)) == 15 &&
      got((2, 2)) == 12)
    // locality, exactly: over a 64x64 grid in 64-row chunks ("files"),
    // a linear sort serves min/max pruning on its own dimension only —
    // a slab predicate on the OTHER dimension touches all 64 chunks.
    // The z-layout keeps every slab in 8 chunks (an aligned 8-row slab
    // is 8 contiguous 8x8 z-blocks).
    val grid64 = spark.range(64L * 64)
      .select((col("id") % 64).as("gx"), (col("id") / 64).cast("long").as("gy"),
        col("id").as("rid"))
    def chunksTouched(sk: org.apache.spark.sql.Column,
        pred: org.apache.spark.sql.Column): Long = {
      import org.apache.spark.sql.expressions.Window
      grid64.withColumn("sk", sk)
        .withColumn("pos", row_number().over(
          Window.orderBy(col("sk"), col("rid"))))
        .where(pred)
        .select((col("pos") - 1).divide(64).cast("long")).distinct().count()
    }
    val z6 = ZOrder.zvalue(col("gx"), col("gy"), 6)
    assert(chunksTouched(col("gy"), col("gx") < 8) == 64) // y sort, x slab
    assert(chunksTouched(col("gx"), col("gy") < 8) == 64) // x sort, y slab
    assert(chunksTouched(z6, col("gx") < 8) == 8)
    assert(chunksTouched(z6, col("gy") < 8) == 8)
  }

  test("PII redaction counts every injected match and leaves no residue") {
    val out = SparkEntry.queries("t_redact")(spark, sfDir).collect()
    assert(out.nonEmpty)
    // Every row had exactly one email / one IP / one phone injected, and
    // the source corpus carries none of its own — so the detector must
    // count at least one of each, and row-for-row the redacted length
    // must differ from a PII-free text by the token/match size delta.
    assert(out.forall(r => r.getLong(r.fieldIndex("n_emails")) >= 1L))
    assert(out.forall(r => r.getLong(r.fieldIndex("n_ips")) >= 1L))
    assert(out.forall(r => r.getLong(r.fieldIndex("n_phones")) >= 1L))
    // Directly assert no-residue on a hand-built worst case: PII tokens
    // adjacent to punctuation and at string edges.
    val txt = "a.b+c%d@sub.example.co, 192.168.0.1;555-123-4567 end x@y.io"
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
    val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val red = Seq(txt).toDF("txt")
      .select(regexp_replace(regexp_replace(regexp_replace(col("txt"),
        emailRe, "<EMAIL>"), ipRe, "<IP>"), phoneRe, "<PHONE>").as("r"))
      .head().getString(0)
    assert(red == "<EMAIL>, <IP>;<PHONE> end <EMAIL>", red)
  }

  test("bloom-pruned semi-join equals the plain semi-join (no false negatives)") {
    val sf = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, sf)
    val urgent = Tables.orders(spark, sf)
      .where(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val bloomed = graft.operators.BloomPrune
      .semiJoin(li, "l_orderkey", urgent, "o_orderkey")
      .select("l_orderkey", "l_linenumber").collect().toSet
    val exact = li.join(urgent,
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber").collect().toSet
    assert(bloomed == exact)
    assert(exact.nonEmpty)
  }

  test("bloom probe prunes at the scan: survivors between exact matches and fact size") {
    val sf = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, sf)
    val urgent = Tables.orders(spark, sf)
      .where(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val bf = urgent.stat.bloomFilter("o_orderkey", math.max(1L, urgent.count()), 0.01)
    val bytes = graft.operators.BloomPrune.serialize(bf)
    val total = li.count()
    val exact = li.join(urgent,
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val survivors = li.where(graft.operators.BloomPrune
      .mightContain(bytes, col("l_orderkey").cast("long"))).count()
    // Zero false negatives (lower bound) and a real cut (the dim side
    // keeps ~20% of orders, so even with 1% fpp the scan must drop
    // most rows — generous 50% bound keeps the test host-independent).
    assert(survivors >= exact)
    assert(survivors <= total / 2, s"bloom pruned nothing: $survivors of $total")
    // False-positive mass bounded loosely: survivors cannot exceed
    // exact matches by more than 5% of the fact table.
    assert(survivors - exact <= total / 20)
  }

  test("scd2 intervals: versions tile each user's timeline without gaps") {
    val out = graft.SparkEntry.queries("w_scd2_intervals")(
      spark, "/root/testdata/sf0.001").collect()
    val byUser = out.groupBy(_.getLong(0))
    byUser.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // versions are 1..n dense
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      // each interval closes exactly where the next opens; last is open
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(a.fieldIndex("valid_to_us")) ==
            b.getLong(b.fieldIndex("valid_from_us")))
          // consecutive versions carry different attribute values
          assert(a.getString(2) != b.getString(2))
        case _ => ()
      }
      assert(sorted.last.getLong(
        sorted.last.fieldIndex("valid_to_us")) == Long.MaxValue)
    }
    assert(out.nonEmpty)
  }

  test("mergeInto: latest-per-key compaction then upsert/delete apply") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val changes = Seq(
      (1L, "U", 11.0, 1L), (1L, "U", 12.0, 2L), // newest (seq=2) wins
      (2L, "D", 0.0, 3L),                       // delete key 2
      (4L, "U", 40.0, 4L),                      // insert new key 4
      (5L, "D", 0.0, 5L)                        // delete of absent key: no row
    ).toDF("k", "op", "v", "seq")
    val latest = MergeInto.latestPerKey(changes, "k", Seq(col("seq").desc))
    assert(latest.count() == 4)
    assert(latest.where(col("k") === 1L).select("v").as[Double].head() == 12.0)
    val out = MergeInto.merge(target, latest, "k", "k", "op",
      Seq(
        "k" -> coalesce(col("t.k"), col("c.k")),
        "v" -> when(col("c.k").isNull, col("t.v")).otherwise(col("c.v")),
        "how" -> when(col("c.k").isNull, lit("kept"))
          .when(col("t.k").isNull, lit("ins")).otherwise(lit("upd"))))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(out == Set((1L, 12.0, "upd"), (3L, 30.0, "kept"), (4L, 40.0, "ins")))
  }

  test("merge upsert query: keys unique, actions consistent, deletes absent") {
    val d = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("o_merge_upsert")(spark, d).collect()
    val keyIdx = out.head.fieldIndex("c_custkey")
    val keys = out.map(_.getLong(keyIdx))
    assert(keys.distinct.length == keys.length) // merge key stays unique
    out.foreach { r =>
      val action = r.getString(r.fieldIndex("action"))
      val name = r.getString(r.fieldIndex("c_name"))
      action match {
        case "inserted" => assert(name.startsWith("cdc#"))
        case "kept" | "updated" => assert(!name.startsWith("cdc#"))
        case other => fail(s"unexpected action $other")
      }
    }
    // every key whose newest change is a delete must be absent
    val ev = Tables.events(spark, d)
      .select(
        when(col("event_type") === "signup", col("user_id") + 1500)
          .otherwise(col("user_id") * 10).as("custkey"),
        col("event_type"), col("ts"), col("event_id"))
    val latest = MergeInto.latestPerKey(
      ev, "custkey", Seq(col("ts").desc, col("event_id").desc))
    val deleted = latest.where(col("event_type") === "error")
      .select("custkey").as[Long].collect().toSet
    assert(deleted.nonEmpty && keys.forall(k => !deleted.contains(k)))
  }

  test("snapshot diff: status totals reconcile with both versions") {
    val d = "/root/testdata/sf0.001"
    val diff = graft.SparkEntry.queries("o_snapshot_diff")(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val v1 = Tables.customer(spark, d).count()
    val v2 = graft.SparkEntry.queries("o_merge_upsert")(spark, d).count()
    def n(s: String) = diff.getOrElse(s, 0L)
    // every v1 key is exactly one of removed/changed/unchanged
    assert(n("removed") + n("changed") + n("unchanged") == v1)
    // every v2 key is exactly one of added/changed/unchanged
    assert(n("added") + n("changed") + n("unchanged") == v2)
    assert(n("changed") > 0 && n("added") > 0 && n("removed") > 0)
  }

  test("bpe merge pairs: vocab-weighted counts equal naive corpus counts") {
    val d = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("t_bpe_merge_pairs")(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // naive: explode every token OCCURRENCE and count its char pairs
    val naive = Tables.documents(spark, d)
      .select(explode(split(col("text"), " ", -1)).as("token"))
      .where(length(col("token")) >= 2)
      .select(col("token"),
        explode(sequence(lit(1), length(col("token")) - 1)).as("i"))
      .selectExpr("substring(token, i, 2) AS pair")
      .groupBy("pair").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (pair, n) => assert(naive(pair) == n, pair) }
    assert(out.nonEmpty && out.values.max == naive.values.max)
  }

  test("inverted index: df and posting prefix match a direct recount") {
    val d = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("t_inverted_index")(spark, d).collect()
    val direct = Tables.documents(spark, d)
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("token"))
      .where(col("token") =!= "")
      .select("token", "doc_id").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    out.foreach { r =>
      val (token, df, postings) = (r.getString(0), r.getLong(1), r.getString(2))
      val docs = direct(token)
      assert(df == docs.length)
      assert(postings == docs.take(40).mkString(","))
    }
    assert(out.length == direct.size)
  }

  test("incremental ANN add: nearest-centroid assignment == trained transform") {
    // The refit-free ADD step must agree with what the fitted model
    // would assign: spherical k-means transform IS nearest-centroid
    // in unit space, so re-assigning the whole corpus through
    // assignToCells reproduces the trained assignment (up to rounded
    // boundary ties, which the fixture does not produce).
    val d = "/root/testdata/sf0.001"
    import graft.queries.SimilarityTestAccess
    val e = SimilarityTestAccess.vecs(spark, d)
    val (assign, centroids) = SimilarityTestAccess.kmeansIndex(spark, d)
    val trained = assign.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val readded = SimilarityTestAccess.assignToCells(e, centroids).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(readded.keySet == trained.keySet)
    val agree = readded.count { case (id, c) => trained(id) == c }
    assert(agree == trained.size,
      s"add-path assignment diverged on ${trained.size - agree} vectors")
    // and the served query returns rows for every query id
    val out = graft.SparkEntry.queries("v_ann_incremental")(spark, d).collect()
    assert(out.nonEmpty && out.map(_.getLong(0)).distinct.length >= 4)
  }

  test("simhash hamming join: pigeonhole blocking is complete vs brute force") {
    val d = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("d_simhash_hamming")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sigs = graft.SparkEntry.queries("d_simhash")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (id1, s1) <- sigs; (id2, s2) <- sigs if id1 < id2
      h = java.lang.Long.bitCount(s1 ^ s2) if h <= 2
    } yield (id1, id2, h.toLong)).toSet
    assert(out == brute, "pigeonhole candidates must be EXACTLY the ball")
    assert(out.nonEmpty, "fixture dups must yield hamming-close pairs")
  }

  test("weighted priority sample: bottom-32 by integer u/w priority") {
    val d = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("smp_weighted_priority")(spark, d).collect()
    assert(out.length == 32)
    assert(out.map(_.getInt(out.head.fieldIndex("rk"))).toSeq == (1 to 32))
    val pris = out.map(_.getLong(out.head.fieldIndex("pri")))
    assert(pris.zip(pris.tail).forall { case (a, b) => a <= b })
    // the sample's max priority is a true lower envelope: no excluded
    // doc has a smaller priority
    import graft.functions.GraftFunctions.hex60
    graft.functions.NativeFunctions.register(spark)
    val all = Tables.documents(spark, d)
      .withColumn("h20", shiftright(hex60(col("text")), 40))
      .select(col("doc_id"),
        expr("(h20 * 1000000) div greatest(n_chars, 1)").as("p"))
    val kept = out.map(_.getLong(out.head.fieldIndex("doc_id"))).toSet
    val minExcluded = all.where(!col("doc_id").isin(kept.toSeq: _*))
      .agg(min(col("p"))).as[Long].head()
    assert(pris.max <= minExcluded)
  }

  test("PrefixSum.exclusive: distributed two-phase scan == sequential fold") {
    // pseudo-random values on a shuffled-id frame, forced through
    // MANY range partitions so the per-partition offsets actually
    // compose; compare against the driver-side sequential scan
    val n = 1000
    val rows = (0 until n).map(i => (i.toLong, (i * 2654435761L % 97).toInt))
    val df = spark.createDataset(rows).toDF("k", "v")
      .repartition(7) // destroy input order; operator must re-range
    val got = graft.operators.PrefixSum
      .exclusive(df, "k", "v", "pre", partitions = 13)
      .select("k", "pre").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    var acc = 0L
    rows.foreach { case (k, v) =>
      assert(got(k) == acc, s"key $k: got ${got(k)}, want $acc")
      acc += v
    }
    // empty input: still well-formed
    assert(graft.operators.PrefixSum
      .exclusive(df.limit(0), "k", "v", "pre").count() == 0)
  }

  test("lshCandidatePairs: the public DF entrypoint agrees with the " +
      "memoized per-dir pipeline") {
    // Same shingling, signature family, and banding — the throughput
    // reformulation (explode → codegen'd hash-agg min instead of the
    // interpreted per-element transforms) must change the plan shape
    // only, never a pair. Docs with text are identical between paths;
    // shingle-less docs (none in the fixture) are the documented
    // divergence.
    val d = "/root/testdata/sf0.001"
    val viaApi = graft.queries.DedupQueries
      .lshCandidatePairs(Tables.documents(spark, d))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaQuery = SparkEntry.queries("d_minhash_lsh")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaApi == viaQuery)
    assert(viaApi.nonEmpty, "fixture must contain planted near-dups")
  }
}
