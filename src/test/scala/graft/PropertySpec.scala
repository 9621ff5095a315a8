package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Hex60

/** Property-style tests (SURVEY §5): hash parity with the reference
  * formulas, name determinism, accession append-only stability, and
  * operator equivalence against naive implementations — over
  * fixed-seed random samples (deterministic CI).
  */
class PropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples(seed: Long, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val len = rnd.nextInt(64)
      (0 until len).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    }
  }

  test("hex60 == first 15 hex digits of md5 as decimal (reference form)") {
    for (s <- samples(42L, 300)) {
      val viaNative = Hex60.hash60(s.getBytes("UTF-8"))
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val viaReference = java.lang.Long.parseLong(hex.take(15), 16)
      assert(viaNative == viaReference, s"input=$s")
    }
  }

  test("seqHash matches the reference md5-int-prefix semantics (P5)") {
    // app.py:86-94: str(int(md5(seq).hexdigest(), 16))[:32]
    val inputs = samples(7L, 40).filter(_.nonEmpty)
    val expected = inputs.map { s =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      new java.math.BigInteger(hex, 16).toString.take(32)
    }
    val got = inputs.toDF("x")
      .select(graft.functions.GraftFunctions.seqHash(col("x")))
      .collect().map(_.getString(0)).toSeq
    assert(got == expected)
  }

  test("GFE names are deterministic across repeated builds") {
    import graft.gfe.GfeBuild
    import graft.ingest.ImgtFlatFile
    val text = ImgtFlatFile.resourceText("/graft/hla.3560.dat")
    def run(): Map[String, String] =
      GfeBuild.run(spark, ImgtFlatFile.fromText(spark, text), "3560")
        .gfeSequences.select("hla_name", "gfe_name").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(run() == run())
  }

  test("accession registry is append-only across random release splits") {
    import graft.gfe.GfeBuild
    import graft.ingest.ImgtFlatFile
    val recs = ImgtFlatFile.parseText(
      ImgtFlatFile.resourceText("/graft/hla.3560.dat"))
    val enc = org.apache.spark.sql.Encoders.product[graft.model.AlleleRecord]
    val rnd = new scala.util.Random(11L)
    for (_ <- 1 to 3) {
      val split = 1 + rnd.nextInt(recs.length - 1)
      val r1 = GfeBuild.run(spark,
        spark.createDataset(recs.take(split))(enc), "3560")
      val r2 = GfeBuild.run(spark,
        spark.createDataset(recs)(enc), "3570",
        registry = Some(r1.registry))
      // every (key -> accession) from release 1 survives unchanged
      val changed = r1.registry.as("a").join(r2.registry.as("b"),
        Seq("locus", "term", "rank", "sequence"))
        .where(col("a.accession") =!= col("b.accession")).count()
      assert(changed == 0, s"split=$split")
      assert(r2.registry.count() >= r1.registry.count())
    }
  }

  test("asOf equals the naive latest-at-or-before lookup") {
    val rnd = new scala.util.Random(23L)
    for (round <- 1 to 5) {
      val leftRows = (0 until 1 + rnd.nextInt(25))
        .map(_ => (1L + rnd.nextInt(3), rnd.nextInt(50).toLong))
      val rightRows = (0 until 1 + rnd.nextInt(25))
        .map(_ => (1L + rnd.nextInt(3), rnd.nextInt(50).toLong))
      val left = leftRows.zipWithIndex
        .map { case ((k, t), i) => (k, new java.sql.Timestamp(t * 1000), i.toLong) }
        .toDF("k", "ts", "lid")
      val right = rightRows.zipWithIndex
        .map { case ((k, t), i) => (k, new java.sql.Timestamp(t * 1000), i.toLong) }
        .toDF("k", "ts", "rid")
      val got = graft.operators.AsOfJoin
        .asOf(left, right, Seq("k"), "ts", "ts", Seq("rid"), "rid")
        .select("lid", "asof_rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      val naive = leftRows.zipWithIndex.map { case ((k, t), i) =>
        val candidates = rightRows.zipWithIndex
          .filter { case ((rk, rt), _) => rk == k && rt <= t }
        val best =
          if (candidates.isEmpty) -1L
          else candidates.maxBy { case ((_, rt), ri) => (rt, ri.toLong) }._2.toLong
        i.toLong -> best
      }.toMap
      assert(got == naive, s"round=$round")
    }
  }

  test("frequency-gated salted join equals the plain join over random skews") {
    val rnd = new scala.util.Random(47L)
    for (round <- 1 to 4) {
      // zipf-ish: key 1 hot with probability ramping per round
      val hotShare = 0.2 + 0.2 * round
      val leftRows = (0 until 400).map { i =>
        val k = if (rnd.nextDouble() < hotShare) 1L else 2L + rnd.nextInt(30)
        (k, i.toLong)
      }
      val rightRows = (1 to 40).map(k => (k.toLong, s"p$k"))
      val left = leftRows.toDF("k", "disc")
      val right = rightRows.toDF("k", "payload")
      val plain = left.join(right, Seq("k"))
        .groupBy("k").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val salted = graft.operators.SkewJoin
        .saltedJoin(left, right, "k", "disc", salts = 4, hotFactor = 2.0)
        .groupBy("k").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(salted == plain, s"round=$round hotShare=$hotShare")
    }
  }

  test("range within equals the naive radius filter") {
    val rnd = new scala.util.Random(31L)
    for (round <- 1 to 5) {
      val leftRows = (0 until 1 + rnd.nextInt(20))
        .map(i => (i.toLong, rnd.nextInt(300).toLong))
      val rightRows = (0 until 1 + rnd.nextInt(20))
        .map(i => (i.toLong, rnd.nextInt(300).toLong))
      val left = leftRows
        .map { case (i, t) => (i, new java.sql.Timestamp(t * 1000)) }
        .toDF("lid", "lts")
      val right = rightRows
        .map { case (i, t) => (i, new java.sql.Timestamp(t * 1000)) }
        .toDF("rid", "rts")
      val got = graft.operators.RangeJoin.within(left, right, "lts", "rts", 30)
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val naive = (for {
        (li, lt) <- leftRows
        (ri, rt) <- rightRows
        if math.abs(lt - rt) <= 30
      } yield (li, ri)).toSet
      assert(got == naive, s"round=$round")
    }
  }

  test("weighted shortest path equals Floyd-Warshall on random graphs") {
    val rnd = new scala.util.Random(91L)
    for (round <- 1 to 5) {
      val n = 6 + rnd.nextInt(5)
      val edges = (0 until n * 2)
        .map(_ => (rnd.nextInt(n), rnd.nextInt(n), 1L + rnd.nextInt(9)))
        .filter { case (a, b, _) => a != b }
      val INF = Long.MaxValue / 4
      val dm = Array.fill(n, n)(INF)
      for (i <- 0 until n) dm(i)(i) = 0L
      for ((a, b, w) <- edges; if w < dm(a)(b)) { dm(a)(b) = w; dm(b)(a) = w }
      for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
        if (dm(i)(k) + dm(k)(j) < dm(i)(j)) dm(i)(j) = dm(i)(k) + dm(k)(j)
      val expected = (0 until n).filter(j => dm(0)(j) < INF)
        .map(j => s"v$j" -> dm(0)(j)).toMap
      val got = graft.graph.GraphAlgorithms.weightedShortestPathsDF(
        edges.map { case (a, b, w) => (s"v$a", s"v$b", w) }.toDF("s", "t", "w"),
        "s", "t", "w", Seq("v0"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"round=$round edges=$edges")
    }
  }

  test("node similarity equals brute-force neighbor-set Jaccard") {
    val rnd = new scala.util.Random(17L)
    for (round <- 1 to 5) {
      val n = 5 + rnd.nextInt(5)
      val edges = (0 until n * 2)
        .map(_ => (rnd.nextInt(n), rnd.nextInt(n)))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (s"v$a", s"v$b") }
        .distinct
      val nbr = scala.collection.mutable.Map.empty[String, Set[String]]
      for ((a, b) <- edges) {
        nbr(a) = nbr.getOrElse(a, Set.empty) + b
        nbr(b) = nbr.getOrElse(b, Set.empty) + a
      }
      val verts = nbr.keys.toSeq.sorted
      val expected = (for {
        i <- verts.indices; j <- (i + 1) until verts.length
        a = verts(i); b = verts(j)
        inter = (nbr(a) & nbr(b)).size if inter > 0
      } yield (a, b) ->
        ((inter.toLong, (nbr(a) | nbr(b)).size.toLong))).toMap
      val got = graft.graph.GraphAlgorithms
        .nodeSimilarityDF(edges.toDF("s", "t"), "s", "t")
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
        .toMap
      assert(got == expected, s"round=$round edges=$edges")
    }
  }

  test("prefix-filter setsim join equals brute-force all-pairs Jaccard (completeness)") {
    // The prefix-filter theorem in executable form: d_setsim_join must
    // return EXACTLY the pairs a full O(n²) pass finds at τ = 3/5 —
    // a dropped prefix token would show up here as a missing pair.
    val d = "/root/testdata/sf0.001"
    def shingleSet(text: String): Set[String] = {
      val w = text.trim.split("[ \\t\\n\\u000B\\f\\r]+")
      (1 to math.max(w.length - 2, 1))
        .map(i => w.slice(i - 1, i + 2).mkString(" ")).toSet
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingleSet(r.getString(1)))
      .sortBy(_._1)
    val expected = (for {
      i <- docs.indices; j <- (i + 1) until docs.length
      (id1, s1) = docs(i); (id2, s2) = docs(j)
      inter = (s1 & s2).size
      union = s1.size + s2.size - inter
      if 5 * inter >= 3 * union
    } yield (id1, id2) -> ((inter.toLong, union.toLong))).toMap
    val got = SparkEntry.queries("d_setsim_join")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected,
      s"missing=${(expected.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- expected.keySet).take(5)}")
  }

  test("one-sided prefix containment join equals brute-force all-pairs (completeness)") {
    // Same theorem, asymmetric form: d_containment_pairs must return
    // EXACTLY the ordered pairs a full O(n²) pass finds at C = |A∩B|/
    // |A| ≥ 4/5 — including small-in-large containments whose Jaccard
    // is far below any symmetric threshold (the pairs the prefix on
    // the CONTAINED side alone must still surface).
    val d = "/root/testdata/sf0.001"
    def shingleSet(text: String): Set[String] = {
      val w = text.trim.split("[ \\t\\n\\u000B\\f\\r]+")
      (1 to math.max(w.length - 2, 1))
        .map(i => w.slice(i - 1, i + 2).mkString(" ")).toSet
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingleSet(r.getString(1)))
      .sortBy(_._1)
    val expected = (for {
      i <- docs.indices; j <- docs.indices if i != j
      (id1, s1) = docs(i); (id2, s2) = docs(j)
      inter = (s1 & s2).size
      if 5 * inter >= 4 * s1.size
    } yield (id1, id2) -> ((inter.toLong, s1.size.toLong))).toMap
    val got = SparkEntry.queries("d_containment_pairs")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2).toLong, r.getInt(3).toLong)))
      .toMap
    assert(got == expected,
      s"missing=${(expected.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- expected.keySet).take(5)}")
    // the hashed-shingle BATCH entrypoint (the xscale tier's form:
    // 60-bit long arrays instead of strings) must find the same pairs
    // with the same counts — hex60 is injective on this corpus, and a
    // collision would shrink a set size and surface here
    val batch = graft.queries.DedupQueries.containmentJoinPairs(
      spark.read.parquet(s"$d/documents.parquet").select("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2).toLong, r.getInt(3).toLong)))
      .toMap
    assert(batch == expected,
      s"hashed batch form diverged: missing=" +
        s"${(expected.keySet -- batch.keySet).take(5)} " +
        s"extra=${(batch.keySet -- expected.keySet).take(5)}")
  }
}
