package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.graph.{GraphLoad, GraphStore}
import graft.sources.GraftStoreSink
import graft.streaming.{EventStreams, ZoneMaps}

/** Zone-map data skipping (round 15b): manifest-carried per-bucket
  * min/max stats prune range predicates on the SQL serving surface —
  * and can only SKIP buckets a conjunct provably cannot hit, never
  * change an answer. */
class ZoneMapsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def scanFiles(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s }
    assert(scans.nonEmpty,
      df.queryExecution.executedPlan.toString.take(500))
    scans.head.metrics("numFiles").value
  }

  /** A sink-created raw store declaring zone maps: ids 0..199 whose
    * `v` (long) and `s` (string) values CLUSTER by the id's bucket —
    * zone maps are a clustering-dependent optimization (a column
    * uniformly spread across buckets has every bucket's [min,max]
    * covering everything), and the fixture makes the clustered case
    * explicit: bucket b holds v in [b·1000, b·1000+199] and s with
    * prefix `g{b}_`. `n` is always null. */
  private lazy val zdir: String = {
    import spark.implicits._
    val d = tmp("zones_store")
    val sink = new GraftStoreSink(spark,
      Map("path" -> d, "keys" -> "id", "buckets" -> "8",
        "zoneMaps" -> "true", "checkpointLocation" -> "/chk/z"),
      OutputMode.Append())
    val df = (0 until 200).toDF("id")
      .withColumn("_b", EventStreams.bucketCol(Seq("id"), 8))
      .withColumn("v", col("_b").cast("long") * 1000 + col("id"))
      .withColumn("s", concat(lit("g"), col("_b"), lit("_"),
        format_string("%04d", col("id"))))
      .withColumn("n", lit(null).cast("int"))
      .drop("_b")
    sink.addBatch(0, df)
    d
  }

  private def zread: DataFrame =
    spark.read.format("graftstore").option("path", zdir).load()
      .drop("_graft_bucket")

  private def liveFiles: Long = scanFiles(zread)

  test("truncation helpers are bound-preserving") {
    val long = Array.fill[Byte](100)(65) // 'A' * 100
    assert(ZoneMaps.truncMin(long).length == ZoneMaps.MaxStringBytes)
    assert(java.util.Arrays.compareUnsigned(
      ZoneMaps.truncMin(long), long) < 0) // prefix < full: lower bound
    val up = ZoneMaps.truncMax(long).get
    assert(java.util.Arrays.compareUnsigned(up, long) > 0) // upper
    // carry: trailing 0xFF increments the previous byte and shortens
    val ff = Array.fill[Byte](100)(65)
    for (i <- 60 until 100) ff(i) = -1
    val upFf = ZoneMaps.truncMax(ff).get
    assert(upFf.length < ZoneMaps.MaxStringBytes)
    assert(java.util.Arrays.compareUnsigned(upFf, ff) > 0)
    // all-0xFF: no finite successor
    assert(ZoneMaps.truncMax(Array.fill[Byte](100)(-1)).isEmpty)
  }

  test("encodeField/decodeField round-trip, all-null marker included") {
    val s: ZoneMaps.BucketStats =
      Map(0 -> Some(("12", "999")), 2 -> None,
        5 -> Some(("QQ==", "ZZ9_-w==")))
    assert(ZoneMaps.decodeField(ZoneMaps.encodeField(s).get) == s)
    assert(ZoneMaps.encodeField(Map.empty).isEmpty)
  }

  test("manifest stats equal the data's true per-bucket min/max") {
    val m = EventStreams.readManifestFull(spark, s"$zdir/manifest/v1")
    val schema = spark.read.parquet(s"$zdir/_empty").schema
    val vOrd = schema.fieldIndex("v")
    val truth = spark.read.parquet(s"$zdir/v1")
      .groupBy(col("_graft_bucket").cast("int").as("_b"))
      .agg(min("v").as("mn"), max("v").as("mx"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val live = m.filter(_._2.version >= 0)
    assert(live.nonEmpty)
    live.foreach { case (b, bf) =>
      val st = bf.stats.getOrElse(fail(s"bucket $b carries no stats"))
      val (mn, mx) = st(vOrd).get
      assert((mn.toLong, mx.toLong) == truth(b), s"bucket $b")
      // the always-null column is marked all-null, not absent
      assert(st(schema.fieldIndex("n")).isEmpty)
    }
  }

  test("range predicates prune the scan; results equal the unpruned " +
      "read") {
    import spark.implicits._
    val all = zread.select("id", "v").as[(Int, Long)].collect().toSeq
    val total = liveFiles
    assert(total > 1)
    // out of range entirely: zero files planned
    assert(scanFiles(zread.where(col("v") > lit(100000L))) == 0L)
    assert(scanFiles(zread.where(col("v") < lit(0L))) == 0L)
    // a one-bucket range opens exactly that bucket's file
    val tight = zread.where(col("v") >= 3000L && col("v") < 4000L)
    val nT = scanFiles(tight)
    assert(nT == 1L, s"one-bucket range read $nT of $total")
    assert(tight.count() ==
      all.count { case (_, v) => v >= 3000L && v < 4000L })
    // equality on a non-key column prunes too
    val v42 = all.collectFirst { case (42, v) => v }.get
    val eq = zread.where(col("v") === v42)
    assert(scanFiles(eq) == 1L)
    assert(eq.select("id").as[Int].collect().toSeq == Seq(42))
    // the always-null column: every bucket all-null, any equality
    // prunes everything — and so does a bare IS NOT NULL (Spark
    // pushes one beside every equality, so this shape is on the hot
    // path of ordinary point reads too)
    assert(scanFiles(zread.where(col("n") === 7)) == 0L)
    assert(scanFiles(zread.where(col("n").isNotNull)) == 0L)
    assert(zread.where(col("n").isNotNull).count() == 0)
  }

  test("string bounds: equality, IN and prefix prune; absent prefix " +
      "opens zero files") {
    import spark.implicits._
    val total = liveFiles
    val s42 = zread.where(col("id") === 42).select("s").as[String].head()
    val one = zread.where(col("s") === s42)
    assert(scanFiles(one) == 1L, s"of $total")
    assert(one.count() == 1)
    assert(scanFiles(zread.where(col("s") === "z9999")) == 0L)
    assert(scanFiles(zread.where(col("s").isin("z1", "z2"))) == 0L)
    assert(scanFiles(zread.where(col("s").startsWith("z"))) == 0L)
    // a per-bucket prefix opens one file and returns the bucket
    val pre = zread.where(col("s").startsWith("g3_"))
    assert(scanFiles(pre) == 1L)
    assert(pre.count() ==
      zread.where(col("v") >= 3000L && col("v") < 4000L).count())
  }

  test("a second batch re-stats only its dirty buckets; the others " +
      "inherit, and pruning stays exact") {
    import spark.implicits._
    val d = tmp("zones_inherit")
    val sink = new GraftStoreSink(spark,
      Map("path" -> d, "keys" -> "id", "buckets" -> "8",
        "zoneMaps" -> "true", "checkpointLocation" -> "/chk/zi"),
      OutputMode.Append())
    sink.addBatch(0, (0 until 100)
      .map(i => (i, i.toLong)).toDF("id", "v"))
    // one key moves far outside its old range
    sink.addBatch(1, Seq((7, 100000L)).toDF("id", "v"))
    val m1 = EventStreams.readManifestFull(spark, s"$d/manifest/v1")
    val m2 = EventStreams.readManifestFull(spark, s"$d/manifest/v2")
    val dirtyB = m2.collect { case (k, bf) if bf.version == 2 => k }.toSet
    assert(dirtyB.size == 1)
    // untouched buckets inherit their stats verbatim
    m2.filter(e => !dirtyB(e._1) && e._2.version >= 0).foreach {
      case (k, bf) => assert(bf.stats == m1(k).stats, s"bucket $k") }
    val rd = spark.read.format("graftstore").option("path", d).load()
    // the moved key is found through the RE-STATTED bucket...
    val hi = rd.where(col("v") >= 99999L)
    assert(scanFiles(hi) == 1L)
    assert(hi.select("id").as[Int].collect().toSeq == Seq(7))
    // ...and its old position serves the new value, not a stale one
    assert(rd.where(col("id") === 7).select("v").as[Long].head() ==
      100000L)
  }

  test("GraphStore zoneMaps: range pruning on Feature.rank, equality " +
      "with a zones-less twin, stats survive applyRelease and rebucket") {
    val Seq(r1, r2, _) = LoadFixtures.policyMatrix(spark)
    val zd = tmp("zones_graph")
    val pd = tmp("zones_graph_plain")
    GraphStore.init(spark, zd, GraphLoad.loadAll(spark, Seq(r1)),
      buckets = 8, zoneMaps = true)
    GraphStore.init(spark, pd, GraphLoad.loadAll(spark, Seq(r1)),
      buckets = 8)
    GraphStore.applyRelease(spark, zd, r2)
    GraphStore.applyRelease(spark, pd, r2)
    def feat(d: String) = GraphStore.sqlTable(spark, d, "Feature")
    val maxRank = feat(pd).agg(max("rank")).head().getInt(0)
    // beyond the data: the zones store plans zero files, the plain
    // twin reads everything — same (empty) answer
    val qz = feat(zd).where(col("rank") > maxRank)
    val qp = feat(pd).where(col("rank") > maxRank)
    assert(scanFiles(qz) == 0L)
    assert(scanFiles(qp) > 0L)
    assert(qz.count() == 0 && qp.count() == 0)
    // an in-range predicate: identical rows through both stores
    val inZ = feat(zd).where(col("rank") >= 2)
    val inP = feat(pd).where(col("rank") >= 2)
    assert(LoadFixtures.rowsOf(inZ) == LoadFixtures.rowsOf(inP))
    // rebucket rewrites stats under the new width and keeps the
    // declaration (meta line survives the meta rewrite)
    GraphStore.rebucket(spark, zd, 16)
    val after = feat(zd).where(col("rank") > maxRank)
    assert(scanFiles(after) == 0L)
    assert(LoadFixtures.rowsOf(feat(zd).where(col("rank") >= 2)) ==
      LoadFixtures.rowsOf(inP))
    // a further apply keeps maintaining stats (declaration intact)
    val Seq(_, _, r3) = LoadFixtures.policyMatrix(spark)
    GraphStore.applyRelease(spark, zd, r3)
    val m = EventStreams.readManifestFull(spark,
      s"$zd/Feature/manifest/v${EventStreams.manifestVersions(spark,
        s"$zd/Feature").max}")
    assert(m.exists(e => e._2.version >= 0 && e._2.stats.isDefined))
  }

  test("zones-less stores are untouched: no stats field, no pruning, " +
      "same answers (backwards compatibility)") {
    import spark.implicits._
    val d = tmp("zones_off")
    val sink = new GraftStoreSink(spark,
      Map("path" -> d, "keys" -> "id",
        "checkpointLocation" -> "/chk/zo"),
      OutputMode.Append())
    sink.addBatch(0, (0 until 50).map(i => (i, i.toLong)).toDF("id", "v"))
    val m = EventStreams.readManifestFull(spark, s"$d/manifest/v1")
    assert(m.values.forall(_.stats.isEmpty))
    val rd = spark.read.format("graftstore").option("path", d).load()
    val total = scanFiles(rd)
    assert(scanFiles(rd.where(col("v") > 1000000L)) == total)
    assert(rd.where(col("v") > 1000000L).count() == 0)
  }
}
