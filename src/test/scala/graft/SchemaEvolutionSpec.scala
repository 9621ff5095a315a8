package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.sources.{GraftStoreSink, GraftStoreSource}
import graft.streaming.EventStreams

/** Additive schema evolution on sink-maintained / raw stores (round
  * 15c): a batch carrying new columns under `mergeSchema=true`
  * publishes an evolved schema footer atomically; every read serves
  * the appended columns — NULL from pre-evolution bucket files — and
  * nothing else about the store (keys, hashing, blooms, zone
  * ordinals, history) moves. Anything non-additive stays the loud
  * rebuild remedy. */
class SchemaEvolutionSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def sink(dir: String, chk: String,
      extra: (String, String)*): GraftStoreSink =
    new GraftStoreSink(spark,
      Map("path" -> dir, "keys" -> "id",
        "checkpointLocation" -> chk) ++ extra.toMap,
      OutputMode.Append())

  private def readBack(dir: String): DataFrame =
    spark.read.format("graftstore").option("path", dir).load()
      .drop("_graft_bucket")

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.toList: Seq[Any]).toSet

  test("a batch with a new column evolves the store: old rows read " +
      "NULL, new rows carry values, schema serves everywhere") {
    import spark.implicits._
    val d = tmp("evo_store")
    val s0 = sink(d, "/chk/e0")
    s0.addBatch(0, Seq((1, "a"), (2, "b")).toDF("id", "v"))
    // pipeline v2 restarts with an added column (fresh query)
    val s1 = sink(d, "/chk/e1", "mergeSchema" -> "true")
    s1.addBatch(0, Seq((2, "b2", 20L), (3, "c", 30L))
      .toDF("id", "v", "w"))
    // batch source, cdcState, and the sink's own reads all serve the
    // evolved schema; pre-evolution row 1 reads w = NULL
    val expect = Set[Seq[Any]](
      Seq(1, "a", null), Seq(2, "b2", 20L), Seq(3, "c", 30L))
    assert(readBack(d).columns.toSeq == Seq("id", "v", "w"))
    assert(rows(readBack(d)) == expect)
    assert(rows(EventStreams.cdcState(spark, d)) == expect)
    // evolution published exactly one footer
    val (fs, root) = EventStreams.hadoopFs(spark, d)
    assert(fs.listStatus(root).map(_.getPath.getName)
      .count(_.matches("_empty_e\\d+")) == 1)
    // a further batch at the evolved schema does NOT re-evolve
    s1.addBatch(1, Seq((4, "d", 40L)).toDF("id", "v", "w"))
    assert(fs.listStatus(root).map(_.getPath.getName)
      .count(_.matches("_empty_e\\d+")) == 1)
    assert(rows(readBack(d)) == expect + Seq(4, "d", 40L))
  }

  test("without mergeSchema a new column fails loudly naming the " +
      "option; dropped/retyped columns stay the rebuild remedy " +
      "either way") {
    import spark.implicits._
    val d = tmp("evo_loud")
    sink(d, "/chk/l0").addBatch(0, Seq((1, "a")).toDF("id", "v"))
    val e1 = intercept[IllegalArgumentException] {
      sink(d, "/chk/l1").addBatch(0,
        Seq((2, "b", 1L)).toDF("id", "v", "w"))
    }
    assert(e1.getMessage.contains("mergeSchema"), e1.getMessage)
    // dropping a persisted column: loud even WITH the option
    val e2 = intercept[IllegalArgumentException] {
      sink(d, "/chk/l2", "mergeSchema" -> "true")
        .addBatch(0, Seq((2, 1L)).toDF("id", "w"))
    }
    assert(e2.getMessage.contains("rebuild"), e2.getMessage)
    // retyping: loud even WITH the option
    val e3 = intercept[IllegalArgumentException] {
      sink(d, "/chk/l3", "mergeSchema" -> "true")
        .addBatch(0, Seq((2, 7)).toDF("id", "v"))
    }
    assert(e3.getMessage.contains("rebuild"), e3.getMessage)
  }

  test("evolution composes with the engine loop: a RUNNING feed keeps " +
      "its start-pinned schema through an upstream evolution; a fresh " +
      "feed sees the new column; diff across the evolution reads one " +
      "schema") {
    import spark.implicits._
    import org.apache.spark.sql.Row
    val d = tmp("evo_feed_store")
    val chk1 = tmp("evo_feed_chk1")
    sink(d, "/chk/f0").addBatch(0, Seq((1, "a")).toDF("id", "v"))
    val buf = scala.collection.mutable.ArrayBuffer[(Seq[String], Seq[Row])]()
    val q = spark.readStream.format("graftstore").option("path", d)
      .load()
      .writeStream
      .foreachBatch { (df: DataFrame, _: java.lang.Long) =>
        val rs = df.collect().toSeq
        if (rs.nonEmpty)
          buf.synchronized { buf += ((df.columns.toSeq, rs)) }
        ()
      }
      .option("checkpointLocation", chk1)
      .start()
    try {
      q.processAllAvailable() // bootstrap at the PRE-evolution schema
      // the store evolves UNDER the running query
      sink(d, "/chk/f1", "mergeSchema" -> "true")
        .addBatch(0, Seq((2, "b", 9L)).toDF("id", "v", "w"))
      // the diff batch serves the query's pinned column set — the
      // evolved bucket file is read under the OLD schema, no error
      q.processAllAvailable()
    } finally q.stop()
    val batches = buf.synchronized(buf.toList)
    assert(batches.size == 2, s"got ${batches.size} non-empty batches")
    assert(batches.forall(_._1 == Seq("id", "v", "change")),
      batches.map(_._1).toString)
    assert(batches(1)._2.map(_.toSeq.toList).toSet ==
      Set(List(2, "b", "+")))
    // a FRESH feed bootstraps at the evolved schema, w included
    val out2 = tmp("evo_feed_out2"); val chk2 = tmp("evo_feed_chk2")
    val q2 = spark.readStream.format("graftstore").option("path", d)
      .load()
      .writeStream.format("parquet").option("path", out2)
      .option("checkpointLocation", chk2)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val got2 = spark.read.parquet(out2)
    assert(got2.columns.toSeq == Seq("id", "v", "w", "change"))
    assert(rows(got2.select("id", "v", "w")) ==
      Set[Seq[Any]](Seq(1, "a", null), Seq(2, "b", 9L)))
    // raw version diff across the evolution under one (current) schema
    val diff = EventStreams.cdcDiffVersions(spark, d, 1, 2)
    assert(rows(diff.where(col("change") === "+")
      .select("id", "v", "w")) == Set[Seq[Any]](Seq(2, "b", 9L)))
  }

  test("evolution keeps pruning machinery intact: zone-map ordinals " +
      "stay valid, new-column predicates keep old buckets " +
      "(don't-know), key pruning unaffected") {
    import spark.implicits._
    val d = tmp("evo_zones")
    val s0 = sink(d, "/chk/z0", "zoneMaps" -> "true", "buckets" -> "4")
    s0.addBatch(0, (0 until 40).map(i => (i, i.toLong)).toDF("id", "v"))
    val s1 = sink(d, "/chk/z1", "zoneMaps" -> "true",
      "mergeSchema" -> "true")
    s1.addBatch(0, Seq((7, 7L, 70L)).toDF("id", "v", "w"))
    def scanFiles(df: DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.head.metrics("numFiles").value
    }
    val rd = readBack(d)
    val total = scanFiles(rd)
    // v-stats written pre-evolution still prune at their ordinals
    assert(scanFiles(rd.where(col("v") > 1000000L)) == 0L)
    // a predicate on the NEW column: the one re-statted bucket is
    // testable, pre-evolution buckets have no 'w' stats → kept
    val wq = rd.where(col("w") === 70L)
    assert(scanFiles(wq) >= 1L)
    assert(rows(wq.select("id")) == Set[Seq[Any]](Seq(7)))
    // and values round-trip exactly
    assert(rows(rd.where(col("id") === 7).select("id", "v", "w")) ==
      Set[Seq[Any]](Seq(7, 7L, 70L)))
  }

  test("vacuum sweeps a crash-orphaned evolution temp; history and " +
      "replay survive evolution") {
    import spark.implicits._
    val d = tmp("evo_vac")
    val s0 = sink(d, "/chk/v0")
    s0.addBatch(0, Seq((1, "a")).toDF("id", "v"))
    val s1 = sink(d, "/chk/v1", "mergeSchema" -> "true")
    s1.addBatch(0, Seq((2, "b", 5L)).toDF("id", "v", "w"))
    // fake a crash-orphaned temp, aged past the hour gate
    val (fs, _) = EventStreams.hadoopFs(spark, d)
    val orphan = new org.apache.hadoop.fs.Path(
      s"$d/_empty_e9__tmp-deadbeef")
    fs.mkdirs(orphan)
    fs.setTimes(orphan, System.currentTimeMillis() - 7200 * 1000L, -1)
    GraftStoreSink.vacuum(spark, d)
    assert(!fs.exists(orphan))
    // the store still serves, and a replay of the committed batch is
    // a no-op at the evolved schema
    val v = EventStreams.manifestVersions(spark, d).max
    s1.addBatch(0, Seq((2, "b", 5L)).toDF("id", "v", "w"))
    assert(EventStreams.manifestVersions(spark, d).max == v)
    assert(rows(readBack(d)) ==
      Set[Seq[Any]](Seq(1, "a", null), Seq(2, "b", 5L)))
    // the footer itself is never vacuumed
    assert(EventStreams.storeSchema(spark, d).fieldNames.toSeq ==
      Seq("id", "v", "w"))
  }

  test("GraphStore tables are unaffected: applyTable's schema guard " +
      "still refuses drift with the rebuild remedy") {
    val Seq(r1, r2, _) = LoadFixtures.policyMatrix(spark)
    val d = tmp("evo_graph")
    graft.graph.GraphStore.init(spark, d,
      graft.graph.GraphLoad.loadAll(spark, Seq(r1)), buckets = 4)
    // normal apply still green after all the schema plumbing moved
    graft.graph.GraphStore.applyRelease(spark, d, r2)
    assert(graft.graph.GraphStore.read(spark, d).sequence.count() > 0)
  }
}
