package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

import graft.graph.{GraphLoad, GraphStore}
import graft.sources.GraftStoreSink
import graft.streaming.EventStreams

/** The `graftstore` STREAMING SINK: every micro-batch commits one
  * store version through the claim-arbitrated manifest protocol,
  * rewriting only dirty buckets; the cdc policy folds a change feed
  * into an exact replica of its source table; replay is exactly-once
  * and the crash-window re-apply converges (policies idempotent). */
class GraftStoreSinkSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  /** One AvailableNow pass: file-source batches (one file per batch)
    * through the graftstore sink. */
  private def runSink(inDir: String, schema: StructType, chk: String,
      sinkOpts: Map[String, String]): Unit = {
    val q = sinkOpts.foldLeft(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir)
          .writeStream.format("graftstore")) {
        case (w, (k, v)) => w.option(k, v) }
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def addFile(inDir: String, df: DataFrame): Unit =
    df.coalesce(1).write.mode("append").parquet(inDir)

  private def stateRows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case w: scala.collection.Seq[_] => w.toList; case w => w
    }.toList: Seq[Any]).toSet

  private def latestVersion(dir: String): Int =
    EventStreams.manifestVersions(spark, dir).max

  private def rewrittenBuckets(dir: String): Int = {
    val v = latestVersion(dir)
    EventStreams.readManifest(spark, s"$dir/manifest/v$v")
      .values.count(_ == v)
  }

  test("upsert: keyed replace across batches, O(dirty) rewrites, " +
      "exactly-once replay, batch-source readable with persisted keys") {
    import spark.implicits._
    val in = tmp("sink_in"); val store = tmp("sink_store")
    val chk = tmp("sink_chk")
    val schema = Seq((1, "a")).toDF("id", "v").schema
    val opts = Map("path" -> store, "keys" -> "id", "policy" -> "upsert",
      "buckets" -> "8")

    addFile(in, Seq((1, "a"), (2, "b")).toDF("id", "v"))
    runSink(in, schema, chk, opts)
    assert(stateRows(EventStreams.cdcState(spark, store)) ==
      Set(Seq(1, "a"), Seq(2, "b")))
    assert(EventStreams.readManifest(spark, s"$store/manifest/v0")
      .size == 8, "creation honors the buckets option")

    addFile(in, Seq((2, "B"), (3, "c")).toDF("id", "v"))
    runSink(in, schema, chk, opts)
    assert(stateRows(EventStreams.cdcState(spark, store)) ==
      Set(Seq(1, "a"), Seq(2, "B"), Seq(3, "c")))
    // the second batch touched keys {2, 3} → at most 2 of 8 buckets
    // carry the new version (O(dirty), not O(state))
    assert(rewrittenBuckets(store) <= 2,
      s"batch 2 rewrote ${rewrittenBuckets(store)} buckets")

    // exactly-once: an empty pass (no new file) commits nothing
    val v = latestVersion(store)
    runSink(in, schema, chk, opts)
    assert(latestVersion(store) == v)

    // the sink-created store persists its keys (two-line meta): the
    // batch source cross-checks them — right keys read, wrong keys
    // fail naming the persisted anchor
    val back = spark.read.format("graftstore")
      .option("path", store).option("keys", "id").load()
      .drop("_graft_bucket")
    assert(stateRows(back) == stateRows(EventStreams.cdcState(spark, store)))
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graftstore")
        .option("path", store).option("keys", "v").load()
    }
    assert(e.getMessage.contains("persisted table meta"))
    // ...and a later sink query may omit keys entirely
    addFile(in, Seq((4, "d")).toDF("id", "v"))
    runSink(in, schema, chk, opts - "keys")
    assert(stateRows(EventStreams.cdcState(spark, store))
      .contains(Seq(4, "d")))
  }

  test("createOnly: existing keys win, new keys append") {
    import spark.implicits._
    val in = tmp("sinkco_in"); val store = tmp("sinkco_store")
    val chk = tmp("sinkco_chk")
    val schema = Seq((1, "a")).toDF("id", "v").schema
    val opts = Map("path" -> store, "keys" -> "id",
      "policy" -> "createOnly")
    addFile(in, Seq((1, "a"), (2, "b")).toDF("id", "v"))
    runSink(in, schema, chk, opts)
    addFile(in, Seq((2, "B"), (3, "c")).toDF("id", "v"))
    runSink(in, schema, chk, opts)
    assert(stateRows(EventStreams.cdcState(spark, store)) ==
      Set(Seq(1, "a"), Seq(2, "b"), Seq(3, "c")))
  }

  test("cdc replication: readStream(change feed) → writeStream(sink) " +
      "reproduces the source table release after release") {
    val Seq(r1, r2, r3) = LoadFixtures.policyMatrix(spark)
    val src = tmp("repl_src"); val dst = tmp("repl_dst")
    val chk = tmp("repl_chk")
    GraphStore.init(spark, src, GraphLoad.loadAll(spark, Seq(r1)),
      buckets = 4)
    def pass(): Unit = {
      val q = spark.readStream.format("graftstore")
        .option("dir", src).option("table", "HAS_IPD_ALLELE").load()
        .writeStream.format("graftstore")
        .option("path", dst).option("keys", "src,dst")
        .option("policy", "cdc")
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def sourceRows() =
      stateRows(GraphStore.read(spark, src).hasIpdAllele)
    pass() // bootstrap: the m0 snapshot, all '+'
    assert(stateRows(EventStreams.cdcState(spark, dst)) == sourceRows())
    GraphStore.applyRelease(spark, src, r2)
    pass() // one release = one change batch, folded by the sink
    assert(stateRows(EventStreams.cdcState(spark, dst)) == sourceRows())
    GraphStore.applyRelease(spark, src, r3)
    pass()
    assert(stateRows(EventStreams.cdcState(spark, dst)) == sourceRows())
    // the replica is itself a graftstore-readable store with keys
    val back = spark.read.format("graftstore")
      .option("path", dst).load().drop("_graft_bucket")
    assert(stateRows(back) == sourceRows())
  }

  test("crash-window re-apply converges: a deleted commit record " +
      "re-applies the batch idempotently; own claim is re-entrant; " +
      "a foreign claim fails loudly") {
    import spark.implicits._
    val store = tmp("sinkcr_store")
    val sink = new GraftStoreSink(spark,
      Map("path" -> store, "keys" -> "id", "policy" -> "upsert"),
      OutputMode.Append())
    val b0 = Seq((1, "a"), (2, "b")).toDF("id", "v")
    sink.addBatch(0, b0)
    val expect = Set[Seq[Any]](Seq(1, "a"), Seq(2, "b"))
    assert(stateRows(EventStreams.cdcState(spark, store)) == expect)
    // committed batch replays as a no-op (the commit record)
    val v1 = latestVersion(store)
    sink.addBatch(0, b0)
    assert(latestVersion(store) == v1)
    // crash window: record lost AFTER the manifest committed → the
    // retry re-applies on top; upsert is idempotent, state unchanged
    val (fs, rec) = EventStreams.hadoopFs(spark, s"$store/_sink_commits/b0")
    fs.delete(rec, false)
    sink.addBatch(0, b0)
    assert(latestVersion(store) == v1 + 1)
    assert(stateRows(EventStreams.cdcState(spark, store)) == expect)
    // crash window: our own claim placed, nothing committed → the
    // retry recognizes the claim body (batch id + checkpoint scope)
    // and resumes through it
    val v = latestVersion(store)
    EventStreams.writeSmallFile(spark,
      s"$store/manifest/.claim_v${v + 1}", "sink b1 -\n")
    sink.addBatch(1, Seq((3, "c")).toDF("id", "v"))
    assert(stateRows(EventStreams.cdcState(spark, store))
      .contains(Seq(3, "c")))
    // a FOREIGN claim (another writer) stays a loud exclusion
    val v2 = latestVersion(store)
    EventStreams.writeSmallFile(spark,
      s"$store/manifest/.claim_v${v2 + 1}", "")
    val e = intercept[java.util.ConcurrentModificationException] {
      sink.addBatch(2, Seq((4, "d")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("single-writer"))
    EventStreams.hadoopFs(spark,
      s"$store/manifest/.claim_v${v2 + 1}") match {
      case (fs, p) => fs.delete(p, false)
    }
    // ...and so does ANOTHER QUERY's claim at the SAME batch id (a
    // different checkpoint scope is not "our own crashed attempt")
    val v3 = latestVersion(store)
    EventStreams.writeSmallFile(spark,
      s"$store/manifest/.claim_v${v3 + 1}", "sink b2 /elsewhere/chk\n")
    val e2 = intercept[java.util.ConcurrentModificationException] {
      sink.addBatch(2, Seq((4, "d")).toDF("id", "v"))
    }
    assert(e2.getMessage.contains("single-writer"))
  }

  test("serial query handoff: a new query's batch ids colliding with " +
      "a predecessor's commit records are APPLIED, not skipped") {
    import spark.implicits._
    val store = tmp("sinkho_store")
    val sinkA = new GraftStoreSink(spark,
      Map("path" -> store, "keys" -> "id", "policy" -> "upsert",
        "checkpointLocation" -> "/chk/A"),
      OutputMode.Append())
    sinkA.addBatch(0, Seq((1, "a")).toDF("id", "v"))
    // a NEW query (fresh checkpoint) takes over the store; its batch
    // ids restart at 0 — its first batch must land, not silently
    // no-op against A's record
    val sinkB = new GraftStoreSink(spark,
      Map("path" -> store, "keys" -> "id", "policy" -> "upsert",
        "checkpointLocation" -> "/chk/B"),
      OutputMode.Append())
    sinkB.addBatch(0, Seq((2, "b")).toDF("id", "v"))
    assert(stateRows(EventStreams.cdcState(spark, store)) ==
      Set[Seq[Any]](Seq(1, "a"), Seq(2, "b")))
    // ...while B's OWN replay of the batch stays a no-op
    val v = latestVersion(store)
    sinkB.addBatch(0, Seq((2, "b")).toDF("id", "v"))
    assert(latestVersion(store) == v)
  }

  test("cdc re-apply is idempotent (set semantics)") {
    import spark.implicits._
    val store = tmp("sinkcdc_store")
    val sink = new GraftStoreSink(spark,
      Map("path" -> store, "keys" -> "id", "policy" -> "cdc"),
      OutputMode.Append())
    val b0 = Seq(("+", 1, "a"), ("+", 2, "b")).toDF("change", "id", "v")
    sink.addBatch(0, b0)
    val b1 = Seq(("-", 1, "a"), ("+", 1, "A")).toDF("change", "id", "v")
    sink.addBatch(1, b1)
    val expect = Set[Seq[Any]](Seq(1, "A"), Seq(2, "b"))
    assert(stateRows(EventStreams.cdcState(spark, store)) == expect)
    // lost record → double-apply of the same diff is a no-op fold
    val (fs, rec) = EventStreams.hadoopFs(spark, s"$store/_sink_commits/b1")
    fs.delete(rec, false)
    sink.addBatch(1, b1)
    assert(stateRows(EventStreams.cdcState(spark, store)) == expect)
  }

  test("keyBlooms option: the sink-maintained store miss-gates its " +
      "SQL reads (absent IN-list plans zero files)") {
    import spark.implicits._
    val store = tmp("sinkbloom_store")
    val sink = new GraftStoreSink(spark,
      Map("path" -> store, "keys" -> "id", "policy" -> "upsert",
        "keyBlooms" -> "true", "buckets" -> "8"),
      OutputMode.Append())
    sink.addBatch(0, Seq((1, "a"), (2, "b")).toDF("id", "v"))
    sink.addBatch(1, Seq((3, "c")).toDF("id", "v"))
    val absent = (100 to 119).toSeq
    val miss = spark.read.format("graftstore")
      .option("path", store).option("keys", "id").load()
      .where(col("id").isin(absent.map(Integer.valueOf): _*))
    assert(miss.collect().isEmpty)
    val scanned = miss.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value }
    assert(scanned.nonEmpty && scanned.head == 0L,
      s"absent-literal scan opened $scanned files")
    // present keys (incl. batch 1's — sidecars maintained per batch)
    // still served exactly
    val hit = spark.read.format("graftstore")
      .option("path", store).option("keys", "id").load()
      .where(col("id").isin(Integer.valueOf(3), Integer.valueOf(100)))
    assert(stateRows(hit.drop("_graft_bucket")) == Set(Seq(3, "c")))
  }

  test("sink vacuum: claims below the surviving window GC'd unless " +
      "live-referenced, commit records trimmed to the newest, the " +
      "store keeps serving and replay stays a no-op") {
    import spark.implicits._
    val store = tmp("sinkvac_store")
    val sink = new GraftStoreSink(spark,
      Map("path" -> store, "keys" -> "id", "policy" -> "upsert",
        "buckets" -> "4"),
      OutputMode.Append())
    (0 to 3).foreach(i =>
      sink.addBatch(i.toLong, Seq((i, s"v$i")).toDF("id", "v")))
    val expect = (0 to 3).map(i => Seq(i, s"v$i"): Seq[Any]).toSet
    assert(stateRows(EventStreams.cdcState(spark, store)) == expect)

    val (claims, records) = GraftStoreSink.vacuum(spark, store,
      keepVersions = 1, keepRecords = 2)
    assert(records == 2, s"trimmed $records records")
    // records b2/b3 survive, b0/b1 gone
    val (rfs, rdir) = EventStreams.hadoopFs(spark, s"$store/_sink_commits")
    val kept = rfs.listStatus(rdir).map(_.getPath.getName).toSet
    assert(kept == Set("b2", "b3"), kept.toString)
    // every surviving claim is either >= the floor or referenced by a
    // surviving manifest (bucket inheritance keeps those)
    val survived = EventStreams.manifestVersions(spark, store)
    val live = survived.toSet[Int].flatMap(v =>
      EventStreams.readManifest(spark, s"$store/manifest/v$v")
        .values.filter(_ >= 0))
    val (mfs, mdir) = EventStreams.hadoopFs(spark, s"$store/manifest")
    val keptClaims = mfs.listStatus(mdir).map(_.getPath.getName)
      .filter(_.startsWith(".claim_v"))
      .map(_.stripPrefix(".claim_v").toInt).toSeq
    assert(keptClaims.forall(v => v >= survived.min || live(v)),
      s"claims kept: $keptClaims, floor ${survived.min}, live $live")
    assert(claims + keptClaims.size == 4, "every batch claimed once")

    // the store still serves, the kept record still no-ops a replay,
    // and the sink continues past the vacuum
    assert(stateRows(EventStreams.cdcState(spark, store)) == expect)
    val v = EventStreams.manifestVersions(spark, store).max
    sink.addBatch(3, Seq((3, "v3")).toDF("id", "v")) // replay → no-op
    assert(EventStreams.manifestVersions(spark, store).max == v)
    sink.addBatch(4, Seq((4, "v4")).toDF("id", "v"))
    assert(stateRows(EventStreams.cdcState(spark, store))
      .contains(Seq(4, "v4")))
  }

  test("loud failures: option and schema misuse fail naming the remedy") {
    import spark.implicits._
    val df = Seq((1, "a")).toDF("id", "v")
    def sink(opts: Map[String, String],
        mode: OutputMode = OutputMode.Append()) =
      new GraftStoreSink(spark, opts, mode)

    // graph layout refused
    assert(intercept[IllegalArgumentException] {
      sink(Map("dir" -> "/x", "table" -> "GFE", "path" -> "/x"))
    }.getMessage.contains("applyRelease"))
    // unknown policy
    assert(intercept[RuntimeException] {
      sink(Map("path" -> "/x", "policy" -> "merge"))
    }.getMessage.contains("unknown policy"))
    // Complete mode refused
    assert(intercept[IllegalArgumentException] {
      sink(Map("path" -> "/x"), OutputMode.Complete())
    }.getMessage.contains("Complete"))
    // creating without keys
    assert(intercept[IllegalArgumentException] {
      sink(Map("path" -> tmp("sinkf1"))).addBatch(0, df)
    }.getMessage.contains("keys"))
    // cdc without a change column
    assert(intercept[IllegalArgumentException] {
      sink(Map("path" -> tmp("sinkf2"), "keys" -> "id",
        "policy" -> "cdc")).addBatch(0, df)
    }.getMessage.contains("change"))
    // a change column under a non-cdc policy
    assert(intercept[IllegalArgumentException] {
      sink(Map("path" -> tmp("sinkf3"), "keys" -> "id"))
        .addBatch(0, df.withColumn("change", lit("+")))
    }.getMessage.contains("policy=cdc"))
    // key not a column
    assert(intercept[IllegalArgumentException] {
      sink(Map("path" -> tmp("sinkf4"), "keys" -> "nope"))
        .addBatch(0, df)
    }.getMessage.contains("not a column"))
    // wrong keys vs the persisted meta
    val store = tmp("sinkf5")
    sink(Map("path" -> store, "keys" -> "id")).addBatch(0, df)
    assert(intercept[IllegalArgumentException] {
      sink(Map("path" -> store, "keys" -> "v")).addBatch(1, df)
    }.getMessage.contains("persisted meta"))
    // schema drift against the persisted schema
    assert(intercept[IllegalArgumentException] {
      sink(Map("path" -> store))
        .addBatch(1, Seq((1, 2L)).toDF("id", "n"))
    }.getMessage.contains("persisted schema"))
  }
}
