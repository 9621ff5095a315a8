package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.watch.ReleaseWatch
import graft.graph.{GraphLoad, GraphStore}
import graft.ingest.ImgtFlatFile
import graft.gfe.{ArdReduction, GfeBuild}

/** The reference's WHOLE pipeline as one standing Spark program —
  * the composition every piece of which is tested alone: the poll
  * detects a new release (invoke_pipeline/app.py:245-285), the build
  * plane turns its flat file into relations
  * (pipeline.asl.json's build stage), and the load plane MERGEs them
  * into the standing store one release at a time
  * (load.cyp:7,93-95; asl.json:153 MaxConcurrency 1), after which
  * serving reads — full, probe, anchored traversal — answer from the
  * updated graph. A user of the reference runs exactly this loop on
  * a schedule; here it is a pure driver routine over the same
  * fixtures the oracled queries use.
  */
class PipelineEndToEndSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def buildRelease(rel: String,
      reg: Option[DataFrame]): GfeBuild.BuildResult = {
    val recs = ImgtFlatFile.fromText(spark,
      ImgtFlatFile.resourceText(s"/graft/hla.$rel.dat"))
    val ard = ArdReduction.fromNames(recs.toDF()
      .select(split(col("description"), ",").getItem(0).as("hla_name")))
    GfeBuild.run(spark, recs, rel, registry = reg, ard = Some(ard))
  }

  test("poll -> build -> MERGE -> serve: two release cycles end-to-end " +
      "equal the refold, and the watch state never re-triggers") {
    val stateDir = java.nio.file.Files
      .createTempDirectory("pipeline_watch_state").toString + "/state"
    val storeDir = java.nio.file.Files
      .createTempDirectory("pipeline_store").toString

    // ---- cycle 1: first poll sees 3560 only ----
    ReleaseWatch.writeState(spark,
      ReleaseWatch.WatchState("t0", Seq.empty), stateDir)
    val s0 = ReleaseWatch.readState(spark, stateDir)
    val (inputs1, s1) = ReleaseWatch.poll(spark,
      branchNames = Seq("3560", "Latest"), state = s0)
    assert(inputs1.map(_("RELEASES")) == Seq("3560"))
    val r1 = buildRelease("3560", reg = None)
    GraphStore.init(spark, storeDir, GraphLoad.loadAll(spark,
      Seq(("3560", r1.gfeSequences, r1.allFeatures, r1.allGroups))),
      buckets = 8, dualAnchor = true)
    ReleaseWatch.writeState(spark, s1.copy(timestamp = "t1"), stateDir)

    // ---- cycle 2: 3570 appears; the registry carries forward ----
    val s1r = ReleaseWatch.readState(spark, stateDir)
    assert(s1r.releases == Seq("3560"))
    val (inputs2, s2) = ReleaseWatch.poll(spark,
      branchNames = Seq("3560", "3570", "Latest"), state = s1r)
    assert(inputs2.map(_("RELEASES")) == Seq("3570"))
    val r2 = buildRelease("3570", reg = Some(r1.registry))
    inputs2.foreach { in =>
      assert(in("RELEASES") == "3570")
      GraphStore.applyRelease(spark, storeDir,
        ("3570", r2.gfeSequences, r2.allFeatures, r2.allGroups))
    }
    ReleaseWatch.writeState(spark, s2.copy(timestamp = "t2"), stateDir)

    // ---- serve: the standing store equals the two-release refold ----
    val refold = GraphLoad.loadAll(spark, Seq(
      ("3560", r1.gfeSequences, r1.allFeatures, r1.allGroups),
      ("3570", r2.gfeSequences, r2.allFeatures, r2.allGroups)))
    LoadFixtures.assertSameGraph(refold, GraphStore.read(spark, storeDir),
      "pipeline end-to-end")
    // an anchored serving read on the updated store sees release-2
    // data (the hot allele's Sequence row, served by bucket probe)
    import spark.implicits._
    val anchor = refold.gfe.select("name").orderBy("name").limit(1)
      .collect().head.getString(0)
    val probed = GraphStore.probe(spark, storeDir, "GFE",
      Seq(anchor).toDF("name"), Seq("name"))
    assert(probed.count() == 1)

    // ---- cycle 3: nothing new — the poll must emit no work ----
    val s2r = ReleaseWatch.readState(spark, stateDir)
    val (inputs3, s3) = ReleaseWatch.poll(spark,
      branchNames = Seq("3560", "3570", "Latest"), state = s2r)
    assert(inputs3.isEmpty && s3.releases == s2r.releases,
      "an unchanged branch list must never re-trigger a build")
  }
}
