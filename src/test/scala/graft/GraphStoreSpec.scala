package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.graph.{GraphLoad, GraphStore}

class GraphStoreSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("store fold == loadAll refold on the policy matrix; vacuum-safe") {
    val Seq(r1, r2, r3) = LoadFixtures.policyMatrix(spark)
    val dir = tmp("graphstore_fold")
    GraphStore.init(spark, dir, GraphLoad.loadAll(spark, Seq(r1)),
      buckets = 4)
    GraphStore.applyRelease(spark, dir, r2)
    GraphStore.applyRelease(spark, dir, r3)
    val refold = GraphLoad.loadAll(spark, Seq(r1, r2, r3))
    LoadFixtures.assertSameGraph(refold, GraphStore.read(spark, dir),
      "bucketed store fold")
    // vacuum keeps the newest versions readable and drops superseded
    // files; the state must be byte-identical before/after
    val before = LoadFixtures.rowsOf(GraphStore.read(spark, dir).sequence)
    val (buckets, manifests) = GraphStore.vacuum(spark, dir, keepVersions = 1)
    assert(manifests > 0, "3 applies must supersede some manifests")
    assert(LoadFixtures.rowsOf(GraphStore.read(spark, dir).sequence) == before)
    assert(buckets >= 0)
  }

  test("apply I/O is O(dirty buckets): a 1-key release dirties ≤1 " +
      "bucket per table") {
    val Seq(r1, _, r3) = LoadFixtures.policyMatrix(spark)
    val dir = tmp("graphstore_dirty")
    GraphStore.init(spark, dir, GraphLoad.loadAll(spark, Seq(r1)),
      buckets = 16)
    // r3 is a single brand-new allele: one key per table → each
    // table's apply reads and rewrites at most 1 of its 16 buckets
    // (HAS_IPD_ALLELE etc. have exactly one delta key each)
    val stats = GraphStore.applyRelease(spark, dir, r3)
    stats.dirtyBuckets.foreach { case (t, n) =>
      assert(n <= 1, s"$t dirtied $n buckets for a 1-allele release")
    }
    // 10 graph tables + SEQ_INDEX (Submitter is static, never applied)
    assert(stats.dirtyBuckets.size == 11, "all 11 applied stores reported")
  }

  test("store applyRelease rejects seq_id/name bijection violations loudly") {
    // Same guard as GraphLoad.applyRelease, O(dirty-bucket) probes:
    // a violating release must fail BEFORE any table commits.
    val Seq(r1, _, _) = LoadFixtures.policyMatrix(spark)
    val dir = tmp("graphstore_guard")
    GraphStore.init(spark, dir, GraphLoad.loadAll(spark, Seq(r1)))
    val crossName = ("3580", LoadFixtures.seqsDf(spark, "3.58.0", Seq(
      ("Z", "AC9", "HLA-A*09:01", "s1", "ACGT", 4L))),
      LoadFixtures.featsDf(spark, Seq(("Z", "EXON", 1, "9", "AC"))),
      LoadFixtures.groupsDf(spark, Seq.empty))
    val e1 = intercept[IllegalArgumentException] {
      GraphStore.applyRelease(spark, dir, crossName)
    }
    assert(e1.getMessage.contains("new GFE name"), e1.getMessage)
    val reId = ("3580", LoadFixtures.seqsDf(spark, "3.58.0", Seq(
      ("A", "AC1", "HLA-A*01:01", "s9", "AAAA", 4L))),
      LoadFixtures.featsDf(spark, Seq(("A", "EXON", 1, "1", "AC"))),
      LoadFixtures.groupsDf(spark, Seq.empty))
    val e2 = intercept[IllegalArgumentException] {
      GraphStore.applyRelease(spark, dir, reId)
    }
    assert(e2.getMessage.contains("changed its sequence"), e2.getMessage)
    // the guard fired before any commit: every table still at v0
    val root = java.nio.file.Paths.get(dir)
    java.nio.file.Files.list(root).forEach { t =>
      val m = t.resolve("manifest")
      if (java.nio.file.Files.isDirectory(m)) {
        val vs = java.nio.file.Files.list(m).toArray.map(_.toString).toSeq
          .filterNot(_.split('/').last.startsWith(".")) // hadoop .crc
        assert(vs.forall(_.endsWith("/v0")),
          s"${t.getFileName}: rejected release must not commit " +
            s"(${vs.mkString(", ")})")
      }
    }
  }

  test("concurrent applier loses loudly; half-applied release stays " +
      "invisible to read(); a retry converges") {
    val Seq(r1, r2, r3) = LoadFixtures.policyMatrix(spark)
    val dir = tmp("graphstore_race")
    val g1 = GraphLoad.loadAll(spark, Seq(r1))
    GraphStore.init(spark, dir, g1, buckets = 4)
    val preRace = LoadFixtures.rowsOf(GraphStore.read(spark, dir).sequence)
    // Simulate a concurrent applier that claimed GFE v1 first (the
    // race's first commit point: both appliers read base v0, both try
    // to publish v1). Applier B must fail loudly at the claim, BEFORE
    // writing anything into the version's bucket directory.
    val claim = java.nio.file.Paths.get(dir, "GFE", "manifest", ".claim_v1")
    java.nio.file.Files.createFile(claim)
    val e = intercept[java.util.ConcurrentModificationException] {
      GraphStore.applyRelease(spark, dir, r2)
    }
    assert(e.getMessage.contains("concurrent applier") &&
      e.getMessage.contains("claimed"), e.getMessage)
    // GFE never committed v1; its bucket dir for v1 must not exist
    // (the claim blocked the loser before any bucket write)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "GFE", "v1")),
      "loser must not write bucket files for a claimed version")
    // SIBLING tables did commit v1 (futures run independently), but
    // the release marker never landed: read() still serves r1 exactly
    assert(LoadFixtures.rowsOf(GraphStore.read(spark, dir).sequence)
      == preRace, "half-applied release must be invisible to read()")
    LoadFixtures.assertSameGraph(g1, GraphStore.read(spark, dir),
      "pre-race state served during half-applied release")
    // Operator remedy named in the error: clear the stale claim, retry
    assert(e.getMessage.contains(claim.toString), e.getMessage)
    java.nio.file.Files.delete(claim)
    GraphStore.applyRelease(spark, dir, r2) // retry: idempotent merge
    LoadFixtures.assertSameGraph(GraphLoad.loadAll(spark, Seq(r1, r2)),
      GraphStore.read(spark, dir), "retry after lost race converges")
    GraphStore.applyRelease(spark, dir, r3)
    LoadFixtures.assertSameGraph(GraphLoad.loadAll(spark, Seq(r1, r2, r3)),
      GraphStore.read(spark, dir), "full fold after race + retries")
  }

  test("two genuinely concurrent appliers: each either commits or " +
      "fails loudly; serial retries converge to the refold") {
    // The race's correctness claim needs COMMUTING releases: r2's
    // groups-before-seqs no-op row (HLA-B*07:02) is order-SENSITIVE —
    // if the r3 applier creates the allele first, the row becomes a
    // legitimate MATCH and applies — so it is excluded here; the
    // remaining r2/r3 keys are disjoint and the refold is
    // order-insensitive: whatever interleaving the race produces,
    // retrying both serially must land on refold(r1, r2x, r3).
    val Seq(r1, r2full, r3) = LoadFixtures.policyMatrix(spark)
    val r2 = (r2full._1, r2full._2, r2full._3,
      r2full._4.where(col("hla_name") =!= "HLA-B*07:02"))
    val dir = tmp("graphstore_race2")
    GraphStore.init(spark, dir, GraphLoad.loadAll(spark, Seq(r1)),
      buckets = 4)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    def race(rel: (String, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)) =
      Future {
        try { GraphStore.applyRelease(spark, dir, rel); None }
        catch {
          case e: java.util.ConcurrentModificationException => Some(e)
        }
      }
    val outcomes = Seq(race(r2), race(r3))
      .map(Await.result(_, Duration.Inf))
    // every loss is LOUD (captured above, never silent); retries
    // converge because policies are idempotent and deltas re-derive
    Seq(r2, r3).foreach { rel =>
      try GraphStore.applyRelease(spark, dir, rel)
      catch { // a same-millisecond marker race can need one more pass
        case _: java.util.ConcurrentModificationException =>
          GraphStore.applyRelease(spark, dir, rel)
      }
    }
    LoadFixtures.assertSameGraph(GraphLoad.loadAll(spark, Seq(r1, r2, r3)),
      GraphStore.read(spark, dir),
      s"race outcomes=${outcomes.map(_.map(_.getMessage).getOrElse("ok"))}")
  }

  test("probe: bucket-pruned point read touches ONLY hit buckets") {
    import spark.implicits._
    val Seq(r1, r2, _) = LoadFixtures.policyMatrix(spark)
    val dir = tmp("graphstore_probe")
    GraphStore.init(spark, dir, GraphLoad.loadAll(spark, Seq(r1)),
      buckets = 16)
    GraphStore.applyRelease(spark, dir, r2)
    val anchors = Seq("A").toDF("name")
    val out = GraphStore.probe(spark, dir, "Sequence", anchors, Seq("name"))
    val rows = out.collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("length") == 5L,
      "probe serves the marker-pinned merged row")
    // plan shape: every scanned bucket file belongs to the anchor's
    // hash bucket — the index-probe I/O contract at 100 TB
    val b = anchors
      .select(graft.streaming.EventStreams.bucketCol(Seq("name"), 16))
      .collect().head.getInt(0)
    val scanned = out.inputFiles.filter(_.contains("_graft_bucket="))
    assert(scanned.nonEmpty &&
      scanned.forall(_.contains(s"_graft_bucket=$b")),
      s"probe must scan only bucket $b: ${scanned.mkString(", ")}")
  }

  test("store fold == refold on the two-release IMGT fixture") {
    import graft.ingest.ImgtFlatFile
    import graft.gfe.{ArdReduction, GfeBuild}
    def ardOf(rel: String) = ArdReduction.fromNames(
      ImgtFlatFile.fromText(spark,
        ImgtFlatFile.resourceText(s"/graft/hla.$rel.dat"))
        .toDF().select(split(col("description"), ",")
          .getItem(0).as("hla_name")))
    val r1 = GfeBuild.run(spark, ImgtFlatFile.fromText(spark,
      ImgtFlatFile.resourceText("/graft/hla.3560.dat")), "3560",
      ard = Some(ardOf("3560")))
    val r2 = GfeBuild.run(spark, ImgtFlatFile.fromText(spark,
      ImgtFlatFile.resourceText("/graft/hla.3570.dat")), "3570",
      registry = Some(r1.registry), ard = Some(ardOf("3570")))
    val rel1 = ("3560", r1.gfeSequences, r1.allFeatures, r1.allGroups)
    val rel2 = ("3570", r2.gfeSequences, r2.allFeatures, r2.allGroups)
    val dir = tmp("graphstore_imgt")
    GraphStore.init(spark, dir, GraphLoad.loadAll(spark, Seq(rel1)))
    GraphStore.applyRelease(spark, dir, rel2)
    LoadFixtures.assertSameGraph(
      GraphLoad.loadAll(spark, Seq(rel1, rel2)),
      GraphStore.read(spark, dir), "IMGT fixture store fold")
  }
}
