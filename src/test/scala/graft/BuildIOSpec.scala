package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.gfe.{BuildIO, GfeBuild}
import graft.ingest.ImgtFlatFile

class BuildIOSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  lazy val result: GfeBuild.BuildResult = GfeBuild.run(spark,
    ImgtFlatFile.fromText(spark,
      ImgtFlatFile.resourceText("/graft/hla.3560.dat")), "3560")

  test("validation report: headers, non-empty, error budget (S9/A6/A7/O2)") {
    val report = BuildIO.validate(result, "3560")
    assert(report.isValidBuild)
    assert(report.checks.length == 4) // no alignments requested
    assert(report.errorCount == 1) // the CDS-less allele
    assert(report.exitCode == 2) // partial: 0 < errors <= 10
  }

  test("all_alignments relation validates with the declared header (S2/J1)") {
    import graft.ingest.MsfAlignments
    val rel = MsfAlignments.toRelation(spark, Map(
      ("HLA-A", "gen") -> ImgtFlatFile.resourceText("/graft/A_gen.msf"),
      ("HLA-A", "prot") -> ImgtFlatFile.resourceText("/graft/A_prot.msf")))
    val withAl = GfeBuild.run(spark,
      ImgtFlatFile.fromText(spark,
        ImgtFlatFile.resourceText("/graft/hla.3560.dat")), "3560",
      alignments = Some(rel))
    val report = BuildIO.validate(withAl, "3560")
    assert(report.checks.length == 5)
    val alCheck = report.checks.find(_.name == "all_alignments").get
    assert(alCheck.headerOk && alCheck.nonEmpty)
    // 5 in-release A alleles with alignments × 2 align types
    assert(withAl.allAlignments.get.count() == 10)
  }

  test("exit-code contract: 0 clean, 2 partial, 1 over-budget/invalid") {
    val clean = BuildIO.ValidationReport("3560",
      Seq(BuildIO.RelationCheck("gfe_sequences", true, true)), 0)
    assert(clean.exitCode == 0)
    assert(clean.copy(errorCount = 10).exitCode == 2)
    assert(clean.copy(errorCount = 11).exitCode == 1)
    val badHeader = clean.copy(
      checks = Seq(BuildIO.RelationCheck("gfe_sequences", false, true)))
    assert(badHeader.exitCode == 1)
  }

  test("CSV sink/scan round-trip with reference file layout (S5/S7)") {
    val dir = java.nio.file.Files.createTempDirectory("buildio").toString
    BuildIO.writeRelations(result, dir, "3560")
    // layout: <name>.<release>.csv
    val written = new java.io.File(dir).list().toSeq.sorted
    assert(written.contains("gfe_sequences.3560.csv"))
    assert(written.contains("errors.3560.ndjson"))
    assert(BuildIO.fileNameOk("all_features.3560.csv", "3560"))
    assert(!BuildIO.fileNameOk("all_features.3570.csv", "3560"))
    assert(!BuildIO.fileNameOk("bogus.3560.csv", "3560"))
    // all-string read-back, row parity with the in-memory relation
    val back = BuildIO.readRelation(spark, dir, "gfe_sequences", "3560")
    assert(back.columns.toSeq == BuildIO.expectedHeaders("gfe_sequences"))
    assert(back.schema.forall(_.dataType.typeName == "string"))
    assert(back.count() == result.gfeSequences.count())
    val a1 = back.where(col("hla_name") === "HLA-A*01:01:01:01").collect().head
    assert(a1.getAs[String]("length") == "321")
    // NDJSON error channel: one JSON object per failed allele
    val errs = spark.read.json(s"$dir/errors.3560.ndjson")
    assert(errs.count() == 1)
    assert(errs.columns.contains("timestamp"))
  }
}
