package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.gfe.{Features, GfeBuild, SyntheticRelease}
import graft.ingest.ImgtFlatFile

class SyntheticReleaseSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("synthetic release parses and builds with the fixture shape") {
    val path = SyntheticRelease.materialize(64)
    val text = java.nio.file.Files.readString(path)
    val records = ImgtFlatFile.parseText(text)
    assert(records.length == 64)
    // every record has the full 17-feature shape + CDS
    records.foreach { r =>
      assert(Features.extract(r).length == 17, r.accession)
      assert(Features.extractCds(r).nonEmpty, r.accession)
    }
    // distinct loci cycle; names unique
    assert(records.map(_.hlaName).distinct.length == 64)
    // builds end-to-end
    val res = GfeBuild.run(spark,
      ImgtFlatFile.fromText(spark, text), "4000")
    assert(res.gfeSequences.count() == 64)
    assert(res.allFeatures.count() == 64 * 17)
    assert(res.errors.count() == 0)
  }
}
