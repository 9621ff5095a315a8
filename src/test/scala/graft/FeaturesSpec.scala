package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.gfe.Features
import graft.ingest.ImgtFlatFile

class FeaturesSpec extends AnyFunSuite {

  lazy val records =
    ImgtFlatFile.parseText(ImgtFlatFile.resourceText("/graft/hla.3560.dat"))
  def rec(acc: String) = records.find(_.accession == acc).get

  test("full allele yields the 17-feature golden shape (reference.rst:40-77)") {
    val fs = Features.extract(rec("HLA00001"))
    assert(fs.length == 17)
    assert(fs.head.term == "five_prime_UTR")
    assert(fs.last.term == "three_prime_UTR")
    assert(fs.count(_.term == "exon") == 8)
    assert(fs.count(_.term == "intron") == 7)
    // every extracted subsequence is non-empty and from the record
    fs.foreach(f => assert(f.sequence.nonEmpty))
  }

  test("structural ordinal orders 5'UTR, exon/intron interleave, 3'UTR") {
    val fs = Features.extract(rec("HLA00001"))
    val ordered = fs.sortBy(f => Features.ordinal(f.term, f.rank))
    assert(ordered.map(f => (f.term, f.rank)).take(4) == Seq(
      ("five_prime_UTR", 1), ("exon", 1), ("intron", 1), ("exon", 2)))
    assert(ordered.last.term == "three_prime_UTR")
  }

  test("CDS extraction returns (bp from location, aa from qualifier)") {
    val r = rec("HLA00001")
    val (bp, aa) = Features.extractCds(r).get
    val exonCat = r.features.filter(_.ftype == "exon")
      .map(_.extract(r.sequence)).mkString
    assert(bp == exonCat)
    assert(aa.startsWith("M"))
    assert(Features.extractCds(rec("HLA00011")).isEmpty, "CDS-less record")
  }

  test("a record with only source+CDS yields no gene features") {
    val r = rec("HLA00010") // tiny record: source feature only
    assert(Features.extract(r).isEmpty)
  }
}
