package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.ImgtFlatFile

class ImgtFlatFileSpec extends AnyFunSuite {

  lazy val text: String = ImgtFlatFile.resourceText("/graft/hla.3560.dat")
  lazy val records = ImgtFlatFile.parseText(text)

  test("parses every record in the fixture release") {
    assert(records.length == 12)
    assert(records.map(_.accession).distinct.length == 12)
  }

  test("ID/DE/SQ fields land on the right record") {
    val a1 = records.find(_.accession == "HLA00001").get
    assert(a1.description.startsWith("HLA-A*01:01:01:01,"))
    assert(a1.hlaName == "HLA-A*01:01:01:01")
    assert(a1.locus == "HLA-A")
    assert(a1.sequence.length == 321)
    assert(a1.sequence.forall(c => "ACGT".contains(c)))
  }

  test("features: types, numbers, multi-line CDS join + translation") {
    val a1 = records.find(_.accession == "HLA00001").get
    // source + UTR + 8 exons + 7 introns + CDS + UTR = 19
    assert(a1.features.length == 19)
    assert(a1.features.head.ftype == "source")
    val exons = a1.features.filter(_.ftype == "exon")
    assert(exons.map(_.number.get) == (1 to 8))
    val cds = a1.features.find(_.ftype == "CDS").get
    assert(cds.segments.length == 8, "multi-line join() must concatenate")
    assert(cds.translation.get.startsWith("M"))
    assert(!cds.translation.get.contains("\""))
    // CDS segments == exon segments
    assert(cds.segments == exons.flatMap(_.segments))
  }

  test("feature extract concatenates 1-based inclusive segments") {
    val a1 = records.find(_.accession == "HLA00001").get
    val exon1 = a1.features.find(f => f.ftype == "exon" && f.number.contains(1)).get
    val seg = exon1.segments.head
    assert(exon1.extract(a1.sequence) ==
      a1.sequence.substring(seg.start.toInt - 1, seg.end.toInt))
    val cds = a1.features.find(_.ftype == "CDS").get
    val exonCat = a1.features.filter(_.ftype == "exon")
      .map(_.extract(a1.sequence)).mkString
    assert(cds.extract(a1.sequence) == exonCat)
  }

  test("distributed read splits CRLF-terminated files correctly") {
    import java.nio.file.{Files, Paths}
    val crlf = text.replace("\n", "\r\n")
    val tmp = Files.createTempDirectory("imgt_crlf").resolve("hla.crlf.dat")
    Files.writeString(tmp, crlf)
    val ds = ImgtFlatFile.read(TestSpark.spark, tmp.toString)
    val parsed = ds.collect()
    assert(parsed.length == records.length, "every record must split")
    val a1 = parsed.find(_.accession == "HLA00001").get
    assert(a1.sequence.length == 321, "no cross-record sequence merging")
  }

  test("distributed read matches the pure parser") {
    import java.nio.file.{Files, Paths}
    val tmp = Files.createTempDirectory("imgt").resolve("hla.3560.dat")
    Files.writeString(tmp, text)
    val ds = ImgtFlatFile.read(TestSpark.spark, tmp.toString)
    val viaSpark = ds.collect().map(_.accession).sorted.toSeq
    assert(viaSpark == records.map(_.accession).sorted)
  }
}
