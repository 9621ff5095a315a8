package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.gfe.GfeBuild
import graft.ingest.{ImgtFlatFile, MsfAlignments}

class MsfAlignmentsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  val msf: String =
    """PileUp
      |
      | MSF: 24  Type: N  Check: 0  ..
      |
      | Name: A*01:01:01:01  Len: 24
      | Name: A*01:01:01:02  Len: 24
      |
      |//
      |
      |A*01:01:01:01  ACGTACGTAC GTACGTACGT
      |A*01:01:01:02  ACGT..GTAC GTACGTACGT
      |
      |A*01:01:01:01  ACGT
      |A*01:01:01:02  AC.T
      |""".stripMargin

  test("MSF parse: interleaved blocks concatenate per name, gaps kept") {
    val parsed = MsfAlignments.parseMsf(msf).toMap
    assert(parsed.keySet == Set("A*01:01:01:01", "A*01:01:01:02"))
    assert(parsed("A*01:01:01:01") == "ACGTACGTACGTACGTACGTACGT")
    assert(parsed("A*01:01:01:02") == "ACGT..GTACGTACGTACGTAC.T")
  }

  test("alignment labels (app.py:273-279)") {
    assert(MsfAlignments.label("gen") == "GEN_ALIGN")
    assert(MsfAlignments.label("nucleotide") == "NUC_ALIGN")
    assert(MsfAlignments.label("prot") == "PROT_ALIGN")
    intercept[IllegalArgumentException](MsfAlignments.label("x"))
  }

  test("all_alignments relation: broadcast join, PROT in aa_sequence (J1)") {
    val rel = MsfAlignments.toRelation(spark, Map(
      ("HLA-A", "gen") -> msf,
      ("HLA-A", "nuc") -> msf,
      ("HLA-A", "prot") -> msf))
    val ds = ImgtFlatFile.fromText(spark,
      ImgtFlatFile.resourceText("/graft/hla.3560.dat"))
    val res = GfeBuild.run(spark, ds, "3560", alignments = Some(rel))
    val al = res.allAlignments.get.cache()
    // two fixture alleles have alignments, × 3 align types
    // (the reference downloads {loc}_{gen,nuc,prot}.msf —
    // get_alignments.sh:16-65)
    assert(al.count() == 6)
    val gen = al.where(col("label") === "GEN_ALIGN" &&
      col("hla_name") === "HLA-A*01:01:01:01").collect().head
    assert(gen.getAs[String]("bp_sequence").nonEmpty)
    assert(gen.getAs[String]("aa_sequence") == "")
    assert(gen.getAs[String]("rank") == "0")
    assert(gen.getAs[Long]("length") == 24L)
    // NUC_ALIGN is nucleotide: flows to bp_sequence like GEN_ALIGN
    val nuc = al.where(col("label") === "NUC_ALIGN" &&
      col("hla_name") === "HLA-A*01:01:01:01").collect().head
    assert(nuc.getAs[String]("bp_sequence").nonEmpty)
    assert(nuc.getAs[String]("aa_sequence") == "")
    val prot = al.where(col("label") === "PROT_ALIGN" &&
      col("hla_name") === "HLA-A*01:01:01:01").collect().head
    assert(prot.getAs[String]("aa_sequence").nonEmpty)
    assert(prot.getAs[String]("bp_sequence") == "")
  }
}
