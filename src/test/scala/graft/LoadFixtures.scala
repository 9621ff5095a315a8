package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared 3-release policy-matrix fixture for the load plane: every
  * load.cyp merge policy exercised where incremental and refold could
  * diverge (GraphLoadSpec, GraphStoreSpec). */
object LoadFixtures {

  def seqsDf(spark: SparkSession, rel: String,
      rows: Seq[(String, String, String, String, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("gfe_name", "acc_name", "hla_name", "seq_id", "sequence", "length")
      .withColumn("locus", split(col("hla_name"), "\\*").getItem(0))
      .withColumn("imgt_release", lit(rel))
  }

  def featsDf(spark: SparkSession,
      rows: Seq[(String, String, Int, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("gfe_name", "term", "rank", "accession", "sequence")
      .withColumn("locus", lit("HLA-A"))
  }

  def groupsDf(spark: SparkSession,
      rows: Seq[(String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("hla_name", "ard_name", "ard_id")
  }

  /** r1: alleles H1 (gfe A, acc AC1), H2 (gfe B, acc AC2); H1 reduced
    * G→g1.
    * r2: A re-listed (releases accumulate; Sequence length overwritten
    * 4→5); NEW gfe C for the same allele H1 under the same accession
    * AC1 (new HAS_IPD_ACCESSION pair; first-wins keeps (A,AC1)@3.57.0);
    * H1's G overwritten g1→g2; H2 gains lg (G stays null). r2 also
    * carries two MATCH-no-op groups rows: one for HLA-B*07:02 — an
    * allele first LISTED only in r3 (load.cyp:63 MATCHes the allele,
    * so a groups row preceding the allele's first listing updates
    * nothing, in the refold and the fold alike) — and one for a name
    * no release ever lists (dropped everywhere).
    * r3: brand-new allele/gfe D, no groups rows at all. */
  def policyMatrix(spark: SparkSession)
      : Seq[(String, DataFrame, DataFrame, DataFrame)] = Seq(
    ("3570",
      seqsDf(spark, "3.57.0", Seq(
        ("A", "AC1", "HLA-A*01:01", "s1", "ACGT", 4L),
        ("B", "AC2", "HLA-A*02:01", "s2", "CCGT", 4L))),
      featsDf(spark, Seq(("A", "EXON", 1, "1", "AC"), ("B", "EXON", 1, "2", "CC"))),
      groupsDf(spark, Seq(("HLA-A*01:01", "G", "g1")))),
    ("3580",
      seqsDf(spark, "3.58.0", Seq(
        ("A", "AC1", "HLA-A*01:01", "s1", "ACGT", 5L),
        ("C", "AC1", "HLA-A*01:01", "s3", "AGGT", 4L))),
      featsDf(spark, Seq(("A", "EXON", 1, "1", "AC"), ("C", "EXON", 1, "3", "AG"))),
      groupsDf(spark, Seq(("HLA-A*01:01", "G", "g2"), ("HLA-A*02:01", "lg", "l1"),
        ("HLA-B*07:02", "G", "g0"), ("HLA-Z*99:99", "lg", "lz")))),
    ("3590",
      seqsDf(spark, "3.59.0", Seq(
        ("D", "AC3", "HLA-B*07:02", "s4", "TTGT", 4L))),
      featsDf(spark, Seq(("D", "EXON", 1, "4", "TT"))),
      groupsDf(spark, Seq.empty)))

  def rowsOf(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
  }

  def assertSameGraph(a: graft.graph.GraphLoad.Graph,
      b: graft.graph.GraphLoad.Graph, clue: String): Unit =
    (a.vertexTables ++ a.edgeTables).foreach { case (n, df) =>
      val other = (b.vertexTables ++ b.edgeTables)(n)
      assert(df.columns.toSeq == other.columns.toSeq,
        s"$clue: $n columns: ${df.columns.toSeq} vs ${other.columns.toSeq}")
      val (ra, rb) = (rowsOf(df), rowsOf(other))
      assert(ra == rb, s"$clue: table $n differs:\n  a=$ra\n  b=$rb")
    }
}
