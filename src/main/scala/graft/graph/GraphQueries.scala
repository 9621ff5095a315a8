package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The query plane (SURVEY.md §3.3): the reference's validation
  * aggregations (execute_validation_queries/app.py:43-79), the
  * documented traversal query (docs/source/reference.rst:34-37), and
  * the constraint check (SHOW CONSTRAINTS ≡ key-invariant validation).
  *
  * Traversals are equi-joins over the per-label edge tables; the
  * 2-hop allele→GFE→Feature expansion broadcasts the (tiny) filtered
  * anchor side so the feature side never shuffles.
  */
object GraphQueries {

  /** A1: `MATCH (n:<label>) RETURN count(n)` per label. */
  def labelCounts(g: GraphLoad.Graph): DataFrame = {
    val spark = g.gfe.sparkSession
    import spark.implicits._
    g.vertexTables.toSeq.sortBy(_._1).map { case (label, df) =>
      df.agg(count(lit(1)).as("n")).select(lit(label).as("label"), col("n"))
    }.reduce(_ unionAll _)
  }

  /** A2: releases histogram — UNWIND distinct releases per
    * HAS_IPD_ALLELE edge → (release_version, count) ordered. */
  def releasesHistogram(g: GraphLoad.Graph): DataFrame =
    g.hasIpdAllele
      .select(explode(array_distinct(col("releases"))).as("release_version"))
      .groupBy("release_version").agg(count(lit(1)).as("count"))
      .orderBy("release_version")

  /** A3: HAS_IPD_ACCESSION distinct release counts. */
  def accessionReleaseCounts(g: GraphLoad.Graph): DataFrame =
    g.hasIpdAccession.groupBy("release").agg(count(lit(1)).as("count"))
      .orderBy("release")

  /** J8: features of one allele, projected (term, rank), ordered —
    * `MATCH (:IPD_Allele {name})<-[:HAS_IPD_ALLELE]-(:GFE)
    *  -[:HAS_FEATURE]->(f:Feature) RETURN f.term, f.rank ORDER BY ...`
    * (reference.rst:34-77: 17 rows for a full HLA-A allele). */
  def alleleFeatures(g: GraphLoad.Graph, hlaName: String): DataFrame = {
    val gfes = g.hasIpdAllele.where(col("dst") === hlaName)
      .select(col("src").as("gfe_name"))
    broadcast(gfes)
      .join(g.hasFeature, col("gfe_name") === col("src"))
      .select("term", "rank").dropDuplicates("term", "rank")
      .orderBy("term", "rank")
  }

  /** GFE history (reference.rst:88-96): for an allele, its GFE names
    * with the releases each was observed in. */
  def gfeHistory(g: GraphLoad.Graph, hlaName: String): DataFrame =
    g.hasIpdAllele.where(col("dst") === hlaName)
      .select(col("src").as("gfe_name"), col("releases"))
      .orderBy("gfe_name")

  /** SHOW CONSTRAINTS parity: each declared key invariant
    * (create_constraints.cyp:1-6, init.cyp:5) with its violation
    * status. */
  def constraintStatus(g: GraphLoad.Graph): Seq[(String, Boolean)] =
    constraintReport(g).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toSeq

  /** Violated constraint names — empty means healthy. */
  def validateConstraints(g: GraphLoad.Graph): Seq[String] =
    constraintStatus(g).collect { case (name, violated) if violated => name }

  /** The constraint check as a relation (one row per constraint), for
    * the driver-contract surface. All six invariants evaluate as ONE
    * unioned lazy plan — a single Spark job when materialized, where
    * six eager per-constraint counts paid 12 job round-trips per
    * check (and gave transient scheduler hiccups a 12-job window to
    * inflate the bench: measured once at 7.5 s vs the 0.9 s steady
    * state). */
  def constraintReport(g: GraphLoad.Graph): DataFrame = {
    def dup(name: String, df: DataFrame, keys: Seq[String]): DataFrame =
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
        .where(col("c") > 1).limit(1)
        .agg(count(lit(1)).as("viol"))
        .select(lit(name).as("constraint_name"),
          (col("viol") > 0).as("violated"))
    Seq(
      dup("gfe_name_unique", g.gfe, Seq("name")),
      dup("sequence_name_unique", g.sequence, Seq("name")),
      dup("ipd_allele_name_unique", g.ipdAllele, Seq("name")),
      dup("ipd_accession_name_unique", g.ipdAccession, Seq("name")),
      dup("submitter_email_unique", g.submitter, Seq("email")),
      dup("feature_composite_unique", g.feature,
        Seq("locus", "rank", "term", "accession", "sequence")))
      .reduce(_ unionByName _)
  }
}
