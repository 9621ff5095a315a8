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
  def constraintStatus(g: GraphLoad.Graph): Seq[(String, Boolean)] = {
    def dup(df: DataFrame, keys: Seq[String]): Boolean =
      df.groupBy(keys.map(col): _*).count().where(col("count") > 1)
        .limit(1).count() > 0
    Seq(
      "gfe_name_unique" -> dup(g.gfe, Seq("name")),
      "sequence_name_unique" -> dup(g.sequence, Seq("name")),
      "ipd_allele_name_unique" -> dup(g.ipdAllele, Seq("name")),
      "ipd_accession_name_unique" -> dup(g.ipdAccession, Seq("name")),
      "submitter_email_unique" -> dup(g.submitter, Seq("email")),
      "feature_composite_unique" ->
        dup(g.feature, Seq("locus", "rank", "term", "accession", "sequence")))
  }

  /** Violated constraint names — empty means healthy. */
  def validateConstraints(g: GraphLoad.Graph): Seq[String] =
    constraintStatus(g).collect { case (name, violated) if violated => name }

  /** The constraint check as a relation (one row per constraint), for
    * the driver-contract surface. */
  def constraintReport(g: GraphLoad.Graph): DataFrame = {
    val spark = g.gfe.sparkSession
    import spark.implicits._
    constraintStatus(g).toDF("constraint_name", "violated")
  }
}
