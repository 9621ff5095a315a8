package graft.gfe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Build-output I/O + validation: the CSV sink/scan pair (S5/S7), the
  * NDJSON error sink (S6), and the post-build data-quality gate (S9 +
  * A6/A7/O2 — gfe-db/pipeline/functions/validate_build_output/app.py).
  *
  * CSV relations are written set-at-a-time with the reference's
  * `<name>.<release>.csv` layout under a per-release directory
  * (run.sh:109-116). Reads come back all-string (the reference
  * validator's `infer_schema_length=0` convention, app.py:87) —
  * typing happens at query time, matching §1.1.
  */
object BuildIO {

  /** Declared relation headers (validate_build_output/app.py:165-198). */
  val expectedHeaders: Map[String, Seq[String]] = Map(
    "gfe_sequences" -> Seq("gfe_name", "acc_name", "locus", "hla_name",
      "seq_id", "sequence", "length", "imgt_release"),
    "all_features" -> Seq("accession", "hash_code", "locus", "rank",
      "sequence", "term", "gfe_name", "allele_id", "hla_name",
      "imgt_release"),
    "all_groups" -> Seq("gfe_name", "allele_id", "hla_name", "ard_id",
      "ard_name", "locus", "imgt_release"),
    "all_cds" -> Seq("gfe_name", "bp_seq_id", "bp_sequence", "aa_seq_id",
      "aa_sequence"),
    "all_alignments" -> Seq("label", "seq_id", "gfe_name", "hla_name",
      "length", "rank", "bp_sequence", "aa_sequence", "imgt_release"))

  /** `<name>.<release>.csv` layout check
    * (validate_build_output/app.py:201-202 — the reference's regex is
    * a literal with escaped dots, i.e. exact-name equality). */
  def fileNameOk(fileName: String, release: String): Boolean =
    expectedHeaders.keys.exists(n => fileName == s"$n.$release.csv")

  private def relations(r: GfeBuild.BuildResult): Map[String, DataFrame] =
    Map(
      "gfe_sequences" -> r.gfeSequences,
      "all_features" -> r.allFeatures,
      "all_groups" -> r.allGroups,
      "all_cds" -> r.allCds) ++
      r.allAlignments.map("all_alignments" -> _)

  /** S5: write the relations as headered CSV dirs
    * `<outDir>/<name>.<release>.csv/`, plus the S6 NDJSON error
    * side-channel `errors.<release>.ndjson/`. */
  def writeRelations(r: GfeBuild.BuildResult, outDir: String,
      release: String): Unit = {
    relations(r).foreach { case (name, df) =>
      df.write.mode("overwrite").option("header", true)
        .csv(s"$outDir/$name.$release.csv")
    }
    // The errors relation already carries the reference's per-row
    // timestamp column (GfeBuild stamps it at build time, mirroring
    // app.py:632's datetime.utcnow().isoformat()[:-3]).
    r.errors.write.mode("overwrite").json(s"$outDir/errors.$release.ndjson")
  }

  /** S7/S9: all-string scan of a written relation (explicit schema —
    * never inferred). */
  def readRelation(spark: SparkSession, outDir: String, name: String,
      release: String): DataFrame = {
    val schema = StructType(expectedHeaders(name)
      .map(c => StructField(c, StringType, nullable = true)))
    spark.read.option("header", true).schema(schema)
      .csv(s"$outDir/$name.$release.csv")
  }

  final case class RelationCheck(
      name: String, headerOk: Boolean, nonEmpty: Boolean)

  final case class ValidationReport(
      release: String,
      checks: Seq[RelationCheck],
      errorCount: Long,
      maxErrors: Int = 10) {
    /** A7 + O2 conjunction (validate_build_output/app.py:146). */
    def isValidBuild: Boolean = checks.forall(c => c.headerOk && c.nonEmpty)
    /** Build exit-code contract (run.sh:146-158, app.py:684-688):
      * 0 ok, 2 partial (≤ maxErrors allele failures), 1 fail. */
    def exitCode: Int =
      if (!isValidBuild || errorCount > maxErrors) 1
      else if (errorCount > 0) 2
      else 0
  }

  /** The post-build gate: header set equality (O2) + row-count > 0
    * (A7) per relation, plus the error-budget tally (A6). */
  def validate(r: GfeBuild.BuildResult, release: String): ValidationReport =
    ValidationReport(
      release,
      relations(r).toSeq.sortBy(_._1).map { case (name, df) =>
        RelationCheck(
          name,
          headerOk = df.columns.toSeq == expectedHeaders(name),
          nonEmpty = !df.isEmpty)
      },
      errorCount = r.errors.count())
}
