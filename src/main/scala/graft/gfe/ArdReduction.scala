package graft.gfe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J2 / pyard redux: the ARD reduction data path.
  *
  * The reference calls py-ard's `redux` per allele over the pyard
  * SQLite snapshot (gfe-db/pipeline/jobs/build/src/app.py:209-220)
  * for the groups of constants.py:30 (G, lg, lgx). The engine
  * consumes the same information as a RELATION
  * `(hla_name, ard_name, ard_id)` broadcast-joined in
  * [[GfeBuild.run]] — a production deployment supplies a pyard
  * export here.
  *
  * [[fromNames]] synthesizes a deterministic stand-in with the real
  * tables' shape and the structural grouping rule: G = 3-field prefix
  * + "G", lg = 2-field prefix + "g", lgx = 2-field prefix. Alleles
  * with fewer than three fields stay unreduced, exercising the
  * reference's empty-string path (app.py:332-333).
  */
object ArdReduction {

  /** Build a reduction table from a `hla_name` column. Codegen'd
    * string ops only — at scale this is one narrow projection over
    * the distinct allele names, no shuffle beyond the distinct. */
  def fromNames(names: DataFrame): DataFrame = {
    val parsed = names.select(col("hla_name")).distinct()
      .withColumn("locus", split(col("hla_name"), "\\*").getItem(0))
      .withColumn("fields",
        split(split(col("hla_name"), "\\*").getItem(1), ":"))
      .where(size(col("fields")) >= 3)
    parsed.select(col("hla_name"), explode(array(
      struct(lit("G").as("ard_name"),
        concat(col("locus"), lit("*"),
          concat_ws(":", slice(col("fields"), 1, 3)), lit("G")).as("ard_id")),
      struct(lit("lg").as("ard_name"),
        concat(col("locus"), lit("*"),
          concat_ws(":", slice(col("fields"), 1, 2)), lit("g")).as("ard_id")),
      struct(lit("lgx").as("ard_name"),
        concat(col("locus"), lit("*"),
          concat_ws(":", slice(col("fields"), 1, 2))).as("ard_id"))))
      .as("g"))
      .select(col("hla_name"), col("g.ard_name"), col("g.ard_id"))
  }
}
