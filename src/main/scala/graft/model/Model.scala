package graft.model

/** Domain model for the GFE engine.
  *
  * Mirrors WHAT the reference computes (SURVEY.md §1), re-expressed as
  * typed Spark rows. Citations in Scaladoc are `path:line` into
  * /root/reference/.
  */

/** One segment of a feature location, 1-based inclusive (EMBL `a..b`). */
final case class LocSegment(start: Long, end: Long)

/** A raw flat-file feature as parsed from an FT block.
  * Reference shape: Biopython SeqFeature with type, location and
  * qualifiers (gfe-db/pipeline/jobs/build/src/app.py:127-153).
  */
final case class RawFeature(
    ftype: String,
    segments: Seq[LocSegment],
    number: Option[Int],
    translation: Option[String]) {
  def hasQualifiers: Boolean = number.nonEmpty || translation.nonEmpty

  /** Extract this feature's subsequence from the record sequence
    * (Biopython `feat.extract(seq)` ≡ concat of 1-based segments). */
  def extract(seq: String): String =
    segments.map { s =>
      val a = math.max(0, s.start.toInt - 1)
      val b = math.min(seq.length, s.end.toInt)
      if (a >= b) "" else seq.substring(a, b)
    }.mkString
}

/** One allele record from the IMGT/HLA flat file (`hla.<release>.dat`).
  * Fields are exactly those the reference build touches
  * (app.py:73-83,603-604; FIXTURES.md §1).
  */
final case class AlleleRecord(
    accession: String, // e.g. HLA00001 (record ID line)
    description: String, // e.g. "HLA-A*01:01:01:01, Human MHC Class I"
    sequence: String,
    features: Seq[RawFeature]) {
  def hlaName: String = description.split(",")(0)
  def locus: String = hlaName.split("\\*")(0)
}

/** An extracted gene feature: term_rank → subsequence
  * (get_features, app.py:127-153). */
final case class ExtractedFeature(term: String, rank: Int, sequence: String)

// ---- the five build relations (SURVEY §1.2; headers per
// validate_build_output/app.py:165-198) ----

final case class GfeSequenceRow(
    gfe_name: String, acc_name: String, locus: String, hla_name: String,
    seq_id: String, sequence: String, length: Long, imgt_release: String)

final case class FeatureRow(
    accession: Long, hash_code: String, locus: String, rank: Int,
    sequence: String, term: String, gfe_name: String, allele_id: String,
    hla_name: String, imgt_release: String)

final case class GroupRow(
    gfe_name: String, allele_id: String, hla_name: String,
    ard_id: String, ard_name: String, locus: String, imgt_release: String)

final case class CdsRow(
    gfe_name: String, bp_seq_id: String, bp_sequence: String,
    aa_seq_id: String, aa_sequence: String)

final case class AlignmentRow(
    label: String, seq_id: String, gfe_name: String, hla_name: String,
    length: Long, rank: String, bp_sequence: String, aa_sequence: String,
    imgt_release: String)

/** Error side-channel row (app.py:631-639). */
final case class BuildError(
    allele_id: String, hla_name: String, release: String, error: String)
