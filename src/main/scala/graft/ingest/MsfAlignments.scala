package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** MSF multiple-sequence-alignment scan — operator S2.
  *
  * The reference reads `<LOC>_<gen|nuc|prot>.msf` per locus with
  * Biopython (`AlignIO.read(msf, "msf")`, app.py:97-124) and keys the
  * result by allele name. GCG/MSF format: a header terminated by a
  * `//` line, then interleaved blocks of `name  SEQ SEQ SEQ ...`
  * rows; alignment text may contain gap characters (`.`/`-`).
  *
  * One MSF file is small (one locus); the parse is a pure driver-side
  * function producing the alignment relation used as the broadcast
  * side of the J1 join in [[graft.gfe.GfeBuild]].
  */
object MsfAlignments {

  /** Parse MSF text → (alleleName → alignedSeq), insertion-ordered.
    * Names are kept verbatim; the reference prefixes "HLA-"
    * (app.py:117) — callers apply that when keying by hla_name. */
  def parseMsf(text: String): Seq[(String, String)] = {
    val lines = text.split("\n")
    val sepIdx = lines.indexWhere(_.trim.startsWith("//"))
    val body = if (sepIdx >= 0) lines.drop(sepIdx + 1) else lines
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, StringBuilder]
    for (raw <- body) {
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("//")) {
        val sp = line.indexOf(' ')
        if (sp > 0) {
          val name = line.take(sp)
          val seq = line.drop(sp).replace(" ", "")
          // numeric ruler lines (coordinates) have no sequence letters
          if (seq.exists(c => c.isLetter || c == '.' || c == '-'))
            acc.getOrElseUpdate(name, new StringBuilder) ++= seq
        }
      }
    }
    acc.toSeq.map { case (k, v) => (k, v.result()) }
  }

  /** Label for an alignment type (app.py:273-279). */
  def label(alignType: String): String = alignType match {
    case "gen" | "genomic" => "GEN_ALIGN"
    case "nuc" | "nucleotide" => "NUC_ALIGN"
    case "prot" | "protein" => "PROT_ALIGN"
    case other => throw new IllegalArgumentException(
      s"Could not recognize align_type = $other")
  }

  /** Alignment relation for [[graft.gfe.GfeBuild]]: one row per
    * (label, locus, hla_name, alignment) from in-memory MSF texts
    * keyed (locus, alignType). */
  def toRelation(
      spark: SparkSession,
      msfTexts: Map[(String, String), String]): DataFrame = {
    import spark.implicits._
    msfTexts.toSeq.flatMap { case ((locus, alignType), text) =>
      parseMsf(text).map { case (name, seq) =>
        (label(alignType), locus, "HLA-" + name, seq)
      }
    }.toDF("label", "locus", "hla_name", "alignment")
  }
}
