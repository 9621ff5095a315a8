package graft.gfe

import graft.model.{AlleleRecord, ExtractedFeature}

/** Gene-feature extraction — operators P6 (get_features) and P7
  * (get_cds), mirroring gfe-db/pipeline/jobs/build/src/app.py:127-175.
  *
  * Pure record-local functions: on a cluster they run inside
  * `Dataset[AlleleRecord].flatMap`, so extraction scales linearly with
  * the scan and never shuffles.
  */
object Features {

  /** app.py:127-153. Positional rules:
    *  - among the first ≤3 features, any non-source/CDS feature with no
    *    qualifiers → five_prime_UTR;
    *  - every non-source/CDS feature with a `number` qualifier →
    *    `<type>_<number>` (exon_1, intron_2, ...);
    *  - the last feature, if unqualified non-source/CDS (and the record
    *    has >1 features) → three_prime_UTR.
    * The reference collapses results into a dict keyed by term_rank
    * (last write wins) — reproduced here.
    */
  def extract(rec: AlleleRecord): Seq[ExtractedFeature] = {
    val feats = rec.features
    val j = math.min(3, feats.length)
    val five = feats.take(j).collect {
      case f if f.ftype != "source" && f.ftype != "CDS" && !f.hasQualifiers =>
        ExtractedFeature("five_prime_UTR", 1, f.extract(rec.sequence))
    }
    val named = feats.collect {
      case f if f.ftype != "source" && f.ftype != "CDS" && f.number.nonEmpty =>
        ExtractedFeature(f.ftype, f.number.get, f.extract(rec.sequence))
    }
    val three = feats.takeRight(1).collect {
      case f if feats.length > 1 && f.ftype != "source" && f.ftype != "CDS" &&
        !f.hasQualifiers =>
        ExtractedFeature("three_prime_UTR", 1, f.extract(rec.sequence))
    }
    // dict-merge by (term, rank): last write wins, insertion order kept
    val merged = scala.collection.mutable.LinkedHashMap.empty[(String, Int), ExtractedFeature]
    (five ++ named ++ three).foreach(f => merged((f.term, f.rank)) = f)
    merged.values.toSeq
  }

  /** app.py:157-175: locate the CDS feature, return (bp_seq from its
    * location over the record sequence, aa_seq from its `translation`
    * qualifier); either may be absent. */
  def extractCds(rec: AlleleRecord): Option[(String, String)] =
    rec.features.find(_.ftype == "CDS").flatMap { cds =>
      cds.translation.flatMap { aa =>
        if (cds.segments.isEmpty) None
        else Some((cds.extract(rec.sequence), aa))
      }
    }

  /** Structural position of a term within a locus's GFE name
    * (introduction.rst:33-38: 5'UTR, exon1, intron1, ..., exonN, 3'UTR).
    */
  def ordinal(term: String, rank: Int): Int = term.toUpperCase match {
    case "FIVE_PRIME_UTR" => 0
    case "EXON" => 2 * rank - 1
    case "INTRON" => 2 * rank
    case "THREE_PRIME_UTR" => Int.MaxValue
    case _ => Int.MaxValue - 1 // unknown terms sort just before 3'UTR
  }
}
