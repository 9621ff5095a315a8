package graft.ingest

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.{AlleleRecord, LocSegment, RawFeature}

/** EMBL/IMGT flat-file ("hla.<release>.dat") ingestion — operator S1.
  *
  * The reference delegates to Biopython's `SeqIO.parse(dat, "imgt")`
  * (gfe-db/pipeline/jobs/build/src/app.py:73-83); we parse the same
  * format with a pure `String => Option[AlleleRecord]` record parser,
  * distributed via a splittable text scan.
  *
  * Scale design: records are delimited by a line containing only `//`.
  * `spark.read.option("lineSep", "\n//\n").text(path)` hands each
  * executor whole record chunks directly from the file split — no
  * driver-side reading, no wholeTextFiles single-partition trap — and
  * the per-record parser runs inside a `flatMap` on the executors. A
  * 100 TB .dat corpus scans exactly like any other text source.
  *
  * Only the lines the reference build touches are interpreted:
  *  - `ID` → accession id (first token before `;`)
  *  - `DE` → description (hla_name/locus derivation, app.py:603-604)
  *  - `FT` → features: type + location (+ `/number`, `/translation`
  *    qualifiers; multi-line translations are concatenated)
  *  - `SQ` body → nucleotide sequence (whitespace/digits stripped)
  * Everything else (AC/KW/OS/RN/DT/CC/XX...) is skipped, as Biopython's
  * reader effectively does for this pipeline's field usage.
  */
object ImgtFlatFile {

  /** Parse one record chunk (text between `//` terminators). */
  def parseRecord(chunk: String): Option[AlleleRecord] = {
    val lines = chunk.split("\n")
    var accession: String = null
    var description: String = null
    val seq = new StringBuilder
    var inSeq = false

    final case class FtBuilder(
        ftype: String,
        var loc: String,
        var number: Option[Int] = None,
        var translation: Option[String] = None)
    val feats = scala.collection.mutable.ArrayBuffer.empty[FtBuilder]
    var pendingQualifier: String = null // "translation" while continuing

    for (raw <- lines) {
      val line = if (raw.endsWith("\r")) raw.dropRight(1) else raw
      if (line.startsWith("ID")) {
        accession = line.drop(2).trim.takeWhile(_ != ';').trim
      } else if (line.startsWith("DE")) {
        description =
          (if (description == null) "" else description + " ") +
            line.drop(2).trim
      } else if (line.startsWith("SQ")) {
        inSeq = true
      } else if (line.startsWith("//")) {
        inSeq = false
      } else if (inSeq) {
        // Biopython's EMBL/IMGT reader upper-cases the sequence body.
        seq ++= line.filter(_.isLetter).toUpperCase
      } else if (line.startsWith("FT")) {
        val body = line.drop(2)
        val isQualifierLine = body.trim.startsWith("/")
        val isContinuation = body.startsWith("                ") &&
          !isQualifierLine // location/translation continuation
        if (isQualifierLine) {
          pendingQualifier = null
          val q = body.trim.drop(1)
          val eq = q.indexOf('=')
          if (eq > 0 && feats.nonEmpty) {
            val key = q.take(eq)
            val value = q.drop(eq + 1).stripPrefix("\"")
            key match {
              case "number" =>
                val digits = value.takeWhile(_.isDigit)
                if (digits.nonEmpty) feats.last.number = Some(digits.toInt)
              case "translation" =>
                val (v, closed) = stripClose(value)
                feats.last.translation = Some(v)
                if (!closed) pendingQualifier = "translation"
              case _ => ()
            }
          }
        } else if (isContinuation && feats.nonEmpty) {
          if (pendingQualifier == "translation") {
            val (v, closed) = stripClose(body.trim)
            feats.last.translation = feats.last.translation.map(_ + v)
            if (closed) pendingQualifier = null
          } else {
            feats.last.loc += body.trim // multi-line join(...) location
          }
        } else {
          pendingQualifier = null
          val t = body.trim
          val sp = t.indexOf(' ')
          if (sp > 0) feats += FtBuilder(t.take(sp), t.drop(sp).trim)
        }
      }
    }

    if (accession == null || description == null || seq.isEmpty) None
    else Some(AlleleRecord(
      accession = accession,
      description = description,
      sequence = seq.result(),
      features = feats.toSeq.map(f => RawFeature(
        ftype = f.ftype,
        segments = parseLocation(f.loc),
        number = f.number,
        translation = f.translation))))
  }

  /** `"ABC..."` value → (content-before-quote, sawClosingQuote). */
  private def stripClose(v: String): (String, Boolean) = {
    val i = v.indexOf('"')
    if (i >= 0) (v.take(i), true) else (v, false)
  }

  /** EMBL location → ordered 1-based segments. Handles `a..b`,
    * `join(a..b,c..d,…)`, `complement(…)` wrappers, and `<a..>b`
    * partial markers (positions kept, strand ignored — the reference
    * extracts HLA features forward-strand only). */
  def parseLocation(loc: String): Seq[LocSegment] =
    "(\\d+)\\.\\.[<>]?(\\d+)".r.findAllMatchIn(loc)
      .map(m => LocSegment(m.group(1).toLong, m.group(2).toLong))
      .toSeq

  /** Split a whole-file string into records (terminator `//`). */
  def parseText(text: String): Seq[AlleleRecord] =
    text.split("(?m)^//\\s*$").toSeq.flatMap { chunk =>
      if (chunk.trim.isEmpty) None else parseRecord(chunk)
    }

  /** Distributed scan: one splittable text read, records parsed on
    * executors. The separator is "\n//" (not "\n//\n") so CRLF files
    * split too — their terminator is "\r\n//\r\n", and parseRecord
    * strips the stray "\r" prefix lines; a mid-line "//" (e.g. in a
    * URL) never follows a newline directly, so it cannot split. */
  def read(spark: SparkSession, path: String): Dataset[AlleleRecord] = {
    import spark.implicits._
    spark.read.option("lineSep", "\n//").textFile(path)
      .flatMap(chunk => parseRecord(chunk))
  }

  /** Parallelize already-loaded text (classpath fixtures, tests). */
  def fromText(spark: SparkSession, text: String): Dataset[AlleleRecord] = {
    import spark.implicits._
    spark.createDataset(parseText(text))
  }

  /** Load a classpath resource as text (fixture .dat files). */
  def resourceText(name: String): String = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"missing classpath resource $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }
}
