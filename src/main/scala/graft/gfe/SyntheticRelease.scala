package graft.gfe

import java.nio.file.{Files, Path, Paths}

/** Deterministic full-scale IMGT release synthesizer — the reference's
  * headline workload is 35,000+ alleles per release (README.md:149,
  * BASELINE.md) built in 15-30 min on 8 vCPU; this generates a
  * same-shaped corpus so `gfe_build_scale` can time our build+load
  * end-to-end at that row count.
  *
  * Allele shape matches the fixture generator (scripts/gen_fixture.py):
  * 17 features (5'UTR, 8 exons, 7 introns, 3'UTR) + CDS with
  * translation, EMBL layout. Variant structure: each (locus, position)
  * draws from a bounded variant pool, so accession cardinality and
  * feature sharing behave like real data (many alleles share most
  * feature sequences).
  */
object SyntheticRelease {

  private val loci = Seq("HLA-A", "HLA-B", "HLA-C", "HLA-DRB1",
    "HLA-DQB1", "HLA-DPB1", "HLA-DQA1", "HLA-DPA1")
  private val bases = "ACGT"

  private def md5Stream(tag: String, length: Int): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new StringBuilder(length)
    var block = 0
    while (sb.length < length) {
      val d = md.digest(s"$tag#$block".getBytes("UTF-8"))
      var i = 0
      while (i < d.length && sb.length < length) {
        sb += bases((d(i) & 0xFF) % 4)
        i += 1
      }
      block += 1
    }
    sb.result()
  }

  private val positions: Seq[(String, Int)] =
    Seq(("utr5", 30)) ++
      (1 to 8).flatMap(r => Seq((s"exon$r", 18 + 3 * (r % 3))) ++
        (if (r < 8) Seq((s"intron$r", 12 + 3 * (r % 2))) else Nil)) ++
      Seq(("utr3", 24))

  /** One allele record. Variant pool per position: ~40 variants, so a
    * 35k-allele release yields realistic feature sharing. */
  private def record(locus: String, idx: Int): String = {
    val hlaName = f"$locus*${idx / 100 + 1}%02d:${idx % 100 + 1}%02d"
    val acc = f"SYN${loci.indexOf(locus)}%d${idx}%06d"
    val sb = new StringBuilder(2048)
    var pos = 1
    val segs = positions.map { case (p, len) =>
      // variant drawn independently per (allele, position) so GFE
      // names are effectively all-distinct (like real releases) while
      // feature sequences still pool into ~40 variants per position
      val variant = math.abs(s"$idx|$p".hashCode % 40)
      val s = md5Stream(s"$locus|$p|v$variant", len)
      val r = (p, pos, pos + len - 1, s)
      pos += len
      r
    }
    val full = segs.map(_._4).mkString
    sb ++= s"ID   $acc; SV 1; standard; DNA; HUM; ${full.length} BP.\n"
    sb ++= s"DE   $hlaName, Human MHC sequence\n"
    sb ++= s"FT   source          1..${full.length}\n"
    // 3'UTR must be the LAST feature (after CDS) for the positional
    // extraction rule (app.py:140-144); emit it separately below.
    segs.filter(_._1 != "utr3").foreach { case (p, a, b, _) =>
      if (p == "utr5")
        sb ++= f"FT   UTR             $a..$b\n"
      else {
        val kind = if (p.startsWith("exon")) "exon" else "intron"
        val num = p.dropWhile(!_.isDigit)
        sb ++= f"FT   $kind%-15s $a..$b\n"
        sb ++= s"FT                   /number=\"$num\"\n"
      }
    }
    val exonSegs = segs.filter(_._1.startsWith("exon"))
    val joinLoc = "join(" + exonSegs.map(s => s"${s._2}..${s._3}").mkString(",") + ")"
    sb ++= s"FT   CDS             ${joinLoc.take(46)}\n"
    joinLoc.drop(46).grouped(46).foreach(c =>
      sb ++= s"FT                   $c\n")
    val aaLen = exonSegs.map(s => s._3 - s._2 + 1).sum / 3
    val aa = "M" + md5Stream(s"aa|$hlaName", aaLen - 1)
    val tr = s"""/translation="$aa""""
    tr.grouped(46).foreach(c => sb ++= s"FT                   $c\n")
    val utr3 = segs.find(_._1 == "utr3").get
    sb ++= f"FT   UTR             ${utr3._2}..${utr3._3}\n"
    sb ++= s"SQ   Sequence ${full.length} BP; 0 A; 0 C; 0 G; 0 T; 0 other;\n"
    full.toLowerCase.grouped(60).zipWithIndex.foreach { case (line, i) =>
      val grouped = line.grouped(10).mkString(" ")
      val endPos = math.min((i + 1) * 60, full.length)
      sb ++= f"     $grouped%-66s$endPos\n"
    }
    sb ++= "//\n"
    sb.result()
  }

  /** Generate an n-allele release to `<tmp>/hla.synth.<n>.dat`
    * (memoized on disk — ~75 MB at n=35000 takes a few seconds once).
    */
  def materialize(n: Int): Path = {
    val path = Paths.get(System.getProperty("java.io.tmpdir"),
      s"hla.synth.$n.dat")
    if (!Files.exists(path)) {
      val tmp = Files.createTempFile("hla_synth", ".dat")
      val out = Files.newBufferedWriter(tmp)
      try {
        var i = 0
        while (i < n) {
          out.write(record(loci(i % loci.length), i / loci.length))
          i += 1
        }
      } finally out.close()
      try Files.move(tmp, path)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    path
  }
}
