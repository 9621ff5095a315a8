package graft.gfe

/** Static domain constants mirroring the reference build's configuration
  * (gfe-db/pipeline/jobs/build/src/constants.py:7-30).
  */
object GfeConstants {

  /** Alleles excluded from every build (constants.py:7-11). */
  val skipAlleles: Seq[String] = Seq(
    "HLA-DRB5*01:11", "HLA-DRB5*01:12", "HLA-DRB5*01:13",
    "HLA-DRB5*02:03", "HLA-DRB5*02:04", "HLA-DRB5*02:05",
    "HLA-DRB5*01:01:02", "HLA-DRB5*01:03", "HLA-DRB5*01:05",
    "HLA-DRB5*01:06", "HLA-DRB5*01:07", "HLA-DRB5*01:09",
    "HLA-DRB5*01:10N", "HLA-C*05:208N", "HLA-C*05:206")

  /** Loci the build processes (constants.py:13-15). The processable
    * filter also admits bare "DRB5" descriptions (app.py:606-608). */
  val hlaLoci: Seq[String] = Seq(
    "HLA-A", "HLA-B", "HLA-C", "HLA-DRB1", "HLA-DQB1",
    "HLA-DPB1", "HLA-DQA1", "HLA-DPA1", "HLA-DRB3",
    "HLA-DRB4", "HLA-DRB5")

  /** KIR loci admitted when the build runs with the `-k` flag
    * (constants.py:19-21, load_loci at :27). */
  val kirLoci: Seq[String] = Seq(
    "KIR3DS1", "KIR3DP1", "KIR3DL3", "KIR3DL2", "KIR3DL1",
    "KIR2DS5", "KIR2DS4", "KIR2DS3", "KIR2DS2", "KIR2DS1",
    "KIR2DP1", "KIR2DL5B", "KIR2DL5A", "KIR2DL4")

  /** ARD reduction groups computed at build (constants.py:30). Note the
    * loader only materializes G and lg onto IPD_Allele (load.cyp:66-83);
    * lgx rows are built but never loaded — we preserve that behavior. */
  val ardGroups: Seq[String] = Seq("G", "lg", "lgx")

  /** Minimum processable sequence length (exclusive, app.py:609-610). */
  val minSeqLen: Int = 5

  /** "390" -> "3.9.0"; everything longer is char-indexed
    * `d[0].d[1:3].d[3]` (app.py:551-556) — so "3560" -> "3.56.0" and a
    * 5-digit "31240" -> "3.12.4", dropping the 5th char exactly like
    * the reference does. */
  def formatRelease(v: String): String =
    if (v.length == 3) s"${v(0)}.${v(1)}.${v(2)}"
    else s"${v.take(1)}.${v.slice(1, 3)}.${v(3)}"

  /** Inverse of [[formatRelease]] (load.cyp:94-95 `replace(...,".","")`). */
  def compactRelease(v: String): String = v.replace(".", "")
}
