package graft.gfe

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.AlleleRecord
import graft.functions.GraftFunctions

/** The build plane (SURVEY.md §3.1 "Spark shape"): one job turning a
  * release's `Dataset[AlleleRecord]` into the five CSV-relation
  * DataFrames (§1.2) + the error side-channel, with accession
  * assignment and GFE naming done relationally instead of via the
  * reference's per-allele HTTP round-trip to the Feature Service
  * (app.py:371-388 — the reference's main latency source, removed).
  *
  * Scale design:
  *  - the record scan is splittable text (ImgtFlatFile) and feature
  *    explosion is a `flatMap` — linear, no shuffle;
  *  - accession assignment is ONE shuffle on (locus, term, rank)
  *    [dictionary update] + ONE broadcast-or-shuffle join back —
  *    the dictionary is tiny relative to the corpus (unique feature
  *    sequences only), so the join back broadcasts at any realistic
  *    scale;
  *  - GFE naming is a single groupBy(allele) over fixed-width rows
  *    (ordinal, accession), never over raw sequences.
  */
object GfeBuild {

  final case class BuildResult(
      gfeSequences: DataFrame,
      allFeatures: DataFrame,
      allGroups: DataFrame,
      allCds: DataFrame,
      allAlignments: Option[DataFrame],
      errors: DataFrame,
      registry: DataFrame)

  /** P1 + P2 + P3: processable filter, blocklist, optional limit
    * (app.py:597-628); `kir = true` admits the KIR loci as well
    * (constants.py:27 load_loci). */
  def processable(
      ds: Dataset[AlleleRecord], limit: Option[Int] = None,
      kir: Boolean = false): Dataset[AlleleRecord] = {
    val loci = (GfeConstants.hlaLoci ++
      (if (kir) GfeConstants.kirLoci else Nil)).toSet
    val skip = GfeConstants.skipAlleles.toSet
    // limit BEFORE the filter: the reference breaks its enumeration at
    // `idx == limit` over the raw record stream (app.py:598-600), so a
    // limited build sees the first N records, not the first N
    // processable alleles.
    val limited = limit.fold(ds)(n => ds.limit(n))
    limited.filter { r =>
      val locus = r.locus
      (loci.contains(locus) || locus == "DRB5") &&
        r.sequence.length > GfeConstants.minSeqLen &&
        !skip.contains(r.hlaName)
    }
  }

  /** Structural ordinal of a feature within the GFE name
    * (introduction.rst:33-38) as a codegen'd column. */
  private def ordinalCol(term: org.apache.spark.sql.Column,
      rank: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(term === "FIVE_PRIME_UTR", lit(0))
      .when(term === "EXON", rank * 2 - 1)
      .when(term === "INTRON", rank * 2)
      .when(term === "THREE_PRIME_UTR", lit(Int.MaxValue))
      .otherwise(lit(Int.MaxValue - 1)) // match Features.ordinal: unknown
      // terms sort just before the 3'UTR, by structure not accession

  /** Accession-dictionary update (J3/§2.5, SURVEY §7.4 hard part 1).
    *
    * `registry` columns: locus, term, rank, sequence, accession.
    * New (locus, term, rank, sequence) keys get
    * `max(existing accession in partition) + dense_rank(first_seen)`;
    * existing keys keep their accession forever — first-come-global,
    * matching the reference Feature Service's append-only semantics.
    */
  def updateRegistry(registry: DataFrame, feats: DataFrame): DataFrame = {
    val keyCols = Seq("locus", "term", "rank", "sequence")
    val incoming = feats
      .groupBy(keyCols.map(col): _*)
      .agg(min(col("first_seen")).as("first_seen"))
    val fresh = incoming.join(registry, keyCols, "left_anti")
    val base = registry.groupBy("locus", "term", "rank")
      .agg(max(col("accession")).as("base_acc"))
    val w = Window.partitionBy("locus", "term", "rank")
      .orderBy(col("first_seen"), col("sequence"))
    val assigned = fresh
      .join(base, Seq("locus", "term", "rank"), "left")
      .withColumn("accession",
        coalesce(col("base_acc"), lit(0L)) + dense_rank().over(w))
      .select(col("locus"), col("term"), col("rank"), col("sequence"),
        col("accession").cast("long").as("accession"))
    // Cap the union's partition count (narrow coalesce, no shuffle):
    // a registry FOLD feeds each step's output back in as the next
    // step's input, and a union's partitioning is the concatenation
    // of its children's — uncapped, the carried registry gains the
    // window output's partitions EVERY release and a 57-release fold
    // ends up scanning hundreds of splinter partitions per step (two
    // registry scans per step — the anti-join and the base-accession
    // agg — each paying a task launch per splinter). r15 opt; the cap
    // is the session's own parallelism, so a genuinely large registry
    // still scans wide.
    registry.select("locus", "term", "rank", "sequence", "accession")
      .unionByName(assigned)
      .coalesce(registry.sparkSession.sparkContext.defaultParallelism)
  }

  /** Empty registry with the canonical schema. */
  def emptyRegistry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, Int, String, Long)]
      .toDF("locus", "term", "rank", "sequence", "accession")
  }

  /** Persist the accession dictionary (SURVEY §7.4 hard part 1: the
    * append-only state carried across release builds). Partitioned by
    * locus — the dictionary join's natural pruning key, so a
    * single-locus build reads one partition. */
  def writeRegistry(reg: DataFrame, path: String): Unit =
    reg.write.mode("overwrite").partitionBy("locus").parquet(path)

  def readRegistry(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select("locus", "term", "rank", "sequence", "accession")

  /** Build one release.
    *
    * @param records   parsed allele records (already release-scoped)
    * @param release   compact release id, e.g. "3560"
    * @param registry  accession dictionary carried across releases
    * @param ard       optional ARD reduction table
    *                  (hla_name, ard_name, ard_id) — the pyard redux
    *                  lookup (J2) as a broadcast join
    * @param alignments optional alignment table
    *                  (label, locus, hla_name, alignment) — the MSF
    *                  lookup (J1) as a broadcast join
    */
  def run(
      spark: SparkSession,
      records: Dataset[AlleleRecord],
      release: String,
      registry: Option[DataFrame] = None,
      ard: Option[DataFrame] = None,
      alignments: Option[DataFrame] = None,
      limit: Option[Int] = None,
      kir: Boolean = false): BuildResult = {
    import spark.implicits._
    val imgtRelease = GfeConstants.formatRelease(release)
    // Error timestamp is stamped ONCE at build time (not
    // current_timestamp(), which re-evaluates on every action over the
    // lazy plan): every materialization of the errors relation agrees,
    // matching the reference's behavior of writing each NDJSON line at
    // failure time exactly once (app.py:630-639).
    val buildStamp = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())

    val alleles = processable(records, limit, kir)

    // Stable first-seen index = file order: monotonically_increasing_id
    // is (partitionId << 33) + in-partition offset and file-scan
    // partition ids follow split order, so ids are non-contiguous but
    // ORDER-preserving — all first_seen consumers only order/join on
    // it. Plan-native (unlike rdd.zipWithIndex: an extra count job +
    // RDD round-trip out of codegen); cached so features and CDS
    // derive from one assignment.
    val indexedRecs = alleles
      .select(struct(col("*")).as("_1"),
        monotonically_increasing_id().as("_2"))
      .as[(AlleleRecord, Long)]
      .cache()

    val indexed = indexedRecs
      .select(col("_2").as("idx"), col("_1").as("rec"))
      .select(
        col("idx"),
        col("rec.accession").as("acc_name"),
        col("rec.description").as("description"),
        col("rec.sequence").as("sequence"))
      .withColumn("hla_name", split(col("description"), ",").getItem(0))
      .withColumn("locus", split(col("hla_name"), "\\*").getItem(0))
      .cache()

    // P6: feature explosion (typed flatMap — record-local, no shuffle).
    val feats = indexedRecs.flatMap { case (r, i) =>
      Features.extract(r).map(f =>
        (i, r.accession, r.hlaName, r.locus, f.term.toUpperCase, f.rank, f.sequence))
    }.toDF("idx", "acc_name", "hla_name", "locus", "term", "rank", "sequence")
      .withColumn("first_seen", col("idx"))
      .cache()

    // J3: dictionary update + join back. NO forced broadcast: the
    // registry carries full feature sequences, so broadcasting it
    // pins the whole dictionary in the driver + every executor and
    // OOMs at 100× scale. Let Catalyst/AQE pick (it still broadcasts
    // adaptively while the registry is actually small); the
    // SequenceJoinRewrite rule leads the shuffle comparison with the
    // fixed-width 60-bit sequence hash.
    val reg = updateRegistry(
      registry.getOrElse(emptyRegistry(spark)), feats).cache()

    val featsAcc = feats.join(reg,
      Seq("locus", "term", "rank", "sequence"))

    // GFE name: ordered accession aggregation per allele
    // (introduction.rst:33-38). py-gfe fills the locus structure with
    // accession 0 for positions the allele lacks (partial sequences),
    // so every allele of a locus gets one slot per structure position.
    // Structure derives from the registry — append-only, so it is
    // stable across releases. Fixed-width structs only.
    val structure = reg.select("locus", "term", "rank").distinct()
    val slots = indexed.select(col("idx"), col("locus"))
      .join(broadcast(structure), Seq("locus"))
    val names = slots
      .join(featsAcc.select("idx", "locus", "term", "rank", "accession"),
        Seq("idx", "locus", "term", "rank"), "left")
      .withColumn("accession", coalesce(col("accession"), lit(0L)))
      .withColumn("ordinal", ordinalCol(col("term"), col("rank")))
      .groupBy("idx")
      .agg(
        first(col("locus")).as("locus"),
        concat_ws("-",
          transform(
            array_sort(collect_list(struct(col("ordinal"), col("accession")))),
            x => x.getField("accession").cast("string"))).as("acc_list"))
      .select(col("idx"),
        concat(col("locus"), lit("w"), col("acc_list")).as("gfe_name"))

    val withGfe = indexed.join(names, Seq("idx"), "left")
      .withColumn("gfe_name", coalesce(col("gfe_name"), col("locus")))
      .cache()

    // gfe_sequences (app.py:224-246).
    val gfeSequences = withGfe.select(
      col("gfe_name"),
      col("acc_name"),
      col("locus"),
      col("hla_name"),
      GraftFunctions.seqHash(col("sequence")).as("seq_id"),
      col("sequence"),
      length(col("sequence")).cast("long").as("length"),
      lit(imgtRelease).as("imgt_release"))

    // all_features (app.py:249-266): term already upper-cased; the
    // reference's hash_code arrives null from the service → "none".
    val allFeatures = featsAcc
      .join(names, Seq("idx"))
      .select(
        col("accession"),
        lit("none").as("hash_code"),
        col("locus"),
        col("rank"),
        col("sequence"),
        col("term"),
        col("gfe_name"),
        col("acc_name").as("allele_id"),
        col("hla_name"),
        lit(imgtRelease).as("imgt_release"))

    // all_groups (app.py:324-342): one row per (allele, ard group);
    // unreduced groups → empty strings (app.py:332-333). lgx is built
    // here and — preserving the reference quirk — never graph-loaded.
    val groupsSeed = withGfe.select("gfe_name", "acc_name", "hla_name", "locus")
      .crossJoin(GfeConstants.ardGroups.toDF("grp"))
    val allGroups = ard.fold(
      groupsSeed.withColumn("ard_id", lit("")).withColumn("ard_name", lit(""))) {
      ardDf =>
        groupsSeed.join(
          broadcast(ardDf.select(col("hla_name"), col("ard_name").as("grp"),
            col("ard_id").as("red_id"))),
          Seq("hla_name", "grp"), "left")
          .withColumn("ard_id", coalesce(col("red_id"), lit("")))
          .withColumn("ard_name", when(col("red_id").isNotNull, col("grp"))
            .otherwise(lit("")))
    }.select(
      col("gfe_name"), col("acc_name").as("allele_id"), col("hla_name"),
      col("ard_id"), col("ard_name"), col("locus"),
      lit(imgtRelease).as("imgt_release"))

    // all_cds (app.py:345-368) + error channel (app.py:630-639: a
    // missing CDS/translation raises per-allele; earlier relations keep
    // the allele's rows — same partial-write semantics as the loop).
    val cdsRaw = indexedRecs.map { case (r, i) =>
      val cds = Features.extractCds(r)
      (i, cds.map(_._1).orNull, cds.map(_._2).orNull)
    }.toDF("idx", "bp_sequence", "aa_sequence")
    val allCds = cdsRaw.where(col("bp_sequence").isNotNull)
      .join(withGfe.select("idx", "gfe_name"), Seq("idx"))
      .select(
        col("gfe_name"),
        GraftFunctions.seqHash(col("bp_sequence")).as("bp_seq_id"),
        col("bp_sequence"),
        GraftFunctions.seqHash(col("aa_sequence")).as("aa_seq_id"),
        col("aa_sequence"))
    // Error rows mirror the reference NDJSON shape (app.py:630-639):
    // timestamp (UTC ISO-8601 to millis, matching
    // datetime.utcnow().isoformat()[:-3]), allele_id/release/error plus
    // index (enumeration position — order-preserving, non-contiguous at
    // scale), stack_trace (the raise site; ours is the relational
    // classifier, not a Python traceback), and a data struct of the
    // parsed record metadata (the subset of allele_error_fields we
    // genuinely carry).
    val errors = cdsRaw.where(col("bp_sequence").isNull)
      .join(withGfe.select("idx", "acc_name", "hla_name", "description"),
        Seq("idx"))
      .select(
        lit(buildStamp).as("timestamp"),
        col("acc_name").as("allele_id"),
        col("hla_name"),
        lit(release).as("release"),
        lit("missing CDS translation").as("error"),
        col("idx").as("index"),
        lit("graft.gfe.Features.extractCds: no CDS feature with translation")
          .as("stack_trace"),
        struct(col("acc_name").as("id"),
          col("description").as("description")).as("data"))

    // all_alignments (app.py:269-321): join on (locus, hla_name);
    // absent alignment → no row. rank is the reference's hard-coded
    // "0" (app.py:296). NOT force-broadcast: alignment strings are
    // kilobases per allele, so the table grows with the catalog —
    // AQE broadcasts it only while it is actually small.
    val allAlignments = alignments.map { al =>
      withGfe.select("gfe_name", "hla_name", "locus")
        .join(al, Seq("locus", "hla_name"))
        .select(
          col("label"),
          GraftFunctions.seqHash(col("alignment")).as("seq_id"),
          col("gfe_name"),
          col("hla_name"),
          length(col("alignment")).cast("long").as("length"),
          lit("0").as("rank"),
          when(col("label") =!= "PROT_ALIGN", col("alignment"))
            .otherwise(lit("")).as("bp_sequence"),
          when(col("label") === "PROT_ALIGN", col("alignment"))
            .otherwise(lit("")).as("aa_sequence"),
          lit(imgtRelease).as("imgt_release"))
    }

    BuildResult(gfeSequences, allFeatures, allGroups, allCds,
      allAlignments, errors, reg)
  }
}
