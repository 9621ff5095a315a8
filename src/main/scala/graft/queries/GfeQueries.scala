package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.gfe.{ArdReduction, GfeBuild}
import graft.graph.{GraphLoad, GraphQueries}
import graft.ingest.{ImgtFlatFile, MsfAlignments}

/** The reference's own domain surface (SURVEY.md §3) run end-to-end on
  * the bundled two-release IMGT fixture: flat-file scan → build
  * relations → graph MERGE → validation/traversal queries.
  *
  * Oracle strategy: the INPUT is an EMBL flat file, not a parquet
  * table, so DuckDB cannot replay the build itself — the build
  * relations (`gfe_build_*`) stay rows-only, their semantics carried
  * by GfeBuildSpec/GraphLoadSpec goldens. But every aggregation /
  * traversal DOWNSTREAM of the graph is relational: [[dumpAux]]
  * snapshots the 11 graph tables to a well-known parquet directory
  * during Verify, and those queries carry real DuckDB oracles that
  * recompute the aggregation independently (`read_parquet` over the
  * snapshot — counts, unnests, joins, EXISTS checks, and a recursive
  * CTE for BFS). The snapshot is the trust boundary: node/edge
  * CONSTRUCTION is spec-tested, query semantics are hash-verified.
  */
object GfeQueries {

  /** Well-known aux-snapshot directory referenced by the gfe oracle
    * SQL. Absolute so the driver's DuckDB session resolves it
    * regardless of its working directory. */
  val auxDir = "/tmp/graft_verify_aux"
  private def aux(table: String): String =
    s"read_parquet('$auxDir/$table/*.parquet')"

  /** Dump the fixture graph's vertex+edge tables AND the release-3560
    * build relations to [[auxDir]] for the DuckDB oracle replay.
    * Called by [[graft.Verify]]; fixture tables are tiny, so
    * coalesce(1) keeps each dump one task/file. */
  def dumpAux(s: SparkSession): Unit = {
    val g = graph(s)
    val r = build(s, "3560")
    // the single-release refold — the as-of/CDC oracles'
    // ground truth for the store's state at its FIRST marker
    val g1 = GraphLoad.loadAll(s,
      Seq(("3560", r.gfeSequences, r.allFeatures, r.allGroups)))
    val tables =
      g.vertexTables.map { case (k, v) => s"v_$k" -> v } ++
        g.edgeTables.map { case (k, v) => s"e_$k" -> v } ++
        Map("r1_e_HAS_IPD_ALLELE" -> g1.hasIpdAllele,
          // the as-of traversal oracle (gfe_incremental_khop_asof)
          // replays a 3-hop join over the FIRST release's graph
          "r1_e_HAS_FEATURE" -> g1.hasFeature,
          "r1_v_Feature" -> g1.feature) ++
        Map(
          "b_gfe_sequences" -> r.gfeSequences,
          "b_all_features" -> r.allFeatures,
          "b_all_groups" -> r.allGroups,
          "b_all_cds" -> r.allCds) ++
        r.allAlignments.map("b_all_alignments" -> _)
    tables.foreach { case (name, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$auxDir/$name")
    }
  }

  /** The reference seq_hasher (P5, app.py:86-94) replayed in DuckDB:
    * first 32 decimal digits of the md5 digest read as an unsigned
    * big-endian 128-bit integer. DuckDB 1.0's `md5_number_*` read the
    * digest little-endian, so the value is rebuilt from the hex form
    * in three ≤60-bit pieces (BIGINT can parse 15 hex digits; the
    * pieces recombine in UHUGEINT, whose full unsigned range covers
    * the digest). NULL input → NULL, matching the Spark UDF. */
  private def md5dec32(c: String): String =
    s"""substr(CAST(((CAST(CAST(('0x'||substr(md5($c),1,2)) AS BIGINT) AS UHUGEINT)
       |  * CAST('1152921504606846976' AS UHUGEINT)
       |  + CAST(CAST(('0x'||substr(md5($c),3,15)) AS BIGINT) AS UHUGEINT))
       |  * CAST('1152921504606846976' AS UHUGEINT)
       |  + CAST(CAST(('0x'||substr(md5($c),18,15)) AS BIGINT) AS UHUGEINT))
       | AS VARCHAR), 1, 32)""".stripMargin.replace("\n", " ")

  // Build results memoized per (session, release): GfeBuild caches its
  // intermediates, so re-invoking it would rebuild fresh plans and
  // re-execute the pipeline per driver-contract query. Weak session
  // keys keep stopped sessions collectable.
  private val buildCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, GfeBuild.BuildResult]]())

  /** The fixture MSF alignments — the reference's `-a` path downloads
    * all three `{loc}_{gen,nuc,prot}.msf` per locus
    * (get_alignments.sh:16-65; labels app.py:273-279), so the fixture
    * threads all three labels end-to-end. */
  private def fixtureAlignments(s: SparkSession): DataFrame =
    MsfAlignments.toRelation(s, Map(
      ("HLA-A", "gen") -> ImgtFlatFile.resourceText("/graft/A_gen.msf"),
      ("HLA-A", "nuc") -> ImgtFlatFile.resourceText("/graft/A_nuc.msf"),
      ("HLA-A", "prot") -> ImgtFlatFile.resourceText("/graft/A_prot.msf")))

  /** NOTE: the cache key ignores `reg` — fine here because each
    * release is only ever built with one registry lineage (3560 from
    * empty, 3570 from 3560). */
  private def build(s: SparkSession, rel: String,
      reg: Option[DataFrame] = None): GfeBuild.BuildResult = {
    val perSession = buildCache.synchronized {
      var m = buildCache.get(s)
      if (m == null) { m = scala.collection.mutable.Map.empty; buildCache.put(s, m) }
      m
    }
    perSession.synchronized {
      perSession.getOrElseUpdate(rel, {
        val recs = ImgtFlatFile.fromText(s,
          ImgtFlatFile.resourceText(s"/graft/hla.$rel.dat"))
        // ARD reduction table (J2) derived from the release's allele
        // names — real values flow into all_groups / IPD_Allele.G/lg.
        val ard = ArdReduction.fromNames(
          recs.toDF().select(org.apache.spark.sql.functions
            .split(org.apache.spark.sql.functions.col("description"), ",")
            .getItem(0).as("hla_name")))
        GfeBuild.run(s, recs, rel, registry = reg, ard = Some(ard),
          alignments = Some(fixtureAlignments(s)))
      })
    }
  }

  // The fixture graph is immutable per session — memoize so each
  // driver-contract query doesn't re-run the two-release pipeline.
  // Weak keys: stopped sessions must stay collectable.
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, GraphLoad.Graph]())

  /** Materialize the fixture graph snapshot (untimed bench warm-up).
    * The one-time two-release build + parquet dump is a *load* cost —
    * measured by gfe_scale_build/load — not a query cost; without this
    * hook whichever gfe_* query ran first absorbed ~13 s of it. */
  def warm(s: SparkSession): Unit = {
    graph(s)
    // the incremental store twin too: its one-time init+applyRelease
    // (store creation is a *load* cost) must not land inside
    // whichever gfe_incremental_* query happens to run first
    incrementalGraph(s)
    ()
  }

  private def graph(s: SparkSession): GraphLoad.Graph =
    cache.synchronized {
      val hit = cache.get(s)
      if (hit != null) hit
      else {
        val g = buildGraph(s)
        cache.put(s, g)
        g
      }
    }

  // The INCREMENTAL twin of the fixture graph: release 3560 loaded as
  // a one-shot refold, then 3570 MERGEd into the bucketed store
  // (GraphStore.applyRelease) — the reference's actual per-release
  // operating mode (load.cyp:7,93-95; asl.json:153). The gfe_incremental_*
  // oracles compare this store-built graph against the aux snapshot of
  // the REFOLD graph, so the driver hash-verifies
  // `loadAll(r1, r2) == applyRelease(loadAll(r1), r2)` end-to-end
  // through the store plumbing.
  private val incCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, (String, GraphLoad.Graph)]())

  /** (store dir, served graph) — the dir stays exposed so
    * gfe_incremental_probe can exercise the PUBLIC bucket-pruned
    * point read against the same store. */
  private def incrementalStore(s: SparkSession): (String, GraphLoad.Graph) =
    incCache.synchronized {
      val hit = incCache.get(s)
      if (hit != null) hit
      else {
        val r1 = build(s, "3560")
        val r2 = build(s, "3570", Some(r1.registry))
        val dir = java.nio.file.Files
          .createTempDirectory("graft_fixture_inc_store").toString
        // dual-anchor: the driver oracle then exercises twin
        // maintenance end-to-end (init + applyRelease through both
        // layouts), and gfe_incremental_varlen's reverse orientations
        // are bucket-pruned probes instead of semi-join fallbacks;
        // keyBlooms: every probe under the gfe_incremental_* tier now
        // runs through the bloom miss-gate (round 15) — the hash
        // oracles verify the gated reads serve exactly the refold
        // zoneMaps: every manifest under the tier also carries
        // per-bucket min/max column stats (round 15b) — the hash
        // oracles verify stats maintenance through init + applyRelease
        // never perturbs served data, and gfe_store_sql_range reads
        // through the range-pruning path
        graft.graph.GraphStore.init(s, dir, GraphLoad.loadAll(s,
          Seq(("3560", r1.gfeSequences, r1.allFeatures, r1.allGroups))),
          dualAnchor = true, keyBlooms = true, zoneMaps = true)
        graft.graph.GraphStore.applyRelease(s, dir,
          ("3570", r2.gfeSequences, r2.allFeatures, r2.allGroups))
        val entry = (dir, graft.graph.GraphStore.read(s, dir))
        incCache.put(s, entry)
        entry
      }
    }

  private def incrementalGraph(s: SparkSession): GraphLoad.Graph =
    incrementalStore(s)._2

  // The CHANGE FEED run against its own store twin (the feed's
  // checkpoint must witness marker 0 BEFORE release 3570 lands, so it
  // cannot share the fully-folded incrementalStore): init(3560) →
  // AvailableNow pass (bootstrap snapshot batch) → applyRelease(3570)
  // → AvailableNow pass (the m0→m1 diff batch), both appended to one
  // parquet sink through one checkpoint — the reference's actual
  // per-release cadence (one pipeline execution per release,
  // asl.json:153) driven through spark.readStream.
  private val feedCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, DataFrame]())

  private def feedRows(s: SparkSession): DataFrame = feedCache.synchronized {
    val hit = feedCache.get(s)
    if (hit != null) hit
    else {
      import org.apache.spark.sql.functions._
      val r1 = build(s, "3560")
      val r2 = build(s, "3570", Some(r1.registry))
      def tmp(tag: String) =
        java.nio.file.Files.createTempDirectory(tag).toString
      val dir = tmp("graft_fixture_feed_store")
      val out = tmp("graft_fixture_feed_out")
      val chk = tmp("graft_fixture_feed_chk")
      graft.graph.GraphStore.init(s, dir, GraphLoad.loadAll(s,
        Seq(("3560", r1.gfeSequences, r1.allFeatures, r1.allGroups))))
      def pass(): Unit = {
        val q = s.readStream.format("graftstore")
          .option("dir", dir).option("table", "HAS_IPD_ALLELE").load()
          .select(col("change"), col("src"), col("dst"),
            concat_ws(",", col("releases")).as("releases"))
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", chk)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      pass()
      graft.graph.GraphStore.applyRelease(s, dir,
        ("3570", r2.gfeSequences, r2.allFeatures, r2.allGroups))
      pass()
      val df = s.read.parquet(out)
      feedCache.put(s, df)
      df
    }
  }

  // The SINK closing the loop declaratively (GraftStoreSink,
  // df.writeStream.format("graftstore")): the change feed of the
  // store's HAS_IPD_ALLELE table folded — policy=cdc — into a REPLICA
  // store through the real engine, one AvailableNow pass per release
  // (bootstrap snapshot batch, then the m0→m1 diff batch), exactly the
  // continuous store-to-store pipeline a 100 TB deployment runs
  // (mirror a table, maintain a derived store) with no graft API
  // beyond the format name. The replica's served state must equal the
  // two-release refold's table bit-for-bit.
  private val replicaCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, DataFrame]())

  private def replicaRows(s: SparkSession): DataFrame =
    replicaCache.synchronized {
      val hit = replicaCache.get(s)
      if (hit != null) hit
      else {
        val r1 = build(s, "3560")
        val r2 = build(s, "3570", Some(r1.registry))
        def tmp(tag: String) =
          java.nio.file.Files.createTempDirectory(tag).toString
        val dir = tmp("graft_fixture_repl_store")
        val replica = tmp("graft_fixture_repl_dst")
        val chk = tmp("graft_fixture_repl_chk")
        graft.graph.GraphStore.init(s, dir, GraphLoad.loadAll(s,
          Seq(("3560", r1.gfeSequences, r1.allFeatures, r1.allGroups))))
        def pass(): Unit = {
          val q = s.readStream.format("graftstore")
            .option("dir", dir).option("table", "HAS_IPD_ALLELE").load()
            .writeStream.format("graftstore")
            .option("path", replica).option("keys", "src,dst")
            .option("policy", "cdc")
            .option("checkpointLocation", chk)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        pass()
        graft.graph.GraphStore.applyRelease(s, dir,
          ("3570", r2.gfeSequences, r2.allFeatures, r2.allGroups))
        pass()
        val df = s.read.format("graftstore").option("path", replica)
          .load().drop("_graft_bucket")
        replicaCache.put(s, df)
        df
      }
    }

  private def buildGraph(s: SparkSession): GraphLoad.Graph = {
      val r1 = build(s, "3560")
      val r2 = build(s, "3570", Some(r1.registry))
      val g = GraphLoad.loadAll(s, Seq(
        ("3560", r1.gfeSequences, r1.allFeatures, r1.allGroups),
        ("3570", r2.gfeSequences, r2.allFeatures, r2.allGroups)))
      // Materialize the whole graph to parquet ONCE (S10 dump), then
      // serve every query from the snapshot. Lazy .cache() made each
      // driver-contract query pay the two-release build pipeline again
      // for whichever vertex tables the previous query didn't touch.
      // Fixture tables are tiny — coalesce(1) so each of the 11 writes
      // is one task/file instead of 32 (production snapshots keep
      // their partitioning; this is the small-graph path).
      val c = GraphLoad.Graph(
        g.gfe.coalesce(1), g.sequence.coalesce(1), g.feature.coalesce(1),
        g.ipdAllele.coalesce(1), g.ipdAccession.coalesce(1),
        g.submitter.coalesce(1), g.hasIpdAllele.coalesce(1),
        g.hasIpdAccession.coalesce(1), g.submitted.coalesce(1),
        g.hasSequence.coalesce(1), g.hasFeature.coalesce(1))
      val dir = java.nio.file.Files
        .createTempDirectory("graft_fixture_graph").toString
      GraphLoad.write(c, dir)
      GraphLoad.read(s, dir)
  }

  val all: Seq[QueryDef] = Seq(
    // S1+P1-P8+J3+§2.5: full build of one release. Oracled (round 8)
    // through the aux-snapshot trust boundary, same as the graph
    // tier: the snapshot carries the raw payload columns, and the
    // oracle RE-DERIVES every derivable column independently in
    // DuckDB — seq_id via the 128-bit md5 reconstruction (P5),
    // length = len(sequence), locus = hla_name before '*' (P4),
    // imgt_release = the P9 formatting of "3560" — and asserts the
    // declared row policies of the reference's validator
    // (validate_build_output/app.py:165-198): exact column sets,
    // hash_code's null→"none" default, upper-case terms.
    QueryDef("gfe_build_sequences",
      s"""SELECT gfe_name, acc_name,
         |       split_part(hla_name, '*', 1) AS locus, hla_name,
         |       ${md5dec32("sequence")} AS seq_id, sequence,
         |       CAST(length(sequence) AS BIGINT) AS length,
         |       '3.56.0' AS imgt_release
         |FROM ${aux("b_gfe_sequences")}
         |ORDER BY hla_name""".stripMargin)((s, _) =>
      build(s, "3560").gfeSequences.orderBy("hla_name")),
    QueryDef("gfe_build_features",
      s"""SELECT accession, 'none' AS hash_code,
         |       split_part(hla_name, '*', 1) AS locus, rank, sequence,
         |       upper(term) AS term, gfe_name, allele_id, hla_name,
         |       '3.56.0' AS imgt_release
         |FROM ${aux("b_all_features")}
         |ORDER BY hla_name, term, rank""".stripMargin)((s, _) =>
      build(s, "3560").allFeatures.orderBy("hla_name", "term", "rank")),
    // S2+J1: alignments end-to-end — the `-a` build path (MSF fixture
    // broadcast-joined through the build, app.py:269-321). Exactly one
    // of bp/aa carries the alignment (the other is ''), so seq_id and
    // length re-derive from their concatenation; rank is the
    // reference's hard-coded "0" (app.py:296).
    QueryDef("gfe_build_alignments",
      s"""SELECT label,
         |       ${md5dec32("(bp_sequence || aa_sequence)")} AS seq_id,
         |       gfe_name, hla_name,
         |       CAST(length(bp_sequence || aa_sequence) AS BIGINT) AS length,
         |       '0' AS rank,
         |       CASE WHEN label = 'PROT_ALIGN' THEN '' ELSE bp_sequence END
         |         AS bp_sequence,
         |       CASE WHEN label = 'PROT_ALIGN' THEN aa_sequence ELSE '' END
         |         AS aa_sequence,
         |       '3.56.0' AS imgt_release
         |FROM ${aux("b_all_alignments")}
         |ORDER BY label, hla_name""".stripMargin)((s, _) =>
      build(s, "3560").allAlignments.get.orderBy("label", "hla_name")),
    // J2: all_groups with a real reduction table threaded through —
    // reduced alleles carry G/lg/lgx ids, unreduced stay empty. The
    // oracle additionally asserts the (ard_id='') ⇔ (ard_name='')
    // pairing policy (app.py:332-333) by re-deriving ard_name's
    // emptiness from ard_id's.
    QueryDef("gfe_build_groups",
      s"""SELECT gfe_name, allele_id, hla_name, ard_id,
         |       CASE WHEN ard_id = '' THEN '' ELSE ard_name END AS ard_name,
         |       split_part(hla_name, '*', 1) AS locus,
         |       '3.56.0' AS imgt_release
         |FROM ${aux("b_all_groups")}
         |ORDER BY hla_name, ard_name""".stripMargin)((s, _) =>
      build(s, "3560").allGroups.orderBy("hla_name", "ard_name")),
    // P7: all_cds (app.py:345-368) — both seq ids re-derived via the
    // md5 reconstruction; aa may be NULL (untranslatable CDS keeps
    // the bp row), and NULL propagates identically on both engines.
    QueryDef("gfe_build_cds",
      s"""SELECT gfe_name,
         |       ${md5dec32("bp_sequence")} AS bp_seq_id, bp_sequence,
         |       ${md5dec32("aa_sequence")} AS aa_seq_id, aa_sequence
         |FROM ${aux("b_all_cds")}
         |ORDER BY gfe_name""".stripMargin)((s, _) =>
      build(s, "3560").allCds.orderBy("gfe_name")),
    // A1: per-label node counts over the merged two-release graph.
    // Oracle: independent per-table counts over the aux snapshot.
    QueryDef("gfe_graph_label_counts",
      s"""SELECT 'Feature' AS label, count(*) AS n FROM ${aux("v_Feature")}
         |UNION ALL SELECT 'GFE', count(*) FROM ${aux("v_GFE")}
         |UNION ALL SELECT 'IPD_Accession', count(*) FROM ${aux("v_IPD_Accession")}
         |UNION ALL SELECT 'IPD_Allele', count(*) FROM ${aux("v_IPD_Allele")}
         |UNION ALL SELECT 'Sequence', count(*) FROM ${aux("v_Sequence")}
         |UNION ALL SELECT 'Submitter', count(*) FROM ${aux("v_Submitter")}""".stripMargin)(
      (s, _) => GraphQueries.labelCounts(graph(s))),
    // A2: releases histogram over HAS_IPD_ALLELE (UNWIND ≡ unnest).
    QueryDef("gfe_releases_histogram",
      s"""SELECT release_version, count(*) AS count FROM (
         |  SELECT unnest(list_distinct(releases)) AS release_version
         |  FROM ${aux("e_HAS_IPD_ALLELE")})
         |GROUP BY release_version ORDER BY release_version""".stripMargin)(
      (s, _) => GraphQueries.releasesHistogram(graph(s))),
    // J8: the documented 2-hop traversal (17-row golden shape).
    // Oracle: the traversal re-derived as a relational join over the
    // snapshot's edge tables.
    QueryDef("gfe_allele_features",
      s"""SELECT DISTINCT hf.term AS term, hf.rank AS rank
         |FROM ${aux("e_HAS_FEATURE")} hf
         |JOIN ${aux("e_HAS_IPD_ALLELE")} ha ON hf.src = ha.src
         |WHERE ha.dst = 'HLA-A*01:01:01:01'
         |ORDER BY term, rank""".stripMargin)(
      (s, _) => GraphQueries.alleleFeatures(graph(s), "HLA-A*01:01:01:01")),
    // GFE history (reference.rst:88-96) — the reference's second
    // documented analytical query: GFE names of an allele with the
    // releases each was observed in (array serialized for a stable
    // parquet dump).
    QueryDef("gfe_history",
      s"""SELECT src AS gfe_name, array_to_string(releases, ',') AS releases
         |FROM ${aux("e_HAS_IPD_ALLELE")}
         |WHERE dst = 'HLA-A*01:01:01:01' ORDER BY gfe_name""".stripMargin)(
      (s, _) => {
      import org.apache.spark.sql.functions._
      GraphQueries.gfeHistory(graph(s), "HLA-A*01:01:01:01")
        .withColumn("releases", concat_ws(",", col("releases")))
    }),
    // A3: HAS_IPD_ACCESSION release counts
    // (execute_validation_queries/app.py:79).
    QueryDef("gfe_accession_release_counts",
      s"""SELECT release, count(*) AS count
         |FROM ${aux("e_HAS_IPD_ACCESSION")}
         |GROUP BY release ORDER BY release""".stripMargin)(
      (s, _) => GraphQueries.accessionReleaseCounts(graph(s))),
    // SHOW CONSTRAINTS parity: per-constraint validation report (6
    // rows; `violated` must be all-false on a healthy graph). Oracle:
    // each uniqueness invariant as an EXISTS over the snapshot.
    QueryDef("gfe_constraints",
      s"""SELECT 'gfe_name_unique' AS constraint_name, EXISTS(
         |  SELECT 1 FROM ${aux("v_GFE")} GROUP BY name HAVING count(*) > 1) AS violated
         |UNION ALL SELECT 'sequence_name_unique', EXISTS(
         |  SELECT 1 FROM ${aux("v_Sequence")} GROUP BY name HAVING count(*) > 1)
         |UNION ALL SELECT 'ipd_allele_name_unique', EXISTS(
         |  SELECT 1 FROM ${aux("v_IPD_Allele")} GROUP BY name HAVING count(*) > 1)
         |UNION ALL SELECT 'ipd_accession_name_unique', EXISTS(
         |  SELECT 1 FROM ${aux("v_IPD_Accession")} GROUP BY name HAVING count(*) > 1)
         |UNION ALL SELECT 'submitter_email_unique', EXISTS(
         |  SELECT 1 FROM ${aux("v_Submitter")} GROUP BY email HAVING count(*) > 1)
         |UNION ALL SELECT 'feature_composite_unique', EXISTS(
         |  SELECT 1 FROM ${aux("v_Feature")}
         |  GROUP BY locus, rank, term, accession, sequence HAVING count(*) > 1)""".stripMargin)(
      (s, _) => GraphQueries.constraintReport(graph(s))),
    // Generic motif traversal (the ad-hoc Cypher-path surface): the
    // documented 2-hop re-expressed through Motif.path must reproduce
    // the 17-row golden shape. Same relational oracle as
    // gfe_allele_features — the two Spark paths (broadcast join vs
    // Motif composition) must agree with it AND each other.
    QueryDef("gfe_motif_2hop",
      s"""SELECT DISTINCT hf.term AS term, hf.rank AS rank
         |FROM ${aux("e_HAS_FEATURE")} hf
         |JOIN ${aux("e_HAS_IPD_ALLELE")} ha ON hf.src = ha.src
         |WHERE ha.dst = 'HLA-A*01:01:01:01'
         |ORDER BY term, rank""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions._
      import graft.graph.Motif
      Motif.path(graph(s), Seq(
        Motif.Hop("HAS_IPD_ALLELE", reverse = true),
        Motif.Hop("HAS_FEATURE")))
        .where(col("n0") === "HLA-A*01:01:01:01")
        .select(col("e1_term").as("term"), col("e1_rank").as("rank"))
        .dropDuplicates("term", "rank")
        .orderBy("term", "rank")
    }),
    // Variable-length traversal (Cypher `-[*1..3]-`, undirected —
    // the everyday ad-hoc idiom reference.rst:34-37 is written in,
    // which the fixed-hop Motif.path cannot express): simple-path
    // reachability with multiplicity over the GFE–IPD_Allele–
    // IPD_Accession subgraph. Oracle: a DuckDB recursive CTE
    // enumerating the SAME node-distinct walks (list-visited guard)
    // over the aux edge snapshot — dist/counts are exact integers,
    // full hash parity.
    QueryDef("gfe_motif_varlen",
      s"""WITH RECURSIVE e0 AS (
         |  SELECT CAST(src AS VARCHAR) AS a, CAST(dst AS VARCHAR) AS b
         |  FROM ${aux("e_HAS_IPD_ALLELE")}
         |  UNION SELECT CAST(src AS VARCHAR), CAST(dst AS VARCHAR)
         |  FROM ${aux("e_HAS_IPD_ACCESSION")}),
         |e AS (SELECT a, b FROM e0 WHERE a <> b
         |      UNION SELECT b, a FROM e0 WHERE a <> b),
         |walk(n_start, n_end, visited, len) AS (
         |  SELECT a, b, [a, b], 1 FROM e
         |  UNION ALL
         |  SELECT w.n_start, e.b, list_append(w.visited, e.b), w.len + 1
         |  FROM walk w JOIN e ON e.a = w.n_end
         |  WHERE w.len < 3 AND NOT list_contains(w.visited, e.b))
         |SELECT n_start, n_end, CAST(len AS BIGINT) AS len,
         |       CAST(count(*) AS BIGINT) AS n_paths
         |FROM walk
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions._
      import graft.graph.Motif
      Motif.varPath(graph(s),
          Seq("HAS_IPD_ALLELE", "HAS_IPD_ACCESSION"), 1, 3,
          either = true, edgeDistinct = false)
        .select(col("n_start"), col("n_end"),
          col("len").cast("long").as("len"), col("n_paths"))
        .orderBy("n_start", "n_end", "len")
    }),
    // Trail-uniqueness variant — Cypher's NATIVE `-[*1..3]-` rule
    // (per-RELATIONSHIP uniqueness: nodes may recur over fresh
    // edges; an undirected relationship's two orientations are one
    // edge). Oracle: the same recursive CTE with the visited list
    // carrying canonical least‖greatest edge keys instead of nodes —
    // counts are exact integers, full hash parity.
    QueryDef("gfe_motif_varlen_trail",
      s"""WITH RECURSIVE e0 AS (
         |  SELECT CAST(src AS VARCHAR) AS a, CAST(dst AS VARCHAR) AS b
         |  FROM ${aux("e_HAS_IPD_ALLELE")}
         |  UNION SELECT CAST(src AS VARCHAR), CAST(dst AS VARCHAR)
         |  FROM ${aux("e_HAS_IPD_ACCESSION")}),
         |e AS (SELECT a, b FROM e0 WHERE a <> b
         |      UNION SELECT b, a FROM e0 WHERE a <> b),
         |walk(n_start, n_end, visited, len) AS (
         |  SELECT a, b, [concat(least(a, b), chr(1), greatest(a, b))], 1
         |  FROM e
         |  UNION ALL
         |  SELECT w.n_start, e.b,
         |         list_append(w.visited,
         |           concat(least(e.a, e.b), chr(1), greatest(e.a, e.b))),
         |         w.len + 1
         |  FROM walk w JOIN e ON e.a = w.n_end
         |  WHERE w.len < 3 AND NOT list_contains(w.visited,
         |    concat(least(e.a, e.b), chr(1), greatest(e.a, e.b))))
         |SELECT n_start, n_end, CAST(len AS BIGINT) AS len,
         |       CAST(count(*) AS BIGINT) AS n_paths
         |FROM walk
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions._
      import graft.graph.Motif
      Motif.varPath(graph(s),
          Seq("HAS_IPD_ALLELE", "HAS_IPD_ACCESSION"), 1, 3,
          either = true, edgeDistinct = true)
        .select(col("n_start"), col("n_end"),
          col("len").cast("long").as("len"), col("n_paths"))
        .orderBy("n_start", "n_end", "len")
    }),
    // Incremental per-release MERGE (load.cyp's ON CREATE/ON MATCH
    // envelope): the store-folded graph's accumulate edge vs the aux
    // snapshot of the refold — hash equality IS the
    // `loadAll == applyRelease-fold` proof, driver-verified.
    QueryDef("gfe_incremental_load",
      s"""SELECT src, dst, array_to_string(releases, ',') AS releases
         |FROM ${aux("e_HAS_IPD_ALLELE")}
         |ORDER BY src, dst""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions._
      incrementalGraph(s).hasIpdAllele
        .select(col("src"), col("dst"),
          concat_ws(",", col("releases")).as("releases"))
        .orderBy("src", "dst")
    }),
    // The PUBLIC index-probe read (GraphStore.probe — bucket-pruned,
    // release-marker-pinned, exact) driver-oracled against the refold:
    // anchored on every HLA-A GFE name, the probe must serve exactly
    // the refold's Sequence rows for those keys while touching only
    // the anchors' hash buckets (plan shape pinned in GraphStoreSpec;
    // this entry hash-pins the VALUES end-to-end through the store).
    QueryDef("gfe_incremental_probe",
      s"""SELECT name, locus, CAST(length AS BIGINT) AS length, seq_id
         |FROM ${aux("v_Sequence")}
         |WHERE locus = 'HLA-A'
         |ORDER BY name""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions.col
      val (dir, g) = incrementalStore(s)
      val anchors = g.gfe.where(col("locus") === "HLA-A").select("name")
      graft.graph.GraphStore.probe(s, dir, "Sequence", anchors, Seq("name"))
        .select(col("name"), col("locus"), col("length"), col("seq_id"))
        .orderBy("name")
    }),
    // The MISS-HEAVY probe shape (an ingest screen: "which of these
    // keys already exist?") through the bloom gate: anchors mix every
    // HLA-A name with absent keys; the `_bloom` sidecars reject the
    // absent anchors' buckets without opening them (zero-I/O skips,
    // plan shape pinned in GraphStoreSpec) and the served rows must
    // STILL be exactly the refold's present keys — hash equality
    // proves the gate can only skip reads, never change an answer.
    QueryDef("gfe_incremental_probe_miss",
      s"""SELECT name, locus, CAST(length AS BIGINT) AS length, seq_id
         |FROM ${aux("v_Sequence")}
         |WHERE locus = 'HLA-A'
         |ORDER BY name""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions.{col, concat, lit}
      val (dir, g) = incrementalStore(s)
      val anchors = g.gfe.where(col("locus") === "HLA-A").select("name")
        .unionByName(s.range(50).select(
          concat(lit("ZZ-screen-"), col("id")).as("name")))
      graft.graph.GraphStore.probe(s, dir, "Sequence", anchors, Seq("name"))
        .select(col("name"), col("locus"), col("length"), col("seq_id"))
        .orderBy("name")
    }),
    // Anchored 2-hop traversal served ENTIRELY by index probes — the
    // store's answer to the reference's hot query (allele → GFEs →
    // features) at 100 TB: hop 1 probes HAS_IPD_ALLELE's dst buckets
    // for the anchor allele, hop 2 probes HAS_FEATURE's src buckets
    // for the resolved GFEs; no edge table is ever scanned (each
    // table's bucket key IS its traversal anchor — layout persisted
    // in the store meta, wrong-key probes fail loudly). Oracled
    // against the refold aux's full-table join.
    QueryDef("gfe_incremental_2hop",
      s"""SELECT DISTINCT hf.term, hf.rank
         |FROM ${aux("e_HAS_IPD_ALLELE")} e
         |JOIN ${aux("e_HAS_FEATURE")} hf ON hf.src = e.src
         |WHERE e.dst = 'HLA-A*01:01:01:01'
         |ORDER BY term, rank""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions.col
      import s.implicits._
      val (dir, _) = incrementalStore(s)
      val gfes = graft.graph.GraphStore.probe(s, dir, "HAS_IPD_ALLELE",
        Seq("HLA-A*01:01:01:01").toDF("dst"), Seq("dst"))
        .select("src")
      graft.graph.GraphStore.probe(s, dir, "HAS_FEATURE",
        gfes, Seq("src"))
        .select(col("term"), col("rank")).distinct()
        .orderBy("term", "rank")
    }),
    // The GENERIC anchored k-hop traversal API over the standing
    // store (Motif.pathAnchored — each hop one bucket probe, never an
    // edge scan), 3 probe-served hops: anchor alleles → rev
    // HAS_IPD_ALLELE → GFEs → fwd HAS_FEATURE → feature edges →
    // Feature VERTEX probe by the composite key the edge carries (the
    // accession fan-out: each feature's accessioned sequence). Oracled
    // against the refold aux's full-table 3-way join — hash equality
    // proves the probe-chain serves exactly the scan semantics.
    QueryDef("gfe_incremental_khop",
      s"""SELECT DISTINCT e.dst AS allele, hf.term, hf.rank, hf.accession,
         |       CAST(length(f.sequence) AS BIGINT) AS feature_len
         |FROM ${aux("e_HAS_IPD_ALLELE")} e
         |JOIN ${aux("e_HAS_FEATURE")} hf ON hf.src = e.src
         |JOIN ${aux("v_Feature")} f
         |  ON f.locus = hf.locus AND f.rank = hf.rank
         | AND f.term = hf.term AND f.accession = hf.accession
         |WHERE e.dst IN
         |  ('HLA-A*01:01:01:01', 'HLA-A*02:01', 'HLA-A*01:03')
         |ORDER BY allele, hf.term, hf.rank, hf.accession, feature_len"""
        .stripMargin)(
      (s, _) => {
      import org.apache.spark.sql.functions._
      import s.implicits._
      import graft.graph.{GraphStore, Motif}
      val (dir, _) = incrementalStore(s)
      val anchors = Seq("HLA-A*01:01:01:01", "HLA-A*02:01",
        "HLA-A*01:03").toDF("allele")
      val paths = Motif.pathAnchored(s, dir, anchors, Seq(
        Motif.Hop("HAS_IPD_ALLELE", reverse = true),
        Motif.Hop("HAS_FEATURE")))
      val featKeys = paths.select(col("e1_locus").as("locus"),
        col("e1_rank").as("rank"), col("e1_term").as("term"),
        col("e1_accession").as("accession"))
      val feats = GraphStore.probe(s, dir, "Feature", featKeys,
        Seq("locus", "rank", "term", "accession"))
      paths.join(feats,
          col("e1_locus") === col("locus") &&
          col("e1_rank") === col("rank") &&
          col("e1_term") === col("term") &&
          col("e1_accession") === col("accession"))
        .select(col("n0").as("allele"), col("term"), col("rank"),
          col("accession"),
          length(col("sequence")).cast("long").as("feature_len"))
        .distinct()
        .orderBy("allele", "term", "rank", "accession", "feature_len")
    }),
    // TIME-TRAVELED anchored traversal (round 15): the same generic
    // k-hop API pinned to the store's FIRST release marker — every
    // hop's probe (and the Feature vertex probe) reads the r1
    // manifests, so the traversal answers "what did this allele's
    // feature fan-out look like AS OF release 3560" AFTER 3570 merged
    // on top. Oracled against the dedicated r1 refold aux snapshots —
    // hash equality pins that asOf threads through every hop (the
    // result genuinely differs from gfe_incremental_khop's: 3570 adds
    // features), at the same bucket-probe I/O as a serving read.
    QueryDef("gfe_incremental_khop_asof",
      s"""SELECT DISTINCT e.dst AS allele, hf.term, hf.rank, hf.accession,
         |       CAST(length(f.sequence) AS BIGINT) AS feature_len
         |FROM ${aux("r1_e_HAS_IPD_ALLELE")} e
         |JOIN ${aux("r1_e_HAS_FEATURE")} hf ON hf.src = e.src
         |JOIN ${aux("r1_v_Feature")} f
         |  ON f.locus = hf.locus AND f.rank = hf.rank
         | AND f.term = hf.term AND f.accession = hf.accession
         |WHERE e.dst IN
         |  ('HLA-A*01:01:01:01', 'HLA-A*02:01', 'HLA-A*01:03')
         |ORDER BY allele, hf.term, hf.rank, hf.accession, feature_len"""
        .stripMargin)(
      (s, _) => {
      import org.apache.spark.sql.functions._
      import s.implicits._
      import graft.graph.{GraphStore, Motif}
      val (dir, _) = incrementalStore(s)
      val m0 = GraphStore.markers(s, dir).head
      val anchors = Seq("HLA-A*01:01:01:01", "HLA-A*02:01",
        "HLA-A*01:03").toDF("allele")
      val paths = Motif.pathAnchored(s, dir, anchors, Seq(
        Motif.Hop("HAS_IPD_ALLELE", reverse = true),
        Motif.Hop("HAS_FEATURE")), asOf = Some(m0))
      val featKeys = paths.select(col("e1_locus").as("locus"),
        col("e1_rank").as("rank"), col("e1_term").as("term"),
        col("e1_accession").as("accession"))
      val feats = GraphStore.probe(s, dir, "Feature", featKeys,
        Seq("locus", "rank", "term", "accession"), asOf = Some(m0))
      paths.join(feats,
          col("e1_locus") === col("locus") &&
          col("e1_rank") === col("rank") &&
          col("e1_term") === col("term") &&
          col("e1_accession") === col("accession"))
        .select(col("n0").as("allele"), col("term"), col("rank"),
          col("accession"),
          length(col("sequence")).cast("long").as("feature_len"))
        .distinct()
        .orderBy("allele", "term", "rank", "accession", "feature_len")
    }),
    // Anchored VARIABLE-LENGTH traversal over the standing store
    // (Motif.varPathAnchored): Cypher's `MATCH (a)-[*1..3]-(b) WHERE
    // a.name IN …` against the incremental store, each expansion step
    // fetching only the frontier's incident edges. The fixture store
    // is DUAL-ANCHOR, so both orientations of every step are
    // bucket-pruned probes (the `__rev` twins serve the reverse
    // direction); on a single-anchor store the reverse orientation
    // degrades to the lazy semi-join fallback — same rows either
    // way, spec-pinned. Oracled against the refold
    // aux's recursive CTE seeded at the same anchors — exact integer
    // path counts, full hash parity (the store serving is an I/O
    // strategy, not a semantics change).
    QueryDef("gfe_incremental_varlen",
      s"""WITH RECURSIVE e0 AS (
         |  SELECT CAST(src AS VARCHAR) AS a, CAST(dst AS VARCHAR) AS b
         |  FROM ${aux("e_HAS_IPD_ALLELE")}
         |  UNION SELECT CAST(src AS VARCHAR), CAST(dst AS VARCHAR)
         |  FROM ${aux("e_HAS_IPD_ACCESSION")}),
         |e AS (SELECT a, b FROM e0 WHERE a <> b
         |      UNION SELECT b, a FROM e0 WHERE a <> b),
         |walk(n_start, n_end, visited, len) AS (
         |  SELECT a, b, [a, b], 1 FROM e
         |  WHERE a IN ('HLA-A*01:01:01:01', 'HLA-A*02:01')
         |  UNION ALL
         |  SELECT w.n_start, e.b, list_append(w.visited, e.b), w.len + 1
         |  FROM walk w JOIN e ON e.a = w.n_end
         |  WHERE w.len < 3 AND NOT list_contains(w.visited, e.b))
         |SELECT n_start, n_end, CAST(len AS BIGINT) AS len,
         |       CAST(count(*) AS BIGINT) AS n_paths
         |FROM walk
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions._
      import s.implicits._
      import graft.graph.Motif
      val (dir, _) = incrementalStore(s)
      val anchors = Seq("HLA-A*01:01:01:01", "HLA-A*02:01").toDF("allele")
      Motif.varPathAnchored(s, dir, anchors,
          Seq("HAS_IPD_ALLELE", "HAS_IPD_ACCESSION"), 1, 3,
          either = true, edgeDistinct = false)
        .select(col("n_start"), col("n_end"),
          col("len").cast("long").as("len"), col("n_paths"))
        .orderBy("n_start", "n_end", "len")
    }),
    // ...the COMPOSITE-far-end form: label-free expansion spanning
    // HAS_FEATURE, whose far node key is its attribute tuple
    // (':'-joined, varPath's encoding). Reverse entry into the
    // feature edge splits the frontier key back into typed parts and
    // probes the dual-anchor twin by its persisted composite key —
    // on this dual fixture store EVERY orientation of every step is
    // a bucket-pruned probe. Oracled against the refold aux's
    // recursive CTE over the same ':'-encoded edge union.
    QueryDef("gfe_incremental_varlen_feature",
      s"""WITH RECURSIVE e0 AS (
         |  SELECT CAST(src AS VARCHAR) AS a, CAST(dst AS VARCHAR) AS b
         |  FROM ${aux("e_HAS_IPD_ALLELE")}
         |  UNION SELECT CAST(src AS VARCHAR),
         |    concat_ws(':', locus, rank, term, accession)
         |  FROM ${aux("e_HAS_FEATURE")}),
         |e AS (SELECT a, b FROM e0 WHERE a <> b
         |      UNION SELECT b, a FROM e0 WHERE a <> b),
         |walk(n_start, n_end, visited, len) AS (
         |  SELECT a, b, [a, b], 1 FROM e
         |  WHERE a IN ('HLA-A*01:01:01:01', 'HLA-A*02:01')
         |  UNION ALL
         |  SELECT w.n_start, e.b, list_append(w.visited, e.b), w.len + 1
         |  FROM walk w JOIN e ON e.a = w.n_end
         |  WHERE w.len < 2 AND NOT list_contains(w.visited, e.b))
         |SELECT n_start, n_end, CAST(len AS BIGINT) AS len,
         |       CAST(count(*) AS BIGINT) AS n_paths
         |FROM walk
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions._
      import s.implicits._
      import graft.graph.Motif
      val (dir, _) = incrementalStore(s)
      val anchors = Seq("HLA-A*01:01:01:01", "HLA-A*02:01").toDF("allele")
      Motif.varPathAnchored(s, dir, anchors,
          Seq("HAS_IPD_ALLELE", "HAS_FEATURE"), 1, 2,
          either = true, edgeDistinct = false)
        .select(col("n_start"), col("n_end"),
          col("len").cast("long").as("len"), col("n_paths"))
        .orderBy("n_start", "n_end", "len")
    }),
    // ...and the TRAIL-uniqueness variant on the same store (Cypher's
    // native `-[*1..3]-` rule: nodes may recur over fresh edges, an
    // undirected relationship's two orientations are one edge) — the
    // anchored pair matches gfe_motif_varlen/_trail's whole-graph
    // pair, so both uniqueness semantics are oracled against the
    // standing store, not just in-memory.
    QueryDef("gfe_incremental_varlen_trail",
      s"""WITH RECURSIVE e0 AS (
         |  SELECT CAST(src AS VARCHAR) AS a, CAST(dst AS VARCHAR) AS b
         |  FROM ${aux("e_HAS_IPD_ALLELE")}
         |  UNION SELECT CAST(src AS VARCHAR), CAST(dst AS VARCHAR)
         |  FROM ${aux("e_HAS_IPD_ACCESSION")}),
         |e AS (SELECT a, b FROM e0 WHERE a <> b
         |      UNION SELECT b, a FROM e0 WHERE a <> b),
         |walk(n_start, n_end, visited, len) AS (
         |  SELECT a, b, [concat(least(a, b), chr(1), greatest(a, b))], 1
         |  FROM e
         |  WHERE a IN ('HLA-A*01:01:01:01', 'HLA-A*02:01')
         |  UNION ALL
         |  SELECT w.n_start, e.b,
         |         list_append(w.visited,
         |           concat(least(e.a, e.b), chr(1), greatest(e.a, e.b))),
         |         w.len + 1
         |  FROM walk w JOIN e ON e.a = w.n_end
         |  WHERE w.len < 3 AND NOT list_contains(w.visited,
         |    concat(least(e.a, e.b), chr(1), greatest(e.a, e.b))))
         |SELECT n_start, n_end, CAST(len AS BIGINT) AS len,
         |       CAST(count(*) AS BIGINT) AS n_paths
         |FROM walk
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions._
      import s.implicits._
      import graft.graph.Motif
      val (dir, _) = incrementalStore(s)
      val anchors = Seq("HLA-A*01:01:01:01", "HLA-A*02:01").toDF("allele")
      Motif.varPathAnchored(s, dir, anchors,
          Seq("HAS_IPD_ALLELE", "HAS_IPD_ACCESSION"), 1, 3,
          either = true, edgeDistinct = true)
        .select(col("n_start"), col("n_end"),
          col("len").cast("long").as("len"), col("n_paths"))
        .orderBy("n_start", "n_end", "len")
    }),
    // The JOIN-SHAPED store read (GraphStore.probeJoin): serve every
    // HAS_SEQUENCE edge whose src GFE sits at an HLA-A/HLA-B locus,
    // with the key frame coming from a TABLE (the store's own GFE
    // vertices), not a driver-side anchor list — the workload shape
    // `probe` cannot take (its bucket-id set collects to the driver).
    // probeJoin is a lazy left-semi join over the marker-pinned live
    // bucket files; no collect, no broadcast requirement, so the key
    // frame may be table-sized. Oracled against the refold aux's
    // edge⋈vertex join — hash equality pins that the manifest-resolved
    // serving state IS the refold's edge set under a semi-join.
    QueryDef("gfe_incremental_join",
      s"""SELECT e.src, e.dst
         |FROM ${aux("e_HAS_SEQUENCE")} e
         |JOIN ${aux("v_GFE")} g ON g.name = e.src
         |WHERE g.locus IN ('HLA-A', 'HLA-B')
         |ORDER BY src, dst""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions.col
      val (dir, g) = incrementalStore(s)
      val keyFrame = g.gfe.where(col("locus").isin("HLA-A", "HLA-B"))
        .select(col("name").as("src"))
      graft.graph.GraphStore.probeJoin(s, dir, "HAS_SEQUENCE",
          keyFrame, Seq("src"))
        .select(col("src"), col("dst"))
        .orderBy("src", "dst")
    }),
    // TIME TRAVEL (GraphStore.readAt): the store pinned to its FIRST
    // release marker must serve exactly the single-release refold —
    // every retained marker is a complete immutable snapshot pointer,
    // so "rebuild the corpus release k trained on" is a marker read,
    // same I/O shape as the newest state. Oracled against a dedicated
    // aux dump of loadAll(3560 only): hash equality pins that the
    // as-of read reconstructs the historical graph bit-for-bit AFTER
    // a later release was merged on top.
    QueryDef("gfe_incremental_asof",
      s"""SELECT src, dst, array_to_string(releases, ',') AS releases
         |FROM ${aux("r1_e_HAS_IPD_ALLELE")}
         |ORDER BY src, dst""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions._
      import graft.graph.GraphStore
      val (dir, _) = incrementalStore(s)
      GraphStore.readAt(s, dir, GraphStore.markers(s, dir).head)
        .hasIpdAllele
        .select(col("src"), col("dst"),
          concat_ws(",", col("releases")).as("releases"))
        .orderBy("src", "dst")
    }),
    // CDC between two releases (GraphStore.diff): what release 3570
    // changed on HAS_IPD_ALLELE — '+' rows present only after, '-'
    // rows present only before; an ON-MATCH release-append surfaces
    // as its '-' old array plus its '+' new one, a genuinely new edge
    // as '+' alone. The read is manifest-PRUNED (only buckets whose
    // version pointer moved between the markers are opened — the
    // O(changed) incremental-reprocessing read; pruning spec-pinned
    // in GraphStoreSpec). Oracled as the symmetric EXCEPT of the two
    // refold aux snapshots.
    QueryDef("gfe_incremental_diff",
      s"""SELECT * FROM (
         |  SELECT '+' AS change, src, dst,
         |         array_to_string(releases, ',') AS releases
         |  FROM ${aux("e_HAS_IPD_ALLELE")}
         |  EXCEPT
         |  SELECT '+' AS change, src, dst,
         |         array_to_string(releases, ',') AS releases
         |  FROM ${aux("r1_e_HAS_IPD_ALLELE")})
         |UNION ALL
         |SELECT * FROM (
         |  SELECT '-' AS change, src, dst,
         |         array_to_string(releases, ',') AS releases
         |  FROM ${aux("r1_e_HAS_IPD_ALLELE")}
         |  EXCEPT
         |  SELECT '-' AS change, src, dst,
         |         array_to_string(releases, ',') AS releases
         |  FROM ${aux("e_HAS_IPD_ALLELE")})
         |ORDER BY change, src, dst""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions._
      import graft.graph.GraphStore
      val (dir, _) = incrementalStore(s)
      val ms = GraphStore.markers(s, dir)
      GraphStore.diff(s, dir, "HAS_IPD_ALLELE", ms.head, ms.last)
        .select(col("change"), col("src"), col("dst"),
          concat_ws(",", col("releases")).as("releases"))
        .orderBy("change", "src", "dst")
    }),
    // The streaming CHANGE FEED (spark.readStream.format("graftstore"),
    // graft.sources.GraftStoreChangeSource): batch 1 bootstraps with
    // the marker-0 snapshot (all '+'), release 3570 MERGEs into the
    // store, batch 2 is exactly the m0→m1 diff — both appended to one
    // parquet sink through one checkpoint. Oracled as the r1 refold
    // aux tagged '+' plus the symmetric EXCEPT of the two refold
    // snapshots: hash equality proves the feed emits precisely
    // snapshot-then-per-release-changes, the contract every
    // downstream incremental re-embed/re-index consumer relies on.
    QueryDef("gfe_incremental_feed",
      s"""SELECT change, src, dst, releases FROM (
         |  SELECT '+' AS change, src, dst,
         |         array_to_string(releases, ',') AS releases
         |  FROM ${aux("r1_e_HAS_IPD_ALLELE")}
         |  UNION ALL
         |  SELECT * FROM (
         |    SELECT '+' AS change, src, dst,
         |           array_to_string(releases, ',') AS releases
         |    FROM ${aux("e_HAS_IPD_ALLELE")}
         |    EXCEPT
         |    SELECT '+' AS change, src, dst,
         |           array_to_string(releases, ',') AS releases
         |    FROM ${aux("r1_e_HAS_IPD_ALLELE")})
         |  UNION ALL
         |  SELECT * FROM (
         |    SELECT '-' AS change, src, dst,
         |           array_to_string(releases, ',') AS releases
         |    FROM ${aux("r1_e_HAS_IPD_ALLELE")}
         |    EXCEPT
         |    SELECT '-' AS change, src, dst,
         |           array_to_string(releases, ',') AS releases
         |    FROM ${aux("e_HAS_IPD_ALLELE")})
         |) ORDER BY change, src, dst, releases""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions.col
      feedRows(s)
        .select(col("change"), col("src"), col("dst"), col("releases"))
        .orderBy("change", "src", "dst", "releases")
    }),
    // The streaming SINK (df.writeStream.format("graftstore"),
    // graft.sources.GraftStoreSink) closing the loop: the table's
    // change feed folded under policy=cdc into a REPLICA store through
    // the real engine — bootstrap snapshot batch, release 3570 MERGEs,
    // then the m0→m1 diff batch — and the replica read back through
    // the batch data source. Hash equality against the refold aux
    // proves feed → sink → serve reproduces the source table exactly
    // (store-to-store replication as two lines of plain Spark).
    QueryDef("gfe_store_replicate",
      s"""SELECT src, dst, array_to_string(releases, ',') AS releases
         |FROM ${aux("e_HAS_IPD_ALLELE")}
         |ORDER BY src, dst""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions._
      replicaRows(s)
        .select(col("src"), col("dst"),
          concat_ws(",", col("releases")).as("releases"))
        .orderBy("src", "dst")
    }),
    // ...and the per-column-policy vertex (gene create-only, G/lg
    // conditional overwrite) built incrementally vs the refold aux.
    QueryDef("gfe_incremental_alleles",
      s"""SELECT name, gene, G AS g_group, lg AS lg_group
         |FROM ${aux("v_IPD_Allele")}
         |ORDER BY name""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions.col
      incrementalGraph(s).ipdAllele
        .select(col("name"), col("gene"), col("G").as("g_group"),
          col("lg").as("lg_group")).orderBy("name")
    }),
    // The SQL SERVING SURFACE over the standing store
    // (graft.sources.GraftStoreSource): GraphStore.createViews
    // registers every table as a temp view backed by the `graftstore`
    // data source — manifest-resolved, marker-pinned — and a plain
    // spark.sql join/aggregate over those views must equal the refold.
    // This is the reference's ad-hoc query endpoint (Cypher over the
    // standing Neo4j graph, docs/source/reference.rst:34-37)
    // re-expressed as Spark SQL: no graft API in the query text.
    QueryDef("gfe_store_sql",
      s"""SELECT e.dst AS allele, count(DISTINCT e.src) AS n_gfes,
         |       count(DISTINCT hf.term) AS n_terms
         |FROM ${aux("e_HAS_IPD_ALLELE")} e
         |JOIN ${aux("e_HAS_FEATURE")} hf ON hf.src = e.src
         |GROUP BY e.dst
         |ORDER BY allele""".stripMargin)((s, _) => {
      val (dir, _) = incrementalStore(s)
      graft.graph.GraphStore.createViews(s, dir, prefix = "gstore_")
      s.sql(
        """SELECT e.dst AS allele, count(DISTINCT e.src) AS n_gfes,
          |       count(DISTINCT hf.term) AS n_terms
          |FROM gstore_HAS_IPD_ALLELE e
          |JOIN gstore_HAS_FEATURE hf ON hf.src = e.src
          |GROUP BY e.dst
          |ORDER BY allele""".stripMargin)
    }),
    // The DECLARATIVE point probe: the same literal IN-list read that
    // GraphStore.probe serves imperatively, written as a plain WHERE
    // over the data source — the anchor-key equality prunes the scan
    // to the hit buckets at PLANNING time inside the store's
    // FileIndex (plan shape pinned in GraftStoreSourceSpec; this
    // entry hash-pins the VALUES end-to-end through that path).
    QueryDef("gfe_store_sql_probe",
      s"""SELECT name, gene, G AS g_group, lg AS lg_group
         |FROM ${aux("v_IPD_Allele")}
         |WHERE name IN
         |  ('HLA-A*01:01:01:01', 'HLA-A*02:01', 'HLA-A*01:03')
         |ORDER BY name""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions.col
      val (dir, _) = incrementalStore(s)
      graft.graph.GraphStore.sqlTable(s, dir, "IPD_Allele")
        .where(col("name").isin("HLA-A*01:01:01:01", "HLA-A*02:01",
          "HLA-A*01:03"))
        .select(col("name"), col("gene"), col("G").as("g_group"),
          col("lg").as("lg_group"))
        .orderBy("name")
    }),
    // The JOIN-shaped declarative probe (round 15): the anchor values
    // live in a RUNTIME frame — a temp view the optimizer cannot see
    // literals through — so the FileIndex's literal pruning cannot
    // fire; graft.plans.StoreBucketPruning instead rewrites the join
    // into a DynamicPruningSubquery on the store's _graft_bucket
    // partition column, and the scan opens only the buckets the
    // anchors hash to AT EXECUTION (plan shape pinned in
    // GraftStoreSourceSpec; this entry hash-pins the VALUES through
    // that path — the BI-tool shape: no graft API, no literals).
    QueryDef("gfe_store_sql_join",
      s"""SELECT a.name, a.gene, a.G AS g_group, a.lg AS lg_group
         |FROM ${aux("v_IPD_Allele")} a
         |JOIN (VALUES ('HLA-A*01:01:01:01'), ('HLA-A*02:01'),
         |             ('HLA-A*01:03')) t(name)
         |  ON a.name = t.name
         |ORDER BY a.name""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions.col
      import s.implicits._
      val (dir, _) = incrementalStore(s)
      // force the size gate open: the fixture store is broadcast-sized
      // and this entry must exercise the runtime-pruning path itself
      s.conf.set("spark.graft.store.dynamicPrune.minBytes", "0")
      try {
        graft.graph.GraphStore.createViews(s, dir, prefix = "gstorej_")
        Seq("HLA-A*01:01:01:01", "HLA-A*02:01", "HLA-A*01:03")
          .toDF("name").createOrReplaceTempView("gstorej_anchors")
        // materialize INSIDE the gate window: the QueryDef's frame is
        // executed lazily by Verify/Bench, after the finally below
        s.sql(
          """SELECT a.name, a.gene, a.G AS g_group, a.lg AS lg_group
            |FROM gstorej_IPD_Allele a
            |JOIN gstorej_anchors t ON a.name = t.name
            |ORDER BY name""".stripMargin)
          .localCheckpoint(eager = true)
      } finally s.conf.unset("spark.graft.store.dynamicPrune.minBytes")
    }),
    // The RANGE read through the SQL surface (round 15b): a
    // non-anchor range predicate served by ZONE-MAP pruning — the
    // manifest's per-bucket min/max stats drop buckets the range
    // cannot hit at planning, with zero filesystem I/O (pruning
    // evidence pinned in ZoneMapsSpec; this entry hash-pins the
    // VALUES end-to-end through the stats-carrying store).
    QueryDef("gfe_store_sql_range",
      s"""SELECT locus, rank, term, accession
         |FROM ${aux("v_Feature")}
         |WHERE rank >= 2 AND rank <= 4
         |ORDER BY locus, rank, term, accession""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions.col
      val (dir, _) = incrementalStore(s)
      graft.graph.GraphStore.sqlTable(s, dir, "Feature")
        .where(col("rank") >= 2 && col("rank") <= 4)
        .select(col("locus"), col("rank"), col("term"), col("accession"))
        .orderBy("locus", "rank", "term", "accession")
    }),
    // ADDITIVE schema evolution end-to-end (round 15c): pipeline v1
    // sinks release-1 edges (src,dst); pipeline v2 restarts with a
    // derived src_len column and mergeSchema — the store EVOLVES
    // (atomic footer publish) instead of demanding a rebuild, and the
    // read-back serves pre-evolution rows with src_len NULL and the
    // new rows with values. The DuckDB replay derives the same final
    // state from the r1 aux vs the two-release aux (EXCEPT = the
    // v2-only keys).
    QueryDef("gfe_store_evolve",
      s"""WITH r1 AS (SELECT DISTINCT src, dst
         |            FROM ${aux("r1_e_HAS_IPD_ALLELE")}),
         |     f AS (SELECT DISTINCT src, dst
         |           FROM ${aux("e_HAS_IPD_ALLELE")}),
         |     nw AS (SELECT src, dst FROM f
         |            EXCEPT SELECT src, dst FROM r1)
         |SELECT src, dst, CAST(NULL AS BIGINT) AS src_len FROM r1
         |UNION ALL
         |SELECT src, dst, CAST(length(src) AS BIGINT) AS src_len FROM nw
         |ORDER BY src, dst""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions.{col, length}
      val r1 = build(s, "3560")
      val r2 = build(s, "3570", Some(r1.registry))
      val g1 = GraphLoad.loadAll(s,
        Seq(("3560", r1.gfeSequences, r1.allFeatures, r1.allGroups)))
        .hasIpdAllele.select("src", "dst").dropDuplicates("src", "dst")
      val gf = GraphLoad.loadAll(s, Seq(
          ("3560", r1.gfeSequences, r1.allFeatures, r1.allGroups),
          ("3570", r2.gfeSequences, r2.allFeatures, r2.allGroups)))
        .hasIpdAllele.select("src", "dst").dropDuplicates("src", "dst")
      val dir = java.nio.file.Files
        .createTempDirectory("graft_fixture_evolve").toString
      import org.apache.spark.sql.streaming.OutputMode
      new graft.sources.GraftStoreSink(s,
        Map("path" -> dir, "keys" -> "src,dst",
          "checkpointLocation" -> s"$dir/_chkA"), OutputMode.Append())
        .addBatch(0, g1)
      new graft.sources.GraftStoreSink(s,
        Map("path" -> dir, "keys" -> "src,dst",
          "mergeSchema" -> "true",
          "checkpointLocation" -> s"$dir/_chkB"), OutputMode.Append())
        .addBatch(0, gf.except(g1)
          .withColumn("src_len", length(col("src")).cast("long")))
      s.read.format("graftstore").option("path", dir).load()
        .select(col("src"), col("dst"), col("src_len"))
        .orderBy("src", "dst")
    }),
    // ...and every table's cardinality: cheap full-surface check that
    // the incremental store created/merged exactly the refold's rows.
    QueryDef("gfe_incremental_counts",
      s"""SELECT * FROM (
         |  SELECT 'Feature' AS label, count(*) AS n FROM ${aux("v_Feature")}
         |  UNION ALL SELECT 'GFE', count(*) FROM ${aux("v_GFE")}
         |  UNION ALL SELECT 'HAS_FEATURE', count(*) FROM ${aux("e_HAS_FEATURE")}
         |  UNION ALL SELECT 'HAS_IPD_ACCESSION', count(*) FROM ${aux("e_HAS_IPD_ACCESSION")}
         |  UNION ALL SELECT 'HAS_IPD_ALLELE', count(*) FROM ${aux("e_HAS_IPD_ALLELE")}
         |  UNION ALL SELECT 'HAS_SEQUENCE', count(*) FROM ${aux("e_HAS_SEQUENCE")}
         |  UNION ALL SELECT 'IPD_Accession', count(*) FROM ${aux("v_IPD_Accession")}
         |  UNION ALL SELECT 'IPD_Allele', count(*) FROM ${aux("v_IPD_Allele")}
         |  UNION ALL SELECT 'SUBMITTED', count(*) FROM ${aux("e_SUBMITTED")}
         |  UNION ALL SELECT 'Sequence', count(*) FROM ${aux("v_Sequence")}
         |  UNION ALL SELECT 'Submitter', count(*) FROM ${aux("v_Submitter")})
         |ORDER BY label""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions._
      val g = incrementalGraph(s)
      (g.vertexTables ++ g.edgeTables).toSeq.sortBy(_._1)
        .map { case (n, df) =>
          df.agg(count(lit(1)).as("n")).select(lit(n).as("label"), col("n")) }
        .reduce(_ unionByName _)
        .orderBy("label")
    }),
    // GDS parity: PageRank over the GFE→Feature bipartite edges.
    // Integer-scaled (pageRankIntDF: long micro-units, floor-divided
    // edge mass, fixed 10 iterations) so the DuckDB oracle replays the
    // identical recurrence as unrolled CTEs and the hash is bit-exact —
    // same upgrade d_dup_pagerank got in round 7; the float GraphX
    // path stays spec-covered (GraphAlgorithmsSpec "pageRank").
    QueryDef("gfe_pagerank",
      s"""WITH ed0 AS (
         |  SELECT DISTINCT src AS a,
         |    concat_ws(':', locus, term, rank, accession) AS b
         |  FROM ${aux("e_HAS_FEATURE")}),
         |verts AS (SELECT a AS id FROM ed0
         |          UNION SELECT b FROM ed0),
         |deg AS (SELECT a, count(*) AS deg FROM ed0 GROUP BY a),
         |ed AS (SELECT e.a, e.b, d.deg FROM ed0 e JOIN deg d ON d.a = e.a),
         |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM verts),
         |${(1 to 10).map(k =>
        s"""r$k AS (SELECT v.id, 150000 + COALESCE(m.in_mass, 0) AS r
           |  FROM verts v LEFT JOIN (
           |    SELECT e.b AS id, sum((r.r * 85) // (100 * e.deg)) AS in_mass
           |    FROM ed e JOIN r${k - 1} r ON r.id = e.a GROUP BY e.b) m
           |  ON m.id = v.id)""".stripMargin).mkString(",\n")}
         |SELECT id, CAST(r AS BIGINT) AS rank_ppm FROM r10
         |ORDER BY id""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions._
      val edges = graph(s).hasFeature.select(
        col("src"),
        concat_ws(":", col("locus"), col("term"), col("rank"),
          col("accession")).as("dst"))
      graft.graph.GraphAlgorithms.pageRankIntDF(
        edges, "src", "dst", iterations = 10, directed = true)
        .select(col("id"), col("rank_ppm"))
        .orderBy("id")
    }),
    // GDS parity: BFS / unweighted shortest path from an allele over
    // the HAS_IPD_ALLELE ∪ HAS_FEATURE edges (undirected): distance 1
    // = the allele's GFE nodes, distance 2 = their features + alleles
    // sharing a GFE, distance 3 = GFEs sharing one of those features.
    // Oracle: recursive CTE over the snapshot — (id, depth) pairs are
    // bounded by the same maxDepth as the Spark BFS, min() per id is
    // the BFS distance.
    QueryDef("gfe_bfs_distance",
      s"""WITH RECURSIVE und AS (
         |  SELECT src AS a, dst AS b FROM ${aux("e_HAS_IPD_ALLELE")}
         |  UNION ALL SELECT dst, src FROM ${aux("e_HAS_IPD_ALLELE")}
         |  UNION ALL SELECT src, concat_ws(':', locus, term, rank, accession)
         |    FROM ${aux("e_HAS_FEATURE")}
         |  UNION ALL SELECT concat_ws(':', locus, term, rank, accession), src
         |    FROM ${aux("e_HAS_FEATURE")}
         |), bfs(id, depth) AS (
         |  SELECT 'HLA-A*01:01:01:01', 0
         |  UNION
         |  SELECT u.b, bfs.depth + 1 FROM bfs JOIN und u ON u.a = bfs.id
         |  WHERE bfs.depth < 30
         |)
         |SELECT id, min(depth) AS distance FROM bfs
         |GROUP BY id ORDER BY distance, id""".stripMargin)((s, _) => {
      import org.apache.spark.sql.functions._
      val g = graph(s)
      val edges = g.hasIpdAllele.select(col("src"), col("dst"))
        .unionByName(g.hasFeature.select(
          col("src"),
          concat_ws(":", col("locus"), col("term"), col("rank"),
            col("accession")).as("dst")))
      graft.graph.GraphAlgorithms
        .shortestPathsDF(edges, "src", "dst", Seq("HLA-A*01:01:01:01"))
        .orderBy("distance", "id")
    }))
}
