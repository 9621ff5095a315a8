package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.gfe.GfeBuild
import graft.graph.{GraphLoad, GraphQueries}
import graft.ingest.ImgtFlatFile

/** The reference's own domain surface (SURVEY.md §3) run end-to-end on
  * the bundled two-release IMGT fixture: flat-file scan → build
  * relations → graph MERGE → validation/traversal queries.
  *
  * These are not DuckDB-expressible (the input is an EMBL flat file,
  * not a parquet table), so they carry no oracle — the driver records
  * rows>0; the exact semantics are golden-tested in
  * GfeBuildSpec/GraphLoadSpec (17-feature traversal shape, accession
  * stability, MERGE policies).
  */
object GfeQueries {

  // Build results memoized per (session, release): GfeBuild caches its
  // intermediates, so re-invoking it would rebuild fresh plans and
  // re-execute the pipeline per driver-contract query. Weak session
  // keys keep stopped sessions collectable.
  private val buildCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, GfeBuild.BuildResult]]())

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
      perSession.getOrElseUpdate(rel,
        GfeBuild.run(s,
          ImgtFlatFile.fromText(s, ImgtFlatFile.resourceText(s"/graft/hla.$rel.dat")),
          rel, registry = reg))
    }
  }

  // The fixture graph is immutable per session — memoize so each
  // driver-contract query doesn't re-run the two-release pipeline.
  // Weak keys: stopped sessions must stay collectable.
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, GraphLoad.Graph]())

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
      val dir = java.nio.file.Files
        .createTempDirectory("graft_fixture_graph").toString
      GraphLoad.write(g, dir)
      GraphLoad.read(s, dir)
  }

  val all: Seq[QueryDef] = Seq(
    // S1+P1-P8+J3+§2.5: full build of one release.
    QueryDef.noOracle("gfe_build_sequences")((s, _) =>
      build(s, "3560").gfeSequences.orderBy("hla_name")),
    QueryDef.noOracle("gfe_build_features")((s, _) =>
      build(s, "3560").allFeatures.orderBy("hla_name", "term", "rank")),
    // A1: per-label node counts over the merged two-release graph.
    QueryDef.noOracle("gfe_graph_label_counts")((s, _) =>
      GraphQueries.labelCounts(graph(s))),
    // A2: releases histogram over HAS_IPD_ALLELE.
    QueryDef.noOracle("gfe_releases_histogram")((s, _) =>
      GraphQueries.releasesHistogram(graph(s))),
    // J8: the documented 2-hop traversal (17-row golden shape).
    QueryDef.noOracle("gfe_allele_features")((s, _) =>
      GraphQueries.alleleFeatures(graph(s), "HLA-A*01:01:01:01")),
    // GDS parity: PageRank over the GFE→Feature bipartite edges.
    QueryDef.noOracle("gfe_pagerank")((s, _) => {
      import org.apache.spark.sql.functions._
      val edges = graph(s).hasFeature.select(
        col("src"),
        concat_ws(":", col("locus"), col("term"), col("rank"),
          col("accession")).as("dst"))
      graft.graph.GraphAlgorithms.pageRank(edges, "src", "dst")
        .orderBy(col("rank").desc, col("id")).limit(20)
    }))
}
