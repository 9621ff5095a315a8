package graft.graph

import org.apache.spark.graphx.{Edge, Graph => XGraph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph algorithms over edge DataFrames — the GDS-plugin capability
  * surface (SURVEY.md §2.10: installed in the reference, no scripted
  * calls; parity target is capability, via GraphX).
  *
  * Inputs/outputs are DataFrames; GraphX (RDD-based Pregel) runs the
  * iterative core. String vertex ids are dictionary-encoded to longs
  * with a deterministic first-seen index, never hashed (no collision
  * risk at 10^11 vertices).
  *
  * Scale notes: connected components is the dedup-clustering closure
  * over candidate pairs — the pair list is orders of magnitude
  * smaller than the corpus (LSH bounds it), so the iterative step
  * runs on the small derived graph, not the raw data. PageRank
  * partitions edges with EdgePartition2D (2D hash — bounds replication
  * to 2√N copies per vertex).
  */
object GraphAlgorithms {

  /** Dictionary-encode string vertices: (id: String, vid: Long). */
  private def vertexIds(edges: DataFrame, src: String, dst: String): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select(col(src).as("id"))
      .unionByName(edges.select(col(dst).as("id")))
      .distinct()
      .rdd.map(_.getString(0)).zipWithIndex()
      .toDF("id", "vid")
  }

  /** Iterative Pregel rounds multiply per-partition scheduling cost;
    * size the edge partitioning to the derived graph, not to the
    * (much larger) source's parallelism. ~1M edges/partition. */
  private def graphParallelism(edgeCount: Long, spark: SparkSession): Int =
    math.max(2, math.min(spark.sparkContext.defaultParallelism,
      (edgeCount / 1000000L).toInt + 1))

  /** Connected components over an undirected string-keyed pair list.
    * Returns (id, component) where component = min member id
    * (lexicographic) of the cluster — a stable cluster label. */
  def connectedComponents(pairs: DataFrame, src: String, dst: String): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val vids = vertexIds(pairs, src, dst).cache()
    val edgeDf = pairs
      .join(vids.withColumnRenamed("id", src).withColumnRenamed("vid", "svid"), src)
      .join(vids.withColumnRenamed("id", dst).withColumnRenamed("vid", "dvid"), dst)
      .select("svid", "dvid")
      .cache()
    val p = graphParallelism(edgeDf.count(), spark)
    val edgeRdd = edgeDf.rdd.coalesce(p)
      .map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val graph = XGraph.fromEdges(edgeRdd, ())
    val cc = graph.connectedComponents().vertices.toDF("vid", "cvid")
    // component label = min original id within the component
    val labeled = cc.join(vids, "vid").select(col("id"), col("cvid"))
    val repr = labeled.groupBy("cvid").agg(min(col("id")).as("component"))
    // materialize before releasing vids: the dictionary is minted by
    // zipWithIndex, so a post-unpersist recompute is not guaranteed to
    // reproduce the same ids
    val out = labeled.join(repr, "cvid").select("id", "component")
      .localCheckpoint(eager = true)
    vids.unpersist()
    edgeDf.unpersist()
    out
  }

  /** DataFrame-native connected components: iterative min-label
    * propagation to fixpoint (label(v) ← min over N(v) ∪ {v}),
    * converging in O(component diameter) rounds — dedup clusters from
    * LSH candidates are near-cliques, so 2-4 rounds in practice.
    *
    * Same result as [[connectedComponents]] (cross-checked in
    * GraphAlgorithmsSpec); preferred in pipelines because every round
    * is a plain shuffle-join/agg that Catalyst+AQE size automatically,
    * with none of Pregel's per-round fixed cost.
    */
  def connectedComponentsDF(pairs: DataFrame, src: String, dst: String,
      maxIter: Int = 30, localThreshold: Long = 1000000L): DataFrame = {
    // Adaptive fast path: LSH bounds the candidate-pair list to a tiny
    // fraction of the corpus. Below the threshold, union-find on the
    // collected pairs beats any distributed loop (each Pregel/join
    // round costs more than the whole problem); above it, fall through
    // to the distributed fixpoint. The *input* to this operator is
    // already the reduced pair list, never the raw data.
    val spark = pairs.sparkSession
    val edgesSmall = pairs.select(col(src).cast("string"), col(dst).cast("string"))
      .cache()
    if (edgesSmall.count() <= localThreshold) {
      import spark.implicits._
      val parent = scala.collection.mutable.HashMap.empty[String, String]
      def find(x: String): String = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      edgesSmall.collect().foreach { row =>
        val (a, b) = (row.getString(0), row.getString(1))
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra) = rb
      }
      val byRoot = parent.keys.toSeq.groupBy(find)
      val rows = byRoot.valuesIterator.flatMap { members =>
        val label = members.min
        members.map(m => (m, label))
      }.toSeq
      edgesSmall.unpersist()
      return spark.createDataset(rows).toDF("id", "component")
    }
    val und = edgesSmall.toDF("a", "b")
      .unionByName(edgesSmall.toDF("b", "a").select(col("a"), col("b")))
      .cache()
    var labels = und.select(col("a").as("id")).distinct()
      .withColumn("component", col("id")).cache()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = und.join(labels.withColumnRenamed("id", "b"), "b")
        .groupBy(col("a").as("id")).agg(min("component").as("nbr"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr"), col("component")))
            .as("component"))
        .localCheckpoint(eager = true) // truncate the iterative lineage
      val changed = next
        .join(labels.withColumnRenamed("component", "old"), "id")
        .where(col("component") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      i += 1
    }
    und.unpersist()
    edgesSmall.unpersist()
    // A partially-converged result would silently split components —
    // fail loudly; callers raise maxIter (diameter bound) instead.
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsDF did not converge in $maxIter rounds; " +
        "raise maxIter (rounds needed = max component diameter)")
    labels
  }

  /** PageRank over a directed string-keyed edge list.
    * Returns (id, rank) with ranks rounded to `scale` decimals for
    * engine-stable comparison. */
  def pageRank(edges: DataFrame, src: String, dst: String,
      iterations: Int = 10, resetProb: Double = 0.15,
      scale: Int = 6): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val vids = vertexIds(edges, src, dst).cache()
    val edgeDf = edges
      .join(vids.withColumnRenamed("id", src).withColumnRenamed("vid", "svid"), src)
      .join(vids.withColumnRenamed("id", dst).withColumnRenamed("vid", "dvid"), dst)
      .select("svid", "dvid")
      .cache()
    val p = graphParallelism(edgeDf.count(), spark)
    val edgeRdd = edgeDf.rdd.coalesce(p)
      .map(r => Edge(r.getLong(0), r.getLong(1), 1.0))
    val graph = XGraph.fromEdges(edgeRdd, 1.0)
      .partitionBy(org.apache.spark.graphx.PartitionStrategy.EdgePartition2D)
    val ranks = graph.staticPageRank(iterations, resetProb)
      .vertices.toDF("vid", "rank")
    val out = ranks.join(vids, "vid")
      .select(col("id"), round(col("rank"), scale).as("rank"))
      .localCheckpoint(eager = true) // see connectedComponents: vids not recompute-stable
    vids.unpersist()
    edgeDf.unpersist()
    out
  }

  /** DataFrame-native BFS / unweighted single-source shortest path
    * (GDS `gds.bfs` / `gds.shortestPath` capability parity —
    * template.yaml:262-263 ships the plugin unrestricted; no scripted
    * calls exist, so the parity target is capability).
    *
    * Returns (id, distance) for every vertex reachable from `sources`
    * within `maxDepth` hops (sources at distance 0). Level-synchronous
    * frontier expansion: each round is ONE equi-join (frontier ⨝
    * edges, shuffled on the fixed-width vertex id) + an anti-join
    * against the visited set — plain Catalyst/AQE-sized shuffles, no
    * Pregel fixed cost, same rationale as [[connectedComponentsDF]].
    * Work per round is O(edges incident to the frontier); the visited
    * anti-join keeps the frontier monotonically shrinking, so total
    * work is O(E) over the run. `localCheckpoint` truncates the
    * iterative lineage (round k's plan would otherwise embed all
    * k-1 predecessors).
    */
  def shortestPathsDF(edges: DataFrame, src: String, dst: String,
      sources: Seq[String], maxDepth: Int = 30,
      directed: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    require(sources.nonEmpty, "at least one source vertex required")
    shortestPathsDF(edges, src, dst, sources.distinct.toDF("id"),
      maxDepth, directed)
  }

  /** Distributed-sources variant: `sources`' FIRST column is the seed
    * vertex set, kept as a DataFrame end-to-end — the pipeline shape
    * (seed sets grow with the data, e.g. one seed per dedup cluster),
    * where a driver-side `Seq` would be a collect bottleneck. The
    * `Seq` overload above is the query-time convenience and delegates
    * here.
    */
  def shortestPathsDF(edges: DataFrame, src: String, dst: String,
      sources: DataFrame, maxDepth: Int,
      directed: Boolean): DataFrame = {
    val e = edges.select(col(src).cast("string").as("a"),
      col(dst).cast("string").as("b"))
    val und = (if (directed) e
      else e.unionByName(e.select(col("b").as("a"), col("a").as("b"))))
      .cache()
    var visited = sources
      .select(col(sources.columns.head).cast("string").as("id")).distinct()
      .withColumn("distance", lit(0))
      .localCheckpoint(eager = true)
    var frontier = visited
    var depth = 0
    while (depth < maxDepth && frontier.limit(1).count() > 0) {
      depth += 1
      val next = und.join(frontier.withColumnRenamed("id", "a"), "a")
        .select(col("b").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
        .withColumn("distance", lit(depth))
        .localCheckpoint(eager = true)
      visited = visited.unionByName(next).localCheckpoint(eager = true)
      frontier = next
    }
    und.unpersist()
    visited
  }

  /** DataFrame-native weighted single-source shortest path (GDS
    * `gds.shortestPath.dijkstra` capability parity). Non-negative
    * integer weights; returns (id, dist) for every vertex reachable
    * from `sources` (sources at dist 0).
    *
    * Bellman-Ford relaxation with convergence early-exit: each round
    * is one equi-join (current distances ⨝ edges, shuffled on the
    * fixed-width vertex id) + a min-aggregate — no priority queue,
    * which is the right trade distributed: a global PQ serializes on
    * the driver, while whole-frontier relaxation is embarrassingly
    * parallel and settles in (shortest-path hop diameter) rounds.
    * Each round's plan is checkpoint-truncated. `maxIter` is the
    * Bellman-Ford bound — exact once maxIter ≥ V−1 (or the hop
    * diameter, usually far smaller); rounds stop as soon as no
    * distance improves.
    */
  def weightedShortestPathsDF(edges: DataFrame, src: String, dst: String,
      weight: String, sources: Seq[String], maxIter: Int = 64,
      directed: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    require(sources.nonEmpty, "at least one source vertex required")
    weightedShortestPathsDF(edges, src, dst, weight,
      sources.distinct.toDF("id"), maxIter, directed)
  }

  /** Distributed-sources variant (see [[shortestPathsDF]]'s DataFrame
    * overload): seeds stay a DataFrame end-to-end, matching GDS
    * dijkstra's server-side node-set sources. `sources`' first column
    * is the seed vertex set.
    */
  def weightedShortestPathsDF(edges: DataFrame, src: String, dst: String,
      weight: String, sources: DataFrame, maxIter: Int,
      directed: Boolean): DataFrame = {
    val e = edges.select(col(src).cast("string").as("a"),
      col(dst).cast("string").as("b"), col(weight).cast("long").as("w"))
    val und = (if (directed) e
      else e.unionByName(e.select(col("b").as("a"), col("a").as("b"), col("w"))))
      .cache()
    var dist = sources
      .select(col(sources.columns.head).cast("string").as("id")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint(eager = true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      i += 1
      val relaxed = und.join(dist.withColumnRenamed("id", "a"), "a")
        .select(col("b").as("id"), (col("dist") + col("w")).as("dist"))
        .unionByName(dist)
        .groupBy("id").agg(min("dist").as("dist"))
        .localCheckpoint(eager = true)
      converged = relaxed.as("n")
        .join(dist.as("o"), col("n.id") === col("o.id"), "left")
        .where(col("o.dist").isNull || col("n.dist") < col("o.dist"))
        .limit(1).count() == 0
      dist = relaxed
    }
    und.unpersist()
    dist
  }

  /** Per-vertex triangle counts over an undirected string-keyed edge
    * list (GDS `gds.triangleCount` parity) — every vertex of the
    * input graph, 0 for vertices in no triangle.
    *
    * Degree-ordered orientation (the classic one-round MR triangle
    * algorithm): each edge points from its (degree, id)-smaller
    * endpoint to the larger, so every triangle is enumerated exactly
    * once from its minimum vertex AND the wedge fan-out of any vertex
    * is bounded by its out-degree in the oriented graph — O(√E) for
    * arbitrary graphs. An id-only orientation would let one low-id
    * hub generate a quadratic wedge set; ordering by degree first is
    * what makes the self-join survive skew at scale. The order key is
    * a (degree, id) struct compared lexicographically — no global
    * row-numbering shuffle needed.
    */
  def triangleCountsDF(pairs: DataFrame, src: String, dst: String): DataFrame = {
    val e0 = pairs
      .select(col(src).cast("string").as("x"), col(dst).cast("string").as("y"))
      .where(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("x"), greatest(col("x"), col("y")).as("y"))
      .distinct()
      .cache()
    val deg = e0.select(col("x").as("id"))
      .unionByName(e0.select(col("y").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
      .cache()
    val withDeg = e0
      .join(deg.select(col("id").as("x"), col("deg").as("dx")), "x")
      .join(deg.select(col("id").as("y"), col("deg").as("dy")), "y")
    val oriented = withDeg.select(
      when(struct(col("dx"), col("x")) < struct(col("dy"), col("y")),
        struct(col("x").as("s"), col("y").as("t"),
          struct(col("dy").as("d"), col("y").as("v")).as("tk")))
        .otherwise(
          struct(col("y").as("s"), col("x").as("t"),
            struct(col("dx").as("d"), col("x").as("v")).as("tk")))
        .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.tk").as("tk"))
      .cache()
    // Wedges from each triangle's minimum vertex; the closing edge
    // (v, w) with tk_v < tk_w is oriented v→w by construction, so one
    // equi-join closes it.
    val wedges = oriented.as("p").join(oriented.as("q"),
      col("p.s") === col("q.s") && col("p.tk") < col("q.tk"))
      .select(col("p.s").as("u"), col("p.t").as("v"), col("q.t").as("w"))
    val tris = wedges.join(
      oriented.select(col("s").as("v"), col("t").as("w")), Seq("v", "w"))
    val counts = tris.select(col("u").as("id"))
      .unionByName(tris.select(col("v").as("id")))
      .unionByName(tris.select(col("w").as("id")))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    // materialize (one row per vertex) so the intermediate caches can
    // be released here instead of leaking into the shared storage pool
    val out = deg.select(col("id")).join(counts, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .localCheckpoint(eager = true)
    e0.unpersist()
    deg.unpersist()
    oriented.unpersist()
    out
  }

  /** Neighbor-set Jaccard for every vertex pair sharing ≥1 neighbor
    * (GDS `gds.nodeSimilarity` parity — the undirected Jaccard core;
    * similarity cutoffs/topK are the caller's filter over the exact
    * integer counts returned here, so no float ever enters the plan).
    *
    * Shape: one wedge self-join on the shared-neighbor key, one
    * count aggregate, two degree joins — all fixed-width columns.
    * The wedge fan-out is Σ deg(n)² over wedge centers, so hubs are
    * the scale hazard; `maxDegree` is GDS's `upperDegreeCutoff` — it
    * drops vertices above the cap from the computation entirely
    * (LSH-derived pair graphs are already band-width-bounded, so the
    * default no-op cap is safe there).
    *
    * Returns (a, b, inter_cnt, union_cnt) with a < b, string keys.
    */
  def nodeSimilarityDF(pairs: DataFrame, src: String, dst: String,
      maxDegree: Long = Long.MaxValue): DataFrame = {
    val e0 = pairs
      .select(col(src).cast("string").as("x"), col(dst).cast("string").as("y"))
      .where(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("x"), greatest(col("x"), col("y")).as("y"))
      .distinct()
    val und = e0.select(col("x").as("n"), col("y").as("m"))
      .unionByName(e0.select(col("y").as("n"), col("x").as("m")))
      .cache()
    val deg0 = und.groupBy("n").agg(count(lit(1)).as("deg"))
    val deg = (if (maxDegree == Long.MaxValue) deg0
               else deg0.where(col("deg") <= maxDegree)).cache()
    val kept =
      if (maxDegree == Long.MaxValue) und
      else und.join(deg.select("n"), Seq("n"), "left_semi")
        .join(deg.select(col("n").as("m")), Seq("m"), "left_semi")
    val wedges = kept.as("u1").join(kept.as("u2"),
        col("u1.n") === col("u2.n") && col("u1.m") < col("u2.m"))
      .groupBy(col("u1.m").as("a"), col("u2.m").as("b"))
      .agg(count(lit(1)).as("inter_cnt"))
    // materialize (pairs are band-width-bounded) then release caches
    val out = wedges
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
      .select(col("a"), col("b"), col("inter_cnt"),
        (col("da") + col("db") - col("inter_cnt")).as("union_cnt"))
      .localCheckpoint(eager = true)
    und.unpersist()
    deg.unpersist()
    out
  }

  /** Label propagation communities (GDS parity; k iterations). */
  def labelPropagation(pairs: DataFrame, src: String, dst: String,
      iterations: Int = 5): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val vids = vertexIds(pairs, src, dst).cache()
    val edgeDf = pairs
      .join(vids.withColumnRenamed("id", src).withColumnRenamed("vid", "svid"), src)
      .join(vids.withColumnRenamed("id", dst).withColumnRenamed("vid", "dvid"), dst)
      .select("svid", "dvid")
      .cache()
    val p = graphParallelism(edgeDf.count(), spark)
    val edgeRdd = edgeDf.rdd.coalesce(p)
      .map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val graph = XGraph.fromEdges(edgeRdd, ())
    val labels = org.apache.spark.graphx.lib.LabelPropagation
      .run(graph, iterations).vertices.toDF("vid", "label")
    val out = labels.join(vids, "vid").select(col("id"), col("label"))
      .localCheckpoint(eager = true) // see connectedComponents: vids not recompute-stable
    vids.unpersist()
    edgeDf.unpersist()
    out
  }
}
