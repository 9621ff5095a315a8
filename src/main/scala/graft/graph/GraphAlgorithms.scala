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

  /** Connected components over an undirected string-keyed pair list.
    * Returns (id, component) where component = min member id
    * (lexicographic) of the cluster — a stable cluster label. */
  def connectedComponents(pairs: DataFrame, src: String, dst: String): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val vids = vertexIds(pairs, src, dst).cache()
    val edgeRdd = pairs
      .join(vids.withColumnRenamed("id", src).withColumnRenamed("vid", "svid"), src)
      .join(vids.withColumnRenamed("id", dst).withColumnRenamed("vid", "dvid"), dst)
      .select("svid", "dvid")
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val graph = XGraph.fromEdges(edgeRdd, ())
    val cc = graph.connectedComponents().vertices.toDF("vid", "cvid")
    // component label = min original id within the component
    val labeled = cc.join(vids, "vid").select(col("id"), col("cvid"))
    val repr = labeled.groupBy("cvid").agg(min(col("id")).as("component"))
    labeled.join(repr, "cvid").select("id", "component")
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
    val edgeRdd = edges
      .join(vids.withColumnRenamed("id", src).withColumnRenamed("vid", "svid"), src)
      .join(vids.withColumnRenamed("id", dst).withColumnRenamed("vid", "dvid"), dst)
      .select("svid", "dvid")
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1.0))
    val graph = XGraph.fromEdges(edgeRdd, 1.0)
      .partitionBy(org.apache.spark.graphx.PartitionStrategy.EdgePartition2D)
    val ranks = graph.staticPageRank(iterations, resetProb)
      .vertices.toDF("vid", "rank")
    ranks.join(vids, "vid")
      .select(col("id"), round(col("rank"), scale).as("rank"))
  }

  /** Label propagation communities (GDS parity; k iterations). */
  def labelPropagation(pairs: DataFrame, src: String, dst: String,
      iterations: Int = 5): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val vids = vertexIds(pairs, src, dst).cache()
    val edgeRdd = pairs
      .join(vids.withColumnRenamed("id", src).withColumnRenamed("vid", "svid"), src)
      .join(vids.withColumnRenamed("id", dst).withColumnRenamed("vid", "dvid"), dst)
      .select("svid", "dvid")
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val graph = XGraph.fromEdges(edgeRdd, ())
    val labels = org.apache.spark.graphx.lib.LabelPropagation
      .run(graph, iterations).vertices.toDF("vid", "label")
    labels.join(vids, "vid").select(col("id"), col("label"))
  }
}
