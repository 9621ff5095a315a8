package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic ad-hoc traversal — the Cypher-path fragment of the
  * reference's ad-hoc query surface (gfe-db/database/scripts/
  * Makefile:74-89, database/template.yaml:262-263) as an ordered fold
  * of equi-joins over the per-label edge tables. The fixed-shape
  * functions in [[GraphQueries]] are special cases; this is the API a
  * user reaches for when their MATCH pattern isn't one of them.
  *
  * A hop walks `src→dst` (or `dst→src` with `reverse = true`). Node
  * keys surface as columns `n0..nK`; the attributes of hop i surface
  * prefixed `e{i}_`. Edge tables whose far end is a composite natural
  * key (HAS_FEATURE: the Feature node key is its attribute tuple,
  * load.cyp:130-135) get a synthesized `:`-joined key column, the same
  * encoding the PageRank bipartite projection uses.
  *
  * Scale shape: each hop is one equi-join on a node key — Catalyst
  * reorders/broadcasts as sizes dictate, and an anchored pattern
  * (filter on `n0`) prunes before the first join, so a k-hop expansion
  * is k shuffles at worst, zero on the bucketed store's anchor join.
  */
object Motif {

  final case class Hop(edge: String, reverse: Boolean = false)

  def path(g: GraphLoad.Graph, hops: Seq[Hop]): DataFrame = {
    require(hops.nonEmpty, "at least one hop required")
    def hopDf(h: Hop, i: Int): DataFrame = {
      val t = g.edgeTables(h.edge)
      val attrCols = t.columns.filterNot(c => c == "src" || c == "dst")
      val dstExpr =
        if (t.columns.contains("dst")) col("dst")
        else concat_ws(":", attrCols.map(col).toIndexedSeq: _*)
      val (from, to) = if (h.reverse) (dstExpr, col("src"))
        else (col("src"), dstExpr)
      t.select(Seq(from.as(s"n$i"), to.as(s"n${i + 1}")) ++
        attrCols.map(c => col(c).as(s"e${i}_$c")): _*)
    }
    hops.zipWithIndex.map { case (h, i) => hopDf(h, i) }
      .reduceLeft { (acc, next) =>
        acc.join(next, Seq(next.columns.head))
      }
  }

  /** Variable-length expansion — the Cypher `-[*min..max]-` /
    * `-[*min..max]->` idiom (template.yaml:240-264 exposes full
    * Cypher; reference.rst:34-37's documented traversal is written
    * with undirected edges), which [[path]]'s fixed-hop fold cannot
    * express. Implemented as the union of fixed-k expansions with a
    * visited-node guard: SIMPLE paths (no vertex revisited), the
    * standard no-revisit rule that keeps the expansion finite on
    * cycles. (Cypher's native uniqueness is per-relationship, which
    * additionally admits paths that return to an earlier vertex over
    * fresh edges; on the gfe graph's multipartite shape the two
    * semantics coincide for max ≤ diameter, and node-distinctness is
    * the one that bounds state at 100 TB.)
    *
    * Returns one row per (n_start, n_end, len) with the simple-path
    * count — the reachability-with-multiplicity relation ad-hoc
    * traversals consume.
    *
    * Scale shape: hop k is ONE equi-join of the length-(k−1) frontier
    * with the edge list on the frontier's end key, guarded by an
    * `array_contains` on a ≤max-element visited array — shuffle keys
    * are single node ids, frontier rows carry O(max) state, and an
    * anchored pattern (filter n_start before expanding) prunes every
    * downstream hop. No transitive-closure materialization.
    */
  def varPath(edges: DataFrame, src: String, dst: String,
      minLen: Int, maxLen: Int, either: Boolean = false): DataFrame = {
    require(minLen >= 1 && maxLen >= minLen, "need 1 <= minLen <= maxLen")
    val e0 = edges
      .select(col(src).cast("string").as("a"), col(dst).cast("string").as("b"))
      .where(col("a") =!= col("b"))
    val e = (if (either) e0.unionByName(e0.select(col("b").as("a"), col("a").as("b")))
      else e0).distinct()
    var frontier = e.select(col("a").as("n_start"), col("b").as("n_end"),
      array(col("a"), col("b")).as("visited"), lit(1).as("len"))
    var out = frontier
    for (l <- 2 to maxLen) {
      val step = e.select(col("a").as("_sa"), col("b").as("_sb"))
      frontier = frontier
        .join(step, col("n_end") === col("_sa"))
        .where(!array_contains(col("visited"), col("_sb")))
        .select(col("n_start"), col("_sb").as("n_end"),
          concat(col("visited"), array(col("_sb"))).as("visited"),
          lit(l).as("len"))
      out = out.unionByName(frontier)
    }
    out.where(col("len") >= minLen)
      .groupBy("n_start", "n_end", "len")
      .agg(count(lit(1)).as("n_paths"))
  }

  /** [[varPath]] over the union of a graph's edge labels (Cypher's
    * label-free `-[*1..k]-`): node keys are each label's src/dst
    * (composite-key far ends get the same `:`-joined encoding as
    * [[path]]). */
  def varPath(g: GraphLoad.Graph, labels: Seq[String],
      minLen: Int, maxLen: Int, either: Boolean): DataFrame = {
    val e = labels.map { lbl =>
      val t = g.edgeTables(lbl)
      val dstExpr =
        if (t.columns.contains("dst")) col("dst")
        else concat_ws(":",
          t.columns.filterNot(c => c == "src" || c == "dst")
            .map(col).toIndexedSeq: _*)
      t.select(col("src"), dstExpr.as("dst"))
    }.reduce(_ unionByName _)
    varPath(e, "src", "dst", minLen, maxLen, either)
  }
}
