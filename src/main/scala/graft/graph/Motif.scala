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
}
