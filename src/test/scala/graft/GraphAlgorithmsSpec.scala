package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.GraphAlgorithms

class GraphAlgorithmsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("connected components: transitive closure with min-label ids") {
    val pairs = Seq(
      ("a", "b"), ("b", "c"), // component a
      ("x", "y"), // component x
      ("m", "n"), ("n", "o"), ("o", "m") // cycle, component m
    ).toDF("d1", "d2")
    val cc = GraphAlgorithms.connectedComponents(pairs, "d1", "d2")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc == Map(
      "a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x",
      "m" -> "m", "n" -> "m", "o" -> "m"))
  }

  test("DataFrame CC matches GraphX CC (cross-implementation)") {
    val pairs = Seq(
      ("a", "b"), ("b", "c"), ("x", "y"),
      ("m", "n"), ("n", "o"), ("o", "m"),
      ("p", "q"), ("q", "r"), ("r", "s"), ("s", "t") // chain, diameter 4
    ).toDF("d1", "d2")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val viaGraphX = toMap(GraphAlgorithms.connectedComponents(pairs, "d1", "d2"))
    val viaLocal = toMap(GraphAlgorithms.connectedComponentsDF(pairs, "d1", "d2"))
    val viaLoop = toMap(GraphAlgorithms.connectedComponentsDF(
      pairs, "d1", "d2", localThreshold = 0)) // force the distributed path
    assert(viaLocal == viaGraphX)
    assert(viaLoop == viaGraphX)
    assert(viaLocal("t") == "p", "chain must fully converge")
  }

  test("pagerank: sinks rank below hubs, ranks deterministic") {
    // star: everything points at "hub"
    val edges = Seq(("s1", "hub"), ("s2", "hub"), ("s3", "hub"))
      .toDF("src", "dst")
    val pr = GraphAlgorithms.pageRank(edges, "src", "dst")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr("hub") > pr("s1"))
    assert(pr("s1") == pr("s2") && pr("s2") == pr("s3"))
    val again = GraphAlgorithms.pageRank(edges, "src", "dst")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr == again)
  }

  test("label propagation assigns every vertex a community") {
    val pairs = Seq(("a", "b"), ("c", "d")).toDF("d1", "d2")
    val lp = GraphAlgorithms.labelPropagation(pairs, "d1", "d2").collect()
    assert(lp.length == 4)
  }

  test("triangle counts: golden K4 + wedge + duplicate/reversed edges") {
    // K4 on {a,b,c,d}: 4 triangles, each vertex in 3 of them.
    // Wedge x-y-z closes no triangle. Duplicate and reversed edges
    // must not inflate counts (canonicalized + distinct).
    val k4 = for (Seq(u, v) <- Seq("a", "b", "c", "d").combinations(2).toSeq)
      yield (u, v)
    val edges = (k4 ++ Seq(("x", "y"), ("y", "z"), ("b", "a"), ("a", "b")))
      .toDF("s", "t")
    val got = GraphAlgorithms.triangleCountsDF(edges, "s", "t")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "a" -> 3, "b" -> 3, "c" -> 3, "d" -> 3,
      "x" -> 0, "y" -> 0, "z" -> 0))
  }

  test("weighted shortest path: lightest path beats fewest hops") {
    //  a --10-- b      direct hop costs 10;
    //  a -1- c -1- d -1- b   the 3-hop detour costs 3.
    //  f isolated via g (weight 5), h unreachable.
    val edges = Seq(
      ("a", "b", 10L), ("a", "c", 1L), ("c", "d", 1L), ("d", "b", 1L),
      ("f", "g", 5L)
    ).toDF("s", "t", "w")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = toMap(GraphAlgorithms.weightedShortestPathsDF(
      edges, "s", "t", "w", Seq("a")))
    assert(got == Map("a" -> 0, "c" -> 1, "d" -> 2, "b" -> 3))
    // directed: edges flow s→t only, so nothing reaches back to "a"
    // and b is still cheapest via the chain
    val dir = toMap(GraphAlgorithms.weightedShortestPathsDF(
      edges, "s", "t", "w", Seq("b"), directed = true))
    assert(dir == Map("b" -> 0))
    // multi-source takes the min over sources
    val multi = toMap(GraphAlgorithms.weightedShortestPathsDF(
      edges, "s", "t", "w", Seq("a", "b")))
    assert(multi("d") == 1 && multi("c") == 1 && multi("b") == 0)
    // maxIter bounds the relaxation rounds: one round from "a" only
    // settles the direct neighbors (b via the 10-edge, c via the 1)
    val one = toMap(GraphAlgorithms.weightedShortestPathsDF(
      edges, "s", "t", "w", Seq("a"), maxIter = 1))
    assert(one == Map("a" -> 0, "b" -> 10, "c" -> 1))
  }

  test("node similarity: golden neighbor-set Jaccard + degree cutoff") {
    // u and v share {n1,n2,n3}; u additionally sees w. Exact sets:
    //   N(u)={n1,n2,n3,w} N(v)={n1,n2,n3} N(ni)={u,v} N(w)={u}
    // Duplicate/reversed edge (n1,u) must not inflate counts.
    val edges = Seq(
      ("u", "n1"), ("u", "n2"), ("u", "n3"), ("u", "w"),
      ("v", "n1"), ("v", "n2"), ("v", "n3"), ("n1", "u")
    ).toDF("s", "t")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
    val got = toMap(GraphAlgorithms.nodeSimilarityDF(edges, "s", "t"))
    assert(got == Map(
      ("u", "v") -> (3L, 4L), // J = 0.75
      ("n1", "n2") -> (2L, 2L), ("n1", "n3") -> (2L, 2L),
      ("n2", "n3") -> (2L, 2L), // exact twins, J = 1
      ("n1", "w") -> (1L, 2L), ("n2", "w") -> (1L, 2L),
      ("n3", "w") -> (1L, 2L))) // share only u, J = 0.5
    // upperDegreeCutoff parity: maxDegree=3 drops hub u entirely;
    // kept vertices keep their FULL degrees (GDS semantics).
    val capped = toMap(GraphAlgorithms.nodeSimilarityDF(edges, "s", "t", maxDegree = 3))
    assert(capped == Map(
      ("n1", "n2") -> (1L, 3L), ("n1", "n3") -> (1L, 3L),
      ("n2", "n3") -> (1L, 3L)))
  }

  test("BFS shortest paths: golden distances, undirected vs directed") {
    //   a — b — c — d   (chain)      g — h (disconnected)
    //   a — e — d       (shortcut)
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "d"),
      ("a", "e"), ("e", "d"),
      ("g", "h")
    ).toDF("s", "t")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val und = toMap(GraphAlgorithms.shortestPathsDF(edges, "s", "t", Seq("a")))
    // d is 2 via e (not 3 via the chain); g/h unreachable → absent
    assert(und == Map("a" -> 0, "b" -> 1, "e" -> 1, "c" -> 2, "d" -> 2))
    // directed: edges only flow s→t, so from "d" nothing is reachable
    val dir = toMap(GraphAlgorithms.shortestPathsDF(
      edges, "s", "t", Seq("d"), directed = true))
    assert(dir == Map("d" -> 0))
    // maxDepth truncates the expansion (not an error)
    val shallow = toMap(GraphAlgorithms.shortestPathsDF(
      edges, "s", "t", Seq("a"), maxDepth = 1))
    assert(shallow == Map("a" -> 0, "b" -> 1, "e" -> 1))
    // multi-source: distance = min over sources
    val multi = toMap(GraphAlgorithms.shortestPathsDF(
      edges, "s", "t", Seq("a", "d")))
    assert(multi("c") == 1 && multi("b") == 1 && multi("e") == 1)
  }

  test("DataFrame-sources overloads match the Seq overloads exactly") {
    // seeds as a distributed DataFrame (the pipeline shape — no
    // driver-side collect); first column is the seed set, duplicate
    // seeds and a non-"id" column name must not matter.
    val edges = Seq(
      ("a", "b", 10L), ("a", "c", 1L), ("c", "d", 1L), ("d", "b", 1L),
      ("f", "g", 5L)
    ).toDF("s", "t", "w")
    val seedDf = Seq("a", "b", "a").toDF("component")

    val viaSeq = GraphAlgorithms.weightedShortestPathsDF(
      edges, "s", "t", "w", Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaDf = GraphAlgorithms.weightedShortestPathsDF(
      edges, "s", "t", "w", seedDf, maxIter = 64, directed = false)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaDf == viaSeq)

    val bfsSeq = GraphAlgorithms.shortestPathsDF(edges, "s", "t", Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val bfsDf = GraphAlgorithms.shortestPathsDF(
      edges, "s", "t", seedDf, maxDepth = 30, directed = false)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(bfsDf == bfsSeq)

    // empty distributed seed set: empty result, no special-casing
    assert(GraphAlgorithms.shortestPathsDF(edges, "s", "t",
      seedDf.where("component = 'zzz'"), maxDepth = 5,
      directed = false).count() == 0)
  }
}
