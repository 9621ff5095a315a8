package graft

import org.scalatest.funsuite.AnyFunSuite

class TextQueriesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("bpeTrain learns the hand-computed merge list; greedy " +
      "left-to-right apply on overlapping sites") {
    import spark.implicits._
    // Sennrich-style vocab {low:5, lower:2, newest:6, widest:3} plus
    // 10× "lll" — an overlap chain: merging (l,l) greedily gives
    // "ll l" (NOT "l ll"), so round 2's top pair is ("ll l", 10);
    // a right-to-left or regex-global apply would learn a different
    // list and fail here.
    val docs = Seq(
      "low low low low low",
      "lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest",
      "lll lll lll lll lll lll lll lll lll lll").toDF("text")
    val got = graft.queries.TextQueries.bpeTrain(docs, 8)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // Hand-derived: round 1 (l,l) counts both adjacent positions of
    // "l l l" (2 per token × 10); after the greedy merge only
    // ("ll l") remains; ties (e s)/(s t) at 9 and (l o)/(o w) at 7
    // break on the pair string; "newest" collapses e s → es t →
    // e w → ew est through rounds 3-8.
    assert(got == Seq(
      (1, "l l", 20L), (2, "ll l", 10L),
      (3, "e s", 9L), (4, "es t", 9L),
      (5, "l o", 7L), (6, "lo w", 7L),
      (7, "e w", 6L), (8, "ew est", 6L)))
  }

  test("bpeTrain merge application preserves word counts and the " +
      "double-delimiter invariant end-to-end") {
    import spark.implicits._
    // After enough merges every word collapses to ONE symbol — the
    // trained-vocabulary fixpoint: further rounds must fail loudly
    // (corpus exhausted), never return garbage.
    val docs = Seq("ab ab ab").toDF("text")
    // round 1 merges (a b); round 2 has no pairs left anywhere
    val e = intercept[IllegalArgumentException] {
      graft.queries.TextQueries.bpeTrain(docs, 2).collect()
    }
    assert(e.getMessage.contains("corpus exhausted"), e.getMessage)
    val one = graft.queries.TextQueries.bpeTrain(docs, 1).collect()
    assert(one.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      == Seq((1, "a b", 3L)))
  }
}
