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

  test("bpeTrainBatched == greedy bpeTrain when top pairs are " +
      "non-interacting — one round for the whole batch") {
    import spark.implicits._
    // three disjoint-symbol words: (a b)=5, (c d)=4, (e f)=3 share no
    // symbol, so the longest non-interacting prefix is all three and
    // one round applies the full greedy sequence
    val docs = Seq("ab ab ab ab ab", "cd cd cd cd", "ef ef ef")
      .toDF("text")
    val greedy = graft.queries.TextQueries.bpeTrain(docs, 3)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val batched = graft.queries.TextQueries
      .bpeTrainBatched(docs, 3, maxPerRound = 8)
      .orderBy("merge_rank").collect()
    assert(batched.map(r =>
      (r.getInt(0), r.getString(1), r.getLong(2))).toSeq == greedy)
    assert(batched.map(_.getInt(3)).toSeq == Seq(1, 1, 1),
      "non-interacting top-3 must land in ONE round")
    assert(greedy == Seq((1, "a b", 5L), (2, "c d", 4L), (3, "e f", 3L)))
  }

  test("bpeTrainBatched falls back to exact greedy (prefix = 1) when " +
      "the top pairs interact") {
    import spark.implicits._
    // "abc": (a b)=5 and (b c)=5 share b — the round-1 prefix stops
    // at 1, and round 2's top pair is the CREATED (ab c): two rounds,
    // identical to one-at-a-time greedy
    val docs = Seq("abc abc abc abc abc").toDF("text")
    val batched = graft.queries.TextQueries
      .bpeTrainBatched(docs, 2, maxPerRound = 8)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSeq
    assert(batched == Seq((1, "a b", 5L, 1), (2, "ab c", 5L, 2)))
    val greedy = graft.queries.TextQueries.bpeTrain(docs, 2)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(batched.map(t => (t._1, t._2, t._3)) == greedy)
  }

  test("bpeTrainBatched(maxPerRound = 1) IS bpeTrain; wider batches " +
      "carry the documented created-pair caveat") {
    import spark.implicits._
    val docs = Seq(
      "low low low low low",
      "lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest",
      "lll lll lll lll lll lll lll lll lll lll").toDF("text")
    // exact mode: one pair per round == the greedy trainer, always
    val greedy = graft.queries.TextQueries.bpeTrain(docs, 8)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val exact = graft.queries.TextQueries
      .bpeTrainBatched(docs, 8, maxPerRound = 1)
      .orderBy("merge_rank").collect()
    assert(exact.map(r =>
      (r.getInt(0), r.getString(1), r.getLong(2))).toSeq == greedy)
    assert(exact.map(_.getInt(3)).toSeq == (1 to 8),
      "maxPerRound=1 must be one merge per round")
    // the caveat, pinned: on this fixture greedy's merge 2 is the
    // CREATED pair ("ll l", 10) — batching (l l) with the
    // non-interacting (e s, 9) skips it, so batched-wide DIVERGES
    // from greedy here by design (why exact mode exists)
    val wide = graft.queries.TextQueries
      .bpeTrainBatched(docs, 2, maxPerRound = 16)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSeq
    assert(wide == Seq((1, "l l", 20L, 1), (2, "e s", 9L, 1)))
    assert(greedy(1) == ((2, "ll l", 10L)))
  }

  test("bpeTrainBatched stops at corpus exhaustion: a request past " +
      "the learnable vocab returns every available merge, no error") {
    import spark.implicits._
    // "ab" and "cd" admit exactly 2 merges, then every word is one
    // symbol — a 100-merge request must return those 2 and stop
    // (real tokenizer semantics: trained vocab = min(requested,
    // learnable)), never loop or throw
    val docs = Seq("ab ab cd", "cd ab").toDF("text")
    val m = graft.queries.TextQueries
      .bpeTrainBatched(docs, 100, maxPerRound = 16)
      .orderBy("merge_rank").collect()
    assert(m.length == 2, m.mkString(", "))
    assert(m.map(_.getString(1)).toSet == Set("a b", "c d"))
    // the greedy trainer keeps its loud contract on the same input
    val e = intercept[IllegalArgumentException] {
      graft.queries.TextQueries.bpeTrain(docs, 100)
    }
    assert(e.getMessage.contains("corpus exhausted"), e.getMessage)
  }

  test("adaptive width: on a batch-safe corpus (disjoint pairs, " +
      "distinct counts) adaptive == fixed == greedy merge-for-merge, " +
      "and the doubling collapses the round count") {
    import spark.implicits._
    // 24 two-char words over 48 DISTINCT symbols with strictly
    // decreasing frequencies: every candidate pair is symbol-disjoint
    // from every other, a merged word is a single symbol (no created
    // pairs), and no counts tie — so ANY width schedule must learn
    // the identical merge list, and the only degree of freedom left
    // is the round count. This isolates exactly what adaptation is
    // allowed to change.
    val syms = (('a' to 'z') ++ ('A' to 'V')).map(_.toString)
    val words = syms.grouped(2).map(p => p(0) + p(1)).toSeq // 24 words
    val docs = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(100 - i)(w) }
      .toDF("text")
    def run(adaptive: Boolean) = graft.queries.TextQueries
      .bpeTrainBatched(docs, 24, maxPerRound = 2,
        adaptive = adaptive, adaptiveCap = 64)
      .orderBy("merge_rank").collect()
    val fixed = run(adaptive = false)
    val adapt = run(adaptive = true)
    assert(adapt.map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .toSeq ==
      fixed.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq)
    // ...and equals exact greedy on the same corpus
    val greedy = graft.queries.TextQueries.bpeTrain(docs, 24)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(adapt.map(r =>
      (r.getInt(0), r.getString(1), r.getLong(2))).toSeq == greedy)
    // fixed-2 needs 24/2 = 12 rounds; adaptive doubles 2→4→8→16 and
    // must land well under half that
    val (rFixed, rAdapt) =
      (fixed.map(_.getInt(3)).max, adapt.map(_.getInt(3)).max)
    assert(rFixed == 12, s"fixed-2 should pace 12 rounds, got $rFixed")
    assert(rAdapt <= 5,
      s"adaptive used $rAdapt rounds vs fixed $rFixed — never widened")
  }

  test("batched BPE prefix: a pair consuming an earlier member's " +
      "FUSED output stops the batch (not just shared inputs)") {
    import graft.queries.TextQueries.nonInteractingPrefixLen
    // disjoint inputs, disjoint outputs — both batch
    assert(nonInteractingPrefixLen(Seq("a b", "c d")) == 2)
    // shared input symbol — classic interaction
    assert(nonInteractingPrefixLen(Seq("a b", "b c")) == 1)
    // the regression: ('ab','c') fuses 'abc'; a ranked ('abc','d')
    // behind it shares NO input symbol ({ab,c} ∩ {abc,d} = ∅) but
    // would merge ' abc  d ' sites the batch itself creates, under a
    // count taken before they existed — the fused output must claim a
    // slot too, on either side of the later pair
    assert(nonInteractingPrefixLen(Seq("ab c", "abc d")) == 1)
    assert(nonInteractingPrefixLen(Seq("ab c", "d abc")) == 1)
    // the stop is positional: an interacting pair ends the PREFIX
    // even when a later pair would again be independent
    assert(nonInteractingPrefixLen(Seq("ab c", "x y", "abc d")) == 2)
    // never zero
    assert(nonInteractingPrefixLen(Seq("a a")) == 1)
  }

  test("adaptive BPE subset: skips an interacting pair and keeps " +
      "scanning; fused outputs still claim slots; == prefix when " +
      "pairs are disjoint") {
    import graft.queries.TextQueries.nonInteractingSubsetIdx
    // disjoint ranking: subset IS the prefix (the batch-safe
    // equivalence spec's precondition)
    assert(nonInteractingSubsetIdx(Seq("a b", "c d")) == Seq(0, 1))
    // the case the prefix rule cannot batch — an interacting pair in
    // the middle is SKIPPED, not a stop (it re-ranks next round):
    // this is what lets a wider fetch actually widen the batch
    assert(nonInteractingSubsetIdx(Seq("a b", "b c", "d e")) == Seq(0, 2))
    // fused-output hazard, both sides (the prefix rule's regression
    // case): 'ab c' fuses 'abc' — a later pair touching 'abc' must
    // not batch with it
    assert(nonInteractingSubsetIdx(Seq("ab c", "abc d", "x y")) == Seq(0, 2))
    assert(nonInteractingSubsetIdx(Seq("ab c", "d abc", "x y")) == Seq(0, 2))
    // a skipped pair's symbols claim nothing: later pairs sharing
    // ONLY the skipped pair's symbols still batch
    assert(nonInteractingSubsetIdx(Seq("a b", "b c", "c d")) == Seq(0, 2))
    // never empty
    assert(nonInteractingSubsetIdx(Seq("a a")) == Seq(0))
  }
}
