package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression guards for the physical plans — the 100 TB discipline,
  * enforced: filters/projections must reach the parquet scan, small
  * dimensions must broadcast, aggregates must have a map-side partial
  * phase, and whole-stage codegen must cover the hot operators. A
  * change that silently degrades any of these fails the suite.
  */
class PlanQualitySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  /** Final (post-AQE) physical plan: execute first, then render —
    * the pre-execution adaptive plan hides codegen stage boundaries. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    // keep only the final adaptive plan (the trailing "Initial Plan"
    // section would double-count operators)
    df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
  }

  /** `*(n)` prefixes mark whole-stage-codegen stages in compact plans. */
  private def hasCodegen(plan: String): Boolean =
    "\\*\\(\\d+\\)".r.findFirstIn(plan).nonEmpty

  private def planOf(name: String): String =
    finalPlan(SparkEntry.queries(name)(spark, sfDir))

  test("varlen motif: every hop is an equi-join, never a cartesian") {
    // The visited-node guard is a post-join FILTER on the frontier
    // row, not a join condition — a planner that fell back to a
    // nested loop for it would explode at scale.
    val plan = planOf("gfe_motif_varlen")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      plan.take(2000))
    // trail mode adds canonical-edge visited marks but must keep the
    // same join shape — the mark is a projected column, never a
    // join condition that could defeat the equi-join planner
    val trail = planOf("gfe_motif_varlen_trail")
    assert(!trail.contains("CartesianProduct") && !trail.contains("NestedLoop"),
      trail.take(2000))
  }

  test("sequence packing: two-phase scan, never a single-partition window") {
    // The global token offset must come from PrefixSum's
    // range-repartition + partition-local window — a window specced
    // without _pid would be the all-rows-through-one-task WindowExec.
    val plan = planOf("t_pack_sequences")
    assert(plan.contains("rangepartitioning(doc_id"), plan.take(2000))
    assert(plan.contains("windowspecdefinition(_pid"),
      "running sum must be partition-local, keyed by the range pid")
  }

  test("filters and column pruning reach the parquet scan (s7)") {
    val plan = planOf("s7_scan_filter_project")
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("LessThan(l_shipdate"), "shipdate filter must push down")
    // (pushed-filter lists are truncated in toString; GreaterThan is
    // the quantity predicate — the only other non-null filter)
    assert(plan.contains("GreaterThan"), "quantity filter must push down")
    // pruned read schema: only the 4 referenced columns
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment"),
      "scan must not read unreferenced columns")
  }

  test("small dimension joins broadcast (j1, j4)") {
    assert(planOf("j1_broadcast_join").contains("BroadcastHashJoin"))
    val j4 = planOf("j4_multiway_join")
    // >= not ==: the contract is "no small-dim join falls back to a
    // shuffle", not an exact operator census — an AQE plan change
    // that (say) folds a join away must not fail this
    assert("BroadcastHashJoin".r.findAllIn(j4).length >= 2,
      "both nation and region joins must broadcast")
    assert(!j4.contains("SortMergeJoin") &&
      !j4.contains("ShuffledHashJoin"),
      "no small-dim join may take a shuffle path")
  }

  test("stream-join batch twin is an equi-join with pushed type filters") {
    val plan = planOf("st_stream_join")
    // user_id equi-key must drive a hash/merge join; the time range is
    // a post-join filter, never a nested-loop or cartesian fallback
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      plan.take(2000))
    assert(plan.contains("EqualTo(event_type,view)") &&
      plan.contains("EqualTo(event_type,click)"),
      "event_type filters must push to the parquet scans")
  }

  test("semi/anti joins use join strategies, not subquery rewrites") {
    assert(planOf("j_semi_exists").contains("LeftSemi"))
    assert(planOf("j_anti_not_exists").contains("LeftAnti"))
  }

  test("aggregations run partial (map-side) then final (entry Q1 shape)") {
    val plan = finalPlan(SparkEntry.entry(spark))
    assert(plan.contains("partial_sum"), "expect map-side partial aggregate")
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      "expect partial + final hash aggregate")
    assert(hasCodegen(plan), "agg pipeline must codegen")
  }

  test("native graft_dot stays inside whole-stage codegen (v_cosine_topk)") {
    val plan = planOf("v_cosine_topk")
    assert(plan.contains("graft_dot"), "native expression must be in the plan")
    assert(!plan.contains("BatchEvalPython"))
    assert(hasCodegen(plan))
  }

  test("exact dedup shuffles the 60-bit key, not raw text (d_exact_dedup)") {
    val plan = planOf("d_exact_dedup")
    // partial agg computes min/count before the exchange
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    assert(exchangeIdx > 0, "grouped agg must hash-partition")
    assert(plan.contains("partial_min") || plan.contains("partial_count"),
      "map-side combine must run before the shuffle")
  }

  test("range join runs as a bucket equi-join, not a nested loop") {
    val plan = planOf("j_range_nearby")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "the |dt|<=r predicate must ride an equi-join on the bucket key")
  }

  test("as-of join is a single window pass, no join operator at all") {
    val plan = planOf("j_asof_last_click")
    assert(plan.contains("Window"))
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"))
  }

  test("top-k per group computes rank before the presentation sort") {
    val plan = planOf("w_topk_per_group")
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"),
      "window operator expected")
  }

  test("events scan is vectorized with canonical µs ts, no legacy conversion") {
    val df = Tables.events(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // whatever precision the fixture declares, the served schema is
    // one canonical TimestampType µs column
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType,
      "events.ts must be served as TimestampType")
    // vectorized parquet scan (TIMESTAMP(MICROS) and the snapshot path
    // both qualify; nanos-as-long would fall to the row-based reader)
    assert(plan.contains("Batched: true"), plan.take(2000))
    assert(!plan.toLowerCase.contains("timestamp_micros"),
      "no per-query ns→µs conversion should remain in the plan")
  }

  test("embedding near-dup verifies banded candidates only, no all-pairs join") {
    val plan = planOf("d_embedding_neardup")
    assert(!plan.contains("CartesianProduct"))
    // the only non-equi join allowed is the bounded 16-row hyperplane
    // broadcast (its subtree renders once per side of the bands
    // self-join); the candidate join itself must ride (band, bk) keys
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length <= 2,
      plan.take(2000))
    assert(plan.contains("BroadcastHashJoin [band") ||
      plan.contains("SortMergeJoin [band") ||
      "HashJoin \\[band".r.findFirstIn(plan).nonEmpty,
      "candidate generation must be an equi-join on the band keys")
  }

  test("jaccard verify consumes the banded candidate pairs, not a self-join") {
    val plan = planOf("d_jaccard_pairs")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
  }

  test("incremental dedup probes the band index with semi-joins only") {
    val plan = planOf("d_incremental_dedup")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
    assert(plan.contains("LeftSemi"),
      "corpus screening must be semi-joins — no corpus payload crosses the wire")
  }

  test("range search broadcasts queries and has no per-query window") {
    val plan = planOf("v_range_search")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      "query side must broadcast")
    assert(!plan.contains("Window"),
      "radius filter must fuse into the scan-side stage, not rank")
  }

  test("compaction plan and rarity score keep map-side partial aggregates") {
    val cp = planOf("o_compaction_plan")
    assert(cp.contains("partial_count") || cp.contains("partial_sum"),
      "plan rollup must partial-aggregate before the shuffle")
    val rs = planOf("t_rarity_score")
    assert(rs.contains("partial_count") || rs.contains("partial_sum"))
    assert(rs.contains("Broadcast"),
      "corpus size must join in as a broadcast singleton, not a collect")
  }

  test("chunking and split-assign stay scan-local: one exchange, the sort's") {
    // both are per-row maps at 100 TB — the ONLY exchange allowed in
    // either plan is the presentation ORDER BY's range repartition
    for (q <- Seq("t_chunk_sliding", "smp_split_assign")) {
      val plan = planOf(q)
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges <= 1, s"$q: expected only the sort exchange:\n" +
        plan.take(1500))
      assert(!plan.contains("SortMergeJoin") && !plan.contains("HashJoin"),
        s"$q must not join anything")
    }
  }

  test("setsim prefix-filter is equi-join only, no cross join") {
    val plan = planOf("d_setsim_join")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      "exact set-similarity must block on prefix tokens, never cross-join")
  }

  test("LSH banding bounds the per-doc candidate fan-out (d_jaccard blocking)") {
    import org.apache.spark.sql.functions._
    val pairs = SparkEntry.queries("d_minhash_lsh")(spark, sfDir)
    val maxDeg = pairs
      .select(explode(array(col("d1"), col("d2"))).as("doc"))
      .groupBy("doc").agg(count(lit(1)).as("deg"))
      .agg(max(col("deg"))).head.getLong(0)
    assert(maxDeg <= 64,
      s"a candidate block grew quadratic (max per-doc fan-out $maxDeg)")
  }

  test("substring-run dedup: equi-join on gram hash, no cartesian, map-side combine") {
    val plan = planOf("d_substring_runs")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      "the positional self-join must ride the gh equi-key")
    assert(plan.contains("partial_count"),
      "the (d1,d2,off) aggregation must combine map-side")
  }

  test("stream-static enrichment broadcasts the dimension (st_enrich)") {
    val plan = planOf("st_enrich")
    assert(plan.contains("BroadcastHashJoin"),
      "the customer dim must broadcast — no shuffle of the event feed")
  }

  test("quantized top-k stays integral and codegen'd (v_quantized_topk)") {
    val plan = planOf("v_quantized_topk")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BatchEvalPython"))
    assert(hasCodegen(plan), "HOF dot product must stay in codegen")
  }

  test("vocab top-k is a TakeOrdered over a partial-agg'd shuffle, not a global sort") {
    val plan = planOf("t_vocab_topk")
    assert(plan.contains("TakeOrderedAndProject"),
      "orderBy+limit must compile to top-k, never a full sort")
    assert(plan.contains("partial_count"),
      "per-partition vocab must fold before the exchange")
  }

  test("tf-idf joins and windows on equi-keys, no nested loop") {
    val plan = planOf("t_tfidf_topterms")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
    assert(plan.contains("Window"), "top-3 rank must be a window, not a self-join")
  }

  test("keyword search prunes postings with the IN filter before grouping") {
    val plan = planOf("t_keyword_search")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
    // The IN over query terms must apply in the scan/explode stage —
    // textually BELOW the deepest Exchange (plans print root-first),
    // i.e. the posting stream is pruned before anything shuffles.
    val belowDeepestExchange = plan.substring(plan.lastIndexOf("Exchange"))
    assert(belowDeepestExchange.contains("IN (spark,stream,window)"),
      "term filter must sit under every shuffle")
    // and the scan reads only the two referenced columns
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("struct<doc_id:bigint,text:string>"),
      s"scan must be pruned to (doc_id, text): $readSchema")
  }

  test("node similarity and shortest path stay on equi-joins") {
    for (q <- Seq("d_node_similarity", "d_dup_shortest_path")) {
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
        s"$q must ride equi-keys only")
    }
  }

  test("PII redaction is scan-local: no exchange except the presentation sort") {
    val plan = planOf("t_redact")
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty,
      "per-row redaction must not hash-shuffle")
    assert(hasCodegen(plan), "regex pipeline must stay in codegen")
  }

  test("PQ ANN scans the code table once against a broadcast ADC table") {
    val plan = planOf("v_pq_topk")
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    // the distance table (queries × codebooks, ~1k rows) must be the
    // broadcast side of the code-table join — the corpus-sized code
    // scan can never shuffle for it
    assert(plan.contains("BroadcastHashJoin"),
      "ADC table must broadcast-join the code table")
    assert(plan.contains("partial_sum"),
      "ADC sum must combine map-side before the (q_id, n_id) exchange")
  }

  test("funnel stages ride user_id equi-joins with range conjuncts only") {
    for (q <- Seq("w_funnel_stages", "st_funnel")) {
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
        s"$q: stage gating must be a user_id equi-join, never a loop join")
    }
  }

  test("z-order key is scan-local codegen'd bit math (o_zorder_layout)") {
    val plan = planOf("o_zorder_layout")
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty,
      "the Morton code is a per-row map — only the presentation range sort may shuffle")
    assert(!plan.contains("BatchEvalPython"))
    assert(hasCodegen(plan), "bit interleave must stay in codegen")
  }

  test("table profile computes all column stats in one aggregate (a_profile)") {
    val plan = planOf("a_profile")
    // one Expand-based multi-distinct aggregate, not three table scans
    assert("FileScan parquet".r.findAllIn(plan).length <= 1,
      "profile must not rescan the table per column")
    assert(plan.contains("partial_"), "stats must combine map-side")
  }

  test("event windows share one user_id shuffle (w_lead_lag, w_moving_sum)") {
    for (q <- Seq("w_lead_lag", "w_moving_sum")) {
      val plan = planOf(q)
      assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
        s"$q: both window functions must ride a single user_id exchange")
      assert(plan.contains("Window"), s"$q: window operator expected")
    }
  }

  test("betweenness pair-sum rides equi-joins with map-side combine") {
    // the (s,v)+(v,t)+(s,t) composition must hash-join on the vertex
    // keys — a loop join here would be O(V⁴) at scale — and the
    // quantized contributions must partial-sum before the final
    // per-vertex exchange. NOTE: can't use planOf's Initial-Plan cut
    // here — the plan embeds the cached LSH-pair InMemoryRelation,
    // whose NESTED adaptive plan contains its own "== Initial Plan =="
    // marker and would truncate the string before the aggregate; the
    // uncut string is safe for contains-style asserts (sum only occurs
    // in the betweenness aggregate, and AQE never introduces loop
    // joins absent from the initial plan).
    val df = SparkEntry.queries("d_dup_betweenness")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "pair composition must stay on equi-keys")
    assert(plan.contains("partial_sum"),
      "σ-product terms must combine map-side")
  }

  test("hamming join: per-block equi-joins only, no cartesian candidates") {
    val plan = planOf("d_simhash_hamming")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "pigeonhole blocking must never fall back to all-pairs")
    // three block joins, each a hash-partitioned equi-join on bk
    assert("SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findAllIn(plan).nonEmpty)
  }

  test("merge upsert: map-side top-1 compaction, no re-shuffle into the join") {
    val plan = planOf("o_merge_upsert")
    // CDC compaction must run the rank-1 WindowGroupLimit BEFORE its
    // exchange (per-partition top-1 prunes the shuffle) and the
    // full-outer join must consume that exchange directly — at most
    // 2 hash exchanges (snapshot side, change side; the presentation
    // sort is a range exchange, and Broadcast/ReusedExchange don't
    // count). A 3rd hash exchange would mean the window output got
    // re-partitioned for the join. Upper bounds on specific exchange
    // kinds, not exact counts of the bare 'Exchange' token — exact
    // equality breaks on Spark/AQE changes without a real regression.
    assert("WindowGroupLimit".r.findAllIn(plan).nonEmpty,
      "expect WindowGroupLimit compaction before the exchange")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 2,
      plan.take(3000))
    assert("Exchange rangepartitioning".r.findAllIn(plan).length <= 1,
      plan.take(3000))
    assert(plan.contains("FullOuter"), "merge apply must be a full outer join")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
  }

  test("bpe merge pairs: vocab-sized exchanges only, top-k never sorts globally") {
    val plan = planOf("t_bpe_merge_pairs")
    // two aggregations (word dict, pair counts) -> two exchanges that
    // carry (key, count) partials, never exploded corpus rows; the
    // final top-30 is a TakeOrdered heap.
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 2,
      "pair counting must not add exchanges beyond the two aggregations")
    assert("partial_count\\(1\\)|partial_count".r.findFirstIn(plan).nonEmpty,
      "word-frequency aggregation must combine map-side")
  }

  test("weighted priority sample: TakeOrdered bottom-k, priority scan-local") {
    val plan = planOf("smp_weighted_priority")
    assert(plan.contains("TakeOrderedAndProject"),
      "bottom-32 must be a per-partition heap, not a global sort")
    // the only exchange allowed is the single-partition collect for
    // the final 32-row rank window
    assert(!plan.contains("Exchange rangepartitioning"),
      "no global range sort of the corpus")
  }

  test("inverted index: postings dedup combines map-side before one exchange") {
    val plan = planOf("t_inverted_index")
    // (token, doc) dedup + df/postings agg share the token-keyed
    // shuffle; partial aggregation must appear before the exchange so
    // the wire carries distinct postings, not raw token occurrences.
    assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 2,
      plan.take(3000))
    assert(plan.contains("partial_"), "map-side partial phase expected")
  }

  test("LSH ANN and kNN graph: equi-joins only, map-side-combined signatures") {
    // The scale contract of the LSH tier: the signature build is a
    // broadcast equi-join (dim key) into a partial-agg'd hash
    // aggregate, the probe is a bucket equi-join — NOTHING may plan
    // as a cartesian/nested loop, because at 100 TB any all-pairs
    // fallback here is the difference between a banded index and a
    // quadratic scan.
    Seq("v_lsh_topk", "v_knn_graph").foreach { q =>
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
        s"$q: ${plan.take(2000)}")
      assert(plan.contains("partial_sum"),
        s"$q: signature sums must combine map-side")
    }
  }

  test("IVF bucketed layout: a cell probe prunes partitions at the scan") {
    // The similarity tier's standing scale claim — "at scale the
    // corpus is written bucketed by cell_id, so a probe touches P/K
    // of the data" — exercised for real: write the assigned corpus
    // partitioned by cell_id, probe nProbe cells with an IN filter,
    // and require the pruning to happen AT THE SCAN (partition
    // filters + fewer files read), not as a post-scan filter.
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("ivf_layout").toString
    val e = graft.queries.SimilarityQueries.vecs(spark, sfDir)
    val (assign, _) = graft.queries.SimilarityQueries.kmeansIndex(spark, sfDir)
    e.join(assign, "vec_id")
      .write.partitionBy("cell_id").mode("overwrite").parquet(dir)
    val allCells = spark.read.parquet(dir)
      .select("cell_id").distinct().count()
    assert(allCells > 4, s"fixture should spread over >4 cells: $allCells")
    val probe = Seq(0, 3, 7, 11)
    val df = spark.read.parquet(dir)
      .where(col("cell_id").isin(probe.map(Integer.valueOf): _*))
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString.take(2000))
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.toString.contains("cell_id")),
      s"cell probe must be a partition filter: ${scan.partitionFilters}")
    val filesRead = scan.metrics("numFiles").value
    val totalFiles = spark.read.parquet(dir).inputFiles.length
    assert(filesRead < totalFiles,
      s"probe read $filesRead of $totalFiles files — no pruning happened")
  }
}
