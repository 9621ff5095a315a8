package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.EventStreams

/** Event-time operators over `events`, defined once and runnable both
  * as batch (these oracle-checked entries) and as Structured Streaming
  * jobs (EventStreamsSpec proves plan parity via a real readStream →
  * memory-sink run).
  *
  * Money-ish sums go through DECIMAL(18,2) so the oracle hash compare
  * is exact regardless of double summation order.
  */
object StreamingQueries {

  val all: Seq[QueryDef] = Seq(

    // Tumbling 1-hour event-time window per event_type (the streaming
    // windowed agg; watermark is a no-op on batch input).
    // Output typing is pinned for byte-faithful cross-engine compare:
    // window start as epoch-micros BIGINT (timestamp renderings differ
    // across engines), sums as BIGINT cents (decimal parquet columns
    // render differently across readers).
    QueryDef(
      "st_window_agg",
      """SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS window_start,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_value_cents
        |FROM events GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin) { (s, d) =>
      EventStreams.windowedCounts(
        Tables.events(s, d).withColumn("value",
          col("value").cast("decimal(18,2)")))
        .select(
          unix_micros(col("window_start")).as("window_start"),
          col("event_type"), col("n"),
          // exact decimal sum internally; BIGINT cents in the output
          // schema (decimal parquet columns aren't reader-portable).
          (col("total_value") * 100).cast("bigint").as("total_value_cents"))
        .orderBy("window_start", "event_type")
    },

    // Streaming exact dedup (ingest guard): batch twin of
    // dropDuplicatesWithinWatermark — key-only distinct; the streaming
    // path itself is proven by EventStreamsSpec's readStream run.
    QueryDef(
      "st_dedup",
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      EventStreams.dedupeStream(
        Tables.events(s, d).select("user_id", "event_type", "ts"),
        Seq("user_id", "event_type"))
        .select("user_id", "event_type")
        .orderBy("user_id", "event_type")
    },

    // Streaming strict-order funnel milestones: one row per user per
    // stage reached (view=1 → click=2 → purchase=3), stamped with the
    // stage's event-time instant. Batch twin of
    // EventStreams.funnelStream (flatMapGroupsWithState, 24-byte
    // per-user state, inline Append emission); the streaming path is
    // proven by EventStreamsSpec's readStream run.
    QueryDef(
      "st_funnel",
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |      JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
        |      WHERE e.event_type = 'click' GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |      JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
        |      WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT user_id, 1 AS stage, epoch_us(t1) AS at_us FROM v
        |UNION ALL SELECT user_id, 2, epoch_us(t2) FROM c
        |UNION ALL SELECT user_id, 3, epoch_us(t3) FROM p
        |ORDER BY user_id, stage""".stripMargin) { (s, d) =>
      EventStreams.funnelBatch(Tables.events(s, d))
        .orderBy("user_id", "stage")
    },

    // Per-key rate limiting: first event per (user, type) per hour —
    // the alert/notification throttle. Batch twin of
    // EventStreams.throttleStream, which rides Spark 4's
    // transformWithState (RocksDB ValueState, 16 bytes per key:
    // newest bucket + 64-bucket emitted bitmask, TTL-bounded); the
    // streaming path, out-of-order delivery, and TTL expiry are
    // proven by EventStreamsSpec's readStream runs.
    QueryDef(
      "st_throttle",
      """SELECT user_id, event_type, bucket_us, event_id FROM (
        |  SELECT user_id, event_type,
        |         (epoch_us(ts) // 3600000000) * 3600000000 AS bucket_us, event_id,
        |         row_number() OVER (PARTITION BY user_id, event_type,
        |                              epoch_us(ts) // 3600000000
        |                            ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events)
        |WHERE rn = 1
        |ORDER BY user_id, event_type, bucket_us""".stripMargin) { (s, d) =>
      EventStreams.throttleBatch(Tables.events(s, d))
        .orderBy("user_id", "event_type", "bucket_us")
    },

    // Stream-stream interval join (view→click attribution within 30
    // minutes). Batch twin of the watermarked symmetric hash join; the
    // streaming path is proven by EventStreamsSpec's readStream run.
    // Timestamps leave as epoch-micros BIGINT; the oracle compares in
    // epoch_us too, so both engines test the µs-truncated instant.
    QueryDef(
      "st_stream_join",
      """SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
        |       epoch_us(v.ts) AS view_ts, epoch_us(c.ts) AS click_ts
        |FROM events v JOIN events c ON v.user_id = c.user_id
        |WHERE v.event_type = 'view' AND c.event_type = 'click'
        |  AND epoch_us(c.ts) >= epoch_us(v.ts)
        |  AND epoch_us(c.ts) - epoch_us(v.ts) <= 1800000000
        |ORDER BY v.user_id, view_id, click_id""".stripMargin) { (s, d) =>
      EventStreams.attributedClicks(Tables.events(s, d))
        .select(col("user_id"), col("view_id"), col("click_id"),
          unix_micros(col("view_ts")).as("view_ts"),
          unix_micros(col("click_ts")).as("click_ts"))
        .orderBy("user_id", "view_id", "click_id")
    },

    // Stream-static enrichment: events joined to the static customer
    // dimension (broadcast — no streaming state), then aggregated by
    // the enriched attribute. Batch twin of EventStreams.enrich; the
    // streaming path is proven by EventStreamsSpec's readStream run.
    QueryDef(
      "st_enrich",
      """SELECT c.c_mktsegment, e.event_type, count(*) AS n,
        |       CAST(sum(CAST(e.value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_value_cents
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val dim = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
      EventStreams.enrich(
        Tables.events(s, d), dim, col("user_id") === col("c_custkey"))
        .groupBy("c_mktsegment", "event_type")
        .agg(count(lit(1)).as("n"),
          (sum(col("value").cast("decimal(18,2)")) * 100)
            .cast("bigint").as("total_value_cents"))
        .orderBy("c_mktsegment", "event_type")
    },

    // Native session_window sessionization — the same 30-min-gap
    // sessions as st_sessionize but through Spark's built-in merging
    // session operator (streaming-capable state, one shuffle on the
    // user key). window.end is EXCLUSIVE (last event + gap), so the
    // oracle adds the gap to max(ts).
    QueryDef(
      "st_session_window",
      """SELECT user_id,
        |       min(epoch_us(ts)) AS session_start,
        |       max(epoch_us(ts)) + 1800000000 AS session_end,
        |       CAST(count(*) AS INT) AS n_events
        |FROM (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |                                   ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM (
        |    SELECT user_id, ts,
        |           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |                  OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000000
        |                THEN 1 ELSE 0 END AS new_session
        |    FROM events))
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).cast("int").as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start"),
          unix_micros(col("session_window.end")).as("session_end"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    },

    // Gap-based sessionization (30-min inactivity): gaps-and-islands.
    QueryDef(
      "st_sessionize",
      """SELECT user_id,
        |       min(epoch_us(ts)) AS session_start,
        |       max(epoch_us(ts)) AS session_end,
        |       CAST(count(*) AS INT) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_value_cents
        |FROM (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |                                   ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM (
        |    SELECT user_id, ts, value,
        |           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |                  OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000000
        |                THEN 1 ELSE 0 END AS new_session
        |    FROM events))
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      EventStreams.sessionizeBatch(
        Tables.events(s, d).withColumn("value",
          col("value").cast("decimal(18,2)")))
        .select(
          col("user_id"),
          unix_micros(col("session_start")).as("session_start"),
          unix_micros(col("session_end")).as("session_end"),
          col("n_events"),
          (col("total_value") * 100).cast("bigint").as("total_value_cents"))
        .orderBy("user_id", "session_start")
    },

    // Streaming corpus screening (ingest-time dedup gate): which docs
    // of an incoming feed (doc_id % 10 = 7) collide with the standing
    // corpus — exact content-fp hit or LSH band-bucket hit. Batch twin
    // of DedupQueries.corpusScreen; the streaming path (readStream →
    // stream-static semi-joins → union → dropDuplicates, append mode,
    // no watermark state beyond the key set) is proven equal in
    // EventStreamsSpec. The flagged set is exactly the non-'keep'
    // verdicts of d_incremental_dedup, which the oracle replays.
    QueryDef(
      "st_corpus_screen",
      s"""${DedupQueries.lshPairsSql},
        |hashes AS (SELECT doc_id, ${DedupQueries.duckHex60("text")} AS fp
        |           FROM documents),
        |exact_hit AS (SELECT DISTINCT doc_id FROM hashes
        |              WHERE doc_id % 10 = 7 AND fp IN
        |                (SELECT fp FROM hashes WHERE doc_id % 10 <> 7)),
        |near_hit AS (SELECT DISTINCT nb.doc_id
        |             FROM bands nb JOIN bands cb
        |               ON nb.band = cb.band AND nb.bk = cb.bk
        |                  AND cb.doc_id % 10 <> 7
        |             WHERE nb.doc_id % 10 = 7)
        |SELECT doc_id FROM
        |  (SELECT doc_id FROM exact_hit UNION SELECT doc_id FROM near_hit)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val isNew = col("doc_id") % 10 === 7
      DedupQueries.corpusScreen(
        docs.where(isNew),
        docs.where(!isNew)
          .select(graft.functions.GraftFunctions.hex60(col("text")).as("fp")),
        DedupQueries.bandedKeys(s, d)
          .where(col("doc_id") % 10 =!= 7).select("band", "bk"))
        .orderBy("doc_id")
    },

    // Continuous LSH band-index maintenance — closes the dedup loop:
    // each micro-batch of documents appends its banded minhash keys
    // (doc_id, band, bk) into the cdcApply versioned index, so an
    // ingest-time screen (st_corpus_screen) probes a GROWING corpus
    // state rather than a static one. Banding is per-row and
    // append-only (union + key-dedup merge = idempotent under
    // foreachBatch retries), so the maintained index equals the
    // batch-built bandedKeys for ANY micro-batch partitioning — the
    // oracle replays the full batch banding in SQL and hash-checks
    // the real streaming path. Per-batch I/O: only the buckets the
    // batch's doc_ids hash to (O(dirty), the 100 TB property).
    QueryDef(
      "st_index_maintain",
      s"""${DedupQueries.lshPairsSql}
        |SELECT doc_id, band, bk FROM bands
        |ORDER BY doc_id, band""".stripMargin) { (s, d) =>
      val stateDir = java.nio.file.Files
        .createTempDirectory("band_index_state").toString
      val changes = EventStreams.streamSource(s, s"$d/documents.parquet")
      // schema-only seed: limit(0) BEFORE banding (bandRows eagerly
      // materializes its shingle arrays; a post-hoc filter would
      // still pay the full corpus scan)
      val init = DedupQueries.bandRows(Tables.documents(s, d).limit(0))
      EventStreams.cdcApply(s, changes, init, stateDir,
        Seq("doc_id", "band"),
        batch => DedupQueries.bandRows(batch),
        (state, delta) => state.unionByName(delta)
          .dropDuplicates("doc_id", "band"))
        .orderBy("doc_id", "band")
    },

    // Incremental dup-cluster maintenance — the streaming closure of
    // d_dup_clusters and the last stage of the streaming dedup loop
    // (screen → index → clusters): every micro-batch updates a
    // persisted (doc → component) assignment via the maintained band
    // index + a driver union-find over the batch-sized candidate
    // edges + a path-compressed root remap, so ingest always has
    // current duplicate clusters with per-batch I/O proportional to
    // the batch's dirty buckets, never the corpus. The batch CC
    // oracle hash-checks the real streaming fold end-to-end;
    // EventStreamsSpec pins a hash-split multi-batch fold (cross-
    // batch merges of previously-disjoint components) to the batch
    // result.
    QueryDef(
      "st_clusters_maintain",
      DedupQueries.dupClustersSql) { (s, d) =>
      val stateDir = java.nio.file.Files
        .createTempDirectory("dup_clusters_state").toString
      DedupQueries.clustersMaintain(s, s"$d/documents.parquet", stateDir)
    },

    // Streaming ANN postings maintenance — the vector-tier analogue
    // of st_index_maintain: each micro-batch of embeddings is
    // assigned to its nearest IVF centroid (refit-free, the
    // v_ann_incremental ADD rule) and appended into the cdcApply
    // versioned postings store; the standard probe path then serves
    // the MAINTAINED index. Assignment is a pure function of the
    // vector (rounded integer-stable cdist), so the fold is
    // idempotent and batch-partitioning-invariant — the oracle
    // replays the converged assignment for the whole corpus from the
    // centroid snapshot and hash-checks the real streaming path
    // end-to-end (EventStreamsSpec pins a hash-split 3-batch fold ==
    // the batch assignment).
    QueryDef(
      "st_ann_maintain",
      SimilarityQueries.annMaintainSql) { (s, d) =>
      val stateDir = java.nio.file.Files
        .createTempDirectory("ann_postings_state").toString
      SimilarityQueries.annMaintain(s, s"$d/embeddings.parquet", d, stateDir)
    },

    // Streaming SRP-LSH index maintenance — the third and last static
    // vector index gains its maintain twin (minhash bands →
    // st_index_maintain, IVF postings → st_ann_maintain, SRP-LSH
    // buckets → here): each micro-batch of embeddings is bucketed by
    // the pure PRF rule and appended into the cdcApply versioned
    // store keyed by (vec_id, t), so v_lsh_topk/v_knn_graph can probe
    // a GROWING corpus index. Zero trained state anywhere, so the
    // batch bucket build is exactly what the fold converges to — the
    // oracle replays it from raw vectors and hash-checks the real
    // streaming path end-to-end (EventStreamsSpec pins a hash-split
    // 3-batch fold == the batch index).
    QueryDef(
      "st_vec_index_maintain",
      SimilarityQueries.lshMaintainSql) { (s, d) =>
      val stateDir = java.nio.file.Files
        .createTempDirectory("lsh_index_state").toString
      SimilarityQueries.lshMaintainFold(s,
        EventStreams.streamSource(s, s"$d/embeddings.parquet"), d, stateDir)
        .orderBy("vec_id", "t")
    },

    // Streaming packing-manifest maintenance — t_pack_sequences'
    // ingest loop, and deliberately the one ORDER-DEPENDENT maintain
    // twin: pack offsets are a running global prefix sum, so each
    // micro-batch appends to the token stream in ARRIVAL order
    // (within-batch offsets via the distributed PrefixSum scan, based
    // at an O(1) carried total; the standing manifest is never
    // re-offset). With batches arriving in doc_id-range order the
    // maintained manifest equals the batch-built one exactly — the
    // shared PackSql oracle hash-checks that through the REAL
    // readStream→foreachBatch path (EventStreamsSpec pins a 3-file
    // doc_id-range split with forced file order).
    QueryDef(
      "st_pack_maintain",
      TextQueries.PackSql) { (s, d) =>
      val stateDir = java.nio.file.Files
        .createTempDirectory("pack_state").toString
      TextQueries.packMaintain(s, s"$d/documents.parquet", stateDir)
        .orderBy("doc_id")
    },

    // Continuous CDC apply — the streaming form of o_merge_upsert,
    // and unlike the other st_* entries this one runs the REAL
    // streaming path (readStream → foreachBatch folding each
    // micro-batch into a versioned parquet state table with
    // tombstones + a (ts, event_id) monotonic guard), so the oracle
    // hash-checks the streaming machinery itself, not a batch twin.
    // The guard makes the fold idempotent and arrival-order-proof;
    // EventStreamsSpec additionally pins a time-shuffled 3-batch run
    // to the same result.
    // Continuous sketch maintenance — the streaming counterpart of
    // a_hll_union: each micro-batch's HLL register table max-merges
    // into versioned state via the same cdcApply machinery, and
    // because register max-merge is commutative and idempotent the
    // final estimate equals the batch-built sketch EXACTLY for any
    // micro-batch partitioning — so the batch oracle hash-checks the
    // real streaming path. This is how distinct-count dashboards stay
    // current at stream speed: per-batch state touched is at most
    // groups×512 rows however large the batch.
    QueryDef(
      "st_sketch_maintain",
      SketchQueries.HllDistinctSql) { (s, d) =>
      val stateDir = java.nio.file.Files
        .createTempDirectory("sketch_state").toString
      val changes = graft.Tables.normalizeTs(
        EventStreams.streamSource(s, s"$d/events.parquet"))
      // schema-only seed: an empty register table
      val init = SketchQueries
        .hllRegisters(Tables.events(s, d), "event_type", col("user_id"))
        .where(lit(false))
      val finalRegs = EventStreams.cdcApply(s, changes, init, stateDir,
        Seq("event_type", "idx"),
        batch => SketchQueries.hllRegisters(batch, "event_type", col("user_id")),
        (state, delta) => state.unionByName(delta)
          .groupBy("event_type", "idx").agg(max("mrho").as("mrho")))
      SketchQueries.hllEstimate(finalRegs, "event_type")
        .orderBy("event_type")
    },

    // Continuous heavy-hitter counters — the ADDITIVE mergeability
    // class next to st_sketch_maintain's max-merge: each micro-batch
    // of documents folds its CMS counter table into state by
    // per-(r,b) SUM, which is exactly the CMS merge, so the
    // maintained counters equal the batch-built table for any batch
    // partitioning and the batch oracle hash-checks the streaming
    // path. State is the fixed d×w=4096-row counter table however
    // large the corpus — the shape that lets a token-frequency
    // dashboard follow an ingest stream at 100 TB.
    QueryDef(
      "st_cms_maintain",
      SketchQueries.CmsTopkSql) { (s, d) =>
      val stateDir = java.nio.file.Files
        .createTempDirectory("cms_state").toString
      val changes = EventStreams.streamSource(s, s"$d/documents.parquet")
      val init = SketchQueries.cmsCounters(Tables.documents(s, d))
        .where(lit(false))
      val finalCounters = EventStreams.cdcApply(s, changes, init, stateDir,
        Seq("r", "b"),
        batch => SketchQueries.cmsCounters(batch),
        (state, delta) => state.unionByName(delta)
          .groupBy("r", "b").agg(sum("cnt").as("cnt")))
      SketchQueries.cmsProbeTopk(finalCounters, Tables.documents(s, d))
    },

    QueryDef(
      "st_cdc_apply",
      OperatorQueries.MergeSqlBody + "\nORDER BY c_custkey") { (s, d) =>
      val stateDir = java.nio.file.Files
        .createTempDirectory("cdc_state").toString
      EventStreams.cdcCustomerStream(
        s, s"$d/events.parquet", Tables.customer(s, d), stateDir)
        .orderBy("c_custkey")
    })
}
