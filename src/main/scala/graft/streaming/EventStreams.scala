package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming surface over the `events` table.
  *
  * The reference is batch-only (SURVEY.md §2.9) — its one continuous
  * behavior is the release-watcher poll, covered by
  * [[graft.watch.ReleaseWatch]]. This module is the brief's
  * forward-looking streaming capability: the same event-time
  * transforms defined once as logical plans, runnable both as batch
  * DataFrames (DuckDB-verifiable) and as `readStream` jobs with
  * watermarks + windows + custom state.
  *
  * Scale notes: tumbling-window aggregation is a streaming-state hash
  * agg keyed on (window, event_type) — partitioned by key, constant
  * state per key, watermark bounds state size. Sessionization uses
  * `flatMapGroupsWithState` with event-time timeout — state is one
  * open session per user, evicted on watermark passage.
  */
object EventStreams {

  final case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  final case class SessionState(
      start: Long, last: Long, n: Int, total: Double)

  final case class SessionOut(
      user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int, total_value: Double)

  /** Tumbling 1-hour event-time windows per event_type — identical
    * logical plan for batch and streaming inputs. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Timestamp ↔ epoch-micros without precision loss (getTime alone
    * truncates to millis). */
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000
  private def toTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000).toInt)
    t
  }

  /** Gap-based sessionization (30-min inactivity) as a streaming
    * stateful operator. Batch equivalent: [[sessionizeBatch]]. */
  def sessionizeStream(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = 30L * 60 * 1000 * 1000
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, toTs(s.start), toTs(s.last), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(e => micros(e.ts))
            var st = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            for (e <- sorted) {
              val t = micros(e.ts)
              st match {
                case Some(s) if t - s.last <= gapUs =>
                  st = Some(s.copy(last = t, n = s.n + 1,
                    total = s.total + e.value))
                case Some(s) =>
                  out += SessionOut(userId, toTs(s.start), toTs(s.last),
                    s.n, s.total)
                  st = Some(SessionState(t, t, 1, e.value))
                case None =>
                  st = Some(SessionState(t, t, 1, e.value))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last / 1000 + gapUs / 1000)
            }
            out.iterator
          }
      }
  }

  /** Batch sessionization: classic gaps-and-islands — lag + cumulative
    * session-break sum per user. Same output as the streaming path
    * once the stream is fully drained. */
  def sessionizeBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      // microsecond gap arithmetic — cast("long") truncates to seconds
      // and would disagree with the microsecond streaming path on gaps
      // that straddle the boundary fractionally
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) >
            1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).cast("int").as("n_events"),
        sum(col("value")).as("total_value"))
      .drop("session_id")
  }

  /** Event-time interval join: each click attributed to every view by
    * the same user within the preceding `horizon` (impressions×clicks,
    * the canonical stream-stream join). One definition serves batch
    * and streaming inputs: `withWatermark` is a no-op on batch, and on
    * streams the time-range predicate on the two watermarked event-time
    * columns is what lets Spark's symmetric hash join evict state —
    * each view is held for horizon + watermark, each click for the
    * watermark alone, both partitioned on the `user_id` equi-key (one
    * shuffle per side, state co-located with the key). */
  def attributedClicks(events: DataFrame,
      horizon: String = "30 minutes"): DataFrame = {
    val views = events.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "2 hours")
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("click_user_id"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    views.join(clicks,
      col("user_id") === col("click_user_id") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** Streaming exact dedup on the key columns alone — the
    * training-pipeline ingest guard (duplicate events/documents
    * dropped at arrival, even when the re-ingested copy carries a
    * different timestamp). Streaming inputs use
    * `dropDuplicatesWithinWatermark`, whose state is bounded by the
    * watermark horizon; batch inputs use the plain key-only
    * `dropDuplicates(keys)` twin. */
  def dedupeStream(events: DataFrame, keys: Seq[String]): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(keys)
    else events.dropDuplicates(keys)

  /** Stream-static enrichment: join the (possibly streaming) event feed
    * against a static dimension table — NO streaming state, no
    * watermark, and because Spark re-plans the static side per batch a
    * slowly-changing dimension picks up updates between batches. This
    * is the canonical shape for attaching user/customer attributes to
    * an event stream at ingest. No forced broadcast: Catalyst
    * broadcasts the dim adaptively while it is actually small, and a
    * dimension that outgrows the threshold must take the shuffle path
    * rather than OOM the driver. */
  def enrich(events: DataFrame, dim: DataFrame, joinExpr: Column): DataFrame =
    events.join(dim, joinExpr)

  /** Run a batch-defined transform as a real stream over the same
    * parquet data (Trigger.AvailableNow + memory sink) and return the
    * drained result — proves the logical plan is streaming-safe. */
  def runAsStream(
      spark: SparkSession,
      parquetDir: String,
      transform: DataFrame => DataFrame,
      queryName: String,
      outputMode: OutputMode = OutputMode.Append): DataFrame = {
    // FileStreamSource requires a directory; stage a lone file behind
    // a symlink so read-only fixtures stream as-is.
    val p = java.nio.file.Paths.get(parquetDir)
    val dir =
      if (java.nio.file.Files.isRegularFile(p)) {
        val d = java.nio.file.Files.createTempDirectory("stream_src")
        java.nio.file.Files.createSymbolicLink(
          d.resolve(p.getFileName), p.toAbsolutePath)
        d.toString
      } else parquetDir
    val schema = spark.read.parquet(dir).schema
    val in = spark.readStream.schema(schema).parquet(dir)
    val q = transform(in).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
