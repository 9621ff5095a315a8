package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.streaming.EventStreams

/** Proves the event-time transforms are streaming-safe: the same
  * logical plan, run through a real `readStream` (AvailableNow +
  * memory sink), matches the batch result.
  */
class EventStreamsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("windowed agg: streaming result == batch result") {
    // decimal sums -> exact equality regardless of accumulation order
    def prep(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("value", col("value").cast("decimal(18,2)"))

    val batch = EventStreams.windowedCounts(prep(Tables.events(spark, sfDir)))
      .orderBy("window_start", "event_type")
      .collect()

    val streamed = EventStreams.runAsStream(
      spark, s"$sfDir/events.parquet",
      df => EventStreams.windowedCounts(prep(
        // nanos timestamps arrive as long under the legacy conf
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000"))))),
      // Complete mode: emit every window at the final trigger (Append
      // would withhold windows newer than the final watermark).
      "win_agg_stream", org.apache.spark.sql.streaming.OutputMode.Complete())
      .orderBy("window_start", "event_type")
      .collect()

    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming dedup drops injected duplicates, keeps all originals") {
    val ev = Tables.events(spark, sfDir)
    val doubled = ev.unionAll(ev) // every event twice
    val distinctCount = ev.dropDuplicates("event_id").count()
    // batch twin over the doubled input
    assert(EventStreams.dedupeStream(doubled, Seq("event_id")).count()
      == distinctCount)
    // real stream: parquet source reads the file once per union leg
    val tmp = java.nio.file.Files.createTempDirectory("dedup_src")
    java.nio.file.Files.createSymbolicLink(
      tmp.resolve("a.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    java.nio.file.Files.createSymbolicLink(
      tmp.resolve("b.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val streamed = EventStreams.runAsStream(
      spark, tmp.toString,
      df => EventStreams.dedupeStream(
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000"))),
        Seq("event_id")),
      "dedup_stream")
    assert(streamed.count() == distinctCount)
  }

  test("stream-stream interval join: streaming result == batch result") {
    val batch = EventStreams.attributedClicks(Tables.events(spark, sfDir))
      .orderBy("user_id", "view_id", "click_id")
      .collect()

    // One readStream source filtered twice — a genuine stream-stream
    // self-join through the symmetric hash join operator. Inner join:
    // matches emit as both sides arrive; no rows withheld by the final
    // watermark, so Append drains the complete result.
    val streamed = EventStreams.runAsStream(
      spark, s"$sfDir/events.parquet",
      df => EventStreams.attributedClicks(
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))),
      "attr_click_stream")
      .orderBy("user_id", "view_id", "click_id")
      .collect()

    assert(batch.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("stream-static enrichment: streaming result == batch result") {
    val dim = Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment")
    def enriched(df: org.apache.spark.sql.DataFrame) =
      EventStreams.enrich(df, dim, col("user_id") === col("c_custkey"))
        .groupBy("c_mktsegment", "event_type")
        .agg(count(lit(1)).as("n"))

    val batch = enriched(Tables.events(spark, sfDir))
      .orderBy("c_mktsegment", "event_type").collect()

    // Static side re-broadcast per micro-batch; the stream side carries
    // an unwatermarked aggregate, so Complete mode drains full state.
    val streamed = EventStreams.runAsStream(
      spark, s"$sfDir/events.parquet",
      df => enriched(df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))),
      "enrich_stream",
      org.apache.spark.sql.streaming.OutputMode.Complete())
      .orderBy("c_mktsegment", "event_type").collect()

    assert(batch.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("session_window: streamed closed sessions == batch sessions minus open tails") {
    def sessions(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).cast("int").as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start"),
          unix_micros(col("session_window.end")).as("session_end"),
          col("n_events"))

    val batch = sessions(Tables.events(spark, sfDir)).collect().toSet

    // Append + zero-delay watermark: the final AvailableNow batch
    // advances the watermark to max(ts), emitting every session whose
    // (exclusive, gap-padded) end precedes it; later sessions stay in
    // state. That boundary is recomputable exactly from the batch.
    val streamed = EventStreams.runAsStream(
      spark, s"$sfDir/events.parquet",
      df => sessions(
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
          .withWatermark("ts", "0 seconds")),
      "session_window_stream")
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().toSet

    val maxTs = Tables.events(spark, sfDir)
      .agg(max(unix_micros(col("ts")))).head.getLong(0)
    val closed = batch.filter(_.getLong(2) <= maxTs)
    assert(streamed.nonEmpty)
    assert(streamed == closed,
      "streamed sessions must be exactly the watermark-closed batch sessions")
  }

  test("funnel milestones: streaming result == batch twin exactly") {
    import spark.implicits._
    val events = Tables.events(spark, sfDir)
    val batch = EventStreams.funnelBatch(events)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val streamed = EventStreams.runAsStream(
      spark, s"$sfDir/events.parquet",
      df => EventStreams.funnelStream(
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
          .as[EventStreams.Event]).toDF(),
      "funnel_stream")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // inline Append emission: no timeout residue, so the streamed set
    // is the complete batch answer, not a closed-subset
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("throttle (transformWithState): streaming result == batch twin exactly") {
    import spark.implicits._
    val events = Tables.events(spark, sfDir)
    val batch = EventStreams.throttleBatch(events)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val streamed = EventStreams.runAsStream(
        spark, s"$sfDir/events.parquet",
        df => EventStreams.throttleStream(
          df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
            .as[EventStreams.Event]).toDF(),
        "throttle_stream")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("sessionization: streamed closed sessions == batch sessions minus open tails") {
    import spark.implicits._
    val events = Tables.events(spark, sfDir)
    val batch = EventStreams.sessionizeBatch(events)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().toSet

    val streamed = EventStreams.runAsStream(
      spark, s"$sfDir/events.parquet",
      df => EventStreams.sessionizeStream(
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
          .as[EventStreams.Event]).toDF(),
      "sess_stream")
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().toSet

    // single-batch source -> every closed (non-final) session is
    // emitted inline; each user's last session may stay open in state.
    val lastPerUser = {
      val w = Window.partitionBy("user_id").orderBy(col("session_start").desc)
      EventStreams.sessionizeBatch(events)
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select("user_id", "session_start", "session_end", "n_events")
        .collect().toSet
    }
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch), "every streamed session is a batch session")
    assert((batch -- streamed).subsetOf(lastPerUser),
      "only per-user open tails may be missing from the stream")
  }
}
