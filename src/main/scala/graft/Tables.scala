package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Access layer for the harness parquet tables (TESTDATA.md).
  *
  * All operator queries read through here so that scan-level concerns
  * (schema, pruning-friendly access, future bucketing/partitioning of a
  * real deployment) live in one place. At 100 TB these would be
  * catalog-registered tables partitioned on their natural keys; in the
  * harness they are single parquet files — `spark.read.parquet` already
  * gives us predicate pushdown + column pruning via the v1/v2 parquet
  * source, which is everything these queries need.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.parquet has carried `ts` at different parquet precisions
    * across harness generations, so the access layer dispatches on the
    * schema the file ACTUALLY declares rather than assuming one:
    *
    *  - TIMESTAMP(MICROS) (current testdata): vectorized scan, full
    *    pushdown — serve directly. A µs file without isAdjustedToUTC
    *    reads as TIMESTAMP_NTZ; under the UTC session zone a cast to
    *    TimestampType is value-identical and keeps every downstream
    *    query and oracle on the schema they were written against.
    *  - TIMESTAMP(NANOS) (older testdata): the vectorized reader
    *    rejects it, so read nanos-as-long (legacy conf), truncate to
    *    microseconds with integral DIV (a double quotient rounds the
    *    odd microsecond up and breaks ns→µs truncation parity with
    *    DuckDB), snapshot ONCE per (session, dir) to parquet, and
    *    serve queries from the µs snapshot. At scale this is the
    *    one-time ELT normalization pass an ingest pipeline runs
    *    anyway.
    *
    * Any other physical type for `ts` fails loudly here — a named
    * one-line diagnostic beats 24 queries silently going dark. */
  private val eventsCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, DataFrame]]())

  /** Schema-dispatching `ts` normalizer, shared by the batch access
    * path and streaming sources (EventStreamsSpec drives real
    * `readStream`s through it): whatever precision the file declares,
    * downstream code sees one canonical TimestampType µs column.
    * Works on streaming DataFrames — every branch is a per-row
    * projection, no snapshot. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case TimestampType => df
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case other => sys.error(
        s"events.ts reads as $other; expected TIMESTAMP(MICROS)," +
          " TIMESTAMP_NTZ, or nanos-as-long. Refusing to serve a" +
          " mistyped events table.")
    }
  }

  def events(s: SparkSession, d: String): DataFrame = {
    val perSession = eventsCache.synchronized {
      var m = eventsCache.get(s)
      if (m == null) { m = scala.collection.mutable.Map.empty; eventsCache.put(s, m) }
      m
    }
    perSession.synchronized {
      perSession.getOrElseUpdate(d, {
        import org.apache.spark.sql.types._
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = table(s, d, "events")
        raw.schema("ts").dataType match {
          case LongType =>
            // nanos-as-long: snapshot once so every query scans µs
            // parquet vectorized instead of re-deriving per query
            val dir = java.nio.file.Files
              .createTempDirectory("graft_events_us").toString
            normalizeTs(raw).write.mode("overwrite").parquet(dir)
            s.read.parquet(dir)
          case _ => normalizeTs(raw)
        }
      })
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
