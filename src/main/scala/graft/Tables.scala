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
  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which the
    * vectorized reader rejects — a direct scan would pay the row-based
    * reader on EVERY events query. Normalize ONCE per (session, dir):
    * read nanos as long (legacy conf), truncate to microseconds with
    * integral DIV (a double quotient rounds the odd microsecond up and
    * breaks ns→us truncation parity with DuckDB), snapshot to parquet,
    * and serve every query from the µs snapshot — vectorized scans
    * with full predicate pushdown. At scale this is the one-time ELT
    * normalization pass an ingest pipeline runs anyway. */
  private val eventsCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, DataFrame]]())

  def events(s: SparkSession, d: String): DataFrame = {
    val perSession = eventsCache.synchronized {
      var m = eventsCache.get(s)
      if (m == null) { m = scala.collection.mutable.Map.empty; eventsCache.put(s, m) }
      m
    }
    perSession.synchronized {
      perSession.getOrElseUpdate(d, {
        import org.apache.spark.sql.functions._
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val dir = java.nio.file.Files
          .createTempDirectory("graft_events_us").toString
        table(s, d, "events")
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
          .write.mode("overwrite").parquet(dir)
        s.read.parquet(dir)
      })
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
