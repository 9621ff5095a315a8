package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval/range join via bucketing — `|leftTs - rightTs| <= radius`
  * as an equi-join instead of the theta-join Spark would otherwise
  * plan as a broadcast-nested-loop.
  *
  * Each left row lands in bucket `floor(ts / radius)`; each right row
  * is replicated into its bucket and both neighbors, so every pair
  * within `radius` shares at least one bucket. The equi-join on
  * (bucket) shuffles both sides once on a fixed-width key, and the
  * exact predicate filters the ≤3× candidate surplus after the join —
  * the standard bounded-replication trade that keeps range joins
  * shuffle-based at any scale.
  */
object RangeJoin {

  /** @param radiusSec bucket width == match radius, in seconds;
    * `leftTs`/`rightTs` are timestamp columns. Returns left×right
    * candidate rows with the exact |Δt| <= radius predicate applied.
    * Caller projects/aggregates. */
  def within(
      left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String,
      radiusSec: Long,
      extraCondition: Column = lit(true)): DataFrame = {
    val lb = left.withColumn("__bucket",
      floor(unix_timestamp(col(leftTs)) / radiusSec))
    val rb = right.withColumn("__rbucket",
      floor(unix_timestamp(col(rightTs)) / radiusSec))
      .withColumn("__bucket",
        explode(array(col("__rbucket") - 1, col("__rbucket"),
          col("__rbucket") + 1)))
      .drop("__rbucket")
    lb.join(rb, Seq("__bucket"))
      .where(
        abs(unix_timestamp(col(leftTs)) - unix_timestamp(col(rightTs)))
          <= radiusSec && extraCondition)
      .drop("__bucket")
  }
}
