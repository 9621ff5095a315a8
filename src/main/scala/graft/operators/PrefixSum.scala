package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sum — the scan primitive behind
  * sequence packing, offset assignment, and file-layout planning.
  *
  * A plain `Window.orderBy(key)` running sum plans a SINGLE-PARTITION
  * WindowExec ("No Partition Defined" — every row through one task),
  * which is exactly the operator shape that cannot survive 100 TB.
  * This is the standard two-phase scan instead:
  *
  *  1. range-repartition on the (unique) order key, so partition i
  *     holds strictly smaller keys than partition i+1;
  *  2. per-partition running sums via a PARTITION-LOCAL window;
  *  3. per-partition totals — one tiny aggregate, ≤ #partitions rows
  *     collected — folded on the driver into exclusive offsets and
  *     broadcast back.
  *
  * O(n/p) per task plus a p-row driver fold: the same shape at 100 TB
  * with 10k partitions. Spark's RangePartitioner samples with a fixed
  * per-partition seed, so the partitioning (and the `_pid` column
  * derived from it) is deterministic across the two passes over the
  * lineage — no materialization needed between them.
  */
object PrefixSum {

  /** Adds `out` = the EXCLUSIVE prefix sum of `valueCol` (as long) in
    * ascending `orderCol` order. `orderCol` must be unique (ties
    * could straddle a range boundary), and `df`'s lineage must be
    * DETERMINISTIC: the ranged frame (and its `_pid` column) is
    * evaluated twice — once for the totals job, once for the output
    * job — so a nondeterministic upstream (unstable sampling, an
    * unordered `limit`) would silently mis-offset rows rather than
    * fail. NULL values count as 0. */
  def exclusive(df: DataFrame, orderCol: String, valueCol: String,
      out: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val v = col(valueCol).cast("long")
    val ranged = df.repartitionByRange(p, col(orderCol))
      .withColumn("_pid", spark_partition_id())
    // coalesce: a range partition whose values are all NULL sums to
    // NULL, which must fold as 0, not NPE the driver.
    val totals = ranged.groupBy("_pid")
      .agg(coalesce(sum(v), lit(0L)).as("_t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    if (totals.isEmpty) return df.withColumn(out, lit(0L))
    val offsets = totals
      .scanLeft((-1, 0L)) { case ((_, acc), (pid, t)) => (pid, acc + t) }
      .sliding(2).map { case Array((_, acc), (pid, _)) => (pid, acc) }
      .toSeq
    import spark.implicits._
    val offDf = offsets.toDF("_pid", "_off")
    val localWin = Window.partitionBy("_pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(offDf), "_pid")
      .withColumn(out, col("_off") + coalesce(sum(v).over(localWin), lit(0L)))
      .drop("_pid", "_off")
  }
}
