package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The ONE Spark-private call the `graftstore` streaming source needs:
  * a V1 [[org.apache.spark.sql.execution.streaming.Source]]'s
  * `getBatch` must hand the engine a DataFrame whose plan is flagged
  * `isStreaming` (MicroBatchExecution asserts it), and the only way to
  * flag an arbitrary computed plan — our change batch is a
  * manifest-pruned EXCEPT over bucket files, not a file listing — is
  * `SparkSession.internalCreateDataFrame(rdd, schema,
  * isStreaming = true)`, which is `private[sql]`. This object lives
  * under `org.apache.spark.sql` purely to satisfy that access
  * qualifier — the standard connector-library technique — and
  * contains nothing else; every graft class stays in `graft.*`.
  *
  * The RDD handed in is `df.queryExecution.toRdd` — LAZY: planning
  * happens here on the driver, execution happens when the micro-batch
  * runs, exactly like a built-in source's batch plan. */
object StreamShim {
  def streamingFrame(spark: SparkSession, rows: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rows, schema, isStreaming = true)

  /** The SINK-side dual: a V1 [[org.apache.spark.sql.execution
    * .streaming.Sink]]'s `addBatch` receives a DataFrame planned by
    * IncrementalExecution, which must not be re-planned with joins /
    * re-run by a second action — the engine's own ForeachBatchSink
    * re-wraps it as a plain batch frame over the already-planned RDD,
    * and that re-wrap needs the same `private[sql]` constructor (with
    * `isStreaming = false`). Planning stays lazy exactly as above. */
  def batchFrame(spark: SparkSession, rows: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rows, schema, isStreaming = false)
}
