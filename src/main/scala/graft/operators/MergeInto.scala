package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE INTO — the lakehouse CDC-apply operator (Delta/Iceberg
  * `MERGE WHEN MATCHED ... WHEN NOT MATCHED ...`), which neither core
  * Spark SQL nor the reference exposes as a relational operator. The
  * reference's graph load implements the same idea imperatively per
  * node label (ON CREATE SET / ON MATCH SET, gfe-db
  * `database/neo4j/cypher/load.cyp:7-30`); this is the engine-level
  * generalization for ordinary keyed tables.
  *
  * Two stages, one shuffle key:
  *
  *  1. [[latestPerKey]] — CDC compaction: of all change rows for a
  *     key, only the newest (by the caller's ordering) survives.
  *     One hash exchange on the merge key.
  *  2. [[merge]] — keyed full-outer apply of the compacted changes
  *     onto the target snapshot: a change op of `"D"` deletes the
  *     row, anything else upserts through the caller's per-column
  *     merge expressions (which see both sides and the null pattern
  *     distinguishes matched-update from not-matched-insert).
  *
  * Scale shape: both stages hash-partition on the merge key, so AQE
  * reuses the compaction exchange for the join; the snapshot side
  * never needs a full rewrite — with a key-partitioned target only
  * partitions holding changed keys are touched (copy-on-write
  * pruning), and the change stream is typically ≪ the snapshot, so
  * the join broadcasts the compacted batch when small.
  */
object MergeInto {

  /** CDC compaction: newest change per key under `ordering` (callers
    * pass a total order, e.g. ts desc then a unique id desc). */
  def latestPerKey(changes: DataFrame, key: String, ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ordering: _*)
    changes.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Apply compacted changes to `target`. `merged` lists the output
    * columns as (name, expression); expressions reference the sides
    * via the `"t"` / `"c"` aliases. Rows whose change op equals
    * `"D"` are deleted; a null op (no change for that key) keeps the
    * target row.
    */
  def merge(
      target: DataFrame,
      compacted: DataFrame,
      targetKey: String,
      changeKey: String,
      opCol: String,
      merged: Seq[(String, Column)]): DataFrame = {
    val t = target.alias("t")
    val c = compacted.alias("c")
    t.join(c, col(s"t.$targetKey") === col(s"c.$changeKey"), "full_outer")
      .where(col(s"c.$opCol").isNull || col(s"c.$opCol") =!= "D")
      .select(merged.map { case (n, e) => e.as(n) }: _*)
  }
}
