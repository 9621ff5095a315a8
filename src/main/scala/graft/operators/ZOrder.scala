package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout: interleave the bits of two integer
  * dimensions so that sorting by the combined code clusters rows that
  * are close in BOTH dimensions.
  *
  * Why it matters at 100 TB: parquet min/max pruning skips files by
  * ONE sort dimension; a linear sort on user_id makes time-range
  * predicates scan everything and vice versa. Writing
  * `sortWithinPartitions(zvalue(...))` (or a global repartitionByRange
  * on the code) gives every file a tight bounding box in BOTH
  * dimensions, so a (user range × time range) query prunes on either
  * predicate — the standard lakehouse data-clustering technique.
  *
  * The code is built purely from codegen'd bit arithmetic
  * (shift/and/or) — no UDF, engine-portable (the same expression is
  * byte-identical in ANSI SQL, see the o_zorder_layout oracle).
  */
object ZOrder {

  /** Morton code of two non-negative integer columns, `bits` bits
    * each (x on even bit positions, y on odd). Inputs are masked to
    * `bits`, so out-of-range values wrap rather than corrupt high
    * bits.
    *
    * Scale both dimensions to comparable bit widths first (fixed
    * shift, or quantile bucket ids at scale — what Delta's OPTIMIZE
    * ZORDER does with range-partition ids): if one dimension uses
    * far more bits than the other, its high bits dominate the code
    * and the curve degenerates to a linear sort on that dimension. */
  def zvalue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(lit(mask))
    val ym = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { b =>
      shiftleft(shiftrightunsigned(xm, b).bitwiseAND(lit(1L)), 2 * b)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(ym, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The matching ANSI SQL text (for cross-engine verification). */
  def zvalueSql(x: String, y: String, bits: Int = 16): String = {
    val mask = (1L << bits) - 1
    val terms = (0 until bits).flatMap { b =>
      Seq(s"((($x & $mask) >> $b) & 1) << ${2 * b}",
        s"((($y & $mask) >> $b) & 1) << ${2 * b + 1}")
    }
    terms.map(t => s"($t)").mkString(" | ")
  }

  /** Re-layout a frame for two-dimensional locality: range-partition
    * then sort by the Morton code — each output file gets a tight
    * bounding box in both dimensions for min/max pruning. */
  def layoutBy(df: DataFrame, x: Column, y: Column, bits: Int = 16,
      partitions: Int = 0): DataFrame = {
    val zv = zvalue(x, y, bits).as("__zv")
    val withZ = df.withColumn("__zv", zv)
    val parted =
      if (partitions > 0) withZ.repartitionByRange(partitions, col("__zv"))
      else withZ.repartitionByRange(col("__zv"))
    parted.sortWithinPartitions("__zv").drop("__zv")
  }
}
