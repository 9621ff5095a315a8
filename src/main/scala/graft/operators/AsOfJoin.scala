package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `rightTs <= leftTs` within the same key — the time-series lookup
  * Spark has no built-in operator for (SURVEY §2.3 notes the reference
  * lacks it too; this is an engine extension).
  *
  * Implementation is the union-window form, NOT a range join: tag both
  * sides, sort each key's rows once by (ts, tiebreak), and carry the
  * last-seen right payload forward with `last(_, ignoreNulls)` over an
  * unbounded-preceding frame.
  *
  * Scale: exactly ONE shuffle (hash by key) + per-partition sort —
  * same cost as any windowed aggregate, independent of time-gap
  * distribution. A naive `leftTs >= rightTs` theta-join is quadratic
  * per key; this is n log n, and AQE handles key skew like any other
  * window. Right payload columns ride along as one struct, so wide
  * right sides don't multiply window passes.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     build side (the "state" being looked up)
    * @param keys      equi-key column names present on both sides
    * @param leftTs    event-time column on `left`
    * @param rightTs   event-time column on `right`
    * @param rightCols right columns to surface (null when no match);
    *                  emitted with an `asof_` prefix
    * @param tiebreak  right-side column breaking equal-timestamp ties
    *                  among right rows deterministically (left rows
    *                  carry null payloads, so their relative order
    *                  cannot change the result)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tiebreak: String): DataFrame = {
    val leftTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__isLeft", lit(1))
      .withColumn("__payload",
        lit(null).cast(structType(right, rightCols)))
    val rightTagged = right
      .select((keys ++ rightCols :+ rightTs :+ tiebreak).distinct.map(col): _*)
      .withColumn("__ts", col(rightTs))
      .withColumn("__isLeft", lit(0))
      .withColumn("__payload", struct(rightCols.map(col): _*))
    val tbType = right.schema(tiebreak).dataType
    val unioned = leftTagged.select(
      (keys.map(col) :+ col("__ts") :+ lit(null).cast(tbType).as("__tb") :+
        col("__isLeft") :+ col("__payload") :+
        struct(left.columns.map(col): _*).as("__leftRow")): _*)
      .unionByName(rightTagged.select(
        (keys.map(col) :+ col("__ts") :+ col(tiebreak).as("__tb") :+
          col("__isLeft") :+ col("__payload") :+
          lit(null).cast(structType(left, left.columns.toSeq)).as("__leftRow")): _*))
    // right rows sort before left rows at equal __ts so a same-instant
    // right row IS visible to the left probe (asof <=).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__isLeft"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__isLeft") === 1)
    val leftOut = left.columns.map(c => col("__leftRow").getField(c).as(c))
    val rightOut = rightCols.map(c => col("__asof").getField(c).as(s"asof_$c"))
    carried.select((leftOut ++ rightOut): _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))
}
