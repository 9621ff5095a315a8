package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native bloom-filter membership probe: `graft_bloom_contains(bloom,
  * key)` where `bloom` is a foldable binary column holding a
  * serialized `org.apache.spark.util.sketch.BloomFilter` and `key` is
  * a long.
  *
  * This is the runtime-filter primitive for the 100 TB semi-join: a
  * dim-side key set too large to broadcast as a hash relation often
  * still fits as a bloom (~1.2 MB per million keys at 1% fpp), and
  * probing it INSIDE the fact scan's whole-stage-codegen loop prunes
  * rows before the shuffle that the exact join would otherwise pay
  * for. False positives are only a performance leak, never a
  * correctness one — [[graft.operators.BloomPrune]] always confirms
  * with the exact join on the surviving rows.
  *
  * The filter deserializes once per executor instance (transient
  * lazy), not per row; codegen references it as a constant object so
  * the per-row cost is one `mightContainLong`.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains requires a foldable (literal) bloom argument")
    else if (left.dataType != BinaryType || right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains requires (binary, bigint), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(
      left.eval(null).asInstanceOf[Array[Byte]]))

  override def nullSafeEval(bloomBytes: Any, key: Any): Any =
    bloom.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    // The bloom child is a literal; its "evaluation" folds away and
    // only the reference object probe remains in the generated loop.
    defineCodeGen(ctx, ev, (_, k) => s"$ref.mightContainLong($k)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
