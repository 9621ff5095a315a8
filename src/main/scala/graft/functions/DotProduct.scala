package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.{Column, SparkSession}

/** Native dot product over two `array<double>` columns.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * is semantically identical but materializes an intermediate array
  * and evaluates lambda closures per element; on an O(n²) similarity
  * join that allocation dominates the runtime. This expression is a
  * tight primitive loop over the two `ArrayData` buffers with full
  * whole-stage codegen — the hot path of every embedding operator
  * (brief: custom Catalyst `Expression` beats UDF beats everything).
  *
  * Summation order is left-to-right, exactly like the HOF form and
  * DuckDB's `list_dot_product`, so oracle hashes stay bit-identical.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var s = 0.0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-API access for graft native expressions. */
object NativeFunctions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))),
    (FunctionIdentifier("graft_hex60"),
      new ExpressionInfo(classOf[Hex60].getName, "graft_hex60"),
      (children: Seq[Expression]) => Hex60(children(0))),
    (FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "graft_bloom_contains"),
      (children: Seq[Expression]) => BloomMightContain(children(0), children(1))))

  /** Idempotent session-level registration (works without the
    * spark.sql.extensions config, e.g. under an existing session).
    * Also installs the sequence-key join rewrite so long-string joins
    * (registry join-back, HAS_SEQUENCE) lead with the 60-bit hash. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    graft.plans.SequenceJoinRewrite.install(spark)
  }

  /** `graft_dot(a, b)` as a Column, registering on first use. */
  def dot(spark: SparkSession)(a: Column, b: Column): Column = {
    register(spark)
    import org.apache.spark.sql.functions.call_udf
    call_udf("graft_dot", a, b)
  }
}

/** `--conf spark.sql.extensions=graft.functions.GraftSparkExtensions`:
  * injects the native function library into every session of the
  * cluster — the deployment path for a real multi-executor cluster. */
class GraftSparkExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    NativeFunctions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.SequenceJoinRewrite)
  }
}
