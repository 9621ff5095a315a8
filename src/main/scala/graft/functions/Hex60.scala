package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5 prefix hash over a string column.
  *
  * Semantically identical to
  * `conv(substring(md5(x), 1, 15), 16, 10) :: long` — the first 15 hex
  * digits of the md5 digest are exactly the top 60 bits, i.e. digest
  * bytes 0..7 big-endian shifted right by 4 — but skips the hex-string
  * render, substring, and `conv`'s string-based base conversion, which
  * dominate minhash signature computation (8 seeded hashes × ~150
  * shingles per document).
  *
  * DuckDB oracle form stays
  * `CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)`.
  */
case class Hex60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hex60 requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hex60"

  override def nullSafeEval(input: Any): Any =
    Hex60.hash60(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Hex60.hash60($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Hex60 {
  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Full md5 digest via the thread-local instance. */
  def md5(bytes: Array[Byte]): Array[Byte] = {
    val md = digests.get()
    md.reset()
    md.digest(bytes)
  }

  /** Top 60 bits of md5(bytes) as a non-negative long. */
  def hash60(bytes: Array[Byte]): Long = {
    val d = md5(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }
}
