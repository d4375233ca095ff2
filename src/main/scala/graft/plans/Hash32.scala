package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's portable 32-bit hash
  * (first 8 hex digits of md5 as a long) — the codegen'd fast path of
  * [[graft.functions.TextFunctions.hash32]], which composes
  * `conv(substring(md5(x),1,8),16,10)` from built-ins (3 expression nodes,
  * a hex-string round-trip and a string→long parse per row).
  *
  * This is preference level (b) of the custom-operator ladder (SURVEY §2.9):
  * a scalar `Expression` with `doGenCode` — the generated code is a single
  * static call inside the WholeStageCodegen body, no boxing, no UDF
  * serialization. Byte-identical semantics to the composed form (the spec
  * asserts it), so DuckDB oracles remain valid wherever either form is used.
  */
case class Hash32Expr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING argument, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash32"

  override protected def nullSafeEval(input: Any): Any =
    Hash32Expr.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Hash32Expr.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash32Expr =
    copy(child = newChild)
}

object Hash32Expr {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes as an unsigned 32-bit value in a long — exactly the
    * numeric value of the first 8 hex digits. */
  def hash(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val b = md.digest(s.getBytes)
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }
}
