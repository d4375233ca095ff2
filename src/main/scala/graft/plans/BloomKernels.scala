package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-filter membership probe against a driver-built filter —
  * the pre-filter that makes set-membership checks (decontamination,
  * dictionary lookups, id allowlists) scan-speed at 100 TB.
  *
  * Why not a broadcast hash join alone: a Bloom filter costs ~1.2
  * bytes/item at 1% fpp where a broadcast hash set of strings costs tens
  * of bytes/item — the probe side fits executor memory at ~40× the set
  * size, and the filter is a NARROW codegen'd predicate that prunes the
  * stream before any join machinery (survivors, a small superset of true
  * matches, still go through an exact verify — the filter only subtracts
  * work, never changes results). Spark's own runtime-filter machinery
  * (`BloomFilterMightContain`) is internal to AQE join pushdown; this is
  * the same idea surfaced as a library primitive with the filter as a
  * codegen reference object ([[org.apache.spark.util.sketch.BloomFilter]]
  * serializes with the task closure; constants bigger than a scalar stay
  * out of the generated source per the round-2 Janino lesson).
  *
  * Null semantics: null input → null (standard UnaryExpression contract).
  * STRING probes hash UTF-8 bytes — identical to `putString` on the
  * driver; LONG probes use `putLong`'s encoding.
  */
case class BloomMightContainExpr(child: Expression, bloom: BloomFilter)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a STRING or BIGINT argument, got ${other.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  private lazy val isString: Boolean = child.dataType == StringType

  override protected def nullSafeEval(input: Any): Any =
    if (isString)
      bloom.mightContainBinary(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
    else bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      if (isString) s"${ev.value} = $ref.mightContainBinary(($c).getBytes());"
      else s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}
