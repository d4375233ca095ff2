package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType,
  LongType}

/** Native cosine-similarity kernel for the embedding surface (SURVEY §2.11).
  *
  * The composed form ([[graft.functions]]-level
  * `aggregate(zip_with(a, b, (p, q) => p*q), 0.0, _+_)` three times over)
  * is CodegenFallback: every scored pair walks an interpreted fold and
  * allocates a zipped array per dot product. This expression computes
  * dot(a,b) / (√dot(a,a) · √dot(b,b)) in one fused loop with the *same*
  * left-to-right double accumulation order, so results are bit-identical
  * (VectorKernelsSpec asserts it) and the DuckDB oracles stay valid.
  *
  * Null semantics mirror the composed form: null input array, length
  * mismatch (zip_with null-pads the shorter side → null product → null
  * fold), or any null element → null result. Zero-norm vectors follow IEEE
  * (0/0 = NaN) — deliberately NOT the ANSI-mode composed form, whose
  * `Divide` raises DIVIDE_BY_ZERO: a single degenerate vector must not
  * kill a 100 TB scoring pass, and DuckDB's double division (the oracle
  * side) is IEEE as well.
  */
object VectorKernels {

  /** Boxed so `null` can signal the composed form's null cases. Element
    * width is tracked per side — mixed float/double arguments are legal
    * through the SQL surface, and reading 8 bytes from 4-byte-packed data
    * would be silent garbage. */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean,
      bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Exact integer dot product of two ARRAY<BIGINT> values (boxed so null
    * can signal the composed form's null cases: length mismatch or null
    * element). ≡ `aggregate(zip_with(a, b, _*_), 0L, _+_)` — which is an
    * interpreted per-element fold that dominated q_semdedup's pair stage
    * (bench r15). Overflow is FAIL-LOUD (multiplyExact/addExact): the
    * DuckDB oracle's BIGINT multiply raises on overflow, so a silent
    * Java wrap would diverge the engines instead of erroring — the
    * guardedVariantId discipline. Within the documented envelope
    * (2⁻²⁰-quantized embeddings, |dot| ≤ dim·2⁴⁰ ≪ 2⁶³) the exact ops
    * never throw and JIT-intrinsify to the plain multiply. */
  def dotLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc = Math.addExact(acc, Math.multiplyExact(a.getLong(i), b.getLong(i)))
      i += 1
    }
    acc
  }

  /** Spark-compatible round(x, 6): HALF_UP via BigDecimal, NaN/Inf pass
    * through (Spark's Round leaves non-finite doubles unchanged). */
  private def round6(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def cosineVs(vec: ArrayData, c: Array[Float], isFloat: Boolean): Double = {
    val n = vec.numElements()
    if (n != c.length) return Double.NegativeInfinity // ranks last, like NULLS LAST
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return Double.NegativeInfinity
      val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      val y = c(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Top-`howMany` centroid ids for `vec` by (round6(cosine) desc, id asc),
    * NaN ranking first like Spark's descending sort. The centroid matrix
    * arrives as a codegen reference object — constant-folded into the plan
    * without inflating the generated source (16 inlined 64-float literals
    * cost more Janino time than the whole query's execution at bench
    * scale). */
  def nearestCentroids(vec: ArrayData, ids: Array[Long],
      vecs: Array[Array[Float]], howMany: Int, isFloat: Boolean): ArrayData = {
    val m = ids.length
    val scores = new Array[Double](m)
    var i = 0
    while (i < m) {
      scores(i) = round6(cosineVs(vec, vecs(i), isFloat))
      i += 1
    }
    val order = new Array[Integer](m)
    i = 0
    while (i < m) { order(i) = i; i += 1 }
    java.util.Arrays.sort(order, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        // score desc with NaN greatest (Double.compare semantics), id asc
        val c = java.lang.Double.compare(scores(b), scores(a))
        if (c != 0) c else java.lang.Long.compare(ids(a), ids(b))
      }
    })
    val take = math.min(howMany, m)
    val out = new Array[Long](take)
    i = 0
    while (i < take) { out(i) = ids(order(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Cosine similarity of two float/double array columns (double result);
  * ≡ the composed `dot/(√·√)` fold in [[graft.operators.Similarity]]. */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  private def vecType(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (vecType(left.dataType) && vecType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<FLOAT>/ARRAY<DOUBLE> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  // lazy: children may be unresolved attributes at construction time
  private def floatSide(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val leftFloat: Boolean = floatSide(left)
  private lazy val rightFloat: Boolean = floatSide(right)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("cos")
      s"""
         |java.lang.Double $tmp =
         |  graft.plans.VectorKernels.cosine($a, $b, $leftFloat, $rightFloat);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

/** Exact integer dot product of two ARRAY<BIGINT> columns (long result);
  * the codegen'd kernel behind the SemDeDup within-cluster cosine test —
  * see [[VectorKernels.dotLong]] for semantics and the overflow
  * contract. */
case class DotLongExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_long"

  private def vecType(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (vecType(left.dataType) && vecType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""
         |java.lang.Long $tmp = graft.plans.VectorKernels.dotLong($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLongExpr =
    copy(left = newLeft, right = newRight)
}

/** Top-`howMany` nearest centroid ids (array<long>) for a vector column —
  * the IVF assign/probe kernel. Centroids are expression *parameters*
  * (structural Seq types so plan equality/canonicalization stay value-based)
  * and reach the generated code as a reference object, keeping the
  * generated source O(1) in nlist. Ordering: round6(cosine) desc (NaN
  * first, as Spark sorts descending doubles), centroid id asc. */
case class NearestCentroidsExpr(child: Expression, ids: Seq[Long],
    vecs: Seq[Seq[Float]], howMany: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(ids.length == vecs.length, "ids and vecs must align")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an ARRAY<FLOAT>/ARRAY<DOUBLE> argument, got " +
        other.catalogString)
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_nearest_centroids"

  @transient private lazy val idArr: Array[Long] = ids.toArray
  @transient private lazy val vecArr: Array[Array[Float]] =
    vecs.map(_.toArray).toArray

  // lazy: child may be unresolved at construction time
  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.nearestCentroids(input.asInstanceOf[ArrayData], idArr,
      vecArr, howMany, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("centroidIds", idArr, "long[]")
    val vecsRef = ctx.addReferenceObj("centroidVecs", vecArr, "float[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.plans.VectorKernels.nearestCentroids(
         |  $c, $idsRef, $vecsRef, $howMany, $isFloat);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidsExpr =
    copy(child = newChild)
}
