package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Native fused cosine (plans/CosineSimExpr) ≡ the composed HOF fold —
  * bit-identical doubles (same left-to-right accumulation order), including
  * edge cases: zero vectors (IEEE NaN), length mismatch and null elements
  * (both null, matching zip_with's null-padding semantics).
  */
class VectorKernelsSpec extends SparkSpec {
  import spark.implicits._

  test("CosineSimExpr ≡ composed fold on the embeddings corpus (bit-exact)") {
    val e = graft.sources.Tables.load(spark, sf, "embeddings")
    val pairs = e.select(col("vec_id").as("ida"), col("embedding").as("va"))
      .join(e.select(col("vec_id").as("idb"), col("embedding").as("vb")),
        col("idb") === col("ida") + 1)
    val diff = pairs
      .select(Similarity.cosine(col("va"), col("vb")).as("native"),
        Similarity.cosineComposed(col("va"), col("vb")).as("composed"))
      .filter(not(col("native") <=> col("composed")))
      .count()
    assert(diff == 0)
  }

  test("CosineSimExpr edge cases: floats, zero vector, length mismatch, null") {
    // comparable rows (composed form agrees; ANSI Divide would throw on the
    // zero-norm row, so that one is native-only below)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)), // identical → 1.0
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),             // orthogonal → 0.0
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))        // mismatch → null
    ).toDF("a", "b")
    val rows = df
      .select(Similarity.cosine(col("a"), col("b")).as("native"),
        Similarity.cosineComposed(col("a"), col("b")).as("composed"))
      .collect()
    rows.foreach { r =>
      val n = if (r.isNullAt(0)) null else r.getDouble(0).asInstanceOf[Any]
      val c = if (r.isNullAt(1)) null else r.getDouble(1).asInstanceOf[Any]
      assert(n == c, s"native=$n composed=$c")
    }
    assert(rows(0).getDouble(0) == 1.0)
    assert(rows(1).getDouble(0) == 0.0)
    assert(rows(2).isNullAt(0))

    // zero-norm: native is total (IEEE NaN, like DuckDB); the ANSI composed
    // form raises DIVIDE_BY_ZERO — a degenerate vector must not kill a
    // corpus-wide scoring pass.
    val zn = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("native"))
      .head()
    assert(zn.getDouble(0).isNaN)

    // double arrays go through the non-float path
    val dd = Seq((Array(1.0, 2.0), Array(2.0, 4.0))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("n"),
        Similarity.cosineComposed(col("a"), col("b")).as("c"))
      .head()
    assert(dd.getDouble(0) == dd.getDouble(1))

    // mixed float/double sides: element width tracked per side (a single
    // width flag would read 8 bytes from 4-byte-packed float data)
    val mixed = Seq((Array(1.0f, 2.0f), Array(2.0, 4.0))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("n"),
        Similarity.cosineComposed(col("a"), col("b")).as("c"))
      .head()
    assert(mixed.getDouble(0) == mixed.getDouble(1))
    assert(math.abs(mixed.getDouble(0) - 1.0) < 1e-12)

    // wrong-typed input fails analysis, not execution
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq((Array("x"), Array("y"))).toDF("a", "b")
        .select(Similarity.cosine(col("a"), col("b")))
        .collect()
    }
  }

  test("CosineSimExpr participates in whole-stage codegen") {
    val e = graft.sources.Tables.load(spark, sf, "embeddings")
    val cg = e.select(
        Similarity.cosine(col("embedding"), col("embedding")).as("s"))
      .queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(cg.contains("VectorKernels.cosine"), "expected inlined static call")
  }

  private def dotL(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.DotLongExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  test("DotLongExpr ≡ composed zip_with/aggregate fold on quantized " +
      "embeddings, and matches its null semantics") {
    val q = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1048576L).cast("long")).as("vq"))
    val pairs = q.select(col("vec_id").as("ida"), col("vq").as("va"))
      .join(q.select(col("vec_id").as("idb"), col("vq").as("vb")),
        col("idb") === col("ida") + 1)
    val composed = aggregate(
      zip_with(col("va"), col("vb"), (x, y) => x * y),
      lit(0L), (a, x) => a + x)
    val diff = pairs
      .select(dotL(col("va"), col("vb")).as("native"),
        composed.as("composed"))
      .filter(not(col("native") <=> col("composed")))
      .count()
    assert(diff == 0)
    // length mismatch → null, matching zip_with's null-padding fold
    val edge = Seq((Array(1L, 2L), Array(3L, 4L, 5L)))
      .toDF("a", "b")
      .select(dotL(col("a"), col("b")).as("d")).collect()
    assert(edge(0).isNullAt(0), "length mismatch must yield null")
  }

  test("DotLongExpr participates in whole-stage codegen") {
    val e = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(transform(col("embedding"),
        x => round(x.cast("double") * 1048576L).cast("long")).as("vq"))
    val cg = e.select(dotL(col("vq"), col("vq")).as("d"))
      .queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(cg.contains("VectorKernels.dotLong"), "expected inlined static call")
  }
}
