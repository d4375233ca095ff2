package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-adaptive bucket key for the bucketed-cumsum discipline.
  *
  * The §2.15 order-statistic queries (`q_abc_class`, `q_mann_whitney`,
  * `q_conformal`) replace the single-partition global-sort window with
  * per-bucket partitioned windows plus a tiny O(|buckets|²) offset-merge
  * theta join. A FIXED bucket width (`value div 2²²`) makes |buckets|
  * data-dependent: bounded while the value range is bounded, but a
  * value-unbounded column (revenue cents over a 100 TB corpus, an
  * outlier residual) silently grows the offset merge quadratically —
  * the r11 verdict's task #4.
  *
  * This helper derives the width from the column's own range instead:
  * one exact min/max aggregate (1 row, broadcast back via crossJoin —
  * fully lazy, no plan-build action) and
  *
  *   width  = (mx − mn) div target + 1
  *   bucket = (v − mn) div width          ∈ [0, target]
  *
  * so the bucket count is ≤ `target + 1` REGARDLESS of the value range
  * — the offset merge stays O(target²) at any scale — while the bucket
  * key remains monotone in the value (the property the offset-merge
  * `<`/`>` theta joins rely on). The bucket column is internal to the
  * cumsum plan and never reaches query output, so adopting adaptive
  * widths cannot move an oracle hash. Exact min/max (not approxQuantile,
  * the [[Skyline]] variant) keeps plan construction action-free and the
  * bucket assignment deterministic cross-run; equi-width buckets can be
  * OCCUPANCY-skewed on heavy-tailed values — which only shifts work
  * balance between the partitioned windows, never the merge bound, and
  * the windows themselves remain per-bucket parallel.
  */
object RangeBuckets {

  /** Default bucket-count target: 256 buckets keeps the offset-merge
    * theta join at ≤ 2¹⁶ pairs (trivially broadcastable) while giving
    * local[32]-to-1000-executor clusters ample window parallelism. */
  val DefaultTarget = 256

  /** `df` plus a `bucket` column over long-typed `valueCol`, bucket
    * count ≤ `target + 1` by construction. The min/max subtree is the
    * caller's own frame — Spark's exchange reuse dedups it against the
    * main branch, and the frames this discipline applies to are census-
    * sized (value-cardinality), never the corpus. */
  def withRangeBucket(df: DataFrame, valueCol: String,
      target: Int = DefaultTarget): DataFrame = {
    require(target >= 1, s"target must be >= 1, got $target")
    val b = df.agg(min(col(valueCol)).as("__rb_mn"),
      max(col(valueCol)).as("__rb_mx"))
    df.crossJoin(broadcast(b))
      .withColumn("bucket", expr(
        s"($valueCol - __rb_mn) div ((__rb_mx - __rb_mn) div $target + 1)"))
      .drop("__rb_mn", "__rb_mx")
  }

  /** The rank-free below-count frame over a (v, t) value census: each
    * distinct long value `v` with its multiplicity `t`, the exact number
    * of rows strictly below it (`below`) and the exact value mass
    * strictly below it (`xb`, DECIMAL(38,0) Σ v·t over smaller values).
    * This is the shared substrate of the census order statistics (Gini,
    * Lorenz, Hill): per-bucket partitioned cumsums + the O(buckets²)
    * offset-merge theta join — never a single-partition global sort, and
    * the bucket count is range-independent per [[withRangeBucket]]. */
  def belowFrame(census: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val cen = withRangeBucket(census, "v")
    val w = Window.partitionBy(col("bucket")).orderBy(col("v"))
    val loc = cen
      .withColumn("cumt", sum(col("t")).over(w))
      .withColumn("cumx",
        sum(col("v").cast(DecimalType(38, 0)) * col("t")).over(w))
    val bt = cen.groupBy(col("bucket"))
      .agg(sum(col("t")).as("bn"),
        sum(col("v").cast(DecimalType(38, 0)) * col("t")).as("bx"))
    val off = bt.as("a")
      .join(bt.as("o"), col("o.bucket") < col("a.bucket"), "left")
      .groupBy(col("a.bucket").as("bucket"))
      .agg(coalesce(sum(col("o.bn")), lit(0L)).as("offn"),
        coalesce(sum(col("o.bx")), lit(0L).cast(DecimalType(38, 0)))
          .as("offx"))
    loc.join(broadcast(off), Seq("bucket"))
      .select(col("v"), col("t"),
        (col("offn") + col("cumt") - col("t")).as("below"),
        (col("offx") + col("cumx")
          - col("v").cast(DecimalType(38, 0)) * col("t")).as("xb"))
  }
}
