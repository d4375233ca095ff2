package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact WEIGHTED discrete percentiles — the survey-weight / importance-
  * weight generalization of [[Percentiles.exactDisc]]: the p-quantile is
  * the smallest value v whose cumulative weight reaches ⌈p·W⌉ (W = total
  * group weight), so with unit weights it degenerates to the unweighted
  * rank pick exactly (spec-pinned).
  *
  * Same distributed shape as the rank frame: values are range-bucketed
  * from an approx-quantile sketch (balance only), the per-(group, bucket)
  * weight census broadcasts bucket carry-ins, and in-bucket cumulative
  * weights come from a per-bucket RANGE window — tie values share their
  * block-end cumulative weight, so every row's cum is deterministic and
  * the min-v selection needs no tie break. Thresholds are computed in
  * integer arithmetic (`(W·num + den − 1) div den`) — no float rank can
  * drift off a boundary at any W.
  */
object WeightedPercentiles {

  /** One row per group with `outNames` columns; `ratios(i) = (num, den)`
    * with 0 < num ≤ den. `weightCol` must be a positive integral weight
    * (rows with w ≤ 0 or null value are dropped, matching the SQL
    * formulation). */
  def exactDisc(df: DataFrame, groupCol: Column, valueCol: Column,
      weightCol: Column, ratios: Seq[(Int, Int)],
      outNames: Seq[String]): DataFrame = {
    require(ratios.nonEmpty && ratios.forall { case (n, d) =>
      d > 0 && n > 0 && n <= d }, "ratios must lie in (0, 1] as num/den")
    require(outNames.length == ratios.length, "one output name per ratio")

    val base = df.select(groupCol.as("__g"), valueCol.as("__v"),
        weightCol.cast("long").as("__w"))
      .filter(col("__v").isNotNull && col("__w") > 0)
      .localCheckpoint()

    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val probs = (1 until parts).map(_.toDouble / parts).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else base.select(col("__v").cast("double").as("__vd"))
        .stat.approxQuantile("__vd", probs, 0.01).distinct.sorted
    val bucketExpr = bounds.zipWithIndex.foldRight(lit(bounds.length): Column) {
      case ((b, i), rest) => when(col("__v").cast("double") <= b, i)
        .otherwise(rest)
    }
    val bucketed = base.withColumn("__b", bucketExpr)

    // per-(group, bucket) weight census → carry-in offset + group total.
    // Null-safe on the group key: a NULL group is a real group.
    val census = bucketed.groupBy(col("__g"), col("__b"))
      .agg(sum(col("__w")).as("__bw"))
    val offsets = census
      .withColumn("__off",
        sum(col("__bw")).over(
          Window.partitionBy(col("__g")).orderBy(col("__b"))) - col("__bw"))
      .withColumn("__tw",
        sum(col("__bw")).over(Window.partitionBy(col("__g"))))
      .select(col("__g").as("__og"), col("__b").as("__ob"),
        col("__off"), col("__tw"))

    // in-bucket cumulative weight: RANGE frame so tied values share the
    // block-end cum — deterministic at any in-tie row order
    val wInB = Window.partitionBy(col("__g"), col("__b")).orderBy(col("__v"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bucketed
      .withColumn("__lcw", sum(col("__w")).over(wInB))
      .join(broadcast(offsets),
        col("__g") <=> col("__og") && col("__b") === col("__ob"))
      .withColumn("__cw", col("__off") + col("__lcw"))

    val aggs = ratios.zip(outNames).map { case ((num, den), name) =>
      val t = expr(s"(__tw * $num + ${den - 1}) div $den")
      min(when(col("__cw") >= t, col("__v"))).as(name)
    }
    cum.groupBy(col("__g").as("group"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
