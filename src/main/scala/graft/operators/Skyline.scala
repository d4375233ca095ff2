package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed 2D Pareto frontier (skyline): the rows no other row
  * dominates, minimizing `x` while maximizing `y` — the price/quality
  * efficient frontier of a catalog, the cost/recall frontier of a model
  * sweep.
  *
  * A point is dominated iff some other point has x' ≤ x and y' ≥ y with
  * one inequality strict. Two reductions make this one narrow pipeline
  * instead of the naive all-pairs anti-join:
  *
  *  1. per distinct x keep only gy(x) = max y — anything below is
  *     dominated at its own x;
  *  2. (x, gy) is on the frontier iff gy > max{gy(x') : x' < x} — a
  *     STRICT prefix max over ascending x.
  *
  * The prefix max does NOT become a partition-less window: x is
  * range-bucketed exactly as in [[Percentiles]] (an approx-quantile
  * sketch picks balanced bounds — accuracy only affects load balance),
  * the in-bucket strict prefix runs per bucket in parallel, and the
  * cross-bucket carry-in comes from the ≤|buckets|-row per-bucket max
  * table (a bounded theta self-join, broadcast back). Ties in x are no
  * hazard: the grid is distinct by construction, so "rows before me" in
  * the in-bucket sort is exactly "x' < x".
  */
object Skyline {

  /** Frontier rows as (x, y), ascending x / strictly increasing y. */
  def pareto2d(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    // Round 17 (optimization): the grid aggregate used to be built TWICE
    // — once under the boundary sketch and once under the eager
    // checkpoint of the bucketed copy. A lazy checkpoint on the grid
    // itself materializes it during the sketch action (one build); the
    // bucket projection over the blocks is then cheap enough for its
    // two consumers without a second materialization job.
    val g = df.select(xCol.as("__x"), yCol.as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy(col("__x")).agg(max(col("__y")).as("__gy"))
      .localCheckpoint(eager = false)

    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val probs = (1 until parts).map(_.toDouble / parts).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else g.select(col("__x").cast("double").as("__xd"))
        .stat.approxQuantile("__xd", probs, 0.01).distinct.sorted
    val bucketExpr = bounds.zipWithIndex.foldRight(lit(bounds.length): Column) {
      case ((b, i), rest) => when(col("__x").cast("double") <= b, i)
        .otherwise(rest)
    }
    val bucketed = g.withColumn("__b", bucketExpr)

    // carry-in per bucket: the max gy of every EARLIER bucket — a
    // ≤|buckets|²-pair theta join on a |buckets|-row aggregate, broadcast
    // back; buckets with no predecessor keep a null carry-in
    val bmax = bucketed.groupBy(col("__b")).agg(max(col("__gy")).as("__bm"))
    val carry = bmax.select(col("__b").as("__lb"), col("__bm").as("__lm"))
      .join(bmax.select(col("__b").as("__rb"), col("__bm").as("__rm")),
        col("__rb") < col("__lb"))
      .groupBy(col("__lb")).agg(max(col("__rm")).as("__pm"))

    val w = Window.partitionBy(col("__b")).orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(carry), col("__b") === col("__lb"), "left")
      .withColumn("__im", max(col("__gy")).over(w))
      .withColumn("__m", greatest(col("__im"), col("__pm")))
      .filter(col("__m").isNull || col("__gy") > col("__m"))
      .select(col("__x").as("x"), col("__gy").as("y"))
      .orderBy(col("x"))
  }
}
