package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT interpolated percentiles (PERCENTILE_CONT semantics)
  * without per-group value buffering (SURVEY §2.4 A5+).
  *
  * Spark's built-in exact `percentile` materializes every value of a group
  * in one aggregation buffer — a non-starter when a group holds billions of
  * rows. This operator computes the same interpolated quantiles from a
  * DISTRIBUTED sort:
  *
  *  1. range-repartition rows by (group, value) — each partition sorts
  *     locally, so the sort parallelism is the partition count, not the
  *     group count;
  *  2. per-(group, partition) row counts → cumulative offsets (a
  *     groups × partitions table: a tiny model artifact, broadcast back);
  *  3. global rank = partition offset + local row_number (the local window
  *     partitions by (partition id, group) — parallel, streaming, no
  *     buffering);
  *  4. one bounded aggregation picks the two bracketing ranks per quantile
  *     and interpolates.
  *
  * Determinism: ranks among tied values are arbitrary, but interpolation
  * only reads the VALUES at the bracketing ranks, and equal values give
  * equal reads — so the result is deterministic for any tie order, and
  * matches the built-in `percentile` / DuckDB `quantile_cont` exactly
  * (asserted in PlanSpec; `q_percentile_cont`'s oracle is unchanged).
  *
  * Scale shape: one range shuffle of (group, value) pairs, two broadcast
  * joins of the tiny offset/count tables, one final map-side-partial
  * aggregation. Nothing buffers more than a partition's sort (spillable).
  */
object Percentiles {

  /** One row per group: `p_<i>` = the `ps(i)` interpolated percentile of
    * `valueCol` (nulls ignored, PERCENTILE_CONT interpolation). */
  def exactInterpolated(df: DataFrame, groupCol: Column, valueCol: Column,
      ps: Seq[Double], outNames: Seq[String]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      "percentiles must lie in [0, 1]")
    require(outNames.length == ps.length, "one output name per percentile")
    val base = df.select(groupCol.as("__g"), valueCol.as("__v"))
      .filter(col("__v").isNotNull)
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = base.repartitionByRange(parts, col("__g"), col("__v"))
      .withColumn("__pid", spark_partition_id())

    // per-(group, partition) census → cumulative offset of each partition
    // inside its group; groups × partitions rows — broadcastable
    val census = ranged.groupBy(col("__g"), col("__pid"))
      .agg(count(lit(1)).as("__pn"))
    val offsets = census
      .withColumn("__off",
        sum(col("__pn")).over(
          Window.partitionBy(col("__g")).orderBy(col("__pid"))) - col("__pn"))
      .withColumn("__n",
        sum(col("__pn")).over(Window.partitionBy(col("__g"))))
      .select(col("__g"), col("__pid"), col("__off"), col("__n"))

    // local rank within (partition, group) is a streaming window over the
    // range-partitioned data — each partition sorts only itself
    val ranked = ranged
      .withColumn("__lrn", row_number().over(
        Window.partitionBy(col("__pid"), col("__g")).orderBy(col("__v"))))
      .join(broadcast(offsets), Seq("__g", "__pid"))
      .withColumn("__rn", col("__off") + col("__lrn"))

    // pick the bracketing ranks per quantile and interpolate:
    // pos = p(n-1) (0-based) → lo = ⌊pos⌋+1, hi = min(lo+1, n) (1-based)
    val aggs = ps.zip(outNames).flatMap { case (p, name) =>
      val pos = (col("__n") - 1) * p
      val lo = floor(pos) + 1
      val hi = least(lo + 1, col("__n"))
      Seq(
        max(when(col("__rn") === lo, col("__v"))).as(s"__lo_$name"),
        max(when(col("__rn") === hi, col("__v"))).as(s"__hi_$name"),
        first(pos - floor(pos)).as(s"__frac_$name"))
    }
    val out = ps.zip(outNames).map { case (_, name) =>
      (col(s"__lo_$name") +
        col(s"__frac_$name") * (col(s"__hi_$name") - col(s"__lo_$name")))
        .as(name)
    }
    ranked.groupBy(col("__g"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("__g").as("group") +: out: _*)
  }
}
