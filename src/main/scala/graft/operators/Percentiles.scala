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
  *  1. bucket rows by VALUE RANGE, with boundaries taken once from an
  *     approximate-quantile sketch of the value column (a driver-side
  *     model artifact, like the IVF quantizer). Buckets are a pure
  *     function of the data — deliberately NOT `spark_partition_id` over
  *     a range exchange, whose census/rank branches would only agree if
  *     the exchange is reused (sampled boundaries can differ per
  *     materialization: silent rank misalignment);
  *  2. per-(group, bucket) row counts → cumulative offsets (a tiny
  *     broadcastable table);
  *  3. global rank = bucket offset + local row_number (the local window
  *     partitions by (group, bucket) — parallel, streaming, sort spills);
  *  4. one bounded aggregation picks the two bracketing ranks per quantile
  *     and interpolates.
  *
  * Groups whose values are all null keep a row with null percentiles,
  * exactly like the built-in aggregate. Determinism: ranks among tied
  * values are arbitrary, but interpolation only reads the VALUES at the
  * bracketing ranks, and equal values give equal reads — so the result is
  * deterministic for any tie order and matches the built-in `percentile` /
  * DuckDB `quantile_cont` exactly (asserted in PercentilesSpec;
  * `q_percentile_cont`'s oracle is unchanged).
  *
  * Scale shape: ONE scan of the source. The projected (group, value)
  * pairs are `localCheckpoint`ed eagerly (executor block storage,
  * released when the plan is garbage-collected), so the sketch, census
  * and rank passes all read the checkpointed blocks instead of re-scanning
  * the input three times. Then: one hash shuffle of (group, bucket), two
  * broadcast joins of the tiny census tables, one final map-side-partial
  * aggregation. Nothing buffers more than one (group, bucket)'s sort
  * (spillable). Parallelism = |groups| × |buckets|, independent of group
  * cardinality.
  *
  * NOTE this API is semi-eager: building the result DataFrame runs two
  * Spark actions (the checkpoint materialization and the boundary
  * sketch) — like `Similarity.ivfTrainKMeans`, the boundaries are a tiny
  * driver-side model artifact and cannot be deferred. `localCheckpoint`
  * trades lineage for speed: if an executor holding checkpoint blocks is
  * lost, the job fails and must be resubmitted (acceptable for an
  * interactive/batch analytic; use a reliable `checkpoint` directory
  * upstream if that matters).
  *
  * RETENTION: with [[exactInterpolated]] the checkpointed blocks are
  * released by the ContextCleaner only when the returned plan (and the RDD
  * it pins) is garbage-collected on the driver — each call retains one
  * projected (group, value) copy of the input until then. A long-lived
  * session calling repeatedly should use [[exactInterpolatedEager]], which
  * materializes the (one row per group) result and releases the input
  * blocks before returning — executor storage then holds only the
  * KB-scale result, never an accumulating series of input copies.
  */
object Percentiles {

  /** One row per group: `outNames(i)` = the `ps(i)` interpolated percentile
    * of `valueCol` (nulls ignored; all-null groups yield null columns;
    * a NULL group key is a group, exactly like the built-in aggregate). */
  def exactInterpolated(df: DataFrame, groupCol: Column, valueCol: Column,
      ps: Seq[Double], outNames: Seq[String]): DataFrame =
    build(df, groupCol, valueCol, ps, outNames)._1

  /** [[exactInterpolated]] with release-after-consume: runs the result to
    * a `localCheckpoint` (tiny — one row per group) and eagerly releases
    * the input's checkpoint blocks before returning, instead of leaving
    * one (group, value) copy of the input pinned in executor storage
    * until driver GC (the [[Components]] release pattern,
    * `Components.scala` releaseBlocks). Same rows, same schema; costs the
    * one extra materialization of the KB-scale result. */
  def exactInterpolatedEager(df: DataFrame, groupCol: Column,
      valueCol: Column, ps: Seq[Double], outNames: Seq[String]): DataFrame = {
    val (result, input) = build(df, groupCol, valueCol, ps, outNames)
    val out = result.localCheckpoint()
    input.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
    out
  }

  /** PERCENTILE_DISC semantics from the same distributed rank machinery:
    * `outNames(i)` = the VALUE at 1-based rank ⌈pᵢ·n⌉ where pᵢ is the
    * RATIONAL `ratios(i) = (num, den)` — the rank is computed in integer
    * arithmetic (`(num·n + den − 1) div den`), so unlike a double
    * `ceil(p*n)` it cannot drift off a rank boundary at any n. The picked
    * value is an actual data value (no interpolation), which makes it
    * bit-portable across engines — the reason winsorization thresholds
    * use this and not [[exactInterpolated]]. */
  def exactDisc(df: DataFrame, groupCol: Column, valueCol: Column,
      ratios: Seq[(Int, Int)], outNames: Seq[String]): DataFrame = {
    require(ratios.nonEmpty && ratios.forall { case (n, d) =>
      d > 0 && n > 0 && n <= d }, "ratios must lie in (0, 1] as num/den")
    require(outNames.length == ratios.length, "one output name per ratio")
    val (ranked, all) = rankedFrame(df, groupCol, valueCol)
    val aggs = ratios.zip(outNames).map { case ((num, den), name) =>
      val rank = expr(s"(__n * $num + ${den - 1}) div $den")
      max(when(col("__rn") === rank, col("__v"))).as(name)
    }
    restoreGroups(all,
      ranked.groupBy(col("__g")).agg(aggs.head, aggs.tail: _*), outNames)
  }

  /** The distributed global per-group rank frame as a public surface:
    * one row per non-null value with columns (group, value, rank, n) —
    * rank is the 1-based position of the value inside its group's sorted
    * order, n the group's non-null count. Rank statistics (Gini, Lorenz
    * points, rank correlations) build on this without a per-group
    * single-partition window: the sort is value-bucketed exactly as in
    * the percentile paths. Note ranks among TIED values are arbitrary —
    * consumers must only compute quantities invariant under permuting
    * equal values (all of the above are); for row-linked rank statistics
    * (Spearman) use [[globalRanksTieBroken]] instead. */
  def globalRanks(df: DataFrame, groupCol: Column, valueCol: Column)
      : DataFrame = {
    val (ranked, _) = rankedFrame(df, groupCol, valueCol)
    ranked.select(col("__g").as("group"), col("__v").as("value"),
      col("__rn").as("rank"), col("__n").as("n"))
  }

  /** [[globalRanks]] with a DETERMINISTIC total order: ties in the value
    * break on `tieCol` (a per-row identity such as an event id), which is
    * also carried through as `tie` so two rank frames over different
    * value columns of the same rows can be joined back row-for-row —
    * the feed for Spearman-style rank correlation. Buckets still come
    * from the value alone (equal values share a bucket, so the in-bucket
    * sort on (value, tie) yields globally consistent ranks). */
  def globalRanksTieBroken(df: DataFrame, groupCol: Column,
      valueCol: Column, tieCol: Column): DataFrame = {
    val (ranked, _) = rankedFrame(df, groupCol, valueCol, Some(tieCol))
    ranked.select(col("__g").as("group"), col("__v").as("value"),
      col("__tb").as("tie"), col("__rn").as("rank"), col("__n").as("n"))
  }

  /** Shared plan builder: (result, the checkpointed (group, value)
    * projection) — the second element so eager callers can release its
    * blocks once the result no longer needs them. */
  private def build(df: DataFrame, groupCol: Column, valueCol: Column,
      ps: Seq[Double], outNames: Seq[String]): (DataFrame, DataFrame) = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      "percentiles must lie in [0, 1]")
    require(outNames.length == ps.length, "one output name per percentile")
    val (ranked, all) = rankedFrame(df, groupCol, valueCol)

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
    val computed = ranked.groupBy(col("__g"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("__g") +: out.map(c => c): _*)
    (restoreGroups(all, computed, outNames), all)
  }

  /** The distributed global-rank frame shared by cont and disc variants:
    * returns (ranked rows with `__g __v __rn __n` (+ `__tb` when a
    * tie-break column is given), the checkpointed projection `all`). */
  private def rankedFrame(df: DataFrame, groupCol: Column,
      valueCol: Column, tieCol: Option[Column] = None)
      : (DataFrame, DataFrame) = {
    // Eager narrow materialization: every later pass (sketch, census,
    // rank, group restore) reads these blocks — the source is scanned once.
    val projected = tieCol match {
      case Some(tb) => df.select(groupCol.as("__g"), valueCol.as("__v"),
        tb.as("__tb"))
      case None => df.select(groupCol.as("__g"), valueCol.as("__v"))
    }
    val all = projected.localCheckpoint()
    val base = all.filter(col("__v").isNotNull)
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions

    // value-range boundaries from one approximate-quantile sketch — a tiny
    // deterministic model artifact; accuracy only affects load balance
    val probs = (1 until parts).map(_.toDouble / parts).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else base.select(col("__v").cast("double").as("__vd"))
        .stat.approxQuantile("__vd", probs, 0.01)
        .distinct.sorted
    val vd = col("__v").cast("double")
    val bucketExpr = bounds.zipWithIndex.foldRight(lit(bounds.length): Column) {
      case ((b, i), rest) => when(vd <= b, i).otherwise(rest)
    }
    val bucketed = base.withColumn("__b", bucketExpr)

    // per-(group, bucket) census → cumulative offset of each bucket inside
    // its group; |groups| × |buckets| rows — broadcastable
    val census = bucketed.groupBy(col("__g"), col("__b"))
      .agg(count(lit(1)).as("__bn"))
    val offsets = census
      .withColumn("__off",
        sum(col("__bn")).over(
          Window.partitionBy(col("__g")).orderBy(col("__b"))) - col("__bn"))
      .withColumn("__n",
        sum(col("__bn")).over(Window.partitionBy(col("__g"))))
      .select(col("__g"), col("__b"), col("__off"), col("__n"))

    // local rank within (group, bucket) — each bucket sorts only itself.
    // The census join must be null-safe on the group key: a NULL group is
    // a real group (same as the built-in aggregate), and plain EqualTo
    // would silently drop every one of its rows here.
    val offsetsR = offsets.select(col("__g").as("__og"), col("__b").as("__ob"),
      col("__off"), col("__n"))
    val localOrder: Seq[Column] = col("__v") +:
      tieCol.map(_ => col("__tb")).toSeq
    val ranked = bucketed
      .withColumn("__lrn", row_number().over(
        Window.partitionBy(col("__g"), col("__b")).orderBy(localOrder: _*)))
      .join(broadcast(offsetsR),
        col("__g") <=> col("__og") && col("__b") === col("__ob"))
      .drop("__og", "__ob")
      .withColumn("__rn", col("__off") + col("__lrn"))
    (ranked, all)
  }

  /** All-null groups fell out at the null filter — restore them with null
    * percentiles, matching the built-in aggregate's output exactly.
    * Null-safe join: EqualTo would strip a NULL group's computed values. */
  private def restoreGroups(all: DataFrame, computed: DataFrame,
      outNames: Seq[String]): DataFrame = {
    val groups = all.select(col("__g")).distinct()
    groups.join(computed.withColumnRenamed("__g", "__cg"),
        groups("__g") <=> col("__cg"), "left")
      .select(col("__g").as("group") +: outNames.map(col): _*)
  }
}
