package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Per-source boilerplate-prefix removal — the curation step that strips
  * the site banner / license header a crawler glued onto every page of a
  * source before the text reaches dedup or training (left in, the banner
  * dominates shingle sets and drags whole sources into one near-dup
  * cluster).
  *
  * Detection is frequency-based and group-local: the dominant k-token
  * prefix of each group (ties to the lexicographically smallest) is
  * declared boilerplate iff it covers ≥ `minCoverMilli`/1000 of the
  * group's documents; matching documents lose those k tokens.
  *
  * Scale posture: one (group, prefix) aggregate over k-token fingerprints
  * (never full text), a per-group rank window PARTITIONED by group, and
  * the chosen-prefix dimension — ≤ one row per group — joins back onto
  * the corpus SIZE-GATED: broadcast while the group count fits
  * `maxBroadcastGroups`, shuffle join above it (sources-as-groups is
  * broadcast-sized; groups-as-URL-prefixes at 100 TB is not, and an
  * unconditional broadcast would OOM the driver there). Text itself only
  * moves in the final narrow strip.
  */
object Boilerplate {

  /** Output: (grp, id, stripped, n_tokens_after).
    *
    * `minSupport` demands FREQUENCY evidence on top of coverage: a
    * single-document group trivially "covers" 100% with its own prefix,
    * and stripping on that evidence mutilates the document — boilerplate
    * is only boilerplate when ≥ `minSupport` documents repeat it.
    *
    * EAGER: calling this method runs two Spark jobs immediately (the
    * group census is localCheckpointed and counted to pick the join
    * strategy before the returned plan is built) — constructing the
    * frame is not free the way composing a lazy transformation is.
    * Callers building plans they may never execute should defer the
    * call itself. */
  def stripCommonPrefix(df: DataFrame, groupCol: Column, idCol: Column,
      textCol: Column, k: Int = 4, minCoverMilli: Long = 600,
      minSupport: Long = 2, maxBroadcastGroups: Long = 1L << 20): DataFrame = {
    require(k >= 1 && minCoverMilli >= 1 && minCoverMilli <= 1000,
      s"need k >= 1 and coverage in (0, 1000], got k=$k cover=$minCoverMilli")
    require(minSupport >= 2,
      s"minSupport must be >= 2 (one doc is never boilerplate evidence)")
    require(maxBroadcastGroups >= 0,
      s"maxBroadcastGroups must be >= 0, got $maxBroadcastGroups")
    val toks = TextFunctions.tokens(textCol)
    val base = df.select(groupCol.as("grp"), idCol.as("id"),
      concat_ws(" ", slice(toks, 1, k)).as("pfx"),
      size(toks).cast("long").as("ntok"))
    val counts = base.groupBy(col("grp"), col("pfx"))
      .agg(count(lit(1)).as("c"))
    // materialized once: the count() below gates the join strategy and the
    // final plan reuses the same frame instead of re-aggregating
    val totals = base.groupBy(col("grp")).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val nGroups = totals.count()
    val w = Window.partitionBy(col("grp")).orderBy(col("c").desc, col("pfx"))
    val chosen = counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .join(totals, "grp")
      .filter(col("c") * 1000 >= col("n") * minCoverMilli &&
        col("c") >= minSupport)
      .select(col("grp"), col("pfx").as("boiler_pfx"))
    // size gate (ADVICE/verdict r9): the chosen dim is ≤ 1 row per group,
    // so GROUP COUNT is its exact size bound — broadcast under the
    // threshold, key-partitioned shuffle join above it
    val chosenDim =
      if (nGroups <= maxBroadcastGroups) broadcast(chosen) else chosen
    base.join(chosenDim, Seq("grp"), "left")
      .withColumn("stripped",
        col("boiler_pfx").isNotNull && col("pfx") === col("boiler_pfx"))
      .select(col("grp"), col("id"), col("stripped"),
        when(col("stripped"), greatest(col("ntok") - k, lit(0L)))
          .otherwise(col("ntok")).as("n_tokens_after"))
  }
}
