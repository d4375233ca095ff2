package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed two-sample Kolmogorov–Smirnov test — the distribution-drift
  * screen a 100 TB corpus needs when a new ingest batch may have silently
  * shifted a feature (price, document length, quality score) relative to
  * the reference population.
  *
  * D = sup over values v of |F_A(v) − F_B(v)| is computed EXACTLY and in
  * pure integer arithmetic: with i(v) = #{A ≤ v}, j(v) = #{B ≤ v}, the
  * numerator is max |i(v)·m − j(v)·n| over distinct v (n = |A|, m = |B|),
  * and only the closing division to D itself is IEEE — so the statistic
  * carries a bit-exact cross-engine oracle.
  *
  * The prefix counts come from [[Percentiles.globalRanksTieBroken]] — the
  * value-bucketed distributed rank frame — NOT from a partition-less
  * window, so no single task ever sorts the whole sample:
  *
  *  - each element's rank within its own side gives one of (i, j)
  *    directly; the merged rank k gives the other as k − rank;
  *  - merged-order ties break side-B-first, so the LAST element of every
  *    value block (max k per distinct value) sees exactly the classical
  *    tie-aware prefix (i(v), j(v)). Evaluating only at those block ends
  *    is what keeps ties correct: a mid-block prefix (some of a value's
  *    A-elements counted, all of its B-elements) is NOT a KS evaluation
  *    point and can inflate D.
  *
  * The reject decision uses the large-sample critical value
  * c(α)·sqrt((n+m)/(n·m)) with c(0.05) = 1.358 (Smirnov's asymptotic
  * table). sqrt is IEEE-correctly-rounded, so the boolean is also
  * cross-engine stable.
  */
object KsTest {

  /** One-row result: (n_a, n_b, d_num, d, crit, drift) for the two-sample
    * KS test between rows where `sideCol` is true (sample A) and false
    * (sample B). `idCol` must be a per-row unique id — it only breaks
    * rank ties deterministically and never influences the statistic.
    */
  def twoSample(df: DataFrame, sideCol: Column, valueCol: Column,
      idCol: Column): DataFrame = {
    val base = df
      .select(sideCol.cast("int").as("__side"), valueCol.as("__v"),
        idCol.as("__id"))
      .filter(col("__v").isNotNull)

    val counts = base.agg(
      sum(col("__side")).cast("long").as("n_a"),
      (count(lit(1)) - sum(col("__side"))).cast("long").as("n_b"))

    // rank within own side: side A's rank r is i(v) at that element's
    // prefix; side B's is j(v)
    val sideRk = Percentiles
      .globalRanksTieBroken(base, col("__side"), col("__v"), col("__id"))
      .select(col("group").as("__side"), col("value").as("__v"),
        col("tie").as("__id"), col("rank").as("r"))

    // merged rank k over both sides; equal values order side-B (0) before
    // side-A (1) so value-block ends see all of BOTH sides' ≤-v elements
    val mergedRk = Percentiles
      .globalRanksTieBroken(base, lit(0), col("__v"),
        struct(col("__side"), col("__id")))
      .select(col("value").as("__v"), col("tie.__side").as("__side"),
        col("tie.__id").as("__id"), col("rank").as("k"))

    val el = mergedRk.join(sideRk, Seq("__v", "__side", "__id"))
      .crossJoin(broadcast(counts))
      .select(col("__v"), col("k"),
        when(col("__side") === 1, col("r")).otherwise(col("k") - col("r"))
          .as("i"),
        when(col("__side") === 1, col("k") - col("r")).otherwise(col("r"))
          .as("j"),
        col("n_a"), col("n_b"))

    // classical evaluation points only: the max-k element per distinct
    // value carries the tie-aware (i(v), j(v))
    val perValue = el.groupBy(col("__v"))
      .agg(max_by(abs(col("i") * col("n_b") - col("j") * col("n_a")),
        col("k")).as("dv"))

    val nm = (col("n_a") * col("n_b")).cast("double")
    perValue.agg(max(col("dv")).cast("long").as("d_num"))
      .crossJoin(broadcast(counts))
      .select(col("n_a"), col("n_b"), col("d_num"),
        (col("d_num").cast("double") / nm).as("d"),
        (lit(1.358) *
          sqrt((col("n_a") + col("n_b")).cast("double") / nm)).as("crit"))
      .withColumn("drift", col("d") > col("crit"))
  }

  /** Keyed two-sample KS — one test per `keyCol` group, the per-feature /
    * per-slice DRIFT MONITOR form ("which event types shifted between
    * weeks?"). Same integer-exact statistic and the same value-bucketed
    * rank machinery as [[twoSample]], with the key folded into the rank
    * frame's group (so no per-key single-partition window exists even
    * when one key holds most of the corpus — the scale posture that
    * motivated the machinery in the first place).
    *
    * Output: one row per key — (key, n_a, n_b, d_num, d, crit, drift).
    * Keys where either side is empty produce d = NULL via the 0-product
    * guard rather than a division error. */
  def twoSampleByKey(df: DataFrame, keyCol: Column, sideCol: Column,
      valueCol: Column, idCol: Column): DataFrame = {
    val base = df
      .select(keyCol.as("__k"), sideCol.cast("int").as("__side"),
        valueCol.as("__v"), idCol.as("__id"))
      .filter(col("__v").isNotNull)

    val counts = base.groupBy(col("__k")).agg(
      sum(col("__side")).cast("long").as("n_a"),
      (count(lit(1)) - sum(col("__side"))).cast("long").as("n_b"))

    val sideRk = Percentiles
      .globalRanksTieBroken(base, struct(col("__k"), col("__side")),
        col("__v"), col("__id"))
      .select(col("group.__k").as("__k"), col("group.__side").as("__side"),
        col("value").as("__v"), col("tie").as("__id"), col("rank").as("r"))

    val mergedRk = Percentiles
      .globalRanksTieBroken(base, struct(col("__k")), col("__v"),
        struct(col("__side"), col("__id")))
      .select(col("group.__k").as("__k"), col("value").as("__v"),
        col("tie.__side").as("__side"), col("tie.__id").as("__id"),
        col("rank").as("k"))

    val el = mergedRk.join(sideRk, Seq("__k", "__v", "__side", "__id"))
      .join(counts, Seq("__k"))
      .select(col("__k"), col("__v"), col("k"),
        when(col("__side") === 1, col("r")).otherwise(col("k") - col("r"))
          .as("i"),
        when(col("__side") === 1, col("k") - col("r")).otherwise(col("r"))
          .as("j"),
        col("n_a"), col("n_b"))

    val perValue = el.groupBy(col("__k"), col("__v"))
      .agg(max_by(abs(col("i") * col("n_b") - col("j") * col("n_a")),
        col("k")).as("dv"))

    val nm = (col("n_a") * col("n_b")).cast("double")
    perValue.groupBy(col("__k"))
      .agg(max(col("dv")).cast("long").as("d_num"))
      .join(counts, Seq("__k"))
      .select(col("__k").as("key"), col("n_a"), col("n_b"), col("d_num"),
        when(col("n_a") > 0 && col("n_b") > 0,
          col("d_num").cast("double") / nm).as("d"),
        when(col("n_a") > 0 && col("n_b") > 0, lit(1.358) *
          sqrt((col("n_a") + col("n_b")).cast("double") / nm)).as("crit"))
      .withColumn("drift", col("d") > col("crit"))
  }
}
