package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash32

/** Deterministic, reproducible sampling — the corpus-subsetting op every
  * training-data pipeline runs ("take 10% of the crawl", "cap English at
  * half, oversample low-resource languages").
  *
  * `df.sample()` is the wrong tool for that job at 100 TB: it is seeded
  * per-PARTITION, so adding one input file, repartitioning, or a speculative
  * re-execution changes which rows survive — the sample is not a function
  * of the data. A hash gate IS: a row is kept iff the portable 32-bit hash
  * ([[graft.plans.Hash32Expr]], first 4 md5 bytes — NOT engine-native
  * `hash()`) of its stable key lands under `rate` of the hash space. Same
  * key → same verdict on any cluster, any partitioning, any engine that
  * can compute md5 (the DuckDB oracle does, in SQL) — and membership is
  * consistent across tables keyed by the same id, so a sampled `documents`
  * slice automatically aligns with its `embeddings` rows.
  *
  * Scale shape: a narrow codegen'd filter fused into the scan — no
  * shuffle, no driver state, prunes before anything downstream.
  */
object Sampling {

  private val HashSpace = 1L << 32

  private def gate(keyCol: Column, rate: Column): Column =
    hash32(keyCol.cast("string")) < (rate * HashSpace).cast("long")

  /** Keep rows whose hashed `keyCol` falls in the first `rate` fraction of
    * the hash space (`rate` in [0, 1]; 0 keeps none, 1 keeps all).
    * Deterministic in the DATA: re-runs, repartitions and engine swaps
    * reproduce the exact member set. Nested rates compose: the `rate=0.1`
    * sample is a subset of the `rate=0.5` sample over the same key. */
  def hashSample(df: DataFrame, keyCol: Column, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must lie in [0, 1], got $rate")
    df.filter(gate(keyCol, lit(rate)))
  }

  /** Per-stratum rates ("en" → 0.5, "de" → 0.2, anything else →
    * `defaultRate`): one pass, one codegen'd CASE over the stratum column,
    * same deterministic hash gate per row. */
  def stratifiedHashSample(df: DataFrame, keyCol: Column, stratumCol: Column,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0 && r <= 1, s"rates must lie in [0, 1], got $r"))
    val rateCol = rates.foldLeft(lit(defaultRate)) {
      case (acc, (stratum, r)) => when(stratumCol === stratum, r).otherwise(acc)
    }
    df.filter(gate(keyCol, rateCol))
  }

  /** Temperature-rebalanced stratum mix at α = 1/2 (the published
    * multilingual-corpus recipe: sample stratum l with probability
    * ∝ n_l^α, α < 1 upweighting low-resource strata — XLM-R/mT5 style),
    * targeting ~`targetRows` total rows. Rates come FROM the data, so the
    * whole chain must be reproducible across engines — float `pow` is not
    * (libm vs JVM differ in the last ulp, and one ulp at a gate threshold
    * flips membership), so the rate is DEFINED in integer arithmetic with
    * sqrt the single float op (IEEE-correctly-rounded everywhere):
    *
    *   w_l      = floor(2^18 · sqrt(n_l))            — integer weight
    *   rate20_l = min(2^20, (2^20·w_l·T) div (Σw·n_l)) — 20-bit keep rate
    *   keep row ⇔ hash32(key) >> 12  <  rate20_l
    *
    * (expected kept per stratum = n_l·rate = T·w_l/Σw.) The rate products
    * route through DECIMAL(38,0) — exact far past 64-bit, so corpus-scale
    * n_l·T cannot overflow — and the per-stratum table is a broadcast
    * dimension over the same narrow hash gate as [[hashSample]]: one
    * count pass, one gated scan, no corpus shuffle. The DuckDB oracle
    * replays the identical integer chain (HUGEINT division). */
  def temperatureHalfSample(df: DataFrame, keyCol: Column, stratumCol: Column,
      targetRows: Long): DataFrame = {
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    val counts = df.groupBy(stratumCol.as("__stratum"))
      .agg(count(lit(1)).as("__n"))
    val weighted = counts.select(col("__stratum"), col("__n"),
      floor(sqrt(col("__n").cast("double")) * (1L << 18)).cast("long").as("__w"))
    def dec(e: String) = s"CAST($e AS DECIMAL(38,0))"
    val rates = weighted
      .crossJoin(broadcast(weighted.agg(sum(col("__w")).as("__sw"))))
      .selectExpr("__stratum",
        s"""least(CAST(${1L << 20} AS BIGINT),
           |  CAST((${dec((1L << 20).toString)} * ${dec("__w")} * ${dec(targetRows.toString)})
           |    DIV (${dec("__sw")} * ${dec("__n")}) AS BIGINT)) AS __rate20""".stripMargin)
    df.join(broadcast(rates), stratumCol === col("__stratum"))
      .filter(shiftrightunsigned(hash32(keyCol.cast("string")), 12) < col("__rate20"))
      .drop("__stratum", "__rate20")
  }

  /** πps (probability-proportional-to-size) Poisson sampling targeting
    * ~`targetRows` kept rows: each row keeps with probability
    * min(1, w·T/Σw) — importance sampling by token count is the
    * training-mix use. Same determinism contract as every gate here:
    * the keep rate is DEFINED in integer arithmetic (20-bit rate,
    * DECIMAL(38,0) products so corpus-scale w·T cannot overflow) and
    * the membership test is the portable hash — re-runs, repartitions
    * and engine swaps reproduce the exact member set. One weight-sum
    * pass (a broadcast scalar), then one gated narrow scan.
    *
    * Rows with NULL or non-positive weight are EXCLUDED up front (the
    * [[WeightedPercentiles]] convention): without the filter a NULL
    * weight would null the rate product and `least()` — which skips
    * NULLs — would hand the row the full 2^20 rate, silently keeping
    * every unweighted row; and a degenerate Σw ≤ 0 would do the same
    * corpus-wide. */
  def weightedSample(df: DataFrame, keyCol: Column, weightCol: Column,
      targetRows: Long): DataFrame = {
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    def dec(e: String) = s"CAST($e AS DECIMAL(38,0))"
    val base = df.withColumn("__pw", weightCol.cast("long"))
      .filter(col("__pw") > 0)
    val sw = base.agg(sum(col("__pw")).as("__sw"))
    base.crossJoin(broadcast(sw))
      .withColumn("__rate20",
        expr(s"""least(CAST(${1L << 20} AS BIGINT),
                |  CAST((${dec((1L << 20).toString)} * ${dec("__pw")}
                |    * ${dec(targetRows.toString)})
                |    DIV ${dec("__sw")} AS BIGINT))""".stripMargin))
      .filter(shiftrightunsigned(hash32(keyCol.cast("string")), 12) <
        col("__rate20"))
      .drop("__pw", "__sw", "__rate20")
  }
}
