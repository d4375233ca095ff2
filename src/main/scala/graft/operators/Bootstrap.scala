package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.TextFunctions

/** Distributed Poisson bootstrap — a confidence interval for a corpus
  * statistic WITHOUT resampling data movement: classical bootstrap draws
  * n rows with replacement B times (unshareable state at 100 TB); the
  * Poisson approximation gives each row an independent Poisson(1)
  * multiplicity per replicate (Chamandy et al., "Estimating Uncertainty
  * for Massive Data Streams", and the standard map-reduce bootstrap),
  * so every replicate is just a weighted aggregation and all B of them
  * run in ONE grouped pass over a bounded ×B fan-out.
  *
  * Weights are DETERMINISTIC in the data: ONE portable md5-derived
  * [[graft.functions.TextFunctions.hash32]] per ROW, scrambled per
  * replicate by a 32-bit integer finisher ([[mix32]] — xorshift-multiply
  * rounds whose products stay under 2^63, so DuckDB BIGINT replays them
  * without HUGEINT), mapped through fixed integer Poisson(1) CDF
  * thresholds (scaled to 2^32, the same literals in the DuckDB oracle).
  * Re-runs, repartitions and engine swaps reproduce the exact replicate
  * means bit-for-bit. One md5 per row — not per (row × replicate): the
  * ×B fan-out carries only integer arithmetic, which cut the stage's CPU
  * ~8× and its first-run JIT-warmup penalty with it (measured rep-1
  * 7.0 s → see PERF.md round 9). The
  * per-replicate mean routes its decimal sum through the string render
  * (correctly-rounded double at any magnitude), and the CI bounds are
  * order statistics of the B sorted means — a bounded collect, no
  * partition-less window.
  */
object Bootstrap {

  /** floor(CDF_Poisson(1)(k) · 2^32) for k = 0..6; hash ≥ last → weight 7
    * (total tail probability 8.3e-5). */
  private val Thresholds = Seq(1580030168L, 3160060337L, 3950075421L,
    4213413783L, 4279248373L, 4292415291L, 4294609777L)

  /** Per-replicate 32-bit scramble of a per-row hash: u ↦
    * finish(u + b·2654435761). The finisher is two xorshift-multiply
    * rounds (lowbias32-family constants chosen < 2^31 so every product of
    * a 32-bit value stays < 2^63 — exact in Spark longs AND DuckDB
    * BIGINT, no unsigned/HUGEINT games). Replayed literally by the
    * oracle SQL; change both together or parity dies. */
  def mix32(u0: Column, b: Column): Column = {
    val mask = lit(0xFFFFFFFFL)
    def mul(x: Column, c: Long) = (x * c).bitwiseAND(mask)
    def xs(x: Column, s: Int) = x.bitwiseXOR(shiftrightunsigned(x, s))
    val seeded = (u0 + b * 2654435761L).bitwiseAND(mask)
    xs(mul(xs(mul(xs(seeded, 16), 2146121005L), 15), 1935781271L), 16)
  }

  /** One-row result (n, b, mean_full, ci_lo, ci_hi): the full-data mean
    * of `valueCol` plus the [loIdx, hiIdx] order-statistic bootstrap CI
    * from `b` Poisson replicates keyed by `keyCol` (defaults: the 2.5%
    * and 97.5% ranks of B = 200).
    *
    * `exactCents = true` (round 18, guide §2.3 "narrower types" on the
    * aggregation buffer — callers whose value is EXACTLY a 2-dp decimal,
    * e.g. a price): the ×B weighted sums first stage w·cents in LONG per
    * (replicate, shuffle partition) — ~B·n BigDecimal buffer adds become
    * long adds, same shuffle volume (each partition holds only its own
    * partition id, so the map-side group count per task stays B) — then
    * the ≤ B·|partitions| partials merge through DECIMAL(38,0) and
    * divide by 100 exactly, reproducing the identical decimal value the
    * old per-row DECIMAL(18,4) sum carried into the string→double
    * render. The long leg's envelope is rows-per-shuffle-partition ×
    * max(w·cents) = 7·10⁸-ish per row — NOT bounded by file-split size
    * (the group is post-repartition), but shuffle-partition counts
    * scale with the cluster (≈2–3× cores), and ANSI sum keeps the leg
    * fail-loud: overflow is an error, never a wrong result. */
  def poissonMeanCi(df: DataFrame, keyCol: Column, valueCol: Column,
      b: Int = 200, loIdx: Int = 5, hiIdx: Int = 196,
      exactCents: Boolean = false): DataFrame = {
    require(b > 0 && loIdx >= 1 && hiIdx <= b && loIdx <= hiIdx,
      s"need 1 <= loIdx <= hiIdx <= b, got b=$b lo=$loIdx hi=$hiIdx")
    val base = df
      .select(keyCol.cast("string").as("__k"), valueCol.as("__v"))
      .filter(col("__v").isNotNull)

    val weight = Thresholds.zipWithIndex.foldRight(lit(7): Column) {
      case ((t, i), rest) => when(col("__u") < t, lit(i)).otherwise(rest)
    }
    // Spread BEFORE the ×B fan-out: the hash/weight work is B× the scan,
    // so its parallelism must come from a repartition of the narrow base,
    // not from the scan's split count (a few-MB input is one split — the
    // whole 12M-row expansion would run in a single task).
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val fanout = base
      .repartition(parts)
      .withColumn("__u0", TextFunctions.hash32(col("__k"))) // BEFORE fan-out
      .select(col("__u0"), col("__v"),
        explode(sequence(lit(0), lit(b - 1))).as("__b"))
      .withColumn("__u", mix32(col("__u0"), col("__b")))
      .withColumn("__w", weight)
      .filter(col("__w") > 0)
    val means =
      if (!exactCents)
        fanout
          .groupBy(col("__b"))
          .agg((sum((col("__w") * col("__v")).cast(DecimalType(18, 4)))
            .cast("string").cast("double") /
            sum(col("__w")).cast("double")).as("mean_b"))
      else
        fanout
          .withColumn("__c",
            (col("__v").cast(DecimalType(18, 2)) * 100).cast("long"))
          .groupBy(col("__b"), spark_partition_id().as("__p"))
          .agg(sum(col("__w") * col("__c")).as("__ps"),
            sum(col("__w")).as("__pw"))
          .groupBy(col("__b"))
          .agg(((sum(col("__ps").cast(DecimalType(38, 0)))
              .cast(DecimalType(38, 2)) / 100)
            .cast("string").cast("double") /
            sum(col("__pw")).cast("double")).as("mean_b"))

    // A replicate whose rows all draw weight 0 vanishes at the groupBy
    // (possible at tiny n; P ≈ 0.37^n per replicate), so the collected
    // means array can hold FEWER than b entries — indexing it at the
    // nominal ranks would misalign the quantiles or run off the end
    // (NULL, or an error under ANSI). The order-statistic ranks are
    // therefore rescaled to the OBSERVED replicate count in pure integer
    // arithmetic — identical to loIdx/hiIdx whenever all b survive —
    // and an empty input yields an explicit NULL CI instead of a bogus
    // element_at.
    val ci = means
      .agg(sort_array(collect_list(col("mean_b"))).as("__ms"),
        count(lit(1)).cast("long").as("b"))
      .select(col("b"),
        when(col("b") > 0, element_at(col("__ms"),
          greatest(lit(1L), expr(s"(${loIdx}L * b) div ${b}L"))
            .cast("int"))).as("ci_lo"),
        when(col("b") > 0, element_at(col("__ms"),
          least(col("b"), expr(s"(${hiIdx}L * b + ${b}L - 1L) div ${b}L"))
            .cast("int"))).as("ci_hi"))

    base.agg(count(lit(1)).as("n"),
        (sum(col("__v").cast(DecimalType(18, 4)))
          .cast("string").cast("double") /
          count(lit(1)).cast("double")).as("mean_full"))
      .crossJoin(broadcast(ci))
      .select(col("n"), col("b"), col("mean_full"), col("ci_lo"),
        col("ci_hi"))
  }
}
