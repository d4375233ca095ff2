package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.RangeBuckets
import graft.sources.Tables

/** Round-12 tranche 5: robust trend and anomaly screening — Theil-Sen
  * (the median-of-pairwise-slopes robust regression, the estimator
  * behind `q_trend_mk`'s Mann-Kendall direction), Grubbs' test (is the
  * single most extreme order value a statistical outlier?), and the
  * Wald-Wolfowitz runs test (are the daily revenues' above/below-median
  * labels random in time, or trending/oscillating?).
  *
  * Determinism discipline: exact-integer staging throughout — pairwise
  * slopes and medians in micro-units via signed exact division (Spark
  * `div` ≡ DuckDB HUGEINT/BIGINT `//`, both trunc-toward-zero, probed
  * §2.15), medians as LOWER medians off [[RangeBuckets.belowFrame]]
  * censuses, closing doubles only over < 2⁵³ exact cells.
  *
  * Scale posture: Theil-Sen fixes a 365-day readout window (a robust
  * trend is a bounded-recency statistic — the pair set is ≤ 365²/2
  * REGARDLESS of corpus size, after one day-keyed corpus aggregate);
  * Grubbs is two corpus aggregates (moments, then deviations against
  * the broadcast 1-row cells); the runs fold collects one
  * calendar-bounded array under the [[Parity.guardedSpanValue]] loud
  * span guard.
  *
  * Degenerate-input stance (documented, unreachable at gate scales): a
  * single-day window (`q_theil_sen`: zero pairs → NULL-row vs NULL-row,
  * which happens to agree) and a single-order corpus (`q_grubbs`:
  * (n − 1) divisor) sit in the same Spark-NULL-vs-DuckDB-error class as
  * the r11 `q_conformal` precedent. `q_theil_sen`'s intercept staging
  * (cents·10⁶) overflows its BIGINT cast once daily revenue passes
  * ~9·10¹² cents — Spark nulls, DuckDB errors: loud either way, and the
  * envelope is documented here rather than silently widened.
  */
object StatOps8 extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  private val DayUs = 86400000000L

  /** Daily revenue cents of the lineitem corpus (one keyed aggregate). */
  private def dailyCents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(expr(s"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div $DayUs")
        .as("day"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("cents"))

  /** Runs-test closing formula over the exact (np, nm, runs) cells:
    * z = (R − μ)/σ with μ = 2·np·nm/(np+nm) + 1 and
    * σ² = 2·np·nm·(2·np·nm − np − nm) / ((np+nm)²·(np+nm−1)).
    * np, nm ≤ the day span, so every double cast is exact. */
  private val runsMu =
    "(2.0 * n_plus * n_minus / (CAST(n_plus AS DOUBLE) + n_minus) + 1.0)"
  private val runsSig2 =
    """(2.0 * n_plus * n_minus
      | * (2.0 * n_plus * n_minus - n_plus - n_minus)
      | / ((CAST(n_plus AS DOUBLE) + n_minus)
      |    * (CAST(n_plus AS DOUBLE) + n_minus)
      |    * (CAST(n_plus AS DOUBLE) + n_minus - 1.0)))"""
      .stripMargin.replaceAll("\\s+", " ")
  private val runsZ =
    s"((CAST(n_runs AS DOUBLE) - $runsMu) / sqrt($runsSig2))"

  /** Grubbs closing: G = (max|x − x̄| in micro-cents)/10⁶ over the
    * sample SD from the truncated-exact variance (both cells < 2⁵³). */
  private val grubbsG =
    "((CAST(dev_micro AS DOUBLE) / 1000000.0) / sqrt(CAST(s2_c2 AS DOUBLE)))"

  override def defs: Map[String, Q] = Map[String, Q](

    // Theil-Sen robust slope of daily revenue over the LAST 365 days:
    // slope = lower median of the ≤ 365²/2 pairwise slopes
    // ⌊10⁶·(y_j − y_i)/(day_j − day_i)⌋ (micro-cents/day, signed exact
    // division), intercept = lower median of ⌊10⁶·y_i⌋ − slope·day_i at
    // that slope. The pair join is a bounded broadcast range join (the
    // window caps it at 66k pairs at ANY corpus size); both medians run
    // through the RangeBuckets census — no global sort anywhere. The
    // breakdown point is 29% of days: the robust alternative to the OLS
    // q_rolling_slope.
    "q_theil_sen" -> ((s, dir) => {
      val d0 = dailyCents(s, dir)
      val mx = d0.agg(max(col("day")).as("mxd"))
      // localCheckpoint (the BasketGraph semi-eager precedent): the
      // ≤365-row window frame is consumed FOUR ways (both pair-join
      // sides, the intercept census, the bounds) — without it each
      // branch re-runs the corpus day-keyed aggregate, and the measured
      // cost was ~5s of repeated lineitem scans at sf0.1.
      // Round 18 (optimization, guide §2.4): n_days = |d| and n_pairs =
      // C(|d|, 2) EXACTLY (d holds one row per distinct day; the pair
      // join takes every ordered day pair), so both medians' rank
      // thresholds ride the checkpoint's materialization as ONE
      // Observation count instead of two sequential broadcast-subquery
      // jobs (np, nd) on the action's critical path — the published
      // cells keep the old empty-input NULL shape via the guards below.
      val obsD = org.apache.spark.sql.Observation()
      val d = d0.crossJoin(broadcast(mx))
        .filter(col("day") > col("mxd") - 365)
        .select(col("day"), col("cents"))
        .observe(obsD, count(lit(1)).as("nd"))
        .localCheckpoint()
      val ndv = obsD.get("nd").asInstanceOf[Long]
      val npv = ndv * (ndv - 1) / 2
      val pairs = d.as("i").join(broadcast(d.as("j")),
          col("j.day") > col("i.day"))
        .select(expr("""CAST((1000000 * (CAST(j.cents AS DECIMAL(38,0))
          | - i.cents)) div (j.day - i.day) AS BIGINT)"""
          .stripMargin.replaceAll("\\s+", " ")).as("v"))
      // (the slope census needs no checkpoint of its own: a same-session
      // A/B showed exchange reuse already dedups its belowFrame fan-out
      // once the window frame above is a leaf — 2.54 vs 2.74 s mins)
      val census = pairs.groupBy(col("v")).agg(count(lit(1)).as("t"))
      val slope = RangeBuckets.belowFrame(census)
        .filter(col("below") + col("t") >= lit((npv + 1) / 2))
        .agg(min(col("v")).as("slope_micro"))
      val icensus = d.crossJoin(broadcast(slope))
        .select((col("cents").cast(DecimalType(38, 0)) * 1000000
          - col("slope_micro").cast(DecimalType(38, 0)) * col("day"))
          .cast("long").as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("t"))
      val icept = RangeBuckets.belowFrame(icensus)
        .filter(col("below") + col("t") >= lit((ndv + 1) / 2))
        .agg(min(col("v")).as("intercept_micro"))
      // Published cells in MILLI-cents (div 10³, trunc-toward-zero on
      // both engines — the signed-div discipline the truncation spec
      // pins): intercept_micro ≈ 10⁶·daily-revenue grows ∝ corpus and
      // sat at 0.94·2⁵³ at the sf1 probe. The medians above keep full
      // micro resolution; only the emitted unit changes (round 14).
      // The n_days/n_pairs cells stay NULL exactly where the old
      // sum-over-empty-census subqueries produced NULL (|d| = 0 resp.
      // |d| ≤ 1) — same values on every input.
      broadcast(slope).crossJoin(broadcast(icept))
        .select(
          (if (ndv == 0L) lit(null).cast("long") else lit(ndv))
            .as("n_days"),
          (if (ndv <= 1L) lit(null).cast("long") else lit(npv))
            .as("n_pairs"),
          expr("slope_micro div 1000").as("slope_milli"),
          expr("intercept_micro div 1000").as("intercept_milli"))
    }),

    // Grubbs' max-deviation outlier test on order values: G =
    // max|x − x̄|/s. Pass 1 aggregates the exact cells (n, Σx, Σx² →
    // truncated-exact variance); pass 2 scans deviations |x·n − Σx|
    // against the broadcast 1-row cells, taking the max as a LEXICAL
    // struct max so the reported outlier value is deterministic under
    // deviation ties. dev stays exact DECIMAL until the micro-cent
    // division; the closing double sees only < 2⁵³ cells. Envelope:
    // |x·n − s| ≤ 2·n·max|x| ~ 10⁸·n → exact to n ≈ 10¹⁰ rows.
    "q_grubbs" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("x"))
      val cells = o.agg(count(lit(1)).as("n"),
          sum(col("x").cast(DecimalType(38, 0))).as("s"),
          sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("q"))
        .select(col("n"), col("s"),
          expr("""CAST((q - (s * s - (s * s) % CAST(n AS DECIMAL(38,0)))
            | / CAST(n AS DECIMAL(38,0))) div (n - 1) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("s2_c2"))
      // (dev, x) packs into ONE lexicographic DECIMAL key dev·10¹⁰ + x
      // (x < 10¹⁰ cents by fixture envelope) because a composite argmax
      // has no shared surface: Spark's struct max has no DuckDB twin
      // (max_by rejects list keys, struct MIN/MAX ordering is its own),
      // while integer packing is exact arithmetic on both.
      o.crossJoin(broadcast(cells))
        .select(col("n"), col("s2_c2"),
          (abs(col("x").cast(DecimalType(38, 0)) * col("n") - col("s"))
            * 10000000000L + col("x")).as("key"))
        .groupBy(col("n"), col("s2_c2"))
        .agg(max(col("key")).as("mx"))
        .select(col("n").as("n_orders"),
          expr("CAST(mx % 10000000000 AS BIGINT)").as("outlier_cents"),
          expr("""CAST((1000000 * ((mx - mx % 10000000000)
            | / 10000000000)) div n AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("dev_micro"),
          col("s2_c2"))
        .select(col("n_orders"), col("outlier_cents"), col("dev_micro"),
          col("s2_c2"), round(expr(grubbsG), 6).as("g"))
    }),

    // Wald-Wolfowitz runs test on daily revenue: the CLASSICAL
    // above/below-median labeling (below-or-equal → −, strictly above →
    // +), under which the labels are exchangeable under the i.i.d. null
    // and z is honestly ~N(0,1). (The first cut labeled day-over-day
    // DIFFERENCE signs — exactly computed, but consecutive deltas share
    // a middle term, so an i.i.d. series is anti-persistent there and
    // the WW normal approximation reads z ≈ +17 on pure noise; the spec
    // band caught it.) Median and runs both come off ONE collected
    // calendar-bounded (day, cents) array — the Holt staging,
    // span-guarded loudly; the closing z sees three exact small cells.
    // Too few runs ⇒ level shifts/trend; too many ⇒ oscillation.
    "q_runs_test" -> ((s, dir) => {
      val d = dailyCents(s, dir)
      val b = d.agg(min(col("day")).as("mn"), max(col("day")).as("mx"),
          count(lit(1)).as("nd"))
        .select(Parity.guardedSpanValue(col("nd"),
          col("mx") - col("mn") + 1, Parity.MaxSpanCells,
          "q_runs_test daily series").as("n_days"))
      d.agg(collect_list(struct(col("day"), col("cents"))).as("arr"))
        .crossJoin(broadcast(b))
        .select(col("n_days"),
          expr("""element_at(array_sort(transform(arr, e -> e.cents)),
            | CAST((size(arr) + 1) div 2 AS INT))"""
            .stripMargin.replaceAll("\\s+", " ")).as("med"),
          col("arr"))
        .select(col("n_days"), col("med"), expr(
          """aggregate(
            |  array_sort(arr),
            |  named_struct('sgn', 0L, 'np', 0L, 'nm', 0L, 'runs', 0L),
            |  (acc, e) -> IF(e.cents > med,
            |    named_struct('sgn', 1L, 'np', acc.np + 1, 'nm', acc.nm,
            |      'runs', acc.runs + IF(acc.sgn = 1, 0, 1)),
            |    named_struct('sgn', -1L, 'np', acc.np, 'nm', acc.nm + 1,
            |      'runs', acc.runs + IF(acc.sgn = -1, 0, 1))))"""
            .stripMargin).as("st"))
        .select(col("n_days"), col("med").as("median_cents"),
          col("st.np").as("n_plus"), col("st.nm").as("n_minus"),
          col("st.runs").as("n_runs"))
        .select(col("n_days"), col("median_cents"), col("n_plus"),
          col("n_minus"), col("n_runs"), round(expr(runsZ), 6).as("z"))
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_theil_sen" ->
      s"""WITH d0 AS (
         |  SELECT epoch_us(CAST(l_shipdate AS TIMESTAMP)) // $DayUs
         |      AS day,
         |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS cents
         |  FROM lineitem GROUP BY 1),
         |d AS (SELECT day, cents FROM d0
         |  WHERE day > (SELECT MAX(day) FROM d0) - 365),
         |pairs AS (
         |  SELECT CAST((1000000 * (CAST(j.cents AS HUGEINT) - i.cents))
         |    // (j.day - i.day) AS BIGINT) AS v
         |  FROM d i JOIN d j ON j.day > i.day),
         |pc AS (SELECT v, COUNT(*) AS t FROM pairs GROUP BY 1),
         |pcum AS (
         |  SELECT v, SUM(t) OVER (ORDER BY v) AS cum,
         |    SUM(t) OVER () AS n FROM pc),
         |slope AS (SELECT MIN(v) AS slope_micro, MAX(n) AS n_pairs
         |  FROM pcum WHERE cum >= (n + 1) // 2),
         |ic AS (
         |  SELECT CAST(CAST(cents AS HUGEINT) * 1000000
         |      - CAST(slope.slope_micro AS HUGEINT) * day AS BIGINT) AS v
         |  FROM d, slope),
         |icc AS (SELECT v, COUNT(*) AS t FROM ic GROUP BY 1),
         |icum AS (
         |  SELECT v, SUM(t) OVER (ORDER BY v) AS cum,
         |    SUM(t) OVER () AS n FROM icc),
         |icept AS (SELECT MIN(v) AS intercept_micro, MAX(n) AS n_days
         |  FROM icum WHERE cum >= (n + 1) // 2)
         |SELECT CAST(icept.n_days AS BIGINT) AS n_days,
         |  CAST(slope.n_pairs AS BIGINT) AS n_pairs,
         |  CAST(slope.slope_micro // 1000 AS BIGINT) AS slope_milli,
         |  CAST(icept.intercept_micro // 1000 AS BIGINT)
         |    AS intercept_milli
         |FROM slope, icept""".stripMargin,

    "q_grubbs" ->
      s"""WITH o AS (
         |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |    AS BIGINT) AS x
         |  FROM orders),
         |cells AS (
         |  SELECT COUNT(*) AS n, SUM(CAST(x AS HUGEINT)) AS s,
         |    CAST((SUM(CAST(x AS HUGEINT) * x)
         |        - (SUM(CAST(x AS HUGEINT)) * SUM(CAST(x AS HUGEINT)))
         |          // COUNT(*))
         |      // (COUNT(*) - 1) AS BIGINT) AS s2_c2
         |  FROM o),
         |dev AS (
         |  SELECT cells.n, cells.s2_c2,
         |    ABS(CAST(x AS HUGEINT) * cells.n - cells.s)
         |      * 10000000000 + x AS key
         |  FROM o, cells),
         |mx AS (
         |  SELECT CAST(MAX(n) AS BIGINT) AS n_orders,
         |    MAX(s2_c2) AS s2_c2, MAX(key) AS mx
         |  FROM dev)
         |SELECT n_orders,
         |  CAST(mx % 10000000000 AS BIGINT) AS outlier_cents,
         |  dev_micro, s2_c2, round($grubbsG, 6) AS g
         |FROM (SELECT *, CAST((1000000 * (mx // 10000000000))
         |    // n_orders AS BIGINT) AS dev_micro
         |  FROM mx)""".stripMargin,

    "q_runs_test" ->
      s"""WITH d AS (
         |  SELECT epoch_us(CAST(l_shipdate AS TIMESTAMP)) // $DayUs
         |      AS day,
         |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS cents
         |  FROM lineitem GROUP BY 1),
         |nd AS (SELECT COUNT(*) AS n_days FROM d),
         |medc AS (
         |  SELECT MIN(cents) AS med FROM (
         |    SELECT cents, SUM(1) OVER (ORDER BY cents
         |      ROWS UNBOUNDED PRECEDING) AS cum, nd.n_days AS n
         |    FROM d, nd)
         |  WHERE cum >= (n + 1) // 2),
         |signs AS (
         |  SELECT day, CASE WHEN cents > medc.med THEN 1 ELSE -1 END
         |    AS sgn
         |  FROM d, medc),
         |runs AS (
         |  SELECT
         |    SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS n_plus,
         |    SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS n_minus,
         |    1 + SUM(CASE WHEN prev IS NOT NULL AND sgn <> prev
         |      THEN 1 ELSE 0 END) AS n_runs
         |  FROM (SELECT sgn, LAG(sgn) OVER (ORDER BY day) AS prev
         |        FROM signs))
         |SELECT CAST(nd.n_days AS BIGINT) AS n_days,
         |  CAST(medc.med AS BIGINT) AS median_cents,
         |  CAST(n_plus AS BIGINT) AS n_plus,
         |  CAST(n_minus AS BIGINT) AS n_minus,
         |  CAST(n_runs AS BIGINT) AS n_runs,
         |  round($runsZ, 6) AS z
         |FROM runs, nd, medc""".stripMargin
  )
}
