package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Round-12 tranche 6: signal-relationship and process-quality readouts —
  * lead-lag cross-correlation (does activity LEAD value, or follow it?),
  * the Cpk process-capability index (is the event-value process inside
  * its declared spec limits with margin?), and the DKW simultaneous
  * ECDF confidence band (how well is the value distribution itself
  * pinned down at this sample size?).
  *
  * Determinism discipline: per-lag / per-threshold cells are exact
  * integers (counts and milli-unit sums — milli, not micro, so the
  * variance cells stay < 2⁵³ and cast exactly to double on both
  * engines); the signed correlation closes as ONE exact integer division
  * sign(cov)·⌊10⁶·cov²/(varx·vary)⌋ entirely in DECIMAL(38,0) — no
  * double ever sees the 10³⁰-magnitude intermediates (the `q_anova_f`
  * HUGEINT→DOUBLE lesson); Cpk and the DKW ε close over < 2⁵³ cells
  * with shared formula text.
  *
  * Scale posture: one day-keyed corpus aggregate each; the lag join is
  * calendar-bounded (|days|·|lags| rows regardless of corpus size); the
  * ECDF thresholds are a fixed 10-cell grid folded into one conditional
  * aggregate (a single corpus pass, no join at all).
  *
  * Degenerate-input stance (documented, unreachable at gate scales): a
  * CONSTANT daily series makes `q_xcorr_leadlag`'s varx·vary zero
  * (Spark decimal division → NULL, DuckDB HUGEINT `//` → error), and a
  * single-event corpus breaks `q_cpk`'s (n − 1) divisor the same way;
  * lags with < 3 paired days are instead dropped explicitly on BOTH
  * engines (the `filter(n >= 3)` / `HAVING COUNT(*) >= 3` pair).
  */
object StatOps9 extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  private val DayUs = 86400000000L

  /** Cpk closing: min(USL − μ, μ − LSL)/(3σ) over exact milli cells,
    * everything converted to VALUE units (USL = 500.0, LSL = 0.0 —
    * the first cut left the USL in milli against a unit-scaled μ, which
    * parity cannot catch because both engines share the text; the
    * spec's scalar replay did). */
  private val cpkExpr =
    """(least(500.0 - CAST(mu_milli AS DOUBLE) / 1000.0,
      |       CAST(mu_milli AS DOUBLE) / 1000.0 - 0.0)
      | / (3.0 * sqrt(CAST(s2_milli2 AS DOUBLE)) / 1000.0))"""
      .stripMargin.replaceAll("\\s+", " ")

  /** DKW 95% simultaneous half-width: ε = √(ln(2/α)/(2n)), α = 0.05. */
  private val dkwEps = "(sqrt(ln(40.0) / (2.0 * n_events)))"

  override def defs: Map[String, Q] = Map[String, Q](

    // Lead-lag cross-correlation between daily event COUNT (activity)
    // and daily event VALUE mass, at lags −7..+7: corr(x_day, y_day+lag).
    // Positive-lag peaks mean activity LEADS value. One day-keyed corpus
    // aggregate; the lag pairing is a broadcast join over the
    // calendar-bounded daily frame (|days|·15 rows at ANY corpus size);
    // per-lag cells (n, Σx, Σy, Σxy, Σx², Σy²) are exact
    // counts/milli-sums, and the signed correlation closes as
    // sign(cov)·⌊10⁶·cov²/(varx·vary)⌋ in pure DECIMAL(38,0) integer
    // arithmetic — reported as signed_r2_ppm (the SQUARED correlation
    // carrying cov's sign), which avoids any cross-engine sqrt over
    // >2⁵³ cells. Lags with < 3 paired days are dropped on both engines.
    // DECIMAL envelope: cov² ≤ (|days|²·max_daily_xy)² — holds while
    // daily milli-value mass stays ≤ ~10¹⁴ (documented; ~10⁸ at sf0.1).
    "q_xcorr_leadlag" -> ((s, dir) => {
      val d = t(s, dir, "events").filter(col("value").isNotNull)
        .select(expr(s"unix_micros(ts) div $DayUs").as("day"),
          (col("value").cast(DecimalType(18, 6)) * 1000)
            .cast("long").as("vm"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("x"), sum(col("vm")).as("y"))
        .localCheckpoint()
      val lags = d.sparkSession.range(-7, 8).select(col("id").as("lag"))
      val pairs = d.as("a").crossJoin(broadcast(lags))
        .join(broadcast(d.as("b")),
          col("b.day") === col("a.day") + col("lag"))
        .select(col("lag"), col("a.x").as("x"), col("b.y").as("y"))
      pairs.groupBy(col("lag"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(DecimalType(38, 0))).as("sx"),
          sum(col("y").cast(DecimalType(38, 0))).as("sy"),
          sum(col("x").cast(DecimalType(38, 0)) * col("y")).as("sxy"),
          sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("sxx"),
          sum(col("y").cast(DecimalType(38, 0)) * col("y")).as("syy"))
        .filter(col("n") >= 3)
        .select(col("lag"), col("n").as("n_days"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("cov"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("varx"),
          (col("n") * col("syy") - col("sy") * col("sy")).as("vary"))
        .select(col("lag"), col("n_days"),
          expr("""CAST(CASE WHEN cov < 0 THEN -((1000000 * cov * cov)
            |  div (varx * vary))
            | ELSE (1000000 * cov * cov) div (varx * vary) END
            | AS BIGINT)""".stripMargin.replaceAll("\\s+", " "))
            .as("signed_r2_ppm"))
        .orderBy(col("lag"))
    }),

    // Cpk process-capability of the event value against its DECLARED
    // spec band [0, 500): the SPC acceptance readout (Cpk ≥ 1.33 =
    // capable). Exact milli cells in ONE corpus aggregate (count, Σx,
    // Σx² → truncated-exact variance, exact-division mean), ppm outside
    // the limits as exact integer division, Cpk as the closing double
    // over the two < 2⁵³ cells.
    "q_cpk" -> ((s, dir) =>
      t(s, dir, "events").filter(col("value").isNotNull)
        .select((col("value").cast(DecimalType(18, 6)) * 1000)
          .cast("long").as("x"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(DecimalType(38, 0))).as("s"),
          sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("q"),
          sum(when(col("x") < 0 || col("x") >= 500000, 1L).otherwise(0L))
            .as("n_out"))
        .select(col("n").as("n_events"),
          expr("s div n").as("mu_milli"),
          expr("""CAST((q - (s * s - (s * s) % CAST(n AS DECIMAL(38,0)))
            | / CAST(n AS DECIMAL(38,0))) div (n - 1) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("s2_milli2"),
          expr("(1000000 * n_out) div n").as("out_ppm"))
        .select(col("n_events"), col("mu_milli"), col("s2_milli2"),
          col("out_ppm"), round(expr(cpkExpr), 6).as("cpk"))),

    // DKW 95% simultaneous confidence band for the event-value ECDF at
    // the 10 fixed thresholds 50·k: a single conditional corpus
    // aggregate (ten ≤-counts — no join, no census), the band
    // F̂(t) ± √(ln(2/α)/2n) clamped to [0, 10⁶] ppm. The readout a
    // sampling-based pipeline uses to decide whether n is big enough to
    // trust the distribution shape it just measured.
    "q_ecdf_band" -> ((s, dir) => {
      val e = t(s, dir, "events").filter(col("value").isNotNull)
        .select((col("value").cast(DecimalType(18, 6)) * 1000)
          .cast("long").as("x"))
      val aggs = count(lit(1)).as("n_events") +: (1 to 10).map(k =>
        sum(when(col("x") <= k * 50000L, 1L).otherwise(0L)).as(s"c$k"))
      val cells = e.agg(aggs.head, aggs.tail: _*)
      val grid = e.sparkSession.range(1, 11).select(col("id").as("k"))
      grid.crossJoin(broadcast(cells))
        .select(col("k"), (col("k") * 50000L).as("thr_milli"),
          col("n_events"),
          expr("""CAST(element_at(array(c1, c2, c3, c4, c5, c6, c7, c8,
            | c9, c10), CAST(k AS INT)) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("n_le"))
        .select(col("k"), col("thr_milli"), col("n_events"), col("n_le"),
          expr("(1000000 * n_le) div n_events").as("ecdf_ppm"))
        .select(col("k"), col("thr_milli"), col("n_le"), col("ecdf_ppm"),
          greatest(round(col("ecdf_ppm") - expr(dkwEps) * 1000000, 0),
            lit(0.0)).cast("long").as("lo_ppm"),
          least(round(col("ecdf_ppm") + expr(dkwEps) * 1000000, 0),
            lit(1000000.0)).cast("long").as("hi_ppm"),
          col("n_events"))
        .orderBy(col("k"))
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_xcorr_leadlag" ->
      s"""WITH d AS (
         |  SELECT epoch_us(ts) // $DayUs AS day, COUNT(*) AS x,
         |    SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000 AS BIGINT))
         |      AS y
         |  FROM events WHERE value IS NOT NULL GROUP BY 1),
         |lags AS (SELECT g.lag FROM
         |  unnest(generate_series(-7, 7)) AS g(lag)),
         |pairs AS (
         |  SELECT lags.lag, a.x, b.y
         |  FROM d a, lags
         |  JOIN d b ON b.day = a.day + lags.lag),
         |cells AS (
         |  SELECT lag, COUNT(*) AS n,
         |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
         |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
         |    SUM(CAST(y AS HUGEINT) * y) AS syy
         |  FROM pairs GROUP BY 1 HAVING COUNT(*) >= 3),
         |mom AS (
         |  SELECT lag, n, n * sxy - sx * sy AS cov,
         |    n * sxx - sx * sx AS varx, n * syy - sy * sy AS vary
         |  FROM cells)
         |SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_days,
         |  CAST(CASE WHEN cov < 0
         |    THEN -((1000000 * cov * cov) // (varx * vary))
         |    ELSE (1000000 * cov * cov) // (varx * vary) END
         |    AS BIGINT) AS signed_r2_ppm
         |FROM mom ORDER BY lag""".stripMargin,

    "q_cpk" ->
      s"""WITH cells AS (
         |  SELECT COUNT(*) AS n,
         |    SUM(CAST(CAST(CAST(value AS DECIMAL(18,6)) * 1000 AS BIGINT)
         |      AS HUGEINT)) AS s,
         |    SUM(CAST(CAST(CAST(value AS DECIMAL(18,6)) * 1000 AS BIGINT)
         |        AS HUGEINT)
         |      * CAST(CAST(value AS DECIMAL(18,6)) * 1000 AS BIGINT))
         |      AS q,
         |    SUM(CASE WHEN CAST(CAST(value AS DECIMAL(18,6)) * 1000
         |        AS BIGINT) < 0
         |      OR CAST(CAST(value AS DECIMAL(18,6)) * 1000 AS BIGINT)
         |        >= 500000 THEN 1 ELSE 0 END) AS n_out
         |  FROM events WHERE value IS NOT NULL),
         |stage AS (
         |  SELECT CAST(n AS BIGINT) AS n_events,
         |    CAST(s // CAST(n AS HUGEINT) AS BIGINT) AS mu_milli,
         |    CAST((q - (s * s) // CAST(n AS HUGEINT))
         |      // CAST(n - 1 AS HUGEINT) AS BIGINT) AS s2_milli2,
         |    CAST((1000000 * n_out) // n AS BIGINT) AS out_ppm
         |  FROM cells)
         |SELECT n_events, mu_milli, s2_milli2, out_ppm,
         |  round($cpkExpr, 6) AS cpk
         |FROM stage""".stripMargin,

    "q_ecdf_band" ->
      s"""WITH e AS (
         |  SELECT CAST(CAST(value AS DECIMAL(18,6)) * 1000 AS BIGINT)
         |    AS x
         |  FROM events WHERE value IS NOT NULL),
         |grid AS (SELECT g.k FROM unnest(generate_series(1, 10)) AS g(k)),
         |cells AS (
         |  SELECT grid.k, grid.k * 50000 AS thr_milli,
         |    (SELECT COUNT(*) FROM e) AS n_events,
         |    (SELECT COUNT(*) FROM e WHERE e.x <= grid.k * 50000)
         |      AS n_le
         |  FROM grid),
         |stage AS (
         |  SELECT CAST(k AS BIGINT) AS k,
         |    CAST(thr_milli AS BIGINT) AS thr_milli,
         |    CAST(n_le AS BIGINT) AS n_le,
         |    CAST(n_events AS BIGINT) AS n_events,
         |    CAST((1000000 * n_le) // n_events AS BIGINT) AS ecdf_ppm
         |  FROM cells)
         |SELECT k, thr_milli, n_le, ecdf_ppm,
         |  CAST(GREATEST(round(ecdf_ppm - $dkwEps * 1000000, 0), 0.0)
         |    AS BIGINT) AS lo_ppm,
         |  CAST(LEAST(round(ecdf_ppm + $dkwEps * 1000000, 0), 1000000.0)
         |    AS BIGINT) AS hi_ppm,
         |  n_events
         |FROM stage ORDER BY k""".stripMargin
  )
}
