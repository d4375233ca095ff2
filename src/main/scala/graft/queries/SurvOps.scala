package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Round-13 tranche: the survival/trend-testing gaps beside the r11
  * Kaplan-Meier gate — the comparisons and cumulative readouts an
  * experimenter actually runs ON a survival curve rather than the curve
  * alone, plus the two classical ordered-trend tests the warehouse side
  * was missing:
  *
  *  - log-rank test (`q_logrank`) — IS the conversion curve different
  *    between two cohorts? The standard two-group censored comparison.
  *  - Nelson-Aalen (`q_nelson_aalen`) — the cumulative-hazard twin of
  *    KM's survival product (sums instead of products, so the exact
  *    integer staging has no per-step compounding at all).
  *  - Mann-Kendall (`q_mann_kendall`) — the nonparametric monotone-trend
  *    test over daily revenue; the hypothesis-test companion to
  *    `q_theil_sen`'s slope ESTIMATE (same bounded pair frame).
  *  - Cochran-Armitage (`q_cochran_armitage`) — trend in proportions
  *    across the ORDERED order-priority levels; the ordinal sibling of
  *    the 2×k chi-square.
  *
  * Determinism discipline (the §2.15/§2.16 rules): all corpus-sized work
  * is keyed aggregates; the survival cell frames are ≤ 49 rows by the
  * same loud [[Parity.guardedSpanValue]] bound q_survival_km carries;
  * every statistic stages as exact integers in micro units with products
  * through DECIMAL(38,0)/HUGEINT, and IEEE doubles appear only in
  * shared-text closing formulas over sub-2⁵³ cells (OutputContractSpec
  * enforces the output boundary).
  */
object SurvOps extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  private val DayUs  = 86400L * 1000000L
  private val HourUs = 3600L * 1000000L

  /** Shared per-user survival frame (g, t, ev): time from first event to
    * first signup in hours, administratively censored at 48h — the
    * q_survival_km staging (StatOps.scala:45) — plus the deterministic
    * even/odd user-id cohort split g (the q_ab_experiment assignment
    * stand-in). One user-keyed aggregate; the 49-cell guard is
    * inherited. */
  private def survSub(s: SparkSession, dir: String): DataFrame = {
    val u = t(s, dir, "events").groupBy(col("user_id")).agg(
      min(expr("unix_micros(ts)")).as("birth"),
      min(when(col("event_type") === "signup", expr("unix_micros(ts)")))
        .as("death"),
      max(expr("unix_micros(ts)")).as("last"))
    val dur = expr(s"(death - birth) div $HourUs")
    u.select((col("user_id") % 2).as("g"),
        when(col("death").isNotNull && dur <= 48, dur)
          .when(col("death").isNotNull, lit(48L))
          .otherwise(least(expr(s"(last - birth) div $HourUs"), lit(48L)))
          .as("t0"),
        when(col("death").isNotNull && dur <= 48, 1L).otherwise(0L)
          .as("ev"))
      .select(col("g"),
        Parity.guardedSpanValue(col("t0"), col("t0") + 1, 49L,
          "surv hazard cell").as("t"),
        col("ev"))
  }

  /** Oracle-side SQL twin of [[survSub]] — CTEs `u`, `s` (t, ev, g). */
  private val sqlSurvSub =
    s"""u AS (
       |  SELECT user_id, MIN(epoch_us(ts)) AS birth,
       |    MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
       |      AS death,
       |    MAX(epoch_us(ts)) AS last
       |  FROM events GROUP BY 1),
       |s AS (
       |  SELECT user_id % 2 AS g,
       |    CASE
       |      WHEN death IS NOT NULL AND (death - birth) // $HourUs <= 48
       |        THEN (death - birth) // $HourUs
       |      WHEN death IS NOT NULL THEN 48
       |      ELSE CASE WHEN (last - birth) // $HourUs <= 48
       |           THEN (last - birth) // $HourUs ELSE 48 END END AS t,
       |    CASE WHEN death IS NOT NULL
       |        AND (death - birth) // $HourUs <= 48
       |      THEN 1 ELSE 0 END AS ev
       |  FROM u)""".stripMargin

  override def defs: Map[String, Q] = Map[String, Q](

    // Two-group log-rank test on the signup-conversion survival curves
    // of the even/odd user-id cohorts: O−E = Σ_t (d_1t − d_t·r_1t/r_t)
    // and V = Σ_t d_t·r_1t·(r_t−r_1t)·(r_t−d_t)/(r_t²·(r_t−1)) over the
    // ≤49 event-time cells, each term micro-floored ONCE off exact
    // integer cells (at-risk counts via a triangular self-join of the
    // bounded cell frame — no corpus window), χ² = (O−E)²/V by exact
    // integer division, z as the signed shared-text closing sqrt.
    // Event times with r_t ≤ 1 are excluded from BOTH sums (declared —
    // the variance term is undefined there; a r_t=1 cell contributes
    // 0 to O−E anyway). Envelope: 10⁶·d·r³ ≤ 10⁶·n⁴ in DECIMAL(38,0)
    // — exact to n ≈ 10⁸ users. Degenerate stance: a single-cohort
    // corpus zeroes V — Spark div yields NULL, DuckDB // errors; loud
    // either way (the AttribOps stance), unreachable on the gate
    // corpus (both parities of user_id occur at every sf).
    "q_logrank" -> ((s, dir) => {
      val sub = survSub(s, dir)
      val cell = sub.groupBy(col("t")).agg(
        sum(col("ev")).as("d"),
        sum(lit(1L) - col("ev")).as("c"),
        sum(when(col("g") === 1, col("ev")).otherwise(0L)).as("d1"),
        sum(when(col("g") === 1, lit(1L) - col("ev")).otherwise(0L))
          .as("c1")).localCheckpoint()
      val tot = sub.agg(count(lit(1)).as("n"), sum(col("g")).as("n1"))
      val below = cell.as("a")
        .join(broadcast(cell.as("b")), col("b.t") < col("a.t"), "left")
        .groupBy(col("a.t").as("t"), col("a.d").as("d"),
          col("a.d1").as("d1"))
        .agg(coalesce(sum(col("b.d") + col("b.c")), lit(0L)).as("bel"),
          coalesce(sum(col("b.d1") + col("b.c1")), lit(0L)).as("bel1"))
      val risk = below.crossJoin(broadcast(tot))
        .select(col("n"), col("n1"), col("t"), col("d"), col("d1"),
          (col("n") - col("bel")).as("r"),
          (col("n1") - col("bel1")).as("r1"))
      risk.filter(col("d") > 0 && col("r") > 1)
        .select(col("n"), col("n1"),
          expr("""CAST(1000000 * d1
            | - (1000000 * CAST(d AS DECIMAL(38,0)) * r1) div r
            | AS BIGINT)""".stripMargin.replaceAll("\\s+", " "))
            .as("oe"),
          expr("""CAST((1000000 * CAST(d AS DECIMAL(38,0)) * r1
            | * (r - r1) * (r - d))
            | div (CAST(r AS DECIMAL(38,0)) * r * (r - 1)) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("v"))
        .groupBy(col("n"), col("n1"))
        .agg(sum(col("oe")).as("oe_micro"), sum(col("v")).as("v_micro"))
        .select(col("n").as("n_users"), col("n1").as("n_grp1"),
          col("oe_micro"), col("v_micro"),
          expr("""CAST((CAST(oe_micro AS DECIMAL(38,0)) * oe_micro)
            | div v_micro AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("chi2_micro"))
        .select(col("n_users"), col("n_grp1"), col("oe_micro"),
          col("v_micro"), col("chi2_micro"),
          round(expr("""(CASE WHEN oe_micro < 0 THEN -1.0 ELSE 1.0 END)
            | * sqrt(CAST(chi2_micro AS DOUBLE) / 1000000.0)"""
            .stripMargin.replaceAll("\\s+", " ")), 6).as("z"))
    }),

    // Nelson-Aalen cumulative hazard over the same censored frame:
    // H(t) = Σ_{s≤t} d_s/r_s and its variance Σ d_s/r_s² — the
    // additive twin of KM's product (and the better-behaved estimator
    // to stage exactly: per-cell terms floor ONCE in micro/pico units
    // and then SUM, no per-step compounding of floors at all). The
    // corpus reduces to the same ≤49-cell frame; cumulative sums run as
    // a triangular self-join of that frame (49² cells, driver-free).
    "q_nelson_aalen" -> ((s, dir) => {
      val sub = survSub(s, dir)
      val cell = sub.groupBy(col("t")).agg(
        sum(col("ev")).as("d"), sum(lit(1L) - col("ev")).as("c"))
      val tot = sub.agg(count(lit(1)).as("n0"))
      val grid = s.range(1)
        .select(explode(expr("sequence(0L, 48L)")).as("t"))
        .join(cell, Seq("t"), "left")
        .select(col("t"), coalesce(col("d"), lit(0L)).as("d"),
          coalesce(col("c"), lit(0L)).as("c"))
      val below = grid.as("a")
        // broadcast the 49-row side: without the hint the non-equi
        // triangular join has no stats and plans a partitioned
        // CartesianProduct — caught by the PlanSpec cartesian sweep
        .join(broadcast(grid.as("b")), col("b.t") < col("a.t"), "left")
        .groupBy(col("a.t").as("t"), col("a.d").as("d"))
        .agg(coalesce(sum(col("b.d") + col("b.c")), lit(0L)).as("bel"))
      val terms = below.crossJoin(broadcast(tot))
        .select(col("t"), col("d"), (col("n0") - col("bel")).as("r"))
        .select(col("t"), col("d"), col("r"),
          when(col("r") > 0, expr("(1000000 * d) div r")).otherwise(0L)
            .as("na"),
          when(col("r") > 0,
            expr("""CAST((1000000000000 * CAST(d AS DECIMAL(38,0)))
              | div (CAST(r AS DECIMAL(38,0)) * r) AS BIGINT)"""
              .stripMargin.replaceAll("\\s+", " "))).otherwise(0L)
            .as("va")).localCheckpoint()
      terms.as("a")
        .join(broadcast(terms.as("b")), col("b.t") <= col("a.t"))
        .groupBy(col("a.t").as("t"), col("a.d").as("n_events"),
          col("a.r").as("n_risk"))
        .agg(sum(col("b.na")).as("h_micro"),
          sum(col("b.va")).as("var_pico"))
        .orderBy(col("t"))
    }),

    // Mann-Kendall monotone-trend test over the LAST 365 days of daily
    // revenue (the q_theil_sen recency window — the pair frame is
    // ≤ 365²/2 at ANY corpus size): S = Σ_{i<j} sign(y_j − y_i) exact,
    // tie-corrected variance as the exact integer
    // 18V = n(n−1)(2n+5) − Σ_v t_v(t_v−1)(2t_v+5), and the
    // continuity-corrected z = (S∓1)/√V as the shared-text closing
    // double over those two sub-2⁵³ cells. The day-keyed aggregate is
    // the only corpus pass; the value census that feeds the tie term is
    // ≤ 365 rows.
    "q_mann_kendall" -> ((s, dir) => {
      val d0 = t(s, dir, "lineitem")
        .select(expr(
          s"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div $DayUs")
          .as("day"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("cents"))
        .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
      val mx = d0.agg(max(col("day")).as("mxd"))
      val d = d0.crossJoin(broadcast(mx))
        .filter(col("day") > col("mxd") - 365)
        .select(col("day"), col("cents")).localCheckpoint()
      val sPairs = d.as("i").join(broadcast(d.as("j")),
          col("j.day") > col("i.day"))
        .agg(sum(when(col("j.cents") > col("i.cents"), 1L)
          .when(col("j.cents") < col("i.cents"), -1L).otherwise(0L))
          .as("s_stat"))
      val ties = d.groupBy(col("cents")).agg(count(lit(1)).as("tv"))
        .agg(sum(col("tv")).as("n_days"),
          sum(col("tv") * (col("tv") - 1) * (lit(2L) * col("tv") + 5))
            .as("tie18"))
      broadcast(ties).crossJoin(broadcast(sPairs))
        .select(col("n_days"), col("s_stat"),
          (col("n_days") * (col("n_days") - 1)
            * (lit(2L) * col("n_days") + 5) - col("tie18")).as("var18"))
        .select(col("n_days"), col("s_stat"), col("var18"),
          round(expr("""CASE WHEN s_stat > 0 THEN
            |   (CAST(s_stat AS DOUBLE) - 1.0)
            |     / sqrt(CAST(var18 AS DOUBLE) / 18.0)
            | WHEN s_stat < 0 THEN
            |   (CAST(s_stat AS DOUBLE) + 1.0)
            |     / sqrt(CAST(var18 AS DOUBLE) / 18.0)
            | ELSE 0.0 END""".stripMargin.replaceAll("\\s+", " ")), 6)
            .as("z"))
    }),

    // Cochran-Armitage trend-in-proportions across the ORDERED order
    // priorities (scores w = 1..5 from the priority digit): is the
    // high-value-order rate monotone in urgency? Outcome = order total
    // above the global lower median (the census median — DuckDB's
    // median() interpolates at even n, the q_mcnemar lesson). The
    // statistic closes as exact integers: T = Σw_i(a_i·N − n_i·A) and
    // χ²·10⁶ = 10⁶·N·T² div (A(N−A)·(N·Σw²n_i − (Σw·n_i)²)), z as the
    // signed shared-text sqrt. One corpus census + one 5-row cell
    // frame. Envelope: 10⁶·N·T² with T ≤ 5·N·A ≲ N² holds in
    // DECIMAL(38,0) to N ≈ 3·10⁶ orders; past that stage T div 10³
    // first (documented, loud ANSI overflow otherwise).
    "q_cochran_armitage" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        substring(col("o_orderpriority"), 1, 1).cast("long").as("w"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
      // round 18: lazy-checkpoint the value census — its belowFrame
      // fan-out re-executed the orders scan 8× at sf0.01 (ScanCount;
      // AQE re-planning defeats exchange reuse across the consumers).
      // The cells pass below still scans orders once: the declared
      // class-2 threshold-then-apply shape. 8 scans → 2.
      val census = o.groupBy(col("cents")).agg(count(lit(1)).as("tv"))
        .localCheckpoint(eager = false)
      val nn = census.agg(sum(col("tv")).as("n"))
      val med = graft.operators.RangeBuckets.belowFrame(
          census.select(col("cents").as("v"), col("tv").as("t")))
        .crossJoin(broadcast(nn))
        .filter(col("below") + col("t") >= expr("(n + 1) div 2"))
        .agg(min(col("v")).as("med"))
      val cells = o.crossJoin(broadcast(med))
        .select(col("w"), when(col("cents") > col("med"), 1L)
          .otherwise(0L).as("y"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("ni"), sum(col("y")).as("ai"))
      cells
        .agg(sum(col("ni")).as("n"), sum(col("ai")).as("a"),
          sum(col("w") * col("ni")).as("swn"),
          sum(col("w") * col("w") * col("ni")).as("sw2n"),
          sum(col("w").cast(DecimalType(38, 0)) * col("ai")).as("swa"))
        .select(col("n").as("n_orders"), col("a").as("n_pos"),
          expr("""CAST(CAST(swa AS DECIMAL(38,0)) * n
            | - CAST(a AS DECIMAL(38,0)) * swn AS DECIMAL(38,0))"""
            .stripMargin.replaceAll("\\s+", " ")).as("t_num"),
          col("n"), col("a"), col("swn"), col("sw2n"))
        .select(col("n_orders"), col("n_pos"),
          col("t_num").cast("long").as("t_stat"),
          expr("""CAST((1000000 * t_num * t_num)
            | div (CAST(a AS DECIMAL(38,0)) * (n - a)
            |      * (CAST(n AS DECIMAL(38,0)) * sw2n
            |         - CAST(swn AS DECIMAL(38,0)) * swn)) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("chi2_micro"))
        .select(col("n_orders"), col("n_pos"), col("t_stat"),
          col("chi2_micro"),
          round(expr("""(CASE WHEN t_stat < 0 THEN -1.0 ELSE 1.0 END)
            | * sqrt(CAST(chi2_micro AS DOUBLE) / 1000000.0)"""
            .stripMargin.replaceAll("\\s+", " ")), 6).as("z"))
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_logrank" ->
      s"""WITH $sqlSurvSub,
         |cell AS (
         |  SELECT t, SUM(ev) AS d, SUM(1 - ev) AS c,
         |    SUM(CASE WHEN g = 1 THEN ev ELSE 0 END) AS d1,
         |    SUM(CASE WHEN g = 1 THEN 1 - ev ELSE 0 END) AS c1
         |  FROM s GROUP BY 1),
         |tot AS (SELECT COUNT(*) AS n, SUM(g) AS n1 FROM s),
         |risk AS (
         |  SELECT tot.n, tot.n1, cell.t, cell.d, cell.d1,
         |    tot.n - COALESCE(SUM(cell.d + cell.c) OVER (ORDER BY cell.t
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS r,
         |    tot.n1 - COALESCE(SUM(cell.d1 + cell.c1)
         |      OVER (ORDER BY cell.t
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS r1
         |  FROM cell, tot),
         |terms AS (
         |  SELECT n, n1,
         |    1000000 * d1
         |      - (1000000 * CAST(d AS HUGEINT) * r1) // r AS oe,
         |    (1000000 * CAST(d AS HUGEINT) * r1 * (r - r1) * (r - d))
         |      // (CAST(r AS HUGEINT) * r * (r - 1)) AS v
         |  FROM risk WHERE d > 0 AND r > 1),
         |agg AS (
         |  SELECT CAST(n AS BIGINT) AS n_users,
         |    CAST(n1 AS BIGINT) AS n_grp1,
         |    CAST(SUM(oe) AS BIGINT) AS oe_micro,
         |    CAST(SUM(v) AS BIGINT) AS v_micro,
         |    CAST((CAST(SUM(oe) AS HUGEINT) * SUM(oe)) // SUM(v)
         |      AS BIGINT) AS chi2_micro
         |  FROM terms GROUP BY n, n1)
         |SELECT n_users, n_grp1, oe_micro, v_micro, chi2_micro,
         |  round((CASE WHEN oe_micro < 0 THEN -1.0 ELSE 1.0 END)
         |    * sqrt(CAST(chi2_micro AS DOUBLE) / 1000000.0), 6) AS z
         |FROM agg""".stripMargin,

    "q_nelson_aalen" ->
      s"""WITH $sqlSurvSub,
         |cell AS (
         |  SELECT t, SUM(ev) AS d, SUM(1 - ev) AS c FROM s GROUP BY 1),
         |tot AS (SELECT COUNT(*) AS n0 FROM s),
         |grid AS (
         |  SELECT g.t, COALESCE(cell.d, 0) AS d, COALESCE(cell.c, 0)
         |      AS c
         |  FROM unnest(generate_series(0, 48)) AS g(t)
         |  LEFT JOIN cell ON cell.t = g.t),
         |risk AS (
         |  SELECT grid.t, grid.d,
         |    tot.n0 - COALESCE(SUM(grid.d + grid.c) OVER (ORDER BY grid.t
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS r
         |  FROM grid, tot),
         |terms AS (
         |  SELECT t, d, r,
         |    CASE WHEN r > 0 THEN (1000000 * d) // r ELSE 0 END AS na,
         |    CASE WHEN r > 0 THEN
         |      CAST((1000000000000 * CAST(d AS HUGEINT))
         |        // (CAST(r AS HUGEINT) * r) AS BIGINT)
         |      ELSE 0 END AS va
         |  FROM risk)
         |SELECT CAST(t AS BIGINT) AS t, CAST(d AS BIGINT) AS n_events,
         |  CAST(r AS BIGINT) AS n_risk,
         |  CAST(SUM(na) OVER (ORDER BY t) AS BIGINT) AS h_micro,
         |  CAST(SUM(va) OVER (ORDER BY t) AS BIGINT) AS var_pico
         |FROM terms ORDER BY t""".stripMargin,

    "q_mann_kendall" ->
      s"""WITH d0 AS (
         |  SELECT epoch_us(CAST(l_shipdate AS TIMESTAMP)) // $DayUs
         |      AS day,
         |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS cents
         |  FROM lineitem GROUP BY 1),
         |d AS (SELECT day, cents FROM d0
         |  WHERE day > (SELECT MAX(day) FROM d0) - 365),
         |sp AS (
         |  SELECT CAST(SUM(CASE WHEN j.cents > i.cents THEN 1
         |    WHEN j.cents < i.cents THEN -1 ELSE 0 END) AS BIGINT)
         |    AS s_stat
         |  FROM d i JOIN d j ON j.day > i.day),
         |ties AS (
         |  SELECT CAST(SUM(tv) AS BIGINT) AS n_days,
         |    CAST(SUM(tv * (tv - 1) * (2 * tv + 5)) AS BIGINT) AS tie18
         |  FROM (SELECT COUNT(*) AS tv FROM d GROUP BY cents)),
         |cells AS (
         |  SELECT n_days, s_stat,
         |    n_days * (n_days - 1) * (2 * n_days + 5) - tie18 AS var18
         |  FROM ties, sp)
         |SELECT n_days, s_stat, CAST(var18 AS BIGINT) AS var18,
         |  round(CASE WHEN s_stat > 0 THEN
         |      (CAST(s_stat AS DOUBLE) - 1.0)
         |        / sqrt(CAST(var18 AS DOUBLE) / 18.0)
         |    WHEN s_stat < 0 THEN
         |      (CAST(s_stat AS DOUBLE) + 1.0)
         |        / sqrt(CAST(var18 AS DOUBLE) / 18.0)
         |    ELSE 0.0 END, 6) AS z
         |FROM cells""".stripMargin,

    "q_cochran_armitage" ->
      """WITH o AS (
        |  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders),
        |medc AS (
        |  SELECT MIN(cents) AS med FROM (
        |    SELECT cents, SUM(cnt) OVER (ORDER BY cents) AS cum,
        |      SUM(cnt) OVER () AS n
        |    FROM (SELECT cents, COUNT(*) AS cnt FROM o GROUP BY 1))
        |  WHERE cum >= (n + 1) // 2),
        |cells AS (
        |  SELECT w, COUNT(*) AS ni,
        |    SUM(CASE WHEN cents > medc.med THEN 1 ELSE 0 END) AS ai
        |  FROM o, medc GROUP BY 1),
        |agg AS (
        |  SELECT SUM(ni) AS n, SUM(ai) AS a,
        |    SUM(w * ni) AS swn, SUM(w * w * ni) AS sw2n,
        |    SUM(CAST(w AS HUGEINT) * ai) AS swa
        |  FROM cells),
        |st AS (
        |  SELECT CAST(n AS BIGINT) AS n_orders, CAST(a AS BIGINT)
        |      AS n_pos,
        |    CAST(swa * n - CAST(a AS HUGEINT) * swn AS HUGEINT) AS t_num,
        |    n, a, swn, sw2n
        |  FROM agg)
        |SELECT n_orders, n_pos, CAST(t_num AS BIGINT) AS t_stat,
        |  chi2_micro,
        |  round((CASE WHEN t_num < 0 THEN -1.0 ELSE 1.0 END)
        |    * sqrt(CAST(chi2_micro AS DOUBLE) / 1000000.0), 6) AS z
        |FROM (SELECT *,
        |  CAST((1000000 * t_num * t_num)
        |    // (CAST(a AS HUGEINT) * (n - a)
        |       * (CAST(n AS HUGEINT) * sw2n
        |          - CAST(swn AS HUGEINT) * swn)) AS BIGINT)
        |    AS chi2_micro
        |  FROM st)""".stripMargin
  )
}
