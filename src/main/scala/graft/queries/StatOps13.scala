package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Round-12 tranche 20: long-memory and unit-root diagnostics on the
  * daily revenue series — the Hurst exponent via rescaled-range (R/S)
  * analysis (H ≈ 0.5 memoryless, > 0.5 persistent/long-memory, < 0.5
  * anti-persistent: whether shocks echo for months, which decides how
  * far back a forecaster must look) and the Dickey-Fuller test (is the
  * series mean-reverting or a unit-root random walk — the precondition
  * every ARMA-style model silently assumes).
  *
  * Determinism discipline: the series is staged in hecto-dollars
  * (Hurst: cents div 10⁴) / kilo-dollars (DF: cents div 10⁵), trunc on
  * both engines, so EVERY cell that crosses an int→double cast stays
  * < 2⁵³ and converts exactly on both (DuckDB's HUGEINT→DOUBLE is not
  * correctly rounded past 2⁵³ — the StatOps6 ANOVA lesson; documented
  * envelope ~sf1–10 daily revenue, one more div decade buys each
  * further decade). Block cumulative deviations are cleared of their
  * 1/w rational by carrying w·cum (pure integers); per-block R/S and
  * per-scale ln terms are micro-floored ONCE then exactly summed; both
  * final statistics close from exact cells with shared expression
  * text (DF's t entirely in doubles over the three exact moment
  * cells).
  *
  * Scale posture: one corpus day-keyed aggregate ([[ForecastOps
  * .dailySpine]], span-guarded); R/S windows partition by (scale,
  * block) — ≤ 128-row partitions by construction, never a global sort;
  * DF's lag pairing is a day-keyed self equi-join. Everything after is
  * |blocks| ≤ span rows.
  */
object StatOps13 extends QueryPack {

  private val Scales = Seq(8, 16, 32, 64, 128)

  /** OLS slope over the (xm, ym) micro cells — the q_zipf_slope close. */
  private val slopeExpr =
    """(CAST(1000000 * n_scales * sxy - sx * sy AS DOUBLE)
      | / CAST(1000000 * n_scales * sxx - sx * sx AS DOUBLE))"""
      .stripMargin.replaceAll("\\s+", " ")

  /** Dickey-Fuller spine unit: cents → 10⁴-dollar units (cents div
    * 10⁶), rendered into BOTH engines. The co-moment cells grow ∝sf²
    * (daily revenue ∝sf, squared): at the previous kilo-dollar staging
    * the sf1 probe read 0.12·2⁵³ — crossing near sf3 (r15 verdict #2);
    * one more decade of unit puts sf1 at 0.0012·2⁵³ (crossing ~sf30),
    * with the t-statistic unchanged to 4 significant digits at every
    * measured scale (sf0.001 −50.22 vs −50.17; sf1 identical to 6 dp). */
  private[graft] val DfSpineDiv = 1000000L

  /** DF t-statistic closed in shared-text doubles over the exact
    * N-scaled moment cells — each cell < 2⁵³ (the DfSpineDiv staging)
    * so both engines' int→double casts are exact and every subsequent
    * op is the same IEEE op on the same values. */
  private val dfT =
    """(CASE WHEN sxy_n < 0 THEN -1.0 ELSE 1.0 END
      | * sqrt(CAST(sxy_n AS DOUBLE) * sxy_n * (n_days - 2)
      |   / (CAST(syy_n AS DOUBLE) * sxx_n
      |      - CAST(sxy_n AS DOUBLE) * sxy_n)))"""
      .stripMargin.replaceAll("\\s+", " ")

  /** Durbin-Levinson PACF closing formulas in shared expression text
    * over the exact moment cells s0..s3 (each < 2⁵³, so both engines'
    * int→double casts are exact and every subsequent op is the same
    * IEEE op on the same values):
    * φ₁₁ = r₁; φ₂₂ = (r₂−r₁²)/(1−r₁²); φ₂₁ = r₁(1−φ₂₂);
    * φ₃₃ = (r₃ − φ₂₁r₂ − φ₂₂r₁)/(1 − φ₂₁r₁ − φ₂₂r₂). */
  private val pR1 = "(CAST(s1 AS DOUBLE) / s0)"
  private val pR2 = "(CAST(s2 AS DOUBLE) / s0)"
  private val pR3 = "(CAST(s3 AS DOUBLE) / s0)"
  private val pacf1 = pR1
  private val pacf2 =
    s"(($pR2 - $pR1 * $pR1) / (1.0 - $pR1 * $pR1))"
  private val pF21 = s"($pR1 * (1.0 - $pacf2))"
  private val pacf3 =
    s"""(($pR3 - $pF21 * $pR2 - $pacf2 * $pR1)
       | / (1.0 - $pF21 * $pR1 - $pacf2 * $pR2))"""
      .stripMargin.replaceAll("\\s+", " ")

  override def defs: Map[String, Q] = Map[String, Q](

    // Hurst exponent by R/S: for each scale w ∈ {8,16,32,64,128} split
    // the zero-filled spine into ⌊span/w⌋ full blocks; per block the
    // cumulative deviation in w-CLEARED integers is cum' = w·Σy − t·S_b
    // (= w·dev, so R = range(cum')/w exactly), the variance cell q =
    // w·Σy² − S_b² (= w²·S², both w factors cancel), and R/S =
    // range(cum')/√q — micro-floored once per block
    // and exactly summed per scale. Zero-variance blocks (all-gap
    // stretches) are excluded on BOTH engines. H = OLS slope of
    // ln(mean R/S) on ln(w) over the scales, closed from exact micro
    // cells. Output: one row per scale (blocks, summed R/S) plus the
    // constant hurst readout — the plot a perf engineer would draw.
    "q_hurst" -> ((s, dir) => {
      val z = ForecastOps.dailySpine(s, dir)
      val b = z.agg(min(col("day")).as("mn"), count(lit(1)).as("span"))
      val base = z.crossJoin(broadcast(b))
        .select((col("day") - col("mn")).as("idx"),
          expr("cents div 10000").as("y"), col("span"))
      val scaled = base
        .select(col("idx"), col("y"), col("span"),
          explode(lit(Scales.toArray)).as("w"))
        .filter(expr("idx div w < span div w"))
        .select(col("w"), expr("idx div w").as("blk"), col("idx"),
          col("y"))
      val bagg = scaled.groupBy(col("w"), col("blk"))
        .agg(sum(col("y")).as("sb"),
          sum(col("y") * col("y")).as("sy2"))
      val wnd = Window.partitionBy(col("w"), col("blk"))
        .orderBy(col("idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = scaled
        .withColumn("cumy", sum(col("y")).over(wnd))
        .withColumn("t", col("idx") - col("blk") * col("w") + 1)
        .join(bagg, Seq("w", "blk"))
        .select(col("w"), col("blk"),
          (col("w") * col("cumy") - col("t") * col("sb")).as("cp"),
          (col("w") * col("sy2") - col("sb") * col("sb")).as("q"))
      val blocks = cum.groupBy(col("w"), col("blk"))
        .agg(max(col("cp")).as("mxc"), min(col("cp")).as("mnc"),
          max(col("q")).as("q"))
        .filter(col("q") > 0)
        .select(col("w"),
          expr("""CAST(floor(1000000.0 * (mxc - mnc)
            | / sqrt(CAST(q AS DOUBLE)) + 0.5) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("rs_ppm"))
      val perW = blocks.groupBy(col("w"))
        .agg(count(lit(1)).as("n_blocks"), sum(col("rs_ppm")).as("srs"))
        .select(col("w"), col("n_blocks"), col("srs"),
          expr("""CAST(floor(1000000.0 * ln(CAST(w AS DOUBLE)) + 0.5)
            | AS BIGINT)""".stripMargin.replaceAll("\\s+", " "))
            .as("xm"),
          expr("""CAST(floor(1000000.0 * ln(CAST(srs AS DOUBLE)
            | / n_blocks / 1000000.0) + 0.5) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("ym"))
      val cells = perW.agg(count(lit(1)).as("n_scales"),
        sum(col("xm").cast(DecimalType(38, 0))).as("sx"),
        sum(col("ym").cast(DecimalType(38, 0))).as("sy"),
        sum((col("xm").cast(DecimalType(38, 0)) * col("ym"))).as("sxy"),
        sum((col("xm").cast(DecimalType(38, 0)) * col("xm"))).as("sxx"))
      perW.crossJoin(broadcast(cells
          .select(round(expr(slopeExpr), 6).as("hurst"))))
        .select(col("w"), col("n_blocks"), col("srs").as("sum_rs_ppm"),
          col("hurst"))
        .orderBy(col("w"))
    }),

    // Dickey-Fuller unit-root test (with constant): regress Δy_t on
    // y_{t−1} over the spine's day-keyed self-join; the t-statistic
    // closes from the exact N-scaled centered moments via the
    // 10⁶-scaled integer rational t² = 10⁶·Sxy²(n−2)/(Syy·Sxx − Sxy²)
    // — no > 2⁵³ value ever crosses an engine's int→double cast.
    // slope_ppm < 0 with t ≪ −2.86 ⇒ mean reversion (reject the unit
    // root); a random walk reads t ≈ 0.
    "q_dickey_fuller" -> ((s, dir) => {
      val z = ForecastOps.dailySpine(s, dir)
        .select(col("day"), expr(s"cents div $DfSpineDiv").as("y"))
      val pairs = z.as("a").join(z.as("b"),
          col("b.day") === col("a.day") + 1)
        .select(col("a.y").as("x"), (col("b.y") - col("a.y")).as("d"))
      val cells = pairs.agg(count(lit(1)).as("n"),
          sum(col("x").cast(DecimalType(38, 0))).as("sx"),
          sum(col("d").cast(DecimalType(38, 0))).as("sd"),
          sum(col("x").cast(DecimalType(38, 0)) * col("d")).as("sxd"),
          sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("sxx"),
          sum(col("d").cast(DecimalType(38, 0)) * col("d")).as("sdd"))
        .select(col("n"),
          (col("n") * col("sxd") - col("sx") * col("sd")).as("sxy_n"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("sxx_n"),
          (col("n") * col("sdd") - col("sd") * col("sd")).as("syy_n"))
      cells.select(col("n").as("n_days"),
          expr("CAST((1000000 * sxy_n) div sxx_n AS BIGINT)")
            .as("slope_ppm"),
          expr("CAST(sxy_n AS BIGINT)").as("sxy_n"),
          expr("CAST(sxx_n AS BIGINT)").as("sxx_n"),
          expr("CAST(syy_n AS BIGINT)").as("syy_n"))
        .select(col("n_days"), col("slope_ppm"), col("sxy_n"),
          col("sxx_n"), col("syy_n"),
          round(expr(dfT), 6).as("t_stat"))
    }),

    // Partial autocorrelation at lags 1..3 (round 13) — the AR-order
    // diagnostic beside q_autocorr/q_dickey_fuller: PACF(k) is the
    // correlation at lag k AFTER removing what shorter lags explain,
    // the readout that says which AR(p) a forecaster should fit.
    // Staging: hecto-dollar series (cents div 10⁴ — the Hurst rescale,
    // keeps Σdev² < 2⁵³ to ~sf100), FLOOR-mean centering (μ = Σy div n,
    // declared — an exact-rational center would square the magnitudes
    // for < 1 hecto$ of shift), moment cells s0..s3 as exact integer
    // sums off day-keyed lag equi-joins over the zero-filled spine.
    // PACF closes via the Durbin-Levinson recursion in shared-text
    // doubles over the four exact sub-2⁵³ cells; the raw ACF rides
    // along as exact ppm (signed trunc div ≡ HUGEINT //, the
    // q_theil_sen probe).
    "q_pacf" -> ((s, dir) => {
      val z = ForecastOps.dailySpine(s, dir)
        .select(col("day"), expr("cents div 10000").as("y"))
        .localCheckpoint() // consumed 5 ways: mean + s0 + 3 lag joins
      val mu = z.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
        .select(expr("sy div n").as("mu"))
      val dv = z.crossJoin(broadcast(mu))
        .select(col("day"), (col("y") - col("mu")).as("dev"))
        .localCheckpoint()
      val c0 = dv.agg(count(lit(1)).as("n_days"),
        sum(col("dev") * col("dev")).as("s0"))
      val cks = (1 to 3).map { k =>
        dv.as("a").join(dv.as("b"), col("b.day") === col("a.day") + k)
          .agg(sum(col("a.dev") * col("b.dev")).as(s"s$k"))
      }
      broadcast(c0).crossJoin(broadcast(cks(0)))
        .crossJoin(broadcast(cks(1))).crossJoin(broadcast(cks(2)))
        .select(col("n_days"), col("s0"), col("s1"), col("s2"),
          col("s3"),
          expr("(1000000 * s1) div s0").as("r1_ppm"),
          expr("(1000000 * s2) div s0").as("r2_ppm"),
          expr("(1000000 * s3) div s0").as("r3_ppm"),
          round(expr(pacf1), 6).as("pacf1"),
          round(expr(pacf2), 6).as("pacf2"),
          round(expr(pacf3), 6).as("pacf3"))
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_hurst" -> {
      val dailySql =
        """d AS (
          |  SELECT epoch_us(l_shipdate) // 86400000000 AS day,
          |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
          |      AS BIGINT)) AS cents
          |  FROM lineitem GROUP BY 1),
          |bnd AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM d),
          |g AS (SELECT u.day FROM bnd,
          |      unnest(generate_series(bnd.mn, bnd.mx)) AS u(day)),
          |z AS (SELECT g.day, COALESCE(d.cents, 0) AS cents
          |      FROM g LEFT JOIN d ON d.day = g.day)""".stripMargin
      s"""WITH $dailySql,
         |base AS MATERIALIZED (
         |  SELECT z.day - bnd.mn AS idx, z.cents // 10000 AS y,
         |    (SELECT COUNT(*) FROM z) AS span
         |  FROM z, bnd),
         |scaled AS MATERIALIZED (
         |  SELECT s.w, base.idx // s.w AS blk, base.idx, base.y
         |  FROM base, (SELECT unnest([8, 16, 32, 64, 128]) AS w) s
         |  WHERE base.idx // s.w < base.span // s.w),
         |bagg AS (
         |  SELECT w, blk, SUM(y) AS sb, SUM(y * y) AS sy2
         |  FROM scaled GROUP BY 1, 2),
         |cum AS (
         |  SELECT sc.w, sc.blk,
         |    sc.w * SUM(sc.y) OVER (PARTITION BY sc.w, sc.blk
         |      ORDER BY sc.idx ROWS UNBOUNDED PRECEDING)
         |      - (sc.idx - sc.blk * sc.w + 1) * bagg.sb AS cp,
         |    sc.w * bagg.sy2 - bagg.sb * bagg.sb AS q
         |  FROM scaled sc JOIN bagg ON bagg.w = sc.w
         |    AND bagg.blk = sc.blk),
         |blocks AS (
         |  SELECT w,
         |    CAST(floor(1000000.0 * (MAX(cp) - MIN(cp))
         |      / sqrt(CAST(MAX(q) AS DOUBLE)) + 0.5) AS BIGINT)
         |      AS rs_ppm
         |  FROM cum GROUP BY w, blk HAVING MAX(q) > 0),
         |perw AS (
         |  SELECT w, COUNT(*) AS n_blocks, SUM(rs_ppm) AS srs,
         |    CAST(floor(1000000.0 * ln(CAST(w AS DOUBLE)) + 0.5)
         |      AS BIGINT) AS xm,
         |    CAST(floor(1000000.0 * ln(CAST(SUM(rs_ppm) AS DOUBLE)
         |      / COUNT(*) / 1000000.0) + 0.5) AS BIGINT) AS ym
         |  FROM blocks GROUP BY 1),
         |cells AS (
         |  SELECT COUNT(*) AS n_scales,
         |    SUM(CAST(xm AS HUGEINT)) AS sx, SUM(CAST(ym AS HUGEINT))
         |      AS sy,
         |    SUM(CAST(xm AS HUGEINT) * ym) AS sxy,
         |    SUM(CAST(xm AS HUGEINT) * xm) AS sxx
         |  FROM perw)
         |SELECT perw.w, CAST(perw.n_blocks AS BIGINT) AS n_blocks,
         |  CAST(perw.srs AS BIGINT) AS sum_rs_ppm,
         |  round($slopeExpr, 6) AS hurst
         |FROM perw, cells ORDER BY perw.w""".stripMargin
    },

    "q_dickey_fuller" ->
      s"""WITH d AS (
        |  SELECT epoch_us(l_shipdate) // 86400000000 AS day,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS cents
        |  FROM lineitem GROUP BY 1),
        |bnd AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM d),
        |g AS (SELECT u.day FROM bnd,
        |      unnest(generate_series(bnd.mn, bnd.mx)) AS u(day)),
        |z AS (SELECT g.day, COALESCE(d.cents, 0) // $DfSpineDiv AS y
        |      FROM g LEFT JOIN d ON d.day = g.day),
        |pairs AS (
        |  SELECT a.y AS x, b.y - a.y AS dd
        |  FROM z a JOIN z b ON b.day = a.day + 1),
        |m AS (
        |  SELECT COUNT(*) AS n, SUM(CAST(x AS HUGEINT)) AS sx,
        |    SUM(CAST(dd AS HUGEINT)) AS sd,
        |    SUM(CAST(x AS HUGEINT) * dd) AS sxd,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |    SUM(CAST(dd AS HUGEINT) * dd) AS sdd
        |  FROM pairs),
        |cells AS (
        |  SELECT n, n * sxd - sx * sd AS sxy_n,
        |    n * sxx - sx * sx AS sxx_n,
        |    n * sdd - sd * sd AS syy_n
        |  FROM m)
        |SELECT CAST(n AS BIGINT) AS n_days,
        |  CAST((1000000 * sxy_n) // sxx_n AS BIGINT) AS slope_ppm,
        |  CAST(sxy_n AS BIGINT) AS sxy_n,
        |  CAST(sxx_n AS BIGINT) AS sxx_n,
        |  CAST(syy_n AS BIGINT) AS syy_n,
        |  round((CASE WHEN sxy_n < 0 THEN -1.0 ELSE 1.0 END
        |    * sqrt(CAST(sxy_n AS DOUBLE) * sxy_n * (n - 2)
        |      / (CAST(syy_n AS DOUBLE) * sxx_n
        |         - CAST(sxy_n AS DOUBLE) * sxy_n))), 6) AS t_stat
        |FROM cells""".stripMargin,

    "q_pacf" ->
      s"""WITH d AS (
         |  SELECT epoch_us(l_shipdate) // 86400000000 AS day,
         |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS cents
         |  FROM lineitem GROUP BY 1),
         |bnd AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM d),
         |g AS (SELECT u.day FROM bnd,
         |      unnest(generate_series(bnd.mn, bnd.mx)) AS u(day)),
         |z AS (SELECT g.day, COALESCE(d.cents, 0) // 10000 AS y
         |      FROM g LEFT JOIN d ON d.day = g.day),
         |mu AS (SELECT SUM(y) // COUNT(*) AS mu FROM z),
         |dv AS (SELECT day, y - mu.mu AS dev FROM z, mu),
         |c0 AS (SELECT COUNT(*) AS n_days,
         |  SUM(CAST(dev AS HUGEINT) * dev) AS s0 FROM dv),
         |c1 AS (SELECT SUM(CAST(a.dev AS HUGEINT) * b.dev) AS s1
         |  FROM dv a JOIN dv b ON b.day = a.day + 1),
         |c2 AS (SELECT SUM(CAST(a.dev AS HUGEINT) * b.dev) AS s2
         |  FROM dv a JOIN dv b ON b.day = a.day + 2),
         |c3 AS (SELECT SUM(CAST(a.dev AS HUGEINT) * b.dev) AS s3
         |  FROM dv a JOIN dv b ON b.day = a.day + 3),
         |cells AS (
         |  SELECT CAST(n_days AS BIGINT) AS n_days,
         |    CAST(s0 AS BIGINT) AS s0, CAST(s1 AS BIGINT) AS s1,
         |    CAST(s2 AS BIGINT) AS s2, CAST(s3 AS BIGINT) AS s3
         |  FROM c0, c1, c2, c3)
         |SELECT n_days, s0, s1, s2, s3,
         |  CAST((1000000 * CAST(s1 AS HUGEINT)) // s0 AS BIGINT)
         |    AS r1_ppm,
         |  CAST((1000000 * CAST(s2 AS HUGEINT)) // s0 AS BIGINT)
         |    AS r2_ppm,
         |  CAST((1000000 * CAST(s3 AS HUGEINT)) // s0 AS BIGINT)
         |    AS r3_ppm,
         |  round($pacf1, 6) AS pacf1,
         |  round($pacf2, 6) AS pacf2,
         |  round($pacf3, 6) AS pacf3
         |FROM cells""".stripMargin
  )
}
