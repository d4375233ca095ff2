package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.RangeBuckets
import graft.sources.Tables
import graft.functions.TextFunctions.{sqlWordNgrams, wordNgramsNative}

/** Round-12 tranche: concentration, richness and audit statistics — the
  * Gini coefficient and Lorenz curve (inequality of customer spend), the
  * Herfindahl-Hirschman index with CR4 (brand revenue concentration),
  * Benford first-digit conformance (the classic bookkeeping-fraud
  * screen), Chao1 vocabulary richness + Good-Turing missing mass (how
  * much vocabulary a corpus crawl has NOT seen yet — the coverage
  * readout an LLM-data pipeline wants before declaring a source
  * exhausted), Jensen-Shannon event-mix drift (the symmetric,
  * always-finite cousin of `q_psi_drift`'s PSI), and the Theil T
  * inequality index (the decomposable entropy measure).
  *
  * Determinism discipline (see [[Parity]]): all counts/sums are exact
  * integers in cents/micro units staged through DECIMAL(38,0) with
  * subtract-the-remainder truncating division (the `q_changepoint`
  * staging); ln appears only in closing formulas over exact integer
  * cells with the IDENTICAL expression shape on both engines, rounded
  * to 6 dp (the WOE/BM25 precedent) — or, for the Theil per-entity
  * terms, rounded to micro units PER ROW and then exactly summed (the
  * `q_embed_drift` row-staging precedent, declared micro-resolution
  * semantics).
  *
  * Scale posture: the two order-statistic queries (`q_gini_spend`,
  * `q_lorenz_spend`) run rank-free through the value census + range-adaptive
  * bucketed cumsums ([[RangeBuckets]], bucket count ≤ 257 by
  * construction) — never a single-partition global sort; everything
  * else is one keyed aggregate plus 1-row/dim-sized broadcasts.
  */
object StatOps4 extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  private val DayUs = 86400L * 1000000L

  /** Per-customer lifetime spend in exact cents — the shared subject of
    * the inequality statistics. */
  private def spend(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long")).as("x"))

  private val sqlSpend =
    """SELECT o_custkey,
      |  SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS x
      |FROM orders GROUP BY 1""".stripMargin

  /** The rank-free below-count frame over a (v, t) value census: each
    * distinct value with the exact number of rows strictly below it —
    * the bucketed-cumsum discipline shared by q_gini_spend / q_lorenz_spend (and
    * q_mann_whitney before them). Also carries `xb`, the exact spend
    * mass strictly below the value, for Lorenz prefixes. */
  private def withBelow(census: DataFrame): DataFrame =
    RangeBuckets.belowFrame(census)

  override def defs: Map[String, Q] = Map[String, Q](

    // Gini coefficient of customer lifetime spend. With values sorted
    // ascending and 1-based positions i, G = (2·Σ i·xᵢ)/(n·T) − (n+1)/n;
    // a tied block of t rows at value v occupies positions below+1 ..
    // below+t, so Σ i·xᵢ = Σ_v v·(below·t + t(t+1)/2) — pure integers
    // over the value census, no per-row rank. The ppm readout stages
    // 10⁶·(2S − (n+1)T) ≥ 0 (equality ⟺ perfect equality) through the
    // DECIMAL(38,0) subtract-remainder division by n·T.
    "q_gini_spend" -> ((s, dir) => {
      val census = spend(s, dir).groupBy(col("x").as("v"))
        .agg(count(lit(1)).as("t"))
        // round 18: census leaf (ScanCount: the fan-out re-ran the
        // fact scan per consumer; see OPTIMIZATION_r18.md)
        .localCheckpoint(eager = false)
      withBelow(census)
        .agg(sum(col("t")).as("n"),
          sum(col("v").cast(DecimalType(38, 0)) * col("t")).as("tt"),
          sum(col("v").cast(DecimalType(38, 0))
            * (col("below").cast(DecimalType(38, 0)) * col("t")
              + expr("(t * (t + 1)) div 2"))).as("sr"))
        .select(col("n").as("n_customers"),
          col("tt").cast("long").as("total_cents"),
          expr(
            """CAST((
              |  (1000000 * (2 * sr - (CAST(n AS DECIMAL(38,0)) + 1) * tt))
              |  - (1000000 * (2 * sr - (CAST(n AS DECIMAL(38,0)) + 1) * tt))
              |    % (CAST(n AS DECIMAL(38,0)) * tt)
              |) / (CAST(n AS DECIMAL(38,0)) * tt) AS BIGINT)"""
              .stripMargin).as("gini_ppm"))
    }),

    // Lorenz curve at the nine inner deciles: for k = 1..9 the exact
    // spend share held by the poorest ⌊k·n/10⌋ customers. Each probe
    // resolves rank-free against the census (the q_conformal order-
    // statistic probe): the covering value satisfies below < p ≤
    // below + t, and the prefix mass is xb + v·(p − below) — exact
    // integers end to end. The 9-row decile grid broadcasts; the probe
    // is a 9 × |census| broadcast theta join, census-sized work.
    "q_lorenz_spend" -> ((s, dir) => {
      val census = spend(s, dir).groupBy(col("x").as("v"))
        .agg(count(lit(1)).as("t"))
        // round 18: census leaf (ScanCount: the fan-out re-ran the
        // fact scan per consumer; see OPTIMIZATION_r18.md)
        .localCheckpoint(eager = false)
      val bel = withBelow(census)
      val cells = census.agg(sum(col("t")).as("n"),
        sum(col("v").cast(DecimalType(38, 0)) * col("t")).as("tt"))
      val grid = census.sparkSession.range(1, 10)
        .select(col("id").as("k"))
        .crossJoin(broadcast(cells))
        .select(col("k"), expr("(k * n) div 10").as("p"),
          col("n"), col("tt"))
      bel.join(broadcast(grid),
          col("below") < col("p") &&
            col("p") <= col("below") + col("t"))
        .select(col("k"), col("p").as("n_poorest"),
          (col("xb") + col("v").cast(DecimalType(38, 0))
            * (col("p") - col("below"))).as("cum"),
          col("tt"))
        .select(col("k"), col("n_poorest"),
          col("cum").cast("long").as("cum_cents"),
          expr(
            """CAST(((1000000 * cum) - (1000000 * cum) % tt) / tt
              | AS BIGINT)""".stripMargin).as("share_ppm"))
        .orderBy(col("k"))
    }),

    // Herfindahl-Hirschman concentration of brand revenue + the CR4
    // top-4 concentration ratio. HHI in ppm of the squared-share sum:
    // 10⁶·Σcᵢ²/T² — one Σc² aggregate; CR4's top-4 is a
    // TakeOrderedAndProject, never a global sort. Part dim broadcasts
    // into the lineitem scan.
    "q_hhi" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum((col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
          .cast("long")).as("c"))
      val cells = rev.agg(count(lit(1)).as("n_brands"),
        sum(col("c").cast(DecimalType(38, 0))).as("tt"),
        sum(col("c").cast(DecimalType(38, 0)) * col("c")).as("sq"))
      val top4 = rev.orderBy(col("c").desc, col("p_brand")).limit(4)
        .agg(sum(col("c").cast(DecimalType(38, 0))).as("c4"))
      cells.crossJoin(broadcast(top4))
        .select(col("n_brands"), col("tt").cast("long").as("total_cents"),
          expr(
            """CAST(((1000000 * sq) - (1000000 * sq) % (tt * tt))
              | / (tt * tt) AS BIGINT)""".stripMargin).as("hhi_ppm"),
          expr(
            """CAST(((1000000 * c4) - (1000000 * c4) % tt) / tt
              | AS BIGINT)""".stripMargin).as("cr4_ppm"))
    }),

    // Benford first-digit audit of order totals: observed counts per
    // leading digit of the cents amount vs the Benford expectation
    // log₁₀(1 + 1/d) — the bookkeeping-fraud screen (fabricated amounts
    // famously fail it). Digits extract arithmetic-free via the string
    // head (identical semantics both engines, cents > 0 by
    // construction); counts are exact, the expectation and the χ² term
    // are closing-formula doubles (6 dp) from exact cells. One 9-cell
    // aggregate; the total broadcasts.
    "q_benford_chi2" -> ((s, dir) => {
      val d = t(s, dir, "orders")
        .select((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
        .filter(col("cents") > 0)
        .select(substring(col("cents").cast("string"), 1, 1)
          .cast("long").as("digit"))
      val cells = d.groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      val tot = d.agg(count(lit(1)).as("nt"))
      val grid = d.sparkSession.range(1, 10).select(col("id").as("digit"))
      grid.join(cells, Seq("digit"), "left")
        .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"))
        .crossJoin(broadcast(tot))
        .select(col("digit"), col("n_obs"),
          expr("(1000000 * n_obs) div nt").as("obs_ppm"),
          round(expr("1000000 * ln(1.0 + 1.0 / digit) / ln(10.0)"), 0)
            .cast("long").as("exp_ppm"),
          round(expr(
            """(CAST(n_obs AS DOUBLE) - nt * (ln(1.0 + 1.0 / digit) / ln(10.0)))
              |* (CAST(n_obs AS DOUBLE) - nt * (ln(1.0 + 1.0 / digit) / ln(10.0)))
              |/ (nt * (ln(1.0 + 1.0 / digit) / ln(10.0)))"""
              .stripMargin), 6).as("chi2_term"))
        .orderBy(col("digit"))
    }),

    // Chao1 vocabulary-richness estimate + Good-Turing missing mass
    // over the document corpus: from the term-frequency spectrum,
    // chao1 = V + f₁²/(2·f₂) estimates the TRUE vocabulary size
    // (observed + unseen), and p₀ = f₁/N is the Good-Turing estimate of
    // the probability mass of never-seen units — the "is this source
    // exhausted?" readout before another crawl round. The unit is the
    // WORD TRIGRAM (the parity-matched wordNgrams/sqlWordNgrams pair):
    // the synthetic corpus draws from a 31-word vocabulary, so the
    // single-word spectrum is saturated (f₁ = f₂ = 0 — a degenerate
    // NULL estimator), while the trigram spectrum is hapax-rich at
    // every scale (f₁ ≈ 9.4k at sf0.01) — and trigram coverage is the
    // question a crawl-coverage readout actually asks. The gram column
    // is the native single-pass WordNgramsExpr (byte-identical to the
    // composed wordNgrams per TextKernelsSpec; the composed HOF form is
    // CodegenFallback and re-runs the normalize+split per gram — ×7 the
    // cost, measured 10.3 s vs 1.5 s at sf0.1). One explode +
    // gram count (the q_vocab_growth shape), then a 1-row spectrum
    // aggregate; milli/ppm units via truncating div (the f₂ = 0 NULL
    // branch stays declared via nullif).
    "q_chao1" -> ((s, dir) => {
      val tc = t(s, dir, "documents")
        .select(explode(wordNgramsNative(col("text"), 3)).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      tc.agg(count(lit(1)).as("v_obs"),
          sum(col("c")).as("n_tokens"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
        .select(col("v_obs"), col("n_tokens"), col("f1"), col("f2"),
          (lit(1000L) * col("v_obs")
            + expr("(1000 * f1 * f1) div nullif(2 * f2, 0)"))
            .as("chao1_milli"),
          expr("(1000000 * f1) div n_tokens").as("missing_mass_ppm"))
    }),

    // Jensen-Shannon divergence of the event-type mix, first half of
    // the date span vs second (the q_psi_drift period split): per type,
    // js_term = ½·p·ln(p/m) + ½·q·ln(q/m) with m = (p+q)/2 — symmetric
    // and ALWAYS finite (a type absent from one period contributes its
    // other side's ½·ln 2 share, where PSI's ratio would blow up
    // without smoothing). Counts exact; terms closing-formula doubles
    // (6 dp) with explicit zero branches (the 0·ln 0 = 0 limit made
    // executable). One type-keyed aggregate; the midpoint and totals
    // broadcast.
    "q_js_divergence" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .select(expr(s"unix_micros(ts) div $DayUs").as("day"),
          col("event_type"))
      val mid = e.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
      val cells = e.crossJoin(broadcast(mid))
        .groupBy(col("event_type"))
        .agg(sum(when(col("day") < col("mid"), 1L).otherwise(0L)).as("a"),
          sum(when(col("day") >= col("mid"), 1L).otherwise(0L)).as("b"))
        // round 18: census leaf (ScanCount: the fan-out re-ran the
        // fact scan per consumer; see OPTIMIZATION_r18.md)
        .localCheckpoint(eager = false)
      val tot = cells.agg(sum(col("a")).as("at"), sum(col("b")).as("bt"))
      cells.crossJoin(broadcast(tot))
        .select(col("event_type"), col("a").as("n_base"),
          col("b").as("n_cur"),
          round(expr(
            """0.5 * (CASE WHEN a = 0 THEN 0.0 ELSE
              |  (CAST(a AS DOUBLE) / at)
              |  * ln((CAST(a AS DOUBLE) / at)
              |       / ((CAST(a AS DOUBLE) / at
              |           + CAST(b AS DOUBLE) / bt) / 2.0)) END)
              |+ 0.5 * (CASE WHEN b = 0 THEN 0.0 ELSE
              |  (CAST(b AS DOUBLE) / bt)
              |  * ln((CAST(b AS DOUBLE) / bt)
              |       / ((CAST(a AS DOUBLE) / at
              |           + CAST(b AS DOUBLE) / bt) / 2.0)) END)"""
              .stripMargin), 6).as("js_term"))
        .orderBy(col("event_type"))
    }),

    // Theil T inequality index of customer spend: T = Σᵢ (xᵢ/X)·
    // ln(xᵢ·n/X). Order-independence discipline: ln demands doubles,
    // and a double SUM is partial-aggregation-order dependent — so each
    // customer's term is rounded to MICRO units per row (a deterministic
    // function of the exact cells xᵢ, n, X — the q_embed_drift row-
    // staging) and the micro longs sum exactly. Zero-spend customers
    // cannot occur (a customer row exists only via an order); the n/X
    // factors arrive as one 1-row broadcast.
    "q_theil" -> ((s, dir) => {
      val x = spend(s, dir)
      val cells = x.agg(count(lit(1)).as("n"),
        sum(col("x").cast(DecimalType(38, 0))).as("tt"))
      x.crossJoin(broadcast(cells))
        .select(col("n"), col("tt"),
          round(expr(
            """1000000 * (CAST(x AS DOUBLE) / CAST(tt AS DOUBLE))
              |* ln(CAST(x AS DOUBLE) * CAST(n AS DOUBLE)
              |     / CAST(tt AS DOUBLE))""".stripMargin), 0)
            .cast("long").as("term_micro"))
        .groupBy(col("n"), col("tt"))
        .agg(sum(col("term_micro")).as("theil_micro"))
        .select(col("n").as("n_customers"),
          col("tt").cast("long").as("total_cents"), col("theil_micro"))
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_gini_spend" ->
      s"""WITH x AS ($sqlSpend),
         |cen AS (SELECT x AS v, COUNT(*) AS t FROM x GROUP BY 1),
         |cum AS (
         |  SELECT v, t,
         |    COALESCE(SUM(t) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS below
         |  FROM cen),
         |cells AS (
         |  SELECT SUM(t) AS n,
         |    SUM(CAST(v AS HUGEINT) * t) AS tt,
         |    SUM(CAST(v AS HUGEINT)
         |        * (below * t + (t * (t + 1)) // 2)) AS sr
         |  FROM cum)
         |SELECT CAST(n AS BIGINT) AS n_customers,
         |  CAST(tt AS BIGINT) AS total_cents,
         |  CAST((1000000 * (2 * sr - (CAST(n AS HUGEINT) + 1) * tt))
         |    // (CAST(n AS HUGEINT) * tt) AS BIGINT) AS gini_ppm
         |FROM cells""".stripMargin,

    "q_lorenz_spend" ->
      s"""WITH x AS ($sqlSpend),
         |cen AS (SELECT x AS v, COUNT(*) AS t FROM x GROUP BY 1),
         |cum AS (
         |  SELECT v, t,
         |    COALESCE(SUM(t) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS below,
         |    COALESCE(SUM(CAST(v AS HUGEINT) * t) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS xb
         |  FROM cen),
         |cells AS (SELECT SUM(t) AS n,
         |    SUM(CAST(v AS HUGEINT) * t) AS tt FROM cen),
         |grid AS (
         |  SELECT g.k, (g.k * cells.n) // 10 AS p, cells.tt
         |  FROM unnest(generate_series(1, 9)) AS g(k), cells)
         |SELECT CAST(grid.k AS BIGINT) AS k,
         |  CAST(grid.p AS BIGINT) AS n_poorest,
         |  CAST(cum.xb + CAST(cum.v AS HUGEINT) * (grid.p - cum.below)
         |    AS BIGINT) AS cum_cents,
         |  CAST((1000000 * (cum.xb
         |      + CAST(cum.v AS HUGEINT) * (grid.p - cum.below)))
         |    // grid.tt AS BIGINT) AS share_ppm
         |FROM cum JOIN grid
         |  ON cum.below < grid.p AND grid.p <= cum.below + cum.t
         |ORDER BY k""".stripMargin,

    "q_hhi" ->
      """WITH rev AS (
        |  SELECT p.p_brand,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS c
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1),
        |cells AS (
        |  SELECT COUNT(*) AS n_brands,
        |    SUM(CAST(c AS HUGEINT)) AS tt,
        |    SUM(CAST(c AS HUGEINT) * c) AS sq
        |  FROM rev),
        |top4 AS (
        |  SELECT SUM(CAST(c AS HUGEINT)) AS c4 FROM (
        |    SELECT c FROM rev ORDER BY c DESC, p_brand LIMIT 4))
        |SELECT CAST(n_brands AS BIGINT) AS n_brands,
        |  CAST(tt AS BIGINT) AS total_cents,
        |  CAST((1000000 * sq) // (tt * tt) AS BIGINT) AS hhi_ppm,
        |  CAST((1000000 * c4) // tt AS BIGINT) AS cr4_ppm
        |FROM cells, top4""".stripMargin,

    "q_benford_chi2" ->
      """WITH d AS (
        |  SELECT CAST(SUBSTR(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
        |      AS digit
        |  FROM (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |          AS BIGINT) AS cents FROM orders)
        |  WHERE cents > 0),
        |cells AS (SELECT digit, COUNT(*) AS n_obs FROM d GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS nt FROM d),
        |grid AS (SELECT g.digit FROM unnest(generate_series(1, 9))
        |         AS g(digit))
        |SELECT CAST(grid.digit AS BIGINT) AS digit,
        |  CAST(COALESCE(cells.n_obs, 0) AS BIGINT) AS n_obs,
        |  CAST((1000000 * COALESCE(cells.n_obs, 0)) // tot.nt AS BIGINT)
        |    AS obs_ppm,
        |  CAST(round(1000000 * ln(1.0 + 1.0 / grid.digit) / ln(10.0), 0)
        |    AS BIGINT) AS exp_ppm,
        |  round((CAST(COALESCE(cells.n_obs, 0) AS DOUBLE)
        |      - tot.nt * (ln(1.0 + 1.0 / grid.digit) / ln(10.0)))
        |    * (CAST(COALESCE(cells.n_obs, 0) AS DOUBLE)
        |      - tot.nt * (ln(1.0 + 1.0 / grid.digit) / ln(10.0)))
        |    / (tot.nt * (ln(1.0 + 1.0 / grid.digit) / ln(10.0))), 6)
        |    AS chi2_term
        |FROM grid LEFT JOIN cells ON cells.digit = grid.digit, tot
        |ORDER BY digit""".stripMargin,

    "q_chao1" ->
      s"""WITH tc AS (
         |  SELECT t.tok, COUNT(*) AS c
         |  FROM documents,
         |    unnest(${sqlWordNgrams("text", 3)}) AS t(tok)
         |  GROUP BY 1),
         |cells AS (
         |  SELECT COUNT(*) AS v_obs, SUM(c) AS n_tokens,
         |    SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
         |    SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
         |  FROM tc)
         |SELECT CAST(v_obs AS BIGINT) AS v_obs,
         |  CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
         |  CAST(1000 * v_obs
         |    + (1000 * f1 * f1) // NULLIF(2 * f2, 0) AS BIGINT)
         |    AS chao1_milli,
         |  CAST((1000000 * f1) // n_tokens AS BIGINT)
         |    AS missing_mass_ppm
         |FROM cells""".stripMargin,

    "q_js_divergence" ->
      s"""WITH e AS (
         |  SELECT epoch_us(ts) // $DayUs AS day, event_type FROM events),
         |mid AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS mid FROM e),
         |cells AS (
         |  SELECT event_type,
         |    SUM(CASE WHEN day < mid.mid THEN 1 ELSE 0 END) AS a,
         |    SUM(CASE WHEN day >= mid.mid THEN 1 ELSE 0 END) AS b
         |  FROM e, mid GROUP BY 1),
         |tot AS (SELECT SUM(a) AS at, SUM(b) AS bt FROM cells)
         |SELECT event_type, CAST(a AS BIGINT) AS n_base,
         |  CAST(b AS BIGINT) AS n_cur,
         |  round(
         |    0.5 * (CASE WHEN a = 0 THEN 0.0 ELSE
         |      (CAST(a AS DOUBLE) / at)
         |      * ln((CAST(a AS DOUBLE) / at)
         |           / ((CAST(a AS DOUBLE) / at
         |               + CAST(b AS DOUBLE) / bt) / 2.0)) END)
         |    + 0.5 * (CASE WHEN b = 0 THEN 0.0 ELSE
         |      (CAST(b AS DOUBLE) / bt)
         |      * ln((CAST(b AS DOUBLE) / bt)
         |           / ((CAST(a AS DOUBLE) / at
         |               + CAST(b AS DOUBLE) / bt) / 2.0)) END), 6)
         |    AS js_term
         |FROM cells, tot ORDER BY event_type""".stripMargin,

    "q_theil" ->
      s"""WITH x AS ($sqlSpend),
         |cells AS (SELECT COUNT(*) AS n,
         |    SUM(CAST(x AS HUGEINT)) AS tt FROM x),
         |terms AS (
         |  SELECT CAST(round(
         |    1000000 * (CAST(x.x AS DOUBLE) / CAST(cells.tt AS DOUBLE))
         |    * ln(CAST(x.x AS DOUBLE) * CAST(cells.n AS DOUBLE)
         |         / CAST(cells.tt AS DOUBLE)), 0) AS BIGINT)
         |      AS term_micro,
         |    cells.n, cells.tt
         |  FROM x, cells)
         |SELECT CAST(n AS BIGINT) AS n_customers,
         |  CAST(tt AS BIGINT) AS total_cents,
         |  CAST(SUM(term_micro) AS BIGINT) AS theil_micro
         |FROM terms GROUP BY n, tt""".stripMargin
  )
}
