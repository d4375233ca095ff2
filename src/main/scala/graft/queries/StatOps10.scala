package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Round-12 tranche 9: reliability and inter-rater agreement — the
  * measurement-quality statistics a labeling/annotation pipeline runs on
  * its raters and instruments. Cronbach's α (internal consistency of a
  * multi-item score: do the per-event-type value channels measure one
  * underlying user trait?), Kendall's W + Friedman's χ² (concordance of
  * m raters ranking n items: do the nations agree on the brand revenue
  * ranking?), and the 2×2 odds-ratio/risk-ratio readout with the Woolf
  * confidence interval (the epidemiology-style exposure⇄outcome audit,
  * the effect-size sibling of `q_chi2`).
  *
  * These generalize the reference's per-table audit posture
  * (/root/reference/src/from-ground-up.js:303-357 declares fixed per-
  * table column contracts; agreement stats are the same contract idea
  * applied to raters/items instead of columns) into the survey's §2.13
  * statistical-testing surface.
  *
  * Determinism discipline ([[Parity]], the StatOps6 precedent): every
  * corpus-sized reduction is an exact-integer aggregate (milli-values /
  * cents / counts / doubled midranks through DECIMAL(38,0)); ppm
  * readouts close in pure integer `div` (Spark `div` ≡ DuckDB HUGEINT
  * `//`, both trunc); `ln`/`exp`/`sqrt` appear only in closing formulas
  * over exact small cells with IDENTICAL shared expression text on both
  * engines.
  *
  * Scale posture: each query is one (or one chain of) corpus-keyed
  * aggregate(s) followed by bounded-cardinality work — α's item frame is
  * ≤ |event_type| = 5 rows; W's design matrix is |nation|×|brand| = 625
  * rows (windows partition BY NATION, never a single partition); the
  * odds-ratio contingency is 1 row. DECIMAL(38,0) envelopes documented
  * per query; all hold to ≥ 10⁹ rows.
  *
  * Degenerate-input stance (documented, unreachable at gate scales,
  * per the round-12 stance note in COVERAGE.md): a single-item corpus
  * (k = 1) zeroes α's (k−1) divisor; an all-tied rater zeroes W's
  * denominator; an empty 2×2 cell nulls the odds ratio's ln — Spark
  * nulls/errors, DuckDB errors: loud either way.
  */
object StatOps10 extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  /** cents-exact long from a 2-dp money column (the shared staging). */
  /** The zero-filled 25×25 nation×brand revenue design (cents) — the
    * shared rating frame behind q_kendall_w and q_icc: one corpus
    * aggregate joined onto the bounded nation×brand spine. */
  private def nbDesign(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_orderkey"),
      col("l_partkey"), cents(col("l_extendedprice")).as("c"))
    val o = t(s, dir, "orders").select(col("o_orderkey"),
      col("o_custkey"))
    val cu = t(s, dir, "customer").select(col("c_custkey"),
      col("c_nationkey"))
    val p = t(s, dir, "part").select(col("p_partkey"), col("p_brand"))
    val rev = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cu, col("o_custkey") === col("c_custkey"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("c_nationkey").as("nk"), col("p_brand").as("brand"))
      .agg(sum(col("c")).as("cents"))
      .select(col("nk"), col("brand"), col("cents"))
    val nat = t(s, dir, "nation").select(col("n_nationkey").as("nk"))
    val br = p.select(col("p_brand").as("brand")).distinct()
    nat.crossJoin(broadcast(br))
      .join(rev, Seq("nk", "brand"), "left")
      .select(col("nk"), col("brand"),
        coalesce(col("cents"), lit(0L)).as("cents"))
  }

  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast(DecimalType(18, 2)) * 100).cast("long")

  // -- shared closing-formula texts (interpolated into BOTH engines) ----

  /** Woolf 95% CI for the odds ratio: exp(ln(ad/bc) ± 1.96·se),
    * se = √(1/a + 1/b + 1/c + 1/d) — closing doubles over 4 exact
    * counts. */
  private val orExpr =
    "(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))"
  private val seExpr =
    "sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)"
  private val rrExpr =
    """((CAST(a AS DOUBLE) / (CAST(a AS DOUBLE) + b))
      | / (CAST(c AS DOUBLE) / (CAST(c AS DOUBLE) + d)))"""
      .stripMargin.replaceAll("\\s+", " ")

  override def defs: Map[String, Q] = Map[String, Q](

    // Cronbach's alpha over the events "instrument": subjects = users,
    // items = the 5 event-type value channels, item score x(u,i) =
    // Σ value_milli (absent pairs are zero scores — the zero-fill is
    // implicit: population variance cells over ALL N users equal the
    // present-user sums because absent users contribute 0 to Σx and
    // Σx²). α = k/(k−1)·(1 − Σᵢσ²ᵢ/σ²_tot); with population variances
    // over the common denominator N², the ratio reduces to exact
    // integers: Dᵢ = N·Σx² − (Σx)², D_t likewise over user totals, and
    // alpha_ppm = ⌊10⁶·k·(D_t − ΣDᵢ) / ((k−1)·D_t)⌋. Plan: ONE corpus
    // (user,item)-keyed aggregate, then a user-keyed total aggregate and
    // a 5-row item frame — no window anywhere. Envelope: x ≲ 10⁷ milli
    // per cell ⇒ N·Σx² ≲ 10²¹·N — exact in DECIMAL(38,0)/HUGEINT to
    // N ≈ 10¹⁷ users.
    "q_cronbach_alpha" -> ((s, dir) => {
      val e = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("user_id"), col("event_type"),
          (col("value").cast(DecimalType(18, 6)) * 1000)
            .cast("long").as("vm"))
      val cell = e.groupBy(col("user_id"), col("event_type"))
        .agg(sum(col("vm")).as("x"))
        // round 18: census leaf (ScanCount: the fan-out re-ran the
        // fact scan per consumer; see OPTIMIZATION_r18.md)
        .localCheckpoint(eager = false)
      val tcells = cell.groupBy(col("user_id"))
        .agg(sum(col("x")).as("tot"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("tot").cast(DecimalType(38, 0))).as("st"),
          sum(col("tot").cast(DecimalType(38, 0)) * col("tot")).as("qt"))
      val items = cell.groupBy(col("event_type"))
        .agg(sum(col("x").cast(DecimalType(38, 0))).as("si"),
          sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("qi"))
        .crossJoin(broadcast(tcells))
        .select((col("n_users") * col("qi")
          - col("si") * col("si")).as("dnum"))
        .agg(count(lit(1)).as("k_items"), sum(col("dnum")).as("di"))
      broadcast(items).crossJoin(broadcast(tcells))
        .select(col("k_items"), col("n_users"),
          (col("n_users") * col("qt") - col("st") * col("st")).as("dt"),
          col("di"))
        .select(col("k_items"), col("n_users"),
          expr("""CAST((1000000 * k_items * (dt - di))
            | div ((k_items - 1) * dt) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("alpha_ppm"))
    }),

    // Kendall's W (coefficient of concordance) + Friedman's χ²: raters =
    // the 25 customer nations, items = the 25 part brands, rating = the
    // brand's revenue cents within the nation (zero-filled to the
    // complete 625-cell design via the bounded nation×brand spine —
    // both sides are dims, the crossJoin broadcasts one). Midranks with
    // ties stay exact in DOUBLED units (the q_mann_whitney staging):
    // mr2 = 2·below + t + 1 per (nation, value) census cell, rank sums
    // R2ⱼ = Σ_raters mr2, S×4 = Σⱼ(R2ⱼ − m(n+1))², and with the per-
    // rater tie term T = ΣΣ(t³−t), w_ppm = ⌊10⁶·3·S4 / (m²(n³−n) −
    // m·T)⌋ — pure integers end to end. Friedman's χ² = m(n−1)·W closes
    // in doubles over the same cells. Plan: the corpus joins are keyed
    // equi-joins (lineitem⋈orders⋈customer⋈part); everything after the
    // (nation,brand) aggregate is 625 rows, windows PARTITIONED BY
    // NATION. Envelope: R2 ≤ m·(2n+1) ≈ 1275, S4 ≤ n·(m·n)⁴ — exact to
    // dims of thousands.
    "q_kendall_w" -> ((s, dir) => {
      // round 18: the 625-cell design leaf — census and rank-sum join
      // each re-ran the 4-table revenue join otherwise (ScanCount: part
      // 8x at sf0.01)
      val full = nbDesign(s, dir).localCheckpoint(eager = false)
      val nat = t(s, dir, "nation").select(col("n_nationkey").as("nk"))
      val br = t(s, dir, "part").select(col("p_brand").as("brand"))
        .distinct()
      val census = full.groupBy(col("nk"), col("cents"))
        .agg(count(lit(1)).as("tv"))
      val w = Window.partitionBy(col("nk")).orderBy(col("cents"))
      val mr = census.withColumn("cum", sum(col("tv")).over(w))
        .select(col("nk"), col("cents"),
          (lit(2L) * (col("cum") - col("tv")) + col("tv") + 1).as("mr2"),
          col("tv"))
      val m = nat.agg(count(lit(1)).as("m"))
      val n = br.agg(count(lit(1)).as("n"))
      val ties = mr
        .agg(sum(col("tv") * col("tv") * col("tv") - col("tv")).as("ties"))
      val rsum = full.join(mr.select(col("nk"), col("cents"), col("mr2")),
          Seq("nk", "cents"))
        .groupBy(col("brand")).agg(sum(col("mr2")).as("r2"))
      val s4 = rsum.crossJoin(broadcast(m)).crossJoin(broadcast(n))
        .select(((col("r2") - col("m") * (col("n") + 1))
          * (col("r2") - col("m") * (col("n") + 1))).as("d2"))
        .agg(sum(col("d2")).as("s4"))
      broadcast(m).crossJoin(broadcast(n)).crossJoin(broadcast(ties))
        .crossJoin(broadcast(s4))
        .select(col("m").as("m_raters"), col("n").as("n_items"),
          col("s4"), col("ties"),
          expr("""CAST((1000000 * 3 * s4)
            | div (m * m * (n * n * n - n) - m * ties) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("w_ppm"))
        .select(col("m_raters"), col("n_items"), col("s4"), col("ties"),
          col("w_ppm"),
          round(expr("""(CAST(m_raters AS DOUBLE) * (n_items - 1)
            | * w_ppm / 1000000.0)"""
            .stripMargin.replaceAll("\\s+", " ")), 6).as("friedman_chi2"))
    }),

    // 2×2 odds ratio with the Woolf CI: exposure = the BUILDING market
    // segment, outcome = a fully-shipped order (status F). Cells a..d
    // are ONE conditional aggregate over the orders⋈customer keyed join;
    // OR = ad/bc, RR = (a/(a+b))/(c/(c+d)), 95% CI = exp(ln OR ±
    // 1.96·√(1/a+1/b+1/c+1/d)) — ln/exp/√ only over the 4 exact counts,
    // shared expression text. The effect-size companion every q_chi2-
    // style significance readout needs at 100 TB (where EVERYTHING is
    // significant and only effect sizes matter).
    "q_odds_ratio" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_custkey"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("out"))
      val cu = t(s, dir, "customer").select(col("c_custkey"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L)
          .as("exp"))
      o.join(cu, col("o_custkey") === col("c_custkey"))
        .agg(
          sum(col("exp") * col("out")).as("a"),
          sum(col("exp") * (lit(1L) - col("out"))).as("b"),
          sum((lit(1L) - col("exp")) * col("out")).as("c"),
          sum((lit(1L) - col("exp")) * (lit(1L) - col("out"))).as("d"))
        .select(col("a"), col("b"), col("c"), col("d"),
          round(expr(orExpr), 6).as("odds_ratio"),
          round(expr(rrExpr), 6).as("risk_ratio"),
          round(expr(s"exp(ln($orExpr) - 1.96 * $seExpr)"), 6).as("ci_lo"),
          round(expr(s"exp(ln($orExpr) + 1.96 * $seExpr)"), 6).as("ci_hi"))
    }),

    // Intraclass correlation ICC(1) (round-13 session 3) — "how much
    // of a brand's revenue variance is the BRAND rather than the
    // nation?" — the continuous-agreement sibling of Kendall's W over
    // the SAME zero-filled nation×brand design ([[nbDesign]]): one-way
    // ANOVA cells per brand (the q_anova_f staging, k = 25 ratings per
    // group by construction), SSB/SSW as exact DECIMAL integers
    // (emitted in KILOdollars² — div 10¹⁰ — per the r13 2⁵³ output
    // contract: these cells grow as sf² and dollars² would cross 2⁵³
    // near sf1), and
    // ICC = (MSB − MSW)/(MSB + (k−1)MSW) cleared of every divisor:
    // icc_ppm = 10⁶·(n(k−1)·SSB − (n−1)·SSW) div
    //           (n(k−1)·SSB + (k−1)(n−1)·SSW) — signed trunc on both
    // engines. Envelope: 10⁶·nk·SS ≈ 10²⁶ at sf0.1 — DECIMAL-exact
    // to ~10⁶× gate scale.
    "q_icc" -> ((s, dir) => {
      val full = nbDesign(s, dir)
      val g = full.groupBy(col("brand")).agg(
        count(lit(1)).as("kg"),
        sum(col("cents").cast(DecimalType(38, 0))).as("sg"),
        sum(col("cents").cast(DecimalType(38, 0)) * col("cents"))
          .as("qg"))
      g.select(col("kg"), col("sg"), col("qg"),
          expr("""CAST((sg * sg - (sg * sg) % CAST(kg AS DECIMAL(38,0)))
            | / CAST(kg AS DECIMAL(38,0)) AS DECIMAL(38,0))"""
            .stripMargin.replaceAll("\\s+", " ")).as("t2g"))
        .agg(count(lit(1)).as("n_brands"), sum(col("kg")).as("nk_tot"),
          sum(col("sg")).as("s"), sum(col("qg")).as("q"),
          sum(col("t2g")).as("w"))
        .select(col("n_brands"),
          expr("nk_tot div n_brands").as("k_raters"),
          expr("""CAST(w - (s * s - (s * s) % CAST(nk_tot AS DECIMAL(38,0)))
            | / CAST(nk_tot AS DECIMAL(38,0)) AS DECIMAL(38,0))"""
            .stripMargin.replaceAll("\\s+", " ")).as("ssb"),
          expr("CAST(q - w AS DECIMAL(38,0))").as("ssw"))
        .select(col("n_brands"), col("k_raters"),
          expr("ssb div 10000000000").as("ssb_kd2"),
          expr("ssw div 10000000000").as("ssw_kd2"),
          expr("""CAST((1000000 * (CAST(n_brands AS DECIMAL(38,0))
            | * (k_raters - 1) * ssb - (n_brands - 1) * ssw))
            | div (CAST(n_brands AS DECIMAL(38,0)) * (k_raters - 1) * ssb
            |      + (CAST(k_raters AS DECIMAL(38,0)) - 1)
            |        * (n_brands - 1) * ssw) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("icc_ppm"))
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_cronbach_alpha" ->
      """WITH cell AS (
        |  SELECT user_id, event_type,
        |    SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000 AS BIGINT))
        |      AS x
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |tc AS (
        |  SELECT COUNT(*) AS n_users,
        |    SUM(CAST(tot AS HUGEINT)) AS st,
        |    SUM(CAST(tot AS HUGEINT) * tot) AS qt
        |  FROM (SELECT user_id, SUM(x) AS tot FROM cell GROUP BY 1)),
        |ic AS (
        |  SELECT event_type, SUM(CAST(x AS HUGEINT)) AS si,
        |    SUM(CAST(x AS HUGEINT) * x) AS qi
        |  FROM cell GROUP BY 1),
        |it AS (
        |  SELECT COUNT(*) AS k_items,
        |    SUM(tc.n_users * ic.qi - ic.si * ic.si) AS di
        |  FROM ic, tc)
        |SELECT CAST(it.k_items AS BIGINT) AS k_items,
        |  CAST(tc.n_users AS BIGINT) AS n_users,
        |  CAST((1000000 * it.k_items
        |      * ((tc.n_users * tc.qt - tc.st * tc.st) - it.di))
        |    // ((it.k_items - 1) * (tc.n_users * tc.qt - tc.st * tc.st))
        |    AS BIGINT) AS alpha_ppm
        |FROM it, tc""".stripMargin,

    "q_kendall_w" ->
      """WITH rev AS (
        |  SELECT c.c_nationkey AS nk, p.p_brand AS brand,
        |    SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS cents
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |nat AS (SELECT n_nationkey AS nk FROM nation),
        |br AS (SELECT DISTINCT p_brand AS brand FROM part),
        |full0 AS (
        |  SELECT nat.nk, br.brand, COALESCE(rev.cents, 0) AS cents
        |  FROM nat CROSS JOIN br
        |  LEFT JOIN rev ON rev.nk = nat.nk AND rev.brand = br.brand),
        |census AS (
        |  SELECT nk, cents, COUNT(*) AS tv FROM full0 GROUP BY 1, 2),
        |mr AS (
        |  SELECT nk, cents, tv,
        |    2 * (SUM(tv) OVER (PARTITION BY nk ORDER BY cents) - tv)
        |      + tv + 1 AS mr2
        |  FROM census),
        |m AS (SELECT COUNT(*) AS m FROM nat),
        |n AS (SELECT COUNT(*) AS n FROM br),
        |ties AS (SELECT SUM(tv * tv * tv - tv) AS ties FROM mr),
        |rsum AS (
        |  SELECT f.brand, SUM(mr.mr2) AS r2
        |  FROM full0 f JOIN mr ON mr.nk = f.nk AND mr.cents = f.cents
        |  GROUP BY 1),
        |s4 AS (
        |  SELECT SUM(CAST(r2 - m.m * (n.n + 1) AS HUGEINT)
        |    * (r2 - m.m * (n.n + 1))) AS s4
        |  FROM rsum, m, n)
        |SELECT CAST(m.m AS BIGINT) AS m_raters,
        |  CAST(n.n AS BIGINT) AS n_items,
        |  CAST(s4.s4 AS BIGINT) AS s4, CAST(ties.ties AS BIGINT) AS ties,
        |  CAST((1000000 * 3 * s4.s4)
        |    // (m.m * m.m * (CAST(n.n AS HUGEINT) * n.n * n.n - n.n)
        |       - m.m * ties.ties) AS BIGINT) AS w_ppm,
        |  round((CAST(m.m AS DOUBLE) * (n.n - 1)
        |    * (CAST((1000000 * 3 * s4.s4)
        |        // (m.m * m.m * (CAST(n.n AS HUGEINT) * n.n * n.n - n.n)
        |           - m.m * ties.ties) AS BIGINT)) / 1000000.0), 6)
        |    AS friedman_chi2
        |FROM m, n, ties, s4""".stripMargin,

    "q_odds_ratio" ->
      s"""WITH cells AS (
         |  SELECT
         |    SUM(CASE WHEN c.c_mktsegment = 'BUILDING'
         |      AND o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS a,
         |    SUM(CASE WHEN c.c_mktsegment = 'BUILDING'
         |      AND o.o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS b,
         |    SUM(CASE WHEN c.c_mktsegment <> 'BUILDING'
         |      AND o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS c,
         |    SUM(CASE WHEN c.c_mktsegment <> 'BUILDING'
         |      AND o.o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS d
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
         |SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
         |  CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
         |  round($orExpr, 6) AS odds_ratio,
         |  round($rrExpr, 6) AS risk_ratio,
         |  round(exp(ln($orExpr) - 1.96 * $seExpr), 6) AS ci_lo,
         |  round(exp(ln($orExpr) + 1.96 * $seExpr), 6) AS ci_hi
         |FROM cells""".stripMargin,

    "q_icc" ->
      """WITH rev AS (
        |  SELECT c.c_nationkey AS nk, p.p_brand AS brand,
        |    SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS cents
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |nat AS (SELECT n_nationkey AS nk FROM nation),
        |br AS (SELECT DISTINCT p_brand AS brand FROM part),
        |full0 AS (
        |  SELECT nat.nk, br.brand, COALESCE(rev.cents, 0) AS cents
        |  FROM nat CROSS JOIN br
        |  LEFT JOIN rev ON rev.nk = nat.nk AND rev.brand = br.brand),
        |g AS (
        |  SELECT brand, COUNT(*) AS kg,
        |    SUM(CAST(cents AS HUGEINT)) AS sg,
        |    SUM(CAST(cents AS HUGEINT) * cents) AS qg
        |  FROM full0 GROUP BY 1),
        |cells AS (
        |  SELECT COUNT(*) AS n_brands, SUM(kg) AS nk_tot,
        |    SUM(sg) AS s, SUM(qg) AS q,
        |    SUM((sg * sg) // CAST(kg AS HUGEINT)) AS w
        |  FROM g),
        |ss AS (
        |  SELECT CAST(n_brands AS BIGINT) AS n_brands,
        |    CAST(nk_tot // n_brands AS BIGINT) AS k_raters,
        |    w - (s * s) // CAST(nk_tot AS HUGEINT) AS ssb,
        |    q - w AS ssw
        |  FROM cells)
        |SELECT n_brands, k_raters,
        |  CAST(ssb // 10000000000 AS BIGINT) AS ssb_kd2,
        |  CAST(ssw // 10000000000 AS BIGINT) AS ssw_kd2,
        |  CAST((1000000 * (CAST(n_brands AS HUGEINT) * (k_raters - 1)
        |      * ssb - (n_brands - 1) * ssw))
        |    // (CAST(n_brands AS HUGEINT) * (k_raters - 1) * ssb
        |       + (CAST(k_raters AS HUGEINT) - 1) * (n_brands - 1) * ssw)
        |    AS BIGINT) AS icc_ppm
        |FROM ss""".stripMargin
  )
}
