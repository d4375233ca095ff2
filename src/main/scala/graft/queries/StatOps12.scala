package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.TextFunctions
import graft.operators.RangeBuckets
import graft.sources.Tables

/** Round-12 tranche 14: ordinal association and repeated-measures
  * agreement — Cochran's Q (did the k binary "treatments" — event-type
  * exposures — land on the same users, or do exposure rates genuinely
  * differ: the k-ary binary sibling of McNemar), Goodman-Kruskal γ +
  * both Somers' D directions (ordinal⇄ordinal association from one
  * concordant/discordant pair count — the rank-correlation family
  * member built for BANDED data, where Kendall's τ drowns in ties),
  * quadratic-weighted Cohen's κ (ordinal agreement where near-misses
  * cost (i−j)² — the multi-category successor of `q_cohen_kappa`), and
  * the Anderson-Darling uniformity test (the tail-weighted GOF screen
  * beside `q_ks_test` / `q_ecdf_band`: AD puts its power where KS has
  * none, at the distribution edges).
  *
  * Determinism discipline: every statistic closes from EXACT integer
  * cells — contingency tables are bounded band×band counts, pair
  * counts (C, D, tie masses) are exact products over those cells,
  * Cochran's cells are presence counts, and AD's per-distinct-value
  * `ln` terms are micro-floored ONCE then multiplied by exact
  * position-sum integers (never ln-per-row, never a double times a
  * > 2⁵³ integer). ppm readouts use trunc `div` ≡ HUGEINT `//`;
  * 6-dp doubles share expression text across engines.
  *
  * Scale posture: one corpus-keyed aggregate each (presence cells /
  * the band contingency / the value census); everything downstream is
  * bounded — band tables ≤ 24 cells, their pair joins O(cells²)
  * broadcast, the AD census flows through [[RangeBuckets.belowFrame]]
  * (bucketed cumsums, never a single-partition window). Envelopes
  * documented inline; all hold to ≥ 10⁸ rows.
  *
  * Degenerate-input stance (documented, unreachable at gate scales):
  * an all-concordant-free corpus zeroes γ's C+D divisor; a zero value
  * sends AD's ln(u) to −∞ (the corpus contract pins value > 0) —
  * Spark nulls/overflows, DuckDB errors: loud either way.
  */
object StatOps12 extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  /** Cochran's Q closing over exact cells: (k−1)(k·ΣC² − N²) /
    * (k·N − ΣR²). */
  private val cochranQ =
    """(CAST((k - 1) * (k * sum_c2 - n_total * n_total) AS DOUBLE)
      | / CAST(k * n_total - sum_r2 AS DOUBLE))"""
      .stripMargin.replaceAll("\\s+", " ")

  /** AD closing: A² = −n − (s1 + s2)/(10⁶·n) over the exact micro
    * cells, evaluated through the trunc-decomposition
    * (s1+s2)/10⁶ = t6 + r6/10⁶ with t6/r6 exact int64 (< 2⁵³): the raw
    * s1+s2 grows ∝ n² past 2⁵³ at sf0.1, where a direct
    * DECIMAL/HUGEINT→DOUBLE cast is exactly the not-correctly-rounded
    * conversion the r12 hash lesson banned — the decomposition keeps
    * every double operand exact and the closing arithmetic shared-text
    * identical on both engines. */
  private val adExpr =
    """(-CAST(n_events AS DOUBLE)
      | - (CAST(__t6 AS DOUBLE) + CAST(__r6 AS DOUBLE) / 1000000.0)
      |   / n_events)"""
      .stripMargin.replaceAll("\\s+", " ")

  override def defs: Map[String, Q] = Map[String, Q](

    // Cochran's Q over the users×event-types presence design: x(u,j) =
    // user u fired a HIGH-VALUE event of type j (value > 200 — the
    // right-skewed corpus puts ~p95 there — plain presence is degenerate
    // here: every user fires every type, all R_i = k, and the
    // kN − ΣR² divisor is exactly zero; the high-value cut restores
    // per-row variation, which is the situation the test exists for).
    // Column totals C_j, row totals R_i, N = ΣC = ΣR; Q = (k−1)(kΣC² −
    // N²) / (kN − ΣR²) ~ χ²_{k−1} under exchangeable exposure. ONE
    // corpus (user,type)-keyed dedup aggregate, then a k-row and a
    // user-row rollup. Envelope: ΣR² ≤ k²·n_users — exact far past 10⁹
    // users.
    "q_cochran_q" -> ((s, dir) => {
      val x = t(s, dir, "events")
        .filter(col("value") > 200.0)
        .select(col("user_id"), col("event_type")).distinct()
      val cj = x.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("k"), sum(col("c")).as("n_total"),
          sum(col("c") * col("c")).as("sum_c2"))
      val ri = x.groupBy(col("user_id")).agg(count(lit(1)).as("r"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("r") * col("r")).as("sum_r2"))
      broadcast(cj).crossJoin(broadcast(ri))
        .select(col("k"), col("n_users"), col("n_total"),
          col("sum_c2"), col("sum_r2"),
          round(expr(cochranQ), 6).as("q"))
    }),

    // Goodman-Kruskal gamma + Somers' D (both directions) between the
    // customer's balance band (the q_k_anonymity 200k-cent banding)
    // and the order-count band (0, 1, 2, 3+): concordant/discordant
    // pair masses from the ≤ |bands_x|·4-cell contingency's O(cells²)
    // broadcast self-join, tie masses from the marginals — all exact
    // integer pair arithmetic (C, D ≤ n²: DECIMAL(38,0)/HUGEINT to
    // n ≈ 10¹⁴). γ ignores ties; D_{Y|X} charges pairs untied on X;
    // D_{X|Y} the transpose. One orders count rollup + one customer
    // join; the left join zero-fills customers who never ordered.
    "q_gamma_somers" -> ((s, dir) => {
      val oc = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt"))
      val j = t(s, dir, "customer")
        .join(oc, col("c_custkey") === col("o_custkey"), "left")
        .select(
          expr("""(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                 | + 100000) div 200000""".stripMargin).as("x"),
          least(coalesce(col("cnt"), lit(0L)), lit(3L)).as("y"))
      val cells = j.groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("nn")).localCheckpoint()
      val cd = cells.as("a").join(broadcast(cells.as("b")),
          col("b.x") > col("a.x"))
        .agg(
          sum(when(col("b.y") > col("a.y"),
            col("a.nn").cast(DecimalType(38, 0)) * col("b.nn"))
            .otherwise(lit(0).cast(DecimalType(38, 0)))).as("cc"),
          sum(when(col("b.y") < col("a.y"),
            col("a.nn").cast(DecimalType(38, 0)) * col("b.nn"))
            .otherwise(lit(0).cast(DecimalType(38, 0)))).as("dd"))
      val tx = cells.groupBy(col("x")).agg(sum(col("nn")).as("nx"))
        .agg(sum(col("nx").cast(DecimalType(38, 0))
          * (col("nx") - 1) / 2).as("t_x"))
      val ty = cells.groupBy(col("y")).agg(sum(col("nn")).as("ny"))
        .agg(sum(col("ny").cast(DecimalType(38, 0))
          * (col("ny") - 1) / 2).as("t_y"))
      val nt = cells.agg(sum(col("nn")).as("n"))
      broadcast(cd).crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
        .crossJoin(broadcast(nt))
        .select(expr("CAST(cc AS BIGINT)").as("c_pairs"),
          expr("CAST(dd AS BIGINT)").as("d_pairs"),
          expr("CAST(t_x AS BIGINT)").as("ties_x"),
          expr("CAST(t_y AS BIGINT)").as("ties_y"), col("n"),
          expr("CAST((1000000 * (cc - dd)) div (cc + dd) AS BIGINT)")
            .as("gamma_ppm"),
          expr("""CAST((1000000 * (cc - dd))
            | div (CAST(n AS DECIMAL(38,0)) * (n - 1) / 2 - t_x)
            | AS BIGINT)""".stripMargin.replaceAll("\\s+", " "))
            .as("somers_d_yx_ppm"),
          expr("""CAST((1000000 * (cc - dd))
            | div (CAST(n AS DECIMAL(38,0)) * (n - 1) / 2 - t_y)
            | AS BIGINT)""".stripMargin.replaceAll("\\s+", " "))
            .as("somers_d_xy_ppm"))
    }),

    // Quadratic-weighted Cohen's kappa between two ordinal graders of
    // document length — the character band (n_chars div 150, cap 3)
    // vs the token band (tokens div 25, cap 3): κ_w = 1 − N·Σw·O /
    // Σw·r·c with w_ij = (i−j)² (the (k−1)² normalizer cancels).
    // Exact: one corpus token-count pass → a ≤ 16-cell contingency;
    // kappa_ppm = ⌊10⁶·(den − N·num) / den⌋ in pure integers.
    "q_kappa_weighted" -> ((s, dir) => {
      val g = t(s, dir, "documents")
        .select(col("n_chars"),
          TextFunctions.tokenCount(col("text")).cast("long").as("tc"))
        .select(least(expr("n_chars div 150"), lit(3L)).as("a"),
          least(expr("tc div 25"), lit(3L)).as("b"))
      val cells = g.groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("o")).localCheckpoint()
      val ra = cells.groupBy(col("a")).agg(sum(col("o")).as("ra"))
      val cb = cells.groupBy(col("b")).agg(sum(col("o")).as("cb"))
      val num = cells
        .agg(sum((col("a") - col("b")) * (col("a") - col("b"))
          * col("o")).as("num"), sum(col("o")).as("n"))
      val den = ra.crossJoin(broadcast(cb))
        .agg(sum((col("a") - col("b")) * (col("a") - col("b"))
          * col("ra").cast(DecimalType(38, 0)) * col("cb")).as("den"))
      broadcast(num).crossJoin(broadcast(den))
        .select(col("n").as("n_docs"), col("num").as("w_observed"),
          expr("CAST(den AS BIGINT)").as("w_expected_xn"),
          expr("""CAST((1000000 * (den - CAST(n AS DECIMAL(38,0)) * num))
            | div den AS BIGINT)""".stripMargin.replaceAll("\\s+", " "))
            .as("kappa_w_ppm"))
    }),

    // Anderson-Darling uniformity test of event values against
    // U[0, 600) — the tail-sensitive GOF beside q_ks_test: A² = −n −
    // (1/n)Σᵢ(2i−1)[ln uᵢ + ln(1−u_{n+1−i})]. Over the value census
    // with exact below-counts b (the belowFrame discipline), each
    // distinct value v of multiplicity t contributes the EXACT position
    // sums t(2b+t) and t(2(n−b)−t) times the ONCE-micro-floored ln
    // terms — the per-p-constant × multiplicity staging (q_log_loss),
    // so no double ever multiplies a > 2⁵³ integer. u = v/600000,
    // with the milli staging clamped into [1, 599999] on BOTH engines
    // (the sf0.1 corpus carries exact 0s and values to 560: a sub-milli
    // value would send ln(u) to -inf and an out-of-band one ln(1-u)
    // negative; the clamp pins them to the declared support's edges,
    // where they correctly register as extreme tail mass).
    "q_ad_uniform" -> ((s, dir) => {
      // round 18: lazy-checkpoint the value census — its belowFrame
      // fan-out re-executed the events scan 7× at sf0.01 (ScanCount;
      // AQE re-planning defeats exchange reuse across the consumers)
      val census = t(s, dir, "events").filter(col("value").isNotNull)
        .select(least(greatest((col("value").cast(DecimalType(18, 6))
          * 1000).cast("long"), lit(1L)), lit(599999L)).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("t"))
        .localCheckpoint(eager = false)
      val nn = census.agg(sum(col("t")).as("n_events"))
      RangeBuckets.belowFrame(census).crossJoin(broadcast(nn))
        .select(col("n_events"),
          (col("t") * (col("below") * 2 + col("t")))
            .cast(DecimalType(38, 0)).as("w1"),
          (col("t") * ((col("n_events") - col("below")) * 2 - col("t")))
            .cast(DecimalType(38, 0)).as("w2"),
          expr("""CAST(floor(1000000.0
            | * ln(CAST(v AS DOUBLE) / 600000.0) + 0.5) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("l1"),
          expr("""CAST(floor(1000000.0
            | * ln(1.0 - CAST(v AS DOUBLE) / 600000.0) + 0.5) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("l2"))
        .groupBy(col("n_events"))
        .agg(sum(col("w1") * col("l1")).as("s1d"),
          sum(col("w2") * col("l2")).as("s2d"))
        // position-weighted cells grow ∝ n² (2.6·2⁵³ already at sf0.1):
        // the BIGINT emit would overflow int64 near sf2 and the r14
        // sf0.1 headroom sweep rightly flags it — emit the diagnostics
        // div 10¹² (exact signed trunc both engines; sub-2⁵³/10 to
        // sf ≈ 2·10⁴) and close a2 through the exact t6/r6 split
        .select(col("n_events"),
          expr("CAST(s1d div 1000000000000 AS BIGINT)").as("s1_e12"),
          expr("CAST(s2d div 1000000000000 AS BIGINT)").as("s2_e12"),
          expr("CAST((s1d + s2d) div 1000000 AS BIGINT)").as("__t6"),
          expr("CAST((s1d + s2d) % 1000000 AS BIGINT)").as("__r6"))
        .select(col("n_events"), col("s1_e12"), col("s2_e12"),
          round(expr(adExpr), 6).as("a2"))
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_cochran_q" ->
      s"""WITH x AS (
         |  SELECT DISTINCT user_id, event_type FROM events
         |  WHERE value > 200.0),
         |cj AS (
         |  SELECT COUNT(*) AS k, SUM(c) AS n_total,
         |    SUM(c * c) AS sum_c2
         |  FROM (SELECT event_type, COUNT(*) AS c FROM x GROUP BY 1)),
         |ri AS (
         |  SELECT COUNT(*) AS n_users, SUM(r * r) AS sum_r2
         |  FROM (SELECT user_id, COUNT(*) AS r FROM x GROUP BY 1))
         |SELECT CAST(k AS BIGINT) AS k, CAST(n_users AS BIGINT) AS n_users,
         |  CAST(n_total AS BIGINT) AS n_total,
         |  CAST(sum_c2 AS BIGINT) AS sum_c2,
         |  CAST(sum_r2 AS BIGINT) AS sum_r2,
         |  round($cochranQ, 6) AS q
         |FROM cj, ri""".stripMargin,

    "q_gamma_somers" ->
      """WITH oc AS (
        |  SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY 1),
        |j AS (
        |  SELECT (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      + 100000) // 200000 AS x,
        |    LEAST(COALESCE(oc.cnt, 0), 3) AS y
        |  FROM customer c LEFT JOIN oc ON c.c_custkey = oc.o_custkey),
        |cells AS MATERIALIZED (
        |  SELECT x, y, COUNT(*) AS nn FROM j GROUP BY 1, 2),
        |cd AS (
        |  SELECT
        |    SUM(CASE WHEN b.y > a.y
        |      THEN CAST(a.nn AS HUGEINT) * b.nn ELSE 0 END) AS cc,
        |    SUM(CASE WHEN b.y < a.y
        |      THEN CAST(a.nn AS HUGEINT) * b.nn ELSE 0 END) AS dd
        |  FROM cells a JOIN cells b ON b.x > a.x),
        |tx AS (
        |  SELECT SUM(CAST(nx AS HUGEINT) * (nx - 1) // 2) AS t_x
        |  FROM (SELECT x, SUM(nn) AS nx FROM cells GROUP BY 1)),
        |ty AS (
        |  SELECT SUM(CAST(ny AS HUGEINT) * (ny - 1) // 2) AS t_y
        |  FROM (SELECT y, SUM(nn) AS ny FROM cells GROUP BY 1)),
        |nt AS (SELECT SUM(nn) AS n FROM cells)
        |SELECT CAST(cc AS BIGINT) AS c_pairs, CAST(dd AS BIGINT) AS d_pairs,
        |  CAST(t_x AS BIGINT) AS ties_x, CAST(t_y AS BIGINT) AS ties_y,
        |  CAST(n AS BIGINT) AS n,
        |  CAST((1000000 * (cc - dd)) // (cc + dd) AS BIGINT) AS gamma_ppm,
        |  CAST((1000000 * (cc - dd))
        |    // (CAST(n AS HUGEINT) * (n - 1) // 2 - t_x) AS BIGINT)
        |    AS somers_d_yx_ppm,
        |  CAST((1000000 * (cc - dd))
        |    // (CAST(n AS HUGEINT) * (n - 1) // 2 - t_y) AS BIGINT)
        |    AS somers_d_xy_ppm
        |FROM cd, tx, ty, nt""".stripMargin,

    "q_kappa_weighted" -> {
      val toks = TextFunctions.sqlTokens("text")
      s"""WITH g AS (
         |  SELECT LEAST(n_chars // 150, 3) AS a,
         |    LEAST(len($toks) // 25, 3) AS b
         |  FROM documents),
         |cells AS MATERIALIZED (
         |  SELECT a, b, COUNT(*) AS o FROM g GROUP BY 1, 2),
         |ra AS (SELECT a, SUM(o) AS ra FROM cells GROUP BY 1),
         |cb AS (SELECT b, SUM(o) AS cb FROM cells GROUP BY 1),
         |num AS (
         |  SELECT SUM((a - b) * (a - b) * o) AS num, SUM(o) AS n
         |  FROM cells),
         |den AS (
         |  SELECT SUM((ra.a - cb.b) * (ra.a - cb.b)
         |    * CAST(ra.ra AS HUGEINT) * cb.cb) AS den
         |  FROM ra, cb)
         |SELECT CAST(n AS BIGINT) AS n_docs,
         |  CAST(num AS BIGINT) AS w_observed,
         |  CAST(den AS BIGINT) AS w_expected_xn,
         |  CAST((1000000 * (den - CAST(n AS HUGEINT) * num)) // den
         |    AS BIGINT) AS kappa_w_ppm
         |FROM num, den""".stripMargin
    },

    "q_ad_uniform" ->
      s"""WITH census AS (
        |  SELECT LEAST(GREATEST(CAST(CAST(value AS DECIMAL(18,6))
        |      * 1000 AS BIGINT), 1), 599999) AS v,
        |    COUNT(*) AS t
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |nn AS (SELECT SUM(t) AS n_events FROM census),
        |cum AS (
        |  SELECT v, t,
        |    COALESCE(SUM(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS below
        |  FROM census),
        |cells AS (
        |  SELECT nn.n_events,
        |    SUM(CAST(t * (2 * below + t) AS HUGEINT)
        |      * CAST(floor(1000000.0 * ln(CAST(v AS DOUBLE) / 600000.0)
        |          + 0.5) AS BIGINT)) AS s1d,
        |    SUM(CAST(t * (2 * (nn.n_events - below) - t) AS HUGEINT)
        |      * CAST(floor(1000000.0
        |          * ln(1.0 - CAST(v AS DOUBLE) / 600000.0) + 0.5)
        |        AS BIGINT)) AS s2d
        |  FROM cum, nn GROUP BY 1),
        |split AS (
        |  SELECT n_events,
        |    CAST(s1d // CAST(1000000000000 AS HUGEINT) AS BIGINT)
        |      AS s1_e12,
        |    CAST(s2d // CAST(1000000000000 AS HUGEINT) AS BIGINT)
        |      AS s2_e12,
        |    CAST((s1d + s2d) // CAST(1000000 AS HUGEINT) AS BIGINT)
        |      AS __t6,
        |    CAST((s1d + s2d) % CAST(1000000 AS HUGEINT) AS BIGINT)
        |      AS __r6
        |  FROM cells)
        |SELECT CAST(n_events AS BIGINT) AS n_events,
        |  s1_e12, s2_e12,
        |  round($adExpr, 6) AS a2
        |FROM split""".stripMargin
  )
}
