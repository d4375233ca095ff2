package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Round-13 tranche 2: study-design operators — the causal-matching and
  * sampling-design steps that sit UPSTREAM of the existing effect
  * estimators (q_did, q_cuped, q_ab_experiment):
  *
  *  - `q_cem_att` — coarsened-exact-matching ATT: match urgent orders
  *    (treated) to non-urgent (control) within exact line-count strata,
  *    discard unmatched strata (the standard CEM pruning, COUNTED so
  *    the discard is observable), and close the average treatment
  *    effect on the treated from exact per-stratum cells. The honest
  *    alternative to a naive treated-vs-control mean gap when the
  *    confounder (order size) is observable.
  *  - `q_neyman_alloc` — optimal stratified-sample allocation
  *    n_h ∝ N_h·σ_h over the market segments: the sampling-design twin
  *    of the existing πps/stratified samplers; σ_h = ⌊√(exact truncated
  *    variance)⌋ (IEEE sqrt of a < 2⁵³ integer is correctly rounded
  *    and therefore engine-identical; a perfect square hits the exact
  *    integer, so the floor can never straddle engines).
  *
  * Both collapse the corpus to ≤|strata| exact integer cells in one
  * keyed aggregate; everything downstream is dim-sized arithmetic.
  */
object DesignOps extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  private val Budget = 1000L // total sample size to allocate

  override def defs: Map[String, Q] = Map[String, Q](

    // CEM ATT of order urgency on order value (cents), strata = exact
    // lineitem count: per stratum (nt, st, nc, sc) from ONE aggregate;
    // per-stratum contribution nt·(ȳt − ȳc) staged micro-exact as
    // (10⁶·(st·nc − nt·sc)) div nc (DECIMAL; one floor per stratum);
    // ATT = Σ div Nt_matched in micro-cents. Strata with no control
    // (or no treated) drop WHOLE; n_unmatched_treated reports the
    // pruned mass — a CEM estimate that hides its pruning is not an
    // estimate. Envelope: 10⁶·st·nc ≤ 10⁶·(Σy)·n — DECIMAL-exact to
    // ~10¹² orders.
    "q_cem_att" -> ((s, dir) => {
      val strata = t(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L).as("tr"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("y"))
        .join(t(s, dir, "lineitem")
            .groupBy(col("l_orderkey").as("o_orderkey"))
            .agg(count(lit(1)).as("stratum")),
          Seq("o_orderkey"))
        .groupBy(col("stratum"))
        .agg(sum(col("tr")).as("nt"),
          sum(col("tr") * col("y").cast(DecimalType(38, 0))).as("st"),
          sum(lit(1L) - col("tr")).as("nc"),
          sum((lit(1L) - col("tr"))
            * col("y").cast(DecimalType(38, 0))).as("sc"))
      val matched = strata.filter(col("nt") > 0 && col("nc") > 0)
        .select(col("nt"),
          // subtract-remainder exact division keeps the per-stratum
          // contribution in DECIMAL (a plain `div` lands in BIGINT,
          // whose ceiling the 10⁶-staged cell can graze at ~sf1);
          // signed % is trunc-signed on both engines ≡ HUGEINT //
          expr("""CAST((1000000 * (st * nc - CAST(nt AS DECIMAL(38,0))
            | * sc) - (1000000 * (st * nc - CAST(nt AS DECIMAL(38,0))
            | * sc)) % nc) / nc AS DECIMAL(38,0))"""
            .stripMargin.replaceAll("\\s+", " ")).as("contrib"))
        .agg(sum(col("nt")).as("nt_matched"),
          sum(col("contrib")).as("csum"))
      val unmatched = strata.filter(col("nc") === 0)
        .agg(coalesce(sum(col("nt")), lit(0L)).as("n_unmatched_treated"))
      matched.crossJoin(broadcast(unmatched))
        .select(col("nt_matched"), col("n_unmatched_treated"),
          expr("CAST(csum div nt_matched AS BIGINT)").as("att_micro"))
    }),

    // Mantel-Haenszel pooled odds ratio (round-13 session 3) — the
    // stratified 2×2 companion to q_cem_att: exposure = urgent
    // priority, outcome = order total above the global lower median,
    // strata = line count. OR_MH = Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ) with each
    // stratum ratio nano-floored ONCE ((10⁹·a·d) div n — unit
    // resolution against ratios of ~10³, declared), the closing ratio
    // one exact ppm division; the CRUDE (stratum-ignoring) OR rides
    // along so the confounding readout |OR_MH − OR_crude| is one
    // glance. One corpus census + one ≤7-row stratum frame.
    "q_mantel_haenszel" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("e"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
      // round 18: census leaf (ScanCount: the median's belowFrame
      // fan-out re-ran the orders scan 8x at sf0.01; see
      // OPTIMIZATION_r18.md)
      val census = o.groupBy(col("cents")).agg(count(lit(1)).as("tv"))
        .localCheckpoint(eager = false)
      val nn = census.agg(sum(col("tv")).as("n"))
      val med = graft.operators.RangeBuckets.belowFrame(
          census.select(col("cents").as("v"), col("tv").as("t")))
        .crossJoin(broadcast(nn))
        .filter(col("below") + col("t") >= expr("(n + 1) div 2"))
        .agg(min(col("v")).as("med"))
      val strata = o.crossJoin(broadcast(med))
        .select(col("o_orderkey"), col("e"),
          when(col("cents") > col("med"), 1L).otherwise(0L).as("y"))
        .join(t(s, dir, "lineitem")
            .groupBy(col("l_orderkey").as("o_orderkey"))
            .agg(count(lit(1)).as("stratum")),
          Seq("o_orderkey"))
        .groupBy(col("stratum"))
        .agg(sum(col("e") * col("y")).as("a"),
          sum(col("e") * (lit(1L) - col("y"))).as("b"),
          sum((lit(1L) - col("e")) * col("y")).as("c"),
          sum((lit(1L) - col("e")) * (lit(1L) - col("y"))).as("d"),
          count(lit(1)).as("ni"))
      strata
        .agg(count(lit(1)).as("n_strata"),
          sum(col("a")).as("ta"), sum(col("b")).as("tb"),
          sum(col("c")).as("tc"), sum(col("d")).as("td"),
          sum(expr(
            "(1000000000 * CAST(a AS DECIMAL(38,0)) * d) div ni"))
            .as("r"),
          sum(expr(
            "(1000000000 * CAST(b AS DECIMAL(38,0)) * c) div ni"))
            .as("q"))
        .select(col("n_strata"), col("r").as("r_nano"),
          col("q").as("s_nano"),
          expr("""CAST((1000000 * CAST(r AS DECIMAL(38,0))) div q
            | AS BIGINT)""".stripMargin.replaceAll("\\s+", " "))
            .as("or_mh_ppm"),
          expr("""CAST((1000000 * CAST(ta AS DECIMAL(38,0)) * td)
            | div (CAST(tb AS DECIMAL(38,0)) * tc) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("or_crude_ppm"))
    }),

    // Neyman allocation of a 1000-row sample across market segments:
    // n_h = (B·N_h·s_h) div Σ(N_h·s_h), s_h = ⌊√var_h⌋ in cents.
    // Cells: one segment-keyed aggregate (n, Σx, Σx²) → truncated
    // exact variance (the q_grubbs staging); the allocation readout
    // is ≤5 rows. Floor losses make Σn_h ≤ B by ≤ |strata| — the
    // standard largest-remainder top-up is a consumer choice, not
    // hidden here.
    "q_neyman_alloc" -> ((s, dir) => {
      val cells = t(s, dir, "customer")
        .select(col("c_mktsegment").as("segment"),
          (col("c_acctbal").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("x"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("nh"),
          sum(col("x").cast(DecimalType(38, 0))).as("sx"),
          sum((col("x") * col("x")).cast(DecimalType(38, 0))).as("qx"))
        .select(col("segment"), col("nh"),
          expr("""CAST((qx - (sx * sx - (sx * sx)
            | % CAST(nh AS DECIMAL(38,0))) / CAST(nh AS DECIMAL(38,0)))
            | div (nh - 1) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("var_c2"))
        .select(col("segment"), col("nh"), col("var_c2"),
          expr("CAST(floor(sqrt(CAST(var_c2 AS DOUBLE))) AS BIGINT)")
            .as("s_cents"))
        .localCheckpoint()
      val tot = cells.agg(
        sum(col("nh").cast(DecimalType(38, 0)) * col("s_cents"))
          .as("tot_ns"))
      cells.crossJoin(broadcast(tot))
        .select(col("segment"), col("nh"), col("var_c2"),
          col("s_cents"),
          expr(s"""CAST(($Budget * CAST(nh AS DECIMAL(38,0)) * s_cents)
            | div tot_ns AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("alloc_n"))
        .orderBy(col("segment"))
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_cem_att" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END AS tr,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS y
        |  FROM orders),
        |lc AS (SELECT l_orderkey AS o_orderkey, COUNT(*) AS stratum
        |  FROM lineitem GROUP BY 1),
        |strata AS (
        |  SELECT stratum, SUM(tr) AS nt,
        |    SUM(tr * CAST(y AS HUGEINT)) AS st,
        |    SUM(1 - tr) AS nc,
        |    SUM((1 - tr) * CAST(y AS HUGEINT)) AS sc
        |  FROM o JOIN lc USING (o_orderkey) GROUP BY 1),
        |matched AS (
        |  SELECT SUM(nt) AS nt_matched,
        |    SUM((1000000 * (st * nc - CAST(nt AS HUGEINT) * sc)) // nc)
        |      AS csum
        |  FROM strata WHERE nt > 0 AND nc > 0),
        |unmatched AS (
        |  SELECT COALESCE(SUM(nt), 0) AS n_unmatched_treated
        |  FROM strata WHERE nc = 0)
        |SELECT CAST(nt_matched AS BIGINT) AS nt_matched,
        |  CAST(n_unmatched_treated AS BIGINT) AS n_unmatched_treated,
        |  CAST(csum // nt_matched AS BIGINT) AS att_micro
        |FROM matched, unmatched""".stripMargin,

    "q_mantel_haenszel" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END AS e,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders),
        |medc AS (
        |  SELECT MIN(cents) AS med FROM (
        |    SELECT cents, SUM(cnt) OVER (ORDER BY cents) AS cum,
        |      SUM(cnt) OVER () AS n
        |    FROM (SELECT cents, COUNT(*) AS cnt FROM o GROUP BY 1))
        |  WHERE cum >= (n + 1) // 2),
        |lc AS (SELECT l_orderkey AS o_orderkey, COUNT(*) AS stratum
        |  FROM lineitem GROUP BY 1),
        |strata AS (
        |  SELECT stratum,
        |    SUM(e * y) AS a, SUM(e * (1 - y)) AS b,
        |    SUM((1 - e) * y) AS c, SUM((1 - e) * (1 - y)) AS d,
        |    COUNT(*) AS ni
        |  FROM (SELECT o.o_orderkey, o.e,
        |          CASE WHEN o.cents > medc.med THEN 1 ELSE 0 END AS y
        |        FROM o, medc) t
        |  JOIN lc USING (o_orderkey)
        |  GROUP BY 1),
        |agg AS (
        |  SELECT COUNT(*) AS n_strata,
        |    SUM(a) AS ta, SUM(b) AS tb, SUM(c) AS tc, SUM(d) AS td,
        |    SUM((1000000000 * CAST(a AS HUGEINT) * d) // ni) AS r,
        |    SUM((1000000000 * CAST(b AS HUGEINT) * c) // ni) AS q
        |  FROM strata)
        |SELECT CAST(n_strata AS BIGINT) AS n_strata,
        |  CAST(r AS BIGINT) AS r_nano, CAST(q AS BIGINT) AS s_nano,
        |  CAST((1000000 * r) // q AS BIGINT) AS or_mh_ppm,
        |  CAST((1000000 * CAST(ta AS HUGEINT) * td)
        |    // (CAST(tb AS HUGEINT) * tc) AS BIGINT) AS or_crude_ppm
        |FROM agg""".stripMargin,

    "q_neyman_alloc" ->
      s"""WITH cells AS (
         |  SELECT c_mktsegment AS segment, COUNT(*) AS nh,
         |    SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      ) AS sxr,
         |    SUM(CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS HUGEINT)
         |      * CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT))
         |      AS qx
         |  FROM customer GROUP BY 1),
         |vc AS (
         |  SELECT segment, nh,
         |    CAST((qx - (CAST(sxr AS HUGEINT) * sxr)
         |        // CAST(nh AS HUGEINT))
         |      // (nh - 1) AS BIGINT) AS var_c2
         |  FROM cells),
         |sc AS (
         |  SELECT segment, nh, var_c2,
         |    CAST(floor(sqrt(CAST(var_c2 AS DOUBLE))) AS BIGINT)
         |      AS s_cents
         |  FROM vc),
         |tot AS (SELECT SUM(CAST(nh AS HUGEINT) * s_cents) AS tot_ns
         |  FROM sc)
         |SELECT segment, CAST(nh AS BIGINT) AS nh, var_c2, s_cents,
         |  CAST(($Budget * CAST(nh AS HUGEINT) * s_cents) // tot_ns
         |    AS BIGINT) AS alloc_n
         |FROM sc, tot ORDER BY segment""".stripMargin
  )
}
