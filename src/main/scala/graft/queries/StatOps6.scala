package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.RangeBuckets
import graft.sources.Tables

/** Round-12 tranche 3: model-evaluation and association statistics — the
  * readouts a training-data pipeline runs on its LABELS and SCORES rather
  * than its bytes. ROC-AUC (exact, via the rank-sum identity), NDCG@10
  * (graded ranking quality per query group), mutual information and
  * Cramér's V (categorical association / feature screening), one-way
  * ANOVA F and Kruskal-Wallis H (parametric + rank-based k-group tests,
  * the k-ary siblings of `q_welch_ttest` / `q_mann_whitney`), and the
  * Jarque-Bera normality screen (pure moment arithmetic).
  *
  * Determinism discipline (see [[Parity]]): every corpus-sized reduction
  * is an exact-integer aggregate (cents / counts / doubled midranks
  * staged through DECIMAL(38,0)); transcendentals (`ln`, `log2`) appear
  * only in per-cell or closing formulas over exact integer cells with
  * the IDENTICAL expression text on both engines — shared Scala string
  * constants are interpolated into BOTH the Spark `expr` and the DuckDB
  * oracle so the shapes cannot drift. Fractional per-cell terms are
  * micro-floored (`floor(x + 0.5)` — half-up via floor, which is
  * IEEE-exact on both engines, never `CAST(double AS BIGINT)`, whose
  * rounding direction differs between Spark (trunc) and DuckDB (nearest))
  * and then exactly summed — the `q_embed_drift` row-staging precedent.
  * `sqrt` is correctly rounded per IEEE-754 so closing `sqrt` terms are
  * bit-identical; `m2^1.5` is therefore written `m2 * sqrt(m2)`, never
  * `pow(m2, 1.5)` (libm `pow` is not correctly rounded).
  *
  * Scale posture: each query is one corpus-keyed aggregate (the census /
  * contingency build) followed by bounded-cardinality work — value
  * censuses flow through the [[RangeBuckets]] bucketed-cumsum discipline
  * (never a single-partition window), contingency tables are
  * |segments|×|nations/regions| ≤ 125 rows, group frames are ≤ 5 rows,
  * and NDCG's windows partition by the query group (nation). The
  * DECIMAL(38,0) envelopes are documented per query; all hold to ≥ 10⁸
  * rows (most to 10⁹+).
  */
object StatOps6 extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  /** cents-exact long from a 2-dp money column (the shared staging). */
  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast(DecimalType(18, 2)) * 100).cast("long")

  /** Append `below` (exact count of rows strictly below `v`) to a census
    * carrying (v, tv, …extra): per-bucket partitioned cumsum + the tiny
    * O(|buckets|²) offset merge, bucket count range-independent per
    * [[RangeBuckets.withRangeBucket]]. Extra columns ride through — the
    * generalization of [[RangeBuckets.belowFrame]] the per-group rank
    * sums here need. */
  private def withBelow(census: DataFrame): DataFrame = {
    val cen = RangeBuckets.withRangeBucket(census, "v")
    val w = Window.partitionBy(col("bucket")).orderBy(col("v"))
    val loc = cen.withColumn("cumt", sum(col("tv")).over(w))
    val bt = cen.groupBy(col("bucket")).agg(sum(col("tv")).as("bn"))
    val off = bt.as("a")
      .join(bt.as("o"), col("o.bucket") < col("a.bucket"), "left")
      .groupBy(col("a.bucket").as("bucket"))
      .agg(coalesce(sum(col("o.bn")), lit(0L)).as("offn"))
    loc.join(broadcast(off), Seq("bucket"))
      .withColumn("below", col("offn") + col("cumt") - col("tv"))
      .drop("bucket", "cumt", "offn")
  }

  // -- shared closing-formula texts (interpolated into BOTH engines) ------

  /** Kruskal-Wallis H with the tie correction, closing over the FULL-
    * precision quartered rank-sum-of-squares `sumterm` (= Σ⌊R_g²/n_g⌋ in
    * doubled-rank units): the PUBLISHED cell is `rank_ss_e6` (div 10⁶ —
    * sumterm grows ∝n³, 93·2⁵³ at the sf1 probe, so the unit cell broke
    * the output contract a decade above replay scale; round 14), while
    * the statistic keeps every exact digit. Both engines' sumterm is the
    * same exact integer (< 2⁶⁴ through sf1, where HUGEINT→double is a
    * single exact limb), and H's ~n/H-fold cancellation amplifies a
    * 1-ulp cast wobble to ≤ 10⁻⁹ — invisible at the 6-dp readout. The
    * n³ term runs in doubles — exact n³ would need DECIMAL headroom the
    * statistic's 6-dp readout cannot use. */
  private val hExpr =
    """((12.0 * CAST(sumterm AS DOUBLE)
      |    / (CAST(n_orders AS DOUBLE) * (CAST(n_orders AS DOUBLE) + 1.0))
      |  - 3.0 * (CAST(n_orders AS DOUBLE) + 1.0))
      | / (1.0 - CAST(ties AS DOUBLE)
      |    / (CAST(n_orders AS DOUBLE) * n_orders * n_orders - n_orders)))"""
      .stripMargin.replaceAll("\\s+", " ")

  /** ANOVA cells: s = Σx, q = Σx², w = Σ_g ⌊S_g²/n_g⌋ (all exact
    * integers in cents / cents²). The sums of squares and the F readout
    * stay EXACT integers end to end — ssb = w − ⌊s²/n⌋ and ssw = q − w in
    * cents², f_ppm = ⌊10⁶·ssb·(n−k) / ((k−1)·ssw)⌋ — because the obvious
    * double closing formula is a ~10-digit catastrophic cancellation of
    * ~10²⁵ magnitudes, and DuckDB's HUGEINT→DOUBLE cast is two-step
    * (upper·2⁶⁴ + lower), i.e. not correctly rounded, so the engines'
    * doubles disagree in the surviving low bits at sf0.1. Exact integer
    * division is deterministic on both. */
  private val ssbExpr = "(w - (s * s - (s * s) % n_orders) / n_orders)"
  private val sswExpr = "(q - w)"

  /** Cramér's V from the micro-exact χ²; min(r−1, c−1) = 4 for the fixed
    * 5-segment × 5-region table. */
  private val vExpr =
    "(sqrt(CAST(chi2_micro AS DOUBLE) / 1000000.0 / (CAST(n_customers AS DOUBLE) * 4.0)))"

  /** Jarque-Bera closing chain from raw moments (n, s1..s4): central
    * moments by the raw-moment identities, skewness m3/m2^{3/2} with the
    * power written `m2 * sqrt(m2)` (sqrt is correctly rounded; libm `pow`
    * is not), kurtosis m4/m2². */
  private val jbMu = "(CAST(s1 AS DOUBLE) / n_rows)"
  private val jbS2n = "(CAST(s2 AS DOUBLE) / n_rows)"
  private val jbS3n = "(CAST(s3 AS DOUBLE) / n_rows)"
  private val jbS4n = "(CAST(s4 AS DOUBLE) / n_rows)"
  private val jbM2 = s"($jbS2n - $jbMu * $jbMu)"
  private val jbM3 = s"($jbS3n - 3.0 * $jbMu * $jbS2n + 2.0 * $jbMu * $jbMu * $jbMu)"
  private val jbM4 =
    s"($jbS4n - 4.0 * $jbMu * $jbS3n + 6.0 * $jbMu * $jbMu * $jbS2n - 3.0 * $jbMu * $jbMu * $jbMu * $jbMu)"
  private val jbSkew = s"($jbM3 / ($jbM2 * sqrt($jbM2)))"
  private val jbKurt = s"($jbM4 / ($jbM2 * $jbM2))"
  private val jbStat =
    s"(CAST(n_rows AS DOUBLE) / 6.0 * ($jbSkew * $jbSkew + ($jbKurt - 3.0) * ($jbKurt - 3.0) / 4.0))"

  /** NDCG per-position gain term, micro-rounded half-up via floor (exact
    * both engines); log2 over rank+1 ≤ 11 is the accepted 6-dp-rounded
    * transcendental (the `q_tfidf` ln precedent). */
  private def ndcgTerm(rank: String) =
    s"CAST(floor(1000000.0 * gain / log2($rank + 1.0) + 0.5) AS BIGINT)"

  /** Mutual-information per-cell term in micro-nats: (c/n)·ln(c·n/(r·s)),
    * micro-floored half-up then exactly summed. */
  private val miTerm =
    """CAST(floor(1000000.0 * (CAST(c AS DOUBLE) / n)
      |  * ln(CAST(c AS DOUBLE) * n / (CAST(r AS DOUBLE) * s)) + 0.5)
      |  AS BIGINT)""".stripMargin.replaceAll("\\s+", " ")

  override def defs: Map[String, Q] = Map[String, Q](

    // Exact ROC-AUC via the rank-sum identity AUC = U₁/(n₁·n₀): score =
    // account balance in cents, positive class = the BUILDING segment.
    // Midranks with ties stay exact in doubled units (the q_mann_whitney
    // staging): U₁×2 = Σ n1v·(2·below + tv + 1) − n₁(n₁+1), so auc_ppm =
    // ⌊10⁶·U₁×2 / (2·n₁·n₀)⌋ is a pure integer readout. One corpus
    // aggregate (the value census), then census-sized bucketed cumsums.
    // DECIMAL(38,0) envelope: 10⁶·U₁×2 ≤ 2·10⁶·n² → fine to n ≈ 10¹⁶.
    "q_roc_auc" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(
        cents(col("c_acctbal")).as("v"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L).as("pos"))
      val census = c.groupBy(col("v"))
        .agg(sum(col("pos")).as("n1v"), count(lit(1)).as("tv"))
        // round 18: census leaf (ScanCount: the fan-out re-ran the
        // fact scan per consumer; see OPTIMIZATION_r18.md)
        .localCheckpoint(eager = false)
      withBelow(census)
        .agg(sum(col("n1v")).as("n_pos"),
          sum(col("tv") - col("n1v")).as("n_neg"),
          sum(col("n1v").cast(DecimalType(38, 0))
            * (col("below") * 2 + col("tv") + 1)).as("r1x2"))
        .select(col("n_pos"), col("n_neg"),
          (col("r1x2") - col("n_pos").cast(DecimalType(38, 0))
            * (col("n_pos") + 1)).as("u1x2d"))
        .select(col("n_pos"), col("n_neg"),
          col("u1x2d").cast("long").as("u1x2"),
          expr("""CAST((1000000 * u1x2d - (1000000 * u1x2d)
            |  % (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg))
            | / (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("auc_ppm"))
    }),

    // NDCG@10 per nation: customers ranked by balance (the "model
    // score"), graded relevance from the segment (BUILDING 7 >
    // AUTOMOBILE 3 > MACHINERY 1 > rest 0 — already in 2^rel−1 gain
    // form). Actual and ideal rankings are two windows over the SAME
    // partition key (one exchange, two in-partition sorts); ties break
    // on custkey so both rankings are total orders. Gain terms are
    // micro-floored then exactly summed; ndcg_ppm = ⌊10⁶·dcg/idcg⌋ in
    // pure BIGINT `div`. Nations whose ideal top-10 carries zero gain
    // (no graded customer at all) are excluded on BOTH engines.
    "q_ndcg" -> ((s, dir) => {
      val n = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      val c = t(s, dir, "customer")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("c_custkey"),
          cents(col("c_acctbal")).as("v"),
          when(col("c_mktsegment") === "BUILDING", 7L)
            .when(col("c_mktsegment") === "AUTOMOBILE", 3L)
            .when(col("c_mktsegment") === "MACHINERY", 1L)
            .otherwise(0L).as("gain"))
      val wA = Window.partitionBy(col("n_name"))
        .orderBy(col("v").desc, col("c_custkey"))
      val wI = Window.partitionBy(col("n_name"))
        .orderBy(col("gain").desc, col("v").desc, col("c_custkey"))
      c.withColumn("rn", row_number().over(wA))
        .withColumn("irn", row_number().over(wI))
        .groupBy(col("n_name"))
        .agg(
          sum(when(col("rn") <= 10, expr(ndcgTerm("rn"))).otherwise(0L))
            .as("dcg_micro"),
          sum(when(col("irn") <= 10, expr(ndcgTerm("irn"))).otherwise(0L))
            .as("idcg_micro"))
        .filter(col("idcg_micro") > 0)
        .select(col("n_name"), col("dcg_micro"), col("idcg_micro"),
          expr("(1000000 * dcg_micro) div idcg_micro").as("ndcg_ppm"))
        .orderBy(col("n_name"))
    }),

    // Mutual information (micro-nats) between market segment and nation:
    // the categorical-feature screening readout. One corpus aggregate
    // builds the ≤ 5×25 contingency table; marginals and the total are
    // derived FROM the cells (broadcast joins over ≤ 25-row frames), so
    // the corpus is read once. Per-cell terms (signed!) micro-floor
    // half-up, then sum exactly.
    "q_mutual_info" -> ((s, dir) => {
      val n = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      val cells = t(s, dir, "customer")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_mktsegment"), col("n_name"))
        .agg(count(lit(1)).as("c"))
        // round 18: census leaf (ScanCount: the fan-out re-ran the
        // fact scan per consumer; see OPTIMIZATION_r18.md)
        .localCheckpoint(eager = false)
      val rx = cells.groupBy(col("c_mktsegment")).agg(sum(col("c")).as("r"))
      val sy = cells.groupBy(col("n_name")).agg(sum(col("c")).as("s"))
      val tot = cells.agg(sum(col("c")).as("n"))
      cells.join(broadcast(rx), Seq("c_mktsegment"))
        .join(broadcast(sy), Seq("n_name"))
        .crossJoin(broadcast(tot))
        .select(col("n"), expr(miTerm).as("term"))
        .groupBy(col("n"))
        .agg(count(lit(1)).as("n_cells"), sum(col("term")).as("mi_micro"))
        .select(col("n").as("n_customers"), col("n_cells"), col("mi_micro"))
    }),

    // Cramér's V between market segment and region (5×5): χ² from the
    // exact identity term = (O·n − r·s)² / (n·r·s), each cell an exact
    // rational truncated at micro resolution through DECIMAL(38,0)
    // subtract-the-remainder division, then V = √(χ²/(n·min(r−1,c−1)))
    // as the closing sqrt (IEEE-exact) over the shared-text formula.
    // DECIMAL envelope: 10⁶·(O·n − r·s)² ≤ 10⁶·n⁴ → holds to n ≈ 10⁸.
    "q_cramers_v" -> ((s, dir) => {
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      val cells = t(s, dir, "customer")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("c_mktsegment"), col("r_name"))
        .agg(count(lit(1)).as("c"))
        // round 18: census leaf (ScanCount: the fan-out re-ran the
        // fact scan per consumer; see OPTIMIZATION_r18.md)
        .localCheckpoint(eager = false)
      val rx = cells.groupBy(col("c_mktsegment")).agg(sum(col("c")).as("r"))
      val sy = cells.groupBy(col("r_name")).agg(sum(col("c")).as("s"))
      val tot = cells.agg(sum(col("c")).as("n"))
      cells.join(broadcast(rx), Seq("c_mktsegment"))
        .join(broadcast(sy), Seq("r_name"))
        .crossJoin(broadcast(tot))
        .select(col("n"), expr("""CAST((
          |  1000000 * (CAST(c AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * s)
          |           * (CAST(c AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * s)
          |  - (1000000 * (CAST(c AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * s)
          |            * (CAST(c AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * s))
          |    % (CAST(n AS DECIMAL(38,0)) * r * s)
          |) / (CAST(n AS DECIMAL(38,0)) * r * s) AS BIGINT)"""
          .stripMargin.replaceAll("\\s+", " ")).as("term"))
        .groupBy(col("n"))
        .agg(count(lit(1)).as("n_cells"), sum(col("term")).as("chi2_micro"))
        .select(col("n").as("n_customers"), col("n_cells"),
          col("chi2_micro"), round(expr(vExpr), 6).as("v"))
    }),

    // One-way ANOVA F across order priorities on order value (cents):
    // per-group sufficient statistics (n_g, ΣX, ΣX²) in one corpus
    // aggregate, ⌊S_g²/n_g⌋ per ≤ 5-row group frame through exact
    // DECIMAL division (resolution 1 cent² against SS terms of ~10¹⁸ —
    // declared unit-resolution semantics), then ssb/ssw/F close as EXACT
    // integers (see [[ssbExpr]] for why doubles cannot). DECIMAL
    // envelopes: S_g² ≤ (n·x̄)² in cents² holds to n ≈ 10¹¹ rows;
    // 10⁶·ssb·(n−k) ≈ 10²⁰·n² holds to n ≈ 10⁹ rows (documented).
    "q_anova_f" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderpriority").as("grp"),
        cents(col("o_totalprice")).as("x"))
      val g = o.groupBy(col("grp")).agg(
        count(lit(1)).as("ng"),
        sum(col("x").cast(DecimalType(38, 0))).as("sg"),
        sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("qg"))
      g.select(col("ng"), col("sg"), col("qg"),
          expr("""CAST((sg * sg - (sg * sg) % CAST(ng AS DECIMAL(38,0)))
            | / CAST(ng AS DECIMAL(38,0)) AS DECIMAL(38,0))"""
            .stripMargin.replaceAll("\\s+", " ")).as("t2g"))
        .agg(count(lit(1)).as("k_groups"), sum(col("ng")).as("n_orders"),
          sum(col("sg")).as("s"), sum(col("qg")).as("q"),
          sum(col("t2g")).as("w"))
        .select(col("k_groups"), col("n_orders"),
          expr("""CAST(w - (s * s - (s * s) % CAST(n_orders AS DECIMAL(38,0)))
            | / CAST(n_orders AS DECIMAL(38,0)) AS DECIMAL(38,0))"""
            .stripMargin.replaceAll("\\s+", " ")).as("ssb_c2"),
          expr("CAST(q - w AS DECIMAL(38,0))").as("ssw_c2"))
        .select(col("k_groups"), col("n_orders"),
          // Emit the SS cells in KILOdollars² (exact div 10¹⁰ on both
          // engines — the q_icc precedent, StatOps10): the cents² values
          // reach ~3×10¹⁹ at sf0.1 and grow linearly in n, so dollars²
          // (div 10⁴, the r12 fix) sat at 0.35·2⁵³ at sf0.1 and would
          // cross the 2⁵³ output contract near sf0.3 — a decade below
          // the sf1 probes. Kilodollars² buys 10⁶× headroom (~sf300k).
          // f_ppm still closes on the full-precision cents² operands,
          // so the statistic is unchanged.
          expr("ssb_c2 div 10000000000").as("ssb_kd2"),
          expr("ssw_c2 div 10000000000").as("ssw_kd2"),
          expr("""CAST((1000000 * ssb_c2 * (n_orders - k_groups))
            | div ((k_groups - 1) * ssw_c2) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("f_ppm"))
    }),

    // Kruskal-Wallis H across order priorities: the rank-based k-group
    // test. Doubled midranks (2·below + tv + 1) keep every rank sum an
    // exact integer; R_g²/n_g truncates per ≤ 5-row group frame (unit
    // resolution against rank sums of ~10¹⁵); the tie-corrected H closes
    // in shared-text doubles over the FULL-precision sumterm, while the
    // published cell is rank_ss_e6 (div 10⁶ — ∝n³ growth crossed 2⁵³ at
    // the sf1 probe; see [[hExpr]]). Census via one (grp, v) corpus
    // aggregate — the global census derives from it, so the corpus is
    // read once.
    "q_kruskal_wallis" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderpriority").as("grp"),
        cents(col("o_totalprice")).as("v"))
      // round 18: the (grp, v) census is the fan-out point (global
      // census, belowFrame's bucket machinery, the per-group join all
      // read it) and at bench scale AQE's runtime re-planning defeats
      // exchange reuse across those consumers — ScanCount measured the
      // ORDERS SCAN EXECUTING 8× at sf0.01. A lazy checkpoint
      // materializes the census once on first read (no standalone job);
      // everything downstream is value-cardinality-sized block reads.
      val tgv = o.groupBy(col("grp"), col("v")).agg(count(lit(1)).as("tgv"))
        .localCheckpoint(eager = false)
      val census = tgv.groupBy(col("v")).agg(sum(col("tgv")).as("tv"))
      val bel = withBelow(census)
      val perG = tgv.join(bel, Seq("v"))
        .groupBy(col("grp"))
        .agg(sum(col("tgv")).as("ng"),
          sum(col("tgv").cast(DecimalType(38, 0))
            * (col("below") * 2 + col("tv") + 1)).as("r2g"))
        .select(col("ng"), expr("""CAST((r2g * r2g - (r2g * r2g)
          | % (4 * CAST(ng AS DECIMAL(38,0))))
          | / (4 * CAST(ng AS DECIMAL(38,0))) AS DECIMAL(38,0))"""
          .stripMargin.replaceAll("\\s+", " ")).as("termg"))
      val ties = census
        .agg(sum((col("tv").cast(DecimalType(38, 0)) * col("tv") * col("tv")
          - col("tv")).cast(DecimalType(38, 0))).as("ties"))
      perG.crossJoin(broadcast(ties))
        .agg(count(lit(1)).as("k_groups"), sum(col("ng")).as("n_orders"),
          sum(col("termg")).as("sumterm"), first(col("ties")).as("tiesd"))
        .select(col("k_groups"), col("n_orders"), col("sumterm"),
          col("tiesd").cast("long").as("ties"))
        .select(col("k_groups"), col("n_orders"),
          expr("sumterm div 1000000").as("rank_ss_e6"),
          col("ties"), round(expr(hExpr), 6).as("h"))
    }),

    // Jarque-Bera normality screen on line-item quantity: ONE aggregate
    // computes n and the exact raw moments Σx..Σx⁴ (quantities are small
    // integers — Σx⁴ ≤ 50⁴·n holds in DECIMAL(38,0) to n ≈ 10³¹), then
    // skewness / kurtosis / JB close over shared-text doubles. The
    // flattest possible distributed plan: map-side partial moments, one
    // 1-row exchange, zero joins.
    "q_jarque_bera" -> ((s, dir) =>
      t(s, dir, "lineitem").select(col("l_quantity").cast("long").as("x"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("x").cast(DecimalType(38, 0))).as("s1"),
          sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("s2"),
          sum(col("x").cast(DecimalType(38, 0)) * col("x") * col("x"))
            .as("s3"),
          sum(col("x").cast(DecimalType(38, 0)) * col("x") * col("x")
            * col("x")).as("s4"))
        .select(col("n_rows"),
          round(expr(jbSkew), 6).as("skewness"),
          round(expr(jbKurt), 6).as("kurtosis"),
          round(expr(jbStat), 4).as("jb")))
  )

  override def oracle: Map[String, String] = Map(

    "q_roc_auc" ->
      """WITH v AS (
        |  SELECT CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS v,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS pos
        |  FROM customer),
        |census AS (
        |  SELECT v, SUM(pos) AS n1v, COUNT(*) AS tv FROM v GROUP BY 1),
        |cum AS (
        |  SELECT v, n1v, tv,
        |    COALESCE(SUM(tv) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS below
        |  FROM census),
        |cells AS (
        |  SELECT CAST(SUM(n1v) AS BIGINT) AS n_pos,
        |    CAST(SUM(tv - n1v) AS BIGINT) AS n_neg,
        |    SUM(CAST(n1v AS HUGEINT) * (2 * below + tv + 1))
        |      - CAST(SUM(n1v) AS HUGEINT) * (SUM(n1v) + 1) AS u1x2d
        |  FROM cum)
        |SELECT n_pos, n_neg, CAST(u1x2d AS BIGINT) AS u1x2,
        |  CAST((1000000 * u1x2d)
        |    // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT) AS auc_ppm
        |FROM cells""".stripMargin,

    "q_ndcg" ->
      s"""WITH c AS (
         |  SELECT n.n_name, c.c_custkey,
         |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         |    CASE c_mktsegment WHEN 'BUILDING' THEN 7
         |      WHEN 'AUTOMOBILE' THEN 3 WHEN 'MACHINERY' THEN 1
         |      ELSE 0 END AS gain
         |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
         |ranked AS (
         |  SELECT n_name, gain,
         |    ROW_NUMBER() OVER (PARTITION BY n_name
         |      ORDER BY v DESC, c_custkey) AS rn,
         |    ROW_NUMBER() OVER (PARTITION BY n_name
         |      ORDER BY gain DESC, v DESC, c_custkey) AS irn
         |  FROM c),
         |agg AS (
         |  SELECT n_name,
         |    CAST(SUM(CASE WHEN rn <= 10 THEN ${ndcgTerm("rn")} ELSE 0 END)
         |      AS BIGINT) AS dcg_micro,
         |    CAST(SUM(CASE WHEN irn <= 10 THEN ${ndcgTerm("irn")} ELSE 0 END)
         |      AS BIGINT) AS idcg_micro
         |  FROM ranked GROUP BY 1)
         |SELECT n_name, dcg_micro, idcg_micro,
         |  CAST((1000000 * dcg_micro) // idcg_micro AS BIGINT) AS ndcg_ppm
         |FROM agg WHERE idcg_micro > 0 ORDER BY n_name""".stripMargin,

    "q_mutual_info" ->
      s"""WITH cells AS (
         |  SELECT c_mktsegment, n_name, COUNT(*) AS c
         |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
         |  GROUP BY 1, 2),
         |rx AS (SELECT c_mktsegment, SUM(c) AS r FROM cells GROUP BY 1),
         |sy AS (SELECT n_name, SUM(c) AS s FROM cells GROUP BY 1),
         |tot AS (SELECT SUM(c) AS n FROM cells),
         |terms AS (
         |  SELECT tot.n, $miTerm AS term
         |  FROM cells
         |  JOIN rx USING (c_mktsegment)
         |  JOIN sy USING (n_name)
         |  CROSS JOIN tot)
         |SELECT CAST(n AS BIGINT) AS n_customers, COUNT(*) AS n_cells,
         |  CAST(SUM(term) AS BIGINT) AS mi_micro
         |FROM terms GROUP BY n""".stripMargin,

    "q_cramers_v" ->
      s"""WITH cells AS (
         |  SELECT c_mktsegment, r_name, COUNT(*) AS c
         |  FROM customer c
         |  JOIN nation n ON c.c_nationkey = n.n_nationkey
         |  JOIN region g ON n.n_regionkey = g.r_regionkey
         |  GROUP BY 1, 2),
         |rx AS (SELECT c_mktsegment, SUM(c) AS r FROM cells GROUP BY 1),
         |sy AS (SELECT r_name, SUM(c) AS s FROM cells GROUP BY 1),
         |tot AS (SELECT SUM(c) AS n FROM cells),
         |terms AS (
         |  SELECT tot.n,
         |    CAST((1000000
         |        * (CAST(c AS HUGEINT) * n - CAST(r AS HUGEINT) * s)
         |        * (CAST(c AS HUGEINT) * n - CAST(r AS HUGEINT) * s))
         |      // (CAST(n AS HUGEINT) * r * s) AS BIGINT) AS term
         |  FROM cells
         |  JOIN rx USING (c_mktsegment)
         |  JOIN sy USING (r_name)
         |  CROSS JOIN tot),
         |agg AS (
         |  SELECT CAST(n AS BIGINT) AS n_customers, COUNT(*) AS n_cells,
         |    CAST(SUM(term) AS BIGINT) AS chi2_micro
         |  FROM terms GROUP BY n)
         |SELECT n_customers, n_cells, chi2_micro,
         |  round($vExpr, 6) AS v
         |FROM agg""".stripMargin,

    "q_anova_f" ->
      s"""WITH g AS (
         |  SELECT o_orderpriority AS grp, COUNT(*) AS ng,
         |    SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS HUGEINT)) AS sg,
         |    SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS HUGEINT)
         |      * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
         |      AS qg
         |  FROM orders GROUP BY 1),
         |cells AS (
         |  SELECT COUNT(*) AS k_groups, SUM(ng) AS n_orders,
         |    SUM(sg) AS s, SUM(qg) AS q,
         |    SUM((sg * sg) // CAST(ng AS HUGEINT)) AS w
         |  FROM g)
         |SELECT CAST(k_groups AS BIGINT) AS k_groups,
         |  CAST(n_orders AS BIGINT) AS n_orders,
         |  CAST((w - (s * s) // CAST(n_orders AS HUGEINT)) // 10000000000
         |    AS BIGINT) AS ssb_kd2,
         |  CAST((q - w) // 10000000000 AS BIGINT) AS ssw_kd2,
         |  CAST((1000000 * (w - (s * s) // CAST(n_orders AS HUGEINT))
         |      * (n_orders - k_groups))
         |    // ((k_groups - 1) * (q - w)) AS BIGINT) AS f_ppm
         |FROM cells""".stripMargin,

    "q_kruskal_wallis" ->
      s"""WITH v AS (
         |  SELECT o_orderpriority AS grp,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS v
         |  FROM orders),
         |tgv AS (SELECT grp, v, COUNT(*) AS tgv FROM v GROUP BY 1, 2),
         |census AS (SELECT v, SUM(tgv) AS tv FROM tgv GROUP BY 1),
         |cum AS (
         |  SELECT v, tv,
         |    COALESCE(SUM(tv) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS below
         |  FROM census),
         |perg AS (
         |  SELECT grp, SUM(tgv) AS ng,
         |    SUM(CAST(tgv AS HUGEINT) * (2 * below + tv + 1)) AS r2g
         |  FROM tgv JOIN cum USING (v) GROUP BY 1),
         |ties AS (
         |  SELECT SUM(CAST(tv AS HUGEINT) * tv * tv - tv) AS ties
         |  FROM census),
         |cells AS (
         |  SELECT COUNT(*) AS k_groups,
         |    CAST(SUM(ng) AS BIGINT) AS n_orders,
         |    SUM((r2g * r2g) // (4 * CAST(ng AS HUGEINT))) AS sumterm,
         |    CAST(MAX(ties.ties) AS BIGINT) AS ties
         |  FROM perg, ties)
         |SELECT k_groups, n_orders,
         |  CAST(sumterm // 1000000 AS BIGINT) AS rank_ss_e6, ties,
         |  round($hExpr, 6) AS h
         |FROM cells""".stripMargin,

    "q_jarque_bera" ->
      s"""WITH cells AS (
         |  SELECT COUNT(*) AS n_rows,
         |    SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)) AS s1,
         |    SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
         |      * CAST(l_quantity AS BIGINT)) AS s2,
         |    SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
         |      * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
         |      AS s3,
         |    SUM(CAST(CAST(l_quantity AS BIGINT) AS HUGEINT)
         |      * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
         |      * CAST(l_quantity AS BIGINT)) AS s4
         |  FROM lineitem)
         |SELECT CAST(n_rows AS BIGINT) AS n_rows,
         |  round($jbSkew, 6) AS skewness,
         |  round($jbKurt, 6) AS kurtosis,
         |  round($jbStat, 4) AS jb
         |FROM cells""".stripMargin
  )
}
