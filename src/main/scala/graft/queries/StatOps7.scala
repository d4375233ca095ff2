package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.RangeBuckets
import graft.sources.Tables

/** Round-12 tranche 4: distribution distances and paired-model
  * evaluation — Wasserstein-1 (the earth-mover companion to
  * `q_psi_drift`/`q_js_divergence`, in the DATA's own units rather than
  * nats), decile gains/lift (the campaign-targeting readout of a ranking
  * model), Cohen's d (the effect size `q_welch_ttest` significance needs
  * for practical relevance), Brown-Forsythe Levene (variance
  * homogeneity — the precondition check for `q_anova_f`), McNemar's test
  * (paired comparison of two classifiers on the same items) and Fleiss'
  * kappa (multi-rater agreement, the k-rater sibling of
  * `q_cohen_kappa`).
  *
  * Determinism discipline (see [[Parity]] and the [[StatOps6]] lesson):
  * corpus-sized reductions are exact-integer aggregates; order
  * statistics flow through the [[RangeBuckets]] bucketed-cumsum
  * discipline (never a single-partition window); closing doubles only
  * ever see integer cells small enough (< 2⁵³) to cast exactly on BOTH
  * engines — anything bigger closes as an exact DECIMAL/HUGEINT integer
  * division instead, because DuckDB's HUGEINT→DOUBLE cast is not
  * correctly rounded (the measured `q_anova_f` sf0.1 parity break).
  * Signed integer divisions rely on the probed trunc-toward-zero match
  * between Spark's `div` and DuckDB's HUGEINT `//` (§2.15, Holt).
  *
  * Scale posture: every query is one or two corpus-keyed aggregates
  * (value census / per-order line counts) followed by census-sized or
  * ≤|groups|-sized work; medians broadcast as 1-row/5-row frames; the
  * only fact-fact shuffle join (orders⇄line-counts in the McNemar/Fleiss
  * pair) is keyed on the order key and AQE-skew-safe.
  *
  * Degenerate-input stance (the r11 `q_conformal` ADVICE precedent —
  * accepted and documented, never reachable at gate scales): an EMPTY
  * date-span half (`q_wasserstein`) or a zero positive class
  * (`q_lift_gains`) divides by zero in the closing exact division,
  * where Spark's decimal division yields NULL but DuckDB's HUGEINT `//`
  * errors — a parity break only a truly degenerate corpus can reach.
  * `q_mcnemar` (b + c = 0) and `q_fleiss_kappa` (unanimous raters) guard
  * their degenerate cells explicitly with shared CASE text.
  */
object StatOps7 extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  /** cents-exact long from a 2-dp money column (the shared staging). */
  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast(DecimalType(18, 2)) * 100).cast("long")

  private val DayUs = 86400000000L

  /** Distributed disc median of order totals in cents: smallest v with
    * below + t ≥ ⌈n/2⌉ over the value census — one corpus aggregate,
    * RangeBuckets below-counts, a 1-row result the callers broadcast. */
  private def orderMedianCents(s: SparkSession, dir: String): DataFrame = {
    // round 18: lazy-checkpoint the value census — its belowFrame
    // fan-out re-executed the orders scan per consumer at sf0.01
    // (ScanCount measured 8 scans on the raterFrame gates; AQE
    // re-planning defeats exchange reuse across the consumers)
    val census = t(s, dir, "orders")
      .select(cents(col("o_totalprice")).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("t"))
      .localCheckpoint(eager = false)
    val bel = RangeBuckets.belowFrame(census)
    val n = census.agg(sum(col("t")).as("n"))
    bel.crossJoin(broadcast(n))
      // div, not `/`: Column./ on longs is DOUBLE division — (n+1)/2
      // at even n would demand cum ≥ x.5, shifting the median up a rank
      .filter(col("below") + col("t") >= expr("(n + 1) div 2"))
      .agg(min(col("v")).as("med"))
  }

  /** Per-order predicate frame for the paired-rater queries: order key,
    * truth (priority urgent/high), rater A (total above the broadcast
    * global median), rater B (≥ 4 line items), rater C (status F).
    * One lineitem aggregate + one keyed join; booleans as 0/1 longs. */
  private def raterFrame(s: SparkSession, dir: String): DataFrame = {
    val lc = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(count(lit(1)).as("n_lines"))
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_orderstatus"), cents(col("o_totalprice")).as("tc"))
      .join(lc, Seq("o_orderkey"), "left")
      .crossJoin(broadcast(orderMedianCents(s, dir)))
      .select(
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("truth"),
        when(col("tc") > col("med"), 1L).otherwise(0L).as("ra"),
        when(coalesce(col("n_lines"), lit(0L)) >= 4, 1L).otherwise(0L)
          .as("rb"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("rc"))
  }

  // -- shared closing-formula texts (interpolated into BOTH engines) ------

  /** McNemar χ² with continuity correction from the discordant cells;
    * NULL when b + c = 0 (no information about a difference). */
  private val mcnemarExpr =
    """(CASE WHEN b + c = 0 THEN NULL ELSE
      |  (abs(CAST(b AS DOUBLE) - c) - 1.0)
      |  * (abs(CAST(b AS DOUBLE) - c) - 1.0) / (CAST(b AS DOUBLE) + c)
      | END)""".stripMargin.replaceAll("\\s+", " ")

  /** Fleiss cells → P̄, P_e, κ for m = 3 raters over binary categories:
    * sum1 = Σ n_i1, sumsq = Σ (n_i1² + (3−n_i1)²). All cells ≤ 9n < 2⁵³
    * at any plausible n, so the double casts are exact both engines. */
  private val fleissPbar =
    "((CAST(sumsq AS DOUBLE) - 3.0 * n_orders) / (6.0 * n_orders))"
  private val fleissPe =
    """((CAST(sum1 AS DOUBLE) / (3.0 * n_orders))
      | * (CAST(sum1 AS DOUBLE) / (3.0 * n_orders))
      | + (1.0 - CAST(sum1 AS DOUBLE) / (3.0 * n_orders))
      | * (1.0 - CAST(sum1 AS DOUBLE) / (3.0 * n_orders)))"""
      .stripMargin.replaceAll("\\s+", " ")
  private val fleissKappa =
    s"""(CASE WHEN sum1 = 0 OR sum1 = 3 * n_orders THEN NULL ELSE
       |  ($fleissPbar - $fleissPe) / (1.0 - $fleissPe) END)"""
      .stripMargin.replaceAll("\\s+", " ")

  /** Oracle CTE replicating [[orderMedianCents]]'s LOWER-median census
    * definition (smallest v with cum ≥ ⌈n/2⌉). DuckDB's `median()`
    * INTERPOLATES at even n — a half-cent value no order carries —
    * so both raters' oracles replay the census instead. */
  private val medCensusSql =
    """ocen AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS v, COUNT(*) AS t
      |  FROM orders GROUP BY 1),
      |ocum AS (
      |  SELECT v, SUM(t) OVER (ORDER BY v) AS cum,
      |    SUM(t) OVER () AS n
      |  FROM ocen),
      |medc AS (
      |  SELECT MIN(v) AS med FROM ocum WHERE cum >= (n + 1) // 2)"""
      .stripMargin

  /** Cohen's d from the exact integer cells: mean difference in
    * micro-cents (signed exact division) over the pooled SD from the
    * truncated-exact pooled variance (cents², ~σ² regardless of n, so
    * the double cast is exact both engines). */
  private val cohensDExpr =
    "((CAST(dmu_micro AS DOUBLE) / 1000000.0) / sqrt(CAST(sp2_c2 AS DOUBLE)))"

  override def defs: Map[String, Q] = Map[String, Q](

    // Wasserstein-1 (earth mover) distance between the event-value
    // distributions of the first vs second half of the date span — the
    // drift readout in the metric's own units (micro-value), exact:
    // W1 = Σ_v |F_base(v) − F_cur(v)| · gap(v) over the value census,
    // staged as |cumA·nB − cumB·nA| · gap in DECIMAL(38,0) and closed by
    // one exact integer division. Census cumsums and next-value gaps run
    // per RangeBuckets bucket (lead within the bucket; the bucket
    // boundary takes the next nonempty bucket's min from the tiny
    // bucket frame — buckets are value-monotone). The global max value
    // carries |F diff| = 0, so its missing successor contributes 0 by
    // construction. Envelope: n²·range_micro ≤ 10³⁸ to n ≈ 10¹⁴.
    "q_wasserstein" -> ((s, dir) => {
      val e = t(s, dir, "events").filter(col("value").isNotNull)
        .select(expr(s"unix_micros(ts) div $DayUs").as("day"),
          (col("value").cast(DecimalType(18, 6)) * 1000000)
            .cast("long").as("v"))
      val mid = e.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
      val census = e.crossJoin(broadcast(mid))
        .groupBy(col("v"))
        .agg(sum(when(col("day") < col("mid"), 1L).otherwise(0L)).as("a"),
          sum(when(col("day") >= col("mid"), 1L).otherwise(0L)).as("b"))
        // round 18: census leaf (ScanCount: the fan-out re-ran the
        // fact scan per consumer; see OPTIMIZATION_r18.md)
        .localCheckpoint(eager = false)
      val cen = RangeBuckets.withRangeBucket(census, "v")
      val w = Window.partitionBy(col("bucket")).orderBy(col("v"))
      val loc = cen
        .withColumn("cuma", sum(col("a")).over(w))
        .withColumn("cumb", sum(col("b")).over(w))
        .withColumn("nxt", lead(col("v"), 1).over(w))
      val bt = cen.groupBy(col("bucket")).agg(sum(col("a")).as("ba"),
        sum(col("b")).as("bb"), min(col("v")).as("mnv"))
      val off = bt.as("x")
        .join(bt.as("o"), col("o.bucket") < col("x.bucket"), "left")
        .groupBy(col("x.bucket").as("bucket"))
        .agg(coalesce(sum(col("o.ba")), lit(0L)).as("offa"),
          coalesce(sum(col("o.bb")), lit(0L)).as("offb"))
      val nxtb = bt.as("x")
        .join(bt.as("o"), col("o.bucket") > col("x.bucket"), "left")
        .groupBy(col("x.bucket").as("bucket"))
        .agg(min(col("o.mnv")).as("bnxt"))
      val tot = census.agg(sum(col("a")).as("n_base"),
        sum(col("b")).as("n_cur"), count(lit(1)).as("n_values"))
      loc.join(broadcast(off), Seq("bucket"))
        .join(broadcast(nxtb), Seq("bucket"))
        .select(col("v"),
          (col("offa") + col("cuma")).as("ca"),
          (col("offb") + col("cumb")).as("cb"),
          coalesce(col("nxt"), col("bnxt"), col("v")).as("vn"))
        .crossJoin(broadcast(tot))
        .agg(first(col("n_base")).as("n_base"),
          first(col("n_cur")).as("n_cur"),
          first(col("n_values")).as("n_values"),
          sum(abs(col("ca").cast(DecimalType(38, 0)) * col("n_cur")
              - col("cb").cast(DecimalType(38, 0)) * col("n_base"))
            * (col("vn") - col("v"))).as("mass"))
        .select(col("n_base"), col("n_cur"), col("n_values"),
          expr("""CAST(mass div (CAST(n_base AS DECIMAL(38,0)) * n_cur)
            | AS BIGINT)""".stripMargin.replaceAll("\\s+", " "))
            .as("w1_micro"))
    }),

    // Decile gains/lift table of "balance as model score" against the
    // BUILDING positive class — the targeting readout: take the top
    // d/10 of the population by score, how many positives are captured
    // (gain) and at what multiple of random (lift)? Deciles cut at VALUE
    // granularity (smallest top-set by score containing ≥ ⌈n·d/10⌉
    // customers), so tie handling never needs a global row order; counts
    // at the cut come off the census below-frame (n − below monotone in
    // v), readouts close as exact ppm integer divisions. d=10 is the
    // whole population: gain = lift = 10⁶ by construction (spec-pinned).
    "q_lift_gains" -> ((s, dir) => {
      val census = t(s, dir, "customer").select(
        cents(col("c_acctbal")).as("v"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L)
          .as("pos"))
        .groupBy(col("v"))
        .agg(count(lit(1)).as("t"), sum(col("pos")).as("n1v"))
      val cen = RangeBuckets.withRangeBucket(census, "v")
      val w = Window.partitionBy(col("bucket")).orderBy(col("v"))
      val loc = cen
        .withColumn("cumt", sum(col("t")).over(w))
        .withColumn("cum1", sum(col("n1v")).over(w))
      val bt = cen.groupBy(col("bucket")).agg(sum(col("t")).as("bn"),
        sum(col("n1v")).as("b1"))
      val off = bt.as("x")
        .join(bt.as("o"), col("o.bucket") < col("x.bucket"), "left")
        .groupBy(col("x.bucket").as("bucket"))
        .agg(coalesce(sum(col("o.bn")), lit(0L)).as("offn"),
          coalesce(sum(col("o.b1")), lit(0L)).as("off1"))
      val tot = census.agg(sum(col("t")).as("n"), sum(col("n1v")).as("n1"))
      val grid = t(s, dir, "customer").sparkSession.range(1, 11)
        .select(col("id").as("decile"))
      loc.join(broadcast(off), Seq("bucket"))
        .select(col("v"),
          (col("offn") + col("cumt") - col("t")).as("below"),
          (col("off1") + col("cum1") - col("n1v")).as("n1b"))
        .crossJoin(broadcast(tot))
        .crossJoin(broadcast(grid))
        // div, not `/` (double): ceil(n·d/10) must stay integral — the
        // d=10 target is exactly n, and n.9 would empty the decile
        .filter(col("n") - col("below") >= expr("(n * decile + 9) div 10"))
        .groupBy(col("decile"))
        .agg(max(col("v")).as("cut_cents"),
          min(col("n") - col("below")).as("n_cum"),
          min(col("n1") - col("n1b")).as("pos_cum"),
          first(col("n")).as("n"), first(col("n1")).as("n1"))
        .select(col("decile"), col("cut_cents"), col("n_cum"),
          col("pos_cum"),
          expr("(1000000 * pos_cum) div n1").as("gain_ppm"),
          expr("""CAST((1000000 * CAST(pos_cum AS DECIMAL(38,0)) * n)
            | div (CAST(n1 AS DECIMAL(38,0)) * n_cum) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("lift_ppm"))
        .orderBy(col("decile"))
    }),

    // Cohen's d effect size of urgent/high priority on order value: the
    // practical-relevance companion to the significance tests. Exact
    // integer cells per group (n, ΣX, ΣX²) → pooled variance
    // sp² = ⌊(ss₁ + ss₂)/(n−2)⌋ in cents² (magnitude ~σ², double-exact
    // at any n) and the mean difference in micro-cents by signed exact
    // division; d closes over those two small exact cells only.
    "q_cohens_d" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("g"),
        cents(col("o_totalprice")).as("x"))
      o.groupBy(col("g")).agg(
          count(lit(1)).as("ng"),
          sum(col("x").cast(DecimalType(38, 0))).as("sg"),
          sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("qg"))
        .select(col("g"), col("ng"), col("sg"), col("qg"),
          expr("""CAST(qg - (sg * sg - (sg * sg) % CAST(ng AS DECIMAL(38,0)))
            | / CAST(ng AS DECIMAL(38,0)) AS DECIMAL(38,0))"""
            .stripMargin.replaceAll("\\s+", " ")).as("ssg"))
        .agg(
          sum(when(col("g") === 1, col("ng")).otherwise(0L)).as("n_urgent"),
          sum(when(col("g") === 0, col("ng")).otherwise(0L)).as("n_rest"),
          sum(when(col("g") === 1, col("sg"))
            .otherwise(lit(0).cast(DecimalType(38, 0)))).as("s1"),
          sum(when(col("g") === 0, col("sg"))
            .otherwise(lit(0).cast(DecimalType(38, 0)))).as("s0"),
          sum(col("ssg")).as("ssw"))
        .select(col("n_urgent"), col("n_rest"),
          expr("""(1000000 * (s1 * n_rest - s0 * n_urgent))
            | div (CAST(n_urgent AS DECIMAL(38,0)) * n_rest)"""
            .stripMargin.replaceAll("\\s+", " ")).as("dmu_micro"),
          expr("ssw div (n_urgent + n_rest - 2)").as("sp2_c2"))
        .select(col("n_urgent"), col("n_rest"), col("dmu_micro"),
          col("sp2_c2"), round(expr(cohensDExpr), 6).as("d"))
    }),

    // Brown-Forsythe Levene test: variance homogeneity across order
    // priorities — the precondition audit for q_anova_f. z = |x − med_g|
    // with the per-group disc median off the (grp, v) census (per-group
    // bucketed cumsums; offsets merge on the ≤ k×|buckets| frame), then
    // the ANOVA F machinery on z with the same exact-integer closing
    // (cents², w_ppm). Two corpus reads (census, then z) — the median
    // must exist before z can be formed; both are keyed aggregates.
    "q_levene_bf" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderpriority").as("grp"),
        cents(col("o_totalprice")).as("v"))
      val tgv = o.groupBy(col("grp"), col("v")).agg(count(lit(1)).as("cnt"))
        // round 18: census leaf (ScanCount: the fan-out re-ran the
        // fact scan per consumer; see OPTIMIZATION_r18.md)
        .localCheckpoint(eager = false)
      val cen = RangeBuckets.withRangeBucket(tgv, "v")
      val w = Window.partitionBy(col("grp"), col("bucket")).orderBy(col("v"))
      val loc = cen.withColumn("cumt", sum(col("cnt")).over(w))
      val bt = cen.groupBy(col("grp"), col("bucket"))
        .agg(sum(col("cnt")).as("bn"))
      val off = bt.as("x")
        .join(bt.as("o"), col("o.grp") === col("x.grp")
          && col("o.bucket") < col("x.bucket"), "left")
        .groupBy(col("x.grp").as("grp"), col("x.bucket").as("bucket"))
        .agg(coalesce(sum(col("o.bn")), lit(0L)).as("offn"))
      val ng = tgv.groupBy(col("grp")).agg(sum(col("cnt")).as("ng"))
      val med = loc.join(broadcast(off), Seq("grp", "bucket"))
        .select(col("grp"), col("v"), col("cnt"),
          (col("offn") + col("cumt") - col("cnt")).as("below"))
        .join(broadcast(ng), Seq("grp"))
        .filter(col("below") + col("cnt") >= expr("(ng + 1) div 2"))
        .groupBy(col("grp")).agg(min(col("v")).as("med"))
      val z = o.join(broadcast(med), Seq("grp"))
        .select(col("grp"), abs(col("v") - col("med")).as("x"))
      val g = z.groupBy(col("grp")).agg(
        count(lit(1)).as("ngr"),
        sum(col("x").cast(DecimalType(38, 0))).as("sg"),
        sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("qg"))
      g.select(col("ngr"), col("sg"), col("qg"),
          expr("""CAST((sg * sg - (sg * sg) % CAST(ngr AS DECIMAL(38,0)))
            | / CAST(ngr AS DECIMAL(38,0)) AS DECIMAL(38,0))"""
            .stripMargin.replaceAll("\\s+", " ")).as("t2g"))
        .agg(count(lit(1)).as("k_groups"), sum(col("ngr")).as("n_orders"),
          sum(col("sg")).as("s"), sum(col("qg")).as("q"),
          sum(col("t2g")).as("w"))
        .select(col("k_groups"), col("n_orders"),
          expr("""CAST(w - (s * s - (s * s) % CAST(n_orders AS DECIMAL(38,0)))
            | / CAST(n_orders AS DECIMAL(38,0)) AS DECIMAL(38,0))"""
            .stripMargin.replaceAll("\\s+", " ")).as("ssb_z"),
          expr("CAST(q - w AS DECIMAL(38,0))").as("ssw_z"))
        .select(col("k_groups"), col("n_orders"),
          // Emitted in KILOdollars² (exact div 10¹⁰ both engines — the
          // q_icc precedent): cents² SS cells on z reach ~7.8×10¹⁸ at
          // sf0.1 and grow linearly in n, so the r12 dollars² fix had
          // only ~3× headroom against the 2⁵³ output contract (breach
          // near sf0.3). Kilodollars² buys 10⁶× headroom. w_ppm still
          // closes on the exact cents² operands.
          expr("ssb_z div 10000000000").as("ssb_zkd2"),
          expr("ssw_z div 10000000000").as("ssw_zkd2"),
          expr("""CAST((1000000 * ssb_z * (n_orders - k_groups))
            | div ((k_groups - 1) * ssw_z) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("w_ppm"))
    }),

    // McNemar's test: do the two order-urgency heuristics (A: total
    // above the global median; B: ≥ 4 line items) disagree with truth
    // at different rates? Only the discordant cells matter: b = A right,
    // B wrong; c = A wrong, B right; χ²cc = (|b−c|−1)²/(b+c). One keyed
    // join + one aggregate; the median is a broadcast 1-row census
    // readout.
    "q_mcnemar" -> ((s, dir) =>
      raterFrame(s, dir)
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("ra") === col("truth")
            && col("rb") =!= col("truth"), 1L).otherwise(0L)).as("b"),
          sum(when(col("ra") =!= col("truth")
            && col("rb") === col("truth"), 1L).otherwise(0L)).as("c"))
        .select(col("n_orders"), col("b"), col("c"),
          round(expr(mcnemarExpr), 6).as("chi2_cc"))),

    // Fleiss' kappa for the three heuristic raters (median split, line
    // count, status) labeling orders urgent/not: chance-corrected
    // multi-rater agreement from two exact cells (Σ n_i1, Σ per-item
    // squared category counts). Same frame as q_mcnemar; the closing
    // formula sees only < 2⁵³ integers.
    "q_fleiss_kappa" -> ((s, dir) =>
      raterFrame(s, dir)
        .select((col("ra") + col("rb") + col("rc")).as("n1"))
        .agg(count(lit(1)).as("n_orders"), sum(col("n1")).as("sum1"),
          sum(col("n1") * col("n1")
            + (lit(3L) - col("n1")) * (lit(3L) - col("n1"))).as("sumsq"))
        .select(col("n_orders"), col("sum1"), col("sumsq"),
          round(expr(fleissPbar), 6).as("pbar"),
          round(expr(fleissPe), 6).as("pe"),
          round(expr(fleissKappa), 6).as("kappa")))
  )

  override def oracle: Map[String, String] = Map(

    "q_wasserstein" ->
      s"""WITH e AS (
         |  SELECT epoch_us(ts) // $DayUs AS day,
         |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
         |  FROM events WHERE value IS NOT NULL),
         |mid AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS mid FROM e),
         |census AS (
         |  SELECT v,
         |    SUM(CASE WHEN day < mid.mid THEN 1 ELSE 0 END) AS a,
         |    SUM(CASE WHEN day >= mid.mid THEN 1 ELSE 0 END) AS b
         |  FROM e, mid GROUP BY 1),
         |cum AS (
         |  SELECT v,
         |    SUM(a) OVER (ORDER BY v) AS ca,
         |    SUM(b) OVER (ORDER BY v) AS cb,
         |    COALESCE(LEAD(v) OVER (ORDER BY v), v) AS vn
         |  FROM census),
         |tot AS (SELECT CAST(SUM(a) AS BIGINT) AS n_base,
         |  CAST(SUM(b) AS BIGINT) AS n_cur, COUNT(*) AS n_values
         |  FROM census),
         |mass AS (
         |  SELECT SUM(ABS(CAST(ca AS HUGEINT) * tot.n_cur
         |      - CAST(cb AS HUGEINT) * tot.n_base) * (vn - v)) AS m
         |  FROM cum, tot)
         |SELECT n_base, n_cur, n_values,
         |  CAST(mass.m // (CAST(n_base AS HUGEINT) * n_cur) AS BIGINT)
         |    AS w1_micro
         |FROM tot, mass""".stripMargin,

    "q_lift_gains" ->
      """WITH census AS (
        |  SELECT CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS v,
        |    COUNT(*) AS t,
        |    SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END)
        |      AS n1v
        |  FROM customer GROUP BY 1),
        |cum AS (
        |  SELECT v,
        |    COALESCE(SUM(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS below,
        |    COALESCE(SUM(n1v) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n1b
        |  FROM census),
        |tot AS (SELECT CAST(SUM(t) AS BIGINT) AS n,
        |  CAST(SUM(n1v) AS BIGINT) AS n1 FROM census),
        |grid AS (SELECT g.decile FROM
        |  unnest(generate_series(1, 10)) AS g(decile)),
        |hits AS (
        |  SELECT grid.decile, cum.v, tot.n, tot.n1,
        |    tot.n - cum.below AS cnt_ge, tot.n1 - cum.n1b AS pos_ge
        |  FROM cum, tot, grid
        |  WHERE tot.n - cum.below >= (tot.n * grid.decile + 9) // 10),
        |agg AS (
        |  SELECT decile, CAST(MAX(v) AS BIGINT) AS cut_cents,
        |    CAST(MIN(cnt_ge) AS BIGINT) AS n_cum,
        |    CAST(MIN(pos_ge) AS BIGINT) AS pos_cum,
        |    MAX(n) AS n, MAX(n1) AS n1
        |  FROM hits GROUP BY 1)
        |SELECT CAST(decile AS BIGINT) AS decile, cut_cents, n_cum, pos_cum,
        |  (1000000 * pos_cum) // n1 AS gain_ppm,
        |  CAST((1000000 * CAST(pos_cum AS HUGEINT) * n)
        |    // (CAST(n1 AS HUGEINT) * n_cum) AS BIGINT) AS lift_ppm
        |FROM agg ORDER BY decile""".stripMargin,

    "q_cohens_d" ->
      s"""WITH o AS (
         |  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |      THEN 1 ELSE 0 END AS g,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
         |  FROM orders),
         |grp AS (
         |  SELECT g, COUNT(*) AS ng, SUM(CAST(x AS HUGEINT)) AS sg,
         |    SUM(CAST(x AS HUGEINT) * x) AS qg
         |  FROM o GROUP BY 1),
         |cells AS (
         |  SELECT
         |    CAST(SUM(CASE WHEN g = 1 THEN ng ELSE 0 END) AS BIGINT)
         |      AS n_urgent,
         |    CAST(SUM(CASE WHEN g = 0 THEN ng ELSE 0 END) AS BIGINT)
         |      AS n_rest,
         |    SUM(CASE WHEN g = 1 THEN sg ELSE 0 END) AS s1,
         |    SUM(CASE WHEN g = 0 THEN sg ELSE 0 END) AS s0,
         |    SUM(qg - (sg * sg) // CAST(ng AS HUGEINT)) AS ssw
         |  FROM grp)
         |SELECT n_urgent, n_rest, dmu_micro, sp2_c2,
         |  round($cohensDExpr, 6) AS d
         |FROM (SELECT n_urgent, n_rest,
         |  CAST((1000000 * (s1 * n_rest - s0 * n_urgent))
         |    // (CAST(n_urgent AS HUGEINT) * n_rest) AS BIGINT)
         |    AS dmu_micro,
         |  CAST(ssw // CAST(n_urgent + n_rest - 2 AS HUGEINT) AS BIGINT)
         |    AS sp2_c2
         |  FROM cells)""".stripMargin,

    "q_levene_bf" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM orders),
        |tgv AS (SELECT grp, v, COUNT(*) AS cnt FROM o GROUP BY 1, 2),
        |cum AS (
        |  SELECT grp, v, cnt,
        |    COALESCE(SUM(cnt) OVER (PARTITION BY grp ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS below,
        |    SUM(cnt) OVER (PARTITION BY grp) AS ng
        |  FROM tgv),
        |med AS (
        |  SELECT grp, MIN(v) AS med FROM cum
        |  WHERE below + cnt >= (ng + 1) // 2 GROUP BY 1),
        |z AS (
        |  SELECT o.grp, ABS(o.v - med.med) AS x
        |  FROM o JOIN med ON o.grp = med.grp),
        |g AS (
        |  SELECT grp, COUNT(*) AS ngr, SUM(CAST(x AS HUGEINT)) AS sg,
        |    SUM(CAST(x AS HUGEINT) * x) AS qg
        |  FROM z GROUP BY 1),
        |cells AS (
        |  SELECT COUNT(*) AS k_groups, SUM(ngr) AS n_orders,
        |    SUM(sg) AS s, SUM(qg) AS q,
        |    SUM((sg * sg) // CAST(ngr AS HUGEINT)) AS w
        |  FROM g)
        |SELECT CAST(k_groups AS BIGINT) AS k_groups,
        |  CAST(n_orders AS BIGINT) AS n_orders,
        |  CAST((w - (s * s) // CAST(n_orders AS HUGEINT)) // 10000000000
        |    AS BIGINT) AS ssb_zkd2,
        |  CAST((q - w) // 10000000000 AS BIGINT) AS ssw_zkd2,
        |  CAST((1000000 * (w - (s * s) // CAST(n_orders AS HUGEINT))
        |      * (n_orders - k_groups))
        |    // ((k_groups - 1) * (q - w)) AS BIGINT) AS w_ppm
        |FROM cells""".stripMargin,

    "q_mcnemar" ->
      s"""WITH $medCensusSql,
         |lc AS (
         |  SELECT l_orderkey AS o_orderkey, COUNT(*) AS n_lines
         |  FROM lineitem GROUP BY 1),
         |r AS (
         |  SELECT
         |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |      THEN 1 ELSE 0 END AS truth,
         |    CASE WHEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT) > medc.med THEN 1 ELSE 0 END AS ra,
         |    CASE WHEN COALESCE(lc.n_lines, 0) >= 4 THEN 1 ELSE 0 END
         |      AS rb
         |  FROM orders LEFT JOIN lc USING (o_orderkey), medc),
         |cells AS (
         |  SELECT COUNT(*) AS n_orders,
         |    SUM(CASE WHEN ra = truth AND rb <> truth THEN 1 ELSE 0 END)
         |      AS b,
         |    SUM(CASE WHEN ra <> truth AND rb = truth THEN 1 ELSE 0 END)
         |      AS c
         |  FROM r)
         |SELECT CAST(n_orders AS BIGINT) AS n_orders,
         |  CAST(b AS BIGINT) AS b, CAST(c AS BIGINT) AS c,
         |  round($mcnemarExpr, 6) AS chi2_cc
         |FROM cells""".stripMargin,

    "q_fleiss_kappa" ->
      s"""WITH $medCensusSql,
         |lc AS (
         |  SELECT l_orderkey AS o_orderkey, COUNT(*) AS n_lines
         |  FROM lineitem GROUP BY 1),
         |r AS (
         |  SELECT
         |    (CASE WHEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT) > medc.med THEN 1 ELSE 0 END)
         |    + (CASE WHEN COALESCE(lc.n_lines, 0) >= 4 THEN 1 ELSE 0 END)
         |    + (CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n1
         |  FROM orders LEFT JOIN lc USING (o_orderkey), medc),
         |cells AS (
         |  SELECT COUNT(*) AS n_orders, SUM(n1) AS sum1,
         |    SUM(n1 * n1 + (3 - n1) * (3 - n1)) AS sumsq
         |  FROM r)
         |SELECT CAST(n_orders AS BIGINT) AS n_orders,
         |  CAST(sum1 AS BIGINT) AS sum1, CAST(sumsq AS BIGINT) AS sumsq,
         |  round($fleissPbar, 6) AS pbar,
         |  round($fleissPe, 6) AS pe,
         |  round($fleissKappa, 6) AS kappa
         |FROM cells""".stripMargin
  )
}
