package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.{Percentiles, RangeBuckets}
import graft.sources.Tables

/** Round-12 tranche 2: inference guardrails, tail risk and data
  * contracts — Benjamini-Hochberg FDR over a family of per-brand Welch
  * tests (the multiple-testing control every metrics platform needs
  * before reading 25 dashboards at α=.05), the Hill tail-index estimator
  * of customer spend (how heavy is the whale tail — pricing/risk), an
  * l-diversity audit (k-anonymity's sensitive-attribute partner),
  * a walk-forward forecast backtest (MAPE/sMAPE of naive vs
  * seasonal-naive on a 28-day holdout — the baseline gate a forecast
  * model must beat), an order⇄lineitem reconciliation audit (the
  * bookkeeping data contract: does the header total match the sum of
  * its lines), and peaks-over-threshold excess statistics per event
  * type (the extreme-value readout behind alert thresholds).
  *
  * Determinism: the [[StatOps4]] discipline — exact integer cents/micro
  * cells; doubles only in closing formulas written with the IDENTICAL
  * expression shape on both engines (the Welch z + normal-CDF
  * approximation here follows the q_welch_ttest string-routed-decimal
  * precedent; the CDF polynomial is expanded as explicit products, no
  * `pow`, so both engines run the same IEEE multiply chain); BH
  * comparisons run on the 6-dp-rounded p (both engines round before
  * comparing, so an ulp of `exp` divergence cannot flip a decision).
  *
  * Scale posture: every order statistic is census-sized and rank-free
  * ([[RangeBuckets.belowFrame]] / [[Percentiles.exactDisc]]); the BH
  * step-up runs on the ≤|brands|-row p-value frame via broadcast theta
  * joins (never a window); the backtest grid is the calendar-bounded
  * daily census with self-joins on day arithmetic (no lag window); the
  * reconciliation is one keyed fact-fact join.
  */
object StatOps5 extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  private val DayUs = 86400L * 1000000L

  /** Shared FDR staging (q_fdr_bh + q_fdr_by): the per-brand Welch
    * z → two-sided A&S p (6-dp rounded), ranked r_i = #{j: p_j ≤ p_i}
    * by broadcast theta self-join, with the test count m riding along. */
  private def fdrRanked(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(col("l_returnflag").isin("R", "A"))
      .join(broadcast(t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        when(col("l_returnflag") === "R", 1).otherwise(0).as("g"),
        col("l_extendedprice").as("v"))
    val m0 = li.groupBy(col("p_brand"), col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(DecimalType(18, 4)))
          .cast("string").cast("double").as("sv"),
        sum((col("v") * col("v")).cast(DecimalType(38, 8)))
          .cast("string").cast("double").as("ssv"))
    val st = m0.select(col("p_brand"), col("g"), col("n"),
      (col("sv") / col("n")).as("mean"),
      ((col("ssv") - col("sv") * col("sv") / col("n"))
        / (col("n") - 1)).as("vr"))
    val cells = st.filter(col("g") === 1).as("x")
      .join(st.filter(col("g") === 0).as("y"),
        col("x.p_brand") === col("y.p_brand"))
      .filter(col("x.n") >= 2 && col("y.n") >= 2)
      .select(col("x.p_brand").as("p_brand"),
        col("x.n").as("n_r"), col("y.n").as("n_a"),
        ((col("x.mean") - col("y.mean")) /
          sqrt(col("x.vr") / col("x.n") + col("y.vr") / col("y.n")))
          .as("z"))
      .withColumn("az", abs(col("z")))
      .withColumn("tw", lit(1.0) / (lit(1.0) + lit(0.2316419) * col("az")))
      .withColumn("p", round(
        expr("""2 * ((exp(-az*az/2) / 2.5066282746310002) *
               (0.319381530*tw - 0.356563782*(tw*tw)
                + 1.781477937*(tw*tw*tw) - 1.821255978*(tw*tw*tw*tw)
                + 1.330274429*(tw*tw*tw*tw*tw)))"""), 6))
      .select(col("p_brand"), col("n_r"), col("n_a"),
        round(col("z"), 6).as("z"), col("p"))
      .localCheckpoint()
    val mTot = cells.agg(count(lit(1)).as("m"))
    cells
      .join(broadcast(cells.select(col("p").as("p2"))),
        col("p2") <= col("p"))
      .groupBy(col("p_brand"), col("n_r"), col("n_a"), col("z"),
        col("p"))
      .agg(count(lit(1)).as("p_rank"))
      .crossJoin(broadcast(mTot))
  }

  /** Oracle twin of [[fdrRanked]] — CTEs `li…pc`, `mt`, `rk`. */
  private val fdrSqlStaging =
    """li AS (
      |  SELECT p.p_brand,
      |    CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS g,
      |    l.l_extendedprice AS v
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  WHERE l.l_returnflag IN ('R', 'A')),
      |m0 AS (
      |  SELECT p_brand, g, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(CAST(SUM(CAST(v AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
      |      AS sv,
      |    CAST(CAST(SUM(CAST(v*v AS DECIMAL(38,8))) AS VARCHAR)
      |      AS DOUBLE) AS ssv
      |  FROM li GROUP BY 1, 2),
      |st AS (SELECT p_brand, g, n, sv/n AS mean,
      |         (ssv - sv*sv/n)/(n-1) AS vr FROM m0),
      |zc AS (
      |  SELECT x.p_brand, x.n AS n_r, y.n AS n_a,
      |    (x.mean - y.mean) / SQRT(x.vr/x.n + y.vr/y.n) AS z
      |  FROM (SELECT * FROM st WHERE g = 1) x
      |  JOIN (SELECT * FROM st WHERE g = 0) y USING (p_brand)
      |  WHERE x.n >= 2 AND y.n >= 2),
      |pc AS (
      |  SELECT p_brand, n_r, n_a, round(z, 6) AS z,
      |    round(2 * ((exp(-abs(z)*abs(z)/2) / 2.5066282746310002) *
      |      (0.319381530*(1/(1+0.2316419*abs(z)))
      |       - 0.356563782*((1/(1+0.2316419*abs(z)))*(1/(1+0.2316419*abs(z))))
      |       + 1.781477937*((1/(1+0.2316419*abs(z)))*(1/(1+0.2316419*abs(z)))*(1/(1+0.2316419*abs(z))))
      |       - 1.821255978*((1/(1+0.2316419*abs(z)))*(1/(1+0.2316419*abs(z)))*(1/(1+0.2316419*abs(z)))*(1/(1+0.2316419*abs(z))))
      |       + 1.330274429*((1/(1+0.2316419*abs(z)))*(1/(1+0.2316419*abs(z)))*(1/(1+0.2316419*abs(z)))*(1/(1+0.2316419*abs(z)))*(1/(1+0.2316419*abs(z)))))), 6)
      |      AS p
      |  FROM zc),
      |mt AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pc),
      |rk AS (
      |  SELECT a.p_brand, a.n_r, a.n_a, a.z, a.p,
      |    CAST(COUNT(*) AS BIGINT) AS p_rank
      |  FROM pc a JOIN pc b ON b.p <= a.p
      |  GROUP BY 1, 2, 3, 4, 5)""".stripMargin

  override def defs: Map[String, Q] = Map[String, Q](

    // Benjamini-Hochberg FDR (α = .05) over 25 simultaneous per-brand
    // Welch z-tests of returned ('R') vs accepted ('A') line prices.
    // Per brand: n, Σv, Σv² as string-routed exact decimals → mean/var
    // (the q_welch_ttest staging), z the closing IEEE formula, and the
    // two-sided p from the Abramowitz-Stegun 26.2.17 normal-CDF
    // polynomial (|ε| < 7.5e-8) — expanded as explicit t·t·t products
    // so Spark and DuckDB run identical multiply chains. p is rounded
    // to 6 dp BEFORE any comparison. The step-up is rank-free on the
    // 25-row cell frame: r_i = #{j : p_j ≤ p_i} by broadcast theta
    // self-join, candidates p ≤ α·r/m as the integer-ish 20·m·p ≤ r,
    // the rejection threshold max{p ∈ candidates} a 1-row broadcast.
    // The (brand, z, p, rank) staging is shared with q_fdr_by via
    // [[fdrRanked]].
    "q_fdr_bh" -> ((s, dir) => {
      val ranked = fdrRanked(s, dir)
      val thr = ranked
        .agg(max(when(lit(20.0) * col("m") * col("p") <= col("p_rank"),
          col("p"))).as("thr"))
      ranked.crossJoin(broadcast(thr))
        .select(col("p_brand"), col("n_r"), col("n_a"), col("z"),
          col("p"), col("p_rank"), col("m").as("n_tests"),
          (col("p") <= coalesce(col("thr"), lit(-1.0))).as("rejected"))
        .orderBy(col("p_brand"))
    }),

    // Benjamini-Yekutieli FDR (round-13 session 3): the
    // arbitrary-dependence-safe step-up beside q_fdr_bh — same ranked
    // per-brand p frame, threshold divided by the harmonic number
    // H_m = Σ1/i. H is staged as the EXACT integer Σ (10⁶ div i)
    // (declared micro-resolution) and p is recovered to its exact
    // micro integer (p was round(·,6), so round(p·10⁶) is lossless),
    // making the step-up condition 20·m·H·p_micro ≤ 10¹²·rank pure
    // BIGINT arithmetic — no double ever decides a rejection. BY
    // rejects a SUBSET of BH by construction (spec-pinned).
    "q_fdr_by" -> ((s, dir) => {
      val ranked = fdrRanked(s, dir)
        .withColumn("p_micro", expr("CAST(round(p * 1000000) AS BIGINT)"))
        .withColumn("h_micro", expr(
          "aggregate(sequence(1L, m), 0L, (acc, i) -> acc + 1000000 div i)"))
      val thr = ranked
        .agg(max(when(
          lit(20L) * col("m") * col("h_micro") * col("p_micro")
            <= lit(1000000000000L) * col("p_rank"),
          col("p_micro"))).as("thr_micro"))
      ranked.crossJoin(broadcast(thr))
        .select(col("p_brand"), col("n_r"), col("n_a"), col("z"),
          col("p"), col("p_rank"), col("m").as("n_tests"),
          col("h_micro"),
          (col("p_micro") <= coalesce(col("thr_micro"), lit(-1L)))
            .as("rejected"))
        .orderBy(col("p_brand"))
    }),

    // Hill tail-index of customer lifetime spend: over the top
    // k = clamp(n/20, 10, n−1) spenders, γ̂ = (1/k)·Σ ln(xᵢ/x₍ₙ₋ₖ₎) and
    // α̂ = 1/γ̂ — small α̂ = heavy whale tail. Rank-free: the census
    // below-frame gives the threshold value by covering probe
    // (below < n−k ≤ below+t) and each value's copy-count inside the
    // top k as least(t, below+t−(n−k)) — ties handled exactly, no
    // per-row rank. ln terms are per-row micro-rounded then exactly
    // summed (the q_theil staging); α̂ closes as one HUGEINT division.
    "q_hill_tail" -> ((s, dir) => {
      val census = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long")).as("x"))
        .groupBy(col("x").as("v")).agg(count(lit(1)).as("t"))
        // round 18: census leaf (ScanCount: the fan-out re-ran the
        // fact scan per consumer; see OPTIMIZATION_r18.md)
        .localCheckpoint(eager = false)
      val bel = RangeBuckets.belowFrame(census)
      val nk = census.agg(sum(col("t")).as("n"))
        .select(col("n"),
          least(greatest(expr("n div 20"), lit(10L)), col("n") - 1)
            .as("k"))
      val thr = bel.crossJoin(broadcast(nk))
        .filter(col("below") < col("n") - col("k") &&
          col("n") - col("k") <= col("below") + col("t"))
        .select(col("v").as("vthr"), col("n"), col("k"))
      bel.crossJoin(broadcast(thr))
        .filter(col("below") + col("t") > col("n") - col("k"))
        .select(col("n"), col("k"), col("vthr"),
          round(lit(1000000.0) *
            least(col("t"), col("below") + col("t") - (col("n") - col("k")))
            * log(col("v").cast("double") / col("vthr").cast("double")), 0)
            .cast("long").as("tm"))
        .groupBy(col("n"), col("k"), col("vthr"))
        .agg(sum(col("tm")).as("s"))
        .select(col("n").as("n_customers"), col("k"),
          col("vthr").as("thr_cents"), col("s").as("sum_ln_micro"),
          expr("""CAST((CAST(k AS DECIMAL(38,0)) * 1000000000000)
                 div nullif(s, 0) AS BIGINT)""").as("alpha_micro"))
    }),

    // l-diversity audit: k-anonymity's partner for the SENSITIVE
    // attribute. Quasi-identifier = (order priority, order week);
    // sensitive = the customer's nation. Per QI class, l = #distinct
    // sensitive values; the histogram of l with classes under l = 5
    // flagged — a class of any size is still re-identifiable if all its
    // members share one nation. Two keyed aggregates after one keyed
    // fact-dim join; nothing is collected.
    "q_l_diversity" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderpriority"),
          expr(s"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div ${7 * DayUs}").as("wk"))
        .join(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderpriority"), col("wk"))
        .agg(count(lit(1)).as("sz"),
          countDistinct(col("c_nationkey")).as("l"))
        .groupBy(col("l").as("l_count"))
        .agg(count(lit(1)).as("n_classes"), sum(col("sz")).as("n_rows"))
        .withColumn("at_risk", col("l_count") < 5)
        .orderBy(col("l_count"))
    }),

    // Walk-forward forecast backtest on daily revenue: naive (yesterday)
    // vs seasonal-naive (same weekday last week) over the last-28-day
    // holdout — the baseline gate a real forecaster must beat, reported
    // as MAPE and sMAPE in exact ppm. The zero-filled daily grid is the
    // q_changepoint staging (span-guarded); lags are self-joins on day
    // arithmetic over the calendar-bounded census — no lag window, no
    // single-partition sort. Zero-revenue actuals are excluded from both
    // metrics (declared: MAPE is undefined at 0); per-day terms are
    // exact truncating integer divisions staged through DECIMAL(38,0),
    // their mean one more exact division.
    "q_mape_backtest" -> ((s, dir) => {
      val d = t(s, dir, "lineitem")
        .select(expr(s"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div $DayUs").as("day"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("cents"))
        .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
      val b = d.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
        .select(col("mn"),
          Parity.guardedSpanValue(col("mx"),
            col("mx") - col("mn") + 1, Parity.MaxSpanCells,
            "q_mape_backtest daily grid").as("mx"))
      val z = b.select(explode(sequence(col("mn"), col("mx"))).as("day"))
        .join(d, Seq("day"), "left")
        .select(col("day"), coalesce(col("cents"), lit(0L)).as("cents"))
        .localCheckpoint()
      val h = z.crossJoin(broadcast(b.select(col("mx"))))
        .filter(col("day") > col("mx") - 28 && col("cents") > 0)
        .select(col("day"), col("cents"))
      def model(name: String, lag: Int): DataFrame =
        h.join(z.select((col("day") + lag).as("day"),
            col("cents").as("pred")), Seq("day"))
          .select(
            expr("""CAST((1000000 * CAST(abs(pred - cents) AS DECIMAL(38,0)))
                   div cents AS BIGINT)""").as("ape"),
            expr("""CAST((2000000 * CAST(abs(pred - cents) AS DECIMAL(38,0)))
                   div (pred + cents) AS BIGINT)""").as("sape"),
            abs(col("pred") - col("cents")).as("ae"))
          .agg(count(lit(1)).as("n_days"),
            expr("sum(ape) div count(1)").as("mape_ppm"),
            expr("sum(sape) div count(1)").as("smape_ppm"),
            max(col("ae")).as("max_ae_cents"))
          .select(lit(name).as("model"), col("n_days"), col("mape_ppm"),
            col("smape_ppm"), col("max_ae_cents"))
      model("naive", 1).unionByName(model("snaive7", 7))
        .orderBy(col("model"))
    }),

    // Order ⇄ lineitem reconciliation — the bookkeeping data contract:
    // per order, the header total vs the exact cents sum of its lines,
    // with headers carrying no lines counted separately. One keyed
    // fact-fact join (shuffles on the order key, AQE-skew-safe); the
    // readout is a single row of exact counters. The synthetic corpus
    // does NOT reconcile (totals and lines are drawn independently) —
    // the point is the audit shape, and the >1% mismatch share is the
    // drift alarm a pipeline would page on.
    "q_order_recon" -> ((s, dir) => {
      val lc = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
          .cast("long")).as("line_cents"))
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("total_cents"))
        .join(lc, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("total_cents"), col("line_cents"),
          col("line_cents").isNull.as("lineless"),
          abs(coalesce(col("line_cents"), lit(0L)) - col("total_cents"))
            .as("d"))
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("lineless"), 1L).otherwise(0L)).as("n_lineless"),
          sum(when(!col("lineless") &&
            col("d") * 100 > col("total_cents"), 1L).otherwise(0L))
            .as("n_mismatch_gt1pct"),
          max(when(!col("lineless"), col("d"))).as("max_diff_cents"),
          sum(when(!col("lineless"), col("d").cast(DecimalType(38, 0)))
            .otherwise(lit(0L).cast(DecimalType(38, 0))))
            .cast("long").as("total_abs_diff_cents"))
    }),

    // Peaks-over-threshold excess statistics per event type: the
    // exact-DISC p99 of the micro-unit value as the threshold (the
    // distributed rank frame — no per-group window), then count / mean /
    // max of the exceedances above it — the extreme-value readout behind
    // alert thresholds (POT is the standard EVT estimator input). Mean
    // excess is one exact integer division; the threshold frame is
    // dim-sized and broadcasts back into the fact scan.
    "q_pot_excess" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          (col("value").cast(DecimalType(18, 6)) * 1000000)
            .cast("long").as("vm"))
      val thr = Percentiles.exactDisc(e, col("event_type"), col("vm"),
          Seq((99, 100)), Seq("thr"))
        .select(col("group").as("event_type"), col("thr"))
      e.join(broadcast(thr), Seq("event_type"))
        .filter(col("vm") > col("thr"))
        .groupBy(col("event_type"), col("thr"))
        .agg(count(lit(1)).as("n_exceed"),
          sum((col("vm") - col("thr")).cast(DecimalType(38, 0)))
            .as("sx"),
          max(col("vm") - col("thr")).as("max_excess_micro"))
        .select(col("event_type"), col("thr").as("thr_micro"),
          col("n_exceed"),
          expr("CAST((sx - sx % n_exceed) / n_exceed AS BIGINT)")
            .as("mean_excess_micro"),
          col("max_excess_micro"))
        .orderBy(col("event_type"))
    }),

    // Simplified silhouette score of the labeled embedding corpus — the
    // clustering-eval readout (how separated are the label clusters in
    // embedding space): per point, a = squared distance to its OWN label
    // centroid, b = min over OTHER label centroids, s = (b−a)/max(a,b).
    // Cross-engine exactness is the q_embed_drift staging: coordinates
    // micro-floored to integers, centroids the exact long-sum / count
    // quotient (identical doubles both engines), per-(point,label)
    // distances decimal-routed sums of identical per-dim terms, s
    // micro-rounded per row and exactly averaged with the truncating
    // subtract-remainder division (sign-safe — s can be negative).
    // Scale: the exploded (point, dim, label) stream is n·d·|labels|
    // NARROW rows feeding one map-side-combinable aggregate — no
    // point-point pairs ever form; centroids are a d·|labels| broadcast.
    "q_silhouette" -> ((s, dir) => {
      val pm = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("vec_id"), col("label"), col("dim"),
          floor(col("v").cast("double") * 1000000).cast("long").as("xm"))
        .localCheckpoint()
      val cent = pm.groupBy(col("label").as("clab"), col("dim"))
        .agg((sum(col("xm")).cast("double") / count(lit(1)) / 1e6)
          .as("mu"))
      val d2 = pm.join(broadcast(cent), Seq("dim"))
        .groupBy(col("vec_id"), col("label"), col("clab"))
        .agg(Parity.dsum(
          (col("xm").cast("double") / 1e6 - col("mu")) *
            (col("xm").cast("double") / 1e6 - col("mu")), 12).as("d2"))
      val sil = d2.groupBy(col("vec_id"), col("label"))
        .agg(max(when(col("label") === col("clab"), col("d2"))).as("a"),
          min(when(col("label") =!= col("clab"), col("d2"))).as("b"))
        .select(col("label"),
          round(lit(1000000.0) *
            (col("b") - col("a")) / greatest(col("a"), col("b")), 0)
            .cast("long").as("sm"))
      sil.groupBy(col("label"))
        .agg(count(lit(1)).as("n_points"), sum(col("sm")).as("ssm"),
          sum(when(col("sm") < 0, 1L).otherwise(0L)).as("n_negative"))
        .select(col("label"), col("n_points"),
          expr("CAST((ssm - ssm % n_points) / n_points AS BIGINT)")
            .as("mean_sil_micro"),
          col("n_negative"))
        .orderBy(col("label"))
    }),

    // Zipf rank-frequency fit over the word-trigram census: OLS slope of
    // ln(count) on ln(rank) with ranks DESC by count, ties broken by the
    // gram string (the deterministic total order — globalRanksTieBroken
    // on (−count, gram), no single-partition window). Natural language
    // lands near −1; a synthetic or deduplicated corpus drifts — the
    // distribution-shape screen beside q_chao1's richness. Per-row ln
    // terms and their products are micro-rounded then exactly summed
    // (the q_theil staging); the slope closes as one IEEE division of
    // exact integer cells, rounded to 6 dp.
    "q_zipf_slope" -> ((s, dir) => {
      val tc = t(s, dir, "documents")
        .select(explode(graft.functions.TextFunctions
          .wordNgramsNative(col("text"), 3)).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val rk = Percentiles.globalRanksTieBroken(
          tc.select(lit(1).as("g"), (-col("c")).as("nc"), col("tok")),
          col("g"), col("nc"), col("tok"))
        .select(col("rank"), (-col("value")).as("c"))
      val cells = rk.select(
          round(lit(1000000.0) * log(col("rank").cast("double")), 0)
            .cast("long").as("xm"),
          round(lit(1000000.0) * log(col("c").cast("double")), 0)
            .cast("long").as("ym"),
          round(lit(1000000.0) * log(col("rank").cast("double"))
            * log(col("c").cast("double")), 0).cast("long").as("pm"),
          round(lit(1000000.0) * log(col("rank").cast("double"))
            * log(col("rank").cast("double")), 0).cast("long").as("qm"))
        .agg(count(lit(1)).as("n"),
          sum(col("xm").cast(DecimalType(38, 0))).as("sx"),
          sum(col("ym").cast(DecimalType(38, 0))).as("sy"),
          sum(col("pm").cast(DecimalType(38, 0))).as("sxy"),
          sum(col("qm").cast(DecimalType(38, 0))).as("sxx"))
      // slope = (10⁶·n·Σxy_µ − Σx_µ·Σy_µ) / (10⁶·n·Σxx_µ − Σx_µ²):
      // both cells are exact micro² integers (pure decimal products, no
      // decimal division anywhere), the ratio one closing IEEE divide
      cells.select(col("n").as("n_grams"),
        round((lit(1000000).cast(DecimalType(38, 0))
            * col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
          (lit(1000000).cast(DecimalType(38, 0))
            * col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double"), 6).as("slope"))
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_fdr_bh" ->
      s"""WITH $fdrSqlStaging,
         |thr AS (
         |  SELECT MAX(CASE WHEN 20.0 * mt.m * rk.p <= rk.p_rank
         |             THEN rk.p END) AS thr
         |  FROM rk, mt)
         |SELECT rk.p_brand, rk.n_r, rk.n_a, rk.z, rk.p, rk.p_rank,
         |  mt.m AS n_tests,
         |  rk.p <= COALESCE(thr.thr, -1.0) AS rejected
         |FROM rk, mt, thr ORDER BY rk.p_brand""".stripMargin,

    "q_fdr_by" ->
      s"""WITH $fdrSqlStaging,
         |hm AS (
         |  SELECT CAST(SUM(1000000 // u.i) AS BIGINT) AS h_micro
         |  FROM mt, unnest(generate_series(1, mt.m)) AS u(i)),
         |rkm AS (
         |  SELECT rk.*, CAST(round(rk.p * 1000000) AS BIGINT) AS p_micro
         |  FROM rk),
         |thr AS (
         |  SELECT MAX(CASE WHEN 20 * mt.m * hm.h_micro * rkm.p_micro
         |               <= 1000000000000 * rkm.p_rank
         |             THEN rkm.p_micro END) AS thr_micro
         |  FROM rkm, mt, hm)
         |SELECT rkm.p_brand, rkm.n_r, rkm.n_a, rkm.z, rkm.p,
         |  rkm.p_rank, mt.m AS n_tests, hm.h_micro,
         |  rkm.p_micro <= COALESCE(thr.thr_micro, -1) AS rejected
         |FROM rkm, mt, hm, thr ORDER BY rkm.p_brand""".stripMargin,

    "q_hill_tail" ->
      """WITH x AS (
        |  SELECT o_custkey,
        |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS x
        |  FROM orders GROUP BY 1),
        |cen AS (SELECT x AS v, COUNT(*) AS t FROM x GROUP BY 1),
        |cum AS (
        |  SELECT v, t,
        |    COALESCE(SUM(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS below
        |  FROM cen),
        |nk AS (SELECT SUM(t) AS n,
        |         LEAST(GREATEST(SUM(t) // 20, 10), SUM(t) - 1) AS k
        |       FROM cen),
        |thr AS (
        |  SELECT cum.v AS vthr, nk.n, nk.k
        |  FROM cum, nk
        |  WHERE cum.below < nk.n - nk.k
        |    AND nk.n - nk.k <= cum.below + cum.t),
        |terms AS (
        |  SELECT thr.n, thr.k, thr.vthr,
        |    CAST(round(1000000.0 *
        |      LEAST(cum.t, cum.below + cum.t - (thr.n - thr.k))
        |      * ln(CAST(cum.v AS DOUBLE) / CAST(thr.vthr AS DOUBLE)), 0)
        |      AS BIGINT) AS tm
        |  FROM cum, thr
        |  WHERE cum.below + cum.t > thr.n - thr.k)
        |SELECT CAST(n AS BIGINT) AS n_customers, CAST(k AS BIGINT) AS k,
        |  CAST(vthr AS BIGINT) AS thr_cents,
        |  CAST(SUM(tm) AS BIGINT) AS sum_ln_micro,
        |  CAST((CAST(k AS HUGEINT) * 1000000000000)
        |    // NULLIF(SUM(tm), 0) AS BIGINT) AS alpha_micro
        |FROM terms GROUP BY n, k, vthr""".stripMargin,

    "q_l_diversity" ->
      s"""WITH j AS (
         |  SELECT o.o_orderpriority,
         |    epoch_us(o.o_orderdate) // ${7 * DayUs} AS wk,
         |    c.c_nationkey
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
         |cls AS (
         |  SELECT o_orderpriority, wk, COUNT(*) AS sz,
         |    COUNT(DISTINCT c_nationkey) AS l
         |  FROM j GROUP BY 1, 2)
         |SELECT CAST(l AS BIGINT) AS l_count,
         |  CAST(COUNT(*) AS BIGINT) AS n_classes,
         |  CAST(SUM(sz) AS BIGINT) AS n_rows,
         |  l < 5 AS at_risk
         |FROM cls GROUP BY l ORDER BY l_count""".stripMargin,

    "q_mape_backtest" ->
      s"""WITH d AS (
         |  SELECT epoch_us(l_shipdate) // $DayUs AS day,
         |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS cents
         |  FROM lineitem GROUP BY 1),
         |b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM d),
         |z AS (
         |  SELECT g.day, COALESCE(d.cents, 0) AS cents
         |  FROM (SELECT unnest(generate_series(b.mn, b.mx)) AS day
         |        FROM b) g
         |  LEFT JOIN d ON d.day = g.day),
         |h AS (SELECT z.day, z.cents FROM z, b
         |      WHERE z.day > b.mx - 28 AND z.cents > 0),
         |e AS (
         |  SELECT 'naive' AS model,
         |    CAST((1000000 * CAST(ABS(p.cents - h.cents) AS HUGEINT))
         |      // h.cents AS BIGINT) AS ape,
         |    CAST((2000000 * CAST(ABS(p.cents - h.cents) AS HUGEINT))
         |      // (p.cents + h.cents) AS BIGINT) AS sape,
         |    ABS(p.cents - h.cents) AS ae
         |  FROM h JOIN z p ON p.day + 1 = h.day
         |  UNION ALL
         |  SELECT 'snaive7',
         |    CAST((1000000 * CAST(ABS(p.cents - h.cents) AS HUGEINT))
         |      // h.cents AS BIGINT),
         |    CAST((2000000 * CAST(ABS(p.cents - h.cents) AS HUGEINT))
         |      // (p.cents + h.cents) AS BIGINT),
         |    ABS(p.cents - h.cents)
         |  FROM h JOIN z p ON p.day + 7 = h.day)
         |SELECT model, CAST(COUNT(*) AS BIGINT) AS n_days,
         |  CAST(SUM(ape) // COUNT(*) AS BIGINT) AS mape_ppm,
         |  CAST(SUM(sape) // COUNT(*) AS BIGINT) AS smape_ppm,
         |  CAST(MAX(ae) AS BIGINT) AS max_ae_cents
         |FROM e GROUP BY model ORDER BY model""".stripMargin,

    "q_order_recon" ->
      """WITH lc AS (
        |  SELECT l_orderkey,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS line_cents
        |  FROM lineitem GROUP BY 1),
        |j AS (
        |  SELECT CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT) AS total_cents,
        |    lc.line_cents,
        |    lc.line_cents IS NULL AS lineless,
        |    ABS(COALESCE(lc.line_cents, 0)
        |      - CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
        |          AS BIGINT)) AS d
        |  FROM orders o LEFT JOIN lc ON o.o_orderkey = lc.l_orderkey)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CASE WHEN lineless THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_lineless,
        |  CAST(SUM(CASE WHEN NOT lineless AND d * 100 > total_cents
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch_gt1pct,
        |  CAST(MAX(CASE WHEN NOT lineless THEN d END) AS BIGINT)
        |    AS max_diff_cents,
        |  CAST(SUM(CASE WHEN NOT lineless THEN CAST(d AS HUGEINT)
        |           ELSE 0 END) AS BIGINT) AS total_abs_diff_cents
        |FROM j""".stripMargin,

    "q_pot_excess" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vm
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT event_type, vm,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY vm)
        |      AS rk FROM e),
        |n AS (SELECT event_type, COUNT(*) AS n FROM e GROUP BY 1),
        |thr AS (
        |  SELECT r.event_type,
        |    MIN(vm) FILTER (WHERE rk = (n.n * 99 + 99) // 100) AS thr
        |  FROM r JOIN n USING (event_type) GROUP BY 1)
        |SELECT e.event_type, thr.thr AS thr_micro,
        |  CAST(COUNT(*) AS BIGINT) AS n_exceed,
        |  CAST((SUM(CAST(e.vm - thr.thr AS HUGEINT))
        |      - SUM(CAST(e.vm - thr.thr AS HUGEINT)) % COUNT(*))
        |    / COUNT(*) AS BIGINT) AS mean_excess_micro,
        |  CAST(MAX(e.vm - thr.thr) AS BIGINT) AS max_excess_micro
        |FROM e JOIN thr USING (event_type)
        |WHERE e.vm > thr.thr
        |GROUP BY 1, 2 ORDER BY e.event_type""".stripMargin,

    "q_silhouette" ->
      """WITH x AS (
        |  SELECT e.vec_id, e.label, u.i - 1 AS dim,
        |    CAST(FLOOR(CAST(e.embedding[u.i] AS DOUBLE) * 1000000)
        |      AS BIGINT) AS xm
        |  FROM embeddings e,
        |  LATERAL unnest(generate_series(1, len(e.embedding))) AS u(i)),
        |cent AS (
        |  SELECT label AS clab, dim,
        |    CAST(SUM(xm) AS DOUBLE) / COUNT(*) / 1000000.0 AS mu
        |  FROM x GROUP BY 1, 2),
        |d2 AS (
        |  SELECT x.vec_id, x.label, c.clab,
        |    CAST(SUM(CAST(
        |      (CAST(x.xm AS DOUBLE) / 1000000.0 - c.mu)
        |      * (CAST(x.xm AS DOUBLE) / 1000000.0 - c.mu)
        |      AS DECIMAL(18,12))) AS DOUBLE) AS d2
        |  FROM x JOIN cent c ON c.dim = x.dim
        |  GROUP BY 1, 2, 3),
        |sil AS (
        |  SELECT label,
        |    CAST(round(1000000.0 *
        |      (MIN(CASE WHEN label != clab THEN d2 END)
        |       - MAX(CASE WHEN label = clab THEN d2 END))
        |      / GREATEST(MAX(CASE WHEN label = clab THEN d2 END),
        |                 MIN(CASE WHEN label != clab THEN d2 END)), 0)
        |      AS BIGINT) AS sm
        |  FROM d2 GROUP BY d2.vec_id, d2.label)
        |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_points,
        |  CAST((SUM(sm) - SUM(sm) % COUNT(*)) / COUNT(*) AS BIGINT)
        |    AS mean_sil_micro,
        |  CAST(SUM(CASE WHEN sm < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_negative
        |FROM sil GROUP BY label ORDER BY label""".stripMargin,

    "q_zipf_slope" -> {
      val grams = graft.functions.TextFunctions.sqlWordNgrams("text", 3)
      s"""WITH tc AS (
         |  SELECT t.tok, COUNT(*) AS c
         |  FROM documents, unnest($grams) AS t(tok)
         |  GROUP BY 1),
         |rk AS (
         |  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rank
         |  FROM tc),
         |cells AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    SUM(CAST(round(1000000 * ln(CAST(rank AS DOUBLE)), 0)
         |      AS HUGEINT)) AS sx,
         |    SUM(CAST(round(1000000 * ln(CAST(c AS DOUBLE)), 0)
         |      AS HUGEINT)) AS sy,
         |    SUM(CAST(round(1000000 * ln(CAST(rank AS DOUBLE))
         |      * ln(CAST(c AS DOUBLE)), 0) AS HUGEINT)) AS sxy,
         |    SUM(CAST(round(1000000 * ln(CAST(rank AS DOUBLE))
         |      * ln(CAST(rank AS DOUBLE)), 0) AS HUGEINT)) AS sxx
         |  FROM rk)
         |SELECT n AS n_grams,
         |  round(CAST(1000000 * n * sxy - sx * sy AS DOUBLE)
         |    / CAST(1000000 * n * sxx - sx * sx AS DOUBLE), 6) AS slope
         |FROM cells""".stripMargin
    }
  )
}
