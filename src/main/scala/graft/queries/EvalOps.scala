package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.TextFunctions.{sqlHash32, sqlNormalizeText, sqlTokens}
import graft.operators.RangeBuckets
import graft.sources.Tables

/** Round-12 tranche 10: model-evaluation metrics beyond `q_roc_auc` /
  * `q_calibration_bins` — the scoring-stage readouts an eval harness
  * runs after every training cycle. PR-AUC (average precision — the
  * ranking metric that, unlike ROC-AUC, does not reward the giant
  * true-negative mass under class imbalance), the Brier score with its
  * exact Murphy decomposition (reliability / resolution / uncertainty
  * over the calibration bins), mean log-loss (the proper scoring rule
  * training actually optimizes), and the Davies-Bouldin clustering
  * index (the centroid-scatter sibling of `q_silhouette`).
  *
  * Determinism discipline ([[Parity]], the StatOps6/q_silhouette
  * precedents): corpus reductions are exact-integer aggregates;
  * probability forecasts are DISCRETE decile-midpoint milli values (so
  * the Murphy identity brier = rel − res + unc holds in rationals and
  * `ln` sees only 10 distinct arguments); per-cell `ln`/`sqrt` terms
  * are micro-floored half-up (`floor(x + 0.5)`) then exactly summed,
  * with the IDENTICAL expression text on both engines.
  *
  * Scale posture: `q_pr_auc` is one value census + the bucketed-cumsum
  * discipline (never a single-partition window); the Brier/log-loss
  * pair reduce the scored corpus to ≤ 10 / ≤ 20 cells in ONE keyed
  * aggregate each; Davies-Bouldin streams n·d narrow rows into a
  * map-side-combinable aggregate and closes on k² ≤ 100 centroid
  * pairs. DECIMAL(38,0) envelopes documented per query.
  *
  * Degenerate-input stance (documented, unreachable at gate scales): a
  * single-class corpus (P = 0 or N = 0) nulls PR-AUC's and the odds
  * family's divisions; a single-label embedding corpus empties
  * Davies-Bouldin's pair frame — Spark nulls/empties, DuckDB
  * errors/empties: loud either way.
  */
object EvalOps extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  /** cents-exact long from a 2-dp money column (the shared staging). */
  private def cents(c: Column) =
    (c.cast(DecimalType(18, 2)) * 100).cast("long")

  /** The shared toy-model forecast, discretized to its decile midpoint:
    * clamp the [[PipelineOps.toyModelScores]] linear score into [0,1000]
    * milli, bin by 100, forecast = bin·100 + 50. Discreteness is what
    * makes the Murphy decomposition EXACT (a within-bin-varying forecast
    * adds a covariance cross-term the textbook identity drops). */
  private[queries] def scoredDocs(s: SparkSession, dir: String): DataFrame =
    PipelineOps.toyModelScores(
        t(s, dir, "documents").select(col("doc_id"),
          (col("n_chars") >= 400).as("pos"), col("text")))
      .select(col("pos"),
        (least(greatest(col("score_milli"), lit(0L)), lit(999L))
          .cast("long") / 100).cast("long").as("bin"))
      .select(col("pos"), col("bin"),
        (col("bin") * 100 + 50).as("p_milli"))

  /** Oracle-side SQL for [[scoredDocs]] (mirrors q_calibration_bins'
    * score staging, then the clamp/bin/midpoint chain). */
  private[queries] def sqlScoredDocs: String = {
    val toks = sqlTokens(sqlNormalizeText("text"))
    val w = s"(${sqlHash32("token")} % 1000 - 500)"
    s"""tf AS (
       |  SELECT doc_id, pos, token, COUNT(*) AS tf
       |  FROM (SELECT doc_id, n_chars >= 400 AS pos,
       |          unnest($toks) AS token FROM documents)
       |  GROUP BY 1, 2, 3),
       |scored0 AS (
       |  SELECT doc_id, pos, CAST(SUM(tf * $w) AS BIGINT) AS score_milli
       |  FROM tf GROUP BY 1, 2),
       |scored AS (
       |  SELECT pos,
       |    LEAST(GREATEST(score_milli, 0), 999) // 100 AS bin,
       |    (LEAST(GREATEST(score_milli, 0), 999) // 100) * 100 + 50
       |      AS p_milli
       |  FROM scored0)""".stripMargin
  }

  /** Append exact below-counts for BOTH the row mass and the positive
    * mass to a (v, tv, n1v) value census: per-bucket partitioned
    * cumsums + the tiny O(|buckets|²) offset merge — the
    * [[RangeBuckets]] discipline, generalized to two riders (the
    * StatOps6.withBelow shape with a second measure). */
  private[queries] def withBelow2(census: DataFrame): DataFrame = {
    val cen = RangeBuckets.withRangeBucket(census, "v")
    val w = Window.partitionBy(col("bucket")).orderBy(col("v"))
    val loc = cen.withColumn("cumt", sum(col("tv")).over(w))
      .withColumn("cump", sum(col("n1v")).over(w))
    val bt = cen.groupBy(col("bucket"))
      .agg(sum(col("tv")).as("bn"), sum(col("n1v")).as("bp"))
    val off = bt.as("a")
      .join(bt.as("o"), col("o.bucket") < col("a.bucket"), "left")
      .groupBy(col("a.bucket").as("bucket"))
      .agg(coalesce(sum(col("o.bn")), lit(0L)).as("offn"),
        coalesce(sum(col("o.bp")), lit(0L)).as("offp"))
    loc.join(broadcast(off), Seq("bucket"))
      .withColumn("below", col("offn") + col("cumt") - col("tv"))
      .withColumn("below_pos", col("offp") + col("cump") - col("n1v"))
      .drop("bucket", "cumt", "cump", "offn", "offp")
  }

  override def defs: Map[String, Q] = Map[String, Q](

    // PR-AUC (average precision) of the balance-ranks-BUILDING model
    // (the q_roc_auc framing, so the two ranking metrics are directly
    // comparable on one model): AP = Σ_thresholds ΔRecall·Precision
    // evaluated once per DISTINCT score descending. From the ascending
    // census with below/below_pos riders: cum = n − below rows score ≥ v,
    // tp = n_pos − below_pos of them positive, and the threshold's term
    // is ⌊10⁹·n1v·tp / (n_pos·cum)⌋ ppb, per-term floored (≤ 1 ppb loss
    // each) then exactly summed. One corpus census + bucketed cumsums —
    // no single-partition window, no per-row join. Envelope: 10⁹·n1v·tp
    // ≤ 10⁹·n² — exact in DECIMAL(38,0)/HUGEINT to n ≈ 3·10¹⁴ rows.
    "q_pr_auc" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(
        cents(col("c_acctbal")).as("v"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L)
          .as("pos"))
      val census = c.groupBy(col("v"))
        .agg(sum(col("pos")).as("n1v"), count(lit(1)).as("tv"))
        // round 18: census leaf (ScanCount: the fan-out re-ran the
        // fact scan per consumer; see OPTIMIZATION_r18.md)
        .localCheckpoint(eager = false)
      val tot = census.agg(sum(col("tv")).as("n"),
        sum(col("n1v")).as("n_pos"))
      withBelow2(census).crossJoin(broadcast(tot))
        .select(col("n"), col("n_pos"),
          expr("""CAST((1000000000 * CAST(n1v AS DECIMAL(38,0))
            | * (n_pos - below_pos))
            | div (CAST(n_pos AS DECIMAL(38,0)) * (n - below))
            | AS BIGINT)""".stripMargin.replaceAll("\\s+", " "))
            .as("term"))
        .groupBy(col("n"), col("n_pos"))
        .agg(sum(col("term")).as("ap_ppb"))
        .select((col("n") - col("n_pos")).as("n_neg"), col("n_pos"),
          col("ap_ppb"))
    }),

    // Brier score + the exact Murphy decomposition over the discrete
    // decile-midpoint forecast: brier = rel − res + unc in rationals
    // (micro readouts each floor once per bin, so the identity holds to
    // ≤ |bins|+3 micro — the spec pins it). Cells: ONE keyed aggregate
    // to ≤ 10 (bin → n_b, np_b) rows; every term is exact integer
    // arithmetic over those cells. rel = Σ(n_b·p_b − 1000·np_b)²/n_b/n,
    // res = Σ10⁶(np_b·n − n_b·np)²/(n_b·n²)/n, unc = 10⁶·np(n−np)/n².
    // Envelope: rel's DECIMAL square holds to n_b ≈ 10¹⁶ docs per bin;
    // the binding term is res's 10⁶·(np_b·n)² ≤ 10⁶·n⁴ — exact to
    // n ≈ 10⁸ docs, loudly overflow-erroring (ANSI) past it.
    "q_brier_decomp" -> ((s, dir) => {
      val cells = scoredDocs(s, dir).groupBy(col("bin"), col("p_milli"))
        .agg(count(lit(1)).as("nb"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("npb"))
      val tot = cells.agg(sum(col("nb")).as("n"), sum(col("npb")).as("np"))
      cells.crossJoin(broadcast(tot))
        .select(col("n"), col("np"),
          (col("npb") * (lit(1000L) - col("p_milli"))
            * (lit(1000L) - col("p_milli"))
            + (col("nb") - col("npb")) * col("p_milli") * col("p_milli"))
            .as("bnum"),
          // relterm squares in DECIMAL(38,0) like resterm already does:
          // plain BIGINT overflows once nb·p_milli > ~3·10⁹ (a ~3·10⁶-doc
          // bin), far below the pack's 10⁸-doc envelope (r12 advice).
          // DECIMAL keeps the square exact to nb ≈ 10¹⁶ docs per bin.
          expr("""((CAST(nb AS DECIMAL(38,0)) * p_milli - 1000 * npb)
            | * (CAST(nb AS DECIMAL(38,0)) * p_milli - 1000 * npb))
            | div nb""".stripMargin.replaceAll("\\s+", " ")).as("relterm"),
          expr("""(1000000 * (CAST(npb AS DECIMAL(38,0)) * n - nb * np)
            | * (CAST(npb AS DECIMAL(38,0)) * n - nb * np))
            | div (CAST(nb AS DECIMAL(38,0)) * n * n)"""
            .stripMargin.replaceAll("\\s+", " ")).as("resterm"))
        .groupBy(col("n"), col("np"))
        .agg(sum(col("bnum")).as("bnum"), sum(col("relterm")).as("rel"),
          sum(col("resterm")).as("res"))
        .select(col("n").as("n_docs"), col("np").as("n_pos"),
          expr("bnum div n").as("brier_micro"),
          expr("rel div n").as("rel_micro"),
          expr("CAST(res div n AS BIGINT)").as("res_micro"),
          expr("""CAST((1000000 * CAST(np AS DECIMAL(38,0)) * (n - np))
            | div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("unc_micro"))
    }),

    // Mean log-loss of the same discrete forecast: the census is ≤ 20
    // (bin, label) cells from ONE keyed aggregate; `ln` sees only the 10
    // distinct midpoint probabilities, each micro-floored half-up ONCE
    // and then multiplied by the EXACT cell count (never ln per row —
    // the per-p constant × integer multiplicity is exact at any corpus
    // size). mean_ll_micro = Σ c·k_p div n.
    "q_log_loss" -> ((s, dir) => {
      val cells = scoredDocs(s, dir).groupBy(col("p_milli"), col("pos"))
        .agg(count(lit(1)).as("c"))
      cells
        .select(col("c"), col("pos"),
          expr("""CAST(floor(1000000.0 * -ln(
            |  CASE WHEN pos THEN CAST(p_milli AS DOUBLE) / 1000.0
            |       ELSE 1.0 - CAST(p_milli AS DOUBLE) / 1000.0 END)
            |  + 0.5) AS BIGINT)""".stripMargin.replaceAll("\\s+", " "))
            .as("k"))
        .agg(sum(col("c")).as("n_docs"),
          sum(when(col("pos"), col("c")).otherwise(0L)).as("n_pos"),
          sum(col("c").cast(DecimalType(38, 0)) * col("k")).as("sll"))
        .select(col("n_docs"), col("n_pos"),
          expr("CAST(sll div n_docs AS BIGINT)").as("mean_ll_micro"))
    }),

    // Davies-Bouldin index of the labeled embedding corpus — the
    // centroid-scatter clustering eval beside q_silhouette: S_i = mean
    // point-to-own-centroid distance, M_ij = centroid-pair distance,
    // R_i = max_j (S_i+S_j)/M_ij, DB = mean R_i. The q_silhouette
    // cross-engine staging: micro-floored coordinates, exact-quotient
    // centroids, decimal-routed squared-distance sums (identical
    // doubles), per-point sqrt micro-floored half-up then exactly
    // summed. Closes on k·d centroid cells and k² ≤ 100 pairs. The
    // point stream is n·d NARROW rows into one map-side-combinable
    // aggregate — no point-point pairs ever form.
    "q_davies_bouldin" -> ((s, dir) => {
      val pm = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("dim", "vv")))
        .select(col("vec_id"), col("label"), col("dim"),
          floor(col("vv").cast("double") * 1000000).cast("long").as("xm"))
        .localCheckpoint()
      val cent = pm.groupBy(col("label").as("clab"), col("dim").as("cdim"))
        .agg((sum(col("xm")).cast("double") / count(lit(1)) / 1e6)
          .as("mu"))
      val si = pm.join(broadcast(cent),
          col("dim") === col("cdim") && col("label") === col("clab"))
        .groupBy(col("vec_id"), col("label"))
        .agg(Parity.dsum(
          (col("xm").cast("double") / 1e6 - col("mu")) *
            (col("xm").cast("double") / 1e6 - col("mu")), 12).as("d2"))
        .select(col("label"),
          expr("CAST(floor(1000000.0 * sqrt(d2) + 0.5) AS BIGINT)")
            .as("dm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_points"), sum(col("dm")).as("sdm"))
        .select(col("label"), col("n_points"),
          expr("sdm div n_points").as("s_micro"))
      val m2 = cent.as("i")
        .join(broadcast(cent.as("j")),
          col("i.cdim") === col("j.cdim") &&
            col("i.clab") =!= col("j.clab"))
        .groupBy(col("i.clab").as("li"), col("j.clab").as("lj"))
        .agg(Parity.dsum(
          (col("i.mu") - col("j.mu")) * (col("i.mu") - col("j.mu")), 12)
          .as("m2"))
      m2.join(broadcast(si.withColumnRenamed("label", "li")
            .withColumnRenamed("s_micro", "si_m").drop("n_points")),
          Seq("li"))
        .join(broadcast(si.withColumnRenamed("label", "lj")
            .withColumnRenamed("s_micro", "sj_m").drop("n_points")),
          Seq("lj"))
        .select(col("li"),
          expr("CAST(floor((si_m + sj_m) / sqrt(m2) + 0.5) AS BIGINT)")
            .as("r_ppm"))
        .groupBy(col("li")).agg(max(col("r_ppm")).as("r_max_ppm"))
        .join(broadcast(si.withColumnRenamed("label", "li")), Seq("li"))
        .select(col("li").as("label"), col("n_points"), col("s_micro"),
          col("r_max_ppm"))
        .orderBy(col("label"))
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_pr_auc" ->
      """WITH c AS (
        |  SELECT CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS v,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS pos
        |  FROM customer),
        |census AS (
        |  SELECT v, SUM(pos) AS n1v, COUNT(*) AS tv FROM c GROUP BY 1),
        |cum AS (
        |  SELECT v, n1v, tv,
        |    COALESCE(SUM(tv) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS below,
        |    COALESCE(SUM(n1v) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS below_pos,
        |    SUM(tv) OVER () AS n, SUM(n1v) OVER () AS n_pos
        |  FROM census)
        |SELECT CAST(MAX(n) - MAX(n_pos) AS BIGINT) AS n_neg,
        |  CAST(MAX(n_pos) AS BIGINT) AS n_pos,
        |  CAST(SUM((1000000000 * CAST(n1v AS HUGEINT)
        |      * (n_pos - below_pos))
        |    // (CAST(n_pos AS HUGEINT) * (n - below))) AS BIGINT)
        |    AS ap_ppb
        |FROM cum""".stripMargin,

    "q_brier_decomp" ->
      s"""WITH $sqlScoredDocs,
         |cells AS (
         |  SELECT bin, p_milli, COUNT(*) AS nb,
         |    SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS npb
         |  FROM scored GROUP BY 1, 2),
         |tot AS (SELECT SUM(nb) AS n, SUM(npb) AS np FROM cells),
         |terms AS (
         |  SELECT tot.n, tot.np,
         |    npb * (1000 - p_milli) * (1000 - p_milli)
         |      + (nb - npb) * p_milli * p_milli AS bnum,
         |    ((CAST(nb AS HUGEINT) * p_milli - 1000 * npb)
         |      * (CAST(nb AS HUGEINT) * p_milli - 1000 * npb))
         |      // nb AS relterm,
         |    (1000000 * (CAST(npb AS HUGEINT) * tot.n - nb * tot.np)
         |      * (CAST(npb AS HUGEINT) * tot.n - nb * tot.np))
         |      // (CAST(nb AS HUGEINT) * tot.n * tot.n) AS resterm
         |  FROM cells, tot)
         |SELECT CAST(n AS BIGINT) AS n_docs, CAST(np AS BIGINT) AS n_pos,
         |  CAST(SUM(bnum) // n AS BIGINT) AS brier_micro,
         |  CAST(SUM(relterm) // n AS BIGINT) AS rel_micro,
         |  CAST(SUM(resterm) // n AS BIGINT) AS res_micro,
         |  CAST((1000000 * CAST(np AS HUGEINT) * (n - np))
         |    // (CAST(n AS HUGEINT) * n) AS BIGINT) AS unc_micro
         |FROM terms GROUP BY n, np""".stripMargin,

    "q_log_loss" ->
      s"""WITH $sqlScoredDocs,
         |cells AS (
         |  SELECT p_milli, pos, COUNT(*) AS c
         |  FROM scored GROUP BY 1, 2),
         |k AS (
         |  SELECT c, pos,
         |    CAST(floor(1000000.0 * -ln(
         |      CASE WHEN pos THEN CAST(p_milli AS DOUBLE) / 1000.0
         |           ELSE 1.0 - CAST(p_milli AS DOUBLE) / 1000.0 END)
         |      + 0.5) AS BIGINT) AS k
         |  FROM cells)
         |SELECT CAST(SUM(c) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN pos THEN c ELSE 0 END) AS BIGINT) AS n_pos,
         |  CAST(SUM(CAST(c AS HUGEINT) * k) // SUM(c) AS BIGINT)
         |    AS mean_ll_micro
         |FROM k""".stripMargin,

    "q_davies_bouldin" ->
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
        |  SELECT x.vec_id, x.label,
        |    CAST(SUM(CAST(
        |      (CAST(x.xm AS DOUBLE) / 1000000.0 - c.mu)
        |      * (CAST(x.xm AS DOUBLE) / 1000000.0 - c.mu)
        |      AS DECIMAL(18,12))) AS DOUBLE) AS d2
        |  FROM x JOIN cent c ON c.dim = x.dim AND c.clab = x.label
        |  GROUP BY 1, 2),
        |si AS (
        |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_points,
        |    CAST(SUM(CAST(FLOOR(1000000.0 * sqrt(d2) + 0.5) AS BIGINT))
        |      // COUNT(*) AS BIGINT) AS s_micro
        |  FROM d2 GROUP BY 1),
        |m2 AS (
        |  SELECT i.clab AS li, j.clab AS lj,
        |    CAST(SUM(CAST((i.mu - j.mu) * (i.mu - j.mu)
        |      AS DECIMAL(18,12))) AS DOUBLE) AS m2
        |  FROM cent i JOIN cent j
        |    ON i.dim = j.dim AND i.clab <> j.clab
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT m2.li,
        |    MAX(CAST(FLOOR((a.s_micro + b.s_micro) / sqrt(m2.m2) + 0.5)
        |      AS BIGINT)) AS r_max_ppm
        |  FROM m2
        |  JOIN si a ON a.label = m2.li
        |  JOIN si b ON b.label = m2.lj
        |  GROUP BY 1)
        |SELECT r.li AS label, si.n_points, si.s_micro, r.r_max_ppm
        |FROM r JOIN si ON si.label = r.li
        |ORDER BY label""".stripMargin
  )
}
