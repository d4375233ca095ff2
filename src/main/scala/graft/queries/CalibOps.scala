package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Round-13 tranche: model-calibration REPAIR and feature-value audits —
  * the two supervised-learning primitives beside [[EvalOps]]' metrics:
  *
  *  - isotonic calibration (`q_isotonic_calib`) — the monotone
  *    regression a pipeline FITS on its calibration bins (q_brier_decomp
  *    diagnoses miscalibration; this is the standard repair). PAVA's
  *    iterative pooling has no SQL twin, but its CLOSED FORM does:
  *    iso(i) = max_{j≤i} min_{k≥i} mean(y[j..k]) — the minimax identity
  *    — and over the ≤10-bin frame every interval mean is an exact
  *    integer cell, so the whole fit is three tiny joins.
  *  - decision-stump information gain (`q_info_gain`) — the best binary
  *    split of account balance predicting the BUILDING segment, the
  *    single-feature audit a feature store runs to rank candidate
  *    columns ("does this column carry any signal?").
  *
  * Determinism: interval means micro-floored ONCE off exact integer
  * (Σpos, Σn) cells, then max/min over INTEGERS — bit-identical in any
  * engine (no rational comparison ever goes through a double). The
  * stump's per-threshold entropy is the shared-text double formula over
  * exact census counts (the q_mutual_info discipline), floored half-up
  * to micro-nats before the integer argmax; the argmax packs
  * (gain, −threshold) into one BIGINT key (the q_grubbs lexicographic
  * pattern) so gain ties break toward the smallest threshold on both
  * engines.
  */
object CalibOps extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  /** Shared-text binary entropy term in nats over exact counts:
    * H(a, n) = −(a/n)ln(a/n) − ((n−a)/n)ln((n−a)/n), 0·ln0 ≡ 0. */
  private def hOf(a: String, n: String) =
    s"""(CASE WHEN $a > 0 AND $a < $n THEN
       |  -(CAST($a AS DOUBLE) / $n) * ln(CAST($a AS DOUBLE) / $n)
       |  - (CAST($n - $a AS DOUBLE) / $n)
       |    * ln(CAST($n - $a AS DOUBLE) / $n)
       | ELSE 0.0 END)""".stripMargin.replaceAll("\\s+", " ")

  override def defs: Map[String, Q] = Map[String, Q](

    // Isotonic calibration of the 10 decile-midpoint bins (the
    // q_brier_decomp staging): fit the monotone-nondecreasing rate
    // curve minimizing squared error — equivalently PAVA — via the
    // minimax closed form over interval means. Intervals: the 55 (j,k)
    // bin spans with exact (Σpos, Σn) cells and mean micro-floored
    // ONCE; per bin i, iso(i) = max_{j≤i} min_{k≥i} mean(j,k) computed
    // as integer max/min over two tiny joins (≤ 10·55 rows). The fit is
    // provably monotone in i (the feasible j-set grows, the k-set
    // shrinks) — spec-pinned, along with equality to a scalar PAVA
    // replay. Corpus work: ONE keyed aggregate (the bin census);
    // everything after is a ≤55-row model artifact.
    "q_isotonic_calib" -> ((s, dir) => {
      val bins = EvalOps.scoredDocs(s, dir)
        .groupBy(col("bin"), col("p_milli"))
        .agg(count(lit(1)).as("nb"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("npb"))
        .localCheckpoint()
      val iv = bins.as("a").join(bins.as("b"),
          col("a.bin") <= col("b.bin"))
        .select(col("a.bin").as("j"), col("b.bin").as("k"))
        .join(bins.as("m"), col("m.bin") >= col("j")
          && col("m.bin") <= col("k"))
        .groupBy(col("j"), col("k"))
        .agg(sum(col("m.npb")).as("num"), sum(col("m.nb")).as("den"))
        .select(col("j"), col("k"),
          expr("(1000000 * num) div den").as("avg_micro"))
      val mji = iv.join(bins.as("i"),
          col("j") <= col("i.bin") && col("k") >= col("i.bin"))
        .groupBy(col("i.bin").as("bin"), col("j"))
        .agg(min(col("avg_micro")).as("mj"))
      bins.join(mji, Seq("bin"))
        .groupBy(col("bin"), col("p_milli"), col("nb"), col("npb"))
        .agg(max(col("mj")).as("iso_micro"))
        .select(col("bin"), col("p_milli"), col("nb"), col("npb"),
          expr("(1000000 * npb) div nb").as("raw_micro"),
          col("iso_micro"))
        .orderBy(col("bin"))
    }),

    // Expected calibration error (round-13 session 3): the one-number
    // miscalibration readout beside q_brier_decomp's decomposition and
    // q_isotonic_calib's repair — ECE = Σ (n_b/n)·|p_b − rate_b| and
    // MCE = max_b the same gap, both EXACT integers end to end:
    // per-bin gap |p_milli·n_b − 1000·np_b| is exact in milli·counts,
    // ECE closes as (1000·Σ) div n micro, MCE as a per-bin div on the
    // ≤10-row frame. Zero doubles anywhere.
    "q_ece" -> ((s, dir) => {
      val bins = EvalOps.scoredDocs(s, dir)
        .groupBy(col("bin"), col("p_milli"))
        .agg(count(lit(1)).as("nb"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("npb"))
      bins
        .select(col("nb"), col("npb"),
          abs(col("p_milli") * col("nb") - lit(1000L) * col("npb"))
            .as("gap"),
          expr("""abs(p_milli - (1000 * npb) div nb)""").as("gap_milli"))
        .agg(sum(col("nb")).as("n_docs"),
          sum(col("npb")).as("n_pos"),
          count(lit(1)).as("n_bins"),
          sum(col("gap")).as("gsum"),
          max(col("gap_milli")).as("mce_milli"))
        .select(col("n_docs"), col("n_pos"), col("n_bins"),
          expr("(1000 * gsum) div n_docs").as("ece_micro"),
          col("mce_milli"))
    }),

    // Decision-stump information gain: the best threshold v on account
    // balance (cents) splitting customers into x ≤ v / x > v to predict
    // segment = BUILDING, scored by entropy reduction in micro-nats.
    // One corpus census (v → tv, n1v) + the RangeBuckets double-rider
    // below-counts gives every threshold's (n_l, pos_l) EXACTLY — no
    // per-threshold pass, no global sort. Gain closes as the
    // shared-text double formula over those integer cells, floored
    // half-up ONCE per threshold; the argmax packs (gain_micro,
    // 10¹¹ − v) into one BIGINT (gain ≤ ln2 ⇒ key < 7·10¹⁷; |v| <
    // 10¹¹ cents by fixture envelope — the q_grubbs packing). Split
    // semantics: thresholds are the distinct values except the global
    // max (an empty right side has no gain defined).
    "q_info_gain" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(
        (col("c_acctbal").cast(DecimalType(18, 2)) * 100).cast("long")
          .as("v"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L)
          .as("pos"))
      val census = c.groupBy(col("v"))
        .agg(sum(col("pos")).as("n1v"), count(lit(1)).as("tv"))
        // round 18: census leaf (ScanCount: the fan-out re-ran the
        // fact scan per consumer; see OPTIMIZATION_r18.md)
        .localCheckpoint(eager = false)
      val tot = census.agg(sum(col("tv")).as("n"),
        sum(col("n1v")).as("np"))
      val cand = EvalOps.withBelow2(census).crossJoin(broadcast(tot))
        .select(col("n"), col("np"), col("v"),
          (col("below") + col("tv")).as("nl"),
          (col("below_pos") + col("n1v")).as("npl"))
        .filter(col("nl") < col("n"))
        .select(col("n"), col("np"), col("v"), col("nl"), col("npl"),
          expr(s"""CAST(floor(1000000.0 * (${hOf("np", "n")}
            | - (CAST(nl AS DOUBLE) / n) * ${hOf("npl", "nl")}
            | - (CAST(n - nl AS DOUBLE) / n)
            |   * ${hOf("(np - npl)", "(n - nl)")}) + 0.5) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("gain_micro"))
      val best = cand
        .agg(max(col("gain_micro") * 1000000000000L
          + (lit(100000000000L) - col("v"))).as("key"))
        .select(expr("key div 1000000000000").as("gain_micro"),
          expr("CAST(100000000000 - key % 1000000000000 AS BIGINT)")
            .as("v"))
      cand.join(broadcast(best), Seq("v", "gain_micro"))
        .select(col("n").as("n_customers"), col("np").as("n_building"),
          col("v").as("threshold_cents"), col("nl").as("n_left"),
          col("npl").as("n_pos_left"), col("gain_micro"))
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_isotonic_calib" ->
      s"""WITH ${EvalOps.sqlScoredDocs},
         |bins AS (
         |  SELECT bin, p_milli, COUNT(*) AS nb,
         |    SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS npb
         |  FROM scored GROUP BY 1, 2),
         |iv AS (
         |  SELECT a.bin AS j, b.bin AS k,
         |    (1000000 * SUM(m.npb)) // SUM(m.nb) AS avg_micro
         |  FROM bins a JOIN bins b ON a.bin <= b.bin
         |  JOIN bins m ON m.bin >= a.bin AND m.bin <= b.bin
         |  GROUP BY 1, 2),
         |mji AS (
         |  SELECT i.bin, iv.j, MIN(iv.avg_micro) AS mj
         |  FROM iv JOIN bins i ON iv.j <= i.bin AND iv.k >= i.bin
         |  GROUP BY 1, 2),
         |iso AS (
         |  SELECT bin, MAX(mj) AS iso_micro FROM mji GROUP BY 1)
         |SELECT CAST(bins.bin AS BIGINT) AS bin,
         |  CAST(bins.p_milli AS BIGINT) AS p_milli,
         |  CAST(bins.nb AS BIGINT) AS nb, CAST(bins.npb AS BIGINT)
         |    AS npb,
         |  CAST((1000000 * bins.npb) // bins.nb AS BIGINT) AS raw_micro,
         |  CAST(iso.iso_micro AS BIGINT) AS iso_micro
         |FROM bins JOIN iso USING (bin) ORDER BY bin""".stripMargin,

    "q_ece" ->
      s"""WITH ${EvalOps.sqlScoredDocs},
         |bins AS (
         |  SELECT bin, p_milli, COUNT(*) AS nb,
         |    SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS npb
         |  FROM scored GROUP BY 1, 2),
         |g AS (
         |  SELECT nb, npb,
         |    abs(p_milli * nb - 1000 * npb) AS gap,
         |    abs(p_milli - (1000 * npb) // nb) AS gap_milli
         |  FROM bins)
         |SELECT CAST(SUM(nb) AS BIGINT) AS n_docs,
         |  CAST(SUM(npb) AS BIGINT) AS n_pos,
         |  CAST(COUNT(*) AS BIGINT) AS n_bins,
         |  CAST((1000 * SUM(gap)) // SUM(nb) AS BIGINT) AS ece_micro,
         |  CAST(MAX(gap_milli) AS BIGINT) AS mce_milli
         |FROM g""".stripMargin,

    "q_info_gain" -> {
      val h = (a: String, n: String) => hOf(a, n)
      s"""WITH c AS (
         |  SELECT CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
         |      AS v,
         |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
         |      AS pos
         |  FROM customer),
         |census AS (
         |  SELECT v, SUM(pos) AS n1v, COUNT(*) AS tv FROM c GROUP BY 1),
         |tot AS (SELECT SUM(tv) AS n, SUM(n1v) AS np FROM census),
         |cand AS (
         |  SELECT tot.n, tot.np, v,
         |    SUM(tv) OVER (ORDER BY v) AS nl,
         |    SUM(n1v) OVER (ORDER BY v) AS npl
         |  FROM census, tot),
         |scored_c AS (
         |  SELECT n, np, v, nl, npl,
         |    CAST(floor(1000000.0 * (${h("np", "n")}
         |      - (CAST(nl AS DOUBLE) / n) * ${h("npl", "nl")}
         |      - (CAST(n - nl AS DOUBLE) / n)
         |        * ${h("(np - npl)", "(n - nl)")}) + 0.5) AS BIGINT)
         |      AS gain_micro
         |  FROM cand WHERE nl < n),
         |best AS (
         |  SELECT MAX(gain_micro * 1000000000000
         |    + (100000000000 - v)) AS key
         |  FROM scored_c)
         |SELECT CAST(n AS BIGINT) AS n_customers,
         |  CAST(np AS BIGINT) AS n_building,
         |  CAST(v AS BIGINT) AS threshold_cents,
         |  CAST(nl AS BIGINT) AS n_left, CAST(npl AS BIGINT)
         |    AS n_pos_left,
         |  gain_micro
         |FROM scored_c, best
         |WHERE gain_micro = best.key // 1000000000000
         |  AND v = 100000000000 - best.key % 1000000000000"""
        .stripMargin
    }
  )
}
