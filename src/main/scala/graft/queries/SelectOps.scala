package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{hash32, sqlHash32, sqlWordNgrams,
  wordNgramsNative}
import graft.sources.Tables

/** Data-selection & private-release operators (rounds 15–16).
  *
  * Published-method gates a 100 TB training-data pipeline runs between
  * curation and release:
  *
  *  - DSIR importance weights AND the resampling step (Xie et al. 2023,
  *    "Data Selection for Language Models via Importance Resampling"):
  *    hashed-n-gram likelihood-ratio scores of every raw document
  *    against a target distribution, then the Bernoulli draw that
  *    actually selects the mixed corpus (`q_dsir_weights`,
  *    `q_dsir_sample`).
  *  - the geometric mechanism (Ghosh/Roughgarden/Sundararajan 2009), the
  *    discrete analog of Laplace noise and the standard ε-DP release for
  *    COUNT statistics (`q_dp_count`, `q_dp_topk`) — plus the USER-level
  *    variant with bounded contribution (Wilson et al. 2020,
  *    `q_dp_user_count`) — completing the privacy set next to
  *    q_k_anonymity / q_l_diversity / q_t_closeness (those audit; these
  *    release).
  *
  * All are integer-exact end to end (the [[graft.operators.Bootstrap]]
  * fixed-threshold discipline), so the DuckDB oracle replays them
  * bit-for-bit.
  */
object SelectOps extends QueryPack {

  /** Hashed-feature bucket count (DSIR uses 10⁴; 2¹² keeps the bucket
    * dimension a trivially-broadcast 4096-row table at ANY corpus size). */
  private val DsirBuckets = 4096

  /** Truncation bound for the two-sided geometric noise (|k| ≤ 8 covers
    * all but 2·(1/3)·2⁻⁸ ≈ 0.26% of the mass at α = 1/2). */
  private val DpClamp = 8

  /** floor(CDF(k)·2³²) of the two-sided geometric(α = 1/2) at
    * k = −DpClamp .. DpClamp−1 (u ≥ last ⇒ noise = +DpClamp): P(k) =
    * (1/3)·2^−|k|, so CDF(k≤−1) = 2^(1−|k|)/3, CDF(0) = 2/3, CDF(k≥1) =
    * 1 − 2^−k/3 — computed exactly here and embedded as the SAME integer
    * literals in the engine's when-chain and the oracle's CASE chain
    * (the [[graft.operators.Bootstrap.Thresholds]] pattern: one source,
    * two renderings, zero float parity surface). */
  private val DpThresholds: Seq[(Int, Long)] = {
    val two32 = BigInt(1) << 32
    (-DpClamp until DpClamp).map { k =>
      val cdf =
        if (k <= -1) (two32 >> (-k - 1)) / 3 // 2^(1-|k|)/3 · 2^32
        else if (k == 0) two32 * 2 / 3
        else two32 - (two32 >> k) / 3
      k -> cdf.toLong
    }
  }

  private def docs(s: SparkSession, dir: String) =
    Tables.load(s, dir, "documents")

  /** q_dp_user_count contribution bounds (Wilson et al. 2020,
    * "Differentially Private SQL with Bounded User Contribution"): a
    * user contributes at most [[DpUserCap]] events to any one type and
    * at most [[DpUserTypes]] types (selected by salted per-(user, type)
    * hash rank — the deterministic rendering of the paper's random
    * partition choice), so the whole histogram's user-level L1
    * sensitivity is Cap·Types = 6 and the geometric(½) release is
    * (6·ln 2)-user-DP. Shared Scala constants rendered into both
    * engines. */
  private val DpUserCap = 3L
  private val DpUserTypes = 2

  /** floor(10⁶·ln 2) — the micro-nat rendering of one geometric(½)
    * mechanism's ε (ε = Δ·ln 2 for L1-sensitivity Δ at α = ½). A fixed
    * integer literal rendered into BOTH engines (q_dp_ledger); the
    * ledger's exact cells are the ln2-unit sensitivities themselves —
    * this constant only scales them into the unit auditors read. */
  private val Ln2Micro = 693147L

  /** The q_dp_user_count contribution-bounded (user_id, event_type, nc)
    * frame — shared by the release gate and the ledger's released-cell
    * census (q_dp_ledger must count cells of the SAME bounded histogram
    * it accounts for). */
  private def dpUserBounded(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUT = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_type"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(least(count(lit(1)), lit(DpUserCap)).as("nc"))
    val pick = hash32(concat(lit("dput:"),
      col("user_id").cast("string"), lit(":"), col("event_type")))
    perUT
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("nc").desc, pick, col("event_type"))))
      .filter(col("rk") <= DpUserTypes)
  }

  /** The shared per_ut/ranked CTE body of the user-bounding pipeline —
    * both the q_dp_user_count and q_dp_ledger oracles build on it. */
  private def sqlDpUserBounded: String =
    s"""per_ut AS (
       |  SELECT user_id, event_type,
       |    LEAST(COUNT(*), $DpUserCap) AS nc
       |  FROM events GROUP BY 1, 2),
       |ranked AS (
       |  SELECT user_id, event_type, nc,
       |    ROW_NUMBER() OVER (PARTITION BY user_id
       |      ORDER BY nc DESC,
       |        ${sqlHash32(
                  "'dput:' || CAST(user_id AS VARCHAR) || ':' || event_type")},
       |        event_type) AS rk
       |  FROM per_ut)""".stripMargin

  /** Per-doc DSIR score frame (doc_id, lang, n_grams, score, w_avg_ppm)
    * — the shared two-pass pipeline behind q_dsir_weights (top-20
    * readout) and q_dsir_sample (the resampling step). See the
    * q_dsir_weights gate comment for the plan shape. */
  private def dsirScores(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    // wordNgramsNative: the codegen'd kernel (byte-identical to the
    // composed form, TextKernelsSpec) — the composed HOF pipeline
    // re-derived the token array per gram and ran the weights gate at
    // 18.7 s isolated (bench r15); native it is one pass per doc
    def gramBuckets(s2: SparkSession, dir2: String) =
      docs(s2, dir2).select(col("doc_id"), col("lang"),
          explode(wordNgramsNative(col("text"), 2)).as("gram"))
        .select(col("doc_id"), col("lang"),
          (hash32(col("gram")) % DsirBuckets).as("b"))
    val gb = gramBuckets(s, dir)
    val weights = gb.groupBy(col("b"))
      .agg(count(lit(1)).as("cr"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
      .select(col("b"),
        expr("(1000000 * (ct + 1)) div (cr + 1)").as("w"))
    gramBuckets(s, dir).join(broadcast(weights), Seq("b"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_grams"), sum(col("w")).as("score"))
      .select(col("doc_id"), col("lang"), col("n_grams"), col("score"),
        expr("score div n_grams").as("w_avg_ppm"))
  }

  /** The shared gb/w/sc CTE body both DSIR oracles build on. */
  private def sqlDsirScores: String = {
    val grams = sqlWordNgrams("text", 2)
    s"""gb AS (
       |  SELECT doc_id, lang,
       |    (${sqlHash32("gram")} % $DsirBuckets) AS b
       |  FROM (SELECT doc_id, lang, unnest($grams) AS gram
       |        FROM documents)),
       |w AS (
       |  SELECT b, CAST((1000000 * (ct + 1)) // (cr + 1) AS BIGINT) AS w
       |  FROM (SELECT b, COUNT(*) AS cr,
       |      SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
       |    FROM gb GROUP BY b)),
       |sc AS (
       |  SELECT doc_id, lang, n_grams, score,
       |    score // n_grams AS w_avg_ppm
       |  FROM (SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_grams,
       |      CAST(SUM(w) AS BIGINT) AS score
       |    FROM gb JOIN w USING (b) GROUP BY 1, 2))""".stripMargin
  }

  /** Truncated two-sided geometric(½) noise via inverse-CDF of a 32-bit
    * uniform `u` — the engine rendering of [[DpThresholds]]. */
  private def dpNoise(u: Column): Column =
    DpThresholds.foldRight(lit(DpClamp): Column) {
      case ((k, t), rest) => when(u < t, lit(k)).otherwise(rest)
    }

  /** The oracle rendering of [[DpThresholds]]: a CASE chain over the SAME
    * integer literals, applied to the SQL uniform `uExpr`. */
  private def sqlDpNoise(uExpr: String): String = {
    val cases = DpThresholds
      .map { case (k, t) => s"WHEN $uExpr < $t THEN $k" }
      .mkString("\n    ")
    s"CAST(CASE\n    $cases\n    ELSE $DpClamp END AS BIGINT)"
  }

  override def defs: Map[String, Q] = Map(

    // ---- DSIR importance weights ------------------------------------
    // Feature = hashed BIGRAM bucket (hash32 % 4096). Pass 1: bucket
    // censuses of the raw corpus and the target slice (lang = 'en') in
    // ONE aggregation (the target is a subset of raw, so ct ≤ cr and the
    // smoothed ppm weight w = 10⁶(ct+1)/(cr+1) ≤ 10⁶ — no log, no
    // float: the likelihood RATIO itself, floor-scaled). Pass 2: per-doc
    // score = Σ w over its grams via a BROADCAST of the fixed 4096-row
    // weight table. Two passes over the gram stream is the mandatory
    // shape of any importance sampler (weights depend on the global
    // census); neither pass shuffles text — pass 1 shuffles 4096 keys,
    // pass 2 shuffles (doc_id, partial-sum). Score envelope: ≤ 10⁶ per
    // gram → 10¹² at a million-gram doc, long-safe by 6 orders.
    "q_dsir_weights" -> ((s, dir) =>
      dsirScores(s, dir)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)),

    // ---- DSIR importance RESAMPLING (the selection step) ------------
    // The weights gate scores; this gate actually DRAWS the selected
    // corpus (Xie et al. 2023's resampling step, as Bernoulli thinning):
    // keep doc ⟺ u/2³² < w_avg_ppm/10⁶, decided by the exact integer
    // cross-multiply u·10⁶ < w_avg_ppm·2³² (u = hash32 of the salted
    // doc id — replay-deterministic; both sides ≤ 4.3·10¹⁵, long-safe).
    // Keep probability IS the doc's mean importance ratio capped at 1,
    // so the sampled mix shifts toward the target slice — the per-lang
    // census (docs in, docs kept, grams kept) is the readout a mixing
    // stage reports. Same two gram passes as the weights gate (the
    // census-then-apply class-2 shape); the thinning adds one map-side
    // comparison and a ≤|langs|-row aggregate.
    "q_dsir_sample" -> ((s, dir) => {
      val u = hash32(concat(lit("dsirs:"), col("doc_id").cast("string")))
      dsirScores(s, dir)
        .select(col("lang"), col("n_grams"),
          (u * lit(1000000L) <
            col("w_avg_ppm") * lit(4294967296L)).as("keep"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("keep"), col("n_grams")).otherwise(0L))
            .as("kept_grams"))
        .orderBy(col("lang"))
    }),

    // ---- user-level ε-DP histogram (contribution bounding) ----------
    // q_dp_count is EVENT-level DP; this is the user-level release
    // (Wilson et al. 2020): bound each user to ≤ DpUserCap events per
    // type (LEAST on the (user, type) census) and to ≤ DpUserTypes
    // types, THEN count and add the same geometric(½) noise — the
    // whole histogram is (Cap·Types·ln 2)-user-DP because one user can
    // move it by at most Cap·Types = 6. Type selection follows the
    // paper's RANDOM partition choice, rendered deterministic as a
    // salted per-(user, type) hash rank: a fixed type-order tie-break
    // would keep the SAME types for every dense user (this fixture:
    // every user has ≥ Cap events of every type) and silently drop the
    // rest of the histogram. Plan: one (user, type) aggregate
    // (map-side partial), one window over the user-keyed CENSUS
    // (never the raw events), one type aggregate + per-group constant
    // noise.
    "q_dp_user_count" -> ((s, dir) => {
      val bounded = dpUserBounded(s, dir)
      val u = hash32(concat(lit("dpu:"), col("event_type")))
      bounded.groupBy(col("event_type"))
        .agg(sum(col("nc")).as("n"))
        .select(col("event_type"),
          (col("n") + dpNoise(u).cast("long")).as("n_dp"))
        .orderBy(col("event_type"))
    }),

    // ---- privacy-budget composition ledger --------------------------
    // The accounting readout a governed release actually publishes
    // (round 17, r16 verdict #6): the pipeline now runs THREE release
    // mechanisms — the event-level count (q_dp_count), the noisy-max
    // top-k (q_dp_topk), and the user-level bounded histogram
    // (q_dp_user_count) — and under basic sequential composition the
    // total spent budget is their sum. Every mechanism here is
    // geometric(α = ½), whose ε at L1-sensitivity Δ is exactly Δ·ln 2,
    // so the ledger's cells are pure integers: sensitivity per
    // mechanism (1, 1, Cap·Types = 6 — the SAME shared constants the
    // release gates use) plus the fixed micro-nat rendering
    // sensitivity·[[Ln2Micro]]. n_cells records what each mechanism
    // actually released/noised — distinct priorities, noised brand
    // candidates, and the types SURVIVING contribution bounding (the
    // ledger must census the same bounded histogram it accounts for,
    // hence the shared [[dpUserBounded]] frame). Cost: three tiny
    // aggregates (two distinct-counts on narrow columns + the existing
    // census window) and a 4-row union — ledger upkeep is free next to
    // the releases themselves.
    "q_dp_ledger" -> ((s, dir) => {
      val ledgerCols = Seq("seq", "mechanism", "scope", "n_cells",
        "sensitivity").map(col)
      val cCount = Tables.load(s, dir, "orders")
        .agg(countDistinct(col("o_orderpriority")).as("n_cells"))
        .select(lit(1L).as("seq"),
          lit("count_orders_priority").as("mechanism"),
          lit("event").as("scope"), col("n_cells"),
          lit(1L).as("sensitivity"))
      val cTopk = Tables.load(s, dir, "part")
        .agg(countDistinct(col("p_brand")).as("n_cells"))
        .select(lit(2L).as("seq"), lit("topk_part_brand").as("mechanism"),
          lit("event").as("scope"), col("n_cells"),
          lit(1L).as("sensitivity"))
      val cUser = dpUserBounded(s, dir)
        .agg(countDistinct(col("event_type")).as("n_cells"))
        .select(lit(3L).as("seq"),
          lit("user_hist_event_type").as("mechanism"),
          lit("user").as("scope"), col("n_cells"),
          lit(DpUserCap * DpUserTypes).as("sensitivity"))
      val rows = cCount.unionByName(cTopk).unionByName(cUser)
      val total = rows
        .agg(sum(col("n_cells")).as("n_cells"),
          sum(col("sensitivity")).as("sensitivity"))
        .select(lit(4L).as("seq"), lit("total").as("mechanism"),
          lit("all").as("scope"), col("n_cells"), col("sensitivity"))
      rows.unionByName(total)
        .select(ledgerCols :+
          (col("sensitivity") * lit(Ln2Micro)).as("eps_micronats"): _*)
        .orderBy(col("seq"))
    }),

    // ---- ε-DP count release (geometric mechanism) -------------------
    // Per-priority order counts released under ε = ln 2 differential
    // privacy: integer noise drawn from the truncated two-sided
    // geometric(1/2) via inverse-CDF over a DETERMINISTIC per-group
    // 32-bit uniform (hash32 of a salted group key). Determinism here is
    // a cross-engine replay requirement (both engines must draw the SAME
    // noise for hash parity), NOT a privacy feature: noise computable
    // from the released group key gives no actual DP guarantee (anyone
    // can recompute and subtract it) — a real release swaps the salt for
    // a secret seed, keeping the mechanism and thresholds identical.
    // (Caching one noised value per query IS sound practice — fresh
    // noise per repeat composes the budget away.) The when-chain
    // compares against precomputed integer CDF thresholds; zero float
    // arithmetic anywhere. Scale: one grouped count (map-side partial)
    // plus per-GROUP constant work — the release costs the same as the
    // count.
    "q_dp_count" -> ((s, dir) => {
      val u = hash32(concat(lit("dp1:"), col("o_orderpriority")))
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(col("o_orderpriority"),
          (col("n") + dpNoise(u).cast("long")).as("n_dp"))
        .orderBy(col("o_orderpriority"))
    }),

    // ---- ε-DP top-k selection (report-noisy-max, peeled as one shot) --
    // "Which 5 brands are most common?" released privately: every
    // candidate's count gets INDEPENDENT geometric noise (a distinct
    // salt from q_dp_count — independent draws per mechanism), then the
    // top 5 by noised count. Report-noisy-max is the selection
    // counterpart of the count release — the winner's identity is what's
    // DP-protected, and the brand counts here sit within ±16 of each
    // other, so the noise OBSERVABLY reorders the ranking (a fixture
    // where noise never changes the answer would pin nothing).
    // Deterministic tie-break by brand; same integer-only machinery.
    "q_dp_topk" -> ((s, dir) => {
      val u = hash32(concat(lit("dpk:"), col("p_brand")))
      Tables.load(s, dir, "part")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"))
        .select(col("p_brand"),
          (col("n") + dpNoise(u).cast("long")).as("n_dp"))
        .orderBy(col("n_dp").desc, col("p_brand"))
        .limit(5)
    }))

  override def oracle: Map[String, String] = Map(

    "q_dsir_weights" ->
      s"""WITH $sqlDsirScores
         |SELECT doc_id, lang, n_grams, score, w_avg_ppm
         |FROM sc ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "q_dsir_sample" ->
      s"""WITH $sqlDsirScores,
         |kept AS (
         |  SELECT lang, n_grams,
         |    ${sqlHash32("'dsirs:' || CAST(doc_id AS VARCHAR)")}
         |      * 1000000 < w_avg_ppm * 4294967296 AS keep
         |  FROM sc)
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept,
         |  CAST(SUM(CASE WHEN keep THEN n_grams ELSE 0 END) AS BIGINT)
         |    AS kept_grams
         |FROM kept GROUP BY lang ORDER BY lang""".stripMargin,

    "q_dp_user_count" ->
      s"""WITH $sqlDpUserBounded,
         |hist AS (
         |  SELECT event_type, CAST(SUM(nc) AS BIGINT) AS n,
         |    ${sqlHash32("'dpu:' || event_type")} AS u
         |  FROM ranked WHERE rk <= $DpUserTypes GROUP BY event_type)
         |SELECT event_type, n + ${sqlDpNoise("u")} AS n_dp
         |FROM hist ORDER BY event_type""".stripMargin,

    "q_dp_ledger" ->
      s"""WITH $sqlDpUserBounded,
         |cells AS (
         |  SELECT 1 AS seq, 'count_orders_priority' AS mechanism,
         |    'event' AS scope,
         |    CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_cells,
         |    CAST(1 AS BIGINT) AS sensitivity
         |  FROM orders
         |  UNION ALL
         |  SELECT 2, 'topk_part_brand', 'event',
         |    CAST(COUNT(DISTINCT p_brand) AS BIGINT), CAST(1 AS BIGINT)
         |  FROM part
         |  UNION ALL
         |  SELECT 3, 'user_hist_event_type', 'user',
         |    CAST(COUNT(DISTINCT event_type) AS BIGINT),
         |    CAST(${DpUserCap * DpUserTypes} AS BIGINT)
         |  FROM ranked WHERE rk <= $DpUserTypes),
         |ledger AS (
         |  SELECT * FROM cells
         |  UNION ALL
         |  SELECT 4, 'total', 'all',
         |    CAST(SUM(n_cells) AS BIGINT),
         |    CAST(SUM(sensitivity) AS BIGINT)
         |  FROM cells)
         |SELECT CAST(seq AS BIGINT) AS seq, mechanism, scope, n_cells,
         |  sensitivity,
         |  CAST(sensitivity * $Ln2Micro AS BIGINT) AS eps_micronats
         |FROM ledger ORDER BY seq""".stripMargin,

    "q_dp_count" ->
      s"""SELECT o_orderpriority,
         |  n + ${sqlDpNoise("u")} AS n_dp
         |FROM (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
         |    ${sqlHash32("'dp1:' || o_orderpriority")} AS u
         |  FROM orders GROUP BY o_orderpriority)
         |ORDER BY o_orderpriority""".stripMargin,

    "q_dp_topk" ->
      s"""SELECT p_brand, n + ${sqlDpNoise("u")} AS n_dp
         |FROM (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
         |    ${sqlHash32("'dpk:' || p_brand")} AS u
         |  FROM part GROUP BY p_brand)
         |ORDER BY n_dp DESC, p_brand LIMIT 5""".stripMargin)
}
