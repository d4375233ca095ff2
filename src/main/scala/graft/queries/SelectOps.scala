package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{hash32, sqlHash32, sqlWordNgrams,
  wordNgramsNative}
import graft.sources.Tables

/** Data-selection & private-release operators (round 15).
  *
  * Two published-method gates a 100 TB training-data pipeline runs between
  * curation and release:
  *
  *  - DSIR importance weights (Xie et al. 2023, "Data Selection for
  *    Language Models via Importance Resampling"): hashed-n-gram
  *    likelihood-ratio scores of every raw document against a target
  *    distribution — the signal importance resampling draws against.
  *  - the geometric mechanism (Ghosh/Roughgarden/Sundararajan 2009), the
  *    discrete analog of Laplace noise and the standard ε-DP release for
  *    COUNT statistics — completing the privacy set next to
  *    q_k_anonymity / q_l_diversity / q_t_closeness (those audit; this
  *    releases).
  *
  * Both are integer-exact end to end (the [[graft.operators.Bootstrap]]
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
    "q_dsir_weights" -> ((s, dir) => {
      // wordNgramsNative: the codegen'd kernel (byte-identical to the
      // composed form, TextKernelsSpec) — the composed HOF pipeline
      // re-derived the token array per gram and ran this gate at 18.7 s
      // isolated (bench r15); native it is one pass per doc
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
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
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

    "q_dsir_weights" -> {
      val grams = sqlWordNgrams("text", 2)
      s"""WITH gb AS (
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
         |  SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_grams,
         |    CAST(SUM(w) AS BIGINT) AS score
         |  FROM gb JOIN w USING (b) GROUP BY 1, 2)
         |SELECT doc_id, lang, n_grams, score,
         |  score // n_grams AS w_avg_ppm
         |FROM sc ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
    },

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
