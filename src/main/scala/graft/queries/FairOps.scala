package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.TextFunctions.{hash32, sqlHash32}
import graft.sources.Tables

/** Round-12 tranche 17: model-governance and representation audits —
  * the group-fairness readout of the shared toy model (per-language
  * selection rate / TPR / FPR: demographic parity and equalized odds
  * as DATA, the audit a model release gate prints), a
  * Johnson-Lindenstrauss random-projection distortion audit (how much
  * do pairwise distances move under the 64→8 sign projection — the
  * dimensionality-reduction sibling of the sketch audits), and an MMD²
  * two-sample drift test over embedding halves (kernel maximum mean
  * discrepancy — catches distribution-SHAPE drift that
  * `q_embed_drift`'s centroid distance cannot see).
  *
  * Determinism discipline: fairness and JL close in PURE integers
  * (micro-floored coordinates make every squared distance an exact
  * BIGINT ≤ 7·10¹³ < 2⁵³ — even the double casts are exact); MMD's
  * kernel values are per-pair micro-floored (`floor(10⁶·e^{−d²/2σ²} +
  * 0.5)` over the exact integer d², shared text) then exactly summed.
  * No `pow`, no rational centroids.
  *
  * Scale posture: fairness is one token pass + a |lang|-row rollup;
  * JL/MMD run over DETERMINISTIC BOUNDED samples (vec_id < 40 / 120 —
  * an audit needs a representative panel, not the corpus; the pair
  * joins are broadcast self-joins over ≤ 120 rows by construction,
  * never corpus×corpus). The projection/sign tables are 8·64-cell
  * broadcast dims from the portable [[hash32]].
  */
object FairOps extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  private val JlOut = 8
  private val JlSample = 40
  private val MmdSample = 120

  /** Micro-floored embedding coordinates for a bounded vec_id panel. */
  private def panel(s: SparkSession, dir: String, cap: Int): DataFrame =
    t(s, dir, "embeddings").filter(col("vec_id") < cap)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "vv")))
      .select(col("vec_id"), col("label"), col("dim"),
        floor(col("vv").cast("double") * 1000000).cast("long").as("xm"))

  override def defs: Map[String, Q] = Map[String, Q](

    // Group-fairness audit of the shared toy model across languages:
    // selection rate (demographic parity), TPR and FPR (equalized
    // odds) per language, in exact ppm. keep = score ≥ 0 (the
    // q_quality_model decision), truth = n_chars ≥ 400 (the
    // q_calibration_bins label) — ONE definition of model and label
    // across the whole eval family. One token pass, one |lang|-row
    // rollup; release gates read the max cross-group gaps off this
    // table.
    "q_fairness_audit" -> ((s, dir) => {
      val scored = PipelineOps.toyModelScores(
        t(s, dir, "documents").select(col("doc_id"), col("lang"),
          (col("n_chars") >= 400).as("pos"), col("text")))
        .select(col("lang"), col("pos"),
          (col("score_milli") >= 0).as("keep"))
      scored.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_sel"),
          sum(when(col("keep") && col("pos"), 1L).otherwise(0L)).as("tp"),
          sum(when(col("keep") && !col("pos"), 1L).otherwise(0L))
            .as("fp"))
        .select(col("lang"), col("n_docs"), col("n_pos"),
          expr("(1000000 * n_sel) div n_docs").as("sel_ppm"),
          expr("(1000000 * tp) div n_pos").as("tpr_ppm"),
          expr("(1000000 * fp) div (n_docs - n_pos)").as("fpr_ppm"))
        .orderBy(col("lang"))
    }),

    // JL sign-projection distortion audit: project the 40-vector panel
    // 64→8 dims with ±1 signs from the portable hash (y_j = Σ_d
    // sign(j:d)·x_d — exact integer micro), then compare every pair's
    // projected distance (scaled by the 1/k JL factor) to its exact
    // distance: ratio_ppm = 10⁶·d̂² / (8·d²), per-pair floored, with
    // the panel mean/min/max as the audit readout (JL expectation: 1).
    // Everything is exact integer arithmetic end to end.
    "q_jl_projection" -> ((s, dir) => {
      val pm = panel(s, dir, JlSample).localCheckpoint()
      val proj = pm
        .select(col("vec_id"), col("xm"), col("dim"),
          explode(expr(s"sequence(0, ${JlOut - 1})")).as("j"))
        .select(col("vec_id"), col("j"),
          (when(pmod(hash32(concat(col("j").cast("string"), lit(":"),
            col("dim").cast("string"))), lit(2)) === 0, lit(1L))
            .otherwise(lit(-1L)) * col("xm")).as("sx"))
        .groupBy(col("vec_id"), col("j")).agg(sum(col("sx")).as("y"))
        .groupBy(col("vec_id"))
        .agg(collect_list(struct(col("j"), col("y"))).as("yv"))
        .localCheckpoint()
      val d2 = pm.as("a").join(pm.as("b"),
          col("a.dim") === col("b.dim") &&
            col("a.vec_id") < col("b.vec_id"))
        .groupBy(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"))
        .agg(sum((col("a.xm") - col("b.xm")) * (col("a.xm") - col("b.xm")))
          .as("d2"))
      val dh2 = proj.as("p").join(proj.as("q"),
          col("p.vec_id") < col("q.vec_id"))
        .select(col("p.vec_id").as("ia"), col("q.vec_id").as("ib"),
          expr("""aggregate(
            |  zip_with(array_sort(p.yv), array_sort(q.yv),
            |    (a, b) -> (a.y - b.y) * (a.y - b.y)),
            |  0L, (acc, v) -> acc + v)"""
            .stripMargin).as("dh2"))
      d2.join(dh2, Seq("ia", "ib"))
        // 10⁶·dh2 can reach ~10²² — route the numerator through
        // DECIMAL(38,0) (DuckDB's SUM is already HUGEINT)
        .select(expr(s"""CAST((1000000 * CAST(dh2 AS DECIMAL(38,0)))
          | div ($JlOut * d2) AS BIGINT)"""
          .stripMargin.replaceAll("\\s+", " ")).as("ratio_ppm"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("ratio_ppm")).as("sr"),
          min(col("ratio_ppm")).as("min_ratio_ppm"),
          max(col("ratio_ppm")).as("max_ratio_ppm"))
        .select(col("n_pairs"),
          expr("sr div n_pairs").as("mean_ratio_ppm"),
          col("min_ratio_ppm"), col("max_ratio_ppm"))
    }),

    // MMD² two-sample drift test between the even and odd vec_id
    // halves of the 120-vector panel, RBF kernel k = e^{−d²/2σ²}
    // (2σ² = 20 raw units²): MMD² = mean k(x,x') + mean k(y,y') −
    // 2·mean k(x,y). Per-pair kernels micro-floored over the EXACT
    // integer d² (≤ 7·10¹³ — the double cast is exact on both
    // engines), summed exactly, closed in integer div. Near 0 on
    // same-distribution halves — the shape-sensitive companion to
    // q_embed_drift.
    "q_mmd_drift" -> ((s, dir) => {
      val pm = panel(s, dir, MmdSample)
        .withColumn("h", pmod(col("vec_id"), lit(2)))
        .localCheckpoint()
      val pair = pm.as("a").join(pm.as("b"),
          col("a.dim") === col("b.dim") &&
            col("a.vec_id") < col("b.vec_id"))
        .groupBy(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
          col("a.h").as("ha"), col("b.h").as("hb"))
        .agg(sum((col("a.xm") - col("b.xm")) * (col("a.xm") - col("b.xm")))
          .as("d2"))
        .select(col("ha"), col("hb"),
          expr("""CAST(floor(1000000.0
            | * exp(-CAST(d2 AS DOUBLE) / 20000000000000.0) + 0.5)
            | AS BIGINT)""".stripMargin.replaceAll("\\s+", " "))
            .as("k"))
      val counts = pm.select(col("vec_id"), col("h")).distinct()
        .groupBy(col("h")).agg(count(lit(1)).as("c"))
      val nx = counts.filter(col("h") === 0).select(col("c").as("n_x"))
      val ny = counts.filter(col("h") === 1).select(col("c").as("n_y"))
      pair
        .agg(
          sum(when(col("ha") === 0 && col("hb") === 0, col("k"))
            .otherwise(0L)).as("sxx"),
          sum(when(col("ha") === 1 && col("hb") === 1, col("k"))
            .otherwise(0L)).as("syy"),
          sum(when(col("ha") =!= col("hb"), col("k")).otherwise(0L))
            .as("sxy"))
        .crossJoin(broadcast(nx)).crossJoin(broadcast(ny))
        .select(col("n_x"), col("n_y"), col("sxx"), col("syy"),
          col("sxy"),
          expr("""((2 * sxx) div (n_x * (n_x - 1))
            | + (2 * syy) div (n_y * (n_y - 1))
            | - (2 * sxy) div (n_x * n_y))"""
            .stripMargin.replaceAll("\\s+", " ")).as("mmd2_micro"))
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_fairness_audit" -> {
      val toks = graft.functions.TextFunctions.sqlTokens(
        graft.functions.TextFunctions.sqlNormalizeText("text"))
      val w = s"(${sqlHash32("token")} % 1000 - 500)"
      s"""WITH tf AS (
         |  SELECT doc_id, lang, pos, token, COUNT(*) AS tf
         |  FROM (SELECT doc_id, lang, n_chars >= 400 AS pos,
         |          unnest($toks) AS token FROM documents)
         |  GROUP BY 1, 2, 3, 4),
         |scored AS (
         |  SELECT doc_id, lang, pos,
         |    CAST(SUM(tf * $w) AS BIGINT) >= 0 AS keep
         |  FROM tf GROUP BY 1, 2, 3),
         |cells AS (
         |  SELECT lang, COUNT(*) AS n_docs,
         |    SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
         |    SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS n_sel,
         |    SUM(CASE WHEN keep AND pos THEN 1 ELSE 0 END) AS tp,
         |    SUM(CASE WHEN keep AND NOT pos THEN 1 ELSE 0 END) AS fp
         |  FROM scored GROUP BY 1)
         |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(n_pos AS BIGINT) AS n_pos,
         |  CAST((1000000 * n_sel) // n_docs AS BIGINT) AS sel_ppm,
         |  CAST((1000000 * tp) // n_pos AS BIGINT) AS tpr_ppm,
         |  CAST((1000000 * fp) // (n_docs - n_pos) AS BIGINT) AS fpr_ppm
         |FROM cells ORDER BY lang""".stripMargin
    },

    "q_jl_projection" -> {
      val sh = sqlHash32("(j || ':' || dim)")
      s"""WITH pm AS MATERIALIZED (
         |  SELECT e.vec_id, u.i - 1 AS dim,
         |    CAST(FLOOR(CAST(e.embedding[u.i] AS DOUBLE) * 1000000)
         |      AS BIGINT) AS xm
         |  FROM embeddings e,
         |  LATERAL unnest(generate_series(1, len(e.embedding))) AS u(i)
         |  WHERE e.vec_id < $JlSample),
         |proj AS MATERIALIZED (
         |  SELECT vec_id, j,
         |    SUM(CASE WHEN $sh % 2 = 0 THEN xm ELSE -xm END) AS y
         |  FROM pm, unnest(generate_series(0, ${JlOut - 1})) AS s(j)
         |  GROUP BY 1, 2),
         |d2 AS (
         |  SELECT a.vec_id AS ia, b.vec_id AS ib,
         |    SUM((a.xm - b.xm) * (a.xm - b.xm)) AS d2
         |  FROM pm a JOIN pm b
         |    ON a.dim = b.dim AND a.vec_id < b.vec_id
         |  GROUP BY 1, 2),
         |dh2 AS (
         |  SELECT p.vec_id AS ia, q.vec_id AS ib,
         |    SUM((p.y - q.y) * (p.y - q.y)) AS dh2
         |  FROM proj p JOIN proj q
         |    ON p.j = q.j AND p.vec_id < q.vec_id
         |  GROUP BY 1, 2),
         |ratios AS (
         |  SELECT (1000000 * dh2.dh2) // ($JlOut * d2.d2) AS ratio_ppm
         |  FROM d2 JOIN dh2 ON dh2.ia = d2.ia AND dh2.ib = d2.ib)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(SUM(ratio_ppm) // COUNT(*) AS BIGINT)
         |    AS mean_ratio_ppm,
         |  CAST(MIN(ratio_ppm) AS BIGINT) AS min_ratio_ppm,
         |  CAST(MAX(ratio_ppm) AS BIGINT) AS max_ratio_ppm
         |FROM ratios""".stripMargin
    },

    "q_mmd_drift" ->
      s"""WITH pm AS MATERIALIZED (
         |  SELECT e.vec_id, e.vec_id % 2 AS h, u.i - 1 AS dim,
         |    CAST(FLOOR(CAST(e.embedding[u.i] AS DOUBLE) * 1000000)
         |      AS BIGINT) AS xm
         |  FROM embeddings e,
         |  LATERAL unnest(generate_series(1, len(e.embedding))) AS u(i)
         |  WHERE e.vec_id < $MmdSample),
         |pair AS (
         |  SELECT a.h AS ha, b.h AS hb,
         |    CAST(floor(1000000.0
         |      * exp(-CAST(SUM((a.xm - b.xm) * (a.xm - b.xm)) AS DOUBLE)
         |        / 20000000000000.0) + 0.5) AS BIGINT) AS k
         |  FROM pm a JOIN pm b
         |    ON a.dim = b.dim AND a.vec_id < b.vec_id
         |  GROUP BY a.vec_id, b.vec_id, a.h, b.h),
         |counts AS (
         |  SELECT h, COUNT(DISTINCT vec_id) AS c FROM pm GROUP BY 1),
         |cells AS (
         |  SELECT
         |    SUM(CASE WHEN ha = 0 AND hb = 0 THEN k ELSE 0 END) AS sxx,
         |    SUM(CASE WHEN ha = 1 AND hb = 1 THEN k ELSE 0 END) AS syy,
         |    SUM(CASE WHEN ha <> hb THEN k ELSE 0 END) AS sxy
         |  FROM pair)
         |SELECT
         |  (SELECT CAST(c AS BIGINT) FROM counts WHERE h = 0) AS n_x,
         |  (SELECT CAST(c AS BIGINT) FROM counts WHERE h = 1) AS n_y,
         |  CAST(sxx AS BIGINT) AS sxx, CAST(syy AS BIGINT) AS syy,
         |  CAST(sxy AS BIGINT) AS sxy,
         |  CAST((2 * sxx) // ((SELECT c FROM counts WHERE h = 0)
         |      * ((SELECT c FROM counts WHERE h = 0) - 1))
         |    + (2 * syy) // ((SELECT c FROM counts WHERE h = 1)
         |      * ((SELECT c FROM counts WHERE h = 1) - 1))
         |    - (2 * sxy) // ((SELECT c FROM counts WHERE h = 0)
         |      * (SELECT c FROM counts WHERE h = 1)) AS BIGINT)
         |    AS mmd2_micro
         |FROM cells""".stripMargin
  )
}
