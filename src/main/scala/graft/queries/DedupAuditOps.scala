package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Round-13 tranche: dedup-pipeline AUDIT — the question a curation
  * team asks ABOUT its detectors, beside the detectors themselves
  * (operators/Dedup, q_minhash_calibration, q_dedup_edit):
  *
  * capture-recapture (`q_capture_recapture`) — "how many duplicate
  * pairs exist that NO single detector caught?" Two cheap fingerprint
  * detectors (first-32-chars vs last-32-chars agreement) play the two
  * capture occasions of a Lincoln-Petersen/Chapman population
  * estimate: N̂ = n₁·n₂/m from each detector's catch and the overlap.
  * The population is a PLANTED variant fixture (the q_dedup_exact
  * mutant discipline): every doc gets one variant whose head is
  * mutated iff bit0(doc_id) and whose tail is mutated iff
  * bit1(doc_id) — two INDEPENDENT bits, so detector catches are
  * independent by construction and the estimator's assumption
  * actually holds on the gate corpus; truth (= one planted pair per
  * doc) rides along as the readout the estimate is judged against.
  * At 100 TB the truth column is the thing you CANNOT compute — the
  * estimate from two cheap detectors is the point.
  *
  * Scale posture: NO pair materialization — every catch count is
  * Σ C(c,2) off a fingerprint census (three keyed aggregates of
  * (fingerprint, count)); text beyond 32-char fingerprints never
  * shuffles. Incidental same-prefix collisions between UNRELATED docs
  * ride into n₁/m as deterministic fixture noise (≤ 28 pairs at gate
  * scales, declared).
  */
object DedupAuditOps extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  /** Front/back 32-char fingerprints — shared text both engines. */
  private val FpFront = "substring(text, 1, 32)"
  private val FpBack =
    "substring(text, greatest(1, length(text) - 31), 32)"
  private val SqlFpFront = "substr(text, 1, 32)"
  private val SqlFpBack =
    "substr(text, greatest(1, length(text) - 31), 32)"

  override def defs: Map[String, Q] = Map[String, Q](

    // Lincoln-Petersen / Chapman duplicate-population estimate over the
    // independent-bits variant fixture. Detector A = front fingerprints
    // agree (catches a planted pair iff bit0 = 0), B = back agree
    // (iff bit1 = 0) — P(A) = P(B) = ½, independent, so m ≈ N/4 and
    // N̂ = n₁·n₂/m recovers the planted N. Degenerate stance: m = 0
    // (impossible here — doc_id ≡ 0 mod 4 exists at every sf) would
    // error loudly on both engines (ANSI div / DuckDB //); Chapman's
    // +1 smoothing rides alongside as the small-m-robust variant.
    "q_capture_recapture" -> ((s, dir) => {
      val base = t(s, dir, "documents")
        .select(Parity.guardedVariantId(col("doc_id")).as("doc_id"),
          col("text"))
      val variants = base.select(
        concat(
          when(col("doc_id") % 2 === 1, lit("Z")).otherwise(lit("")),
          col("text"),
          when(expr("(doc_id div 2) % 2") === 1, lit("Z"))
            .otherwise(lit(""))).as("text"))
      val d = base.select(col("text")).unionByName(variants)
        .select(expr(FpFront).as("fa"), expr(FpBack).as("fb"))
        .localCheckpoint() // three census consumers of one tiny frame
      def pairsOf(keys: Seq[String], as: String) = d
        .groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(expr("(c * (c - 1)) div 2")), lit(0L))
          .as(as))
      val n1 = pairsOf(Seq("fa"), "n_front")
      val n2 = pairsOf(Seq("fb"), "n_back")
      val m = pairsOf(Seq("fa", "fb"), "n_both")
      val tr = base.agg(count(lit(1)).as("truth_pairs"))
      broadcast(n1).crossJoin(broadcast(n2)).crossJoin(broadcast(m))
        .crossJoin(broadcast(tr))
        .select(col("n_front"), col("n_back"), col("n_both"),
          col("truth_pairs"),
          expr("(n_front * n_back) div n_both").as("est_lp"),
          expr("""((n_front + 1) * (n_back + 1)) div (n_both + 1) - 1""")
            .as("est_chapman"))
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_capture_recapture" ->
      s"""WITH base AS (
         |  SELECT doc_id, text FROM documents),
         |variants AS (
         |  SELECT (CASE WHEN doc_id % 2 = 1 THEN 'Z' ELSE '' END)
         |      || text ||
         |    (CASE WHEN (doc_id // 2) % 2 = 1 THEN 'Z' ELSE '' END)
         |      AS text
         |  FROM base),
         |d AS (
         |  SELECT $SqlFpFront AS fa, $SqlFpBack AS fb
         |  FROM (SELECT text FROM base
         |        UNION ALL SELECT text FROM variants)),
         |n1 AS (SELECT COALESCE(SUM((c * (c - 1)) // 2), 0) AS n_front
         |  FROM (SELECT COUNT(*) AS c FROM d GROUP BY fa)),
         |n2 AS (SELECT COALESCE(SUM((c * (c - 1)) // 2), 0) AS n_back
         |  FROM (SELECT COUNT(*) AS c FROM d GROUP BY fb)),
         |m AS (SELECT COALESCE(SUM((c * (c - 1)) // 2), 0) AS n_both
         |  FROM (SELECT COUNT(*) AS c FROM d GROUP BY fa, fb)),
         |tr AS (SELECT COUNT(*) AS truth_pairs FROM base)
         |SELECT CAST(n_front AS BIGINT) AS n_front,
         |  CAST(n_back AS BIGINT) AS n_back,
         |  CAST(n_both AS BIGINT) AS n_both,
         |  CAST(truth_pairs AS BIGINT) AS truth_pairs,
         |  CAST((n_front * n_back) // n_both AS BIGINT) AS est_lp,
         |  CAST(((n_front + 1) * (n_back + 1)) // (n_both + 1) - 1
         |    AS BIGINT) AS est_chapman
         |FROM n1, n2, m, tr""".stripMargin
  )
}
