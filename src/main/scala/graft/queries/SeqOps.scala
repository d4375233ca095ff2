package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Round-12 tranche 19: event-sequence information readouts —
  * burstiness of per-user inter-arrival gaps (the Goh-Barabási
  * (σ−μ)/(σ+μ) dispersion index per event type: −1 periodic, 0
  * Poisson, →1 bursty — the arrival-process diagnostic behind queue
  * sizing and rate-limit design) and the first-order entropy rate of
  * the journey Markov chain (the plug-in conditional entropy
  * −Σ p(i,j)·ln p(j|i) with its perplexity — how predictable is the
  * next user action, the sequence-model floor an LM-style predictor
  * must beat).
  *
  * Determinism discipline: burstiness closes from exact µs-gap moment
  * cells (the q_grubbs truncated-exact variance); entropy's `ln` sees
  * only the ≤ 36 transition-cell rationals, each micro-floored ONCE
  * and multiplied by its exact count (the q_log_loss per-constant ×
  * multiplicity staging).
  *
  * Scale posture: burstiness windows partition by (user, type) —
  * per-user bounded partitions, never a global ordering; entropy
  * reuses [[AttribOps.transitionsDf]]'s one-pass journey build and
  * closes on the bounded cell frame.
  */
object SeqOps extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  /** Burstiness closing over exact cells: (σ−μ)/(σ+μ). */
  private val burstExpr =
    """((sqrt(CAST(s2 AS DOUBLE)) - CAST(mu AS DOUBLE))
      | / (sqrt(CAST(s2 AS DOUBLE)) + CAST(mu AS DOUBLE)))"""
      .stripMargin.replaceAll("\\s+", " ")

  override def defs: Map[String, Q] = Map[String, Q](

    // Burstiness per event type over per-user inter-arrival gaps
    // (whole SECONDS — µs² second moments overflow BIGINT on month-wide
    // user histories; the trunc div to seconds is identical on both
    // engines and the dispersion index is scale-free anyway):
    // gaps from a (user, type)-partitioned lag window (bounded
    // partitions — never a per-type global sort), then one type-keyed
    // exact moment aggregate; B = (σ−μ)/(σ+μ) with the truncated-exact
    // sample variance. Output per type with the gap census cells.
    "q_burstiness" -> ((s, dir) => {
      val gaps = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("event_id"),
          expr("unix_micros(ts)").as("us"))
        .withColumn("gap",
          expr("(us - lag(us, 1) OVER (PARTITION BY user_id, event_type"
            + " ORDER BY us, event_id)) div 1000000"))
        .filter(col("gap").isNotNull)
      gaps.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gap").cast(DecimalType(38, 0))).as("sg"),
          sum(col("gap").cast(DecimalType(38, 0)) * col("gap")).as("qg"))
        .select(col("event_type"), col("n_gaps"),
          expr("CAST((sg - sg % n_gaps) / n_gaps AS BIGINT)").as("mu"),
          expr("""CAST((qg - (sg * sg - (sg * sg) % n_gaps) / n_gaps)
            | div (n_gaps - 1) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("s2"))
        .select(col("event_type"), col("n_gaps"), col("mu"), col("s2"),
          round(expr(burstExpr), 6).as("burstiness"))
        .orderBy(col("event_type"))
    }),

    // First-order entropy rate of the journey chain: Ĥ =
    // −Σ_cells (c_ij/N)·ln(c_ij/n_i) nats — each cell's ln is a
    // once-micro-floored constant times the exact count, so
    // h_micro = −(Σ c_ij·k_ij) div N is exact; perplexity e^Ĥ closes
    // as a shared-text double. Cells are the bounded transition frame
    // (≤ 36 rows after one corpus pass).
    "q_seq_entropy" -> ((s, dir) => {
      // round 18: transitions leaf — the per-prev totals and the term
      // join each re-ran the whole journey-truncation window otherwise
      // (ScanCount: 4 events scans at sf0.01)
      val trans = AttribOps.transitionsDf(s, dir)
        .localCheckpoint(eager = false)
      val n = trans.groupBy(col("prev")).agg(sum(col("c")).as("np"))
      val cells = trans.join(broadcast(n), Seq("prev"))
        .select(col("c"),
          expr("""CAST(floor(1000000.0
            | * ln(CAST(c AS DOUBLE) / np) + 0.5) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("k"))
      cells
        .agg(sum(col("c")).as("n_trans"),
          count(lit(1)).as("n_cells"),
          sum(col("c").cast(DecimalType(38, 0)) * col("k")).as("sk"))
        .select(col("n_trans"), col("n_cells"),
          expr("CAST((-sk) div n_trans AS BIGINT)").as("h_micro"))
        .select(col("n_trans"), col("n_cells"), col("h_micro"),
          round(expr("exp(CAST(h_micro AS DOUBLE) / 1000000.0)"), 6)
            .as("perplexity"))
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_burstiness" ->
      s"""WITH gaps AS (
         |  SELECT event_type,
         |    (us - LAG(us) OVER (PARTITION BY user_id, event_type
         |      ORDER BY us, event_id)) // 1000000 AS gap
         |  FROM (SELECT user_id, event_type, event_id,
         |          epoch_us(ts) AS us FROM events)),
         |cells AS (
         |  SELECT event_type, COUNT(*) AS n_gaps,
         |    CAST(SUM(CAST(gap AS HUGEINT)) // COUNT(*)
         |      AS BIGINT) AS mu,
         |    CAST((SUM(CAST(gap AS HUGEINT) * gap)
         |        - (SUM(CAST(gap AS HUGEINT))
         |           * SUM(CAST(gap AS HUGEINT))) // COUNT(*))
         |      // (COUNT(*) - 1) AS BIGINT) AS s2
         |  FROM gaps WHERE gap IS NOT NULL GROUP BY 1)
         |SELECT event_type, CAST(n_gaps AS BIGINT) AS n_gaps, mu, s2,
         |  round($burstExpr, 6) AS burstiness
         |FROM cells ORDER BY event_type""".stripMargin,

    "q_seq_entropy" ->
      s"""WITH ${AttribOps.journeySql},
         |np AS (SELECT prev, SUM(c) AS np FROM trans GROUP BY 1),
         |cells AS (
         |  SELECT trans.c,
         |    CAST(floor(1000000.0
         |      * ln(CAST(trans.c AS DOUBLE) / np.np) + 0.5) AS BIGINT)
         |      AS k
         |  FROM trans JOIN np USING (prev)),
         |agg AS (
         |  SELECT SUM(c) AS n_trans, COUNT(*) AS n_cells,
         |    SUM(CAST(c AS HUGEINT) * k) AS sk
         |  FROM cells)
         |SELECT CAST(n_trans AS BIGINT) AS n_trans,
         |  CAST(n_cells AS BIGINT) AS n_cells,
         |  CAST((-sk) // n_trans AS BIGINT) AS h_micro,
         |  round(exp(CAST(CAST((-sk) // n_trans AS BIGINT) AS DOUBLE)
         |    / 1000000.0), 6) AS perplexity
         |FROM agg""".stripMargin
  )
}
