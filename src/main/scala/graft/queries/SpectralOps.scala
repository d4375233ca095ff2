package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Round-12 tranche 21: spectral periodicity detection — the single-
  * frequency DFT power of daily revenue at the weekly and monthly
  * periods (does the series actually carry the seasonality
  * `q_holt_winters` models and `q_seasonal_adjust` removes — and how
  * strong is it relative to the series mass?).
  *
  * The trick that keeps it EXACT: at an integer period p the DFT
  * kernel e^{−2πit/p} only depends on t mod p, so the corpus reduces
  * to p residue-class sums C_r (pure integers, one keyed aggregate)
  * and the transform is Σ_r C_r·cos(2πr/p) with the ≤ 37 cos/sin
  * values micro-floored ONCE and multiplied by exact integers — the
  * q_log_loss per-constant × multiplicity staging applied to Fourier
  * analysis. No per-row transcendentals, no collected series.
  *
  * Determinism: a/b cells are exact integer sums; dollars staging
  * (cents div 100) keeps them < 2⁵³ to ~sf1 (documented; one more
  * div decade per further decade), so the closing sqrt sees exactly
  * equal doubles on both engines.
  *
  * Scale posture: one (period, residue)-keyed corpus aggregate —
  * map-side combinable into ≤ 37 cells — then arithmetic on those
  * cells. The lightest plan shape in the whole §2.13 family.
  */
object SpectralOps extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  private val Periods = Seq(7, 30)
  private val DayUs = 86400000000L

  override def defs: Map[String, Q] = Map[String, Q](

    "q_spectral_peak" -> ((s, dir) => {
      val y = t(s, dir, "lineitem")
        .select(expr(s"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div $DayUs")
          .as("day"),
          expr("""CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
            | AS BIGINT) div 100""".stripMargin.replaceAll("\\s+", " "))
            .as("y"))
      val classes = y
        .select(col("day"), col("y"),
          explode(lit(Periods.toArray)).as("p"))
        .groupBy(col("p"), expr("day % p").as("r"))
        .agg(sum(col("y").cast(DecimalType(38, 0))).as("cr"))
      val cells = classes
        .select(col("p"), col("cr"),
          expr("""CAST(floor(1000000.0
            | * cos(2.0 * pi() * r / p) + 0.5) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("cm"),
          expr("""CAST(floor(1000000.0
            | * sin(2.0 * pi() * r / p) + 0.5) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("sm"))
        .groupBy(col("p"))
        .agg(sum(col("cr") * col("cm")).as("a"),
          sum(col("cr") * col("sm")).as("b"),
          sum(col("cr")).as("stot"))
      cells.select(col("p").as("period"),
          expr("CAST(a AS BIGINT)").as("a_micro"),
          expr("CAST(b AS BIGINT)").as("b_micro"),
          expr("CAST(stot AS BIGINT)").as("total_dollars"))
        .select(col("period"), col("a_micro"), col("b_micro"),
          col("total_dollars"),
          round(expr("""(sqrt(CAST(a_micro AS DOUBLE) * a_micro
            | + CAST(b_micro AS DOUBLE) * b_micro) / 1000000.0
            | / total_dollars)""".stripMargin.replaceAll("\\s+", " ")), 6)
            .as("amp_share"))
        .orderBy(col("period"))
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_spectral_peak" ->
      s"""WITH y AS (
         |  SELECT epoch_us(l_shipdate) // $DayUs AS day,
         |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT) // 100 AS y
         |  FROM lineitem),
         |classes AS (
         |  SELECT s.p, y.day % s.p AS r, SUM(CAST(y.y AS HUGEINT)) AS cr
         |  FROM y, (SELECT unnest([7, 30]) AS p) s
         |  GROUP BY 1, 2),
         |cells AS (
         |  SELECT p,
         |    SUM(cr * CAST(floor(1000000.0
         |      * cos(2.0 * pi() * r / p) + 0.5) AS BIGINT)) AS a,
         |    SUM(cr * CAST(floor(1000000.0
         |      * sin(2.0 * pi() * r / p) + 0.5) AS BIGINT)) AS b,
         |    SUM(cr) AS stot
         |  FROM classes GROUP BY 1)
         |SELECT p AS period, CAST(a AS BIGINT) AS a_micro,
         |  CAST(b AS BIGINT) AS b_micro,
         |  CAST(stot AS BIGINT) AS total_dollars,
         |  round((sqrt(CAST(CAST(a AS BIGINT) AS DOUBLE)
         |      * CAST(a AS BIGINT)
         |    + CAST(CAST(b AS BIGINT) AS DOUBLE) * CAST(b AS BIGINT))
         |    / 1000000.0 / CAST(stot AS BIGINT)), 6) AS amp_share
         |FROM cells ORDER BY period""".stripMargin
  )
}
