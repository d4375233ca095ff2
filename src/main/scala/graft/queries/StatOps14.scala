package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Round-12 tranche 22: contingency drill-down — adjusted standardized
  * residuals per cell of the segment×region table (WHICH cells carry
  * the association `q_chi2` detects and `q_cramers_v` sizes: the
  * haberman residual (O−E)/√(E(1−r/N)(1−c/N)) is ~N(0,1) under
  * independence, so |z| > 3 flags the driving cells). The diagnostic a
  * release audit prints next to the omnibus test.
  *
  * Determinism: the contingency and its marginals are exact integer
  * cells (≤ 25 rows after one keyed-join aggregate); each residual
  * closes as ONE shared-text double expression over those ints (all
  * < 2⁵³ at any realistic N, exact casts both engines).
  *
  * Scale posture: customer⋈nation (broadcast dim)⋈region (broadcast
  * dim) → one (segment, region)-keyed corpus aggregate; everything
  * after is the bounded 25-cell frame and its broadcast marginals.
  */
object StatOps14 extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  /** Adjusted standardized residual over exact cells. */
  private val zExpr =
    """((CAST(o AS DOUBLE) - CAST(rs AS DOUBLE) * cr / n)
      | / sqrt(CAST(rs AS DOUBLE) * cr / n
      |   * (1.0 - CAST(rs AS DOUBLE) / n)
      |   * (1.0 - CAST(cr AS DOUBLE) / n)))"""
      .stripMargin.replaceAll("\\s+", " ")

  override def defs: Map[String, Q] = Map[String, Q](

    "q_stdres_cells" -> ((s, dir) => {
      val n = t(s, dir, "nation").select(col("n_nationkey"),
        col("n_regionkey"))
      val r = t(s, dir, "region").select(col("r_regionkey"),
        col("r_name"))
      val cells = t(s, dir, "customer")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("c_mktsegment").as("seg"), col("r_name").as("reg"))
        .agg(count(lit(1)).as("o"))
        // round 18: census leaf (ScanCount: the fan-out re-ran the
        // fact scan per consumer; see OPTIMIZATION_r18.md)
        .localCheckpoint(eager = false)
      val rowm = cells.groupBy(col("seg")).agg(sum(col("o")).as("rs"))
      val colm = cells.groupBy(col("reg")).agg(sum(col("o")).as("cr"))
      val tot = cells.agg(sum(col("o")).as("n"))
      cells.join(broadcast(rowm), Seq("seg"))
        .join(broadcast(colm), Seq("reg"))
        .crossJoin(broadcast(tot))
        .select(col("seg").as("c_mktsegment"), col("reg").as("r_name"),
          col("o"), col("rs"), col("cr"), col("n"),
          round(expr(zExpr), 6).as("stdres"))
        .withColumn("driving", abs(col("stdres")) > 3.0)
        .orderBy(col("c_mktsegment"), col("r_name"))
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_stdres_cells" ->
      s"""WITH cells AS (
         |  SELECT c.c_mktsegment AS seg, r.r_name AS reg,
         |    COUNT(*) AS o
         |  FROM customer c
         |  JOIN nation n ON c.c_nationkey = n.n_nationkey
         |  JOIN region r ON n.n_regionkey = r.r_regionkey
         |  GROUP BY 1, 2),
         |rowm AS (SELECT seg, SUM(o) AS rs FROM cells GROUP BY 1),
         |colm AS (SELECT reg, SUM(o) AS cr FROM cells GROUP BY 1),
         |tot AS (SELECT SUM(o) AS n FROM cells),
         |z AS (
         |  SELECT cells.seg, cells.reg, cells.o,
         |    CAST(rowm.rs AS BIGINT) AS rs, CAST(colm.cr AS BIGINT)
         |      AS cr,
         |    CAST(tot.n AS BIGINT) AS n
         |  FROM cells JOIN rowm USING (seg) JOIN colm USING (reg), tot)
         |SELECT seg AS c_mktsegment, reg AS r_name,
         |  CAST(o AS BIGINT) AS o, rs, cr, n,
         |  round($zExpr, 6) AS stdres,
         |  (abs(round($zExpr, 6)) > 3.0) AS driving
         |FROM z ORDER BY c_mktsegment, r_name""".stripMargin
  )
}
