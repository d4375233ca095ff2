package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Round-12 tranche 12: privacy-distribution and economics readouts —
  * t-closeness (the EMD distance between each quasi-identifier class's
  * sensitive-value distribution and the global one: the distributional
  * successor of `q_k_anonymity`'s size floor and `q_l_diversity`'s
  * value-count floor), the Atkinson inequality index (ε = 1: the
  * geometric-mean welfare form, the normative sibling of `q_gini` /
  * `q_theil`), and log-log price elasticity (the demand-curve OLS slope
  * every pricing pipeline fits).
  *
  * Determinism discipline: t-closeness closes in PURE integers (ordered
  * EMD = Σ|cumulative-count cross-differences| over a common n_c·N
  * denominator — no doubles at all); Atkinson and elasticity use the
  * q_zipf_slope row staging — per-row `ln` terms micro-rounded
  * (`round(10⁶·…, 0)`, half-up on both engines) then exactly summed
  * through DECIMAL(38,0)/HUGEINT, closing as one IEEE expression over
  * exact cells with shared text.
  *
  * Scale posture: one corpus-keyed aggregate each (the class×band cells
  * / the order scan / the part-keyed quantity rollup); everything after
  * is bounded — t-closeness's spine is |classes|×|bands| (windows
  * partition BY CLASS), elasticity's moment frame is |parts| rows
  * reduced map-side. Envelopes: cum·N ≤ n², ×10⁶ exact to n ≈ 3·10¹⁴.
  */
object StatOps11 extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  /** Atkinson(ε=1) closing over exact cells (n, s = Σcents,
    * sl = Σ round(10⁶·ln cents)): 1 − n·exp(sl/n/10⁶)/s. */
  private val atkExpr =
    """(1.0 - CAST(n_orders AS DOUBLE)
      | * exp(CAST(sl AS DOUBLE) / n_orders / 1000000.0)
      | / CAST(s AS DOUBLE))""".stripMargin.replaceAll("\\s+", " ")

  /** OLS slope over exact micro-moment cells (the q_zipf_slope close). */
  private val slopeExpr =
    """(CAST(1000000 * n_parts * sxy - sx * sy AS DOUBLE)
      | / CAST(1000000 * n_parts * sxx - sx * sx AS DOUBLE))"""
      .stripMargin.replaceAll("\\s+", " ")

  override def defs: Map[String, Q] = Map[String, Q](

    // t-closeness audit: quasi-identifier class = (nation, segment),
    // sensitive attribute = the 200k-cent balance band (the
    // q_k_anonymity banding, so the two audits read one anonymization
    // design). Ordered EMD per class = Σ_b |cumP_b − cumQ_b| / (m−1)
    // with P the class distribution and Q the global one; over the
    // common denominator n_c·N it is the pure-integer
    // Σ|cum_cb·N − cum_b·n_c|, and emd_ppm = ⌊10⁶·Σ / ((m−1)·n_c·N)⌋.
    // Zero-count bands still move the cumulative — the class×band spine
    // completes them (both dims bounded, the crossJoin broadcasts).
    // Windows partition by class / by the 1-row global side; breach
    // flags t > 0.2. One corpus aggregate; everything after is
    // |classes|·|bands| rows.
    "q_t_closeness" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(
        col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
        expr("""(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
               | + 100000) div 200000""".stripMargin).as("band"))
      val cells = c.groupBy(col("nk"), col("seg"), col("band"))
        .agg(count(lit(1)).as("cnt"))
        // round 18: census leaf (ScanCount: the fan-out re-ran the
        // fact scan per consumer; see OPTIMIZATION_r18.md)
        .localCheckpoint(eager = false)
      val classes = cells.groupBy(col("nk"), col("seg"))
        .agg(sum(col("cnt")).as("n_c"))
      val bands = cells.groupBy(col("band")).agg(sum(col("cnt")).as("nb"))
      // the global cumulative over the ≤ |bands| aggregate runs as the
      // O(|bands|²) broadcast theta join, NOT an unpartitioned window —
      // the RangeBuckets offset-merge discipline (PlanSpec sweeps for
      // SinglePartition windows and this frame, while bounded, earns no
      // waiver when the merge join is this cheap)
      val gcum = bands.as("a")
        .join(broadcast(bands.select(col("band").as("ob"),
          col("nb").as("onb"))), col("ob") <= col("band"))
        .groupBy(col("band")).agg(sum(col("onb")).as("cum_b"))
      val ntot = bands.agg(sum(col("nb")).as("n"))
      val spine = classes.crossJoin(
        broadcast(bands.select(col("band"))))
      val wc = Window.partitionBy(col("nk"), col("seg"))
        .orderBy(col("band"))
      val ccum = spine
        .join(cells, Seq("nk", "seg", "band"), "left")
        .select(col("nk"), col("seg"), col("band"), col("n_c"),
          coalesce(col("cnt"), lit(0L)).as("cnt"))
        .withColumn("cum_cb", sum(col("cnt")).over(wc))
      val m = bands.agg(count(lit(1)).as("m"))
      ccum.join(broadcast(gcum), Seq("band"))
        .crossJoin(broadcast(ntot)).crossJoin(broadcast(m))
        .groupBy(col("nk"), col("seg"), col("n_c"), col("n"), col("m"))
        .agg(sum(abs(col("cum_cb").cast(DecimalType(38, 0)) * col("n")
          - col("cum_b").cast(DecimalType(38, 0)) * col("n_c")))
          .as("num"))
        .select(col("nk").as("c_nationkey"), col("seg").as("c_mktsegment"),
          col("n_c").as("n_rows"),
          expr("""CAST((1000000 * num) div ((m - 1)
            | * (CAST(n_c AS DECIMAL(38,0)) * n)) AS BIGINT)"""
            .stripMargin.replaceAll("\\s+", " ")).as("emd_ppm"))
        .withColumn("breach", col("emd_ppm") > 200000L)
        .orderBy(col("c_nationkey"), col("c_mktsegment"))
    }),

    // Atkinson inequality index (ε = 1) over order values: A = 1 −
    // geomean/mean. The geometric mean's Σln runs through the
    // q_zipf_slope row staging (round(10⁶·ln cents, 0) per row, exact
    // decimal sum); mean stays an exact cents cell; the unit choice
    // cancels between the two means. One corpus aggregate, 6-dp
    // readout.
    "q_atkinson" -> ((s, dir) => {
      t(s, dir, "orders")
        .select((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("x"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("x").cast(DecimalType(38, 0))).as("s"),
          sum(round(lit(1000000.0) * log(col("x").cast("double")), 0)
            .cast(DecimalType(38, 0))).as("sl"))
        .select(col("n_orders"),
          expr("CAST(s AS BIGINT)").as("s"),
          expr("CAST(sl AS BIGINT)").as("sl"))
        .select(col("n_orders"), col("s"), col("sl"),
          round(expr(atkExpr), 6).as("atkinson"))
    }),

    // Log-log price elasticity of demand across parts: slope of
    // ln(total quantity) on ln(retail price) — one part-keyed quantity
    // rollup joined to the part dim, per-part ln/ln² /ln·ln terms
    // micro-rounded then exactly summed (the q_zipf_slope moment
    // staging), slope closed as one IEEE division over exact cells.
    "q_price_elasticity" -> ((s, dir) => {
      val q = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum((col("l_quantity").cast(DecimalType(18, 2)) * 100)
          .cast("long")).as("qc"))
      val p = t(s, dir, "part").select(col("p_partkey"),
        (col("p_retailprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("pc"))
      q.join(p, col("l_partkey") === col("p_partkey"))
        .select(
          round(lit(1000000.0) * log(col("pc").cast("double")), 0)
            .cast("long").as("xm"),
          round(lit(1000000.0) * log(col("qc").cast("double")), 0)
            .cast("long").as("ym"),
          round(lit(1000000.0) * log(col("pc").cast("double"))
            * log(col("qc").cast("double")), 0).cast("long").as("pm"),
          round(lit(1000000.0) * log(col("pc").cast("double"))
            * log(col("pc").cast("double")), 0).cast("long").as("qm"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("xm").cast(DecimalType(38, 0))).as("sx"),
          sum(col("ym").cast(DecimalType(38, 0))).as("sy"),
          sum(col("pm").cast(DecimalType(38, 0))).as("sxy"),
          sum(col("qm").cast(DecimalType(38, 0))).as("sxx"))
        .select(col("n_parts"), round(expr(slopeExpr), 6).as("elasticity"))
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_t_closeness" ->
      """WITH c AS (
        |  SELECT c_nationkey AS nk, c_mktsegment AS seg,
        |    (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |     + 100000) // 200000 AS band
        |  FROM customer),
        |cells AS (
        |  SELECT nk, seg, band, COUNT(*) AS cnt FROM c GROUP BY 1, 2, 3),
        |classes AS (
        |  SELECT nk, seg, SUM(cnt) AS n_c FROM cells GROUP BY 1, 2),
        |bands AS (SELECT band, SUM(cnt) AS nb FROM cells GROUP BY 1),
        |gcum AS (
        |  SELECT band, SUM(nb) OVER (ORDER BY band
        |    ROWS UNBOUNDED PRECEDING) AS cum_b FROM bands),
        |ntot AS (SELECT SUM(nb) AS n FROM bands),
        |m AS (SELECT COUNT(*) AS m FROM bands),
        |spine AS (
        |  SELECT classes.nk, classes.seg, classes.n_c, bands.band
        |  FROM classes CROSS JOIN bands),
        |ccum AS (
        |  SELECT nk, seg, band, n_c,
        |    SUM(cnt) OVER (PARTITION BY nk, seg ORDER BY band
        |      ROWS UNBOUNDED PRECEDING) AS cum_cb
        |  FROM (
        |    SELECT s.nk, s.seg, s.band, s.n_c,
        |      COALESCE(cells.cnt, 0) AS cnt
        |    FROM spine s LEFT JOIN cells
        |      ON cells.nk = s.nk AND cells.seg = s.seg
        |      AND cells.band = s.band)),
        |num AS (
        |  SELECT ccum.nk, ccum.seg, ccum.n_c,
        |    SUM(ABS(CAST(ccum.cum_cb AS HUGEINT) * ntot.n
        |      - CAST(gcum.cum_b AS HUGEINT) * ccum.n_c)) AS num
        |  FROM ccum JOIN gcum USING (band), ntot
        |  GROUP BY 1, 2, 3)
        |SELECT num.nk AS c_nationkey, num.seg AS c_mktsegment,
        |  CAST(num.n_c AS BIGINT) AS n_rows,
        |  CAST((1000000 * num.num)
        |    // ((m.m - 1) * (CAST(num.n_c AS HUGEINT) * ntot.n))
        |    AS BIGINT) AS emd_ppm,
        |  (CAST((1000000 * num.num)
        |    // ((m.m - 1) * (CAST(num.n_c AS HUGEINT) * ntot.n))
        |    AS BIGINT) > 200000) AS breach
        |FROM num, ntot, m
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,

    "q_atkinson" ->
      s"""WITH o AS (
         |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |    AS BIGINT) AS x
         |  FROM orders),
         |cells AS (
         |  SELECT COUNT(*) AS n_orders,
         |    CAST(SUM(CAST(x AS HUGEINT)) AS BIGINT) AS s,
         |    CAST(SUM(CAST(round(1000000.0 * ln(CAST(x AS DOUBLE)), 0)
         |      AS HUGEINT)) AS BIGINT) AS sl
         |  FROM o)
         |SELECT n_orders, s, sl, round($atkExpr, 6) AS atkinson
         |FROM cells""".stripMargin,

    "q_price_elasticity" ->
      s"""WITH q AS (
         |  SELECT l_partkey,
         |    SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
         |      AS qc
         |  FROM lineitem GROUP BY 1),
         |j AS (
         |  SELECT CAST(CAST(p.p_retailprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT) AS pc, q.qc
         |  FROM q JOIN part p ON q.l_partkey = p.p_partkey),
         |cells AS (
         |  SELECT COUNT(*) AS n_parts,
         |    SUM(CAST(round(1000000.0 * ln(CAST(pc AS DOUBLE)), 0)
         |      AS HUGEINT)) AS sx,
         |    SUM(CAST(round(1000000.0 * ln(CAST(qc AS DOUBLE)), 0)
         |      AS HUGEINT)) AS sy,
         |    SUM(CAST(round(1000000.0 * ln(CAST(pc AS DOUBLE))
         |      * ln(CAST(qc AS DOUBLE)), 0) AS HUGEINT)) AS sxy,
         |    SUM(CAST(round(1000000.0 * ln(CAST(pc AS DOUBLE))
         |      * ln(CAST(pc AS DOUBLE)), 0) AS HUGEINT)) AS sxx
         |  FROM j)
         |SELECT CAST(n_parts AS BIGINT) AS n_parts,
         |  round($slopeExpr, 6) AS elasticity
         |FROM cells""".stripMargin
  )
}
