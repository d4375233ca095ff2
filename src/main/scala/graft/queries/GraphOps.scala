package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.GraphArtifacts
import graft.sources.Tables

/** Round-12 tranche 15: graph-structure metrics over the co-purchase
  * graph — degree assortativity (do high-degree parts co-purchase with
  * other hubs, or with the long tail? the single number behind
  * "hub-and-spoke vs core-periphery") and the average local clustering
  * coefficient (how much of each vertex's neighborhood is itself
  * connected — the per-vertex refinement of `q_triangles`' global
  * count). Together with pagerank/k-core/BFS/link-prediction these
  * complete the standard structural-profile toolkit.
  *
  * Determinism discipline: both statistics close from EXACT integer
  * cells — assortativity from the edge-level degree moments (4M·S₁ −
  * S₂² over 2M·S₃ − S₂², the Newman formula cleared of halves), LCC
  * from per-vertex triangle counts and degrees with the per-vertex ppm
  * floor documented. Trunc `div` ≡ HUGEINT `//` (assortativity CAN go
  * negative; both trunc toward zero).
  *
  * Scale posture: the BasketGraph census-capped edge build (oversized
  * baskets drop whole, observable) + the degree-oriented triangle join
  * (each wedge keyed by its smaller-degree endpoint — the q_triangles
  * skew discipline); degree tables are vertex-sized broadcasts; every
  * join is an equi-join. Envelope: S₂² ≤ (2·M·d_max)² — DECIMAL(38,0)
  * to M ≈ 10¹². */
object GraphOps extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  /** Distinct (order, part) membership — the shared basket frame. */
  private def li(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()

  override def defs: Map[String, Q] = Map[String, Q](

    // Degree assortativity r = (4M·S1 − S2²) / (2M·S3 − S2²) with
    // S1 = Σ_edges du·dv, S2 = Σ(du+dv), S3 = Σ(du²+dv²) — the Newman
    // edge-moment form with every ½ cleared, so the cells stay pure
    // integers. One capped edge build + two broadcast degree joins +
    // one aggregate.
    "q_assortativity" -> ((s, dir) => {
      val e0 = GraphArtifacts.coPurchaseEdges(s, dir)
      val deg = e0.select(col("u").as("x"))
        .unionAll(e0.select(col("v").as("x")))
        .groupBy(col("x")).agg(count(lit(1)).as("d"))
      val cells = e0
        .join(broadcast(deg.select(col("x").as("u"), col("d").as("du"))),
          Seq("u"))
        .join(broadcast(deg.select(col("x").as("v"), col("d").as("dv"))),
          Seq("v"))
        .agg(count(lit(1)).as("m"),
          sum((col("du") * col("dv")).cast(DecimalType(38, 0))).as("s1"),
          sum((col("du") + col("dv")).cast(DecimalType(38, 0))).as("s2"),
          sum((col("du") * col("du") + col("dv") * col("dv"))
            .cast(DecimalType(38, 0))).as("s3"))
      cells.select(col("m").as("n_edges"),
        expr("CAST(s1 AS BIGINT)").as("s1"),
        expr("CAST(s2 AS BIGINT)").as("s2"),
        expr("CAST(s3 AS BIGINT)").as("s3"),
        expr("""CAST((1000000 * (4 * m * s1 - s2 * s2))
          | div (2 * m * s3 - s2 * s2) AS BIGINT)"""
          .stripMargin.replaceAll("\\s+", " ")).as("r_ppm"))
    }),

    // Average local clustering coefficient: per-vertex triangle counts
    // from the degree-oriented triangle enumeration (each closed
    // triangle credits its THREE corners — one explode over the
    // triangle stream), LCC_x = 2t_x/(d_x(d_x−1)) in per-vertex-floored
    // ppm, averaged over the d ≥ 2 vertices (degree-1 vertices have no
    // possible wedge and are excluded on both engines). The mean is the
    // trunc div of the exact ppm sum — the q_silhouette readout shape.
    "q_clustering_coef" -> ((s, dir) => {
      // round 17 (r16 verdict #3): edges and out-adjacency read the
      // PERSISTENT bucketed base (operators/BucketedGraph) — the
      // s-keyed join leg arrives pre-partitioned and the adjacency is
      // the shared zero-Exchange build; degrees stay the vertex-sized
      // GraphArtifacts memo. Triangles come from per-edge sorted-array
      // intersection (the q_triangles rewrite — the wedge frame never
      // materializes). Corner credits in ONE generator pass: for edge
      // (s,t) with common out-neighbors W, s and t each earn |W| and
      // every w ∈ W earns 1 — the same triple-credit as exploding the
      // triangle stream, without a second pass or a checkpoint.
      val deg = GraphArtifacts.coPurchaseDegrees(s, dir)
      val adj = graft.operators.BucketedGraph.outAdjacency(s, dir)
      // round 17 (optimization): the common-neighbor set comes from the
      // native sorted merge-scan kernel (plans/SortedIntersectExpr) —
      // the adjacency arrays are sorted+distinct by construction, so the
      // result is the same SET as array_intersect without the per-row
      // hash-set build; downstream only aggregates per corner, so
      // element order is immaterial.
      val ws = org.apache.spark.sql.graft.ColumnBridge.column(
        graft.plans.SortedIntersectExpr(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("ns")),
          org.apache.spark.sql.graft.ColumnBridge.expression(col("nt"))))
      val tri = graft.operators.BucketedGraph.edgesByS(s, dir)
        .join(adj.select(col("x").as("s"), col("nbrs").as("ns")), Seq("s"))
        .join(adj.select(col("x").as("t"), col("nbrs").as("nt")), Seq("t"))
        .select(col("s"), col("t"), ws.as("ws"))
        .filter(size(col("ws")) > 0)
        .select(explode(concat(
          array(
            struct(col("s").as("x"),
              size(col("ws")).cast("long").as("c")),
            struct(col("t").as("x"),
              size(col("ws")).cast("long").as("c"))),
          transform(col("ws"),
            w => struct(w.as("x"), lit(1L).as("c"))))).as("sc"))
        .select(col("sc.x").as("x"), col("sc.c").as("c"))
        .groupBy(col("x")).agg(sum(col("c")).as("tx"))
      deg.filter(col("d") >= 2)
        .join(tri, Seq("x"), "left")
        .select(col("d"), coalesce(col("tx"), lit(0L)).as("tx"))
        .select(col("tx"),
          expr("(2000000 * tx) div (d * (d - 1))").as("lcc_ppm"))
        .agg(count(lit(1)).as("n_vertices"),
          sum(col("tx")).as("t3"),
          sum(col("lcc_ppm")).as("slcc"))
        .select(col("n_vertices"),
          expr("t3 div 3").as("n_triangles"),
          expr("slcc div n_vertices").as("avg_lcc_ppm"))
    }),

    // HITS hubs & authorities (round 13) over the DIRECTED nation trade
    // graph (customer nation → supplier nation, the q_pagerank edge
    // build): who initiates trade broadly (hub) vs who is traded INTO
    // broadly (authority) — the two-sided centrality PageRank's single
    // score conflates. Kleinberg's mutual recursion runs as 5 FIXED
    // rounds of pure integer arithmetic (the PageRank determinism
    // discipline): a ← Σ_in w·h then rescale to max 10⁶ by trunc div;
    // h ← Σ_out w·a' likewise — float normalization (L2) is not
    // cross-engine reproducible, max-rescale is. Envelope: Σw·10⁶ ≤
    // 10⁶·|lineitem| staged DECIMAL(38,0)/HUGEINT — exact to 10³² rows;
    // the rescaled scores are ≤ 10⁶ by construction. The node frame is
    // the 25-nation dim, so each round is one broadcast-scale join pair;
    // the oracle unrolls the identical 5 rounds (the q_pagerank
    // pattern).
    "q_hits" -> ((s, dir) => {
      // shared build-once trade rollup (GraphArtifacts, checkpointed)
      val e = GraphArtifacts.nationTradeEdges(s, dir)
      val nodes = t(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("id"))
      // round 17 (optimization): the original loop paid one EAGER
      // localCheckpoint job per half-step (10 scheduler barriers on
      // ≤25-row frames — ~2.4 s of the gate's 2.8 s), forced by the
      // max-rescale SCALAR SUBQUERY consuming each pre-rescale frame a
      // second time (without a materialization the subquery duplication
      // compounds exponentially across rounds — measured ×1.7 WORSE with
      // a 2-round checkpoint cadence). The rescale max now comes from a
      // WINDOW over the same frame instead: one inline single-partition
      // pass over ≤25 rows (bounded by the nation dim at ANY corpus
      // scale — the PlanSpec bounded-frame waiver class, see
      // q_tpch_q15), so there is no second consumer, no subquery, no
      // broadcast build, and no checkpoint: the whole 5-round recurrence
      // is ONE linear lazy plan executed by the readout action. The lazy
      // checkpoint on `a` only truncates lineage for the final a⋈h
      // readout (a's subtree would otherwise evaluate twice). Arithmetic
      // is untouched (bit-identical trajectory).
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
      var h = nodes.select(col("id"), lit(1000000L).as("hv"))
      var a = nodes.select(col("id"), lit(0L).as("av"))
      for (_ <- 1 to 5) {
        a = nodes.join(
          e.join(h.select(col("id").as("src"), col("hv")), Seq("src"))
            .groupBy(col("dst").as("id"))
            .agg(sum(col("w").cast(DecimalType(38, 0)) * col("hv"))
              .as("raw")), Seq("id"), "left")
          .select(col("id"), coalesce(col("raw"),
            lit(0L).cast(DecimalType(38, 0))).as("raw"))
          .withColumn("mx", max(col("raw")).over(wAll))
          .select(col("id"), expr("CAST((1000000 * raw) div mx AS BIGINT)")
            .as("av"))
          .localCheckpoint(eager = false)
        h = nodes.join(
          e.join(a.select(col("id").as("dst"), col("av")), Seq("dst"))
            .groupBy(col("src").as("id"))
            .agg(sum(col("w").cast(DecimalType(38, 0)) * col("av"))
              .as("raw")), Seq("id"), "left")
          .select(col("id"), coalesce(col("raw"),
            lit(0L).cast(DecimalType(38, 0))).as("raw"))
          .withColumn("mx", max(col("raw")).over(wAll))
          .select(col("id"), expr("CAST((1000000 * raw) div mx AS BIGINT)")
            .as("hv"))
      }
      a.join(h, Seq("id"))
        .select(col("id"), col("av").as("auth_ppm"),
          col("hv").as("hub_ppm"))
        .orderBy(col("id"))
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_assortativity" ->
      """WITH e0 AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |deg AS (
        |  SELECT x, COUNT(*) AS d FROM (
        |    SELECT u AS x FROM e0 UNION ALL SELECT v AS x FROM e0)
        |  GROUP BY 1),
        |cells AS (
        |  SELECT COUNT(*) AS m,
        |    SUM(CAST(du.d AS HUGEINT) * dv.d) AS s1,
        |    SUM(CAST(du.d AS HUGEINT) + dv.d) AS s2,
        |    SUM(CAST(du.d AS HUGEINT) * du.d
        |      + CAST(dv.d AS HUGEINT) * dv.d) AS s3
        |  FROM e0 JOIN deg du ON du.x = e0.u JOIN deg dv ON dv.x = e0.v)
        |SELECT CAST(m AS BIGINT) AS n_edges, CAST(s1 AS BIGINT) AS s1,
        |  CAST(s2 AS BIGINT) AS s2, CAST(s3 AS BIGINT) AS s3,
        |  CAST((1000000 * (4 * m * s1 - s2 * s2))
        |    // (2 * m * s3 - s2 * s2) AS BIGINT) AS r_ppm
        |FROM cells""".stripMargin,

    "q_clustering_coef" ->
      """WITH e0 AS MATERIALIZED (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |deg AS MATERIALIZED (
        |  SELECT x, COUNT(*) AS d FROM (
        |    SELECT u AS x FROM e0 UNION ALL SELECT v AS x FROM e0)
        |  GROUP BY 1),
        |e AS MATERIALIZED (
        |  SELECT CASE WHEN (du.d, e0.u) < (dv.d, e0.v)
        |           THEN e0.u ELSE e0.v END AS s,
        |         CASE WHEN (du.d, e0.u) < (dv.d, e0.v)
        |           THEN e0.v ELSE e0.u END AS t
        |  FROM e0 JOIN deg du ON du.x = e0.u JOIN deg dv ON dv.x = e0.v),
        |tri AS MATERIALIZED (
        |  SELECT corner.x, COUNT(*) AS tx
        |  FROM e e1
        |  JOIN e e2 ON e2.s = e1.t
        |  JOIN e e3 ON e3.s = e1.s AND e3.t = e2.t,
        |  LATERAL unnest([e1.s, e1.t, e2.t]) AS corner(x)
        |  GROUP BY 1),
        |lcc AS (
        |  SELECT COALESCE(tri.tx, 0) AS tx,
        |    (2000000 * COALESCE(tri.tx, 0)) // (deg.d * (deg.d - 1))
        |      AS lcc_ppm
        |  FROM deg LEFT JOIN tri ON tri.x = deg.x
        |  WHERE deg.d >= 2)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
        |  CAST(SUM(tx) // 3 AS BIGINT) AS n_triangles,
        |  CAST(SUM(lcc_ppm) // COUNT(*) AS BIGINT) AS avg_lcc_ppm
        |FROM lcc""".stripMargin,

    "q_hits" -> {
      // every round CTE is MATERIALIZED: each is referenced twice
      // (join + the MAX-rescale subquery), and DuckDB's default CTE
      // INLINING would re-expand the 4-table trade join 2^10 times —
      // measured as a hang even at sf0.001 (the q_clustering_coef
      // MATERIALIZED precedent)
      val pre =
        """WITH e AS MATERIALIZED (
          |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
          |    COUNT(*) AS w
          |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          |  JOIN customer c ON o.o_custkey = c.c_custkey
          |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
          |  GROUP BY 1, 2),
          |n AS MATERIALIZED (
          |  SELECT CAST(n_nationkey AS BIGINT) AS id FROM nation),
          |h0 AS (SELECT id, CAST(1000000 AS BIGINT) AS hv FROM n)"""
          .stripMargin
      val rounds = (1 to 5).map { k =>
        s"""ar$k AS MATERIALIZED (
           |  SELECT n.id, COALESCE(SUM(CAST(e.w AS HUGEINT) * p.hv), 0)
           |    AS raw
           |  FROM n LEFT JOIN e ON e.dst = n.id
           |  LEFT JOIN h${k - 1} p ON p.id = e.src
           |  GROUP BY 1),
           |a$k AS MATERIALIZED (
           |  SELECT id, CAST((1000000 * raw)
           |    // (SELECT MAX(raw) FROM ar$k) AS BIGINT) AS av
           |  FROM ar$k),
           |hr$k AS MATERIALIZED (
           |  SELECT n.id, COALESCE(SUM(CAST(e.w AS HUGEINT) * p.av), 0)
           |    AS raw
           |  FROM n LEFT JOIN e ON e.src = n.id
           |  LEFT JOIN a$k p ON p.id = e.dst
           |  GROUP BY 1),
           |h$k AS MATERIALIZED (
           |  SELECT id, CAST((1000000 * raw)
           |    // (SELECT MAX(raw) FROM hr$k) AS BIGINT) AS hv
           |  FROM hr$k)""".stripMargin
      }
      (pre +: rounds).mkString(",\n") +
        """
          |SELECT a5.id, a5.av AS auth_ppm, h5.hv AS hub_ppm
          |FROM a5 JOIN h5 USING (id) ORDER BY id""".stripMargin
    }
  )
}
