package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{BasketGraph, GraphArtifacts, PageRank, Similarity, TopK}
import graft.sources.Tables

/** Graph ranking + retrieval evaluation (SURVEY §2.11 extensions): exact
  * fixed-iteration PageRank over the nation trade graph, and the
  * recall/MRR harness that scores an approximate retriever against the
  * exact ranking — the measurement loop every ANN deployment needs.
  */
object RankOps extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  private val Iters = 5

  override def defs: Map[String, Q] = Map(
    // Weighted PageRank on the customer-nation → supplier-nation trade
    // graph (an edge per lineitem, collapsed to weighted nation pairs).
    // Five exact integer iterations — see operators/PageRank for why the
    // float recurrence cannot carry a cross-engine oracle.
    "q_pagerank" -> ((s, dir) => {
      // shared build-once trade rollup (GraphArtifacts) — one fact pass
      // feeds q_pagerank/q_ppr/q_hits
      val edges = GraphArtifacts.nationTradeEdges(s, dir)
      val nodes = t(s, dir, "nation").select(col("n_nationkey").as("id"))
      PageRank.ranks(edges, nodes, iters = Iters).orderBy(col("id"))
    }),

    // Personalized PageRank (round 9): teleport restarts at region-0
    // nations — "influence relative to these seeds" on the same trade
    // graph, same exact integer recurrence with N → |S| and the
    // teleport/dangling terms gated on seed membership.
    "q_ppr" -> ((s, dir) => {
      // shared build-once trade rollup (GraphArtifacts) — one fact pass
      // feeds q_pagerank/q_ppr/q_hits
      val edges = GraphArtifacts.nationTradeEdges(s, dir)
      val nation = t(s, dir, "nation")
      val nodes = nation.select(col("n_nationkey").as("id"))
      val seeds = nation.filter(col("n_regionkey") === 0)
        .select(col("n_nationkey").as("id"))
      PageRank.personalizedRanks(edges, nodes, seeds, iters = Iters)
        .orderBy(col("id"))
    }),

    // Retrieval-quality eval: the int8-dequantized cosine retriever's
    // top-20 scored against the exact cosine top-5 ground truth, per
    // probe — recall@5 plus MRR of the true nearest neighbor, both in
    // exact arithmetic (recall is a multiple of 1/5; MRR in integer
    // nano-units). Probes broadcast; both rankers prune through the
    // bounded TopK aggregator, never a global corpus window.
    "q_retrieval_eval" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val probes = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val qz = e
        .select(col("vec_id").as("id"), col("embedding").as("cv"),
          Similarity.int8Scale(col("embedding")).as("__s"))
        .select(col("id"),
          Similarity.int8Dequantize(
            Similarity.int8Quantize(col("cv"), col("__s")), col("__s"))
            .as("dq"))
      val cand = TopK.perGroup(
        qz.join(broadcast(probes), col("query_id") =!= col("id"))
          .withColumn("a", round(Similarity.cosine(col("qv"), col("dq")), 6)),
        Seq("query_id"), col("a"), col("id"), 20)
        .select(col("query_id"), col("id"), col("rank").cast("long")
          .as("crank"))
      val truth = TopK.perGroup(
        e.select(col("vec_id").as("id"), col("embedding").as("cv"))
          .join(broadcast(probes), col("query_id") =!= col("id"))
          .withColumn("sc", round(Similarity.cosine(col("qv"), col("cv")), 6)),
        Seq("query_id"), col("sc"), col("id"), 5)
        .select(col("query_id"), col("id"), col("rank").cast("long")
          .as("trank"))
      truth.join(cand, Seq("query_id", "id"), "left")
        .groupBy(col("query_id"))
        .agg(
          round(sum(when(col("crank").isNotNull && col("crank") <= 5, 1L)
              .otherwise(0L)).cast("double") / lit(5.0), 6).as("recall5"),
          expr("CAST(coalesce(1000000000 div " +
            "min(CASE WHEN trank = 1 THEN crank END), 0) AS BIGINT)")
            .as("mrr_nano"))
        .orderBy(col("query_id"))
    }),

    // Triangle count on the co-purchase graph (parts appearing in the
    // same order). Edges are oriented low-(degree, id) → high-(degree,
    // id), so each triangle is counted exactly once by the two-hop join
    // AND wedge fan-out is bounded on hub vertices: a vertex only fans
    // out to neighbors of equal-or-higher degree, giving the classical
    // O(m^1.5) wedge bound on power-law graphs (id orientation lets one
    // low-id hub generate O(deg²) wedges in a single join key — a skew
    // scale-killer). The degree table is vertex-sized (≪ edges) and
    // broadcasts; every subsequent join is an equi-join on a vertex key
    // (shuffle, never cartesian).
    "q_triangles" -> ((s, dir) => {
      // round 17 (r16 verdict #3): the edge legs and the out-adjacency
      // now read the PERSISTENT vertex-bucketed base
      // (operators/BucketedGraph) instead of the session-memo frames —
      // the s-keyed join leg and the adjacency build arrive
      // pre-partitioned on the bucket key (zero Exchange below the
      // adjacency aggregate, BucketedWedgeSpec). Round 15's per-edge
      // sorted-array intersection stands: |adjOut(s) ∩ adjOut(t)|
      // counts the triangles through oriented edge (s,t) exactly once,
      // the wedge frame — the term that explodes at 100 TB — never
      // materializes, and orientation bounds |nbrs| by O(√m) so the
      // per-edge intersection cost is skew-safe at hubs.
      val eS = graft.operators.BucketedGraph.edgesByS(s, dir)
      val adj = graft.operators.BucketedGraph.outAdjacency(s, dir)
      // round 17 (optimization): the per-edge neighborhood intersection
      // count runs through the native merge-scan kernel
      // (plans/SortedIntersectCountExpr — the adjacency arrays are sorted
      // and distinct by construction) instead of array_intersect's
      // per-row hash-set build; identical counts.
      val icount = org.apache.spark.sql.graft.ColumnBridge.column(
        graft.plans.SortedIntersectCountExpr(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("ns")),
          org.apache.spark.sql.graft.ColumnBridge.expression(col("nt"))))
      val tri = eS
        .join(adj.select(col("x").as("s"), col("nbrs").as("ns")), Seq("s"))
        .join(adj.select(col("x").as("t"), col("nbrs").as("nt")), Seq("t"))
        .select(icount.as("tw"))
        .agg(coalesce(sum(col("tw")), lit(0L)).as("n_triangles"))
      // |oriented edges| = |undirected edges| (the orientation is a
      // 1:1 relabeling), so the census reads the persistent table too
      eS.agg(count(lit(1)).as("n_edges")).crossJoin(tri)
    }),

    // Wedge census over the PERSISTENT vertex-bucketed edge tables
    // (round 16): the on-disk 100 TB graph layout exercised through a
    // gate — operators/BucketedGraph writes the oriented edge frame
    // once per corpus as two bucketed-and-sorted copies (by s, by t),
    // and this query joins them on t = s and aggregates per center
    // vertex with ZERO Exchange below the aggregate (both scan legs
    // arrive pre-partitioned on the join/group key —
    // BucketedWedgeSpec asserts it with broadcast disabled). Top-20
    // wedge centers by count — the hub readout a structural-risk
    // analysis reads. Oracle recomputes the oriented wedge census
    // from lineitem directly.
    "q_bucketed_wedges" -> ((s, dir) => {
      val eT = graft.operators.BucketedGraph.edgesByT(s, dir)
      val eS = graft.operators.BucketedGraph.edgesByS(s, dir)
      eT.as("e1")
        .join(eS.select(col("s").as("m"), col("t").as("w")).as("e2"),
          col("e1.t") === col("e2.m"))
        .groupBy(col("e1.t").as("center"))
        .agg(count(lit(1)).as("n_wedges"))
        .orderBy(col("n_wedges").desc, col("center"))
        .limit(20)
    }),

    // k-core decomposition (round 9) over the co-purchase graph: peel
    // vertices of degree < 60 for up to 8 synchronous rounds (the core
    // transition is steep on this graph — k=60 keeps a nonempty core at
    // every gate scale, 2 rounds to fixpoint; rounds are part of the
    // declared semantics, so the 8-round unrolled oracle matches whether
    // or not the peel converged). Output: core vertices + degree.
    "q_kcore" -> ((s, dir) => {
      // round 17: the peel starts from the persistent bucketed base —
      // the round-1 degree count reads the s-copy pre-partitioned
      // (KCore treats edges as undirected, so the oriented relabeling
      // of the same edge set peels identically); later rounds iterate
      // over the shrinking checkpointed survivor frames as before.
      val e0 = graft.operators.BucketedGraph.edgesByS(s, dir)
        .select(col("s").as("u"), col("t").as("v"))
      graft.operators.KCore.kCore(e0, k = 60, maxRounds = 8)
        .select(col("x"), col("d").cast("long").as("d"))
        .orderBy(col("x"))
    }),

    // Association rules over the same baskets: pair support, per-item
    // support, and lift in exact integer micro-units. The lift numerator
    // and denominator go through DECIMAL(38,0) products before the
    // integer division — support × corpus-size products overflow BIGINT
    // long before 100 TB. Item supports join as a vocab-sized broadcast;
    // the top-20 is a TakeOrderedAndProject, never a global sort.
    "q_basket_rules" -> ((s, dir) => {
      // shared capped membership (GraphArtifacts): every statistic
      // (corpus size, item supports, pair supports) derives from the
      // same dropped-whole basket set, built once per (session, corpus)
      val c0 = GraphArtifacts.coPurchaseItems(s, dir)
      val n = c0.agg(countDistinct(col("ok")).as("n"))
      val items = c0.groupBy(col("pk").as("i")).agg(count(lit(1)).as("c"))
      val pairs = BasketGraph.pairsOf(c0, "ok", "pk")
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("c2"))
        .filter(col("c2") >= 2)
      pairs
        .join(broadcast(items.select(col("i").as("u"), col("c").as("cu"))),
          Seq("u"))
        .join(broadcast(items.select(col("i").as("v"), col("c").as("cv"))),
          Seq("v"))
        .crossJoin(broadcast(n))
        .select(col("u"), col("v"), col("c2"), col("cu"), col("cv"),
          expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * c2 * n) div
                 (CAST(cu AS DECIMAL(38,0)) * cv) AS BIGINT)""")
            .as("lift_micro"))
        .orderBy(col("lift_micro").desc, col("u"), col("v"))
        .limit(20)
    }),

    // Item-item co-occurrence cosine (round 10): the collaborative-
    // filtering similarity behind "customers also bought" — items as
    // sets of baskets, cos(a,b) = co / √(n_a·n_b). The statistic stays
    // EXACT by squaring away the roots: cos²_micro = co²·10⁶ div
    // (n_a·n_b), a pure 128-bit-integer rational (monotone in cosine
    // since all terms are positive, so ranking by cos² IS ranking by
    // cosine). Same bounded pair machinery as q_basket_rules — per-
    // basket self-join, never item×item; counts-dim broadcasts; top-20
    // plans as TakeOrderedAndProject.
    "q_item_cosine" -> ((s, dir) => {
      val c0 = GraphArtifacts.coPurchaseItems(s, dir)
      val items = c0.groupBy(col("pk").as("i")).agg(count(lit(1)).as("c"))
      val pairs = BasketGraph.pairsOf(c0, "ok", "pk")
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("co"))
        .filter(col("co") >= 2)
      pairs
        .join(broadcast(items.select(col("i").as("u"), col("c").as("nu"))),
          Seq("u"))
        .join(broadcast(items.select(col("i").as("v"), col("c").as("nv"))),
          Seq("v"))
        .select(col("u"), col("v"), col("co"), col("nu"), col("nv"),
          expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * co * co) div
                 (CAST(nu AS DECIMAL(38,0)) * nv) AS BIGINT)""")
            .as("cos2_micro"))
        .orderBy(col("cos2_micro").desc, col("u"), col("v"))
        .limit(20)
    }),

    // Resource-allocation link prediction (round 10): score candidate
    // item links by Σ over shared baskets of 1/|basket| (Zhou et al.'s
    // RA index — the EXACT-arithmetic cousin of Adamic-Adar, whose log
    // would drown in cross-engine floats; here every term is the integer
    // 10⁶ div basket_size). A hub basket contributes little to each of
    // its pairs by construction — the degree discount that makes RA beat
    // raw co-occurrence at link prediction. Same bounded basket-pair
    // machinery; top-20 as TakeOrderedAndProject.
    "q_link_predict" -> ((s, dir) => {
      val c0 = GraphArtifacts.coPurchaseItems(s, dir)
      val bsz = c0.groupBy(col("ok")).agg(count(lit(1)).as("bs"))
      BasketGraph.pairsOf(c0, "ok", "pk")
        .join(bsz, Seq("ok"))
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("co"),
          sum(expr("1000000 div bs")).as("ra_micro"))
        .filter(col("co") >= 2)
        .orderBy(col("ra_micro").desc, col("u"), col("v"))
        .limit(20)
    }),

    // Bounded BFS (round 10): 3-hop breadth-first traversal from a seed
    // set over the co-purchase graph — the "related within k clicks"
    // primitive. Three unrolled frontier rounds, each one keyed semi-join
    // (neighbors of the frontier) + anti-joins against everything seen —
    // never a driver-side frontier, never a broadcast of a corpus-sized
    // set. Hop count is part of the declared semantics (the unrolled
    // oracle replays exactly 3 rounds).
    "q_bfs_hops" -> ((s, dir) => {
      val e0 = GraphArtifacts.coPurchaseEdges(s, dir)
      // round 17 (optimization): the symmetrized view is a NARROW union
      // over the checkpointed edge memo — re-deriving it per read is two
      // block-manager scans, so its own eager checkpoint was one full
      // edge-list copy (job + resident blocks) per invocation for
      // nothing. The frontier checkpoints switch to LAZY (eager=false):
      // lineage still truncates at each hop (the plan-explosion guard
      // this always was), each frontier still materializes exactly once
      // (persisted on first read), but the three standalone checkpoint
      // jobs collapse into the single readout action — 5 jobs → 1.
      val e = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
      val seeds = e.select(col("u").as("id")).distinct()
        .filter(col("id") < 10)
      def expand(frontier: DataFrame, seen: DataFrame): DataFrame =
        e.join(frontier.select(col("id").as("u")), Seq("u"), "left_semi")
          .select(col("v").as("id")).distinct()
          .join(seen, Seq("id"), "left_anti")
      val h1 = expand(seeds, seeds).localCheckpoint(eager = false)
      val s1 = seeds.unionAll(h1)
      val h2 = expand(h1, s1).localCheckpoint(eager = false)
      val s2 = s1.unionAll(h2)
      val h3 = expand(h2, s2).localCheckpoint(eager = false)
      def lvl(df: DataFrame, hop: Int) = df
        .agg(count(lit(1)).as("n"),
          coalesce(sum(col("id")), lit(0L)).as("id_sum"))
        .select(lit(hop).cast("long").as("hop"), col("n"), col("id_sum"))
      lvl(seeds, 0).unionByName(lvl(h1, 1))
        .unionByName(lvl(h2, 2)).unionByName(lvl(h3, 3))
        .orderBy(col("hop"))
    }),

    // Frequent 3-itemsets (round 10): the Apriori step past pair rules —
    // item triples co-occurring in ≥ 2 baskets, top-20 by support. The
    // triple explode is bounded per basket (C(|basket|, 3); TPC-H
    // baskets are ≤ 7 lines, so ≤ 35 triples each — and BasketGraph's
    // census cap bounds it at C(64, 3) even on a pathological basket)
    // and every join is a basket-keyed equi-join — candidate volume is
    // Σ C(nᵢ,3), never a cross of the item set.
    "q_itemsets3" -> ((s, dir) => {
      BasketGraph.triplesOf(GraphArtifacts.coPurchaseItems(s, dir),
          "ok", "pk")
        .groupBy(col("x"), col("y"), col("z"))
        .agg(count(lit(1)).as("support"))
        // no minimum-support cut: at larger scale factors co-occurrence
        // dilutes and a support ≥ 2 gate would return an empty (vacuous)
        // result — top-20 with the full deterministic tie order is the
        // scale-stable readout
        .orderBy(col("support").desc, col("x"), col("y"), col("z"))
        .limit(20)
    })
  )

  override def oracle: Map[String, String] = Map(
    // 8 unrolled synchronous peels — identical recurrence to the engine's
    // KCore loop (the q_pagerank unrolled-oracle pattern).
    "q_kcore" -> {
      val k = 60
      // every CTE MATERIALIZED: unmaterialized, DuckDB inlines e_{r-1}
      // into each of e_r's three references — exponential plan growth
      // that exhausts file handles on the base scan by round 8
      val rounds = (1 to 8).map { r =>
        s"""d$r AS MATERIALIZED (SELECT x, COUNT(*) AS d FROM (
           |  SELECT u AS x FROM e${r - 1}
           |  UNION ALL SELECT v FROM e${r - 1}) GROUP BY x),
           |k$r AS MATERIALIZED (SELECT x FROM d$r WHERE d >= $k),
           |e$r AS MATERIALIZED (SELECT u, v FROM e${r - 1}
           |  WHERE u IN (SELECT x FROM k$r)
           |    AND v IN (SELECT x FROM k$r))""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS MATERIALIZED (
         |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         |$rounds
         |SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM (
         |  SELECT u AS x FROM e8 UNION ALL SELECT v FROM e8)
         |GROUP BY x HAVING COUNT(*) >= $k ORDER BY x""".stripMargin
    },

    "q_pagerank" -> {
      val pre =
        """WITH e0 AS (
          |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
          |    COUNT(*) AS w
          |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          |  JOIN customer c ON o.o_custkey = c.c_custkey
          |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
          |  GROUP BY 1, 2),
          |ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wout
          |       FROM e0 GROUP BY 1),
          |e2 AS (SELECT e0.src, e0.dst, e0.w, ow.wout
          |       FROM e0 JOIN ow USING (src)),
          |n AS (SELECT n_nationkey AS id FROM nation),
          |r0 AS (SELECT id, 1000000000000 // (SELECT COUNT(*) FROM n) AS r
          |       FROM n)""".stripMargin
      val its = (1 to Iters).map { k =>
        s"""r$k AS (
           |  SELECT n.id,
           |    (1000000000000 * 15) // (100 * (SELECT COUNT(*) FROM n))
           |    + (85 * (COALESCE(SUM((p.r * e2.w) // e2.wout), 0)
           |             + (SELECT COALESCE(SUM(r), 0) FROM r${k - 1}
           |                WHERE id NOT IN (SELECT src FROM ow))
           |               // (SELECT COUNT(*) FROM n))) // 100 AS r
           |  FROM n LEFT JOIN e2 ON e2.dst = n.id
           |  LEFT JOIN r${k - 1} p ON p.id = e2.src
           |  GROUP BY n.id)""".stripMargin
      }
      (pre +: its).mkString(",\n") +
        s"\nSELECT id, CAST(r AS BIGINT) AS rank_pico FROM r$Iters ORDER BY id"
    },

    // the q_pagerank unroll with seed-gated teleport/dangling terms
    "q_ppr" -> {
      val pre =
        """WITH e0 AS (
          |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
          |    COUNT(*) AS w
          |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          |  JOIN customer c ON o.o_custkey = c.c_custkey
          |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
          |  GROUP BY 1, 2),
          |ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wout
          |       FROM e0 GROUP BY 1),
          |e2 AS (SELECT e0.src, e0.dst, e0.w, ow.wout
          |       FROM e0 JOIN ow USING (src)),
          |n AS (SELECT n_nationkey AS id FROM nation),
          |sd AS (SELECT n_nationkey AS id FROM nation WHERE n_regionkey = 0),
          |r0 AS (SELECT id, CASE WHEN id IN (SELECT id FROM sd)
          |    THEN 1000000000000 // (SELECT COUNT(*) FROM sd)
          |    ELSE 0 END AS r FROM n)""".stripMargin
      val its = (1 to Iters).map { k =>
        s"""r$k AS (
           |  SELECT n.id,
           |    (CASE WHEN n.id IN (SELECT id FROM sd)
           |       THEN (1000000000000 * 15)
           |         // (100 * (SELECT COUNT(*) FROM sd))
           |       ELSE 0 END)
           |    + (85 * (COALESCE(SUM((p.r * e2.w) // e2.wout), 0)
           |       + (CASE WHEN n.id IN (SELECT id FROM sd)
           |          THEN (SELECT COALESCE(SUM(r), 0) FROM r${k - 1}
           |                WHERE id NOT IN (SELECT src FROM ow))
           |            // (SELECT COUNT(*) FROM sd)
           |          ELSE 0 END))) // 100 AS r
           |  FROM n LEFT JOIN e2 ON e2.dst = n.id
           |  LEFT JOIN r${k - 1} p ON p.id = e2.src
           |  GROUP BY n.id)""".stripMargin
      }
      (pre +: its).mkString(",\n") +
        s"\nSELECT id, CAST(r AS BIGINT) AS rank_pico FROM r$Iters ORDER BY id"
    },

    "q_retrieval_eval" -> {
      def dot(x: String, y: String) =
        s"list_sum(list_transform(list_zip($x, $y), " +
          "s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))"
      def cos(a: String, b: String) =
        s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
      s"""WITH sc AS MATERIALIZED (
         |  SELECT vec_id, embedding,
         |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
         |      / 127 AS s
         |  FROM embeddings),
         |qz AS MATERIALIZED (
         |  SELECT vec_id AS id,
         |    list_transform(
         |      list_transform(embedding,
         |        x -> CASE WHEN s = 0 THEN CAST(0 AS TINYINT)
         |             ELSE CAST(round(CAST(x AS DOUBLE) / s) AS TINYINT) END),
         |      v -> CAST(v AS DOUBLE) * s) AS dq
         |  FROM sc),
         |probes AS MATERIALIZED (
         |  SELECT vec_id AS query_id, embedding AS qv
         |  FROM embeddings WHERE vec_id < 5),
         |cand AS (
         |  SELECT query_id, id, rn AS crank FROM (
         |    SELECT p.query_id, z.id,
         |      ROW_NUMBER() OVER (PARTITION BY p.query_id
         |        ORDER BY round(${cos("p.qv", "z.dq")}, 6) DESC, z.id) AS rn
         |    FROM qz z, probes p WHERE p.query_id != z.id) WHERE rn <= 20),
         |truth AS (
         |  SELECT query_id, id, rn AS trank FROM (
         |    SELECT p.query_id, e.vec_id AS id,
         |      ROW_NUMBER() OVER (PARTITION BY p.query_id
         |        ORDER BY round(${cos("p.qv", "e.embedding")}, 6) DESC,
         |          e.vec_id) AS rn
         |    FROM embeddings e, probes p WHERE p.query_id != e.vec_id)
         |  WHERE rn <= 5)
         |SELECT query_id,
         |  round(CAST(SUM(CASE WHEN c.crank IS NOT NULL AND c.crank <= 5
         |                 THEN 1 ELSE 0 END) AS DOUBLE) / 5.0, 6) AS recall5,
         |  CAST(COALESCE(1000000000 //
         |      MIN(CASE WHEN t.trank = 1 THEN c.crank END), 0) AS BIGINT)
         |    AS mrr_nano
         |FROM truth t LEFT JOIN cand c USING (query_id, id)
         |GROUP BY query_id ORDER BY query_id""".stripMargin
    },

    "q_triangles" ->
      """WITH e0 AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |deg AS (
        |  SELECT x, COUNT(*) AS d FROM (
        |    SELECT u AS x FROM e0 UNION ALL SELECT v AS x FROM e0)
        |  GROUP BY 1),
        |e AS (
        |  SELECT CASE WHEN (du.d, e0.u) < (dv.d, e0.v)
        |           THEN e0.u ELSE e0.v END AS s,
        |         CASE WHEN (du.d, e0.u) < (dv.d, e0.v)
        |           THEN e0.v ELSE e0.u END AS t
        |  FROM e0 JOIN deg du ON du.x = e0.u JOIN deg dv ON dv.x = e0.v)
        |SELECT (SELECT COUNT(*) FROM e0) AS n_edges,
        |  (SELECT COUNT(*) FROM e e1
        |   JOIN e e2 ON e2.s = e1.t
        |   JOIN e e3 ON e3.s = e1.s AND e3.t = e2.t) AS n_triangles"""
        .stripMargin,

    "q_bucketed_wedges" ->
      """WITH e0 AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |deg AS (
        |  SELECT x, COUNT(*) AS d FROM (
        |    SELECT u AS x FROM e0 UNION ALL SELECT v AS x FROM e0)
        |  GROUP BY 1),
        |e AS (
        |  SELECT CASE WHEN (du.d, e0.u) < (dv.d, e0.v)
        |           THEN e0.u ELSE e0.v END AS s,
        |         CASE WHEN (du.d, e0.u) < (dv.d, e0.v)
        |           THEN e0.v ELSE e0.u END AS t
        |  FROM e0 JOIN deg du ON du.x = e0.u JOIN deg dv ON dv.x = e0.v)
        |SELECT e1.t AS center, COUNT(*) AS n_wedges
        |FROM e e1 JOIN e e2 ON e2.s = e1.t
        |GROUP BY 1 ORDER BY n_wedges DESC, center LIMIT 20""".stripMargin,

    "q_basket_rules" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |n AS (SELECT COUNT(DISTINCT ok) AS n FROM li),
        |it AS (SELECT pk AS i, COUNT(*) AS c FROM li GROUP BY 1),
        |pr AS (SELECT a.pk AS u, b.pk AS v, COUNT(*) AS c2
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT pr.u, pr.v, pr.c2, cu.c AS cu, cv.c AS cv,
        |  CAST((CAST(1000000 AS HUGEINT) * pr.c2 * (SELECT n FROM n))
        |    // (CAST(cu.c AS HUGEINT) * cv.c) AS BIGINT) AS lift_micro
        |FROM pr JOIN it cu ON cu.i = pr.u JOIN it cv ON cv.i = pr.v
        |ORDER BY lift_micro DESC, u, v LIMIT 20""".stripMargin,

    "q_item_cosine" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |it AS (SELECT pk AS i, COUNT(*) AS c FROM li GROUP BY 1),
        |pr AS (SELECT a.pk AS u, b.pk AS v, COUNT(*) AS co
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT pr.u, pr.v, pr.co, cu.c AS nu, cv.c AS nv,
        |  CAST((CAST(1000000 AS HUGEINT) * pr.co * pr.co)
        |    // (CAST(cu.c AS HUGEINT) * cv.c) AS BIGINT) AS cos2_micro
        |FROM pr JOIN it cu ON cu.i = pr.u JOIN it cv ON cv.i = pr.v
        |ORDER BY cos2_micro DESC, u, v LIMIT 20""".stripMargin,

    "q_link_predict" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |b AS (SELECT ok, COUNT(*) AS bs FROM li GROUP BY 1),
        |pr AS (SELECT a.ok AS ok, a.pk AS u, c.pk AS v
        |       FROM li a JOIN li c ON a.ok = c.ok AND a.pk < c.pk)
        |SELECT u, v, COUNT(*) AS co,
        |  CAST(SUM(1000000 // bs) AS BIGINT) AS ra_micro
        |FROM pr JOIN b USING (ok) GROUP BY 1, 2
        |HAVING COUNT(*) >= 2
        |ORDER BY ra_micro DESC, u, v LIMIT 20""".stripMargin,

    "q_bfs_hops" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e0 AS MATERIALIZED (
        |  SELECT a.pk AS u, b.pk AS v FROM li a
        |  JOIN li b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2),
        |e AS MATERIALIZED (
        |  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        |seeds AS MATERIALIZED (
        |  SELECT DISTINCT u AS id FROM e WHERE u < 10),
        |h1 AS MATERIALIZED (
        |  SELECT DISTINCT v AS id FROM e
        |  WHERE u IN (SELECT id FROM seeds)
        |    AND v NOT IN (SELECT id FROM seeds)),
        |s1 AS MATERIALIZED (
        |  SELECT id FROM seeds UNION ALL SELECT id FROM h1),
        |h2 AS MATERIALIZED (
        |  SELECT DISTINCT v AS id FROM e
        |  WHERE u IN (SELECT id FROM h1)
        |    AND v NOT IN (SELECT id FROM s1)),
        |s2 AS MATERIALIZED (
        |  SELECT id FROM s1 UNION ALL SELECT id FROM h2),
        |h3 AS MATERIALIZED (
        |  SELECT DISTINCT v AS id FROM e
        |  WHERE u IN (SELECT id FROM h2)
        |    AND v NOT IN (SELECT id FROM s2))
        |SELECT * FROM (
        |  SELECT CAST(0 AS BIGINT) AS hop, COUNT(*) AS n,
        |    CAST(COALESCE(SUM(id), 0) AS BIGINT) AS id_sum FROM seeds
        |  UNION ALL SELECT CAST(1 AS BIGINT), COUNT(*),
        |    CAST(COALESCE(SUM(id), 0) AS BIGINT) FROM h1
        |  UNION ALL SELECT CAST(2 AS BIGINT), COUNT(*),
        |    CAST(COALESCE(SUM(id), 0) AS BIGINT) FROM h2
        |  UNION ALL SELECT CAST(3 AS BIGINT), COUNT(*),
        |    CAST(COALESCE(SUM(id), 0) AS BIGINT) FROM h3)
        |ORDER BY hop""".stripMargin,

    "q_itemsets3" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem)
        |SELECT a.pk AS x, b.pk AS y, c.pk AS z, COUNT(*) AS support
        |FROM li a
        |JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |JOIN li c ON a.ok = c.ok AND b.pk < c.pk
        |GROUP BY 1, 2, 3
        |ORDER BY support DESC, x, y, z LIMIT 20""".stripMargin
  )
}
