package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared, build-once graph artifacts (round 14 — the r13 verdict's
  * structural perf item).
  *
  * Nine gate queries consume the SAME two graphs — the part co-purchase
  * graph (q_triangles, q_clustering_coef, q_kcore, q_bfs_hops,
  * q_modularity, q_assortativity, q_link_predict, q_item_cosine,
  * q_basket_rules, q_itemsets3 share its capped membership) and the
  * nation trade graph (q_pagerank, q_ppr, q_hits) — yet each gate
  * rebuilt its frame from the fact table independently: ~40 s of
  * repeated edge builds per bench sweep, and at 100 TB ten redundant
  * corpus scans per analysis session.
  *
  * The 100 TB layout is write-once: the edge list is a BUCKETED TABLE
  * materialized by one job and read by every downstream analysis with
  * no exchange (the regime GraphBucketingSpec pins — bucketed writes
  * of both join sides let every degree/wedge join plan with zero
  * Exchange). In a single-session gate run the equivalent is a
  * per-(session, corpus) memoized `localCheckpoint`: the first gate
  * pays the one build, every later gate reads the materialized narrow
  * frame as a leaf. Same artifact economics, session-local.
  *
  * Semantics are IDENTICAL to the per-gate builds these replace — the
  * functions below delegate to the same [[BasketGraph]] construction
  * (census cap, dropped-whole baskets, distinct edges) and the same
  * fact→nation-pair rollup; only the redundant recomputation is gone.
  * Memoization is keyed by (applicationId, dir) so distinct corpora
  * and distinct Spark applications never share state, and a cached
  * entry from a stopped context is rebuilt, not reused.
  */
object GraphArtifacts {

  private val cache = new ConcurrentHashMap[(String, String, String), DataFrame]()

  private def memo(s: SparkSession, dir: String, kind: String)
      (build: => DataFrame): DataFrame = {
    // A/B switch for PERF.md: bypassing the memo reproduces the pre-r14
    // regime (every gate rebuilds its frame from the fact table), so the
    // artifact-reuse delta is measurable in one session. Never set by the
    // driver or the suite.
    if (sys.env.contains("SPARK_GRAFT_NO_GRAPH_MEMO")) return build
    val key = (s.sparkContext.applicationId, dir, kind)
    val cached = cache.get(key)
    if (cached != null && !cached.sparkSession.sparkContext.isStopped) cached
    else {
      val built = build // localCheckpointed by construction below
      cache.put(key, built)
      built
    }
  }

  /** Distinct (ok, pk) co-purchase membership, census-capped
    * ([[BasketGraph.cappedItems]] — oversized baskets dropped whole)
    * and checkpointed once per (session, corpus). Every basket-derived
    * statistic (pair supports, item supports, triples) reads this same
    * frame, so the whole family sees one consistent dropped-basket set. */
  def coPurchaseItems(s: SparkSession, dir: String): DataFrame =
    memo(s, dir, "items") {
      BasketGraph.cappedItems(
        graft.sources.Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct(),
        "ok", "pk")
    }

  /** Distinct undirected co-purchase edges (u, v), u < v, over
    * [[coPurchaseItems]] — built once, read as a two-column leaf by
    * every structural gate. */
  def coPurchaseEdges(s: SparkSession, dir: String): DataFrame =
    memo(s, dir, "edges") {
      BasketGraph.pairsOf(coPurchaseItems(s, dir), "ok", "pk")
        .select(col("u"), col("v")).distinct().localCheckpoint()
    }

  /** Weighted customer-nation → supplier-nation trade edges (src, dst,
    * w) — the lineitem⋈orders⋈customer⋈supplier rollup all three rank
    * gates (q_pagerank/q_ppr/q_hits) iterate over, built once. ≤ 625
    * rows at any corpus scale (nation² bound). */
  def nationTradeEdges(s: SparkSession, dir: String): DataFrame =
    memo(s, dir, "trade") {
      def t(name: String) = graft.sources.Tables.load(s, dir, name)
      t("lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(t("orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t("customer").select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(t("supplier").select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("w"))
        .localCheckpoint()
    }
}
