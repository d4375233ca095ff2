package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the clustering step
  * a dedup pipeline runs AFTER pair generation: near-duplicate PAIRS
  * (from MinHash/SimHash/embedding blocking) form a graph whose components
  * are the duplicate clusters; "keep one doc per cluster" is then a single
  * `component = id` filter (or a min_by over a quality score).
  *
  * Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
  * and Beyond", ACM SoCC 2014). Each round is two key-partitioned
  * aggregations + a self-join per star; the edge set contracts toward a
  * forest of stars centered at each component's minimum id in O(log n)
  * rounds — no driver-side graph state, no per-node iteration proportional
  * to graph diameter (a plain min-label propagation needs O(diameter)
  * rounds; a 100 TB web-ish graph can have diameter in the hundreds).
  *
  * Scale shape per round: one `groupBy(u).min(v)` (map-side partial min),
  * one co-partitioned join back on `u` (same key → AQE reuses the
  * exchange), one `distinct` to keep the edge multiset from ballooning.
  * The intermediate edge set is `localCheckpoint`ed every round: iterative
  * plans otherwise nest exponentially and re-execute from the source.
  * Skewed high-degree centers are exactly what the alternation handles —
  * large-star hangs big neighborhoods off the minimum, small-star
  * flattens them.
  *
  * Reference behavior: the reference engine has no graph operator; this is
  * part of the LLM-pipeline surface (dedup clustering) built Spark-first.
  */
object Components {

  /** (id, component) for every node in `nodes`, where `component` is the
    * SMALLEST node id reachable from `id` over undirected `edges`.
    * Isolated nodes (in `nodes` but no edge) label themselves.
    *
    * @param edges two-column DataFrame of undirected edges (any names;
    *              the first two columns are used); self-loops and nulls
    *              are dropped.
    * @param nodes one-column DataFrame of node ids (duplicates fine) —
    *              the label universe; edge endpoints outside it are
    *              still labeled (union semantics).
    * @param maxRounds safety bound on star rounds; the algorithm
    *                  converges in O(log n) (~20 covers 2^20 components
    *                  of any size) — exceeding it throws rather than
    *                  returning a half-contracted labeling.
    */
  def connectedComponents(edges: DataFrame, nodes: DataFrame,
      maxRounds: Int = 25): DataFrame = {
    val ec = edges.columns
    require(ec.length >= 2, "edges needs two columns")
    val e0 = edges
      .select(col(ec(0)).cast("long").as("u"), col(ec(1)).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      // canonical small→large, deduped: the star rounds re-derive
      // direction themselves, but starting deduped keeps round 1 honest
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()

    val nc = nodes.columns
    val nodeIds = nodes.select(col(nc(0)).cast("long").as("id"))
      .filter(col("id").isNotNull).distinct()

    // Fixpoint = the canonical (u, v) edge set is a forest of rooted
    // stars, tested DIRECTLY on the round that produces it (comparing
    // round signatures instead would burn one extra full contraction
    // round just to observe "no change"). Star forest ⇔
    //   (a) every member points to exactly one center: each v occurs once
    //   (b) centers are never members: distinct(u) ∩ distinct(v) = ∅
    // (⇐) stars are a fixpoint of both stars by inspection. (⇒) if some v
    // repeats — edges (m1,x),(m2,x) — small-star rewires (m2 → m1), and
    // if some node is center and member both, large-star collapses it; so
    // any non-star set still changes, and the alternation provably ends
    // in rooted stars (Kiveris et al. §3). Both conditions fold into ONE
    // aggregation over the (tiny, checkpointed) contracted set: per node,
    // its v-occurrences and total occurrences — a violation is a node
    // seen as member (vc ≥ 1) that is either a member twice (vc > 1) or
    // also a center (tot > vc).
    // Round 17 (optimization): the star check used to run as its OWN
    // aggregation job over the just-checkpointed round (2 scheduler
    // barriers per round; on the LSH/ε-graph gates the contracted set is
    // tiny after round 1, so the barriers WERE the cost). It now rides
    // the checkpoint's materialization job: the round output is lazily
    // materialized once, the violating nodes (member twice, or member ∧
    // center) are joined back as a per-edge flag — keyed on the member
    // endpoint, ≤1 match per edge, no fan-out — and an Observation
    // counts edges and flagged edges during the ONE eager checkpoint.
    // Same fixpoint test on the same round output, half the barriers;
    // at scale the annotation join reads the same bytes the separate
    // check pass read. The checkpoint itself stores only (u, v) — the
    // flag is projected away below it.
    def checkpointWithStarCheck(e: DataFrame): (DataFrame, Boolean) = {
      val r = e.localCheckpoint(eager = false)
      val viol = r.select(col("v").as("id"), lit(1L).as("m"))
        .unionAll(r.select(col("u").as("id"), lit(0L).as("m")))
        .groupBy(col("id"))
        .agg(sum(col("m")).as("vc"), count(lit(1)).as("tot"))
        .filter(col("vc") >= 1 &&
          (col("vc") > 1 || col("tot") > col("vc")))
        .select(col("id").as("__vv"), lit(1L).as("__viol"))
      val obs = org.apache.spark.sql.Observation()
      val ck = r.join(viol, col("v") === col("__vv"), "left")
        .observe(obs, count(lit(1)).as("n"),
          sum(col("__viol")).as("nv"))
        .select(col("u"), col("v"))
        .localCheckpoint()
      releaseBlocks(r)
      val nEdges = obs.get("n").asInstanceOf[Long]
      val nViol = Option(obs.get("nv")).map(_.asInstanceOf[Long])
        .getOrElse(0L)
      (ck, nEdges == 0L || nViol == 0L)
    }

    // Release each superseded round's checkpoint blocks as soon as the
    // next round has materialized — waiting for driver GC (the
    // ContextCleaner default) would retain O(rounds) copies of the edge
    // set in executor storage, a real hazard on a 100 TB-scale graph.
    // Only the FINAL round's blocks stay pinned: the returned plan reads
    // them (and by then the set is a contracted star forest).
    def releaseBlocks(df: DataFrame): Unit =
      df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }

    var (cur, converged) = checkpointWithStarCheck(e0)
    var round = 0
    while (!converged && round < maxRounds) {
      val (next, isStar) = checkpointWithStarCheck(smallStar(largeStar(cur)))
      releaseBlocks(cur)
      converged = isStar
      cur = next
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds")

    // At the fixpoint the canonical (u, v) edges are (center, member)
    // stars with u = the component minimum; min() is belt-and-braces for
    // the final round.
    val labeled = cur.select(col("v").as("id"), col("u").as("component"))
      .union(cur.select(col("u").as("id"), col("u").as("component")))
      .groupBy(col("id")).agg(min(col("component")).as("component"))
    nodeIds.join(labeled, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("component"))
  }

  /** m(u) = min(Γ(u) ∪ {u}); connect every LARGER neighbor to it:
    * emit (v, m) for v ∈ Γ(u), v > u. Works on the symmetrized view so
    * every node sees its full neighborhood. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val m = sym.groupBy(col("u"))
      .agg(min(col("v")).as("__mn"))
      .select(col("u"), least(col("u"), col("__mn")).as("m"))
    // No distinct here: smallStar canonicalizes and dedups its own output,
    // and duplicate edges don't perturb its min-aggregation — dropping the
    // shuffle halves the per-round stage count for a bounded (≤2|E|)
    // intermediate.
    sym.join(m, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
  }

  /** Direct each edge large→small; m(u) = min of u's smaller neighbors;
    * connect u and every other smaller neighbor to m: emit (u, m) and
    * (v, m) for v ∈ Γ⁻(u) \ {m}. Output is canonical (v < u). */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
    val m = dir.groupBy(col("u")).agg(min(col("v")).as("m"))
    dir.join(m, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .union(m.select(col("u"), col("m").as("v")))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()
      .select(col("v").as("u"), col("u").as("v")) // back to (small, large)
  }
}
