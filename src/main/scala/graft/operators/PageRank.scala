package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration weighted PageRank with the arithmetic kept exact
  * (SURVEY §2.11 extension — iterative graph analytics beyond
  * [[Components]]' connected components; ranks sources/domains by the
  * link-ish structure a curation pipeline derives, e.g. who-supplies-whom
  * or who-cites-whom).
  *
  * The float formulation (`0.15/N + 0.85·Σ r/deg`) is not cross-engine
  * reproducible — partial-sum order changes the last ulp, and rank is fed
  * back through ITERATIONS, so ulps compound. Here rank is an integer
  * share of `total` (default 10^12 "pico-units") and every step is
  * integer arithmetic, identical in any engine:
  *
  *   r_0(v)     = total div N
  *   contrib(u→v) = (r_k(u) · w(u,v)) div W_out(u)
  *   D_k        = Σ r_k(u) over dangling u (no out-edges)
  *   r_{k+1}(v) = (total·(100−d)) div (100·N)
  *                + (d · (Σ contrib + D_k div N)) div 100
  *
  * Dangling-node mass is redistributed uniformly each iteration (the
  * standard teleport treatment) — without it, every sink drains its rank
  * from the system and the output sums well below `total` on graphs with
  * sinks. Floor losses (a few parts in 10^12 per step) are the price of
  * bit reproducibility — acceptable against PageRank's own damping noise.
  *
  * Scale posture: one out-weight aggregation up front; per iteration, one
  * key-partitioned join of the (node, rank) table to the edge list plus
  * one sum by destination — the standard distributed PageRank step, edges
  * never materialize on the driver. Rounds are `localCheckpoint`ed every
  * `checkpointEvery`-th iteration (not every round: each eager
  * checkpoint is a full job barrier, and on a fast graph the scheduler
  * latency of 10 barriers dominated the bench — measured 2× the quiet
  * envelope; between checkpoints the rounds stay one lazy composed plan,
  * so `ceil(iters/k)` barriers bound both lineage depth and job count),
  * with eager release of the superseded checkpoint (the [[Components]]
  * pattern — GC-deferred cleanup would retain O(iters/k) rank tables in
  * executor storage). Node count comes from ONE `count()` of the node dimension
  * (driver-side scalar, not a data collect). 64-bit bound: r·w stays
  * under 2^63 while `total · max(W_out)` does; past that (trillion-edge
  * graphs) route the product through DECIMAL(38,0) in both engines.
  */
object PageRank {

  /** @param edges (src: long, dst: long, w: long) weighted edge list
    * @param nodes (id: long) node dimension — rows with no in/out edges
    *              still receive the base rank
    * @return (id, rank_pico) — integer shares of `total`, summing to
    *         ~`total` minus floor losses (dangling mass is recycled, so
    *         this holds on sink-bearing graphs too)
    */
  def ranks(edges: DataFrame, nodes: DataFrame, iters: Int,
      total: Long = 1000000000000L, dampingPct: Int = 85,
      checkpointEvery: Int = 3): DataFrame =
    core(edges, nodes, seeds = None, iters, total, dampingPct,
      checkpointEvery)

  /** Personalized PageRank: teleport mass restarts at the SEED SET
    * instead of uniformly — the "rank relative to these nodes" form
    * (related-item discovery, seed-anchored influence). Same exact
    * integer recurrence as [[ranks]] with N replaced by |S| and the
    * teleport/dangling terms gated on seed membership:
    *
    *   r_0(v)     = [v ∈ S] · total div |S|
    *   r_{k+1}(v) = [v ∈ S] · (total·(100−d)) div (100·|S|)
    *                + (d · (Σ contrib + [v ∈ S] · D_k div |S|)) div 100
    *
    * Identical scale posture and checkpoint cadence as [[ranks]]; the
    * seed set joins as a broadcast membership flag (seed sets are
    * query-sized, not corpus-sized). */
  def personalizedRanks(edges: DataFrame, nodes: DataFrame,
      seeds: DataFrame, iters: Int, total: Long = 1000000000000L,
      dampingPct: Int = 85, checkpointEvery: Int = 3): DataFrame =
    core(edges, nodes, Some(seeds), iters, total, dampingPct,
      checkpointEvery)

  /** The one shared recurrence behind [[ranks]] and [[personalizedRanks]]
    * (RankOpsSpec pins that S = V reproduces the uniform result exactly,
    * and previously the checkpoint-cadence fix had to be hand-copied into
    * two bodies). `seeds = None` is the uniform path: the membership flag
    * is a literal `true` that constant-folds away, so no seed broadcast
    * and no extra join exist in the uniform plan; `Some(seeds)` joins the
    * (query-sized) seed set as a broadcast flag and gates the teleport
    * and dangling terms on it, with the teleport denominator = |S|. */
  private def core(edges: DataFrame, nodes: DataFrame,
      seeds: Option[DataFrame], iters: Int, total: Long,
      dampingPct: Int, checkpointEvery: Int): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100 &&
      checkpointEvery >= 1)
    val outW = edges.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val ew = edges.join(outW, Seq("src")).localCheckpoint()
    // dangling = nodes with no out-edges; a static vertex-sized set. When
    // it is empty (every node emits), the per-iteration dangling-mass
    // aggregate is pure overhead — one cheap static check skips it.
    val dangling = nodes.join(outW, col("id") === col("src"), "left_anti")
      .select(col("id").as("did")).localCheckpoint()
    val hasDangling = !dangling.isEmpty
    // Seed hygiene (ADVICE r9): a duplicate seed id would fan node rows
    // out through the membership join (duplicate output rows per node),
    // and ids absent from `nodes` would inflate the teleport denominator
    // — both silent corruptions. `distinct()` kills the fan-out, and the
    // denominator is counted from the FLAGGED frame (seeds ∩ nodes after
    // dedup), so stray ids change nothing.
    val flagged = seeds match {
      case Some(sds) => nodes
        .join(broadcast(sds.select(col("id").as("sid")).distinct()),
          col("id") === col("sid"), "left")
        .select(col("id"), col("sid").isNotNull.as("is_seed"))
        .localCheckpoint()
      case None => nodes.select(col("id"), lit(true).as("is_seed"))
    }
    val denom = seeds match {
      case Some(_) => flagged.filter(col("is_seed")).count()
      case None    => nodes.count()
    }
    require(denom > 0, "empty node/seed set (or no seed present in nodes)")
    val base = (total * (100 - dampingPct)) / (100L * denom)

    def releaseBlocks(df: DataFrame): Unit =
      df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }

    var cur = flagged.select(col("id"),
      when(col("is_seed"), lit(total / denom)).otherwise(0L).as("r"))
      .localCheckpoint()
    // the checkpoint currently anchoring `cur`'s lineage — only released
    // once a NEWER checkpoint has truncated the lineage above it
    var anchor = cur
    (1 to iters).foreach { i =>
      val inc = ew.join(cur, col("src") === col("id"))
        .select(col("dst"), expr("(r * w) div wout").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("inc"))
      val joined = flagged.join(inc, col("id") === col("dst"), "left")
      val next = if (hasDangling) {
        // this round's dangling mass: a 1-row aggregate, broadcast-attached
        val dmass = cur.join(dangling, col("id") === col("did"))
          .agg(coalesce(sum(col("r")), lit(0L)).as("dmass"))
        joined.crossJoin(broadcast(dmass))
          .select(col("id"),
            (when(col("is_seed"), lit(base)).otherwise(0L) +
              expr(s"($dampingPct * (coalesce(inc, CAST(0 AS BIGINT))" +
                s" + (CASE WHEN is_seed THEN dmass div $denom" +
                s" ELSE CAST(0 AS BIGINT) END))) div 100"))
              .as("r"))
      } else
        joined.select(col("id"),
          (when(col("is_seed"), lit(base)).otherwise(0L) +
            expr(s"($dampingPct * coalesce(inc, CAST(0 AS BIGINT))) div 100"))
            .as("r"))
      // materialization barrier only every k-th round (and the final
      // round, so the working frames below can be released eagerly); the
      // rounds in between compose lazily on the last checkpoint —
      // ceil(iters/k) barriers instead of iters.
      cur = if (i % checkpointEvery == 0 || i == iters) {
        val c = next.localCheckpoint()
        releaseBlocks(anchor)
        anchor = c
        c
      } else next
    }
    releaseBlocks(ew)
    releaseBlocks(dangling)
    seeds.foreach(_ => releaseBlocks(flagged))
    cur.select(col("id"), col("r").as("rank_pico"))
  }
}
