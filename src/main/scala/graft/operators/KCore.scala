package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition — the third iterative graph operator (after
  * [[PageRank]] and [[Components]]): iteratively peel vertices of degree
  * < k until none remain; what survives is the k-core, the standard
  * "dense enough to matter" subgraph for near-dup cluster triage and
  * co-purchase community mining.
  *
  * Distributed shape per round, all key-partitioned (no driver-side
  * graph, no broadcast of vertex sets — the survivor set is corpus-sized
  * and flows through shuffled semi-joins):
  *  1. degree = one union + one count agg over the edge list;
  *  2. survivors = degree ≥ k filter;
  *  3. edge restriction = two left-semi joins (u-side, v-side).
  * Each round `localCheckpoint`s the shrinking edge list (the
  * [[Components]] discipline: truncate the lineage, keep the iteration's
  * input materialized), releases the superseded round's checkpoint blocks
  * once the new one is materialized (the [[PageRank]] anchor/release
  * discipline — at most one edge-list copy resident), and the fixpoint
  * test is one count per round.
  *
  * ROUNDS ARE PART OF THE DECLARED SEMANTICS for oracle parity: with
  * `maxRounds` = R the result equals "R synchronous peels" — reaching
  * the true fixpoint earlier just makes the remaining peels no-ops, so
  * an R-round unrolled oracle matches the engine whether or not the
  * peel converged (the [[KMeansLloyd]]/[[PageRank]] fixed-recurrence
  * pattern). Convergence is still detected to stop early.
  *
  * Output: (x, d) — every k-core vertex with its within-core degree.
  */
object KCore {

  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    def degrees(e: DataFrame): DataFrame =
      e.select(col("u").as("x"))
        .unionAll(e.select(col("v").as("x")))
        .groupBy(col("x")).agg(count(lit(1)).as("d"))
    // ADVICE r9: each round's localCheckpoint pins an edge-list copy in
    // the block manager; without release, up to maxRounds corpus-sized
    // copies stay resident for the session. Adopt [[PageRank]]'s
    // anchor/release discipline: once e2.count() has MATERIALIZED the new
    // checkpoint (so nothing downstream can re-read the old one), drop
    // the superseded round's blocks.
    def releaseBlocks(df: DataFrame): Unit =
      df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    // Round 17 (optimization): the survivor count rides each checkpoint's
    // own materialization job via an Observation instead of a separate
    // count() action — one scheduler barrier per round instead of two
    // (the Components star-check discipline), identical peel.
    def checkpointCounted(df: DataFrame): (DataFrame, Long) = {
      val obs = org.apache.spark.sql.Observation()
      val ck = df.observe(obs, count(lit(1)).as("n")).localCheckpoint()
      (ck, obs.get("n").asInstanceOf[Long])
    }
    var (e, prev) = checkpointCounted(edges.select(col("u"), col("v")))
    var round = 0
    var converged = prev == 0L
    while (!converged && round < maxRounds) {
      val keep = degrees(e).filter(col("d") >= k).select(col("x"))
      val (e2, n) = checkpointCounted(e
        .join(keep.select(col("x").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("x").as("v")), Seq("v"), "left_semi"))
      releaseBlocks(e)
      converged = n == prev
      prev = n
      e = e2
      round += 1
    }
    // the final degree filter guards the not-yet-converged maxRounds cut:
    // vertices that WOULD be peeled next round still show d >= k edges
    // only if they genuinely do
    degrees(e).filter(col("d") >= k)
  }
}
