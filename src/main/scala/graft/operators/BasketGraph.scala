package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Census-capped co-occurrence construction over "baskets" (any grouping
  * key whose member set fans out combinatorially: order → parts,
  * user → segments). The per-basket self-join behind co-purchase edges is
  * C(|basket|, 2) pairs per basket — tiny on TPC-H's ≤ 7-line orders,
  * combinatorial on a skewed real-world basket (one 10⁴-item basket is
  * 5·10⁷ pairs in a single join key; the triple build is 1.7·10¹¹). This
  * is the same skew class the LSH buckets ([[Dedup.minhashPairs]]) and
  * entity-resolution blocks ([[EntityResolution.blockedMatch]]) already
  * cap, applied to the basket-graph family:
  *
  *  - a basket-size census (one basket-keyed count, partial-aggregated
  *    map-side) identifies baskets over `maxBasket` members;
  *  - oversized baskets are dropped WHOLE — a 10⁴-item basket is a
  *    crawler cart or a batch import, not co-purchase signal, and keeping
  *    a truncated prefix would bias every pair statistic toward low item
  *    ids. The drop is pure parallelism control at gate scale (TPC-H's
  *    max basket is 7 lines, far under [[DefaultMaxBasket]]), never
  *    semantics — the capped build is spec-pinned equal to the uncapped
  *    one whenever no basket exceeds the cap;
  *  - the dropped-basket count is observable in-flight via `drops`
  *    (metric `dropped_baskets`, readable after the action — the
  *    [[Dedup]] / [[EntityResolution]] observable-drop discipline);
  *  - the heavy-basket list is ≤ |baskets over cap| rows and broadcasts
  *    to the anti-join; with the cap in force one task emits at most
  *    `maxBasket`²/2 pairs (`maxBasket`³/6 triples) per basket.
  *
  * Callers pass a DISTINCT (basket, item) frame — the census counts rows,
  * so duplicate membership rows would count against the cap.
  */
object BasketGraph {

  /** Default membership cap: 64 items per basket admits ≤ 2,016 pairs /
    * ≤ 41,664 triples per basket — bounded task output — while sitting an
    * order of magnitude above TPC-H's 7-line maximum, so every gate query
    * is bit-identical with or without the cap. */
  val DefaultMaxBasket = 64

  /** (basket, item) rows with baskets over `maxBasket` members dropped
    * whole; `drops` observes the dropped-basket count (the observation
    * rides a localCheckpoint of the tiny heavy-basket list so it fires
    * exactly once even when the result is self-joined).
    *
    * Semi-eager (round 12, the [[graft.operators.Dedup.jaccardSelfJoin]]
    * `ordered` precedent): the capped frame itself is `localCheckpoint`ed
    * because every consumer in the family self-joins it 2–3 ways — without
    * the checkpoint the census + anti-join subtree (one full scan + one
    * basket-keyed aggregate) re-runs on EACH side of the pair/triple join,
    * which is exactly the ×1.5–1.9 regression the round-10 cap introduced
    * across q_triangles/q_kcore/q_bfs_hops/q_basket_rules. The
    * checkpointed frame is two narrow id columns (never text/payload), so
    * materializing it is cheap at any scale and the downstream joins read
    * it as a leaf. */
  def cappedItems(items: DataFrame, basket: String, item: String,
      maxBasket: Int = DefaultMaxBasket,
      drops: Option[Observation] = None): DataFrame = {
    require(maxBasket > 1, s"maxBasket must admit at least one pair, got $maxBasket")
    val census = items.groupBy(col(basket))
      .agg(count(lit(1)).as("__bs"))
      .filter(col("__bs") > maxBasket)
      .select(col(basket))
    // the observation still binds to its own checkpoint of the heavy list
    // (an Observation binds to one Dataset and must fire exactly once)
    val heavy = drops.fold(census)(o =>
      census.observe(o, count(lit(1)).as("dropped_baskets")).localCheckpoint())
    items.join(broadcast(heavy), Seq(basket), "left_anti").localCheckpoint()
  }

  /** Per-basket ordered member pairs (basket, u, v) with u < v, oversized
    * baskets dropped whole. One shuffle on the basket key (census and
    * self-join share it). */
  def pairs(items: DataFrame, basket: String, item: String,
      maxBasket: Int = DefaultMaxBasket,
      drops: Option[Observation] = None): DataFrame =
    pairsOf(cappedItems(items, basket, item, maxBasket, drops), basket, item)

  /** Pair join over an ALREADY-capped (basket, item) frame — use after
    * [[cappedItems]] when the capped membership is also needed elsewhere
    * (basket sizes, per-item dims) so the census applies once and every
    * derived statistic sees the same dropped-whole basket set. */
  def pairsOf(c: DataFrame, basket: String, item: String): DataFrame =
    c.as("a").join(c.as("b"),
        col(s"a.$basket") === col(s"b.$basket") &&
          col(s"a.$item") < col(s"b.$item"))
      .select(col(s"a.$basket").as(basket),
        col(s"a.$item").as("u"), col(s"b.$item").as("v"))

  /** Distinct undirected co-occurrence edges (u, v) with u < v.
    *
    * Checkpointed like [[cappedItems]]: every graph consumer reads the
    * edge list several times (q_triangles: degree build + three oriented
    * copies + the edge count = 5 passes; q_modularity: label join + edge
    * mass), and without the checkpoint each pass re-runs the pair
    * self-join + distinct — two corpus shuffles apiece. The edge list is
    * two ids bounded by |vocab|² (and in practice by Σ C(basketᵢ, 2) ≪
    * the pair stream), so materializing it is cheap; the pair STREAM is
    * deliberately never checkpointed — it exists to flow straight into
    * an aggregate. */
  def edges(items: DataFrame, basket: String, item: String,
      maxBasket: Int = DefaultMaxBasket,
      drops: Option[Observation] = None): DataFrame =
    pairs(items, basket, item, maxBasket, drops)
      .select(col("u"), col("v")).distinct().localCheckpoint()

  /** Per-basket ordered member triples (basket, x, y, z) with x < y < z —
    * the Apriori-3 candidate stream. C(`maxBasket`, 3) bounded per
    * basket. */
  def triples(items: DataFrame, basket: String, item: String,
      maxBasket: Int = DefaultMaxBasket,
      drops: Option[Observation] = None): DataFrame =
    triplesOf(cappedItems(items, basket, item, maxBasket, drops),
      basket, item)

  /** Triple join over an ALREADY-capped frame (the [[pairsOf]] twin) —
    * lets a shared capped membership ([[GraphArtifacts]]) feed the
    * Apriori-3 stream without re-running the census. */
  def triplesOf(c: DataFrame, basket: String, item: String): DataFrame = {
    c.as("a")
      .join(c.as("b"),
        col(s"a.$basket") === col(s"b.$basket") &&
          col(s"a.$item") < col(s"b.$item"))
      .join(c.as("c"),
        col(s"a.$basket") === col(s"c.$basket") &&
          col(s"b.$item") < col(s"c.$item"))
      .select(col(s"a.$basket").as(basket), col(s"a.$item").as("x"),
        col(s"b.$item").as("y"), col(s"c.$item").as("z"))
  }
}
