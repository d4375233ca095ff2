package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank
import graft.queries.RankOps

class RankOpsSpec extends SparkSpec {
  import spark.implicits._

  private def cycle(n: Int) = {
    val edges = (0L until n).map(i => (i, (i + 1) % n, 1L))
      .toDF("src", "dst", "w")
    val nodes = (0L until n).toDF("id")
    (edges, nodes)
  }

  test("pagerank: symmetric cycle gives every node the identical rank") {
    val (edges, nodes) = cycle(8)
    val r = PageRank.ranks(edges, nodes, iters = 5)
      .select(col("rank_pico")).as[Long].collect().toSet
    assert(r.size == 1, s"cycle must be rank-uniform, got $r")
  }

  test("pagerank: mass is conserved up to floor losses") {
    val (edges, nodes) = cycle(8)
    val total = PageRank.ranks(edges, nodes, iters = 5)
      .agg(sum(col("rank_pico"))).as[Long].head()
    // each of 5 iterations loses < 100·N pico-units to integer floors
    assert(total <= 1000000000000L && total > 1000000000000L - 5 * 100 * 8,
      s"total $total")
  }

  test("pagerank: checkpoint cadence never changes the result") {
    // the every-k-rounds barrier is pure scheduling — rank values must be
    // bit-identical whether every round, every 3rd, or none checkpoint
    val edges = Seq((0L, 1L, 2L), (1L, 2L, 1L), (2L, 0L, 3L), (2L, 3L, 1L))
      .toDF("src", "dst", "w")
    val nodes = (0L to 4L).toDF("id") // node 4 isolated, node 3 dangling
    def run(k: Int) = PageRank.ranks(edges, nodes, iters = 7,
      checkpointEvery = k).as[(Long, Long)].collect().toMap
    val every = run(1)
    assert(every == run(3) && every == run(100),
      s"cadence changed ranks: ${run(3)} vs $every")
  }

  test("pagerank: a node every edge points at outranks the spokes") {
    // star: 0..6 -> 7 plus 7 -> 0 (no dangling node)
    val edges = ((0L until 7).map(i => (i, 7L, 1L)) :+ ((7L, 0L, 1L)))
      .toDF("src", "dst", "w")
    val nodes = (0L to 7L).toDF("id")
    val r = PageRank.ranks(edges, nodes, iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(r(7L) > r(0L) && (1L to 6L).forall(i => r(7L) > r(i)),
      s"hub must dominate: $r")
  }

  test("pagerank: dangling mass is recycled — sink graphs conserve mass") {
    // chain 0→1→2→3 where 3 is a pure sink: without per-iteration dangling
    // redistribution, 3 drains rank from the system every round and the
    // total decays far below `total`
    val edges = Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L))
      .toDF("src", "dst", "w")
    val nodes = (0L to 3L).toDF("id")
    val out = PageRank.ranks(edges, nodes, iters = 5)
      .as[(Long, Long)].collect().toMap
    val total = out.values.sum
    // floor losses only: a handful of integer divisions per node per round
    assert(total <= 1000000000000L && total > 1000000000000L - 5 * 1000 * 4,
      s"sink graph must conserve mass, got $total")
    // the sink still outranks the head of the chain (it receives 2's vote)
    assert(out(3L) > out(0L), s"sink must outrank the source: $out")
  }

  test("pagerank: result is partitioning-invariant (integer arithmetic)") {
    val (edges, nodes) = cycle(11)
    val skewed = edges.repartition(7)
    val a = PageRank.ranks(edges, nodes, iters = 4)
      .as[(Long, Long)].collect().sortBy(_._1)
    val b = PageRank.ranks(skewed, nodes, iters = 4)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("pagerank: weight asymmetry shifts rank toward the heavy target") {
    // 0 splits its vote 9:1 between 1 and 2; 1,2 return to 0
    val edges = Seq((0L, 1L, 9L), (0L, 2L, 1L), (1L, 0L, 1L), (2L, 0L, 1L))
      .toDF("src", "dst", "w")
    val nodes = (0L to 2L).toDF("id")
    val r = PageRank.ranks(edges, nodes, iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(r(1L) > r(2L), s"9:1 edge weights must rank 1 over 2: $r")
  }

  test("retrieval eval: gate query reports full recall on most probes") {
    // int8 quantization barely perturbs the ranking at 64 dims — the gate
    // result should be recall5 ≥ 0.8 and a found true-NN for every probe
    val out = RankOps.defs("q_retrieval_eval")(spark, sf)
      .as[(Long, Double, Long)].collect()
    assert(out.length == 5)
    out.foreach { case (q, recall, mrr) =>
      assert(recall >= 0.8, s"probe $q recall $recall")
      assert(mrr > 0L, s"probe $q true NN absent from candidate top-20")
    }
  }

  test("personalized pagerank degenerates to uniform pagerank when the " +
    "seed set is every node; seeds outrank non-seeds on a cycle") {
    val (edges, nodes) = cycle(8)
    val uniform = PageRank.ranks(edges, nodes, iters = 5)
      .as[(Long, Long)].collect().toMap
    val allSeeds = PageRank.personalizedRanks(edges, nodes, nodes, iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(uniform == allSeeds,
      "S = V must reproduce the uniform recurrence exactly")
    // single seed on the cycle: rank decays with distance from the seed
    val oneSeed = PageRank.personalizedRanks(edges, nodes,
        Seq(0L).toDF("id"), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(oneSeed(0L) > oneSeed(4L),
      s"seed should outrank the antipode: $oneSeed")
    assert(oneSeed(1L) > oneSeed(4L),
      "mass should decay along the cycle away from the seed")
  }

  test("personalized pagerank: duplicate seed ids and ids absent from " +
    "nodes change nothing (ADVICE r9 seed hygiene)") {
    val (edges, nodes) = cycle(8)
    val clean = PageRank.personalizedRanks(edges, nodes,
        Seq(0L, 3L).toDF("id"), iters = 5)
      .as[(Long, Long)].collect()
    // duplicates would fan out node rows + inflate the teleport
    // denominator; stray ids (99, 100) would inflate it too
    val dirty = PageRank.personalizedRanks(edges, nodes,
        Seq(0L, 0L, 3L, 3L, 3L, 99L, 100L).toDF("id"), iters = 5)
      .as[(Long, Long)].collect()
    assert(dirty.length == clean.length, "seed fan-out duplicated node rows")
    assert(dirty.toMap == clean.toMap,
      "dirty seed set must yield the identical ranks")
    // a seed set with NO id present in nodes must fail loudly, not
    // divide by a phantom denominator
    intercept[IllegalArgumentException] {
      PageRank.personalizedRanks(edges, nodes,
        Seq(99L).toDF("id"), iters = 2).collect()
    }
  }
}
