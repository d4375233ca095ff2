package graft

import org.apache.spark.sql.functions._
import graft.operators.KCore

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], k: Int,
      maxRounds: Int = 8): Map[Long, Long] =
    KCore.kCore(edges.toDF("u", "v"), k, maxRounds)
      .as[(Long, Long)].collect().toMap

  /** Reference peel: synchronous rounds to fixpoint on in-memory maps. */
  private def referenceCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var e = edges
    var done = false
    while (!done) {
      val deg = (e.map(_._1) ++ e.map(_._2)).groupBy(identity)
        .map { case (x, xs) => x -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val e2 = e.filter(p => keep(p._1) && keep(p._2))
      done = e2.size == e.size
      e = e2
    }
    (e.map(_._1) ++ e.map(_._2)).groupBy(identity)
      .map { case (x, xs) => x -> xs.size.toLong }
      .filter(_._2 >= k)
  }

  test("clique survives its own core; pendant chain peels away") {
    // K5 (every vertex degree 4) + a chain hung off vertex 1
    val clique = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val chain = Seq((1L, 10L), (10L, 11L), (11L, 12L))
    val core = run(clique ++ chain, k = 4)
    assert(core.keySet == Set(1L, 2L, 3L, 4L, 5L), s"got ${core.keySet}")
    assert(core.values.toSet == Set(4L), "every clique vertex has degree 4")
  }

  test("k-core equals the reference synchronous peel on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(600)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .distinct
    for (k <- Seq(2, 5, 9, 14))
      assert(run(edges, k, maxRounds = 50) == referenceCore(edges, k),
        s"k=$k diverges from reference peel")
  }

  test("bounded rounds are exactly R synchronous peels (the oracle " +
    "contract); convergence just makes later peels no-ops") {
    // chain 1-2-3-4-5-6-7: k=2 peels one endpoint pair per round
    val chain = (1L until 7L).map(i => (i, i + 1))
    // after ONE synchronous peel the endpoints are gone: edges 2..6 remain
    val one = run(chain, k = 2, maxRounds = 1)
    assert(one.keySet == Set(3L, 4L, 5L), s"got ${one.keySet}")
    // fixpoint: the whole chain dies; extra rounds change nothing
    assert(run(chain, k = 2, maxRounds = 8) ==
      run(chain, k = 2, maxRounds = 20))
    assert(run(chain, k = 2, maxRounds = 8).isEmpty)
  }
}
