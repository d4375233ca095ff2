package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Components

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side union-find oracle: min id per component. */
  private def unionFindLabels(nodes: Seq[Long],
      edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.foreach(find)
    edges.foreach { case (a, b) => union(a, b) }
    // path-compress to roots, which are component minima by construction
    (nodes ++ edges.flatMap(e => Seq(e._1, e._2))).distinct
      .map(n => n -> find(n)).toMap
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(
        edges.toDF("id_a", "id_b"), nodes.toDF("id"))
      .as[(Long, Long)].collect().toMap

  test("random graphs match a driver-side union-find (property)") {
    val gen = for {
      n <- Gen.choose(1, 60)
      nEdges <- Gen.choose(0, 90)
      edges <- Gen.listOfN(nEdges,
        Gen.zip(Gen.choose(0L, n.toLong - 1), Gen.choose(0L, n.toLong - 1)))
    } yield (n.toLong, edges)
    (0 until 12).foreach { i =>
      val (n, edges) = gen.apply(Gen.Parameters.default, Seed(7L + i)).get
      val nodes = 0L until n
      assert(run(nodes, edges) == unionFindLabels(nodes, edges),
        s"mismatch on seed ${7 + i}")
    }
  }

  test("larger random graph matches union-find (20k nodes, 30k edges)") {
    val rnd = new scala.util.Random(99)
    val n = 20000L
    val edges = Seq.fill(30000)(
      (rnd.nextLong(n), rnd.nextLong(n)))
    val nodes = 0L until n
    assert(run(nodes, edges) == unionFindLabels(nodes, edges))
  }

  test("high-degree hub (planted skew) contracts without incident") {
    // one hub connected to 5k spokes: the degenerate neighborhood the
    // large-star/small-star alternation exists to handle — a single
    // min-label round would funnel everything through one reducer key,
    // which is also what happens here, but bounded at min-aggregation
    // (map-side partial) rather than at a collect
    val edges = (1L to 5000L).map(i => (0L, i)) ++
      Seq((5000L, 5001L)) // chain off the last spoke
    val labels = run(0L to 5001L, edges)
    assert(labels.values.toSet == Set(0L))
  }

  test("long chain converges (log-round contraction, not diameter-bound)") {
    // a 200-node path has diameter 199: min-label propagation would need
    // ~200 rounds; star contraction must finish inside the default 25
    val edges = (0L until 199L).map(i => (i, i + 1))
    val labels = run(0L until 200L, edges)
    assert(labels.values.toSet == Set(0L))
  }

  test("isolated nodes label themselves; edge ids outside `nodes` survive") {
    val labels = run(Seq(1L, 2L, 3L, 10L), Seq((100L, 101L), (2L, 3L)))
    assert(labels == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 10L -> 10L,
      100L -> 100L, 101L -> 100L))
  }

  test("self-loops and duplicate/reversed edges are harmless") {
    val labels = run(Seq(1L, 2L, 3L),
      Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("superseded rounds release their checkpoint blocks") {
    // the chain needs several contraction rounds; without the release the
    // persistent-RDD census would grow by one edge-set copy per round
    // (and would also prove the LogicalRDD match silently stopped firing)
    val before = spark.sparkContext.getPersistentRDDs.size
    val edges = (0L until 199L).map(i => (i, i + 1))
    run(0L until 200L, edges)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 1,
      s"persisted RDDs grew $before -> $after: rounds are not releasing")
  }

  test("empty edge set labels every node itself") {
    val labels = run(Seq(5L, 6L), Seq.empty)
    assert(labels == Map(5L -> 5L, 6L -> 6L))
  }
}
