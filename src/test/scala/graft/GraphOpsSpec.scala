package graft

import org.apache.spark.sql.functions._

/** Semantics for the graph-structure tranche ([[graft.queries.GraphOps]]):
  * a from-scratch adjacency-set replay of both metrics — degrees, edge
  * moments, per-vertex triangle counts via neighbor-set intersection —
  * independent of the distributed degree-oriented join, plus the
  * metrics' structural ranges and the LCC⇄triangles consistency law.
  */
class GraphOpsSpec extends SparkSpec {

  private def graph(): (Array[(Long, Long)], Map[Long, Set[Long]]) = {
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet.toArray
    val adj = (edges.map(e => e._1 -> e._2) ++
      edges.map(e => e._2 -> e._1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    (edges, adj)
  }

  test("q_assortativity equals the direct edge-moment replay and " +
      "r_ppm sits in [-1e6, 1e6]") {
    val (edges, adj) = graph()
    val m = edges.length.toLong
    val s1 = edges.map(e =>
      BigInt(adj(e._1).size.toLong) * adj(e._2).size).sum
    val s2 = edges.map(e =>
      BigInt(adj(e._1).size.toLong) + adj(e._2).size).sum
    val s3 = edges.map(e =>
      BigInt(adj(e._1).size.toLong) * adj(e._1).size +
        BigInt(adj(e._2).size.toLong) * adj(e._2).size).sum
    val row = SparkEntry.queries("q_assortativity")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n_edges") == m)
    assert(BigInt(row.getAs[Long]("s1")) == s1)
    assert(BigInt(row.getAs[Long]("s2")) == s2)
    assert(BigInt(row.getAs[Long]("s3")) == s3)
    assert(BigInt(row.getAs[Long]("r_ppm")) ==
      BigInt(1000000) * (4 * m * s1 - s2 * s2) /
        (2 * m * s3 - s2 * s2))
    assert(row.getAs[Long]("r_ppm") >= -1000000L &&
      row.getAs[Long]("r_ppm") <= 1000000L)
  }

  test("q_clustering_coef equals the direct neighbor-intersection " +
      "replay; triangle total matches and LCC is a mean of [0,1e6]") {
    val (_, adj) = graph()
    // per vertex: t_x = |{(y,z) ⊆ N(x) : y < z, z ∈ N(y)}|
    val txExact = adj.map { case (x, nb) =>
      val ns = nb.toSeq.sorted
      x -> (for (i <- ns.indices; j <- (i + 1) until ns.length
        if adj(ns(i)).contains(ns(j))) yield 1).size.toLong
    }
    val eligible = adj.filter(_._2.size >= 2)
    val nv = eligible.size.toLong
    val slcc = eligible.map { case (x, nb) =>
      val d = nb.size.toLong
      BigInt(2000000) * txExact(x) / (d * (d - 1)) }.sum
    val t3 = txExact.values.map(BigInt(_)).sum / 3
    val row = SparkEntry.queries("q_clustering_coef")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n_vertices") == nv)
    assert(BigInt(row.getAs[Long]("n_triangles")) == t3)
    assert(BigInt(row.getAs[Long]("avg_lcc_ppm")) == slcc / nv)
    assert(row.getAs[Long]("avg_lcc_ppm") >= 0L &&
      row.getAs[Long]("avg_lcc_ppm") <= 1000000L)
    // consistency with the global triangle gate: same graph, same count
    val tri = SparkEntry.queries("q_triangles")(spark, sf)
      .collect().head
    assert(tri.getAs[Long]("n_triangles") == row.getAs[Long]("n_triangles"))
  }

  test("q_hits equals the direct 5-round integer replay and both score " +
      "vectors are max-normalized to exactly 10^6") {
    import spark.implicits._
    // the nation trade graph, replayed off the raw tables
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = graft.sources.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = graft.sources.Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val supp = graft.sources.Tables.load(spark, sf, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .agg(count(lit(1)).as("w"))
      .as[(Long, Long, Long)].collect()
    val nodes = graft.sources.Tables.load(spark, sf, "nation")
      .select(col("n_nationkey").cast("long")).as[Long].collect().sorted
    var h = nodes.map(_ -> BigInt(1000000)).toMap
    var a = Map.empty[Long, BigInt]
    for (_ <- 1 to 5) {
      val araw = nodes.map(v => v ->
        edges.filter(_._2 == v).map(e => BigInt(e._3) * h(e._1)).sum)
        .toMap
      val mxa = araw.values.max
      a = araw.map { case (k, v) => k -> BigInt(1000000) * v / mxa }
      val hraw = nodes.map(u => u ->
        edges.filter(_._1 == u).map(e => BigInt(e._3) * a(e._2)).sum)
        .toMap
      val mxh = hraw.values.max
      h = hraw.map { case (k, v) => k -> BigInt(1000000) * v / mxh }
    }
    val rows = SparkEntry.queries("q_hits")(spark, sf)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == nodes.length)
    for ((id, auth, hub) <- rows) {
      assert(BigInt(auth) == a(id), s"auth mismatch at $id")
      assert(BigInt(hub) == h(id), s"hub mismatch at $id")
      assert(auth >= 0L && auth <= 1000000L)
      assert(hub >= 0L && hub <= 1000000L)
    }
    // the rescale pins the max of each vector at exactly 10^6
    assert(rows.map(_._2).max == 1000000L)
    assert(rows.map(_._3).max == 1000000L)
  }
}
