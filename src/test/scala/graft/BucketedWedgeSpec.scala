package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** The q_bucketed_wedges gate must actually run in the zero-Exchange
  * regime its SURVEY row claims (round 16, r15 verdict #3): with
  * broadcast disabled — so the join would otherwise shuffle both sides —
  * the AQE-final plan over the PERSISTENT bucketed tables contains no
  * Exchange below the aggregate, and the result matches the plain
  * shuffled build over the session-memo artifact bit for bit.
  * GraphBucketingSpec pins the same regime on a spec-local temp table;
  * this one drives the real gate + operators/BucketedGraph. */
class BucketedWedgeSpec extends SparkSpec {

  test("q_bucketed_wedges: no Exchange below the aggregate; equals the " +
      "session-memo build") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val gate = SparkEntry.queries("q_bucketed_wedges")(spark, sf)
      val rows = gate.collect()
      assert(rows.nonEmpty, "gate corpus must have wedges")

      val p = gate.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      val aggIdx = p.indexOf("HashAggregate")
      assert(aggIdx >= 0, s"expected a HashAggregate over the wedges:\n$p")
      assert(!p.substring(0, aggIdx).contains("Exchange"),
        s"bucketed wedge gate must not shuffle its scan legs:\n$p")

      // bit-identical to the shuffled session-memo build
      val e = graft.operators.GraphArtifacts
        .orientedCoPurchaseEdges(spark, sf)
      val plain = e.as("e1")
        .join(e.select(col("s").as("m"), col("t").as("w")).as("e2"),
          col("e1.t") === col("e2.m"))
        .groupBy(col("e1.t").as("center"))
        .agg(count(lit(1)).as("n_wedges"))
        .orderBy(col("n_wedges").desc, col("center"))
        .limit(20)
        .collect()
      assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        plain.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("the structural family shares the persistent base (round 17): " +
      "the adjacency build plans zero-Exchange over the s-bucketed scan, " +
      "and the triangle twins scan the bucketed tables with values " +
      "matching the session-memo build") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the outAdjacency build shape (pre-checkpoint): groupBy(s) over
      // the s-bucketed scan needs no Exchange anywhere in the plan —
      // at 100 TB the adjacency fold is per-bucket local
      val adjBuild = graft.operators.BucketedGraph.edgesByS(spark, sf)
        .groupBy(col("s").as("x"))
        .agg(sort_array(collect_list(col("t"))).as("nbrs"))
      adjBuild.collect()
      val ap = adjBuild.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      assert(!ap.contains("Exchange"),
        s"adjacency build over the bucketed scan must not shuffle:\n$ap")

      // the routed gates really read the persistent tables (q_kcore
      // does too, but its KCore entry checkpoint hides the scan from
      // the final plan — parity pins its values)
      for (g <- Seq("q_triangles", "q_clustering_coef")) {
        val gate = SparkEntry.queries(g)(spark, sf)
        gate.collect()
        val plan = gate.queryExecution.executedPlan.toString
        assert(plan.contains("graft_bucketed"),
          s"$g must scan the persistent bucketed base")
      }

      // hash-unchanged pin: the bucketed-base triangle census equals
      // the session-memo build bit for bit
      val viaBucketed = SparkEntry.queries("q_triangles")(spark, sf)
        .collect().head
      val adj = graft.operators.GraphArtifacts.orientedAdjacency(spark, sf)
      val viaMemo = graft.operators.GraphArtifacts
        .orientedCoPurchaseEdges(spark, sf)
        .join(adj.select(col("x").as("s"), col("nbrs").as("ns")), Seq("s"))
        .join(adj.select(col("x").as("t"), col("nbrs").as("nt")), Seq("t"))
        .select(size(array_intersect(col("ns"), col("nt")))
          .cast("long").as("tw"))
        .agg(coalesce(sum(col("tw")), lit(0L)).as("n_triangles"))
        .collect().head
      assert(viaBucketed.getLong(1) == viaMemo.getLong(0),
        "bucketed-base triangles diverge from the session-memo build")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("bucketsFor tracks corpus size within [8, 1024]") {
    import graft.operators.BucketedGraph.bucketsFor
    assert(bucketsFor(0L) == 8)
    assert(bucketsFor(10L << 20) == 10)
    assert(bucketsFor(1L << 31) == 1024)
    assert(bucketsFor(Long.MaxValue) == 1024)
  }
}
