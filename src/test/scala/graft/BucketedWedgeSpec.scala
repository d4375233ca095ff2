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
}
