package graft

import org.apache.spark.sql.functions._
import graft.operators.Boilerplate

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, String)]): Map[Long, (Boolean, Long)] =
    Boilerplate.stripCommonPrefix(rows.toDF("src", "id", "text"),
        col("src"), col("id"), col("text"), k = 3, minCoverMilli = 600)
      .select(col("id"), col("stripped"), col("n_tokens_after"))
      .as[(Long, Boolean, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("a banner shared by most of a source is stripped; the clean " +
    "minority and other sources are untouched") {
    val rows =
      (1L to 8L).map(i => ("a", i, s"legal notice banner unique body $i")) ++
        Seq(("a", 9L, "just a clean page nine")) ++
        (10L to 12L).map(i => ("b", i, s"page $i of totally different text"))
    val out = run(rows)
    for (i <- 1L to 8L) assert(out(i) == ((true, 3L)), s"doc $i: ${out(i)}")
    assert(out(9L)._1 == false && out(9L)._2 == 5L)
    // source b: three docs, no shared 3-token prefix → nothing stripped
    for (i <- 10L to 12L) assert(!out(i)._1, s"doc $i wrongly stripped")
  }

  test("a single-document group is NEVER stripped — its own prefix " +
    "trivially covers 100% but carries zero frequency evidence " +
    "(minSupport)") {
    val out = run(Seq(("solo", 1L, "my one and only document text")))
    assert(out(1L) == ((false, 6L)),
      s"single doc mutilated as boilerplate: ${out(1L)}")
  }

  test("size-gated dim join: broadcast under maxBroadcastGroups, shuffle " +
    "join above — identical results either way") {
    val rows =
      (1L to 8L).map(i => ("a", i, s"legal notice banner unique body $i")) ++
        (10L to 12L).map(i => ("b", i, s"page $i of totally different text"))
    def strip(maxGroups: Long) =
      Boilerplate.stripCommonPrefix(rows.toDF("src", "id", "text"),
        col("src"), col("id"), col("text"), k = 3, minCoverMilli = 600,
        maxBroadcastGroups = maxGroups)
    def finalJoinPlan(maxGroups: Long): String =
      strip(maxGroups).queryExecution.executedPlan.toString
    // tiny test data would auto-broadcast by stats either way — disable
    // the threshold so ONLY the operator's explicit hint decides, which
    // is the regime that holds at real scale
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      // 2 groups ≤ 1M → the dim joins broadcast (the explicit hint)
      assert(finalJoinPlan(1L << 20).contains("BroadcastHashJoin"),
        "under the gate the chosen-prefix dim must broadcast")
      // gate at 1 forces the scale path: a key-partitioned shuffle join
      val big = finalJoinPlan(1L)
      assert(!big.contains("BroadcastHashJoin") &&
        (big.contains("SortMergeJoin") || big.contains("ShuffledHashJoin")),
        s"over the gate the dim join must shuffle, plan:\n$big")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    // same rows, same verdicts, both regimes
    def collectOut(maxGroups: Long) =
      strip(maxGroups).select(col("id"), col("stripped"),
        col("n_tokens_after")).as[(Long, Boolean, Long)].collect().toSet
    assert(collectOut(1L << 20) == collectOut(1L),
      "join strategy changed the result")
  }
}
