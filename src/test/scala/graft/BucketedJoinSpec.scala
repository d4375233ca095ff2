package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Bucketing — the shuffle-free co-located join (SURVEY §4, the 100 TB
  * lever): both sides pre-bucketed on the join key join without any
  * Exchange. Asserted on the physical plan, with results equal to the
  * shuffled join.
  */
class BucketedJoinSpec extends SparkSpec {

  test("pre-bucketed tables join with zero shuffle and identical results") {
    // external tables with explicit paths — warehouse dir stays untouched
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")

    val o = graft.sources.Tables.load(spark, sf, "orders")
    val c = graft.sources.Tables.load(spark, sf, "customer")
    o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    c.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/b_customer").saveAsTable("b_customer")

    // disable broadcast so the join would otherwise shuffle both sides
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))

      val p = joined.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      val joinSection = p.substring(0, p.indexOf("HashAggregate"))
      assert(!joinSection.contains("Exchange"),
        s"bucketed join must not shuffle its inputs:\n$p")

      // and the result equals the plain shuffled join
      val plain = o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      val a = joined.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      val b = plain.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      assert(a.sameElements(b))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
