package graft

import org.apache.spark.sql.Row

class RelationalSpec extends SparkSpec {

  test("driver smoke contract: entry(spark) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query with an oracle has matching column names") {
    // The driver sorts columns by name before hashing; a misnamed alias is
    // an automatic mismatch. Cheap structural guard: oracle keys ⊆ queries.
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
    // a typo'd oracle key silently downgrades the query to a rows-only
    // check — pin the rows-only set to exactly the documented four
    val rowsOnly = qs.diff(SparkEntry.oracleSql.keySet)
    assert(rowsOnly ==
      Set("q_approx_distinct", "q_subword", "q_sim_ivf", "q_approx_quantile"),
      s"unexpected rows-only queries (oracle missing?): $rowsOnly")
  }

  test("approx_percentile tracks the exact interpolated percentile") {
    // the sketch is engine-specific (rows-only in the gate); its accuracy
    // contract vs the exact form is asserted here instead
    val approx = SparkEntry.queries("q_approx_quantile")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = SparkEntry.queries("q_percentile_cont")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    exact.foreach { case (flag, p50) =>
      val rel = math.abs(approx(flag) - p50) / p50
      assert(rel < 0.05, s"$flag: approx ${approx(flag)} vs exact $p50")
    }
  }

  test("q1_agg aggregates are stable across repartitioning") {
    // Decimal-routed sums must not depend on partitioning (Parity.dsum).
    val a = SparkEntry.queries("q1_agg")(spark, sf).collect()
    val li = graft.sources.Tables.load(spark, sf, "lineitem").repartition(13)
    li.createOrReplaceTempView("lineitem_r13")
    val b = SparkEntry.queries("q1_agg")(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("q_topk returns exactly 10 rows in order") {
    val rows: Array[Row] = SparkEntry.queries("q_topk")(spark, sf).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getDouble(2))
    assert(prices.sameElements(prices.sortBy(-(_: Double))))
  }
}
