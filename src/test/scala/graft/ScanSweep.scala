package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Fact-scan budget (100 TB posture): Catalyst INLINES multi-referenced
  * CTEs, so an innocent-looking `WITH x AS (...) ... x ... x` can scan the
  * fact table once per reference — r14's verdict caught q_tpch_q2 at 3×
  * lineitem and q_tpch_q21 at 6×. This spec walks the AQE-FINAL physical
  * plan (unwrapping adaptive/stage nodes, stopping at ReusedExchangeExec —
  * a reused stage executes its subtree once, so string-grepping the explain
  * over-counts) and pins: no TPC-H gate executes more than ONE scan of
  * lineitem or orders. Dimension tables are allowed the canonical second
  * pass (Q22's global-threshold census over customer, Q8's two nation
  * roles). */
class ScanSweepSpec extends SparkSpec {

  private def scans(p: SparkPlan): Seq[String] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case _: ReusedExchangeExec => Seq.empty
    case f: FileSourceScanExec =>
      f.relation.location.rootPaths.map(_.getName)
    case other =>
      other.children.flatMap(scans) ++
        other.subqueries.flatMap(scans)
  }

  test("TPC-H 22: every gate executes at most one lineitem scan and one " +
      "orders scan (AQE-final, reuse-aware)") {
    // Q1 lives under its round-1 flagship name q1_agg
    val gates = ("q1_agg" +:
      SparkEntry.queries.keys.filter(_.startsWith("q_tpch")).toSeq).sorted
    assert(gates.size == 22, s"expected the TPC-H 22, got ${gates.size}")
    for (g <- gates) {
      val df = SparkEntry.queries(g)(spark, sf)
      df.collect()
      val counts = scans(df.queryExecution.executedPlan)
        .groupBy(identity).map { case (k, v) => k -> v.size }
      for (fact <- Seq("lineitem.parquet", "orders.parquet"))
        assert(counts.getOrElse(fact, 0) <= 1,
          s"$g executes ${counts.getOrElse(fact, 0)} scans of $fact — a " +
            "multi-referenced CTE got inlined; restructure to one pass")
    }
  }
}
