package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** On-demand diagnostic (prints, never fails): reuse-aware fact-scan
  * counts for EVERY gate. Run via `sbt "testOnly graft.ScanSweepAllSpec"`.
  *
  * The round-15 sweep found ~80 gates reading a fixture table 2–5×; on
  * inspection they fall into four classes, only the last of which is a
  * defect (PERF.md "multi-scan classification"):
  *
  *  1. variant-planting fixtures — base ∪ mutated copy necessarily reads
  *     the source twice (in production these are two distinct corpora);
  *  2. threshold-then-apply two-pass statistics (z-scores, CUPED,
  *     winsorize-style screens, rank censuses) — pass 2 depends on a
  *     global aggregate of pass 1; caching the corpus to avoid the
  *     second scan is the WRONG trade at 100 TB;
  *  3. staged-survivor narrowing (q_funnel) — each stage re-scans with a
  *     DIFFERENT pushed filter; n cheap pruned scans beat one full scan
  *     plus a pivot;
  *  4. redundant derived-frame recompute — the same expensive subtree
  *     (tokenize+explode) evaluated twice because two consumers hang off
  *     it with no shared exchange. These are bugs: q_tpch_q2/q15/q17/q21
  *     (r14 verdict, fixed via single-pass rewrites + ScanSweepSpec),
  *     q_dsir_weights (fixed: native kernel + documented 2-pass),
  *     q_bm25's df census (fixed round 15: df now derives from the tf
  *     RESULT, so the postings explode runs once).
  */
class ScanSweepAllSpec extends SparkSpec {

  private def scans(p: SparkPlan): Seq[String] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case _: ReusedExchangeExec => Seq.empty
    case f: FileSourceScanExec =>
      f.relation.location.rootPaths.map(_.getName)
    case other =>
      other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
  }

  test("diagnostic: reuse-aware fact-scan counts over all gates") {
    val facts = Seq("lineitem.parquet", "orders.parquet", "events.parquet",
      "documents.parquet", "embeddings.parquet")
    for (g <- SparkEntry.queries.keys.toSeq.sorted
        if !g.startsWith("q_stream")) {
      scala.util.Try {
        val df = SparkEntry.queries(g)(spark, sf)
        df.collect()
        val counts = scans(df.queryExecution.executedPlan)
          .groupBy(identity).map { case (k, v) => k -> v.size }
          .filter { case (k, v) => facts.contains(k) && v > 1 }
        if (counts.nonEmpty) println(s"[allsweep] $g: $counts")
      }.failed.foreach(e => println(s"[allsweep] $g ERR ${e.getMessage}"))
    }
    println("[allsweep] done")
  }
}
