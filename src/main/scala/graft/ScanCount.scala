package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Reuse-aware executed-fact-scan counter for named gates (round 18
  * A/B tooling, the ScanSweepAll walk as a CLI): counts FileSourceScans
  * in the AQE-final plan AFTER one execution, stopping at
  * ReusedExchangeExec — the number of times the gate actually read each
  * table. Usage: ScanCount <sfDir> <nameSubstr...> */
object ScanCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val filters = args.drop(1)
    val cpus = GraftSession.defaultCpus
    val spark = GraftSession
      .builder(master = s"local[$cpus]", appName = "graft-scancount",
        shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def scans(p: SparkPlan): Seq[String] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case _: ReusedExchangeExec => Seq.empty
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.getName.stripSuffix(".parquet"))
      case other =>
        other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
    }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => filters.exists(q._1.contains))
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          df.foreach(_ => ())
          val counts = scans(df.queryExecution.executedPlan)
            .groupBy(identity).map { case (k, v) => k -> v.size }
          println(s"[scancount] $name -> ${counts.toSeq.sorted.mkString(", ")}")
        } catch { case e: Throwable =>
          System.err.println(s"[scancount] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
