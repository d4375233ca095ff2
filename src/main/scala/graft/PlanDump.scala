package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for declared queries to files.
  *
  * Usage: PlanDump <sfDir> <outDir> [suffix] [nameSubstr...]
  * Writes <outDir>/<query><suffix>.txt for every selected query — the
  * round-17+ optimization evidence artifacts (plans/r17/<q>_before.txt /
  * _after.txt). Plans are captured WITHOUT executing the query (explain
  * cost only), so a dump over all 400+ gates stays cheap.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = if (args.length > 2) args(2) else ""
    val filters = args.drop(3)
    def selected(name: String): Boolean =
      filters.isEmpty || filters.exists(name.contains)
    val cpus = GraftSession.defaultCpus
    val spark = GraftSession
      .builder(master = s"local[$cpus]", appName = "graft-plandump",
        shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1).filter(q => selected(q._1))
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name$suffix.txt"), txt)
          println(s"[plandump] wrote $name")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
