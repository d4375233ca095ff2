package graft

/** Benchmark main: runs every declared query against
  * `SPARK_GRAFT_SF_DIR`, prints one JSON line with per-query seconds.
  *
  * A warmup action runs first so the timings measure query execution, not
  * JVM/session initialization (~5-7s on first action otherwise).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = GraftSession.defaultCpus
    val spark = GraftSession
      .builder(master = s"local[$cpus]", appName = "graft-bench",
        shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: touch every table once (schema read + codegen warm paths).
    graft.sources.Tables.corpus.foreach { t =>
      try graft.sources.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }

    // Full materialization via foreach: count() would let Catalyst prune
    // the projected expressions (the thing under benchmark) out of
    // projection-only queries. Failures report as -1, never as a timing.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val dur =
        try { fn(spark, sfDir).foreach(_ => ()); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      name -> dur
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.filter(_._2 < 0).map(r => "\"" + r._1 + "\"")
      .mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
