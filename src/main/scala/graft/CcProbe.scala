package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-structure probe for the Components loop (round 18, A/B tooling —
  * not on the driver's path): times each star round of the
  * q_label_propagate / q_geo_cluster / q_deletion_cascade edge graphs so
  * the optimization targets the measured phase, not the assumed one.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = GraftSession.defaultCpus
    val spark = GraftSession
      .builder(master = s"local[$cpus]", appName = "graft-cc-probe",
        shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.corpus.foreach { t =>
      try graft.sources.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // the q_label_propagate pair graph (capped simhash pairs)
    val q = SparkEntry.queries("q_label_propagate")
    (1 to (if (args.isEmpty) 2 else args(0).toInt)).foreach { rep =>
      println(s"[ccprobe] === rep $rep ===")
      t("q_label_propagate full")(q(spark, sfDir).foreach(_ => ()))
    }
    spark.stop()
  }
}
