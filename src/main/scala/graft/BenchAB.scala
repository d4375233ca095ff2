package graft

import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

/** Suite-position A/B probe (r12 verdict task #4): q_label_propagate,
  * q_bootstrap_ci and q_dedup_canonical drifted +35–48% across two
  * rounds while code-identical, and the standing explanation was the
  * measured ±40% ambient band. This main isolates the OTHER candidate
  * mechanism — JVM/session state accumulated across a 361-query suite
  * (GC pressure, code-cache fill, block-manager/checkpoint residue) —
  * by running N quiet reps of each drifter at SUITE HEAD (fresh
  * session, right after warmup) and again at SUITE TAIL (after one
  * full pass over every other registered query), in ONE JVM, and
  * printing per-phase medians/mins plus GC and heap deltas.
  *
  * Reading: tail/head ≈ 1 ⇒ suite position is NOT the mechanism (the
  * ambient-band adjudication stands); tail/head ≫ 1 ⇒ state
  * accumulation IS, and the remedy is a session reset between bench
  * families. Either way PERF.md records the mechanism, not the band.
  */
object BenchAB {
  private val Drifters =
    Seq("q_label_propagate", "q_bootstrap_ci", "q_dedup_canonical")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = GraftSession.defaultCpus
    val spark = GraftSession
      .builder(master = s"local[$cpus]", appName = "graft-bench-ab",
        shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.corpus.foreach { t =>
      try graft.sources.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    val reps = 5

    def gcMillis: Long = ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
    def heapMb: Long = (ManagementFactory.getMemoryMXBean
      .getHeapMemoryUsage.getUsed / (1 << 20))

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).foreach(_ => ())
        (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[ab] $name failed: ${e.getMessage}"); -1.0 }
    }
    def phase(label: String): Map[String, (Double, Double)] = {
      // one Janino-warm rep first, then the measured reps (the Bench
      // discipline: rep 1 absorbs codegen compile)
      Drifters.foreach(once)
      val samples = Drifters.map { q =>
        q -> (1 to reps).map(_ => once(q))
      }.toMap
      samples.map { case (q, xs0) =>
        // a failed rep returns the -1.0 sentinel; folding it into the
        // median/min would corrupt the A/B readout silently — abort
        // loudly instead (r13 advice)
        val xs = xs0.filter(_ >= 0.0)
        require(xs.size == xs0.size,
          s"[ab] $q: ${xs0.size - xs.size}/$reps reps FAILED — A/B void")
        val s = xs.sorted
        println(f"[ab] $label $q median=${s(s.length / 2)}%.3f " +
          f"min=${s.head}%.3f all=${xs.map(x => f"$x%.2f").mkString(",")}")
        q -> (s(s.length / 2), s.head)
      }
    }

    println(s"[ab] head phase: gc=${gcMillis}ms heap=${heapMb}MB")
    val head = phase("HEAD")

    // the full-suite pass the drifters normally sit inside (minus the
    // drifters themselves — the A/B wants their cost only in the
    // measured phases)
    val t0 = System.nanoTime()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => Drifters.contains(q._1))
      .foreach { case (n, _) => once(n) }
    println(f"[ab] suite pass: ${(System.nanoTime() - t0) / 1e9}%.1f s; " +
      s"gc=${gcMillis}ms heap=${heapMb}MB")

    val tail = phase("TAIL")
    println(s"[ab] tail phase done: gc=${gcMillis}ms heap=${heapMb}MB")
    for (q <- Drifters) {
      val r = tail(q)._1 / head(q)._1
      println(f"[ab] RATIO $q tail/head median=${r}%.2f " +
        f"(head=${head(q)._1}%.3f tail=${tail(q)._1}%.3f)")
    }
  }
}
