package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Streaming fixed-cost A/B (round 17, r16 verdict #7): ~16 stream gates
  * × ~2–3 s ≈ 40 s of every bench sweep is stream-LAUNCH overhead
  * (checkpoint dir setup, isolated session, micro-batch planner spin-up,
  * memory-sink registration), re-measured every round as if it were
  * operator cost. This main isolates it ONCE so future bench deltas can
  * be read net of it:
  *
  *  - `bare stream`: the cheapest possible drained stream — the events
  *    file source through a single global count into a memory sink
  *    (1-row state, no window/join/dedup machinery);
  *  - `batch twin`: the identical aggregate as a plain batch query —
  *    the actual data cost of the work the bare stream does;
  *  - `cheapest gate`: q_stream_tumbling via the registered entry, the
  *    lightest real streaming gate.
  *
  * Fixed launch cost ≈ bare − batch; a gate's NET operator cost ≈ gate −
  * bare. Medians over quiet reps after one warm rep (the Bench
  * discipline). Results → PERF.md.
  */
object BenchStreamFixed {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = GraftSession.defaultCpus
    val spark = GraftSession
      .builder(master = s"local[$cpus]", appName = "graft-bench-streamfixed",
        shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.load(spark, sfDir, "events").count() // warm scan

    val nonce = new java.util.concurrent.atomic.AtomicLong()
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def bareStream(): Double = timed {
      EventStreams.runToResult(spark,
        EventStreams.readEvents(spark, sfDir)
          .agg(count(lit(1)).as("n")),
        s"sf_bare_${nonce.incrementAndGet()}")
        .foreach(_ => ())
    }
    def batchTwin(): Double = timed {
      graft.sources.Tables.load(spark, sfDir, "events")
        .agg(count(lit(1)).as("n")).foreach(_ => ())
    }
    def gate(): Double = timed {
      SparkEntry.queries("q_stream_tumbling")(spark, sfDir).foreach(_ => ())
    }

    val reps = 5
    def measure(label: String, f: () => Double): Double = {
      f() // warm rep absorbs codegen/classload
      val xs = (1 to reps).map(_ => f()).sorted
      println(f"[streamfixed] $label median=${xs(xs.length / 2)}%.3f " +
        f"min=${xs.head}%.3f all=${xs.map(x => f"$x%.2f").mkString(",")}")
      xs(xs.length / 2)
    }

    val batch = measure("batch_twin", batchTwin _)
    val bare = measure("bare_stream", bareStream _)
    val tumb = measure("q_stream_tumbling", gate _)
    println(f"[streamfixed] LAUNCH fixed cost = bare - batch = " +
      f"${bare - batch}%.3f s; q_stream_tumbling net = ${tumb - bare}%.3f s")
  }
}
