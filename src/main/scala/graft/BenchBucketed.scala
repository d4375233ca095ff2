package graft

import org.apache.spark.sql.functions._

/** On-demand A/B for the persistent bucketed edge layout (round 16, r15
  * verdict #3 done-criteria): the SAME wedge-center census run (A) over
  * the on-disk vertex-bucketed tables q_bucketed_wedges reads and (B)
  * over the session-memo oriented edge frame, where the join must
  * shuffle both legs. Broadcast is disabled for both legs — at gate
  * scale the edge frame is broadcastable, which would hide the
  * exchange the 100 TB layout eliminates; with it off, leg B pays two
  * hash-partitionings + a sort per run while leg A reads co-located
  * sorted buckets. The one-time bucketed WRITE is reported separately
  * (it is the amortized cost: paid once per corpus drop, reused by
  * every structural query after).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.BenchBucketed"
  */
object BenchBucketed {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt)
      .getOrElse(5)
    val cpus = GraftSession.defaultCpus
    val spark = GraftSession
      .builder(master = s"local[$cpus]", appName = "graft-bench-bucketed",
        shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def wedges(e1: org.apache.spark.sql.DataFrame,
        e2: org.apache.spark.sql.DataFrame): Long =
      e1.as("e1")
        .join(e2.select(col("s").as("m"), col("t").as("w")).as("e2"),
          col("e1.t") === col("e2.m"))
        .groupBy(col("e1.t").as("center"))
        .agg(count(lit(1)).as("n_wedges"))
        .agg(sum(col("n_wedges"))).head().getLong(0)

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // memo leg warm-up builds the session artifact (checkpoint paid once,
    // exactly as any structural gate session pays it)
    val memo = graft.operators.GraphArtifacts
      .orientedCoPurchaseEdges(spark, sfDir)
    memo.count()

    // bucketed leg: the one-time write, reported separately
    val (tWrite, _) = timed {
      graft.operators.BucketedGraph.edgesByT(spark, sfDir).count()
      graft.operators.BucketedGraph.edgesByS(spark, sfDir).count()
    }

    // round 17: the out-adjacency build is the structural family's new
    // shared consumer of the s-copy (q_triangles/q_clustering_coef) —
    // A/B the BUILD itself: over the bucketed scan it plans with zero
    // Exchange, over the memo checkpoint it must shuffle by s first
    def adjacency(e: org.apache.spark.sql.DataFrame): Long =
      e.groupBy(col("s").as("x"))
        .agg(sort_array(collect_list(col("t"))).as("nbrs"))
        .agg(count(lit(1))).head().getLong(0)

    val legs = Seq(
      "bucketed" -> (() => wedges(
        graft.operators.BucketedGraph.edgesByT(spark, sfDir),
        graft.operators.BucketedGraph.edgesByS(spark, sfDir))),
      "memo-shuffle" -> (() => wedges(memo, memo)),
      "adj-bucketed" -> (() => adjacency(
        graft.operators.BucketedGraph.edgesByS(spark, sfDir))),
      "adj-memo" -> (() => adjacency(memo)))

    println(f"[bucketed-ab] dir=$sfDir write-once=$tWrite%.2fs reps=$reps")
    for ((name, run) <- legs) {
      val times = (1 to reps).map(_ => timed(run()))
      val counts = times.map(_._2).distinct
      require(counts.size == 1, s"leg $name nondeterministic: $counts")
      val sorted = times.map(_._1).sorted
      println(f"[bucketed-ab] $name%-14s median=${sorted(reps / 2)}%.3fs " +
        f"min=${sorted.head}%.3fs wedges=${counts.head}")
    }
    spark.stop()
  }
}
