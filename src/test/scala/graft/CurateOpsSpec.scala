package graft

import org.apache.spark.sql.functions._
import graft.operators.Sessionize
import graft.queries.CurateOps
import graft.sources.Tables

class CurateOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Tables.load(spark, sf, "events")
    .select(col("user_id"), col("event_id"), col("value"),
      unix_micros(col("ts")).as("us"))

  test("sessionize: session boundaries sit exactly at gaps >= gapUs") {
    val gapUs = 3600L * 1000000
    val out = Sessionize
      .byGap(events, col("user_id"), col("us"), col("event_id"), gapUs)
      .select(col("user_id"), col("us"), col("event_id"), col("session_idx"))
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    out.foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val sameSession = b._4 == a._4
          assert(sameSession == (b._2 - a._2 < gapUs),
            s"gap ${b._2 - a._2} vs $gapUs: sessions ${a._4} -> ${b._4}")
        case _ => ()
      }
      assert(sorted.head._4 == 1L, "first session per key is 1")
    }
  }

  test("sessionize: numbering is dense per key and partitioning-invariant") {
    val gapUs = 3600L * 1000000
    def run(df: org.apache.spark.sql.DataFrame) = Sessionize
      .byGap(df, col("user_id"), col("us"), col("event_id"), gapUs)
      .select(col("event_id"), col("session_idx"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val a = run(events)
    val b = run(events.repartition(13))
    assert(a.sameElements(b), "session ids must be a function of the data")
    val perKey = Sessionize
      .byGap(events, col("user_id"), col("us"), col("event_id"), gapUs)
      .groupBy(col("user_id"))
      .agg(max(col("session_idx")).as("mx"),
        countDistinct(col("session_idx")).as("n"))
      .filter(col("mx") =!= col("n")).count()
    assert(perKey == 0L, "session_idx must be dense 1..n per key")
  }

  test("sessionize: both windows share one exchange on the key") {
    val plan = Sessionize
      .byGap(events, col("user_id"), col("us"), col("event_id"), 1000L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"expected a single key exchange feeding both windows, got $exchanges\n$plan")
  }

  test("sessionize ≡ streaming session_window, session for session") {
    // the batch operator claims session_window semantics — prove it:
    // same events, same 5-minute gap, through the real streaming operator
    import graft.streaming.EventStreams
    val streamed = EventStreams.runToResult(spark,
        EventStreams.sessionCounts(EventStreams.readEvents(spark, sf),
          gap = "5 minutes"),
        "spec_batch_coherence")
      .select(col("session_start"), col("user_id"), col("n_events"))
      .as[(Long, Long, Long)].collect().sorted
    val batch = Sessionize
      .byGap(events, col("user_id"), col("us"), col("event_id"),
        5L * 60 * 1000000)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(expr("min(us) div 1000000").as("session_start"),
        count(lit(1)).as("n_events"))
      .select(col("session_start"), col("user_id"), col("n_events"))
      .as[(Long, Long, Long)].collect().sorted
    assert(streamed.nonEmpty && streamed.sameElements(batch),
      s"streaming ${streamed.length} vs batch ${batch.length} sessions")
  }

  test("corpus diff: statuses partition both snapshots, buckets consistent") {
    val out = CurateOps.defs("q_corpus_diff")(spark, sf)
      .as[(String, Long, Long)].collect()
      .map { case (st, n, idSum) => (st, (n, idSum)) }.toMap
    val d = Tables.load(spark, sf, "documents")
    val nOld = d.count()
    val nNew = d.filter(col("doc_id") % 17 =!= 3).count() +
      d.filter(col("doc_id") % 11 === 5).count()
    val statuses = Seq("added", "removed", "changed", "unchanged")
    assert(out.keySet.subsetOf(statuses.toSet))
    def n(st: String) = out.get(st).map(_._1).getOrElse(0L)
    assert(n("removed") + n("changed") + n("unchanged") == nOld)
    assert(n("added") + n("changed") + n("unchanged") == nNew)
  }

  test("source cap: TopK path is rank-for-rank the window-form keep set") {
    val d = Tables.load(spark, sf, "documents")
    val spark2 = spark
    import spark2.implicits._
    val viaQuery = CurateOps.defs("q_source_cap")(spark, sf)
      .select(col("source"), col("n_kept"), col("kept_id_sum"))
      .as[(String, Long, Long)].collect()
      .map { case (src, k, idSum) => (src, (k, idSum)) }.toMap
    val viaWindow = d
      .withColumn("h", graft.functions.TextFunctions
        .hash32(col("doc_id").cast("string")))
      .withColumn("rk", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy(col("source"))
        .orderBy(col("h"), col("doc_id"))))
      .filter(col("rk") <= 15)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("k"), sum(col("doc_id")).as("s"))
      .as[(String, Long, Long)].collect()
      .map { case (src, k, idSum) => (src, (k, idSum)) }.toMap
    assert(viaQuery == viaWindow)
  }

  test("embed projection: narrow plan — no exchange, no UDF") {
    val plan = CurateOps.defs("q_embed_project")(spark, sf)
      .queryExecution.executedPlan.toString
    // the single Exchange allowed is the final orderBy's range partition
    assert(!plan.contains("hashpartitioning"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      plan)
  }

  test("embed projection: sign matrix is ±1 and reproducible") {
    val s1 = (0 until 4).map(j => (1 to 64).map(i => CurateOps.projSign(j, i)))
    val s2 = (0 until 4).map(j => (1 to 64).map(i => CurateOps.projSign(j, i)))
    assert(s1 == s2)
    assert(s1.flatten.forall(v => v == 1.0 || v == -1.0))
    // not degenerate: both signs appear in every output dim's row
    s1.foreach(row => assert(row.contains(1.0) && row.contains(-1.0)))
  }

  test("split is leak-free: every source lands in exactly one split") {
    val d = Tables.load(spark, sf, "documents")
    val bucket = pmod(graft.functions.TextFunctions.hash32(col("source")),
      lit(10L))
    val splits = d.select(col("source"),
        when(bucket < 8, "train").when(bucket === 8, "val")
          .otherwise("test").as("split"))
      .groupBy(col("source"))
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count()
    assert(splits == 0L)
  }

  test("rrf fusion: no global corpus window — rankers go through limits") {
    val plan = CurateOps.defs("q_rrf_fusion")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
