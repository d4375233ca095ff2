package graft

import org.apache.spark.sql.functions._

/** Semantics for the sequence-information tranche
  * ([[graft.queries.SeqOps]]): per-user gap census and transition
  * entropy replayed from collected events, plus the statistics'
  * defining ranges (burstiness in (−1, 1), entropy ≥ 0, perplexity ≤
  * the out-degree bound).
  */
class SeqOpsSpec extends SparkSpec {

  private def events(): Array[(Long, Long, Long, String)] =
    graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("q_burstiness equals the direct per-user gap replay; the index " +
      "stays in (-1, 1)") {
    val ev = events()
    val gaps = ev.groupBy(e => (e._1, e._4)).toSeq.flatMap {
      case ((_, et), rows) =>
        val o = rows.sortBy(r => (r._2, r._3)).map(_._2)
        o.sliding(2).filter(_.length == 2)
          .map(p => et -> (p(1) - p(0)) / 1000000L).toSeq
    }
    val rows = SparkEntry.queries("q_burstiness")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(rows.keySet == gaps.map(_._1).toSet)
    for ((et, g) <- gaps.groupBy(_._1)) {
      val xs = g.map(_._2)
      val n = xs.length.toLong
      val sg = xs.map(BigInt(_)).sum
      val qg = xs.map(x => BigInt(x) * x).sum
      val mu = sg / n
      val s2 = (qg - sg * sg / n) / (n - 1)
      val r = rows(et)
      assert(r.getAs[Long]("n_gaps") == n, et)
      assert(BigInt(r.getAs[Long]("mu")) == mu, et)
      assert(BigInt(r.getAs[Long]("s2")) == s2, et)
      val b = (math.sqrt(s2.toDouble) - mu.toDouble) /
        (math.sqrt(s2.toDouble) + mu.toDouble)
      assert(math.abs(r.getAs[Double]("burstiness") - b) < 1e-6, et)
      assert(r.getAs[Double]("burstiness") > -1.0 &&
        r.getAs[Double]("burstiness") < 1.0, et)
    }
  }

  test("q_seq_entropy equals the direct transition replay; entropy is " +
      "nonnegative and perplexity bounded by the max out-degree") {
    val ev = events()
    val trans = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    for ((_, rows) <- ev.groupBy(_._1)) {
      val path0 = rows.sortBy(r => (r._2, r._3)).map(_._4)
      val cut = path0.indexOf("purchase")
      val path = if (cut >= 0) path0.take(cut + 1) else path0
      val labeled = path.map(x => if (x == "purchase") "conv" else x)
      var prev = "start"
      for (x <- labeled) { trans((prev, x)) += 1; prev = x }
      if (labeled.last != "conv") trans((prev, "null")) += 1
    }
    val np = trans.groupBy(_._1._1).map { case (p, m) =>
      p -> m.values.sum }
    val n = BigInt(trans.values.sum)
    val sk = trans.map { case ((p, _), c) =>
      BigInt(c) * BigInt(math.floor(
        1e6 * math.log(c.toDouble / np(p)) + 0.5).toLong) }.sum
    val row = SparkEntry.queries("q_seq_entropy")(spark, sf)
      .collect().head
    assert(BigInt(row.getAs[Long]("n_trans")) == n)
    assert(row.getAs[Long]("n_cells") == trans.size.toLong)
    assert(BigInt(row.getAs[Long]("h_micro")) == -sk / n)
    assert(row.getAs[Long]("h_micro") >= 0L)
    // perplexity can never exceed the widest conditional fan-out
    val maxDeg = trans.keys.groupBy(_._1).values.map(_.size).max
    assert(row.getAs[Double]("perplexity") >= 1.0 - 1e-9)
    assert(row.getAs[Double]("perplexity") <= maxDeg + 1e-9)
  }
}
