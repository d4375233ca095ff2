package graft

import org.apache.spark.sql.functions._

/** Semantics for the sketch-calibration tranche
  * ([[graft.queries.SketchOps]]): from-scratch sketch replays — the
  * CMS grid rebuilt in Scala from the portable hash, the Bloom
  * position set likewise — plus the sketches' defining guarantees:
  * CMS NEVER underestimates and its overestimate stays under the
  * εn bound with the audited width; Bloom has zero false negatives by
  * construction and its measured FPR sits near the design curve.
  */
class SketchOpsSpec extends SparkSpec {

  private def h32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
  }

  test("q_cms_audit equals the direct grid replay; estimates never " +
      "underestimate and overestimates respect the e*n/w envelope") {
    val keys = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(col("l_partkey")).collect().map(_.getLong(0))
    val grid = scala.collection.mutable.Map.empty[(Long, Long), Long]
      .withDefaultValue(0L)
    for (k <- keys; r <- 0L until 4L)
      grid((r, h32(s"$r:$k") % 256)) += 1
    val exact = keys.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    val top = exact.toSeq.sortBy { case (k, c) => (-c, k) }.take(20)
    val rows = SparkEntry.queries("q_cms_audit")(spark, sf).collect()
      .map(r => r.getAs[Long]("pk") -> r).toMap
    assert(rows.keySet == top.map(_._1).toSet)
    val n = keys.length.toLong
    for ((k, c) <- top) {
      val est = (0L until 4L).map(r => grid((r, h32(s"$r:$k") % 256))).min
      val row = rows(k)
      assert(row.getAs[Long]("exact") == c, s"pk=$k")
      assert(row.getAs[Long]("est") == est, s"pk=$k")
      assert(row.getAs[Long]("overestimate") == est - c, s"pk=$k")
      // the CMS guarantee: never under; overestimate ≤ ~2en/w whp
      assert(est >= c, s"pk=$k underestimated")
      assert(est - c <= 2 * math.E * n / 256, s"pk=$k over the bound")
    }
  }

  test("q_bloom_fpr equals the direct position-set replay; every " +
      "inserted gram probes positive (no false negatives) and the " +
      "measured FPR tracks the design curve") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.wordNgramsNative(col("text"), 3)
          .as("gs"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet))
    val ev = docs.filter(_._1 % 3 == 0).flatMap(_._2).toSet
    val tr = docs.filter(_._1 % 3 != 0).flatMap(_._2).toSet
    val positions = (for (g <- ev; i <- 0 until 3)
      yield h32(s"$i:$g") % 65536).toSet
    def probes(g: String): Boolean =
      (0 until 3).forall(i => positions.contains(h32(s"$i:$g") % 65536))
    val neg = (tr -- ev).toSeq
    val nFp = neg.count(probes)
    val row = SparkEntry.queries("q_bloom_fpr")(spark, sf).collect().head
    assert(row.getAs[Long]("n_inserted") == ev.size.toLong)
    assert(row.getAs[Long]("n_neg") == neg.size.toLong)
    assert(row.getAs[Long]("n_fp") == nFp.toLong)
    assert(row.getAs[Long]("fpr_ppm") ==
      1000000L * nFp / neg.size)
    // no false negatives: every inserted gram must probe positive
    assert(ev.forall(probes))
    // the design curve: measured within 5σ Poisson noise of theory
    val t = 1.0 - math.exp(-3.0 * ev.size / 65536.0)
    val theo = t * t * t
    assert(math.abs(row.getAs[Double]("theo_fpr") -
      math.rint(theo * 1e6) / 1e6) < 1e-9)
    val sd = math.sqrt(theo * (1 - theo) / neg.size)
    assert(math.abs(nFp.toDouble / neg.size - theo) <= 5 * sd + 1e-4,
      s"measured ${nFp.toDouble / neg.size} vs theo $theo")
  }
}
