package graft

import org.apache.spark.sql.functions._

/** Semantics for the round-12 signal/process tranche
  * ([[graft.queries.StatOps9]]): scalar brute-force replays of the
  * per-lag correlation cells, the Cpk cells, and the ECDF counts —
  * independent of the distributed daily-aggregate/lag-join plans — plus
  * the statistic-level bands (signed r² in [−10⁶, 10⁶] with the lag-0
  * self-consistency check, Cpk positive for an in-band process, DKW
  * band containing the true ECDF by construction).
  */
class StatOps9Spec extends SparkSpec {
  import spark.implicits._

  private def eventsMilli(): Array[(Long, Long)] =
    graft.sources.Tables.load(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(expr("unix_micros(ts) div 86400000000").as("day"),
        (col("value").cast("decimal(18,6)") * 1000).cast("long").as("vm"))
      .as[(Long, Long)].collect()

  test("q_xcorr_leadlag equals the direct per-lag moment recompute and " +
      "lag 0 carries the plain Pearson r² of the daily series") {
    val daily = eventsMilli().groupBy(_._1).map { case (d, xs) =>
      (d, xs.length.toLong, xs.map(_._2).sum) }.toArray.sortBy(_._1)
    val byDay = daily.map(t => t._1 -> (t._2, t._3)).toMap
    val rows = SparkEntry.queries("q_xcorr_leadlag")(spark, sf).collect()
      .map(r => r.getAs[Long]("lag") -> r).toMap
    for (lag <- -7L to 7L) {
      val pairs = daily.flatMap { case (d, x, _) =>
        byDay.get(d + lag).map { case (_, y) => (BigInt(x), BigInt(y)) } }
      if (pairs.length < 3) assert(!rows.contains(lag), s"lag $lag")
      else {
        val n = BigInt(pairs.length)
        val sx = pairs.map(_._1).sum
        val sy = pairs.map(_._2).sum
        val cov = n * pairs.map(p => p._1 * p._2).sum - sx * sy
        val varx = n * pairs.map(p => p._1 * p._1).sum - sx * sx
        val vary = n * pairs.map(p => p._2 * p._2).sum - sy * sy
        val expect = (if (cov < 0) -BigInt(1) else BigInt(1)) *
          (BigInt(1000000) * cov * cov / (varx * vary))
        val r = rows(lag)
        assert(r.getAs[Long]("n_days") == pairs.length.toLong, s"lag $lag")
        assert(BigInt(r.getAs[Long]("signed_r2_ppm")) == expect, s"lag $lag")
        assert(math.abs(r.getAs[Long]("signed_r2_ppm")) <= 1000000L)
      }
    }
    // lag 0 pairs every day with itself: r² is the daily count⇄value
    // correlation, and with value mass ≈ count × mean it must be
    // STRONGLY positive — the direction sanity of the whole readout
    assert(rows(0L).getAs[Long]("signed_r2_ppm") > 250000L)
  }

  test("q_cpk equals the direct cell recompute; the [0,500) generator is " +
      "in-band (out_ppm = 0) with a positive but not-capable Cpk") {
    val xs = eventsMilli().map(_._2)
    val n = xs.length
    val s = xs.map(BigInt(_)).sum
    val ssw = xs.map(x => BigInt(x) * x).sum - s * s / n
    val row = SparkEntry.queries("q_cpk")(spark, sf).collect().head
    assert(row.getAs[Long]("n_events") == n.toLong)
    assert(BigInt(row.getAs[Long]("mu_milli")) == s / n)
    assert(BigInt(row.getAs[Long]("s2_milli2")) == ssw / (n - 1))
    assert(row.getAs[Long]("out_ppm") ==
      1000000L * xs.count(x => x < 0 || x >= 500000) / n)
    val mu = row.getAs[Long]("mu_milli").toDouble / 1000.0
    val sd = math.sqrt(row.getAs[Long]("s2_milli2").toDouble) / 1000.0
    assert(math.abs(row.getAs[Double]("cpk") -
      math.min(500000.0 / 1000.0 - mu, mu) / (3 * sd)) < 1e-6)
    assert(row.getAs[Long]("out_ppm") == 0L)
    // a near-uniform-ish value on [0, 500): mean ≈ mid, sd large →
    // 0 < Cpk < 1.33 (present but NOT capable — the honest readout)
    assert(row.getAs[Double]("cpk") > 0.0 && row.getAs[Double]("cpk") < 1.33)
  }

  test("q_ecdf_band equals the direct threshold counts, is monotone, " +
      "ends at 1, and the band clamps to [0, 1e6]") {
    val xs = eventsMilli().map(_._2)
    val n = xs.length.toLong
    val rows = SparkEntry.queries("q_ecdf_band")(spark, sf).collect()
      .map(r => r.getAs[Long]("k") -> r).toMap
    assert(rows.keySet == (1L to 10L).toSet)
    val eps = math.sqrt(math.log(40.0) / (2.0 * n))
    for (k <- 1L to 10L) {
      val r = rows(k)
      val nle = xs.count(_ <= k * 50000L).toLong
      assert(r.getAs[Long]("n_le") == nle, s"k=$k")
      assert(r.getAs[Long]("ecdf_ppm") == 1000000L * nle / n)
      assert(r.getAs[Long]("lo_ppm") ==
        math.max(math.round(r.getAs[Long]("ecdf_ppm") - eps * 1e6), 0L))
      assert(r.getAs[Long]("hi_ppm") ==
        math.min(math.round(r.getAs[Long]("ecdf_ppm") + eps * 1e6), 1000000L))
      assert(r.getAs[Long]("lo_ppm") <= r.getAs[Long]("ecdf_ppm") &&
        r.getAs[Long]("ecdf_ppm") <= r.getAs[Long]("hi_ppm"))
    }
    // monotone ECDF; the last threshold covers the whole [0, 500) range
    val es = (1L to 10L).map(k => rows(k).getAs[Long]("ecdf_ppm"))
    assert(es == es.sorted)
    assert(es.last == 1000000L)
  }
}
