package graft

import org.apache.spark.sql.functions._

/** Semantics for the round-13 calibration/feature-audit tranche
  * ([[graft.queries.CalibOps]]): the isotonic fit is replayed with an
  * INDEPENDENT algorithm (actual pool-adjacent-violators, not the
  * minimax identity the query uses — two derivations agreeing is the
  * point), and the stump gain against a brute-force threshold sweep.
  */
class CalibOpsSpec extends SparkSpec {

  test("q_isotonic_calib: monotone, and equals a scalar PAVA replay " +
      "on the micro-floored interval means") {
    val rows = SparkEntry.queries("q_isotonic_calib")(spark, sf)
      .collect().map(r => (r.getAs[Long]("bin"), r.getAs[Long]("nb"),
        r.getAs[Long]("npb"), r.getAs[Long]("iso_micro")))
      .sortBy(_._1)
    assert(rows.nonEmpty && rows.length <= 10)
    // monotone nondecreasing — the defining property
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._4, s"iso not monotone at bin ${b._1}") }
    // independent PAVA replay over the same (nb, npb) cells: pool
    // adjacent violators to exact rational means, then compare the
    // pooled mean (micro-floored once per pool) to the gate's minimax
    case class Pool(num: BigInt, den: BigInt)
    var pools = List.empty[Pool]
    for ((_, nb, npb, _) <- rows) {
      pools = pools :+ Pool(BigInt(npb), BigInt(nb))
      // merge while the last pool's mean < the previous pool's mean
      var merged = true
      while (merged && pools.length >= 2) {
        val a = pools(pools.length - 2); val b = pools.last
        if (b.num * a.den < a.num * b.den) { // exact rational compare
          pools = pools.dropRight(2) :+
            Pool(a.num + b.num, a.den + b.den)
        } else merged = false
      }
    }
    // expand pools back to per-bin values by walking the bins
    val perBin = scala.collection.mutable.ArrayBuffer.empty[BigInt]
    var i = 0
    for (p <- pools) {
      // each pool covers bins whose nb sums to p.den
      var covered = BigInt(0)
      while (covered < p.den) {
        covered += BigInt(rows(i)._2); i += 1
        perBin += BigInt(1000000) * p.num / p.den
      }
    }
    assert(perBin.length == rows.length)
    // The gate floors each INTERVAL mean before the max/min; PAVA
    // floors each POOL mean once. The two agree exactly whenever the
    // minimax attains its value on the pool interval (always, by the
    // PAVA<->minimax duality) — so per-bin equality is exact.
    rows.zip(perBin).foreach { case ((bin, _, _, iso), pv) =>
      assert(BigInt(iso) == pv, s"bin $bin: gate $iso vs PAVA $pv") }
  }

  test("q_ece equals the exact bin replay and is bounded by MCE") {
    // the bin census is read back through q_isotonic_calib's output
    // (same staging, different gate) — the replay below recomputes the
    // ECE/MCE formulas independently and pins cross-query consistency
    val bins = SparkEntry.queries("q_isotonic_calib")(spark, sf)
      .collect().map(r => (r.getAs[Long]("p_milli"),
        r.getAs[Long]("nb"), r.getAs[Long]("npb")))
    val n = bins.map(_._2).sum
    val gsum = bins.map { case (p, nb, npb) =>
      math.abs(p * nb - 1000 * npb) }.sum
    val mce = bins.map { case (p, nb, npb) =>
      math.abs(p - (1000 * npb) / nb) }.max
    val row = SparkEntry.queries("q_ece")(spark, sf).collect().head
    assert(row.getAs[Long]("n_docs") == n)
    assert(row.getAs[Long]("n_bins") == bins.length.toLong)
    assert(row.getAs[Long]("ece_micro") == 1000 * gsum / n)
    assert(row.getAs[Long]("mce_milli") == mce)
    // the mean absolute gap cannot exceed the max gap (floors aside:
    // per-bin rate floors shift gap_milli by < 1 milli each)
    assert(row.getAs[Long]("ece_micro") <=
      1000L * (row.getAs[Long]("mce_milli") + 1))
    // the toy model is known-miscalibrated on this corpus — a
    // near-zero ECE would mean the staging broke, not that the model
    // got better
    assert(row.getAs[Long]("ece_micro") > 10000L)
  }

  test("q_info_gain equals the brute-force best-threshold sweep") {
    import spark.implicits._
    val c = graft.sources.Tables.load(spark, sf, "customer")
      .select((col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("long"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L))
      .as[(Long, Long)].collect()
    val n = c.length.toLong
    val np = c.map(_._2).sum
    def h(a: Long, m: Long): Double =
      if (a > 0 && a < m)
        -(a.toDouble / m) * math.log(a.toDouble / m) -
          ((m - a).toDouble / m) * math.log((m - a).toDouble / m)
      else 0.0
    val byV = c.groupBy(_._1).map { case (v, xs) =>
      (v, xs.length.toLong, xs.map(_._2).sum) }.toArray.sortBy(_._1)
    var nl = 0L; var npl = 0L
    var bestKey = Long.MinValue
    val cands = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    for ((v, tv, pv) <- byV) {
      nl += tv; npl += pv
      if (nl < n) {
        val gain = h(np, n) - (nl.toDouble / n) * h(npl, nl) -
          ((n - nl).toDouble / n) * h(np - npl, n - nl)
        val gm = math.floor(1e6 * gain + 0.5).toLong
        cands(v) = (nl, npl, gm)
        val key = gm * 1000000000000L + (100000000000L - v)
        if (key > bestKey) bestKey = key
      }
    }
    val bestV = 100000000000L - bestKey % 1000000000000L
    val (bnl, bnpl, bgm) = cands(bestV)
    val row = SparkEntry.queries("q_info_gain")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n_customers") == n)
    assert(row.getAs[Long]("n_building") == np)
    assert(row.getAs[Long]("threshold_cents") == bestV)
    assert(row.getAs[Long]("n_left") == bnl)
    assert(row.getAs[Long]("n_pos_left") == bnpl)
    assert(row.getAs[Long]("gain_micro") == bgm)
    // gain is nonnegative by the information inequality
    assert(bgm >= 0L)
  }
}
