package graft

import org.apache.spark.sql.functions._

/** Semantics for the round-12 distance/paired-eval tranche
  * ([[graft.queries.StatOps7]]): scalar brute-force recomputes of the
  * Wasserstein-1 mass (direct CDF walk over sorted values), the decile
  * gains cuts, Cohen's d cells, the Brown-Forsythe statistic with
  * explicitly recomputed per-group lower medians, and the McNemar /
  * Fleiss cells — each independent of the distributed census /
  * bucketed-cumsum plans, plus statistic-level sanity bands.
  */
class StatOps7Spec extends SparkSpec {
  import spark.implicits._

  private def orderCents(): Array[(String, Long)] =
    graft.sources.Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .as[(String, Long)].collect()

  /** lower median: smallest v with #{x ≤ v} ≥ ⌈n/2⌉ */
  private def lowerMedian(xs: Array[Long]): Long = {
    val s = xs.sorted
    s(((s.length + 1) / 2) - 1)
  }

  test("q_wasserstein equals the direct CDF walk over the merged sorted " +
      "value census and is symmetric-positive") {
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(expr("unix_micros(ts) div 86400000000").as("day"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("long").as("v"))
      .as[(Long, Long)].collect()
    val mid = (ev.map(_._1).min + ev.map(_._1).max + 1) / 2
    val a = ev.filter(_._1 < mid).map(_._2)
    val b = ev.filter(_._1 >= mid).map(_._2)
    val vs = (a ++ b).distinct.sorted
    var ca = 0L; var cb = 0L
    var mass = BigInt(0)
    vs.zipWithIndex.foreach { case (v, i) =>
      ca += a.count(_ == v); cb += b.count(_ == v)
      if (i + 1 < vs.length)
        mass += (BigInt(ca) * b.length - BigInt(cb) * a.length).abs *
          (vs(i + 1) - v)
    }
    val row = SparkEntry.queries("q_wasserstein")(spark, sf).collect().head
    assert(row.getAs[Long]("n_base") == a.length.toLong)
    assert(row.getAs[Long]("n_cur") == b.length.toLong)
    assert(row.getAs[Long]("n_values") == vs.length.toLong)
    assert(BigInt(row.getAs[Long]("w1_micro")) ==
      mass / (BigInt(a.length) * b.length))
    // two halves of the same generator: small but positive distance,
    // far below the distribution's own scale (~250 units)
    assert(row.getAs[Long]("w1_micro") > 0)
    assert(row.getAs[Long]("w1_micro") < 250L * 1000000L)
  }

  test("q_lift_gains equals the direct sorted-cut recompute; decile 10 " +
      "is the whole population at lift exactly 1") {
    val cs = graft.sources.Tables.load(spark, sf, "customer")
      .select((col("c_acctbal").cast("decimal(18,2)") * 100).cast("long"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L))
      .as[(Long, Long)].collect()
    val n = cs.length.toLong
    val n1 = cs.map(_._2).sum
    val rows = SparkEntry.queries("q_lift_gains")(spark, sf).collect()
      .map(r => r.getAs[Long]("decile") -> r).toMap
    assert(rows.keySet == (1L to 10L).toSet)
    for (d <- 1L to 10L) {
      val target = (n * d + 9) / 10
      // smallest top-set by value with >= target members
      val cut = cs.map(_._1).distinct.sorted(Ordering[Long].reverse)
        .find(v => cs.count(_._1 >= v) >= target).get
      val nCum = cs.count(_._1 >= cut).toLong
      val posCum = cs.filter(_._1 >= cut).map(_._2).sum
      val r = rows(d)
      assert(r.getAs[Long]("cut_cents") == cut, s"d=$d cut")
      assert(r.getAs[Long]("n_cum") == nCum, s"d=$d n_cum")
      assert(r.getAs[Long]("pos_cum") == posCum, s"d=$d pos_cum")
      assert(r.getAs[Long]("gain_ppm") == 1000000L * posCum / n1)
      assert(BigInt(r.getAs[Long]("lift_ppm")) ==
        BigInt(1000000) * posCum * n / (BigInt(n1) * nCum))
    }
    assert(rows(10L).getAs[Long]("n_cum") == n)
    assert(rows(10L).getAs[Long]("gain_ppm") == 1000000L)
    assert(rows(10L).getAs[Long]("lift_ppm") == 1000000L)
    // gains are monotone in the decile
    val gains = (1L to 10L).map(d => rows(d).getAs[Long]("gain_ppm"))
    assert(gains == gains.sorted)
  }

  test("q_cohens_d equals the direct recompute and |d| is small (segment " +
      "priority is independent of price in the fixture)") {
    val os = orderCents()
    val g1 = os.filter(o => o._1 == "1-URGENT" || o._1 == "2-HIGH").map(_._2)
    val g0 = os.filterNot(o => o._1 == "1-URGENT" || o._1 == "2-HIGH")
      .map(_._2)
    def ss(xs: Array[Long]): BigInt = {
      val s = xs.map(BigInt(_)).sum
      xs.map(x => BigInt(x) * x).sum - s * s / xs.length
    }
    val s1 = g1.map(BigInt(_)).sum
    val s0 = g0.map(BigInt(_)).sum
    val dmu = BigInt(1000000) * (s1 * g0.length - s0 * g1.length) /
      (BigInt(g1.length) * g0.length)
    val sp2 = (ss(g1) + ss(g0)) / (g1.length + g0.length - 2)
    val row = SparkEntry.queries("q_cohens_d")(spark, sf).collect().head
    assert(row.getAs[Long]("n_urgent") == g1.length.toLong)
    assert(row.getAs[Long]("n_rest") == g0.length.toLong)
    assert(BigInt(row.getAs[Long]("dmu_micro")) == dmu)
    assert(BigInt(row.getAs[Long]("sp2_c2")) == sp2)
    val d = row.getAs[Double]("d")
    assert(math.abs(d - dmu.toDouble / 1e6 / math.sqrt(sp2.toDouble)) < 1e-6)
    assert(math.abs(d) < 0.5, s"|d| = $d — priority should not move price")
  }

  test("q_levene_bf equals the direct recompute with explicit per-group " +
      "lower medians") {
    val os = orderCents()
    val med = os.groupBy(_._1).map { case (g, xs) =>
      g -> lowerMedian(xs.map(_._2)) }
    val z = os.map { case (g, x) => (g, (x - med(g)).abs) }
    val perG = z.groupBy(_._1).map { case (_, xs) =>
      val vs = xs.map(_._2)
      val s = vs.map(BigInt(_)).sum
      (vs.length, s, vs.map(v => BigInt(v) * v).sum, s * s / vs.length)
    }
    val n = BigInt(z.length)
    val k = BigInt(perG.size)
    val s = perG.map(_._2).sum
    val q = perG.map(_._3).sum
    val w = perG.map(_._4).sum
    val ssb = w - s * s / n
    val ssw = q - w
    val row = SparkEntry.queries("q_levene_bf")(spark, sf).collect().head
    assert(row.getAs[Long]("k_groups") == perG.size.toLong)
    assert(BigInt(row.getAs[Long]("n_orders")) == n)
    assert(BigInt(row.getAs[Long]("ssb_zkd2")) == ssb / BigInt(10).pow(10))
    assert(BigInt(row.getAs[Long]("ssw_zkd2")) == ssw / BigInt(10).pow(10))
    assert(BigInt(row.getAs[Long]("w_ppm")) ==
      BigInt(1000000) * ssb * (n - k) / ((k - 1) * ssw))
    assert(row.getAs[Long]("w_ppm") >= 0)
  }

  /** shared scalar rater frame for the McNemar / Fleiss replays */
  private def raters(): Array[(Long, Long, Long, Long)] = {
    val lc = graft.sources.Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().toMap
    val med = lowerMedian(orderCents().map(_._2))
    graft.sources.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_orderstatus"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .as[(Long, String, String, Long)].collect()
      .map { case (k, pri, st, tc) =>
        (if (pri == "1-URGENT" || pri == "2-HIGH") 1L else 0L,
          if (tc > med) 1L else 0L,
          if (lc.getOrElse(k, 0L) >= 4) 1L else 0L,
          if (st == "F") 1L else 0L)
      }
  }

  test("q_mcnemar equals the direct discordant-cell recompute") {
    val rs = raters()
    val b = rs.count(r => r._2 == r._1 && r._3 != r._1).toLong
    val c = rs.count(r => r._2 != r._1 && r._3 == r._1).toLong
    val row = SparkEntry.queries("q_mcnemar")(spark, sf).collect().head
    assert(row.getAs[Long]("n_orders") == rs.length.toLong)
    assert(row.getAs[Long]("b") == b)
    assert(row.getAs[Long]("c") == c)
    val expect = (math.abs(b.toDouble - c) - 1.0) *
      (math.abs(b.toDouble - c) - 1.0) / (b.toDouble + c)
    assert(math.abs(row.getAs[Double]("chi2_cc") - expect) < 1e-6)
    // both raters disagree with truth somewhere — the test has power
    assert(b + c > 0)
  }

  test("q_fleiss_kappa equals the direct cell recompute and kappa lands " +
      "in (-1, 1)") {
    val rs = raters()
    val n1s = rs.map(r => r._2 + r._3 + r._4)
    val n = rs.length.toLong
    val sum1 = n1s.sum
    val sumsq = n1s.map(x => x * x + (3 - x) * (3 - x)).sum
    val row = SparkEntry.queries("q_fleiss_kappa")(spark, sf).collect().head
    assert(row.getAs[Long]("n_orders") == n)
    assert(row.getAs[Long]("sum1") == sum1)
    assert(row.getAs[Long]("sumsq") == sumsq)
    val pbar = (sumsq.toDouble - 3.0 * n) / (6.0 * n)
    val p1 = sum1.toDouble / (3.0 * n)
    val pe = p1 * p1 + (1 - p1) * (1 - p1)
    assert(math.abs(row.getAs[Double]("pbar") - pbar) < 1e-6)
    assert(math.abs(row.getAs[Double]("pe") - pe) < 1e-6)
    val kappa = row.getAs[Double]("kappa")
    assert(math.abs(kappa - (pbar - pe) / (1 - pe)) < 1e-4)
    assert(kappa > -1.0 && kappa < 1.0)
  }
}
