package graft

import org.apache.spark.sql.functions._

/** Semantics for the round-12 model-eval/association tranche
  * ([[graft.queries.StatOps6]]): scalar brute-force recomputes of exact
  * ROC-AUC (pairwise comparison count, not the rank identity), NDCG@10
  * (explicit sort-and-sum per nation), mutual information and Cramér's V
  * (direct contingency arithmetic), ANOVA F and Kruskal-Wallis H (direct
  * group sums / midranks), and Jarque-Bera (direct central moments) —
  * each independent of the distributed census/bucketed-cumsum plans, plus
  * the statistic-level sanity bands (AUC∈[0,1], NDCG≤1, MI≥0, V∈[0,1]).
  */
class StatOps6Spec extends SparkSpec {
  import spark.implicits._

  private def customers(): Array[(Long, Long, String, Int)] =
    graft.sources.Tables.load(spark, sf, "customer")
      .select(col("c_custkey"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long"),
        col("c_mktsegment"), col("c_nationkey"))
      .as[(Long, Long, String, Int)].collect()

  private def orderCents(): Array[(String, Long)] =
    graft.sources.Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .as[(String, Long)].collect()

  test("q_roc_auc equals the O(n²) pairwise recompute (ties count half) " +
      "and sits in (0, 1)") {
    val cs = customers()
    val pos = cs.filter(_._3 == "BUILDING").map(_._2)
    val neg = cs.filterNot(_._3 == "BUILDING").map(_._2)
    // U₁×2 = Σ_{p,n} (2·[p>n] + [p=n]) — the doubled-midrank identity's
    // pairwise ground truth
    var u1x2 = BigInt(0)
    for (p <- pos; n <- neg)
      u1x2 += (if (p > n) 2 else if (p == n) 1 else 0)
    val row = SparkEntry.queries("q_roc_auc")(spark, sf).collect().head
    assert(row.getAs[Long]("n_pos") == pos.length.toLong)
    assert(row.getAs[Long]("n_neg") == neg.length.toLong)
    assert(BigInt(row.getAs[Long]("u1x2")) == u1x2)
    assert(BigInt(row.getAs[Long]("auc_ppm")) ==
      BigInt(1000000) * u1x2 / (BigInt(2) * pos.length * neg.length))
    val auc = row.getAs[Long]("auc_ppm")
    assert(auc > 0 && auc < 1000000)
    // segment is assigned independently of balance → AUC near 1/2, never
    // at a degenerate extreme (a sign/direction bug would pin it)
    assert(auc > 200000 && auc < 800000)
  }

  test("q_ndcg equals the explicit per-nation sort recompute and each " +
      "ndcg_ppm is a valid [0, 1e6] ranking score") {
    val nat = graft.sources.Tables.load(spark, sf, "nation")
      .select(col("n_nationkey"), col("n_name"))
      .as[(Int, String)].collect().toMap
    def gain(seg: String): Long = seg match {
      case "BUILDING" => 7L; case "AUTOMOBILE" => 3L
      case "MACHINERY" => 1L; case _ => 0L
    }
    def term(g: Long, rank: Int): Long =
      math.floor(1000000.0 * g / (math.log(rank + 1.0) / math.log(2.0))
        + 0.5).toLong
    val byNation = customers().groupBy(c => nat(c._4))
    val expected = byNation.flatMap { case (name, cs) =>
      val actual = cs.sortBy(c => (-c._2, c._1)).take(10)
      val ideal = cs.sortBy(c => (-gain(c._3), -c._2, c._1)).take(10)
      val dcg = actual.zipWithIndex.map { case (c, i) =>
        term(gain(c._3), i + 1) }.sum
      val idcg = ideal.zipWithIndex.map { case (c, i) =>
        term(gain(c._3), i + 1) }.sum
      if (idcg > 0) Some(name -> ((dcg, idcg))) else None
    }
    val rows = SparkEntry.queries("q_ndcg")(spark, sf).collect()
      .map(r => r.getAs[String]("n_name") -> r).toMap
    assert(rows.keySet == expected.keySet)
    expected.foreach { case (name, (dcg, idcg)) =>
      val r = rows(name)
      assert(r.getAs[Long]("dcg_micro") == dcg, s"$name dcg")
      assert(r.getAs[Long]("idcg_micro") == idcg, s"$name idcg")
      assert(r.getAs[Long]("ndcg_ppm") == 1000000L * dcg / idcg, s"$name")
      assert(r.getAs[Long]("ndcg_ppm") >= 0 &&
        r.getAs[Long]("ndcg_ppm") <= 1000000L)
    }
  }

  test("q_mutual_info equals the direct contingency recompute and is " +
      "nonnegative up to per-cell micro-floor error") {
    val nat = graft.sources.Tables.load(spark, sf, "nation")
      .select(col("n_nationkey"), col("n_name"))
      .as[(Int, String)].collect().toMap
    val cells = customers().groupBy(c => (c._3, nat(c._4)))
      .map { case (k, xs) => k -> xs.length.toLong }
    val n = cells.values.sum
    val rx = cells.groupBy(_._1._1).map { case (k, xs) => k -> xs.values.sum }
    val sy = cells.groupBy(_._1._2).map { case (k, xs) => k -> xs.values.sum }
    val mi = cells.map { case ((seg, nm), c) =>
      math.floor(1000000.0 * (c.toDouble / n) *
        math.log(c.toDouble * n / (rx(seg).toDouble * sy(nm))) + 0.5).toLong
    }.sum
    val row = SparkEntry.queries("q_mutual_info")(spark, sf).collect().head
    assert(row.getAs[Long]("n_customers") == n)
    assert(row.getAs[Long]("n_cells") == cells.size.toLong)
    assert(row.getAs[Long]("mi_micro") == mi)
    // MI ≥ 0 exactly; the micro-floored cells can dip at most |cells|/2
    // micro-nats below
    assert(row.getAs[Long]("mi_micro") >= -cells.size.toLong)
  }

  test("q_cramers_v equals the direct χ² recompute and V lands in [0, 1]") {
    val reg = graft.sources.Tables.load(spark, sf, "region")
      .select(col("r_regionkey"), col("r_name"))
      .as[(Int, String)].collect().toMap
    val n2r = graft.sources.Tables.load(spark, sf, "nation")
      .select(col("n_nationkey"), col("n_regionkey"))
      .as[(Int, Int)].collect().toMap
    val cells = customers().groupBy(c => (c._3, reg(n2r(c._4))))
      .map { case (k, xs) => k -> BigInt(xs.length) }
    val n = cells.values.sum
    val rx = cells.groupBy(_._1._1).map { case (k, xs) => k -> xs.values.sum }
    val sy = cells.groupBy(_._1._2).map { case (k, xs) => k -> xs.values.sum }
    val chi2 = cells.map { case ((seg, rn), c) =>
      val d = c * n - rx(seg) * sy(rn)
      BigInt(1000000) * d * d / (n * rx(seg) * sy(rn))
    }.sum
    val row = SparkEntry.queries("q_cramers_v")(spark, sf).collect().head
    assert(BigInt(row.getAs[Long]("n_customers")) == n)
    assert(row.getAs[Long]("n_cells") == cells.size.toLong)
    assert(BigInt(row.getAs[Long]("chi2_micro")) == chi2)
    val v = row.getAs[Double]("v")
    assert(v >= 0.0 && v <= 1.0)
    val expectV = BigDecimal(math.sqrt(
      row.getAs[Long]("chi2_micro").toDouble / 1e6 / (n.toDouble * 4.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(v - expectV) < 1e-9)
  }

  test("q_anova_f equals the direct group-sum recompute; F is positive " +
      "and ssb + ssw = total SS") {
    val os = orderCents()
    val g = os.groupBy(_._1).map { case (k, xs) =>
      val vs = xs.map(x => BigInt(x._2))
      (k, vs.size, vs.sum, vs.map(v => v * v).sum)
    }
    val n = BigInt(os.length)
    val k = BigInt(g.size)
    val s = g.map(_._3).sum
    val q = g.map(_._4).sum
    val w = g.map(t => t._3 * t._3 / t._2).sum
    val ssb = w - s * s / n
    val ssw = q - w
    val row = SparkEntry.queries("q_anova_f")(spark, sf).collect().head
    assert(row.getAs[Long]("k_groups") == g.size.toLong)
    assert(BigInt(row.getAs[Long]("n_orders")) == n)
    assert(BigInt(row.getAs[Long]("ssb_kd2")) == ssb / BigInt(10).pow(10))
    assert(BigInt(row.getAs[Long]("ssw_kd2")) == ssw / BigInt(10).pow(10))
    assert(BigInt(row.getAs[Long]("f_ppm")) ==
      BigInt(1000000) * ssb * (n - k) / ((k - 1) * ssw))
    assert(row.getAs[Long]("f_ppm") > 0)
    // the group-frame truncations (⌊S_g²/n_g⌋, ⌊s²/n⌋) lose < k cents²
    // against a total SS of ~10¹⁸ — the partition identity holds to that
    val total = q - s * s / n
    assert((ssb + ssw - total).abs <= k)
  }

  test("q_kruskal_wallis equals the direct midrank recompute and H is " +
      "nonnegative") {
    val os = orderCents()
    val sorted = os.map(_._2).sorted
    def below(v: Long): Long = {
      var lo = 0; var hi = sorted.length
      while (lo < hi) {
        val m = (lo + hi) / 2
        if (sorted(m) < v) lo = m + 1 else hi = m
      }
      lo.toLong
    }
    val tv = os.groupBy(_._2).map { case (v, xs) => v -> xs.length.toLong }
    val perG = os.groupBy(_._1).map { case (gk, xs) =>
      val r2g = xs.map(x =>
        BigInt(2 * below(x._2) + tv(x._2) + 1)).sum
      (gk, xs.length.toLong, r2g)
    }
    val rankSs = perG.map(t => t._3 * t._3 / (4 * BigInt(t._2))).sum
    val ties = tv.values.map(t => BigInt(t) * t * t - t).sum
    val row = SparkEntry.queries("q_kruskal_wallis")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("k_groups") == perG.size.toLong)
    assert(row.getAs[Long]("n_orders") == os.length.toLong)
    // published cell is the 10⁶-scaled quartered rank-SS (sumterm grows
    // ∝n³ — 93·2⁵³ at the sf1 probe); H still closes on full precision
    assert(BigInt(row.getAs[Long]("rank_ss_e6")) == rankSs / 1000000)
    assert(BigInt(row.getAs[Long]("ties")) == ties)
    val n = os.length.toDouble
    val expectH = (12.0 * rankSs.toDouble / (n * (n + 1.0)) - 3.0 * (n + 1.0)) /
      (1.0 - ties.toDouble / (n * n * n - n))
    assert(math.abs(row.getAs[Double]("h") - expectH) < 1e-4)
    // H is a χ²-like statistic: ≥ 0 up to the group-frame truncations
    assert(row.getAs[Double]("h") > -1e-3)
  }

  test("q_jarque_bera equals the direct moment recompute; kurtosis of the " +
      "near-uniform quantity column sits below 3 (platykurtic)") {
    val xs = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(col("l_quantity").cast("long")).as[Long].collect()
    val n = xs.length.toDouble
    val mu = xs.sum / n
    val m2 = xs.map(x => (x - mu) * (x - mu)).sum / n
    val m3 = xs.map(x => math.pow(x - mu, 3)).sum / n
    val m4 = xs.map(x => math.pow(x - mu, 4)).sum / n
    val row = SparkEntry.queries("q_jarque_bera")(spark, sf).collect().head
    assert(row.getAs[Long]("n_rows") == xs.length.toLong)
    assert(math.abs(row.getAs[Double]("skewness") - m3 / (m2 * math.sqrt(m2)))
      < 1e-4)
    assert(math.abs(row.getAs[Double]("kurtosis") - m4 / (m2 * m2)) < 1e-4)
    val jb = n / 6.0 * (math.pow(m3 / (m2 * math.sqrt(m2)), 2) +
      math.pow(m4 / (m2 * m2) - 3.0, 2) / 4.0)
    assert(math.abs(row.getAs[Double]("jb") - jb) < math.max(1e-3, jb * 1e-4))
    // quantity is ~uniform on [1, 50]: kurtosis ≈ 1.8, far from normal —
    // the screen must flag it (large JB), not pass it
    assert(row.getAs[Double]("kurtosis") < 3.0)
    assert(row.getAs[Double]("jb") > 10.0)
  }
}
