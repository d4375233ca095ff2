package graft

import org.apache.spark.sql.functions._

/** Semantics for the round-12 reliability/agreement tranche
  * ([[graft.queries.StatOps10]]): scalar brute-force replays of the
  * Cronbach variance cells, the Kendall midrank/rank-sum arithmetic,
  * and the 2×2 contingency — independent of the distributed plans —
  * plus statistic-level bands (α ≤ 1, W ∈ [0, 1], CI brackets the
  * point estimate).
  */
class StatOps10Spec extends SparkSpec {

  test("q_cronbach_alpha equals the direct BigInt variance-cell replay " +
      "and alpha_ppm is at most 1e6") {
    val cells = graft.sources.Tables.load(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("event_type"),
        (col("value").cast("decimal(18,6)") * 1000).cast("long").as("vm"))
      .collect()
      .groupBy(r => (r.getLong(0), r.getString(1)))
      .map { case (k, rs) => (k._1, k._2, rs.map(_.getLong(2)).sum) }
      .toSeq
    val users = cells.map(_._1).distinct
    val items = cells.map(_._2).distinct
    val n = BigInt(users.size)
    val k = BigInt(items.size)
    val di = items.map { it =>
      val xs = cells.filter(_._2 == it).map(c => BigInt(c._3))
      n * xs.map(x => x * x).sum - xs.sum * xs.sum
    }.sum
    val tots = users.map { u =>
      BigInt(cells.filter(_._1 == u).map(_._3).sum) }
    val dt = n * tots.map(x => x * x).sum - tots.sum * tots.sum
    val expect = (BigInt(1000000) * k * (dt - di)) / ((k - 1) * dt)
    val row = SparkEntry.queries("q_cronbach_alpha")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("k_items") == items.size.toLong)
    assert(row.getAs[Long]("n_users") == users.size.toLong)
    assert(BigInt(row.getAs[Long]("alpha_ppm")) == expect)
    // α = k/(k−1)·(1 − ΣVᵢ/V_t) ≤ k/(k−1) always, and with ANY
    // positive item variance the ratio term keeps it at or below 1e6
    assert(row.getAs[Long]("alpha_ppm") <= 1000000L)
  }

  test("q_kendall_w equals the direct midrank replay; W in [0,1] and " +
      "Friedman chi2 = m(n-1)W") {
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val o = graft.sources.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cu = graft.sources.Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val p = graft.sources.Tables.load(spark, sf, "part")
      .select(col("p_partkey"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val nations = graft.sources.Tables.load(spark, sf, "nation")
      .select(col("n_nationkey")).collect().map(_.getInt(0)).sorted
    val brands = p.values.toSeq.distinct.sorted
    val rev = li.groupBy(t => (cu(o(t._1)), p(t._2)))
      .map { case (key, rs) => key -> rs.map(_._3).sum }
    val m = nations.size
    val nIt = brands.size
    // midranks in doubled units per nation over the zero-filled design
    var ties = 0L
    val r2 = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
    for (nk <- nations) {
      val vals = brands.map(b => b -> rev.getOrElse((nk, b), 0L))
      val byV = vals.groupBy(_._2)
      for ((v, grp) <- byV) {
        val below = vals.count(_._2 < v).toLong
        val t = grp.size.toLong
        ties += t * t * t - t
        val mr2 = 2 * below + t + 1
        grp.foreach { case (b, _) => r2(b) += mr2 }
      }
    }
    val s4 = brands.map { b =>
      val d = r2(b) - m.toLong * (nIt + 1); BigInt(d) * d }.sum
    val denom = BigInt(m) * m * (BigInt(nIt) * nIt * nIt - nIt) -
      BigInt(m) * ties
    val expectW = BigInt(1000000) * 3 * s4 / denom
    val row = SparkEntry.queries("q_kendall_w")(spark, sf).collect().head
    assert(row.getAs[Long]("m_raters") == m.toLong)
    assert(row.getAs[Long]("n_items") == nIt.toLong)
    assert(BigInt(row.getAs[Long]("s4")) == s4)
    assert(row.getAs[Long]("ties") == ties)
    assert(BigInt(row.getAs[Long]("w_ppm")) == expectW)
    assert(row.getAs[Long]("w_ppm") >= 0L &&
      row.getAs[Long]("w_ppm") <= 1000000L)
    assert(math.abs(row.getAs[Double]("friedman_chi2") -
      m.toDouble * (nIt - 1) * row.getAs[Long]("w_ppm") / 1e6) < 1e-9)
  }

  test("q_odds_ratio equals the direct 2x2 counts; CI brackets the " +
      "point estimate and RR sits between OR and 1") {
    val o = graft.sources.Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderstatus")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val cu = graft.sources.Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cells = o.map { case (ck, st) =>
      (cu(ck) == "BUILDING", st == "F") }
    val a = cells.count(c => c._1 && c._2).toLong
    val b = cells.count(c => c._1 && !c._2).toLong
    val c = cells.count(x => !x._1 && x._2).toLong
    val d = cells.count(x => !x._1 && !x._2).toLong
    val row = SparkEntry.queries("q_odds_ratio")(spark, sf).collect().head
    assert(row.getAs[Long]("a") == a && row.getAs[Long]("b") == b &&
      row.getAs[Long]("c") == c && row.getAs[Long]("d") == d)
    val or = a.toDouble * d / (b.toDouble * c)
    assert(math.abs(row.getAs[Double]("odds_ratio") - or) < 1e-6)
    assert(row.getAs[Double]("ci_lo") <= row.getAs[Double]("odds_ratio"))
    assert(row.getAs[Double]("ci_hi") >= row.getAs[Double]("odds_ratio"))
    // risk ratio is always the attenuated effect: |ln RR| ≤ |ln OR|
    val rr = row.getAs[Double]("risk_ratio")
    assert(math.abs(math.log(rr)) <=
      math.abs(math.log(row.getAs[Double]("odds_ratio"))) + 1e-9)
  }

  test("q_icc equals the direct BigInt ANOVA replay over the " +
      "nation-brand design; ICC sits in its defining range") {
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val o = graft.sources.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cu = graft.sources.Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val p = graft.sources.Tables.load(spark, sf, "part")
      .select(col("p_partkey"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val nations = graft.sources.Tables.load(spark, sf, "nation")
      .select(col("n_nationkey")).collect().map(_.getInt(0))
    val brands = p.values.toSeq.distinct.sorted
    val rev = li.groupBy(t => (cu(o(t._1)), p(t._2)))
      .map { case (key, rs) => key -> rs.map(_._3).sum }
    val n = BigInt(brands.size)
    val k = BigInt(nations.length)
    val groups = brands.map { b =>
      val vs = nations.map(nk => BigInt(rev.getOrElse((nk, b), 0L)))
      (vs.sum, vs.map(v => v * v).sum)
    }
    val s = groups.map(_._1).sum
    val q = groups.map(_._2).sum
    val w = groups.map(g => g._1 * g._1 / k).sum
    val ssb = w - s * s / (n * k)
    val ssw = q - w
    val icc = BigInt(1000000) * (n * (k - 1) * ssb - (n - 1) * ssw) /
      (n * (k - 1) * ssb + (k - 1) * (n - 1) * ssw)
    val row = SparkEntry.queries("q_icc")(spark, sf).collect().head
    assert(BigInt(row.getAs[Long]("n_brands")) == n)
    assert(BigInt(row.getAs[Long]("k_raters")) == k)
    assert(BigInt(row.getAs[Long]("ssb_kd2")) ==
      ssb / BigInt(10000000000L))
    assert(BigInt(row.getAs[Long]("ssw_kd2")) ==
      ssw / BigInt(10000000000L))
    assert(BigInt(row.getAs[Long]("icc_ppm")) == icc)
    // ICC(1) ∈ [−1/(k−1), 1] by definition
    assert(row.getAs[Long]("icc_ppm") >= -1000000L / (k.toLong - 1) - 1)
    assert(row.getAs[Long]("icc_ppm") <= 1000000L)
  }
}
