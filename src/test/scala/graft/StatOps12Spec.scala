package graft

import org.apache.spark.sql.functions._

/** Semantics for the round-12 ordinal-association/agreement tranche
  * ([[graft.queries.StatOps12]]): scalar replays of the Cochran cells,
  * a from-scratch O(n²) concordant/discordant pair count (vs the
  * query's contingency-cell arithmetic), the weighted-kappa
  * contingency, and the POSITIONAL Anderson-Darling sum (vs the
  * query's census/below formulation — the identity between the two is
  * exactly what the spec pins), plus the statistics' structural
  * ranges.
  */
class StatOps12Spec extends SparkSpec {

  test("q_cochran_q equals the direct presence replay; Q >= 0") {
    val x = graft.sources.Tables.load(spark, sf, "events")
      .filter(col("value") > 200.0)
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val k = x.map(_._2).distinct.size.toLong
    val cj = x.groupBy(_._2).map(_._2.length.toLong)
    val ri = x.groupBy(_._1).map(_._2.length.toLong)
    val n = cj.sum
    val row = SparkEntry.queries("q_cochran_q")(spark, sf).collect().head
    assert(row.getAs[Long]("k") == k)
    assert(row.getAs[Long]("n_users") == ri.size.toLong)
    assert(row.getAs[Long]("n_total") == n)
    assert(row.getAs[Long]("sum_c2") == cj.map(c => c * c).sum)
    assert(row.getAs[Long]("sum_r2") == ri.map(r => r * r).sum)
    val q = (k - 1).toDouble * (k * cj.map(c => c * c).sum - n * n) /
      (k * n - ri.map(r => r * r).sum).toDouble
    assert(math.abs(row.getAs[Double]("q") - q) < 1e-6)
    assert(row.getAs[Double]("q") >= 0.0)
  }

  test("q_gamma_somers equals the direct O(n^2) pair count; gamma in " +
      "[-1e6, 1e6] and |D| <= |gamma| (ties only shrink)") {
    val oc = graft.sources.Tables.load(spark, sf, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val xs = graft.sources.Tables.load(spark, sf, "customer")
      .select(col("c_custkey"),
        expr("""(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
               | + 100000) div 200000""".stripMargin).as("x"))
      .collect()
      .map(r => (r.getLong(1), math.min(oc.getOrElse(r.getLong(0), 0L), 3L)))
    var cc = BigInt(0); var dd = BigInt(0)
    for (i <- xs.indices; j <- (i + 1) until xs.length) {
      val (xi, yi) = xs(i); val (xj, yj) = xs(j)
      if (xi != xj && yi != yj) {
        if ((xi < xj) == (yi < yj)) cc += 1 else dd += 1
      }
    }
    val n = xs.length.toLong
    val p = BigInt(n) * (n - 1) / 2
    val tX = xs.groupBy(_._1).values
      .map(g => BigInt(g.size) * (g.size - 1) / 2).sum
    val tY = xs.groupBy(_._2).values
      .map(g => BigInt(g.size) * (g.size - 1) / 2).sum
    val row = SparkEntry.queries("q_gamma_somers")(spark, sf)
      .collect().head
    assert(BigInt(row.getAs[Long]("c_pairs")) == cc)
    assert(BigInt(row.getAs[Long]("d_pairs")) == dd)
    assert(BigInt(row.getAs[Long]("ties_x")) == tX)
    assert(BigInt(row.getAs[Long]("ties_y")) == tY)
    assert(row.getAs[Long]("n") == n)
    assert(BigInt(row.getAs[Long]("gamma_ppm")) ==
      BigInt(1000000) * (cc - dd) / (cc + dd))
    assert(BigInt(row.getAs[Long]("somers_d_yx_ppm")) ==
      BigInt(1000000) * (cc - dd) / (p - tX))
    assert(BigInt(row.getAs[Long]("somers_d_xy_ppm")) ==
      BigInt(1000000) * (cc - dd) / (p - tY))
    val g = row.getAs[Long]("gamma_ppm")
    assert(g >= -1000000L && g <= 1000000L)
    // both D denominators include the ties gamma drops, so |D| ≤ |γ|
    // (up to one trunc unit each)
    assert(math.abs(row.getAs[Long]("somers_d_yx_ppm")) <=
      math.abs(g) + 1)
    assert(math.abs(row.getAs[Long]("somers_d_xy_ppm")) <=
      math.abs(g) + 1)
  }

  test("q_kappa_weighted equals the direct contingency replay; " +
      "kappa_w strongly positive (chars and tokens co-grade length)") {
    val g = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("n_chars"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("long").as("tc"))
      .collect()
      .map(r => (math.min(r.getLong(0) / 150, 3L),
        math.min(r.getLong(1) / 25, 3L)))
    val n = g.length.toLong
    val num = g.map { case (a, b) => (a - b) * (a - b) }.sum
    val ra = g.groupBy(_._1).map { case (a, rs) => a -> rs.length.toLong }
    val cb = g.groupBy(_._2).map { case (b, rs) => b -> rs.length.toLong }
    val den = (for ((a, na) <- ra; (b, nb) <- cb)
      yield BigInt((a - b) * (a - b)) * na * nb).sum
    val row = SparkEntry.queries("q_kappa_weighted")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n_docs") == n)
    assert(row.getAs[Long]("w_observed") == num)
    assert(BigInt(row.getAs[Long]("w_expected_xn")) == den)
    assert(BigInt(row.getAs[Long]("kappa_w_ppm")) ==
      BigInt(1000000) * (den - BigInt(n) * num) / den)
    // character count and token count genuinely co-grade document
    // length — the agreement must be strong, not incidental
    assert(row.getAs[Long]("kappa_w_ppm") > 500000L)
  }

  test("q_ad_uniform equals the direct POSITIONAL replay (the census " +
      "identity) and rejects uniformity hard on the skewed corpus") {
    val vs = graft.sources.Tables.load(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select((col("value").cast("decimal(18,6)") * 1000).cast("long"))
      .collect()
      .map(r => math.min(math.max(r.getLong(0), 1L), 599999L)).sorted
    val n = vs.length
    def l1(v: Long) =
      math.floor(1e6 * math.log(v.toDouble / 600000.0) + 0.5).toLong
    def l2(v: Long) =
      math.floor(1e6 * math.log(1.0 - v.toDouble / 600000.0) + 0.5).toLong
    var s1 = BigInt(0); var s2 = BigInt(0)
    for (i <- 1 to n) {
      s1 += BigInt(2 * i - 1) * l1(vs(i - 1))
      s2 += BigInt(2 * (n - i) + 1) * l2(vs(i - 1))
    }
    val row = SparkEntry.queries("q_ad_uniform")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n_events") == n.toLong)
    assert(BigInt(row.getAs[Long]("s1_e12")) == s1 / BigInt(10).pow(12))
    assert(BigInt(row.getAs[Long]("s2_e12")) == s2 / BigInt(10).pow(12))
    // the trunc-decomposed closing: (s1+s2)/10⁶ = t6 + r6/10⁶ exactly
    val t6 = (s1 + s2) / 1000000
    val r6 = (s1 + s2) % 1000000
    val a2 = -n.toDouble - (t6.toDouble + r6.toDouble / 1e6) / n
    assert(math.abs(row.getAs[Double]("a2") - a2) < 1e-6)
    // the value corpus is strongly right-skewed — AD must reject
    // uniformity decisively (critical value at 1% is ~3.9)
    assert(row.getAs[Double]("a2") > 10.0)
  }
}
