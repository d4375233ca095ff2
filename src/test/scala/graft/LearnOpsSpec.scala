package graft

import org.apache.spark.sql.functions._

/** Semantics for the supervised-learning tranche
  * ([[graft.queries.LearnOps]]): the logistic GD replayed round-for-
  * round in Scala (same IEEE formula text over the same exact census
  * cells — bit-equality is the claim), and the OLS coefficients against
  * an independent BigInt Cramer solve.
  */
class LearnOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q_logistic_gd equals the 5-round scalar replay bit-for-bit; " +
      "the null-signal fit converges toward the intercept log-odds") {
    val census = graft.sources.Tables.load(spark, sf, "customer")
      .select((col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("long").as("cents"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L)
          .as("pos"))
      .groupBy(col("cents"))
      .agg(count(lit(1)).as("tv"), sum(col("pos")).as("pv"))
      .as[(Long, Long, Long)].collect()
    val n = census.map(_._2).sum
    val np = census.map(_._3).sum
    var w = 0L; var b = 0L
    for (_ <- 1 to 5) {
      var gw = 0L; var gb = 0L
      for ((cents, tv, pv) <- census) {
        val z = (w.toDouble * (cents.toDouble / 100000.0) + b) / 1000000.0
        val p = 1.0 / (1.0 + math.exp(-z))
        gw += math.floor(1000000.0 * (tv * p - pv)
          * (cents.toDouble / 100000.0) + 0.5).toLong
        gb += math.floor(1000000.0 * (tv * p - pv) + 0.5).toLong
      }
      w -= gw / (10 * n) // Long / is trunc ≡ div ≡ HUGEINT //
      b -= gb / (10 * n)
    }
    val correct = census.map { case (cents, tv, pv) =>
      if (w * cents + 100000 * b > 0) pv else tv - pv }.sum
    val row = SparkEntry.queries("q_logistic_gd")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n_customers") == n)
    assert(row.getAs[Long]("n_building") == np)
    assert(row.getAs[Long]("w_micro") == w, s"w: got ${row.getAs[Long]("w_micro")} want $w")
    assert(row.getAs[Long]("b_micro") == b)
    assert(row.getAs[Long]("n_correct") == correct)
    assert(row.getAs[Long]("acc_ppm") == 1000000L * correct / n)
    // balance carries no segment signal: after 5 rounds the intercept
    // must have moved TOWARD the negative log-odds of the ~20% class
    // (strictly negative); accuracy is a readout, not a guarantee —
    // only its range is a law
    assert(b < 0L)
    assert(row.getAs[Long]("acc_ppm") >= 0L &&
      row.getAs[Long]("acc_ppm") <= 1000000L)
  }

  test("q_ols_multi equals the independent BigInt Cramer solve; both " +
      "size features carry positive price signal") {
    val rows = graft.sources.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"),
        expr("""CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
          | AS BIGINT) div 1000""".stripMargin
          .replaceAll("\\s+", " ")).as("y"))
      .join(graft.sources.Tables.load(spark, sf, "lineitem")
          .groupBy(col("l_orderkey").as("o_orderkey"))
          .agg(count(lit(1)).as("x1"),
            sum(col("l_quantity").cast("long")).as("x2")),
        Seq("o_orderkey"))
      .select(col("x1"), col("x2"), col("y"))
      .as[(Long, Long, Long)].collect()
    val n = BigInt(rows.length)
    def s(f: ((Long, Long, Long)) => BigInt) = rows.map(f).sum
    val s1 = s(r => BigInt(r._1)); val s2 = s(r => BigInt(r._2))
    val sy = s(r => BigInt(r._3))
    val s11 = s(r => BigInt(r._1) * r._1)
    val s12 = s(r => BigInt(r._1) * r._2)
    val s22 = s(r => BigInt(r._2) * r._2)
    val s1y = s(r => BigInt(r._1) * r._3)
    val s2y = s(r => BigInt(r._2) * r._3)
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val det0 = sy * (s11 * s22 - s12 * s12) -
      s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)
    val det1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)
    val row = SparkEntry.queries("q_ols_multi")(spark, sf)
      .collect().head
    assert(BigInt(row.getAs[Long]("n_orders")) == n)
    assert(BigInt(row.getAs[Long]("b0_ppm")) == BigInt(1000000) * det0 / det)
    assert(BigInt(row.getAs[Long]("b1_ppm")) == BigInt(1000000) * det1 / det)
    assert(BigInt(row.getAs[Long]("b2_ppm")) == BigInt(1000000) * det2 / det)
    // an order's total price grows with BOTH its line count and its
    // quantity by construction of the corpus
    assert(row.getAs[Long]("b1_ppm") > 0L || row.getAs[Long]("b2_ppm") > 0L)
  }
}
