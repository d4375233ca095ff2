package graft

import org.apache.spark.sql.functions._

/** Semantics for the round-12 concentration/richness/audit tranche
  * ([[graft.queries.StatOps4]]): scalar brute-force recomputes of the
  * Gini sum, the Lorenz prefixes, HHI/CR4, the Benford cells, the
  * Chao1 spectrum and the Theil sum — independent of the distributed
  * census + bucketed-cumsum plans.
  */
class StatOps4Spec extends SparkSpec {
  import spark.implicits._

  private def spendCents(): Array[Long] =
    graft.sources.Tables.load(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("x"))
      .as[(Long, Long)].collect().map(_._2)

  test("q_gini equals the sorted brute-force rank formula") {
    val xs = spendCents().sorted
    val n = xs.length.toLong
    val tt = xs.map(BigInt(_)).sum
    val s = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val expected = (BigInt(1000000) * (2 * s - (n + 1) * tt)) / (n * tt)
    val row = SparkEntry.queries("q_gini_spend")(spark, sf).collect().head
    assert(row.getAs[Long]("n_customers") == n)
    assert(BigInt(row.getAs[Long]("total_cents")) == tt)
    assert(BigInt(row.getAs[Long]("gini_ppm")) == expected)
    // sanity: inequality of real spend sits strictly inside (0, 1)
    assert(row.getAs[Long]("gini_ppm") > 0 &&
      row.getAs[Long]("gini_ppm") < 1000000)
  }

  test("q_lorenz: prefix masses match the sorted array; shares are " +
      "monotone and end below the k/10 diagonal (Lorenz convexity)") {
    val xs = spendCents().sorted
    val n = xs.length.toLong
    val tt = xs.map(BigInt(_)).sum
    val got = SparkEntry.queries("q_lorenz_spend")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == (1L to 9L))
    got.foreach { case (k, p, cum, ppm) =>
      assert(p == k * n / 10)
      val expected = xs.take(p.toInt).map(BigInt(_)).sum
      assert(BigInt(cum) == expected, s"decile $k prefix mass")
      assert(BigInt(ppm) == BigInt(1000000) * expected / tt)
      // Lorenz curve sits on or under the equality diagonal
      assert(ppm <= k * 100000)
    }
    assert(got.map(_._4).toSeq == got.map(_._4).toSeq.sorted,
      "shares must be monotone in k")
  }

  test("q_hhi equals brute force and CR4 covers the 4 largest brands") {
    val rev = graft.sources.Tables.load(spark, sf, "lineitem")
      .join(graft.sources.Tables.load(spark, sf, "part")
        .select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("c"))
      .as[(String, Long)].collect()
    val tt = rev.map(r => BigInt(r._2)).sum
    val sq = rev.map(r => BigInt(r._2) * r._2).sum
    val c4 = rev.sortBy(r => (-r._2, r._1)).take(4)
      .map(r => BigInt(r._2)).sum
    val row = SparkEntry.queries("q_hhi")(spark, sf).collect().head
    assert(row.getAs[Long]("n_brands") == rev.length.toLong)
    assert(BigInt(row.getAs[Long]("hhi_ppm")) ==
      BigInt(1000000) * sq / (tt * tt))
    assert(BigInt(row.getAs[Long]("cr4_ppm")) == BigInt(1000000) * c4 / tt)
    // HHI of k brands is bounded below by the uniform 10⁶/k
    assert(row.getAs[Long]("hhi_ppm") >= 1000000L / rev.length)
  }

  test("q_benford: observed cells partition the orders; expectation " +
      "ppms sum to ~10⁶; chi2 terms are nonnegative") {
    val rows = SparkEntry.queries("q_benford_chi2")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("digit")).toSeq == (1L to 9L))
    val nOrders = graft.sources.Tables.load(spark, sf, "orders").count()
    assert(rows.map(_.getAs[Long]("n_obs")).sum == nOrders)
    val expSum = rows.map(_.getAs[Long]("exp_ppm")).sum
    assert(math.abs(expSum - 1000000L) <= 5, s"exp ppm sum $expSum")
    assert(rows.forall(_.getAs[Double]("chi2_term") >= 0.0))
    // the leading digit of a real price distribution is 1 more often
    // than 9 (weak Benford direction — guards a digit-extraction bug)
    val byDigit = rows.map(r =>
      r.getAs[Long]("digit") -> r.getAs[Long]("n_obs")).toMap
    assert(byDigit(1L) > byDigit(9L))
  }

  test("q_chao1 matches the brute-force frequency spectrum and bounds " +
      "observed vocabulary from below") {
    // the engine's unit is the word TRIGRAM over normalized text
    // (wordNgrams(c, 3)): lowercase, whitespace-collapse, then
    // max(L-2, 1) length-3 slices — replicated scalar-side here
    val counts = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("text")).as[String].collect()
      .flatMap { txt =>
        val a = txt.replaceAll("^\\s+|\\s+$", "").toLowerCase
          .split("\\s+")
        (1 to math.max(a.length - 2, 1))
          .map(i => a.slice(i - 1, i + 2).mkString(" "))
      }
      .groupBy(identity).map(_._2.length)
    val v = counts.size.toLong
    val n = counts.map(_.toLong).sum
    val f1 = counts.count(_ == 1).toLong
    val f2 = counts.count(_ == 2).toLong
    val row = SparkEntry.queries("q_chao1")(spark, sf).collect().head
    assert(row.getAs[Long]("v_obs") == v)
    assert(row.getAs[Long]("n_tokens") == n)
    assert(row.getAs[Long]("f1") == f1)
    assert(row.getAs[Long]("f2") == f2)
    assert(row.getAs[Long]("chao1_milli") ==
      1000L * v + (1000L * f1 * f1) / (2L * f2))
    assert(row.getAs[Long]("chao1_milli") >= 1000L * v)
    assert(row.getAs[Long]("missing_mass_ppm") == 1000000L * f1 / n)
  }

  test("q_js_divergence: terms are nonnegative, bounded by ln 2, and " +
      "zero when a type's mix is identical across halves") {
    val rows = SparkEntry.queries("q_js_divergence")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ln2 = math.log(2.0)
    rows.foreach { r =>
      val term = r.getAs[Double]("js_term")
      assert(term >= 0.0 && term <= ln2 + 1e-9,
        s"${r.getAs[String]("event_type")} term $term out of [0, ln 2]")
    }
    // totals conserved: Σ(n_base + n_cur) = |events|
    val nEvents = graft.sources.Tables.load(spark, sf, "events").count()
    assert(rows.map(r => r.getAs[Long]("n_base") +
      r.getAs[Long]("n_cur")).sum == nEvents)
  }

  test("q_theil equals the scalar per-customer micro-term sum and is " +
      "consistent with Gini (both strictly positive on real spend)") {
    val xs = spendCents()
    val n = xs.length.toLong
    val tt = xs.map(BigInt(_)).sum
    val expected = xs.map { x =>
      // HALF_UP (away from zero), matching Spark/DuckDB round() on the
      // negative terms — Math.round would floor(-0.5 + 0.5) instead
      BigDecimal(1000000.0 * (x.toDouble / tt.toDouble) *
        math.log(x.toDouble * n.toDouble / tt.toDouble))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.sum
    val row = SparkEntry.queries("q_theil")(spark, sf).collect().head
    assert(row.getAs[Long]("n_customers") == n)
    assert(BigInt(row.getAs[Long]("total_cents")) == tt)
    assert(row.getAs[Long]("theil_micro") == expected)
    assert(row.getAs[Long]("theil_micro") > 0)
  }
}
