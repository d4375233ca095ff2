package graft

import org.apache.spark.sql.functions._

/** Semantics for the round-11 second tranche ([[graft.queries.StatOps2]]):
  * each gate query's DEFINING invariant re-derived independently — driver
  * -side brute-force recomputes with BigInt/Double arithmetic, accounting
  * identities, and the conformal coverage guarantee — so the DuckDB
  * parity gate is not the only line of defense.
  */
class StatOps2Spec extends SparkSpec {
  import spark.implicits._

  test("q_seq_support equals the brute-force interval-test support") {
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .as[(Long, String, Long)].collect()
    val byUser = ev.groupBy(_._1).map { case (u, rows) =>
      u -> rows.groupBy(_._2).map { case (t, rs) =>
        t -> (rs.map(_._3).min, rs.map(_._3).max)
      }
    }
    val expected = byUser.values.flatMap { types =>
      for {
        (a, (fa, _)) <- types.toSeq; (b, (_, lb)) <- types.toSeq
        if a != b && fa < lb
      } yield (a, b)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = SparkEntry.queries("q_seq_support")(spark, sf)
      .as[(String, String, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2) -> r._3).toMap == expected)
    // share is the exact truncating micro-ratio of the user census
    val nUsers = byUser.size.toLong
    got.foreach(r => assert(r._4 == 1000000L * r._3 / nUsers))
  }

  test("q_modularity: accounting identities + exact BigInt recompute") {
    val rows = SparkEntry.queries("q_modularity")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    // Σ d_tot counts every labeled edge twice
    val m = rows.map(_._3).sum / 2
    assert(rows.map(_._2).sum <= m)
    rows.foreach { case (_, eIn, dTot, qMicro) =>
      val num = BigInt(1000000) *
        (4 * BigInt(m) * eIn - BigInt(dTot) * dTot + 4 * BigInt(m) * m)
      assert(num >= 0) // d_c ≤ 2m ⟹ the shifted numerator is nonnegative
      assert(BigInt(qMicro) == num / (4 * BigInt(m) * m) - 1000000)
      assert(qMicro >= -1000000L && qMicro <= 1000000L)
    }
  }

  test("q_conformal: rank identity and the finite-sample coverage bound") {
    val r = SparkEntry.queries("q_conformal")(spark, sf).collect().head
    val nCalib = r.getAs[Long]("n_calib")
    val k = r.getAs[Long]("k")
    assert(k == (9 * (nCalib + 1) + 9) / 10) // ⌈0.9·(n+1)⌉
    // q̂ is the k-th smallest calibration residual — recompute brute-force
    val base = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(
        pmod(graft.functions.TextFunctions.hash32(concat(lit("cf:"),
          col("l_orderkey"), lit(":"), col("l_linenumber"))), lit(4L))
          .as("split"),
        col("l_quantity").cast("long").as("qty"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .as[(Long, Long, Long)].collect()
    val pred = base.filter(_._1 < 2).groupBy(_._2).map { case (q, rs) =>
      q -> rs.map(_._3).sum / rs.size
    }
    val calib = base.filter(_._1 == 2).flatMap(r0 =>
      pred.get(r0._2).map(p => math.abs(r0._3 - p))).sorted
    assert(nCalib == calib.length)
    assert(r.getAs[Long]("qhat_cents") == calib(k.toInt - 1))
    // split conformal: expected coverage ≥ 90% (hash split ≈ exchangeable;
    // allow finite-sample slack at this sf)
    assert(r.getAs[Long]("cover_ppm") >= 850000L)
    assert(r.getAs[Long]("n_cover") <= r.getAs[Long]("n_test"))
  }

  test("q_ab_power equals the closed-form recompute from its own cells") {
    val r = SparkEntry.queries("q_ab_power")(spark, sf).collect().head
    val (n0, n1, c0, c1) = (r.getAs[Long]("n0"), r.getAs[Long]("n1"),
      r.getAs[Long]("c0"), r.getAs[Long]("c1"))
    val p0 = c0.toDouble / n0; val p1 = c1.toDouble / n1
    val pbar = (c0.toDouble + c1) / (n0.toDouble + n1)
    val z = 1.959964 * math.sqrt(2.0 * pbar * (1.0 - pbar)) +
      0.841621 * math.sqrt(p0 * (1.0 - p0) + p1 * (1.0 - p1))
    val want = BigDecimal(z * z / ((p1 - p0) * (p1 - p0)))
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("n_required") == want)
    assert(r.getAs[Long]("p0_micro") == 1000000L * c0 / n0)
  }

  test("q_woe_iv: totals, WOE sign, and double recompute") {
    val rows = SparkEntry.queries("q_woe_iv")(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect()
    val gt = rows.map(_._2).sum; val bt = rows.map(_._3).sum
    rows.foreach { case (_, g, b, woe, iv) =>
      val w = math.log(((g + 0.5) * (bt + 0.5)) / ((b + 0.5) * (gt + 0.5)))
      assert(woe == BigDecimal(w).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
      val ivRaw = (g.toDouble / gt - b.toDouble / bt) * w
      assert(iv == BigDecimal(ivRaw).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
      // WOE and the rate gap agree in sign (smoothing never flips it
      // past the 6-dp readout for nonempty bins)
      if (g > 0 || b > 0)
        assert(iv >= 0.0 || math.abs(woe) < 0.2)
    }
  }

  test("q_psi_drift: every PSI term is nonnegative and bins partition") {
    val rows = SparkEntry.queries("q_psi_drift")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq == (0L to 9L))
    // (p−q)·ln(p/q) ≥ 0 pointwise — the defining property of PSI terms
    rows.foreach(r => assert(r._4 >= 0.0, s"bin ${r._1} term ${r._4}"))
    val total = graft.sources.Tables.load(spark, sf, "events").count()
    assert(rows.map(r => r._2 + r._3).sum == total)
  }
}
