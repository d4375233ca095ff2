package graft

import org.apache.spark.sql.functions._

/** Semantics for the long-memory/unit-root tranche
  * ([[graft.queries.StatOps13]]): the R/S pipeline and the DF moments
  * replayed from the collected daily spine, plus the statistics'
  * defining ranges (H ∈ (0, 1); a mean-reverting revenue series reads
  * a negative DF slope and t-statistic).
  */
class StatOps13Spec extends SparkSpec {

  private def spine(): Array[Long] = {
    val d = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
        .as("day"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (d.keys.min to d.keys.max).map(day => d.getOrElse(day, 0L)).toArray
  }

  test("q_hurst equals the direct R/S replay per scale and H sits in " +
      "(0, 1)") {
    val ys = spine().map(_ / 10000L)
    val span = ys.length
    val perW = Seq(8, 16, 32, 64, 128).flatMap { w =>
      val rs = (0 until span / w).flatMap { blk =>
        val b = ys.slice(blk * w, blk * w + w)
        val sb = b.sum
        val sy2 = b.map(y => y * y).sum
        val q = w * sy2 - sb * sb
        if (q <= 0) None
        else {
          var cum = 0L; var mx = Long.MinValue; var mn = Long.MaxValue
          for ((y, i) <- b.zipWithIndex) {
            cum += y
            val cp = w * cum - (i + 1) * sb
            mx = math.max(mx, cp); mn = math.min(mn, cp)
          }
          Some(math.floor(1e6 * (mx - mn) /
            math.sqrt(q.toDouble) + 0.5).toLong)
        }
      }
      if (rs.isEmpty) None else Some((w.toLong, rs.size.toLong, rs.sum))
    }
    val rows = SparkEntry.queries("q_hurst")(spark, sf).collect()
      .map(r => r.getAs[Long]("w") -> r).toMap
    assert(rows.keySet == perW.map(_._1).toSet)
    for ((w, nb, srs) <- perW) {
      assert(rows(w).getAs[Long]("n_blocks") == nb, s"w=$w")
      assert(rows(w).getAs[Long]("sum_rs_ppm") == srs, s"w=$w")
    }
    // replay the OLS close
    val pts = perW.map { case (w, nb, srs) =>
      (math.floor(1e6 * math.log(w.toDouble) + 0.5).toLong,
        math.floor(1e6 * math.log(srs.toDouble / nb / 1e6) + 0.5).toLong)
    }
    val n = pts.length
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val slope = (BigInt(1000000) * n * sxy - sx * sy).toDouble /
      (BigInt(1000000) * n * sxx - sx * sx).toDouble
    val h = rows(8L).getAs[Double]("hurst")
    assert(math.abs(h - math.rint(slope * 1e6) / 1e6) < 1e-9 ||
      math.abs(h - slope) < 1e-6)
    assert(rows.values.forall(_.getAs[Double]("hurst") == h))
    assert(h > 0.0 && h < 1.0)
  }

  test("q_dickey_fuller equals the direct moment replay; the revenue " +
      "series is mean-reverting (negative slope and t)") {
    val ys = spine().map(_ / graft.queries.StatOps13.DfSpineDiv)
    val pairs = ys.sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1) - p(0))).toArray
    val n = pairs.length.toLong
    val sx = pairs.map(p => BigInt(p._1)).sum
    val sd = pairs.map(p => BigInt(p._2)).sum
    val sxd = pairs.map(p => BigInt(p._1) * p._2).sum
    val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
    val sdd = pairs.map(p => BigInt(p._2) * p._2).sum
    val sxyN = n * sxd - sx * sd
    val sxxN = n * sxx - sx * sx
    val syyN = n * sdd - sd * sd
    val row = SparkEntry.queries("q_dickey_fuller")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n_days") == n)
    assert(BigInt(row.getAs[Long]("sxy_n")) == sxyN)
    assert(BigInt(row.getAs[Long]("sxx_n")) == sxxN)
    assert(BigInt(row.getAs[Long]("syy_n")) == syyN)
    assert(BigInt(row.getAs[Long]("slope_ppm")) ==
      BigInt(1000000) * sxyN / sxxN)
    val t = (if (sxyN < 0) -1.0 else 1.0) * math.sqrt(
      sxyN.toDouble * sxyN.toDouble * (n - 2) /
        (syyN.toDouble * sxxN.toDouble - sxyN.toDouble * sxyN.toDouble))
    assert(math.abs(row.getAs[Double]("t_stat") - t) < 1e-6)
    // a bounded revenue series with zero-filled gaps mean-reverts hard
    assert(row.getAs[Long]("slope_ppm") < 0L)
    assert(row.getAs[Double]("t_stat") < -2.86)
  }

  test("q_pacf equals the direct Durbin-Levinson replay over the " +
      "floor-mean-centered hecto-dollar series") {
    val ys = spine().map(_ / 10000L)
    val n = ys.length.toLong
    val mu = ys.sum / n // floor mean (all y >= 0)
    val dev = ys.map(_ - mu)
    val s0 = dev.map(d => BigInt(d) * d).sum
    def sk(k: Int): BigInt =
      (0 until dev.length - k).map(i => BigInt(dev(i)) * dev(i + k)).sum
    val (s1, s2, s3) = (sk(1), sk(2), sk(3))
    val row = SparkEntry.queries("q_pacf")(spark, sf).collect().head
    assert(row.getAs[Long]("n_days") == n)
    assert(BigInt(row.getAs[Long]("s0")) == s0)
    assert(BigInt(row.getAs[Long]("s1")) == s1)
    assert(BigInt(row.getAs[Long]("s2")) == s2)
    assert(BigInt(row.getAs[Long]("s3")) == s3)
    // signed trunc div on both engines
    def tdiv(a: BigInt, b: BigInt): BigInt = a * 1000000 / b
    assert(BigInt(row.getAs[Long]("r1_ppm")) == tdiv(s1, s0))
    assert(BigInt(row.getAs[Long]("r2_ppm")) == tdiv(s2, s0))
    assert(BigInt(row.getAs[Long]("r3_ppm")) == tdiv(s3, s0))
    val r1 = s1.toDouble / s0.toDouble
    val r2 = s2.toDouble / s0.toDouble
    val r3 = s3.toDouble / s0.toDouble
    val p2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val f21 = r1 * (1.0 - p2)
    val p3 = (r3 - f21 * r2 - p2 * r1) / (1.0 - f21 * r1 - p2 * r2)
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getAs[Double]("pacf1") - r6(r1)) < 1e-9)
    assert(math.abs(row.getAs[Double]("pacf2") - r6(p2)) < 1e-9)
    assert(math.abs(row.getAs[Double]("pacf3") - r6(p3)) < 1e-9)
    // PACF(1) IS ACF(1) by definition; all pacfs live in [-1, 1]
    for (c <- Seq("pacf1", "pacf2", "pacf3"))
      assert(math.abs(row.getAs[Double](c)) <= 1.0)
  }
}
