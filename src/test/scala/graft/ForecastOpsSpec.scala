package graft

import org.apache.spark.sql.functions._

/** Semantics for the round-12 seasonal-forecast/monitoring tranche
  * ([[graft.queries.ForecastOps]]): scalar replays of both integer
  * recursions over the same zero-filled daily spine (Scala Long `/` is
  * trunc-toward-zero like Spark `div` / DuckDB BIGINT `//`), plus the
  * structural bands — the EWMA inflation factor must climb
  * monotonically to its λ/(2−λ) fixed point, and the chart must flag
  * at least the spine's zero-revenue gap days (which sit far below
  * any in-control band around the mean).
  */
class ForecastOpsSpec extends SparkSpec {

  private def spine(): Array[(Long, Long)] = {
    val d = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
        .as("day"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mn = d.keys.min
    val mx = d.keys.max
    (mn to mx).map(day => day -> d.getOrElse(day, 0L)).toArray
  }

  test("q_holt_winters equals the direct integer fold replay; the h=7 " +
      "and h=14 forecasts share a seasonal slot") {
    val z = spine()
    var l = z(0)._2 * 1000L
    var b = 0L
    val s = Array.fill(7)(0L)
    for ((day, cents) <- z.drop(1)) {
      val idx = (day % 7).toInt
      val y = cents * 1000L
      val ln = (3 * (y - s(idx)) + 7 * (l + b)) / 10
      b = ((ln - l) + 9 * b) / 10
      s(idx) = (2 * (y - ln) + 8 * s(idx)) / 10
      l = ln
    }
    val mx = z.last._1
    val rows = SparkEntry.queries("q_holt_winters")(spark, sf).collect()
      .map(r => r.getAs[Long]("h") -> r.getAs[Long]("forecast_milli"))
      .toMap
    assert(rows.keySet == (1L to 14L).toSet)
    for (h <- 1L to 14L)
      assert(rows(h) == l + h * b + s(((mx + h) % 7).toInt), s"h=$h")
    // weekly additive seasonality: h and h+7 differ by exactly 7·trend
    for (h <- 1L to 7L)
      assert(rows(h + 7) - rows(h) == 7 * b, s"h=$h")
  }

  test("q_ewma_chart equals the direct recursion replay; g climbs to " +
      "lambda/(2-lambda) and the zero-revenue gap days flag outside") {
    val z = spine()
    val n = z.length.toLong
    val sy = z.map(x => BigInt(x._2) * 1000).sum
    val qy = z.map(x => BigInt(x._2) * 1000 * x._2 * 1000).sum
    val mu = ((sy - sy.mod(BigInt(n))) / n).toLong
    val s2 = {
      val num = qy - (sy * sy - (sy * sy).mod(BigInt(n))) / n
      (num - num.mod(BigInt(n - 1))) / (n - 1)
    }
    val rows = SparkEntry.queries("q_ewma_chart")(spark, sf).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("z_milli"), r.getAs[Long]("g_ppm"),
          r.getAs[Boolean]("outside"))).toMap
    assert(rows.size == z.length)
    var zt = mu
    var g = 0L
    var lastG = 0L
    var anyOutside = false
    for ((day, cents) <- z) {
      zt = (2 * cents * 1000L + 8 * zt) / 10
      g = (64 * g) / 100 + 40000
      val out = BigInt(zt - mu) * (zt - mu) * 1000000 > BigInt(9) * s2 * g
      val (az, ag, ao) = rows(day)
      assert(az == zt && ag == g && ao == out, s"day=$day")
      assert(g >= lastG, "g must be monotone nondecreasing")
      lastG = g
      anyOutside ||= out
    }
    // fixed point: g → λ/(2−λ) = 111110 ppm under the trunc recursion
    assert(lastG >= 111000L && lastG <= 111110L)
    // the spine's zero-filled gap days pull z far under μ — the chart
    // must catch at least one excursion on this corpus
    assert(anyOutside)
  }

  /** Over-span fixture: a corrupt far-future shipdate (year 9999) whose
    * daily span exceeds Parity.MaxSpanCells by orders of magnitude —
    * the q_holt_linear guard fixture (StatOps3Spec), replayed against
    * the ForecastOps consumers of the SHARED dailySpine (r13 task: span-
    * guard parity for the r12 array folds). */
  private def overSpanDir(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("forecast_overspan").toString
    Seq(("1995-01-01 00:00:00", 100.0), ("9999-01-01 00:00:00", 200.0))
      .toDF("d", "l_extendedprice")
      .select(col("d").cast("timestamp").as("l_shipdate"),
        col("l_extendedprice"))
      .write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def messages(t: Throwable): Seq[String] =
    if (t == null) Nil
    else Option(t.getMessage).toSeq ++ messages(t.getCause)

  test("q_holt_winters and q_ewma_chart: an over-span corpus fails " +
      "LOUDLY at the shared dailySpine bounds guard instead of " +
      "silently collecting a corpus-wide daily array") {
    val dir = overSpanDir()
    for (q <- Seq("q_holt_winters", "q_ewma_chart")) {
      val e = intercept[Exception] {
        SparkEntry.queries(q)(spark, dir).collect()
      }
      assert(messages(e).exists(_.contains("exceeds the")),
        s"$q: expected the span-guard raise_error, got: $e")
    }
  }

  test("q_page_hinkley equals the direct integer fold replay; the " +
      "excursion is nonnegative and its day is on the spine") {
    val z = spine()
    val n = z.length.toLong
    val mu = z.map(_._2).sum / n
    val delta = mu / 100
    var cum = 0L; var mn = 0L; var best = -1L; var bestDay = -1L
    for ((day, cents) <- z) {
      cum += cents - mu - delta
      val m2 = math.min(mn, cum)
      if (cum - m2 > best) { best = cum - m2; bestDay = day }
      mn = m2
    }
    val row = SparkEntry.queries("q_page_hinkley")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n_days") == n)
    assert(row.getAs[Long]("mu_cents") == mu)
    assert(row.getAs[Long]("delta_cents") == delta)
    assert(row.getAs[Long]("ph_max") == best)
    assert(row.getAs[Long]("day_at_max") == bestDay)
    assert(best >= 0L)
    assert(z.exists(_._1 == bestDay))
  }

  test("q_rolling_median equals the direct 7-window order statistic " +
      "and is bounded by each window's extremes") {
    val z = spine()
    val expect = (6 until z.length).map { i =>
      val w = (i - 6 to i).map(j => z(j)._2).sorted
      (z(i)._1, w(3))
    }
    val got = SparkEntry.queries("q_rolling_median")(spark, sf)
      .collect().map(r => (r.getAs[Long]("day"),
        r.getAs[Long]("med7_cents"))).sortBy(_._1)
    assert(got.length == expect.length)
    got.zip(expect).foreach { case ((d1, m1), (d2, m2)) =>
      assert(d1 == d2 && m1 == m2, s"day $d1: $m1 vs $m2") }
    // robustness law: the median of any 7-window sits weakly inside it
    for (((day, m), i) <- got.zipWithIndex) {
      val w = (i to i + 6).map(j => z(j)._2)
      assert(m >= w.min && m <= w.max, s"day $day escapes its window")
    }
  }

  test("q_spectral_peak needs NO span guard: the residue-class census " +
      "stays <= 37 cells even on the over-span corpus") {
    // the spectral kernel depends only on day mod p, so a corrupt
    // year-9999 date changes residues, never the frame size — the
    // over-span fixture that LOUDLY kills the array folds completes
    // here with the same bounded shape (documents why SpectralOps
    // carries no guardedSpanValue)
    val rows = SparkEntry.queries("q_spectral_peak")(spark, overSpanDir())
      .collect()
    assert(rows.nonEmpty && rows.length <= 37,
      s"expected a bounded residue-class readout, got ${rows.length} rows")
  }
}
