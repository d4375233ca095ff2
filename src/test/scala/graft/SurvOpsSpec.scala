package graft

import org.apache.spark.sql.functions._

/** Semantics for the round-13 survival/trend tranche
  * ([[graft.queries.SurvOps]]): independent scalar replays with BigInt
  * arithmetic (no staging, no Spark) of all four statistics, plus the
  * structural laws each test must satisfy.
  */
class SurvOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Per-user (g, t, ev) survival frame — the KM staging replayed in
    * Scala off the raw events table. */
  private def subjects(): Array[(Long, Long, Long)] = {
    val hourUs = 3600L * 1000000L
    graft.sources.Tables.load(spark, sf, "events")
      .groupBy(col("user_id")).agg(
        min(expr("unix_micros(ts)")).as("birth"),
        min(when(col("event_type") === "signup", expr("unix_micros(ts)")))
          .as("death"),
        max(expr("unix_micros(ts)")).as("last"))
      .select(col("user_id"), col("birth"), col("death"), col("last"))
      .as[(Long, Long, Option[Long], Long)].collect()
      .map { case (uid, birth, death, last) =>
        val g = uid % 2
        death match {
          case Some(dd) if (dd - birth) / hourUs <= 48 =>
            (g, (dd - birth) / hourUs, 1L)
          case Some(_) => (g, 48L, 0L)
          case None => (g, math.min((last - birth) / hourUs, 48L), 0L)
        }
      }
  }

  test("q_logrank equals the direct O-E/V recompute and is null-ish " +
      "on the random even/odd split") {
    val sub = subjects()
    val ts = sub.map(_._2).distinct.sorted
    var oe = BigInt(0); var v = BigInt(0)
    for (tt <- ts) {
      val d = sub.count(x => x._2 == tt && x._3 == 1L)
      val d1 = sub.count(x => x._2 == tt && x._3 == 1L && x._1 == 1L)
      val r = sub.count(_._2 >= tt)
      val r1 = sub.count(x => x._2 >= tt && x._1 == 1L)
      if (d > 0 && r > 1) {
        oe += BigInt(1000000) * d1 - BigInt(1000000) * d * r1 / r
        v += BigInt(1000000) * d * r1 * (r - r1) * (r - d) /
          (BigInt(r) * r * (r - 1))
      }
    }
    val row = SparkEntry.queries("q_logrank")(spark, sf).collect().head
    assert(row.getAs[Long]("n_users") == sub.length.toLong)
    assert(row.getAs[Long]("n_grp1") == sub.count(_._1 == 1L).toLong)
    assert(BigInt(row.getAs[Long]("oe_micro")) == oe)
    assert(BigInt(row.getAs[Long]("v_micro")) == v)
    assert(BigInt(row.getAs[Long]("chi2_micro")) == oe * oe / v)
    // even/odd user ids are exchangeable wrt signup timing: the test
    // must NOT reject at any sane level (|z| < 4 is a ~6-sigma-safe
    // band for a true null)
    assert(math.abs(row.getAs[Double]("z")) < 4.0)
  }

  test("q_nelson_aalen equals the direct cumulative recompute and " +
      "tracks -ln(KM) from above") {
    val sub = subjects()
    val rows = SparkEntry.queries("q_nelson_aalen")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 49)
    var h = BigInt(0); var va = BigInt(0)
    val n0 = sub.length
    for ((t, nEvents, nRisk, hMicro, varPico) <- rows) {
      val d = sub.count(x => x._2 == t && x._3 == 1L)
      val r = sub.count(_._2 >= t)
      assert(nEvents == d.toLong, s"d at t=$t")
      assert(nRisk == r.toLong, s"r at t=$t")
      if (r > 0) {
        h += BigInt(1000000) * d / r
        va += BigInt("1000000000000") * d / (BigInt(r) * r)
      }
      assert(BigInt(hMicro) == h, s"H at t=$t")
      assert(BigInt(varPico) == va, s"var at t=$t")
    }
    assert(n0 == rows.head._3.toInt) // n_risk at t=0 is the full cohort
    // H(t) <= -ln S_KM(t): ln(1-x) <= -x per factor, so the
    // product-limit's -ln dominates the hazard sum (equivalently
    // exp(-H) >= S_KM — Fleming-Harrington sits above KM). Checked at
    // the terminal cell against the KM gate, with positivity.
    val km = SparkEntry.queries("q_survival_km")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val sEnd = km.last._5.toDouble / 1e6
    val hEnd = rows.last._4.toDouble / 1e6
    assert(hEnd > 0.0)
    assert(hEnd <= -math.log(sEnd) + 0.01,
      s"H=$hEnd vs -lnS=${-math.log(sEnd)}")
  }

  test("q_mann_kendall equals the direct pairwise recompute over the " +
      "last-365-day window") {
    val dayUs = 86400L * 1000000L
    val daily = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(expr(s"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div $dayUs")
        .as("day"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
      .as[(Long, Long)].collect()
    val mx = daily.map(_._1).max
    val w = daily.filter(_._1 > mx - 365).sortBy(_._1)
    var s = 0L
    for (i <- w.indices; j <- (i + 1) until w.length)
      s += java.lang.Long.signum(w(j)._2 - w(i)._2)
    val ties = w.groupBy(_._2).values.map(_.length.toLong)
    val n = w.length.toLong
    val var18 = n * (n - 1) * (2 * n + 5) -
      ties.map(t => t * (t - 1) * (2 * t + 5)).sum
    val row = SparkEntry.queries("q_mann_kendall")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n_days") == n)
    assert(row.getAs[Long]("s_stat") == s)
    assert(row.getAs[Long]("var18") == var18)
    val z = row.getAs[Double]("z")
    val expectZ =
      if (s > 0) (s - 1).toDouble / math.sqrt(var18 / 18.0)
      else if (s < 0) (s + 1).toDouble / math.sqrt(var18 / 18.0)
      else 0.0
    assert(math.abs(z - BigDecimal(expectZ)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("q_cochran_armitage equals the direct trend recompute; priority " +
      "does not predict order value (null band)") {
    val os = graft.sources.Tables.load(spark, sf, "orders")
      .select(substring(col("o_orderpriority"), 1, 1).cast("long"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .as[(Long, Long)].collect()
    val sorted = os.map(_._2).sorted
    val med = sorted((sorted.length + 1) / 2 - 1) // lower median
    val cells = os.groupBy(_._1).map { case (w, xs) =>
      (w, xs.length.toLong, xs.count(_._2 > med).toLong) }
    val n = BigInt(os.length)
    val a = BigInt(cells.map(_._3).sum)
    val swn = cells.map(c => BigInt(c._1) * c._2).sum
    val sw2n = cells.map(c => BigInt(c._1) * c._1 * c._2).sum
    val swa = cells.map(c => BigInt(c._1) * c._3).sum
    val tNum = swa * n - a * swn
    val chi2 = BigInt(1000000) * tNum * tNum /
      (a * (n - a) * (n * sw2n - swn * swn))
    val row = SparkEntry.queries("q_cochran_armitage")(spark, sf)
      .collect().head
    assert(BigInt(row.getAs[Long]("n_orders")) == n)
    assert(BigInt(row.getAs[Long]("n_pos")) == a)
    assert(BigInt(row.getAs[Long]("t_stat")) == tNum)
    assert(BigInt(row.getAs[Long]("chi2_micro")) == chi2)
    // priority is assigned independently of totalprice in the corpus:
    // a real trend would be a fixture change, not a pass
    assert(math.abs(row.getAs[Double]("z")) < 4.0)
  }
}
