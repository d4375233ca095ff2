package graft

import org.apache.spark.sql.functions._

/** Semantics for the spectral tranche ([[graft.queries.SpectralOps]]):
  * the residue-class DFT replayed from collected daily dollars, plus
  * the physics — Parseval-style bound (a single frequency's amplitude
  * share can't exceed 1) and the residue-class identity a(r=0 kernel)
  * = Σcos·C agreement with a direct per-day transform.
  */
class SpectralOpsSpec extends SparkSpec {

  test("q_spectral_peak equals the residue-class replay AND the direct " +
      "per-day DFT; amplitude shares are in [0, 1]") {
    val days = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
        .as("day"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 100")
          .as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rows = SparkEntry.queries("q_spectral_peak")(spark, sf)
      .collect().map(r => r.getAs[Long]("period") -> r).toMap
    assert(rows.keySet == Set(7L, 30L))
    for (p <- Seq(7, 30)) {
      val cr = days.groupBy(d => d._1 % p).map { case (r, g) =>
        r -> g.map(x => BigInt(x._2)).sum }
      val a = cr.map { case (r, c) =>
        c * BigInt(math.floor(
          1e6 * math.cos(2.0 * math.Pi * r / p) + 0.5).toLong) }.sum
      val b = cr.map { case (r, c) =>
        c * BigInt(math.floor(
          1e6 * math.sin(2.0 * math.Pi * r / p) + 0.5).toLong) }.sum
      val s = cr.values.sum
      val row = rows(p.toLong)
      assert(BigInt(row.getAs[Long]("a_micro")) == a, s"p=$p")
      assert(BigInt(row.getAs[Long]("b_micro")) == b, s"p=$p")
      assert(BigInt(row.getAs[Long]("total_dollars")) == s, s"p=$p")
      val amp = math.sqrt(a.toDouble * a.toDouble +
        b.toDouble * b.toDouble) / 1e6
      assert(math.abs(row.getAs[Double]("amp_share") - amp / s.toDouble)
        < 1e-6, s"p=$p")
      // |Σ y e^{-iwt}| ≤ Σ y: the share is a true fraction
      assert(row.getAs[Double]("amp_share") >= 0.0 &&
        row.getAs[Double]("amp_share") <= 1.0, s"p=$p")
      // the residue-class reduction IS the per-day DFT (the identity
      // the whole plan rests on) — replay it per day and compare to
      // ~micro-rounding of the kernels
      val aDay = days.map { case (d, y) =>
        y * math.cos(2.0 * math.Pi * (d % p) / p) }.sum
      assert(math.abs(a.toDouble / 1e6 - aDay) <
        math.max(1e-4 * math.abs(aDay), days.length.toDouble), s"p=$p")
    }
  }
}
