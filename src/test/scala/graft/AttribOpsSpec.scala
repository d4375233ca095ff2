package graft

import org.apache.spark.sql.functions._

/** Semantics for the Markov-attribution tranche
  * ([[graft.queries.AttribOps]]): a from-scratch journey replay —
  * paths rebuilt directly from the collected events (truncation at
  * first purchase, start/conv/null framing), the 64-round integer
  * absorption solve rerun per removal variant — plus the model's
  * structural laws: removal can only lose conversion mass, shares
  * partition the total, and removing EVERY channel at once would leave
  * only the start→conv direct mass.
  */
class AttribOpsSpec extends SparkSpec {

  /** Journeys rebuilt from scratch: per user ordered by (ts, event_id),
    * cut after first purchase, start-prefixed, purchase→conv, trailing
    * null. */
  private lazy val m: Seq[(String, String, Long)] = {
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    for ((_, rows) <- ev.groupBy(_._1)) {
      val path0 = rows.sortBy(r => (r._2, r._3)).map(_._4)
      val cut = path0.indexOf("purchase")
      val path = if (cut >= 0) path0.take(cut + 1) else path0
      val labeled = path.map(t => if (t == "purchase") "conv" else t)
      var prev = "start"
      for (t <- labeled) { trans((prev, t)) += 1; prev = t }
      if (labeled.last != "conv") trans((prev, "null")) += 1
    }
    trans.toSeq.map { case ((p, nx), c) => (p, nx, c) }
  }

  private lazy val channels: Seq[String] =
    (m.map(_._1) ++ m.map(_._2)).distinct
      .filterNot(Set("start", "conv", "null")).sorted

  private def solve(removed: Set[String]): BigInt = {
    val states = m.map(_._1).distinct
    val n = m.groupBy(_._1).map { case (k, rs) =>
      k -> BigInt(rs.map(_._3).sum) }
    var p = states.map(_ -> BigInt(0)).toMap
    for (_ <- 1 to 64) {
      p = states.map { st =>
        val num = m.filter(_._1 == st).map { case (_, nx, c) =>
          if (nx == "conv") BigInt(c) * 1000000
          else if (nx == "null" || removed(nx)) BigInt(0)
          else BigInt(c) * p.getOrElse(nx, BigInt(0))
        }.sum
        st -> num / n(st)
      }.toMap
    }
    p.getOrElse("start", BigInt(0))
  }

  test("q_markov_attrib equals the direct journey replay; shares sum " +
      "to 1e6 up to per-channel floors and removal never gains") {
    val pBase = solve(Set.empty)
    val diffs = channels.map(ch => ch -> (pBase - solve(Set(ch)))).toMap
    val td = diffs.values.sum
    val rows = SparkEntry.queries("q_markov_attrib")(spark, sf)
      .collect().map(r => r.getAs[String]("channel") -> r).toMap
    assert(rows.keySet == channels.toSet)
    var shareSum = 0L
    for (ch <- channels) {
      val r = rows(ch)
      assert(BigInt(r.getAs[Long]("p_base_ppm")) == pBase, ch)
      assert(BigInt(r.getAs[Long]("p_without_ppm")) == pBase - diffs(ch),
        ch)
      assert(BigInt(r.getAs[Long]("removal_ppm")) ==
        BigInt(1000000) * diffs(ch) / pBase, ch)
      assert(BigInt(r.getAs[Long]("share_ppm")) ==
        BigInt(1000000) * diffs(ch) / td, ch)
      // monotonicity: removing a channel can never help
      assert(r.getAs[Long]("p_without_ppm") <=
        r.getAs[Long]("p_base_ppm"), ch)
      assert(r.getAs[Long]("removal_ppm") >= 0L &&
        r.getAs[Long]("removal_ppm") <= 1000000L, ch)
      shareSum += r.getAs[Long]("share_ppm")
    }
    // shares partition the removed mass: Σ = 1e6 minus one floor each
    assert(shareSum <= 1000000L &&
      shareSum >= 1000000L - channels.size)
    // sanity of the chain itself: the base conversion probability is a
    // probability, and with purchases present it is strictly positive
    assert(pBase > 0 && pBase <= 1000000)
  }

  test("q_shapley_attrib equals the direct 2^k coalition replay; the " +
      "efficiency axiom holds up to per-channel floors") {
    val k = channels.length
    def fact(x: Int): Long = (1 to x).map(_.toLong).product
    val v = (0 until (1 << k)).map { cid =>
      val allowed = channels.zipWithIndex
        .filter { case (_, i) => ((cid >> i) & 1) == 1 }.map(_._1).toSet
      cid -> solve(channels.toSet -- allowed)
    }.toMap
    val phi24 = channels.zipWithIndex.map { case (ch, i) =>
      var acc = BigInt(0)
      for (cid <- 0 until (1 << k) if ((cid >> i) & 1) == 0) {
        val sz = java.lang.Integer.bitCount(cid)
        acc += BigInt(fact(sz)) * fact(k - 1 - sz) *
          (v(cid | (1 << i)) - v(cid))
      }
      ch -> acc
    }.toMap
    val tot = phi24.values.sum
    val rows = SparkEntry.queries("q_shapley_attrib")(spark, sf)
      .collect().map(r => r.getAs[String]("channel") -> r).toMap
    assert(rows.keySet == channels.toSet)
    val vFull = v((1 << k) - 1)
    val vEmpty = v(0)
    var phiSum = BigInt(0)
    for (ch <- channels) {
      val r = rows(ch)
      assert(BigInt(r.getAs[Long]("shapley_ppm")) ==
        phi24(ch) / fact(k), ch)
      assert(BigInt(r.getAs[Long]("share_ppm")) ==
        BigInt(1000000) * phi24(ch) / tot, ch)
      assert(BigInt(r.getAs[Long]("v_full_ppm")) == vFull, ch)
      assert(BigInt(r.getAs[Long]("v_empty_ppm")) == vEmpty, ch)
      // marginal contributions are nonnegative (monotone coalition
      // values under the absorbing chain)
      assert(r.getAs[Long]("shapley_ppm") >= 0L, ch)
      phiSum += r.getAs[Long]("shapley_ppm")
    }
    // efficiency: Σφ = v(full) − v(∅) in the rationals; each channel
    // readout floors once against k!
    assert((vFull - vEmpty - phiSum).abs <= k, s"efficiency broke: " +
      s"sum=$phiSum vs ${vFull - vEmpty}")
  }
}
