package graft

import org.apache.spark.sql.functions._

/** Semantics for the round-12 model-eval tranche
  * ([[graft.queries.EvalOps]]): scalar brute-force replays of the AP
  * threshold sum, the Murphy decomposition (and its exact identity),
  * the log-loss cells, and the Davies-Bouldin centroid arithmetic —
  * independent of the distributed plans.
  */
class EvalOpsSpec extends SparkSpec {

  private def customers(): Array[(Long, Boolean)] =
    graft.sources.Tables.load(spark, sf, "customer")
      .select((col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("long").as("v"),
        (col("c_mktsegment") === "BUILDING").as("pos"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))

  test("q_pr_auc equals the direct per-threshold replay and sits in " +
      "(prevalence-ish, 1e9]") {
    val cs = customers()
    val n = cs.length.toLong
    val p = cs.count(_._2).toLong
    val byV = cs.groupBy(_._1).map { case (v, rs) =>
      (v, rs.length.toLong, rs.count(_._2).toLong) }.toSeq.sortBy(_._1)
    var below = 0L; var belowPos = 0L
    var ap = BigInt(0)
    for ((v, tv, n1v) <- byV) {
      val cum = n - below
      val tp = p - belowPos
      ap += BigInt(1000000000L) * n1v * tp / (BigInt(p) * cum)
      below += tv; belowPos += n1v
    }
    val row = SparkEntry.queries("q_pr_auc")(spark, sf).collect().head
    assert(row.getAs[Long]("n_pos") == p)
    assert(row.getAs[Long]("n_neg") == n - p)
    assert(BigInt(row.getAs[Long]("ap_ppb")) == ap)
    // AP is a mean of precisions: strictly positive (the top threshold
    // always contributes) and ≤ 1. Prevalence is only the RANDOM-model
    // expectation, not a bound — an anti-correlated score dips below it
    // (observed at sf0.001: AP 0.196 vs prevalence 0.227), so the real
    // check is the exact replay above, not a prevalence floor.
    assert(row.getAs[Long]("ap_ppb") > 0L)
    assert(row.getAs[Long]("ap_ppb") <= 1000000000L)
  }

  private def scoredBins(): Array[(Long, Boolean)] = {
    val d = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), (col("n_chars") >= 400).as("pos"),
        col("text"))
    graft.queries.PipelineOps.toyModelScores(d)
      .select(col("pos"), col("score_milli")).collect()
      .map { r =>
        val s = math.min(math.max(r.getLong(1), 0L), 999L)
        (s / 100, r.getBoolean(0))
      }
  }

  test("q_brier_decomp equals the direct cell replay and the Murphy " +
      "identity brier = rel - res + unc holds to the floor slack") {
    val xs = scoredBins()
    val n = xs.length.toLong
    val np = xs.count(_._2).toLong
    val cells = xs.groupBy(_._1).map { case (b, rs) =>
      (b * 100 + 50, rs.length.toLong, rs.count(_._2).toLong) }
    val bnum = cells.map { case (pm, nb, npb) =>
      BigInt(npb) * (1000 - pm) * (1000 - pm) +
        BigInt(nb - npb) * pm * pm }.sum
    val rel = cells.map { case (pm, nb, npb) =>
      BigInt(nb * pm - 1000 * npb) * (nb * pm - 1000 * npb) / nb }.sum
    val res = cells.map { case (_, nb, npb) =>
      BigInt(1000000) * (BigInt(npb) * n - BigInt(nb) * np) *
        (BigInt(npb) * n - BigInt(nb) * np) / (BigInt(nb) * n * n) }.sum
    val row = SparkEntry.queries("q_brier_decomp")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n_docs") == n)
    assert(row.getAs[Long]("n_pos") == np)
    assert(BigInt(row.getAs[Long]("brier_micro")) == bnum / n)
    assert(BigInt(row.getAs[Long]("rel_micro")) == rel / n)
    assert(BigInt(row.getAs[Long]("res_micro")) == res / n)
    assert(BigInt(row.getAs[Long]("unc_micro")) ==
      BigInt(1000000) * np * (n - np) / (BigInt(n) * n))
    // the exact identity for a bin-constant forecast, up to one floor
    // per readout plus one per bin (≤ 10 bins): |err| ≤ 13 micro
    val err = row.getAs[Long]("brier_micro") -
      (row.getAs[Long]("rel_micro") - row.getAs[Long]("res_micro") +
        row.getAs[Long]("unc_micro"))
    assert(math.abs(err) <= 13L, s"Murphy identity broke: err=$err")
  }

  test("q_log_loss equals the direct cell replay and exceeds the Brier " +
      "score (log-loss dominates the quadratic rule)") {
    val xs = scoredBins()
    val n = xs.length.toLong
    val sll = xs.map { case (b, pos) =>
      val pm = b * 100 + 50
      val pr = if (pos) pm / 1000.0 else 1.0 - pm / 1000.0
      BigInt(math.floor(1000000.0 * -math.log(pr) + 0.5).toLong)
    }.sum
    val row = SparkEntry.queries("q_log_loss")(spark, sf).collect().head
    assert(row.getAs[Long]("n_docs") == n)
    assert(BigInt(row.getAs[Long]("mean_ll_micro")) == sll / n)
    val brier = SparkEntry.queries("q_brier_decomp")(spark, sf)
      .collect().head.getAs[Long]("brier_micro")
    assert(row.getAs[Long]("mean_ll_micro") >= brier)
  }

  test("q_davies_bouldin equals the direct centroid replay; every " +
      "cluster's worst ratio is positive") {
    val pts = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getInt(1),
        r.getSeq[Float](2).map(v => math.floor(v.toDouble * 1e6).toLong)
          .toArray))
    val labels = pts.map(_._1).distinct.sorted
    val cent = labels.map { l =>
      val xs = pts.filter(_._1 == l).map(_._2)
      l -> (0 until xs.head.length).map(d =>
        xs.map(_(d)).sum.toDouble / xs.length / 1e6).toArray
    }.toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) =>
        BigDecimal((x - y) * (x - y)).setScale(12,
          BigDecimal.RoundingMode.HALF_UP) }.sum.toDouble
    val si = labels.map { l =>
      val xs = pts.filter(_._1 == l)
      val s = xs.map { case (_, xm) =>
        val dd = d2(xm.map(_ / 1e6), cent(l))
        math.floor(1e6 * math.sqrt(dd) + 0.5).toLong }.sum
      l -> (xs.length.toLong, s / xs.length)
    }.toMap
    val rows = SparkEntry.queries("q_davies_bouldin")(spark, sf)
      .collect().map(r => r.getAs[Int]("label") -> r).toMap
    assert(rows.keySet == labels.toSet)
    for (l <- labels) {
      val (np, sm) = si(l)
      assert(rows(l).getAs[Long]("n_points") == np, s"label $l")
      assert(rows(l).getAs[Long]("s_micro") == sm, s"label $l")
      val rmax = labels.filter(_ != l).map { j =>
        val m = math.sqrt(d2(cent(l), cent(j)))
        math.floor((sm + si(j)._2) / m + 0.5).toLong }.max
      assert(rows(l).getAs[Long]("r_max_ppm") == rmax, s"label $l")
      assert(rmax > 0L)
    }
  }
}
