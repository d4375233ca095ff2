package graft

import org.apache.spark.sql.functions._

/** Semantics for the governance/representation tranche
  * ([[graft.queries.FairOps]]): the fairness cells replayed off the
  * shared toy model, the JL projection rebuilt from the portable hash
  * with its distortion laws (mean near 1, spread bounded by the 8-dim
  * concentration), and MMD² replayed from scratch with its same-
  * distribution near-zero band.
  */
class FairOpsSpec extends SparkSpec {

  private def h32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
  }

  test("q_fairness_audit equals the toy-model group replay and rates " +
      "are probabilities") {
    val scored = graft.queries.PipelineOps.toyModelScores(
      graft.sources.Tables.load(spark, sf, "documents")
        .select(col("doc_id"), col("lang"),
          (col("n_chars") >= 400).as("pos"), col("text")))
      .select(col("lang"), col("pos"), (col("score_milli") >= 0).as("keep"))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    val rows = SparkEntry.queries("q_fairness_audit")(spark, sf)
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    assert(rows.keySet == scored.map(_._1).toSet)
    for ((lang, g) <- scored.groupBy(_._1)) {
      val n = g.length.toLong
      val np = g.count(_._2).toLong
      val sel = g.count(_._3).toLong
      val tp = g.count(x => x._2 && x._3).toLong
      val fp = g.count(x => !x._2 && x._3).toLong
      val r = rows(lang)
      assert(r.getAs[Long]("n_docs") == n, lang)
      assert(r.getAs[Long]("n_pos") == np, lang)
      assert(r.getAs[Long]("sel_ppm") == 1000000L * sel / n, lang)
      assert(r.getAs[Long]("tpr_ppm") == 1000000L * tp / np, lang)
      assert(r.getAs[Long]("fpr_ppm") == 1000000L * fp / (n - np), lang)
      for (c <- Seq("sel_ppm", "tpr_ppm", "fpr_ppm"))
        assert(r.getAs[Long](c) >= 0L && r.getAs[Long](c) <= 1000000L,
          s"$lang $c")
    }
  }

  private def vecsMicro(cap: Int): Map[Long, Array[Long]] =
    graft.sources.Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") < cap)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)
        .map(v => math.floor(v.toDouble * 1e6).toLong).toArray).toMap

  test("q_jl_projection equals the direct sign-projection replay; the " +
      "mean distortion concentrates near 1") {
    val vs = vecsMicro(40)
    val signs = Array.tabulate(8, 64)((j, d) =>
      if (h32(s"$j:$d") % 2 == 0) 1L else -1L)
    def proj(x: Array[Long]): Array[Long] =
      Array.tabulate(8)(j => x.indices.map(d => signs(j)(d) * x(d)).sum)
    val ids = vs.keys.toSeq.sorted
    val ratios = for {
      i <- ids.indices; k <- (i + 1) until ids.length
    } yield {
      val (a, b) = (vs(ids(i)), vs(ids(k)))
      val d2 = a.indices.map(d => BigInt(a(d) - b(d)) * (a(d) - b(d))).sum
      val (pa, pb) = (proj(a), proj(b))
      val dh2 = pa.indices.map(j => BigInt(pa(j) - pb(j)) * (pa(j) - pb(j))).sum
      (BigInt(1000000) * dh2 / (8 * d2)).toLong
    }
    val row = SparkEntry.queries("q_jl_projection")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n_pairs") == ratios.length.toLong)
    assert(row.getAs[Long]("mean_ratio_ppm") ==
      ratios.map(BigInt(_)).sum / ratios.length)
    assert(row.getAs[Long]("min_ratio_ppm") == ratios.min)
    assert(row.getAs[Long]("max_ratio_ppm") == ratios.max)
    // JL with k=8: E[ratio] = 1; the panel mean concentrates well
    // inside ±40%, individual pairs spread wider but stay positive
    assert(row.getAs[Long]("mean_ratio_ppm") > 600000L &&
      row.getAs[Long]("mean_ratio_ppm") < 1400000L)
    assert(row.getAs[Long]("min_ratio_ppm") > 0L)
  }

  test("q_mmd_drift equals the direct kernel replay; same-distribution " +
      "halves sit near zero") {
    val vs = vecsMicro(120)
    def k(a: Array[Long], b: Array[Long]): Long = {
      val d2 = a.indices.map(d => (a(d) - b(d)) * (a(d) - b(d))).sum
      math.floor(1e6 * math.exp(-d2.toDouble / 2e13) + 0.5).toLong
    }
    val ids = vs.keys.toSeq.sorted
    var sxx = 0L; var syy = 0L; var sxy = 0L
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val kk = k(vs(ids(i)), vs(ids(j)))
      (ids(i) % 2, ids(j) % 2) match {
        case (0, 0) => sxx += kk
        case (1, 1) => syy += kk
        case _ => sxy += kk
      }
    }
    val nx = ids.count(_ % 2 == 0).toLong
    val ny = ids.count(_ % 2 == 1).toLong
    val row = SparkEntry.queries("q_mmd_drift")(spark, sf).collect().head
    assert(row.getAs[Long]("n_x") == nx && row.getAs[Long]("n_y") == ny)
    assert(row.getAs[Long]("sxx") == sxx)
    assert(row.getAs[Long]("syy") == syy)
    assert(row.getAs[Long]("sxy") == sxy)
    val mmd2 = 2 * sxx / (nx * (nx - 1)) + 2 * syy / (ny * (ny - 1)) -
      2 * sxy / (nx * ny)
    assert(row.getAs[Long]("mmd2_micro") == mmd2)
    // even/odd halves draw from ONE distribution: |MMD²| small
    // relative to the kernel scale (10⁶ micro = 1.0)
    assert(math.abs(row.getAs[Long]("mmd2_micro")) < 50000L)
  }
}
