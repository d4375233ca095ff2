package graft

import org.apache.spark.sql.functions._

/** Semantics for the round-12 privacy/economics tranche
  * ([[graft.queries.StatOps11]]): scalar replays of the ordered-EMD
  * cross-difference sum, the Atkinson cells, and the elasticity moment
  * cells — plus the structural bands (EMD ∈ [0, 1], the global class
  * has EMD 0 against itself by construction, Atkinson ∈ [0, 1) for
  * positive values, geomean ≤ mean).
  */
class StatOps11Spec extends SparkSpec {

  test("q_t_closeness equals the direct cumulative replay; EMD in " +
      "[0, 1e6] and aggregating all classes reproduces zero distance") {
    val cs = graft.sources.Tables.load(spark, sf, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("""(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
               | + 100000) div 200000""".stripMargin).as("band"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val bands = cs.map(_._3).distinct.sorted
    val m = bands.size
    val n = cs.length.toLong
    val gcum = bands.map(b => b -> cs.count(_._3 <= b).toLong).toMap
    val rows = SparkEntry.queries("q_t_closeness")(spark, sf).collect()
      .map(r => (r.getAs[Int]("c_nationkey"),
        r.getAs[String]("c_mktsegment")) -> r).toMap
    val classes = cs.map(c => (c._1, c._2)).distinct
    assert(rows.keySet == classes.toSet)
    for ((nk, seg) <- classes) {
      val mine = cs.filter(c => c._1 == nk && c._2 == seg)
      val nc = mine.length.toLong
      val num = bands.map { b =>
        (BigInt(mine.count(_._3 <= b)) * n - BigInt(gcum(b)) * nc).abs
      }.sum
      val expect = BigInt(1000000) * num / (BigInt(m - 1) * nc * n)
      val r = rows((nk, seg))
      assert(r.getAs[Long]("n_rows") == nc, s"($nk,$seg)")
      assert(BigInt(r.getAs[Long]("emd_ppm")) == expect, s"($nk,$seg)")
      assert(r.getAs[Long]("emd_ppm") >= 0L &&
        r.getAs[Long]("emd_ppm") <= 1000000L)
      assert(r.getAs[Boolean]("breach") ==
        (r.getAs[Long]("emd_ppm") > 200000L))
    }
  }

  test("q_atkinson equals the direct cell replay; 0 <= A < 1 (geomean " +
      "never exceeds the mean)") {
    val xs = graft.sources.Tables.load(spark, sf, "orders")
      .select((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).collect().map(_.getLong(0))
    val nn = xs.length.toLong
    val s = xs.map(BigInt(_)).sum
    val sl = xs.map(x => BigInt(math.round(1e6 * math.log(x.toDouble))))
      .sum
    val row = SparkEntry.queries("q_atkinson")(spark, sf).collect().head
    assert(row.getAs[Long]("n_orders") == nn)
    assert(BigInt(row.getAs[Long]("s")) == s)
    assert(BigInt(row.getAs[Long]("sl")) == sl)
    val a = row.getAs[Double]("atkinson")
    val direct = 1.0 - nn.toDouble *
      math.exp(sl.toDouble / nn / 1e6) / s.toDouble
    assert(math.abs(a - direct) < 1e-6)
    // AM-GM: geometric mean ≤ arithmetic mean, so A ∈ [0, 1) — allow
    // the micro-rounding of the ln terms a hair of slack at the floor
    assert(a >= -1e-6 && a < 1.0)
  }

  test("q_price_elasticity equals the direct moment replay and is " +
      "finite") {
    val q = graft.sources.Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum((col("l_quantity").cast("decimal(18,2)") * 100)
        .cast("long")).as("qc")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val p = graft.sources.Tables.load(spark, sf, "part")
      .select(col("p_partkey"),
        (col("p_retailprice").cast("decimal(18,2)") * 100)
        .cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = q.toSeq.flatMap { case (pk, qc) =>
      p.get(pk).map(pc => (pc, qc)) }
    val nn = pairs.length.toLong
    def r6(x: Double) = BigInt(math.round(x))
    val sx = pairs.map(x => r6(1e6 * math.log(x._1.toDouble))).sum
    val sy = pairs.map(x => r6(1e6 * math.log(x._2.toDouble))).sum
    val sxy = pairs.map(x => r6(1e6 * math.log(x._1.toDouble)
      * math.log(x._2.toDouble))).sum
    val sxx = pairs.map(x => r6(1e6 * math.log(x._1.toDouble)
      * math.log(x._1.toDouble))).sum
    val direct = (BigInt(1000000) * nn * sxy - sx * sy).toDouble /
      (BigInt(1000000) * nn * sxx - sx * sx).toDouble
    val row = SparkEntry.queries("q_price_elasticity")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n_parts") == nn)
    assert(math.abs(row.getAs[Double]("elasticity") -
      math.rint(direct * 1e6) / 1e6) < 1e-9 ||
      math.abs(row.getAs[Double]("elasticity") - direct) < 1e-6)
    assert(!row.getAs[Double]("elasticity").isNaN &&
      !row.getAs[Double]("elasticity").isInfinite)
  }
}
