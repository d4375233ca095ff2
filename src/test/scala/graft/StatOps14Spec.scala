package graft

import org.apache.spark.sql.functions._

/** Semantics for the contingency drill-down ([[graft.queries
  * .StatOps14]]): the residual cells replayed from collected rows plus
  * the residuals' defining law — weighted by expected counts they sum
  * to ~0 per row and column (the marginal constraint).
  */
class StatOps14Spec extends SparkSpec {

  test("q_stdres_cells equals the direct contingency replay; residuals " +
      "satisfy the marginal zero-sum law") {
    val nat = graft.sources.Tables.load(spark, sf, "nation")
      .select(col("n_nationkey"), col("n_regionkey")).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    val reg = graft.sources.Tables.load(spark, sf, "region")
      .select(col("r_regionkey"), col("r_name")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val cs = graft.sources.Tables.load(spark, sf, "customer")
      .select(col("c_mktsegment"), col("c_nationkey")).collect()
      .map(r => (r.getString(0), reg(nat(r.getInt(1)))))
    val cells = cs.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    val rs = cs.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val cr = cs.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val n = cs.length.toLong
    val rows = SparkEntry.queries("q_stdres_cells")(spark, sf).collect()
      .map(r => (r.getAs[String]("c_mktsegment"),
        r.getAs[String]("r_name")) -> r).toMap
    assert(rows.keySet == cells.keySet)
    for (((seg, rg), o) <- cells) {
      val row = rows((seg, rg))
      assert(row.getAs[Long]("o") == o, s"($seg,$rg)")
      assert(row.getAs[Long]("rs") == rs(seg))
      assert(row.getAs[Long]("cr") == cr(rg))
      assert(row.getAs[Long]("n") == n)
      val e = rs(seg).toDouble * cr(rg) / n
      val z = (o - e) / math.sqrt(e * (1.0 - rs(seg).toDouble / n) *
        (1.0 - cr(rg).toDouble / n))
      assert(math.abs(row.getAs[Double]("stdres") - z) < 1e-6)
      assert(row.getAs[Boolean]("driving") ==
        (math.abs(row.getAs[Double]("stdres")) > 3.0))
    }
    // marginal law: Σ_cells (O − E) = 0 per row and per column
    for ((seg, _) <- rs) {
      val diff = cells.collect { case ((s2, rg), o) if s2 == seg =>
        o.toDouble - rs(seg).toDouble * cr(rg) / n }.sum
      assert(math.abs(diff) < 1e-6, seg)
    }
  }
}
