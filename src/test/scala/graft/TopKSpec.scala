package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TopK

/** The bounded-buffer top-k aggregator's documented contract is exact
  * interchangeability with the window form (score DESC under Spark's total
  * order, id ASC on ties) — which makes NaN (sorts first) and signed zero
  * (-0.0 below 0.0) the edges worth pinning: raw double comparisons would
  * get both wrong.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("perGroup matches the window form on NaN and signed-zero scores") {
    val df = Seq(
      ("g", 1L, Double.NaN), ("g", 2L, 1.0), ("g", 3L, 0.0), ("g", 4L, -0.0),
      ("g", 5L, Double.NaN), ("g", 6L, 2.0),
      ("h", 7L, -1.0), ("h", 8L, Double.NaN))
      .toDF("grp", "rid", "score")
    val agg = TopK.perGroup(df, Seq("grp"), col("score"), col("rid"), k = 6)
      .select(col("grp"), col("id"), col("score"), col("rank"))
      .as[(String, Long, Double, Int)].collect()
      .map(r => (r._1, r._2, java.lang.Double.doubleToLongBits(r._3), r._4))
      .toSet
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("score").desc, col("rid"))
    val win = df
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 6)
      .select(col("grp"), col("rid").as("id"), col("score"), col("rank"))
      .as[(String, Long, Double, Int)].collect()
      .map(r => (r._1, r._2, java.lang.Double.doubleToLongBits(r._3), r._4))
      .toSet
    assert(agg == win,
      s"aggregator diverges from window:\nagg=$agg\nwin=$win")
    // the NaNs outrank every finite score, and -0.0 ranks strictly below 0.0
    val g = agg.filter(_._1 == "g").toSeq.sortBy(_._4)
    assert(g.take(2).forall(t => t._3 == java.lang.Double.doubleToLongBits(Double.NaN)))
    val zeroRank = g.find(_._3 == java.lang.Double.doubleToLongBits(0.0)).get._4
    val negZeroRank = g.find(_._3 == java.lang.Double.doubleToLongBits(-0.0)).get._4
    assert(zeroRank < negZeroRank)
  }
}
