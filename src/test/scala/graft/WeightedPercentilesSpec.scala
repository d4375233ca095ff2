package graft

import org.apache.spark.sql.functions._
import graft.operators.{Percentiles, WeightedPercentiles}
import graft.sources.Tables

class WeightedPercentilesSpec extends SparkSpec {

  private lazy val li = Tables.load(spark, sf, "lineitem")

  test("unit weights degenerate to the unweighted rank pick") {
    val w = WeightedPercentiles.exactDisc(li, col("l_returnflag"),
        col("l_extendedprice"), lit(1), Seq((1, 2), (3, 4)),
        Seq("p50", "p75"))
      .orderBy(col("group")).collect().toSeq
    val u = Percentiles.exactDisc(li, col("l_returnflag"),
        col("l_extendedprice"), Seq((1, 2), (3, 4)), Seq("p50", "p75"))
      .orderBy(col("group")).collect().toSeq
    assert(w == u)
  }

  test("matches a local weighted-cum brute force, ties included") {
    val rows = (0 until 500).map { i =>
      ("g" + (i % 2), ((i * 7919) % 29).toDouble, (i % 5 + 1).toLong)
    }
    import spark.implicits._
    val got = WeightedPercentiles.exactDisc(rows.toDF("g", "v", "w"),
        col("g"), col("v"), col("w"), Seq((1, 2)), Seq("p50"))
      .orderBy(col("group"))
      .as[(String, Double)].collect().toSeq
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rs) =>
      val total = rs.map(_._3).sum
      val t = (total + 1) / 2
      val sorted = rs.sortBy(_._2)
      var cum = 0L
      val v = sorted.find { r => cum += r._3; cum >= t }.get._2
      (g, v)
    }
    assert(got == expected)
  }
}
