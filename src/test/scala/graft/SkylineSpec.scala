package graft

import org.apache.spark.sql.functions._
import graft.operators.Skyline

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Double, Double)]): Seq[(Double, Double)] =
    pts.filter { case (x, y) =>
      !pts.exists { case (x2, y2) =>
        x2 <= x && y2 >= y && (x2 < x || y2 > y) }
    }.distinct.sortBy(_._1)

  test("matches the all-pairs brute force, with duplicates and x-ties") {
    // deterministic points on a small grid → many x-ties and duplicates
    val pts = (0 until 400).map { i =>
      (((i * 2654435761L) % 37).toDouble, ((i * 40503L + 11) % 23).toDouble)
    }
    val got = Skyline.pareto2d(pts.toDF("x", "y"), col("x"), col("y"))
      .as[(Double, Double)].collect().toSeq
    assert(got == brute(pts))
  }

  test("frontier is invariant under repartition and strictly increasing") {
    val pts = (0 until 1000).map { i =>
      ((i * 7919 % 997).toDouble, (i * 104729 % 991).toDouble)
    }
    val df = pts.toDF("x", "y")
    val a = Skyline.pareto2d(df, col("x"), col("y"))
      .as[(Double, Double)].collect().toSeq
    val b = Skyline.pareto2d(df.repartition(13), col("x"), col("y"))
      .as[(Double, Double)].collect().toSeq
    assert(a == b)
    assert(a.map(_._1) == a.map(_._1).sorted && a.map(_._1).distinct == a.map(_._1))
    assert(a.map(_._2) == a.map(_._2).sorted && a.map(_._2).distinct == a.map(_._2),
      "y must be strictly increasing along the frontier")
  }
}
