package graft

import org.apache.spark.sql.functions._
import graft.operators.Bootstrap
import graft.sources.Tables

class BootstrapSpec extends SparkSpec {

  private lazy val orders = Tables.load(spark, sf, "orders")

  test("CI is deterministic in the data, not the partitioning") {
    val a = Bootstrap.poissonMeanCi(orders, col("o_orderkey"),
      col("o_totalprice")).collect()
    val b = Bootstrap.poissonMeanCi(orders.repartition(7), col("o_orderkey"),
      col("o_totalprice")).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("CI brackets the full mean and has the declared replicate count") {
    val r = Bootstrap.poissonMeanCi(orders, col("o_orderkey"),
      col("o_totalprice")).head()
    val (b, mean, lo, hi) = (r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4))
    assert(b == 200L)
    assert(lo <= mean && mean <= hi, s"mean $mean outside [$lo, $hi]")
    assert(lo < hi)
  }
}
