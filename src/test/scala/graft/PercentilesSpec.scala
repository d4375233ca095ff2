package graft

import org.apache.spark.sql.functions._
import graft.operators.Percentiles

/** The distributed sort-based exact percentile must return the built-in
  * `percentile` aggregate's values exactly — same interpolation formula,
  * different plan (range-partitioned sort + rank picks instead of one
  * all-values aggregation buffer per group).
  */
class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  private def builtinVsDistributed(df: org.apache.spark.sql.DataFrame,
      g: String, v: String, ps: Seq[Double]): Unit = {
    val names = ps.indices.map(i => s"p$i")
    val fast = Percentiles.exactInterpolated(df, col(g), col(v), ps, names)
      .collect().map(r => r.get(0) ->
        names.indices.map(i => r.getDouble(i + 1)).toVector).toMap
    val aggExprs = ps.zip(names).map { case (p, n) =>
      expr(s"percentile($v, $p)").as(n) }
    val builtin = df.groupBy(col(g)).agg(aggExprs.head, aggExprs.tail: _*)
      .collect().map(r => r.get(0) ->
        names.indices.map(i => r.getDouble(i + 1)).toVector).toMap
    assert(fast.keySet == builtin.keySet)
    builtin.foreach { case (key, exp) =>
      val got = fast(key)
      exp.indices.foreach { i =>
        assert(math.abs(got(i) - exp(i)) < 1e-9,
          s"group $key p=${ps(i)}: distributed ${got(i)} vs builtin ${exp(i)}")
      }
    }
  }

  test("distributed exact percentiles ≡ built-in percentile on the corpus") {
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
    builtinVsDistributed(li, "l_returnflag", "l_extendedprice",
      Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0))
  }

  test("edges: single-value groups, all-tied values, nulls ignored") {
    val df = Seq[(String, java.lang.Double)](
      ("one", 42.0),
      ("tied", 7.0), ("tied", 7.0), ("tied", 7.0),
      ("two", 1.0), ("two", 2.0),
      ("withnull", 5.0), ("withnull", null), ("withnull", 15.0))
      .toDF("g", "v")
    builtinVsDistributed(df, "g", "v", Seq(0.0, 0.5, 1.0))
  }

  test("the sort is range-partitioned, not one task per group") {
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
    val p = Percentiles.exactInterpolated(li, col("l_returnflag"),
        col("l_extendedprice"), Seq(0.5), Seq("p50"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("rangepartitioning"),
      s"expected a range-partitioned sort:\n$p")
  }
}
