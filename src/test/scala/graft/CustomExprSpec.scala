package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.functions.WarnifyAggregator
import graft.operators.Warnify
import graft.plans.GraftExtensions

class CustomExprSpec extends SparkSpec {
  import spark.implicits._

  test("native Hash32Expr ≡ the built-in composition (conv∘substring∘md5)") {
    GraftExtensions.register(spark)
    val df = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("text"),
        TextFunctions.hash32Composed(col("text")).as("composed"),
        GraftExtensions.graft_hash32(col("text")).as("native"))
    assert(df.filter(col("composed") =!= col("native")).count() == 0)
    // SQL registration path
    df.createOrReplaceTempView("h32docs")
    val viaSql = spark.sql(
      "SELECT count(*) FROM h32docs WHERE graft_hash32(text) != composed")
      .head().getLong(0)
    assert(viaSql == 0)
  }

  test("Hash32Expr participates in whole-stage codegen") {
    val cg = graft.sources.Tables.load(spark, sf, "documents")
      .select(GraftExtensions.graft_hash32(col("text")))
      .queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(cg.contains("WholeStageCodegen subtrees"))
    assert(cg.contains("Hash32Expr.hash"), "expected inlined static call")
  }

  test("typed WarnifyAggregator UDAF matches the built-in warnify composition") {
    val tables = graft.ates.Fixtures.tables(spark)
    val dp = tables("decision_points").alias("dp")
    val dpw = tables("decision_points_warnings").alias("dpw")
    val joined = dp.join(dpw, col("dpw.decision_point_id") === col("dp.id"))

    val composed = Warnify.geoJson(joined,
        geom = col("dp.geom"),
        typeCol = lower(regexp_replace(col("dpw.type"), " ", "-")),
        warning = col("dpw.warning"),
        carry = Seq("id"))
      .select(col("id"), col("warnings"))

    val agg = WarnifyAggregator.udafColumn
    val viaUdaf = joined
      .select(col("dp.id").as("id"),
        lower(regexp_replace(col("dpw.type"), " ", "-")).as("warn_type"),
        col("dpw.warning").as("warning"))
      .groupBy(col("id"))
      .agg(agg(col("warn_type"), col("warning")).as("warnings"))

    val a = composed.as[(Long, String)].collect().sortBy(_._1)
    val b = viaUdaf.as[(Long, String)].collect().sortBy(_._1)
    assert(a.sameElements(b))
  }
}
