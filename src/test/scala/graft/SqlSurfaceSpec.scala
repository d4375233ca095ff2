package graft

import graft.plans.GraftExtensions

/** The pure-SQL user surface: every registered engine function callable from
  * `spark.sql`, sharing the exact expression trees of the Column API. */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("geometry functions compose in SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  st_askml(g) AS kml,
        |  st_asgeojson(g) AS gj,
        |  st_x(g) AS x, st_y(g) AS y,
        |  st_npoints(g) AS n,
        |  st_envelope(g).xmin AS xmin
        |FROM (SELECT st_geomfromgeojson(
        |  '{"type":"Point","coordinates":[-118.756,50.7]}') AS g)""".stripMargin)
      .head()
    assert(row.getAs[String]("kml") ==
      "<Point><coordinates>-118.756,50.7</coordinates></Point>")
    assert(row.getAs[String]("gj") ==
      """{"type":"Point","coordinates":[-118.756,50.7]}""")
    assert(row.getAs[Double]("x") == -118.756 && row.getAs[Double]("y") == 50.7)
    assert(row.getAs[Int]("n") == 1)
    assert(row.getAs[Double]("xmin") == -118.756)
  }

  test("native kernels callable from SQL match the Column-API forms") {
    GraftExtensions.register(spark)
    graft.sources.Tables.load(spark, sf, "documents")
      .limit(50).createOrReplaceTempView("sql_kernel_docs")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_minhash_sig(text, 3, 8) AS sig,
        |  graft_simhash64(text) AS sh,
        |  graft_word_ngrams(text, 2) AS grams
        |FROM sql_kernel_docs""".stripMargin)
    val viaApi = spark.table("sql_kernel_docs").select(
      org.apache.spark.sql.functions.col("doc_id"),
      graft.functions.TextFunctions.minhashSigNative(
        org.apache.spark.sql.functions.col("text"), 3, 8).as("sig"),
      graft.functions.TextFunctions.simhash64Native(
        org.apache.spark.sql.functions.col("text")).as("sh"),
      graft.functions.TextFunctions.wordNgramsNative(
        org.apache.spark.sql.functions.col("text"), 2).as("grams"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)

    val cos = spark.sql(
      """SELECT graft_cosine(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS c""")
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
  }

  test("text functions callable from SQL match Column-API results") {
    GraftExtensions.register(spark)
    graft.sources.Tables.load(spark, sf, "documents")
      .createOrReplaceTempView("sql_docs")
    val mismatches = spark.sql(
      """SELECT count(*) FROM sql_docs
        |WHERE graft_fingerprint(text) != md5(graft_normalize(text))
        |   OR size(graft_tokens(text)) < 1
        |   OR graft_langid(text) NOT IN ('en','de','es','fr','zh')""".stripMargin)
      .head().getLong(0)
    assert(mismatches == 0)
  }
}
