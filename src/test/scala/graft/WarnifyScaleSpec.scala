package graft

import org.apache.spark.sql.functions._
import graft.operators.Warnify

/** Warnify beyond fixture scale: generated decision points with a known
  * warning layout — correctness must be partition-invariant and the row
  * count exact. 50k groups × 6 warnings ≈ 300k rows through one
  * aggregation. */
class WarnifyScaleSpec extends SparkSpec {
  import spark.implicits._

  test("warnify on 50k generated decision points is exact and partition-invariant") {
    val n = 50000L
    val dps = spark.range(n).select(
      col("id"),
      graft.functions.GeoFunctions.st_point(
        col("id").cast("double") / 1000.0, lit(50.0)).as("geom"))
    // 3 concerns + 3 managing-risk per dp, text derived from the id
    val warnings = spark.range(n).select(col("id").as("dpid"))
      .select(col("dpid"), explode(sequence(lit(0), lit(5))).as("i"))
      .select(col("dpid"),
        when(col("i") < 3, lit("concern")).otherwise(lit("managing-risk"))
          .as("wtype"),
        concat(lit("w"), col("i"), lit("_"), col("dpid")).as("warning"))

    val joined = dps.join(warnings, dps("id") === warnings("dpid"))
    val out = Warnify.geoJson(joined,
      geom = col("geom"), typeCol = col("wtype"), warning = col("warning"),
      carry = Seq("id"))

    assert(out.count() == n)
    // spot-check one group's JSON exactly
    val w = out.filter(col("id") === 41999L).select(col("warnings"))
      .as[String].head()
    assert(w ==
      """{"managing-risk":["w3_41999","w4_41999","w5_41999"],""" +
      """"concern":["w0_41999","w1_41999","w2_41999"]}""")

    // partition-invariance: different input partitioning, identical result hash
    val repartitioned = Warnify.geoJson(joined.repartition(7),
      geom = col("geom"), typeCol = col("wtype"), warning = col("warning"),
      carry = Seq("id"))
    val h1 = out.select(md5(concat_ws("|", col("id"), col("warnings"))).as("h"))
      .agg(sum(conv(substring(col("h"), 1, 8), 16, 10).cast("long"))).head().getLong(0)
    val h2 = repartitioned.select(md5(concat_ws("|", col("id"), col("warnings"))).as("h"))
      .agg(sum(conv(substring(col("h"), 1, 8), 16, 10).cast("long"))).head().getLong(0)
    assert(h1 == h2)
  }
}
