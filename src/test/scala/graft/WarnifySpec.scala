package graft

import org.apache.spark.sql.functions._
import graft.ates.Fixtures
import graft.operators.Warnify

class WarnifySpec extends SparkSpec {
  import spark.implicits._

  private lazy val tables = Fixtures.tables(spark)

  private lazy val joined = {
    val dp = tables("decision_points").filter(col("area_id") === 357).alias("dp")
    val dpw = tables("decision_points_warnings").alias("dpw")
    dp.join(dpw, col("dpw.decision_point_id") === col("dp.id"))
  }

  test("geoJson flavor: one row per distinct geometry, bucketed warnings JSON") {
    val out = Warnify.geoJson(joined,
      geom = col("dp.geom"),
      typeCol = lower(regexp_replace(col("dpw.type"), " ", "-")),
      warning = col("dpw.warning"),
      carry = Seq("id", "name", "area_id", "comments"))
    val rows = out.orderBy(col("id")).collect()
    assert(rows.length == 2) // DP Alpha + DP Bravo (DP Charlie filtered by area)

    val alpha = rows(0)
    assert(alpha.getAs[Long]("id") == 30L)
    val w = alpha.getAs[String]("warnings")
    // key order matches the reference accumulator init (FGU:238-243)
    assert(w ==
      """{"managing-risk":["Stick to the ridge","Travel one at a time"],""" +
      """"concern":["Steep convex roll","Wind loading"]}""")

    val bravo = rows(1)
    assert(bravo.getAs[String]("warnings") ==
      """{"managing-risk":["Use the low-angle exit"],"concern":["Terrain trap below"]}""")
  }

  test("geoJson flavor preserves warning multiplicity (property)") {
    val dup = joined.union(joined) // every warning twice
    val out = Warnify.geoJson(dup,
      geom = col("dp.geom"),
      typeCol = lower(regexp_replace(col("dpw.type"), " ", "-")),
      warning = col("dpw.warning"),
      carry = Seq("id"))
    val w = out.filter(col("id") === 31L).select(col("warnings")).as[String].head()
    assert(w ==
      """{"managing-risk":["Use the low-angle exit","Use the low-angle exit"],""" +
      """"concern":["Terrain trap below","Terrain trap below"]}""")
  }

  test("kml flavor renders the orange HTML warnings table (FGU:507-529)") {
    val out = Warnify.kml(joined,
      geom = col("dp.geom"),
      typeCol = col("dpw.type"),
      warning = col("dpw.warning"),
      idCol = col("dp.id"))
    val rows = out.collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[String]("name") == "Decision Point")
      assert(r.getAs[String]("table") == "decision_points")
      val d = r.getAs[String]("description")
      assert(d.startsWith(Warnify.PopupHeader))
      assert(d.contains("""<th class="first">Concern</th>"""))
      assert(d.contains("<th>Managing risk</th>"))
      assert(d.contains("""<span class="red-x">"""))
      assert(d.contains("""<span class="green-check">"""))
    }
    val alpha = out.filter(col("description").contains("Steep convex roll"))
      .select(col("description")).as[String].head()
    assert(alpha.contains(
      """<tr><td><span class="green-check">&#x2717;</span>Stick to the ridge</td></tr>"""))
  }
}
