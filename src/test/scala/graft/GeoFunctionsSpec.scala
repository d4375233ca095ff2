package graft

import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._

class GeoFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def geomOf(json: String) =
    Seq(json).toDF("j").select(st_geomfromgeojson(col("j")).as("g"))

  test("st_asgeojson round-trips Point") {
    val in = """{"type":"Point","coordinates":[-118.756,50.7]}"""
    val out = geomOf(in).select(st_asgeojson(col("g"))).as[String].head()
    assert(out == in)
  }

  test("st_asgeojson round-trips LineString") {
    val in = """{"type":"LineString","coordinates":[[-118.8,50.65],[-118.78,50.67]]}"""
    val out = geomOf(in).select(st_asgeojson(col("g"))).as[String].head()
    assert(out == in)
  }

  test("st_asgeojson round-trips Polygon with inner ring") {
    val in = """{"type":"Polygon","coordinates":[[[0.0,0.0],[4.0,0.0],[4.0,4.0],[0.0,0.0]],[[1.0,1.0],[2.0,1.0],[1.0,2.0],[1.0,1.0]]]}"""
    val out = geomOf(in).select(st_asgeojson(col("g"))).as[String].head()
    assert(out == in)
  }

  test("st_asgeojson round-trips MultiPolygon") {
    val in = """{"type":"MultiPolygon","coordinates":[[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,0.0]]],[[[5.0,5.0],[6.0,5.0],[6.0,6.0],[5.0,5.0]]]]}"""
    val out = geomOf(in).select(st_asgeojson(col("g"))).as[String].head()
    assert(out == in)
  }

  test("st_envelope bounds contain every vertex (property)") {
    val in = """{"type":"Polygon","coordinates":[[[-3.5,2.0],[7.25,-1.5],[4.0,9.0],[-3.5,2.0]]]}"""
    val row = geomOf(in)
      .select(st_envelope(col("g")).as("e"), st_points(col("g")).as("pts"))
      .head()
    val e = row.getStruct(0)
    val (xmin, ymin, xmax, ymax) =
      (e.getDouble(0), e.getDouble(1), e.getDouble(2), e.getDouble(3))
    assert(xmin == -3.5 && ymin == -1.5 && xmax == 7.25 && ymax == 9.0)
    val pts = row.getSeq[scala.collection.Seq[Double]](1)
    pts.foreach { p =>
      assert(p(0) >= xmin && p(0) <= xmax && p(1) >= ymin && p(1) <= ymax)
    }
  }

  test("st_askml renders the reference Geometry shapes (FGU:386-447)") {
    val pt = geomOf("""{"type":"Point","coordinates":[-118.756,50.7]}""")
      .select(st_askml(col("g"))).as[String].head()
    assert(pt == "<Point><coordinates>-118.756,50.7</coordinates></Point>")

    val ls = geomOf("""{"type":"LineString","coordinates":[[1.0,2.0],[3.0,4.0]]}""")
      .select(st_askml(col("g"))).as[String].head()
    assert(ls == "<LineString><coordinates>1.0,2.0 3.0,4.0</coordinates></LineString>")

    val poly = geomOf(
      """{"type":"Polygon","coordinates":[[[0.0,0.0],[1.0,0.0],[0.0,0.0]],[[0.2,0.2],[0.3,0.2],[0.2,0.2]]]}""")
      .select(st_askml(col("g"))).as[String].head()
    assert(poly ==
      "<Polygon><outerBoundaryIs><LinearRing><coordinates>0.0,0.0 1.0,0.0 0.0,0.0" +
      "</coordinates></LinearRing></outerBoundaryIs><innerBoundaryIs><LinearRing>" +
      "<coordinates>0.2,0.2 0.3,0.2 0.2,0.2</coordinates></LinearRing></innerBoundaryIs></Polygon>")

    val mp = geomOf(
      """{"type":"MultiPolygon","coordinates":[[[[0.0,0.0],[1.0,0.0],[0.0,0.0]]],[[[2.0,2.0],[3.0,2.0],[2.0,2.0]]]]}""")
      .select(st_askml(col("g"))).as[String].head()
    assert(mp.startsWith("<MultiGeometry><Polygon>") &&
      mp.endsWith("</Polygon></MultiGeometry>"))
  }

  test("st_geomfromkml inverts st_askml on every geometry kind (round-trip)") {
    val shapes = Seq(
      """{"type":"Point","coordinates":[-118.756,50.7]}""",
      """{"type":"LineString","coordinates":[[-118.8,50.65],[-118.78,50.67],[0.001,-42.25]]}""",
      """{"type":"Polygon","coordinates":[[[0.0,0.0],[4.0,0.0],[4.0,4.0],[0.0,0.0]],[[1.0,1.0],[2.0,1.0],[1.0,2.0],[1.0,1.0]],[[3.0,3.0],[3.5,3.0],[3.0,3.5],[3.0,3.0]]]}""",
      """{"type":"MultiPolygon","coordinates":[[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,0.0]],[[0.2,0.2],[0.4,0.2],[0.2,0.4],[0.2,0.2]]],[[[5.0,5.0],[6.0,5.0],[6.0,6.0],[5.0,5.0]]]]}""")
    shapes.foreach { in =>
      val rows = geomOf(in)
        .select(col("g"), st_geomfromkml(st_askml(col("g"))).as("rt"))
        .filter(col("g") === col("rt"))
      assert(rows.count() == 1, s"KML round-trip changed the geometry for $in")
    }
  }

  test("st_geomfromkml inverts st_askml over every fixture geometry (property)") {
    // the ATES golden fixtures carry every kind the reference stores,
    // including multi-ring polygons and MultiGeometry
    graft.ates.Fixtures.tables(spark).foreach { case (name, df) =>
      if (df.columns.contains("geom")) {
        val g = df.select(col("geom")).filter(col("geom").isNotNull)
        val n = g.count()
        val intact = g
          .select(col("geom"), st_geomfromkml(st_askml(col("geom"))).as("rt"))
          .filter(col("geom") === col("rt"))
          .count()
        assert(intact == n, s"$name: ${n - intact} geometries broke the KML round-trip")
      }
    }
  }

  test("st_geomfromkml tolerates altitude terms and rejects junk") {
    val rt = Seq("<Point><coordinates>1.5,2.5,99.0</coordinates></Point>")
      .toDF("k").select(st_geomfromkml(col("k")).as("g"))
      .select(st_x(col("g")), st_y(col("g"))).as[(Double, Double)].head()
    assert(rt == ((1.5, 2.5)), "altitude term must be dropped")
    val junk = Seq("<Banana>7</Banana>").toDF("k")
      .select(st_geomfromkml(col("k"))).head()
    assert(junk.isNullAt(0), "non-geometry markup must parse to null")
  }

  test("kml color conversion is byte-pair reversal and an involution") {
    assert(graft.ates.Styles.kmlColor("ffc107ff") == "ff07c1ff")
    assert(graft.ates.Styles.kmlColor("rrggbbaa".replace("r", "1")
      .replace("g", "2").replace("b", "3").replace("a", "4")) == "44332211")
    val c = "55ff0088"
    assert(graft.ates.Styles.kmlColor(graft.ates.Styles.kmlColor(c)) == c)
  }
}
