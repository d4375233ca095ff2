package graft.ates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions

/** Deterministic in-memory ATES fixture tables (FIXTURES.md §4), seeded from
  * the reference's test fixtures: 4 points of interest
  * (`/root/reference/test/testy_stuff.js:65-87` — Parking, Cabin, 2×
  * Destination), avalanche paths incl. the `"Untitled Path"` edge case
  * (`:112-141`), ≥2 decision points with warnings of both types
  * (`src/from-ground-up.js:239-242`), 2 areas, 3 zones with class_code 1-3
  * (`:644-650`). Geometry is authored as GeoJSON strings and parsed through
  * the engine's own `st_geomfromgeojson`, so fixtures exercise the decode
  * path too.
  */
object Fixtures {

  private def geoTable(
      spark: SparkSession,
      cols: Seq[String],
      rows: Seq[Seq[Any]],
      geojson: Seq[String]): DataFrame = {
    import spark.implicits._
    val withGeom = rows.zip(geojson).map { case (r, g) => r :+ g }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(withGeom.map(org.apache.spark.sql.Row(_: _*)), 2),
      org.apache.spark.sql.types.StructType(
        (cols :+ "geom_json").map { c =>
          val dt = c match {
            case "id" | "area_id" | "decision_point_id" => org.apache.spark.sql.types.LongType
            case "class_code" => org.apache.spark.sql.types.IntegerType
            case _ => org.apache.spark.sql.types.StringType
          }
          org.apache.spark.sql.types.StructField(c, dt)
        }))
    df.withColumn("geom", GeoFunctions.st_geomfromgeojson(col("geom_json")))
      .drop("geom_json")
  }

  private def pt(x: Double, y: Double) =
    s"""{"type":"Point","coordinates":[$x,$y]}"""
  private def line(pts: (Double, Double)*) =
    s"""{"type":"LineString","coordinates":[${pts.map(p => s"[${p._1},${p._2}]").mkString(",")}]}"""
  private def poly(ring: (Double, Double)*) =
    s"""{"type":"Polygon","coordinates":[[${ring.map(p => s"[${p._1},${p._2}]").mkString(",")}]]}"""

  /** All 7 ATES relations as name → DataFrame. */
  def tables(spark: SparkSession): Map[String, DataFrame] = Map(
    "areas_vw" -> geoTable(spark,
      Seq("id", "name"),
      Seq(Seq(357L, "Test Area"), Seq(358L, "Second Area")),
      Seq(
        poly((-118.80, 50.65), (-118.70, 50.65), (-118.70, 50.75), (-118.80, 50.75), (-118.80, 50.65)),
        poly((-119.10, 51.00), (-119.00, 51.00), (-119.00, 51.10), (-119.10, 51.10), (-119.10, 51.00)))),

    "points_of_interest" -> geoTable(spark,
      Seq("id", "area_id", "name", "type", "comments"),
      Seq(
        Seq(1L, 357L, "Parking", "Parking", "main lot"),
        Seq(2L, 357L, "Cabin", "Cabin", null),
        Seq(3L, 357L, "Summit", "Destination", "long day"),
        Seq(4L, 357L, "Viewpoint", "Destination", null)),
      Seq(
        pt(-118.756, 50.700), pt(-118.760, 50.710),
        pt(-118.770, 50.720), pt(-118.780, 50.730))),

    "access_roads" -> geoTable(spark,
      Seq("id", "area_id", "description"),
      Seq(Seq(10L, 357L, "Forest service road"), Seq(11L, 357L, "Spur & branch")),
      Seq(
        line((-118.80, 50.65), (-118.78, 50.67), (-118.76, 50.69)),
        line((-118.76, 50.69), (-118.75, 50.70)))),

    "avalanche_paths" -> geoTable(spark,
      Seq("id", "area_id", "name"),
      Seq(
        Seq(20L, 357L, "Path 1.1"), Seq(21L, 357L, "Untitled Path"),
        Seq(22L, 357L, "Path 2.0")),
      Seq(
        line((-118.77, 50.71), (-118.76, 50.72)),
        line((-118.75, 50.70), (-118.74, 50.71)),
        line((-118.73, 50.69), (-118.72, 50.70)))),

    "decision_points" -> geoTable(spark,
      Seq("id", "area_id", "name", "comments"),
      Seq(
        Seq(30L, 357L, "DP Alpha", "exposed slope"),
        Seq(31L, 357L, "DP Bravo", null),
        Seq(32L, 358L, "DP Charlie", "other area")),
      Seq(pt(-118.758, 50.702), pt(-118.762, 50.712), pt(-119.05, 51.05))),

    "decision_points_warnings" -> {
      import spark.implicits._
      Seq(
        (30L, "Steep convex roll", "Concern"),
        (30L, "Wind loading", "Concern"),
        (30L, "Stick to the ridge", "Managing risk"),
        (30L, "Travel one at a time", "Managing risk"),
        (31L, "Terrain trap below", "Concern"),
        (31L, "Use the low-angle exit", "Managing risk"),
        (32L, "Cornice hazard", "Concern"))
        .toDF("decision_point_id", "warning", "type")
    },

    "zones" -> geoTable(spark,
      Seq("id", "area_id", "class_code", "comments"),
      Seq(
        Seq(40L, 357L, 1, "simple terrain"),
        Seq(41L, 357L, 2, "challenging"),
        Seq(42L, 357L, 3, "complex <steep>")),
      Seq(
        poly((-118.79, 50.66), (-118.77, 50.66), (-118.77, 50.68), (-118.79, 50.68), (-118.79, 50.66)),
        poly((-118.76, 50.69), (-118.74, 50.69), (-118.74, 50.71), (-118.76, 50.71), (-118.76, 50.69)),
        """{"type":"MultiPolygon","coordinates":[[[[-118.73,50.72],[-118.71,50.72],[-118.71,50.74],[-118.73,50.74],[-118.73,50.72]]],[[[-118.70,50.66],[-118.69,50.66],[-118.69,50.67],[-118.70,50.67],[-118.70,50.66]]]]}"""))
  )
}
