package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._
import graft.sources.Tables

/** Driver-checkable geometry queries (SURVEY §2.8 F7-F10): the corpus has no
  * geometry columns, so these construct geometries from numeric columns and
  * exercise the same expression family the ATES pipeline uses —
  * construction, GeoJSON render, KML render, envelope — with plain-SQL
  * DuckDB oracles.
  */
object Geo extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  override def defs: Map[String, Q] = Map(
    // Point construction + GeoJSON + KML render + accessors, one pass.
    "q_geo_point" -> ((s, dir) => {
      val g = st_point(col("c_acctbal"), col("c_custkey").cast("double"))
      t(s, dir, "customer")
        .filter(col("c_custkey") < 100)
        .select(col("c_custkey"),
          st_asgeojson(g).as("geojson"),
          st_askml(g).as("kml"),
          st_x(g).as("x"), st_y(g).as("y"))
        .orderBy(col("c_custkey"))
    }),

    // Per-group LineString from sorted points → envelope → bbox fields.
    // The aggregation shape mirrors warnify (group → collect → one geometry
    // per group); envelope is pure per-row compute after the shuffle.
    "q_geo_envelope" -> ((s, dir) => {
      val pts = sort_array(collect_list(
        array(col("c_custkey").cast("double"), col("c_acctbal"))))
      val lineOfPts = st_linestring(col("__pts"))
      val e = st_envelope(lineOfPts)
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(pts.as("__pts"))
        .select(col("c_nationkey"),
          e.getField("xmin").as("xmin"), e.getField("ymin").as("ymin"),
          e.getField("xmax").as("xmax"), e.getField("ymax").as("ymax"),
          st_npoints(lineOfPts).as("npoints"))
        .orderBy(col("c_nationkey"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q_geo_point" ->
      """SELECT c_custkey,
        |  '{"type":"Point","coordinates":[' || to_json(c_acctbal) || ',' ||
        |    to_json(CAST(c_custkey AS DOUBLE)) || ']}' AS geojson,
        |  '<Point><coordinates>' || CAST(c_acctbal AS VARCHAR) || ',' ||
        |    CAST(CAST(c_custkey AS DOUBLE) AS VARCHAR) ||
        |    '</coordinates></Point>' AS kml,
        |  c_acctbal AS x, CAST(c_custkey AS DOUBLE) AS y
        |FROM customer WHERE c_custkey < 100 ORDER BY c_custkey""".stripMargin,

    "q_geo_envelope" ->
      """SELECT c_nationkey,
        |  MIN(CAST(c_custkey AS DOUBLE)) AS xmin, MIN(c_acctbal) AS ymin,
        |  MAX(CAST(c_custkey AS DOUBLE)) AS xmax, MAX(c_acctbal) AS ymax,
        |  CAST(COUNT(*) AS INT) AS npoints
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
  )
}
