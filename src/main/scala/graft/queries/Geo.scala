package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._
import graft.operators.SpatialJoin
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

    // KML ingest (F6): render → parse → re-render. The oracle computes the
    // same output WITHOUT any KML, so a hash match proves the Spark-side
    // parse is the exact inverse of the render.
    "q_geo_kml_ingest" -> ((s, dir) => {
      val g = st_point(col("c_acctbal"), col("c_custkey").cast("double"))
      // the parsed geometry is multiply-referenced — stage it once, or the
      // whole render→parse tree inlines into every accessor (Janino bloat)
      t(s, dir, "customer")
        .filter(col("c_custkey") < 100)
        .select(col("c_custkey"),
          st_geomfromkml(st_askml(g)).as("__g"))
        .select(col("c_custkey"),
          st_asgeojson(col("__g")).as("geojson"),
          st_x(col("__g")).as("x"), st_y(col("__g")).as("y"))
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
    }),

    // Grid-blocked spatial join: customers as points (acctbal, nationkey)
    // against literal rectangle polygons. Non-round bounds keep every point
    // strictly off polygon edges, so even-odd refinement matches the
    // oracle's strict range predicates exactly.
    "q_geo_spatial" -> ((s, dir) => {
      import s.implicits._
      val boxes = SpatialBoxes.boxes.map { case (id, x0, y0, x1, y1) =>
        (id,
          s"""{"type":"Polygon","coordinates":[[[$x0,$y0],[$x1,$y0],[$x1,$y1],[$x0,$y1],[$x0,$y0]]]}""")
      }.toDF("box_id", "gj")
        .select(col("box_id"), st_geomfromgeojson(col("gj")).as("geom"))
      val pts = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"),
          col("c_nationkey").cast("double").as("nk"))
      SpatialJoin.pointsInPolygons(pts, boxes,
          x = col("c_acctbal"), y = col("nk"),
          polyGeom = col("geom"), polyId = col("box_id"),
          cellSize = 1000.0)
        .select(col("c_custkey"), col("polygon_id").as("box_id"))
        .orderBy(col("c_custkey"), col("box_id"))
    }),

    // Antimeridian-safe containment (round 9): customers mapped onto the
    // globe by key arithmetic, tested against a literal rectangle CROSSING
    // ±180° with st_contains_geo (recentered ray cast). The oracle
    // replays the identical wrap-to-(−180,180] arithmetic and the strict
    // recentered bbox (the rectangle is axis-aligned, so even-odd
    // containment ≡ the strict range test) — a wrong recentering or a
    // biased boundary comparison on either engine fails the hash. All
    // values are exact binary fractions (.5 offsets), so no comparison
    // can tie: lon grid is integral, bounds are half-integral.
    "q_geo_seam" -> ((s, dir) => {
      val seam =
        """{"type":"Polygon","coordinates":[[[170.5,-9.5],[-170.5,-9.5],
          |[-170.5,9.5],[170.5,9.5],[170.5,-9.5]]]}""".stripMargin
          .replace("\n", "")
      t(s, dir, "customer")
        .select(col("c_custkey"),
          (col("c_custkey") * 7 % 360 - 180).cast("double").as("lon"),
          (col("c_custkey") * 13 % 140 - 70).cast("double").as("lat"))
        .filter(SpatialJoin.st_contains_geo(
          st_geomfromgeojson(lit(seam)), col("lon"), col("lat")))
        .orderBy(col("c_custkey"))
    }),

    // Pole containment (round 11): customers mapped onto the globe, tested
    // against two polar caps — a north cap and a south cap, each with a
    // ZIGZAG boundary (vertex latitudes alternate) so the crossing-latitude
    // interpolation genuinely decides membership, not a constant-latitude
    // comparison. st_contains_geo detects the ±360° winding and routes to
    // st_contains_sphere (the bent-meridian-ray even-odd test); the oracle
    // replays the identical wrap / crossing / interpolation arithmetic in
    // SQL, anchor term included — the reference inherits this case from
    // PostGIS geography (from-ground-up.js:73-90), where pole caps are
    // simply valid. All fixture values are half-integers (vertices) against
    // integral point coordinates: every wrap is exact, no comparison ties.
    "q_geo_pole" -> ((s, dir) => {
      val pts = t(s, dir, "customer").select(col("c_custkey"),
        (col("c_custkey") * 7 % 360 - 180).cast("double").as("lon"),
        (col("c_custkey") * 13 % 178 - 89).cast("double").as("lat"))
      PoleCaps.caps.map { case (id, vs) =>
        pts.filter(SpatialJoin.st_contains_geo(
            st_geomfromgeojson(lit(PoleCaps.geojson(vs))),
            col("lon"), col("lat")))
          .select(lit(id).cast("int").as("cap_id"), col("c_custkey"),
            col("lon"), col("lat"))
      }.reduce(_.unionAll(_)).orderBy(col("cap_id"), col("c_custkey"))
    }),

    // Grid-blocked ε-distance self-join on supplier points — the spatial
    // "within distance" operator; oracle is the all-pairs filter (supplier
    // is small enough for an exact n² oracle).
    "q_geo_distance" -> ((s, dir) =>
      graft.operators.SpatialJoin.pointsWithinDistance(
          t(s, dir, "supplier"),
          x = col("s_acctbal"), y = col("s_nationkey").cast("double") * 100.0,
          idCol = col("s_suppkey"),
          radius = 500.0, cellSize = 500.0)
        .orderBy(col("id_a"), col("id_b"))),

    // Density clustering (round 10): DBSCAN's core move — ε-neighbor
    // edges, then transitive closure — as a composition of two existing
    // distributed operators: grid-blocked ε-distance self-join
    // (SpatialJoin.pointsWithinDistance — 3×3 cell blocks, never n²) into
    // star-contraction connected components (operators/Components). A
    // point with no ≤ε neighbor is NOISE and absent (the DBSCAN
    // convention); output is each cluster (min-id representative) with
    // its size. The oracle replays the identical float distance predicate
    // (the q_geo_distance expression) and a recursive-CTE closure.
    "q_geo_cluster" -> ((s, dir) => {
      val edges = graft.operators.SpatialJoin.pointsWithinDistance(
          t(s, dir, "supplier"),
          x = col("s_acctbal"), y = col("s_nationkey").cast("double") * 100.0,
          idCol = col("s_suppkey"),
          radius = 500.0, cellSize = 500.0)
        .select(col("id_a").as("u"), col("id_b").as("v"))
      val nodes = edges.select(col("u").as("id"))
        .unionAll(edges.select(col("v").as("id")))
      graft.operators.Components.connectedComponents(edges, nodes)
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_points"))
        .orderBy(col("component"))
    })
  )

  /** Two pole-enclosing zigzag rings: 8 vertices at half-integer
    * longitudes 45° apart (the ring winds a full ±360°), latitudes
    * alternating between two half-integer bands. Cap 1 encircles the
    * north pole, cap 2 the south pole. The SQL edge list and anchor
    * constants derive from the same vertex data, so engine and oracle
    * replay identical arithmetic. */
  private object PoleCaps {
    private def ring(hi: Double, lo: Double): Seq[(Double, Double)] = {
      val vs = (0 until 8).map(k =>
        (-179.5 + 45.0 * k, if (k % 2 == 0) hi else lo))
      vs :+ vs.head
    }
    val caps: Seq[(Int, Seq[(Double, Double)])] =
      Seq(1 -> ring(80.5, 75.5), 2 -> ring(-70.5, -65.5))
    def geojson(vs: Seq[(Double, Double)]): String =
      s"""{"type":"Polygon","coordinates":[[${
        vs.map { case (x, y) => s"[$x,$y]" }.mkString(",")}]]}"""
    /** VALUES rows (cap_id, x1, y1, x2, y2) — one per directed edge. */
    def sqlEdges: String = caps.flatMap { case (id, vs) =>
      vs.sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
        s"($id, $x1, $y1, $x2, $y2)"
      }
    }.mkString(", ")
    /** VALUES rows (cap_id, alon, alat) — the anchor (antipode of the
      * first vertex), replaying st_contains_sphere's
      * `wrap(lon0 + 180), -lat0` on the fixture constants. */
    def sqlAnchors: String = caps.map { case (id, vs) =>
      val (x0, y0) = vs.head
      val aLon = ((x0 + 180 + 180) % 360 + 360) % 360 - 180
      s"($id, $aLon, ${-y0})"
    }.mkString(", ")
  }

  /** (id, xmin, ymin, xmax, ymax) — bounds chosen off any data value. */
  private object SpatialBoxes {
    val boxes: Seq[(Long, Double, Double, Double, Double)] = Seq(
      (1L, 12.345, -0.5, 2999.755, 10.5),
      (2L, 2999.755, 4.5, 6001.115, 20.5),
      (3L, 6001.115, -0.5, 10999.005, 24.5))
    def sqlPredicates: String = boxes.map { case (id, x0, y0, x1, y1) =>
      s"SELECT c_custkey, $id AS box_id FROM customer " +
        s"WHERE c_acctbal > $x0 AND c_acctbal < $x1 " +
        s"AND c_nationkey > $y0 AND c_nationkey < $y1"
    }.mkString(" UNION ALL ")
  }

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

    "q_geo_kml_ingest" ->
      """SELECT c_custkey,
        |  '{"type":"Point","coordinates":[' || to_json(c_acctbal) || ',' ||
        |    to_json(CAST(c_custkey AS DOUBLE)) || ']}' AS geojson,
        |  c_acctbal AS x, CAST(c_custkey AS DOUBLE) AS y
        |FROM customer WHERE c_custkey < 100 ORDER BY c_custkey""".stripMargin,

    "q_geo_envelope" ->
      """SELECT c_nationkey,
        |  MIN(CAST(c_custkey AS DOUBLE)) AS xmin, MIN(c_acctbal) AS ymin,
        |  MAX(CAST(c_custkey AS DOUBLE)) AS xmax, MAX(c_acctbal) AS ymax,
        |  CAST(COUNT(*) AS INT) AS npoints
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_geo_spatial" ->
      s"""SELECT c_custkey, box_id FROM (${SpatialBoxes.sqlPredicates})
         |ORDER BY c_custkey, box_id""".stripMargin,

    // the rectangle's recentered frame: ref = 170.5 (first vertex), so
    // lon 170.5 → 0 and −170.5 → 19; strict bounds because the ray cast
    // uses strict comparisons and no point sits on a boundary
    "q_geo_seam" ->
      """WITH p AS (SELECT c_custkey,
        |    CAST(c_custkey * 7 % 360 - 180 AS DOUBLE) AS lon,
        |    CAST(c_custkey * 13 % 140 - 70 AS DOUBLE) AS lat
        |  FROM customer),
        |r AS (SELECT c_custkey, lon, lat,
        |    ((lon - 170.5 + 180) % 360 + 360) % 360 - 180 AS xr
        |  FROM p)
        |SELECT c_custkey, lon, lat FROM r
        |WHERE xr > 0 AND xr < 19 AND lat > -9.5 AND lat < 9.5
        |ORDER BY c_custkey""".stripMargin,

    // replay of the bent-meridian-ray test: for each (point, cap), count
    // ring-edge crossings of the point's meridian strictly south of the
    // point, plus crossings of the anchor's meridian strictly south of the
    // anchor; odd total = contained. aa/d replay the engine's
    // wrap-to-[−180,180) map; the crossing latitude is the identical
    // linear interpolation, same operation order.
    "q_geo_pole" -> {
      val crossBody =
        """      ((aa < 0) <> (aa + d < 0))
          |      AND y1 + (y2 - y1) * (0 - aa) / d < mlat""".stripMargin
      s"""WITH p AS (SELECT c_custkey,
         |    CAST(c_custkey * 7 % 360 - 180 AS DOUBLE) AS lon,
         |    CAST(c_custkey * 13 % 178 - 89 AS DOUBLE) AS lat
         |  FROM customer),
         |e(cap_id, x1, y1, x2, y2) AS (VALUES ${PoleCaps.sqlEdges}),
         |anch(cap_id, alon, alat) AS (VALUES ${PoleCaps.sqlAnchors}),
         |cx AS (
         |  SELECT c_custkey, cap_id, COUNT(*) AS c FROM (
         |    SELECT p.c_custkey, e.cap_id, e.y1, e.y2, p.lat AS mlat,
         |      ((e.x1 - p.lon + 180) % 360 + 360) % 360 - 180 AS aa,
         |      ((e.x2 - e.x1 + 180) % 360 + 360) % 360 - 180 AS d
         |    FROM p, e)
         |  WHERE
         |$crossBody
         |  GROUP BY 1, 2),
         |ca AS (
         |  SELECT cap_id, COUNT(*) AS c FROM (
         |    SELECT a.cap_id, e.y1, e.y2, a.alat AS mlat,
         |      ((e.x1 - a.alon + 180) % 360 + 360) % 360 - 180 AS aa,
         |      ((e.x2 - e.x1 + 180) % 360 + 360) % 360 - 180 AS d
         |    FROM anch a JOIN e ON e.cap_id = a.cap_id)
         |  WHERE
         |$crossBody
         |  GROUP BY 1)
         |SELECT CAST(pc.cap_id AS INTEGER) AS cap_id, pc.c_custkey,
         |  pc.lon, pc.lat
         |FROM (SELECT p.*, a.cap_id FROM p, anch a) pc
         |LEFT JOIN cx ON cx.c_custkey = pc.c_custkey
         |  AND cx.cap_id = pc.cap_id
         |LEFT JOIN ca ON ca.cap_id = pc.cap_id
         |WHERE (COALESCE(cx.c, 0) + COALESCE(ca.c, 0)) % 2 = 1
         |ORDER BY cap_id, pc.c_custkey""".stripMargin
    },

    "q_geo_distance" ->
      """SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
        |  round(sqrt(power(a.s_acctbal - b.s_acctbal, 2) +
        |    power(a.s_nationkey * 100.0 - b.s_nationkey * 100.0, 2)), 6) AS dist
        |FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
        |WHERE sqrt(power(a.s_acctbal - b.s_acctbal, 2) +
        |  power(a.s_nationkey * 100.0 - b.s_nationkey * 100.0, 2)) <= 500.0
        |ORDER BY id_a, id_b""".stripMargin,

    "q_geo_cluster" ->
      """WITH RECURSIVE e0 AS MATERIALIZED (
        |  SELECT a.s_suppkey AS u, b.s_suppkey AS v
        |  FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
        |  WHERE sqrt(power(a.s_acctbal - b.s_acctbal, 2) +
        |    power(a.s_nationkey * 100.0 - b.s_nationkey * 100.0, 2))
        |    <= 500.0),
        |edges AS MATERIALIZED (
        |  SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
        |nodes AS MATERIALIZED (SELECT DISTINCT u AS id FROM edges),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.id = e.v),
        |comp AS MATERIALIZED (
        |  SELECT id, MIN(r) AS component FROM reach GROUP BY id)
        |SELECT component, COUNT(*) AS n_points
        |FROM comp GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
