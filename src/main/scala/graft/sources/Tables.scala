package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Source layer: named-table access over the test corpus plus the schema
  * registry for both table families the engine serves.
  *
  * The reference's source layer is a parametrized SQL scan per named table
  * (`/root/reference/src/from-ground-up.js:84-90`, executed at `:149-163`);
  * here a "scan" is `spark.read.parquet` (columnar, vectorized, with
  * predicate/projection pushdown handled by the parquet DataSource), and the
  * declared per-query column lists of the reference
  * (`src/from-ground-up.js:303-357`) become plain `.select`s that Catalyst
  * prunes down to the file footer level.
  *
  * At 100 TB the same entry point serves partitioned/bucketed parquet or any
  * DataSource V2 table; nothing below assumes file sizes.
  */
object Tables {

  /** TPC-H-ish driver corpus table names (TESTDATA.md). */
  val corpus: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Read one corpus table from a scale-factor directory.
    *
    * `events.ts` is TIMESTAMP(NANOS) in the files; with
    * `spark.sql.legacy.parquet.nanosAsLong` it arrives as long nanoseconds
    * and is converted here to a proper TimestampType (µs) via integer
    * division — never a double path, since ns-since-epoch > 2^53. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = loadRaw(spark, sfDir, name)
    if (name == "events" &&
        df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** The uncorrected read (streaming uses it to probe the on-disk schema). */
  def loadRaw(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register all corpus tables as temp views (for spark.sql entry points). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    corpus.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** S1 — live-database scan, the engine form of the reference's pg
    * prepared-statement source (`/root/reference/src/from-ground-up.js:
    * 149-163`). Filters and projections on the returned frame push down
    * over JDBC (Catalyst emits them into the remote query); `partitionCol`
    * + bounds split the scan into `numPartitions` parallel range reads —
    * the knob that matters on a large table. */
  def readJdbc(spark: SparkSession, url: String, table: String,
      props: java.util.Properties = new java.util.Properties(),
      partitionCol: Option[String] = None,
      lowerBound: Long = 0, upperBound: Long = 0,
      numPartitions: Int = 1): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    val withPart = partitionCol.fold(r)(c =>
      r.option("partitionColumn", c)
        .option("lowerBound", lowerBound).option("upperBound", upperBound)
        .option("numPartitions", numPartitions))
    props.forEach((k, v) => withPart.option(k.toString, v.toString))
    withPart.load()
  }

  /** S3 — JSON source (the reference's fixture-file generator,
    * `/root/reference/test/testy_stuff.js:3-16`): JSON-lines by default,
    * `multiLine` for whole-array documents. */
  def readJson(spark: SparkSession, path: String,
      schema: Option[StructType] = None, multiLine: Boolean = false): DataFrame = {
    val r = spark.read.option("multiLine", multiLine)
    schema.fold(r)(r.schema).json(path)
  }

  /** CSV source with header/schema handling (declared source surface). */
  def readCsv(spark: SparkSession, path: String,
      schema: Option[StructType] = None, header: Boolean = true,
      delimiter: String = ","): DataFrame = {
    val r = spark.read.option("header", header).option("delimiter", delimiter)
    schema.fold(r.option("inferSchema", true))(r.schema).csv(path)
  }

  /** ORC source (declared source surface) — columnar like parquet, with the
    * same vectorized reader + pushdown path; interchange format for
    * Hive-era lakes. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Geometry model (SURVEY §1.4): one GeoJSON-shaped tagged struct for the
    * whole ADT the reference dispatches on by key presence
    * (/root/reference/src/from-ground-up.js:442-446) — see
    * [[graft.functions.GeoFunctions]] for the layout contract. */
  val geometryType: StructType = graft.functions.GeoFunctions.geometryType

  /** ATES relational schemas inferred from the reference's query column lists
    * (/root/reference/src/from-ground-up.js:303-357, :865-922). */
  val atesSchemas: Map[String, StructType] = Map(
    "areas_vw" -> StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("geom", geometryType))),
    "points_of_interest" -> StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("area_id", LongType),
      StructField("name", StringType),
      StructField("type", StringType),
      StructField("comments", StringType),
      StructField("geom", geometryType))),
    "access_roads" -> StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("area_id", LongType),
      StructField("description", StringType),
      StructField("geom", geometryType))),
    "avalanche_paths" -> StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("area_id", LongType),
      StructField("name", StringType),
      StructField("geom", geometryType))),
    "decision_points" -> StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("area_id", LongType),
      StructField("name", StringType),
      StructField("comments", StringType),
      StructField("geom", geometryType))),
    "decision_points_warnings" -> StructType(Seq(
      StructField("decision_point_id", LongType, nullable = false),
      StructField("warning", StringType),
      StructField("type", StringType))),
    "zones" -> StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("area_id", LongType),
      StructField("class_code", IntegerType),
      StructField("comments", StringType),
      StructField("geom", geometryType)))
  )

  /** Bilingual presentation-name dimension, the engine form of the name maps
    * duplicated at /root/reference/src/from-ground-up.js:40-57 and
    * src/mapboxing.js:18-35. Tiny: always broadcast when joined. */
  val tableDisplayNames: Seq[(String, String, String)] = Seq(
    ("areas_vw", "Area", "Régions"),
    ("points_of_interest", "Points of Interest", "Points d'intérêt"),
    ("access_roads", "Access Roads", "Routes d'accès"),
    ("avalanche_paths", "Avalanche Paths", "Couloirs d'avalanche"),
    ("decision_points", "Decision Points", "point de décision"),
    ("zones", "Zones", "Zones"))
}
