package graft.sinks

import java.io.{BufferedOutputStream, FileOutputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Output sinks (SURVEY §2.1 S4-S8).
  *
  * Split by cardinality: per-table feature dumps are distributed writes
  * (executors write partitioned text, the 100 TB path); single-document
  * outputs (one FeatureCollection / KML / KMZ per request) are driver-side
  * by nature — the reference's own envelope is O(10²-10³) rows per document
  * (`/root/reference/src/from-ground-up.js:284-295`).
  */
object Sinks {

  /** S5 — GeoJSON-LD per-table sink (`src/mapboxing.js:312-333`). Features
    * written as JSON-lines partitioned by table (`table=<name>/` dirs — the
    * LD-correct distributed form of the reference's per-table file writes,
    * MBX:324-329). ONE pass over the feature plan: a per-table filter loop
    * would re-execute the 6-branch union (incl. the warnify shuffle) once
    * per table — a 7× cost multiplier at scale. */
  def writeGeoJsonLd(features: DataFrame, outDir: String): Unit =
    features.select(col("table"), col("feature"))
      .write.mode("overwrite").partitionBy("table").text(outDir)

  /** S4 — single-document GeoJSON FeatureCollection to a file (the
    * reference prints to stdout, FGU:362-368). */
  def writeGeoJsonDoc(doc: String, path: String): Unit =
    Files.write(Paths.get(path), doc.getBytes(StandardCharsets.UTF_8))

  /** S7 — KMZ zip sink (`makeKMZStream`, FGU:933-974): doc.kml at maximum
    * compression (zlib level 9, FGU:941) plus an optional icon directory. */
  def writeKmz(kml: String, out: OutputStream,
      iconDir: Option[java.io.File] = None): Unit = {
    val zip = new ZipOutputStream(out)
    zip.setLevel(Deflater.BEST_COMPRESSION)
    zip.putNextEntry(new ZipEntry("doc.kml"))
    zip.write(kml.getBytes(StandardCharsets.UTF_8))
    zip.closeEntry()
    iconDir.filter(_.isDirectory).foreach { dir =>
      dir.listFiles().foreach { f =>
        zip.putNextEntry(new ZipEntry(s"${dir.getName}/${f.getName}"))
        zip.write(Files.readAllBytes(f.toPath))
        zip.closeEntry()
      }
    }
    zip.finish()
  }

  def writeKmzFile(kml: String, path: String,
      iconDir: Option[java.io.File] = None): Unit = {
    val os = new BufferedOutputStream(new FileOutputStream(path))
    try writeKmz(kml, os, iconDir) finally os.close()
  }

  /** Training-shard JSONL export — the handoff format between a data
    * pipeline and a training loader: one JSON object per line, sharded
    * into bounded files (`maxRecordsPerShard` via the writer's
    * `maxRecordsPerFile`, so shard sizing is enforced by the engine, not
    * by a driver loop), optionally partitioned by a mix column (per-
    * language directories). Fully distributed — every executor writes its
    * own shards; nothing funnels through the driver. */
  def writeJsonlShards(df: DataFrame, outDir: String,
      maxRecordsPerShard: Long, partitionCols: Seq[String] = Nil): Unit = {
    require(maxRecordsPerShard > 0,
      s"maxRecordsPerShard must be positive, got $maxRecordsPerShard")
    val w = df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerShard.toString)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .json(outDir)
  }

  /** S8 — Mapbox tileset recipe generator (`src/make-recipe.js:12-55`):
    * layer name → basic source with zoom range; optionally wrapped in a
    * publish message. Plain JSON rendering, 2-space indent like the
    * reference's `JSON.stringify(output, null, 2)` (MR:53-55). */
  def recipeJson(layerNames: Seq[String], username: String,
      tilesetName: String = "test", wrap: Boolean = false): String = {
    def layer(name: String): String =
      s"""    "$name": {
         |      "source": "mapbox://tileset-source/$username/$name",
         |      "minzoom": 0,
         |      "maxzoom": 22
         |    }""".stripMargin
    val layers = layerNames.map(layer).mkString(",\n")
    val recipe =
      s"""{
         |  "version": 1,
         |  "layers": {
         |$layers
         |  }
         |}""".stripMargin
    if (!wrap) recipe
    else {
      val indented = recipe.linesIterator.map("  " + _).mkString("\n").trim
      s"""{
         |  "recipe": $indented,
         |  "name": "$tilesetName"
         |}""".stripMargin
    }
  }
}
