package graft.operators

import java.awt.image.BufferedImage

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Image perceptual-hash (dHash) near-duplicate detection — the multimodal
  * analogue of text SimHash dedup (SURVEY §2.11; the reference
  * delegates all raster work to external tools, nearest surface
  * `from-ground-up.js:73-90`'s PostGIS delegation pattern).
  *
  * dHash: decode → deterministic integer box-average to a 9×8 gray grid →
  * 64 bits, bit (y·8+x) set iff grid(x,y) > grid(x+1,y) (horizontal
  * gradient sign). Robust to re-encoding, scaling and small noise; a
  * Hamming-ball query over the sketches finds near-duplicate images.
  *
  * Scale posture, mirroring the text dedup family:
  *  - decode + hash is a NARROW `mapPartitions` pass (the batch-codec seam
  *    of [[Multimodal.decodeMeta]]) — image bytes never shuffle; only the
  *    8-byte sketch and id flow downstream;
  *  - pair generation reuses [[Dedup.hammingBandPairs]]: pigeonhole
  *    bit-banding (EXACT candidate generation, never all-pairs), one
  *    shuffle on an 8-byte band key, skew-capped buckets with an
  *    observable drop count.
  *
  * Every arithmetic step is integer and platform-independent (no
  * Graphics2D resampling, whose kernels are implementation-defined), so
  * the sketch of a given raster is bit-reproducible across JVMs — the
  * property the DuckDB oracle relies on.
  */
object ImageHash {

  val GridW = 9 // 9 columns → 8 horizontal comparisons per row
  val GridH = 8

  case class ImageSketch(id: Long, dhash: Option[Long])

  /** Integer luma numerator: 299·R + 587·G + 114·B (sums to 1000·gray for
    * gray pixels, so gray rasters hash from their exact byte values). */
  private def lumaNum(rgb: Int): Long =
    299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
      114L * (rgb & 0xFF)

  /** Deterministic box-average of `img` down to [[GridW]]×[[GridH]]:
    * cell (gx, gy) averages the pixel block
    * [⌊gx·W/9⌋, ⌊(gx+1)·W/9⌋) × [⌊gy·H/8⌋, ⌊(gy+1)·H/8⌋) (clamped to one
    * pixel when the image is narrower than the grid), integer division
    * applied ONCE over the summed numerators — no per-pixel rounding, no
    * floating point. */
  def grayGrid(img: BufferedImage): Array[Array[Int]] = {
    val w = img.getWidth
    val h = img.getHeight
    Array.tabulate(GridH, GridW) { (gy, gx) =>
      val x0 = math.min(gx * w / GridW, w - 1)
      val x1 = math.max(x0 + 1, (gx + 1) * w / GridW)
      val y0 = math.min(gy * h / GridH, h - 1)
      val y1 = math.max(y0 + 1, (gy + 1) * h / GridH)
      var sum = 0L
      var y = y0
      while (y < y1) {
        var x = x0
        while (x < x1) { sum += lumaNum(img.getRGB(x, y)); x += 1 }
        y += 1
      }
      (sum / (1000L * (x1 - x0) * (y1 - y0))).toInt
    }
  }

  /** 64-bit dHash of a decoded image. */
  def dhash64(img: BufferedImage): Long = {
    val g = grayGrid(img)
    var bits = 0L
    var gy = 0
    while (gy < GridH) {
      var gx = 0
      while (gx < GridW - 1) {
        if (g(gy)(gx) > g(gy)(gx + 1)) bits |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    bits
  }

  /** dHash of raw encoded bytes via a REAL JDK imageio decode (PNG, JPEG,
    * GIF, BMP); None for undecodable bytes — a scraped corpus has broken
    * files, and a null sketch (not a silent drop, not a crash) is the
    * behavior a 100 TB metadata pass needs. */
  def dhashBytes(data: Array[Byte]): Option[Long] =
    try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(data))).map(dhash64)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Sketch table (id, dhash) over binary image payloads: narrow
    * `mapPartitions` batch decode, nullable dhash for undecodable rows. */
  def sketchTable(spark: SparkSession, media: DataFrame, idCol: Column,
      dataCol: Column): Dataset[ImageSketch] = {
    import spark.implicits._
    media.select(idCol.as("id"), dataCol.as("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // one decoder context per partition would be initialized here
        rows.map { case (id, data) => ImageSketch(id, dhashBytes(data)) }
      }
  }

  /** Near-duplicate image pairs within `maxHamming` dHash bits, without an
    * all-pairs comparison: decode+hash narrowly, then pigeonhole bit-band
    * via [[Dedup.hammingBandPairs]]. Undecodable rows (null sketch) are
    * excluded — null means "unknown", not "matches everything".
    *
    * Output: (id_a, id_b, hamming), id_a < id_b. */
  def nearDupPairs(spark: SparkSession, media: DataFrame, idCol: Column,
      dataCol: Column, maxHamming: Int = 10, maxBucket: Int = 4096,
      drops: Option[org.apache.spark.sql.Observation] = None): DataFrame =
    Dedup.hammingBandPairs(
      sketchTable(spark, media, idCol, dataCol).toDF()
        .filter(col("dhash").isNotNull),
      col("id"), col("dhash"), maxHamming, maxBucket, drops)
}
