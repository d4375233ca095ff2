package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import graft.operators.{ImageHash, Multimodal}

/** Image perceptual-hash (dHash) near-dup: real PNG/BMP rasters, planted
  * retouched variants, banding recall vs brute force. */
class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  private def png(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic gray-noise image per seed. */
  private def noiseImage(seed: Int, w: Int = 63, h: Int = 48): BufferedImage = {
    val rnd = new scala.util.Random(seed)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = rnd.nextInt(256)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    img
  }

  /** Copy with one grid cell's pixels retouched (+delta, clamped) — a
    * small local edit, the near-dup class dHash must tolerate. */
  private def retouch(src: BufferedImage, delta: Int): BufferedImage = {
    val img = new BufferedImage(src.getWidth, src.getHeight,
      BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until src.getHeight; x <- 0 until src.getWidth) {
      val g0 = src.getRGB(x, y) & 0xFF
      // retouch the block that box-averages into grid cell (4, 3)
      val inBlock = x >= 4 * src.getWidth / 9 && x < 5 * src.getWidth / 9 &&
        y >= 3 * src.getHeight / 8 && y < 4 * src.getHeight / 8
      val g = if (inBlock) math.min(255, math.max(0, g0 + delta)) else g0
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    img
  }

  /** The oracle-side arithmetic: dHash predicted straight from payload
    * bytes under the bmpFromBytes pixel layout. */
  private def predictedDHash(payload: Array[Byte]): Long = {
    def b(i: Int): Int = payload(i % payload.length) & 0xFF
    var bits = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if (b(y * 9 + x) > b(y * 9 + x + 1)) bits |= 1L << (y * 8 + x)
    bits
  }

  test("bmpFromBytes writes a real BMP: JDK decode recovers the exact " +
    "payload gray levels and the decode-side dHash equals the arithmetic") {
    val text = "the quick brown fox jumps over the lazy dog again and again ok"
    val bytes = spark.range(1).select(
      Multimodal.bmpFromBytes(lit(text.getBytes("UTF-8")), 9, 8).as("bmp"))
      .as[Array[Byte]].head()
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "BMP did not decode")
    assert(img.getWidth == 9 && img.getHeight == 8)
    val payload = text.getBytes("UTF-8")
    for (y <- 0 until 8; x <- 0 until 9) {
      val expected = payload((y * 9 + x) % payload.length) & 0xFF
      val got = img.getRGB(x, y) & 0xFF
      assert(got == expected, s"pixel ($x,$y): got $got expected $expected")
    }
    assert(ImageHash.dhash64(img) == predictedDHash(payload),
      "decode-side dHash diverges from the byte arithmetic the oracle uses")
  }

  test("dHash survives re-encode and a local retouch; distinct images are " +
    "far; undecodable bytes sketch to null") {
    val imgs = (0 until 20).map(noiseImage(_))
    val hashes = imgs.map(ImageHash.dhash64)
    // lossless re-encode: identical raster, identical hash
    val rt = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png(imgs.head)))
    assert(ImageHash.dhash64(rt) == hashes.head)
    // a one-cell retouch flips at most the cell's two comparison bits
    for ((img, h) <- imgs.zip(hashes)) {
      val d = java.lang.Long.bitCount(
        ImageHash.dhash64(retouch(img, 12)) ^ h)
      assert(d <= 2, s"retouch moved dHash by $d bits")
    }
    // distinct noise images live ~32 bits apart; 8 is a wide safety margin
    for (i <- hashes.indices; j <- i + 1 until hashes.length) {
      val d = java.lang.Long.bitCount(hashes(i) ^ hashes(j))
      assert(d > 8, s"images $i/$j unexpectedly close: $d bits")
    }
    val sk = ImageHash.sketchTable(spark,
      Seq((1L, "not an image".getBytes("UTF-8")),
        (2L, null.asInstanceOf[Array[Byte]])).toDF("id", "data"),
      col("id"), col("data")).collect().sortBy(_.id)
    assert(sk(0).dhash.isEmpty, "garbage bytes must sketch to null")
    assert(sk(1).dhash.isEmpty,
      "a NULL payload must sketch to null, not crash the pass")
  }

  test("banded near-dup pairs: recall 1.0 on planted retouches and exact " +
    "parity with the brute-force Hamming join") {
    val base = (0 until 20).map(i => (i.toLong, png(noiseImage(i))))
    val variants = (0 until 20).map(i =>
      (i + 1000L, png(retouch(noiseImage(i), 12))))
    val media = (base ++ variants).toDF("media_id", "data")
    val pairs = ImageHash.nearDupPairs(spark, media, col("media_id"),
        col("data"), maxHamming = 4, maxBucket = 4096)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .as[(Long, Long, Int)].collect()
    val found = pairs.map(p => (p._1, p._2)).toSet
    for (i <- 0 until 20)
      assert(found.contains((i.toLong, i + 1000L)),
        s"planted pair ($i, ${i + 1000}) missed by banding")
    // brute force over the same sketches — banding is exact under the cap
    val sk = ImageHash.sketchTable(spark, media, col("media_id"),
      col("data")).collect().map(s => (s.id, s.dhash.get))
    val brute = (for {
      (ia, ha) <- sk; (ib, hb) <- sk if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 4
    } yield (ia, ib, d)).toSet
    assert(pairs.toSet == brute,
      s"banded pairs != brute force (${pairs.length} vs ${brute.size})")
  }
}
