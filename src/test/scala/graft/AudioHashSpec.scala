package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._
import graft.operators.{AudioHash, Multimodal}

/** Audio energy-envelope fingerprint: real WAV rasters, gain invariance,
  * planted edits, banding recall vs brute force. */
class AudioHashSpec extends SparkSpec {
  import spark.implicits._

  /** Canonical 44-byte-header 16 kHz mono PCM-16 WAV around samples. */
  private def wav(samples: Array[Int]): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(ascii)).putInt(36 + dataLen)
      .put("WAVE".getBytes(ascii)).put("fmt ".getBytes(ascii))
      .putInt(16).putShort(1).putShort(1).putInt(16000).putInt(32000)
      .putShort(2).putShort(16).put("data".getBytes(ascii)).putInt(dataLen)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  private def noiseSignal(seed: Int, n: Int = 4000): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(rnd.nextInt(2001) - 1000)
  }

  /** One-block retouch: +300 on the samples box-summed into block 30. */
  private def retouch(sig: Array[Int]): Array[Int] = {
    val n = sig.length
    val x0 = 30 * n / AudioHash.Blocks
    val x1 = 31 * n / AudioHash.Blocks
    sig.zipWithIndex.map { case (s, i) =>
      if (i >= x0 && i < x1) math.min(32767, s + 300) else s
    }
  }

  /** Oracle-side arithmetic: hash predicted straight from payload bytes
    * under the wavFromText layout (sample i = bytes 2i, 2i+1 LE). */
  private def predictedHash(payload: Array[Byte]): Long = {
    val n = payload.length / 2
    val samples = Array.tabulate(n)(i =>
      (payload(2 * i) & 0xFF) | ((payload(2 * i + 1) & 0xFF) << 8))
    AudioHash.energyHash64(samples)
  }

  test("wavFromText writes a real WAV: JDK decode recovers the exact " +
    "samples and the decode-side hash equals the byte arithmetic") {
    val text = "the quick brown fox jumps over the lazy dog again and again ok"
    val bytes = spark.range(1).select(
      Multimodal.wavFromText(lit(text.getBytes("UTF-8"))).as("wav"))
      .as[Array[Byte]].head()
    val payload = text.getBytes("UTF-8")
    val aligned = payload.take(payload.length - payload.length % 2)
    val got = AudioHash.decodeSamples(bytes)
    assert(got.isDefined, "WAV did not decode")
    val expected = Array.tabulate(aligned.length / 2)(i =>
      (aligned(2 * i) & 0xFF) | ((aligned(2 * i + 1) & 0xFF) << 8))
    assert(got.get.sameElements(expected),
      "decoded samples diverge from the WAV-spec byte arithmetic")
    assert(AudioHash.ahashBytes(bytes).contains(predictedHash(aligned)),
      "decode-side hash diverges from the arithmetic the oracle uses")
  }

  test("energy hash is gain-invariant, edit-local, far across signals; " +
    "garbage bytes sketch to null") {
    val sigs = (0 until 20).map(noiseSignal(_))
    val hashes = sigs.map(AudioHash.energyHash64)
    // exact 2x gain: every block energy doubles, every comparison holds
    for ((sig, h) <- sigs.zip(hashes))
      assert(AudioHash.energyHash64(sig.map(_ * 2)) == h,
        "gain change moved the fingerprint")
    // a one-block retouch flips at most that block's two comparisons
    for ((sig, h) <- sigs.zip(hashes)) {
      val d = java.lang.Long.bitCount(
        AudioHash.energyHash64(retouch(sig)) ^ h)
      assert(d <= 2, s"one-block retouch moved the hash by $d bits")
    }
    for (i <- hashes.indices; j <- i + 1 until hashes.length) {
      val d = java.lang.Long.bitCount(hashes(i) ^ hashes(j))
      assert(d > 8, s"signals $i/$j unexpectedly close: $d bits")
    }
    val sk = AudioHash.sketchTable(spark,
      Seq((1L, "not audio".getBytes("UTF-8")),
        (2L, null.asInstanceOf[Array[Byte]])).toDF("id", "data"),
      col("id"), col("data")).collect().sortBy(_.id)
    assert(sk(0).ahash.isEmpty, "garbage bytes must sketch to null")
    assert(sk(1).ahash.isEmpty,
      "a NULL payload must sketch to null, not crash the pass")
  }

  test("banded near-dup pairs: recall 1.0 on planted retouches and exact " +
    "parity with the brute-force Hamming join") {
    val base = (0 until 20).map(i => (i.toLong, wav(noiseSignal(i))))
    val variants = (0 until 20).map(i =>
      (i + 1000L, wav(retouch(noiseSignal(i)))))
    val media = (base ++ variants).toDF("media_id", "data")
    val pairs = AudioHash.nearDupPairs(spark, media, col("media_id"),
        col("data"), maxHamming = 4, maxBucket = 4096)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .as[(Long, Long, Int)].collect()
    val found = pairs.map(p => (p._1, p._2)).toSet
    for (i <- 0 until 20)
      assert(found.contains((i.toLong, i + 1000L)),
        s"planted pair ($i, ${i + 1000}) missed by banding")
    val sk = AudioHash.sketchTable(spark, media, col("media_id"),
      col("data")).collect().map(s => (s.id, s.ahash.get, s.nSamples.get))
    // brute force mirrors the DECLARED semantics: same sample count AND
    // within the Hamming bound (duration blocking is part of the contract)
    val brute = (for {
      (ia, ha, na) <- sk; (ib, hb, nb) <- sk if ia < ib && na == nb
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 4
    } yield (ia, ib, d)).toSet
    assert(pairs.toSet == brute,
      s"banded pairs != brute force (${pairs.length} vs ${brute.size})")
  }

  test("duration blocking: identical content at different clip lengths " +
    "does not pair (the declared same-length contract), and the length " +
    "key leaves same-length recall untouched") {
    // plant a same-sketch different-length case: amplitude striped by
    // envelope-block parity (block j is all-1000 or all-100 by j % 2), so
    // every block comparison is decided by parity with a ~50× margin at
    // EITHER length — the hash is length-invariant by construction even
    // though block SIZES differ (61 vs 62 samples at n=4000, ~30/31 at
    // n=2000)
    def striped(n: Int): Array[Int] =
      Array.tabulate(n)(i => if ((i * AudioHash.Blocks / n) % 2 == 0) 1000 else 100)
    val s1 = striped(4000)
    val s2 = striped(2000)
    val media = Seq((1L, wav(s1)), (2L, wav(s2))).toDF("media_id", "data")
    assert(AudioHash.energyHash64(s1) == AudioHash.energyHash64(s2),
      "fixture broken: striped clips should share a sketch")
    val pairs = AudioHash.nearDupPairs(spark, media, col("media_id"),
      col("data"), maxHamming = 8).collect()
    assert(pairs.isEmpty,
      s"different-length clips paired despite duration blocking: " +
        pairs.mkString(", "))
  }
}
