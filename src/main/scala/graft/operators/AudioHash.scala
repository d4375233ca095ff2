package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Audio fingerprint (energy-envelope hash) near-duplicate detection —
  * the audio leg of the multimodal dedup family (text SimHash, image
  * dHash [[ImageHash]], this): decode PCM for REAL through the JDK
  * (`javax.sound.sampled`, WAV/AIFF/AU — the [[Multimodal.AudioCodec]]
  * container family), box-sum the absolute sample amplitudes into
  * [[Blocks]] equal time blocks, and take the sign of each adjacent
  * block difference as one bit of a 64-bit sketch.
  *
  * The envelope-gradient construction is GAIN-INVARIANT by design: a
  * volume change scales every block energy by the same factor, so the
  * strict comparisons (and the hash) are unchanged — the audio analogue
  * of dHash's illumination invariance. Small local edits move only the
  * blocks they touch (≤ 2 bits per touched block).
  *
  * Scale posture identical to [[ImageHash]]: decode + hash is a narrow
  * `mapPartitions` batch pass (audio bytes never shuffle; only the
  * 8-byte sketch and id flow on), and pair generation reuses
  * [[Dedup.hammingBandPairs]] — pigeonhole bit-banding, one shuffle on
  * an 8-byte band key, skew-capped buckets. All arithmetic is integer
  * and platform-independent, so a given PCM stream sketches
  * bit-identically everywhere — the property the DuckDB oracle relies
  * on (it recomputes the sketch from the payload bytes the WAV spec
  * pins).
  */
object AudioHash {

  val Blocks = 65 // 65 block energies → 64 adjacent comparisons

  case class AudioSketch(id: Long, ahash: Option[Long], nSamples: Option[Int])

  /** Absolute-amplitude block sums over a 16-bit PCM sample array:
    * block j sums samples [⌊j·n/65⌋, ⌊(j+1)·n/65⌋) (clamped to at least
    * one sample when the clip is shorter than the grid — same rule as
    * [[ImageHash.grayGrid]]). */
  def energyBlocks(samples: Array[Int]): Array[Long] = {
    val n = samples.length
    Array.tabulate(Blocks) { j =>
      val x0 = math.min(j * n / Blocks, n - 1)
      val x1 = math.max(x0 + 1, (j + 1) * n / Blocks)
      var sum = 0L
      var i = x0
      while (i < x1) { sum += math.abs(samples(i).toLong); i += 1 }
      sum
    }
  }

  /** 64-bit energy-gradient hash: bit j set iff block j's energy exceeds
    * block j+1's. */
  def energyHash64(samples: Array[Int]): Long = {
    val e = energyBlocks(samples)
    var bits = 0L
    var j = 0
    while (j < Blocks - 1) {
      if (e(j) > e(j + 1)) bits |= 1L << j
      j += 1
    }
    bits
  }

  /** REAL JDK decode of encoded audio bytes to 16-bit samples (first
    * channel of WAV/AIFF/AU PCM), honoring the container's declared
    * endianness; None for undecodable bytes or non-16-bit formats — a
    * null sketch, not a crash, is what a scraped corpus needs. */
  def decodeSamples(data: Array[Byte]): Option[Array[Int]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(data))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
            fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          None
        else {
          val bytes = in.readAllBytes()
          val frameBytes = fmt.getFrameSize // channels × 2
          val n = bytes.length / frameBytes
          val big = fmt.isBigEndian
          val out = new Array[Int](n)
          var i = 0
          while (i < n) {
            val off = i * frameBytes // first channel of each frame
            out(i) =
              if (big) ((bytes(off) << 8) | (bytes(off + 1) & 0xFF)).toShort.toInt
              else ((bytes(off + 1) << 8) | (bytes(off) & 0xFF)).toShort.toInt
            i += 1
          }
          Some(out)
        }
      } finally in.close()
    } catch {
      // NonFatal, not just the two documented types: a NULL payload NPEs
      // in the ByteArrayInputStream constructor, and sound-stack parsers
      // throw RuntimeExceptions on malformed containers — one bad row
      // must yield the null sketch, never kill the pass (the
      // [[ImageHash.dhashBytes]] contract)
      case scala.util.control.NonFatal(_) => None
    }

  /** Sketch of raw encoded bytes: real decode → energy hash. */
  def ahashBytes(data: Array[Byte]): Option[Long] =
    decodeSamples(data).filter(_.nonEmpty).map(energyHash64)

  /** Sketch table (id, ahash, nSamples) over binary audio payloads:
    * narrow `mapPartitions` batch decode, nullable sketch for undecodable
    * rows. `nSamples` (clip length in samples) is the coarse content key
    * the banding stage pre-partitions on — it falls out of the decode for
    * free. */
  def sketchTable(spark: SparkSession, media: DataFrame, idCol: Column,
      dataCol: Column): Dataset[AudioSketch] = {
    import spark.implicits._
    media.select(idCol.as("id"), dataCol.as("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // one decoder context per partition would be initialized here
        rows.map { case (id, data) =>
          val s = decodeSamples(data).filter(_.nonEmpty)
          AudioSketch(id, s.map(energyHash64), s.map(_.length))
        }
      }
  }

  /** Near-duplicate audio pairs within `maxHamming` sketch bits via
    * [[Dedup.hammingBandPairs]] — never all-pairs. Undecodable rows
    * (null sketch) are excluded. Output: (id_a, id_b, hamming).
    *
    * DECLARED SEMANTICS: pairs are same-length clips (equal sample
    * count) within `maxHamming` bits. The length restriction is standard
    * duration blocking — the retouch and gain edits this detector
    * targets preserve sample count — and it is what keeps the banding
    * stage linear: pigeonhole banding at Hamming k uses k+1 bands of
    * ~64/(k+1) bits, so at k = 8 a band has only ~2⁷ distinct keys and
    * bucket occupancy grows with corpus size (measured ×4.6 at ×10
    * data, PERF.md round 9, before this fix). Folding the clip length
    * into the band key multiplies the key space by the number of
    * distinct lengths and returns occupancy to corpus-shape-independent
    * scaling. NOT covered by the default: lossy re-encodes (mp3/AAC
    * family) typically prepend/append encoder priming and padding
    * samples, so a re-encoded near-dup usually lands at a DIFFERENT
    * sample count and the duration block silently excludes it. For
    * re-encode detection — and for trims/resampling generally — lower
    * `maxHamming` and call [[Dedup.hammingBandPairs]] with
    * `groupCol = None` explicitly (the documented escape hatch; costs
    * the corpus-shape-dependent occupancy above). */
  def nearDupPairs(spark: SparkSession, media: DataFrame, idCol: Column,
      dataCol: Column, maxHamming: Int = 6, maxBucket: Int = 4096,
      drops: Option[org.apache.spark.sql.Observation] = None): DataFrame =
    Dedup.hammingBandPairs(
      sketchTable(spark, media, idCol, dataCol).toDF()
        .filter(col("ahash").isNotNull),
      col("id"), col("ahash"), maxHamming, maxBucket, drops,
      groupCol = Some(col("nSamples")))
}
