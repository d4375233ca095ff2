package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2.11 / north star): media payloads as
  * opaque `binary` columns with typed metadata, plus decode / feature /
  * frame-sample stages.
  *
  * The Spark-side structure — schema, partitioning, batch-iterator transform
  * shape — is real and tested. Codecs: IMAGE and AUDIO decode for real
  * through the JDK ([[ImageCodec]] javax.imageio, [[AudioCodec]]
  * javax.sound — header-only reads); VIDEO is the one deterministic stub
  * left (the JDK ships no video codec and the container no libav). Swapping
  * [[FakeCodec]]'s video branch for a real decoder changes no plan shape:
  * the `mapPartitions` stage is already the batch boundary a JNI/FFI
  * decoder needs (one codec init per partition, streamed rows, no per-row
  * setup — the Scala analogue of a Pandas-batch UDF).
  *
  * Scale posture: media bytes never shuffle — decode/feature stages are
  * narrow maps; only extracted metadata (small structs) flows into joins and
  * aggregations. Frame sampling explodes rows but carries offsets, not
  * frames.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),     // image | audio | video
    StructField("data", BinaryType),
    StructField("source", StringType)))

  case class MediaMeta(
      media_id: Long, kind: String, n_bytes: Long, checksum: String,
      width: Int, height: Int, n_frames: Long)

  case class MediaRow(media_id: Long, kind: String, data: Array[Byte],
      source: String)

  /** STUB — deterministic fake codec standing in for libavcodec etc.
    * Derives plausible metadata purely from the bytes so every run (and the
    * DuckDB oracle) agrees. A real implementation replaces these bodies;
    * signatures and call sites stay. VIDEO is the one remaining stubbed
    * kind (the JDK ships no video codec) — images decode for real through
    * [[ImageCodec]], audio through [[AudioCodec]]. */
  object FakeCodec {
    def decodeDims(data: Array[Byte]): (Int, Int) =
      (16 + (data.length % 640), 16 + ((data.length * 7) % 480))
    def frameCount(kind: String, data: Array[Byte]): Int =
      if (kind == "video") 1 + (data.length % 8) else 1
    /** (sample_rate, channels, n_frames) fallback for undecodable audio
      * bytes — same role as [[decodeDims]] for undecodable images. */
    def audioInfo(data: Array[Byte]): (Int, Int, Long) =
      (8000 + (data.length % 4) * 2000, 1 + data.length % 2,
        data.length.toLong)
  }

  /** Real image decode via `javax.imageio` (in the JDK, no external libs):
    * header-only dimension read for PNG/JPEG/GIF/BMP payloads — the reader
    * parses the header, never the full raster, so this is cheap enough for
    * a 100 TB metadata pass. Returns None for undecodable bytes (the
    * corpus fixtures are text payloads), which fall back to [[FakeCodec]]
    * so fixture-driven tests stay deterministic. */
  object ImageCodec {
    def decodeDims(data: Array[Byte]): Option[(Int, Int)] = {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(data))
      if (in == null) return None
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            Some((r.getWidth(0), r.getHeight(0)))
          } catch {
            // imageio readers throw RuntimeExceptions (IllegalArgument,
            // NegativeArraySize, IndexOutOfBounds...) on malformed headers
            // — routine in a scraped corpus; one bad file must fall back,
            // not kill the metadata pass
            case scala.util.control.NonFatal(_) => None
          } finally r.dispose()
        }
      } finally in.close()
    }
  }

  /** Real audio header decode via `javax.sound.sampled` (in the JDK, no
    * external libs): WAV/AIFF/AU containers. Header-only — the parser
    * reads the format chunk and data-chunk length, never the samples, so
    * this is the cheap 100 TB metadata pass. Returns None for undecodable
    * bytes (text fixtures), which fall back to [[FakeCodec.audioInfo]] so
    * fixture-driven runs stay deterministic — the exact [[ImageCodec]]
    * pattern. */
  object AudioCodec {
    /** (sample_rate_hz, channels, n_frames), or None if not WAV/AIFF/AU. */
    def decodeInfo(data: Array[Byte]): Option[(Int, Int, Long)] =
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(data))
        val fmt = aff.getFormat
        // AudioSystem.NOT_SPECIFIED (-1) frame length = a stream the JDK
        // can't size from the header; treat as undecodable, not as real
        if (aff.getFrameLength < 0 || fmt.getSampleRate <= 0) None
        else Some((fmt.getSampleRate.toInt, fmt.getChannels,
          aff.getFrameLength.toLong))
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
  }

  /** Real video CONTAINER-header decode: AVI is RIFF-framed, and its
    * `avih` main header carries total frames, µs-per-frame and dims as
    * plain little-endian fields — so frame counts / dims / duration (the
    * metadata a pipeline actually extracts at 100 TB) come from a genuine
    * parse of the file structure with zero codec involvement. Decoding
    * frame CONTENT would need libav (not in the JDK or container) — that
    * boundary, not this one, is what [[FakeCodec]] still stands in for.
    * Returns None for anything that isn't a well-formed RIFF/AVI. */
  object VideoCodec {
    private val Ascii = java.nio.charset.StandardCharsets.US_ASCII
    private def le32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
        ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)
    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, Ascii)

    /** (width, height, n_frames, duration_ms), or None if not AVI.
      * Size fields are 32-bit UNSIGNED and attacker-controlled in a
      * scraped corpus: every chunk size is validated (non-negative after
      * widening, chunk stays inside its parent) and every offset
      * increment is strictly positive, so a crafted size like 0xFFFFFFF8
      * can neither loop the walk forever nor step backwards; anything
      * malformed — including an out-of-range access a hostile header
      * still manages to provoke — returns None via the outer catch,
      * matching [[AudioCodec]]. */
    def decodeInfo(data: Array[Byte]): Option[(Int, Int, Long, Long)] = try {
      if (data.length < 12 || fourcc(data, 0) != "RIFF" ||
          fourcc(data, 8) != "AVI ") return None
      var off = 12L // walk top-level RIFF chunks for LIST/hdrl
      while (off + 12 <= data.length) {
        val id = fourcc(data, off.toInt)
        val size = le32(data, off.toInt + 4)
        if (id == "LIST" && fourcc(data, off.toInt + 8) == "hdrl") {
          var o = off + 12 // walk the list's children for avih
          val end = math.min(off + 8 + size, data.length.toLong)
          while (o + 8 <= end) {
            val csz = le32(data, o.toInt + 4)
            if (o + 8 + csz > end) return None // child escapes its parent
            if (fourcc(data, o.toInt) == "avih" && csz >= 40) {
              val usPerFrame = math.min(le32(data, o.toInt + 8), 1000000000L)
              val frames = le32(data, o.toInt + 8 + 16)
              val w = le32(data, o.toInt + 8 + 32)
              val h = le32(data, o.toInt + 8 + 36)
              // frames < 2^32 and usPerFrame capped at 1e9 keep the
              // duration product under Long.MaxValue
              return if (w <= 0 || h <= 0 || w > 65536 || h > 65536) None
              else Some((w.toInt, h.toInt, frames,
                frames * usPerFrame / 1000L))
            }
            o += 8 + csz + (csz & 1) // chunks pad to even; always > o
          }
          return None
        }
        off += 8 + size + (size & 1) // size >= 0 ⇒ strictly increasing
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Build a media table from the documents corpus: text bytes stand in for
    * the payload (`data = encode(text)`), kind assigned round-robin —
    * deterministic plumbing over driver-provided inputs. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("data"),
      col("source"))

  /** Column-expression metadata extraction (pure, codegen'd): byte length +
    * content checksum + stub dims. This is the cheap path when the "decode"
    * is byte arithmetic; [[decodeMeta]] is the batch-iterator path real
    * codecs need. */
  def mediaMetaColumns(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      length(col("data")).cast("long").as("n_bytes"),
      substring(md5(col("data")), 1, 8).as("checksum"),
      (lit(16) + pmod(length(col("data")), lit(640))).as("width"),
      (lit(16) + pmod(length(col("data")) * 7, lit(480))).as("height"))

  /** Batch decode via mapPartitions — the real-codec integration point.
    * Image payloads decode for real ([[ImageCodec]], JDK imageio) and AVI
    * video payloads parse their real container header ([[VideoCodec]] —
    * dims + frame count from the `avih` chunk), each with the
    * deterministic stub as the undecodable-bytes fallback. Audio has its
    * own typed pass ([[audioMeta]] — its metadata shape differs). */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("data"), col("source"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // one codec context per partition would be initialized here
        rows.map { r =>
          val video =
            if (r.kind == "video") VideoCodec.decodeInfo(r.data) else None
          val (w, h) = video.map(v => (v._1, v._2))
            .orElse(
              if (r.kind == "image") ImageCodec.decodeDims(r.data) else None)
            .getOrElse(FakeCodec.decodeDims(r.data))
          // avih frame counts are 32-bit unsigned — kept as Long
          // end-to-end so values above Int.MaxValue never wrap negative
          val nFrames = video.map(_._3)
            .getOrElse(FakeCodec.frameCount(r.kind, r.data).toLong)
          MediaMeta(r.media_id, r.kind, r.data.length.toLong,
            java.security.MessageDigest.getInstance("MD5")
              .digest(r.data).take(4).map("%02x".format(_)).mkString,
            w, h, nFrames)
        }
      }
  }

  /** Little-endian byte rendering of an int column as `n` binary bytes —
    * the header-arithmetic primitive for [[wavFromText]], pure codegen'd
    * built-ins (hex/lpad/to_binary). */
  private def leBytes(x: Column, n: Int): Column =
    to_binary(concat((0 until n).map(i =>
      lpad(hex(shiftright(x, 8 * i).bitwiseAND(lit(255))), 2, "0")): _*),
      lit("hex"))

  /** Wrap arbitrary payload bytes in a REAL RIFF/WAVE container (16 kHz
    * mono PCM-16): canonical 44-byte header, payload truncated to frame
    * alignment. Entirely column expressions — the corpus becomes genuine
    * decodable audio files inside the engine, no driver loop, no UDF.
    * Exists so the audio decode path can be exercised (and oracled) against
    * driver-provided tables that carry no real media: any standards-
    * compliant reader recovers sample_rate=16000, channels=1,
    * n_frames=⌊len/2⌋ from the result. */
  def wavFromText(data: Column): Column = {
    val dataLen = (length(data) - pmod(length(data), lit(2))).cast("long")
    val body = data.substr(lit(1), dataLen.cast("int"))
    concat(
      lit("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII)),
      leBytes(dataLen + 36L, 4),
      lit("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII)),
      lit("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII)),
      leBytes(lit(16), 4),      // fmt chunk size
      leBytes(lit(1), 2),       // PCM
      leBytes(lit(1), 2),       // mono
      leBytes(lit(16000), 4),   // sample rate
      leBytes(lit(32000), 4),   // byte rate = rate * blockAlign
      leBytes(lit(2), 2),       // block align (16-bit mono)
      leBytes(lit(16), 2),      // bits per sample
      lit("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII)),
      leBytes(dataLen, 4),
      body)
  }

  /** Wrap arbitrary payload bytes in a REAL RIFF/AVI container: canonical
    * `LIST hdrl`/`avih` main header (25 fps) carrying the given frame
    * count and dimensions, payload as a single `movi` chunk truncated to
    * even length. Entirely column expressions, like [[wavFromText]] — any
    * AVI-aware reader (including [[VideoCodec]]) recovers the embedded
    * values from the file structure. */
  def aviFromText(data: Column, frames: Column, width: Column,
      height: Column): Column = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val even = (length(data) - pmod(length(data), lit(2))).cast("long")
    val body = data.substr(lit(1), even.cast("int"))
    val z4 = leBytes(lit(0), 4)
    val avih = concat(
      lit("avih".getBytes(ascii)), leBytes(lit(56), 4),
      leBytes(lit(40000), 4),               // µs per frame (25 fps)
      z4, z4, z4,                           // maxBytesPerSec, padding, flags
      leBytes(frames, 4),
      z4,                                   // initial frames
      leBytes(lit(1), 4),                   // stream count
      z4,                                   // suggested buffer size
      leBytes(width, 4), leBytes(height, 4),
      z4, z4, z4, z4)                       // reserved[4]
    val hdrl = concat(lit("LIST".getBytes(ascii)), leBytes(lit(68), 4),
      lit("hdrl".getBytes(ascii)), avih)
    val movi = concat(lit("LIST".getBytes(ascii)), leBytes(even + 12L, 4),
      lit("movi".getBytes(ascii)),
      lit("00dc".getBytes(ascii)), leBytes(even, 4), body)
    // riff size = "AVI "(4) + hdrl total(8+68) + movi total(8 + 12 + body)
    concat(lit("RIFF".getBytes(ascii)), leBytes(even + 100L, 4),
      lit("AVI ".getBytes(ascii)), hdrl, movi)
  }

  /** Wrap payload bytes in a REAL 24-bit bottom-up BMP of `width`×`height`
    * gray pixels, the image analogue of [[wavFromText]]/[[aviFromText]]:
    * pixel (x, y) — top-down raster order — has gray level equal to payload
    * byte `(y*width + x) mod len` (wraparound keeps any non-empty payload
    * valid). Entirely column expressions; any standards-correct decoder
    * (including JDK imageio) recovers exactly those gray levels, so an
    * arithmetic oracle can predict what a REAL decode must produce.
    * The pixel array is a RUNTIME loop (nested `aggregate` over
    * `sequence`), not an unrolled w·h expression tree: the unrolled form
    * generated ~700 substr/pmod expressions that blew janino's 64 KB
    * method limit once fused into a larger stage (q_media_pipeline's
    * Project and its downstream hash aggregate both fell back to
    * interpreted execution — the r13 verdict's silent-fallback finding).
    * The higher-order form is a compact CodegenFallback expression inside
    * an otherwise fully codegen'd stage — same bytes, bounded codegen. */
  def bmpFromBytes(data: Column, width: Int, height: Int): Column = {
    require(width > 0 && height > 0 && width * height <= 1024,
      s"bmpFromBytes loops w*h pixel slices; got ${width}x$height")
    val rowPad = (4 - (width * 3) % 4) % 4
    val rowSize = width * 3 + rowPad
    val imgSize = rowSize * height
    val empty = lit(Array.empty[Byte])
    val pad =
      if (rowPad == 0) empty else lit(Array.fill[Byte](rowPad)(0))
    // file rows run bottom-up: file row r carries image row y = H-1-r;
    // pixel (x, y) = payload byte (y*W + x) mod len, tripled (gray BGR)
    val rows = Seq(aggregate(
      sequence(lit(height - 1), lit(0), lit(-1)),
      empty,
      (acc, y) => concat(acc,
        aggregate(
          sequence(lit(0), lit(width - 1)),
          empty,
          (acc2, x) => {
            val b = data.substr(
              pmod(y * width + x, length(data)) + 1, lit(1))
            concat(acc2, b, b, b)
          }),
        pad)))
    concat(
      lit("BM".getBytes(java.nio.charset.StandardCharsets.US_ASCII)),
      leBytes(lit(54 + imgSize), 4), // file size
      leBytes(lit(0), 4),            // reserved
      leBytes(lit(54), 4),           // pixel-array offset
      leBytes(lit(40), 4),           // BITMAPINFOHEADER size
      leBytes(lit(width), 4),
      leBytes(lit(height), 4),       // positive = bottom-up rows
      leBytes(lit(1), 2),            // planes
      leBytes(lit(24), 2),           // bits per pixel
      leBytes(lit(0), 4),            // BI_RGB, uncompressed
      leBytes(lit(imgSize), 4),
      leBytes(lit(2835), 4), leBytes(lit(2835), 4), // 72 dpi
      leBytes(lit(0), 4), leBytes(lit(0), 4),       // palette counts
      concat(rows: _*))
  }

  case class AudioMeta(media_id: Long, n_bytes: Long, sample_rate: Int,
      channels: Int, n_frames: Long, duration_ms: Long)

  /** Batch audio-metadata pass over the audio rows: REAL header decode
    * ([[AudioCodec]], JDK javax.sound — WAV/AIFF/AU) with the
    * deterministic stub as the undecodable-bytes fallback; same
    * `mapPartitions` batch boundary as [[decodeMeta]]. Payload bytes never
    * shuffle — the output is six small scalars per row. */
  def audioMeta(spark: SparkSession, media: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select(col("media_id"), col("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, data) =>
          val (sr, ch, fr) = AudioCodec.decodeInfo(data)
            .getOrElse(FakeCodec.audioInfo(data))
          AudioMeta(id, data.length.toLong, sr, ch, fr, fr * 1000L / sr)
        }
      }
  }

  case class VideoMeta(media_id: Long, n_bytes: Long, width: Int,
      height: Int, n_frames: Long, duration_ms: Long)

  /** Batch video-metadata pass over the video rows: REAL container-header
    * parse ([[VideoCodec]], RIFF/AVI structure) with the deterministic
    * stub as the non-AVI fallback; same `mapPartitions` batch boundary as
    * [[decodeMeta]] and [[audioMeta]]. */
  def videoMeta(spark: SparkSession, media: DataFrame): Dataset[VideoMeta] = {
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, data) =>
          val (w, h, fr, ms) = VideoCodec.decodeInfo(data).getOrElse {
            val (sw, sh) = FakeCodec.decodeDims(data)
            val sf = FakeCodec.frameCount("video", data).toLong
            (sw, sh, sf, sf * 40L) // stub duration at the same 25 fps
          }
          VideoMeta(id, data.length.toLong, w, h, fr, ms)
        }
      }
  }

  /** Frame sampling for video rows: one output row per sampled frame offset
    * (every `stride`-th frame). Offsets only — the explode carries no
    * payload bytes. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media
      .filter(col("kind") === "video")
      .withColumn("n_frames",
        (lit(1) + pmod(length(col("data")), lit(8))).cast("int"))
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))
}
