package graft

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables
import graft.streaming.EventStreams

/** Corpus-schema contract: the driver corpus has shipped `events.ts` in
  * more than one physical shape over time — TIMESTAMP(NANOS) (read as long
  * nanoseconds under `nanosAsLong`), then `timestamp[us]` with no timezone
  * (read as TIMESTAMP_NTZ) — and a shape change once silently broke every
  * time-derived query. This suite pins the contract for all three shapes:
  * whatever is on disk, [[Tables.load]] and [[EventStreams.readEvents]]
  * both yield a watermarkable `TimestampType` ts carrying the same instant
  * (the session timezone is pinned UTC, so the NTZ wall-clock IS the
  * instant).
  */
class CorpusContractSpec extends SparkSpec {

  // 2024-01-15T12:34:56.789Z
  private val micros = 1705322096789000L

  /** One-row events fixture in the given ts shape, written as a single FILE
    * named events.parquet — the streaming source's pathGlobFilter matches
    * file names, so a part-file directory would be invisible to it. */
  private def writeFixture(ts: Column): String = {
    val df = spark.range(1).select(
      col("id").as("event_id"), ts.as("ts"), lit(7L).as("user_id"),
      lit("click").as("event_type"), lit(1.5).as("value"),
      lit("{}").as("props"))
    val dir = Files.createTempDirectory("graft_evshape")
    val tmp = dir.resolve("tmp")
    df.coalesce(1).write.parquet(tmp.toString)
    val part = Files.list(tmp).toArray.map(_.toString)
      .find(p => p.endsWith(".parquet")).get
    Files.move(java.nio.file.Paths.get(part), dir.resolve("events.parquet"))
    dir.toString
  }

  private def checkShape(dir: String, rawType: DataType): Unit = {
    // the fixture really is in the claimed on-disk shape
    assert(Tables.loadRaw(spark, dir, "events").schema("ts").dataType == rawType,
      s"fixture did not land as $rawType on disk")
    // batch contract: TimestampType, instant preserved
    val batch = Tables.load(spark, dir, "events")
    assert(batch.schema("ts").dataType == TimestampType)
    val got = batch.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got == micros, s"batch instant drifted: $got != $micros")
    // streaming contract: TimestampType before any watermark is applied
    val stream = EventStreams.readEvents(spark, dir)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType == TimestampType,
      s"streaming ts is ${stream.schema("ts").dataType}, not TimestampType")
  }

  test("events.ts as int64 (long nanoseconds) normalizes to TimestampType") {
    checkShape(writeFixture(lit(micros * 1000L)), LongType)
  }

  test("events.ts as timestamp[us] no-tz (TIMESTAMP_NTZ) normalizes to TimestampType") {
    checkShape(writeFixture(
      timestamp_micros(lit(micros)).cast(TimestampNTZType)), TimestampNTZType)
  }

  test("events.ts as timestamp[us] UTC (TimestampType) passes through") {
    checkShape(writeFixture(timestamp_micros(lit(micros))), TimestampType)
  }

  test("NTZ shape survives a real watermarked drain (the live corpus shape)") {
    val dir = writeFixture(timestamp_micros(lit(micros)).cast(TimestampNTZType))
    val out = EventStreams.runToResult(spark,
      EventStreams.tumblingCounts(EventStreams.readEvents(spark, dir)),
      "contract_ntz_drain")
    val rows = out.collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("n") == 1L)
    // 10-minute tumbling window containing 12:34:56 starts at 12:30:00
    assert(rows.head.getAs[Long]("ws_epoch") == 1705321800L)
  }

  test("the live corpus itself satisfies the contract at sf0.001") {
    assert(Tables.load(spark, sf, "events").schema("ts").dataType == TimestampType)
    assert(EventStreams.readEvents(spark, sf).schema("ts").dataType == TimestampType)
  }

  test("documents.text is pure ASCII — the byte-=-char contract the " +
    "image/audio hash oracles index by") {
    // q_image_dhash / q_audio_fingerprint (and their pair/pipeline
    // variants) hash UTF-8 BYTES in the engine but predict via
    // character-positional ascii(substr(...)) in DuckDB; those agree
    // only while every text is single-byte. A corpus regeneration that
    // introduces multi-byte characters must fail HERE, loudly, not as
    // an inscrutable hash mismatch in the media gates.
    val nonAscii = Tables.load(spark, sf, "documents")
      .filter(length(encode(col("text"), "UTF-8")) =!= length(col("text")))
      .count()
    assert(nonAscii == 0L,
      s"$nonAscii documents carry multi-byte characters — the media-gate " +
        "oracles' char-indexed arithmetic no longer matches byte hashing")
  }

  test("documents.text has length >= 2 — the degenerate-payload floor the " +
    "media-hash oracles assume") {
    // ADVICE r9: on a text of length <= 1 the engine's synthetic media
    // decode yields NULL hash halves (empty sample array / pmod-by-zero)
    // while the DuckDB oracles' byte arithmetic degrades to a 0 hash
    // (n=0 makes x0=-1, ascii('') paths) — a silent cross-engine split.
    // Both oracles assume length >= 2; pin it here so a regenerated
    // corpus with an empty/1-char doc fails loudly at the contract, not
    // as an inscrutable media-gate hash mismatch.
    val tooShort = Tables.load(spark, sf, "documents")
      .filter(length(col("text")) < 2).count()
    assert(tooShort == 0L,
      s"$tooShort documents have text shorter than 2 chars — the media " +
        "fingerprint oracles' degenerate-payload behavior diverges there")
  }
}
