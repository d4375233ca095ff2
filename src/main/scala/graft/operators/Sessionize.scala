package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: split each key's event stream into sessions at
  * inactivity gaps (SURVEY §2.11 — the batch twin of the streaming session
  * window in `streaming/EventStreams`, for backfills and offline feature
  * builds over the same event data the stream processes live).
  *
  * Gap semantics match `session_window(ts, gap)` exactly: a streaming
  * session spans [first, last + gap) with an EXCLUSIVE end, so an event
  * arriving exactly `gap` after the previous one falls outside the
  * window and starts a new session — hence the `>=` in the boundary
  * test (asserted ≡ the streaming operator, session for session, in
  * `CurateOpsSpec`).
  *
  * Scale posture: the classic two-window formulation — lag() to flag
  * session starts, running sum to number them — runs both windows over ONE
  * exchange on the key column (identical partitioning and ordering, so
  * Catalyst plans a single Exchange feeding two WindowExecs back to back).
  * The shuffle carries (key, ts, payload) once; no per-key state buffer
  * materializes beyond the sort run, so a key with millions of events
  * spills to disk instead of OOMing a map. Session numbering is per-key
  * (dense from 1), never global — a global session id would be a
  * single-partition window; downstream consumers address sessions by the
  * (key, session_idx) composite, which is also the natural aggregation key.
  */
object Sessionize {

  /** Adds `session_idx` (1-based per key) to `df`.
    *
    * @param keyCol   partitioning key (e.g. user id)
    * @param usCol    event time as epoch MICROSECONDS (long) — callers
    *                 convert timestamps via `unix_micros`; integer
    *                 microseconds keep the gap compare exact cross-engine
    *                 (a double epoch loses sub-second bits past 2^53)
    * @param tieCol   deterministic tie-breaker for equal timestamps
    *                 (e.g. event id) — without it, session numbering of
    *                 simultaneous events depends on row arrival order
    * @param gapUs    inactivity gap in microseconds
    */
  def byGap(df: DataFrame, keyCol: Column, usCol: Column, tieCol: Column,
      gapUs: Long): DataFrame = {
    require(gapUs > 0, s"gap must be positive, got $gapUs")
    val w = Window.partitionBy(keyCol).orderBy(usCol, tieCol)
    val prev = lag(usCol, 1).over(w)
    df.withColumn("__new_session",
        when(prev.isNull || usCol - prev >= gapUs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("__new_session"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }
}
