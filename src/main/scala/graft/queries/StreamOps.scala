package graft.queries

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import Parity.sqlDsum

/** Streaming queries in the driver gate: each runs a genuine Structured
  * Streaming query over the events file source to completion (memory sink),
  * and its oracle is the batch-SQL equivalent in DuckDB — stream/batch
  * result equivalence is exactly what Structured Streaming promises for a
  * drained bounded source in complete mode.
  *
  * Query names carry a per-call nonce: memory-sink table names are global
  * to the session, and Verify/Bench invoke the same map entries repeatedly.
  */
object StreamOps extends QueryPack {

  private val nonce = new java.util.concurrent.atomic.AtomicLong()
  private def qn(base: String) = s"${base}_${nonce.incrementAndGet()}"

  override def defs: Map[String, Q] = Map(
    "q_stream_tumbling" -> ((s, dir) =>
      EventStreams.runToResult(s,
          EventStreams.tumblingCounts(EventStreams.readEvents(s, dir)),
          qn("stream_tumbling"))
        .orderBy(col("ws_epoch"), col("event_type"))),

    "q_stream_sliding" -> ((s, dir) =>
      EventStreams.runToResult(s,
          EventStreams.slidingCounts(EventStreams.readEvents(s, dir)),
          qn("stream_sliding"))
        .orderBy(col("ws_epoch"), col("event_type"))),

    "q_stream_session" -> ((s, dir) =>
      EventStreams.runToResult(s,
          EventStreams.sessionCounts(EventStreams.readEvents(s, dir)),
          qn("stream_session"))
        .orderBy(col("user_id"), col("session_start"))),

    // Stream-stream funnel join (view → purchase within 10 min, same user),
    // append mode — the drained bounded source emits exactly the batch-join
    // matches.
    "q_stream_join" -> ((s, dir) =>
      EventStreams.runToResult(s,
          EventStreams.viewPurchaseJoin(EventStreams.readEvents(s, dir)),
          qn("stream_join"), mode = "append")
        .orderBy(col("view_id"), col("purchase_id"))),

    // LEFT OUTER stream-stream join (round 10): conversion-or-not per
    // view — matches emit like the inner form; unmatched views emit with
    // nulls only at join-state EVICTION (v_ts + 10min below the
    // watermark), so the drained result is the batch left join RESTRICTED
    // on its null side to views older than (final watermark − 10min).
    // The oracle replays both legs with the same ms-floored watermark
    // arithmetic as q_stream_cdc_ttl; the global watermark is the min of
    // the two sides' (max event-time − 30min).
    "q_stream_join_outer" -> ((s, dir) =>
      EventStreams.runToResult(s,
          EventStreams.viewPurchaseJoinOuter(EventStreams.readEvents(s, dir)),
          qn("stream_join_outer"), mode = "append")
        .orderBy(col("view_id"), col("purchase_id"))),

    // FULL OUTER stream-stream join (round 12) — the join-matrix
    // completion: both unmatched sides emit at their own state-eviction
    // horizons (views at v_ts + 10min below the watermark, purchases at
    // p_ts itself below it — the condition's `p_ts > v_ts` lower bound
    // puts no window offset on the purchase side). Oracle = batch full
    // join, each null leg restricted to its horizon.
    "q_stream_join_full" -> ((s, dir) =>
      EventStreams.runToResult(s,
          EventStreams.viewPurchaseJoinFull(EventStreams.readEvents(s, dir)),
          qn("stream_join_full"), mode = "append")
        .orderBy(col("view_id"), col("purchase_id"))),

    // Streaming corpus ingest: the documents table as a file-source stream
    // through the front of the cleaning pipeline — deterministic hash-gate
    // sampling (the gate is stateless, so it composes with streaming
    // unchanged: the same rows survive as in batch) and the length-quality
    // band — then per-language accounting. The batch-SQL oracle is exactly
    // the stream/batch equivalence Structured Streaming promises.
    "q_stream_corpus" -> ((s, dir) => {
      val docsStream = s.readStream
        .schema(graft.sources.Tables.loadRaw(s, dir, "documents").schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(dir)
      val cleaned = graft.operators.Sampling
        .hashSample(docsStream, col("doc_id"), 0.5)
        .filter(col("n_chars").between(100, 2000))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      EventStreams.runToResult(s, cleaned, qn("stream_corpus"))
        .orderBy(col("lang"))
    }),

    // Rate source (§2.10): the built-in unbounded benchmark source driving
    // the same cleaning front as q_stream_corpus — synthetic docs derived
    // from the monotone `value` counter in integer arithmetic (both
    // engines replay it exactly), deterministic hash-gate sampling, a
    // length-quality band, per-bucket accounting. `rate-micro-batch` emits
    // exactly `rowsPerBatch` consecutive values per batch, so after 4
    // committed batches values 0..999 have all been processed; the drain
    // waits for those 1000 SOURCE rows and the `value < 1000` bound makes
    // any later batch a no-op on the aggregate. No jar needed — this is
    // the declared non-file source the container can actually run (the
    // Kafka connector is not shipped).
    "q_stream_rate" -> ((s, dir) => {
      val src = s.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", "250").load()
        .filter(col("value") < 1000)
        .select(col("value").as("doc_id"),
          (col("value") * 37 % 2500).as("n_chars"))
      val cleaned = graft.operators.Sampling
        .hashSample(src, col("doc_id"), 0.5)
        .filter(col("n_chars").between(100, 2000))
        .groupBy((col("doc_id") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      EventStreams.runUntilInputRows(s, cleaned, qn("stream_rate"),
          minInputRows = 1000L)
        .orderBy(col("bucket"))
    }),

    // UPDATE output mode (round 12 — the third declared mode as a GATE,
    // complete/append being long covered): the rate-source aggregate
    // emits each bucket's row on EVERY batch that changes it, so the
    // memory sink accumulates ~4 versions per bucket; the gate compacts
    // latest-per-key via MAX (counts and nonnegative sums only grow —
    // the deterministic compaction needing no batch marker; the
    // StreamingSpec twin pins that the sink really held >10 versions).
    // Oracle = the batch aggregate over the same value range.
    "q_stream_update" -> ((s, dir) => {
      val src = s.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", "250").load()
        .filter(col("value") < 1000)
        .groupBy((col("value") % 10).as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      EventStreams.runUntilInputRows(s, src, qn("stream_update"),
          minInputRows = 1000L, mode = "update")
        .groupBy(col("bucket"))
        .agg(max(col("n")).as("n"), max(col("sum_value")).as("sum_value"))
        .orderBy(col("bucket"))
    }),

    // Stream-static broadcast join: enrich the stream against a literal
    // funnel-stage dimension (no state store; the static side re-reads per
    // micro-batch), then aggregate per stage.
    "q_stream_static" -> ((s, dir) => {
      import s.implicits._
      val dim = Seq(
        ("view", "awareness"), ("click", "engagement"),
        ("purchase", "conversion"), ("signup", "acquisition"),
        ("error", "ops")).toDF("event_type", "stage")
      val enriched = EventStreams
        .enrichWithDim(EventStreams.readEvents(s, dir), dim, "event_type")
        .groupBy(col("stage"))
        .agg(count(lit(1)).as("n"), Parity.dsum(col("value")).as("total"))
      EventStreams.runToResult(s, enriched, qn("stream_static"))
        .orderBy(col("stage"))
    }),

    // Streaming CDC compaction (round 9): the event log as a live change
    // stream, latest-change-wins per key with delete tombstones — the
    // streaming twin of q_cdc_apply. Latest-wins is ONE streaming
    // aggregation: max over the (us, event_id, …) struct (the unique
    // prefix makes lexicographic max = "latest"), state is one struct
    // per key — exactly what a 100 TB continuous compaction keeps.
    // Tombstone filtering happens on the drained result; the oracle is
    // the identical batch SQL (stream/batch equivalence).
    "q_stream_cdc" -> ((s, dir) => {
      val ev = EventStreams.readEvents(s, dir)
        .select(col("user_id"), col("event_id"), col("value"),
          unix_micros(col("ts")).as("us"),
          when(col("event_id") % 10 === 0, lit("D"))
            .otherwise(lit("U")).as("op"))
      val latest = ev.groupBy(col("user_id"))
        .agg(max(struct(col("us"), col("event_id"), col("op"),
          col("value"))).as("m"))
        .select(col("user_id"), col("m.event_id").as("last_event_id"),
          col("m.us").as("last_us"), col("m.op").as("op"),
          col("m.value").as("value"))
      EventStreams.runToResult(s, latest, qn("stream_cdc"))
        .filter(col("op") === "U")
        .select(col("user_id"), col("last_event_id"), col("last_us"),
          col("value"))
        .orderBy(col("user_id"))
    }),

    // Bounded-state streaming CDC (round 10): the TTL-evicting twin of
    // q_stream_cdc — per-key state is one struct with an event-time TTL;
    // when the watermark passes last-activity + 6h the key emits its
    // settled compaction and its state is REMOVED (state holds only
    // TTL-recent keys, never full key history). On the drained bounded
    // source the final watermark is max(ts) − 1h, so the oracle is the
    // same latest-wins batch SQL RESTRICTED to keys settled before that
    // horizon — the window-restricted stream/batch equivalence pin.
    "q_stream_cdc_ttl" -> ((s, dir) => {
      val ev = EventStreams.readEvents(s, dir)
        .select(col("ts"), col("user_id"), col("event_id"), col("value"),
          when(col("event_id") % 10 === 0, lit("D"))
            .otherwise(lit("U")).as("op"))
      val compacted = EventStreams.cdcCompactTtl(s, ev)
      EventStreams.runToResult(s, compacted, qn("stream_cdc_ttl"),
          mode = "append")
        .filter(col("op") === "U")
        .select(col("user_id"), col("last_event_id"), col("last_us"),
          col("value"))
        .orderBy(col("user_id"))
    }),

    // Streaming top-k (round 9): sort + limit over a complete-mode
    // streaming aggregate — the continuously-maintained leaderboard.
    // Spark only admits sort/limit in complete mode (the whole result
    // re-emits per trigger), which is exactly the bounded-output shape
    // a leaderboard needs; deterministic tie-break on the key.
    "q_stream_topk" -> ((s, dir) => {
      val board = EventStreams.readEvents(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), Parity.dsum(col("value")).as("total"))
        .orderBy(col("n").desc, col("event_type"))
        .limit(3)
      EventStreams.runToResult(s, board, qn("stream_topk"))
        .orderBy(col("n").desc, col("event_type"))
    }),

    // Streaming dedup: the doubled source must reduce back to the original
    // cardinality. Emits per-type counts of the deduped stream.
    "q_stream_dedup" -> ((s, dir) => {
      val ev = EventStreams.readEvents(s, dir)
      val doubled = ev.unionByName(ev)
      val deduped = EventStreams.dedupEvents(doubled)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      EventStreams.runToResult(s, deduped, qn("stream_dedup"))
        .orderBy(col("event_type"))
    }),

    // Streaming Page-Hinkley monitor (round 13, streaming gate #16):
    // the q_page_hinkley level-shift detector wired LIVE — the stream
    // side is ONE complete-mode day-keyed sum whose state is
    // |distinct days| exact-milli longs (calendar-bounded at any
    // corpus size, the q_stream_drift state argument), and the PH
    // fold runs batch-side over the drained day frame: μ = floor
    // mean, δ = μ div 100, m_t = Σ(x−μ−δ), readout = max excursion
    // m_t − min_{s≤t} m_s and its first day. Series = the OBSERVED
    // event days (no zero-fill — a stream has no calendar spine to
    // left-join; declared). value rides the exact DECIMAL(18,3)·1000
    // milli staging so both engines' BIGINT casts see an
    // integer-valued decimal (never a raw double→int cast, whose
    // round-vs-trunc differs cross-engine). The oracle is the
    // identical batch SQL — stream/batch equivalence on the drained
    // bounded source.
    "q_stream_ph" -> ((s, dir) => {
      val dayUs = 86400L * 1000000L
      val cur = EventStreams.readEvents(s, dir)
        .groupBy(expr(s"unix_micros(ts) div $dayUs").as("day"))
        .agg(sum(expr(
          "CAST(CAST(value AS DECIMAL(18,3)) * 1000 AS BIGINT)"))
          .as("milli"))
      val days = EventStreams.runToResult(s, cur, qn("stream_ph"))
        .localCheckpoint()
      val cells = days.agg(count(lit(1)).as("n_days"),
        sum(col("milli")).as("sy"))
        .select(col("n_days"), expr("sy div n_days").as("mu"))
        .select(col("n_days"), col("mu"),
          expr("mu div 100").as("delta"))
      days.agg(collect_list(struct(col("day"), col("milli"))).as("arr"))
        .crossJoin(broadcast(cells))
        .select(col("n_days"), col("mu"), col("delta"), expr(
          """aggregate(array_sort(arr),
            |  named_struct('cum', 0L, 'mn', 0L, 'best', -1L,
            |    'bestday', -1L),
            |  (acc, e) -> element_at(transform(
            |    array(acc.cum + e.milli - mu - delta),
            |    c -> named_struct(
            |      'cum', c,
            |      'mn', least(acc.mn, c),
            |      'best', IF(c - least(acc.mn, c) > acc.best,
            |        c - least(acc.mn, c), acc.best),
            |      'bestday', IF(c - least(acc.mn, c) > acc.best,
            |        e.day, acc.bestday))), 1))"""
            .stripMargin).as("st"))
        .select(col("n_days"), col("mu").as("mu_milli"),
          col("delta").as("delta_milli"),
          col("st.best").as("ph_max"),
          col("st.bestday").as("day_at_max"))
    }),

    // Streaming drift monitor (round 12): the LIVE event-type mix vs the
    // static baseline period — the production drift alarm wired as a
    // stream over the current period against a batch baseline frame. The
    // period boundary (midpoint day) is one collected long at plan build
    // (a bounded model artifact — the ivfTrain "actions are plan
    // boundaries" precedent); the stream side is ONE complete-mode keyed
    // count whose state is |event types| longs — bounded at any corpus
    // size; the PSI closing formula runs batch-side on the drained
    // counts joined to the baseline (types absent from either period
    // yield a declared NULL term — PSI is undefined at a zero cell, and
    // the join is full-outer so such types still REPORT). The oracle is
    // the identical batch SQL — stream/batch equivalence on the drained
    // bounded source.
    "q_stream_drift" -> ((s, dir) => {
      val dayUs = 86400L * 1000000L
      val mid = graft.sources.Tables.load(s, dir, "events")
        .agg(expr(s"""(min(unix_micros(ts) div $dayUs)
                     + max(unix_micros(ts) div $dayUs) + 1) div 2"""))
        .collect().head.getLong(0)
      val base = graft.sources.Tables.load(s, dir, "events")
        .filter(expr(s"unix_micros(ts) div $dayUs") < mid)
        .groupBy(col("event_type")).agg(count(lit(1)).as("a"))
      val cur = EventStreams.readEvents(s, dir)
        .filter(expr(s"unix_micros(ts) div $dayUs") >= mid)
        .groupBy(col("event_type")).agg(count(lit(1)).as("b"))
      val cells = EventStreams.runToResult(s, cur, qn("stream_drift"))
        .join(base, Seq("event_type"), "full")
        .select(col("event_type"),
          coalesce(col("a"), lit(0L)).as("a"),
          coalesce(col("b"), lit(0L)).as("b"))
      val tot = cells.agg(sum(col("a")).as("at"), sum(col("b")).as("bt"))
      cells.crossJoin(broadcast(tot))
        .select(col("event_type"), col("a").as("n_base"),
          col("b").as("n_cur"),
          round(expr(
            """CASE WHEN a = 0 OR b = 0 THEN NULL ELSE
              |  (CAST(a AS DOUBLE) / at - CAST(b AS DOUBLE) / bt)
              |  * ln((CAST(a AS DOUBLE) / at) / (CAST(b AS DOUBLE) / bt))
              |END""".stripMargin), 6).as("psi_term"))
        .orderBy(col("event_type"))
    })
  )

  override def oracle: Map[String, String] = Map(
    // identical to q_cdc_apply's batch oracle — THE stream/batch
    // equivalence contract for the compaction
    "q_stream_cdc" ->
      """WITH c AS (SELECT user_id, event_id, value, epoch_us(ts) AS us,
        |    CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op
        |  FROM events),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY us DESC, event_id DESC) AS rn FROM c)
        |SELECT user_id, event_id AS last_event_id, us AS last_us, value
        |FROM r WHERE rn = 1 AND op = 'U' ORDER BY user_id""".stripMargin,

    // same latest-wins SQL as q_stream_cdc, window-restricted to keys
    // whose TTL (6h past last activity, ms-floored like Spark's timeout
    // arithmetic) expired before the final watermark (max ts − 1h, ms)
    "q_stream_cdc_ttl" ->
      """WITH c AS (SELECT user_id, event_id, value, epoch_us(ts) AS us,
        |    CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op
        |  FROM events),
        |wm AS (SELECT (MAX(us) // 1000) - 3600000 AS wm_ms FROM c),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY us DESC, event_id DESC) AS rn FROM c)
        |SELECT user_id, event_id AS last_event_id, us AS last_us, value
        |FROM r, wm
        |WHERE rn = 1 AND op = 'U' AND (us // 1000) + 21600000 < wm_ms
        |ORDER BY user_id""".stripMargin,

    "q_stream_topk" ->
      s"""SELECT event_type, COUNT(*) AS n,
         |  ${sqlDsum("value")} AS total
         |FROM events GROUP BY 1
         |ORDER BY n DESC, event_type LIMIT 3""".stripMargin,

    // same hash gate as the batch sampling oracles (md5-derived, portable)
    "q_stream_corpus" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         |FROM documents
         |WHERE ${graft.functions.TextFunctions.sqlHash32("CAST(doc_id AS VARCHAR)")} <
         |  CAST(FLOOR(0.5 * 4294967296) AS BIGINT)
         |  AND n_chars BETWEEN 100 AND 2000
         |GROUP BY lang ORDER BY lang""".stripMargin,
    // the rate stream is values 0..999 by construction — the oracle
    // replays the synthetic-doc arithmetic and the same md5 hash gate
    // over generate_series, no table needed
    "q_stream_rate" ->
      s"""SELECT (g % 10) AS bucket, COUNT(*) AS n_docs,
         |  CAST(SUM(g * 37 % 2500) AS BIGINT) AS sum_chars
         |FROM generate_series(0, 999) t(g)
         |WHERE ${graft.functions.TextFunctions.sqlHash32("CAST(g AS VARCHAR)")} <
         |  CAST(FLOOR(0.5 * 4294967296) AS BIGINT)
         |  AND (g * 37 % 2500) BETWEEN 100 AND 2000
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Tumbling window = epoch-floor to 600s buckets. epoch_us (exact
    // integer µs) — epoch() is a double and ::BIGINT *rounds*, which
    // misplaces events within 0.5s of a boundary.
    "q_stream_tumbling" ->
      s"""SELECT (epoch_us(ts) // 600000000) * 600 AS ws_epoch, event_type,
         |  COUNT(*) AS n, ${sqlDsum("value", 6)} AS total
         |FROM events GROUP BY 1, 2 ORDER BY ws_epoch, event_type""".stripMargin,

    // Sliding 10min/5min = each event lands in 2 windows (epoch-floor to
    // each 300s slide boundary whose window covers the event).
    "q_stream_sliding" ->
      """SELECT ws_epoch, event_type, COUNT(*) AS n FROM (
        |  SELECT unnest([
        |      (epoch_us(ts) // 300000000) * 300,
        |      (epoch_us(ts) // 300000000) * 300 - 300]) AS ws_epoch,
        |    event_type
        |  FROM events)
        |GROUP BY 1, 2 ORDER BY ws_epoch, event_type""".stripMargin,

    // Session windows = gaps-and-islands per user with a 5-minute gap.
    "q_stream_session" ->
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |           >= INTERVAL 5 MINUTE OR
        |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT epoch_us(MIN(ts)) // 1000000 AS session_start, user_id,
        |  COUNT(*) AS n_events
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q_stream_dedup" ->
      """SELECT event_type, COUNT(DISTINCT event_id) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_stream_ph" ->
      """WITH RECURSIVE dd AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    SUM(CAST(CAST(value AS DECIMAL(18,3)) * 1000 AS BIGINT))
        |      AS milli
        |  FROM events GROUP BY 1),
        |z AS (SELECT day, milli,
        |        ROW_NUMBER() OVER (ORDER BY day) AS i
        |      FROM dd),
        |cells AS (
        |  SELECT COUNT(*) AS n_days,
        |    SUM(milli) // COUNT(*) AS mu,
        |    (SUM(milli) // COUNT(*)) // 100 AS delta
        |  FROM z),
        |r AS (
        |  SELECT 0 AS i, CAST(0 AS BIGINT) AS cum,
        |    CAST(0 AS BIGINT) AS mnm, CAST(-1 AS BIGINT) AS best,
        |    CAST(-1 AS BIGINT) AS bestday
        |  FROM cells
        |  UNION ALL
        |  SELECT z.i,
        |    r.cum + z.milli - cells.mu - cells.delta,
        |    LEAST(r.mnm, r.cum + z.milli - cells.mu - cells.delta),
        |    CASE WHEN (r.cum + z.milli - cells.mu - cells.delta)
        |        - LEAST(r.mnm,
        |            r.cum + z.milli - cells.mu - cells.delta) > r.best
        |      THEN (r.cum + z.milli - cells.mu - cells.delta)
        |        - LEAST(r.mnm,
        |            r.cum + z.milli - cells.mu - cells.delta)
        |      ELSE r.best END,
        |    CASE WHEN (r.cum + z.milli - cells.mu - cells.delta)
        |        - LEAST(r.mnm,
        |            r.cum + z.milli - cells.mu - cells.delta) > r.best
        |      THEN z.day ELSE r.bestday END
        |  FROM r JOIN z ON z.i = r.i + 1, cells)
        |SELECT CAST(cells.n_days AS BIGINT) AS n_days,
        |  CAST(cells.mu AS BIGINT) AS mu_milli,
        |  CAST(cells.delta AS BIGINT) AS delta_milli,
        |  r.best AS ph_max, r.bestday AS day_at_max
        |FROM r, cells WHERE r.i = (SELECT MAX(i) FROM z)""".stripMargin,

    "q_stream_drift" ->
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, event_type
        |  FROM events),
        |mid AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS mid FROM e),
        |cells AS (
        |  SELECT event_type,
        |    SUM(CASE WHEN day < mid.mid THEN 1 ELSE 0 END) AS a,
        |    SUM(CASE WHEN day >= mid.mid THEN 1 ELSE 0 END) AS b
        |  FROM e, mid GROUP BY 1),
        |tot AS (SELECT SUM(a) AS at, SUM(b) AS bt FROM cells)
        |SELECT event_type, CAST(a AS BIGINT) AS n_base,
        |  CAST(b AS BIGINT) AS n_cur,
        |  round(CASE WHEN a = 0 OR b = 0 THEN NULL ELSE
        |    (CAST(a AS DOUBLE) / at - CAST(b AS DOUBLE) / bt)
        |    * ln((CAST(a AS DOUBLE) / at) / (CAST(b AS DOUBLE) / bt))
        |  END, 6) AS psi_term
        |FROM cells, tot ORDER BY event_type""".stripMargin,

    "q_stream_static" ->
      s"""SELECT d.stage, COUNT(*) AS n, ${Parity.sqlDsum("e.value")} AS total
         |FROM events e
         |JOIN (VALUES ('view','awareness'), ('click','engagement'),
         |             ('purchase','conversion'), ('signup','acquisition'),
         |             ('error','ops')) AS d(event_type, stage)
         |  ON e.event_type = d.event_type
         |GROUP BY d.stage ORDER BY stage""".stripMargin,

    "q_stream_join_outer" ->
      """WITH v AS (SELECT user_id, event_id, ts FROM events
        |  WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |wm AS (SELECT LEAST((SELECT MAX(epoch_us(ts)) // 1000 FROM v),
        |                    (SELECT MAX(epoch_us(ts)) // 1000 FROM p))
        |         - 1800000 AS wm_ms),
        |m AS (SELECT v.user_id, v.event_id AS view_id,
        |    p.event_id AS purchase_id,
        |    epoch_us(p.ts) // 1000000 - epoch_us(v.ts) // 1000000
        |      AS lag_seconds
        |  FROM v JOIN p ON v.user_id = p.user_id AND p.ts > v.ts
        |    AND p.ts <= v.ts + INTERVAL 10 MINUTE),
        |um AS (SELECT v.user_id, v.event_id AS view_id,
        |    CAST(NULL AS BIGINT) AS purchase_id,
        |    CAST(NULL AS BIGINT) AS lag_seconds
        |  FROM v, wm
        |  WHERE NOT EXISTS (SELECT 1 FROM p
        |      WHERE p.user_id = v.user_id AND p.ts > v.ts
        |        AND p.ts <= v.ts + INTERVAL 10 MINUTE)
        |    AND (epoch_us(v.ts) // 1000) + 600000 < wm.wm_ms)
        |SELECT * FROM m UNION ALL SELECT * FROM um
        |ORDER BY view_id, purchase_id""".stripMargin,

    "q_stream_join_full" ->
      """WITH v AS (SELECT user_id, event_id, ts FROM events
        |  WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |wm AS (SELECT LEAST((SELECT MAX(epoch_us(ts)) // 1000 FROM v),
        |                    (SELECT MAX(epoch_us(ts)) // 1000 FROM p))
        |         - 1800000 AS wm_ms),
        |m AS (SELECT v.user_id, v.event_id AS view_id,
        |    p.event_id AS purchase_id,
        |    epoch_us(p.ts) // 1000000 - epoch_us(v.ts) // 1000000
        |      AS lag_seconds
        |  FROM v JOIN p ON v.user_id = p.user_id AND p.ts > v.ts
        |    AND p.ts <= v.ts + INTERVAL 10 MINUTE),
        |uv AS (SELECT v.user_id, v.event_id AS view_id,
        |    CAST(NULL AS BIGINT) AS purchase_id,
        |    CAST(NULL AS BIGINT) AS lag_seconds
        |  FROM v, wm
        |  WHERE NOT EXISTS (SELECT 1 FROM p
        |      WHERE p.user_id = v.user_id AND p.ts > v.ts
        |        AND p.ts <= v.ts + INTERVAL 10 MINUTE)
        |    AND (epoch_us(v.ts) // 1000) + 600000 < wm.wm_ms),
        |up AS (SELECT p.user_id, CAST(NULL AS BIGINT) AS view_id,
        |    p.event_id AS purchase_id,
        |    CAST(NULL AS BIGINT) AS lag_seconds
        |  FROM p, wm
        |  WHERE NOT EXISTS (SELECT 1 FROM v
        |      WHERE v.user_id = p.user_id AND p.ts > v.ts
        |        AND p.ts <= v.ts + INTERVAL 10 MINUTE)
        |    AND (epoch_us(p.ts) // 1000) < wm.wm_ms)
        |SELECT * FROM m UNION ALL SELECT * FROM uv UNION ALL
        |SELECT * FROM up
        |ORDER BY view_id, purchase_id""".stripMargin,

    "q_stream_update" ->
      """SELECT CAST(value % 10 AS BIGINT) AS bucket,
        |  COUNT(*) AS n, CAST(SUM(value) AS BIGINT) AS sum_value
        |FROM (SELECT unnest(generate_series(0, 999)) AS value)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_stream_join" ->
      """SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
        |  epoch_us(p.ts) // 1000000 - epoch_us(v.ts) // 1000000 AS lag_seconds
        |FROM (SELECT * FROM events WHERE event_type = 'view') v
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON v.user_id = p.user_id AND p.ts > v.ts
        |  AND p.ts <= v.ts + INTERVAL 10 MINUTE
        |ORDER BY view_id, purchase_id""".stripMargin
  )
}
