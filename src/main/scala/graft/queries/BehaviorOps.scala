package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.{AsOfJoin, BasketGraph}
import graft.sources.Tables

/** Behavioral analytics over the event log (SURVEY §2.11 / §2.4
  * extensions): cohort retention matrices and ordered conversion funnels —
  * the two queries every product-analytics deployment runs daily, here
  * with the time arithmetic held in integer microseconds so both engines
  * agree to the bit.
  */
object BehaviorOps extends QueryPack {

  private def events(s: SparkSession, dir: String) =
    Tables.load(s, dir, "events")

  private val DayUs = 86400000000L

  /** Funnel step window: the next step must land within 24h of the
    * previous step's first occurrence. */
  private val FunnelWindowUs = 24L * 3600 * 1000000

  /** 12-hour inactivity gap — the same session boundary q_sessionize and
    * the streaming session window use, so paths line up session-for-
    * session with both. */
  private val SessionGapUs = 12L * 3600 * 1000000

  override def defs: Map[String, Q] = Map(
    // CDC apply / upsert compaction (round 9): the event log read as a
    // change stream — per key, the LATEST change wins (ts, then event_id
    // as the deterministic tiebreak), and a delete tombstone (synthetic
    // op: every 10th event) removes the key from the compacted state.
    // This is the MERGE-into-snapshot primitive of an incremental
    // warehouse; one key-partitioned window, no global sort, the plan a
    // 100 TB compaction job needs.
    "q_cdc_apply" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us").desc, col("event_id").desc)
      events(s, dir)
        .select(col("user_id"), col("event_id"), col("value"),
          unix_micros(col("ts")).as("us"),
          when(col("event_id") % 10 === 0, lit("D"))
            .otherwise(lit("U")).as("op"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1 && col("op") === "U")
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("us").as("last_us"), col("value"))
        .orderBy(col("user_id"))
    }),

    // Time-to-convert (round 9): per A/B variant, the median and p90
    // seconds from a user's first view to their first subsequent
    // purchase within the 24h funnel window — the latency readout of
    // the funnel. Exact DISC percentiles through the distributed rank
    // frame (bit-portable actual data values, never a per-variant
    // single-partition window).
    "q_time_to_convert" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t_view"))
      val p = e.filter(col("event_type") === "purchase")
        .join(v, Seq("user_id"))
        .filter(col("us") > col("t_view") &&
          col("us") <= col("t_view") + FunnelWindowUs)
        .groupBy(col("user_id")).agg(min(col("us")).as("t_buy"))
      val deltas = p.join(v, Seq("user_id"))
        .select(
          pmod(graft.functions.TextFunctions.hash32(
            concat(lit("ab:"), col("user_id").cast("string"))), lit(2L))
            .as("variant"),
          expr("(t_buy - t_view) div 1000000").as("secs"))
      val pct = graft.operators.Percentiles.exactDisc(deltas,
        col("variant"), col("secs"),
        ratios = Seq((1, 2), (9, 10)), outNames = Seq("p50_s", "p90_s"))
      deltas.groupBy(col("variant")).agg(count(lit(1)).as("n_converted"))
        .join(pct.select(col("group").as("variant"), col("p50_s"),
          col("p90_s")), Seq("variant"))
        .orderBy(col("variant"))
    }),

    // Time-weighted average (round 9): each event's value is held until
    // the user's next event, and the average weights by holding
    // duration — the TWAP/telemetry aggregation where a plain mean
    // over-counts bursts. One user-partitioned lead window; products
    // value·Δt are per-row IEEE doubles cast DECIMAL(38,6) before the
    // order-independent sum (the established exactness chain); a user
    // whose holds all have zero duration yields NULL, not 0/0.
    "q_twap" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val holds = events(s, dir)
        .select(col("user_id"), col("event_id"), col("value"),
          unix_micros(col("ts")).as("us"))
        .withColumn("nxt", lead(col("us"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("user_id"), col("value"),
          (col("nxt") - col("us")).as("dt"))
      holds.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_holds"),
          sum((col("value") * col("dt")).cast(DecimalType(38, 6)))
            .cast("string").cast("double").as("__num"),
          sum(col("dt")).as("__den"))
        .select(col("user_id"), col("n_holds"),
          when(col("__den") > 0,
            round(col("__num") / col("__den").cast("double"), 6)).as("twap"))
        .orderBy(col("user_id"))
    }),

    // Mergeable-sketch rollup (round 9): daily HLL sketches of distinct
    // users per event type, UNIONED up to weekly estimates — the
    // pre-aggregation pattern that answers any date-range distinct
    // count at 100 TB without rescanning raw events (a distinct-count
    // is not re-aggregable, a sketch is). The gate pins the merged
    // estimate within 5% of the exact weekly distinct (DataSketches
    // HLL at default lgK is ~1.6% RSE, and sketch content is
    // insertion-order independent, so the boolean is deterministic);
    // the oracle computes the exact side and expects merge_ok = true.
    "q_sketch_rollup" -> ((s, dir) => {
      val e = events(s, dir).select(col("event_type"), col("user_id"),
        expr(s"unix_micros(ts) div $DayUs").as("d"))
      val daily = e.groupBy(col("event_type"), col("d"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val weekly = daily.groupBy(col("event_type"),
          expr("d div 7").as("wk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("__est"))
      val exact = e.groupBy(col("event_type"), expr("d div 7").as("wk"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      exact.join(weekly, Seq("event_type", "wk"))
        .select(col("event_type"), col("wk"), col("exact_users"),
          (abs(col("__est") - col("exact_users")).cast("double") <=
            col("exact_users").cast("double") * 0.05 + 5.0).as("merge_ok"))
        .orderBy(col("event_type"), col("wk"))
    }),

    // Last-touch attribution (round 9): each purchase credits the most
    // recent preceding view/click by the SAME user within 24h — the
    // marketing-attribution join, expressed through the as-of operator
    // (one shuffle + per-partition sort over |purchases|+|touches|,
    // never the purchase×touch pair explosion the naive join-then-rank
    // materializes; that explosion is exactly what the ORACLE does,
    // which is fine at gate scale and is the point of the contrast).
    "q_attribution" -> ((s, dir) => {
      val ev = events(s, dir).select(col("user_id"), col("event_id"),
        col("event_type"), col("value"), unix_micros(col("ts")).as("us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("value"), col("us"))
      val touches = ev.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("event_id").as("touch_id"),
          col("event_type").as("touch_type"), col("us").as("touch_us"))
      AsOfJoin(purchases, touches,
          leftKey = purchases("user_id"), rightKey = touches("user_id"),
          leftTime = purchases("us"), rightTime = touches("touch_us"),
          rightPayload = Seq("touch_type", "touch_us"),
          rightTieBreak = touches("touch_id"))
        .select(col("value"),
          when(col("_match.touch_us").isNotNull &&
              col("us") - col("_match.touch_us") <= FunnelWindowUs,
            col("_match.touch_type")).otherwise(lit("none")).as("channel"))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          Parity.dsum(col("value")).as("revenue"))
        .orderBy(col("channel"))
    }),

    // Cohort retention: users bucketed by first-seen day (cohort),
    // activity days expressed as offsets from the cohort day, distinct
    // users per (cohort, offset) cell. Day indices are integer floor-divs
    // of epoch microseconds; the cohort axis is anchored at the data's
    // min cohort day (derived, not hardcoded). Shuffle profile: one
    // per-user min-agg, one distinct, one user-key join, one cell agg —
    // all on narrow (id, day) rows.
    "q_cohort_retention" -> ((s, dir) => {
      val e = events(s, dir)
        .select(col("user_id"), expr(s"unix_micros(ts) div $DayUs").as("d"))
      val first = e.groupBy(col("user_id")).agg(min(col("d")).as("cohort_d"))
      val anchor = first.agg(min(col("cohort_d")).as("min_d"))
      val active = e.distinct()
      active.join(first, Seq("user_id"))
        .crossJoin(broadcast(anchor))
        .groupBy((col("cohort_d") - col("min_d")).as("cohort_day"),
          (col("d") - col("cohort_d")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // Ordered conversion funnel view → click → purchase with a 24h step
    // window: each stage keeps one row per user (the FIRST qualifying
    // event — min-agg, no window needed), and each successive stage joins
    // only survivors of the previous one, so the funnel narrows the data
    // monotonically. Conversion ratios in exact integer milli-units.
    "q_funnel" -> ((s, dir) => {
      val e = events(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t_view"))
      val c = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .filter(col("us") > col("t_view") &&
          col("us") <= col("t_view") + FunnelWindowUs)
        .groupBy(col("user_id")).agg(min(col("us")).as("t_click"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .filter(col("us") > col("t_click") &&
          col("us") <= col("t_click") + FunnelWindowUs)
        .groupBy(col("user_id")).agg(min(col("us")).as("t_buy"))
      v.agg(count(lit(1)).as("step_view"))
        .crossJoin(c.agg(count(lit(1)).as("step_click")))
        .crossJoin(p.agg(count(lit(1)).as("step_purchase")))
        .select(col("step_view"), col("step_click"), col("step_purchase"),
          expr("(1000 * step_click) div step_view").as("conv_click_milli"),
          expr("(1000 * step_purchase) div step_click")
            .as("conv_purchase_milli"))
    }),

    // Markov transition matrix over the event stream: counts and exact
    // milli-probabilities of each consecutive (prev → next) event-type
    // pair per user timeline. The lag window partitions by user (bounded
    // per-user sort, fully parallel across users); the transition table is
    // |event_types|² rows, so the per-prev totals join broadcasts. Ties in
    // ts break on event_id — the order is total, so both engines see the
    // same sequence.
    "q_event_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val steps = events(s, dir)
        .select(col("user_id"), col("event_type"),
          lag(col("event_type"), 1).over(w).as("prev"))
        .filter(col("prev").isNotNull)
        .select(col("prev"), col("event_type").as("next"))
      val trans = steps.groupBy(col("prev"), col("next"))
        .agg(count(lit(1)).as("c"))
      val totals = trans.groupBy(col("prev")).agg(sum(col("c")).as("n"))
      trans.join(broadcast(totals), Seq("prev"))
        .select(col("prev"), col("next"), col("c"),
          expr("(1000 * c) div n").as("p_milli"))
        .orderBy(col("prev"), col("next"))
    }),

    // Activity-gap profile: per user, days active, calendar span, and the
    // longest dormancy (full days with no events between two active days).
    // The resample-to-daily-grid operator collapsed to its lag form — no
    // exploded zero-filled grid ever materializes, so the shuffle carries
    // one (user, day) row per ACTIVE day, not per calendar day.
    "q_activity_gaps" -> ((s, dir) => {
      val d = events(s, dir)
        .select(col("user_id"), expr(s"unix_micros(ts) div $DayUs").as("day"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      d.withColumn("gap", col("day") - lag(col("day"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("active_days"),
          (max(col("day")) - min(col("day")) + 1).as("span_days"),
          coalesce(max(when(col("gap") > 1, col("gap") - 1)), lit(0L))
            .as("max_gap"))
        .orderBy(col("user_id"))
    }),

    // Chi-square independence test: event type × day-of-week (epoch-day
    // mod 7 — a pure integer dow that needs no cross-engine calendar
    // agreement). The statistic is Σ (n·o − r·c)² / (n·r·c) held in
    // micro-units with every product routed through DECIMAL(38,0) —
    // (n·o)² overflows BIGINT around corpus sizes of 10⁵ — and the
    // per-cell integer quotients summed exactly. Marginals are
    // |types|- and 7-row broadcasts; one scan, one cell-level shuffle.
    "q_chi2" -> ((s, dir) => {
      // round 18: lazy-checkpoint the cell census (both marginals and
      // the main join read it — ScanCount measured the events scan
      // executing 4× at sf0.01) and derive the grand total from the
      // cells (Σ o ≡ COUNT(*): the census partitions every event row)
      // instead of a second corpus scan. 4 scans → 1.
      val cells = events(s, dir)
        .select(col("event_type").as("e"),
          expr(s"(unix_micros(ts) div $DayUs) % 7").as("d"))
        .groupBy(col("e"), col("d")).agg(count(lit(1)).as("o"))
        .localCheckpoint(eager = false)
      val rowm = cells.groupBy(col("e")).agg(sum(col("o")).as("ro"))
      val colm = cells.groupBy(col("d")).agg(sum(col("o")).as("co"))
      val tot = cells.agg(sum(col("o")).as("n"))
      cells.join(broadcast(rowm), Seq("e"))
        .join(broadcast(colm), Seq("d"))
        .crossJoin(broadcast(tot))
        .select(expr(
          """(1000000 * (CAST(n AS DECIMAL(38,0)) * o - CAST(ro AS DECIMAL(38,0)) * co)
             * (CAST(n AS DECIMAL(38,0)) * o - CAST(ro AS DECIMAL(38,0)) * co))
             div (CAST(n AS DECIMAL(38,0)) * ro * co)""").as("cell"))
        .agg(sum(col("cell")).as("chi2_micro"),
          count(lit(1)).as("n_cells"))
    }),

    // Session path mining: the first three event types of each 12h-gap
    // session (same gap and boundary semantics as q_sessionize /
    // the streaming session window), counted into the top-10 navigation
    // paths. The per-session ordered prefix comes from one bounded
    // collect of ≤3 structs sorted in place — the path agg never buffers
    // a whole session; the top-10 is a TakeOrderedAndProject.
    "q_session_paths" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      val sess = graft.operators.Sessionize.byGap(
        e, col("user_id"), col("us"), col("event_id"), SessionGapUs)
      val w = Window.partitionBy(col("user_id"), col("session_idx"))
        .orderBy(col("us"), col("event_id"))
      sess.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .groupBy(col("user_id"), col("session_idx"))
        .agg(array_join(
          transform(
            sort_array(collect_list(
              struct(col("us"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")), ">").as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(10)
    }),

    // Spearman rank correlation (does event value drift over time, per
    // type): both rank frames come from the distributed tie-broken rank
    // operator (Percentiles.globalRanksTieBroken — value-bucketed sort,
    // ties on event_id, NO per-group single-partition window), joined
    // row-for-row on the carried tie key. Rank sums are exact
    // DECIMAL(38,0) integers; only the closing Pearson-of-ranks quotient
    // touches doubles, with identical expressions both engines evaluate
    // on identical integer inputs (IEEE /,*,sqrt are correctly rounded —
    // deterministic cross-engine).
    "q_spearman" -> ((s, dir) => {
      val e = events(s, dir).filter(col("value").isNotNull)
        .select(col("event_type").as("g"), col("event_id"),
          col("value"), unix_micros(col("ts")).as("us"))
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val rx = graft.operators.Percentiles.globalRanksTieBroken(
          e, col("g"), col("value"), col("event_id"))
        .select(col("group").as("g"), col("tie"), col("rank").as("rx"))
      val ry = graft.operators.Percentiles.globalRanksTieBroken(
          e, col("g"), col("us"), col("event_id"))
        .select(col("group").as("g"), col("tie"), col("rank").as("ry"))
      rx.join(ry, Seq("g", "tie"))
        .groupBy(col("g"))
        .agg(count(lit(1)).cast(d38).as("n"),
          sum(col("rx").cast(d38)).as("sx"),
          sum(col("ry").cast(d38)).as("sy"),
          sum((col("rx") * col("ry")).cast(d38)).as("sxy"),
          sum((col("rx") * col("rx")).cast(d38)).as("sxx"),
          sum((col("ry") * col("ry")).cast(d38)).as("syy"))
        .select(col("g").as("event_type"),
          col("n").cast("long").as("n"),
          expr("""CAST(floor((1000000 * CAST(n * sxy - sx * sy AS DOUBLE))
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                      * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)""")
            .as("rho_micro"))
        .orderBy(col("event_type"))
    }),

    // SCD2 build: turn the event log into type-2 validity intervals —
    // each user's state (last event type) with [valid_from, valid_to)
    // bounds in epoch microseconds, the open interval closed by
    // Long.MaxValue. One lead() window per user timeline (bounded
    // per-user sort, parallel across users) — the standard
    // warehouse-dimension construction, ready for the as-of join.
    "q_scd2_build" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("valid_from"),
          lead(unix_micros(col("ts")), 1).over(w).as("next_us"))
        .select(col("user_id"), col("event_type"), col("valid_from"),
          coalesce(col("next_us"), lit(Long.MaxValue)).as("valid_to"))
        .orderBy(col("user_id"), col("valid_from"), col("valid_to"),
          col("event_type"))
    }),

    // Hour-of-day seasonality: per event type, the 24-hour activity
    // profile collapsed to totals and the peak hour — the argmax is the
    // same aggregate-only min-over-(−count, hour) structs as
    // q_lm_next_token, no window over data. Hours are epoch-hour mod 24
    // (pure integers, no calendar/timezone agreement needed).
    "q_hourly_peak" -> ((s, dir) => {
      val h = events(s, dir)
        .select(col("event_type"),
          expr("(unix_micros(ts) div 3600000000) % 24").as("hour"))
        .groupBy(col("event_type"), col("hour"))
        .agg(count(lit(1)).as("n"))
      h.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hours"), sum(col("n")).as("total"),
          min(struct((-col("n")).as("negn"), col("hour"))).as("m"))
        .select(col("event_type"), col("n_hours"), col("total"),
          col("m.hour").as("peak_hour"), (-col("m.negn")).as("peak_n"))
        .orderBy(col("event_type"))
    }),

    // SCD2 point-in-time probe: look up each user's state at the midpoint
    // of their observed timeline. The Spark side runs the sort-merge as-of
    // operator (one shuffle, no pair explosion) against the raw event rows;
    // the oracle answers by interval containment over the built SCD2
    // dimension — two formulations of "state as of t" that must agree row
    // for row, which is exactly the property that makes q_scd2_build's
    // intervals trustworthy.
    "q_scd2_asof" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_type"),
        col("event_id"), unix_micros(col("ts")).as("us"))
      val probes = e.groupBy(col("user_id"))
        .agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
        .select(col("user_id"), expr("(mn + mx) div 2").as("probe_us"))
      graft.operators.AsOfJoin(probes, e,
          leftKey = probes("user_id"), rightKey = e("user_id"),
          leftTime = probes("probe_us"), rightTime = e("us"),
          rightPayload = Seq("event_type", "us"),
          rightTieBreak = e("event_id"))
        .select(col("user_id"), col("probe_us"),
          col("_match.event_type").as("state"),
          col("_match.us").as("since_us"))
        .orderBy(col("user_id"))
    }),

    // Exponential smoothing over the zero-filled daily grid, α = 1/2
    // truncated at 8 lags: the smoothed value is a DYADIC rational —
    // numerator Σ 2^(7-k)·x_(t-k) over denominator 2^8 — so both engines
    // hold it exactly in integers (a float EWMA recurrence compounds ulp
    // drift through the feedback loop and cannot carry a bit-exact
    // oracle). The dense grid materializes types×days rows — tiny at any
    // corpus scale; the window is one bounded per-type sort.
    "q_ses_forecast" -> ((s, dir) => {
      val c = events(s, dir)
        .select(col("event_type"), expr(s"unix_micros(ts) div $DayUs").as("day"))
        .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
      val b = c.groupBy(col("event_type"))
        .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      val d = b.select(col("event_type"), col("mn"),
          explode(sequence(col("mn"), col("mx"))).as("day"))
        .join(c, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("mn"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      d.withColumn("ses_num",
          lit(128) * col("n") + lit(64) * lag(col("n"), 1, 0).over(w)
            + lit(32) * lag(col("n"), 2, 0).over(w)
            + lit(16) * lag(col("n"), 3, 0).over(w)
            + lit(8) * lag(col("n"), 4, 0).over(w)
            + lit(4) * lag(col("n"), 5, 0).over(w)
            + lit(2) * lag(col("n"), 6, 0).over(w)
            + lag(col("n"), 7, 0).over(w))
        .filter(col("day") >= col("mn") + 7)
        .select(col("event_type"), col("day"), col("n"), col("ses_num"),
          expr("ses_num div 256").as("smooth"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Rolling 3σ anomaly screen on the same grid: each day against the
    // PRECEDING 7 days (never itself — self-inclusion drags the mean
    // toward the outlier). |x−μ| > 3σ is evaluated in cross-multiplied
    // integers, (7x−Σ)² > 9(7Σx²−Σ²), so no sqrt and no doubles — the
    // flag is bit-deterministic. All full-window days are emitted with
    // both comparison sides, flagged or not, so the gate hash pins the
    // arithmetic rather than (possibly zero) flagged rows alone.
    "q_rolling_anomaly" -> ((s, dir) => {
      val c = events(s, dir)
        .select(col("event_type"), expr(s"unix_micros(ts) div $DayUs").as("day"))
        .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
      val b = c.groupBy(col("event_type"))
        .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      val d = b.select(col("event_type"), col("mn"),
          explode(sequence(col("mn"), col("mx"))).as("day"))
        .join(c, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("mn"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"))
      val w7 = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-7, -1)
      d.withColumn("sum7", sum(col("n")).over(w7))
        .withColumn("ss7", sum(col("n") * col("n")).over(w7))
        .filter(col("day") >= col("mn") + 7)
        .select(col("event_type"), col("day"), col("n"), col("sum7"),
          col("ss7"),
          ((lit(7) * col("n") - col("sum7"))
            * (lit(7) * col("n") - col("sum7"))).as("lhs"),
          (lit(9) * (lit(7) * col("ss7") - col("sum7") * col("sum7")))
            .as("rhs"))
        .withColumn("is_anomaly", col("lhs") > col("rhs"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Mann-Kendall trend test (Mann 1945; Kendall's S): Σ sign(x_j − x_i)
    // over all day pairs i<j of each type's zero-filled daily series — a
    // rank-order trend statistic that is PURE INTEGER, so it carries an
    // exact oracle where a fitted slope could not. The pairwise self-join
    // is per-series O(days²): days are the AGGREGATION axis (30 here,
    // ≤ a few thousand for years of data), so the pair count stays bounded
    // regardless of corpus row count — the corpus itself is reduced to the
    // grid by one group-by before any pairing.
    "q_trend_mk" -> ((s, dir) => {
      val c = events(s, dir)
        .select(col("event_type"), expr(s"unix_micros(ts) div $DayUs").as("day"))
        .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
        // round 18: census leaf (ScanCount: the fan-out re-ran the
        // fact scan per consumer; see OPTIMIZATION_r18.md)
        .localCheckpoint(eager = false)
      val b = c.groupBy(col("event_type"))
        .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      val d = b.select(col("event_type"), col("mn"),
          explode(sequence(col("mn"), col("mx"))).as("day"))
        .join(c, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"))
      val a = d.select(col("event_type"), col("day").as("di"), col("n").as("ni"))
      val z = d.select(col("event_type"), col("day").as("dj"), col("n").as("nj"))
      a.join(z, Seq("event_type"))
        .filter(col("di") < col("dj"))
        .select(col("event_type"),
          when(col("nj") > col("ni"), 1L)
            .when(col("nj") < col("ni"), -1L).otherwise(0L).as("sgn"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("sgn")).as("s_stat"),
          sum(when(col("sgn") === 0L, 1L).otherwise(0L)).as("n_ties"))
        .orderBy(col("event_type"))
    }),

    // CUSUM⁺ change-point screen (Page 1954): cumulative positive drift of
    // the daily count above its per-type mean level k. The textbook
    // recurrence CUSUM_t = max(0, CUSUM_{t-1} + (x_t − k)) looks
    // inherently sequential, but rewrites EXACTLY as S_t − min_{j≤t} S_j
    // over prefix sums S — two running windows, no recursion, fully
    // parallel across types. Deviations are held in milli-units with k
    // itself a floor quotient, so every engine computes identical
    // integers; the drift flag fires at k/2 (half an average day of
    // cumulative excess).
    "q_cusum" -> ((s, dir) => {
      val c = events(s, dir)
        .select(col("event_type"), expr(s"unix_micros(ts) div $DayUs").as("day"))
        .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
        // round 18: census leaf (ScanCount: the fan-out re-ran the
        // fact scan per consumer; see OPTIMIZATION_r18.md)
        .localCheckpoint(eager = false)
      val b = c.groupBy(col("event_type"))
        .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      val d = b.select(col("event_type"), col("mn"),
          explode(sequence(col("mn"), col("mx"))).as("day"))
        .join(c, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"))
      val m = d.groupBy(col("event_type"))
        .agg(sum(col("n")).as("tot"), count(lit(1)).as("nd"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d.join(broadcast(m), Seq("event_type"))
        .select(col("event_type"), col("day"), col("n"),
          expr("(1000 * tot) div nd").as("k_milli"),
          sum(expr("1000 * n - (1000 * tot) div nd")).over(w).as("ps"))
        .withColumn("cusum_milli", col("ps") - min(col("ps")).over(w))
        .select(col("event_type"), col("day"), col("n"), col("cusum_milli"),
          (col("cusum_milli") > expr("k_milli div 2")).as("drifted"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Rolling 7-day OLS trend slope per event type — the local trend
    // companion to q_trend_mk's global test. Over the zero-filled daily
    // grid, slope = (w·Σxy − Σx·Σy) / (w·Σx² − (Σx)²) from four window
    // sums in pure integers (x = day − first-day), so numerator and
    // denominator carry an exact oracle; the quotient is the one IEEE
    // division. For 7 consecutive days the denominator is the constant
    // 196 — emitted anyway as the algebraic invariant the oracle pins.
    "q_rolling_slope" -> ((s, dir) => {
      val c = events(s, dir)
        .select(col("event_type"), expr(s"unix_micros(ts) div $DayUs").as("day"))
        .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
      val b = c.groupBy(col("event_type"))
        .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      val d = b.select(col("event_type"), col("mn"),
          explode(sequence(col("mn"), col("mx"))).as("day"))
        .join(c, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("mn"), col("day"),
          (col("day") - col("mn")).as("x"),
          coalesce(col("n"), lit(0L)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-6, 0)
      d.select(col("event_type"), col("mn"), col("day"), col("n"),
          sum(col("x")).over(w).as("sx"),
          sum(col("n")).over(w).as("sy"),
          sum(col("x") * col("n")).over(w).as("sxy"),
          sum(col("x") * col("x")).over(w).as("sxx"))
        .filter(col("day") >= col("mn") + 6)
        .select(col("event_type"), col("day"), col("n"),
          (lit(7) * col("sxy") - col("sx") * col("sy")).as("num"),
          (lit(7) * col("sxx") - col("sx") * col("sx")).as("den"))
        .withColumn("slope",
          col("num").cast("double") / col("den").cast("double"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Rolling 7-day active users: DAU, WAU and the stickiness ratio —
    // the product-health metric every event warehouse serves. The window
    // distinct is EXACT and distributed: each distinct (user, day) pair
    // fans out to the ≤7 windows it belongs to (a bounded ×7 expansion of
    // the already-deduplicated pair set, not of raw events), then one
    // count-distinct per window day — Spark's two-phase distinct
    // aggregation, no per-window buffer, no sliding state.
    "q_rolling_wau" -> ((s, dir) => {
      val du = events(s, dir)
        .select(col("user_id"), expr(s"unix_micros(ts) div $DayUs").as("d"))
        .distinct()
      val b = du.agg(min(col("d")).as("mn"), max(col("d")).as("mx"))
      val dau = du.groupBy(col("d").as("day"))
        .agg(count(lit(1)).as("dau"))
      val wau = du
        .select(col("user_id"),
          explode(sequence(col("d"), col("d") + 6)).as("day"))
        .crossJoin(broadcast(b))
        .filter(col("day") >= col("mn") + 6 && col("day") <= col("mx"))
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("wau"))
      wau.join(dau, Seq("day"), "left")
        .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
          col("wau"))
        .withColumn("stickiness",
          col("dau").cast("double") / col("wau").cast("double"))
        .orderBy(col("day"))
    }),

    // Lag-1 / lag-7 autocorrelation of each type's zero-filled daily
    // series — does yesterday (and the same weekday last week) predict
    // today? Mean-centering is cleared of its rational mean by scaling
    // through n: with e_t = n·x_t − S both ACF numerators and the
    // denominator are PURE INTEGER sums of e-products (exact oracle);
    // the two closing quotients are the only IEEE ops. The grid is the
    // aggregation axis, so the lead windows run over ≤ a few thousand
    // rows per type regardless of corpus size.
    "q_autocorr" -> ((s, dir) => {
      val c = events(s, dir)
        .select(col("event_type"), expr(s"unix_micros(ts) div $DayUs").as("day"))
        .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("x"))
        // round 18: census leaf (ScanCount: the fan-out re-ran the
        // fact scan per consumer; see OPTIMIZATION_r18.md)
        .localCheckpoint(eager = false)
      val b = c.groupBy(col("event_type"))
        .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      val d = b.select(col("event_type"), col("mn"),
          explode(sequence(col("mn"), col("mx"))).as("day"))
        .join(c, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("x"), lit(0L)).as("x"))
      val m = d.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val e = col("n") * col("x") - col("s")
      val dv = d.join(broadcast(m), Seq("event_type"))
        .select(col("event_type"), col("day"), e.as("e"),
          lead(e, 1).over(w).as("e1"), lead(e, 7).over(w).as("e7"))
      dv.groupBy(col("event_type"))
        .agg(sum(col("e") * col("e")).cast("long").as("den"),
          sum(when(col("e1").isNotNull, col("e") * col("e1"))
            .otherwise(0L)).cast("long").as("num1"),
          sum(when(col("e7").isNotNull, col("e") * col("e7"))
            .otherwise(0L)).cast("long").as("num7"))
        .select(col("event_type"), col("den"), col("num1"), col("num7"),
          (col("num1").cast("double") / col("den").cast("double"))
            .as("acf1"),
          (col("num7").cast("double") / col("den").cast("double"))
            .as("acf7"))
        .orderBy(col("event_type"))
    }),

    // Cohort lifetime value: q_cohort_retention's revenue companion —
    // per (cohort, age) revenue and its running total, the curve an LTV
    // model fits. Revenue sums and the cumulative window both stay in
    // exact decimals (order-independent at any partitioning), string-
    // routed to doubles only at the output boundary; the window is
    // partitioned by cohort over the bounded age axis.
    "q_cohort_ltv" -> ((s, dir) => {
      val e = events(s, dir)
        .select(col("user_id"), expr(s"unix_micros(ts) div $DayUs").as("day"),
          col("value"))
      val f = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_d"))
      val mnv = f.agg(min(col("cohort_d")).as("m"))
      val r = e.join(f, Seq("user_id")).crossJoin(broadcast(mnv))
        .select((col("cohort_d") - col("m")).as("cohort_day"),
          (col("day") - col("cohort_d")).as("day_offset"),
          col("value"))
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(sum(col("value").cast(DecimalType(18, 4))).as("rev"))
      val w = Window.partitionBy(col("cohort_day")).orderBy(col("day_offset"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      r.select(col("cohort_day"), col("day_offset"),
          col("rev").cast("string").cast("double").as("revenue"),
          sum(col("rev")).over(w).cast("string").cast("double")
            .as("cum_revenue"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // RFM segmentation: recency/frequency/monetary quintiles per user,
    // segment census out. Each quintile comes from the DISTRIBUTED
    // tie-broken rank frame (no partition-less window over users —
    // the oracle's global row_number is the semantic spec, not the
    // plan), with user_id the deterministic tie so both engines assign
    // tied metric values identically. Quintile = ((rank−1)·5) div n + 1
    // in pure integers.
    "q_rfm" -> ((s, dir) => {
      val d = events(s, dir)
        .select(col("user_id"), expr(s"unix_micros(ts) div $DayUs").as("day"),
          col("value"))
      val mx = d.agg(max(col("day")).as("mxd"))
      val u = d.crossJoin(broadcast(mx))
        .groupBy(col("user_id"))
        .agg((first(col("mxd")) - max(col("day"))).as("recency"),
          count(lit(1)).as("frequency"),
          sum(col("value").cast(DecimalType(18, 4))).as("monetary"))
        .localCheckpoint()
      def quintile(metric: Column, name: String) =
        graft.operators.Percentiles
          .globalRanksTieBroken(u, lit(0), metric, col("user_id"))
          .select(col("tie").as("user_id"),
            expr("((rank - 1) * 5) div n + 1").as(name))
      quintile(col("recency"), "r_q")
        .join(quintile(col("frequency"), "f_q"), Seq("user_id"))
        .join(quintile(col("monetary"), "m_q"), Seq("user_id"))
        .groupBy(col("r_q"), col("f_q"), col("m_q"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("r_q"), col("f_q"), col("m_q"))
    }),

    // Audience segment overlap (round 10): users bucketed into behavioral
    // segments (here: the event types they performed), then every segment
    // pair's intersection size and Jaccard — the audience-overlap matrix
    // behind campaign targeting and dedup of lookalike lists. Shape: the
    // distinct (user, segment) membership list self-joins on user with
    // segA < segB — the per-user fan-out rides the census-capped
    // BasketGraph pairing (≤ C(5,2) = 10 pairs/user here; a user in
    // thousands of segments would drop whole with an observable count);
    // segment sizes are a broadcast dim derived from the SAME capped
    // membership; Jaccard in exact micro-units.
    "q_segment_overlap" -> ((s, dir) => {
      val m = events(s, dir)
        .select(col("user_id"), col("event_type").as("seg")).distinct()
      val c0 = BasketGraph.cappedItems(m, "user_id", "seg")
      val sizes = c0.groupBy(col("seg")).agg(count(lit(1)).as("n"))
      val inter = BasketGraph.pairsOf(c0, "user_id", "seg")
        .groupBy(col("u").as("seg_a"), col("v").as("seg_b"))
        .agg(count(lit(1)).as("n_both"))
      inter
        .join(broadcast(sizes.select(col("seg").as("seg_a"),
          col("n").as("n_a"))), Seq("seg_a"))
        .join(broadcast(sizes.select(col("seg").as("seg_b"),
          col("n").as("n_b"))), Seq("seg_b"))
        .select(col("seg_a"), col("seg_b"), col("n_a"), col("n_b"),
          col("n_both"),
          expr("(1000000 * n_both) div (n_a + n_b - n_both)")
            .as("jaccard_micro"))
        .orderBy(col("seg_a"), col("seg_b"))
    }),

    // Difference-in-differences (round 10): the workhorse causal
    // estimator when assignment isn't randomized — compare the treated
    // group's before/after change against the control group's, removing
    // shared time trends. Treatment = odd user_id, period split at a
    // fixed calendar boundary (2024-01-16). One grouped pass produces
    // the four cell means (exact decimal sums / counts — the davg
    // discipline), and the DID is arithmetic on those four doubles, so
    // both engines agree to the bit.
    "q_diff_in_diff" -> ((s, dir) => {
      val cut = lit("2024-01-16").cast("timestamp")
      val cells = events(s, dir)
        .select((col("user_id") % 2 === 1).as("treated"),
          (col("ts") >= cut).as("post"), col("value"))
        .groupBy(col("treated"), col("post"))
        .agg(Parity.davg(col("value")).as("mean_value"),
          count(lit(1)).as("n"))
      val one = cells.groupBy().agg(
        max(when(col("treated") && col("post"), col("mean_value")))
          .as("t_post"),
        max(when(col("treated") && !col("post"), col("mean_value")))
          .as("t_pre"),
        max(when(!col("treated") && col("post"), col("mean_value")))
          .as("c_post"),
        max(when(!col("treated") && !col("post"), col("mean_value")))
          .as("c_pre"))
      one.select(col("t_pre"), col("t_post"), col("c_pre"), col("c_post"),
        ((col("t_post") - col("t_pre")) - (col("c_post") - col("c_pre")))
          .as("did"))
    }),

    // Event debounce (round 10): collapse bursts — per (user, type),
    // events chained by ≤ 5s inter-event gaps form ONE burst, and only
    // the burst's first event is kept (the telemetry dedup every event
    // pipeline runs before counting anything). The chain rule is the
    // session_window gap rule, so kept = one event per 5s-gap session:
    // one lag window marks burst starts, one aggregate counts raw vs
    // kept — a single key-partitioned window, no iteration.
    "q_debounce" -> ((s, dir) => {
      val gapUs = 5000000L
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("us"), col("event_id"))
      val marked = events(s, dir)
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("__prev", lag(col("us"), 1).over(w))
        .withColumn("__new_burst",
          (col("__prev").isNull ||
            col("us") - col("__prev") > gapUs).cast("long"))
      marked
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n_raw"),
          sum(col("__new_burst")).as("n_kept"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // Linear multi-touch attribution (round 10): the fairness complement
    // of q_attribution's last-touch — every view/click in the 24h window
    // before a purchase shares the credit EQUALLY. Exact arithmetic:
    // purchase value fixed at 4 decimals (×10⁴ integer), per-touch credit
    // = (v·10⁶) div n_touches — integer floor both engines replay.
    // Shape: a user-keyed band join (touch in (purchase − 24h, purchase)),
    // per-purchase touch count via a window partitioned BY PURCHASE (never
    // a global or per-user-history partition), channel rollup. Purchases
    // with no in-window touch carry no credit and are absent (declared).
    "q_attribution_linear" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        col("event_type"), col("value"), unix_micros(col("ts")).as("us"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          (col("value").cast(DecimalType(18, 4)) * 10000)
            .cast("long").as("v_i"), col("us"))
      val touches = e.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("event_type").as("channel"),
          col("us").as("tus"))
      val j = purchases.join(touches, Seq("user_id"))
        .filter(col("tus") < col("us") &&
          col("us") - col("tus") <= FunnelWindowUs)
      val w = Window.partitionBy(col("p_id"))
      j.withColumn("__n", count(lit(1)).over(w))
        .select(col("channel"),
          expr("(v_i * 1000000) div __n").as("credit"))
        .groupBy(col("channel"))
        // emit the credit total div 10⁶ — back in v_i (10⁻⁴-dollar)
        // units: the raw micro-extended sum grows ∝ n past 2⁵³ near
        // sf0.3 (r14 sf0.1 headroom sweep); exact trunc div both engines
        .agg(count(lit(1)).as("n_touches"),
          expr("""CAST(SUM(CAST(credit AS DECIMAL(38,0))) div 1000000
                 AS BIGINT)""").as("credit_sum_e6"))
        .orderBy(col("channel"))
    }),

    // Interval concurrency (round 10): peak simultaneous active users per
    // day — the classical sweep-line over interval boundaries, fully
    // distributed because the day partitions the sweep. Each (user, day)
    // activity interval [first, last] emits a +1 start and a −1 end
    // boundary; running sum ordered (t, starts-before-ends, user) makes
    // touching intervals count as concurrent and the order within ties
    // irrelevant to the max. One grouped min/max pass + one day-keyed
    // window — never a global sort.
    "q_concurrency" -> ((s, dir) => {
      val iv = events(s, dir)
        .select(col("user_id"),
          expr(s"unix_micros(ts) div $DayUs").as("d"),
          unix_micros(col("ts")).as("us"))
        .groupBy(col("user_id"), col("d"))
        .agg(min(col("us")).as("s"), max(col("us")).as("e"))
      val bounds = iv.select(col("d"), col("s").as("t"),
          lit(1L).as("delta"), col("user_id"))
        .unionByName(iv.select(col("d"), col("e").as("t"),
          lit(-1L).as("delta"), col("user_id")))
      val w = Window.partitionBy(col("d"))
        .orderBy(col("t"), col("delta").desc, col("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bounds.withColumn("run", sum(col("delta")).over(w))
        .groupBy(col("d"))
        .agg(max(col("run")).as("max_concurrent"),
          count(lit(1)).as("n_boundaries"))
        .orderBy(col("d"))
    }),

    // Day-of-week seasonal adjustment (round 10): the deseasonalization
    // every ops dashboard needs before an anomaly screen — daily revenue
    // totals, the day-of-week baseline (mean of that weekday's totals),
    // and the residual. Exactness: totals are decimal-routed sums, the
    // baseline is the davg quotient of those exact totals, and the
    // residual subtracts two bit-identical doubles — so all three
    // columns hash-match cross-engine with zero float drift. One daily
    // aggregate + one 7-row broadcast join.
    "q_seasonal_adjust" -> ((s, dir) => {
      val daily = events(s, dir)
        .select(expr(s"unix_micros(ts) div $DayUs").as("d"), col("value"))
        .groupBy(col("d"))
        .agg(Parity.dsum(col("value")).as("total"))
        .withColumn("dow", pmod(col("d"), lit(7)))
      val dowMean = daily.groupBy(col("dow"))
        .agg(Parity.davg(col("total")).as("dow_mean"))
      daily.join(broadcast(dowMean), Seq("dow"))
        .select(col("d"), col("dow"), col("total"), col("dow_mean"),
          (col("total") - col("dow_mean")).as("resid"))
        .orderBy(col("d"))
    })
  )

  override def oracle: Map[String, String] = Map(
    // exactDisc rank = ceil(n·p); value at that rank is tie-invariant
    "q_time_to_convert" -> {
      val variant = graft.functions.TextFunctions
        .sqlHash32("'ab:' || CAST(user_id AS VARCHAR)")
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
         |  FROM events),
         |v AS (SELECT user_id, MIN(us) AS t_view FROM e
         |  WHERE event_type = 'view' GROUP BY 1),
         |p AS (SELECT e.user_id, MIN(e.us) AS t_buy
         |  FROM e JOIN v ON v.user_id = e.user_id
         |  WHERE e.event_type = 'purchase' AND e.us > v.t_view
         |    AND e.us <= v.t_view + $FunnelWindowUs
         |  GROUP BY 1),
         |d AS (SELECT $variant % 2 AS variant,
         |    (t_buy - t_view) // 1000000 AS secs
         |  FROM p JOIN v USING (user_id)),
         |r AS (SELECT variant, secs,
         |    ROW_NUMBER() OVER (PARTITION BY variant ORDER BY secs) AS rn,
         |    COUNT(*) OVER (PARTITION BY variant) AS n FROM d)
         |SELECT variant, MAX(n) AS n_converted,
         |  MAX(CASE WHEN rn = (n + 1) // 2 THEN secs END) AS p50_s,
         |  MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN secs END) AS p90_s
         |FROM r GROUP BY variant ORDER BY variant""".stripMargin
    },

    "q_twap" ->
      """WITH e AS (SELECT user_id, value, epoch_us(ts) AS us,
        |    LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS nxt
        |  FROM events),
        |h AS (SELECT user_id, value, nxt - us AS dt FROM e
        |  WHERE nxt IS NOT NULL)
        |SELECT user_id, COUNT(*) AS n_holds,
        |  CASE WHEN CAST(SUM(dt) AS BIGINT) > 0 THEN
        |    round(CAST(CAST(SUM(CAST(value * dt AS DECIMAL(38,6)))
        |        AS VARCHAR) AS DOUBLE)
        |      / CAST(CAST(SUM(dt) AS BIGINT) AS DOUBLE), 6) END AS twap
        |FROM h GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_sketch_rollup" ->
      s"""SELECT event_type,
         |  (epoch_us(ts) // $DayUs) // 7 AS wk,
         |  COUNT(DISTINCT user_id) AS exact_users, true AS merge_ok
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the naive pair-expansion form of the same as-of semantics: rank
    // all qualifying touches per purchase, keep rank 1 — fine at gate
    // scale, the thing the engine's sort-merge shape avoids at 100 TB
    "q_attribution" ->
      s"""WITH ev AS (SELECT user_id, event_id, event_type, value,
         |    epoch_us(ts) AS us FROM events),
         |p AS (SELECT user_id, event_id, value, us FROM ev
         |  WHERE event_type = 'purchase'),
         |t AS (SELECT user_id, event_id AS touch_id,
         |    event_type AS touch_type, us AS touch_us FROM ev
         |  WHERE event_type IN ('view', 'click')),
         |j AS (SELECT p.event_id, p.value, p.us, t.touch_type, t.touch_us,
         |    ROW_NUMBER() OVER (PARTITION BY p.event_id
         |      ORDER BY t.touch_us DESC, t.touch_id DESC) AS rn
         |  FROM p LEFT JOIN t
         |    ON t.user_id = p.user_id AND t.touch_us <= p.us)
         |SELECT CASE WHEN touch_us IS NOT NULL
         |    AND us - touch_us <= $FunnelWindowUs
         |    THEN touch_type ELSE 'none' END AS channel,
         |  COUNT(*) AS n_purchases, ${Parity.sqlDsum("value")} AS revenue
         |FROM j WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_cdc_apply" ->
      """WITH c AS (SELECT user_id, event_id, value, epoch_us(ts) AS us,
        |    CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op
        |  FROM events),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY us DESC, event_id DESC) AS rn FROM c)
        |SELECT user_id, event_id AS last_event_id, us AS last_us, value
        |FROM r WHERE rn = 1 AND op = 'U' ORDER BY user_id""".stripMargin,

    "q_cohort_retention" ->
      s"""WITH f AS (SELECT user_id,
         |             MIN(epoch_us(ts)) // $DayUs AS cohort_d
         |           FROM events GROUP BY 1),
         |mn AS (SELECT MIN(cohort_d) AS min_d FROM f),
         |a AS (SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS d
         |      FROM events)
         |SELECT CAST(f.cohort_d - (SELECT min_d FROM mn) AS BIGINT)
         |    AS cohort_day,
         |  CAST(a.d - f.cohort_d AS BIGINT) AS day_offset,
         |  COUNT(DISTINCT a.user_id) AS n_users
         |FROM a JOIN f USING (user_id)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_funnel" ->
      s"""WITH v AS (SELECT user_id, MIN(epoch_us(ts)) AS t_view
         |           FROM events WHERE event_type = 'view' GROUP BY 1),
         |c AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
         |      FROM events e JOIN v ON v.user_id = e.user_id
         |      WHERE e.event_type = 'click'
         |        AND epoch_us(e.ts) > v.t_view
         |        AND epoch_us(e.ts) <= v.t_view + $FunnelWindowUs
         |      GROUP BY 1),
         |p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_buy
         |      FROM events e JOIN c ON c.user_id = e.user_id
         |      WHERE e.event_type = 'purchase'
         |        AND epoch_us(e.ts) > c.t_click
         |        AND epoch_us(e.ts) <= c.t_click + $FunnelWindowUs
         |      GROUP BY 1)
         |SELECT (SELECT COUNT(*) FROM v) AS step_view,
         |  (SELECT COUNT(*) FROM c) AS step_click,
         |  (SELECT COUNT(*) FROM p) AS step_purchase,
         |  CAST((1000 * (SELECT COUNT(*) FROM c))
         |    // (SELECT COUNT(*) FROM v) AS BIGINT) AS conv_click_milli,
         |  CAST((1000 * (SELECT COUNT(*) FROM p))
         |    // (SELECT COUNT(*) FROM c) AS BIGINT)
         |    AS conv_purchase_milli""".stripMargin,

    "q_event_transitions" ->
      """WITH s AS (SELECT user_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS prev
        |  FROM events),
        |t AS (SELECT prev, event_type AS next, COUNT(*) AS c
        |      FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev, CAST(SUM(c) AS BIGINT) AS n FROM t GROUP BY 1)
        |SELECT t.prev, t.next, t.c,
        |  CAST((1000 * t.c) // tot.n AS BIGINT) AS p_milli
        |FROM t JOIN tot USING (prev) ORDER BY prev, next""".stripMargin,

    "q_activity_gaps" ->
      s"""WITH d AS (SELECT DISTINCT user_id,
         |             epoch_us(ts) // $DayUs AS day FROM events),
         |g AS (SELECT user_id, day,
         |        day - lag(day) OVER (PARTITION BY user_id ORDER BY day)
         |          AS gap
         |      FROM d)
         |SELECT user_id, COUNT(*) AS active_days,
         |  CAST(MAX(day) - MIN(day) + 1 AS BIGINT) AS span_days,
         |  CAST(COALESCE(MAX(gap) FILTER (WHERE gap > 1) - 1, 0) AS BIGINT)
         |    AS max_gap
         |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_chi2" ->
      s"""WITH c AS (SELECT event_type AS e,
         |    (epoch_us(ts) // $DayUs) % 7 AS d, COUNT(*) AS o
         |  FROM events GROUP BY 1, 2),
         |r AS (SELECT e, CAST(SUM(o) AS HUGEINT) AS ro FROM c GROUP BY 1),
         |k AS (SELECT d, CAST(SUM(o) AS HUGEINT) AS co FROM c GROUP BY 1),
         |n AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM events)
         |SELECT CAST(SUM(
         |    (1000000 * (n.n * c.o - r.ro * k.co)
         |     * (n.n * c.o - r.ro * k.co)) // (n.n * r.ro * k.co))
         |  AS BIGINT) AS chi2_micro,
         |  CAST(COUNT(*) AS BIGINT) AS n_cells
         |FROM c JOIN r USING (e) JOIN k USING (d) CROSS JOIN n"""
        .stripMargin,

    "q_session_paths" ->
      s"""WITH e AS (SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
         |        OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |        >= $SessionGapUs
         |      THEN 1 ELSE 0 END AS brk
         |  FROM events),
         |s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id
         |        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
         |      FROM e),
         |p AS (SELECT user_id, sid,
         |        string_agg(event_type, '>' ORDER BY ts, event_id) AS path
         |      FROM (SELECT *, row_number() OVER (
         |              PARTITION BY user_id, sid
         |              ORDER BY ts, event_id) AS rn FROM s)
         |      WHERE rn <= 3 GROUP BY 1, 2)
         |SELECT path, COUNT(*) AS n FROM p
         |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin,

    "q_spearman" ->
      """WITH rx AS (SELECT event_type AS g, event_id AS tie,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS rx
        |  FROM events WHERE value IS NOT NULL),
        |ry AS (SELECT event_type AS g, event_id AS tie,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY epoch_us(ts), event_id) AS ry
        |  FROM events WHERE value IS NOT NULL),
        |j AS (SELECT rx.g, rx.rx, ry.ry
        |      FROM rx JOIN ry ON rx.g = ry.g AND rx.tie = ry.tie),
        |s AS (SELECT g, CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(rx) AS HUGEINT) AS sx, CAST(SUM(ry) AS HUGEINT) AS sy,
        |    CAST(SUM(rx * ry) AS HUGEINT) AS sxy,
        |    CAST(SUM(rx * rx) AS HUGEINT) AS sxx,
        |    CAST(SUM(ry * ry) AS HUGEINT) AS syy
        |  FROM j GROUP BY 1)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n,
        |  CAST(floor((1000000 * CAST(n * sxy - sx * sy AS DOUBLE))
        |    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |         * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)
        |    AS rho_micro
        |FROM s ORDER BY 1""".stripMargin,

    "q_scd2_build" ->
      """WITH o AS (SELECT user_id, event_type, epoch_us(ts) AS us,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_us
        |  FROM events)
        |SELECT user_id, event_type, us AS valid_from,
        |  COALESCE(next_us, 9223372036854775807) AS valid_to
        |FROM o
        |ORDER BY user_id, valid_from, valid_to, event_type""".stripMargin,

    "q_hourly_peak" ->
      """WITH h AS (SELECT event_type,
        |    (epoch_us(ts) // 3600000000) % 24 AS hour, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT event_type, hour AS peak_hour, n AS peak_n FROM (
        |    SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY n DESC, hour) AS rn
        |    FROM h) WHERE rn = 1)
        |SELECT h.event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
        |  CAST(SUM(n) AS BIGINT) AS total,
        |  MIN(p.peak_hour) AS peak_hour, MIN(p.peak_n) AS peak_n
        |FROM h JOIN p USING (event_type) GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_scd2_asof" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |    epoch_us(ts) AS us FROM events),
        |p AS (SELECT user_id, (MIN(us)+MAX(us))//2 AS probe_us
        |      FROM e GROUP BY 1),
        |scd AS (SELECT user_id, event_type, us AS valid_from,
        |    COALESCE(lead(us) OVER (PARTITION BY user_id
        |        ORDER BY us, event_id), 9223372036854775807) AS valid_to
        |  FROM e)
        |SELECT p.user_id, p.probe_us, s.event_type AS state,
        |  s.valid_from AS since_us
        |FROM p JOIN scd s ON s.user_id = p.user_id
        |  AND s.valid_from <= p.probe_us AND p.probe_us < s.valid_to
        |ORDER BY p.user_id""".stripMargin,

    "q_ses_forecast" ->
      s"""WITH c AS (SELECT event_type, epoch_us(ts) // $DayUs AS day,
         |    COUNT(*) AS n FROM events GROUP BY 1, 2),
         |b AS (SELECT event_type, MIN(day) AS mn, MAX(day) AS mx
         |      FROM c GROUP BY 1),
         |g AS (SELECT b.event_type, b.mn, u.day
         |      FROM b, LATERAL unnest(generate_series(b.mn, b.mx))
         |        AS u(day)),
         |d AS (SELECT g.event_type, g.mn, g.day, COALESCE(c.n, 0) AS n
         |      FROM g LEFT JOIN c
         |        ON c.event_type = g.event_type AND c.day = g.day),
         |l AS (SELECT event_type, mn, day, n,
         |    128*n + 64*lag(n,1,0) OVER w + 32*lag(n,2,0) OVER w
         |    + 16*lag(n,3,0) OVER w + 8*lag(n,4,0) OVER w
         |    + 4*lag(n,5,0) OVER w + 2*lag(n,6,0) OVER w
         |    + lag(n,7,0) OVER w AS ses_num
         |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day))
         |SELECT event_type, CAST(day AS BIGINT) AS day, n,
         |  CAST(ses_num AS BIGINT) AS ses_num,
         |  CAST(ses_num // 256 AS BIGINT) AS smooth
         |FROM l WHERE day >= mn + 7
         |ORDER BY event_type, day""".stripMargin,

    "q_rolling_anomaly" ->
      s"""WITH c AS (SELECT event_type, epoch_us(ts) // $DayUs AS day,
         |    COUNT(*) AS n FROM events GROUP BY 1, 2),
         |b AS (SELECT event_type, MIN(day) AS mn, MAX(day) AS mx
         |      FROM c GROUP BY 1),
         |g AS (SELECT b.event_type, b.mn, u.day
         |      FROM b, LATERAL unnest(generate_series(b.mn, b.mx))
         |        AS u(day)),
         |d AS (SELECT g.event_type, g.mn, g.day, COALESCE(c.n, 0) AS n
         |      FROM g LEFT JOIN c
         |        ON c.event_type = g.event_type AND c.day = g.day),
         |w7 AS (SELECT event_type, mn, day, n,
         |    SUM(n) OVER w AS sum7, SUM(n*n) OVER w AS ss7
         |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day
         |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
         |SELECT event_type, CAST(day AS BIGINT) AS day, n,
         |  CAST(sum7 AS BIGINT) AS sum7, CAST(ss7 AS BIGINT) AS ss7,
         |  CAST((7*n - sum7)*(7*n - sum7) AS BIGINT) AS lhs,
         |  CAST(9*(7*ss7 - sum7*sum7) AS BIGINT) AS rhs,
         |  (7*n - sum7)*(7*n - sum7) > 9*(7*ss7 - sum7*sum7) AS is_anomaly
         |FROM w7 WHERE day >= mn + 7
         |ORDER BY event_type, day""".stripMargin,

    "q_trend_mk" ->
      s"""WITH c AS (SELECT event_type, epoch_us(ts) // $DayUs AS day,
         |    COUNT(*) AS n FROM events GROUP BY 1, 2),
         |b AS (SELECT event_type, MIN(day) AS mn, MAX(day) AS mx
         |      FROM c GROUP BY 1),
         |g AS (SELECT b.event_type, u.day
         |      FROM b, LATERAL unnest(generate_series(b.mn, b.mx))
         |        AS u(day)),
         |d AS (SELECT g.event_type, g.day, COALESCE(c.n, 0) AS n
         |      FROM g LEFT JOIN c
         |        ON c.event_type = g.event_type AND c.day = g.day),
         |p AS (SELECT a.event_type,
         |    CASE WHEN b.n > a.n THEN 1 WHEN b.n < a.n THEN -1
         |      ELSE 0 END AS sgn
         |  FROM d a JOIN d b
         |    ON a.event_type = b.event_type AND a.day < b.day)
         |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(SUM(sgn) AS BIGINT) AS s_stat,
         |  CAST(SUM(CASE WHEN sgn = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_ties
         |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_cusum" ->
      s"""WITH c AS (SELECT event_type, epoch_us(ts) // $DayUs AS day,
         |    COUNT(*) AS n FROM events GROUP BY 1, 2),
         |b AS (SELECT event_type, MIN(day) AS mn, MAX(day) AS mx
         |      FROM c GROUP BY 1),
         |g AS (SELECT b.event_type, u.day
         |      FROM b, LATERAL unnest(generate_series(b.mn, b.mx))
         |        AS u(day)),
         |d AS (SELECT g.event_type, g.day, COALESCE(c.n, 0) AS n
         |      FROM g LEFT JOIN c
         |        ON c.event_type = g.event_type AND c.day = g.day),
         |m AS (SELECT event_type, SUM(n) AS tot, COUNT(*) AS nd
         |      FROM d GROUP BY 1),
         |s AS (SELECT d.event_type, d.day, d.n,
         |    (1000 * m.tot) // m.nd AS k_milli,
         |    SUM(1000 * d.n - (1000 * m.tot) // m.nd) OVER (
         |      PARTITION BY d.event_type ORDER BY d.day
         |      ROWS UNBOUNDED PRECEDING) AS ps
         |  FROM d JOIN m USING (event_type)),
         |cu AS (SELECT event_type, day, n, k_milli,
         |    ps - MIN(ps) OVER (PARTITION BY event_type ORDER BY day
         |      ROWS UNBOUNDED PRECEDING) AS cusum_milli
         |  FROM s)
         |SELECT event_type, CAST(day AS BIGINT) AS day, n,
         |  CAST(cusum_milli AS BIGINT) AS cusum_milli,
         |  cusum_milli > k_milli // 2 AS drifted
         |FROM cu ORDER BY event_type, day""".stripMargin,

    "q_rolling_slope" ->
      s"""WITH c AS (SELECT event_type, epoch_us(ts) // $DayUs AS day,
         |    COUNT(*) AS n FROM events GROUP BY 1, 2),
         |b AS (SELECT event_type, MIN(day) AS mn, MAX(day) AS mx
         |      FROM c GROUP BY 1),
         |g AS (SELECT b.event_type, b.mn, u.day
         |      FROM b, LATERAL unnest(generate_series(b.mn, b.mx))
         |        AS u(day)),
         |d AS (SELECT g.event_type, g.mn, g.day, g.day - g.mn AS x,
         |             COALESCE(c.n, 0) AS n
         |      FROM g LEFT JOIN c
         |        ON c.event_type = g.event_type AND c.day = g.day),
         |w AS (SELECT event_type, mn, day, x, n,
         |    CAST(SUM(x) OVER s AS BIGINT) AS sx,
         |    CAST(SUM(n) OVER s AS BIGINT) AS sy,
         |    CAST(SUM(x*n) OVER s AS BIGINT) AS sxy,
         |    CAST(SUM(x*x) OVER s AS BIGINT) AS sxx
         |  FROM d WINDOW s AS (PARTITION BY event_type ORDER BY day
         |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
         |SELECT event_type, CAST(day AS BIGINT) AS day, n,
         |  CAST(7*sxy - sx*sy AS BIGINT) AS num,
         |  CAST(7*sxx - sx*sx AS BIGINT) AS den,
         |  CAST(7*sxy - sx*sy AS DOUBLE) / CAST(7*sxx - sx*sx AS DOUBLE)
         |    AS slope
         |FROM w WHERE day >= mn + 6
         |ORDER BY event_type, day""".stripMargin,

    // Range-join formulation of the same exact window distinct.
    "q_rolling_wau" ->
      s"""WITH du AS (SELECT DISTINCT user_id, epoch_us(ts) // $DayUs AS d
         |            FROM events),
         |b AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM du),
         |days AS (SELECT u.day FROM b,
         |         LATERAL unnest(generate_series(b.mn + 6, b.mx))
         |           AS u(day)),
         |dau AS (SELECT d AS day, CAST(COUNT(*) AS BIGINT) AS dau
         |        FROM du GROUP BY 1),
         |wau AS (SELECT w.day,
         |    CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS wau
         |  FROM days w JOIN du ON du.d BETWEEN w.day - 6 AND w.day
         |  GROUP BY 1)
         |SELECT CAST(w.day AS BIGINT) AS day,
         |  COALESCE(dau.dau, 0) AS dau, w.wau,
         |  CAST(COALESCE(dau.dau, 0) AS DOUBLE) / CAST(w.wau AS DOUBLE)
         |    AS stickiness
         |FROM wau w LEFT JOIN dau ON dau.day = w.day
         |ORDER BY day""".stripMargin,

    // HUGEINT products guard the e² sums far past 64-bit before the
    // BIGINT render (the Spark side's longs hold to ~3e9 events/day).
    "q_autocorr" ->
      s"""WITH c AS (SELECT event_type, epoch_us(ts) // $DayUs AS day,
         |    COUNT(*) AS x FROM events GROUP BY 1, 2),
         |b AS (SELECT event_type, MIN(day) AS mn, MAX(day) AS mx
         |      FROM c GROUP BY 1),
         |g AS (SELECT b.event_type, u.day FROM b,
         |      LATERAL unnest(generate_series(b.mn, b.mx)) AS u(day)),
         |d AS (SELECT g.event_type, g.day, COALESCE(c.x, 0) AS x
         |      FROM g LEFT JOIN c
         |        ON c.event_type = g.event_type AND c.day = g.day),
         |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |             CAST(SUM(x) AS BIGINT) AS s FROM d GROUP BY 1),
         |dv AS (SELECT d.event_type, d.day,
         |    CAST(m.n * d.x - m.s AS HUGEINT) AS e,
         |    CAST(LEAD(m.n * d.x - m.s, 1) OVER w AS HUGEINT) AS e1,
         |    CAST(LEAD(m.n * d.x - m.s, 7) OVER w AS HUGEINT) AS e7
         |  FROM d JOIN m USING (event_type)
         |  WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day)),
         |agg AS (SELECT event_type,
         |    CAST(SUM(e*e) AS BIGINT) AS den,
         |    CAST(SUM(CASE WHEN e1 IS NOT NULL THEN e*e1 ELSE 0 END)
         |      AS BIGINT) AS num1,
         |    CAST(SUM(CASE WHEN e7 IS NOT NULL THEN e*e7 ELSE 0 END)
         |      AS BIGINT) AS num7
         |  FROM dv GROUP BY 1)
         |SELECT event_type, den, num1, num7,
         |  CAST(num1 AS DOUBLE)/CAST(den AS DOUBLE) AS acf1,
         |  CAST(num7 AS DOUBLE)/CAST(den AS DOUBLE) AS acf7
         |FROM agg ORDER BY event_type""".stripMargin,

    "q_cohort_ltv" ->
      s"""WITH f AS (SELECT user_id,
         |             MIN(epoch_us(ts)) // $DayUs AS cohort_d
         |           FROM events GROUP BY 1),
         |mn AS (SELECT MIN(cohort_d) AS m FROM f),
         |r AS (SELECT CAST(f.cohort_d - (SELECT m FROM mn) AS BIGINT)
         |        AS cohort_day,
         |      CAST((epoch_us(e.ts) // $DayUs) - f.cohort_d AS BIGINT)
         |        AS day_offset,
         |      SUM(CAST(e.value AS DECIMAL(18,4))) AS rev
         |      FROM events e JOIN f USING (user_id) GROUP BY 1, 2)
         |SELECT cohort_day, day_offset,
         |  CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS revenue,
         |  CAST(CAST(SUM(rev) OVER (PARTITION BY cohort_day
         |    ORDER BY day_offset ROWS UNBOUNDED PRECEDING) AS VARCHAR)
         |    AS DOUBLE) AS cum_revenue
         |FROM r ORDER BY cohort_day, day_offset""".stripMargin,

    "q_rfm" ->
      s"""WITH d AS (SELECT user_id, epoch_us(ts) // $DayUs AS day, value
         |           FROM events),
         |mx AS (SELECT MAX(day) AS mxd FROM d),
         |u AS (SELECT user_id,
         |        CAST((SELECT mxd FROM mx) - MAX(day) AS BIGINT)
         |          AS recency,
         |        CAST(COUNT(*) AS BIGINT) AS frequency,
         |        SUM(CAST(value AS DECIMAL(18,4))) AS monetary
         |      FROM d GROUP BY 1),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM u),
         |rr AS (SELECT user_id,
         |    ((row_number() OVER (ORDER BY recency, user_id) - 1) * 5)
         |      // (SELECT n FROM n) + 1 AS r_q FROM u),
         |fr AS (SELECT user_id,
         |    ((row_number() OVER (ORDER BY frequency, user_id) - 1) * 5)
         |      // (SELECT n FROM n) + 1 AS f_q FROM u),
         |mr AS (SELECT user_id,
         |    ((row_number() OVER (ORDER BY monetary, user_id) - 1) * 5)
         |      // (SELECT n FROM n) + 1 AS m_q FROM u)
         |SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
         |  CAST(m_q AS BIGINT) AS m_q, CAST(COUNT(*) AS BIGINT) AS n_users
         |FROM rr JOIN fr USING (user_id) JOIN mr USING (user_id)
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_segment_overlap" ->
      """WITH m AS (SELECT DISTINCT user_id, event_type AS seg FROM events),
        |sz AS (SELECT seg, COUNT(*) AS n FROM m GROUP BY 1),
        |iv AS (SELECT a.seg AS seg_a, b.seg AS seg_b, COUNT(*) AS n_both
        |       FROM m a JOIN m b
        |         ON a.user_id = b.user_id AND a.seg < b.seg
        |       GROUP BY 1, 2)
        |SELECT seg_a, seg_b, sa.n AS n_a, sb.n AS n_b, n_both,
        |  (1000000 * n_both) // (sa.n + sb.n - n_both) AS jaccard_micro
        |FROM iv JOIN sz sa ON sa.seg = iv.seg_a
        |        JOIN sz sb ON sb.seg = iv.seg_b
        |ORDER BY seg_a, seg_b""".stripMargin,

    "q_diff_in_diff" -> {
      def m(t: String, p: String) =
        s"""(SELECT ${Parity.sqlDavg("value")} FROM events
           | WHERE (user_id % 2 = 1) = $t
           |   AND (ts >= TIMESTAMP '2024-01-16') = $p)""".stripMargin
      s"""SELECT
         |  ${m("true", "false")} AS t_pre,
         |  ${m("true", "true")} AS t_post,
         |  ${m("false", "false")} AS c_pre,
         |  ${m("false", "true")} AS c_post,
         |  (${m("true", "true")} - ${m("true", "false")})
         |    - (${m("false", "true")} - ${m("false", "false")}) AS did""".stripMargin
    },

    "q_debounce" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |    epoch_us(ts) AS us FROM events),
        |g AS (SELECT user_id, event_type,
        |    us - lag(us) OVER (PARTITION BY user_id, event_type
        |                       ORDER BY us, event_id) AS gap
        |  FROM e)
        |SELECT user_id, event_type, COUNT(*) AS n_raw,
        |  CAST(SUM(CASE WHEN gap IS NULL OR gap > 5000000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_attribution_linear" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, value,
         |    epoch_us(ts) AS us FROM events),
         |p AS (SELECT user_id, event_id AS p_id,
         |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v_i,
         |    us FROM e WHERE event_type = 'purchase'),
         |t AS (SELECT user_id, event_type AS channel, us AS tus
         |  FROM e WHERE event_type IN ('view', 'click')),
         |j AS (SELECT p.p_id, p.v_i, t.channel
         |  FROM p JOIN t ON p.user_id = t.user_id
         |    AND t.tus < p.us AND p.us - t.tus <= $FunnelWindowUs),
         |n AS (SELECT p_id, COUNT(*) AS n FROM j GROUP BY 1)
         |SELECT channel, COUNT(*) AS n_touches,
         |  CAST(SUM((j.v_i * 1000000) // n.n) // CAST(1000000 AS HUGEINT)
         |    AS BIGINT) AS credit_sum_e6
         |FROM j JOIN n USING (p_id) GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_concurrency" ->
      s"""WITH iv AS (SELECT user_id,
         |    epoch_us(ts) // $DayUs AS d,
         |    MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) AS e
         |  FROM events GROUP BY user_id, epoch_us(ts) // $DayUs),
         |b AS (SELECT d, s AS t, 1 AS delta, user_id FROM iv
         |      UNION ALL SELECT d, e, -1, user_id FROM iv),
         |r AS (SELECT d, SUM(delta) OVER (PARTITION BY d
         |        ORDER BY t, delta DESC, user_id
         |        ROWS UNBOUNDED PRECEDING) AS run FROM b)
         |SELECT d, CAST(MAX(run) AS BIGINT) AS max_concurrent,
         |  COUNT(*) AS n_boundaries
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_seasonal_adjust" ->
      s"""WITH daily AS (SELECT epoch_us(ts) // $DayUs AS d,
         |    ${Parity.sqlDsum("value")} AS total
         |  FROM events GROUP BY 1),
         |dm AS (SELECT d % 7 AS dow, ${Parity.sqlDavg("total")} AS dow_mean
         |       FROM daily GROUP BY 1)
         |SELECT d, d % 7 AS dow, total, dow_mean,
         |  total - dow_mean AS resid
         |FROM daily JOIN dm ON dm.dow = d % 7 ORDER BY d""".stripMargin
  )
}
