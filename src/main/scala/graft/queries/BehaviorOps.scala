package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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

  override def defs: Map[String, Q] = Map(
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
    })
  )

  override def oracle: Map[String, String] = Map(
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
         |    AS conv_purchase_milli""".stripMargin
  )
}
