package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Round-11 third tranche: inventory and nonparametric statistics —
  * ABC (Pareto) classification, the Mann-Whitney U rank-sum test, and
  * Holt linear-trend smoothing with forecasts.
  *
  * Same determinism discipline as [[StatOps]]/[[StatOps2]]: exact
  * integer cells, DECIMAL(38,0) subtract-remainder division for
  * rationals, ln/sqrt only in closing formulas over exact cells
  * (6 dp). Division probe recorded here: DuckDB's `//` on
  * BIGINT/HUGEINT TRUNCATES toward zero exactly like Spark's `div`
  * (-7//2 = -3) — only its DECIMAL `//` misbehaves (SURVEY §2.15) —
  * so signed recursions (the Holt trend) need no floor emulation.
  */
object StatOps3 extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  private val DayUs = 86400L * 1000000L

  override def defs: Map[String, Q] = Map[String, Q](

    // ABC (Pareto) inventory classification of parts by revenue:
    // A = parts covering the top 80% of cumulative revenue (descending),
    // B = next 15%, C = the tail. Cumulative revenue runs DESC through
    // the bucketed-window discipline (range-adaptive buckets, operators/
    // RangeBuckets → partitioned cumsums + a tiny bucket-offset merge,
    // never a global sort); a
    // part's class comes from its INCLUSIVE descending cumulative share,
    // ties on revenue broken by the cumsum's (revenue DESC, partkey)
    // order. Output: per-class part count, revenue, and exact share.
    "q_abc_class" -> ((s, dir) => {
      // adaptive bucket width (round 12): range-derived, so the offset
      // merge stays O(256²) even when revenue totals span more orders of
      // magnitude than the old fixed div-2²² width anticipated
      // round 18: lazy-checkpoint the per-part revenue census — the
      // window/bucket-total/grand-total fan-out re-executed the LINEITEM
      // scan 10× at sf0.01 (ScanCount; AQE re-planning defeats exchange
      // reuse). One scan materializes the |parts|-row census.
      val rev = graft.operators.RangeBuckets.withRangeBucket(
        t(s, dir, "lineitem")
          .groupBy(col("l_partkey").as("pk"))
          .agg(sum((col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast("long")).as("cents"))
          .localCheckpoint(eager = false),
        "cents")
      val w = Window.partitionBy(col("bucket"))
        .orderBy(col("cents").desc, col("pk"))
      val loc = rev.withColumn("cum", sum(col("cents")).over(w))
      val bt = rev.groupBy(col("bucket")).agg(sum(col("cents")).as("bs"))
      val off = bt.as("a")
        .join(bt.as("o"), col("o.bucket") > col("a.bucket"), "left")
        .groupBy(col("a.bucket").as("bucket"))
        .agg(coalesce(sum(col("o.bs")), lit(0L)).as("offs"))
      val tot = rev.agg(sum(col("cents")).as("stot"))
      // class thresholds and shares stage through DECIMAL(38,0): the
      // cum×100 and cents×10⁶ products overflow BIGINT long before
      // 100 TB revenue totals
      val cumD = (col("offs") + col("cum")).cast(DecimalType(38, 0))
      val stotD = col("stot").cast(DecimalType(38, 0))
      loc.join(broadcast(off), Seq("bucket"))
        .crossJoin(broadcast(tot))
        .select(col("pk"), col("cents"),
          when(cumD * 100 <= stotD * 80, "A")
            .when(cumD * 100 <= stotD * 95, "B")
            .otherwise("C").as("abc"))
        .groupBy(col("abc"))
        .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("cents"))
        .crossJoin(broadcast(tot))
        .select(col("abc"), col("n_parts"), col("cents"),
          expr(
            """CAST((1000000 * CAST(cents AS DECIMAL(38,0))
              |  - (1000000 * CAST(cents AS DECIMAL(38,0))) % stot)
              |  / stot AS BIGINT)""".stripMargin).as("share_ppm"))
        .orderBy(col("abc"))
    }),

    // Mann-Whitney U rank-sum test: urgent orders vs the rest on order
    // value. Midranks with ties stay EXACT by working in doubled units:
    // for each distinct value v, midrank×2 = 2·(count below v) + t(v)
    // + 1, so R₁×2 = Σ n₁(v)·(2·below(v) + t(v) + 1) and U₁×2 =
    // R₁×2 − n₁(n₁+1) are pure integers. The below-counts run through
    // the bucketed-window discipline on the value census. z uses the
    // tie-corrected normal approximation — closing-formula doubles
    // (6 dp) from the exact cells (U₁×2, n₁, n₂, Σ(t³−t)).
    "q_mann_whitney" -> ((s, dir) => {
      val v = t(s, dir, "orders").select(
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("v"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
          .as("g1"))
      // adaptive bucket width (round 12, the q_abc_class note); census
      // lazy-checkpointed (round 18 — its fan-out re-executed the orders
      // scan 6× at sf0.01, the q_abc_class finding)
      val census = graft.operators.RangeBuckets.withRangeBucket(
        v.groupBy(col("v"))
          .agg(sum(col("g1")).as("n1v"), count(lit(1)).as("tv"))
          .localCheckpoint(eager = false),
        "v")
      val w = Window.partitionBy(col("bucket")).orderBy(col("v"))
      val loc = census.withColumn("cumt", sum(col("tv")).over(w))
      val bt = census.groupBy(col("bucket")).agg(sum(col("tv")).as("bn"))
      val off = bt.as("a")
        .join(bt.as("o"), col("o.bucket") < col("a.bucket"), "left")
        .groupBy(col("a.bucket").as("bucket"))
        .agg(coalesce(sum(col("o.bn")), lit(0L)).as("offn"))
      loc.join(broadcast(off), Seq("bucket"))
        .select(col("n1v"), col("tv"),
          (col("offn") + col("cumt") - col("tv")).as("below"))
        .agg(
          sum(col("n1v")).as("n1"),
          sum(col("tv") - col("n1v")).as("n2"),
          // midrank products stage through DECIMAL(38,0): R₁×2 is
          // O(n₁·N) and exceeds BIGINT at corpus scale
          sum(col("n1v").cast(DecimalType(38, 0))
            * (col("below") * 2 + col("tv") + 1)).cast("long")
            .as("r1x2"),
          sum((col("tv").cast(DecimalType(38, 0)) * col("tv") * col("tv")
            - col("tv")).cast(DecimalType(38, 0))).cast("long")
            .as("ties"))
        .select(col("n1"), col("n2"),
          (col("r1x2") - col("n1") * (col("n1") + 1)).as("u1x2"),
          col("ties"))
        .select(col("n1"), col("n2"), col("u1x2"), col("ties"),
          round(expr(
            """(CAST(u1x2 AS DOUBLE) / 2.0
              |  - CAST(n1 AS DOUBLE) * n2 / 2.0)
              |/ sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
              |  * ((CAST(n1 AS DOUBLE) + n2 + 1.0)
              |     - CAST(ties AS DOUBLE)
              |       / ((CAST(n1 AS DOUBLE) + n2)
              |          * (CAST(n1 AS DOUBLE) + n2 - 1.0))))"""
              .stripMargin), 6).as("z"))
    }),

    // Holt linear-trend smoothing of daily revenue (α=0.3, β=0.1) with
    // a 7-day forecast. The zero-filled daily series reduces to ONE
    // bounded row (span-sized cell array, the q_survival_km collect
    // pattern) and the level/trend recursion runs as an integer
    // milli-cent left fold — each step's smoothing divisions truncate
    // toward zero, which Spark's `div` and DuckDB's BIGINT `//` agree
    // on EVEN FOR the negative trend terms (probed: -7//2 = -3 in
    // DuckDB — trunc, not floor; only its DECIMAL `//` differs, per the
    // §2.15 SURVEY note). The `transform(array(·), ln -> …)` wrapper is
    // a let-binding: the new level feeds the trend update without
    // recomputing it. Init: l₀ = y₀, b₀ = 0 (declared). Output: h=0
    // carries the final level, h=1..7 the linear forecasts
    // level + h·trend.
    "q_holt_linear" -> ((s, dir) => {
      val d = t(s, dir, "lineitem")
        .select(expr(
          s"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div $DayUs")
          .as("day"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("cents"))
        .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
      // span guard (round 12, the Parity.guardedVariantId discipline):
      // the collected daily spine is calendar-bounded, not corpus-bounded
      // — but a corrupt shipdate (year 9999) would silently balloon the
      // single-row array and its fold; guard the 1-row bounds aggregate
      // so over-span input fails LOUDLY instead
      val b = d.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
        .select(col("mn"),
          Parity.guardedSpanValue(col("mx"),
            col("mx") - col("mn") + 1, Parity.MaxSpanCells,
            "q_holt_linear daily spine").as("mx"))
      val z = b.select(explode(expr("sequence(mn, mx)")).as("day"))
        .join(d, Seq("day"), "left")
        .select(col("day"), coalesce(col("cents"), lit(0L)).as("cents"))
      z.agg(collect_list(struct(col("day"), col("cents"))).as("arr"))
        .select(expr(
          """aggregate(
            |  slice(array_sort(arr), 2, size(arr) - 1),
            |  named_struct('l', array_sort(arr)[0].cents * 1000L,
            |    'b', 0L),
            |  (acc, x) -> element_at(transform(
            |    array((3 * x.cents * 1000L + 7 * (acc.l + acc.b))
            |          div 10),
            |    ln -> named_struct('l', ln,
            |      'b', ((ln - acc.l) + 9 * acc.b) div 10)),
            |    1))""".stripMargin).as("st"))
        .select(col("st.l").as("level_milli"),
          col("st.b").as("trend_milli"))
        .select(explode(expr("sequence(0L, 7L)")).as("h"),
          col("level_milli"), col("trend_milli"))
        .select(col("h"),
          (col("level_milli") + col("h") * col("trend_milli"))
            .as("forecast_milli"))
        .orderBy(col("h"))
    })
  )

  override def oracle: Map[String, String] = Map(

    "q_abc_class" ->
      """WITH rev AS (
        |  SELECT l_partkey AS pk,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS cents
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT SUM(CAST(cents AS HUGEINT)) AS stot FROM rev),
        |c AS (
        |  SELECT pk, cents,
        |    SUM(CAST(cents AS HUGEINT)) OVER (
        |      ORDER BY cents DESC, pk ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM rev),
        |cls AS (
        |  SELECT pk, cents,
        |    CASE WHEN cum * 100 <= tot.stot * 80 THEN 'A'
        |         WHEN cum * 100 <= tot.stot * 95 THEN 'B'
        |         ELSE 'C' END AS abc
        |  FROM c, tot)
        |SELECT abc, COUNT(*) AS n_parts,
        |  CAST(SUM(cents) AS BIGINT) AS cents,
        |  CAST((1000000 * SUM(CAST(cents AS HUGEINT))) // tot.stot
        |    AS BIGINT) AS share_ppm
        |FROM cls, tot GROUP BY abc, tot.stot ORDER BY abc""".stripMargin,

    "q_mann_whitney" ->
      """WITH v AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT) AS v,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
        |      AS g1
        |  FROM orders),
        |census AS (
        |  SELECT v, SUM(g1) AS n1v, COUNT(*) AS tv
        |  FROM v GROUP BY 1),
        |cum AS (
        |  SELECT v, n1v, tv,
        |    COALESCE(SUM(tv) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS below
        |  FROM census),
        |cells AS (
        |  SELECT CAST(SUM(n1v) AS BIGINT) AS n1,
        |    CAST(SUM(tv - n1v) AS BIGINT) AS n2,
        |    CAST(SUM(n1v * (2 * below + tv + 1))
        |      - SUM(n1v) * (SUM(n1v) + 1) AS BIGINT) AS u1x2,
        |    CAST(SUM(CAST(tv AS HUGEINT) * tv * tv - tv) AS BIGINT)
        |      AS ties
        |  FROM cum)
        |SELECT n1, n2, u1x2, ties,
        |  round((CAST(u1x2 AS DOUBLE) / 2.0
        |      - CAST(n1 AS DOUBLE) * n2 / 2.0)
        |    / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
        |      * ((CAST(n1 AS DOUBLE) + n2 + 1.0)
        |         - CAST(ties AS DOUBLE)
        |           / ((CAST(n1 AS DOUBLE) + n2)
        |              * (CAST(n1 AS DOUBLE) + n2 - 1.0)))), 6) AS z
        |FROM cells""".stripMargin,

    "q_holt_linear" ->
      s"""WITH d AS (
         |  SELECT epoch_us(l_shipdate) // $DayUs AS day,
         |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |      AS BIGINT)) AS cents
         |  FROM lineitem GROUP BY 1),
         |b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM d),
         |g AS (SELECT u.day FROM b,
         |      unnest(generate_series(b.mn, b.mx)) AS u(day)),
         |z AS (SELECT g.day, COALESCE(d.cents, 0) AS cents,
         |        ROW_NUMBER() OVER (ORDER BY g.day) AS i
         |      FROM g LEFT JOIN d ON d.day = g.day),
         |n AS (SELECT MAX(i) AS n FROM z),
         |hw AS (
         |  WITH RECURSIVE r AS (
         |    SELECT 1 AS i, cents * 1000 AS l, CAST(0 AS BIGINT) AS b
         |    FROM z WHERE i = 1
         |    UNION ALL
         |    SELECT z.i,
         |      (3 * z.cents * 1000 + 7 * (r.l + r.b)) // 10,
         |      (((3 * z.cents * 1000 + 7 * (r.l + r.b)) // 10) - r.l
         |        + 9 * r.b) // 10
         |    FROM r JOIN z ON z.i = r.i + 1)
         |  SELECT l, b FROM r, n WHERE r.i = n.n)
         |SELECT h, CAST(hw.l + h * hw.b AS BIGINT) AS forecast_milli
         |FROM hw, unnest(generate_series(0, 7)) AS s(h)
         |ORDER BY h""".stripMargin
  )
}
