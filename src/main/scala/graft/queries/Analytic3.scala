package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Third analytics tier (SURVEY §2 long tail): bivariate statistics
  * (covariance / regression / correlation), ordered string aggregation,
  * RANGE window frames, correlated EXISTS subqueries, and ANSI
  * try-arithmetic.
  *
  * The bivariate stats are computed from decimal-routed co-moments
  * (Σx, Σy, Σxy, Σx², Σy² — exact, order-independent sums per the Parity
  * posture) with the closing double arithmetic written identically in both
  * engines, so results are bit-identical regardless of partitioning —
  * native `corr`/`covar_samp` accumulate in shuffle order and drift in the
  * last ulps between engines AND between partition counts, which is not
  * reproducible at 100 TB.
  */
object Analytic3 extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  override def defs: Map[String, Q] = Map(
    // Bivariate stats per return flag: quantity vs extended price.
    "q_corr_regr" -> ((s, dir) => {
      val d38 = DecimalType(38, 8)
      val sums = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          // decimal → string → double: a decimal whose unscaled value
          // exceeds 2^53 double-rounds under a direct engine cast (DuckDB
          // converts the int128 then divides by 10^scale — 1 ulp off the
          // correctly-rounded value Spark's BigDecimal path returns).
          // Both engines' string parse IS correctly rounded, so routing
          // the conversion through the exact decimal render is the one
          // sequence that agrees at any magnitude.
          sum(col("l_quantity").cast(DecimalType(18, 4)))
            .cast("string").cast("double").as("sx"),
          sum(col("l_extendedprice").cast(DecimalType(18, 4)))
            .cast("string").cast("double").as("sy"),
          sum((col("l_quantity") * col("l_extendedprice")).cast(d38))
            .cast("string").cast("double").as("sxy"),
          sum((col("l_quantity") * col("l_quantity")).cast(d38))
            .cast("string").cast("double").as("sxx"),
          sum((col("l_extendedprice") * col("l_extendedprice")).cast(d38))
            .cast("string").cast("double").as("syy"))
      val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      sums.select(
        col("l_returnflag"),
        col("n"),
        round((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1), 6)
          .as("covar_samp"),
        round(slope, 6).as("slope"),
        round((col("sy") - slope * col("sx")) / col("n"), 6).as("intercept"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
            sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
          .as("corr"))
        .orderBy(col("l_returnflag"))
    }),

    // Exact interpolated percentiles (PERCENTILE_CONT semantics) via the
    // DISTRIBUTED sort-based operator (operators/Percentiles): the
    // built-in exact `percentile` buffers every group value in ONE
    // aggregation buffer — fine for QA summaries, a non-starter for
    // billion-row groups. This plan range-partitions the sort instead
    // (same values, same oracle). The approx_percentile sketch
    // (q_approx_quantile) remains the cheapest path when an error bound
    // is acceptable (contract-tested in RelationalSpec).
    "q_percentile_cont" -> ((s, dir) =>
      graft.operators.Percentiles.exactInterpolated(
          t(s, dir, "lineitem"),
          col("l_returnflag"), col("l_extendedprice"),
          Seq(0.25, 0.5, 0.75), Seq("p25", "p50", "p75"))
        .select(col("group").as("l_returnflag"),
          round(col("p25"), 6).as("p25"),
          round(col("p50"), 6).as("p50"),
          round(col("p75"), 6).as("p75"))
        .orderBy(col("l_returnflag"))),

    // Approximate percentile sketch. The sketch VALUE is engine-specific
    // (can't hash-compare), so the query emits the group size (exact,
    // hash-checked) plus a boolean asserting the sketch tracks the exact
    // interpolated median within 5% — the oracle expects `true`, making
    // sketch drift a gate failure instead of an unchecked row count.
    // The exact reference comes from the DISTRIBUTED sort operator (same
    // as q_percentile_cont), not the built-in `percentile` that buffers
    // every group value in one aggregation buffer.
    "q_approx_quantile" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val approx = li.groupBy(col("l_returnflag"))
        .agg(
          expr("approx_percentile(CAST(l_extendedprice AS DOUBLE), 0.5, 10000)")
            .as("__approx"),
          count(lit(1)).as("n"))
      val exact = graft.operators.Percentiles.exactInterpolated(
          li, col("l_returnflag"), col("l_extendedprice").cast("double"),
          Seq(0.5), Seq("__exact"))
        .select(col("group").as("l_returnflag"), col("__exact"))
      approx.join(exact, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n"),
          (abs(col("__approx") - col("__exact")) <=
            abs(col("__exact")) * 0.05).as("approx_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // Ordered string aggregation: nation names per region, sorted — the
    // deterministic form of LISTAGG/STRING_AGG (collect order is
    // partition-dependent, so the sort is the portability requirement).
    "q_string_agg" -> ((s, dir) =>
      t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(
          array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n"))
        .orderBy(col("n_regionkey"))),

    // RANGE window frame on a numeric ordering key: all orders whose
    // custkey is within 100 below the current row's share one frame
    // (value-range semantics, not row counts — the frame is deterministic
    // because the decimal sum is order-independent within it).
    // Partitioning only by o_orderstatus would run the whole table in 3
    // tasks at any cluster size — ParallelRange buckets the ordering key
    // and replicates the 100-wide fringe, same frames, ~45 tasks.
    "q_window_range" -> ((s, dir) =>
      graft.operators.ParallelRange.trailing(
          t(s, dir, "orders")
            .select(col("o_orderkey"), col("o_orderstatus"), col("o_custkey"),
              col("o_totalprice")),
          Seq(col("o_orderstatus")), col("o_custkey"),
          lookback = 100, bucketWidth = 1000)(
          w => sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w)
            .cast("double"), "range_sum")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_custkey"),
          col("range_sum"))
        .orderBy(col("o_orderkey"))),

    // Correlated EXISTS / NOT EXISTS through the SQL subquery machinery
    // (Catalyst rewrites to semi/anti joins — asserted in PlanSpec; the
    // q_subquery sibling covers scalar + IN subqueries).
    "q_exists_subquery" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("ex_customer")
      t(s, dir, "orders").createOrReplaceTempView("ex_orders")
      s.sql("""SELECT c_custkey, c_name FROM ex_customer c
              |WHERE EXISTS (SELECT 1 FROM ex_orders o
              |              WHERE o.o_custkey = c.c_custkey
              |                AND o.o_orderpriority = '1-URGENT')
              |  AND NOT EXISTS (SELECT 1 FROM ex_orders o
              |                  WHERE o.o_custkey = c.c_custkey
              |                    AND o.o_orderstatus = 'F')
              |ORDER BY c_custkey""".stripMargin)
    }),

    // Per-group top-k through the bounded-buffer Aggregator (map-side
    // prune to k before the shuffle — the scale form; the window
    // row_number form is q_topk_per_group, and both share this oracle
    // shape).
    "q_topk_agg" -> ((s, dir) =>
      graft.operators.TopK.perGroup(
          t(s, dir, "lineitem").withColumn("rid",
            col("l_orderkey") * 10 + col("l_linenumber")),
          Seq("l_returnflag"), col("l_extendedprice"), col("rid"), k = 5)
        .orderBy(col("l_returnflag"), col("rank"))),

    // Correlated LATERAL subquery: per-nation top-2 customers — the
    // "for each row, run this parameterized subquery" shape the reference
    // executes as one SQL round-trip per area_id (FGU:149-163), here a
    // single lateral join Catalyst rewrites into a window-style plan.
    "q_lateral" -> ((s, dir) => {
      t(s, dir, "nation").createOrReplaceTempView("lat_nation")
      t(s, dir, "customer").createOrReplaceTempView("lat_customer")
      s.sql("""SELECT n.n_name, c.c_name, c.c_acctbal
              |FROM lat_nation n,
              |LATERAL (SELECT c_name, c_acctbal FROM lat_customer
              |         WHERE c_nationkey = n.n_nationkey
              |         ORDER BY c_acctbal DESC, c_name LIMIT 2) c
              |ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""".stripMargin)
    }),

    // UNPIVOT (wide → long melt): four measure columns to (measure, value)
    // rows, the standard metrics-table normalization.
    "q_unpivot" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("up_lineitem")
      s.sql("""SELECT l_orderkey, l_linenumber, measure, value FROM (
              |  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
              |         l_discount, l_tax
              |  FROM up_lineitem WHERE l_orderkey < 1000)
              |UNPIVOT (value FOR measure IN
              |  (l_quantity, l_extendedprice, l_discount, l_tax))
              |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin)
    }),

    // ANSI try-arithmetic: errors become nulls instead of killing the job
    // (division by zero, bigint overflow) — the posture a 100 TB pass needs
    // for isolated bad rows.
    "q_try_arith" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 2000)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          try_divide(col("l_partkey"), col("l_linenumber") - 1).as("div_maybe"),
          try_add(col("l_partkey"), lit(9223372036854775800L)).as("add_maybe"),
          try_multiply(col("l_suppkey"), lit(4611686018427387904L)).as("mul_maybe"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // Equi-width histogram of order totals: the profiling primitive. The
    // bucket id is floor(x / width) — ONE IEEE double division (correctly
    // rounded in every engine) then an exact floor, so bucket assignment
    // is bit-portable; the whole query is a single map-side-combinable
    // aggregation over the scan, no second pass for bounds.
    "q_histogram_orders" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(floor(col("o_totalprice") / 25000.0).as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy(col("bucket"))),

    // Winsorized mean per return flag: clamp at the exact 5th/95th
    // discrete percentiles (actual data values picked at integer-computed
    // ranks — see Percentiles.exactDisc — so the thresholds are
    // bit-portable, unlike interpolated quantiles), then an exact
    // decimal-routed mean of raw vs clamped values. The robust-statistics
    // pass every metrics pipeline runs before averaging a heavy-tailed
    // column; thresholds are a 3-row broadcast.
    "q_winsorize" -> ((s, dir) => {
      // round 15: the 5/95 cut points are a shared StatArtifacts leaf
      // (one rank-frame build per session/corpus for the robust trio)
      val li = graft.operators.StatArtifacts.prices(s, dir)
      val th = graft.operators.StatArtifacts.priceWinsorCuts(s, dir)
      val counts = li.groupBy(col("g")).agg(count(lit(1)).as("n"))
      li.join(broadcast(th), Seq("g")).join(broadcast(counts), Seq("g"))
        .groupBy(col("g"), col("n"), col("lo_t"), col("hi_t"))
        .agg(Parity.davg(col("v")).as("mean_raw"),
          Parity.davg(greatest(least(col("v"), col("hi_t")), col("lo_t")))
            .as("mean_wins"))
        .select(col("g").as("l_returnflag"), col("n"), col("lo_t"),
          col("hi_t"), col("mean_raw"), col("mean_wins"))
        .orderBy(col("l_returnflag"))
    }),

    // TPC-H Q5 shape: local-supplier revenue by nation — the canonical
    // multi-way star join. The fact-fact join (lineitem ⋈ orders) shuffles
    // on the order key with the date filter PUSHED to the orders scan
    // first; nation and region are explicit broadcasts; customer/supplier
    // resolve by Catalyst/AQE size estimate. Revenue is decimal-routed so
    // the sum is order-independent.
    "q_tpch_q5" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer").select(col("c_custkey"),
          col("c_nationkey")), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier").select(col("s_suppkey"),
          col("s_nationkey")), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey") &&
            col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Median absolute deviation per return flag — the robust dispersion
    // partner of q_winsorize: disc-median of the values, then disc-median
    // of absolute deviations from it. Both medians are actual data values
    // picked at integer ranks (bit-portable); the deviation column is one
    // IEEE subtraction, identical in both engines. Two bounded passes,
    // thresholds broadcast between them.
    "q_mad" -> ((s, dir) => {
      // round 15: median and MAD are shared StatArtifacts leaves — this
      // gate and q_robust_outliers previously built the identical pair
      // of rank frames independently
      val med = graft.operators.StatArtifacts.priceMedians(s, dir)
      val mad = graft.operators.StatArtifacts.priceMads(s, dir)
      med.join(mad, Seq("g"))
        .select(col("g").as("l_returnflag"), col("m").as("median"),
          col("mad"))
        .orderBy(col("l_returnflag"))
    }),

    // Robust outlier screen (round 9): the modified z-score — flag rows
    // where |x − median| > 3 · 1.4826 · MAD, the outlier rule that a
    // mean/stddev screen cannot run on heavy-tailed data (the outliers
    // corrupt the very moments that define them; the median/MAD pair is
    // 50%-breakdown robust). Thresholds ride the q_mad machinery
    // (exact-DISC medians over the rank frame, broadcast back); the
    // comparison 1000·|x−m| > 1779·mad keeps the z0·1.4826 constant in
    // integer milli-units so both engines evaluate the identical IEEE
    // product pair. The gate uses z0 = 1.2 (not the classic 3.5): the
    // synthetic prices are uniform, where the modified z tops out near
    // 1.35 — the gate pins the screen's arithmetic, and a cut that
    // selects nothing pins nothing. Output: per-group count + extremes.
    "q_robust_outliers" -> ((s, dir) => {
      // round 15: thresholds from the shared StatArtifacts leaves; only
      // the screening pass itself (dev + filter) touches the corpus here
      val med = graft.operators.StatArtifacts.priceMedians(s, dir)
      val mad = graft.operators.StatArtifacts.priceMads(s, dir)
      val dev = graft.operators.StatArtifacts.prices(s, dir)
        .join(broadcast(med), Seq("g"))
        .select(col("g"), col("v"), col("m"),
          abs(col("v") - col("m")).as("dv"))
      dev.join(broadcast(mad), Seq("g"))
        .filter(col("dv") * 1000.0 > col("mad") * 1779.0)
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n_outliers"),
          min(col("v")).as("min_outlier"), max(col("v")).as("max_outlier"))
        .select(col("g").as("l_returnflag"), col("n_outliers"),
          col("min_outlier"), col("max_outlier"))
        .orderBy(col("l_returnflag"))
    }),

    // Gini concentration coefficient per return flag, from the
    // distributed global-rank frame (Percentiles.globalRanks — no
    // per-group single-partition window). Gini = (2·Σi·xᵢ − (n+1)·Σxᵢ) /
    // (n·Σxᵢ) over ascending ranks i; both sums are exact decimals
    // shifted to integers (scale-4 × 10⁴), the quotient an exact
    // DECIMAL(38,0) floor division in micro-units. Rank-tie invariant:
    // permuting equal values leaves Σi·xᵢ unchanged.
    "q_gini" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
      graft.operators.Percentiles.globalRanks(li, col("g"), col("v"))
        .groupBy(col("group"))
        .agg(count(lit(1)).as("cnt"),
          (sum(col("value").cast(DecimalType(18, 4))) * 10000)
            .cast(DecimalType(38, 0)).as("s0"),
          (sum(col("rank") * col("value").cast(DecimalType(18, 4))) * 10000)
            .cast(DecimalType(38, 0)).as("s1"))
        .select(col("group").as("l_returnflag"),
          expr("""CAST((1000000 * (2 * s1 - (cnt + 1) * s0))
                 div (cnt * s0) AS BIGINT)""").as("gini_micro"))
        .orderBy(col("l_returnflag"))
    }),

    // Equal-frequency (quartile) binning of order totals per priority:
    // thresholds are disc quartiles (actual data values at integer
    // ranks), bucket = 1 + Σ(v > qₖ) so boundary ties land LOW on both
    // engines, and the profile reports each bin's population and range.
    // Thresholds broadcast; the binning itself is a narrow projection.
    "q_equibin" -> ((s, dir) => {
      val v = t(s, dir, "orders")
        .select(col("o_orderpriority").as("g"), col("o_totalprice").as("v"))
      val th = graft.operators.Percentiles.exactDisc(
          v, col("g"), col("v"), Seq((1, 4), (1, 2), (3, 4)),
          Seq("q1", "q2", "q3"))
        .select(col("group").as("g"), col("q1"), col("q2"), col("q3"))
      v.join(broadcast(th), Seq("g"))
        .groupBy(col("g").as("grp"),
          (lit(1) + (col("v") > col("q1")).cast("int")
            + (col("v") > col("q2")).cast("int")
            + (col("v") > col("q3")).cast("int")).as("bucket"))
        .agg(count(lit(1)).as("n"), min(col("v")).as("lo"),
          max(col("v")).as("hi"))
        .orderBy(col("grp"), col("bucket"))
    }),

    // Lorenz curve (q_gini's pointwise companion): cumulative value share
    // at each decile of the ranked population, in exact integer
    // micro-units. Deciles come from the distributed rank frame — the
    // only windows here run over the 10-row-per-group decile SUMMARY,
    // never over the data.
    "q_lorenz" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
      val d = graft.operators.Percentiles
        .globalRanks(li, col("g"), col("v"))
        .select(col("group").as("g"),
          expr("((rank - 1) * 10) div n + 1").as("decile"),
          col("value").cast(DecimalType(18, 4)).as("vd"))
        .groupBy(col("g"), col("decile")).agg(sum(col("vd")).as("ds"))
      val wc = Window.partitionBy(col("g")).orderBy(col("decile"))
      d.withColumn("cum", sum(col("ds")).over(wc))
        .withColumn("tot", sum(col("ds")).over(Window.partitionBy(col("g"))))
        .select(col("g").as("l_returnflag"), col("decile"),
          expr("""CAST((1000000 * CAST(cum * 10000 AS DECIMAL(38,0)))
                 div CAST(tot * 10000 AS DECIMAL(38,0)) AS BIGINT)""")
            .as("cum_share_micro"))
        .orderBy(col("l_returnflag"), col("decile"))
    }),

    // Pairwise correlation matrix over three lineitem measures from ONE
    // aggregation pass: all sums, squares and cross-products accumulate
    // as exact decimals in a single scan (the co-moment matrix — what a
    // feature-stats pass computes before training), then the 1-row
    // result explodes into the long-format (col_x, col_y, corr) triangle
    // driver-side-free. Same closing double formula as q_corr_regr.
    "q_corr_matrix" -> ((s, dir) => {
      val d38 = DecimalType(38, 8)
      // string-routed decimal → double: see q_corr_regr's scaladoc note
      def d18(c: String) = sum(col(c).cast(DecimalType(18, 4)))
        .cast("string").cast("double")
      def dp(a: String, b: String) = sum((col(a) * col(b)).cast(d38))
        .cast("string").cast("double")
      val sums = t(s, dir, "lineitem").agg(
        count(lit(1)).as("n"),
        d18("l_quantity").as("s1"), d18("l_extendedprice").as("s2"),
        d18("l_discount").as("s3"),
        dp("l_quantity", "l_quantity").as("ss1"),
        dp("l_extendedprice", "l_extendedprice").as("ss2"),
        dp("l_discount", "l_discount").as("ss3"),
        dp("l_quantity", "l_extendedprice").as("p12"),
        dp("l_quantity", "l_discount").as("p13"),
        dp("l_extendedprice", "l_discount").as("p23"))
      def corrOf(sx: String, sy: String, sxx: String, syy: String,
          pxy: String) =
        (col("n") * col(pxy) - col(sx) * col(sy)) /
          (sqrt(col("n") * col(sxx) - col(sx) * col(sx)) *
            sqrt(col("n") * col(syy) - col(sy) * col(sy)))
      sums.select(explode(array(
          struct(lit("quantity").as("col_x"), lit("price").as("col_y"),
            corrOf("s1", "s2", "ss1", "ss2", "p12").as("corr")),
          struct(lit("quantity").as("col_x"), lit("discount").as("col_y"),
            corrOf("s1", "s3", "ss1", "ss3", "p13").as("corr")),
          struct(lit("price").as("col_x"), lit("discount").as("col_y"),
            corrOf("s2", "s3", "ss2", "ss3", "p23").as("corr"))))
          .as("r"))
        .select(col("r.col_x").as("col_x"), col("r.col_y").as("col_y"),
          col("r.corr").as("corr"))
        .orderBy(col("col_x"), col("col_y"))
    }),

    // Kendall τ-b rank correlation — the concordance partner of
    // q_spearman, exact on any corpus size: the data first reduces to
    // the bounded (quantity × linenumber) contingency grid (≤ 50×7
    // cells), then concordant/discordant pairs come from the grid's
    // self-join — cell-count PRODUCTS, pure integers, never row pairs.
    // The asymmetric join condition (b.x > a.x) counts each unordered
    // pair exactly once. Only the closing τ quotient is IEEE (two exact
    // sqrt inputs — the tie-corrected pair counts exceed 2⁶³ only as a
    // product, so each factor converts to double first).
    "q_kendall_tau" -> ((s, dir) => {
      val g = t(s, dir, "lineitem")
        .select(col("l_quantity").cast("long").as("x"),
          col("l_linenumber").cast("long").as("y"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val n = g.agg(sum(col("c")).cast("long").as("n"))
      val a = g.select(col("x").as("ax"), col("y").as("ay"),
        col("c").as("ac"))
      val bb = g.select(col("x").as("bx"), col("y").as("by"),
        col("c").as("bc"))
      val cd = a.join(bb, !(col("ax") === col("bx") &&
          col("ay") === col("by")))
        .agg(
          sum(when(col("bx") > col("ax") && col("by") > col("ay"),
            col("ac") * col("bc")).otherwise(0L)).cast("long").as("conc"),
          sum(when(col("bx") > col("ax") && col("by") < col("ay"),
            col("ac") * col("bc")).otherwise(0L)).cast("long").as("disc"))
      val tx = g.groupBy(col("x")).agg(sum(col("c")).as("cx"))
        .agg(sum(expr("cx * (cx - 1) div 2")).cast("long").as("n1"))
      val ty = g.groupBy(col("y")).agg(sum(col("c")).as("cy"))
        .agg(sum(expr("cy * (cy - 1) div 2")).cast("long").as("n2"))
      cd.crossJoin(broadcast(n)).crossJoin(broadcast(tx))
        .crossJoin(broadcast(ty))
        .select(col("n"), col("conc"), col("disc"), col("n1"), col("n2"),
          ((col("conc") - col("disc")).cast("double") /
            (sqrt((expr("n * (n - 1) div 2") - col("n1")).cast("double")) *
              sqrt((expr("n * (n - 1) div 2") - col("n2")).cast("double"))))
            .as("tau_b"))
    }),

    // Price/quantity Pareto frontier over lineitems — the 2D skyline via
    // the bucketed strict-prefix-max operator (operators/Skyline): no
    // all-pairs anti-join, no partition-less window. The oracle's global
    // window is the semantic spec; the operator's bucketed plan is the
    // scale shape.
    "q_skyline" -> ((s, dir) =>
      graft.operators.Skyline.pareto2d(t(s, dir, "lineitem"),
        col("l_extendedprice"), col("l_quantity"))),

    // Incremental view maintenance (round 10): the materialized-aggregate
    // refresh a warehouse runs instead of full recompute — partial
    // aggregates over the frozen base and the fresh delta MERGE by
    // re-aggregation (counts add, decimal sums add, min/max fold), which
    // is exactly the algebraic property that makes the maintenance valid.
    // The gate's oracle is the FULL flat recompute, so equality IS the
    // incremental-merge correctness proof. Count and sum stay exact
    // (long / DECIMAL(18,2)); at 100 TB the base partials would be the
    // stored view and only the delta is scanned.
    "q_incremental_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderpriority").as("pri"), col("o_totalprice").as("p"),
        col("o_orderdate").as("d"))
      def partial(df: DataFrame): DataFrame = df.groupBy(col("pri"))
        .agg(count(lit(1)).as("n"),
          sum(col("p").cast(DecimalType(18, 2))).as("tot"),
          min(col("p")).as("lo"), max(col("p")).as("hi"))
      val cut = lit("1996-01-01")
      val base = partial(o.filter(col("d") < cut))
      val delta = partial(o.filter(col("d") >= cut))
      base.unionByName(delta)
        .groupBy(col("pri"))
        .agg(sum(col("n")).as("n"),
          sum(col("tot")).cast("double").as("total"),
          min(col("lo")).as("lo"), max(col("hi")).as("hi"))
        .orderBy(col("pri"))
    }),

    // Percent-of-parent (round 10): each nation's revenue share within
    // its region in exact ppm — the hierarchy-ratio primitive every
    // rollup report needs beside the rollup itself. Revenue is held in
    // integer CENTS (o_totalprice has 2 decimals, so ×100 through
    // DECIMAL is exact); region totals re-aggregate from the nation rows
    // (one pass over orders) and broadcast back; the share is one
    // 128-bit integer division.
    "q_pct_of_parent" -> ((s, dir) => {
      val nat = t(s, dir, "orders")
        .join(t(s, dir, "customer").select(col("c_custkey"),
          col("c_nationkey")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation").select(col("n_nationkey"),
          col("n_name"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region").select(col("r_regionkey"),
          col("r_name"))), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast(DecimalType(38, 0))).as("rev_cents"))
      val reg = nat.groupBy(col("r_name"))
        .agg(sum(col("rev_cents")).as("reg_cents"))
      nat.join(broadcast(reg), Seq("r_name"))
        .select(col("r_name"), col("n_name"),
          col("rev_cents").cast("long").as("rev_cents"),
          expr("CAST((rev_cents * 1000000) div reg_cents AS BIGINT)")
            .as("share_ppm"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Salted skewed join (round 10): the manual skew-breaker for the
    // regime AQE cannot fix alone (one fact key carrying ~95% of rows
    // joined to a small dim): the fact side gets a deterministic salt in
    // [0, S), the dim side replicates each row S times via explode, and
    // the join key becomes (k, salt) — the hot key's rows spread over S
    // reducers instead of one. Result is aggregated per dim group and
    // must equal the UNSALTED join (the oracle), pinning that salting is
    // pure parallelism, never semantics.
    "q_salted_join" -> ((s, dir) => {
      val S = 8
      val fact = t(s, dir, "lineitem").select(
        when(col("l_orderkey") % 20 < 19, lit(1L))
          .otherwise(col("l_orderkey") % 100).as("k"),
        col("l_extendedprice").as("v"),
        pmod(col("l_orderkey") + col("l_linenumber"), lit(S)).as("salt"))
      val dim = s.range(0, 100).select(col("id").as("k"),
        (col("id") * 7 % 13).as("grp"))
      val salted = dim.withColumn("salt",
        explode(sequence(lit(0), lit(S - 1)).cast("array<bigint>")))
      fact.join(salted, Seq("k", "salt"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), Parity.dsum(col("v")).as("total"))
        .orderBy(col("grp"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q_approx_quantile" ->
      """SELECT l_returnflag, count(*) AS n, true AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_corr_regr" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |    COUNT(*) AS n,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS sxy,
        |    CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round((sxy - sx*sy/n) / (n-1), 6) AS covar_samp,
        |  round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
        |  round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6) AS intercept,
        |  round((n*sxy - sx*sy) /
        |    (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), 6) AS corr
        |FROM s ORDER BY l_returnflag""".stripMargin,

    "q_percentile_cont" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 6) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_string_agg" ->
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  COUNT(*) AS n
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "q_window_range" ->
      """SELECT o_orderkey, o_orderstatus, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_orderstatus ORDER BY o_custkey
        |    RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS range_sum
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q_lateral" ->
      """SELECT n.n_name, c.c_name, c.c_acctbal
        |FROM nation n,
        |LATERAL (SELECT c_name, c_acctbal FROM customer
        |         WHERE c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        |ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""".stripMargin,

    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, measure, value
        |FROM (UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity,
        |                      l_extendedprice, l_discount, l_tax
        |               FROM lineitem WHERE l_orderkey < 1000)
        |      ON l_quantity, l_extendedprice, l_discount, l_tax
        |      INTO NAME measure VALUE value)
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,

    "q_topk_agg" ->
      """SELECT l_returnflag, id, score, rank FROM (
        |  SELECT l_returnflag,
        |    l_orderkey * 10 + l_linenumber AS id,
        |    l_extendedprice AS score,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC,
        |               l_orderkey * 10 + l_linenumber ASC) AS INT) AS rank
        |  FROM lineitem)
        |WHERE rank <= 5 ORDER BY l_returnflag, rank""".stripMargin,

    "q_try_arith" ->
      """SELECT l_orderkey, l_linenumber, l_partkey,
        |  CASE WHEN l_linenumber - 1 = 0 THEN NULL
        |       ELSE l_partkey / (l_linenumber - 1) END AS div_maybe,
        |  CASE WHEN l_partkey > 7 THEN NULL
        |       ELSE l_partkey + 9223372036854775800 END AS add_maybe,
        |  CASE WHEN l_suppkey >= 2 THEN NULL
        |       ELSE l_suppkey * 4611686018427387904 END AS mul_maybe
        |FROM lineitem WHERE l_orderkey < 2000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_histogram_orders" ->
      """SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
        |  COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_winsorize" ->
      s"""WITH v AS (SELECT l_returnflag AS g, l_extendedprice AS v
         |           FROM lineitem),
         |r AS (SELECT g, v,
         |        row_number() OVER (PARTITION BY g ORDER BY v) AS rk
         |      FROM v),
         |n AS (SELECT g, COUNT(*) AS n FROM v GROUP BY 1),
         |th AS (SELECT r.g,
         |         MIN(v) FILTER (WHERE rk = (n + 19) // 20) AS lo_t,
         |         MAX(v) FILTER (WHERE rk = (19 * n + 19) // 20) AS hi_t
         |       FROM r JOIN n USING (g) GROUP BY 1)
         |SELECT v.g AS l_returnflag, n.n AS n, th.lo_t, th.hi_t,
         |  ${Parity.sqlDavg("v.v")} AS mean_raw,
         |  ${Parity.sqlDavg("greatest(least(v.v, th.hi_t), th.lo_t)")}
         |    AS mean_wins
         |FROM v JOIN th USING (g) JOIN n USING (g)
         |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,

    "q_tpch_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,

    "q_mad" ->
      """WITH v AS (SELECT l_returnflag AS g, l_extendedprice AS v
        |           FROM lineitem),
        |n1 AS (SELECT g, COUNT(*) AS n FROM v GROUP BY 1),
        |r1 AS (SELECT g, v,
        |         row_number() OVER (PARTITION BY g ORDER BY v) AS rk
        |       FROM v),
        |med AS (SELECT r1.g, MIN(v) FILTER (WHERE rk = (n + 1) // 2) AS m
        |        FROM r1 JOIN n1 USING (g) GROUP BY 1),
        |d AS (SELECT v.g, abs(v.v - med.m) AS dv FROM v JOIN med USING (g)),
        |r2 AS (SELECT g, dv,
        |         row_number() OVER (PARTITION BY g ORDER BY dv) AS rk
        |       FROM d),
        |mad AS (SELECT r2.g, MIN(dv) FILTER (WHERE rk = (n + 1) // 2) AS mad
        |        FROM r2 JOIN n1 USING (g) GROUP BY 1)
        |SELECT med.g AS l_returnflag, med.m AS median, mad.mad AS mad
        |FROM med JOIN mad USING (g) ORDER BY 1""".stripMargin,

    "q_robust_outliers" ->
      """WITH v AS (SELECT l_returnflag AS g, l_extendedprice AS v
        |           FROM lineitem),
        |n1 AS (SELECT g, COUNT(*) AS n FROM v GROUP BY 1),
        |r1 AS (SELECT g, v,
        |         row_number() OVER (PARTITION BY g ORDER BY v) AS rk
        |       FROM v),
        |med AS (SELECT r1.g, MIN(v) FILTER (WHERE rk = (n + 1) // 2) AS m
        |        FROM r1 JOIN n1 USING (g) GROUP BY 1),
        |d AS (SELECT v.g, v.v, abs(v.v - med.m) AS dv
        |      FROM v JOIN med USING (g)),
        |r2 AS (SELECT g, dv,
        |         row_number() OVER (PARTITION BY g ORDER BY dv) AS rk
        |       FROM d),
        |mad AS (SELECT r2.g, MIN(dv) FILTER (WHERE rk = (n + 1) // 2) AS mad
        |        FROM r2 JOIN n1 USING (g) GROUP BY 1)
        |SELECT d.g AS l_returnflag, COUNT(*) AS n_outliers,
        |  MIN(d.v) AS min_outlier, MAX(d.v) AS max_outlier
        |FROM d JOIN mad USING (g)
        |WHERE d.dv * 1000.0 > mad.mad * 1779.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_gini" ->
      """WITH v AS (SELECT l_returnflag AS g, l_extendedprice AS v
        |           FROM lineitem),
        |r AS (SELECT g, v,
        |        row_number() OVER (PARTITION BY g ORDER BY v) AS rk
        |      FROM v),
        |s AS (SELECT g, CAST(COUNT(*) AS HUGEINT) AS cnt,
        |        CAST(SUM(CAST(v AS DECIMAL(18,4))) * 10000 AS HUGEINT)
        |          AS s0,
        |        CAST(SUM(rk * CAST(v AS DECIMAL(18,4))) * 10000 AS HUGEINT)
        |          AS s1
        |      FROM r GROUP BY 1)
        |SELECT g AS l_returnflag,
        |  CAST((1000000 * (2 * s1 - (cnt + 1) * s0)) // (cnt * s0)
        |    AS BIGINT) AS gini_micro
        |FROM s ORDER BY 1""".stripMargin,

    "q_equibin" ->
      """WITH v AS (SELECT o_orderpriority AS g, o_totalprice AS v
        |           FROM orders),
        |r AS (SELECT g, v,
        |        row_number() OVER (PARTITION BY g ORDER BY v) AS rk
        |      FROM v),
        |n AS (SELECT g, COUNT(*) AS n FROM v GROUP BY 1),
        |th AS (SELECT r.g,
        |    MIN(v) FILTER (WHERE rk = (n + 3) // 4) AS q1,
        |    MIN(v) FILTER (WHERE rk = (n + 1) // 2) AS q2,
        |    MIN(v) FILTER (WHERE rk = (3 * n + 3) // 4) AS q3
        |  FROM r JOIN n USING (g) GROUP BY 1)
        |SELECT v.g AS grp,
        |  1 + (v.v > th.q1)::INT + (v.v > th.q2)::INT
        |    + (v.v > th.q3)::INT AS bucket,
        |  COUNT(*) AS n, MIN(v.v) AS lo, MAX(v.v) AS hi
        |FROM v JOIN th USING (g) GROUP BY 1, 2 ORDER BY 1, 2"""
        .stripMargin,

    "q_lorenz" ->
      """WITH v AS (SELECT l_returnflag AS g, l_extendedprice AS v
        |           FROM lineitem),
        |r AS (SELECT g, v,
        |        row_number() OVER (PARTITION BY g ORDER BY v) AS rk
        |      FROM v),
        |n AS (SELECT g, COUNT(*) AS n FROM v GROUP BY 1),
        |d AS (SELECT r.g, ((rk - 1) * 10) // n.n + 1 AS decile,
        |        CAST(v AS DECIMAL(18,4)) AS vd
        |      FROM r JOIN n USING (g)),
        |s AS (SELECT g, decile, SUM(vd) AS ds FROM d GROUP BY 1, 2),
        |c AS (SELECT g, decile,
        |        SUM(ds) OVER (PARTITION BY g ORDER BY decile) AS cum,
        |        SUM(ds) OVER (PARTITION BY g) AS tot
        |      FROM s)
        |SELECT g AS l_returnflag, CAST(decile AS BIGINT) AS decile,
        |  CAST((1000000 * CAST(cum * 10000 AS HUGEINT))
        |    // CAST(tot * 10000 AS HUGEINT) AS BIGINT) AS cum_share_micro
        |FROM c ORDER BY 1, 2""".stripMargin,

    "q_corr_matrix" ->
      """WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS s1,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR)
        |    AS DOUBLE) AS s2,
        |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS s3,
        |  CAST(CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(38,8)))
        |    AS VARCHAR) AS DOUBLE) AS ss1,
        |  CAST(CAST(SUM(CAST(l_extendedprice*l_extendedprice
        |    AS DECIMAL(38,8))) AS VARCHAR) AS DOUBLE) AS ss2,
        |  CAST(CAST(SUM(CAST(l_discount*l_discount AS DECIMAL(38,8)))
        |    AS VARCHAR) AS DOUBLE) AS ss3,
        |  CAST(CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(38,8)))
        |    AS VARCHAR) AS DOUBLE) AS p12,
        |  CAST(CAST(SUM(CAST(l_quantity*l_discount AS DECIMAL(38,8)))
        |    AS VARCHAR) AS DOUBLE) AS p13,
        |  CAST(CAST(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(38,8)))
        |    AS VARCHAR) AS DOUBLE) AS p23
        |  FROM lineitem)
        |SELECT col_x, col_y,
        |  (n*pxy - sx*sy) /
        |    (SQRT(n*sxx - sx*sx) * SQRT(n*syy - sy*sy)) AS corr
        |FROM (
        |  SELECT 'quantity' AS col_x, 'price' AS col_y, n, s1 AS sx,
        |    s2 AS sy, ss1 AS sxx, ss2 AS syy, p12 AS pxy FROM s
        |  UNION ALL SELECT 'quantity', 'discount', n, s1, s3, ss1, ss3,
        |    p13 FROM s
        |  UNION ALL SELECT 'price', 'discount', n, s2, s3, ss2, ss3,
        |    p23 FROM s)
        |ORDER BY col_x, col_y""".stripMargin,

    "q_kendall_tau" ->
      """WITH g AS (SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(l_linenumber AS BIGINT) AS y, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM g),
        |cd AS (SELECT
        |    CAST(SUM(CASE WHEN b.x > a.x AND b.y > a.y
        |      THEN a.c * b.c ELSE 0 END) AS BIGINT) AS conc,
        |    CAST(SUM(CASE WHEN b.x > a.x AND b.y < a.y
        |      THEN a.c * b.c ELSE 0 END) AS BIGINT) AS disc
        |  FROM g a JOIN g b ON NOT (a.x = b.x AND a.y = b.y)),
        |tx AS (SELECT CAST(SUM(cx * (cx - 1) // 2) AS BIGINT) AS n1
        |       FROM (SELECT SUM(c) AS cx FROM g GROUP BY x)),
        |ty AS (SELECT CAST(SUM(cy * (cy - 1) // 2) AS BIGINT) AS n2
        |       FROM (SELECT SUM(c) AS cy FROM g GROUP BY y))
        |SELECT n, conc, disc, n1, n2,
        |  CAST(conc - disc AS DOUBLE) /
        |    (SQRT(CAST(n*(n-1) // 2 - n1 AS DOUBLE)) *
        |     SQRT(CAST(n*(n-1) // 2 - n2 AS DOUBLE))) AS tau_b
        |FROM cd, n, tx, ty""".stripMargin,

    "q_skyline" ->
      """WITH g AS (SELECT l_extendedprice AS x, MAX(l_quantity) AS gy
        |           FROM lineitem GROUP BY 1),
        |f AS (SELECT x, gy, MAX(gy) OVER (ORDER BY x
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |      FROM g)
        |SELECT x, gy AS y FROM f WHERE pm IS NULL OR gy > pm
        |ORDER BY x""".stripMargin,

    // flat full recompute — equality with the engine's base+delta merge
    // is the incremental-maintenance correctness proof
    "q_incremental_agg" ->
      """SELECT o_orderpriority AS pri, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_pct_of_parent" ->
      """WITH nat AS (SELECT r.r_name, n.n_name,
        |    CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(38,0))) AS BIGINT) AS rev_cents
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY 1, 2),
        |reg AS (SELECT r_name, SUM(rev_cents) AS reg_cents
        |        FROM nat GROUP BY 1)
        |SELECT nat.r_name, n_name, rev_cents,
        |  CAST((CAST(rev_cents AS HUGEINT) * 1000000) // reg_cents
        |    AS BIGINT) AS share_ppm
        |FROM nat JOIN reg ON reg.r_name = nat.r_name
        |ORDER BY nat.r_name, n_name""".stripMargin,

    // the UNSALTED join — salting must be invisible in the result
    "q_salted_join" -> {
      s"""WITH fact AS (SELECT
         |    CASE WHEN l_orderkey % 20 < 19 THEN 1
         |         ELSE l_orderkey % 100 END AS k,
         |    l_extendedprice AS v FROM lineitem),
         |dim AS (SELECT g AS k, (g * 7) % 13 AS grp
         |        FROM generate_series(0, 99) t(g))
         |SELECT grp, COUNT(*) AS n, ${Parity.sqlDsum("v")} AS total
         |FROM fact JOIN dim USING (k)
         |GROUP BY 1 ORDER BY 1""".stripMargin
    }
  )
}
