package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Decision-support parity suite: the canonical TPC-H query shapes beyond
  * Q1/Q5 (which live in [[Analytic]]/[[Analytic3]]), adapted to the
  * driver's schema (`o_orderpriority` stands in for `o_shippriority`; no
  * comment/phone columns). These pin the three join/agg patterns every
  * warehouse engine is judged on:
  *
  *  - Q3: selective dim filter → fact-fact join → grouped revenue →
  *    global top-k. The limit must plan as TakeOrderedAndProject (a
  *    per-partition heap + driver merge of k rows), never a global sort.
  *  - Q10: star join with a broadcast leaf dim and a quarter-window date
  *    predicate pushed into both fact scans.
  *  - Q18: HAVING-subquery semi-join — the per-order aggregate FILTERS
  *    the fact table; after the filter the qualifying set is tiny, so
  *    AQE turns the orders join into a broadcast at runtime.
  *
  * Revenue/quantity sums are decimal-routed (Parity posture): exact,
  * associative, order-independent — the same result at any partition
  * count, which is what makes a top-k over a 100 TB fact reproducible.
  */
object TpchOps extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  private val revenue =
    sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast(DecimalType(18, 4))).cast("double").as("revenue")

  override def defs: Map[String, Q] = Map(
    // Q3 shape: shipping-priority candidates for one market segment —
    // orders placed before the cutoff with lineitems still moving after
    // it. Both date predicates push to their scans; the segment filter
    // reduces customer before it reaches the join.
    "q_tpch_q3" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-06-15").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-06-15").cast("timestamp"))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg(revenue)
        .select(col("l_orderkey"), col("o_orderdate"),
          col("o_orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),

    // Q10 shape: returned-item revenue per customer over one quarter —
    // the "who should we call" report. nation is an explicit broadcast;
    // the quarter window prunes orders at the scan.
    "q_tpch_q10" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer").select(col("c_custkey"), col("c_name"),
          col("c_acctbal"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(revenue)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"), col("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q18 shape: large-volume orders — the per-order quantity aggregate
    // both filters AND annotates, so it is computed once and joined back
    // (no second aggregation). The decimal threshold compare is exact:
    // a float sum near 300 could disagree between engines.
    "q_tpch_q18" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 4))).as("qty"))
        .filter(col("qty") > 300)
        .select(col("l_orderkey"), col("qty").cast("double").as("sum_qty"))
      big.join(t(s, dir, "orders"),
          col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer").select(col("c_custkey"), col("c_name")),
          col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // Q6 shape: forecast-revenue-change — the pure scan-and-aggregate
    // query. Everything (year window, discount band, quantity cap)
    // pushes to the parquet scan; the plan is one filtered scan feeding
    // one partial+final aggregate, no shuffle of row data at all.
    "q_tpch_q6" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount"))
            .cast(DecimalType(18, 4)))
            .cast("string").cast("double").as("revenue"),
          count(lit(1)).as("n_items"))),

    // Q14 shape: promotion-revenue share for one month — conditional
    // aggregation over a fact⋈dim join with the month window pushed to
    // the fact scan and the part dim broadcast. The share itself is an
    // exact integer micro-ratio (decimal scale-4 values ×10⁴ are
    // integral, so the DECIMAL(38,0) floor division is unambiguous).
    "q_tpch_q14" -> ((s, dir) => {
      val j = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
        .select(col("l_partkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4)).as("rev"))
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
      j.agg(
          sum(when(col("p_type") === "PROMO", col("rev"))
            .otherwise(lit(0).cast(DecimalType(18, 4)))).as("promo"),
          sum(col("rev")).as("total"))
        .select(col("promo").cast("string").cast("double")
            .as("promo_revenue"),
          col("total").cast("string").cast("double").as("total_revenue"),
          expr("""CAST((1000000 * CAST(promo * 10000 AS DECIMAL(38,0)))
                 div CAST(total * 10000 AS DECIMAL(38,0)) AS BIGINT)""")
            .as("promo_share_micro"))
    }))

  private val sqlRevenue =
    """CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
      |    AS DOUBLE) AS revenue""".stripMargin

  override def oracle: Map[String, String] = Map(
    "q_tpch_q3" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  $sqlRevenue
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-15'
         |  AND l_shipdate > TIMESTAMP '1998-06-15'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,

    "q_tpch_q10" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  $sqlRevenue
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-04-01'
         |  AND l_returnflag = 'R'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q_tpch_q18" ->
      """WITH big AS (SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |      AS sum_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  sum_qty
        |FROM big JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_tpch_q6" ->
      """SELECT
        |  CAST(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
        |    AS VARCHAR) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q_tpch_q14" ->
      """WITH j AS (SELECT p_type,
        |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |      AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        |    AND l_shipdate < TIMESTAMP '1996-10-01'),
        |s AS (SELECT
        |    SUM(CASE WHEN p_type = 'PROMO' THEN rev
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS promo,
        |    SUM(rev) AS total FROM j)
        |SELECT CAST(CAST(promo AS VARCHAR) AS DOUBLE) AS promo_revenue,
        |  CAST(CAST(total AS VARCHAR) AS DOUBLE) AS total_revenue,
        |  CAST((1000000 * CAST(promo * 10000 AS HUGEINT))
        |    // CAST(total * 10000 AS HUGEINT) AS BIGINT)
        |    AS promo_share_micro
        |FROM s""".stripMargin)
}
