package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-quality auditing (SURVEY §2.11 extensions): referential-integrity
  * sweeps and one-pass column profiling — the checks a pipeline runs
  * before trusting a new corpus drop, expressed as gate queries so both
  * engines pin the same numbers.
  */
object QualityOps extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  /** One FK edge: child rows joined (left) against the DISTINCT parent
    * key set; an orphan is a child whose key found no parent. The
    * distinct projection makes the count robust even against a
    * degenerate parent with duplicated keys. */
  private def riEdge(name: String, child: DataFrame, fk: Column,
      parent: DataFrame, pk: Column): DataFrame =
    child.select(fk.as("k"))
      .join(parent.select(pk.as("pk")).distinct(),
        col("k") === col("pk"), "left")
      .agg(count(lit(1)).as("n_child"),
        sum(when(col("pk").isNull, 1L).otherwise(0L)).as("n_orphans"))
      .select(lit(name).as("edge"), col("n_child"), col("n_orphans"))

  override def defs: Map[String, Q] = Map(
    // Referential-integrity audit across every FK edge of the star
    // schema in one result. Each edge is an equi-join against a distinct
    // parent-key projection (dims broadcast; the two lineitem fact edges
    // shuffle on the key) — never a driver-side key set. NULL FKs count
    // as orphans: a null never equi-joins, which is the conservative
    // reading for an integrity sweep.
    "q_ri_audit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      val p = t(s, dir, "part")
      riEdge("customer.c_nationkey->nation", c, col("c_nationkey"),
          n, col("n_nationkey"))
        .unionAll(riEdge("lineitem.l_orderkey->orders", li,
          col("l_orderkey"), o, col("o_orderkey")))
        .unionAll(riEdge("lineitem.l_partkey->part", li,
          col("l_partkey"), p, col("p_partkey")))
        .unionAll(riEdge("lineitem.l_suppkey->supplier", li,
          col("l_suppkey"), su, col("s_suppkey")))
        .unionAll(riEdge("nation.n_regionkey->region", n,
          col("n_regionkey"), r, col("r_regionkey")))
        .unionAll(riEdge("orders.o_custkey->customer", o,
          col("o_custkey"), c, col("c_custkey")))
        .unionAll(riEdge("supplier.s_nationkey->nation", su,
          col("s_nationkey"), n, col("n_nationkey")))
        .orderBy(col("edge"))
    }),

    // One-pass column profile of the orders table: null count, exact
    // distinct cardinality, and min/max per column, pivoted to a row per
    // column. Everything computes in ONE aggregation over ONE scan (the
    // multi-distinct expands map-side, the standard plan); min/max
    // render through type-pinned formats — DECIMAL(15,2) for the double,
    // an explicit timestamp pattern — because raw double→string differs
    // between engines ("1.0E-5" vs "1e-05").
    "q_profile" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val agg = o.agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - count(col("o_orderkey"))).as("nn_ok"),
        countDistinct(col("o_orderkey")).as("nd_ok"),
        min(col("o_orderkey")).cast("string").as("mn_ok"),
        max(col("o_orderkey")).cast("string").as("mx_ok"),
        (count(lit(1)) - count(col("o_custkey"))).as("nn_ck"),
        countDistinct(col("o_custkey")).as("nd_ck"),
        min(col("o_custkey")).cast("string").as("mn_ck"),
        max(col("o_custkey")).cast("string").as("mx_ck"),
        (count(lit(1)) - count(col("o_orderstatus"))).as("nn_st"),
        countDistinct(col("o_orderstatus")).as("nd_st"),
        min(col("o_orderstatus")).as("mn_st"),
        max(col("o_orderstatus")).as("mx_st"),
        (count(lit(1)) - count(col("o_totalprice"))).as("nn_tp"),
        countDistinct(col("o_totalprice")).as("nd_tp"),
        min(col("o_totalprice")).cast("decimal(15,2)").cast("string")
          .as("mn_tp"),
        max(col("o_totalprice")).cast("decimal(15,2)").cast("string")
          .as("mx_tp"),
        (count(lit(1)) - count(col("o_orderdate"))).as("nn_od"),
        countDistinct(col("o_orderdate")).as("nd_od"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss")
          .as("mn_od"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss")
          .as("mx_od"),
        (count(lit(1)) - count(col("o_orderpriority"))).as("nn_op"),
        countDistinct(col("o_orderpriority")).as("nd_op"),
        min(col("o_orderpriority")).as("mn_op"),
        max(col("o_orderpriority")).as("mx_op"))
      agg.select(col("n"), expr(
        """stack(6,
           'o_custkey',       nn_ck, nd_ck, mn_ck, mx_ck,
           'o_orderdate',     nn_od, nd_od, mn_od, mx_od,
           'o_orderkey',      nn_ok, nd_ok, mn_ok, mx_ok,
           'o_orderpriority', nn_op, nd_op, mn_op, mx_op,
           'o_orderstatus',   nn_st, nd_st, mn_st, mx_st,
           'o_totalprice',    nn_tp, nd_tp, mn_tp, mx_tp)
           AS (col, n_null, n_distinct, min_s, max_s)"""))
        .select(col("col"), col("n"), col("n_null"), col("n_distinct"),
          col("min_s"), col("max_s"))
        .orderBy(col("col"))
    }),

    // Benford leading-digit profile of order totals — the classic
    // fabricated-data screen. The digit comes from the DECIMAL(15,2)
    // string render (both engines print decimals identically; a raw
    // double render would not agree), frequencies are exact integer
    // micro-units with the total derived from the 9-row digit summary,
    // not a second scan or a partition-less window.
    "q_benford" -> ((s, dir) => {
      val counts = t(s, dir, "orders")
        .filter(col("o_totalprice") > 0)
        .select(substring(
          col("o_totalprice").cast("decimal(15,2)").cast("string"), 1, 1)
          .as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      counts.crossJoin(broadcast(counts.agg(sum(col("n")).as("tot"))))
        .select(col("digit"), col("n"),
          expr("CAST((1000000 * n) div tot AS BIGINT)").as("freq_micro"))
        .orderBy(col("digit"))
    }),

    // Two-sample Kolmogorov–Smirnov drift screen: did URGENT orders'
    // price distribution drift from LOW orders'? The D statistic is an
    // exact integer numerator over the distributed rank frame (no
    // partition-less window, no sorted collect) with one closing IEEE
    // division — see [[graft.operators.KsTest]] for the tie handling.
    "q_ks_test" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      graft.operators.KsTest.twoSample(o,
        col("o_orderpriority") === "1-URGENT", col("o_totalprice"),
        col("o_orderkey"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q_ri_audit" -> {
      def edge(name: String, child: String, fk: String, parent: String,
          pk: String) =
        s"""SELECT '$name' AS edge, COUNT(*) AS n_child,
           |  COUNT(*) FILTER (WHERE p.$pk IS NULL) AS n_orphans
           |FROM $child LEFT JOIN (SELECT DISTINCT $pk FROM $parent) p
           |  ON $fk = p.$pk""".stripMargin
      Seq(
        edge("customer.c_nationkey->nation", "customer", "c_nationkey",
          "nation", "n_nationkey"),
        edge("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        edge("lineitem.l_partkey->part", "lineitem", "l_partkey",
          "part", "p_partkey"),
        edge("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        edge("nation.n_regionkey->region", "nation", "n_regionkey",
          "region", "r_regionkey"),
        edge("orders.o_custkey->customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        edge("supplier.s_nationkey->nation", "supplier", "s_nationkey",
          "nation", "n_nationkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY edge")
    },

    "q_profile" -> {
      def prof(c: String, mn: String, mx: String) =
        s"""SELECT '$c' AS col, COUNT(*) AS n,
           |  COUNT(*) - COUNT($c) AS n_null,
           |  COUNT(DISTINCT $c) AS n_distinct, $mn AS min_s, $mx AS max_s
           |FROM orders""".stripMargin
      Seq(
        prof("o_custkey", "CAST(MIN(o_custkey) AS VARCHAR)",
          "CAST(MAX(o_custkey) AS VARCHAR)"),
        prof("o_orderdate",
          "strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S')",
          "strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')"),
        prof("o_orderkey", "CAST(MIN(o_orderkey) AS VARCHAR)",
          "CAST(MAX(o_orderkey) AS VARCHAR)"),
        prof("o_orderpriority", "MIN(o_orderpriority)",
          "MAX(o_orderpriority)"),
        prof("o_orderstatus", "MIN(o_orderstatus)", "MAX(o_orderstatus)"),
        prof("o_totalprice",
          "CAST(CAST(MIN(o_totalprice) AS DECIMAL(15,2)) AS VARCHAR)",
          "CAST(CAST(MAX(o_totalprice) AS DECIMAL(15,2)) AS VARCHAR)"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY col")
    },

    "q_benford" ->
      """WITH c AS (SELECT substr(CAST(CAST(o_totalprice AS DECIMAL(15,2))
        |      AS VARCHAR), 1, 1) AS digit, COUNT(*) AS n
        |    FROM orders WHERE o_totalprice > 0 GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM c)
        |SELECT digit, n,
        |  CAST((1000000 * n) // (SELECT tot FROM tot) AS BIGINT)
        |    AS freq_micro
        |FROM c ORDER BY digit""".stripMargin,

    // Value-grid cumulative counts — a different exact algorithm (window
    // prefix sums over the distinct-value grid) pinning the same D.
    "q_ks_test" ->
      """WITH a AS (SELECT o_totalprice AS v,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS s
        |  FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        |    AND o_totalprice IS NOT NULL),
        |nm AS (SELECT CAST(SUM(s) AS BIGINT) AS n_a,
        |              CAST(COUNT(*) - SUM(s) AS BIGINT) AS n_b FROM a),
        |g AS (SELECT v, CAST(SUM(s) AS BIGINT) AS a1,
        |             CAST(COUNT(*) - SUM(s) AS BIGINT) AS b1
        |      FROM a GROUP BY 1),
        |c AS (SELECT SUM(a1) OVER (ORDER BY v) AS i,
        |             SUM(b1) OVER (ORDER BY v) AS j FROM g),
        |dn AS (SELECT CAST(MAX(ABS(i*n_b - j*n_a)) AS BIGINT) AS d_num
        |       FROM c, nm)
        |SELECT n_a, n_b, d_num,
        |  CAST(d_num AS DOUBLE) / CAST(n_a*n_b AS DOUBLE) AS d,
        |  1.358 * SQRT(CAST(n_a+n_b AS DOUBLE) / CAST(n_a*n_b AS DOUBLE))
        |    AS crit,
        |  CAST(d_num AS DOUBLE) / CAST(n_a*n_b AS DOUBLE) >
        |    1.358 * SQRT(CAST(n_a+n_b AS DOUBLE) / CAST(n_a*n_b AS DOUBLE))
        |    AS drift
        |FROM dn, nm""".stripMargin
  )
}
