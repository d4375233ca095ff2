package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Parity._

/** Second analytics tier: exact percentiles, regexp functions, bitwise
  * kernel, conditional aggregates (SURVEY §2.4 A5 / §2.8 F14 long tail).
  */
object Analytic2 extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  override def defs: Map[String, Q] = Map(
    // Exact per-group percentiles via window rank arithmetic — engine-
    // agnostic (approx_percentile sketches differ per engine, so the exact
    // form is the oracle-able one; the approximate form is the scale path
    // and lives with q_approx_distinct in the rows-only tier).
    "q_percentile" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_totalprice"),
          row_number().over(w).as("rn"),
          count(lit(1)).over(Window.partitionBy(col("o_orderstatus"))).as("n"))
        .filter(col("rn") === ((col("n") + 1) / 2).cast("int")) // lower median
        .select(col("o_orderstatus"), col("o_totalprice").as("median_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // Regexp tier: extract / count / replace-with-groups / rlike —
    // RE2-compatible patterns only, so the oracle stays expressible.
    "q_regexp_funcs" -> ((s, dir) =>
      t(s, dir, "part")
        .filter(col("p_partkey") < 300)
        .select(col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+) ([a-z]+)", 2).as("second_word"),
          size(regexp_extract_all(col("p_name"), lit("[aeiou]"), lit(0)))
            .as("n_vowels"),
          regexp_replace(col("p_name"), "([a-z]+)$", "<$1>").as("tagged_last"),
          col("p_name").rlike("^(red|blue|green)").as("is_color_named"))
        .orderBy(col("p_partkey"))),

    // Bitwise kernel on integer keys.
    "q_bitwise" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 300)
        .select(col("o_orderkey"),
          (col("o_orderkey").bitwiseAND(255L)).as("low_byte"),
          (col("o_orderkey").bitwiseOR(16L)).as("or16"),
          (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("xor_cust"),
          shiftleft(col("o_orderkey"), 2).as("shl2"),
          shiftright(col("o_orderkey"), 3).as("shr3"))
        .orderBy(col("o_orderkey"))),

    // Multiset set-ops: EXCEPT ALL / INTERSECT ALL preserve duplicate
    // counts (the bag semantics the DISTINCT variants in q_except/
    // q_intersect collapse).
    "q_setops_all" -> ((s, dir) => {
      val a = t(s, dir, "orders").select(col("o_custkey").as("k"))
      val b = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("k"))
      a.exceptAll(b).groupBy(col("k")).agg(count(lit(1)).as("n_except"))
        .join(
          a.intersectAll(b).groupBy(col("k")).agg(count(lit(1)).as("n_intersect")),
          Seq("k"), "full_outer")
        .select(col("k"),
          coalesce(col("n_except"), lit(0L)).as("n_except"),
          coalesce(col("n_intersect"), lit(0L)).as("n_intersect"))
        .orderBy(col("k"))
    }),

    // Distribution window functions: percent_rank / cume_dist.
    "q_window_dist" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    }),

    // Conditional aggregates: count_if / bool_or / bool_and / sum distinct.
    "q_cond_agg" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          count_if(col("o_orderstatus") === "F").as("n_f"),
          bool_or(col("o_totalprice") > 400000.0).as("any_huge"),
          bool_and(col("o_totalprice") > 0.0).as("all_positive"),
          sum_distinct(col("o_custkey")).as("sum_distinct_cust"))
        .orderBy(col("o_orderpriority")))
  )

  override def oracle: Map[String, String] = Map(
    "q_percentile" ->
      """SELECT o_orderstatus, o_totalprice AS median_price FROM (
        |  SELECT o_orderstatus, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice, o_orderkey) AS rn,
        |    COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
        |  FROM orders)
        |WHERE rn = CAST((n + 1) // 2 AS INT)
        |ORDER BY o_orderstatus""".stripMargin,

    "q_regexp_funcs" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
        |  CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels,
        |  regexp_replace(p_name, '([a-z]+)$', '<\1>') AS tagged_last,
        |  regexp_matches(p_name, '^(red|blue|green)') AS is_color_named
        |FROM part WHERE p_partkey < 300 ORDER BY p_partkey""".stripMargin,

    "q_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS low_byte,
        |  o_orderkey | 16 AS or16,
        |  xor(o_orderkey, o_custkey) AS xor_cust,
        |  o_orderkey << 2 AS shl2,
        |  o_orderkey >> 3 AS shr3
        |FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""".stripMargin,

    "q_setops_all" ->
      """WITH a AS (SELECT o_custkey AS k FROM orders),
        |b AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
        |ex AS (SELECT k, COUNT(*) AS n_except FROM
        |  (SELECT k FROM a EXCEPT ALL SELECT k FROM b) GROUP BY k),
        |ia AS (SELECT k, COUNT(*) AS n_intersect FROM
        |  (SELECT k FROM a INTERSECT ALL SELECT k FROM b) GROUP BY k)
        |SELECT COALESCE(ex.k, ia.k) AS k,
        |  COALESCE(n_except, 0) AS n_except,
        |  COALESCE(n_intersect, 0) AS n_intersect
        |FROM ex FULL JOIN ia ON ex.k = ia.k
        |ORDER BY k""".stripMargin,

    "q_window_dist" ->
      """SELECT c_mktsegment, c_custkey,
        |  round(PERCENT_RANK() OVER w, 6) AS pct_rank,
        |  round(CUME_DIST() OVER w, 6) AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,

    "q_cond_agg" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
        |  BOOL_OR(o_totalprice > 400000.0) AS any_huge,
        |  BOOL_AND(o_totalprice > 0.0) AS all_positive,
        |  CAST(SUM(DISTINCT o_custkey) AS BIGINT) AS sum_distinct_cust
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  )
}
