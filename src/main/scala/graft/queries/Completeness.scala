package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Parity._

/** Relational edge-semantics completeness: null ordering, limit/offset,
  * interval arithmetic, correlated/scalar subqueries, and the second tier
  * of string/date functions (SURVEY §2.6, §2.8 F14 long tail).
  */
object Completeness extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  override def defs: Map[String, Q] = Map(
    // Null-ordering semantics, surfaced through a window rank so the
    // NULLS LAST sort actually executes (a bare intermediate orderBy would
    // be eliminated by Catalyst and the check would be vacuous): rn encodes
    // the desc_nulls_last order and is hash-compared against the oracle.
    "q_sort_nulls" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("status_or_null").desc_nulls_last, col("o_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 300)
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("P")).as("status_or_null"))
        .withColumn("null_last_rank", row_number().over(w))
        .orderBy(col("o_orderkey"))
    }),

    // LIMIT ... OFFSET over a total order.
    "q_limit_offset" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .offset(5).limit(10)),

    // Interval arithmetic on timestamps.
    "q_interval" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          (col("o_orderdate") + expr("INTERVAL 3 DAYS")).cast("date").as("plus3d"),
          // parquet timestamps are NTZ; epoch cast goes via session-UTC ts
          (col("o_orderdate") - expr("INTERVAL 2 HOURS"))
            .cast("timestamp").cast("long").as("minus2h_epoch"),
          (col("o_orderdate") + expr("INTERVAL 1 MONTH")).cast("date").as("plus1mo"))
        .orderBy(col("o_orderkey"))),

    // Correlated EXISTS + scalar subquery through the SQL planner surface.
    "q_subquery" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("sq_customer")
      t(s, dir, "orders").createOrReplaceTempView("sq_orders")
      s.sql(
        """SELECT c_custkey,
          |  (SELECT COUNT(*) FROM sq_orders o
          |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
          |  c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
          |               / COUNT(*) FROM sq_customer) AS above_avg
          |FROM sq_customer c
          |WHERE EXISTS (SELECT 1 FROM sq_orders o
          |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
          |ORDER BY c_custkey""".stripMargin)
    }),

    // Second-tier string functions: initcap/translate/instr/repeat/
    // startswith/contains/left/right.
    "q_str_funcs2" -> ((s, dir) =>
      t(s, dir, "part")
        .filter(col("p_partkey") < 300)
        .select(col("p_partkey"),
          initcap(col("p_name")).as("title_name"),
          translate(col("p_name"), "aeiou", "AEIOU").as("vowels_up"),
          instr(col("p_name"), " ").as("space_pos"),
          repeat(col("p_brand"), 2).as("brand_x2"),
          col("p_name").startsWith("red").as("is_red"),
          col("p_name").contains("gear").as("has_gear"),
          substring(col("p_name"), 1, 3).as("left3"),
          col("p_name").substr(length(col("p_name")) - 2, lit(3)).as("right3"))
        .orderBy(col("p_partkey"))),

    // Second-tier date functions: last_day / add_months / dayofyear /
    // weekly truncation / months_between.
    "q_date_funcs2" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          last_day(col("o_orderdate")).as("month_end"),
          add_months(col("o_orderdate").cast("date"), 2).as("plus2mo"),
          dayofyear(col("o_orderdate")).as("doy"),
          ((lit(2000) - year(col("o_orderdate"))) * 12 +
            (lit(1) - month(col("o_orderdate")))).as("whole_months_to_y2k"))
        .orderBy(col("o_orderkey")))
  )

  override def oracle: Map[String, String] = Map(
    "q_sort_nulls" ->
      """SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_or_null,
        |  CAST(ROW_NUMBER() OVER (ORDER BY NULLIF(o_orderstatus, 'P')
        |    DESC NULLS LAST, o_orderkey) AS INT) AS null_last_rank
        |FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""".stripMargin,

    "q_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 5""".stripMargin,

    "q_interval" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate + INTERVAL 3 DAY AS DATE) AS plus3d,
        |  epoch_us(o_orderdate - INTERVAL 2 HOUR) // 1000000 AS minus2h_epoch,
        |  CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS plus1mo
        |FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin,

    "q_subquery" ->
      """SELECT c_custkey,
        |  (SELECT COUNT(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |               / COUNT(*) FROM customer) AS above_avg
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q_str_funcs2" ->
      """SELECT p_partkey,
        |  list_aggr(list_transform(string_split(p_name, ' '),
        |    w -> upper(w[1]) || lower(w[2:])), 'string_agg', ' ') AS title_name,
        |  translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
        |  CAST(instr(p_name, ' ') AS INT) AS space_pos,
        |  repeat(p_brand, 2) AS brand_x2,
        |  starts_with(p_name, 'red') AS is_red,
        |  contains(p_name, 'gear') AS has_gear,
        |  substr(p_name, 1, 3) AS left3,
        |  substr(p_name, length(p_name) - 2, 3) AS right3
        |FROM part WHERE p_partkey < 300 ORDER BY p_partkey""".stripMargin,

    "q_date_funcs2" ->
      """SELECT o_orderkey,
        |  last_day(o_orderdate) AS month_end,
        |  CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2mo,
        |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
        |  CAST((2000 - year(o_orderdate)) * 12 + (1 - month(o_orderdate)) AS INT)
        |    AS whole_months_to_y2k
        |FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin
  )
}
