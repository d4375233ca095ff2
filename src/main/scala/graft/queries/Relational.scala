package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Parity._

/** Core relational kernel: scans, projections, predicates, joins, aggregates,
  * sorts/limits (SURVEY §2.1, §2.2, §2.3, §2.4, §2.6).
  *
  * The reference pushes all of this to PostGIS as generated SQL text
  * (`/root/reference/src/from-ground-up.js:84-90` builds
  * `SELECT <cols> FROM <table> [WHERE <pred>]`, `:117-121` the two-table
  * equi-join); here each becomes a declarative Spark plan and Catalyst does
  * the pushdown instead of the Postgres planner. Scale notes per query inline.
  */
object Relational extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  override def defs: Map[String, Q] = Map(
    // TPC-H Q1 shape: the engine's flagship partial-aggregation query.
    // Scale: group key cardinality is tiny (flag×status ≤ 6), so map-side
    // partial aggregation reduces ~everything before the shuffle; the scan
    // prunes to 7 columns and the shipdate predicate reaches the parquet
    // row-group stats (PushedFilters).
    "q1_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
            .as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Plain projected scan with a selective filter: P1+P3. Catalyst prunes
    // the parquet read to 3 of 11 columns and pushes l_orderkey < 100 into
    // the scan (row-group + page-level min/max skipping at scale).
    "q_scan_project" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // Full predicate surface (P7): BETWEEN / IN / LIKE / OR / NOT / IS NULL.
    "q_filter_pred" -> ((s, dir) =>
      t(s, dir, "part")
        .filter(
          col("p_size").between(10, 30) &&
          col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
          col("p_name").like("%a%") &&
          (col("p_type").startsWith("STANDARD") || col("p_retailprice") > 1200.0) &&
          !col("p_retailprice").isNull)
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
          col("p_size"), col("p_retailprice"))
        .orderBy(col("p_partkey"))),

    // Inner equi-join chain + aggregate (J1 generalized): revenue per nation.
    // Scale: nation (25 rows) and region (5 rows) are broadcast — no shuffle
    // for the dimension sides; only customer⋈orders shuffles, on the join key.
    "q_join_inner_agg" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val n = t(s, dir, "nation")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          dsum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))
    }),

    // Left outer join preserving customers with no orders (J5).
    "q_join_left" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
        .orderBy(col("c_custkey"))
    }),

    // Left-semi: customers WITH at least one 'F' order (EXISTS).
    "q_join_semi" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Left-anti: customers with NO 'P'-status orders (NOT EXISTS).
    "q_join_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // Global top-k: Spark plans TakeOrderedAndProject — each partition keeps
    // only its local top 10, so the driver merge sees k×partitions rows, not
    // the table. Ties broken on the key for determinism.
    "q_topk" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .limit(10)),

    // Salted (two-stage) aggregation on a deliberately skewed key: the
    // skew-handling pattern for hot groupBy keys, whose oracle is the plain
    // single-stage GROUP BY — salting must be invisible in the result.
    "q_salted_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("skew_key",
          when(col("l_orderkey") % 10 < 7, lit(0L)) // ~70% of rows on key 0
            .otherwise(col("l_orderkey") % 10))
      graft.operators.Salted.aggregate(li, col("skew_key"), saltFactor = 16,
          Seq(
            (sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 4))),
              (c: String) => sum(col(c)).cast("double"), "total_qty"),
            (count(lit(1)), (c: String) => sum(col(c)), "n")))
        .withColumnRenamed("__key", "skew_key")
        .orderBy(col("skew_key"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 6)} AS sum_disc_price,
         |  ${sqlDavg("l_quantity")} AS avg_qty,
         |  ${sqlDavg("l_discount", 6)} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_filter_pred" ->
      """SELECT p_partkey, p_name, p_brand, p_size, p_retailprice FROM part
        |WHERE p_size BETWEEN 10 AND 30
        |  AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        |  AND p_name LIKE '%a%'
        |  AND (p_type LIKE 'STANDARD%' OR p_retailprice > 1200.0)
        |  AND p_retailprice IS NOT NULL
        |ORDER BY p_partkey""".stripMargin,

    "q_join_inner_agg" ->
      s"""SELECT n_name,
         |  ${sqlDsum("o_totalprice")} AS revenue,
         |  COUNT(*) AS n_orders
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_join_left" ->
      s"""SELECT c_custkey, c_name,
         |  COUNT(o_orderkey) AS n_orders,
         |  COALESCE(${sqlDsum("o_totalprice")}, 0.0) AS total_spent
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_salted_agg" ->
      s"""SELECT CASE WHEN l_orderkey % 10 < 7 THEN 0 ELSE l_orderkey % 10 END
         |    AS skew_key,
         |  ${sqlDsum("l_quantity")} AS total_qty, COUNT(*) AS n
         |FROM lineitem GROUP BY 1 ORDER BY skew_key""".stripMargin
  )
}
