package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.AsOfJoin
import Parity._

/** Join-type completeness beyond the inner/left/semi/anti kernel: right and
  * full outer, cross, range (theta), and as-of (SURVEY §2.3 J5). The
  * reference's only join is the two-table inner equi-join built as SQL text
  * (`/root/reference/src/from-ground-up.js:117-121`); these generalize it.
  */
object JoinsExtra extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  /** Inline price-band dimension for the range join — a literal dim table,
    * like the reference's style-lookup dimension
    * (`/root/reference/src/from-ground-up.js:644-664`). Broadcast-joined:
    * 5 rows never shuffle the fact side. */
  private val bands: Seq[(String, Double, Double)] = Seq(
    ("tiny", 0.0, 50000.0),
    ("small", 50000.0, 150000.0),
    ("medium", 150000.0, 300000.0),
    ("large", 300000.0, 450000.0),
    ("huge", 450000.0, 1e18))

  private def bandsSqlValues: String =
    bands.map { case (n, lo, hi) => s"('$n', $lo, $hi)" }.mkString(", ")

  override def defs: Map[String, Q] = Map(
    // Right outer join (J5): every customer kept from the right side.
    "q_join_right" -> ((s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      val c = t(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "right_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_f_orders"))
        .orderBy(col("c_custkey"))
    }),

    // Full outer join of two aggregated sides on nationkey (J5).
    "q_join_full" -> ((s, dir) => {
      val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val sup = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(sup, Seq("nk"), "full_outer")
        .select(col("nk"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nk"))
    }),

    // Cross join (J5): tiny × tiny only — a cross join with a non-tiny side
    // is a design bug at scale, so the engine surface demonstrates it on
    // dimensions (5 regions × 25 nations).
    "q_join_cross" -> ((s, dir) => {
      val r = t(s, dir, "region").select(col("r_name"))
      val n = t(s, dir, "nation").select(col("n_name"))
      r.crossJoin(n).orderBy(col("r_name"), col("n_name"))
    }),

    // Range (theta) join against the literal band dim: the non-equi
    // condition forces BroadcastNestedLoopJoin — correct here because the
    // build side is 5 rows; the fact side streams through unpartitioned.
    "q_join_range" -> ((s, dir) => {
      import s.implicits._
      val b = bands.toDF("band", "lo", "hi")
      val o = t(s, dir, "orders")
      o.join(broadcast(b),
          o("o_totalprice") >= b("lo") && o("o_totalprice") < b("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("band"))
    }),

    // Same banding through the custom whole-operator path (plans/BandJoin:
    // logical node + strategy + sorted-broadcast binary-search exec) —
    // level (c) of the custom-operator ladder, sharing q_join_range's
    // oracle shape. BETWEEN is inclusive, so bands here are disjoint.
    "q_join_band" -> ((s, dir) => {
      import s.implicits._
      val b = Seq(("low", 0.0, 99999.99), ("mid", 100000.0, 299999.99),
        ("high", 300000.0, 999999999.0)).toDF("band", "lo", "hi")
      val o = t(s, dir, "orders")
      graft.plans.BandJoin.frame(o, b, o("o_totalprice"), b("lo"), b("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("band"))
    }),

    // As-of join: latest order at-or-before each event's timestamp for the
    // same user, via the sort-based union+window operator (no explosion).
    "q_join_asof" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts"))
      val o = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      AsOfJoin(e, o,
          leftKey = e("user_id"), rightKey = o("o_custkey"),
          leftTime = e("ts"), rightTime = o("o_orderdate"),
          rightPayload = Seq("o_orderkey", "o_orderdate"),
          rightTieBreak = o("o_orderkey"))
        .select(col("event_id"), col("user_id"),
          col("_match.o_orderkey").as("last_orderkey"),
          col("_match.o_orderdate").cast("date").as("last_orderdate"))
        .orderBy(col("event_id"))
    }),

    // Forward as-of: the NEXT order at-or-after each event (same one-shuffle
    // union+window operator, frame and equal-time side ordering mirrored).
    "q_join_asof_fwd" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts"))
      val o = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      AsOfJoin(e, o,
          leftKey = e("user_id"), rightKey = o("o_custkey"),
          leftTime = e("ts"), rightTime = o("o_orderdate"),
          rightPayload = Seq("o_orderkey", "o_orderdate"),
          rightTieBreak = o("o_orderkey"), forward = true)
        .select(col("event_id"), col("user_id"),
          col("_match.o_orderkey").as("next_orderkey"),
          col("_match.o_orderdate").cast("date").as("next_orderdate"))
        .orderBy(col("event_id"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q_join_right" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_f_orders
        |FROM (SELECT * FROM orders WHERE o_orderstatus = 'F') o
        |RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q_join_full" ->
      """SELECT COALESCE(c.nk, s.nk) AS nk,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
        |      FROM customer GROUP BY c_nationkey) c
        |FULL JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
        |      FROM supplier GROUP BY s_nationkey) s ON c.nk = s.nk
        |ORDER BY nk""".stripMargin,

    "q_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "q_join_range" ->
      s"""SELECT band, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total
         |FROM orders
         |JOIN (VALUES $bandsSqlValues) AS bands(band, lo, hi)
         |  ON o_totalprice >= lo AND o_totalprice < hi
         |GROUP BY band ORDER BY band""".stripMargin,

    "q_join_band" ->
      s"""SELECT band, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total
         |FROM orders
         |JOIN (VALUES ('low', 0.0, 99999.99), ('mid', 100000.0, 299999.99),
         |             ('high', 300000.0, 999999999.0)) AS bands(band, lo, hi)
         |  ON o_totalprice BETWEEN lo AND hi
         |GROUP BY band ORDER BY band""".stripMargin,

    "q_join_asof" ->
      """SELECT e.event_id, e.user_id, o.last_orderkey, o.last_orderdate
        |FROM events e LEFT JOIN LATERAL (
        |  SELECT o_orderkey AS last_orderkey,
        |         CAST(o_orderdate AS DATE) AS last_orderdate
        |  FROM orders
        |  WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
        |  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) o ON true
        |ORDER BY e.event_id""".stripMargin,

    "q_join_asof_fwd" ->
      """SELECT e.event_id, e.user_id, o.next_orderkey, o.next_orderdate
        |FROM events e LEFT JOIN LATERAL (
        |  SELECT o_orderkey AS next_orderkey,
        |         CAST(o_orderdate AS DATE) AS next_orderdate
        |  FROM orders
        |  WHERE o_custkey = e.user_id AND o_orderdate >= e.ts
        |  ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 1) o ON true
        |ORDER BY e.event_id""".stripMargin
  )
}
