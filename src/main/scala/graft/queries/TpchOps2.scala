package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** The rest of the TPC-H 22 (round 14): the fifteen decision-support
  * shapes [[TpchOps]]/[[Analytic]] did not yet gate, adapted to the
  * driver's schema (no `partsupp`, no commit/receipt dates, no
  * shipmode/container/phone/comment columns — each stand-in is chosen
  * to preserve the STRUCTURAL pattern the original query exists to
  * exercise, since that pattern is what a warehouse engine is judged
  * on, not the literal column):
  *
  *  - Q2/Q17: correlated SCALAR subqueries — Catalyst must decorrelate
  *    an aggregate subquery into a join (RewriteCorrelatedScalarSubquery)
  *    rather than re-running it per outer row. `lineitem` stands in for
  *    `partsupp` as the part↔supplier relation (min sale price = supply
  *    cost); brand-level 0.2·avg(quantity) is verbatim Q17.
  *  - Q4/Q21/Q22: EXISTS / multi-EXISTS+NOT-EXISTS / NOT-EXISTS+scalar —
  *    the semi/anti-join decorrelation family. "Late" = shipped > N days
  *    after the order date (the schema has no commit/receipt dates).
  *  - Q20/Q16: nested IN and NOT IN subqueries (null-aware anti join).
  *  - Q15: view/CTE + argmax-via-scalar-max — the "top supplier" shape.
  *  - Q7/Q8/Q9: the multi-dim star joins (volume shipping, market
  *    share, product profit) with year rollups; market share closes as
  *    an exact integer micro-ratio (the q_tpch_q14 pattern).
  *  - Q11: grouped value census filtered by a fraction of the global
  *    total (scalar aggregate against a reused frame).
  *  - Q12/Q13/Q19: conditional counts by class, outer-join count
  *    distribution (count(col) ignoring nulls), and the OR-of-ANDs
  *    multi-branch scan predicate.
  *
  * Determinism posture (Parity): every revenue/profit sum routes
  * through fixed-scale decimals (exact, associative, order-independent
  * — identical at any partition count and in DuckDB); every
  * ORDER BY…LIMIT carries a total tiebreaker so the selected row SET is
  * unique; threshold comparisons (Q11, Q22) are exact-integer
  * cross-multiplications, never a rounded average.
  *
  * Subquery-shaped gates go through `spark.sql` over per-gate-prefixed
  * temp views — deliberately: the point of gating Q2/Q17/Q20/Q21/Q22 is
  * that Catalyst's subquery DECORRELATION machinery produces the
  * semi/anti/aggregate-join plans, which the DataFrame API cannot
  * express directly. Join/agg shapes use the DataFrame API with
  * explicit broadcasts on the bounded dims (nation/region are
  * fixed-cardinality at any scale factor).
  *
  * 100 TB posture: all fifteen are keyed joins + grouped aggregates —
  * no cartesians, no driver collects; the only `crossJoin`s ride
  * broadcast 1-row scalar frames (Q11's global total). Selective dim
  * filters (segment, type, brand, size, region) reduce before joining,
  * so the fact-side shuffle carries only surviving keys.
  */
object TpchOps2 extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  /** Exact order-independent revenue term Σ extprice·(1−discount):
    * price and discount have ≤2 decimals each, so the scale-4 decimal
    * cast is exact and the sum is associative (the [[TpchOps]] term). */
  private val rev4 =
    (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast(DecimalType(18, 4))

  /** Exact cents of a 2-decimal dollar column (the StatOps staging). */
  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast(DecimalType(18, 2)) * 100).cast("long")

  override def defs: Map[String, Q] = Map(
    // ---- Q2: min-cost supplier (per-part min over a window) --------
    // For SMALL/size-15 parts, the EUROPE suppliers whose min sale
    // price for the part equals the min over ALL EUROPE suppliers of
    // that part. TPC-H's correlated scalar subquery would re-reference
    // the partcost CTE, and Catalyst INLINES multi-referenced CTEs —
    // the executed plan scanned lineitem 3× (r14 verdict). Rewritten
    // so the fact is touched ONCE: one group-by census, broadcast dim
    // joins (part/supplier/nation/region all pre-filtered), then the
    // per-part min as a window over the already-tiny qualifying frame.
    // The part/region filters sit BELOW the window, which is sound
    // because they drop whole partkey groups, never split one.
    "q_tpch_q2" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("tq2_lineitem")
      t(s, dir, "part").createOrReplaceTempView("tq2_part")
      t(s, dir, "supplier").createOrReplaceTempView("tq2_supplier")
      t(s, dir, "nation").createOrReplaceTempView("tq2_nation")
      t(s, dir, "region").createOrReplaceTempView("tq2_region")
      s.sql("""
        |WITH partcost AS (
        |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
        |    MIN(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS cost_cents
        |  FROM tq2_lineitem GROUP BY 1, 2),
        |eucost AS (
        |  SELECT p_partkey, p_type, cost_cents, s_acctbal, s_name,
        |    n_name
        |  FROM partcost, tq2_part, tq2_supplier, tq2_nation, tq2_region
        |  WHERE p_partkey = partkey AND p_size = 15
        |    AND p_type = 'SMALL' AND s_suppkey = suppkey
        |    AND s_nationkey = n_nationkey
        |    AND n_regionkey = r_regionkey AND r_name = 'EUROPE')
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_type, cost_cents
        |FROM (SELECT *, MIN(cost_cents)
        |        OVER (PARTITION BY p_partkey) AS min_cost
        |      FROM eucost)
        |WHERE cost_cents = min_cost
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
        |""".stripMargin)
    }),

    // ---- Q4: order-priority checking (correlated EXISTS) -----------
    // Orders in one quarter with at least one lineitem shipped > 30
    // days after the order date; EXISTS decorrelates to a left-semi
    // join keyed on orderkey, with the quarter window pushed to the
    // orders scan so the semi-join probe side is already pruned.
    "q_tpch_q4" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("tq4_orders")
      t(s, dir, "lineitem").createOrReplaceTempView("tq4_lineitem")
      s.sql("""
        |SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM tq4_orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM tq4_lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY 1 ORDER BY 1
        |""".stripMargin)
    }),

    // ---- Q7: volume shipping between two nations --------------------
    // Both endpoint dims are pre-filtered to the two nations BEFORE the
    // fact joins (a 2-row broadcast each), so the lineitem shuffle
    // carries only rows whose supplier already qualifies; with both
    // endpoints in the 2-nation set, the ordered-pair predicate reduces
    // to supp_nation <> cust_nation. NATION_13/NATION_19 is the densest
    // symmetric trade pair at the sf0.001 smoke corpus (27 qualifying
    // lines), keeping the gate non-empty at every scale.
    "q_tpch_q7" -> ((s, dir) => {
      val nat2 = t(s, dir, "nation")
        .filter(col("n_name").isin("NATION_13", "NATION_19"))
      val sup = t(s, dir, "supplier")
        .join(broadcast(nat2.select(col("n_nationkey"),
          col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      val cust = t(s, dir, "customer")
        .join(broadcast(nat2.select(col("n_nationkey"),
          col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("cust_nation"))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          rev4.as("rev"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders").select(col("o_orderkey"),
          col("o_custkey")), col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // ---- Q8: national market share -----------------------------------
    // ECONOMY-part revenue into ASIA customers, per order year: what
    // share came from NATION_3 suppliers? The share closes as an exact
    // integer micro-ratio over scale-4 decimal sums (×10⁴ makes them
    // integral DECIMAL(38,0), so the floor division is engine-exact) —
    // the q_tpch_q14 pattern. region/nation broadcast everywhere.
    "q_tpch_q8" -> ((s, dir) => {
      val asiaCust = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region")
            .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val suppNat = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation").select(col("n_nationkey"),
          col("n_name").as("nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("nation"))
      val econParts = t(s, dir, "part")
        .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          rev4.as("volume"))
        .join(econParts, col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(asiaCust, col("o_custkey") === col("c_custkey"))
        .join(suppNat, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("o_year"))
        .agg(
          sum(when(col("nation") === "NATION_3", col("volume"))
            .otherwise(lit(0).cast(DecimalType(18, 4)))).as("nat"),
          sum(col("volume")).as("tot"))
        .select(col("o_year"),
          col("nat").cast("string").cast("double").as("nation_revenue"),
          col("tot").cast("string").cast("double").as("total_revenue"),
          expr("""CAST((1000000 * CAST(nat * 10000 AS DECIMAL(38,0)))
                 div CAST(tot * 10000 AS DECIMAL(38,0)) AS BIGINT)""")
            .as("mkt_share_micro"))
        .orderBy(col("o_year"))
    }),

    // ---- Q9: product-type profit --------------------------------------
    // Profit on '%red%' parts by supplier nation × order year. With no
    // partsupp, unit supply cost stands in as the part's retail price:
    // profit = Σ (extprice·(1−disc) − retail·qty), every term an exact
    // decimal (retail ≤2 decimals, quantity integral ≤50), so the sum
    // is order-independent. The name filter prunes part before the
    // fact join; nation is broadcast.
    "q_tpch_q9" -> ((s, dir) => {
      val redParts = t(s, dir, "part")
        .filter(col("p_name").like("%red%"))
        .select(col("p_partkey"),
          col("p_retailprice").cast(DecimalType(18, 2)).as("retail"))
      val suppNat = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation").select(col("n_nationkey"),
          col("n_name").as("nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("nation"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          rev4.as("rev"), col("l_quantity").cast(DecimalType(4, 0)).as("qty"))
        .join(redParts, col("l_partkey") === col("p_partkey"))
        .join(suppNat, col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders").select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"), col("o_year"))
        .agg(sum(col("rev") - col("retail") * col("qty"))
            .cast("double").as("sum_profit"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("nation"), col("o_year"))
    }),

    // ---- Q11: important stock -----------------------------------------
    // Per-part sale value from EUROPE suppliers, keeping parts above
    // 1.5× the MEAN per-part value. The original's fixed global
    // fraction (0.0001/SF) empties as the part count grows — a
    // relative-to-mean threshold is the scale-free form (14 / 331 /
    // 2930 rows at sf0.001 / 0.01 / 0.1, never empty; a 2× cut was
    // empty at the sf0.001 smoke corpus, where 200 near-uniform parts
    // top out at 1.9× the mean). The count+total is a 1-row broadcast
    // crossJoin (the repo's scalar-census pattern); the comparison is
    // an exact integer cross-multiplication (2·val_c·n_parts >
    // 3·total), never a rounded fraction.
    "q_tpch_q11" -> ((s, dir) => {
      val euroSupp = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region")
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val value = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          cents(col("l_extendedprice")).as("cents"))
        .join(euroSupp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey").as("partkey"))
        .agg(sum(col("cents")).as("val_c"))
        .select(col("partkey"), col("val_c"))
      val total = value.agg(sum(col("val_c")).as("total_c"),
        count(lit(1)).as("n_parts"))
      // DECIMAL(38,0) cross-multiply: a long product would wrap silently
      // at extreme corpus scale while DuckDB promotes to HUGEINT.
      value.crossJoin(broadcast(total))
        .filter(col("val_c").cast(DecimalType(38, 0)) * col("n_parts") * 2 >
          col("total_c").cast(DecimalType(38, 0)) * 3)
        .select(col("partkey"), col("val_c"))
        .orderBy(col("val_c").desc, col("partkey"))
    }),

    // ---- Q12: shipping classes and order priority ----------------------
    // Conditional priority counts over late-shipped R/A lineitems in one
    // year (returnflag stands in for shipmode; "late" = shipped > 45
    // days after order date). The year window and flag filter push to
    // the lineitem scan; the date-lag predicate runs on the joined row.
    "q_tpch_q12" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .join(t(s, dir, "lineitem")
          .filter(col("l_returnflag").isin("R", "A") &&
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_returnflag"),
            col("l_shipdate")),
          col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 45 DAY"))
        .groupBy(col("l_returnflag").as("ship_class"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy(col("ship_class"))),

    // ---- Q13: customer order-count distribution -------------------------
    // LEFT join with the filter IN THE JOIN CONDITION (not a post-filter
    // — a post-filter would drop order-less customers, the bug Q13
    // exists to catch), count(o_orderkey) ignoring nulls, then the
    // distribution of those counts. Two keyed aggregates, no sort until
    // the ≤ max-orders-per-customer result.
    "q_tpch_q13" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"))
        .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderpriority")),
          col("c_custkey") === col("o_custkey") &&
            col("o_orderpriority") =!= "4-NOT SPECIFIED",
          "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)),

    // ---- Q15: top supplier (view + scalar max) ---------------------------
    // The revenue view is a CTE referenced twice (body + scalar MAX);
    // argmax via `rev = (SELECT MAX(rev))` keeps ties (the spec'd Q15
    // semantics) where a LIMIT 1 would drop them. Decimal equality is
    // exact, so the tie set is engine-identical.
    // The scalar MAX re-references revenue0, and Catalyst inlines
    // multi-referenced CTEs → 2 lineitem scans (r15 sweep). Rewritten
    // as a LINEAR chain: per-bucket max window (1024-way parallel) →
    // keep bucket maxima (≤1024 rows + ties) → global max window over
    // that tiny frame. The global-max ties survive their own bucket
    // filter, so no winner is lost; total_rev is exact DECIMAL so the
    // equality is boundary-safe. One fact scan, no single-partition
    // window over the supplier-sized frame.
    "q_tpch_q15" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("tq15_lineitem")
      t(s, dir, "supplier").createOrReplaceTempView("tq15_supplier")
      s.sql("""
        |WITH revenue0 AS (
        |  SELECT l_suppkey AS supplier_no,
        |    SUM(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,4))) AS total_rev
        |  FROM tq15_lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1),
        |cand AS (
        |  SELECT supplier_no, total_rev FROM (
        |    SELECT supplier_no, total_rev,
        |      MAX(total_rev) OVER (PARTITION BY
        |        pmod(hash(supplier_no), 1024)) AS bmax
        |    FROM revenue0)
        |  WHERE total_rev = bmax)
        |SELECT s_suppkey, s_name,
        |  CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM tq15_supplier JOIN (
        |  SELECT supplier_no, total_rev FROM (
        |    SELECT supplier_no, total_rev,
        |      MAX(total_rev) OVER () AS gmax FROM cand)
        |  WHERE total_rev = gmax) ON s_suppkey = supplier_no
        |ORDER BY s_suppkey
        |""".stripMargin)
    }),

    // ---- Q16: supplier counts by part attrs (NOT IN) ----------------------
    // Distinct suppliers per surviving (brand, type, size), excluding
    // negative-balance suppliers via NOT IN — the null-aware anti-join
    // shape (s_suppkey is non-null here, but the PLAN is the null-aware
    // one, which is what this gate pins). Part attribute filters prune
    // before the fact join.
    "q_tpch_q16" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("tq16_lineitem")
      t(s, dir, "part").createOrReplaceTempView("tq16_part")
      t(s, dir, "supplier").createOrReplaceTempView("tq16_supplier")
      s.sql("""
        |SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM tq16_lineitem JOIN tq16_part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM tq16_supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        |""".stripMargin)
    }),

    // ---- Q17: small-quantity-order revenue (correlated scalar avg) -------
    // Brand lines with quantity below 0.2× the PART's average quantity.
    // The correlated avg decorrelates into a per-part aggregate join.
    // Quantities are integral doubles (exact sums < 2⁵³ in any order),
    // so avg → ×0.2 → compare is the same double arithmetic on both
    // engines; the revenue closes through an exact decimal sum.
    // The correlated AVG would decorrelate into a SECOND lineitem pass
    // (r15 sweep: 2 scans). Single pass instead: the brand filter drops
    // whole partkey groups (a part has one brand), so the per-part avg
    // over the broadcast-join-pruned fact equals the correlated avg —
    // computed as a window over l_partkey, one shuffle, one scan.
    "q_tpch_q17" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("tq17_lineitem")
      t(s, dir, "part").createOrReplaceTempView("tq17_part")
      s.sql("""
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    AS DOUBLE) / 7.0 AS avg_yearly,
        |  COUNT(*) AS n_lines
        |FROM (
        |  SELECT l_extendedprice, l_quantity,
        |    AVG(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
        |  FROM tq17_lineitem, tq17_part
        |  WHERE p_partkey = l_partkey AND p_brand = 'Brand#5')
        |WHERE l_quantity < 0.2 * avg_qty
        |""".stripMargin)
    }),

    // ---- Q19: discounted revenue (OR-of-ANDs) ------------------------------
    // Three (brand, size-band, quantity-band) branches OR'd across the
    // part⋈lineitem join — the disjunctive-pushdown shape. The common
    // conjunct (returnflag = 'N') and the derivable quantity envelope
    // live on the fact side of every branch; the brand/size terms prune
    // part before the join.
    "q_tpch_q19" -> ((s, dir) => {
      val j = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "N")
        .select(col("l_partkey"), col("l_quantity"), rev4.as("rev"))
        .join(t(s, dir, "part")
          .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
            col("p_size").between(1, 15))
          .select(col("p_partkey"), col("p_brand"), col("p_size")),
          col("l_partkey") === col("p_partkey"))
      j.filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(sum(col("rev")).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // ---- Q20: potential part promotion (nested IN subqueries) -------------
    // AMERICA suppliers who moved > 100 units of 'red…' parts in 1996:
    // an IN over a grouped HAVING subquery whose own part filter is
    // another IN — both decorrelate to semi-joins; quantity sums are
    // integral doubles (exact). The 100-unit cut keeps the gate
    // non-empty at the driver's sf0.001 smoke corpus while staying
    // selective at every larger scale (1 / 25 / 177 suppliers survive
    // at sf0.001 / 0.01 / 0.1; the original 400 cut returned 0 rows at
    // sf0.001, tripping the every-gate-returns-rows contract).
    "q_tpch_q20" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("tq20_lineitem")
      t(s, dir, "part").createOrReplaceTempView("tq20_part")
      t(s, dir, "supplier").createOrReplaceTempView("tq20_supplier")
      t(s, dir, "nation").createOrReplaceTempView("tq20_nation")
      t(s, dir, "region").createOrReplaceTempView("tq20_region")
      s.sql("""
        |SELECT s_name, s_acctbal
        |FROM tq20_supplier JOIN tq20_nation ON s_nationkey = n_nationkey
        |JOIN tq20_region ON n_regionkey = r_regionkey
        |WHERE s_suppkey IN (
        |    SELECT l_suppkey FROM tq20_lineitem
        |    WHERE l_partkey IN
        |        (SELECT p_partkey FROM tq20_part
        |         WHERE p_name LIKE 'red%')
        |      AND l_shipdate >= TIMESTAMP '1996-01-01'
        |      AND l_shipdate < TIMESTAMP '1997-01-01'
        |    GROUP BY l_suppkey HAVING SUM(l_quantity) > 100)
        |  AND r_name = 'AMERICA'
        |ORDER BY s_name
        |""".stripMargin)
    }),

    // ---- Q21: suppliers who kept orders waiting (per-order census) --------
    // For finalized multi-supplier orders, the supplier who was the ONLY
    // late one (late = shipped > 60 days after order date). TPC-H's
    // EXISTS + NOT EXISTS re-references lineitem/the late CTE, and
    // Catalyst INLINES multi-referenced CTEs — the executed plan scanned
    // lineitem 6× and orders 3× (r14 verdict). Rewritten as ONE pass:
    // per order, count distinct suppliers overall and among late lines;
    // an order contributes iff >1 suppliers total and exactly 1 late
    // supplier, and then contributes its late-row count (the original
    // counted late l1 ROWS, so multiplicity is preserved via
    // SUM(n_late_rows), not COUNT(order)). One orderkey join + one
    // orderkey group-by (exchange reused), then broadcast supplier/nation.
    "q_tpch_q21" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("tq21_lineitem")
      t(s, dir, "orders").createOrReplaceTempView("tq21_orders")
      t(s, dir, "supplier").createOrReplaceTempView("tq21_supplier")
      t(s, dir, "nation").createOrReplaceTempView("tq21_nation")
      s.sql("""
        |WITH per_order AS (
        |  SELECT l_orderkey,
        |    COUNT(DISTINCT l_suppkey) AS nsupp_all,
        |    COUNT(DISTINCT CASE
        |      WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |      THEN l_suppkey END) AS nsupp_late,
        |    MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |      THEN l_suppkey END) AS late_supp,
        |    SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |      THEN 1 ELSE 0 END) AS n_late_rows
        |  FROM tq21_lineitem JOIN tq21_orders
        |    ON o_orderkey = l_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY l_orderkey)
        |SELECT s_name, SUM(n_late_rows) AS numwait
        |FROM per_order, tq21_supplier, tq21_nation
        |WHERE s_suppkey = late_supp AND nsupp_all > 1
        |  AND nsupp_late = 1
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_13'
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
        |""".stripMargin)
    }),

    // ---- Q22: global sales opportunity (NOT EXISTS + scalar threshold) ----
    // Customers in a country-code set (nationkey mod 7 stands in for the
    // absent phone prefix) with above-average positive balances and no
    // orders since 2000. The average threshold is an exact integer
    // cross-multiplication (balance_cents × count > Σcents) — a rounded
    // avg could flip a boundary row between engines; this cannot.
    "q_tpch_q22" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("tq22_customer")
      t(s, dir, "orders").createOrReplaceTempView("tq22_orders")
      s.sql("""
        |WITH pos AS (
        |  SELECT COUNT(*) AS cnt,
        |    SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS sum_c
        |  FROM tq22_customer
        |  WHERE c_acctbal > 0.0 AND (c_nationkey % 7) IN (1, 2, 3))
        |SELECT CAST(c_nationkey % 7 AS BIGINT) AS cntrycode,
        |  COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS totacctbal
        |FROM tq22_customer
        |WHERE (c_nationkey % 7) IN (1, 2, 3)
        |  AND CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * (SELECT cnt FROM pos) > (SELECT sum_c FROM pos)
        |  AND NOT EXISTS (SELECT 1 FROM tq22_orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY 1
        |""".stripMargin)
    }))

  override def oracle: Map[String, String] = Map(
    "q_tpch_q2" ->
      """WITH partcost AS (
        |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
        |    MIN(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS cost_cents
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_type, cost_cents
        |FROM part, partcost, supplier, nation, region
        |WHERE p_partkey = partkey AND s_suppkey = suppkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE' AND p_size = 15 AND p_type = 'SMALL'
        |  AND cost_cents = (
        |    SELECT MIN(pc2.cost_cents)
        |    FROM partcost pc2, supplier s2, nation n2, region r2
        |    WHERE pc2.partkey = p_partkey AND s2.s_suppkey = pc2.suppkey
        |      AND s2.s_nationkey = n2.n_nationkey
        |      AND n2.n_regionkey = r2.r_regionkey
        |      AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q_tpch_q4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_19')
        |    OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_13'))
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_tpch_q8" ->
      """WITH all_nations AS (
        |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |      AS volume,
        |    n1.n_name AS nation
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  JOIN region ON n2.n_regionkey = r_regionkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN part ON p_partkey = l_partkey
        |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'),
        |s AS (SELECT o_year,
        |    SUM(CASE WHEN nation = 'NATION_3' THEN volume
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS nat,
        |    SUM(volume) AS tot
        |  FROM all_nations GROUP BY 1)
        |SELECT o_year,
        |  CAST(CAST(nat AS VARCHAR) AS DOUBLE) AS nation_revenue,
        |  CAST(CAST(tot AS VARCHAR) AS DOUBLE) AS total_revenue,
        |  CAST((1000000 * CAST(nat * 10000 AS HUGEINT))
        |    // CAST(tot * 10000 AS HUGEINT) AS BIGINT)
        |    AS mkt_share_micro
        |FROM s ORDER BY o_year""".stripMargin,

    "q_tpch_q9" ->
      """SELECT n_name AS nation,
        |  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,4))
        |    - CAST(p_retailprice AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(4,0))) AS DOUBLE)
        |    AS sum_profit,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_tpch_q11" ->
      """WITH val AS (
        |  SELECT l_partkey AS partkey,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS val_c
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE' GROUP BY 1)
        |SELECT partkey, CAST(val_c AS BIGINT) AS val_c FROM val
        |WHERE val_c * (SELECT COUNT(*) FROM val) * 2
        |  > 3 * (SELECT SUM(val_c) FROM val)
        |ORDER BY val_c DESC, partkey""".stripMargin,

    "q_tpch_q12" ->
      """SELECT l_returnflag AS ship_class,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_returnflag IN ('R', 'A')
        |  AND l_shipdate > o_orderdate + INTERVAL 45 DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_tpch_q13" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey
        |      AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY 1)
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_tpch_q15" ->
      """WITH revenue0 AS (
        |  SELECT l_suppkey AS supplier_no,
        |    SUM(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,4))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name,
        |  CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM supplier, revenue0
        |WHERE s_suppkey = supplier_no
        |  AND total_rev = (SELECT MAX(total_rev) FROM revenue0)
        |ORDER BY s_suppkey""".stripMargin,

    "q_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q_tpch_q17" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    AS DOUBLE) / 7.0 AS avg_yearly,
        |  COUNT(*) AS n_lines
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#5'
        |  AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
        |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,

    "q_tpch_q19" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity BETWEEN 1 AND 11 AND l_returnflag = 'N')
        |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 10 AND 20 AND l_returnflag = 'N')
        |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 20 AND 30
        |    AND l_returnflag = 'N')""".stripMargin,

    "q_tpch_q20" ->
      """SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    WHERE l_partkey IN
        |        (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |      AND l_shipdate >= TIMESTAMP '1996-01-01'
        |      AND l_shipdate < TIMESTAMP '1997-01-01'
        |    GROUP BY l_suppkey HAVING SUM(l_quantity) > 100)
        |  AND r_name = 'AMERICA'
        |ORDER BY s_name""".stripMargin,

    "q_tpch_q21" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_13'
        |GROUP BY s_name ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,

    "q_tpch_q22" ->
      """WITH pos AS (
        |  SELECT COUNT(*) AS cnt,
        |    SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS sum_c
        |  FROM customer
        |  WHERE c_acctbal > 0.0 AND (c_nationkey % 7) IN (1, 2, 3))
        |SELECT CAST(c_nationkey % 7 AS BIGINT) AS cntrycode,
        |  COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS totacctbal
        |FROM customer
        |WHERE (c_nationkey % 7) IN (1, 2, 3)
        |  AND CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * (SELECT cnt FROM pos) > (SELECT sum_c FROM pos)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
