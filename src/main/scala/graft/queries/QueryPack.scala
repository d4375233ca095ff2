package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A named bundle of driver-checkable queries: each entry pairs a Spark plan
  * with (where SQL-expressible) an ANSI-SQL oracle DuckDB runs over the same
  * parquet tables. Packs compose into [[graft.SparkEntry]].
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def defs: Map[String, Q]
  /** DuckDB-runnable oracle per query name; omit a key for rows-only checks. */
  def oracle: Map[String, String]
}

/** Cross-engine determinism helpers.
  *
  * The driver hash-compares Spark results against DuckDB. Double aggregation
  * is order-dependent (Spark's partial aggregation sums in shuffle order,
  * DuckDB in its own scan order), so any `sum(double)` would differ in the
  * last bits between engines. The fix: route sums through fixed-scale
  * decimals — decimal addition is exact and associative, so the result is
  * bit-identical regardless of execution order or engine, and the final cast
  * back to double is deterministic. The same trick in the oracle SQL keeps
  * both sides comparable. This is also the right call at 100 TB: a result
  * that changes with partition count is not reproducible.
  */
object Parity {
  /** Order-independent sum of a double column, returned as double. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Order-independent mean: exact decimal sum / count, divided as doubles. */
  def davg(c: Column, scale: Int = 4): Column =
    (sum(c.cast(DecimalType(18, scale))).cast("double") /
      count(c).cast("double"))

  /** Oracle-side SQL for [[dsum]]. */
  def sqlDsum(expr: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** Oracle-side SQL for [[davg]]. */
  def sqlDavg(expr: String, scale: Int = 4): String =
    s"(CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE) / CAST(COUNT($expr) AS DOUBLE))"

  /** Deterministic string form of a collected list: sort, then join.
    * Used wherever the reference collects per-group lists (warnify,
    * /root/reference/src/from-ground-up.js:245-260) so the result does not
    * depend on row arrival order in either engine. */
  def collectSorted(c: Column, sep: String = "|"): Column =
    array_join(sort_array(collect_list(c)), sep)

  def sqlCollectSorted(expr: String, sep: String = "|"): String =
    s"ARRAY_TO_STRING(LIST_SORT(LIST($expr)), '$sep')"

  /** Planted-variant id fixtures use `id + VariantOffset`; that is only
    * injective while every base id stays below the offset. This row-level
    * guard (shared by every fixture site — one definition, one bound)
    * fails the job loudly on corpus growth past the offset instead of
    * silently aliasing a real row as another's variant while engine and
    * oracle stay green together. Rides the scan; no extra pass.
    *
    * 10¹² (round 14 — was 10⁶, which the sf1 probe corpus's replica-
    * offset orderkeys tripped): covers base ids through a ~sf100000
    * (100 TB-class) corpus while variant ids stay ≈ 10⁻⁴·2⁵³, far
    * inside the output contract. Oracle SQL embeds the same literal. */
  val VariantOffset: Long = 1000000000000L

  def guardedVariantId(id: Column): Column =
    when(id < VariantOffset, id).otherwise(raise_error(concat(
      lit("planted-variant offset no longer injective: id "),
      id.cast("string"), lit(s" >= $VariantOffset"))))

  /** Ceiling for span-bounded collected arrays (q_holt_linear's daily
    * spine, q_survival_km's hazard cells): ~45 years of days. The
    * single-row fold queries collect one struct per day of the date
    * span — bounded by the CALENDAR, not the corpus, so they stay O(1)
    * as data grows — but a corrupt date (year 9999) or a genuinely
    * centuries-wide corpus would grow the driver-free array (and the
    * O(span²) folds over it) silently. [[guardedSpanValue]] turns that
    * into a loud job failure at the 1-row bounds aggregate. */
  val MaxSpanCells: Long = 16384L

  /** Row-level guard: pass `v` through unchanged while `span ≤ max`,
    * raise loudly otherwise. Rides the bounds row — no extra pass. */
  def guardedSpanValue(v: Column, span: Column, max: Long,
      what: String): Column =
    when(span <= max, v).otherwise(raise_error(concat(
      lit(s"$what: span "), span.cast("string"),
      lit(s" exceeds the $max-cell guard - a corrupt date or a corpus " +
        "wider than the declared envelope; widen MaxSpanCells only with " +
        "a measured fold-cost budget"))))
}
