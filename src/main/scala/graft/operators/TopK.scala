package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group top-k via a bounded-buffer Aggregator (SURVEY §2.6 / §2.9).
  *
  * The window form (`row_number().over(partitionBy(g).orderBy(s desc)) <= k`)
  * shuffles and sorts EVERY row of every group; this operator's partial
  * aggregation prunes to k rows per group per map task before the exchange,
  * so at 100 TB the shuffle carries ≤ k·|groups|·|tasks| candidate entries
  * instead of the full table — the same reason global top-k plans
  * TakeOrderedAndProject. Catalyst runs typed Aggregators through
  * ObjectHashAggregate with a partial stage (asserted in PlanSpec).
  *
  * Ordering contract matches the window form exactly: score descending,
  * id ascending on ties — so the two plans are interchangeable and share
  * one oracle.
  */
class TopKAggregator(k: Int)
    extends Aggregator[TopKAggregator.In, List[TopKAggregator.In], Seq[TopKAggregator.In]] {
  import TopKAggregator.In

  // java.lang.Double.compare, not >/==: the window form sorts DESC under
  // Spark's total order (NaN first, -0.0 below 0.0), and raw double ops
  // would displace a NaN score and tie -0.0 with 0.0
  private def better(a: In, b: In): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  /** Insert into a descending-sorted bounded list (k is small; the O(k)
    * insertion beats re-sorting per row). */
  private def insert(sorted: List[In], x: In): List[In] = {
    val (hi, lo) = sorted.span(better(_, x))
    val merged = hi ::: x :: lo
    if (merged.length > k) merged.take(k) else merged
  }

  override def zero: List[In] = Nil
  override def reduce(b: List[In], a: In): List[In] = insert(b, a)
  override def merge(a: List[In], b: List[In]): List[In] =
    b.foldLeft(a)(insert)
  override def finish(r: List[In]): Seq[In] = r

  override def bufferEncoder: Encoder[List[In]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[In]]()
  override def outputEncoder: Encoder[Seq[In]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[In]]()
}

object TopKAggregator {
  case class In(score: Double, id: Long)
}

object TopK {

  /** groupBy(groupCols).top-k rows by `scoreCol` (desc, `idCol` asc ties):
    * returns (groupCols..., id, score, rank). Rows with a null score or id
    * are excluded up front (the typed buffer is primitive-valued) — this
    * matches the window form whenever k does not reach into its NULLS LAST
    * tail. */
  def perGroup(df: DataFrame, groupCols: Seq[String], scoreCol: Column,
      idCol: Column, k: Int): DataFrame = {
    val agg = udaf(new TopKAggregator(k))
    val grouped = df
      .filter(scoreCol.isNotNull && idCol.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(scoreCol.cast("double"), idCol.cast("long")).as("__topk"))
    grouped
      .select(groupCols.map(col) :+ posexplode(col("__topk")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("col.id").as("id"), col("col.score").as("score"),
        (col("pos") + 1).cast("int").as("rank")): _*)
  }
}
