package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing — assigning whole documents to
  * fixed-budget "packs" (context windows / training batches) is the last
  * batching step of a training-data pipeline.
  *
  * Semantics: within each `partitionCols` group, documents accumulate
  * `weightCol` in `orderCol` order; a document belongs to pack
  * `(running_total_before_it) div budget`. Documents are never split, a
  * pack overflows its budget by at most one document's weight, and the
  * assignment is a pure function of (order, weights) — the boundary rule
  * needs no per-row reset state, so it is expressible as ONE window
  * cumulative sum (a single shuffle on the partition key, linear work,
  * spillable window frame) instead of a sequential fold, and any engine
  * can replay it (the DuckDB oracle does, with the same integer division).
  *
  * The greedy-reset variant ("close the pack when the NEXT doc would
  * overflow") is deliberately not this operator: it is inherently
  * sequential per group (each boundary depends on the previous one), so
  * at 100 TB it only exists as a per-group mapPartitions fold; the
  * boundary rule gives the same ≤1-doc overflow guarantee declaratively.
  *
  * Parallelism is |distinct partition keys| — for one giant key, bucket
  * the order key first (the [[ParallelRange]] trick) or pack per shard. */
object Packing {

  /** Adds `pack_id` (0-based per partition group) to `df`.
    * `weightCol` must be non-negative integral; `orderCol` should be
    * unique within a group for a deterministic assignment. */
  def byBudget(df: DataFrame, partitionCols: Seq[Column], orderCol: Column,
      weightCol: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val before = (sum(weightCol).over(w) - weightCol).cast("long")
    // exact integer floor division at any magnitude (the ParallelRange
    // trick): a double division would misassign packs once the running
    // total passes 2^53
    val packId = ((before - pmod(before, lit(budget)))
      .cast(org.apache.spark.sql.types.DecimalType(38, 0)) / budget)
      .cast("long")
    df.withColumn("pack_id", packId)
  }
}
