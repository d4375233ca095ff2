package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Scale-out trailing RANGE frames (SURVEY §2.5).
  *
  * `RANGE BETWEEN L PRECEDING AND CURRENT ROW` partitioned only by a
  * low-cardinality key runs in |keys| tasks no matter how large the
  * cluster — the frame is inherently serial *per window partition*, so the
  * fix is to manufacture partitions: bucket the ordering key into
  * `bucketWidth`-wide ranges, replicate each bucket's trailing `lookback`
  * fringe into the NEXT bucket (rows a frame near a bucket's start must
  * see), run the identical frame per (partition, bucket), and drop the
  * replicated fringe rows from the output.
  *
  * Exactness: a row with ordering value v in bucket q = ⌊v/W⌋ has frame
  * [v − L, v]. Values below q·W lie in [q·W − L, q·W) ⊆ the previous
  * bucket's replicated fringe (W ≥ L required), so every frame sees
  * exactly the rows the unbucketed window would — asserted
  * frame-for-frame against the single-window form in PlanSpec, and by
  * the unchanged q_window_range oracle hash.
  *
  * Cost: one shuffle (same as the plain window) carrying ≤ (1 + L/W)× the
  * rows; parallelism |keys| × (value range / W) instead of |keys|.
  * Aggregates must be order-independent within the frame (sums, counts,
  * min/max — anything but positional functions) since fringe rows change
  * intra-frame sort ties.
  */
object ParallelRange {

  /** `df` + `outName` = aggOver(frame) where the frame is the trailing
    * range [orderCol − lookback, orderCol] within `partitionCols`,
    * computed with (value-range / bucketWidth)-way parallelism per key.
    *
    * `orderCol` must be a non-negative integral column (bucketing uses
    * floor division); `bucketWidth` ≥ `lookback`. */
  def trailing(df: DataFrame, partitionCols: Seq[Column], orderCol: Column,
      lookback: Long, bucketWidth: Long)(
      aggOver: WindowSpec => Column, outName: String): DataFrame = {
    require(bucketWidth >= lookback,
      s"bucketWidth ($bucketWidth) must cover the lookback ($lookback) " +
        "so one previous-bucket fringe suffices")
    // exact integer floor division — a double division would round keys
    // above 2^53 into the wrong bucket while the fringe pmod stays exact,
    // silently dropping rows from neighboring frames. (v − v mod W) is
    // divisible by W, so the decimal division is exact at any magnitude.
    val bucketOf = ((orderCol - pmod(orderCol, lit(bucketWidth)))
      .cast(org.apache.spark.sql.types.DecimalType(38, 0)) / bucketWidth)
      .cast("long")
    // one scan: rows in the trailing fringe of a bucket explode into two
    // copies (own bucket + the next bucket, tagged) — a union of base and
    // fringe frames would read the source twice
    val own = struct(bucketOf.as("b"), lit(false).as("f"))
    val replicated = struct((bucketOf + 1).as("b"), lit(true).as("f"))
    val tagged = df
      .withColumn("__t", explode(
        when(pmod(orderCol, lit(bucketWidth)) >= bucketWidth - lookback,
          array(own, replicated))
          .otherwise(array(own))))
      .withColumn("__bucket", col("__t.b"))
      .withColumn("__fringe", col("__t.f"))
      .drop("__t")
    val w = Window
      .partitionBy(partitionCols :+ col("__bucket"): _*)
      .orderBy(orderCol)
      .rangeBetween(-lookback, Window.currentRow)
    tagged
      .withColumn(outName, aggOver(w))
      .filter(!col("__fringe"))
      .drop("__bucket", "__fringe")
  }
}
