package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — the multi-dimensional clustering key
  * behind data skipping at 100 TB: sort-write a table by the interleaved
  * bits of two range-queried columns and a scan filtered on EITHER column
  * prunes most files by their min/max footer stats, where a single-column
  * sort only skips for its own leading column.
  *
  * The z-value interleaves the low `bits` of two non-negative ints with
  * the standard binary-magic-numbers bit spread — five shift/mask steps
  * per coordinate, all codegen'd built-in bitwise ops (no UDF, no hint of
  * a shuffle: the z-value is a narrow projection; the layout write that
  * uses it is an ordinary `repartitionByRange(z).sortWithinPartitions(z)`
  * — one range exchange, exactly what any sorted write costs).
  *
  * [[sqlZValue]] replays the identical arithmetic in DuckDB SQL — the
  * value, not just the ordering, is the cross-engine contract.
  */
object Layout {

  /** Bit-spread masks for 16-bit interleave: after step i, the bits of x
    * sit at even positions within 2^(4-i)-wide groups. */
  private val spreads = Seq(
    (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))

  /** Spread the low 16 bits of `c` onto even bit positions (0, 2, ..30). */
  private def spread16(c: Column): Column =
    spreads.foldLeft(c.bitwiseAND(lit(0xFFFFL))) { case (acc, (sh, mask)) =>
      acc.bitwiseOR(shiftleft(acc, sh)).bitwiseAND(lit(mask))
    }

  /** Morton z-value of (`a`, `b`): a's bits at even positions, b's at odd.
    * Both inputs are masked to their low 16 bits — callers bucket or clamp
    * wider domains first (e.g. `col % 65536`, or a quantile bucket for
    * skewed domains). 32 significant result bits, always non-negative. */
  def zValue(a: Column, b: Column): Column =
    spread16(a.cast("long")).bitwiseOR(shiftleft(spread16(b.cast("long")), 1))

  /** DuckDB replay of [[zValue]] over SQL expressions `a`, `b`. */
  def sqlZValue(a: String, b: String): String = {
    def spread(e: String): String =
      spreads.foldLeft(s"(CAST($e AS BIGINT) & 65535)") { case (acc, (sh, mask)) =>
        s"((($acc | ($acc << $sh)) & $mask))"
      }
    s"(${spread(a)} | (${spread(b)} << 1))"
  }

  /** Z-order-clustered parquet write: range-partition on the z-value of
    * (`a`, `b`) into `numFiles` output tasks and sort each within itself —
    * every file then covers one compact z-range, i.e. a bounded tile in
    * BOTH dimensions, which is what lets min/max footer stats prune scans
    * filtered on either column.
    *
    * Both dimensions are min/max-scaled to the full 16-bit budget first
    * (one cheap global agg). Raw interleave is worthless on unequal
    * domains: a 0..149 key against a 0..2400 key leaves the narrow key's
    * high bits constant, so every range cut falls in the wide key's bits
    * and the "tiles" span the narrow dimension entirely — the same reason
    * production z-order implementations interleave rank/range ids, never
    * raw values. Costs exactly what any sorted write costs (one range
    * exchange + per-task sort); the z column is dropped from the stored
    * schema. */
  def writeZOrdered(df: org.apache.spark.sql.DataFrame, path: String,
      a: Column, b: Column, numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be positive, got $numFiles")
    val Array(bounds) = df
      .agg(min(a).cast("double").as("amin"), max(a).cast("double").as("amax"),
        min(b).cast("double").as("bmin"), max(b).cast("double").as("bmax"))
      .collect()
    if (bounds.isNullAt(0)) {
      // Empty input: min/max aggregate to NULL and getDouble would NPE.
      // There is nothing to cluster — write the (empty) frame as-is so the
      // caller still gets a readable parquet dataset with this schema.
      df.write.mode("overwrite").parquet(path)
      return
    }
    def scaled(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else floor((c.cast("double") - lo) / (hi - lo) * 65535.0).cast("long")
    df.withColumn("__z", zValue(
        scaled(a, bounds.getDouble(0), bounds.getDouble(1)),
        scaled(b, bounds.getDouble(2), bounds.getDouble(3))))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
