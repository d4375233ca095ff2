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
}
