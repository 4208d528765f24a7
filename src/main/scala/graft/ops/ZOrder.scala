package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — multi-dimensional data locality for the
  * write path.
  *
  * A layout sorted on ONE column prunes files/row-groups on that column
  * only; a filter on any other column scans everything. Interleaving the
  * bits of two dimensions into one sort key makes every contiguous key
  * range a small bounding box in BOTH dimensions, so parquet min/max
  * stats prune on either column (or both) — the technique behind Delta's
  * `OPTIMIZE ZORDER BY`, here as a plain column expression + writer with
  * no table-format dependency.
  *
  * At 100 TB this is a write-once cost (one range exchange, the same
  * shuffle any sorted write pays) that converts the dominant read pattern
  * — point/range lookups on (key, time) — from full scans to
  * O(matching-box) scans on both predicates.
  *
  * The interleave is pure codegen'd column math (shift/and/or), map-only,
  * and engine-replayable bit-for-bit: the DuckDB oracle (d89) evaluates
  * the identical shift-mask-or expression.
  */
object ZOrder {

  /** Bit-interleave of two non-negative long columns onto `bits` bits
    * each: `a`'s bit i lands at position 2i, `b`'s at 2i+1. Inputs must
    * already lie in [0, 2^bits) — see [[normalize]]; out-of-range high
    * bits are simply ignored (masked by construction).
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits must be in 1..31")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftrightunsigned(al, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftrightunsigned(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Fold an arbitrary non-negative long column onto the z-grid
    * [0, 2^bits): modulo for dense ids / bounded magnitudes. For columns
    * without a bounded range, pre-bucket (e.g. time → epoch-minute) or
    * rank-normalize before interleaving.
    */
  def normalize(c: Column, bits: Int): Column =
    pmod(c.cast("long"), lit(1L << bits))
}
