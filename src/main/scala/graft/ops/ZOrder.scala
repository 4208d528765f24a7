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
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    zValueN(Seq(a, b), bits)

  /** N-dimensional Morton interleave, round-robin: bit i of dimension j
    * lands at position `i·n + j` (dimension 0 owns the least-significant
    * slot of each round, matching the 2-dim layout). `n·bits` must fit a
    * signed long.
    */
  def zValueN(dims: Seq[Column], bits: Int): Column = {
    val n = dims.length
    require(n >= 1, "at least one dimension")
    require(bits >= 1 && n * bits <= 63,
      s"$n dims × $bits bits = ${n * bits} exceeds a signed long")
    dims.zipWithIndex.flatMap { case (c, j) =>
      val cl = c.cast("long")
      (0 until bits).map(i =>
        shiftleft(shiftrightunsigned(cl, i).bitwiseAND(lit(1L)), i * n + j))
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
