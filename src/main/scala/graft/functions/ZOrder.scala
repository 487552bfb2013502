package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key for multi-dimension data skipping.
  *
  * Linear sort-on-write clusters row-group min/max stats for ONE leading
  * column; a predicate on any other column scans everything
  * (PartitionedWriteSpec pins both facts). Interleaving the bits of two
  * range-filtered columns gives every row group a bounded span in BOTH
  * dimensions, so narrow predicates on either column skip most groups —
  * the standard lakehouse OPTIMIZE ZORDER BY layout, expressed as a plain
  * sort key.
  *
  * The key is built from codegen'd shift/and/or built-ins only (no UDF, no
  * HOF): `bits` pairs of mask-shift terms OR'd together. Columns must be
  * non-negative integers that fit in `bits` bits (at 100 TB: rank or
  * bucket the raw values first if unbounded).
  */
object ZOrder {

  /** Morton-interleave two non-negative integral columns: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1.
    */
  def zvalue(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31]: $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }
}
