package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) keys for multi-dimensional data clustering.
  *
  * Sorting or range-partitioning a table by the interleaved-bit key of
  * two dimensions gives every parquet file/row-group a TIGHT min/max
  * envelope on BOTH dimensions at once, so range predicates on either
  * dimension prune at the scan — the standard layout trick for "filter
  * by user AND by time" workloads where a single-column sort only helps
  * one of the two. The reference's clustered ingestion buffering
  * (append/table_inserter.h:28-40) is the one-dimensional version of the
  * same idea; this is the n-dimensional generalization a 100 TB events
  * table wants.
  *
  * Everything is the classic mask-shift spreading ladder in plain Column
  * arithmetic — no UDF, stays inside whole-stage codegen, and is exactly
  * reproducible in ANSI SQL for the oracle.
  */
object ZOrder {

  /** Spread the low 16 bits of a non-negative value so bit i lands at
    * bit 2i: 0b1111 → 0b01010101.
    */
  def spread16(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xffffL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00ff00ffL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0f0f0f0fL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
    x
  }

  /** 32-bit Morton key interleaving the low 16 bits of `a` (odd bit
    * positions) and `b` (even bit positions).
    */
  def zValue(a: Column, b: Column): Column =
    shiftleft(spread16(a), 1).bitwiseOR(spread16(b))
}
