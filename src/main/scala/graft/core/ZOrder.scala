package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) curve math for multi-column data-skipping
  * layouts.
  *
  * Sorting a table by the bit-interleaved z-value of two filter
  * columns clusters BOTH columns at once: every contiguous file/row
  * group then has narrow min-max ranges on each column, so parquet
  * footer stats let a scan skip most files for a predicate on EITHER
  * column — the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER`,
  * here under explicit control (ZOrderSpec measures the per-file
  * range shrink vs a single-column sort). Pure integer bit math —
  * identical in Spark and the DuckDB oracle.
  */
object ZOrder {

  /** Bit-interleaved z-value of two non-negative ints: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. Inputs must fit in
    * `bits` bits (caller guarantees; 16 bits covers 65k distinct
    * values — at 100 TB you z-order on range-bucketed coordinates,
    * not raw keys). */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      (shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)).cast(LongType)
    }.reduce(_ + _)

  /** The same interleave as DuckDB SQL (for oracles). */
  def zValueSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
}
