package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout functions — the write-side levers that make 100 TB
  * readable: multi-dimensional clustering via a Z-order (Morton)
  * space-filling curve. Sorting a table by `zorder16(a, b)` before a
  * range-partitioned write gives every output file a SMALL bounding
  * box in (a, b) space, so parquet row-group min/max statistics skip
  * files for predicates on EITHER column — the property a single-column
  * sort only provides for its leading column. (Engine extension; the
  * reference has no storage layout concept. Same technique as Delta
  * Lake's OPTIMIZE ZORDER BY, re-expressed as a plain column
  * expression + repartitionByRange.)
  *
  * Pure integer bit math built from codegen'd builtins (shifts, masks,
  * adds — no UDF), identical in any engine with 64-bit integers; the
  * DuckDB twin [[zorder16Sql]] is generated term-for-term.
  */
object LayoutFunctions {

  /** Interleave the low 16 bits of two non-negative longs into a
    * 32-bit Morton code: bit i of `a` lands at position 2i, bit i of
    * `b` at 2i+1. Inputs are masked to 16 bits first, so out-of-range
    * values wrap rather than corrupt high bits (callers own choosing
    * dimensions that fit — 16 bits per axis is the file-skipping
    * resolution, not a data constraint). */
  def zorder16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      val abit = shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
      val bbit = shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
      abit + bbit
    }.reduce(_ + _)

  /** DuckDB twin of [[zorder16]] (same term order). */
  def zorder16Sql(a: String, b: String): String =
    (0 until 16).map { i =>
      s"(((($a) >> $i) & 1) << ${2 * i}) + (((($b) >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
}
