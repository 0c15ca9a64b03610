package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout helpers: keys that cluster multi-dimensional locality into
  * one sort order, so files written in that order serve min/max pruning on
  * EVERY interleaved dimension (the Z-order trick behind Delta/Iceberg
  * OPTIMIZE ZORDER — public technique, Morton 1966).
  */
object Layout {

  /** Morton (Z-order) value: bitwise interleave of the low `bits` bits of
    * two non-negative integer columns (a's bit i at position 2i, b's at
    * 2i+1). Pure bitwise built-ins — codegen'd, and exactly reproducible
    * in any engine with integer shifts.
    *
    * At 100 TB: `df.repartitionByRange(col) .sortWithinPartitions(zValue)`
    * then write; a filter on EITHER dimension prunes row groups by
    * parquet min/max stats instead of only the leading sort column.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }
}
