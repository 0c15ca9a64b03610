package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the latest right row with
  * `rightTs <= leftTs` within the same key — the lookup every
  * training-data pipeline needs for feature joins without leakage.
  *
  * Spark has no native as-of join; per the build preference order this is
  * COMPOSED from built-ins rather than a custom physical operator:
  * tag + union + per-key window with a running `last(_, ignoreNulls)`
  * carry. One shuffle on (keys) for the window sort — the same cost class
  * as the sort-merge pass a native implementation would do, and it scales
  * the same way (per-key streams, no state beyond the last payload).
  * Right rows must be unique per (keys, ts) (pre-aggregate if not); at
  * equal timestamps the right row sorts first, so an exact-time match is
  * taken (<= semantics, matching SQL ASOF JOIN).
  */
object AsOfJoin {

  /** @param left        probe side
    * @param right       reference side; must be unique per (keys, tsCol)
    * @param keys        equi-join key columns (present on both sides)
    * @param tsCol       ordering column name (both sides)
    * @param payloadCols right-side columns carried to matches (as asof_<c>)
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payloadCols: Seq[String]): DataFrame = {
    val r0 = right
      .select((keys.map(col) :+ col(tsCol) :+
        struct(payloadCols.map(col): _*).as("__payload")): _*)
      .withColumn("__tag", lit(0))
    val payloadType = r0.schema("__payload").dataType

    val passthrough = left.columns.toSeq
      .filterNot(c => keys.contains(c) || c == tsCol)
    val lTagged = left.select(
      keys.map(col) ++ Seq(col(tsCol), lit(1).as("__tag"),
        lit(null).cast(payloadType).as("__payload")) ++
        passthrough.map(c => col(c).as(s"__l_$c")): _*)

    val rAligned = passthrough.foldLeft(r0) { (d, c) =>
      d.withColumn(s"__l_$c", lit(null).cast(lTagged.schema(s"__l_$c").dataType))
    }.select(lTagged.columns.map(col).toIndexedSeq: _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rAligned)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))

    val restored = left.columns.toSeq.map {
      case c if keys.contains(c) || c == tsCol => col(c)
      case c => col(s"__l_$c").as(c)
    }
    carried.where(col("__tag") === 1)
      .select(restored ++
        payloadCols.map(c => col("__match").getField(c).as(s"asof_$c")): _*)
  }
}
