package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap filling: per-key daily date spine + forward fill —
  * the densify step every downstream window/trend computation assumes
  * (missing days become explicit rows, observations carry forward).
  *
  * Shape at scale: the spine derives from ONE (key, min, max) aggregate
  * and explodes per key — rows bounded by keys x their own day span,
  * never the cross product of keys x global range. The join back is
  * key+day equi (co-partitioned with the aggregate), and the forward
  * fill is one window pass per key — Spark's `last(ignoreNulls)` over a
  * running frame, which is exactly DuckDB's `last_value(x IGNORE
  * NULLS)`, so the fill replays in the oracle.
  */
object GapFill {

  /** Per-key contiguous daily spine spanning each key's own [min, max]
    * observed dates. */
  def dailySpine(df: DataFrame, keyCol: String, dateCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("__mn"), max(col(dateCol)).as("__mx"))
      .select(col(keyCol), explode(sequence(col("__mn"), col("__mx")))
        .as(dateCol))

  /** Densify a per-(key, date) frame onto its daily spine and forward-
    * fill `valueCol` (last non-null observation per key in date order,
    * emitted as `<valueCol>_ffill`); other columns are NULL on gap rows
    * for the caller to coalesce as fits (counts -> 0, etc.).
    */
  def dailyGapFill(df: DataFrame, keyCol: String, dateCol: String,
      valueCol: String): DataFrame = {
    val spine = dailySpine(df, keyCol, dateCol)
    val w = Window.partitionBy(keyCol).orderBy(dateCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(df, Seq(keyCol, dateCol), "left")
      .withColumn(s"${valueCol}_ffill",
        last(col(valueCol), ignoreNulls = true).over(w))
  }
}
