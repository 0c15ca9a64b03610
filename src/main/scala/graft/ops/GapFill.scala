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

  /** Densify onto the daily spine and LINEARLY interpolate `valueCol`
    * across gaps (emitted as `<valueCol>_interp`): a gap day between
    * observations (p_d, p_v) and (n_d, n_v) gets
    * `p_v + (n_v - p_v) * ((day - p_d) / (n_d - p_d))` — the arithmetic
    * is written in exactly that shape so an oracle evaluating the same
    * IEEE expression reproduces it bit-for-bit. Days before the first /
    * after the last observation stay NULL (no extrapolation).
    *
    * Two window passes per key (running last / reversed first with
    * ignoreNulls), both over the same (key, date) sort — Spark plans one
    * exchange + sort and evaluates both frames on it; nothing beyond the
    * per-key spine rows ever shuffles.
    */
  def dailyInterp(df: DataFrame, keyCol: String, dateCol: String,
      valueCol: String): DataFrame = {
    val spine = dailySpine(df, keyCol, dateCol)
    val v = col(valueCol)
    val wPrev = Window.partitionBy(keyCol).orderBy(dateCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(keyCol).orderBy(dateCol)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val base = spine.join(df, Seq(keyCol, dateCol), "left")
      .withColumn("__pv", last(v, ignoreNulls = true).over(wPrev))
      .withColumn("__pd",
        last(when(v.isNotNull, col(dateCol)), ignoreNulls = true).over(wPrev))
      .withColumn("__nv", first(v, ignoreNulls = true).over(wNext))
      .withColumn("__nd",
        first(when(v.isNotNull, col(dateCol)), ignoreNulls = true).over(wNext))
    base
      .withColumn(s"${valueCol}_interp",
        when(v.isNotNull, v.cast("double"))
          .otherwise(when(col("__pv").isNotNull && col("__nv").isNotNull,
            col("__pv") + (col("__nv") - col("__pv")) *
              (datediff(col(dateCol), col("__pd")).cast("double") /
                datediff(col("__nd"), col("__pd")).cast("double")))))
      .drop("__pv", "__pd", "__nv", "__nd")
  }
}
