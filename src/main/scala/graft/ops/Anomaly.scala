package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust anomaly detection over grouped numeric series.
  *
  * Median/MAD scoring (Iglewicz-Hoaglin robust z, public recipe family):
  * unlike mean/stddev z-scores (`f10_zscore`), the median and the median
  * absolute deviation don't move when the outliers themselves get more
  * extreme — the classic telemetry/quality-signal detector.
  */
object Anomaly {

  /** Rows whose robust z-score `|v - med| / (1.4826 * MAD)` exceeds
    * `cutoff` within their key group. Groups with MAD = 0 (constant
    * series) and NULL values never flag.
    *
    * Two aggregate passes by construction (MAD needs the median first),
    * each a partial+final hash aggregate over the keys; the per-key
    * medians/MADs are broadcast back, so the data frame itself never
    * shuffles. Exact `percentile` buffers each group's values on the agg
    * side — right for bounded-cardinality keys (metric names, event
    * types); swap `approx_percentile` in for open-ended key domains at
    * 100 TB, where exact per-key medians are not meaningful anyway.
    *
    * Appends med, mad, robust_z to the input columns.
    */
  def madOutliers(df: DataFrame, keys: Seq[String], valCol: String,
      cutoff: Double = 3.5): DataFrame = {
    val kcols = keys.map(col)
    val meds = df.groupBy(kcols: _*)
      .agg(expr(s"percentile($valCol, 0.5)").as("med"))
    val withMed = df.join(broadcast(meds), keys)
    val mads = withMed.groupBy(kcols: _*)
      .agg(expr(s"percentile(abs($valCol - med), 0.5)").as("mad"))
    withMed.join(broadcast(mads), keys)
      .withColumn("robust_z",
        when(col("mad") > 0,
          (col(valCol) - col("med")) / (lit(1.4826) * col("mad"))))
      .where(col("robust_z").isNotNull && abs(col("robust_z")) > cutoff)
  }
}
