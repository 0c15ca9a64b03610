package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seasonal decomposition of an event-valued time series, the
  * fixed-period "seasonal naive" flavor (per-period-position means — the
  * classical-decomposition seasonal component without the moving-average
  * trend, which is the right shape for a relational engine: two hash
  * aggregates and a broadcast join, no ordered scan).
  *
  * All comparisons happen in exact integer nanos: values snap to
  * `round(v*1e9)` BIGINT once, means are truncating-division
  * `SUM DIV COUNT` (identical to DuckDB's integer `//`, which ALSO
  * truncates toward zero — verified on negative operands, so a
  * negative-valued series replays bit-for-bit), and the mean absolute
  * residual re-aggregates against the broadcast seasonal means.
  * BIGINT bounds: nano sums carry ~9.2e18 headroom, i.e. ~1.8e7 rows per
  * group at |v| <= 500; beyond that move the sums to DECIMAL(38,0) —
  * same plan shape.
  *
  * Shape at scale: one map-side-partial aggregate to (key, position)
  * groups, one to (key) groups, then a second pass over the fact joined
  * to the BROADCAST per-position means for the residual aggregate. Two
  * scans of the fact, zero wide shuffles beyond the two aggregates.
  */
object Seasonal {

  /** Per (key, period position) seasonal profile of `valueNanoCol`
    * (already integer nanos): n, seasonal mean, deviation from the key's
    * global mean, and mean absolute residual. `posCol` is the period
    * position (e.g. `(ts DIV day) % 7` for a weekly profile).
    */
  def profile(df: DataFrame, keyCol: String, posCol: String,
      valueNanoCol: String): DataFrame = {
    val base = df.select(col(keyCol), col(posCol), col(valueNanoCol))
      .where(col(keyCol).isNotNull && col(posCol).isNotNull &&
        col(valueNanoCol).isNotNull)
    val seas = base.groupBy(keyCol, posCol)
      .agg(count(lit(1)).as("n"), sum(valueNanoCol).as("sv"))
      .select(col(keyCol), col(posCol), col("n"),
        expr("sv DIV n").as("seasonal_nano"))
    val glob = base.groupBy(keyCol)
      .agg(expr(s"sum($valueNanoCol) DIV count(1)").as("global_nano"))
    val resid = base
      .join(broadcast(seas.select(col(keyCol), col(posCol),
        col("seasonal_nano"))), Seq(keyCol, posCol))
      .groupBy(keyCol, posCol)
      .agg(expr(s"sum(abs($valueNanoCol - seasonal_nano)) DIV count(1)")
        .as("mad_resid_nano"))
    seas.join(broadcast(glob), Seq(keyCol))
      .join(resid, Seq(keyCol, posCol))
      .select(col(keyCol), col(posCol), col("n"), col("seasonal_nano"),
        (col("seasonal_nano") - col("global_nano")).as("dev_global_nano"),
        col("mad_resid_nano"))
  }
}
