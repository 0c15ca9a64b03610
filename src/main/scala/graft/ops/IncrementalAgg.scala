package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (materialized-view refresh): keep a
  * per-key (sum, count) STATE table; each ingest cycle aggregates only the
  * new delta and merges states — the 100 TB history is never rescanned.
  * sum/count are associative and commutative, so any delta partitioning
  * (daily files, backfills, out-of-order arrivals) merges to the same
  * state, and the derived metrics (mean, total) match a from-scratch
  * aggregate exactly — provable, because the sums are exact integers
  * (cents), not floats (the corpus query's oracle IS the from-scratch
  * aggregate).
  *
  * The merge is itself one partial+final hash aggregate keyed like the
  * state table; with both sides bucketed by key ([[graft.ingest.Bucketed]])
  * the refresh runs exchange-free.
  */
object IncrementalAgg {

  /** Aggregate a (delta) table to per-key state: exact integer sum + count
    * of `valueCol` (a long column — pre-convert doubles with cents-style
    * scaling to keep the merge order-free).
    */
  def partials(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(sum(col(valueCol)).as("psum"), count(col(valueCol)).as("pcnt"))

  /** Merge any number of state tables into one (associative: fold order
    * irrelevant, exact integer sums).
    */
  def merge(states: Seq[DataFrame], keyCols: Seq[String]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("psum")).as("psum"), sum(col("pcnt")).as("pcnt"))

  /** Surface a merged state as metrics: total (descaled) and mean. */
  def finish(state: DataFrame, keyCols: Seq[String], scale: Long): DataFrame =
    state.select(
      keyCols.map(col) ++ Seq(
        (col("psum").cast("double") / scale).as("total"),
        (col("psum").cast("double") / scale / col("pcnt").cast("double")).as("mean"),
        col("pcnt").as("n")): _*)
}
