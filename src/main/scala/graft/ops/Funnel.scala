package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: for each entity, the first time each step
  * completed STRICTLY AFTER the previous step's completion time — the
  * classic product-analytics "view → click → purchase" progression
  * (reference has no funnel; this is north-star surface for the events
  * stream).
  *
  * Shape at scale: step i is `events(type = step_i)` equi-joined to the
  * accumulated step table on the entity key with a time residual, then
  * re-aggregated to one row per entity. Every join and aggregate keys on
  * the SAME entity column, so the exchange introduced by step 1 is reused
  * by every later stage (one shuffle total per step over the much smaller
  * filtered slice, never over the raw event log), and the per-step filters
  * push down to the scan. Entities that stall at step i carry nulls for
  * every later step — a null previous time fails the `>` residual, so no
  * later event can match (SQL null semantics do the gating for free).
  */
object Funnel {

  /** One row per entity that completed step 1; columns
    * `step1_<name>` .. `stepK_<name>` hold the first completion time of
    * each step (null = never reached). `steps` maps step position to the
    * `typeCol` value that identifies it.
    */
  def stepTimes(events: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    def stepName(i: Int) = s"step${i + 1}_${steps(i)}"
    val first = events.where(col(typeCol) === steps.head)
      .groupBy(entityCol).agg(min(tsCol).as(stepName(0)))
    steps.indices.drop(1).foldLeft(first) { (acc, i) =>
      val prev = stepName(i - 1)
      val nxt = events.where(col(typeCol) === steps(i))
        .select(col(entityCol).as("__e"), col(tsCol).as("__ts"))
      val keep = acc.columns.map(acc(_))
      acc.join(nxt, acc(entityCol) === col("__e") && col("__ts") > col(prev), "left")
        .groupBy(keep: _*)
        .agg(min(col("__ts")).as(stepName(i)))
    }
  }

  /** Funnel summary: one row per step with the count of entities that
    * reached it (count of non-null step times; step 1 = entry count).
    */
  def counts(stepTimesDf: DataFrame, entityCol: String): DataFrame = {
    val stepCols = stepTimesDf.columns.filterNot(_ == entityCol)
    val aggs = stepCols.map(c => count(col(c)).as(c))
    val wide = stepTimesDf.agg(aggs.head, aggs.tail: _*)
    // unpivot to (step, n_entities), preserving funnel order
    val stacked = stepCols.zipWithIndex.map { case (c, i) =>
      struct(lit(i + 1).as("step_no"), lit(c).as("step"), col(c).as("n_entities"))
    }
    wide.select(explode(array(stacked: _*)).as("s"))
      .select(col("s.step_no"), col("s.step"), col("s.n_entities"))
  }
}
