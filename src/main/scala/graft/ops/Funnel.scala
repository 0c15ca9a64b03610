package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Step times from ONE entity's collected event multiset — the streaming
    * twin of [[stepTimes]]. `evs` is an array of `struct(ts: long,
    * event_type: string)` sorted ascending (sort it with `sort_array`; the
    * struct's leading `ts` field drives the order). A single left fold
    * walks the timeline: step i's slot fills at the first event of its type
    * whose ts is strictly after step i-1's filled slot. All comparisons are
    * on ts VALUES, never array positions, so ties in ts resolve identically
    * no matter how the sort broke them — which is what makes the streaming
    * query arrival-order-independent: the sorted array is a function of the
    * event multiset alone.
    *
    * Returns a struct column with fields `step1_<name>`..`stepK_<name>`
    * (null = never reached), matching [[stepTimes]]'s column contract.
    */
  def foldStepTimes(evs: Column, steps: Seq[String]): Column = {
    require(steps.nonEmpty, "funnel needs at least one step")
    def fname(i: Int) = s"step${i + 1}_${steps(i)}"
    val zero = struct(
      steps.indices.map(i => lit(null).cast("long").as(fname(i))): _*)
    aggregate(evs, zero, (acc, e) => {
      val ts = e.getField("ts")
      val ty = e.getField("event_type")
      // each branch reads the PRE-event accumulator, so an event can never
      // satisfy two consecutive steps at once (it would need ts > itself)
      val fields = steps.indices.map { i =>
        val cur = acc.getField(fname(i))
        val prevOk =
          if (i == 0) lit(true)
          else acc.getField(fname(i - 1)).isNotNull &&
            ts > acc.getField(fname(i - 1))
        when(cur.isNull && ty === steps(i) && prevOk, ts)
          .otherwise(cur).as(fname(i))
      }
      struct(fields: _*)
    })
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
