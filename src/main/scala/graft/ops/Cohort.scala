package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis over an event log: group entities by the
  * period of their FIRST activity (their cohort), then count how many
  * are still active N periods later — the standard retention matrix,
  * the engagement-side twin of [[Funnel]] (reference has no cohort
  * surface; north-star extension over the events stream).
  *
  * Periods are exact integer arithmetic on the engine's epoch-nano `ts`
  * contract (`period = ts DIV periodNanos`) — no calendar/timezone
  * dependency, so every cell of the matrix replays bit-exact in SQL.
  * The retention share is integer-nano (`n_active * 1e9 DIV
  * cohort_size`, truncating), totally ordered without float compares.
  *
  * Shape at scale: the (entity, period) activity set and the per-entity
  * cohort minimum both key on the entity — one exchange, reused by the
  * join between them; the matrix aggregate lands on at most
  * cohorts x offsets rows and cohort sizes ride in on a broadcast.
  * Nothing downstream scales with raw event count past the first
  * map-side combine.
  */
object Cohort {

  /** One row per (cohort_period, period_offset) cell:
    * (cohort_period, period_offset, n_active, cohort_size,
    * retention_nano). `period_offset` 0 rows count the whole cohort by
    * construction (retention_nano = 1e9).
    */
  def retention(events: DataFrame, entityCol: String, tsCol: String,
      periodNanos: Long): DataFrame = {
    require(periodNanos > 0, "periodNanos must be positive")
    val act = events
      .where(col(entityCol).isNotNull && col(tsCol).isNotNull)
      .select(col(entityCol).as("e"),
        expr(s"$tsCol DIV ${periodNanos}L").as("pd"))
      .distinct()
    val cohort = act.groupBy("e").agg(min("pd").as("c0"))
    val sizes = cohort.groupBy("c0").agg(count(lit(1)).as("cohort_size"))
    act.join(cohort, Seq("e"))
      .groupBy(col("c0").as("cohort_period"),
        (col("pd") - col("c0")).as("period_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes.withColumnRenamed("c0", "cohort_period")),
        Seq("cohort_period"))
      .select(col("cohort_period"), col("period_offset"), col("n_active"),
        col("cohort_size"),
        expr("(n_active * 1000000000L) DIV cohort_size")
          .as("retention_nano"))
  }
}
