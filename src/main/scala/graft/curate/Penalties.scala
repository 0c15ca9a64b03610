package graft.curate

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Curated tier for the penalties pipeline: the reference's CTAS + view
  * (build.py:85-107), kept as SQL — it runs near-verbatim in Spark SQL,
  * minimizing translation risk (SURVEY.md §7.1).
  */
object Penalties {

  /** `fact_penalty` (reference build.py:85-97): rename ccn, date-normalize,
    * COALESCE fine_amount to 0, rename denial days.
    */
  def factPenalty(spark: SparkSession, stagingView: String): DataFrame = {
    val df = spark.sql(
      s"""SELECT
         |  cms_certification_number_ccn AS ccn,
         |  to_date(penalty_date)        AS penalty_date,
         |  penalty_type,
         |  COALESCE(fine_amount, 0)     AS fine_amount,
         |  payment_denial_length_in_days AS denial_days,
         |  state,
         |  provider_name
         |FROM $stagingView""".stripMargin)
    df.createOrReplaceTempView("fact_penalty")
    df
  }

  /** `v_penalties_by_state` (reference build.py:98-107): per-state penalty
    * counts, fine totals, conditional fine counts (CASE without ELSE ->
    * NULL -> SUM skips, the reference's counting idiom X9), rounded average.
    */
  def penaltiesByState(spark: SparkSession): DataFrame = {
    val df = spark.sql(
      """SELECT
        |  state,
        |  COUNT(*)                                        AS penalty_events,
        |  SUM(fine_amount)                                AS total_fines,
        |  SUM(CASE WHEN fine_amount > 0 THEN 1 END)       AS fine_count,
        |  ROUND(AVG(fine_amount), 2)                      AS avg_fine
        |FROM fact_penalty
        |GROUP BY state""".stripMargin)
    df.createOrReplaceTempView("v_penalties_by_state")
    df
  }
}
