package graft.metrics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Cleaning, Norm}

/** The staffing-metrics pipeline (reference calculate_metrics.py): discover
  * qualifying inputs -> N-way inner fold-join -> clean -> aggregate ->
  * ratios. The semantic traps (SURVEY.md §7.4) are reproduced explicitly:
  * merge-collision renaming, row-wise zero-sentinel nulling over the
  * critical set, null-skipping horizontal sums, denominator zero->NULL.
  */
object StaffingMetrics {

  val joinKeys = Seq("PROVNUM", "CY_Qtr")

  /** calculate_metrics.py:11-25 REQUIRED_COLS. */
  val requiredCols = Seq(
    "PROVNUM", "STATE", "CY_Qtr", "MDScensus",
    "Hrs_RN", "Hrs_LPN", "Hrs_CNA",
    "Hrs_RN_ctr", "Hrs_LPN_ctr", "Hrs_CNA_ctr",
    "Hrs_RN_emp", "Hrs_LPN_emp", "Hrs_CNA_emp")

  val criticalCols = Seq("MDScensus", "Hrs_RN", "Hrs_LPN", "Hrs_CNA")

  final case class JoinAudit(steps: Int, emptyAfterStep: Seq[Int])

  /** Iterative N-way inner equi-join on (PROVNUM, CY_Qtr)
    * (reference calculate_metrics.py:56-62). Overlapping non-key columns are
    * deterministically renamed `<col>_fN` by source position — the Spark
    * replacement for pandas' `_x`/`_y` suffixing (SURVEY.md §7.4.1).
    * Empty intermediate joins are recorded (the reference's `empty_merges`).
    */
  /** `audit = true` reproduces the reference's per-step empty-merge check
    * (calculate_metrics.py:57-62) — an eager isEmpty per join step, i.e. an
    * extra action that re-evaluates the join prefix. Fine for the metrics
    * pipeline's file counts; pass `audit = false` for generic fold-joins at
    * scale (one lazy plan, no intermediate actions).
    */
  def foldJoin(frames: Seq[DataFrame], keys: Seq[String] = joinKeys,
      audit: Boolean = true): (DataFrame, JoinAudit) = {
    require(frames.nonEmpty, "no qualifying input frames") // :51-54
    var merged = frames.head
    var empties = List.empty[Int]
    frames.zipWithIndex.drop(1).foreach { case (f, i) =>
      val clash = merged.columns.toSet
        .intersect(f.columns.toSet) -- keys
      val renamed = clash.foldLeft(f)((d, c) => d.withColumnRenamed(c, s"${c}_f$i"))
      merged = merged.join(renamed, keys, "inner")
      if (audit && merged.isEmpty) empties ::= i // :57-62 empty-merge audit
    }
    (merged, JoinAudit(frames.size - 1, empties.reverse))
  }

  /** Post-merge contract check (reference calculate_metrics.py:64-67). */
  def requireCols(df: DataFrame): DataFrame = {
    val missing = requiredCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"missing required columns: ${missing.mkString(",")}")
    df
  }

  /** Cleaning (reference calculate_metrics.py:71-114): quarter
    * normalization, numeric coercion, row-wise zero-sentinel nulling of the
    * critical set, then drop rows with any critical NULL.
    */
  def clean(df: DataFrame): DataFrame = {
    val numericCols = requiredCols.filterNot(Seq("PROVNUM", "STATE", "CY_Qtr").contains)
    val coerced = numericCols.foldLeft(
      df.withColumn("CY_Qtr", Norm.normalizeQuarter(col("CY_Qtr")))  // :74
    )((d, c) => d.withColumn(c, Cleaning.coerceNumeric(col(c))))     // :88-90
    val zeroed = Cleaning.zeroSentinelNull(coerced, criticalCols)    // :92-98
    zeroed.na.drop(criticalCols ++ Seq("CY_Qtr", "PROVNUM"))         // :101-108
  }

  /** Aggregation + ratios (reference calculate_metrics.py:117-162):
    * horizontal hour sums, group totals, denominator zero->NULL, ratio
    * columns, drop NULL-ratio rows, final projection.
    */
  def metrics(df: DataFrame): DataFrame = {
    val withSums = df
      .withColumn("total_hours", Cleaning.horizontalSum(
        Seq(col("Hrs_RN"), col("Hrs_LPN"), col("Hrs_CNA"))))          // :119
      .withColumn("total_hours_ctr", Cleaning.horizontalSum(
        Seq(col("Hrs_RN_ctr"), col("Hrs_LPN_ctr"), col("Hrs_CNA_ctr"))))
      .withColumn("total_hours_emp", Cleaning.horizontalSum(
        Seq(col("Hrs_RN_emp"), col("Hrs_LPN_emp"), col("Hrs_CNA_emp"))))
    val agg = withSums.groupBy("STATE", "PROVNUM", "CY_Qtr").agg(     // :123-131
      sum("total_hours").as("total_nurse_hours"),
      sum("MDScensus").as("total_census"),
      sum("total_hours_ctr").as("total_contract"),
      sum("total_hours_emp").as("total_employed"))
    agg
      .withColumn("total_census", Cleaning.zeroToNull(col("total_census")))     // :132-140
      .withColumn("total_employed", Cleaning.zeroToNull(col("total_employed")))
      .withColumn("nurse_to_patient_ratio",
        col("total_nurse_hours") / col("total_census"))               // :142
      .withColumn("contract_vs_employed_ratio",
        col("total_contract") / col("total_employed"))                // :143
      .na.drop(Seq("nurse_to_patient_ratio", "contract_vs_employed_ratio")) // :145-148
      .select("PROVNUM", "STATE", "CY_Qtr",                           // :155-162
        "total_nurse_hours", "nurse_to_patient_ratio", "contract_vs_employed_ratio")
  }

  /** Full pipeline over pre-loaded frames (discovery/schema-predicate F1 is
    * the caller's: keep frames whose columns ⊇ join keys,
    * calculate_metrics.py:48-49).
    */
  def run(frames: Seq[DataFrame]): (DataFrame, JoinAudit) = {
    val qualifying = frames.filter(f => joinKeys.forall(f.columns.contains))
    val (merged, audit) = foldJoin(qualifying)
    (metrics(clean(requireCols(merged))), audit)
  }
}
