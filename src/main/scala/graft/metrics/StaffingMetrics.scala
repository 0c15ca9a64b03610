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

  /** Join audit. `steps` is eager. `emptyAfterStep` (the reference's
    * `empty_merges`) is populated by the FIRST action on the joined frame:
    * the per-step row counts ride that job as `observe()` metrics, so the
    * audit costs zero extra jobs (the former shape was an eager `isEmpty`
    * per step — an extra action re-evaluating the join prefix, O(N^2) over
    * N frames). Reading it before any action throws (never blocks).
    */
  final class JoinAudit(val steps: Int,
      obs: Seq[(Int, org.apache.spark.sql.Observation)]) {
    def emptyAfterStep: Seq[Int] = obs.flatMap { case (i, o) =>
      val m = org.apache.spark.sql.graftbridge.GraftBridge.observationOrEmpty(o)
      if (m.isEmpty) throw new IllegalStateException(
        "foldJoin audit is populated by the first action on the joined " +
          "frame — run one (count/collect/write) before reading it")
      if (m("rows").asInstanceOf[Long] == 0L) Some(i) else None
    }
  }

  /** Row-drop accounting, mirroring the reference's per-stage warnings
    * (calculate_metrics.py:93-97 zero-sentinel count, :100-113 critical
    * dropna count, :134-140 zero-denominator count, :145-153 ratio dropna
    * count). Populated by [[cleanWithAudit]] / [[metricsWithAudit]].
    */
  final case class DropAudit(
      zeroNulledRows: Long,       // rows whose critical set was zero-nulled
      droppedCriticalRows: Long,  // rows dropped for missing critical values
      zeroDenomRows: Long,        // aggregated rows with a zeroed denominator
      droppedRatioRows: Long)     // aggregated rows dropped for NULL ratios

  /** Iterative N-way inner equi-join on (PROVNUM, CY_Qtr)
    * (reference calculate_metrics.py:56-62). Overlapping non-key columns are
    * deterministically renamed `<col>_fN` by source position — the Spark
    * replacement for pandas' `_x`/`_y` suffixing (SURVEY.md §7.4.1).
    * Empty intermediate joins are recorded (the reference's `empty_merges`).
    */
  /** `audit = true` reproduces the reference's per-step empty-merge check
    * (calculate_metrics.py:57-62) as free-riding `observe()` counters: one
    * `CollectMetrics` per step inside the single lazy plan, read back from
    * [[JoinAudit.emptyAfterStep]] after the caller's first action. Scale-
    * safe at any N; `audit = false` skips even the plan nodes.
    */
  def foldJoin(frames: Seq[DataFrame], keys: Seq[String] = joinKeys,
      audit: Boolean = true): (DataFrame, JoinAudit) = {
    require(frames.nonEmpty, "no qualifying input frames") // :51-54
    var merged = frames.head
    var obs = List.empty[(Int, org.apache.spark.sql.Observation)]
    frames.zipWithIndex.drop(1).foreach { case (f, i) =>
      val clash = merged.columns.toSet
        .intersect(f.columns.toSet) -- keys
      val renamed = clash.foldLeft(f)((d, c) => d.withColumnRenamed(c, s"${c}_f$i"))
      merged = merged.join(renamed, keys, "inner")
      if (audit) { // :57-62 empty-merge audit
        val o = org.apache.spark.sql.Observation(s"foldjoin_step_$i")
        merged = merged.observe(o, count(lit(1)).as("rows"))
        obs ::= (i, o)
      }
    }
    (merged, new JoinAudit(frames.size - 1, obs.reverse))
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
    *
    * The drop set is the reference's dropna subset (critical cols + STATE +
    * CY_Qtr, calculate_metrics.py:101-108) PLUS PROVNUM: the reference
    * never lists PROVNUM there, but pandas `groupby` silently drops
    * NaN-keyed rows at the aggregation (calculate_metrics.py:124) while
    * Spark groupBy KEEPS null keys — dropping null PROVNUM here reproduces
    * the reference's net row set.
    */
  private val dropSubset = criticalCols ++ Seq("STATE", "CY_Qtr", "PROVNUM")

  def clean(df: DataFrame): DataFrame = {
    val numericCols = requiredCols.filterNot(Seq("PROVNUM", "STATE", "CY_Qtr").contains)
    val coerced = numericCols.foldLeft(
      df.withColumn("CY_Qtr", Norm.normalizeQuarter(col("CY_Qtr")))  // :74
    )((d, c) => d.withColumn(c, Cleaning.coerceNumeric(col(c))))     // :88-90
    val zeroed = Cleaning.zeroSentinelNull(coerced, criticalCols)    // :92-98
    zeroed.na.drop(dropSubset)                                       // :101-108
  }

  /** [[clean]] plus the reference's eager row-drop accounting
    * (calculate_metrics.py:93-97, :100-113). Costs two count actions over
    * the pre-drop frame — the reference is eager too; pass through
    * [[clean]] directly when counts aren't needed at scale.
    */
  def cleanWithAudit(df: DataFrame): (DataFrame, Long, Long) = {
    val numericCols = requiredCols.filterNot(Seq("PROVNUM", "STATE", "CY_Qtr").contains)
    val coerced = numericCols.foldLeft(
      df.withColumn("CY_Qtr", Norm.normalizeQuarter(col("CY_Qtr")))
    )((d, c) => d.withColumn(c, Cleaning.coerceNumeric(col(c))))
    // one pass computes all three counts (no per-stage re-execution)
    val anyZero = criticalCols.map(col(_) === 0).reduce(_ || _)
    val zeroed = Cleaning.zeroSentinelNull(coerced, criticalCols)
    val anyNull = dropSubset.map(col(_).isNull).reduce(_ || _)
    val counts = coerced.select(
      count(lit(1)).as("n"),
      count(when(anyZero, 1)).as("n_zeroed"))
      .crossJoin(zeroed.select(count(when(anyNull, 1)).as("n_dropped")))
      .head()
    (zeroed.na.drop(dropSubset),
      counts.getAs[Long]("n_zeroed"), counts.getAs[Long]("n_dropped"))
  }

  /** Aggregation + ratios (reference calculate_metrics.py:117-162):
    * horizontal hour sums, group totals, denominator zero->NULL, ratio
    * columns, drop NULL-ratio rows, final projection.
    */
  def metrics(df: DataFrame): DataFrame =
    ratioed(df)
      .na.drop(Seq("nurse_to_patient_ratio", "contract_vs_employed_ratio")) // :145-148
      .select("PROVNUM", "STATE", "CY_Qtr",                           // :155-162
        "nurse_to_patient_ratio", "contract_vs_employed_ratio", "total_nurse_hours")

  /** [[metrics]] plus the reference's eager row-drop accounting
    * (calculate_metrics.py:132-140 zero denominators, :145-153 ratio
    * drops). One count action over the aggregated (small) frame.
    */
  def metricsWithAudit(df: DataFrame): (DataFrame, Long, Long) = {
    val r = ratioed(df).cache()
    val c = r.select(
      count(when(col("total_census").isNull || col("total_employed").isNull, 1))
        .as("n_zero_denom"),
      count(when(col("nurse_to_patient_ratio").isNull ||
        col("contract_vs_employed_ratio").isNull, 1)).as("n_dropped"))
      .head()
    val out = r
      .na.drop(Seq("nurse_to_patient_ratio", "contract_vs_employed_ratio"))
      .select("PROVNUM", "STATE", "CY_Qtr",
        "nurse_to_patient_ratio", "contract_vs_employed_ratio", "total_nurse_hours")
    (out, c.getAs[Long]("n_zero_denom"), c.getAs[Long]("n_dropped"))
  }

  // Note: n_zero_denom counts rows whose census OR employed denominator is
  // NULL post-zeroing; the reference counts rows where either WAS zero
  // (calculate_metrics.py:132-135) — identical unless a denominator was
  // already NULL, impossible here (sum over the cleaned, null-dropped set).

  private def ratioed(df: DataFrame): DataFrame = {
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

  /** [[run]] with full accounting: join audit + the reference's four
    * row-drop counters (clean + metrics stages).
    */
  def runWithAudit(frames: Seq[DataFrame]): (DataFrame, JoinAudit, DropAudit) = {
    val qualifying = frames.filter(f => joinKeys.forall(f.columns.contains))
    val (merged, joinAudit) = foldJoin(qualifying)
    val (cleaned, nZeroed, nDroppedCritical) = cleanWithAudit(requireCols(merged))
    val (out, nZeroDenom, nDroppedRatio) = metricsWithAudit(cleaned)
    (out, joinAudit, DropAudit(nZeroed, nDroppedCritical, nZeroDenom, nDroppedRatio))
  }
}
