package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.metrics.StaffingMetrics

/** Typed row for the published metrics (calculate_metrics.py:155-162). */
final case class MetricsRow(
    PROVNUM: String,
    STATE: String,
    CY_Qtr: String,
    total_nurse_hours: Double,
    nurse_to_patient_ratio: Double,
    contract_vs_employed_ratio: Double)

/** The metrics pipeline CLI (`python calculate_metrics.py`, SURVEY §3.2):
  * discover qualifying CSVs -> fold-join -> clean -> aggregate -> publish.
  *
  * Usage: MetricsPipeline <csvDir> <outCsvDir>
  */
object MetricsPipeline {

  def run(spark: SparkSession, csvDir: String): Dataset[MetricsRow] = {
    import spark.implicits._
    graft.core.Graft.tune(spark)
    val files = Option(new java.io.File(csvDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.toLowerCase.endsWith(".csv"))
    require(files.nonEmpty, s"no CSV files under $csvDir") // :51-54
    val frames = files.toSeq.map(f => spark.read
      .option("header", "true").csv(f.getAbsolutePath))
    val (metrics, audit, drops) = StaffingMetrics.runWithAudit(frames)
    audit.emptyAfterStep.foreach(i =>
      System.err.println(s"[metrics] warning: empty merge at step $i")) // :167-169
    // the reference's per-stage drop warnings (calculate_metrics.py:93-153)
    if (drops.zeroNulledRows > 0) System.err.println(
      s"[metrics] warning: zero-nulled critical columns on ${drops.zeroNulledRows} rows")
    if (drops.droppedCriticalRows > 0) System.err.println(
      s"[metrics] warning: dropped ${drops.droppedCriticalRows} rows for missing critical values")
    if (drops.zeroDenomRows > 0) System.err.println(
      s"[metrics] warning: zeroed denominators on ${drops.zeroDenomRows} aggregated rows")
    if (drops.droppedRatioRows > 0) System.err.println(
      s"[metrics] warning: dropped ${drops.droppedRatioRows} aggregated rows for null ratios")
    metrics.as[MetricsRow]
  }

  def main(args: Array[String]): Unit = {
    val Array(csvDir, outDir) = args.take(2)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = run(spark, csvDir)
    // K5 publish (calculate_metrics.py:172)
    out.coalesce(1).write.mode("overwrite").option("header", "true").csv(outDir)
    println(s"[metrics] wrote ${out.count()} rows to $outDir")
    spark.stop()
  }
}
