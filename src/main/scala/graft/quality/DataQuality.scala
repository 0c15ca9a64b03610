package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality operators, mirroring the reference's runtime checks (they
  * are product features there, not tests — SURVEY.md §5.1).
  */
object DataQuality {

  /** Per-column completeness profile
    * (reference load_nursing_home_data.py:20-36): for every column,
    * row_count, non_null_count, pct_not_null rounded to 2 (0 for an empty
    * table — the reference's explicit guard at :26).
    *
    * DOCUMENTED DIVERGENCE on rounding: pct_not_null uses integer HALF-UP
    * rounding, while the reference's Python `round()`
    * (load_nursing_home_data.py:26) is banker's HALF-EVEN on
    * exactly-representable .xx5 fractions (e.g. 1/32 -> 3.12 there,
    * 3.13 here). Deliberate: the integer form is engine-independent (the
    * DuckDB oracle reproduces it bit-for-bit, where ROUND(double) ULP
    * noise would not be), and the affected inputs are exact .xx5 ratios
    * only.
    *
    * Single pass: one aggregate computes count(*) plus count(col) for every
    * column (map-side partials; no per-column jobs), then unpivots to long
    * form on the driver-sized 1-row result.
    */
  def completeness(df: DataFrame, tableName: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns.toSeq
    val aggs = count(lit(1)).as("__total") +:
      cols.map(c => count(col(c)).as(s"__nn_$c"))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column_name"), col("__total").as("row_count"),
        col(s"__nn_$c").as("non_null_count"))
    }
    wide.select(explode(array(stacked: _*)).as("s"))
      .select(
        lit(tableName).as("table_name"),
        $"s.column_name",
        $"s.row_count",
        $"s.non_null_count",
        when($"s.row_count" === 0, lit(0.0)) // :26 empty-table guard
          // integer half-up rounding to 2dp: ROUND(double, 2) can disagree
          // across engines on exactly-representable .xx5 fractions
          .otherwise(expr(
            "CAST((s.non_null_count * 10000 + s.row_count DIV 2) DIV s.row_count AS DOUBLE) / 100"))
          .as("pct_not_null"))
  }

  /** Natural-key duplicate audit (reference build.py:39-53): key groups with
    * count > 1; status ok/warn; a bounded JSON sample of offending keys.
    * Returns (auditRow, duplicateGroups).
    */
  def duplicateAudit(spark: SparkSession, df: DataFrame, tableName: String,
      naturalKey: Seq[String], sampleN: Int = 5): (DataFrame, DataFrame) = {
    import spark.implicits._
    val dups = df.groupBy(naturalKey.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .where($"n" > 1)
    // bounded, deterministic sample — never a full collect
    val sample = dups.orderBy(naturalKey.map(col): _*).limit(sampleN)
      .toJSON.collect().mkString("[", ",", "]")
    val dupCount = dups.count()
    val audit = Seq(
      (tableName, naturalKey.mkString(","), dupCount,
        if (dupCount > 0) "warn" else "ok", sample)
    ).toDF("table_name", "natural_key", "duplicate_groups", "status", "sample_json")
      .withColumn("created_at", current_timestamp()) // build.py:23
    (audit, dups)
  }
}
