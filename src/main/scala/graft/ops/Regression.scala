package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group closed-form OLS (simple linear regression) and the derived
  * fit diagnostics, from ONE pass of exact sums.
  *
  * North-star analytics extension (the reference stops at grouped means,
  * `metrics_dashboard.py`-style; trend-fitting is the natural next question
  * a metrics dashboard asks). Spark-first shape: the five sufficient
  * statistics (n, Sx, Sy, Sxx, Sxy, Syy) are all expressible as a single
  * partial+final hash aggregate — map-side combine, one shuffle of
  * |groups| rows, no second pass, no driver math. At 100 TB the cost is a
  * scan plus a tiny aggregate, identical in shape to `q1_agg`.
  *
  * Cross-engine determinism: inputs are 2-dp doubles, so sums accumulate
  * in DECIMAL (exact integers in cents^2 units — no float summation-order
  * dependence); the final slope/intercept/r2 are a fixed expression tree
  * of double ops over those exact operands, rounded 10 orders above ULP
  * noise (same discipline as the `a14_stats` moments battery).
  */
object Regression {

  /** y ~ a + b*x per group. Output columns: group cols, n,
    * slope, intercept, r2 (all rounded to 9 dp).
    *
    * Degenerate groups (constant x: n*Sxx == Sx^2) yield NULL slope /
    * intercept / r2 via null-safe division, matching SQL NULLIF semantics.
    */
  def groupedOls(df: DataFrame, groupCols: Seq[String], xCol: String,
                 yCol: String): DataFrame = {
    val x = col(xCol).cast(DecimalType(18, 2))
    val y = col(yCol).cast(DecimalType(18, 2))
    val sums = df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum(x * x).cast("double").as("sxx"),
        sum(x * y).cast("double").as("sxy"),
        sum(y * y).cast("double").as("syy"))
    val n = col("n").cast("double")
    // Null-safe denominators: NULLIF-style via when(); constant x or a
    // single point -> NULL fit, never a division error or an Inf.
    def nz(c: Column): Column = when(c =!= 0.0, c)
    val covN  = n * col("sxy") - col("sx") * col("sy")   // n^2 * cov
    val varxN = n * col("sxx") - col("sx") * col("sx")   // n^2 * var(x)
    val varyN = n * col("syy") - col("sy") * col("sy")   // n^2 * var(y)
    val slope = covN / nz(varxN)
    sums.select(
      groupCols.map(col) ++ Seq(
        col("n"),
        round(slope, 9).as("slope"),
        round((col("sy") - slope * col("sx")) / n, 9).as("intercept"),
        round(covN * covN / nz(varxN * varyN), 9).as("r2")): _*)
  }
}
