package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ-style check list
  * the reference runs as ad-hoc audits): every constraint over a table is
  * evaluated in ONE aggregate pass — a single job whose map-side partials
  * carry all the counters, never one job per check.
  *
  * Each constraint yields (check_name, target, observed, threshold, pass):
  * `observed` is the satisfied fraction (or distinct ratio), exact-integer
  * counts divided once, so the row replays bit-for-bit in any engine.
  * NULL semantics per check are explicit and documented on the case class.
  */
object Constraints {

  sealed trait Constraint

  /** Fraction of rows with `column` non-null must be >= minRatio. */
  final case class NotNull(column: String, minRatio: Double) extends Constraint

  /** Fraction of NON-NULL values inside the allowed set must be >=
    * minRatio (null rows are not counted against membership — pair with
    * [[NotNull]] to also bound nulls).
    */
  final case class InSet(column: String, allowed: Seq[String],
      minRatio: Double) extends Constraint

  /** Fraction of NON-NULL values inside [lo, hi] must be >= minRatio. */
  final case class Between(column: String, lo: Double, hi: Double,
      minRatio: Double) extends Constraint

  /** distinct(column) / count(rows) must be >= minRatio (1.0 = unique
    * key; null keys count as one distinct value, matching COUNT DISTINCT
    * + an isnull flag on both engines — i.e. nulls collapse).
    */
  final case class UniqueRatio(column: String, minRatio: Double)
      extends Constraint

  /** Evaluate all constraints in one aggregate pass. Output:
    * (check_name, target, observed, threshold, pass) ordered by
    * (check_name, target). Empty table: every ratio observes 0.0 (and
    * fails any positive threshold) rather than NULL.
    */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "no constraints given")
    val aggs: Seq[Column] = count(lit(1)).as("__n") +:
      constraints.zipWithIndex.map { case (c, i) =>
        c match {
          case NotNull(col0, _) => count(col(col0)).as(s"__c$i")
          case InSet(col0, allowed, _) =>
            count(when(col(col0).isin(allowed: _*), 1)).as(s"__c$i")
          case Between(col0, lo, hi, _) =>
            count(when(col(col0) >= lo && col(col0) <= hi, 1)).as(s"__c$i")
          case UniqueRatio(col0, _) =>
            (count_distinct(col(col0)) +
              max(when(col(col0).isNull, 1).otherwise(0)).cast("long"))
              .as(s"__c$i")
        }
      }
    // InSet/Between observe over NON-NULL values: one extra hidden
    // non-null counter per such constraint rides the same pass
    val nnAggs = constraints.zipWithIndex.collect {
      case (InSet(col0, _, _), i) => count(col(col0)).as(s"__nn$i")
      case (Between(col0, _, _, _), i) => count(col(col0)).as(s"__nn$i")
    }
    val all = aggs ++ nnAggs
    val wide = df.agg(all.head, all.tail: _*)
    val structs = constraints.zipWithIndex.map { case (c, i) =>
      val (name, target, thr) = c match {
        case NotNull(col0, t) => ("not_null", col0, t)
        case InSet(col0, _, t) => ("in_set", col0, t)
        case Between(col0, _, _, t) => ("between", col0, t)
        case UniqueRatio(col0, t) => ("unique_ratio", col0, t)
      }
      val d: Column = c match {
        case _: InSet | _: Between => col(s"__nn$i").cast("double")
        case _ => col("__n").cast("double")
      }
      val observed = when(d > 0, col(s"__c$i").cast("double") / d)
        .otherwise(lit(0.0))
      struct(lit(name).as("check_name"), lit(target).as("target"),
        observed.as("observed"), lit(thr).as("threshold"),
        (observed >= thr).as("pass"))
    }
    wide.select(explode(array(structs: _*)).as("s"))
      .select(col("s.check_name"), col("s.target"), col("s.observed"),
        col("s.threshold"), col("s.pass"))
      .orderBy("check_name", "target")
  }
}
