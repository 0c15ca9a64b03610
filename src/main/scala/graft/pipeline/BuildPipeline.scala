package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.config.{DatasetConfig, DatasetSpec}
import graft.curate.Penalties
import graft.ingest.CsvIngest
import graft.quality.DataQuality

/** Typed row for the curated penalties fact (SURVEY §1.3: Dataset[T] at
  * curated boundaries where a stable case class exists).
  */
final case class FactPenalty(
    ccn: String,
    penalty_date: java.sql.Date,
    penalty_type: String,
    fine_amount: Double,
    denial_days: Option[Long],
    state: String,
    provider_name: String)

/** The reference's flagship pipeline (`python build.py`, SURVEY §3.1),
  * Spark-first: config load -> per-dataset glob ingest (scan-parallel, not
  * a Python file loop) -> staging views -> DQ duplicate audit -> curated
  * fact + state view. One logical plan per dataset; Catalyst fuses
  * cast/lineage/union; the only shuffles are the audit and curate GROUP BYs.
  *
  * Usage: BuildPipeline <csvDir> [configPath]
  */
object BuildPipeline {

  final case class Result(
      staged: Map[String, Long],
      audits: Map[String, String],
      factPenaltyRows: Long,
      stateViewRows: Long)

  def run(spark: SparkSession, csvDir: String, specs: Seq[DatasetSpec]): Result = {
    graft.core.Graft.tune(spark)
    val staged = specs.flatMap { spec =>
      try {
        val df = CsvIngest.stage(spark, csvDir, spec)
        Some(spec.stagingTable -> df.count())
      } catch {
        case e: Exception => // dataset with no matching files: skip, like the
          // reference's empty-glob continue (build.py:62-64)
          System.err.println(s"[build] skip ${spec.name}: ${e.getMessage}")
          None
      }
    }.toMap

    val audits = specs.filter(s => staged.contains(s.stagingTable)).map { spec =>
      val (audit, _) = DataQuality.duplicateAudit(
        spark, spark.table(spec.stagingTable), spec.stagingTable, spec.naturalKey)
      audit.createOrReplaceTempView(s"dq_audit_${spec.name}")
      spec.name -> audit.collect().head.getAs[String]("status")
    }.toMap

    val (factRows, viewRows) =
      if (staged.contains("staging_penalties")) {
        val fact = Penalties.factPenalty(spark, "staging_penalties")
        val view = Penalties.penaltiesByState(spark)
        (fact.count(), view.count())
      } else (0L, 0L)

    Result(staged, audits, factRows, viewRows)
  }

  /** Curated fact as a typed Dataset. */
  def factPenaltyDs(spark: SparkSession): Dataset[FactPenalty] = {
    import spark.implicits._
    spark.table("fact_penalty").as[FactPenalty]
  }

  def main(args: Array[String]): Unit = {
    val csvDir = args.headOption.getOrElse(".")
    val configPath = args.lift(1).getOrElse("config/datasets.yml")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val res = run(spark, csvDir, DatasetConfig.load(configPath))
    res.staged.foreach { case (t, n) => println(s"[build] staged $t: $n rows") }
    res.audits.foreach { case (d, s) => println(s"[build] dq_audit $d: $s") }
    println(s"[build] fact_penalty: ${res.factPenaltyRows} rows")
    println(s"[build] v_penalties_by_state: ${res.stateViewRows} rows")
    // README.md:12 smoke query
    spark.sql("SELECT * FROM v_penalties_by_state ORDER BY state LIMIT 5").show()
    spark.stop()
  }
}
