package graft

import java.nio.file.Files
import graft.config.DatasetConfig
import graft.pipeline.{BuildPipeline, FactPenalty}

/** BuildPipeline end-to-end API + typed curated Dataset. */
class PipelineSpec extends SparkSpec {

  private lazy val csvDir: String = {
    val d = Files.createTempDirectory("graft_build")
    Files.writeString(d.resolve("NH_Penalties_2024.csv"),
      """CMS Certification Number (CCN),Penalty Date,Penalty Type,Fine Amount,Payment Denial Length in Days,State,Provider Name
        |015009,01/15/2024,Fine,1500.50,,TX,Alpha Care
        |015010,02/20/2024,Payment Denial,,30,TX,Beta Home
        |""".stripMargin)
    d.toString
  }

  test("BuildPipeline.run stages, audits, curates; typed Dataset reads back") {
    val specs = DatasetConfig.load("config/datasets.yml")
    val res = BuildPipeline.run(spark, csvDir, specs)
    assert(res.staged == Map("staging_penalties" -> 2L))
    assert(res.audits == Map("penalties" -> "ok"))
    assert(res.factPenaltyRows == 2L && res.stateViewRows == 1L)

    val ds = BuildPipeline.factPenaltyDs(spark)
    val rows: Seq[FactPenalty] = ds.collect().toSeq.sortBy(_.ccn)
    assert(rows.map(_.ccn) == Seq("015009", "015010"))
    assert(rows.head.fine_amount == 1500.50)
    assert(rows(1).fine_amount == 0.0)          // COALESCE(fine, 0)
    assert(rows(1).denial_days.contains(30L))
    assert(rows.head.denial_days.isEmpty)
  }
}
