package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import graft.functions.Norm
import graft.ingest.CsvIngest
import graft.quality.DataQuality

/** Ingest/DQ robustness on the reference's REAL CMS CSVs (public data,
  * FIXTURES.md §A — messy headers, zero-padded codes, mixed-type columns,
  * placeholder text in numeric columns). Skips silently if the reference
  * data directory is absent.
  */
class RealCmsDataSpec extends SparkSpec {

  private val srcDir = "/root/reference/Nursing_Homes_data"

  private lazy val dataDir: Option[String] =
    if (!Files.isDirectory(Paths.get(srcDir))) None
    else {
      val d = Files.createTempDirectory("graft_cms")
      Files.list(Paths.get(srcDir)).forEach { p =>
        if (p.toString.toLowerCase.endsWith(".csv"))
          Files.copy(p, d.resolve(p.getFileName.toString),
            StandardCopyOption.REPLACE_EXISTING)
      }
      Some(d.toString)
    }

  test("bulk loader ingests every real CMS CSV with derived table names") {
    assume(dataDir.isDefined)
    val loaded = CsvIngest.loadDirectory(spark, dataDir.get)
    assert(loaded.size >= 6)
    // the provider vax file is the largest (14,814 rows per BASELINE.md)
    val vax = loaded.keys.find(_.contains("covidvaxprovider"))
    assert(vax.isDefined)
    assert(loaded(vax.get).count() == 14814)
  }

  test("header normalization handles the real messy CMS headers") {
    assume(dataDir.isDefined)
    val vaxFile = new java.io.File(dataDir.get).listFiles()
      .find(_.getName.contains("CovidVaxProvider")).get
    val raw = spark.read.option("header", "true").csv(vaxFile.getAbsolutePath)
    val normed = raw.columns.map(Norm.normIdentifier)
    assert(normed.contains("cms_certification_number_ccn"))
    assert(normed.forall(c => c.matches("[a-z0-9_]+") &&
      !c.startsWith("_") && !c.endsWith("_")))
    // zero-padded CCNs survive (strings, not inferred ints)
    val ccn = raw.select(col("CMS Certification Number (CCN)"))
      .na.drop().limit(100).collect().map(_.getString(0))
    assert(ccn.exists(_.startsWith("0")))
  }

  test("completeness profile over a real file flags sparse footnote columns") {
    assume(dataDir.isDefined)
    val perfFile = new java.io.File(dataDir.get).listFiles()
      .find(_.getName.contains("Facility_Performance")).get
    val df = spark.read.option("header", "true").csv(perfFile.getAbsolutePath)
    val prof = DataQuality.completeness(df, "snf_vbp")
    val pcts = prof.collect().map(r => r.getString(1) -> r.getDouble(4)).toMap
    assert(pcts.values.forall(p => p >= 0.0 && p <= 100.0))
    // footnote columns are mostly null in the real data; core ids are full
    assert(pcts.exists { case (c, p) => c.toLowerCase.contains("footnote") && p < 50.0 })
    assert(pcts.exists { case (c, p) => c.toLowerCase.contains("ccn") && p == 100.0 })
  }

  test("aggregate file's placeholder text coerces to null, not error") {
    assume(dataDir.isDefined)
    val aggFile = new java.io.File(dataDir.get).listFiles()
      .find(_.getName.contains("Aggregate_Performance")).get
    val df = spark.read.option("header", "true").csv(aggFile.getAbsolutePath)
    // every column cast to double: placeholder strings -> null, no crash
    val casted = df.select(df.columns.map(c =>
      graft.functions.Cleaning.coerceNumeric(col(c)).as(c)).toIndexedSeq: _*)
    assert(casted.count() == 1) // single national-aggregate row
  }
}
