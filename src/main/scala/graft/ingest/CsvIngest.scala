package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.{ColumnSpec, DatasetSpec}
import graft.functions.{Cleaning, Norm}

/** Config-driven CSV ingestion: glob scan -> header normalization -> typed
  * casts (coerce-to-null) -> missing-column NULL fill -> lineage stamping.
  *
  * Spark-first design notes (vs reference build.py:60-80 which loops files
  * in Python and concats in memory):
  *  - ONE `spark.read.csv(glob)` covers all files of a dataset; Spark
  *    parallelizes the scan per-file/per-split, so 10k files at 100 TB is
  *    the same code path as 2 files at sf0.001.
  *  - lineage (`source_file`) comes from `input_file_name()` inside the
  *    scan, not from a per-file driver loop.
  *  - casts are columnar expressions in one `select` — whole-stage codegen,
  *    column pruning intact.
  */
object CsvIngest {

  def castFor(spec: ColumnSpec, c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    spec.dtype match {
      // reference build.py:29-37: coerce-to-null cast semantics per type
      case "numeric" => Cleaning.coerceNumeric(c)
      case "int"     => c.cast("long")
      case "date"    => Cleaning.coerceDate(c)
      case _         => Cleaning.toTrimmedString(c)
    }

  /** Read every file matching the dataset's glob under `csvDir`, normalize
    * headers, apply declared casts, NULL-fill missing declared columns
    * (reference build.py:73-74), stamp lineage (build.py:75-76).
    */
  def readDataset(spark: SparkSession, csvDir: String, spec: DatasetSpec): DataFrame = {
    graft.core.Graft.tune(spark)
    val raw = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(s"$csvDir/${spec.filenamePattern}")
    val normed = raw.toDF(raw.columns.map(Norm.normIdentifier).toIndexedSeq: _*)
    val present = normed.columns.toSet
    val declared = spec.columns.map { cs =>
      if (present.contains(cs.name)) castFor(cs, col(cs.name)).as(cs.name)
      else lit(null).cast(sparkType(cs.dtype)).as(cs.name) // build.py:73-74
    }
    // keep extra (undeclared) columns as-is, after the declared ones
    val extras = normed.columns.filterNot(spec.columns.map(_.name).contains)
      .map(col).toIndexedSeq
    normed
      .select(declared ++ extras: _*)
      .withColumn("source_file", input_file_name())   // build.py:75
      .withColumn("ingestion_date", current_date())   // build.py:76
  }

  def sparkType(dtype: String): String = dtype match {
    case "numeric" => "double"
    case "int"     => "long"
    case "date"    => "date"
    case _         => "string"
  }

  /** Stage a dataset: overwrite its staging table
    * (reference build.py:79-80 `if_exists='replace'`).
    */
  def stage(spark: SparkSession, csvDir: String, spec: DatasetSpec): DataFrame = {
    val df = readDataset(spark, csvDir, spec)
    df.createOrReplaceTempView(spec.stagingTable)
    df
  }

  /** Bulk per-file loader (reference load_nursing_home_data.py:50-53): one
    * table per CSV file, name derived from the filename.
    */
  def loadDirectory(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    graft.core.Graft.tune(spark)
    val fs = new java.io.File(dir).listFiles()
    val csvs = Option(fs).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.toLowerCase.endsWith(".csv"))
    csvs.map { f =>
      val name = Norm.tableNameFromFile(f.getName)
      val df = spark.read
        .option("header", "true")
        .option("inferSchema", "true") // load_nursing_home_data.py:51
        .csv(f.getAbsolutePath)
      df.createOrReplaceTempView(name)
      name -> df
    }.toMap
  }
}
