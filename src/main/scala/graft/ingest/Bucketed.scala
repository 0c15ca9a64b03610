package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout: pre-shuffle a table ONCE at write time so that
  * every later join/aggregate on the bucket key runs exchange-free.
  *
  * At 100 TB the dominant cost of a fact-fact join is shuffling both
  * sides. Writing both tables bucketed by the join key into the same
  * bucket count moves that shuffle to ingest time (paid once, amortized
  * over every downstream query): Spark's scan reports the bucketing as a
  * `HashPartitioning` output, and the planner drops both Exchanges from
  * the sort-merge join (asserted in PlanShapeSpec). Sorting within
  * buckets additionally lets the join skip its local sort.
  *
  * Bucket-count sizing at scale: buckets are the unit of join parallelism
  * AND the per-file row group — target `corpus_bytes / buckets` around
  * 128-512 MB. Too few buckets caps parallelism; too many makes small
  * files. The count must MATCH between co-joined tables (Spark only
  * removes both exchanges when the bucket specs line up).
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted managed table (parquet). */
  def write(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Read a bucketed table back (the catalog carries the bucket spec). */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
