package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction: rewrite a parquet directory into size-targeted
  * files. Streaming ingest and per-batch sinks leave thousands of KB-sized
  * files; at 100 TB the resulting driver listing + task-per-file overhead
  * dominates scan time (the classic small-files problem). Compaction is the
  * periodic maintenance pass every large table needs.
  *
  * The partition count comes from the actual on-disk byte size over a
  * target file size (128-512 MB is the parquet sweet spot — row groups big
  * enough to amortize dictionary/stats overhead, small enough to split).
  * `repartition(n)` round-robins rows for even output sizes; reading
  * already bin-packs small files into shared input splits
  * (`spark.sql.files.openCostInBytes`), so the shuffle moves each byte
  * once. Never `coalesce(1)`: one writer serializes the whole rewrite.
  */
object Compaction {

  /** On-disk byte size of a table directory (driver-side metadata listing,
    * no data read).
    */
  def dirBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_")) total += f.getLen
    }
    total
  }

  /** Compact `inDir` into `outDir` targeting `targetBytes` per file.
    * Returns the partition (≈ file) count written.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L << 20): Int = {
    val n = math.max(1L, (dirBytes(spark, inDir) + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartition(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }
}
