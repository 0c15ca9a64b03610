package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Graft
import graft.functions.{StableHash, Text}

/** Dev-only stage-by-stage profiler for duplicatedPassages' plan at
  * probe scales: times each pipeline prefix and the candidate plan
  * variants so a scale regression can be attributed to a stage instead
  * of guessed at. Usage:
  * SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.PassagesProbe [variant...]
  */
object PassagesProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.tune(spark)
    val picked = if (args.nonEmpty) args.toSet else Set.empty[String]
    def want(n: String) = picked.isEmpty || picked.contains(n)

    val k = 5
    def windows: DataFrame = {
      val df = Graft.table(spark, dir, "documents")
      val toks = Text.tokens(col("text"))
      val n = size(toks)
      val shifted = (0 until k).map(j => slice(toks, lit(j + 1), n))
      val grams = shifted.reduceRight((a, b) =>
        zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
      Graft.spread(df)
        .select(col("doc_id").as("id"),
          posexplode(slice(grams, lit(1), greatest(n - (k - 1), lit(0)))))
        .select(col("id"), (col("pos") + 1).cast("long").as("p"),
          StableHash.hash60(col("col")).as("g"))
    }
    def dupGrams: DataFrame = windows.groupBy("g")
      .agg(count(lit(1)).as("__occ"))
      .where(col("__occ") >= 2 && col("__occ") <= 10000)
      .select("g")

    def time(name: String)(f: => Long): Unit = if (want(name)) {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(
        f"[passages-probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.1f s  (n=$n)")
    }

    def islandMerge(marked: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.{Window => W}
      val w = W.partitionBy("id").orderBy("p")
      marked
        .withColumn("__prev", lag(col("p"), 1).over(w))
        .withColumn("__new",
          when(col("__prev").isNull || col("p") > col("__prev") + k, 1L)
            .otherwise(0L))
        .withColumn("__island", sum(col("__new")).over(
          w.rowsBetween(W.unboundedPreceding, 0)))
        .groupBy("id", "__island")
        .agg(min(col("p")).as("span_start"),
          (max(col("p")) + (k - 1)).as("span_end"),
          count(lit(1)).as("n_windows"))
        .select(col("id"), col("span_start"), col("span_end"),
          (col("span_end") - col("span_start") + 1).as("span_tokens"),
          col("n_windows"))
    }
    // variant B: count window over the 8-byte hash — single computation,
    // one 24-byte-row sort instead of agg + second shuffle + probe
    def variantWindow: DataFrame = {
      import org.apache.spark.sql.expressions.{Window => W}
      islandMerge(windows
        .withColumn("__occ", count(lit(1)).over(W.partitionBy("g")))
        .where(col("__occ") >= 2 && col("__occ") <= 10000)
        .select("id", "p"))
    }

    time("windows_map")(windows.queryExecution.toRdd.count())
    time("distinct_grams")(
      windows.select(approx_count_distinct("g")).as[Long](
        org.apache.spark.sql.Encoders.scalaLong).collect().head)
    time("dup_grams_agg")(dupGrams.queryExecution.toRdd.count())
    time("semi_join_marked")(
      windows.join(dupGrams.hint("shuffle_hash"), Seq("g"), "left_semi")
        .queryExecution.toRdd.count())
    time("full_operator")(
      graft.ops.Dedup.duplicatedPassages(
        Graft.table(spark, dir, "documents"), "text", "doc_id", k)
        .queryExecution.toRdd.count())
    time("variant_window")(variantWindow.queryExecution.toRdd.count())
    time("full_operator_2")(
      graft.ops.Dedup.duplicatedPassages(
        Graft.table(spark, dir, "documents"), "text", "doc_id", k)
        .queryExecution.toRdd.count())
    time("variant_window_2")(variantWindow.queryExecution.toRdd.count())
    spark.stop()
  }
}
