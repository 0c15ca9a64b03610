package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Graft
import graft.functions.{StableHash, Text}

/** Dev-only micro-profiler for the CPU-heavy operators. */
object Profile {
  def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  (n=$n)")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.tune(spark)
    def docs: DataFrame = Graft.table(spark, sfDir, "documents")

    time("read+count")(docs.count())
    time("spread+count")(Graft.spread(docs).count())
    time("tokens")(Graft.spread(docs)
      .select(size(Text.tokens(col("text"))).as("n")).agg(sum("n")).count())
    time("shingles")(Graft.spread(docs)
      .select(size(Text.wordShingles(col("text"), 3)).as("n")).agg(sum("n")).count())
    time("shingle+hash")(Graft.spread(docs)
      .select(size(transform(Text.wordShingles(col("text"), 3),
        s => StableHash.hash60(s))).as("n")).agg(sum("n")).count())
    time("minhash4")(graft.ops.Dedup.minhashSignatures(docs, "text", "doc_id", 4, 3).count())
    time("minhash4-again")(graft.ops.Dedup.minhashSignatures(docs, "text", "doc_id", 4, 3).count())
    time("profile")(graft.ops.TextAnalysis.profile(docs).count())
    val emb = Graft.table(spark, sfDir, "embeddings")
    time("brute_topk")(graft.ops.Similarity.bruteForceTopK(
      emb, emb.where(col("vec_id") < 5), 10).count())
    spark.stop()
  }
}
