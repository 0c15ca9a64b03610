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

    // A/B: decimal vs integer-cents exact aggregation on q1-shaped agg
    import org.apache.spark.sql.types.DecimalType
    def li = Graft.table(spark, sfDir, "lineitem")
    def q1dec = li.groupBy("l_returnflag", "l_linestatus").agg(
      sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("a"),
      sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("b"),
      sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1) - col("l_discount").cast(DecimalType(18, 2)))).cast("double").as("c"),
      count(lit(1)).as("n"))
    def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")
    def q1cents = li.groupBy("l_returnflag", "l_linestatus").agg(
      (sum(cents(col("l_quantity"))).cast("double") / 100).as("a"),
      (sum(cents(col("l_extendedprice"))).cast("double") / 100).as("b"),
      (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        .cast("double") / 10000).as("c"),
      count(lit(1)).as("n"))
    q1dec.count(); q1cents.count() // warm both plans
    time("q1_decimal")(q1dec.count())
    time("q1_cents")(q1cents.count())
    def entryQ1 = graft.SparkEntry.queries("q1_agg")(spark, sfDir)
    entryQ1.count()
    time("q1_entry_count")(entryQ1.count())
    time("q1_entry_noop") { entryQ1.write.format("noop").mode("overwrite").save(); 0L }
    time("q1_entry_noop2") { entryQ1.write.format("noop").mode("overwrite").save(); 0L }
    time("j1_entry_noop") {
      graft.SparkEntry.queries("j1_multiway_join")(spark, sfDir)
        .write.format("noop").mode("overwrite").save(); 0L }
    time("j1_entry_noop2") {
      graft.SparkEntry.queries("j1_multiway_join")(spark, sfDir)
        .write.format("noop").mode("overwrite").save(); 0L }

    // fresh-plan cost: decimal vs cents aggregation (same exec, different
    // analysis complexity)
    (1 to 3).foreach { i =>
      def fresh(mk: => org.apache.spark.sql.DataFrame, tag: String): Unit = {
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        println(f"[profile] freshplan-$tag run$i ${(System.nanoTime() - t0) / 1e9}%5.2fs")
      }
      fresh(q1dec, "decimal")
      fresh(q1cents, "cents")
    }

    // decompose: plan construction vs execution for bench queries
    Seq("q1_agg", "j1_multiway_join", "text_profile").foreach { qn =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(qn)(spark, sfDir)
        val rdd = df.queryExecution.toRdd // forces analysis+optimization+physical
        val t1 = System.nanoTime()
        rdd.count()
        val t2 = System.nanoTime()
        println(f"[profile] $qn%-20s run$i plan=${(t1 - t0) / 1e9}%5.2fs exec=${(t2 - t1) / 1e9}%5.2fs")
      }
    }

    // A/B: j1 with spread probe side
    def j1spread = {
      val o = Graft.table(spark, sfDir, "orders"); val c = Graft.table(spark, sfDir, "customer")
      val n = Graft.table(spark, sfDir, "nation"); val r = Graft.table(spark, sfDir, "region")
      Graft.spread(li).join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_items"))
    }
    j1spread.count()
    time("j1_spread")(j1spread.count())
    time("j1_spread2")(j1spread.count())

    // A/B: single-row-group scan vs spread-then-aggregate
    def q1spread = Graft.spread(li).groupBy("l_returnflag", "l_linestatus").agg(
      sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("a"),
      sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("b"),
      sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1) - col("l_discount").cast(DecimalType(18, 2)))).cast("double").as("c"),
      count(lit(1)).as("n"))
    q1spread.count()
    time("q1_spread")(q1spread.count())
    time("q1_nospread")(q1dec.count())
    time("q1_spread2")(q1spread.count())
    spark.stop()
  }
}
