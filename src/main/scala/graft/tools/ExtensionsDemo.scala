package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Drives GraftExtensions end-to-end: a session with the extension
  * installed, native scalar functions AND the operator TVFs called from
  * SQL, each checked against the library API the TVF splices in (the API
  * results are the oracle-verified corpus operators, so SQL == API is the
  * full equivalence chain). Exits non-zero on any mismatch.
  */
object ExtensionsDemo {

  /** Runs every check; returns failure messages (empty = all green). */
  def check(spark: SparkSession, sfDir: String): Seq[String] = {
    graft.core.Graft.tune(spark)
    val fails = scala.collection.mutable.Buffer.empty[String]

    val row = spark.sql(
      """SELECT hash60('abc') AS h,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d""".stripMargin)
      .collect().head
    val expectedH = 648541476951500027L // ('0x'||substr(md5('abc'),1,15))::BIGINT
    if (row.getLong(0) != expectedH || row.getDouble(1) != 11.0)
      fails += s"scalar natives diverged: $row"

    graft.core.Graft.table(spark, sfDir, "documents")
      .createOrReplaceTempView("documents")
    graft.core.Graft.table(spark, sfDir, "embeddings")
      .createOrReplaceTempView("embeddings")
    def rows(df: DataFrame): Seq[String] = df.collect().map(_.toString).toSeq

    val dedupSql = rows(spark.sql(
      "SELECT * FROM graft_dedup_exact('documents', 'text', 'doc_id') ORDER BY digest"))
    val dedupApi = rows(graft.ops.Dedup
      .exact(spark.table("documents"), "text", "doc_id").orderBy("digest"))
    if (dedupSql.isEmpty || dedupSql != dedupApi)
      fails += s"graft_dedup_exact TVF != Dedup.exact API (${dedupSql.size} vs ${dedupApi.size} rows)"

    val mhSql = rows(spark.sql(
      "SELECT * FROM graft_minhash_pairs('documents', 'text', 'doc_id', 0.7D) ORDER BY id_a, id_b"))
    val mhApi = rows(graft.ops.Dedup
      .minhashPairs(spark.table("documents"), "text", "doc_id", threshold = 0.7)
      .orderBy("id_a", "id_b"))
    if (mhSql != mhApi)
      fails += s"graft_minhash_pairs TVF != Dedup.minhashPairs API (${mhSql.size} vs ${mhApi.size} rows)"

    val fzSql = rows(spark.sql(
      "SELECT * FROM graft_fuzzy_dedup('documents', 'text', 'doc_id', 0.7D) ORDER BY doc_id"))
    val fzApi = rows(graft.ops.Dedup
      .fuzzyDedup(spark.table("documents"), "text", "doc_id", threshold = 0.7)
      .orderBy("doc_id"))
    if (fzSql.isEmpty || fzSql != fzApi)
      fails += s"graft_fuzzy_dedup TVF != Dedup.fuzzyDedup API (${fzSql.size} vs ${fzApi.size} rows)"

    val knnSql = rows(spark.sql(
      "SELECT * FROM graft_knn_join('embeddings', 'embeddings', 3, 4) ORDER BY query_id, rank"))
    val knnApi = rows(graft.ops.Similarity
      .knnJoin(spark.table("embeddings"), spark.table("embeddings"), k = 3, nBlocks = 4)
      .orderBy("query_id", "rank"))
    if (knnSql.isEmpty || knnSql != knnApi)
      fails += s"graft_knn_join TVF != Similarity.knnJoin API (${knnSql.size} vs ${knnApi.size} rows)"

    val ivfSql = rows(spark.sql(
      "SELECT * FROM graft_knn_join_ivf('embeddings', 'embeddings', 3, 8, 2) ORDER BY query_id, rank"))
    val ivfApi = rows(graft.ops.Similarity
      .knnJoinIvf(spark.table("embeddings"), spark.table("embeddings"),
        k = 3, nCells = 8, nProbe = 2)
      .orderBy("query_id", "rank"))
    if (ivfSql.isEmpty || ivfSql != ivfApi)
      fails += s"graft_knn_join_ivf TVF != Similarity.knnJoinIvf API (${ivfSql.size} vs ${ivfApi.size} rows)"

    val gateSql = rows(spark.sql(
      "SELECT doc_id, keep FROM graft_quality_gate('documents', 'text') ORDER BY doc_id"))
    val gateApi = rows(graft.ops.TextAnalysis
      .qualityGate(spark.table("documents"), "text")
      .select(col("doc_id"), col("keep")).orderBy("doc_id"))
    if (gateSql.isEmpty || gateSql != gateApi)
      fails += s"graft_quality_gate TVF != TextAnalysis.qualityGate API (${gateSql.size} vs ${gateApi.size} rows)"

    // as-of join over views/purchases derived from events (same shape as
    // the j4_asof_join corpus entry)
    val ev = graft.core.Graft.table(spark, sfDir, "events")
      .withColumn("ts_us", org.apache.spark.sql.functions.expr("ts DIV 1000"))
    val views = ev.where(col("event_type") === "view" && col("user_id") <= 300)
      .select("user_id", "ts_us", "event_id")
    val purchases = ev.where(col("event_type") === "purchase" && col("user_id") <= 300)
      .groupBy("user_id", "ts_us")
      .agg(org.apache.spark.sql.functions.max("value").as("pval"))
    views.createOrReplaceTempView("asof_views")
    purchases.createOrReplaceTempView("asof_purchases")
    val asofSql = rows(spark.sql(
      """SELECT * FROM graft_asof_join('asof_views', 'asof_purchases',
        |  'user_id', 'ts_us', 'pval') ORDER BY user_id, ts_us, event_id""".stripMargin))
    val asofApi = rows(graft.ops.AsOfJoin
      .asOf(spark.table("asof_views"), spark.table("asof_purchases"),
        Seq("user_id"), "ts_us", Seq("pval"))
      .orderBy("user_id", "ts_us", "event_id"))
    if (asofSql.isEmpty || asofSql != asofApi)
      fails += s"graft_asof_join TVF != AsOfJoin.asOf API (${asofSql.size} vs ${asofApi.size} rows)"

    val segSql = rows(spark.sql(
      "SELECT * FROM graft_segment_dedup('documents', 'text', 'doc_id', ' table ', 25) ORDER BY doc_id"))
    val segApi = rows(graft.ops.Dedup
      .segmentDedup(spark.table("documents"), "text", "doc_id",
        sep = " table ", maxDocFreq = 25L)
      .orderBy("doc_id"))
    if (segSql.isEmpty || segSql != segApi)
      fails += s"graft_segment_dedup TVF != Dedup.segmentDedup API (${segSql.size} vs ${segApi.size} rows)"

    fails.toSeq
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-demo")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val fails = check(spark, sfDir)
    if (fails.isEmpty) println("[extensions-demo] scalar + 8 TVFs ok=true")
    else fails.foreach(f => println(s"[extensions-demo] FAIL: $f"))
    spark.stop()
    if (fails.nonEmpty) sys.exit(1)
  }
}
