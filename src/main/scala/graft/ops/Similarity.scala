package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query side is broadcast
  *    (it is always small); the corpus is streamed map-side and reduced with
  *    a per-query top-k window — no corpus-sized shuffle. Baseline and
  *    recall oracle.
  *  - [[lshTopK]]: random-hyperplane-bucketed search. Corpus is bucketed
  *    once (map-side projection); each query probes its own bucket plus
  *    `probes-1` nearest Hamming-neighbor buckets. At 100 TB the bucketed
  *    corpus would be written bucket-partitioned so a query touches only
  *    its buckets' files (partition pruning), not the full corpus.
  */
object Similarity {

  /** Exact cosine top-k for each query vector. `queries` must be small
    * (driver-known ids or a sampled set) — it is broadcast.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // Norms are hoisted per side (O(n+q) folds) instead of recomputed per
    // pair inside cosine (O(n*q) folds — 3x the work at corpus scale).
    val c = graft.core.Graft.spread(corpus)
      .select(col("vec_id").as("corpus_id"), col("embedding").as("cv"),
        Vectors.norm2(col("embedding")).as("cn"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      Vectors.norm2(col("embedding")).as("qn"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("corpus_id") =!= col("query_id"))
      .withColumn("cosine",
        when(col("qn") > 0 && col("cn") > 0,
          Vectors.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .otherwise(lit(null).cast("double")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"),
        col("rank").cast("long").as("rank")) // long: match BIGINT row_number oracles
  }

  /** IVF-style approximate top-k: corpus vectors are assigned to their
    * nearest centroid cell (inverted file); queries probe the `nProbe`
    * nearest cells only.
    *
    * Centroids here are a deterministic prefix sample (lowest ids) rather
    * than k-means-trained — the partitioning/probing machinery (the part
    * that matters at scale) is identical, and determinism keeps it
    * oracle-checkable. At 100 TB the cell id becomes a partition column so
    * a probe touches only its cells' files.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 2): DataFrame = {
    val cents = broadcast(corpus.orderBy("vec_id").limit(nCells)
      .select(col("vec_id").as("cent_id"), col("embedding").as("centv")))
    def nearestCells(df: DataFrame, idC: String, vC: String, n: Int): DataFrame = {
      val wCell = Window.partitionBy(idC)
        .orderBy(col("dist").asc, col("cent_id").asc)
      df.crossJoin(cents)
        // sqrt(in-order fold) matches DuckDB's list_distance loop exactly
        .withColumn("dist", sqrt(Vectors.l2sq(col(vC), col("centv"))))
        .withColumn("cell_rank", row_number().over(wCell))
        .where(col("cell_rank") <= n)
        .select(col(idC), col(vC), col("cent_id").as("cell"))
    }
    val c = nearestCells(
      graft.core.Graft.spread(corpus)
        .select(col("vec_id").as("corpus_id"), col("embedding").as("cv")),
      "corpus_id", "cv", 1)
      .join(corpus.select(col("vec_id").as("corpus_id"),
        Vectors.norm2(col("embedding")).as("cn")), Seq("corpus_id"))
    val q = nearestCells(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
      "query_id", "qv", nProbe)
      .join(queries.select(col("vec_id").as("query_id"),
        Vectors.norm2(col("embedding")).as("qn")), Seq("query_id"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .where(col("corpus_id") =!= col("query_id"))
      .withColumn("cosine",
        when(col("qn") > 0 && col("cn") > 0,
          Vectors.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .otherwise(lit(null).cast("double")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"),
        col("rank").cast("long").as("rank")) // long: match BIGINT row_number oracles
  }

  /** LSH-bucketed approximate top-k: candidates restricted to query buckets
    * (multi-probe over Hamming-1 neighbors when probes > 1).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      bits: Int = 8, probes: Int = 3): DataFrame = {
    val bucket = Vectors.lshBucket(col("embedding"), bits, dim)
    val c = graft.core.Graft.spread(corpus)
      .select(col("vec_id").as("corpus_id"),
        col("embedding").as("cv"), bucket.as("bucket"),
        Vectors.norm2(col("embedding")).as("cn"))
    // query probes: own bucket + lowest-index Hamming-1 flips
    val flips = (0 until math.max(0, math.min(probes - 1, bits))).toSeq
    val probeBuckets = array((lit(0L) +: flips.map(b => lit(1L << b))): _*)
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"), bucket.as("qbucket"),
      Vectors.norm2(col("embedding")).as("qn"))
      .withColumn("bucket", explode(transform(probeBuckets,
        f => col("qbucket").bitwiseXOR(f))))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("corpus_id") =!= col("query_id"))
      .withColumn("cosine",
        when(col("qn") > 0 && col("cn") > 0,
          Vectors.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .otherwise(lit(null).cast("double")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"),
        col("rank").cast("long").as("rank")) // long: match BIGINT row_number oracles
  }
}
