package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query side is broadcast
  *    (it is always small); the corpus is streamed map-side and reduced with
  *    a bounded partial top-k aggregate — no corpus-sized shuffle, no global
  *    sort. Baseline and recall oracle.
  *  - [[lshTopK]]: random-hyperplane-bucketed search. Corpus is bucketed
  *    once (map-side projection); each query probes its own bucket plus
  *    `probes-1` nearest Hamming-neighbor buckets. At 100 TB the bucketed
  *    corpus would be written bucket-partitioned so a query touches only
  *    its buckets' files (partition pruning), not the full corpus.
  *
  * All three paths finish with [[TopK.perGroupTopK]]: each map partition
  * folds its scored rows into a k-slot buffer, so only `partitions × Q × k`
  * buffer rows cross the shuffle. The previous window-function finisher
  * (`row_number() OVER (PARTITION BY query_id ...)`) shuffled EVERY scored
  * row — corpus × Q for brute force — into Q reducer partitions and sorted
  * there: the classic few-hot-keys scale-killer at 100 TB, and the measured
  * local hotspot too.
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
    TopK.perGroupTopK(scored, Seq("query_id"), "corpus_id", "cosine", k)
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
    // Nearest-n cells per vector, again via the bounded aggregate (the old
    // row_number window here shuffled corpus × nCells rows on the vector
    // id). Score = -distance: the aggregate ranks desc, distance ranks asc;
    // cent_id asc breaks ties either way.
    def nearestCells(df: DataFrame, idC: String, vC: String, n: Int): DataFrame = {
      val scored = df.crossJoin(cents)
        // sqrt(in-order fold) matches DuckDB's list_distance loop exactly
        .withColumn("negdist", -sqrt(Vectors.l2sq(col(vC), col("centv"))))
      // vC rides along as a (functionally dependent) group key — no re-join
      TopK.perGroupTopK(scored, Seq(idC, vC), "cent_id", "negdist", n)
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
    TopK.perGroupTopK(scored, Seq("query_id"), "corpus_id", "cosine", k)
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
    TopK.perGroupTopK(scored, Seq("query_id"), "corpus_id", "cosine", k)
  }
}
