package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Embedding aggregation: per-group mean vectors (class centroids, topic
  * prototypes, user profiles) and nearest-centroid assignment.
  *
  * The centroid compute is relational — `posexplode` to (group, dim,
  * value), one partial+final hash aggregate per (group, dim), regroup to a
  * position-sorted array — so it scales like any group-by: no per-group
  * vector buffers, no driver collection, dims stream through the shuffle
  * as scalar rows. Per-dimension means are DECIMAL-exact sums divided
  * once, making the result independent of partitioning and replayable by
  * the oracle (same discipline as the trained-IVF centroids).
  */
object EmbeddingAgg {

  /** One row per group: `centroid` = element-wise mean of the group's
    * vectors (null elements skipped per-dimension, like the oracle's
    * SUM/COUNT over non-nulls; null/empty vectors contribute nothing).
    */
  def groupCentroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)))
      .groupBy(col(groupCol), col("pos"))
      .agg((sum(col("col").cast(DecimalType(38, 12))).cast("double") /
        count(col("col"))).as("m"))
      .where(col("m").isNotNull)
      .groupBy(col(groupCol))
      .agg(transform(
        sort_array(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))

  /** Each vector labeled with its nearest centroid (min L2; ties to the
    * smallest centroid key; degenerate vectors -> null distance to every
    * centroid, deterministically assigned the smallest key). Centroids
    * broadcast — the corpus is touched map-side only, plus the bounded
    * per-id top-1 aggregate.
    */
  def assignNearest(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centKeyCol: String,
      centVecCol: String): DataFrame = {
    val scored = df.select(col(idCol), col(vecCol).as("__v"))
      .crossJoin(broadcast(centroids.select(
        col(centKeyCol).cast("long").as("__ck"), col(centVecCol).as("__cv"))))
      .withColumn("negdist",
        -sqrt(graft.functions.Vectors.l2sq(col("__v"), col("__cv"))))
    TopK.perGroupTopK(scored, Seq(idCol), "__ck", "negdist", 1)
      .select(col(idCol), col("__ck").as("nearest"),
        (-col("negdist")).as("dist"))
  }
}
