package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.StableHash

/** Deterministic output sharding: the "global shuffle" a training-data
  * export runs last — every row assigned to one of `nShards` shards by a
  * stable content-independent id hash, so the shard layout is reproducible
  * across runs/engines/partitionings (same property family as
  * [[Sampling]]), shards are statistically balanced regardless of input
  * order or skew in the id space, and a given id always lands in the same
  * shard (incremental re-exports stay consistent).
  *
  * Shape at scale: assignment is one map-side expression; the only
  * exchange is whatever the caller does with it — `partitionBy("shard")`
  * on write, or a `repartition(col("shard"))` for exactly-one-file-per-
  * shard layouts. Balance auditing is a k-row aggregate.
  */
object Sharding {

  /** Adds a `shard` column in [0, nShards). */
  def assign(df: DataFrame, idCol: String, nShards: Int,
      seed: Int = 0): DataFrame = {
    require(nShards > 0, "need at least one shard")
    df.withColumn("shard",
      pmod(StableHash.hash60(col(idCol).cast("string"), seed), lit(nShards.toLong)))
  }

  /** Per-shard balance audit: row count plus the sum of a size column
    * (tokens/bytes) — the numbers an export job checks before shipping.
    */
  def stats(df: DataFrame, idCol: String, sizeCol: String, nShards: Int,
      seed: Int = 0): DataFrame =
    assign(df, idCol, nShards, seed)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        sum(col(sizeCol).cast("long")).as("total_size"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))

  /** Shard-partitioned parquet export: one directory per shard
    * (`shard=N/`), each shard's rows coalesced through the shard-keyed
    * exchange so a 100 TB export writes nShards parallel streams rather
    * than files-per-task x shards small files.
    */
  def writeSharded(df: DataFrame, idCol: String, nShards: Int, path: String,
      seed: Int = 0): Unit =
    assign(df, idCol, nShards, seed)
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
