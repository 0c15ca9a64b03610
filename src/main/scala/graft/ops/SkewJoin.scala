package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual key-salting for skewed equi-joins — the fallback when AQE's
  * skew-join split isn't available (e.g. a bucketed/pre-shuffled child) or
  * a single hot key dominates beyond what stage splitting fixes.
  *
  * The skewed (large) side gets a uniform pseudo-random salt in [0, n)
  * derived from its whole row (xxhash64 — engine-local only, never crosses
  * to an oracle); the build (small-ish) side is replicated n ways. The join
  * key becomes (keys..., salt), spreading each hot key over n reducers.
  * Results are row-identical to the unsalted join; only the partitioning
  * changes.
  */
object SkewJoin {

  def saltedInnerJoin(skewed: DataFrame, other: DataFrame,
      keys: Seq[String], saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col).toIndexedSeq: _*), lit(saltBuckets))
        .cast("int"))
    val replicated = other.withColumn("__salt",
      explode(lit((0 until saltBuckets).toArray)))
    salted.join(replicated, keys :+ "__salt", "inner").drop("__salt")
  }

  /** Two-stage skew-safe aggregation — the aggregation analogue of
    * [[saltedInnerJoin]]: stage 1 pre-aggregates on (keys, salt), spreading
    * one hot key over `saltBuckets` reducers; stage 2 merges the salt
    * buckets. Row-identical to the plain groupBy for decomposable
    * aggregates (exact sums/counts here; for doubles, cents/decimal-encode
    * first — the house rule — so the merge order can't perturb results).
    *
    * The salt is the task's partition id mod buckets: free to compute, and
    * rows of a hot key that arrive spread across input partitions STAY
    * spread in stage 1. (Spark's own partial aggregation covers the
    * common case; explicit salting is for the regime where even
    * per-partition partials leave one reducer holding a giant hash —
    * e.g. high-cardinality sub-keys under one hot group key.)
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    df.withColumn("__salt", pmod(spark_partition_id(), lit(saltBuckets)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__n"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__s")).as(s"sum_$valueCol"),
        sum(col("__n")).cast("long").as("n_rows"))
  }
}
