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
}
