package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.StableHash

/** Deterministic sampling: every decision is a pure function of a stable
  * content-independent hash of the row's id, never an RNG. That buys the
  * three properties corpus-scale sampling needs: reproducible across runs,
  * engines and partitionings (an oracle can replay it); consistent across
  * tables (the same id samples in or out everywhere, so joins of samples
  * are samples of joins); and embarrassingly parallel (a map-side filter —
  * no coordination, unlike `df.sample`, whose per-partition RNG changes
  * with the split layout).
  */
object Sampling {

  private val Buckets = 1000000L

  private def bucket(idCol: String, seed: Int) =
    pmod(StableHash.hash60(col(idCol), seed), lit(Buckets))

  /** Keep ~`fraction` of rows, decided by id hash (map-side filter). */
  def bernoulli(df: DataFrame, idCol: String, fraction: Double,
      seed: Int = 0): DataFrame =
    df.where(bucket(idCol, seed) < (fraction * Buckets).toLong)

  /** Per-stratum rates: rows in strata missing from `fractions` keep
    * `default`. The rate table is tiny and broadcast; the decision is
    * still one map-side comparison per row.
    */
  def stratified(df: DataFrame, stratumCol: String,
      fractions: Map[String, Double], idCol: String,
      default: Double = 0.0, seed: Int = 0): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val rates = fractions.toSeq.toDF(stratumCol, "__frac")
    df.join(broadcast(rates), Seq(stratumCol), "left")
      .where(bucket(idCol, seed) <
        (coalesce(col("__frac"), lit(default)) * Buckets).cast("long"))
      .drop("__frac")
  }

  /** Exactly-k uniform sample: the k smallest id hashes. Distributed as a
    * bounded top-k (TakeOrderedAndProject — each partition keeps k rows,
    * never a global sort), and still deterministic: ties in the 60-bit
    * hash are broken by the id itself.
    */
  def uniformK(df: DataFrame, idCol: String, k: Int, seed: Int = 0): DataFrame =
    df.withColumn("__h", StableHash.hash60(col(idCol), seed))
      .orderBy(col("__h"), col(idCol))
      .limit(k)
      .drop("__h")
}
