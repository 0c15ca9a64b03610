package graft

import org.apache.spark.sql.functions._
import graft.ops.TDigest

/** t-digest contract: rank-error bounds (not bit-equality — merge order
  * is partition-dependent by design; see TDigestAgg scaladoc).
  */
class TDigestSpec extends SparkSpec {
  import spark.implicits._

  private val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  /** Empirical rank of value v in sorted data, as a fraction. */
  private def rankOf(sorted: Array[Double], v: Double): Double = {
    val i = java.util.Arrays.binarySearch(sorted, v)
    val pos = if (i >= 0) i else -i - 1
    pos.toDouble / sorted.length
  }

  private def assertRankErrors(data: Seq[Double], parts: Int,
      tol: Double): Unit = {
    val est = data.toDF("x").repartition(parts)
      .agg(TDigest.quantiles(100, qs)(col("x")))
      .head.getSeq[Double](0)
    val sorted = data.sorted.toArray
    for ((q, e) <- qs.zip(est)) {
      val err = math.abs(rankOf(sorted, e) - q)
      assert(err <= tol, s"q=$q est=$e rank err $err > $tol (parts=$parts)")
    }
  }

  test("uniform data: rank error within 1% at compression 100") {
    val data = (0 until 20000).map(i => ((i * 7919) % 20000).toDouble)
    assertRankErrors(data, 1, 0.01)
    assertRankErrors(data, 16, 0.015) // merged digests: slightly looser
  }

  test("heavy-tailed data keeps tail quantiles accurate") {
    // deterministic lognormal-ish: exp of a triangular ramp
    val data = (0 until 20000).map(i => math.exp(((i * 7919) % 20000) / 2500.0))
    assertRankErrors(data, 8, 0.015)
  }

  test("extreme quantiles hit exact min/max") {
    val data = (1 to 5000).map(_.toDouble)
    val est = data.toDF("x").repartition(4)
      .agg(TDigest.quantiles(100, Seq(0.0, 1.0))(col("x")))
      .head.getSeq[Double](0)
    assert(est(0) == 1.0 && est(1) == 5000.0)
  }

  test("nulls and NaNs are skipped; empty input yields NaN") {
    val est = Seq[Option[Double]](Some(1.0), None, Some(3.0), Some(Double.NaN))
      .toDF("x").agg(TDigest.quantiles(100, Seq(0.5))(col("x")))
      .head.getSeq[Double](0)
    assert(est(0) >= 1.0 && est(0) <= 3.0)
    val empty = Seq.empty[Double].toDF("x")
      .agg(TDigest.quantiles(100, Seq(0.5))(col("x"))).head
    assert(empty.isNullAt(0) || empty.getSeq[Double](0)(0).isNaN)
  }

  test("state stays bounded: centroid count ~ O(compression)") {
    // 200k values through a single partition; finish via the public API,
    // probing state indirectly: a digest of that size must still answer
    // in bounded memory — guarded here by median accuracy
    val data = (0 until 200000).map(i => ((i.toLong * 104729L) % 200000L).toDouble)
    val est = data.toDF("x").coalesce(1)
      .agg(TDigest.quantiles(50, Seq(0.5))(col("x")))
      .head.getSeq[Double](0)
    assert(math.abs(est(0) / 200000.0 - 0.5) < 0.02)
  }
}
