package graft.ops

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** t-digest buffer: merged centroids (means/weights, sorted by mean), a
  * fixed-capacity pending block of raw values, and exact min/max for the
  * tails.
  */
case class TDigestBuf(
    means: Array[Double], weights: Array[Double],
    pending: Array[Double], nPending: Int,
    min: Double, max: Double)

/** Merging t-digest (Dunning & Ertl, "Computing Extremely Accurate
  * Quantiles Using t-Digests", public algorithm family): centroid sizes
  * are bounded by the arcsin scale function, so relative rank error
  * concentrates at the tails (q→0,1 stay near-exact) with O(compression)
  * state regardless of input size.
  *
  * This is the quantile analogue of [[Sketches]]' HLL/CMS tier: a
  * mergeable partial+final Aggregator — per-partition digests fold
  * map-side and only O(compression) centroids cross the shuffle, where
  * `percentile_approx`-style exact collection would move every value.
  * UNLIKE the HLL/CMS sketches, t-digest results depend (within the rank
  * error bound) on merge order, which Spark does not fix — so this
  * operator is deliberately NOT in the strict-oracle corpus; its contract
  * is the rank-error bound asserted in TDigestSpec, not bit-equality.
  * (Spark's own approx_percentile carries the same caveat.)
  */
class TDigestAgg(compression: Double, quantiles: Seq[Double])
    extends Aggregator[java.lang.Double, TDigestBuf, Seq[Double]] {
  require(compression >= 20, "compression too small to bound error")
  require(quantiles.nonEmpty && quantiles.forall(q => q >= 0 && q <= 1))
  private val pendingCap = 512

  override def zero: TDigestBuf =
    TDigestBuf(Array.empty, Array.empty, new Array[Double](pendingCap), 0,
      Double.PositiveInfinity, Double.NegativeInfinity)

  override def reduce(b: TDigestBuf, x: java.lang.Double): TDigestBuf = {
    if (x == null || x.isNaN) b
    else {
      val v = x.doubleValue
      val base = if (b.nPending >= pendingCap) flush(b) else b
      base.pending(base.nPending) = v
      base.copy(nPending = base.nPending + 1,
        min = math.min(base.min, v), max = math.max(base.max, v))
    }
  }

  override def merge(a: TDigestBuf, b: TDigestBuf): TDigestBuf = {
    val fa = flush(a); val fb = flush(b)
    val n = fa.means.length + fb.means.length
    val m = new Array[Double](n); val w = new Array[Double](n)
    // merge two mean-sorted centroid runs
    var i = 0; var j = 0; var k = 0
    while (i < fa.means.length && j < fb.means.length) {
      if (fa.means(i) <= fb.means(j)) {
        m(k) = fa.means(i); w(k) = fa.weights(i); i += 1
      } else { m(k) = fb.means(j); w(k) = fb.weights(j); j += 1 }
      k += 1
    }
    while (i < fa.means.length) { m(k) = fa.means(i); w(k) = fa.weights(i); i += 1; k += 1 }
    while (j < fb.means.length) { m(k) = fb.means(j); w(k) = fb.weights(j); j += 1; k += 1 }
    val (cm, cw) = compress(m, w)
    TDigestBuf(cm, cw, fa.pending, 0,
      math.min(fa.min, fb.min), math.max(fa.max, fb.max))
  }

  override def finish(b: TDigestBuf): Seq[Double] = {
    val f = flush(b)
    quantiles.map(q => quantileOf(f, q))
  }

  /** Fold the pending raw block into the centroid set. */
  private def flush(b: TDigestBuf): TDigestBuf = {
    if (b.nPending == 0) b
    else {
      val sortedPend = java.util.Arrays.copyOf(b.pending, b.nPending)
      java.util.Arrays.sort(sortedPend)
      val n = b.means.length + b.nPending
      val m = new Array[Double](n); val w = new Array[Double](n)
      var i = 0; var j = 0; var k = 0
      while (i < b.means.length && j < b.nPending) {
        if (b.means(i) <= sortedPend(j)) {
          m(k) = b.means(i); w(k) = b.weights(i); i += 1
        } else { m(k) = sortedPend(j); w(k) = 1.0; j += 1 }
        k += 1
      }
      while (i < b.means.length) { m(k) = b.means(i); w(k) = b.weights(i); i += 1; k += 1 }
      while (j < b.nPending) { m(k) = sortedPend(j); w(k) = 1.0; j += 1; k += 1 }
      val (cm, cw) = compress(m, w)
      b.copy(means = cm, weights = cw, nPending = 0)
    }
  }

  /** arcsin scale: k(q) in [0, compression], steepest at the tails. */
  private def kScale(q: Double): Double = {
    val qq = math.max(0.0, math.min(1.0, q))
    compression * (math.asin(2 * qq - 1) / math.Pi + 0.5)
  }

  /** One merging-compression pass over mean-sorted centroids: absorb a
    * neighbor while the k-span of the merged centroid stays <= 1.
    */
  private def compress(m: Array[Double], w: Array[Double])
      : (Array[Double], Array[Double]) = {
    if (m.length <= 1) (m, w)
    else {
      val total = w.sum
      val om = new scala.collection.mutable.ArrayBuffer[Double](m.length)
      val ow = new scala.collection.mutable.ArrayBuffer[Double](m.length)
      var curM = m(0); var curW = w(0)
      var wSoFar = 0.0
      var kLow = kScale(0.0)
      var i = 1
      while (i < m.length) {
        if (kScale((wSoFar + curW + w(i)) / total) - kLow <= 1.0) {
          curM = (curM * curW + m(i) * w(i)) / (curW + w(i))
          curW += w(i)
        } else {
          om += curM; ow += curW
          wSoFar += curW
          kLow = kScale(wSoFar / total)
          curM = m(i); curW = w(i)
        }
        i += 1
      }
      om += curM; ow += curW
      (om.toArray, ow.toArray)
    }
  }

  /** Quantile by midpoint-rule interpolation between centroid means, with
    * exact min/max endpoints.
    */
  private def quantileOf(b: TDigestBuf, q: Double): Double = {
    val n = b.means.length
    if (n == 0) Double.NaN
    else if (n == 1) b.means(0)
    else {
      val total = b.weights.sum
      val target = q * total
      if (target <= b.weights(0) / 2) {
        // interpolate min -> first centroid mean
        val t = target / (b.weights(0) / 2)
        b.min + t * (b.means(0) - b.min)
      } else {
        var cum = 0.0
        var i = 0
        while (i < n - 1) {
          val mid = cum + b.weights(i) / 2
          val nextMid = cum + b.weights(i) + b.weights(i + 1) / 2
          if (target <= nextMid) {
            if (target <= mid) { /* unreachable after first branch for i=0 */ }
            val t = (target - mid) / (nextMid - mid)
            return b.means(i) + t * (b.means(i + 1) - b.means(i))
          }
          cum += b.weights(i)
          i += 1
        }
        // beyond the last midpoint: interpolate last mean -> max
        val lastMid = cum + b.weights(n - 1) / 2
        val t = math.min(1.0, (target - lastMid) / (b.weights(n - 1) / 2))
        b.means(n - 1) + t * (b.max - b.means(n - 1))
      }
    }
  }

  override def bufferEncoder: Encoder[TDigestBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[TDigestBuf]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object TDigest {
  /** Column aggregate: t-digest quantile estimates of a double column. */
  def quantiles(compression: Double, qs: Seq[Double])(c: Column): Column =
    udaf(new TDigestAgg(compression, qs)).apply(c)
}
