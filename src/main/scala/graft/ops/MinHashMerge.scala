package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator merging per-document MinHash signatures into a
  * group-level signature by element-wise min (SURVEY §7.3's custom-
  * aggregate tier).
  *
  * Element-wise min is associative and commutative, so Spark runs this as a
  * partial+final aggregate: each partition folds its docs map-side and only
  * `numHashes` longs per group cross the shuffle — group-level near-dup
  * detection over 100 TB moves signatures, never shingles.
  */
class MinHashMerge(numHashes: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes && i < sig.length) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashMerge {
  /** Column function: merge per-doc signature arrays within a group. */
  def minhashMerge(numHashes: Int)(sig: Column): Column =
    udaf(new MinHashMerge(numHashes)).apply(sig)
}
