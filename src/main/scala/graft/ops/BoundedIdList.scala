package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Cap-bounded member-list collect for hot-bucket-railed candidate
  * generation ([[Dedup.minhashBuckets]]): per group, the EXACT row count
  * plus the member ids — but the id buffer stops growing at `cap + 1`
  * elements, so a degenerate bucket (every empty doc, a viral boilerplate
  * page) holds O(cap) state in the aggregation hash map instead of an
  * unbounded `collect_list` that OOMs exactly when the cap is needed
  * most. The +1 sentinel slot distinguishes "exactly cap members" from
  * "overflowed" inside partial buffers before counts merge.
  *
  * Contract: groups with n <= cap finish with ALL n ids, ascending
  * (deterministic under any partitioning / merge order — the buffer is
  * order-insensitive because it is only sorted at finish, and a kept
  * group never dropped an id); groups with n > cap finish with an EMPTY
  * id list (callers drop them via the count — the truncated sample is
  * never surfaced, so no nondeterministic subset leaks into results).
  * `reduce` is O(1) amortized append (no per-row insertion sort: at
  * cap ~1000s that would be O(rows x cap) on the hot bucket itself).
  */
class BoundedIdListAgg(cap: Int)
    extends Aggregator[Long, (Array[Long], Long), (Seq[Long], Long)] {
  require(cap >= 1, "cap must be >= 1")

  override def zero: (Array[Long], Long) = (Array.empty[Long], 0L)

  override def reduce(buf: (Array[Long], Long), in: Long): (Array[Long], Long) = {
    val (ids, n) = buf
    if (ids.length > cap) (ids, n + 1) // already overflowed: count only
    else {
      val out = new Array[Long](ids.length + 1)
      System.arraycopy(ids, 0, out, 0, ids.length)
      out(ids.length) = in
      (out, n + 1)
    }
  }

  override def merge(a: (Array[Long], Long), b: (Array[Long], Long)): (Array[Long], Long) = {
    val n = a._2 + b._2
    val keep = math.min(a._1.length + b._1.length, cap + 1)
    val out = new Array[Long](keep)
    val fromA = math.min(a._1.length, keep)
    System.arraycopy(a._1, 0, out, 0, fromA)
    System.arraycopy(b._1, 0, out, fromA, keep - fromA)
    (out, n)
  }

  override def finish(r: (Array[Long], Long)): (Seq[Long], Long) =
    (if (r._2 <= cap) r._1.sorted.toSeq else Seq.empty[Long], r._2)

  override def bufferEncoder: Encoder[(Array[Long], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Long)]()

  override def outputEncoder: Encoder[(Seq[Long], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Long], Long)]()
}
