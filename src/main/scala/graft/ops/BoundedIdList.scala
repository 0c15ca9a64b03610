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
  *
  * Buffer is `(storage, used, count)`: storage grows GEOMETRICALLY
  * (double, clamped at cap + 1) and is appended to in place, so a
  * near-cap group costs O(cap) total copy work across its rows — not the
  * O(cap^2) of reallocating a fresh exact-fit array per row. Small
  * groups (the common case) still hold only a handful of slots: nothing
  * pre-allocates cap-sized storage per group. `used` (not
  * `storage.length`) is the fill level; slack slots are garbage and are
  * never read.
  */
class BoundedIdListAgg(cap: Int)
    extends Aggregator[Long, (Array[Long], Long, Long), (Seq[Long], Long)] {
  require(cap >= 1, "cap must be >= 1")

  private val maxKeep = cap + 1 // overflow sentinel slot

  override def zero: (Array[Long], Long, Long) = (Array.empty[Long], 0L, 0L)

  override def reduce(buf: (Array[Long], Long, Long),
      in: Long): (Array[Long], Long, Long) = {
    val (ids, used64, n) = buf
    val used = used64.toInt
    if (used >= maxKeep) (ids, used64, n + 1) // overflowed: count only
    else {
      val arr =
        if (used < ids.length) ids
        else { // geometric growth, clamped at the sentinel capacity
          val grown =
            new Array[Long](math.min(math.max(ids.length * 2, 4), maxKeep))
          System.arraycopy(ids, 0, grown, 0, used)
          grown
        }
      arr(used) = in
      (arr, used64 + 1, n + 1)
    }
  }

  override def merge(a: (Array[Long], Long, Long),
      b: (Array[Long], Long, Long)): (Array[Long], Long, Long) = {
    val n = a._3 + b._3
    val keep = math.min(a._2 + b._2, maxKeep.toLong).toInt
    val out = new Array[Long](keep)
    val fromA = math.min(a._2.toInt, keep)
    System.arraycopy(a._1, 0, out, 0, fromA)
    System.arraycopy(b._1, 0, out, fromA, keep - fromA)
    (out, keep.toLong, n)
  }

  override def finish(r: (Array[Long], Long, Long)): (Seq[Long], Long) =
    (if (r._3 <= cap) java.util.Arrays.copyOf(r._1, r._2.toInt).sorted.toSeq
     else Seq.empty[Long],
      r._3)

  override def bufferEncoder: Encoder[(Array[Long], Long, Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Long, Long)]()

  override def outputEncoder: Encoder[(Seq[Long], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Long], Long)]()
}
