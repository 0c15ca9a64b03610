package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import org.apache.spark.sql.streaming.ValueState

import graft.ops.Sketches

/** Streaming per-key distinct-cardinality tracking via the KMV sketch
  * ([[graft.ops.Sketches.kmvInsert]]): bounded state — at most k longs
  * plus a seen-counter per key — and, unlike HLL, an exactly
  * deterministic kept set. Because "the k smallest distinct hashes" is
  * a pure function of the SET of values seen, the tracker is
  * arrival-order independent and batch-split independent by
  * construction: the last emission per key always equals the batch
  * [[graft.ops.Sketches.kmvMins]] sketch over everything ingested, no
  * order-alignment contract needed (contrast stream_holt's high-water
  * discipline). Each micro-batch that touches a key emits the key's
  * updated (n_seen, n_kept, kth_min, est) snapshot; n_seen is strictly
  * monotone, so downstream "latest wins" reads keep the max-n_seen row.
  */
class KmvProcessor(k: Int)
    extends StatefulProcessor[String, (String, Long),
      (String, Long, Long, Long, Long)] {

  @transient private var st: ValueState[(Array[Long], Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    st = getHandle.getValueState[(Array[Long], Long)](
      "kmv", Encoders.product[(Array[Long], Long)], TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timers: TimerValues): Iterator[(String, Long, Long, Long, Long)] = {
    var (buf, seen) =
      if (st.exists()) st.get() else (Array.empty[Long], 0L)
    rows.foreach { r =>
      buf = Sketches.kmvInsert(buf, r._2, k)
      seen += 1L
    }
    st.update((buf, seen))
    val kth = if (buf.isEmpty) 0L else buf.last
    Iterator.single(
      (key, seen, buf.length.toLong, kth, Sketches.kmvEstimate(buf, k)))
  }
}

/** Sketch-emitting variant of [[KmvProcessor]]: each touching micro-batch
  * emits the key's full kept set (`mins`, sorted ascending, ≤ k longs)
  * next to the monotone `n_seen` counter — the form downstream SET
  * ALGEBRA needs ([[graft.ops.Sketches.kmvSetOps]] consumes the kept
  * sets, not just the estimate). Same determinism argument as
  * [[KmvProcessor]]: the kept set is a pure function of the value SET,
  * so the final snapshot per key equals the batch
  * [[graft.ops.Sketches.kmvMins]] sketch regardless of arrival order or
  * batch splits ("latest wins" = the max-n_seen row).
  */
class KmvSketchProcessor(k: Int)
    extends StatefulProcessor[String, (String, Long),
      (String, Long, Seq[Long])] {

  @transient private var st: ValueState[(Array[Long], Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    st = getHandle.getValueState[(Array[Long], Long)](
      "kmvsk", Encoders.product[(Array[Long], Long)], TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timers: TimerValues): Iterator[(String, Long, Seq[Long])] = {
    var (buf, seen) =
      if (st.exists()) st.get() else (Array.empty[Long], 0L)
    rows.foreach { r =>
      buf = Sketches.kmvInsert(buf, r._2, k)
      seen += 1L
    }
    st.update((buf, seen))
    Iterator.single((key, seen, buf.toSeq))
  }
}

object KmvStream {

  /** Track a streaming Dataset of (key, hash) rows; emits one
    * (k, n_seen, n_kept, kth_min, est) snapshot per key per touching
    * micro-batch. Requires the RocksDB state store provider.
    */
  def kmvStream(ds: Dataset[(String, Long)],
      k: Int): Dataset[(String, Long, Long, Long, Long)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new KmvProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }

  /** Like [[kmvStream]] but emits the full kept set per snapshot
    * ((key, n_seen, mins)) — feed the per-key FINAL snapshots (max
    * n_seen) into [[graft.ops.Sketches.kmvSetOps]] for streaming
    * pairwise overlap. Requires the RocksDB state store provider.
    */
  def kmvSketchStream(ds: Dataset[(String, Long)],
      k: Int): Dataset[(String, Long, Seq[Long])] = {
    require(k >= 1, s"k must be >= 1, got $k")
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new KmvSketchProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }
}
