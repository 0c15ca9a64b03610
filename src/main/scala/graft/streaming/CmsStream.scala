package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import org.apache.spark.sql.streaming.ValueState

import graft.ops.Sketches

/** Streaming per-key count-min frequency tracking
  * ([[graft.ops.Sketches.cmsCell]] addressing, exact Long counters):
  * per key, `depth × width` counters plus a seen-count in the state
  * store — fixed-size state however many distinct values stream
  * through. Counter increments are commutative and associative, so
  * like [[KmvStream]] (and unlike the order-contracted
  * [[HoltStream]]) the tracker is arrival-order and batch-split
  * independent BY CONSTRUCTION; the final snapshot always equals the
  * batch [[graft.ops.Sketches.cmsSketch]] over everything ingested.
  * Each micro-batch that touches a key emits the key's updated
  * point-estimates for the fixed `probes` (word, hash) battery —
  * n_seen is strictly monotone, so "latest wins" reads keep the
  * max-n_seen row per (key, word).
  */
class CmsProcessor(depth: Int, width: Int, probes: Array[(String, Long)])
    extends StatefulProcessor[String, (String, Long),
      (String, Long, String, Long)] {

  @transient private var st: ValueState[(Array[Long], Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    st = getHandle.getValueState[(Array[Long], Long)](
      "cms", Encoders.product[(Array[Long], Long)], TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timers: TimerValues): Iterator[(String, Long, String, Long)] = {
    var (arr, seen) =
      if (st.exists()) st.get() else (new Array[Long](depth * width), 0L)
    rows.foreach { r =>
      var i = 0
      while (i < depth) {
        arr(i * width + Sketches.cmsCell(i, width, r._2)) += 1L
        i += 1
      }
      seen += 1L
    }
    st.update((arr, seen))
    probes.iterator.map { case (w, h) =>
      (key, seen, w, Sketches.cmsEstimate(arr, depth, width, h))
    }
  }
}

object CmsStream {

  /** Track a streaming Dataset of (key, hash) rows; emits one
    * (k, n_seen, word, est_count) row per probe per key per touching
    * micro-batch. Requires the RocksDB state store provider.
    */
  def cmsStream(ds: Dataset[(String, Long)], depth: Int, width: Int,
      probes: Array[(String, Long)]): Dataset[(String, Long, String, Long)] = {
    require(depth >= 1 && width >= 2)
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new CmsProcessor(depth, width, probes),
        TimeMode.None(), OutputMode.Append())
  }
}
