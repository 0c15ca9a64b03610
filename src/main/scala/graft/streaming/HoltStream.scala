package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import org.apache.spark.sql.streaming.ValueState

/** Streaming Holt linear-trend smoothing — the unbounded-history form
  * [[graft.ops.Holt.holtNano]]'s scaladoc promises: the batch operator
  * caps its per-task buffer at `maxPoints` because the recurrence is
  * sequential per key, while this incremental twin holds O(1) state per
  * key — (last ord, last tie, level, trend, points seen) — in the
  * RocksDB state store and so smooths arbitrarily long histories.
  *
  * Determinism contract (stream_gapfill's discipline): rows within a
  * micro-batch sort by (ord, tie) before folding, and a row at or
  * before the key's high-water mark (ord, tie) is dropped on arrival —
  * late data cannot rewrite an emitted smooth. When micro-batch
  * boundaries respect the (ord, tie) order (the file-per-time-slice
  * ingest layout), the emitted series equals the batch operator exactly;
  * the spec asserts that equivalence and its independence from how many
  * order-aligned files the points are split across. The same truncating
  * integer recurrences replay bit-for-bit (α = β = 1/2 halvings).
  */
class HoltProcessor(maxPoints: Int)
    extends StatefulProcessor[String, (String, Long, Long, Long),
      (String, Long, Long, Long, Long, Long)] {

  @transient private var st: ValueState[(Long, Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    st = getHandle.getValueState[(Long, Long, Long, Long, Long)](
      "holt", Encoders.product[(Long, Long, Long, Long, Long)], TTLConfig.NONE)
  }

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Long, Long)],
      timers: TimerValues): Iterator[(String, Long, Long, Long, Long, Long)] = {
    var (lo, lt, l, b, rn) =
      if (st.exists()) st.get() else (Long.MinValue, Long.MinValue, 0L, 0L, 0L)
    val out =
      scala.collection.mutable.ListBuffer.empty[(String, Long, Long, Long, Long, Long)]
    rows.toSeq.sortBy(r => (r._2, r._3))
      .filter(r => r._2 > lo || (r._2 == lo && r._3 > lt))
      .foreach { r =>
        if (rn < maxPoints) {
          val y = r._4
          if (rn == 0L) { l = y; b = 0L }
          else {
            val lPrev = l
            l = (y + l + b) / 2
            b = (l - lPrev + b) / 2
          }
          rn += 1
          lo = r._2
          lt = r._3
          out += ((key, rn, y, l, b, l + b))
        }
      }
    st.update((lo, lt, l, b, rn))
    out.iterator
  }
}

object HoltStream {

  /** Smooth a streaming Dataset of (key, ord, tie, y_nano) rows; emits
    * (k, rn, y_nano, l_nano, b_nano, fc_nano) as points arrive. Requires
    * the RocksDB state store provider (`transformWithState`).
    */
  def holtStream(ds: Dataset[(String, Long, Long, Long)],
      maxPoints: Int): Dataset[(String, Long, Long, Long, Long, Long)] = {
    require(maxPoints > 0, s"maxPoints must be positive, got $maxPoints")
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new HoltProcessor(maxPoints),
        TimeMode.None(), OutputMode.Append())
  }
}
