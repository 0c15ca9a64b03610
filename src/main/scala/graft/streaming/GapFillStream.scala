package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
import org.apache.spark.sql.streaming.ValueState

/** Streaming per-key daily gap fill (the incremental twin of
  * [[graft.ops.GapFill.dailyGapFill]]): as each key's daily observations
  * arrive, missing days between the previous observation and the new one
  * are emitted as forward-filled rows, so downstream consumers always see
  * a dense per-key daily series without re-densifying the history.
  *
  * Contract (what makes the output deterministic and batch-boundary
  * independent): input rows are (key, epoch-day, cost); rows for one day
  * are summed WITHIN the batch they arrive in (order-free), and a day at
  * or before the key's last emitted day is dropped on arrival — the
  * watermark-style discipline for late data. When micro-batch boundaries
  * align with day boundaries (each day's rows arrive in one batch, days
  * in order — the file-per-day ingest layout), the emitted series equals
  * the batch gap fill exactly; the spec asserts that equivalence and its
  * independence from how many files the days are split across.
  *
  * State per key is O(1) — (last day, last value) — in the RocksDB state
  * store, so a 100 TB keyspace holds two longs per key, not history.
  */
class GapFillProcessor
    extends StatefulProcessor[Long, (Long, Int, Long), (Long, Int, Long, Boolean)] {

  @transient private var lastSeen: ValueState[(Int, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    lastSeen = getHandle.getValueState[(Int, Long)](
      "lastSeen", Encoders.product[(Int, Long)], TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Int, Long)],
      timers: TimerValues): Iterator[(Long, Int, Long, Boolean)] = {
    // per-day sums within the batch: addition is order-free, so the batch's
    // internal row order can never change the result
    val byDay = rows.foldLeft(Map.empty[Int, Long]) { case (m, (_, d, c)) =>
      m.updated(d, m.getOrElse(d, 0L) + c)
    }
    var cur = if (lastSeen.exists()) Option(lastSeen.get()) else None
    val floor = cur.map(_._1)
    val out = scala.collection.mutable.ListBuffer.empty[(Long, Int, Long, Boolean)]
    byDay.keys.toSeq.sorted
      .filter(d => floor.forall(d > _))
      .foreach { d =>
        cur.foreach { case (pd, pv) =>
          var g = pd + 1
          while (g < d) { out += ((key, g, pv, true)); g += 1 }
        }
        out += ((key, d, byDay(d), false))
        cur = Some((d, byDay(d)))
      }
    cur.foreach(lastSeen.update)
    out.iterator
  }
}

object GapFillStream {

  /** Gap-fill a streaming Dataset of (key, epoch-day, cost) rows; emits
    * (key, day, cost, filled) with gap days forward-filled. Requires the
    * RocksDB state store provider (`transformWithState`).
    */
  def gapFillStream(ds: Dataset[(Long, Int, Long)]): Dataset[(Long, Int, Long, Boolean)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new GapFillProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
