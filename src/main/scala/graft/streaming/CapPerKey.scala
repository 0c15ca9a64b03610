package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming per-key admission cap on Spark 4's `transformWithState`
  * (the arbitrary-state API succeeding `flatMapGroupsWithState`): at most
  * `maxPerKey` rows per key are admitted over the stream's lifetime, the
  * rest are dropped on arrival.
  *
  * Corpus-curation use: cap documents per source/domain while ingesting a
  * crawl, so one hot domain can't dominate the training mix — the
  * streaming analogue of a per-group `row_number() <= n` batch filter,
  * with O(1) state (a single counter) per key instead of a corpus-wide
  * shuffle+sort. State lives in the RocksDB state store
  * (`transformWithState` requires the RocksDB provider) and is exact
  * across micro-batches and restarts via the checkpoint.
  */
class CapProcessor[K, T](maxPerKey: Long)
    extends StatefulProcessor[K, T, T] {
  require(maxPerKey >= 0, "maxPerKey must be >= 0")

  @transient private var admitted: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    admitted = getHandle.getValueState[Long](
      "admitted", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: K, rows: Iterator[T],
      timers: TimerValues): Iterator[T] = {
    var n = if (admitted.exists()) admitted.get() else 0L
    val out = scala.collection.mutable.ListBuffer.empty[T]
    while (rows.hasNext && n < maxPerKey) {
      out += rows.next()
      n += 1
    }
    admitted.update(n)
    out.iterator
  }
}

object CapPerKey {

  /** Cap a (streaming or batch) Dataset at `maxPerKey` rows per `key`.
    * Admission order is arrival order within each micro-batch.
    */
  def capPerKey[K: Encoder, T: Encoder](ds: Dataset[T], key: T => K,
      maxPerKey: Long): Dataset[T] =
    ds.groupByKey(key)
      .transformWithState(new CapProcessor[K, T](maxPerKey),
        TimeMode.None(), OutputMode.Append())
}
