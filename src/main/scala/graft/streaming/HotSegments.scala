package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming boilerplate-segment detector — the incremental half of
  * CCNet/Dolma segment dedup ([[graft.ops.Dedup.segmentDedup]]): as
  * (segment-key, doc-id) pairs arrive off a document stream, each key's
  * DISTINCT-document count accumulates in bounded state, and the key is
  * emitted exactly once, in the micro-batch where that count first
  * exceeds `maxDocFreq` — i.e. the moment the segment is provably
  * boilerplate (nav bar, cookie banner, repeated header).
  *
  * Determinism contract: WHICH keys are emitted is arrival-order and
  * batch-boundary independent — a key's final distinct-doc count does not
  * depend on the order its documents arrive in, only on the set — so the
  * emitted hot-key SET always equals the batch rule `seg_df > maxDocFreq`
  * over the documents processed so far. (WHEN a key is emitted naturally
  * depends on arrival; consumers treat the output as a growing set.)
  *
  * State per key is bounded and then collapses: a capped list of up to
  * `maxDocFreq` distinct doc ids while the key is cold, replaced by an
  * O(1) hot flag the moment the cap is crossed — so corpus-frequent
  * boilerplate (the keys with millions of occurrences, exactly the ones
  * that matter at 100 TB) holds ONE boolean of state, and a cold key
  * holds at most `maxDocFreq` longs. Nothing is ever held per occurrence.
  */
class HotSegmentProcessor(maxDocFreq: Long)
    extends StatefulProcessor[String, (String, Long), String] {
  require(maxDocFreq >= 0, "maxDocFreq must be >= 0")

  @transient private var seen: ListState[Long] = _
  @transient private var hot: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    seen = getHandle.getListState[Long](
      "seen", Encoders.scalaLong, TTLConfig.NONE)
    hot = getHandle.getValueState[Boolean](
      "hot", Encoders.scalaBoolean, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timers: TimerValues): Iterator[String] = {
    if (hot.exists()) return Iterator.empty // already reported; O(1) path
    val docs = scala.collection.mutable.LinkedHashSet.empty[Long]
    if (seen.exists()) seen.get().foreach(docs += _)
    var crossed = false
    while (rows.hasNext && !crossed) {
      docs += rows.next()._2
      crossed = docs.size > maxDocFreq
    }
    if (crossed) {
      seen.clear()
      hot.update(true)
      Iterator.single(key)
    } else {
      seen.put(docs.toArray)
      Iterator.empty
    }
  }
}

object HotSegments {

  /** Hot segment keys (running distinct-doc frequency > `maxDocFreq`)
    * from a stream of (segmentKey, docId) rows; each hot key is emitted
    * exactly once. Requires the RocksDB state store provider
    * (`transformWithState`).
    */
  def hotKeys(ds: Dataset[(String, Long)], maxDocFreq: Long): Dataset[String] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new HotSegmentProcessor(maxDocFreq),
        TimeMode.None(), OutputMode.Append())
  }

  /** Batch-side application of a streamed hot-key set: drop every segment
    * whose trimmed key is hot and reassemble survivors in document order.
    * With `hot` = the detector's output over the same documents, the
    * result equals [[graft.ops.Dedup.segmentDedup]] exactly (same
    * columns: idCol, n_segments, n_kept, clean_text).
    *
    * The hot-key side is the detector's OUTPUT — bounded by the number of
    * boilerplate segments, tiny next to the corpus — so the mark join
    * broadcasts; the corpus side stays a single narrow pass + one
    * doc-keyed reassembly aggregate, the batch operator's own shape.
    */
  def applyHotFilter(df: DataFrame, hot: DataFrame, textCol: String,
      idCol: String, sep: String): DataFrame = {
    val hotK = broadcast(hot.select(col(hot.columns.head).as("k"))
      .distinct().withColumn("__hot", lit(true)))
    graft.ops.Dedup.reassembleSegments(
      graft.ops.Dedup.segments(df, textCol, idCol, sep)
        .join(hotK, Seq("k"), "left")
        .withColumn("keep", col("__hot").isNull),
      idCol, sep)
  }
}
