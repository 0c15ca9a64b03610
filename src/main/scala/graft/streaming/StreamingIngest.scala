package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Incremental ingest path (north-star extension; the reference is
  * batch-only, SURVEY.md §2.7). Structured Streaming file source +
  * Trigger.AvailableNow replaces the batch glob scan: same transforms, but
  * exactly-once incremental processing with checkpointed progress — the
  * 100 TB-friendly replacement for "delete the DB and recompute"
  * (reference build.py:15-16).
  */
object StreamingIngest {

  /** File-source stream over a directory of parquet (schema required —
    * streaming sources don't infer). `globFilter` selects files within the
    * directory (the file source requires a directory basePath).
    */
  def parquetStream(spark: SparkSession, dir: String, schema: StructType,
      globFilter: Option[String] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    globFilter.foreach(g => r.option("pathGlobFilter", g))
    r.parquet(dir)
  }

  /** Watermarked tumbling-window aggregation over an event stream:
    * per (window, event_type) counts and value sums. Late data beyond the
    * watermark is dropped deterministically.
    */
  def windowedEventCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Streaming dedup on a natural key with state eviction by watermark —
    * the streaming analogue of the reference's duplicate audit
    * (build.py:39-53): instead of flagging dups after the fact, drop them
    * on arrival with bounded state.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join: left events matched to right events with
    * the same key whose timestamp falls in [leftTs, leftTs + window]. Both
    * sides watermarked, and the time-bound condition lets Spark evict
    * state: each side holds only `watermark + window` of history — the
    * property that makes stream-stream joins viable indefinitely.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      window: String, watermark: String): DataFrame = {
    val l = left.withWatermark("ts", watermark).as("l")
    val r = right.withWatermark("ts", watermark).as("r")
    l.join(r,
      expr(s"""l.$key = r.$key AND
              |r.ts >= l.ts AND r.ts <= l.ts + interval $window""".stripMargin))
  }

  /** foreachBatch upsert sink: each micro-batch is deduplicated against
    * the target parquet table on `keyCols` (append only the genuinely-new
    * keys). The standard incremental-materialization pattern when the
    * target store has no native MERGE — batch-id-deterministic and
    * idempotent under retries for this append-only shape.
    */
  def upsertStream(stream: DataFrame, keyCols: Seq[String],
      targetPath: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      val newRows = if (new java.io.File(targetPath).exists()) {
        val existing = spark.read.parquet(targetPath).select(keyCols.map(col): _*)
        batch.dropDuplicates(keyCols).join(existing, keyCols, "left_anti")
      } else batch.dropDuplicates(keyCols)
      newRows.write.mode("append").parquet(targetPath)
    }

  /** [[upsertStream]] with the Bloom-prefiltered membership test composed
    * in: each micro-batch appends only keys absent from the target, and
    * the absence check is [[graft.ops.BloomDedup.newRows]] — a Bloom
    * sketch of the (huge) target routes definitely-new rows around the
    * exact anti-join, so the per-batch cost is proportional to the
    * probable-dup fraction, not the target size. Result rows are
    * bit-identical to the plain anti-join (the sketch only routes).
    *
    * Arrival-order contract: the target's KEY SET is independent of
    * micro-batch boundaries and order (a key lands in the target iff some
    * input row carried it and the seed didn't); which carrier row's other
    * columns ride along is first-arrival, as in any append-only upsert —
    * query the key set (as stream_bloom_new_docs does) for the
    * deterministic surface.
    */
  def bloomUpsertStream(stream: DataFrame, keyCol: String, targetPath: String,
      expectedItems: Long): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      val inBatch = batch.dropDuplicates(Seq(keyCol))
      val newRows = if (new java.io.File(targetPath).exists()) {
        graft.ops.BloomDedup.newRows(inBatch,
          spark.read.parquet(targetPath), keyCol, expectedItems)
      } else inBatch
      newRows.write.mode("append").parquet(targetPath)
    }

  /** Run a streaming DataFrame to completion over the currently-available
    * input (Trigger.AvailableNow) into an in-memory table; returns the
    * result as a batch DataFrame. Used by tests and the Verify harness.
    */
  def runAvailableNow(spark: SparkSession, stream: DataFrame, name: String,
      outputMode: String = "complete",
      checkpoint: Option[String] = None): DataFrame = {
    val w = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
    checkpoint.foreach(w.option("checkpointLocation", _))
    val q: StreamingQuery = w.start()
    q.awaitTermination()
    spark.table(name)
  }
}
