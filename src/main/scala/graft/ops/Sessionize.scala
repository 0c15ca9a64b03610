package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization: split each user's event stream into sessions at
  * inactivity gaps — the classic large-pipeline windowing op the reference
  * lacks.
  *
  * Two tiers:
  *  - [[batch]]: window functions (lag -> gap flag -> cumulative sum).
  *    One shuffle on user_id; arithmetic on raw epoch values, so an SQL
  *    oracle reproduces it exactly.
  *  - [[streamingSessions]]: `flatMapGroupsWithState` with processing-time
  *    timeout — bounded state per live user, emits a session when its gap
  *    closes it. The 100 TB-streaming shape (state never grows with
  *    history, only with concurrent users).
  */
object Sessionize {

  /** Batch: per-event session assignment over an epoch-nanos long column.
    * Deterministic: orders by (ts, eventId) within user.
    */
  def batch(events: DataFrame, userCol: String, tsNanosCol: String,
      idCol: String, gapNanos: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsNanosCol), col(idCol))
    events
      .withColumn("__prev", lag(col(tsNanosCol), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev").isNull || col(tsNanosCol) - col("__prev") > gapNanos, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("__new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new_session")
  }

  /** Single-pass kernel form of [[batchSessionStats]] for long-keyed
    * inputs: ONE user-hash exchange, ONE in-partition sort, then a
    * streaming fold over the sorted run emitting a row per session —
    * no window machinery (the window form walks the sorted data three
    * times: lag frame, running-sum frame, island aggregate), no
    * re-aggregation, state = one open session per user (three longs).
    * This is how the streaming engines sessionize a sorted keyed stream
    * (Flink/Beam session windows); output == [[batchSessionStats]] with
    * identical `session_seq` numbering (1-based per user, time order) —
    * parity-spec'd in OpsSpec. At 100 TB the cost is the one sort; a hot
    * user (bot) bounds its own partition's run length, never the
    * corpus's. Measured (SessAb, sf0.1 fused x16): 0.0895 -> 0.0690
    * s/instance vs the window form — the fold is the mapPartitions
    * exception the guidelines allow, justified by the 3-walk window plan
    * it replaces. Callers must filter null keys/timestamps first (the
    * typed decode would throw). Output bounds `start_ts`/`end_ts` are
    * unit-neutral: they carry whatever epoch unit `tsNanosCol` used
    * (nanos, micros, ...) — no rescaling happens here.
    */
  def sessionStatsKernel(events: DataFrame, userCol: String,
      tsNanosCol: String, idCol: String, gapNanos: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val sorted = events
      .select(col(userCol).cast("long"), col(tsNanosCol).cast("long"),
        col(idCol).cast("long"))
      .repartition(col(userCol))
      .sortWithinPartitions(col(userCol), col(tsNanosCol), col(idCol))
      .as[(Long, Long, Long)]
    sorted.mapPartitions { it =>
      new Iterator[(Long, Long, Long, Long, Long)] {
        // open session: (user, seq, n, start, last); emitted on user
        // change, gap break, or end of partition
        private var hasOpen = false
        private var u = 0L; private var sq = 0L; private var n = 0L
        private var start = 0L; private var last = 0L
        private var pending: (Long, Long, Long, Long, Long) = null

        private def close(): (Long, Long, Long, Long, Long) =
          (u, sq, n, start, last)

        override def hasNext: Boolean = pending != null || {
          while (pending == null && it.hasNext) {
            val (eu, ts, _) = it.next()
            if (!hasOpen) {
              hasOpen = true; u = eu; sq = 1L; n = 1L; start = ts; last = ts
            } else if (eu != u) {
              pending = close()
              u = eu; sq = 1L; n = 1L; start = ts; last = ts
            } else if (ts - last > gapNanos) {
              pending = close()
              sq += 1L; n = 1L; start = ts; last = ts
            } else {
              n += 1L; last = ts
            }
          }
          if (pending == null && hasOpen) { pending = close(); hasOpen = false }
          pending != null
        }
        override def next(): (Long, Long, Long, Long, Long) = {
          val out = pending; pending = null; out
        }
      }
    }.toDF(userCol, "session_seq", "n_events", "start_ts", "end_ts")
  }

  /** Per-session rollup of [[batch]] output. */
  def batchSessionStats(events: DataFrame, userCol: String, tsNanosCol: String,
      idCol: String, gapNanos: Long): DataFrame =
    batch(events, userCol, tsNanosCol, idCol, gapNanos)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(tsNanosCol).as("start_ts"),
        max(tsNanosCol).as("end_ts"))

  final case class SessionEvent(userId: Long, tsNanos: Long)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(userId: Long, startNs: Long, endNs: Long, nEvents: Long)

  /** Streaming: emit a session row when an inactivity gap (or timeout)
    * closes it. State per user is three longs — bounded by live users.
    */
  def streamingSessions(spark: SparkSession, events: Dataset[SessionEvent],
      gapNanos: Long): Dataset[SessionOut] = {
    import spark.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(_.tsNanos)
          var cur = state.getOption
          val closed = scala.collection.mutable.ListBuffer.empty[SessionOut]
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.tsNanos - s.last <= gapNanos =>
                cur = Some(s.copy(last = e.tsNanos, n = s.n + 1))
              case Some(s) =>
                closed += SessionOut(userId, s.start, s.last, s.n)
                cur = Some(SessionState(e.tsNanos, e.tsNanos, 1))
              case None =>
                cur = Some(SessionState(e.tsNanos, e.tsNanos, 1))
            }
          }
          cur.foreach(state.update)
          closed.iterator
      }
  }
}
