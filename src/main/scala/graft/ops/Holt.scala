package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Holt linear-trend (double exponential) smoothing — the trend-aware
  * upgrade of the w8_ewma level smoother, the classic short-horizon
  * forecast primitive (Holt 1957 / Winters 1960, minus the seasonal
  * term, which [[Seasonal]] profiles separately).
  *
  * Exact integer nanos with α = β = 1/2: the smoothing recurrences
  * collapse to one truncating halving each —
  * {{{
  *   l_t = (y_t + l_{t-1} + b_{t-1}) DIV 2
  *   b_t = (l_t - l_{t-1} + b_{t-1}) DIV 2
  * }}}
  * seeded l_1 = y_1, b_1 = 0, forecast fc_t = l_t + b_t (the one-step-
  * ahead prediction). Scala `/`, Spark DIV and DuckDB `//` all truncate
  * toward zero, so negative trends replay exactly and the whole run is
  * a recursive-CTE oracle away from bit-equality.
  *
  * Shape at scale: smoothing is inherently sequential PER KEY, so the
  * plan is one shuffle on the key and one in-task pass per series —
  * exactly a window function's cost, except no Spark window expresses a
  * self-referential recurrence (running aggregates see input rows, not
  * their own output). Each task buffers one key's capped series
  * (`maxPoints`, the memory contract); the unbounded-history form is the
  * streaming state-store twin (stream_gapfill's discipline: O(1) state
  * per key, arrival-ordered), not a longer buffer.
  */
object Holt {

  /** Input columns: `k` (series key), `ord`, `tie` (total order within
    * key), `y_nano` (integer-nano observation). Keeps the first
    * `maxPoints` rows per key in (ord, tie) order. Output per kept row:
    * (k, rn, y_nano, l_nano, b_nano, fc_nano), rn starting at 1.
    */
  def holtNano(series: DataFrame, maxPoints: Int): DataFrame = {
    require(maxPoints > 0, s"maxPoints must be positive, got $maxPoints")
    val sp = series.sparkSession
    import sp.implicits._
    series
      .select(col("k").cast("string"), col("ord").cast("long"),
        col("tie").cast("long"), col("y_nano").cast("long"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (k: String, it: Iterator[(String, Long, Long, Long)]) =>
        // Bounded first-maxPoints selection: a size-capped max-heap on
        // (ord, tie) keeps task memory O(maxPoints) regardless of how
        // long the key's history is (the full series never buffers).
        val ord = Ordering.by[(String, Long, Long, Long), (Long, Long)](
          r => (r._2, r._3))
        val keep = new scala.collection.mutable.PriorityQueue[
          (String, Long, Long, Long)]()(ord)
        it.foreach { r =>
          if (keep.size < maxPoints) keep.enqueue(r)
          else if (ord.lt(r, keep.head)) { keep.dequeue(); keep.enqueue(r) }
        }
        val rows = keep.dequeueAll.reverse.toArray
        var l = 0L
        var b = 0L
        rows.iterator.zipWithIndex.map { case (r, i) =>
          val y = r._4
          if (i == 0) { l = y; b = 0L }
          else {
            val lPrev = l
            l = (y + l + b) / 2
            b = (l - lPrev + b) / 2
          }
          (k, (i + 1).toLong, y, l, b, l + b)
        }
      }
      .toDF("k", "rn", "y_nano", "l_nano", "b_nano", "fc_nano")
  }
}
