package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Markov-chain multi-touch attribution by removal effect (Anderl et al.
  * 2014, "Mapping the customer journey") — the data-driven complement to
  * the positional rules in `attr_first_touch` / `attr_last_touch` /
  * `attr_time_decay`: a channel's credit is how much conversion
  * probability disappears when the channel is cut out of the journey
  * graph.
  *
  * Exact-integer evaluation, bit-replayable in SQL:
  *  - Journey states: `start`, one per non-converting event type, plus
  *    absorbing `conv` (the conversion type) and `null` (journey ends
  *    unconverted). A conversion closes the journey; the next event of
  *    the same user opens a fresh one at `start`.
  *  - Transition probabilities in truncating nanos: `cnt * 1e9 DIV tot`.
  *  - Chain evaluation by `rounds` synchronous mass steps with PER-EDGE
  *    truncation: each edge moves `(mass * p) DIV 1e9` nanos (products
  *    ≤ 1e18, inside BIGINT); absorbing states carry a p = 1e9 self-loop
  *    so absorbed mass persists. This bounded-horizon form replaces the
  *    textbook fundamental-matrix inversion — the first `rounds` steps
  *    carry all but a geometrically-vanishing tail, and every step is
  *    rational, so DuckDB replays the whole evaluation as chained
  *    aggregate CTEs.
  *  - Removal scenario for channel c: every edge INTO c redirects to
  *    `null` (the node is cut; its outgoing edges become unreachable).
  *
  * Shape at scale: the data-sized work is one per-user window pass
  * (journey segmentation) and one hash aggregate (transition counts).
  * The chain itself lives on the transition MATRIX, whose size is
  * bounded by the event-type vocabulary — schema-bounded, not
  * data-bounded — so it collects to the driver like the PQ codebooks
  * and k-means centroids do, and the scenario sweep is a few thousand
  * Long multiplications.
  */
object MarkovAttribution {

  /** events: (userCol, ordCol, tieCol, typeCol) rows; `convType` marks
    * conversions. Returns one row per non-converting channel:
    * (channel, p_base_nano, p_removed_nano, removal_nano) ordered by
    * channel, where removal_nano = 1e9 - p_removed*1e9 DIV p_base.
    */
  def removalEffects(events: DataFrame, userCol: String, ordCol: String,
      tieCol: String, typeCol: String, convType: String,
      rounds: Int = 8): DataFrame = {
    // 'start'/'conv'/'null' are the synthetic journey states; a REAL
    // event type spelled like one of them would silently merge its
    // transitions with the synthetic state (e.g. a genuine 'null'
    // channel conflates with the unconverted-end sink), corrupting all
    // probabilities. Fail loudly instead — the check is one tiny
    // distinct over a column the pipeline scans anyway.
    val reservedStates = Seq("start", "conv", "null")
    require(!reservedStates.contains(convType),
      s"convType '$convType' collides with a reserved synthetic state " +
        s"(${reservedStates.mkString("/")})")
    val offending = events
      .where(col(typeCol).isin(reservedStates: _*) &&
        col(typeCol) =!= convType)
      .select(col(typeCol)).distinct().limit(4).collect()
    require(offending.isEmpty,
      "event types collide with reserved synthetic states " +
        s"(${reservedStates.mkString("/")}): " +
        offending.map(_.getString(0)).mkString(", "))
    val sp = events.sparkSession
    val w = Window.partitionBy(userCol)
      .orderBy(col(ordCol), col(tieCol))
    val st = events
      .select(col(userCol), col(ordCol), col(tieCol),
        col(typeCol).as("__ty"))
      .withColumn("__prev", lag(col("__ty"), 1).over(w))
      .withColumn("__next", lead(col("__ty"), 1).over(w))
    val steps = st.select(
      when(col("__prev").isNull || col("__prev") === convType, lit("start"))
        .otherwise(col("__prev")).as("from"),
      when(col("__ty") === convType, lit("conv"))
        .otherwise(col("__ty")).as("to"))
    val tails = st
      .where(col("__next").isNull && col("__ty") =!= convType)
      .select(col("__ty").as("from"), lit("null").as("to"))
    val cnt = steps.unionByName(tails)
      .groupBy("from", "to").agg(count(lit(1)).as("cnt"))
    val tot = cnt.groupBy("from").agg(sum("cnt").as("tot"))
    val trans = cnt.join(tot, Seq("from"))
      .select(col("from"), col("to"),
        expr("cnt * 1000000000L DIV tot").as("p"))
      .collect() // schema-bounded: |event types| + 3 states square, max
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // 'start'/'conv'/'null' are reserved state names; an event type
    // spelled like one of them would collide with the synthetic states
    // and is excluded from the channel sweep on both engines.
    val reserved = Set("start", "conv", "null")
    val channels = trans.map(_._1).filterNot(reserved).distinct.sorted
    // absorbing self-loops so landed mass persists across rounds
    val edges = trans ++ Seq(("conv", "conv", 1000000000L),
      ("null", "null", 1000000000L))

    def converged(removed: Option[String]): Long = {
      val active = edges.map { case (f, t, p) =>
        if (removed.contains(t)) (f, "null", p) else (f, t, p)
      }
      var v = Map("start" -> 1000000000L)
      for (_ <- 1 to rounds) {
        val nv = scala.collection.mutable.Map.empty[String, Long]
        for ((f, t, p) <- active; m <- v.get(f)) {
          val c = m * p / 1000000000L
          if (c != 0L) nv(t) = nv.getOrElse(t, 0L) + c
        }
        v = nv.toMap
      }
      v.getOrElse("conv", 0L)
    }

    val pBase = converged(None)
    val rows = channels.map { c =>
      val pRem = converged(Some(c))
      val eff =
        if (pBase == 0L) null
        else java.lang.Long.valueOf(
          1000000000L - pRem * 1000000000L / pBase)
      Row(c, pBase, pRem, eff)
    }
    sp.createDataFrame(
      sp.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("channel", StringType, nullable = false),
        StructField("p_base_nano", LongType, nullable = false),
        StructField("p_removed_nano", LongType, nullable = false),
        StructField("removal_nano", LongType, nullable = true))))
  }
}
