package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign every document its global token offset in the
  * doc_id-ordered concatenation of the corpus, then the fixed-length
  * training sequences it lands in — the GPT-style "concatenate and chunk"
  * step that turns a cleaned corpus into equal-length samples.
  *
  * The naive formulation is a running sum over a GLOBAL ORDER BY, which
  * Spark executes as a single-partition window — the one shape guaranteed
  * to die at 100 TB. This is instead the classic two-phase distributed
  * prefix sum:
  *
  *   1. bucket rows into contiguous id ranges — the bucket is a pure
  *      function of the id (count of driver-collected quantile
  *      boundaries below it), so recomputing the frame can never move a
  *      row between buckets;
  *   2. one cheap aggregate computes per-bucket token totals — P rows
  *      to the driver, an exclusive prefix scan over P numbers, broadcast
  *      back as each bucket's base offset;
  *   3. a BUCKET-LOCAL window (partitionBy bucket) adds the
  *      within-bucket running sum to the base.
  *
  * Every stage is bounded: the widest shuffle is the bucket exchange of
  * the rows themselves, the driver holds P longs, and no window ever sees
  * more than one bucket's rows. The result is independent of P and of
  * boundary placement (offsets are a pure function of the id order),
  * which the spec asserts.
  */
object Packing {

  /** Per-row global offsets: input must have a unique orderable `idCol`
    * and a non-negative `nCol` (token count). Adds `tok_offset` (tokens
    * strictly before this row) while preserving existing columns.
    *
    * Buckets are a PURE FUNCTION of the id — `#quantile boundaries < id`,
    * with the boundaries collected once to the driver — never
    * `spark_partition_id()` over `repartitionByRange`: the range
    * partitioner's sample seed incorporates the RDD id, so the two
    * executions this plan needs (totals aggregate, then the final join)
    * can land rows in DIFFERENT partitions and silently corrupt every
    * offset after the first moved row. Exhaustive sampling at unit-test
    * scale masks that; an sf0.1 oracle sweep caught it. Boundary
    * PLACEMENT only affects balance, never the result (the offsets are a
    * pure function of the id order — asserted under multiple partition
    * counts in PropertiesSpec), so approximate quantiles are fine.
    */
  def globalOffsets(df: DataFrame, idCol: String, nCol: String,
      numParts: Int = 0): DataFrame = {
    val sp = df.sparkSession
    val parts =
      if (numParts > 0) numParts
      else sp.sessionState.conf.numShufflePartitions
    val probs = (1 until parts).map(_.toDouble / parts).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else df.select(col(idCol).cast("double").as("__q"))
        .stat.approxQuantile("__q", probs, 0.001)
    val bucket = bounds.distinct.sorted.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(idCol).cast("double") > lit(b), 1).otherwise(0)
    }
    val bucketed = df.withColumn("__pid", bucket)
    // phase 1+2: per-bucket totals -> driver prefix scan -> broadcast.
    // The collect is <= P rows (one long per bucket) — bounded driver
    // work of the same class as a catalog read, NOT data-proportional.
    val totals = bucketed.groupBy("__pid")
      .agg(sum(col(nCol).cast("long")).as("__t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val bases = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) =>
      (pid, acc + t)
    }.init.zip(totals).map { case ((_, base), (pid, _)) => (pid, base) }
    import sp.implicits._
    val baseDf = bases.toSeq.toDF("__pid", "__base")
    // phase 3: bucket-local running sum + broadcast base join
    val w = Window.partitionBy("__pid").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(baseDf), Seq("__pid"))
      .withColumn("tok_offset",
        col("__base") + sum(col(nCol).cast("long")).over(w) -
          col(nCol).cast("long"))
      .drop("__pid", "__base")
  }

  /** Offsets plus the packed-sequence span for length-`seqLen` samples:
    * `seq_first` = sequence holding the doc's first token, `seq_last` =
    * sequence holding its last (null for zero-token docs — they occupy no
    * sequence). Docs MAY straddle sequences (standard causal-LM packing).
    */
  def packSequences(df: DataFrame, idCol: String, nCol: String,
      seqLen: Int, numParts: Int = 0): DataFrame = {
    require(seqLen > 0, "sequence length must be positive")
    // integer DIV, not floor(double /): offsets at corpus scale exceed
    // double's exact-integer range long before they exceed a long's
    globalOffsets(df, idCol, nCol, numParts)
      .withColumn("seq_first", expr(s"tok_offset DIV $seqLen"))
      .withColumn("seq_last",
        when(col(nCol) > 0,
          expr(s"(tok_offset + ${nCol} - 1) DIV $seqLen")))
  }
}
