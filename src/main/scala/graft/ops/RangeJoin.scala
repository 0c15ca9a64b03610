package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: points matched to intervals
  * containing them, per key. A naive formulation is an equi-join on the key
  * followed by an inequality filter — which degenerates to a per-key cross
  * product (hot keys explode at scale). This implementation bucketizes
  * time: each interval is exploded to the coarse buckets it covers, each
  * point joins only its own bucket, then the exact BETWEEN filter runs on
  * the bucket-local candidates. Each (point, interval) pair meets exactly
  * once (the point's bucket), so no dedup pass is needed.
  *
  * Bucket size tunes the explode factor vs candidate-set size; pick it
  * near the median interval length so intervals explode to O(1) buckets.
  */
object RangeJoin {

  /** @param points    rows with a long ordinate `ptCol`
    * @param intervals rows with long `startCol`/`endCol` (inclusive)
    * @param keys      equi-key columns present on both sides
    * @param bucket    bucket width in the ordinate's unit
    */
  def bucketedRangeJoin(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], ptCol: String, startCol: String, endCol: String,
      bucket: Long): DataFrame = {
    require(bucket > 0, "bucket must be positive")
    val pb = points.withColumn("__bucket", expr(s"$ptCol DIV $bucket"))
    val ib = intervals.withColumn("__bucket",
      explode(sequence(expr(s"$startCol DIV $bucket"), expr(s"$endCol DIV $bucket"))))
    pb.join(ib, (keys :+ "__bucket").toIndexedSeq)
      .where(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval-overlap join: pairs of intervals (per key) whose inclusive
    * ranges intersect — the interval-interval extension of the point
    * form above, same bucketize-explode strategy. Both sides explode to
    * their covering buckets and meet on (key, bucket); the exact overlap
    * predicate then runs bucket-locally, and each overlapping pair is
    * kept exactly once — in the bucket containing the overlap START
    * (`greatest(start_l, start_r) DIV bucket`), so no dedup pass is
    * needed. Column names must be disjoint across the two sides.
    *
    * Shape at scale: explode factor is O(interval length / bucket) per
    * row; candidates are bucket-local so a hot key never goes
    * quadratic across distant time ranges — the cross product is
    * bounded per (key, bucket), which is what a calendar-bucketed
    * overlap join looks like on any distributed engine.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String], lStart: String, lEnd: String,
      rStart: String, rEnd: String, bucket: Long): DataFrame = {
    require(bucket > 0, "bucket must be positive")
    val lb = left.withColumn("__bucket",
      explode(sequence(expr(s"$lStart DIV $bucket"), expr(s"$lEnd DIV $bucket"))))
    val rb = right.withColumn("__bucket",
      explode(sequence(expr(s"$rStart DIV $bucket"), expr(s"$rEnd DIV $bucket"))))
    lb.join(rb, (keys :+ "__bucket").toIndexedSeq)
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .where(col("__bucket") ===
        expr(s"greatest($lStart, $rStart) DIV $bucket"))
      .drop("__bucket")
  }
}
