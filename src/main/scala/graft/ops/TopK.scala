package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded partial top-k: a typed Aggregator keeping a k-bounded
  * best-scores list per group, merged partial+final like any Spark
  * aggregate (SURVEY §7.3's custom-aggregate tier; same model as
  * [[MinHashMerge]]).
  *
  * This replaces the `Window.partitionBy(queryId)` top-k finisher in the
  * similarity operators. The window form shuffles EVERY scored row into Q
  * reducer partitions and fully sorts there — with few queries over a
  * 100 TB corpus that is the classic few-hot-keys scale-killer. Here each
  * map partition folds its rows into a k-slot buffer, so only
  * `partitions × Q × k` tiny buffer rows cross the shuffle and nothing is
  * ever globally sorted.
  *
  * Ordering contract (must match the `row_number() OVER (ORDER BY score
  * DESC, id ASC)` oracles, DuckDB null ordering): higher score first,
  * NaN (the null sentinel — see [[TopK.topK]]) last, ties broken by
  * ascending id. Distinct ids make the order total, so the result is
  * deterministic under any partitioning.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), (Array[Double], Array[Long]), Seq[(Double, Long)]] {
  require(k >= 1, "k must be >= 1")

  /** True if (s1,i1) ranks strictly before (s2,i2). NaN ranks last. */
  @inline private def before(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val n1 = s1.isNaN; val n2 = s2.isNaN
    if (n1 != n2) n2
    else if (!n1 && s1 != s2) s1 > s2
    else i1 < i2
  }

  override def zero: (Array[Double], Array[Long]) =
    (Array.empty[Double], Array.empty[Long])

  override def reduce(buf: (Array[Double], Array[Long]),
      in: (Double, Long)): (Array[Double], Array[Long]) = {
    val (scores, ids) = buf
    val n = scores.length
    if (n == k && !before(in._1, in._2, scores(n - 1), ids(n - 1))) buf
    else {
      // insertion position (buffers are tiny — k is 10s, not 1000s)
      var p = n
      while (p > 0 && before(in._1, in._2, scores(p - 1), ids(p - 1))) p -= 1
      val m = math.min(n + 1, k)
      val ns = new Array[Double](m); val ni = new Array[Long](m)
      System.arraycopy(scores, 0, ns, 0, p)
      System.arraycopy(ids, 0, ni, 0, p)
      ns(p) = in._1; ni(p) = in._2
      val tail = m - p - 1
      if (tail > 0) {
        System.arraycopy(scores, p, ns, p + 1, tail)
        System.arraycopy(ids, p, ni, p + 1, tail)
      }
      (ns, ni)
    }
  }

  override def merge(a: (Array[Double], Array[Long]),
      b: (Array[Double], Array[Long])): (Array[Double], Array[Long]) = {
    if (b._1.isEmpty) return a
    if (a._1.isEmpty) return b
    val m = math.min(a._1.length + b._1.length, k)
    val ns = new Array[Double](m); val ni = new Array[Long](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeA = j >= b._1.length ||
        (i < a._1.length && before(a._1(i), a._2(i), b._1(j), b._2(j)))
      if (takeA) { ns(o) = a._1(i); ni(o) = a._2(i); i += 1 }
      else { ns(o) = b._1(j); ni(o) = b._2(j); j += 1 }
      o += 1
    }
    (ns, ni)
  }

  override def finish(r: (Array[Double], Array[Long])): Seq[(Double, Long)] =
    r._1.indices.map(i => (r._1(i), r._2(i)))

  override def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Array[Long])]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

/** [[TopKAgg]] with a STRING id channel (terms, digests, categorical
  * keys) — no more hash60 + join-back detour for non-numeric ids. Same
  * ordering contract, with ties broken by ascending id under UTF-8 BYTE
  * order (Spark's own string comparison and DuckDB's collation; Java's
  * String.compareTo would diverge on supplementary characters).
  */
class TopKAggStr(k: Int)
    extends Aggregator[(Double, String), (Array[Double], Array[String]), Seq[(Double, String)]] {
  require(k >= 1, "k must be >= 1")

  @inline private def idLt(a: String, b: String): Boolean =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0

  /** True if (s1,i1) ranks strictly before (s2,i2). NaN ranks last. */
  @inline private def before(s1: Double, i1: String, s2: Double, i2: String): Boolean = {
    val n1 = s1.isNaN; val n2 = s2.isNaN
    if (n1 != n2) n2
    else if (!n1 && s1 != s2) s1 > s2
    else idLt(i1, i2)
  }

  override def zero: (Array[Double], Array[String]) =
    (Array.empty[Double], Array.empty[String])

  override def reduce(buf: (Array[Double], Array[String]),
      in: (Double, String)): (Array[Double], Array[String]) = {
    val (scores, ids) = buf
    val n = scores.length
    if (n == k && !before(in._1, in._2, scores(n - 1), ids(n - 1))) buf
    else {
      var p = n
      while (p > 0 && before(in._1, in._2, scores(p - 1), ids(p - 1))) p -= 1
      val m = math.min(n + 1, k)
      val ns = new Array[Double](m); val ni = new Array[String](m)
      System.arraycopy(scores, 0, ns, 0, p)
      System.arraycopy(ids, 0, ni, 0, p)
      ns(p) = in._1; ni(p) = in._2
      val tail = m - p - 1
      if (tail > 0) {
        System.arraycopy(scores, p, ns, p + 1, tail)
        System.arraycopy(ids, p, ni, p + 1, tail)
      }
      (ns, ni)
    }
  }

  override def merge(a: (Array[Double], Array[String]),
      b: (Array[Double], Array[String])): (Array[Double], Array[String]) = {
    if (b._1.isEmpty) return a
    if (a._1.isEmpty) return b
    val m = math.min(a._1.length + b._1.length, k)
    val ns = new Array[Double](m); val ni = new Array[String](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeA = j >= b._1.length ||
        (i < a._1.length && before(a._1(i), a._2(i), b._1(j), b._2(j)))
      if (takeA) { ns(o) = a._1(i); ni(o) = a._2(i); i += 1 }
      else { ns(o) = b._1(j); ni(o) = b._2(j); j += 1 }
      o += 1
    }
    (ns, ni)
  }

  override def finish(r: (Array[Double], Array[String])): Seq[(Double, String)] =
    r._1.indices.map(i => (r._1(i), r._2(i)))

  override def bufferEncoder: Encoder[(Array[Double], Array[String])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Array[String])]()

  override def outputEncoder: Encoder[Seq[(Double, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, String)]]()
}

/** Merge-side twin of [[TopKAgg]]: each input row is an ALREADY k-bounded,
  * sorted (scores, ids) buffer — one per map partition per group, produced
  * by a per-partition kernel such as [[Similarity.bruteForceTopK]]'s — so
  * `reduce` IS `merge`. Shares [[TopKAgg]]'s comparator and merge, hence
  * its exact ordering contract. (The class-name stem "TopKAgg" is load-
  * bearing: plan-shape tests assert the bounded aggregate by that stem.)
  */
class TopKAggMerge(k: Int)
    extends Aggregator[(Array[Double], Array[Long]), (Array[Double], Array[Long]), Seq[(Double, Long)]] {
  private val base = new TopKAgg(k)
  override def zero: (Array[Double], Array[Long]) = base.zero
  override def reduce(buf: (Array[Double], Array[Long]),
      in: (Array[Double], Array[Long])): (Array[Double], Array[Long]) =
    base.merge(buf, in)
  override def merge(a: (Array[Double], Array[Long]),
      b: (Array[Double], Array[Long])): (Array[Double], Array[Long]) =
    base.merge(a, b)
  override def finish(r: (Array[Double], Array[Long])): Seq[(Double, Long)] =
    base.finish(r)
  override def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
    base.bufferEncoder
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    base.outputEncoder
}

object TopK {

  /** Column form: top-k (score, id) pairs within a group, best first, as
    * `array<struct<_1:double,_2:bigint>>`. Null scores must be encoded as
    * NaN by the caller (see [[topK]]) — they rank last, matching
    * `ORDER BY score DESC` null ordering in both Spark and DuckDB.
    */
  def topKPairs(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAgg(k)).apply(score, id)

  /** Per-group top-k finisher: ranks `scoreCol` (desc, nulls last, ties by
    * `idCol` asc) within each `groupCols` group and returns
    * `(groupCols..., idCol, scoreCol, rank)` rows, rank 1..k — row-for-row
    * identical to the window form
    * `row_number() OVER (PARTITION BY group ORDER BY score DESC, id ASC)
    * <= k`, but with a bounded partial aggregate instead of a full shuffle
    * + sort of the scored set.
    *
    * Extra passthrough columns that are functionally dependent on the group
    * key (e.g. the group's own embedding vector) can simply be listed in
    * `groupCols` — grouping on them is free and avoids a re-join.
    *
    * NaN is used as the in-flight null sentinel (cosine/distance columns
    * here never produce NaN themselves: zero-norm and null inputs are
    * mapped to NULL upstream) and restored to NULL on output.
    */
  def perGroupTopK(scored: DataFrame, groupCols: Seq[String], idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val packed = scored
      .groupBy(groupCols.map(col): _*)
      .agg(topKPairs(k)(
        coalesce(col(scoreCol), lit(Double.NaN)), col(idCol)).as("__top"))
    packed
      .select(groupCols.map(col) :+ posexplode(col("__top")): _*)
      .select(
        groupCols.map(col) ++ Seq(
          col("col._2").as(idCol),
          when(isnan(col("col._1")), lit(null).cast("double"))
            .otherwise(col("col._1")).as(scoreCol),
          (col("pos") + 1).cast("long").as("rank")): _*)
  }

  /** [[perGroupTopK]] for STRING ids ([[TopKAggStr]]): identical output
    * contract with `idCol` a string column; ties under UTF-8 byte order.
    */
  def perGroupTopKStr(scored: DataFrame, groupCols: Seq[String], idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val packed = scored
      .groupBy(groupCols.map(col): _*)
      .agg(udaf(new TopKAggStr(k)).apply(
        coalesce(col(scoreCol), lit(Double.NaN)), col(idCol)).as("__top"))
    packed
      .select(groupCols.map(col) :+ posexplode(col("__top")): _*)
      .select(
        groupCols.map(col) ++ Seq(
          col("col._2").as(idCol),
          when(isnan(col("col._1")), lit(null).cast("double"))
            .otherwise(col("col._1")).as(scoreCol),
          (col("pos") + 1).cast("long").as("rank")): _*)
  }

  /** [[perGroupTopK]]'s finisher over PRE-AGGREGATED buffers: each input
    * row carries a k-bounded sorted (scoresCol, idsCol) buffer instead of
    * one scored row. Output contract identical to [[perGroupTopK]]:
    * `(groupCols..., idOut, scoreOut, rank)`, NaN sentinel restored to
    * NULL, rank 1..k.
    */
  def mergeGroupTopK(packed: DataFrame, groupCols: Seq[String],
      scoresCol: String, idsCol: String, idOut: String, scoreOut: String,
      k: Int): DataFrame = {
    val merged = packed
      .groupBy(groupCols.map(col): _*)
      .agg(udaf(new TopKAggMerge(k)).apply(col(scoresCol), col(idsCol))
        .as("__top"))
    merged
      .select(groupCols.map(col) :+ posexplode(col("__top")): _*)
      .select(
        groupCols.map(col) ++ Seq(
          col("col._2").as(idOut),
          when(isnan(col("col._1")), lit(null).cast("double"))
            .otherwise(col("col._1")).as(scoreOut),
          (col("pos") + 1).cast("long").as("rank")): _*)
  }
}
