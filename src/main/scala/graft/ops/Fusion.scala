package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion of N ranked retrieval lists (Cormack, Clarke &
  * Buettcher, SIGIR 2009): a document's fused score is
  * `sum over lists of 1/(k0 + rank)`, surfaced here as exact integer
  * nanos `1e9 DIV (k0 + rank)` — order-free BIGINT sums, bit-replayable
  * in SQL, no float anywhere. Lists that miss a document contribute 0.
  *
  * Shape at scale: every input list is already top-k-bounded per group
  * (that is the contract — rankers finish through the bounded TopKAgg),
  * so the N-way full outer merge holds at most N*k rows per group and
  * the final re-rank window runs on that bounded set, never on a corpus.
  */
object Fusion {

  /** @param lists   ranked lists, each `(keys..., idCol, rankCol)` with
    *                rank 1-based and each group bounded to top-k
    * @param k0      the RRF damping constant (60 in the original paper)
    * @param topK    fused rows kept per group
    * @return `(keys..., idCol, rank_1..rank_N (NULL = absent), rrf_nano,
    *         rrf_rank)`
    */
  def rrf(lists: Seq[DataFrame], keys: Seq[String], idCol: String,
      rankCol: String, k0: Long = 60L, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one ranked list")
    val tagged = lists.zipWithIndex.map { case (df, i) =>
      df.select(((keys :+ idCol).map(col) :+
        col(rankCol).as(s"__r_$i")): _*) }
    val merged = tagged.reduce((a, b) => a.join(b, keys :+ idCol, "full_outer"))
    val credit = lists.indices.map(i =>
      coalesce(expr(s"1000000000L DIV ($k0 + __r_$i)"), lit(0L)))
      .reduce(_ + _)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("rrf_nano").desc, col(idCol))
    merged.withColumn("rrf_nano", credit)
      .withColumn("rrf_rank", row_number().over(w).cast("long"))
      .where(col("rrf_rank") <= topK)
      .select(keys.map(col) ++ Seq(col(idCol)) ++
        lists.indices.map(i => col(s"__r_$i").as(s"rank_${i + 1}")) ++
        Seq(col("rrf_nano"), col("rrf_rank")): _*)
  }
}
