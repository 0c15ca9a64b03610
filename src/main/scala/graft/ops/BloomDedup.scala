package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftBridge

/** Bloom-prefiltered incremental dedup: "which of these incoming docs are
  * genuinely new against a (huge) seen corpus?"
  *
  * The exact answer is a left-anti join of incoming digests against seen
  * digests — at 100 TB that shuffles BOTH sides on the digest. The Bloom
  * path makes the big shuffle proportional to the (tiny) probable-dup
  * fraction instead:
  *
  *  1. aggregate the seen side into ONE fixed-size Bloom filter (Spark's
  *     native `BloomFilterAggregate` — partial/merge aggregation, so each
  *     executor builds a local sketch and only sketches cross the wire);
  *  2. broadcast the one-row sketch and probe it map-side over incoming
  *     (`BloomFilterMightContain`, codegen'd);
  *  3. might-contain = false rows are DEFINITELY new (Bloom filters have no
  *     false negatives) and skip the join entirely;
  *  4. only might-contain = true rows — true dups plus the ~fpp false
  *     positives — proceed to the exact anti-join verify.
  *
  * The result is bit-identical to the plain anti-join; the sketch only
  * routes rows. This is the same trick Spark's AQE runtime row-filtering
  * applies to join pruning, surfaced as an explicit reusable operator.
  */
object BloomDedup {

  /** One-row DataFrame holding a Bloom filter (binary) over `key`.
    * `expectedItems` sizes the sketch (~1% fpp at the default bits/item
    * Spark picks); at corpus scale pass the estimated distinct count —
    * an over-estimate only wastes sketch bytes, never correctness.
    * Null keys are skipped by the aggregate (they can never equal a seen
    * key under SQL join semantics anyway).
    */
  def buildBloom(seen: DataFrame, key: Column, expectedItems: Long): DataFrame = {
    val child = GraftBridge.expression(xxhash64(key))
    val agg = new BloomFilterAggregate(child, expectedItems).toAggregateExpression()
    seen.agg(GraftBridge.column(agg).as("__bloom"))
  }

  /** Incoming rows annotated with `__might_contain` — the broadcast of the
    * one-row bloom costs one scalar per executor; the probe is map-side.
    */
  def probe(incoming: DataFrame, bloom: DataFrame, key: Column): DataFrame = {
    val probed = incoming.crossJoin(broadcast(bloom))
    val mc = GraftBridge.column(BloomFilterMightContain(
      GraftBridge.expression(col("__bloom")),
      GraftBridge.expression(xxhash64(key))))
    // null key probes return null; a null key is definitely-new (never
    // joins), so fold nulls to false before the branch
    probed.withColumn("__might_contain", coalesce(mc, lit(false)))
      .drop("__bloom")
  }

  /** Exact new-rows result (equals `incoming.join(seen, key, "left_anti")`)
    * with the anti-join's left side pruned to the might-contain fraction.
    */
  def newRows(incoming: DataFrame, seen: DataFrame, keyCol: String,
      expectedItems: Long): DataFrame = {
    val bloom = buildBloom(seen, col(keyCol), expectedItems)
    val probed = probe(incoming, bloom, col(keyCol)).cache()
    val definitelyNew = probed.where(!col("__might_contain"))
    val needVerify = probed.where(col("__might_contain"))
    val verifiedNew = needVerify.join(
      seen.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    definitelyNew.unionByName(verifiedNew).drop("__might_contain")
  }
}
