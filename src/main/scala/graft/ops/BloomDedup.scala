package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
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
  *  2. feed the one-row sketch to the probe as a SCALAR SUBQUERY —
  *     `BloomFilterMightContain` requires its filter input to be foldable
  *     or a subquery (never a joined-in column), and this is exactly the
  *     plan shape Spark's own `InjectRuntimeFilter` builds. The subquery
  *     result ships to executors once; the probe is map-side, codegen'd;
  *  3. might-contain = false rows are DEFINITELY new (Bloom filters have no
  *     false negatives) and skip the join entirely;
  *  4. only might-contain = true rows — true dups plus the ~fpp false
  *     positives — proceed to the exact anti-join verify.
  *
  * The result is bit-identical to the plain anti-join; the sketch only
  * routes rows.
  */
object BloomDedup {

  /** Bloom-filter COLUMN (scalar subquery) over the seen side's `key`.
    * `expectedItems` sizes the sketch (~3% fpp at the default bits/item
    * Spark picks); at corpus scale pass the estimated distinct count —
    * an over-estimate only wastes sketch bytes, never correctness.
    *
    * Null keys are filtered out before hashing. (This is NOT automatic:
    * `xxhash64(null)` returns the seed — a real long — so unfiltered null
    * keys WOULD be inserted. Excluding them is safe because a null key can
    * never equal a seen key under SQL join semantics, so a null-key
    * incoming row is always genuinely new.)
    */
  def bloomFilter(seen: DataFrame, key: Column, expectedItems: Long): Column = {
    val child = GraftBridge.expression(xxhash64(key))
    val agg = new BloomFilterAggregate(child, expectedItems).toAggregateExpression()
    val plan = seen.where(key.isNotNull)
      .agg(GraftBridge.column(agg).as("__bloom"))
      .queryExecution.analyzed
    GraftBridge.column(ScalarSubquery(plan))
  }

  /** Incoming rows annotated with `__might_contain`. The probe itself is
    * total (`xxhash64` never returns null), but the FILTER can be null when
    * the seen side is empty (aggregate over zero rows); an empty seen
    * corpus means everything is new, so nulls fold to false.
    */
  def probe(incoming: DataFrame, bloom: Column, key: Column): DataFrame = {
    val mc = GraftBridge.column(BloomFilterMightContain(
      GraftBridge.expression(bloom),
      GraftBridge.expression(xxhash64(key))))
    incoming.withColumn("__might_contain", coalesce(mc, lit(false)))
  }

  /** Exact new-rows result (equals `incoming.join(seen, key, "left_anti")`)
    * with the anti-join's left side pruned to the might-contain fraction.
    *
    * `probed` feeds both branches of the union; the bloom subquery is still
    * built once (Spark's ReuseSubquery collapses the shared instance). The
    * incoming scan runs twice — deliberately uncached: at corpus scale the
    * rescan is a cheap map-side pass, while caching 100 TB is not an
    * option. Callers with small inputs can persist before calling.
    */
  def newRows(incoming: DataFrame, seen: DataFrame, keyCol: String,
      expectedItems: Long): DataFrame = {
    val bloom = bloomFilter(seen, col(keyCol), expectedItems)
    val probed = probe(incoming, bloom, col(keyCol))
    val definitelyNew = probed.where(!col("__might_contain"))
    val needVerify = probed.where(col("__might_contain"))
    val verifiedNew = needVerify.join(
      seen.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    definitelyNew.unionByName(verifiedNew).drop("__might_contain")
  }
}
