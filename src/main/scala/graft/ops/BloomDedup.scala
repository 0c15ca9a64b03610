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
      expectedItems: Long): DataFrame =
    newRowsWithSketches(incoming, seen, keyCol,
      Seq(bloomFilter(seen, col(keyCol), expectedItems)))

  /** [[newRows]] routed through PRE-BUILT sketch column(s) (from
    * [[sketchColumns]]): the daily-crawl shape, where the seen corpus's
    * sketch was persisted by an earlier run and today's batch probes it
    * without re-aggregating 100 TB of history into a filter. A row is
    * definitely new only if EVERY shard says might-contain = false (each
    * shard covers one historical batch; no false negatives per shard, so
    * the OR preserves exactness). `seen` is still consulted for the exact
    * verify on the might-contain fraction — the sketches only route.
    */
  def newRowsWithSketches(incoming: DataFrame, seen: DataFrame,
      keyCol: String, sketches: Seq[Column]): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch column")
    val probed = sketches.tail
      .foldLeft(probe(incoming, sketches.head, col(keyCol))) { (df, sk) =>
        val again = probe(
          df.withColumnRenamed("__might_contain", "__mc_acc"), sk, col(keyCol))
        // fold OR across shards, keeping the single __might_contain column
        again.withColumn("__might_contain",
          col("__mc_acc") || col("__might_contain")).drop("__mc_acc")
      }
    val definitelyNew = probed.where(!col("__might_contain"))
    val needVerify = probed.where(col("__might_contain"))
    val verifiedNew = needVerify.join(
      seen.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    definitelyNew.unionByName(verifiedNew).drop("__might_contain")
  }

  // ---- cross-run sketch persistence ---------------------------------------
  //
  // Sketch state is a TABLE of shard rows (shard STRING, sketch BINARY,
  // n_expected BIGINT): one row per ingested batch, appended as batches
  // arrive. Bytes per shard are fixed by n_expected (~1.2 MB at 1M items /
  // 3% fpp), so the table stays driver-bounded like ANN codebooks even
  // after thousands of batches; compactSketches folds shards back to one
  // row when the OR fan-out grows.

  /** Build the Bloom sketch over `seen`'s `keyCol` and append it as one
    * shard row under `path`. Run once per ingested batch (over that batch
    * only — history is already sketched).
    */
  def saveSketch(seen: DataFrame, keyCol: String, expectedItems: Long,
      path: String, shard: String): Unit = {
    val child = GraftBridge.expression(xxhash64(col(keyCol)))
    val agg = new BloomFilterAggregate(child, expectedItems).toAggregateExpression()
    seen.where(col(keyCol).isNotNull)
      .agg(GraftBridge.column(agg).as("sketch"))
      .select(lit(shard).as("shard"), col("sketch"),
        lit(expectedItems).as("n_expected"))
      .write.mode("append").parquet(path)
  }

  /** One scalar-subquery sketch column per persisted PHYSICAL sketch, ready
    * for [[newRowsWithSketches]]. The listing is a driver action over the
    * sketch TABLE only (rows == batches ingested; KBs) — zero jobs touch
    * the seen corpus, which is the point of persisting.
    *
    * Keyed by (shard, md5(sketch)) rather than shard alone: saveSketch is
    * append-mode, so a re-run under the same shard name leaves TWO rows —
    * selecting `first(sketch)` per shard would silently drop one, and a
    * dropped sketch means Bloom false NEGATIVES (true dups bypassing the
    * exact verify). Every distinct physical sketch gets its own probe
    * column instead; byte-identical re-appends collapse (same digest ==
    * same bit array == same answers), distinct ones are all OR'd in.
    * Null-sketch rows (a shard saved over an empty batch) contribute a
    * null filter, which [[probe]] folds to false — exact, since an empty
    * batch saw nothing.
    */
  /** Self-heal after a crash inside [[compactSketches]]' two-rename swap:
    * if `path` is gone but the `.__compact_old` copy survives (the crash
    * landed between rename(path -> .old) and rename(tmp -> path)), move
    * the old directory back into place — recovery is automatic at the
    * next read/compact instead of a manual rename. Idempotent; a no-op
    * whenever `path` exists.
    */
  private def recoverCompactSwap(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(path + ".__compact_old")
    if (!fs.exists(hp) && fs.exists(old)) {
      // two concurrent readers can both see `path` missing; the rename
      // loser must treat "someone else already recovered it" as success —
      // only fail when the store is still absent after the race settles
      val renamed = fs.rename(old, hp)
      require(renamed || fs.exists(hp),
        s"compact-swap recovery: could not move $old back to $path")
    }
  }

  def sketchColumns(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Column] = {
    recoverCompactSwap(spark, path)
    val keys = spark.read.parquet(path)
      .select(col("shard"), md5(col("sketch")).as("digest"))
      .distinct().collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
      .sortBy(t => (t._1, t._2.getOrElse(""))).toSeq
    keys.map { case (sh, dg) =>
      val rowsFor = dg match {
        case Some(d) => spark.read.parquet(path)
          .where(col("shard") === sh && md5(col("sketch")) === d)
        case None => spark.read.parquet(path)
          .where(col("shard") === sh && col("sketch").isNull)
      }
      val plan = rowsFor.agg(first(col("sketch")).as("__bloom"))
        .queryExecution.analyzed
      GraftBridge.column(ScalarSubquery(plan))
    }
  }

  /** Fold all shard rows under `path` into ONE merged shard (driver-side
    * `mergeInPlace`; every shard must share `n_expected` so bit arrays are
    * compatible). Bounds the probe's OR fan-out; the merged filter answers
    * might-contain exactly as the OR of its inputs did.
    */
  def compactSketches(spark: org.apache.spark.sql.SparkSession,
      path: String, shard: String = "compacted"): Unit = {
    import org.apache.spark.util.sketch.BloomFilter
    // MUST run before the tmp/old cleanup below: after a mid-swap crash
    // the .__compact_old directory IS the only sketch state, and deleting
    // it here would turn a recoverable crash into data loss.
    recoverCompactSwap(spark, path)
    val rows = spark.read.parquet(path)
      .select("sketch", "n_expected").collect()
    val present = rows.filter(!_.isNullAt(0))
    if (present.nonEmpty) {
      require(present.map(_.getLong(1)).distinct.length == 1,
        "compactSketches: shards were sized with different expectedItems")
      val filters = present.map { r =>
        BloomFilter.readFrom(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](0)))
      }
      val merged = filters.reduce { (a, b) => a.mergeInPlace(b); a }
      val out = new java.io.ByteArrayOutputStream()
      merged.writeTo(out)
      val one = spark.createDataFrame(
        java.util.Arrays.asList(
          org.apache.spark.sql.Row(shard, out.toByteArray, present.head.getLong(1))),
        spark.read.parquet(path).schema)
      // Crash-safe swap: write the replacement to a temp sibling, move the
      // old directory aside, rename the temp into place, then drop the old.
      // A crash mid-sequence leaves either the original or the `.old` copy
      // on disk — never zero sketch state (mode("overwrite") on `path`
      // itself deletes-then-writes, which CAN lose everything).
      val hp = new org.apache.hadoop.fs.Path(path)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tmp = new org.apache.hadoop.fs.Path(path + ".__compact_tmp")
      val old = new org.apache.hadoop.fs.Path(path + ".__compact_old")
      fs.delete(tmp, true); fs.delete(old, true)
      one.write.mode("overwrite").parquet(tmp.toString)
      require(fs.rename(hp, old), s"compactSketches: could not move $path aside")
      require(fs.rename(tmp, hp), s"compactSketches: could not move compacted shard into $path")
      fs.delete(old, true)
    }
  }
}
