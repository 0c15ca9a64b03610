package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch CDC merge (SCD type 1): apply a batch of keyed updates to a
  * current snapshot — the newest version of each key wins, unmatched
  * current rows pass through. This is the MERGE INTO / upsert primitive a
  * training-data pipeline runs every ingest cycle (the streaming twin is
  * `StreamingIngest`'s upsert sink; this is the batch path).
  *
  * Shape at scale: ONE left-anti join (current minus updated keys) plus a
  * union — never a full-outer join or a window over the combined tables.
  * The anti join shuffles on the merge key; the updates side is typically
  * the small delta, so AQE turns it into a broadcast anti join and the
  * 100 TB snapshot never shuffles at all. Intra-batch version conflicts
  * are resolved BEFORE the join by an argmax aggregate (`max_by` under
  * exact struct ordering), so the anti join sees unique keys.
  */
object Upsert {

  /** Latest version per key within `updates`: the row with the highest
    * `seqCol` wins (ties broken by the largest remaining column tuple, so
    * the result is deterministic even on seq ties). Implemented as
    * max(struct(seq, payload)) — a partial/final aggregate; only one
    * candidate row per key crosses the shuffle.
    */
  def latestPerKey(updates: DataFrame, keyCols: Seq[String], seqCol: String): DataFrame = {
    val payload = updates.columns.filterNot(keyCols.contains)
    val ordered = struct(col(seqCol) +: payload.filterNot(_ == seqCol).map(col): _*)
    updates.groupBy(keyCols.map(col): _*)
      .agg(max(ordered).as("__w"))
      .select(keyCols.map(col) ++ payload.map(c => col(s"__w.$c").as(c)): _*)
  }

  /** Merged snapshot: `updates` rows (deduplicated to latest-per-key)
    * replace matching `current` rows; everything else passes through.
    * Schemas must be union-compatible by name.
    */
  def merge(current: DataFrame, updates: DataFrame, keyCols: Seq[String],
      seqCol: String): DataFrame = {
    val latest = latestPerKey(updates, keyCols, seqCol)
    current.join(latest.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(latest.select(current.columns.map(col): _*))
  }

  /** SCD type 2: the full version HISTORY (vs `merge`'s latest-wins
    * overwrite). From a keyed change log, emit one row per run of equal
    * consecutive values: valid_from = the run's first `seqCol`, valid_to =
    * the next version's valid_from (NULL while current), a per-key
    * version_no, and is_current.
    *
    * Change detection is null-safe (`<=>` over the value-column struct),
    * so NULL-valued states version correctly. Requires (key, seq) unique —
    * with duplicates the run detection is nondeterministic; dedupe with
    * [[latestPerKey]] first.
    *
    * Shape at scale: one exchange on the key, then two window passes over
    * the SAME (partition, order), which plan as a single sort — the change
    * log never shuffles twice. This is q_topn_per_group-shaped: per-key
    * state fits a partition because keys are the dimension's entities, not
    * the fact volume.
    */
  def scd2History(changes: DataFrame, keyCols: Seq[String], seqCol: String,
      valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol))
    val v = struct(valueCols.map(col): _*)
    changes
      .withColumn("__prev", lag(v, 1).over(w))
      .where(!(v <=> col("__prev")))
      .drop("__prev")
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .withColumn("version_no", row_number().over(w).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .select(keyCols.map(col) ++ valueCols.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("version_no"),
          col("is_current")): _*)
  }

  /** Row-level diff between two snapshots of a keyed table — the change
    * feed a data-versioning layer (Delta/Iceberg CDF style) would emit,
    * derived from plain tables: one row per key that was `added`,
    * `removed`, or `changed`, with the per-column change mask
    * (`changed_cols`, name-sorted csv) and its size. Unchanged keys are
    * dropped, so the output is |delta|-sized, not |table|-sized.
    *
    * Comparison is null-safe per column (`IS DISTINCT FROM` semantics);
    * a key present in both sides with every value column null-safely
    * equal produces nothing.
    *
    * Shape at scale: ONE full-outer shuffle join on the key columns —
    * both sides hash-partition the same way, and if the snapshots are
    * written bucketed by key ([[graft.ingest.Bucketed]]) the exchange
    * disappears entirely. The change mask is a map-side expression over
    * the joined row; nothing aggregates, so the plan is skew-immune
    * except for pathological duplicate keys (keyed snapshots are
    * dedup'd upstream by contract).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty,
      "snapshotDiff needs key and value columns")
    val o = oldSnap.select((keyCols ++ valueCols).map(col): _*)
      .withColumn("__in_old", lit(true))
    val n = newSnap.select((keyCols ++ valueCols).map(col): _*)
      .withColumn("__in_new", lit(true))
    val renamedO = valueCols.foldLeft(o)((d, c) =>
      d.withColumnRenamed(c, s"__old_$c"))
    val renamedN = valueCols.foldLeft(n)((d, c) =>
      d.withColumnRenamed(c, s"__new_$c"))
    val joined = renamedO.join(renamedN, keyCols, "full_outer")
    val diffs = valueCols.sorted.map(c =>
      when(!(col(s"__old_$c") <=> col(s"__new_$c")), lit(c)))
    val mask = array_compact(array(diffs: _*))
    joined.select(keyCols.map(col) ++ Seq(
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .otherwise(lit("changed")).as("change"),
        when(col("__in_old").isNotNull && col("__in_new").isNotNull,
          size(mask)).otherwise(lit(0)).cast("long").as("n_cols_changed"),
        when(col("__in_old").isNotNull && col("__in_new").isNotNull,
          array_join(mask, ",")).otherwise(lit("")).as("changed_cols")): _*)
      .where(col("change") =!= "changed" || col("n_cols_changed") > 0)
  }
}
