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
}
