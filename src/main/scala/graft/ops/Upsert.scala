package graft.ops

import org.apache.spark.sql.DataFrame
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
}
