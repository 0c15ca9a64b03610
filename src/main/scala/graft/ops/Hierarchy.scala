package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy flattening (transitive closure to the root) over (id, parent)
  * edge tables — org charts, category trees, thread ancestry. Spark has no
  * recursive CTE; the Spark-first form is an iterative parent-chasing join
  * with flat-lineage checkpoints, converging in tree-height rounds (real
  * hierarchies are shallow: height 10-20 even at billions of nodes, so the
  * round count is bounded and small).
  *
  * Each round: unresolved rows join the edge table on the current
  * ancestor (one shuffle keyed on the ancestor id — uniform unless the
  * tree is a star; the resolved set is immediately set aside and never
  * re-joined), then `localCheckpoint` truncates lineage so analysis cost
  * stays constant per round ([[Dedup.clusterNearDups]]'s discipline). The
  * per-round `count` action is the convergence check, running over the
  * just-checkpointed blocks.
  */
object Hierarchy {

  /** For every node: its root, its depth (edges from the root), and the
    * root-to-node id path "r/…/id". `edges` columns: `id`, `parent`
    * (NULL parent = root). A referenced parent with no edge row is
    * treated as a root (so forests with implicit roots resolve).
    *
    * `maxDepth` bounds the parent chase: a cycle in the edge table (a is
    * an ancestor of itself) would otherwise loop forever — after maxDepth
    * rounds with unresolved rows the call fails with the offending node
    * ids rather than spinning.
    */
  def rootPaths(edges: DataFrame, maxDepth: Int = 64): DataFrame = {
    require(maxDepth >= 1, "maxDepth must be >= 1")
    val e = edges.select(col("id").as("__eid"), col("parent").as("__eparent"))
    var state = edges.select(col("id"), col("id").as("anc"),
      lit(0L).as("depth"), col("id").cast("string").as("path"),
      lit(false).as("done"))
    var remaining = 1L
    var rounds = 0
    while (remaining > 0) {
      if (rounds >= maxDepth) {
        val stuck = state.where(!col("done")).select("id")
          .orderBy("id").limit(5).collect().map(_.get(0)).mkString(", ")
        throw new IllegalStateException(
          s"rootPaths exceeded maxDepth=$maxDepth with $remaining unresolved " +
            s"node(s) (e.g. id(s) $stuck) — the edge table contains a cycle " +
            "or a deeper-than-expected chain; raise maxDepth if the latter.")
      }
      rounds += 1
      state = state.where(!col("done"))
        .join(e, col("anc") === col("__eid"), "left")
        .select(col("id"),
          coalesce(col("__eparent"), col("anc")).as("anc"),
          when(col("__eparent").isNotNull, col("depth") + 1)
            .otherwise(col("depth")).as("depth"),
          when(col("__eparent").isNotNull,
            concat(col("__eparent").cast("string"), lit("/"), col("path")))
            .otherwise(col("path")).as("path"),
          col("__eparent").isNull.as("done"))
        .unionByName(state.where(col("done")))
        .localCheckpoint(true)
      remaining = state.where(!col("done")).count()
    }
    state.select(col("id"), col("anc").as("root"), col("depth"), col("path"))
  }
}
