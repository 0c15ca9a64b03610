package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics beyond [[Dedup.clusterNearDups]]'s connected
  * components: iterative PageRank over an (src, dst) edge table.
  *
  * Everything is EXACT 64-bit integer arithmetic in nano-units: rank
  * starts at 10^9, a node's contribution is `rank DIV outdeg` (truncating
  * division; the dropped remainder is < outdeg nanos — deterministic, and
  * ~1e-6 relative, far below PageRank's own iteration error), damping is
  * `(85 * sum) DIV 100`. No float enters until the final descale, so
  * results are bit-reproducible on any engine and any partitioning — the
  * whole two-iteration computation can be replayed in plain SQL, which is
  * exactly what the corpus oracle does.
  *
  * Shape at scale: per iteration, one shuffle keyed on src (rank + outdeg
  * attach; same key, the exchange is reused) and one keyed on dst (the
  * contribution sum — partial map-side combine first), which is the
  * canonical distributed-PageRank plan. Lineage is truncated by an eager
  * localCheckpoint per iteration, so iteration N plans O(1) work, not
  * O(N) ([[Hierarchy.rootPaths]]'s discipline). Dangling nodes (no
  * out-edges) contribute nothing — standard simplified PageRank; feed a
  * sink-completed edge set if mass conservation matters.
  */
object Graph {

  /** Per-node triangle counts over an undirected edge table — the
    * clustering-coefficient numerator (community/spam structure signal).
    *
    * Canonical a<b edge orientation makes every triangle x<y<z appear in
    * exactly one wedge join: edges(x,y) ⋈ edges(y,z) closed by
    * edges(x,z). Counts are exact integers, so the SQL replay is
    * trivially bit-equal. Isolated-from-triangles nodes report 0 via the
    * node-spine left join.
    *
    * Shape at scale: two shuffle joins keyed on node ids plus one
    * explode + hash aggregate; wedge generation is the classic
    * high-degree hotspot — AQE skew-join splits it here, and the
    * production upgrade (order by degree instead of id, which bounds
    * wedges by arboricity) composes without changing the output.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
    val tri = e.as("ab").join(e.as("bc"), col("ab.b") === col("bc.a"))
      .select(col("ab.a").as("x"), col("ab.b").as("y"), col("bc.b").as("z"))
      .join(e.select(col("a").as("x"), col("b").as("z")), Seq("x", "z"))
    val perNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n"))
    val nodes = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id")))
      .where(col("id").isNotNull).distinct()
    nodes.join(perNode, Seq("id"), "left")
      .select(col("id"), coalesce(col("n"), lit(0L)).as("n_triangles"))
  }

  /** Link prediction by neighbor overlap: for every NON-adjacent node
    * pair sharing at least one neighbor, the Jaccard coefficient
    * |N(a)∩N(b)| / |N(a)∪N(b)| — the classic structural similarity score
    * (recommend-an-edge / entity-resolution signal on the dedup graph).
    *
    * All-integer output: counts are exact, and the coefficient is
    * surfaced as `jacc_nano = (common * 10^9) DIV union` — truncating
    * BIGINT division, bit-replayable in SQL, totally ordered without any
    * float comparison.
    *
    * Shape at scale: candidate pairs come from the neighbor-keyed
    * self-join (only pairs at distance 2 materialize — never all pairs),
    * the same wedge generation as [[triangleCounts]] with the same
    * high-degree hotspot story: AQE skew-join splits hot neighbors here,
    * and the production upgrade (df-cap or degree-ordered wedges) bounds
    * wedge counts by arboricity without changing surviving scores.
    * Degrees ride in on two broadcast-able joins; existing edges leave
    * via a left-anti join on the canonical a<b orientation.
    */
  def jaccardLinks(edges: DataFrame): DataFrame = {
    val e = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
    // (id, nb) is distinct by construction: e is distinct with a < b, so
    // the two directed branches cannot collide.
    val adj = e.select(col("a").as("id"), col("b").as("nb"))
      .unionByName(e.select(col("b").as("id"), col("a").as("nb")))
    val deg = adj.groupBy("id").agg(count(lit(1)).as("deg"))
    val common = adj.as("u").join(adj.as("v"),
        col("u.nb") === col("v.nb") && col("u.id") < col("v.id"))
      .groupBy(col("u.id").as("id_a"), col("v.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(e, col("id_a") === col("a") && col("id_b") === col("b"),
        "left_anti")
      .join(deg.select(col("id").as("id_a"), col("deg").as("deg_a")),
        Seq("id_a"))
      .join(deg.select(col("id").as("id_b"), col("deg").as("deg_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_common"),
        col("deg_a"), col("deg_b"),
        expr("(n_common * 1000000000L) DIV (deg_a + deg_b - n_common)")
          .as("jacc_nano"))
  }

  /** `iterations` rounds of integer PageRank; returns (id, r_nano). */
  def pageRankNano(edges: DataFrame, iterations: Int): DataFrame = {
    // Edges are hash-partitioned on src ONCE; every iteration's rank
    // attach then aligns with that layout instead of re-shuffling the
    // edge set (the dominant bytes) each round. Out-degree rides in the
    // rank state — computed once, so the per-iteration plan is a single
    // src-keyed join plus the dst-keyed contribution sum.
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).localCheckpoint(true)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
      .join(outdeg.withColumnRenamed("src", "id"), Seq("id"), "left")
      .localCheckpoint(true)
    var rank = nodes.select(col("id"), col("outdeg"),
      lit(1000000000L).as("r_nano"))
    for (it <- 1 to iterations) {
      val contrib = e
        .join(rank.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), expr("r_nano DIV outdeg").as("c"))
      val sums = contrib.groupBy("id").agg(sum(col("c")).as("s_nano"))
      rank = nodes.join(sums, Seq("id"), "left")
        .select(col("id"), col("outdeg"),
          expr("150000000L + (85 * coalesce(s_nano, 0L)) DIV 100")
            .as("r_nano"))
      // truncate lineage every few rounds, not every round: an eager
      // per-iteration checkpoint materializes the full rank state each
      // time, which costs more than the (bounded, 4-deep) lineage it
      // would trim — deep runs still plan O(1) per block of rounds
      if (it % 4 == 0 && it < iterations) rank = rank.localCheckpoint(true)
    }
    rank.select(col("id"), col("r_nano"))
  }

  /** Float view: (id, pagerank) with pagerank = r_nano / 1e9. */
  def pageRank(edges: DataFrame, iterations: Int): DataFrame =
    pageRankNano(edges, iterations)
      .select(col("id"),
        (col("r_nano").cast("double") / 1000000000.0).as("pagerank"))

  /** Personalized PageRank: the teleport term returns mass ONLY to the
    * seed set, so scores measure graph proximity to the seeds — the
    * seed-expansion / graph-based data-selection primitive (find
    * everything "near" a trusted subset). Unnormalized per-seed start
    * (each seed begins at 10^9 nanos; divide by |seeds| downstream if a
    * distribution is wanted).
    *
    * Same exact nano-integer discipline, per-iteration plan shape and
    * lineage-truncation cadence as [[pageRankNano]] — the only deltas are
    * the seed-restricted start vector and the seed-gated 15% teleport
    * term, so the SQL replay stays a two-join-per-iteration chain.
    */
  def personalizedPageRankNano(edges: DataFrame, seeds: DataFrame,
      iterations: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).localCheckpoint(true)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val seedSet = seeds.select(col("id")).distinct()
      .withColumn("is_seed", lit(true))
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
      .join(outdeg.withColumnRenamed("src", "id"), Seq("id"), "left")
      .join(broadcast(seedSet), Seq("id"), "left")
      .select(col("id"), col("outdeg"),
        coalesce(col("is_seed"), lit(false)).as("is_seed"))
      .localCheckpoint(true)
    var rank = nodes.select(col("id"), col("outdeg"), col("is_seed"),
      when(col("is_seed"), lit(1000000000L)).otherwise(lit(0L)).as("r_nano"))
    for (it <- 1 to iterations) {
      val contrib = e
        .join(rank.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), expr("r_nano DIV outdeg").as("c"))
      val sums = contrib.groupBy("id").agg(sum(col("c")).as("s_nano"))
      rank = nodes.join(sums, Seq("id"), "left")
        .select(col("id"), col("outdeg"), col("is_seed"),
          expr("CASE WHEN is_seed THEN 150000000L ELSE 0L END" +
            " + (85 * coalesce(s_nano, 0L)) DIV 100").as("r_nano"))
      if (it % 4 == 0 && it < iterations) rank = rank.localCheckpoint(true)
    }
    rank.select(col("id"), col("r_nano"))
  }

  /** Float view of [[personalizedPageRankNano]]: (id, ppr = r_nano/1e9). */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iterations: Int): DataFrame =
    personalizedPageRankNano(edges, seeds, iterations)
      .select(col("id"),
        (col("r_nano").cast("double") / 1000000000.0).as("ppr"))

  /** Community detection by SYNCHRONOUS label propagation (Raghavan et
    * al. 2007) with a deterministic tie-break: every node starts labeled
    * with its own id; each round it adopts the most frequent label among
    * its neighbors, ties broken by the smallest label. Unlike the
    * classic asynchronous/randomized formulation, the synchronous
    * min-tie-break update is a pure function of the previous round, so
    * the whole run is bit-reproducible on any engine and partitioning —
    * and replayable round-by-round in SQL, which is exactly what the
    * corpus oracle does. Domain/topic clustering over link or near-dup
    * graphs where connected components are too coarse (they merge
    * everything bridge-connected) is the pipeline use.
    *
    * Returns one row per node (including isolated nodes, which keep
    * their own label): (id, label).
    *
    * Shape at scale: adjacency is materialized once, hash-partitioned on
    * the neighbor key the per-round join probes; each round is ONE
    * shuffle join (labels onto neighbors — labels are the small,
    * one-row-per-node side) plus a two-level hash aggregate
    * ((id,label) count, then per-id argmax via min(struct)). Lineage is
    * truncated every 4 rounds ([[pageRankNano]]'s cadence). High-degree
    * hubs are the usual hotspot; AQE skew-join handles them, and the
    * label frequency count is map-side-combinable by construction.
    */
  /** `rounds` synchronous peel iterations toward the k-core: each round
    * computes degrees over the surviving subgraph and drops every node
    * with degree < k (classic iterative k-core; with enough rounds this
    * is exactly the k-core, with fewer it is the deterministic partial
    * peel — rounds is part of the contract so the SQL replay chains the
    * same number of CTE stages). Returns every original node with its
    * degree in the surviving subgraph (0 once peeled) and the non-null
    * `in_core` verdict `deg_end >= k`.
    *
    * Shape at scale: per round, one union + hash aggregate for degrees
    * and two semi-join-shaped filters keyed on node id; lineage is cut
    * by periodic localCheckpoint so round N plans O(1) work
    * ([[pageRankNano]]'s discipline). Everything is exact integers.
    */
  /** Multi-source BFS: `rounds` synchronous min-plus iterations from the
    * seed set over the undirected graph; returns every node with its hop
    * distance to the nearest seed, or -1 if unreached within `rounds`
    * (fixed round count is the contract — the SQL replay bounds its
    * recursive walk at the same depth, and min-over-walks ==
    * synchronous-iteration by induction). Exact integers throughout.
    *
    * Shape at scale: the adjacency is repartitioned on the join key once
    * and checkpointed; each round is one join frontier-to-adjacency plus
    * a min-combine hash aggregate (map-side partials). Frontier dedup is
    * implicit in the min aggregate, so hub fan-in never amplifies rows
    * past one per (node, round).
    */
  def bfsDistances(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    val e = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
    val adj = e.select(col("a").as("id"), col("b").as("nb"))
      .unionByName(e.select(col("b").as("id"), col("a").as("nb")))
      .repartition(col("nb")).localCheckpoint(true)
    var dist = seeds.select(col("id")).where(col("id").isNotNull).distinct()
      .withColumn("dist", lit(0L))
    for (it <- 1 to rounds) {
      val cand = adj.join(dist.withColumnRenamed("id", "nb"), Seq("nb"))
        .select(col("id"), (col("dist") + 1).as("dist"))
      dist = dist.unionByName(cand).groupBy("id").agg(min("dist").as("dist"))
      if (it % 2 == 0 && it < rounds) dist = dist.localCheckpoint(true)
    }
    val spine = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id")))
      .where(col("id").isNotNull).distinct()
    spine.join(dist, Seq("id"), "left")
      .select(col("id"), coalesce(col("dist"), lit(-1L)).as("dist"))
  }

  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val e0 = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
    var e = e0.localCheckpoint(true)
    for (it <- 1 to rounds) {
      val deg = e.select(col("a").as("id"))
        .unionByName(e.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val keep = deg.where(col("deg") >= k).select("id")
      e = e.join(keep.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
        .select("a", "b")
      if (it % 2 == 0 && it < rounds) e = e.localCheckpoint(true)
    }
    val degEnd = e.select(col("a").as("id"))
      .unionByName(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val spine = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id")))
      .where(col("id").isNotNull).distinct()
    spine.join(degEnd, Seq("id"), "left")
      .select(col("id"), coalesce(col("deg"), lit(0L)).as("deg_end"))
      .withColumn("in_core", col("deg_end") >= k)
  }

  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    val e = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
    val adj = e.select(col("a").as("id"), col("b").as("nb"))
      .unionByName(e.select(col("b").as("id"), col("a").as("nb")))
      .repartition(col("nb")).localCheckpoint(true)
    var labels = adj.select(col("id")).distinct()
      .select(col("id"), col("id").as("label"))
    for (it <- 1 to rounds) {
      val freq = adj
        .join(labels.withColumnRenamed("id", "nb"), Seq("nb"))
        .groupBy(col("id"), col("label")).agg(count(lit(1)).as("cnt"))
      labels = freq.groupBy("id")
        .agg(min(struct((-col("cnt")).as("nc"), col("label").as("l")))
          .as("m"))
        .select(col("id"), col("m.l").as("label"))
      if (it % 4 == 0 && it < rounds) labels = labels.localCheckpoint(true)
    }
    val spine = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id")))
      .where(col("id").isNotNull).distinct()
    spine.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
  }

  /** Katz centrality (Katz 1953, "A new status index derived from
    * sociometric analysis"), bounded-horizon form: x_{t+1}(i) = 1e9 +
    * β·Σ_{j→i} x_t(j) with attenuation β = 1/2 as one truncating
    * halving per round — every path of length k contributes its mass
    * discounted 2^-k, the walk-counting complement to [[pageRankNano]]
    * (no out-degree normalization: a prolific pointer confers full
    * mass to every target). Convergence needs β < 1/λ_max — with
    * β = 1/2 that's max eigenvalue < 2; the fixed `iterations` horizon
    * keeps the value finite and exactly SQL-replayable regardless.
    *
    * Same shape discipline as [[pageRankNano]]: edges pinned on src
    * once, per-round one src-keyed attach + one dst-keyed sum, lineage
    * truncated every 4 rounds.
    *
    * Overflow bound: per-round in-neighbor sums grow like
    * (λ_max/2)^k · 1e9, so they accumulate in DECIMAL(38,0) (DuckDB:
    * HUGEINT — the [[hitsNano]] / ts_acf automatic-width discipline)
    * rather than a silently-wrapping BIGINT; only the halved per-node
    * score returns to BIGINT. A score that would still exceed 2^63
    * after halving (λ_max ≥ ~2 on a long horizon — outside Katz's
    * convergence regime β < 1/λ_max anyway) nulls under non-ANSI
    * instead of wrapping, on both engines.
    */
  def katzNano(edges: DataFrame, iterations: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val e = edges.select(col("src"), col("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .repartition(col("src")).localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    var x = nodes.select(col("id"), lit(1000000000L).as("x_nano"))
    for (it <- 1 to iterations) {
      val sums = e.join(x.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("x_nano").cast(DecimalType(38, 0))).as("s"))
      x = nodes.join(sums, Seq("id"), "left")
        .select(col("id"),
          expr("1000000000L + coalesce(s DIV 2, 0L)").as("x_nano"))
      if (it % 4 == 0 && it < iterations) x = x.localCheckpoint(true)
    }
    x
  }

  /** `iterations` rounds of exact-integer HITS (Kleinberg 1999, JACM
    * 46(5) "Authoritative sources in a hyperlinked environment") with L1
    * normalization — the hub/authority complement to [[pageRankNano]]
    * (classic HITS normalizes by the L2 norm; L1 keeps every step
    * rational so the whole run replays in SQL bit-for-bit, and the
    * rank ORDER is what downstream selection consumes).
    *
    * Per round: auth_raw(i) = Σ_{j→i} hub(j), renormalized to
    * `a_raw * 1e9 DIV Σ a_raw`; then hub_raw(i) = Σ_{i→j} auth(j),
    * renormalized the same way. Raw sums accumulate in DECIMAL(38,0)
    * (DuckDB: HUGEINT) so `raw * 1e9` cannot overflow at any edge count
    * that fits an executor fleet — the ts_acf automatic-width
    * discipline; only the quotient (≤ 1e9 by construction) returns to
    * BIGINT. Nodes with no in-edges (resp. out-edges) hold score 0.
    *
    * Shape at scale: TWO pinned edge layouts — `e` partitioned on src
    * (hub attach) and on dst (auth attach), each checkpointed once — so
    * the dominant bytes (the edge set) never re-shuffle; per round only
    * the two node-sized score vectors move, plus two one-row total
    * aggregates that broadcast back (no driver collect). Lineage is
    * truncated every other round ([[pageRankNano]]'s cadence).
    */
  def hitsNano(edges: DataFrame, iterations: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val eSrc = edges.select(col("src"), col("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .repartition(col("src")).localCheckpoint(true)
    val eDst = eSrc.repartition(col("dst")).localCheckpoint(true)
    val nodes = eSrc.select(col("src").as("id"))
      .unionByName(eSrc.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    def renorm(raw: DataFrame, rawCol: String, outCol: String): DataFrame = {
      val tot = raw.agg(
        sum(col(rawCol).cast(DecimalType(38, 0))).as("__tot"))
      nodes.join(raw, Seq("id"), "left").crossJoin(broadcast(tot))
        .select(col("id"),
          coalesce(
            expr(s"CAST($rawCol AS DECIMAL(38,0)) * 1000000000 DIV __tot"),
            lit(0L)).as(outCol))
    }
    var hub = nodes.select(col("id"), lit(1000000000L).as("h_nano"))
    var auth = nodes.select(col("id"), lit(0L).as("a_nano"))
    for (it <- 1 to iterations) {
      val araw = eSrc
        .join(hub.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id")).agg(sum(col("h_nano")).as("a_raw"))
      auth = renorm(araw, "a_raw", "a_nano")
      val hraw = eDst
        .join(auth.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id")).agg(sum(col("a_nano")).as("h_raw"))
      hub = renorm(hraw, "h_raw", "h_nano")
      if (it % 2 == 0 && it < iterations) {
        auth = auth.localCheckpoint(true)
        hub = hub.localCheckpoint(true)
      }
    }
    auth.join(hub, Seq("id"))
      .select(col("id"), col("a_nano").as("auth_nano"),
        col("h_nano").as("hub_nano"))
  }
}
