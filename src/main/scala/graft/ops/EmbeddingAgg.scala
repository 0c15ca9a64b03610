package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding aggregation: per-group mean vectors (class centroids, topic
  * prototypes, user profiles) and nearest-centroid assignment.
  *
  * The centroid compute is relational — `posexplode` to (group, dim,
  * value), one partial+final hash aggregate per (group, dim), regroup to a
  * position-sorted array — so it scales like any group-by: no per-group
  * vector buffers, no driver collection, dims stream through the shuffle
  * as scalar rows. Per-dimension means are exact integer-NANO sums
  * divided once (`covarianceUpper`'s discipline — the proven cross-engine
  * rounding), making the result independent of partitioning and
  * replayable by the oracle. A DECIMAL(38,12) sum is NOT tie-safe across
  * engines: a float like 2^-13 expands to exactly 13 decimal digits
  * ending in 5, and Spark's double->decimal cast rounds HALF_UP where
  * DuckDB's rounds half-even — a 1e-12 sum divergence an sf0.1 oracle
  * sweep caught on real data.
  */
object EmbeddingAgg {

  /** One row per group: `centroid` = element-wise mean of the group's
    * vectors (null elements skipped per-dimension, like the oracle's
    * SUM/COUNT over non-nulls; null/empty vectors contribute nothing).
    */
  def groupCentroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)))
      .groupBy(col(groupCol), col("pos"))
      .agg((sum(round(col("col").cast("double") * 1e9).cast("long"))
        .cast("double") / count(col("col")) / 1e9).as("m"))
      .where(col("m").isNotNull)
      .groupBy(col(groupCol))
      .agg(transform(
        sort_array(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))

  /** Each vector labeled with its nearest centroid (min L2; ties to the
    * smallest centroid key; degenerate vectors -> null distance to every
    * centroid, deterministically assigned the smallest key). Centroids
    * broadcast — the corpus is touched map-side only, plus the bounded
    * per-id top-1 aggregate.
    */
  /** Upper-triangle covariance entries (i <= j) of the embedding
    * distribution — the input to PCA whitening / dimensionality cuts.
    *
    * Exactness: per-row products are rounded to integer nanos
    * (`ROUND(x*1e9)` — the proven cross-engine rounding), summed as
    * longs (order-free), and descaled once, so every entry replays
    * bit-for-bit in the oracle regardless of partitioning. Only full
    * `dim`-length vectors with no null elements participate (the
    * contract the oracle mirrors).
    *
    * Scale shape: the upper-triangle explode is dim(dim+1)/2 scalar rows
    * per vector, hash-aggregated on (i, j) with map-side partial combine
    * — wire rows are partitions x dim^2/2, independent of corpus size;
    * nothing collects until the (dim^2/2)-row result.
    */
  def covarianceUpper(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val raw = col(vecCol)
    val clean = df.where(raw.isNotNull && size(raw) === dim &&
        !exists(raw, x => x.isNull))
      .select(graft.functions.Vectors.asDouble(raw).as("v"))
    val n = clean.agg(count(lit(1)).as("n"))
    def nano(c: org.apache.spark.sql.Column) = round(c * 1e9).cast("long")
    val pairs = clean.select(explode(flatten(transform(
        sequence(lit(0), lit(dim - 1)), i =>
          transform(sequence(i, lit(dim - 1)), j =>
            struct(i.as("i"), j.as("j"),
              nano(element_at(col("v"), i + 1) *
                element_at(col("v"), j + 1)).as("p")))))).as("e"))
      .select(col("e.i").cast("long").as("i"),
        col("e.j").cast("long").as("j"), col("e.p").as("p"))
    val sums = pairs.groupBy("i", "j").agg(sum(col("p")).as("s"))
    val mom = clean.select(posexplode(col("v")))
      .groupBy(col("pos").cast("long").as("i"))
      .agg(sum(nano(col("col"))).as("sm"))
    sums
      .join(mom.select(col("i"), col("sm").as("si")), Seq("i"))
      .join(mom.select(col("i").as("j"), col("sm").as("sj")), Seq("j"))
      .crossJoin(broadcast(n))
      .select(col("i"), col("j"),
        (col("s").cast("double") / 1e9 / col("n")
          - (col("si").cast("double") / 1e9 / col("n"))
            * (col("sj").cast("double") / 1e9 / col("n"))).as("cov"))
  }

  /** First principal component by power iteration over a
    * [[covarianceUpper]] result: the (dim^2/2)-row entry set collects to
    * the driver (tiny — the corpus never does), iterates
    * v <- normalize(C v) from the uniform start, and sign-fixes so the
    * first non-zero coordinate is positive (deterministic orientation).
    */
  def pc1(cov: DataFrame, dim: Int, iters: Int = 30): Array[Double] =
    powerIterate(loadSymmetric(cov, dim), dim, iters)

  /** Top-k principal components by power iteration + Hotelling deflation:
    * after each component, C <- C - λ v vᵀ with λ the Rayleigh quotient
    * vᵀ(Cv), both computed with the same ascending-index left folds the
    * recursive-CTE oracle replays (every double lands bit-identical).
    * Returns (component, eigenvalue) pairs, dominant first. Deflation is
    * driver-side dim×dim arithmetic — the corpus only ever feeds the one
    * distributed covariance pass.
    */
  def pcTop(cov: DataFrame, dim: Int, k: Int,
      iters: Int = 30): Seq[(Array[Double], Double)] = {
    var m = loadSymmetric(cov, dim)
    (0 until k).map { _ =>
      val v = powerIterate(m, dim, iters)
      val mv = Array.tabulate(dim) { i =>
        var s = 0.0
        var j = 0
        while (j < dim) { s += m(i)(j) * v(j); j += 1 }
        s
      }
      var lam = 0.0
      var i = 0
      while (i < dim) { lam += v(i) * mv(i); i += 1 }
      m = Array.tabulate(dim, dim)((i, j) => m(i)(j) - lam * (v(i) * v(j)))
      (v, lam)
    }
  }

  private def loadSymmetric(cov: DataFrame, dim: Int): Array[Array[Double]] = {
    val m = Array.ofDim[Double](dim, dim)
    cov.select(col("i").cast("int"), col("j").cast("int"), col("cov"))
      .collect().foreach { r =>
        val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
        m(i)(j) = c
        m(j)(i) = c
      }
    m
  }

  private def powerIterate(m: Array[Array[Double]], dim: Int,
      iters: Int): Array[Double] = {
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 0 until iters) {
      val nv = Array.tabulate(dim) { i =>
        var s = 0.0
        var j = 0
        while (j < dim) { s += m(i)(j) * v(j); j += 1 }
        s
      }
      val norm = math.sqrt(nv.map(x => x * x).sum)
      if (norm > 0) v = nv.map(_ / norm)
    }
    val lead = v.indexWhere(_ != 0.0)
    if (lead >= 0 && v(lead) < 0) v.map(-_) else v
  }

  /** Per-group centroid-distance outliers (embedding-space data
    * cleaning: a vector far from its own group's prototype is mislabeled
    * or anomalous — the standard filter before using labels as training
    * signal). `dist` is L2 to the group's [[groupCentroids]] mean; the
    * cutoff is the exact R-7 `q`-quantile of the non-null distances (one
    * scalar aggregate broadcast back — no global sort or ntile).
    * Degenerate vectors (null / ragged against the centroid) get a null
    * dist and a null verdict; rows whose group has no centroid (all
    * degenerate, or null group key) drop out via the inner join — both
    * engines agree on all three routes. Centroids are one row per group
    * and broadcast; the corpus streams through map-side.
    */
  def centroidOutliers(df: DataFrame, idCol: String, vecCol: String,
      groupCol: String, q: Double = 0.95): DataFrame = {
    val cents = groupCentroids(df, groupCol, vecCol)
    val dists = df.join(broadcast(cents), Seq(groupCol))
      .select(col(idCol), col(groupCol),
        sqrt(graft.functions.Vectors.l2sq(col(vecCol), col("centroid")))
          .as("dist"))
    val cut = dists.agg(expr(s"percentile(dist, $q)").as("cutoff"))
    dists.crossJoin(broadcast(cut))
      .select(col(idCol), col(groupCol), col("dist"),
        (col("dist") > col("cutoff")).as("is_outlier"))
  }

  def assignNearest(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centKeyCol: String,
      centVecCol: String): DataFrame = {
    val scored = df.select(col(idCol), col(vecCol).as("__v"))
      .crossJoin(broadcast(centroids.select(
        col(centKeyCol).cast("long").as("__ck"), col(centVecCol).as("__cv"))))
      .withColumn("negdist",
        -sqrt(graft.functions.Vectors.l2sq(col("__v"), col("__cv"))))
    TopK.perGroupTopK(scored, Seq(idCol), "__ck", "negdist", 1)
      .select(col(idCol), col("__ck").as("nearest"),
        (-col("negdist")).as("dist"))
  }
}
