package graft.ops

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable streaming sketches — the "sketch as data" tier a 100 TB
  * pipeline needs: each is a typed [[Aggregator]], so Spark runs it as a
  * partial+final aggregate (map-side fold, only the fixed-size sketch
  * crosses the shuffle), and the same merge makes sketches storable —
  * aggregate per day/partition, keep the sketch column, merge later
  * without re-reading the data (same model as [[MinHashMerge]]).
  *
  * Both sketches are DETERMINISTIC — registers/counters are order- and
  * partitioning-independent (max / sum of exact integers), and the
  * HLL estimate is computed from exact integer state with a fixed
  * operation order — so their outputs survive the strict DuckDB oracle
  * (bit-equal replay in SQL; see `SparkEntry.oracleSql`). This is the
  * reason these are hand-built rather than `approx_count_distinct` /
  * `count_min_sketch`: Spark's built-ins use engine-private hashing
  * (xxhash64 variants) that no second engine can replay, and their
  * binary sketch formats are not stable public contracts. Reference
  * behavior twin: the reference profiles corpora with exact
  * `COUNT(DISTINCT …)` / `GROUP BY` counts (calculate_metrics.py); these
  * sketches answer the same questions with bounded state at corpus scale.
  *
  * Inputs are pre-hashed 60-bit [[graft.functions.StableHash]] values so
  * the hash cost is paid once in codegen'd expression space (and the
  * oracle replays `md5` directly); null hashes (null inputs) are skipped,
  * matching `COUNT(DISTINCT col)` null semantics.
  */
object Sketches {

  /** HyperLogLog distinct-count estimate over a hash column (use
    * `StableHash.hash60(...)`). `p` register-index bits → `2^p` byte
    * registers; standard-error ≈ 1.04/sqrt(2^p) (p=12 → ~1.6%).
    */
  def hllDistinct(p: Int)(hash: Column): Column =
    udaf(new HllAgg(p)).apply(hash)

  /** Count-min sketch of value frequencies over a hash column reduced to
    * `[0, MinhashP)` (use `pmod(StableHash.hash60(c), MinhashP)`). Returns
    * the flat `depth × width` counter array; point-estimate with
    * [[cmsEstimate]]. Overestimates only, by ≤ 2N/width w.p. 1-(1/2)^depth.
    */
  def cmsSketch(depth: Int, width: Int)(hash: Column): Column =
    udaf(new CmsAgg(depth, width)).apply(hash)

  /** KMV (k-minimum-values, Bar-Yossef et al. 2002) distinct sketch over
    * a hash column: the k smallest DISTINCT 60-bit hash values per
    * group, as a sorted array. Unlike HLL this sketch is EXACTLY
    * deterministic — the kept set is a pure function of the data, so the
    * whole sketch (not just the estimate) replays in SQL — while staying
    * k-bounded and mergeable (union-then-retake-k, associative and
    * idempotent, so re-aggregation across shards is safe).
    * Estimate downstream: exact |kept| while |kept| < k, else
    * (k-1)·2^60 / kth_min.
    */
  def kmvMins(k: Int)(hash: Column): Column =
    udaf(new KmvAgg(k)).apply(hash)

  /** KMV insert: sorted ascending ≤ k distinct values; binary search +
    * bounded arraycopy, duplicates dropped, largest evicted once full.
    * Shared by [[KmvAgg]] and the streaming tracker
    * ([[graft.streaming.KmvProcessor]]).
    */
  def kmvInsert(buf: Array[Long], v: Long, k: Int): Array[Long] = {
    val n = buf.length
    var i = java.util.Arrays.binarySearch(buf, v)
    if (i >= 0) buf // already kept
    else {
      i = -(i + 1) // insertion point
      if (n < k) {
        val out = new Array[Long](n + 1)
        System.arraycopy(buf, 0, out, 0, i)
        out(i) = v
        System.arraycopy(buf, i, out, i + 1, n - i)
        out
      } else if (i < k) {
        System.arraycopy(buf, i, buf, i + 1, k - i - 1)
        buf(i) = v
        buf
      } else buf // v larger than all kept values
    }
  }

  /** KMV estimate from a kept set: exact below k, (k-1)·2^60 / kth_min
    * at capacity (BigInt intermediate — 63·2^60 overflows a Long).
    */
  def kmvEstimate(mins: Array[Long], k: Int): Long =
    if (mins.length < k) mins.length.toLong
    else if (mins.last == 0L) 0L
    else ((BigInt(k - 1) * (BigInt(1) << 60)) / mins.last).toLong

  /** Row-`i` cell index for base hash `h`: the same affine reseeding
    * family as MinHash (one md5, `depth` cheap mixes — Dedup.minhashCoeffs).
    */
  def cmsCell(i: Int, width: Int, h: Long): Int = {
    val (a, b) = Dedup.minhashCoeffs(i)
    (((a * h + b) % Dedup.MinhashP) % width).toInt
  }

  /** Point frequency estimate: min over rows of the addressed counter. */
  def cmsEstimate(counters: Seq[Long], depth: Int, width: Int, h: Long): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = counters(i * width + cmsCell(i, width, h))
      if (c < best) best = c
      i += 1
    }
    best
  }

  /** KMV set algebra (public method: Beyer et al. 2007, "On synopses for
    * distinct-value estimation under multiset operations"): pairwise
    * union / intersection / Jaccard estimates computed FROM THE SKETCHES
    * ALONE. Input is a frame of `(keyCol, minsCol)` rows as produced by
    * `groupBy(key).agg(kmvMins(k))`; output is one row per unordered key
    * pair (`key_a < key_b`) with
    *
    *  - `n_kept_union` / `kth_min` — the MERGED sketch (k smallest of the
    *    two kept sets; KMV mergeability makes this the sketch the union
    *    of the underlying sets would have produced),
    *  - `est_union` — exact below k, else `(k-1)·2^60 DIV kth_min`,
    *  - `n_common` — |A_kept ∩ B_kept ∩ union_k| (the Beyer K∩ statistic),
    *  - `est_intersection` — `K∩ · est_union DIV |union_k|` (when the
    *    union sketch is unsaturated both factors are exact, so the
    *    integer division reduces to the exact intersection count),
    *  - `jaccard_ppm` — `K∩ · 10^6 DIV |union_k|` (exact-integer ratio;
    *    ppm keeps the strict oracle float-free),
    *  - `est_difference` — `est_union − est_intersection`, the symmetric-
    *    difference estimate (how much content the two shards DON'T share),
    *    in the same integer rail.
    *
    * Keys whose sketch is EMPTY (all-null input groups) are filtered out
    * at entry: an empty kept set has no kth_min and a 0-size union
    * denominator, so every estimator would be NULL — rows that say
    * nothing and would fail a strict oracle. (The per-key sketch build
    * already skips null hashes, so an empty sketch means the key had no
    * usable values at all.)
    *
    * Everything stays in DECIMAL(38,0)/integer arithmetic, so the whole
    * frame replays bit-exactly in SQL. At 100 TB this is the cross-shard
    * overlap probe run BEFORE paying for a dedup pass: per-shard sketches
    * are k longs each, the pair frame is |keys|² rows of constants, and
    * the underlying sets are never joined. The pair join is a broadcast
    * nested loop over the tiny sketch frame by construction.
    */
  def kmvSetOps(sketches: org.apache.spark.sql.DataFrame, keyCol: String,
      minsCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(k >= 2, s"k must be >= 2, got $k")
    val nonEmpty = sketches.where(size(col(minsCol)) > 0)
    val a = nonEmpty.select(col(keyCol).as("key_a"), col(minsCol).as("__ma"))
    val b = nonEmpty.select(col(keyCol).as("key_b"), col(minsCol).as("__mb"))
    a.join(b, col("key_a") < col("key_b"))
      .withColumn("__uk",
        slice(array_sort(array_union(col("__ma"), col("__mb"))), 1, k))
      .withColumn("n_kept_union", size(col("__uk")).cast("long"))
      .withColumn("kth_min", element_at(col("__uk"), -1))
      .withColumn("n_common", size(expr(
        "filter(__uk, x -> array_contains(__ma, x)" +
          " AND array_contains(__mb, x))")).cast("long"))
      .withColumn("est_union",
        when(col("n_kept_union") < k, col("n_kept_union"))
          .otherwise(expr(s"CAST(${k - 1} AS DECIMAL(38,0)) * " +
            "1152921504606846976 DIV NULLIF(kth_min, 0)"))
          .cast("long"))
      .withColumn("est_intersection", expr(
        "CAST(n_common AS DECIMAL(38,0)) * est_union" +
          " DIV NULLIF(n_kept_union, 0)").cast("long"))
      .withColumn("jaccard_ppm",
        expr("n_common * 1000000 DIV NULLIF(n_kept_union, 0)"))
      .withColumn("est_difference", col("est_union") - col("est_intersection"))
      .drop("__ma", "__mb", "__uk")
  }

  /** HLL estimate from registers, in EXACT arithmetic up to the final
    * (correctly-rounded, hence deterministic) double ops:
    * Σ 2^-M_j is accumulated as the integer Σ 2^(61-M_j) (BigInt — ranks
    * are ≤ 61 so every term is exact), the α·m²/Σ ratio is two exact
    * BigInt→double casts, one divide, one multiply, and the small-range
    * branch is `m·ln(m/V)` (ln == DuckDB's ln — both are correctly-rounded
    * `Math.log` on this platform; `StrictMath.log` is NOT, which is why
    * this never uses Spark's builtin `log`). Final rounding is
    * `floor(x+0.5)` — `Math.round` — replayed verbatim in the oracle.
    * Large-range correction is intentionally omitted: with 60-bit hashes
    * collisions are negligible below ~2^30 distinct values.
    */
  def hllEstimate(regs: Array[Byte], m: Int): Long = {
    var zeros = 0
    var s = BigInt(0)
    var i = 0
    while (i < m) {
      val r = regs(i) & 0xff
      if (r == 0) zeros += 1
      s += BigInt(1) << (61 - r)
      i += 1
    }
    val num = (BigInt(m) * m) << 61
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * (num.toDouble / s.toDouble)
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    Math.round(est)
  }
}

/** HyperLogLog (Flajolet et al. 2007) over 60-bit stable hashes: register
  * index = top `p` hash bits, rank = leading zeros of the remaining
  * `60-p` bits + 1, registers merge by elementwise max (associative,
  * commutative, idempotent — re-aggregation-safe).
  */
class HllAgg(p: Int)
    extends Aggregator[java.lang.Long, Array[Byte], Long] {
  require(p >= 7 && p <= 16, "p must be in [7,16] (single-alpha regime)")
  private val m = 1 << p
  private val w = 60 - p
  private val mask = (1L << w) - 1L

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(buf: Array[Byte], h: java.lang.Long): Array[Byte] = {
    if (h != null) {
      val v = h.longValue
      val b = (v >>> w).toInt
      val rest = v & mask
      val r =
        if (rest == 0L) w + 1
        else w - (63 - java.lang.Long.numberOfLeadingZeros(rest))
      if (r > buf(b)) buf(b) = r.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(regs: Array[Byte]): Long = Sketches.hllEstimate(regs, m)

  override def bufferEncoder: Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
  override def outputEncoder: Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}

/** Count-min sketch (Cormode & Muthukrishnan 2005): `depth` rows of
  * `width` exact Long counters; each input increments one cell per row
  * (affine-reseeded addressing). Counters merge by elementwise sum.
  */
class CmsAgg(depth: Int, width: Int)
    extends Aggregator[java.lang.Long, Array[Long], Seq[Long]] {
  require(depth >= 1 && width >= 2)
  private val size = depth * width

  override def zero: Array[Long] = new Array[Long](size)

  override def reduce(buf: Array[Long], h: java.lang.Long): Array[Long] = {
    if (h != null) {
      val v = h.longValue
      var i = 0
      while (i < depth) {
        buf(i * width + Sketches.cmsCell(i, width, v)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < size) {
      a(i) += b(i)
      i += 1
    }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** KMV buffer = sorted ascending array of ≤ k distinct hash values.
  * Insert is a binary search + bounded arraycopy (duplicates dropped,
  * largest evicted once full), merge folds the smaller buffer into the
  * larger — both O(k), so a partial buffer never exceeds k longs no
  * matter how many rows a partition folds.
  */
class KmvAgg(k: Int)
    extends Aggregator[java.lang.Long, Array[Long], Seq[Long]] {
  require(k >= 1, "k must be >= 1")

  override def zero: Array[Long] = Array.empty[Long]

  override def reduce(buf: Array[Long], h: java.lang.Long): Array[Long] =
    if (h == null) buf else Sketches.kmvInsert(buf, h.longValue, k)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var out = big
    var i = 0
    while (i < small.length) {
      out = Sketches.kmvInsert(out, small(i), k)
      i += 1
    }
    out
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
