package graft

import org.apache.spark.sql.functions._
import graft.functions.StableHash
import graft.ops.{Dedup, Sketches}

/** HyperLogLog / count-min sketch semantics: accuracy bounds, merge
  * (= partition-independence), null handling, and estimate determinism.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def hashed(n: Int, parts: Int) =
    spark.range(0, n, 1, parts)
      .select(StableHash.hash60(col("id").cast("string")).as("h"))

  test("hll estimate is within 5 sigma of exact across scales") {
    for (n <- Seq(10, 100, 1000, 20000)) {
      val est = hashed(n, 8).agg(Sketches.hllDistinct(12)(col("h")))
        .head.getLong(0)
      val sigma = 1.04 / math.sqrt(1 << 12) * n
      assert(math.abs(est - n) <= math.max(5 * sigma, 1.0),
        s"n=$n est=$est")
    }
  }

  test("hll is partitioning-independent and null-skipping") {
    val a = hashed(5000, 1).agg(Sketches.hllDistinct(12)(col("h"))).head.getLong(0)
    val b = hashed(5000, 32).agg(Sketches.hllDistinct(12)(col("h"))).head.getLong(0)
    assert(a == b)
    val withNulls = hashed(5000, 8)
      .union(spark.range(7).select(lit(null).cast("long").as("h")))
    assert(withNulls.agg(Sketches.hllDistinct(12)(col("h"))).head.getLong(0) == a)
  }

  test("hll duplicates do not move the estimate") {
    val once = hashed(3000, 4)
    val thrice = once.union(once).union(once)
    assert(once.agg(Sketches.hllDistinct(12)(col("h"))).head.getLong(0) ==
      thrice.agg(Sketches.hllDistinct(12)(col("h"))).head.getLong(0))
  }

  test("hllEstimate small-range branch: empty and tiny registers") {
    assert(Sketches.hllEstimate(new Array[Byte](4096), 4096) == 0L)
    // one register set -> estimate ~1
    val regs = new Array[Byte](4096)
    regs(17) = 3
    val e = Sketches.hllEstimate(regs, 4096)
    assert(e >= 1L && e <= 2L, s"e=$e")
  }

  private def cmsOf(words: Seq[String], parts: Int = 4): Seq[Long] =
    words.toDF("w").repartition(parts)
      .select(pmod(StableHash.hash60(col("w")), lit(Dedup.MinhashP)).as("h"))
      .agg(Sketches.cmsSketch(3, 512)(col("h")))
      .head.getSeq[Long](0)

  private def baseHash(w: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(w.getBytes("UTF-8"))
    val top = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    (top >>> 4) % Dedup.MinhashP
  }

  test("cms never underestimates and is exact without collisions") {
    val words = Seq.fill(10)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val sk = cmsOf(words)
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for ((w, c) <- exact) {
      val est = Sketches.cmsEstimate(sk, 3, 512, baseHash(w))
      assert(est >= c, s"$w underestimated: $est < $c")
      assert(est <= c + words.size, s"$w absurd: $est")
    }
    // 3 distinct words in 3*512 cells: no collision, estimates exact
    assert(Sketches.cmsEstimate(sk, 3, 512, baseHash("alpha")) == 10L)
    assert(Sketches.cmsEstimate(sk, 3, 512, baseHash("beta")) == 3L)
    assert(Sketches.cmsEstimate(sk, 3, 512, baseHash("gamma")) == 1L)
  }

  test("cms merges across partitions to the single-partition sketch") {
    val words = (0 until 500).map(i => s"w${i % 37}")
    assert(cmsOf(words, 1) == cmsOf(words, 16))
  }

  test("cms total count is conserved per row") {
    val words = (0 until 200).map(i => s"t$i")
    val sk = cmsOf(words)
    for (row <- 0 until 3)
      assert(sk.slice(row * 512, (row + 1) * 512).sum == 200L)
  }

  test("kmv keeps the k smallest distinct hashes; partitioning- and dup-independent") {
    import graft.ops.Sketches
    import org.apache.spark.sql.functions._
    // raw longs straight into the sketch: hashes 1..100 plus every value
    // duplicated — kept set must be exactly 1..8 regardless of layout
    val vals = ((1L to 100L) ++ (1L to 100L)).toDF("h")
    def mins(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(Sketches.kmvMins(8)(col("h")).as("m"))
        .collect().head.getSeq[Long](0)
    assert(mins(vals) == (1L to 8L))
    assert(mins(vals.repartition(13)) == (1L to 8L)) // merge path
    // below-k group keeps everything (exact regime), sorted ascending
    assert(mins(Seq(5L, 3L, 9L, 3L).toDF("h")) == Seq(3L, 5L, 9L))
    // nulls are skipped, not kept
    assert(mins(Seq[java.lang.Long](4L, null, 2L).toDF("h")) == Seq(2L, 4L))
  }

  private def setOpsOf(aVals: Seq[Long], bVals: Seq[Long], k: Int) = {
    import org.apache.spark.sql.functions._
    val df = (aVals.map(("a", _)) ++ bVals.map(("b", _))).toDF("key", "h")
    val sk = df.groupBy("key").agg(Sketches.kmvMins(k)(col("h")).as("mins"))
    Sketches.kmvSetOps(sk, "key", "mins", k).collect().head
  }

  test("kmvSetOps unsaturated regime is EXACT (union, intersection, jaccard)") {
    // |A u B| = 15 < k=64: union sketch holds everything, estimators
    // collapse to exact set arithmetic
    val a = (1L to 10L)
    val b = (6L to 15L)
    val r = setOpsOf(a, b, 64)
    assert(r.getAs[Long]("n_kept_union") == 15L)
    assert(r.getAs[Long]("est_union") == 15L)
    assert(r.getAs[Long]("n_common") == 5L)
    assert(r.getAs[Long]("est_intersection") == 5L)
    assert(r.getAs[Long]("jaccard_ppm") == 5L * 1000000 / 15)
    // symmetric difference = union - intersection, exact here
    assert(r.getAs[Long]("est_difference") == 10L)
  }

  test("kmvSetOps filters empty-sketch keys at entry (all-null input groups)") {
    import org.apache.spark.sql.functions._
    // key z sees only null hashes -> empty kept set -> no estimator can
    // be computed; the key must not produce NULL-filled pair rows
    val df = Seq(("x", java.lang.Long.valueOf(1L)),
      ("y", java.lang.Long.valueOf(2L)), ("z", null.asInstanceOf[java.lang.Long]))
      .toDF("key", "h")
    val sk = df.groupBy("key").agg(Sketches.kmvMins(4)(col("h")).as("mins"))
    assert(sk.count() == 3) // the sketch frame still carries z (empty)
    val pairs = Sketches.kmvSetOps(sk, "key", "mins", 4)
      .select("key_a", "key_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("x", "y")))
  }

  test("kmvSetOps saturated regime: union sketch = sketch of the union (mergeability)") {
    import org.apache.spark.sql.functions._
    // real hash60 values (uniform over [0, 2^60) — the estimator's
    // uniformity assumption; smaller-range shortcuts bias est_union by
    // the range ratio)
    def h60(w: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(w.getBytes("UTF-8"))
      val top = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      top >>> 4
    }
    def hs(tag: String, n: Int): Seq[Long] =
      (1 to n).map(i => h60(s"$tag$i"))
    val a = hs("a", 500)
    val b = hs("b", 500) ++ a.take(100) // planted overlap
    val k = 64
    val r = setOpsOf(a, b, k)
    // the merged kept set must equal kmvMins over the concatenated data
    val direct = (a ++ b).toDF("h")
      .agg(Sketches.kmvMins(k)(col("h")).as("m")).collect()
      .head.getSeq[Long](0)
    assert(r.getAs[Long]("n_kept_union") == k)
    assert(r.getAs[Long]("kth_min") == direct.last)
    // Beyer estimators: within 50% of truth at k=64 (loose determinism-
    // plus-sanity bound; the strict value is pinned by the corpus oracle)
    val exactU = (a ++ b).distinct.size
    val exactI = a.toSet.intersect(b.toSet).size
    val eu = r.getAs[Long]("est_union")
    val ei = r.getAs[Long]("est_intersection")
    assert(math.abs(eu - exactU) <= exactU / 2, s"est_union=$eu exact=$exactU")
    assert(math.abs(ei - exactI) <= exactI, s"est_intersection=$ei exact=$exactI")
    // jaccard_ppm is the integer ratio of the two sketch statistics
    assert(r.getAs[Long]("jaccard_ppm") ==
      r.getAs[Long]("n_common") * 1000000 / k)
  }

  test("kmvSetOps randomized (seeded): unsaturated pairs are exact, merged " +
    "sketch always equals the sketch of the concatenated data") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42L)
    for (trial <- 1 to 3) {
      val na = 20 + rnd.nextInt(120)
      val nb = 20 + rnd.nextInt(120)
      val overlap = rnd.nextInt(20)
      val a = Seq.fill(na)(rnd.nextLong() >>> 4).distinct
      val b = (Seq.fill(nb)(rnd.nextLong() >>> 4) ++ a.take(overlap)).distinct
      // k above the union size -> every statistic is exact set arithmetic
      val kBig = a.size + b.size + 1
      val r1 = setOpsOf(a, b, kBig)
      val u = (a ++ b).distinct.size.toLong
      val i = a.toSet.intersect(b.toSet).size.toLong
      assert(r1.getAs[Long]("est_union") == u, s"trial $trial")
      assert(r1.getAs[Long]("est_intersection") == i, s"trial $trial")
      assert(r1.getAs[Long]("jaccard_ppm") == i * 1000000 / u, s"trial $trial")
      // k below the union size -> the merged kept set must equal the
      // sketch of the concatenated data (KMV mergeability), any k
      val kSmall = 2 + rnd.nextInt(math.max(2, u.toInt - 2))
      val r2 = setOpsOf(a, b, kSmall)
      val direct = (a ++ b).toDF("h")
        .agg(Sketches.kmvMins(kSmall)(col("h")).as("m")).collect()
        .head.getSeq[Long](0)
      assert(r2.getAs[Long]("n_kept_union") == direct.size.toLong,
        s"trial $trial k=$kSmall")
      assert(r2.getAs[Long]("kth_min") == direct.last, s"trial $trial")
    }
  }

  test("kmvSetOps emits one row per unordered pair, smaller key first") {
    import org.apache.spark.sql.functions._
    val df = Seq(("x", 1L), ("y", 2L), ("z", 3L)).toDF("key", "h")
    val sk = df.groupBy("key").agg(Sketches.kmvMins(4)(col("h")).as("mins"))
    val rows = Sketches.kmvSetOps(sk, "key", "mins", 4)
      .select("key_a", "key_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("x", "y"), ("x", "z"), ("y", "z")))
  }
}
