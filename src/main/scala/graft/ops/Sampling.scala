package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.StableHash

/** Deterministic sampling: every decision is a pure function of a stable
  * content-independent hash of the row's id, never an RNG. That buys the
  * three properties corpus-scale sampling needs: reproducible across runs,
  * engines and partitionings (an oracle can replay it); consistent across
  * tables (the same id samples in or out everywhere, so joins of samples
  * are samples of joins); and embarrassingly parallel (a map-side filter —
  * no coordination, unlike `df.sample`, whose per-partition RNG changes
  * with the split layout).
  */
object Sampling {

  private val Buckets = 1000000L

  private def bucket(idCol: String, seed: Int) =
    pmod(StableHash.hash60(col(idCol), seed), lit(Buckets))

  /** Keep ~`fraction` of rows, decided by id hash (map-side filter). */
  def bernoulli(df: DataFrame, idCol: String, fraction: Double,
      seed: Int = 0): DataFrame =
    df.where(bucket(idCol, seed) < (fraction * Buckets).toLong)

  /** Per-stratum rates: rows in strata missing from `fractions` keep
    * `default`. The rate table is tiny and broadcast; the decision is
    * still one map-side comparison per row.
    */
  def stratified(df: DataFrame, stratumCol: String,
      fractions: Map[String, Double], idCol: String,
      default: Double = 0.0, seed: Int = 0): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val rates = fractions.toSeq.toDF(stratumCol, "__frac")
    df.join(broadcast(rates), Seq(stratumCol), "left")
      .where(bucket(idCol, seed) <
        (coalesce(col("__frac"), lit(default)) * Buckets).cast("long"))
      .drop("__frac")
  }

  /** Exactly-k uniform sample: the k smallest id hashes. Distributed as a
    * bounded top-k (TakeOrderedAndProject — each partition keeps k rows,
    * never a global sort), and still deterministic: ties in the 60-bit
    * hash are broken by the id itself.
    */
  def uniformK(df: DataFrame, idCol: String, k: Int, seed: Int = 0): DataFrame =
    df.withColumn("__h", StableHash.hash60(col(idCol), seed))
      .orderBy(col("__h"), col(idCol))
      .limit(k)
      .drop("__h")

  /** Exactly-k uniform sample PER GROUP (class-balanced subsampling —
    * the per-language / per-source balancing step of corpus assembly):
    * within each group, the k smallest id hashes win. Deterministic,
    * layout-independent, and bounded — the k-slot [[TopK.TopKAgg]]
    * buffer replaces any per-group sort, so only partitions x groups x k
    * rows cross the shuffle. Returns (groupCol, idCol, rank), rank 1..k
    * in hash order.
    */
  def groupK(df: DataFrame, groupCol: String, idCol: String, k: Int,
      seed: Int = 0): DataFrame =
    TopK.perGroupTopK(
      df.select(col(groupCol), col(idCol),
        // negated hash: the aggregate keeps the HIGHEST scores, we want
        // the smallest. The 60-bit hash is folded mod 2^53 so the double
        // score channel stays EXACT (a raw hash60 would round above
        // 2^53 and tie-break differently than the oracle's BIGINT sort);
        // ids break residual collisions identically on both engines.
        (-(StableHash.hash60(col(idCol), seed) % lit(9007199254740992L))
          .cast("double")).as("__nh")),
      Seq(groupCol), idCol, "__nh", k)
      .select(col(groupCol), col(idCol), col("rank"))

  /** Class rebalancing: downsample every class to the size of the
    * SMALLEST class — the "equalize label distribution" step before
    * training on skewed data. Within each class the keep-set is the
    * [[groupK]] discipline (smallest stable hashes win, id tie-break),
    * but the cut k is DATA-derived (min class size), so it rides in on a
    * broadcast one-row aggregate instead of a compile-time constant.
    * Returns kept rows as `(classCol, idCol, rank, class_size, k_kept)`.
    *
    * Shape at scale: one count aggregate to class cardinality (tiny),
    * its min broadcast back, and one per-class window sort for ranks —
    * classes are label-bounded, the standard per-group-sort shape. With
    * a static k the bounded-buffer [[TopK.perGroupTopK]] variant
    * ([[groupK]]) avoids even that sort.
    */
  def balanceClasses(df: DataFrame, classCol: String, idCol: String,
      seed: Int = 0): DataFrame = {
    val sizes = df.groupBy(classCol).agg(count(lit(1)).as("class_size"))
    val kRow = sizes.agg(min(col("class_size")).as("k_kept"))
    val w = Window.partitionBy(classCol)
      .orderBy((StableHash.hash60(col(idCol), seed) %
        lit(9007199254740992L)).asc, col(idCol).asc)
    df.select(col(classCol), col(idCol))
      .withColumn("rank", row_number().over(w).cast("long"))
      .join(broadcast(sizes), Seq(classCol))
      .crossJoin(broadcast(kRow))
      .where(col("rank") <= col("k_kept"))
  }

  /** Per-group budget quota (the "at most X tokens per source" cap of
    * corpus assembly, the batch twin of the streaming per-source admission
    * cap): within each group, rows are taken in stable-hash order until
    * the cumulative cost reaches `budget` — a row survives iff the running
    * cost INCLUDING it is <= budget. Greedy-in-hash-order makes the kept
    * set a pure function of the data: reproducible across runs, engines
    * and layouts (never an RNG or a physical row order — growing the
    * corpus re-decides only from the new rows' hash positions onward).
    *
    * Adds `cum_cost` (running cost including the row, exact BIGINT — cost
    * sums must never be doubles or the oracle diverges on order).
    *
    * Shape at scale: one shuffle on the group key, then a group-local
    * window sort. Groups are sources/domains — bounded cardinality, each
    * a fraction of the corpus — so the per-group sort is the standard
    * shape. If one group dominates (a single source holding most of
    * 100 TB), the same greedy semantics route through the two-phase
    * bucketed prefix sum of [[Packing.globalOffsets]] applied per group;
    * the window form is the right default for the common fan-out.
    */
  def quotaBudget(df: DataFrame, groupCol: String, idCol: String,
      costCol: String, budget: Long, seed: Int = 0): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__h", StableHash.hash60(col(idCol), seed))
      .withColumn("cum_cost", sum(col(costCol).cast("long")).over(w))
      .where(col("cum_cost") <= budget)
      .drop("__h")
  }

  /** Domain-mixture resampling rates (the data-mixture rebalancing step of
    * corpus assembly — public method family: DoReMi / The Pile-style
    * domain weighting): given target mixture shares t_s per stratum,
    * compute the per-stratum acceptance rate that realizes the target
    * proportions while keeping as much data as possible. The binding
    * stratum is the one with the least data relative to its target:
    * M = min_s(n_s / t_s) is the largest total consistent with the
    * mixture, and rate_s = t_s * M / n_s keeps exactly its share.
    *
    * Rates are surfaced as integer ppm thresholds, floor'd BEFORE any
    * cast (Spark's double->long cast truncates, DuckDB's rounds — an
    * explicit floor is the one portable spelling), so membership below
    * is an exact integer comparison against the stable id-hash bucket.
    *
    * Shape at scale: one count-only aggregate over the corpus, a
    * broadcast-sized rate table out. Strata absent from `targets` (or
    * with zero rows) get no rate row and drop out of the sample.
    */
  def mixtureRates(df: DataFrame, stratumCol: String,
      targets: Map[String, Double]): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val tgt = targets.toSeq.toDF(stratumCol, "__t")
    val joined = df.groupBy(stratumCol).agg(count(lit(1)).as("__n"))
      .join(broadcast(tgt), Seq(stratumCol))
    val m = joined.agg(min(col("__n").cast("double") / col("__t")).as("__m"))
    joined.crossJoin(broadcast(m))
      .select(col(stratumCol), col("__n").as("n_orig"),
        floor(col("__t") * col("__m") / col("__n").cast("double")
          * lit(1000000.0)).as("rate_ppm"))
  }

  /** The resampled rows: map-side membership check of the id-hash bucket
    * against the broadcast [[mixtureRates]] thresholds.
    */
  def mixture(df: DataFrame, stratumCol: String, targets: Map[String, Double],
      idCol: String, seed: Int = 0): DataFrame =
    df.join(broadcast(mixtureRates(df, stratumCol, targets)), Seq(stratumCol))
      .where(bucket(idCol, seed) < col("rate_ppm"))
      .drop("n_orig", "rate_ppm")

  /** Rejection-sample `df` so its distribution over `bucketCol` matches a
    * REFERENCE dataset's distribution (the data-driven twin of
    * [[mixture]]'s explicit target map — the curation step that reshapes
    * a raw corpus to a curated subset's length / domain / language
    * profile before training).
    *
    * Semantics: with source counts n_b and reference counts m_b, the
    * largest achievable matched sample keeps c·m_b rows of bucket b where
    * c = min_b(n_b / m_b) — the binding bucket keeps 100%. Membership is
    * EXACT RATIONAL arithmetic: row accepted iff
    * `hash(id) mod (m* · n_b) < n* · m_b` with (n*, m*) the binding
    * bucket's counts — p_b = (n*·m_b)/(m*·n_b) = c·m_b/n_b with no float
    * rate anywhere, so the kept set replays bit-for-bit in SQL. The
    * binding bucket itself is chosen by one IEEE division n_b/m_b
    * (identical single op on any engine; ties by bucket value). Buckets
    * absent from the reference have target share 0 and drop entirely;
    * buckets absent from the source stay empty (a sampler cannot invent
    * rows), so the match is exact over the shared support.
    *
    * The BIGINT products bound the per-bucket counts at ~3·10^9 each
    * (beyond that, pre-reduce the fraction by its gcd driver-side).
    *
    * Shape at scale: one count aggregate per side (map-side partial),
    * a broadcast-sized per-bucket table, a one-row binding frame, then a
    * map-side filter — the corpus itself never shuffles.
    */
  def matchDistribution(df: DataFrame, ref: DataFrame, bucketCol: String,
      idCol: String, seed: Int = 0): DataFrame = {
    val src = df.groupBy(bucketCol).agg(count(lit(1)).as("__n_src"))
    val tgt = ref.groupBy(bucketCol).agg(count(lit(1)).as("__n_ref"))
    val joined = src.join(tgt, Seq(bucketCol))
    val binding = joined
      .orderBy((col("__n_src").cast("double") / col("__n_ref")).asc,
        col(bucketCol).asc)
      .limit(1)
      .select(col("__n_src").as("__c_num"), col("__n_ref").as("__c_den"))
    df.join(broadcast(joined), Seq(bucketCol))
      .crossJoin(broadcast(binding))
      .where(pmod(StableHash.hash60(col(idCol), seed),
        col("__c_den") * col("__n_src")) < col("__c_num") * col("__n_ref"))
      .drop("__n_src", "__n_ref", "__c_num", "__c_den")
  }

  /** Temperature-reweighted stratum balancing (public method: the
    * α-smoothed multilingual sampling rule of Devlin et al. 2019 (mBERT)
    * and Conneau et al. 2020 (XLM-R), α typically 0.3–0.7): target share
    * of stratum s ∝ n_s^α — flattening the head, boosting the tail.
    * Realized at maximum retention the rate collapses to
    * `rate_s = min_u(n_u^(1-α)) / n_s^(1-α)`: the smallest stratum keeps
    * 100% and a stratum k× larger keeps k^(α-1), with NO cross-stratum
    * share normalization (the Σ n^α cancels) — so at α = 1/2 every step
    * (sqrt, division, min, floor) is an IEEE exactly-rounded op and the
    * ppm thresholds are bit-identical on any engine. Other α go through
    * `pow`, which engines round differently in the last ulp — fine for
    * sampling quality, but only α = 1/2 is oracle-exact by construction.
    */
  def temperatureRates(df: DataFrame, stratumCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("n_orig"))
    val dCol =
      if (alpha == 0.5) sqrt(col("n_orig").cast("double"))
      else pow(col("n_orig").cast("double"), lit(1.0 - alpha))
    val withD = counts.withColumn("__d", dCol)
    val m = withD.agg(min(col("__d")).as("__m"))
    withD.crossJoin(broadcast(m))
      .select(col(stratumCol), col("n_orig"),
        floor(col("__m") / col("__d") * lit(1000000.0)).as("rate_ppm"))
  }

  /** The resampled rows: map-side id-hash membership against the
    * broadcast [[temperatureRates]] thresholds (same consistency property
    * as [[mixture]]: a doc kept at some rate stays kept at every higher
    * rate, so raising α only ever adds rows).
    */
  def temperatureSample(df: DataFrame, stratumCol: String, idCol: String,
      alpha: Double = 0.5, seed: Int = 0): DataFrame =
    df.join(broadcast(temperatureRates(df, stratumCol, alpha)),
        Seq(stratumCol))
      .where(bucket(idCol, seed) < col("rate_ppm"))
      .drop("n_orig", "rate_ppm")

  /** ln(2) as the decimal literal both engines parse to the same double. */
  val LN2: Double = 0.6931471805599453

  /** Portable natural log of a positive long-valued column in [1, 2^60]:
    * ln(n) = p*ln2 + 2*z*(1 + z2*P(z2)), with the EXACT integer exponent
    * p = len(bin(n)) - 1, mantissa m = n / 2^p in [1,2), z = (m-1)/(m+1),
    * and P a fixed-order Horner polynomial of the atanh series. Every step
    * is either exact integer work or an IEEE exactly-rounded double op
    * (+,-,*,/ and long->double cast), so the result is bit-identical on
    * ANY engine evaluating the same expression shape — unlike the
    * engines' native ln, where measured Java Math.log vs DuckDB ln differ
    * in the last ulp on ~0.1% of these inputs. |error| < 1e-8 over the
    * domain (z < 1/3), irrelevant to sampling quality.
    *
    * The column must be named; the caller stages `n` and `p` as named
    * columns (shiftleft's amount is only expressible via expr on a name).
    */
  private[graft] def portableLnStages(df: DataFrame, nCol: String): DataFrame = {
    val withP = df.withColumn("__p",
      (length(bin(col(nCol))) - lit(1)).cast("int"))
    val m = col(nCol).cast("double") /
      expr("cast(shiftleft(cast(1 as bigint), __p) as double)")
    val z = (m - lit(1.0)) / (m + lit(1.0))
    val staged = withP.withColumn("__z", z).withColumn("__z2", col("__z") * col("__z"))
    val z2 = col("__z2")
    val poly = lit(1.0 / 3.0) + z2 * (lit(1.0 / 5.0) + z2 *
      (lit(1.0 / 7.0) + z2 * (lit(1.0 / 9.0) + z2 *
        (lit(1.0 / 11.0) + z2 * lit(1.0 / 13.0)))))
    val s = lit(2.0) * col("__z") * (lit(1.0) + z2 * poly)
    staged.withColumn("__ln", col("__p").cast("double") * lit(LN2) + s)
  }

  /** Weighted sample of exactly k rows WITHOUT replacement
    * (Efraimidis–Spirakis exponential-jumps family, Inf. Process. Lett.
    * 97(5), 2006 — public algorithm): row i draws u_i = (hash60(id)+1)/2^60
    * and competes with key ln(u_i)/w_i; the k LARGEST keys win, which
    * realizes weighted without-replacement inclusion probabilities. Rows
    * with weight <= 0 or null never qualify.
    *
    * Deterministic end-to-end: u from the stable id hash (replayable,
    * partition-independent) and ln from [[portableLnStages]] — so the
    * selection, ranking AND the key values are bit-reproducible across
    * engines, not just statistically equivalent.
    *
    * Shape at scale: key computation is map-side; selection is a bounded
    * top-k (TakeOrderedAndProject — k rows per partition cross the wire,
    * never a global sort); the final rank is a window over k rows only.
    */
  def weightedK(df: DataFrame, idCol: String, weightCol: String, k: Int,
      seed: Int = 0): DataFrame = {
    val staged = portableLnStages(
      df.where(col(weightCol).isNotNull && col(weightCol) > 0)
        .withColumn("__n",
          StableHash.hash60(col(idCol).cast("string"), seed) + lit(1L)),
      "__n")
    val keyed = staged.withColumn("__key",
      (col("__ln") - lit(60.0) * lit(LN2)) / col(weightCol).cast("double"))
    val top = keyed.orderBy(col("__key").desc, col(idCol)).limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("__key").desc, col(idCol))))
      // + 0.0 normalizes IEEE negative zero: a key in (-5e-7, 0) rounds
      // to -0.0 on one engine and +0.0 on the other (sf1 probe catch —
      // repr('-0.0') != repr('0.0') in the strict compare)
      .select(col("rank") +: col(idCol) +: col(weightCol) +:
        (round(col("__key"), 6) + lit(0.0)).as("es_key") +: Nil: _*)
  }
}
