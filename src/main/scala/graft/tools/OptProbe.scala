package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Graft
import graft.functions.StableHash

/** Dev-only A/B harness for the round-13 optimization candidates: times
  * the CURRENT fused bench form of a workload against a candidate
  * restructure under the bench protocol (fresh fused plan per pass, min
  * of 3 interleaved passes, wall/N), plus plan-shape prints so the
  * exchange-count claims in OPTIMIZATION_r13.md are checked against the
  * real optimized plans, not intuition.
  *
  * Usage: sbt "runMain graft.tools.OptProbe <experiment...>"
  * (defaults to all). Experiments are self-contained; candidate forms are
  * PROBE-LOCAL copies — the corpus queries / Bench change only after a
  * candidate wins here and re-proves against the oracle.
  */
object OptProbe {

  private def time(df: => DataFrame): Double = {
    val t0 = System.nanoTime()
    df.queryExecution.toRdd.count()
    (System.nanoTime() - t0) / 1e9
  }

  /** r copies of every row, Bench.replicate's protocol. */
  private def replicate(df: DataFrame, r: Int): DataFrame =
    Graft.spread(df).withColumn("__rep", explode(sequence(lit(0L), lit(r - 1L))))

  private def exchanges(df: DataFrame): Int =
    "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.tune(spark)
    def t(d: String, n: String) = Graft.table(spark, d, n)

    // ---- candidate builders (d = data dir) --------------------------------

    // E1 kmv: pre-dedup (event_type, user_id) so the KMV object aggregate
    // and the md5 hash run once per DISTINCT user, and the mixed
    // distinct+object-agg plan (per-user KMV buffers, 3 exchanges)
    // becomes a plain two-level aggregate.
    def kmvDedupFused(d: String, r: Int): DataFrame = {
      val du = replicate(t(d, "events").select("event_type", "user_id"), r)
        .where(col("user_id").isNotNull)
        .groupBy("__rep", "event_type", "user_id").agg(count(lit(1)).as("__c"))
        .select(col("__rep"), col("event_type"), col("user_id"),
          StableHash.hash60(col("user_id").cast("string")).as("h"))
      du.groupBy("__rep", "event_type")
        .agg(graft.ops.Sketches.kmvMins(64)(col("h")).as("mins"),
          count(lit(1)).as("n_exact"))
        .select(col("__rep"), col("event_type"),
          size(col("mins")).cast("long").as("n_kept"),
          element_at(col("mins"), -1).as("kth_min"),
          when(size(col("mins")) < 64, size(col("mins")).cast("long"))
            .otherwise(expr(
              "CAST(63 AS DECIMAL(38,0)) * 1152921504606846976" +
                " DIV NULLIF(element_at(mins, -1), 0)"))
            .as("est_users"),
          col("n_exact"))
        .orderBy("__rep", "event_type")
    }

    // E2 j1: join the dims SEQUENTIALLY (each side a base scan with a real
    // size estimate -> statically broadcast) instead of pre-collapsing the
    // customer->nation->region chain (whose join-output size estimate
    // defeats the broadcast threshold and forces a fact-side exchange).
    def j1SeqFused(d: String, r: Int): DataFrame = {
      def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")
      val li = replicate(
        t(d, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount"), r)
      li.join(t(d, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(d, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(t(d, "nation").select("n_nationkey", "n_name", "n_regionkey"),
          col("c_nationkey") === col("n_nationkey"))
        .join(t(d, "region").select("r_regionkey", "r_name"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("__rep", "r_name", "n_name")
        .agg(count(lit(1)).as("n_items"),
          (sum(cents(col("l_extendedprice")) * (lit(100L) -
            cents(col("l_discount")))).cast("double") / 10000).as("revenue"))
        .orderBy("__rep", "r_name", "n_name")
    }

    // E3 passages: derive the positional-gram stream ONCE, repartition it
    // by the gram hash, and let ReuseExchange feed both the occ>=2
    // aggregate and the semi probe from the same shuffle — instead of two
    // full tokenize+zip_with+md5 passes over the corpus.
    def passagesReuseFused(d: String, r: Int): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val k = 5
      val d0 = replicate(t(d, "documents").select("doc_id", "text"), r)
        .select(col("__rep"), (col("doc_id") * r + col("__rep")).as("id"),
          col("text"))
      val toks = graft.functions.Text.tokens(col("text"))
      val n = size(toks)
      val shifted = (0 until k).map(j => slice(toks, lit(j + 1), n))
      val grams = shifted.reduceRight((a, b) =>
        zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
      val windows = d0
        .select(col("__rep"), col("id"),
          posexplode(slice(grams, lit(1), greatest(n - (k - 1), lit(0)))))
        .select(col("__rep"), col("id"),
          (col("pos") + 1).cast("long").as("p"),
          graft.functions.StableHash.hash60(col("col")).as("g"))
        .repartition(col("__rep"), col("g"))
      val repeated = windows.groupBy("__rep", "g")
        .agg(count(lit(1)).as("occ"))
        .where(col("occ") >= 2 && col("occ") <= 10000)
        .select("__rep", "g")
      val marked = windows
        .join(repeated.hint("shuffle_hash"), Seq("__rep", "g"), "left_semi")
      val w = Window.partitionBy("id").orderBy("p")
      marked
        .withColumn("__prev", lag(col("p"), 1).over(w))
        .withColumn("__new",
          when(col("__prev").isNull || col("p") > col("__prev") + k, 1L)
            .otherwise(0L))
        .withColumn("__island", sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("id", "__island")
        .agg(min(col("p")).as("span_start"),
          (max(col("p")) + (k - 1)).as("span_end"),
          count(lit(1)).as("n_windows"))
        .select(col("id"), col("span_start"), col("span_end"),
          (col("span_end") - col("span_start") + 1).as("span_tokens"),
          col("n_windows"))
        .orderBy("id", "span_start")
    }

    // E4 profile: regexp_count instead of size(regexp_extract_all(...))
    // for the two counting regexes (no match-array materialization).
    def profileRcountFused(d: String, r: Int): DataFrame = {
      val repDocs = replicate(t(d, "documents").select("doc_id", "text"), r)
        .select((col("doc_id") * r + col("__rep")).as("doc_id"),
          concat(col("__rep").cast("string"), lit(":"), col("text")).as("text"),
          col("__rep"))
      import graft.functions.Text
      val tokenized = Graft.spread(repDocs)
        .select(col("doc_id"), col("text").as("__text"),
          Text.tokens(col("text")).as("__toks"))
      val tc = coalesce(col("__text"), lit(""))
      val toks = col("__toks")
      val nChars = length(tc).cast("double")
      val nToks = size(toks).cast("double")
      val nPunct = regexp_count(tc, lit("[.,;:!?'\"()\\[\\]{}]")).cast("double")
      val allHits = Text.stopwordHits(toks, Text.stopwords.values.flatten.toSeq)
      val q = struct(
        nChars.cast("long").as("n_chars"),
        nToks.cast("long").as("n_tokens"),
        when(nChars > 0, nPunct / nChars).otherwise(lit(0.0)).as("punct_ratio"),
        when(nToks > 0, allHits.cast("double") / nToks).otherwise(lit(0.0)).as("stopword_ratio"),
        when(nToks > 0, (nChars - nToks + 1) / nToks).otherwise(lit(0.0)).as("mean_token_len"))
      tokenized.select(
        col("doc_id"),
        Text.languageIdFromTokens(toks).as("lang_pred"),
        q.getField("n_chars").as("n_chars"),
        q.getField("n_tokens").as("n_tokens"),
        regexp_count(tc, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")).cast("long").as("n_bpe_tokens"),
        round(q.getField("punct_ratio"), 6).as("punct_ratio"),
        round(q.getField("stopword_ratio"), 6).as("stopword_ratio"),
        Text.qualityScoreFromStruct(q).as("quality_score"),
        Text.fingerprintFromTokens(toks).as("fingerprint"))
        .orderBy("doc_id")
    }

    // ---- decomposition probes: share of each sub-expression ---------------
    def repDocs(d: String, r: Int) =
      replicate(t(d, "documents").select("doc_id", "text"), r)
        .select((col("doc_id") * r + col("__rep")).as("doc_id"),
          concat(col("__rep").cast("string"), lit(":"), col("text")).as("text"),
          col("__rep"))

    // profile without the fingerprint column (interpreted zip_with+aggregate
    // + per-token md5): how much of text_profile is the fingerprint?
    def profileNoFp(d: String, r: Int): DataFrame = {
      import graft.functions.Text
      val tokenized = Graft.spread(repDocs(d, r))
        .select(col("doc_id"), col("text").as("__text"),
          Text.tokens(col("text")).as("__toks"))
      val tc = col("__text"); val toks = col("__toks")
      val q = Text.qualityStructFromTokens(tc, toks)
      tokenized.select(
        col("doc_id"),
        Text.languageIdFromTokens(toks).as("lang_pred"),
        q.getField("n_chars").as("n_chars"),
        q.getField("n_tokens").as("n_tokens"),
        Text.bpeTokenCount(tc).as("n_bpe_tokens"),
        round(q.getField("punct_ratio"), 6).as("punct_ratio"),
        round(q.getField("stopword_ratio"), 6).as("stopword_ratio"),
        Text.qualityScoreFromStruct(q).as("quality_score"),
        lit(0L).as("fingerprint"))
        .orderBy("doc_id")
    }

    // profile with ONLY the fingerprint (plus tokenize)
    def profileOnlyFp(d: String, r: Int): DataFrame = {
      import graft.functions.Text
      Graft.spread(repDocs(d, r))
        .select(col("doc_id"), Text.tokens(col("text")).as("__toks"))
        .select(col("doc_id"),
          Text.fingerprintFromTokens(col("__toks")).as("fingerprint"))
        .orderBy("doc_id")
    }

    // one bare Generate pass of the positional-gram stream (passages' unit
    // of repeated work): tokenize + zip_with gram chain + hash60 + count
    def passagesGenOnly(d: String, r: Int): DataFrame = {
      val k = 5
      val d0 = repDocs(d, r)
      val toks = graft.functions.Text.tokens(col("text"))
      val n = size(toks)
      val shifted = (0 until k).map(j => slice(toks, lit(j + 1), n))
      val grams = shifted.reduceRight((a, b) =>
        zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
      d0.select(col("doc_id"),
          posexplode(slice(grams, lit(1), greatest(n - (k - 1), lit(0)))))
        .select(graft.functions.StableHash.hash60(col("col")).as("g"))
        .groupBy().agg(count(lit(1)).as("n"), sum(col("g")).as("s"))
    }

    // minhash without array_distinct on the shingles
    def minhashNoDistinct(d: String, r: Int): DataFrame = {
      val k = 3; val numHashes = 4
      val toksC = graft.functions.Text.tokens(col("text"))
      val n = size(toksC)
      val shifted = (0 until k).map(j => slice(toksC, lit(j + 1), n))
      val gramsC = shifted.reduceRight((a, b) =>
        zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
      val full = slice(gramsC, lit(1), greatest(n - (k - 1), lit(0)))
      val short = array(concat_ws(" ", toksC))
      val shingles =
        when(n === 0, array().cast("array<string>"))
          .when(n < k, short)
          .otherwise(full)
      val baseHashes = transform(shingles,
        s => pmod(graft.functions.StableHash.hash60(s), lit(graft.ops.Dedup.MinhashP)))
      val hashed = Graft.spread(repDocs(d, r))
        .select(col("doc_id"), baseHashes.as("__hs"))
      val sigs = (0 until numHashes).map { j =>
        val (a, b) = graft.ops.Dedup.minhashCoeffs(j)
        coalesce(
          array_min(transform(col("__hs"),
            h => pmod(h * a + b, lit(graft.ops.Dedup.MinhashP)))),
          lit(Long.MaxValue))
      }
      hashed.select(col("doc_id"), array(sigs: _*).as("sig"))
        .select(col("doc_id"),
          col("sig")(0).as("h0"), col("sig")(1).as("h1"),
          col("sig")(2).as("h2"), col("sig")(3).as("h3"))
        .orderBy("doc_id")
    }

    // (probe name, base fused workload, reps, candidate)
    val experiments: Seq[(String, String, Int, (String, Int) => DataFrame)] = Seq(
      ("profile_nofp", "text_profile", 8, (d: String, r: Int) => profileNoFp(d, r)),
      ("profile_onlyfp", "text_profile", 8, (d: String, r: Int) => profileOnlyFp(d, r)),
      ("passages_gen_only", "dedup_passages", 4,
        (d: String, r: Int) => passagesGenOnly(d, r)),
      ("minhash_nodistinct", "dedup_minhash", 8,
        (d: String, r: Int) => minhashNoDistinct(d, r)),
      ("sketch_kmv_distinct", "sketch_kmv_distinct", 8,
        (d: String, r: Int) => kmvDedupFused(d, r)),
      ("j1_multiway_join", "j1_multiway_join", 8,
        (d: String, r: Int) => j1SeqFused(d, r)),
      ("dedup_passages", "dedup_passages", 4,
        (d: String, r: Int) => passagesReuseFused(d, r)),
      ("text_profile", "text_profile", 8,
        (d: String, r: Int) => profileRcountFused(d, r)))

    val wanted = if (args.nonEmpty) args.toSet else experiments.map(_._1).toSet

    experiments.filter(e => wanted(e._1)).foreach { case (name, base, r, cand) =>
      // warm both plan shapes (JIT + codegen, the bench's untimed prep)
      time(graft.Bench.fused(base, spark, warmDir, r))
      time(cand(warmDir, r))
      // 3 interleaved passes each, min/N — the bench's amortized protocol
      val (as, bs) = (1 to 3).map { _ =>
        (time(graft.Bench.fused(base, spark, sfDir, r)), time(cand(sfDir, r)))
      }.unzip
      val a = as.min / r; val b = bs.min / r
      println(f"[opt] $name%-22s base $a%.4f s/inst   cand $b%.4f s/inst   (${b / a * 100}%.0f%%)")
      println(s"[opt]   exchanges: base=${exchanges(graft.Bench.fused(base, spark, sfDir, r))}" +
        s" cand=${exchanges(cand(sfDir, r))}")
    }
    spark.stop()
  }
}
