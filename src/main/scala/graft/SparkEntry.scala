package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Graft
import graft.functions.{Cleaning, Norm, StableHash, Text, Urls, Vectors}
import graft.metrics.StaffingMetrics
import graft.ops.{Dedup, Multimodal, Regression, Similarity, Sketches, TextAnalysis}
import graft.quality.DataQuality

/** Driver contract: the operator corpus (SURVEY.md §2 + north-star
  * extensions), each entry paired with ANSI SQL the DuckDB oracle replays
  * over the same parquet tables.
  *
  * Cross-engine determinism rules used throughout (so result hashes match):
  *  - sums of doubles go through exact DECIMAL accumulation, cast to DOUBLE
  *    at the end (double summation order differs between engines);
  *  - averages are sum-decimal / count (one double division of identical
  *    operands is bit-deterministic);
  *  - every query ORDER BYs a unique key set;
  *  - hashing is md5-derived (engine-native hashes differ);
  *  - column aliases are identical on both sides.
  */
object SparkEntry {

  // ---- shared helpers -----------------------------------------------------

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Graft.table(s, dir, name)

  /** (layout kind, dataset dir) -> materialized scratch layout for the
    * source-format round-trip entries. computeIfAbsent gives write-once
    * per JVM; each value is a fresh createTempDirectory path, so
    * concurrent processes never share a dir — a killed run's half-written
    * leftovers can never be picked up by a later one (a fixed /tmp path
    * raced exactly that way).
    */
  private val scratchLayouts =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def scratch(kind: String, d: String)(write: String => Unit): String =
    scratchLayouts.computeIfAbsent(s"$kind:$d", { _ =>
      val out = java.nio.file.Files.createTempDirectory(s"graft_${kind}_").toString
      write(out)
      out
    })

  /** Deterministic messy URL per document — mixed-case scheme/host, ccTLD
    * rows, default and explicit ports, tracking params, fragments,
    * trailing slashes. Input battery for the url_* entries; the oracle
    * rebuilds it with the same CASE arms.
    */
  private def messyUrl(id: Column, lang: Column, source: Column): Column =
    concat(
      lit("HTTPS://WWW."), upper(coalesce(source, lit("s"))),
      when(id % 3 === 0, lit(".CO.UK")).otherwise(lit(".COM")),
      when(id % 5 === 0, lit(":443"))
        .when(id % 5 === 1, lit(":8080")).otherwise(lit("")),
      lit("/Docs/"), coalesce(lang, lit("xx")), lit("/"), id.cast("string"),
      when(id % 2 === 0, lit("/")).otherwise(lit("")),
      lit("?utm_source=feed&id="), id.cast("string"), lit("&ref=rss#frag"))

  /** Exact decimal sum of a 2-dp double column, surfaced as DOUBLE. */
  private def dsum2(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** 2-dp double -> exact integer cents. Equally exact as the decimal cast
    * (round lands on the true integer; Spark's double->long cast truncates,
    * hence round first) but plans ~2x faster: decimal precision coercion
    * dominates analysis time on aggregate-heavy plans (see tools.Profile
    * freshplan A/B: 0.85s decimal vs 0.45s cents for the q1 shape).
    * Used in the HEADLINE bench queries; colder queries keep the decimal
    * form for variety of coverage.
    */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  private def centsSql(c: String): String = s"CAST(round($c * 100) AS BIGINT)"

  /** Exact revenue term in cents^2 units: price_cents * (100 - disc_cents). */
  private def revenue(price: Column, disc: Column): Column =
    sum(cents(price) * (lit(100L) - cents(disc))).cast("double") / 10000

  private val revSql =
    s"CAST(SUM(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS DOUBLE) / 10000"

  /** One SQL text, two engines: queries tagged sqlShared run VERBATIM in
    * both Spark SQL and DuckDB — the strongest dialect-parity statement.
    */
  private val correlatedSubquerySql: String =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer c
      |WHERE c_acctbal > (
      |  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      |ORDER BY c_custkey""".stripMargin

  /** Shared-dialect top-N-per-group (CTE + window), also verbatim. */
  private val topnPerGroupSql: String =
    """WITH ranked AS (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
      |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
      | FROM orders)
      |SELECT o_custkey, o_orderkey, o_totalprice, rn
      |FROM ranked WHERE rn <= 2 AND o_custkey <= 500
      |ORDER BY o_custkey, rn""".stripMargin

  // ---- flagship -----------------------------------------------------------

  /** Flagship on sf0.001 (driver smoke-checks rows > 0). */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  // ---- the corpus ---------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S1/S3 glob multi-file CSV scan with declared casts: nation split into
    // two CSV files, glob-read back (one spark.read covers both files; the
    // union is the source's own). Lossless round-trip, so the parquet table
    // is its own oracle.
    "s1_csv_glob_scan" -> ((s, d) => {
      val tmp = scratch("csv_glob", d) { out =>
        val n = t(s, d, "nation")
        n.where(col("n_regionkey") < 2).coalesce(1).write.mode("overwrite")
          .option("header", "true").csv(s"$out/NATION_part_a")
        n.where(col("n_regionkey") >= 2).coalesce(1).write.mode("overwrite")
          .option("header", "true").csv(s"$out/NATION_part_b")
      }
      s.read.option("header", "true")
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .csv(s"$tmp/NATION_part_*/*.csv")
        .orderBy("n_nationkey")
    }),

    // JSON-lines source round-trip (schema-on-read; lossless for these
    // types, so the parquet table is its own oracle).
    "s2_json_roundtrip" -> ((s, d) => {
      val tmp = scratch("json_rt", d) { out =>
        t(s, d, "supplier").coalesce(1).write.mode("overwrite").json(out)
      }
      s.read.schema("s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE")
        .json(tmp)
        .orderBy("s_suppkey")
    }),

    // ORC source round-trip (columnar alternative to parquet).
    "s3_orc_roundtrip" -> ((s, d) => {
      val tmp = scratch("orc_rt", d) { out =>
        t(s, d, "part").write.mode("overwrite").orc(out)
      }
      s.read.orc(tmp).orderBy("p_partkey")
    }),

    // Schema evolution across file generations: v1 files lack a column
    // that v2 files carry; a mergeSchema read unions the schemas and fills
    // v1 rows with NULL — the append-a-column migration every long-lived
    // table goes through (P5's missing-declared-column rule at the
    // file-generation level).
    "s7_schema_evolution" -> ((s, d) => {
      val tmp = scratch("evolve", d) { out =>
        val o = t(s, d, "orders")
        o.where(col("o_orderkey") <= 1000).select("o_orderkey", "o_custkey")
          .write.mode("overwrite").parquet(s"$out/v1")
        o.where(col("o_orderkey") > 1000)
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .write.mode("overwrite").parquet(s"$out/v2")
      }
      s.read.option("mergeSchema", "true").parquet(s"$tmp/v1", s"$tmp/v2")
        .orderBy("o_orderkey")
    }),

    // A1 group-by multi-agg (reference calculate_metrics.py:123-131 shape).
    "q1_agg" -> ((s, d) => t(s, d, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        (sum(cents(col("l_quantity"))).cast("double") / 100).as("sum_qty"),
        (sum(cents(col("l_extendedprice"))).cast("double") / 100).as("sum_base_price"),
        revenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        (sum(cents(col("l_quantity"))).cast("double") / 100 /
          count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")),

    // Salted two-stage aggregation (skew-safe agg). The oracle computes
    // the PLAIN group-by: the salting must be result-invisible — exact
    // integer-cents sums make the merge order irrelevant.
    "a15_salted_agg" -> ((s, d) => {
      val li = Graft.spread(t(s, d, "lineitem"))
        .select(col("l_returnflag"), cents(col("l_quantity")).as("qty_cents"))
      graft.ops.SkewJoin.saltedSumCount(li, Seq("l_returnflag"), "qty_cents",
        saltBuckets = 8)
        .select(col("l_returnflag"),
          (col("sum_qty_cents").cast("double") / 100).as("sum_qty"),
          col("n_rows"))
        .orderBy("l_returnflag")
    }),

    // Z-order (Morton) layout key: interleave two dimensions into one
    // sort order — written in this order, parquet min/max stats prune on
    // EITHER dimension. Top-200 by z compiles to TakeOrderedAndProject
    // (no global sort), like o2.
    "o3_zorder" -> ((s, d) => t(s, d, "part")
      .select(col("p_partkey"), col("p_size"),
        graft.functions.Layout.zValue(col("p_size"), col("p_partkey"), 16)
          .as("z"))
      .orderBy(col("z").asc, col("p_partkey").asc)
      .limit(200)),

    // S4 full table scan.
    "s4_scan" -> ((s, d) => t(s, d, "region").orderBy("r_regionkey")),

    // S6 parametrized filtered scan (streamlit_app.py:40-44 shape).
    "s6_filtered_scan" -> ((s, d) => t(s, d, "nation")
      .where(col("n_regionkey") === 2)
      .select("n_nationkey", "n_name")
      .orderBy("n_nationkey")),

    // P2 projection w/ rename + cast + coalesce (build.py:88-96 shape).
    "p2_project_cast" -> ((s, d) => t(s, d, "orders")
      .where(col("o_orderkey") <= 3000)
      .select(
        col("o_orderkey").as("order_id"),
        // ISO string, not DATE: oracle comparisons canonicalize temporal
        // types as strings (SURVEY §7.4.7)
        col("o_orderdate").cast("date").cast("string").as("order_date"),
        coalesce(col("o_totalprice"), lit(0.0)).as("total_price"),
        col("o_orderpriority").as("priority"))
      .orderBy("order_id")),

    // P3 null-skipping horizontal sum (calculate_metrics.py:119-121).
    "p3_horizontal_sum" -> ((s, d) => t(s, d, "lineitem")
      .where(col("l_orderkey") <= 2000)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        Cleaning.horizontalSum(Seq(col("l_quantity"), col("l_discount"), col("l_tax")))
          .as("h_sum"))
      .orderBy("l_orderkey", "l_linenumber")),

    // F2 null-based row filter (calculate_metrics.py:101-108).
    "f2_null_drop" -> ((s, d) => t(s, d, "lineitem")
      .where(col("l_orderkey") <= 3000)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        nullif(col("l_discount"), lit(0.0)).as("disc_nz"),
        nullif(col("l_tax"), lit(0.0)).as("tax_nz"))
      .na.drop(Seq("disc_nz", "tax_nz"))
      .orderBy("l_orderkey", "l_linenumber")),

    // F3 row-wise zero-sentinel nulling over the critical set
    // (calculate_metrics.py:92-98: ANY zero -> ALL nulled).
    "f3_zero_sentinel" -> ((s, d) => {
      val base = t(s, d, "lineitem")
        .where(col("l_orderkey") <= 2000)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
      Cleaning.zeroSentinelNull(base, Seq("l_quantity", "l_discount", "l_tax"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // F4 equality + IN-list filter (metrics_dashboard.py:25).
    "f4_in_filter" -> ((s, d) => t(s, d, "customer")
      .where(col("c_mktsegment") === "BUILDING" &&
        col("c_nationkey").isin(1, 3, 5))
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")),

    // F6 distinct non-null values (metrics_dashboard.py:20).
    "f6_distinct" -> ((s, d) => t(s, d, "customer")
      .select("c_mktsegment").na.drop().distinct()
      .orderBy("c_mktsegment")),

    // J1 multi-way inner equi-join + agg; dims broadcast (SURVEY §2.3).
    "j1_multiway_join" -> ((s, d) => {
      // spread: the single-row-group fact file scans as ONE partition;
      // without it the whole broadcast-probe chain runs on one core
      val li = Graft.spread(t(s, d, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount"))
      val o = t(s, d, "orders").select("o_orderkey", "o_custkey")
      // star-schema collapse: pre-join the customer->nation->region chain
      // into ONE broadcast dim, so the fact probes 2 hash tables, not 4
      val cdim = t(s, d, "customer")
        .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(t(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey", "n_name", "r_name")
      // No broadcast() hints: the 64 MB threshold broadcasts at this scale;
      // at 100 TB AQE picks shuffle joins instead of a forced OOM.
      // (Measured alternative: pre-aggregating lineitem by order key before
      // the join is WORSE here — it adds a fact-sized shuffle while the
      // broadcast probes are shuffle-free. Aggregate-below-join only pays
      // when the join itself must shuffle the fact side.)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cdim, col("o_custkey") === col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_items"),
          revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy("r_name", "n_name")
    }),

    // J1 iterative fold-join with deterministic collision renaming
    // (calculate_metrics.py:56-62; SURVEY §7.4.1 `_fN` scheme).
    "j1_fold_join" -> ((s, d) => {
      val a = t(s, d, "orders").select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        col("o_totalprice").as("val"))
      val b = t(s, d, "lineitem").groupBy(col("l_orderkey").as("k"))
        .agg(count(lit(1)).as("n_items"), dsum2(col("l_quantity")).as("val"))
      val (merged, _) = StaffingMetrics.foldJoin(Seq(a, b), Seq("k"), audit = false)
      merged.select("k", "status", "val", "n_items", "val_f1").orderBy("k")
    }),

    // Left-semi join (EXISTS) — engine surface beyond the reference.
    "j2_semi_join" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").where(col("o_totalprice") > 300000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    // Left-anti join (NOT EXISTS).
    "j3_anti_join" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").where(col("o_totalprice") > 400000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    // As-of (point-in-time) join: each view matched to the user's latest
    // purchase at-or-before it (composed from built-ins; Spark lacks the
    // operator natively — see graft.ops.AsOfJoin).
    "j4_asof_join" -> ((s, d) => {
      val ev = t(s, d, "events").withColumn("ts_us", expr("ts DIV 1000"))
      val views = ev.where(col("event_type") === "view" && col("user_id") <= 300)
        .select("user_id", "ts_us", "event_id")
      val purchases = ev.where(col("event_type") === "purchase" && col("user_id") <= 300)
        .groupBy("user_id", "ts_us").agg(max("value").as("pval"))
      graft.ops.AsOfJoin.asOf(views, purchases, Seq("user_id"), "ts_us", Seq("pval"))
        .orderBy("user_id", "ts_us", "event_id")
    }),

    // Bucketed range join: views falling inside the 1-hour window after
    // each purchase by the same user (bucketize-explode, never per-key
    // cross product — see graft.ops.RangeJoin).
    "j5_range_join" -> ((s, d) => {
      val hourUs = 3600L * 1000000L
      val ev = t(s, d, "events").withColumn("ts_us", expr("ts DIV 1000"))
      val views = ev.where(col("event_type") === "view" && col("user_id") <= 300)
        .select(col("user_id"), col("ts_us"), col("event_id").as("view_id"))
      val windows = ev.where(col("event_type") === "purchase" && col("user_id") <= 300)
        .select(col("user_id"), col("ts_us").as("start_us"),
          (col("ts_us") + hourUs).as("end_us"),
          col("event_id").as("purchase_id"))
      graft.ops.RangeJoin.bucketedRangeJoin(views, windows,
        Seq("user_id"), "ts_us", "start_us", "end_us", bucket = hourUs)
        .select("user_id", "view_id", "purchase_id", "ts_us", "start_us")
        .orderBy("user_id", "view_id", "purchase_id")
    }),

    // Interval-overlap join: per user, purchase windows [t, t+1h]
    // overlapping view windows [t, t+30m] — each overlapping pair kept
    // exactly once via the overlap-start bucket rule
    // (RangeJoin.intervalOverlapJoin); exact integer overlap length.
    "j7_interval_overlap" -> ((s, d) => {
      val hourUs = 3600L * 1000000L
      val ev = t(s, d, "events").withColumn("ts_us", expr("ts DIV 1000"))
      val purch = ev.where(col("event_type") === "purchase" &&
          col("user_id") <= 300)
        .select(col("user_id"), col("ts_us").as("p_start"),
          (col("ts_us") + hourUs).as("p_end"),
          col("event_id").as("purchase_id"))
      val views = ev.where(col("event_type") === "view" &&
          col("user_id") <= 300)
        .select(col("user_id"), col("ts_us").as("v_start"),
          (col("ts_us") + hourUs / 2).as("v_end"),
          col("event_id").as("view_id"))
      graft.ops.RangeJoin.intervalOverlapJoin(purch, views, Seq("user_id"),
          "p_start", "p_end", "v_start", "v_end", bucket = hourUs)
        .select(col("user_id"), col("purchase_id"), col("view_id"),
          (least(col("p_end"), col("v_end")) -
            greatest(col("p_start"), col("v_start"))).as("overlap_us"))
        .orderBy("user_id", "purchase_id", "view_id")
    }),

    // Null-safe equality join (<=>): NULL keys match each other, unlike
    // plain equi-join semantics.
    "j6_null_safe_join" -> ((s, d) => {
      val n = t(s, d, "nation")
        .select(col("n_nationkey"), nullif(col("n_regionkey"), lit(2)).as("rk"))
      n.as("a").join(n.as("b"), col("a.rk") <=> col("b.rk"))
        .select(col("a.n_nationkey").as("k_a"), col("b.n_nationkey").as("k_b"),
          col("a.rk").as("rk"))
        .orderBy("k_a", "k_b")
    }),

    // Array-function battery, serialized to strings (sort/distinct/slice/
    // join) so no list types cross the oracle boundary.
    "x7_array_funcs" -> ((s, d) => t(s, d, "lineitem")
      .where(col("l_orderkey") <= 500)
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("l_linenumber"))).as("lines"))
      .select(
        col("l_orderkey"),
        size(col("lines")).cast("long").as("n_lines"),
        array_join(transform(col("lines"), _.cast("string")), ",").as("line_csv"),
        col("lines")(0).as("first_line"),
        element_at(col("lines"), -1).as("last_line"))
      .orderBy("l_orderkey")),

    // A2 post-agg derived ratios w/ zero->NULL denominators
    // (calculate_metrics.py:132-143).
    "a2_ratio" -> ((s, d) => t(s, d, "orders")
      .groupBy("o_orderpriority")
      .agg(
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total_price"),
        count(lit(1)).as("n_orders"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_finished"))
      .withColumn("avg_price", col("total_price") / col("n_orders"))
      .withColumn("price_per_finished",
        col("total_price") / Cleaning.zeroToNull(col("n_finished")))
      .orderBy("o_orderpriority")),

    // A3 SQL group-agg w/ CASE-without-ELSE conditional count
    // (build.py:99-107, v_penalties_by_state shape).
    "a3_conditional_agg" -> ((s, d) => t(s, d, "customer")
      .groupBy("c_nationkey")
      .agg(
        count(lit(1)).as("n_customers"),
        dsum2(col("c_acctbal")).as("total_bal"),
        sum(when(col("c_acctbal") > 0, 1)).as("n_positive"), // X9: no ELSE
        (dsum2(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
      .orderBy("c_nationkey")),

    // Correlated scalar subquery, run as the VERBATIM oracle SQL text
    // through Spark SQL (dialect parity; Catalyst decorrelates to a join).
    "q_correlated_subquery" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("customer")
      s.sql(correlatedSubquerySql)
    }),

    // Top-N per group through the verbatim shared SQL (CTE + window).
    "q_topn_per_group" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(topnPerGroupSql)
    }),

    // A4 duplicate-key audit agg (build.py:39-53).
    "a4_dup_audit" -> ((s, d) => t(s, d, "events")
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"))
      .where(col("n") > 1)
      .orderBy("user_id", "event_type")),

    // Declarative DQ constraint suite (Deequ-style): four checks over
    // events evaluated in ONE aggregate pass; exact-count ratios replay
    // bit-for-bit in the oracle.
    "dq_constraints" -> ((s, d) => {
      import graft.quality.Constraints._
      check(t(s, d, "events"), Seq(
        NotNull("value", 0.9),
        InSet("event_type",
          Seq("click", "error", "purchase", "signup", "view"), 1.0),
        Between("value", 0.0, 500.0, 0.5),
        UniqueRatio("event_id", 1.0)))
    }),

    // Distribution drift monitor: PSI of `value` per event_type between
    // the first and second half of the stream (split at the exact median
    // event_id — small integers, so the R-7 interpolation is exact on
    // both engines). Reference-slice deciles bucket both slices; see
    // DataQuality.psiDrift for the replay discipline.
    "dq_psi_drift" -> ((s, d) => {
      val ev = t(s, d, "events")
        .where(col("event_id").isNotNull && col("value").isNotNull)
      val med = ev.agg(
        expr("percentile(cast(event_id as double), 0.5)").as("med"))
      val tagged = ev.crossJoin(broadcast(med))
        .select(col("event_type"), col("value"),
          (col("event_id").cast("double") <= col("med")).as("is_ref"))
      DataQuality.psiDrift(tagged, "event_type", "value", "is_ref")
        .orderBy("event_type")
    }),

    // Label-agreement audit: Cohen's kappa between each doc's DECLARED
    // language tag and the engine's stopword-based language prediction —
    // the metadata-vs-content consistency check run before trusting
    // either label source. Observed/expected agreement from exact
    // integer counts and marginal products; the three mirrored double
    // divisions happen last.
    "dq_label_agreement" -> ((s, d) => {
      val pred = TextAnalysis.profile(t(s, d, "documents"))
        .select(col("doc_id"), col("lang_pred"))
      val pairs = t(s, d, "documents")
        .select(col("doc_id"), coalesce(col("lang"), lit("~")).as("a"))
        .join(pred, Seq("doc_id"))
        .select(col("a"), col("lang_pred").as("b"))
      val tot = pairs.agg(count(lit(1)).as("n_total"),
        sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("n_agree"))
      val ra = pairs.groupBy("a").agg(count(lit(1)).as("na"))
      val cb = pairs.groupBy("b").agg(count(lit(1)).as("nb"))
      val num = ra.join(cb, col("a") === col("b"))
        .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("pe_num"))
      tot.crossJoin(num)
        .withColumn("po", col("n_agree").cast("double") / col("n_total"))
        .withColumn("pe", col("pe_num").cast("double") /
          col("n_total") / col("n_total"))
        .select(col("n_total"), col("n_agree"), col("po"), col("pe"),
          ((col("po") - col("pe")) / (lit(1.0) - col("pe"))).as("kappa"))
    }),

    // Per-column cardinality profile: exact distinct count and distinct
    // ratio for every events column in ONE aggregate pass (the
    // key-candidate / join-planning profile next to a5_completeness).
    "dq_cardinality_profile" -> ((s, d) => {
      val ev = t(s, d, "events")
      val cols = Seq("event_id", "ts", "user_id", "event_type", "value",
        "props")
      val aggs = count(lit(1)).as("__n") +:
        cols.map(c => count_distinct(col(c)).as(s"__d_$c"))
      val wide = ev.agg(aggs.head, aggs.tail: _*)
      val stacked = cols.map { c =>
        struct(lit(c).as("column_name"), col("__n").as("n_rows"),
          col(s"__d_$c").as("n_distinct"))
      }
      wide.select(explode(array(stacked: _*)).as("s"))
        .select(col("s.column_name"), col("s.n_rows"), col("s.n_distinct"),
          expr("s.n_distinct * 1000000000L DIV s.n_rows")
            .as("distinct_ratio_nano"))
        .orderBy("column_name")
    }),

    // Data-freshness monitor: per event type, row count, last-seen
    // microsecond, and the lag behind the freshest type — the staleness
    // report a pipeline checks before trusting an input. Exact integers.
    "dq_freshness" -> ((s, d) => {
      val ev = t(s, d, "events")
        .where(col("ts").isNotNull && col("event_type").isNotNull)
        .select(col("event_type"), expr("ts DIV 1000").as("us"))
      val per = ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"), max("us").as("max_us"))
      per.crossJoin(broadcast(per.agg(max("max_us").as("g_max"))))
        .select(col("event_type"), col("n"), col("max_us"),
          (col("g_max") - col("max_us")).as("lag_us"))
        .orderBy("event_type")
    }),

    // Referential-integrity audit over three FK edges, two deliberately
    // corrupted (every 97th order's custkey pushed out of range; a
    // deterministic slice of lineitem suppkeys negated) and one left
    // clean as the passing control. One report row per FK.
    "dq_ref_integrity" -> ((s, d) => {
      val ordFk = t(s, d, "orders").select(
        when(col("o_orderkey") % 97 === 0, col("o_custkey") + 10000000L)
          .otherwise(col("o_custkey")).as("fk"))
      val partFk = t(s, d, "lineitem").select(col("l_partkey").as("fk"))
      val suppFk = t(s, d, "lineitem").select(
        when((col("l_orderkey") * 7 + col("l_linenumber")) % 89 === 0,
          -(col("l_suppkey") + 1)).otherwise(col("l_suppkey")).as("fk"))
      DataQuality.fkOrphans(ordFk, "fk",
          t(s, d, "customer"), "c_custkey", "orders.custkey->customer")
        .unionByName(DataQuality.fkOrphans(partFk, "fk",
          t(s, d, "part"), "p_partkey", "lineitem.partkey->part"))
        .unionByName(DataQuality.fkOrphans(suppFk, "fk",
          t(s, d, "supplier"), "s_suppkey", "lineitem.suppkey->supplier"))
        .orderBy("fk_name")
    }),

    // Benford first-significant-digit profile of order totals: exact cents
    // snap, digit from the integer's decimal string, truncating nano
    // shares against hardcoded log10(1+1/d) expectations (the synthetic
    // uniform-ish prices will NOT be Benford — the dev_nano column is the
    // point of the report).
    "dq_benford" -> ((s, d) =>
      DataQuality.benfordDigits(t(s, d, "orders"), "o_totalprice")
        .orderBy("digit")),

    // Functional-dependency audit: customers whose orders carry more than
    // one distinct priority — i.e. violations of the (false) FD
    // o_custkey -> o_orderpriority. Single hash aggregate.
    "dq_fd_check" -> ((s, d) =>
      DataQuality.fdViolations(t(s, d, "orders"),
          Seq("o_custkey"), Seq("o_orderpriority"))
        .where(col("o_custkey").isNotNull)
        .orderBy("o_custkey")),

    // A5 per-column completeness profile (load_nursing_home_data.py:20-36).
    "a5_completeness" -> ((s, d) => {
      val ev = t(s, d, "events").select(
        col("event_id"), col("user_id"),
        nullif(col("event_type"), lit("click")).as("event_type_nc"),
        col("value"))
      DataQuality.completeness(ev, "events").orderBy("column_name")
    }),

    // A6 numeric-column means (streamlit_app.py:34-37), decimal-exact.
    "a6_numeric_means" -> ((s, d) => t(s, d, "lineitem")
      .agg(
        (sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double") /
          count(col("l_quantity"))).as("avg_quantity"),
        (sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double") /
          count(col("l_extendedprice"))).as("avg_extendedprice"),
        (sum(col("l_discount").cast(DecimalType(18, 2))).cast("double") /
          count(col("l_discount"))).as("avg_discount"),
        (sum(col("l_tax").cast(DecimalType(18, 2))).cast("double") /
          count(col("l_tax"))).as("avg_tax"))),

    // A7 grouped mean (metrics_dashboard.py:28-31).
    "a7_grouped_mean" -> ((s, d) => t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg((sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double") /
        count(col("l_quantity"))).as("avg_qty"))
      .orderBy("l_returnflag")),

    // Distinct aggregation (engine surface beyond the reference).
    "a9_count_distinct" -> ((s, d) => t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")),

    // Rollup w/ grouping id (subtotal hierarchy — engine surface).
    "a10_rollup" -> ((s, d) => t(s, d, "customer")
      .rollup("c_mktsegment", "c_nationkey")
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        dsum2(col("c_acctbal")).as("total_bal"))
      .select("gid", "c_mktsegment", "c_nationkey", "n", "total_bal")
      .orderBy(col("gid"), col("c_mktsegment"), col("c_nationkey"))),

    // Exact percentiles (linear interpolation; same estimator both engines).
    "a11_percentiles" -> ((s, d) => t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_extendedprice, 0.9)").as("p90_price"),
        expr("percentile(l_discount, 0.25)").as("p25_disc"))
      .orderBy("l_returnflag")),

    // Argmax / conditional-aggregate battery. max_by keyed on a composite
    // (bal scaled + custkey) so ties cannot make the pick nondeterministic.
    "a13_argmax" -> ((s, d) => t(s, d, "customer")
      .groupBy("c_nationkey")
      .agg(
        expr("count_if(c_acctbal > 0)").cast("long").as("n_positive"),
        expr("bool_and(c_acctbal > -1000)").as("all_above_floor"),
        expr("bool_or(c_acctbal > 9000)").as("any_rich"),
        expr("max_by(c_name, c_acctbal * 1000000 + c_custkey)").as("richest"),
        expr("min_by(c_name, c_acctbal * 1000000 + c_custkey)").as("poorest"))
      .orderBy("c_nationkey")),

    // Variance / correlation from exact decimal moment sums: the built-in
    // accumulators are order-dependent in float, but moments over 2-dp
    // values are exact decimals, making the derived statistics
    // bit-deterministic cross-engine (both sides compute this formula).
    "a14_stats" -> ((s, d) => {
      val q = col("l_quantity").cast(DecimalType(18, 2))
      val p = col("l_extendedprice").cast(DecimalType(18, 2))
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(q).cast("double").as("sq"),
          sum(p).cast("double").as("sp"),
          sum(q * q).cast("double").as("sqq"),
          sum(p * p).cast("double").as("spp"),
          sum(q * p).cast("double").as("sqp"))
        .select(
          col("l_returnflag"),
          col("n"),
          // rounded: DECIMAL(38,4)->double conversion can differ by 1 ULP
          // between engines once sums pass 2^53; rounding 10 orders above
          // ULP noise keeps the hash stable without losing the statistic
          round((col("sqq") - col("sq") * col("sq") / col("n")) / (col("n") - 1), 6)
            .as("var_qty"),
          round((col("n") * col("sqp") - col("sq") * col("sp")) /
            sqrt((col("n") * col("sqq") - col("sq") * col("sq")) *
              (col("n") * col("spp") - col("sp") * col("sp"))), 9)
            .as("corr_qty_price"))
        .orderBy("l_returnflag")
    }),

    // Closed-form per-group OLS (y = a + b*x): slope/intercept/r2 from ONE
    // pass of exact decimal sufficient statistics (ops.Regression) — a
    // single partial+final hash aggregate, q1-shaped at any scale.
    "a18_regression" -> ((s, d) =>
      Regression.groupedOls(t(s, d, "lineitem"), Seq("l_returnflag"),
        xCol = "l_quantity", yCol = "l_extendedprice")
        .orderBy("l_returnflag")),

    // Cube w/ grouping id: the full subtotal lattice (complements a10's
    // rollup hierarchy). One Expand + one aggregate — a single shuffle
    // regardless of how many grouping sets the lattice expands to.
    "a16_cube" -> ((s, d) => t(s, d, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        dsum2(col("l_quantity")).as("sum_qty"))
      .select("gid", "l_returnflag", "l_linestatus", "n", "sum_qty")
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))),

    // Arbitrary GROUPING SETS (the general form cube/rollup specialize):
    // per-type totals, per-cohort totals and the grand total in ONE
    // Expand + aggregate pass — through the spark.sql surface, since
    // grouping sets are a SQL-level construct.
    "a19_grouping_sets" -> ((s, d) => {
      t(s, d, "events")
        .select(col("event_type"),
          (col("user_id") % 3).cast("long").as("cohort"))
        .createOrReplaceTempView("gs_events")
      s.sql(
        """SELECT grouping_id() AS gid, event_type, cohort,
          | count(1) AS n
          |FROM gs_events
          |GROUP BY GROUPING SETS ((event_type), (cohort), ())
          |ORDER BY gid, event_type, cohort""".stripMargin)
    }),

    // Unpivot (wide->long melt) — the inverse of a8's pivot. Compiles to a
    // map-side Expand (each input row fans out to 4 output rows, no join,
    // no shuffle before the final sort). Values are copied verbatim, so
    // the compare is bit-exact with no decimal staging.
    "a17_unpivot" -> ((s, d) => t(s, d, "lineitem")
      .where(col("l_orderkey") <= 500)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "metric", "value")
      .orderBy("l_orderkey", "l_linenumber", "metric")),

    // Frame-clause window battery: cume_dist, first/last/nth over running
    // frames, 3-row moving sum (decimal-exact). Complements w4's ranking
    // battery; all functions share ONE partition ordering so the physical
    // plan is a single Window over a single sort (asserted in PlanShapeSpec).
    "w5_frames" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders").where(col("o_custkey") <= 100)
        .select(
          col("o_custkey"), col("o_orderkey"),
          cume_dist().over(w).as("cd"),
          first(col("o_orderkey")).over(run).as("first_ok"),
          last(col("o_orderkey"))
            .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
            .as("last_ok"),
          nth_value(col("o_orderkey"), 2).over(run).as("second_ok"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .over(w.rowsBetween(-2, Window.currentRow))
            .cast("double").as("moving_sum3"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // A8 pivot aggregation (metrics_dashboard.py:34-39), explicit values
    // for a deterministic single-pass plan (SURVEY §7.4.9).
    "a8_pivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val ev = t(s, d, "events")
        .select(date_trunc("day", Graft.nanosToTimestamp("ts")).cast("date")
          .cast("string").as("day"),
          col("event_type"), col("value").cast(DecimalType(28, 10)).as("dval"))
      val piv = ev.groupBy("day").pivot("event_type", types).sum("dval")
      piv.select(col("day") +: types.map(ty => col(ty).cast("double").as(ty)): _*)
        .orderBy("day")
    }),

    // DYNAMIC pivot: spine columns discovered from the data (one bounded
    // distinct-collect — the two-pass shape every dynamic-pivot engine
    // uses; the collect is |distinct values|, never data-sized). Output is
    // identical to the explicit-values pivot, which is what the oracle
    // states.
    "a18_dynamic_pivot" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(date_trunc("day", Graft.nanosToTimestamp("ts")).cast("date")
          .cast("string").as("day"),
          col("event_type"), col("value").cast(DecimalType(28, 10)).as("dval"))
      val types = ev.select("event_type").distinct()
        .orderBy("event_type").collect().map(_.getString(0)).toSeq
      val piv = ev.groupBy("day").pivot("event_type", types).sum("dval")
      piv.select(col("day") +: types.map(ty => col(ty).cast("double").as(ty)): _*)
        .orderBy("day")
    }),

    // O1 sort on a non-key column (metrics_dashboard.py sort_index analogue).
    "o1_sort" -> ((s, d) => t(s, d, "nation")
      .select("n_nationkey", "n_name").orderBy("n_name")),

    // O2 top-k (limit) — compiles to TakeOrderedAndProject.
    "o2_topk" -> ((s, d) => t(s, d, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select("o_orderkey", "o_totalprice")
      .limit(10)),

    // U1 union-by-name w/ missing-column NULL fill (build.py:78 analogue).
    "u1_union" -> ((s, d) => {
      val c = t(s, d, "customer").where(col("c_nationkey") === 1)
        .select(lit("c").as("src"), col("c_custkey").as("id"),
          col("c_name").as("name"), col("c_acctbal").as("bal"))
      val sup = t(s, d, "supplier").where(col("s_nationkey") === 1)
        .select(lit("s").as("src"), col("s_suppkey").as("id"),
          col("s_name").as("name"))
      c.unionByName(sup, allowMissingColumns = true).orderBy("src", "id")
    }),

    // U2 set ops (engine surface; none in reference): customers in
    // BUILDING that also/never placed urgent orders.
    "u2_intersect_except" -> ((s, d) => {
      val building = t(s, d, "customer")
        .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val urgent = t(s, d, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey"))
      building.intersect(urgent).withColumn("src", lit("both"))
        .unionByName(building.except(urgent).withColumn("src", lit("building_only")))
        .orderBy("src", "c_custkey")
    }),

    // Multimodal frame sampling: the mapPartitions decode stub feeding a
    // generator — every 7th frame index per media item.
    "mm_frame_sample" -> ((s, d) => {
      val media = Multimodal.syntheticMediaFromDocs(t(s, d, "documents"))
      val decoded = Multimodal.decodeImage(s, media)
      Multimodal.sampleFrames(decoded, stride = 7)
        .orderBy("media_id", "frame_idx")
    }),

    // Scalar string-function battery (X6/X13 family breadth).
    "x6_string_funcs" -> ((s, d) => t(s, d, "part")
      .where(col("p_partkey") <= 2000)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("u"),
        lower(col("p_type")).as("l"),
        length(col("p_name")).cast("long").as("len"),
        substring(col("p_name"), 1, 8).as("pre"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        lpad(col("p_brand"), 12, ".").as("padded"),
        col("p_type").like("%BRASS%").as("is_brass"))
      .orderBy("p_partkey")),

    // Scalar date-function battery (X5/X8 family breadth).
    "x8_date_funcs" -> ((s, d) => t(s, d, "orders")
      .where(col("o_orderkey") <= 2000)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_add(col("o_orderdate").cast("date"), 30).cast("string").as("plus30"),
        datediff(lit("2002-01-01").cast("date"),
          col("o_orderdate").cast("date")).cast("long").as("days_to_2002"))
      .orderBy("o_orderkey")),

    // X1 identifier normalization as data transform (build.py:7-8).
    "x1_norm_identifier" -> ((s, d) => t(s, d, "documents")
      .select(col("doc_id"),
        Norm.normIdentifierCol(
          concat(col("source"), lit(" ("), upper(col("lang")), lit(")")))
          .as("norm_name"))
      .orderBy("doc_id")),

    // X3 quarter normalization (calculate_metrics.py:28-36): regex
    // `(20\d{2}).*?(\d)`; no match -> NULL (1995-1999 dates exercise that).
    // X4/X5/X6 coercion battery: crafted good/bad strings (selected
    // deterministically per row from literal case tables) through
    // coerce-to-null numeric cast, flexible date parse, and trim-cast
    // (reference build.py:29-37 errors='coerce' semantics). Single-digit
    // date forms (e.g. 7/4/2021) are deliberately absent: Spark's strict
    // MM requires two digits while strptime's %m does not — a documented
    // parser divergence, not a coercion behavior.
    "x4_coerce" -> ((s, d) => {
      val numCases = Seq(" 42 ", "3.14", "-7.5", "1e3", "abc", "", "  ",
        "12abc", "0042", "+5")
      val dateCases = Seq("04/05/2021", "2021-03-04", "not-a-date",
        "13/01/2021", "12/31/1999", "02/29/2020", "02/30/2021", "")
      val strCases = Seq(" spaced ", "nospaces", "  double  ", "", " mixed Case ")
      def pick(cases: Seq[String]) = element_at(
        array(cases.map(lit): _*),
        (pmod(col("p_partkey"), lit(cases.size)) + 1).cast("int"))
      t(s, d, "part").where(col("p_partkey") <= 2000)
        .select(col("p_partkey").as("id"), pick(numCases).as("raw_num"),
          pick(dateCases).as("raw_date"), pick(strCases).as("raw_str"),
          col("p_size"))
        .select(
          col("id"),
          col("raw_num"), Cleaning.coerceNumeric(col("raw_num")).as("num"),
          col("raw_date"),
          // ISO string, not DATE (temporal canonicalization, SURVEY §7.4.7)
          Cleaning.coerceDate(col("raw_date")).cast("string").as("dt"),
          col("raw_str"), Cleaning.toTrimmedString(col("raw_str")).as("trimmed"),
          Cleaning.toTrimmedString(col("p_size")).as("size_str"))
        .orderBy("id")
    }),

    "x3_quarter_norm" -> ((s, d) => {
      val o = t(s, d, "orders").where(col("o_orderkey") <= 3000)
      val y = year(col("o_orderdate")).cast("string")
      val q = quarter(col("o_orderdate")).cast("string")
      val raw = when(pmod(col("o_orderkey"), lit(3)) === 0, concat(y, lit("Q"), q))
        .when(pmod(col("o_orderkey"), lit(3)) === 1,
          concat(lit("Quarter "), q, lit(" of "), y))
        .otherwise(concat(y, lit(" Q"), q))
      o.select(col("o_orderkey"), raw.as("raw_quarter"),
        Norm.normalizeQuarter(raw).as("norm_quarter"))
        .orderBy("o_orderkey")
    }),

    // JSON field extraction over the events props column.
    "x5_json_extract" -> ((s, d) => t(s, d, "events")
      .where(col("event_id") <= 2000)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id")),

    // Window functions (engine surface beyond the reference; SURVEY §2.5).
    "w1_window" -> ((s, d) => {
      val o = t(s, d, "orders").where(col("o_custkey") <= 100)
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      o.select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).cast("long").as("rn"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_total"))
        .orderBy("o_custkey", "rn")
    }),

    // Sessionization (window-function tier): 30-minute inactivity gap over
    // the raw epoch-nanos column — exact integer math, oracle-reproducible.
    "w2_sessionize" -> ((s, d) => {
      val gapUs = 30L * 60 * 1000000L
      // microseconds, not nanos: DuckDB truncates parquet ns-timestamps to
      // micro precision on read, so the oracle can only see µs
      val ev = t(s, d, "events").where(col("user_id") <= 200)
        .withColumn("ts_us", expr("ts DIV 1000"))
      graft.ops.Sessionize.batchSessionStats(ev, "user_id", "ts_us", "event_id", gapUs)
        .withColumnRenamed("start_ns", "start_us")
        .withColumnRenamed("end_ns", "end_us")
        .orderBy("user_id", "session_seq")
    }),

    // Built-in session_window aggregation (batch mode) — cross-checked by
    // the oracle's relational lag/cumsum formulation. Note session_window
    // merges on strict `<gap` (an exactly-gap-later event starts a NEW
    // session), unlike w2_sessionize's `<=`.
    "w3_session_window" -> ((s, d) => {
      val ev = t(s, d, "events").where(col("user_id") <= 200)
        .withColumn("ts_ts", Graft.nanosToTimestamp("ts"))
      ev.groupBy(col("user_id"), session_window(col("ts_ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"),
          col("n_events"))
        .orderBy("user_id", "start_us")
    }),

    // Ranking-function battery over a deterministic total order.
    "w4_rank_funcs" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(s, d, "customer").where(col("c_nationkey") <= 5)
        .select(
          col("c_nationkey"), col("c_custkey"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"),
          lag(col("c_custkey"), 1).over(w).as("prev_cust"),
          lead(col("c_custkey"), 1, -1L).over(w).as("next_cust"),
          percent_rank().over(w).as("pct_rank"))
        .orderBy("c_nationkey", "rnk", "c_custkey")
    }),

    // ---- north-star extensions (BASELINE.json) ----------------------------

    // Exact dedup by content digest.
    "dedup_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents"), "text", "doc_id").orderBy("digest")),

    // MinHash signatures (first 4 hash slots surfaced as columns).
    "dedup_minhash" -> ((s, d) =>
      Dedup.minhashSignatures(t(s, d, "documents"), "text", "doc_id",
        numHashes = 4, shingleK = 3)
        .select(col("doc_id"),
          col("sig")(0).as("h0"), col("sig")(1).as("h1"),
          col("sig")(2).as("h2"), col("sig")(3).as("h3"))
        .orderBy("doc_id")),

    // LSH band tuning report: per band, multi-member bucket count, the
    // hottest bucket, candidate pairs Σ s(s−1)/2, and how many docs stay
    // singleton — the numbers that decide bands×rows before a 100 TB
    // dedup run. Exact integers off the same banded-bucket frame the
    // dedup path shuffles.
    "dedup_minhash_band_stats" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val nd = docs.agg(count(lit(1)).as("n_docs"))
      Dedup.minhashBuckets(docs, "text", "doc_id")
        .groupBy("band")
        .agg(count(lit(1)).as("n_multi_buckets"),
          max("n_members").as("max_bucket"),
          sum(expr("n_members * (n_members - 1) DIV 2")).as("cand_pairs"),
          sum("n_members").as("docs_in_multi"))
        .crossJoin(broadcast(nd))
        .select(col("band"), col("n_multi_buckets"), col("max_bucket"),
          col("cand_pairs"),
          (col("n_docs") - col("docs_in_multi")).as("n_singletons"))
        .orderBy("band")
    }),

    // Group-level MinHash via the custom typed Aggregator: per-source
    // signature = element-wise min over member docs (partial+final agg;
    // only signatures cross the shuffle).
    "dedup_group_minhash" -> ((s, d) => {
      val sigs = Dedup.minhashSignatures(
        t(s, d, "documents"), "text", "doc_id", numHashes = 4, shingleK = 3)
      val withSource = sigs.join(
        broadcast(t(s, d, "documents").select("doc_id", "source")), Seq("doc_id"))
      withSource.groupBy("source")
        .agg(graft.ops.MinHashMerge.minhashMerge(4)(col("sig")).as("gsig"),
          count(lit(1)).as("n_docs"))
        .select(col("source"),
          col("gsig")(0).as("h0"), col("gsig")(1).as("h1"),
          col("gsig")(2).as("h2"), col("gsig")(3).as("h3"),
          col("n_docs"))
        .orderBy("source")
    }),

    // SimHash 16-bit fingerprints (spread: CPU-bound map over one file).
    "dedup_simhash" -> ((s, d) => Graft.spread(t(s, d, "documents"))
      .select(col("doc_id"), Dedup.simhash(col("text"), 16).as("simhash"))
      .orderBy("doc_id")),

    // Exact n-gram Jaccard pairs (relational formulation). The fixed-id
    // slice (doc_id < 300) bounds the VERIFY cost — exact all-pairs jaccard
    // within shared-shingle blocks grows quadratically with docs sharing a
    // frequent bigram, in DuckDB and Spark alike — at a constant 300 docs
    // regardless of sf (ids are dense, so sf scales row count, not the id
    // range). The operator itself is unbounded: its corpus-scale role is
    // exact verification of LSH-bucketed candidates (dedup_minhash /
    // fuzzyDedup), never corpus-wide all-pairs.
    // Shingle document-frequency histogram: the tuning report behind
    // every df-capped dedup rail — how many distinct 3-gram shingles
    // sit at df=1/2/3-10/11-100/>100, and how many postings each band
    // carries (where the self-join volume lives). Two hash aggregates.
    "dedup_shingle_df_hist" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .where(col("text").isNotNull && trim(col("text")) =!= "")
      val sh = Graft.spread(docs)
        .select(col("doc_id"),
          explode(graft.functions.Text.wordShingles(col("text"), 3)).as("sh"))
        .distinct()
      sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .select(when(col("df") === 1, "df=1")
          .when(col("df") === 2, "df=2")
          .when(col("df") <= 10, "df=3-10")
          .when(col("df") <= 100, "df=11-100")
          .otherwise("df>100").as("bucket"), col("df"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_shingles"), sum("df").as("n_postings"))
        .orderBy("bucket")
    }),

    "dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(
        t(s, d, "documents").where(col("doc_id") < 300), "text", "doc_id",
        shingleK = 2, minJaccard = 0.05)
        .orderBy("id_a", "id_b")),

    // Asymmetric containment pairs — |A∩B|/|A| per direction — the
    // quote/boilerplate subsumption detector Jaccard misses when one
    // side dwarfs the other. Same single-computation shingle pipeline
    // and scale rails as dedup_ngram_jaccard.
    "dedup_containment" -> ((s, d) =>
      Dedup.containmentPairs(
        t(s, d, "documents").where(col("doc_id") < 300), "text", "doc_id",
        shingleK = 2, minContainment = 0.4)
        .orderBy("id_a", "id_b")),

    // Threshold-calibration sweep for the near-dup cutoff: pair and doc
    // counts an exact-Jaccard pass would flag at each candidate
    // threshold, decided by the exact integer predicate
    // 100·inter >= t·union — the report a pipeline reads before
    // committing a dedup threshold.
    "dedup_threshold_sweep" -> ((s, d) =>
      Dedup.jaccardThresholdSweep(
        t(s, d, "documents").where(col("doc_id") < 300), "text", "doc_id",
        shingleK = 2, thresholdsPct = Seq(5L, 10L, 25L, 50L, 75L, 90L, 100L))
        .orderBy("t_pct")),

    // Prefix-filtered exact Jaccard join (AllPairs/PPJoin): rarest-first
    // canonical order, prefix-token candidates, length filter, exact
    // intersection count — complete by theorem, no banding probability.
    "dedup_prefix_jaccard" -> ((s, d) =>
      Dedup.prefixJaccardPairs(
        t(s, d, "documents").where(col("doc_id") < 300), "text", "doc_id",
        minJaccard = 0.8)
        .orderBy("id_a", "id_b")),

    // Winnowed document fingerprints (MOSS): per-window rightmost-min of
    // the ordered 2-gram hash sequence, via the packed-key window MIN both
    // engines replay bit-for-bit. Every non-empty doc fingerprints.
    "dedup_winnow_fp" -> ((s, d) =>
      graft.ops.Winnow.fingerprints(
        t(s, d, "documents"), "text", "doc_id", shingleK = 2, window = 4)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "fp_pos", "fp")),

    // Contamination screen over winnowed fingerprints: doc pairs sharing
    // >= 3 distinct fingerprint hashes. Pair generation explodes each
    // fingerprint's df-capped doc list — the text pipeline plans once.
    "dedup_winnow" -> ((s, d) =>
      graft.ops.Winnow.sharedPairs(
        t(s, d, "documents"), "text", "doc_id", shingleK = 2, window = 4,
        minShared = 3, maxFpDf = 10000)
        .orderBy("id_a", "id_b")),

    // Sorted-neighborhood candidate pairs (multi-pass SNM family): block by
    // source, order by a 16-char raw text prefix (binary collation — both
    // engines compare UTF-8 bytes; no case folding, which IS
    // collation-sensitive), pair each doc with its 2 predecessors. One
    // exchange + one sort, no self-join (plan asserted in PlanShapeSpec).
    "dedup_sorted_neighborhood" -> ((s, d) =>
      Dedup.sortedNeighborhood(
        t(s, d, "documents"), "doc_id",
        coalesce(substring(col("text"), 1, 16), lit("")), col("source"),
        window = 3)
        .orderBy("block", "id_b", "dist")),

    // Multi-pass SNM: pass 1 blocks by source and sorts by text prefix
    // (the single-pass entry's ordering); pass 2 blocks by lang and sorts
    // by zero-padded length + the NEXT 16 chars — a pair whose prefixes
    // diverge but whose bodies agree survives pass 2. Canonical pairs
    // merge with (n_passes, min_dist).
    "dedup_snm_multipass" -> ((s, d) =>
      Dedup.multiPassSortedNeighborhood(
        t(s, d, "documents"), "doc_id",
        Seq(
          (coalesce(substring(col("text"), 1, 16), lit("")), col("source")),
          (concat(lpad(coalesce(col("n_chars"), lit(0L)).cast("string"), 6, "0"),
            coalesce(substring(col("text"), 17, 16), lit(""))), col("lang"))),
        window = 3)
        .orderBy("id_a", "id_b")),

    // MinHash calibration report: per SNM candidate pair, the 16-slot
    // signature-agreement estimate NEXT TO the exact 3-gram Jaccard it
    // estimates — the est-vs-truth audit run before trusting LSH banding
    // thresholds. Agreement and set counts are exact integers; the two
    // mirrored divisions happen last (union 0 -> NULL exact, both
    // engines).
    "dedup_minhash_calibration" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val pairs = Dedup.sortedNeighborhood(docs, "doc_id",
        coalesce(substring(col("text"), 1, 16), lit("")), col("source"),
        window = 3).select("id_a", "id_b")
      val sigs = Dedup.minhashSignatures(docs, "text", "doc_id",
        numHashes = 16, shingleK = 3)
      val agree = pairs
        .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sa")),
          Seq("id_a"))
        .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sb")),
          Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          expr("aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1L, 0L))," +
            " 0L, (acc, v) -> acc + v)").as("n_agree"))
      val sh = docs.where(col("text").isNotNull && trim(col("text")) =!= "")
        .select(col("doc_id"), explode(Text.wordShingles(col("text"), 3))
          .as("sh"))
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = pairs
        .join(sh.withColumnRenamed("doc_id", "id_a"), Seq("id_a"))
        .join(sh.withColumnRenamed("doc_id", "id_b"), Seq("id_b", "sh"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
      agree
        .join(sizes.select(col("doc_id").as("id_a"), col("n").as("n_a")),
          Seq("id_a"), "left")
        .join(sizes.select(col("doc_id").as("id_b"), col("n").as("n_b")),
          Seq("id_b"), "left")
        .join(inter, Seq("id_a", "id_b"), "left")
        .select(col("id_a"), col("id_b"), col("n_agree"),
          coalesce(col("n_a"), lit(0L)).as("n_a"),
          coalesce(col("n_b"), lit(0L)).as("n_b"),
          coalesce(col("n_inter"), lit(0L)).as("n_inter"))
        .withColumn("est", col("n_agree").cast("double") / lit(16.0))
        .withColumn("exact_jaccard", col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
        .orderBy("id_a", "id_b")
    }),

    // Connected components over candidate pairs (the fuzzy-dedup cluster
    // collapse): sorted-neighborhood pairs chain consecutive docs inside a
    // block, so whole blocks form single chain components — the diameter
    // stress case pointer jumping exists for. The oracle computes TRUE
    // reachability closure with a recursive CTE.
    "dedup_components" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val pairs = Dedup.sortedNeighborhood(docs, "doc_id",
        coalesce(substring(col("text"), 1, 16), lit("")), col("source"),
        window = 3)
        .select("id_a", "id_b")
      Dedup.clusterNearDups(docs.select(col("doc_id").as("id")), pairs,
        "id", maxIters = 25)
        .orderBy("id")
    }),

    // Keep-list materialization over the near-dup clusters: the
    // alternating-star component label IS the cluster's min id, so the
    // canonical representative is the label itself — one size aggregate
    // and a component-keyed join produce the per-doc keep verdict a
    // dedup pipeline actually applies.
    "dedup_representatives" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val pairs = Dedup.sortedNeighborhood(docs, "doc_id",
        coalesce(substring(col("text"), 1, 16), lit("")), col("source"),
        window = 3)
        .select("id_a", "id_b")
      val comp = Dedup.clusterNearDups(docs.select(col("doc_id").as("id")),
        pairs, "id", maxIters = 25)
      val sizes = comp.groupBy("component")
        .agg(count(lit(1)).as("cluster_size"))
      comp.join(sizes, Seq("component"))
        .select(col("id"), col("component"),
          (col("id") === col("component")).as("is_kept"),
          col("cluster_size"))
        .orderBy("id")
    }),

    // Dedup run report: the cluster-size profile of the near-dup
    // components — clusters per size, docs they hold, and docs a
    // keep-one-representative pass would drop. Exact integers end to end
    // (two count aggregates over the component labels), so the recursive
    // reachability oracle replays it bit-for-bit.
    "dedup_cluster_stats" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val pairs = Dedup.sortedNeighborhood(docs, "doc_id",
        coalesce(substring(col("text"), 1, 16), lit("")), col("source"),
        window = 3)
        .select("id_a", "id_b")
      Dedup.clusterNearDups(docs.select(col("doc_id").as("id")), pairs,
        "id", maxIters = 25)
        .groupBy("component").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
        .select(col("cluster_size"), col("n_clusters"),
          (col("cluster_size") * col("n_clusters")).as("n_docs"),
          ((col("cluster_size") - 1) * col("n_clusters")).as("n_dropped"))
        .orderBy("cluster_size")
    }),

    // Partitioned table layout: write partitioned by source, read back
    // with a partition filter — the scan must prune to ONE directory
    // (partition pruning is the file-level analogue of predicate
    // pushdown; plan-asserted in PlanShapeSpec).
    "s8_partitioned_scan" -> ((s, d) => {
      val tmp = scratch("part_scan", d) { out =>
        t(s, d, "documents").write.mode("overwrite")
          .partitionBy("source").parquet(out)
      }
      s.read.parquet(tmp)
        .where(col("source") === "src3")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // Frequent co-occurring event-type pairs per user (market-basket /
    // itemset mining): per-entity distinct items self-joined — bounded by
    // items-per-entity (5 types here), never corpus x corpus.
    "mine_pairs" -> ((s, d) => {
      val it = t(s, d, "events").where(col("user_id") <= 500)
        .select(col("user_id"), col("event_type")).distinct()
      it.as("a").join(it.as("b"), Seq("user_id"))
        .where(col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("item_a"),
          col("b.event_type").as("item_b"))
        .agg(count(lit(1)).as("support"))
        .where(col("support") >= 10)
        .orderBy("item_a", "item_b")
    }),

    // Association rules over the same user->event-type baskets as
    // mine_pairs: every directed rule a=>b with support >= 10, confidence
    // and lift as truncating integer nanos (support*1e9 DIV n_a and
    // support*n_baskets*1e9 DIV (n_a*n_b)) — exact, totally ordered, and
    // bit-replayable without a float anywhere. Item counts and the basket
    // total ride in on broadcast joins; the pair support is the one real
    // shuffle.
    "mine_assoc_rules" -> ((s, d) => {
      val it = t(s, d, "events").where(col("user_id") <= 500)
        .select(col("user_id"), col("event_type")).distinct()
      val items = it.groupBy(col("event_type")).agg(count(lit(1)).as("n_item"))
      val nb = it.select(col("user_id")).distinct()
        .agg(count(lit(1)).as("n_baskets"))
      val pairs = it.as("a").join(it.as("b"), Seq("user_id"))
        .where(col("a.event_type") =!= col("b.event_type"))
        .groupBy(col("a.event_type").as("antecedent"),
          col("b.event_type").as("consequent"))
        .agg(count(lit(1)).as("support"))
        .where(col("support") >= 10)
      pairs
        .join(broadcast(items.select(col("event_type").as("antecedent"),
          col("n_item").as("n_a"))), Seq("antecedent"))
        .join(broadcast(items.select(col("event_type").as("consequent"),
          col("n_item").as("n_c"))), Seq("consequent"))
        .crossJoin(broadcast(nb))
        .select(col("antecedent"), col("consequent"), col("support"),
          col("n_a"), col("n_c"),
          expr("support * 1000000000L DIV n_a").as("conf_nano"),
          expr("support * n_baskets * 1000000000L DIV (n_a * n_c)")
            .as("lift_nano"))
        .orderBy("antecedent", "consequent")
    }),

    // Frequent length-3 event sequences: consecutive per-user trigrams
    // over the (ts, event_id, event_type) total order, with occurrence
    // and distinct-user support — the sequence-mining step past
    // mine_transitions' bigrams. Output bounded by |event types|^3.
    "mine_trigrams" -> ((s, d) => {
      val ev = t(s, d, "events").where(col("user_id").isNotNull &&
        col("ts").isNotNull && col("event_type").isNotNull &&
        col("event_id").isNotNull)
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"), col("event_type"))
      ev.withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .where(col("e2").isNotNull && col("e3").isNotNull)
        .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
        .agg(count(lit(1)).as("n_occ"),
          count_distinct(col("user_id")).as("n_users"))
        .orderBy("e1", "e2", "e3")
    }),

    // First-order Markov transition matrix over per-user event
    // sequences: P(next = dst | cur = src) with exact n/n_src division.
    // One window pass on the (user_id) exchange (lead over the fully
    // deterministic (ts, event_id, event_type) order), one (src, dst)
    // hash aggregate, row totals joined back by broadcast — the
    // sequence-model counterpart of mine_pairs' co-occurrence support.
    "mine_transitions" -> ((s, d) => {
      val ev = t(s, d, "events").where(col("user_id").isNotNull &&
        col("ts").isNotNull && col("event_type").isNotNull &&
        col("event_id").isNotNull)
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"), col("event_type"))
      val trans = ev
        .withColumn("dst", lead(col("event_type"), 1).over(w))
        .where(col("dst").isNotNull)
        .groupBy(col("event_type").as("src"), col("dst"))
        .agg(count(lit(1)).as("n"))
      val tot = trans.groupBy("src").agg(sum(col("n")).as("n_src"))
      trans.join(broadcast(tot), Seq("src"))
        .select(col("src"), col("dst"), col("n"),
          (col("n").cast("double") / col("n_src").cast("double")).as("p"))
        .orderBy("src", "dst")
    }),

    // Duplicated-passage detection (substring-level dedup): maximal token
    // spans whose every 5-gram window occurs >= 2 times corpus-wide —
    // the relational form of suffix-based span dedup (vs the doc-level
    // dedup_* family). Spans merge via gaps-and-islands per doc.
    "dedup_passages" -> ((s, d) =>
      Dedup.duplicatedPassages(t(s, d, "documents"), "text", "doc_id", k = 5)
        .orderBy("id", "span_start")),

    // Time-series gap fill: per-user daily totals densified onto each
    // user's own [min, max] day spine; gap days get n = 0 and carry the
    // last observed total forward (one window pass; IGNORE NULLS
    // last_value on both engines).
    "ts_gapfill" -> ((s, d) => {
      val daily = t(s, d, "events").where(col("user_id") <= 20)
        .select(col("user_id"),
          date_trunc("day", Graft.nanosToTimestamp("ts")).cast("date").as("day"),
          cents(col("value")).as("vc"))
        .groupBy("user_id", "day")
        .agg(count(lit(1)).as("n"),
          (sum(col("vc")).cast("double") / 100).as("v"))
      graft.ops.GapFill.dailyGapFill(daily, "user_id", "day", "v")
        .select(col("user_id"), col("day").cast("string").as("day"),
          coalesce(col("n"), lit(0L)).as("n"), col("v_ffill"))
        .orderBy("user_id", "day")
    }),

    // Calendar-correct rolling 7-day totals: ROWS frames only mean
    // "trailing week" on a DENSE spine (on raw observations, 6 PRECEDING
    // is 7 observations, not 7 days) — so densify first, then one window
    // pass. Cents stay integer through the rolling sum (order-free).
    // Rolling 7-observation median per user (robust smoothing — the
    // outlier-proof twin of ts_rolling's trailing sum): exact R-7
    // percentile over a ROWS frame on the deterministic (ts, event_id)
    // order. One window pass on the user exchange.
    "ts_rolling_median" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"), col("value")).rowsBetween(-6, 0)
      t(s, d, "events")
        .where(col("user_id") <= 50 && col("ts").isNotNull &&
          col("event_id").isNotNull)
        .select(col("user_id"), col("event_id"),
          expr("percentile(value, 0.5)")
            .over(w).as("roll_median"))
        .orderBy("user_id", "event_id")
    }),

    // Winsorization: clip value at the per-type exact [p05, p95] band
    // (the standard outlier clamp before feature scaling). Cuts are a
    // k-row aggregate broadcast back; the clamp is map-side.
    "f12_winsorize" -> ((s, d) => {
      val ev = t(s, d, "events")
        .where(col("value").isNotNull && col("event_id").isNotNull)
      val cuts = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.05)").as("lo"),
          expr("percentile(value, 0.95)").as("hi"))
      ev.join(broadcast(cuts), Seq("event_type"))
        .select(col("event_id"), col("event_type"), col("value"),
          least(greatest(col("value"), col("lo")), col("hi")).as("value_wins"))
        .orderBy("event_id")
    }),

    "ts_rolling" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, d, "events").where(col("user_id") <= 20)
        .select(col("user_id"),
          date_trunc("day", Graft.nanosToTimestamp("ts")).cast("date").as("day"),
          cents(col("value")).as("vc"))
        .groupBy("user_id", "day")
        .agg(sum(col("vc")).as("vc"))
      val filled = graft.ops.GapFill.dailySpine(daily, "user_id", "day")
        .join(daily, Seq("user_id", "day"), "left")
      val w7 = Window.partitionBy("user_id").orderBy("day").rowsBetween(-6, 0)
      filled.select(col("user_id"), col("day").cast("string").as("day"),
          (sum(coalesce(col("vc"), lit(0L))).over(w7).cast("double") / 100)
            .as("roll_sum"),
          count(col("vc")).over(w7).as("roll_days"))
        .orderBy("user_id", "day")
    }),

    // Linear interpolation across spine gaps (vs ts_gapfill's carry-
    // forward): gap days get the straight line between the surrounding
    // observations; the leading/trailing edges stay NULL.
    "ts_interp" -> ((s, d) => {
      val daily = t(s, d, "events").where(col("user_id") <= 20)
        .select(col("user_id"),
          date_trunc("day", Graft.nanosToTimestamp("ts")).cast("date").as("day"),
          cents(col("value")).as("vc"))
        .groupBy("user_id", "day")
        .agg((sum(col("vc")).cast("double") / 100).as("v"))
      graft.ops.GapFill.dailyInterp(daily, "user_id", "day", "v")
        .select(col("user_id"), col("day").cast("string").as("day"),
          col("v_interp"))
        .orderBy("user_id", "day")
    }),

    // Last-touch attribution: each purchase credits the user's most
    // recent non-purchase event within a 7-day lookback — one per-user
    // window pass over the event stream (two IGNORE NULLS lasts on the
    // same total (us, event_id) order pick fields off the same row), no
    // conversions x touchpoints self-join.
    "attr_last_touch" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events")
        .where(col("ts").isNotNull && col("event_id").isNotNull)
        .select(col("user_id"), col("event_id"),
          expr("ts DIV 1000").as("us"), col("event_type"))
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      ev
        .withColumn("attr_us",
          last(when(col("event_type") =!= "purchase", col("us")),
            ignoreNulls = true).over(w))
        .withColumn("attr_type",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
        .where(col("event_type") === "purchase")
        .withColumn("channel",
          when(col("attr_us").isNotNull &&
            col("us") - col("attr_us") <= lit(604800000000L), col("attr_type"))
            .otherwise(lit("none")))
        .groupBy("channel").agg(count(lit(1)).as("n_conversions"))
        .orderBy("channel")
    }),

    // First-touch attribution: each purchase credits the EARLIEST
    // non-purchase event inside the 7-day lookback. The lookback is a
    // RANGE frame (value bounds — identical peer handling on both
    // engines); "earliest" is a lexicographic MIN over a zero-padded
    // (us, event_id, type) encoding, because first_value over a RANGE
    // frame is tie-ambiguous where two touches share a microsecond.
    "attr_first_touch" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events")
        .where(col("ts").isNotNull && col("event_id").isNotNull)
        .select(col("user_id"), col("event_id"),
          expr("ts DIV 1000").as("us"), col("event_type"))
      val w = Window.partitionBy("user_id").orderBy(col("us"))
        .rangeBetween(-604800000000L, -1)
      ev
        .withColumn("first_touch",
          min(when(col("event_type") =!= "purchase",
            concat(lpad(col("us").cast("string"), 20, "0"), lit("|"),
              lpad(col("event_id").cast("string"), 12, "0"), lit("|"),
              col("event_type")))).over(w))
        .where(col("event_type") === "purchase")
        .withColumn("channel",
          coalesce(element_at(split(col("first_touch"), "\\|"), 3),
            lit("none")))
        .groupBy("channel").agg(count(lit(1)).as("n_conversions"))
        .orderBy("channel")
    }),

    // Cumulative distinct users per day WITHOUT a windowed
    // COUNT(DISTINCT) (Spark has none, and the naive day x user
    // re-aggregation is O(days x users)): each user collapses to their
    // FIRST day (one hash agg), daily new-user counts densify onto the
    // event-day spine, and one running sum finishes it.
    "w7_running_distinct" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val days = t(s, d, "events")
        .select(date_trunc("day", Graft.nanosToTimestamp("ts"))
          .cast("date").as("day"))
        .distinct()
      val firstSeen = t(s, d, "events")
        .groupBy("user_id")
        .agg(min(date_trunc("day", Graft.nanosToTimestamp("ts")).cast("date"))
          .as("day"))
        .groupBy("day").agg(count(lit(1)).as("n_new"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      days.join(firstSeen, Seq("day"), "left")
        .select(col("day").cast("string").as("day"),
          coalesce(col("n_new"), lit(0L)).as("n_new"),
          sum(coalesce(col("n_new"), lit(0L))).over(w).as("n_cum"))
        .orderBy("day")
    }),

    // Time-decay multi-touch attribution: every purchase credits ALL
    // non-purchase touches in its 7-day lookback, weighted 2^-(full days
    // back) — weight_nano = 1e9 >> d is exact, the per-conversion
    // normalization is truncating integer division, and channel credit is
    // a SUM of those integers (order-free, bit-replayable). The
    // touch-to-conversion pairing reuses the bucketed range join (one
    // day-bucket explode instead of a per-user cross product), so hot
    // users never quadratically explode at scale. Conversions with no
    // touch in window credit 'none' with their full 1e9.
    "attr_time_decay" -> ((s, d) => {
      val ev = t(s, d, "events")
        .where(col("ts").isNotNull && col("event_id").isNotNull)
        .select(col("user_id"), col("event_id"),
          expr("ts DIV 1000").as("us"), col("event_type"))
      val touches = ev.where(col("event_type") =!= "purchase")
        .select(col("user_id"), col("us").as("t_us"),
          col("event_type").as("t_type"))
      val purch = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_eid"),
          col("us").as("p_us"),
          (col("us") - 604800000000L).as("start_us"),
          (col("us") - 1).as("end_us"))
      val pairs = graft.ops.RangeJoin.bucketedRangeJoin(
          touches, purch, Seq("user_id"), "t_us", "start_us", "end_us",
          bucket = 86400000000L)
        .withColumn("d", expr("(p_us - t_us) DIV 86400000000L"))
        .withColumn("w_nano",
          expr("1000000000L DIV shiftleft(1L, CAST(d AS INT))"))
      val tot = pairs.groupBy("user_id", "p_eid")
        .agg(sum("w_nano").as("tw"))
      val credited = pairs.join(tot, Seq("user_id", "p_eid"))
        .select(col("t_type").as("channel"),
          expr("w_nano * 1000000000L DIV tw").as("credit"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_touches"), sum("credit").as("credit_nano"))
      val none = purch
        .join(pairs.select("user_id", "p_eid").distinct(),
          Seq("user_id", "p_eid"), "left_anti")
        .agg(count(lit(1)).as("n"))
        .select(lit("none").as("channel"), lit(0L).as("n_touches"),
          (col("n") * 1000000000L).as("credit_nano"))
      credited.unionByName(none).orderBy("channel")
    }),

    // Per-key exponential time-decay feature (EWMA, alpha = 1/2) as an
    // integer-exact weighted sum: lag j carries weight 2^-(j+1), so the
    // cents value times 2^(19-j) accumulates in plain BIGINT arithmetic
    // both engines replay exactly, and ONE mirrored IEEE division
    // (by 2^20 * 100) descales at the end — no running float product, no
    // transcendentals. The tail beyond 20 lags weighs < 2^-21 and is
    // truncated by design: state is one window pass with 20 lags over
    // the (us, event_id) total order — O(1) per row, partition-local per
    // user, so the plan is a single per-key sort at any scale.
    "w8_ewma" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events")
        .where(col("ts").isNotNull && col("event_id").isNotNull &&
          col("user_id") <= 30)
        .select(col("user_id"), col("event_id"),
          expr("ts DIV 1000").as("us"), cents(col("value")).as("vc"))
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val weighted = (coalesce(col("vc"), lit(0L)) * lit(1L << 19)) +:
        (1 until 20).map { j =>
          coalesce(lag(col("vc"), j).over(w), lit(0L)) * lit(1L << (19 - j))
        }
      ev.select(col("user_id"), col("event_id"),
          (weighted.reduce(_ + _).cast("double") / 104857600.0).as("ewma"))
        .orderBy("user_id", "event_id")
    }),

    // Time-RANGE window frame (vs w5's ROWS frames): per-user trailing
    // 1-day sum/count over the microsecond event timeline. RANGE peers
    // (ts ties) share a frame, so the result is layout-independent.
    "w6_time_range" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
        .rangeBetween(-86400000000L, 0L)
      t(s, d, "events").where(col("user_id") <= 100)
        .select(col("event_id"), col("user_id"),
          expr("ts DIV 1000").as("ts_us"), col("value"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          (sum(cents(col("value"))).over(w).cast("double") / 100).as("trail_sum"),
          count(lit(1)).over(w).cast("long").as("trail_n"))
        .orderBy("event_id")
    }),

    // Per-group z-score normalization (feature standardization): exact
    // decimal moment sums broadcast back; the scoring pass is map-side.
    "f10_zscore" -> ((s, d) => {
      val q = col("l_quantity").cast(DecimalType(18, 2))
      val stats = t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(q).cast("double").as("sx"),
          sum(q * q).cast("double").as("sxx"))
      val nd = col("n").cast("double")
      val mean = col("sx") / nd
      val sd = sqrt((col("sxx") - col("sx") * col("sx") / nd) / (nd - 1.0))
      t(s, d, "lineitem").where(col("l_orderkey") <= 2000)
        .join(broadcast(stats), Seq("l_returnflag"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          round((col("l_quantity") - mean) / sd, 9).as("z"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Robust (median/MAD) anomaly detection per event type: the
    // heavy-tail-safe twin of f10_zscore. percentile + the same double
    // expression tree both engines; MAD=0 groups and NULL values never
    // flag.
    "ts_anomaly_mad" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      graft.ops.Anomaly.madOutliers(ev, Seq("event_type"), "value",
        cutoff = 3.0)
        .select("event_id", "event_type", "value", "med", "mad", "robust_z")
        .orderBy("event_type", "event_id")
    }),

    // Weekly seasonal profile of event values per type: period position =
    // (epoch-day) % 7, seasonal mean / global deviation / mean absolute
    // residual all as truncating integer nanos (Seasonal.profile). The
    // dense synthetic stream gives every (type, dow) cell mass.
    "ts_seasonal" -> ((s, d) => {
      val ev = t(s, d, "events")
        .where(col("ts").isNotNull && col("value").isNotNull)
        .select(col("event_type"),
          expr("(ts DIV 86400000000000L) % 7").as("dow"),
          expr("CAST(round(value * 1e9) AS BIGINT)").as("v_nano"))
      graft.ops.Seasonal.profile(ev, "event_type", "dow", "v_nano")
        .orderBy("event_type", "dow")
    }),

    // CUSUM change-point report per event type: running sum of
    // (value - series mean) in exact integer nanos over the (us,
    // event_id) total order; the change point is the row maximizing
    // |cusum| (ties to the smaller event_id via a struct-min argmax, not
    // a window sort). Integer mean division truncates identically on
    // both engines (Spark DIV == DuckDB //), so signs agree.
    "ts_cusum" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events")
        .where(col("ts").isNotNull && col("event_id").isNotNull &&
          col("value").isNotNull && col("event_type").isNotNull)
        .select(col("event_type"), col("event_id"),
          expr("ts DIV 1000").as("us"),
          expr("CAST(round(value * 1e9) AS BIGINT)").as("v"))
      val mean = ev.groupBy("event_type")
        .agg(expr("sum(v) DIV count(1)").as("mean_nano"),
          count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type")
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.join(broadcast(mean), Seq("event_type"))
        .withColumn("cusum", sum(col("v") - col("mean_nano")).over(w))
        .groupBy("event_type")
        .agg(max("n").as("n_rows"),
          min(struct((-abs(col("cusum"))).as("na"),
            col("event_id").as("eid"), col("cusum").as("cv"))).as("m"))
        .select(col("event_type"), col("n_rows"),
          col("m.eid").as("cp_event_id"), col("m.cv").as("cp_cusum_nano"))
        .orderBy("event_type")
    }),

    // Peak concurrency via the sweep line: each event opens a 30-minute
    // session; +1/-1 deltas ordered by (t, delta, event_id) — ends sort
    // before starts at the same instant, so touching sessions never
    // overcount — and the peak is the max running sum with its earliest
    // time (struct-min argmax). Exact integers end to end.
    "ts_concurrency" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events")
        .where(col("ts").isNotNull && col("event_id").isNotNull &&
          col("event_type").isNotNull)
        .select(col("event_type"), expr("ts DIV 1000").as("s_us"),
          col("event_id"))
      val deltas = ev.select(col("event_type"), col("s_us").as("t"),
          lit(1L).as("d"), col("event_id"))
        .unionByName(ev.select(col("event_type"),
          (col("s_us") + 1800000000L).as("t"), lit(-1L).as("d"),
          col("event_id")))
      val w = Window.partitionBy("event_type")
        .orderBy(col("t"), col("d"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deltas.withColumn("run", sum(col("d")).over(w))
        .groupBy("event_type")
        .agg(min(struct((-col("run")).as("nr"), col("t").as("pt"),
          col("event_id").as("pe"))).as("m"))
        .select(col("event_type"), (-col("m.nr")).as("peak_concurrency"),
          col("m.pt").as("peak_t_us"))
        .orderBy("event_type")
    }),

    // Integer autocorrelation at lags 1..3 per event type: values snap to
    // whole units, residuals center on the floor mean, and
    // acf_nano = sum(r_t * r_{t+l}) * 1e9 DIV sum(r_t^2) is exact
    // BIGINT end to end (both engines truncate integer division toward
    // zero, so negative ACF agrees). Unit snap keeps num*1e9 inside
    // BIGINT through sf0.1;
    // beyond that the sums move to DECIMAL(38,0), same plan. Constant
    // series (den = 0) report NULL.
    "ts_acf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events")
        .where(col("ts").isNotNull && col("event_id").isNotNull &&
          col("value").isNotNull && col("event_type").isNotNull)
        .select(col("event_type"), col("event_id"),
          expr("ts DIV 1000").as("us"),
          expr("CAST(round(value) AS BIGINT)").as("vu"))
      val mean = ev.groupBy("event_type")
        .agg(expr("sum(vu) DIV count(1)").as("mu"))
      val w = Window.partitionBy("event_type").orderBy(col("us"), col("event_id"))
      val r = ev.join(broadcast(mean), Seq("event_type"))
        .withColumn("r", col("vu") - col("mu"))
        .withColumn("r1", lead(col("r"), 1).over(w))
        .withColumn("r2", lead(col("r"), 2).over(w))
        .withColumn("r3", lead(col("r"), 3).over(w))
      r.groupBy("event_type").agg(
          sum(col("r") * col("r")).as("den"),
          sum(col("r") * col("r1")).as("num1"), count(col("r1")).as("c1"),
          sum(col("r") * col("r2")).as("num2"), count(col("r2")).as("c2"),
          sum(col("r") * col("r3")).as("num3"), count(col("r3")).as("c3"))
        .select(col("event_type"), col("den"), explode(array(
          struct(lit(1L).as("lag"), col("num1").as("num"),
            col("c1").as("n_pairs")),
          struct(lit(2L).as("lag"), col("num2").as("num"),
            col("c2").as("n_pairs")),
          struct(lit(3L).as("lag"), col("num3").as("num"),
            col("c3").as("n_pairs")))).as("s"))
        .select(col("event_type"), col("s.lag").as("lag"),
          col("s.n_pairs").as("n_pairs"),
          when(col("den") > 0, expr("s.num * 1000000000L DIV den"))
            .as("acf_nano"))
        .orderBy("event_type", "lag")
    }),

    // Order-independent table content checksum (replication / migration
    // verification): bit_xor of stable row hashes + row count per table.
    // XOR is commutative-associative, so any partitioning agrees; doubles
    // enter the digest as exact cents, never as formatted strings.
    "q_table_checksum" -> ((s, d) => {
      def ck(name: String, df: DataFrame, key: Column) =
        df.select(StableHash.hash60(key).as("h"))
          .agg(expr("bit_xor(h)").as("xor_sig"), count(lit(1)).as("n_rows"))
          .select(lit(name).as("table_name"), col("xor_sig"), col("n_rows"))
      ck("nation", t(s, d, "nation"),
        concat_ws("|", col("n_nationkey"), col("n_name"), col("n_regionkey")))
        .unionByName(ck("region", t(s, d, "region"),
          concat_ws("|", col("r_regionkey"), col("r_name"))))
        .unionByName(ck("supplier", t(s, d, "supplier"),
          concat_ws("|", col("s_suppkey"), col("s_name"), col("s_nationkey"),
            cents(col("s_acctbal")))))
        .orderBy("table_name")
    }),

    // PageRank, two exact-integer iterations over a derived 1000-node
    // graph (out-degree 2 per source). Integer nano-arithmetic end to end
    // -> the oracle replays BOTH iterations in plain SQL, bit-exact.
    "graph_pagerank" -> ((s, d) => {
      val base = t(s, d, "part").where(col("p_partkey") <= 1000)
      val edges = base.select(col("p_partkey").as("src"),
        expr("(p_partkey * 31 + 7) % 1000").as("dst"))
        .unionByName(base.select(col("p_partkey").as("src"),
          expr("(p_partkey * 17 + 3) % 1000").as("dst")))
      graft.ops.Graph.pageRank(edges, iterations = 2).orderBy("id")
    }),

    // Per-node triangle counts on the same deterministic graph — the
    // clustering-coefficient numerator (see Graph.triangleCounts).
    "graph_triangles" -> ((s, d) => {
      val base = t(s, d, "part").where(col("p_partkey") <= 1000)
      val edges = base.select(col("p_partkey").as("src"),
        expr("(p_partkey * 31 + 7) % 1000").as("dst"))
        .unionByName(base.select(col("p_partkey").as("src"),
          expr("(p_partkey * 17 + 3) % 1000").as("dst")))
      graft.ops.Graph.triangleCounts(edges).orderBy("id")
    }),

    // Local clustering coefficient per node: 2·triangles/(deg·(deg−1))
    // as truncating integer nanos over the exact triangle counts and
    // degrees (NULL below degree 2) — the node-level community-density
    // signal composing triangleCounts with one degree aggregate.
    "graph_clustering_coeff" -> ((s, d) => {
      val base = t(s, d, "part").where(col("p_partkey") <= 1000)
      val edges = base.select(col("p_partkey").as("src"),
        expr("(p_partkey * 31 + 7) % 1000").as("dst"))
        .unionByName(base.select(col("p_partkey").as("src"),
          expr("(p_partkey * 17 + 3) % 1000").as("dst")))
      val tri = graft.ops.Graph.triangleCounts(edges)
      val e = edges.select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .where(col("a").isNotNull && col("b").isNotNull &&
          col("a") =!= col("b")).distinct()
      val deg = e.select(col("a").as("id"))
        .unionByName(e.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      tri.join(deg, Seq("id"))
        .select(col("id"), col("deg"), col("n_triangles"),
          when(col("deg") >= 2,
            expr("n_triangles * 2000000000L DIV (deg * (deg - 1))"))
            .as("coeff_nano"))
        .orderBy("id")
    }),

    // Personalized PageRank on the same graph: teleport restricted to
    // the seed nodes (ids < 10), two exact nano-integer iterations —
    // graph-proximity-to-a-trusted-subset scoring, replayed in SQL.
    "graph_ppr" -> ((s, d) => {
      val base = t(s, d, "part").where(col("p_partkey") <= 1000)
      val edges = base.select(col("p_partkey").as("src"),
        expr("(p_partkey * 31 + 7) % 1000").as("dst"))
        .unionByName(base.select(col("p_partkey").as("src"),
          expr("(p_partkey * 17 + 3) % 1000").as("dst")))
      val seeds = base.where(col("p_partkey") < 10)
        .select(col("p_partkey").as("id"))
      graft.ops.Graph.personalizedPageRank(edges, seeds, iterations = 2)
        .orderBy("id")
    }),

    // Link prediction on the same graph: neighbor-Jaccard over
    // non-adjacent distance-2 pairs, top-50 by exact integer-nano
    // coefficient (ties by pair id) — see Graph.jaccardLinks.
    "graph_jaccard_links" -> ((s, d) => {
      val base = t(s, d, "part").where(col("p_partkey") <= 1000)
      val edges = base.select(col("p_partkey").as("src"),
        expr("(p_partkey * 31 + 7) % 1000").as("dst"))
        .unionByName(base.select(col("p_partkey").as("src"),
          expr("(p_partkey * 17 + 3) % 1000").as("dst")))
      graft.ops.Graph.jaccardLinks(edges)
        .orderBy(col("jacc_nano").desc, col("id_a"), col("id_b")).limit(50)
        .orderBy("id_a", "id_b")
    }),

    // Community detection on the same graph: 3 synchronous rounds of
    // deterministic (min-tie-break) label propagation — finer-grained
    // than connected components; the oracle replays round-by-round.
    "graph_label_prop" -> ((s, d) => {
      val base = t(s, d, "part").where(col("p_partkey") <= 1000)
      val edges = base.select(col("p_partkey").as("src"),
        expr("(p_partkey * 31 + 7) % 1000").as("dst"))
        .unionByName(base.select(col("p_partkey").as("src"),
          expr("(p_partkey * 17 + 3) % 1000").as("dst")))
      graft.ops.Graph.labelPropagation(edges, rounds = 3).orderBy("id")
    }),

    // Three synchronous 2-core peel rounds over the same derived graph:
    // per node, surviving-subgraph degree and the non-null in_core
    // verdict. Fixed round count is part of the contract (the oracle
    // chains exactly three peel CTE stages).
    "graph_kcore" -> ((s, d) => {
      val base = t(s, d, "part").where(col("p_partkey") <= 1000)
      val edges = base.select(col("p_partkey").as("src"),
        expr("(p_partkey * 31 + 7) % 1000").as("dst"))
        .unionByName(base.select(col("p_partkey").as("src"),
          expr("(p_partkey * 17 + 3) % 1000").as("dst")))
      graft.ops.Graph.kCore(edges, k = 2, rounds = 3).orderBy("id")
    }),

    // Community-quality report: Newman modularity of the label-prop
    // communities over the same graph, per community — contribution
    // computed EXACTLY as integer nanos ((4m*e_c - deg_c^2)*1e9 DIV
    // 4m^2, one truncating division per community over pure-integer
    // counts). Total Q = sum of contributions.
    "graph_modularity" -> ((s, d) => {
      val base = t(s, d, "part").where(col("p_partkey") <= 1000)
      val edges = base.select(col("p_partkey").as("src"),
        expr("(p_partkey * 31 + 7) % 1000").as("dst"))
        .unionByName(base.select(col("p_partkey").as("src"),
          expr("(p_partkey * 17 + 3) % 1000").as("dst")))
      val labels = graft.ops.Graph.labelPropagation(edges, rounds = 3)
      val e = edges.select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .where(col("a").isNotNull && col("b").isNotNull &&
          col("a") =!= col("b")).distinct()
      val m = e.agg(count(lit(1)).as("m"))
      val la = labels.select(col("id").as("a"), col("label").as("la"))
      val lb = labels.select(col("id").as("b"), col("label").as("lb"))
      val tagged = e.join(la, Seq("a")).join(lb, Seq("b"))
      val ein = tagged.where(col("la") === col("lb"))
        .groupBy(col("la").as("community"))
        .agg(count(lit(1)).as("e_in"))
      val degc = tagged.select(col("la").as("community"))
        .unionByName(tagged.select(col("lb").as("community")))
        .groupBy("community").agg(count(lit(1)).as("deg_sum"))
      degc.join(ein, Seq("community"), "left")
        .crossJoin(broadcast(m))
        .select(col("community"),
          coalesce(col("e_in"), lit(0L)).as("e_in"), col("deg_sum"),
          // negative contributions are safe: Spark DIV and DuckDB //
          // both truncate toward zero (verified on negative operands)
          expr("(4 * m * coalesce(e_in, 0L) - deg_sum * deg_sum)" +
            " * 1000000000L DIV (4 * m * m)").as("contrib_nano"))
        .orderBy("community")
    }),

    // Degree assortativity over a 300-node slice of the derived graph:
    // with symmetrized directed pairs the Pearson denominator's two
    // sqrt factors coincide, so r is the EXACT integer rational
    // (M·Sxy − Sx²)/(M·Sxx − Sx²) — surfaced as truncating nanos, no
    // float anywhere. The slice keeps num·1e9 inside BIGINT.
    "graph_assortativity" -> ((s, d) => {
      val base = t(s, d, "part").where(col("p_partkey") <= 300)
      val edges = base.select(col("p_partkey").as("src"),
        expr("(p_partkey * 31 + 7) % 300").as("dst"))
        .unionByName(base.select(col("p_partkey").as("src"),
          expr("(p_partkey * 17 + 3) % 300").as("dst")))
      val e = edges.select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .where(col("a").isNotNull && col("b").isNotNull &&
          col("a") =!= col("b")).distinct()
      val adj = e.select(col("a").as("id"), col("b").as("nb"))
        .unionByName(e.select(col("b").as("id"), col("a").as("nb")))
      val deg = adj.groupBy("id").agg(count(lit(1)).as("deg"))
      val pairs = adj
        .join(deg.select(col("id"), col("deg").as("dx")), Seq("id"))
        .join(deg.select(col("id").as("nb"), col("deg").as("dy")), Seq("nb"))
      pairs.agg(count(lit(1)).as("m2"),
          sum("dx").as("sx"), sum(col("dx") * col("dx")).as("sxx"),
          sum(col("dx") * col("dy")).as("sxy"))
        .select(col("m2"), col("sx"), col("sxx"), col("sxy"),
          expr("(m2 * sxy - sx * sx) * 1000000000L" +
            " DIV (m2 * sxx - sx * sx)").as("r_nano"))
    }),

    // Multi-source BFS over the same derived graph: hop distance from the
    // seed set {id < 10} within 4 synchronous rounds, -1 = unreached.
    // The oracle replays it as a depth-bounded recursive walk with a min
    // aggregate (identical by induction on rounds).
    "graph_bfs" -> ((s, d) => {
      val base = t(s, d, "part").where(col("p_partkey") <= 1000)
      val edges = base.select(col("p_partkey").as("src"),
        expr("(p_partkey * 31 + 7) % 1000").as("dst"))
        .unionByName(base.select(col("p_partkey").as("src"),
          expr("(p_partkey * 17 + 3) % 1000").as("dst")))
      val seeds = base.where(col("p_partkey") < 10)
        .select(col("p_partkey").as("id"))
      graft.ops.Graph.bfsDistances(edges, seeds, rounds = 4).orderBy("id")
    }),

    // Pairwise Jensen-Shannon divergence between per-source unigram
    // distributions — the corpus-mixing distance report (which sources
    // are stylistically close / far). The vocabulary is projected to the
    // global top-200 terms (deterministic (count DESC, word) rank), which
    // bounds per-pair state; the log terms are doubles folded in word
    // order via the PSI discipline (sort_array fold == list ORDER BY),
    // so the float sum replays bit-for-bit. At corpus scale the top-V
    // selection swaps to the bounded TopKAgg — same contract.
    "text_js_divergence" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val words = t(s, d, "documents")
        .where(col("text").isNotNull && trim(col("text")) =!= "" &&
          col("source").isNotNull)
        .select(col("source"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .where(col("w") =!= "")
      val vocab = words.groupBy("w").agg(count(lit(1)).as("n"))
        .withColumn("rn",
          row_number().over(Window.orderBy(col("n").desc, col("w"))))
        .where(col("rn") <= 200).select("w")
      val sc = words.join(broadcast(vocab), Seq("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
      val grid = words.select("source").distinct().crossJoin(broadcast(vocab))
      val cnt = grid.join(sc, Seq("source", "w"), "left")
        .select(col("source"), col("w"), coalesce(col("c"), lit(0L)).as("c"))
      val tot = cnt.groupBy("source").agg(sum("c").as("n"))
      val cn = cnt.join(broadcast(tot), Seq("source")).where(col("n") > 0)
      val j = cn.select(col("source").as("source_a"), col("w"),
          col("c").as("ca"), col("n").as("n_a"))
        .join(cn.select(col("source").as("source_b"), col("w"),
          col("c").as("cb"), col("n").as("n_b")), Seq("w"))
        .where(col("source_a") < col("source_b"))
        .withColumn("p", col("ca").cast("double") / col("n_a").cast("double"))
        .withColumn("q", col("cb").cast("double") / col("n_b").cast("double"))
        .withColumn("term",
          when(col("p") > 0, lit(0.5) * col("p") *
            graft.plans.MathLn(col("p") / ((col("p") + col("q")) / lit(2.0))))
            .otherwise(lit(0.0)) +
          when(col("q") > 0, lit(0.5) * col("q") *
            graft.plans.MathLn(col("q") / ((col("p") + col("q")) / lit(2.0))))
            .otherwise(lit(0.0)))
      // 200-term double sums can drift a ulp between engines even in a
      // fixed fold order; surfacing integer nanos absorbs it (the corpus
      // discipline for any cross-engine float reduction this wide).
      j.groupBy("source_a", "source_b", "n_a", "n_b")
        .agg(aggregate(
          sort_array(collect_list(struct(col("w"), col("term")))),
          lit(0.0), (acc, x) => acc + x.getField("term")).as("js_raw"))
        .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
          expr("CAST(round(js_raw * 1e9) AS BIGINT)").as("js_nano"))
        .orderBy("source_a", "source_b")
    }),

    // Hierarchy closure (recursive-CTE semantics via iterative joins with
    // checkpointed lineage): a deterministic 4-ary forest derived from
    // part keys (parent = id DIV 4), flattened to root/depth/path per
    // node. The oracle replays it as a genuine WITH RECURSIVE.
    "hier_closure" -> ((s, d) => {
      val edges = t(s, d, "part").where(col("p_partkey") <= 2000)
        .select(col("p_partkey").as("id"),
          when(col("p_partkey") > 0, expr("p_partkey DIV 4")).as("parent"))
      graft.ops.Hierarchy.rootPaths(edges).orderBy("id")
    }),

    // Hierarchy rollup: aggregate a fact value up the closure — per root
    // of the 4-ary forest (roots = ids < 4 here), subtree size, max
    // depth, and total retail cents of every descendant. The closure
    // comes from the same iterative rootPaths walk; the rollup is one
    // root-keyed hash aggregate over it.
    "hier_rollup" -> ((s, d) => {
      val parts = t(s, d, "part").where(col("p_partkey") <= 2000)
      val edges = parts.select(col("p_partkey").as("id"),
        when(col("p_partkey") >= 4, expr("p_partkey DIV 4")).as("parent"))
      graft.ops.Hierarchy.rootPaths(edges)
        .join(parts.select(col("p_partkey").as("id"),
          cents(col("p_retailprice")).as("vc")), Seq("id"))
        .groupBy("root")
        .agg(count(lit(1)).as("n_nodes"), max("depth").as("max_depth"),
          sum("vc").as("total_cents"))
        .orderBy("root")
    }),

    // Incremental aggregate maintenance: the lineitem "history" arrives as
    // three disjoint deltas (orderkey ranges); each delta aggregates to
    // per-flag (sum,count) state, states merge, metrics finish. The oracle
    // is the FROM-SCRATCH aggregate over the whole table — exact integer
    // cents make the merge provably order-free.
    "incr_agg_merge" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"),
          cents(col("l_quantity")).as("qty_cents"))
      val deltas = Seq(
        li.where(col("l_orderkey") % 3 === 0),
        li.where(col("l_orderkey") % 3 === 1),
        li.where(col("l_orderkey") % 3 === 2))
        .map(dta => graft.ops.IncrementalAgg.partials(
          dta, Seq("l_returnflag"), "qty_cents"))
      val merged = graft.ops.IncrementalAgg.merge(deltas, Seq("l_returnflag"))
      graft.ops.IncrementalAgg.finish(merged, Seq("l_returnflag"), scale = 100L)
        .orderBy("l_returnflag")
    }),

    // Exact weighted median per group: sort by value, running weight
    // cumsum over a deterministic total order, first row where
    // 2·cumsum >= total weight — the lower weighted median, a pure
    // integer rule over quantity-unit weights and price cents (no
    // interpolation, no float comparison anywhere).
    "a21_weighted_median" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val li = t(s, d, "lineitem")
        .where(col("l_extendedprice").isNotNull && col("l_quantity").isNotNull)
        .select(col("l_returnflag"),
          cents(col("l_extendedprice")).as("pc"),
          expr("CAST(round(l_quantity) AS BIGINT)").as("wu"),
          col("l_orderkey"), col("l_linenumber"))
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("pc"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = li.groupBy("l_returnflag")
        .agg(sum("wu").as("tw"), count(lit(1)).as("n_rows"))
      li.withColumn("cw", sum(col("wu")).over(w))
        .join(broadcast(tot), Seq("l_returnflag"))
        .where(col("cw") * 2 >= col("tw"))
        .groupBy("l_returnflag")
        .agg(max("tw").as("total_weight"), max("n_rows").as("n_rows"),
          min(struct(col("cw").as("c"), col("pc").as("p"))).as("m"))
        .select(col("l_returnflag"), col("n_rows"), col("total_weight"),
          col("m.p").as("wmedian_cents"))
        .orderBy("l_returnflag")
    }),

    // Trimmed mean per group: keep values inside the group's [p5, p95]
    // (R-7 percentile == DuckDB quantile_cont, the f9 discipline), then
    // an exact integer-cents mean over the kept rows — the robust
    // central-tendency report that ignores tail garbage.
    "a20_trimmed_mean" -> ((s, d) => {
      val o = t(s, d, "orders")
        .select(col("o_orderpriority"), col("o_totalprice"))
      val qs = o.groupBy("o_orderpriority")
        .agg(expr("percentile(o_totalprice, 0.05)").as("p05"),
          expr("percentile(o_totalprice, 0.95)").as("p95"))
      o.join(broadcast(qs), Seq("o_orderpriority"))
        .where(col("o_totalprice") >= col("p05") &&
          col("o_totalprice") <= col("p95"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_kept"),
          expr("sum(CAST(round(o_totalprice * 100) AS BIGINT)) DIV count(1)")
            .as("trimmed_mean_cents"))
        .orderBy("o_orderpriority")
    }),

    // Per-group min-max normalization to exact [0, 1e9] nano units:
    // group extremes from one aggregate broadcast back, scaled =
    // (v − min)·1e9 DIV (max − min), NULL for constant groups — the
    // feature-scaling prep step, integer end to end.
    "f13_minmax_scale" -> ((s, d) => {
      // cents, not nanos: (v - vmin) * 1e9 must stay inside BIGINT
      val ev = t(s, d, "events")
        .where(col("value").isNotNull && col("event_type").isNotNull &&
          col("event_id").isNotNull)
        .select(col("event_type"), col("event_id"), cents(col("value")).as("v"))
      val ext = ev.groupBy("event_type")
        .agg(min("v").as("vmin"), max("v").as("vmax"))
      ev.join(broadcast(ext), Seq("event_type"))
        .select(col("event_type"), col("event_id"),
          when(col("vmax") > col("vmin"),
            expr("(v - vmin) * 1000000000L DIV (vmax - vmin)"))
            .as("scaled_nano"))
        .orderBy("event_type", "event_id")
    }),

    // 2-D skyline (Pareto frontier, minimize both): parts not dominated
    // on (p_size, price-cents). One sort, two windows — a RANGE frame
    // over strictly-smaller sizes and a same-size partition min — no
    // quadratic dominance join (the oracle replays it as NOT EXISTS).
    // Equal pairs don't dominate (strict-in-one rule); exact integers.
    "q_skyline" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val p = t(s, d, "part")
        .where(col("p_size").isNotNull && col("p_retailprice").isNotNull)
        .select(col("p_partkey"), col("p_size").cast("long").as("sz"),
          cents(col("p_retailprice")).as("pc"))
      val wLt = Window.orderBy(col("sz"))
        .rangeBetween(Window.unboundedPreceding, -1)
      val wEq = Window.partitionBy(col("sz"))
      p.withColumn("m_lt", min(col("pc")).over(wLt))
        .withColumn("m_eq", min(col("pc")).over(wEq))
        .where((col("m_lt").isNull || col("m_lt") > col("pc")) &&
          col("m_eq") === col("pc"))
        .select(col("p_partkey"), col("sz").as("p_size"),
          col("pc").as("price_cents"))
        .orderBy("p_size", "price_cents", "p_partkey")
    }),

    // Deterministic A/B assignment + sample-ratio-mismatch check: variant
    // by stable hash (50/50), per-variant user counts and mean order
    // value in exact cents, plus the SRM deviation |n_a − n_b| in nanos
    // of the total — the experimentation-platform admission audit.
    "ab_assign_srm" -> ((s, d) => {
      val o = t(s, d, "orders").where(col("o_custkey").isNotNull)
        .select(col("o_custkey"), cents(col("o_totalprice")).as("pc"))
        .withColumn("variant",
          when(pmod(StableHash.hash60(col("o_custkey").cast("string")),
            lit(100L)) < 50, "A").otherwise("B"))
      val per = o.groupBy("variant")
        .agg(count_distinct(col("o_custkey")).as("n_users"),
          count(lit(1)).as("n_orders"),
          expr("sum(pc) DIV count(1)").as("mean_cents"))
      val tot = per.agg(sum("n_users").as("nt"),
        max(when(col("variant") === "A", col("n_users"))).as("na"),
        max(when(col("variant") === "B", col("n_users"))).as("nb"))
      per.crossJoin(broadcast(tot))
        .select(col("variant"), col("n_users"), col("n_orders"),
          col("mean_cents"),
          expr("abs(na - nb) * 1000000000L DIV nt").as("srm_dev_nano"))
        .orderBy("variant")
    }),

    // IQR outlier filter (Tukey-fence shape, k=0.5 because the synthetic
    // totalprice distribution is short-tailed — k=1.5 selects nothing):
    // quartiles via one aggregate, broadcast back, map-side filter. Spark
    // `percentile` and DuckDB `quantile_cont` share R-7 interpolation, and
    // the fence arithmetic is the same double expression tree on both
    // engines, so the selected row set matches exactly.
    "f9_iqr_outliers" -> ((s, d) => {
      val o = t(s, d, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      val qs = o.groupBy("o_orderpriority")
        .agg(expr("percentile(o_totalprice, 0.25)").as("q1"),
          expr("percentile(o_totalprice, 0.75)").as("q3"))
      o.join(broadcast(qs), Seq("o_orderpriority"))
        .where(col("o_totalprice") < col("q1") - (col("q3") - col("q1")) * 0.5 ||
          col("o_totalprice") > col("q3") + (col("q3") - col("q1")) * 0.5)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "o_orderkey")
    }),

    // Bloom-prefiltered incremental dedup: which docs with id >= 250 carry
    // text NOT already present among ids < 250? Result is bit-identical to
    // the plain left-anti join (the oracle's NOT EXISTS); the Bloom sketch
    // only routes rows so that at corpus scale definitely-new rows never
    // enter the shuffle join.
    "bloom_new_docs" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val incoming = docs.where(col("doc_id") >= 250)
        .select(col("doc_id"), md5(col("text")).as("digest"))
      val seen = docs.where(col("doc_id") < 250)
        .select(md5(col("text")).as("digest"))
      graft.ops.BloomDedup.newRows(incoming, seen, "digest", expectedItems = 1 << 16)
        .select("doc_id").orderBy("doc_id")
    }),

    // Ordered funnel (view -> click -> purchase): per-user first completion
    // time of each step, each strictly after the previous step. All joins
    // and aggregates key on user_id, so one exchange is reused end-to-end.
    "funnel_user_steps" -> ((s, d) => {
      val ev = t(s, d, "events").where(col("user_id") <= 200)
        .select(col("user_id"), expr("ts DIV 1000").as("ts_us"), col("event_type"))
      graft.ops.Funnel.stepTimes(ev, "user_id", "ts_us", "event_type",
        Seq("view", "click", "purchase"))
        .orderBy("user_id")
    }),

    // Funnel summary over ALL users: entities reaching each step.
    "funnel_counts" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), expr("ts DIV 1000").as("ts_us"), col("event_type"))
      val st = graft.ops.Funnel.stepTimes(ev, "user_id", "ts_us", "event_type",
        Seq("view", "click", "purchase"))
      graft.ops.Funnel.counts(st, "user_id").orderBy("step_no")
    }),

    // Daily cohort retention matrix on the sparse purchase slice (the
    // dense all-events log collapses to one cohort): cohort = exact
    // 1-day epoch-nano period of first purchase; cells = distinct users
    // purchasing again N days later, share as truncating integer nanos.
    "cohort_retention" -> ((s, d) =>
      graft.ops.Cohort.retention(
        t(s, d, "events").where(col("event_type") === "purchase"),
        "user_id", "ts", periodNanos = 86400L * 1000000000L)
        .orderBy("cohort_period", "period_offset")),

    // Row-level snapshot diff (CDC change feed from plain tables): two
    // deterministic versions of orders — rows only-in-old (removed),
    // only-in-new (added), and value-edited rows with their per-column
    // change mask. Single double-add keeps the edited price
    // bit-deterministic (Upsert.snapshotDiff).
    "dq_snapshot_diff" -> ((s, d) => {
      val base = t(s, d, "orders").where(col("o_orderkey") <= 6000)
      val oldSnap = base.where(col("o_orderkey") % 7 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val newSnap = base.where(col("o_orderkey") % 5 =!= 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 11 === 0, lit("X"))
            .otherwise(col("o_orderstatus")).as("o_orderstatus"),
          when(col("o_orderkey") % 13 === 0, col("o_totalprice") + lit(1.0))
            .otherwise(col("o_totalprice")).as("o_totalprice"))
      graft.ops.Upsert.snapshotDiff(oldSnap, newSnap,
        Seq("o_orderkey"), Seq("o_orderstatus", "o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // Batch CDC merge (SCD-1 upsert): every 10th order gets two conflicting
    // update versions (seq 1 and 2); the argmax dedup must pick seq 2, the
    // anti-join keeps everything else. Single double-add keeps the updated
    // price bit-deterministic across engines.
    "upsert_merge" -> ((s, d) => {
      val cur = t(s, d, "orders").where(col("o_orderkey") <= 5000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          lit(0L).as("seq"))
      val base = cur.where(col("o_orderkey") % 10 === 0)
      def version(bump: Double, seq: Long) = base.select(
        col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice") + bump).as("o_totalprice"), lit(seq).as("seq"))
      graft.ops.Upsert.merge(
        cur, version(1.0, 1L).unionByName(version(2.0, 2L)),
        Seq("o_orderkey"), "seq")
        .orderBy("o_orderkey")
    }),

    // SCD type 2 dimension history (vs upsert_merge's SCD-1 overwrite):
    // each user's event_type stream collapses to versioned runs with
    // valid_from/valid_to/version_no/is_current. seq = event_id (unique),
    // so run boundaries are deterministic cross-engine.
    "upsert_scd2" -> ((s, d) =>
      graft.ops.Upsert.scd2History(
        t(s, d, "events").where(col("user_id") <= 100)
          .select("user_id", "event_id", "event_type"),
        keyCols = Seq("user_id"), seqCol = "event_id",
        valueCols = Seq("event_type"))
        .orderBy("user_id", "version_no")),

    // Edit-distance fuzzy match (entity-resolution shape): candidates from
    // the sorted-neighborhood pass, verified with Levenshtein over a
    // normalized bounded prefix (cost capped per pair; the DP is O(L^2) so
    // NEVER run it corpus x corpus — candidates only). Normalization to
    // [a-z0-9 ] keeps both engines' character semantics identical.
    "dedup_editdist" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val prefix = substring(
        regexp_replace(lower(coalesce(col("text"), lit(""))), "[^a-z0-9 ]", ""),
        1, 24)
      val cands = Dedup.sortedNeighborhood(
        docs, "doc_id",
        coalesce(substring(col("text"), 1, 16), lit("")), col("source"),
        window = 3)
        .select("id_a", "id_b")
      cands
        .join(docs.select(col("doc_id").as("id_a"), prefix.as("pa")), Seq("id_a"))
        .join(docs.select(col("doc_id").as("id_b"), prefix.as("pb")), Seq("id_b"))
        .withColumn("lev", levenshtein(col("pa"), col("pb")).cast("long"))
        .where(col("lev") <= 12)
        .select("id_a", "id_b", "lev")
        .orderBy("id_a", "id_b")
    }),

    // Jaro-Winkler fuzzy match over SNM candidates (the native codegen'd
    // expression; DuckDB's jaro_winkler_similarity is the oracle). Same
    // candidate discipline as dedup_editdist: never corpus x corpus.
    "dedup_jarowinkler" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val prefix = substring(
        regexp_replace(lower(coalesce(col("text"), lit(""))), "[^a-z0-9 ]", ""),
        1, 24)
      val cands = Dedup.sortedNeighborhood(
        docs, "doc_id",
        coalesce(substring(col("text"), 1, 16), lit("")), col("source"),
        window = 3)
        .select("id_a", "id_b")
      cands
        .join(docs.select(col("doc_id").as("id_a"), prefix.as("pa")), Seq("id_a"))
        .join(docs.select(col("doc_id").as("id_b"), prefix.as("pb")), Seq("id_b"))
        .withColumn("jw", round(graft.plans.JaroWinkler(col("pa"), col("pb")), 6))
        .where(col("jw") >= 0.8)
        .select("id_a", "id_b", "jw")
        .orderBy("id_a", "id_b")
    }),

    // Text-analysis profile (lang-id, quality, token counts, fingerprint).
    "text_profile" -> ((s, d) =>
      TextAnalysis.profile(t(s, d, "documents")).orderBy("doc_id")),

    // Corpus rollup by predicted language (decimal-exact avg).
    "text_lang_summary" -> ((s, d) =>
      TextAnalysis.profile(t(s, d, "documents"))
        .groupBy("lang_pred")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_tokens").as("total_tokens"),
          (sum(col("quality_score").cast(DecimalType(18, 6))).cast("double") /
            count(lit(1))).as("avg_quality"))
        .orderBy("lang_pred")),

    // Deterministic train/val/test split by stable content-independent
    // hash of the id — reproducible across engines and runs (the property
    // that keeps splits leak-free at corpus scale).
    "split_train_val" -> ((s, d) => {
      val bucket = pmod(StableHash.hash60(col("doc_id").cast("string")), lit(100L))
      val split = when(bucket < 80, "train").when(bucket < 90, "val")
        .otherwise("test")
      t(s, d, "documents")
        .select(col("doc_id"), split.as("split"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_id"),
          max("doc_id").as("max_id"))
        .orderBy("split")
    }),

    // Group-aware holdout split (leakage control): the split is decided
    // by a stable hash of the GROUP key (the user), so ALL of an
    // entity's events land in one split — correlated rows never
    // straddle train/val, which per-row hashing cannot guarantee.
    // Output: per-split user/event counts plus the structural leakage
    // audit (max distinct splits any user touches — 1 by construction,
    // and the audit PROVES it rather than assuming it).
    "split_group_holdout" -> ((s, d) => {
      val bucket = pmod(StableHash.hash60(col("user_id").cast("string")),
        lit(100L))
      val tagged = t(s, d, "events").where(col("user_id").isNotNull)
        .select(col("user_id"), col("event_id"),
          when(bucket < 80, "train").otherwise("val").as("split"))
      val mx = tagged.groupBy("user_id")
        .agg(countDistinct(col("split")).as("nsp"))
        .agg(max(col("nsp")).as("max_splits_per_user"))
      tagged.groupBy("split")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .crossJoin(broadcast(mx))
        .orderBy("split")
    }),

    // K-fold cross-validation assignment: deterministic hash folds (the
    // split_train_val discipline generalized), each doc in exactly one
    // fold; per-fold val/train sizes via one global window over k rows.
    "split_kfold" -> ((s, d) => {
      val fold = pmod(StableHash.hash60(col("doc_id").cast("string")), lit(5L))
      t(s, d, "documents")
        .select(col("doc_id"), fold.as("fold"))
        .groupBy("fold").agg(count(lit(1)).as("n_val"))
        .withColumn("n_train",
          sum(col("n_val")).over(org.apache.spark.sql.expressions.Window
            .partitionBy()) - col("n_val"))
        .orderBy("fold")
    }),

    // Quantile binning (feature discretization): per-event-type quartile
    // boundaries (interpolated, R-7 — identical in both engines), each
    // event assigned its quartile bin, counts per (type, bin).
    "f11_quantile_bins" -> ((s, d) => {
      val ev = t(s, d, "events").where(col("value").isNotNull)
      val q = ev.groupBy("event_type").agg(
        expr("percentile(value, 0.25)").as("q1"),
        expr("percentile(value, 0.5)").as("q2"),
        expr("percentile(value, 0.75)").as("q3"))
      ev.join(broadcast(q), "event_type")
        .withColumn("bin",
          when(col("value") <= col("q1"), 1L)
            .when(col("value") <= col("q2"), 2L)
            .when(col("value") <= col("q3"), 3L)
            .otherwise(4L))
        .groupBy("event_type", "bin")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "bin")
    }),

    // Inverted index: per-term df / total tf / delta-encoded "gap:tf"
    // posting list, bounded to the 50 highest-df terms (deterministic
    // df-desc/word-asc cut) — the retrieval-index construction pass.
    "text_postings" -> ((s, d) =>
      TextAnalysis.invertedIndex(t(s, d, "documents"))
        .orderBy(col("df").desc, col("word").asc).limit(50)
        .orderBy("word")),

    // BM25 ranked retrieval (Okapi, Lucene idf; k1=1.2, b=0.75): top-10
    // docs per query. Query terms broadcast; only term-matching docs are
    // scored; bounded TopK finisher (no query_id window).
    "text_bm25_topk" -> ((s, d) =>
      TextAnalysis.bm25TopK(t(s, d, "documents"),
        Seq(1L -> Seq("spark", "join", "fast"),
          2L -> Seq("customer", "query", "slow"),
          3L -> Seq("vector", "hash", "merge")), k = 10)
        .orderBy("query_id", "rank")),

    // Reciprocal-rank fusion of two retrieval rankers over the same
    // queries: BM25 top-20 and a term-coverage ranker (distinct query
    // words matched, doc-id tie-break), fused with exact integer-nano
    // RRF credits 1e9 DIV (60 + rank) and re-ranked on the bounded
    // merged set. The hybrid-retrieval staple (lexical + second signal).
    "rank_fusion_rrf" -> ((s, d) => {
      import s.implicits._
      val qs = Seq(1L -> Seq("spark", "join", "fast"),
        2L -> Seq("customer", "query", "slow"),
        3L -> Seq("vector", "hash", "merge"))
      val docs = t(s, d, "documents")
      val bm = TextAnalysis.bm25TopK(docs, qs, k = 20)
        .select("query_id", "doc_id", "rank")
      val q = qs.flatMap { case (qid, ts) => ts.map(w => (qid, w)) }
        .toDF("query_id", "word")
      val cov = graft.core.Graft.spread(docs)
        .select(col("doc_id"),
          explode(graft.functions.Text.tokens(col("text"))).as("word"))
        .where(col("word") =!= "").distinct()
        .join(broadcast(q), Seq("word"))
        .groupBy("query_id", "doc_id")
        .agg(count_distinct(col("word")).cast("double").as("s"))
      val covRanked = graft.ops.TopK.perGroupTopK(
          cov, Seq("query_id"), "doc_id", "s", 20)
        .select("query_id", "doc_id", "rank")
      graft.ops.Fusion.rrf(Seq(bm, covRanked), Seq("query_id"), "doc_id",
          "rank")
        .orderBy("query_id", "rrf_rank")
    }),

    // BPE inference: a FIXED trained merge list (the model artifact)
    // applied corpus-wide — words split to chars, merges folded in order,
    // all map-side. Output: per-doc subword count + first-10 subwords.
    "bpe_encode" -> ((s, d) =>
      graft.ops.Bpe.encodeDocs(t(s, d, "documents"), "text", "doc_id",
        bpeEncodeMerges)
        .select(col("doc_id"), size(col("tk")).cast("long").as("n_subwords"),
          concat_ws(" ", slice(col("tk"), 1, 10)).as("head10"))
        .orderBy("doc_id")),

    // BPE tokenizer training, round-1 statistic: corpus-frequency-weighted
    // adjacent character-pair counts over the distinct word vocabulary
    // (what the first merge maximizes), top-20. The full iterative
    // learner (ops.Bpe.learnBpe) is driver-loop-controlled and
    // spec-verified on the classic Sennrich fixture.
    "bpe_top_pairs" -> ((s, d) =>
      graft.ops.Bpe.pairStats(graft.ops.Bpe.seedVocab(t(s, d, "documents")))
        .orderBy(col("weight").desc, col("a").asc, col("b").asc).limit(20)
        .orderBy("a", "b")),

    // Per-doc uniqueness score (novelty / memorization-risk signal): the
    // share of each doc's distinct bigram shingles that occur NOWHERE
    // else in the corpus (df = 1). One shingle explode, a df count
    // window keyed on the shingle (the shinglePairCounts discipline),
    // one per-doc aggregate — exact integer counts, one final division.
    "text_uniqueness" -> ((s, d) => {
      import org.apache.spark.sql.expressions.{Window => W}
      val docs = Graft.spread(t(s, d, "documents"))
        .where(col("text").isNotNull && trim(col("text")) =!= "")
      val sh = docs.select(col("doc_id"),
        explode(Text.wordShingles(col("text"), 2)).as("sh"))
        .withColumn("df", count(lit(1)).over(W.partitionBy("sh")))
      sh.groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
        .select(col("doc_id"), col("n_shingles"), col("n_unique"),
          (col("n_unique").cast("double") / col("n_shingles"))
            .as("uniqueness"))
        .orderBy("doc_id")
    }),

    // Doc-length histogram (fixed-width integer buckets).
    "text_histogram" -> ((s, d) => t(s, d, "documents")
      .select(expr("n_chars DIV 50").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_docs"))
      .orderBy("bucket")),

    // Character-histogram quality signals (gibberish / repetitiveness
    // detection), computed map-side per doc: the codepoint array sorts
    // once, then ONE fold over the sorted runs yields n, distinct count,
    // max run, and sum of squared run lengths — integer arithmetic end to
    // end; Simpson diversity (1 - sum p_c^2) and top-char fraction each
    // take a single mirrored double division. Simpson carries the same
    // concentration signal as char entropy without entropy's log, which
    // would not replay bit-exact across libm implementations. No explode,
    // no shuffle: the whole profile is a projection, so it pipelines into
    // the scan at any scale (same single-stage family as text_profile).
    "text_char_diversity" -> ((s, d) => {
      // the length guard matters: Spark's sequence(1, 0) is the
      // DESCENDING [1, 0] (not empty like DuckDB's range(1, 1)), so an
      // unguarded fold fabricates phantom ''-chars on empty text
      val fold = expr(
        """CASE WHEN length(text) > 0 THEN aggregate(
          |  array_sort(transform(sequence(1, length(text)),
          |    i -> substring(text, i, 1))),
          |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L,
          |    'ss', 0L, 'k', 0L, 'mx', 0L),
          |  (a, c) -> CASE
          |    WHEN a.prev IS NULL THEN named_struct('prev', c, 'run', 1L,
          |      'ss', a.ss, 'k', a.k, 'mx', a.mx)
          |    WHEN c = a.prev THEN named_struct('prev', a.prev,
          |      'run', a.run + 1L, 'ss', a.ss, 'k', a.k, 'mx', a.mx)
          |    ELSE named_struct('prev', c, 'run', 1L,
          |      'ss', a.ss + a.run * a.run, 'k', a.k + 1L,
          |      'mx', greatest(a.mx, a.run)) END,
          |  a -> CASE WHEN a.prev IS NULL
          |    THEN CAST(NULL AS STRUCT<ss: BIGINT, k: BIGINT, mx: BIGINT>)
          |    ELSE named_struct('ss', a.ss + a.run * a.run, 'k', a.k + 1L,
          |      'mx', greatest(a.mx, a.run)) END) END""".stripMargin)
      t(s, d, "documents")
        .select(col("doc_id"), fold.as("f"),
          length(col("text")).cast("long").as("n"))
        .select(col("doc_id"),
          col("n").as("n_chars"),
          col("f.k").as("distinct_chars"),
          (col("f.mx").cast("double") / col("n").cast("double"))
            .as("top_frac"),
          (lit(1.0) - col("f.ss").cast("double") /
            (col("n") * col("n")).cast("double")).as("simpson"))
        .orderBy("doc_id")
    }),

    // Training-data text cleaning (URL/email strip, whitespace collapse).
    "text_clean" -> ((s, d) => t(s, d, "documents")
      .select(col("doc_id"),
        Text.cleanForTraining(
          concat(coalesce(col("text"), lit("")),
            lit(" visit https://example.com/x?q=1 or "),
            coalesce(col("source"), lit("")), lit("@mail.test  NOW")))
          .as("cleaned"))
      .orderBy("doc_id")),

    // URL parse battery over a deterministic messy URL per document
    // (mixed-case scheme/host, ccTLD rows, default + explicit ports,
    // tracking params, fragments, trailing slashes). Pure map-side
    // projection — the oracle replays every RE2-safe regex verbatim.
    "url_parse" -> ((s, d) => {
      val u = messyUrl(col("doc_id"), col("lang"), col("source"))
      t(s, d, "documents")
        .select(col("doc_id"), u.as("url"))
        .select(col("doc_id"), col("url"),
          Urls.urlScheme(col("url")).as("scheme"),
          Urls.urlHost(col("url")).as("host"),
          Urls.registeredDomain(Urls.urlHost(col("url"))).as("domain"),
          Urls.urlPath(col("url")).as("path"),
          Urls.canonicalizeUrl(col("url")).as("canonical"))
        .orderBy("doc_id")
    }),

    // Domain-level corpus stats (the RefinedWeb/C4 domain-filtering
    // aggregation): docs, languages, and chars per registered domain.
    // One hash aggregate after a map-side parse.
    "url_domain_stats" -> ((s, d) => {
      val u = messyUrl(col("doc_id"), col("lang"), col("source"))
      t(s, d, "documents")
        .select(Urls.registeredDomain(Urls.urlHost(u)).as("domain"),
          col("lang"), col("n_chars"))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy(col("n_docs").desc, col("domain").asc)
    }),

    // Crawl-level URL dedup: raw variants (case, default port, tracking
    // params, trailing slash, fragment) collapse to one canonical form;
    // keep the first-seen doc per canonical URL. groupBy(canonical) is the
    // whole shuffle — dedup work is proportional to distinct URLs.
    "url_crawl_dedup" -> ((s, d) => {
      val id = col("doc_id")
      val kid = id % 50
      val u = concat(
        when(id % 2 === 0, lit("HTTPS://WWW.")).otherwise(lit("https://www.")),
        lit("site"),
        when(kid % 3 === 0, lit(".example.CO.UK")).otherwise(lit(".example.COM")),
        when(kid % 5 === 1, lit(":8080"))
          .when(id % 4 === 0, lit(":443")).otherwise(lit("")),
        lit("/Page/"), kid.cast("string"),
        when(id % 2 === 0, lit("/")).otherwise(lit("")),
        lit("?utm_campaign=c"), id.cast("string"),
        lit("&item="), kid.cast("string"), lit("#s"), id.cast("string"))
      t(s, d, "documents")
        .select(id.as("doc_id"), u.as("url"))
        .select(col("doc_id"), col("url"),
          Urls.canonicalizeUrl(col("url")).as("canonical"))
        .groupBy("canonical")
        .agg(min(col("doc_id")).as("keep_doc"),
          count(lit(1)).as("n_raw"),
          countDistinct(col("url")).as("n_raw_distinct"))
        .orderBy("canonical")
    }),

    // Corpus vocabulary: top-100 non-stopword terms by frequency.
    "text_vocab" -> ((s, d) => {
      val words = Graft.spread(t(s, d, "documents"))
        .select(explode(Text.tokens(col("text"))).as("word"))
        .where(!col("word").isInCollection(Text.stopwords.values.flatten.toSeq)
          && col("word") =!= "")
      words.groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word").asc)
        .limit(100)
    }),

    // Gopher-style repetition quality signals (dup-line fractions, top
    // bigram share). Multi-line structure is PLANTED (the synthetic docs
    // are single-line): each doc's text plus two copies of its first 20
    // chars, so every row exercises the duplicate-line branches.
    // Fractions are raw double divisions of exact integer counts — no
    // rounding step, bit-reproducible in DuckDB.
    "text_repetition" -> ((s, d) => {
      val base = coalesce(col("text"), lit(""))
      val planted = concat_ws("\n", base, substring(base, 1, 20),
        substring(base, 1, 20))
      Graft.spread(t(s, d, "documents"))
        .select(col("doc_id"), Text.linesOf(planted).as("ls"),
          Text.tokens(planted).as("toks"))
        .select(col("doc_id"),
          Text.repetitionFromParts(col("ls"), col("toks")).as("r"))
        .select(col("doc_id"), col("r.n_lines").as("n_lines"),
          col("r.dup_line_frac").as("dup_line_frac"),
          col("r.dup_line_char_frac").as("dup_line_char_frac"),
          col("r.top_bigram_frac").as("top_bigram_frac"))
        .orderBy("doc_id")
    }),

    // Relational twin of text_repetition (explode+groupBy counting — the
    // huge-document scale path; see repetitionSignalsRelational). Same
    // planted duplication, same oracle.
    "text_repetition_rel" -> ((s, d) => {
      val base = coalesce(col("text"), lit(""))
      val planted = concat_ws("\n", base, substring(base, 1, 20),
        substring(base, 1, 20))
      TextAnalysis.repetitionSignalsRelational(
        t(s, d, "documents").select(col("doc_id"), planted.as("text")))
        .orderBy("doc_id")
    }),

    // Accent stripping (native StripAccents expression). Unicode is
    // PLANTED — the synthetic corpus is ASCII; DuckDB's strip_accents
    // replays the same NFD + mark-removal recipe.
    "text_strip_accents" -> ((s, d) => t(s, d, "documents")
      .select(col("doc_id"),
        Text.stripAccents(concat(coalesce(col("text"), lit("")),
          lit(" café Ünïcode ñandú crème brûlée Żółć naïve façade")))
          .as("stripped"))
      .orderBy("doc_id")),

    // Token-window chunking (8-token windows, 2-token overlap): the
    // doc -> training-example explode. Map-side; chunk_id is the window's
    // ordinal within its document.
    "text_chunks" -> ((s, d) => Graft.spread(t(s, d, "documents"))
      .select(col("doc_id"),
        posexplode(Text.chunkWindows(col("text"), width = 8, overlap = 2)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("chunk_id"),
        col("col").as("chunk"))
      .orderBy("doc_id", "chunk_id")),

    // PII redaction (emails / IPv4 / phone-shaped digit runs ->
    // placeholders). PII is planted per row — the synthetic corpus
    // contains none naturally.
    "text_pii_redact" -> ((s, d) => t(s, d, "documents")
      .select(col("doc_id"),
        Text.redactPii(concat(coalesce(col("text"), lit("")),
          lit(" contact john.doe+x@mail-test.example.org or 10.0.42.7 or +1 (415) 555-0100 now")))
          .as("redacted"))
      .orderBy("doc_id")),

    // Vocabulary-coverage quality score: fraction of each doc's tokens
    // that fall in the corpus-wide top-100 vocabulary. Two passes: vocab
    // built once (bounded: top-V, deterministic count-desc/word-asc
    // tie-break), collected (V is driver-sized by construction) and
    // folded into a map-side membership count — per-doc scoring never
    // shuffles. Rational arithmetic only: exact counts, one double
    // division.
    "text_vocab_coverage" -> ((s, d) => {
      val docs = Graft.spread(t(s, d, "documents"))
      val vocab = docs.select(explode(Text.tokens(col("text"))).as("word"))
        .where(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word").asc).limit(100)
        .select("word").collect().map(_.getString(0)).toSeq
      docs.select(col("doc_id"), Text.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          Text.stopwordHits(col("toks"), vocab).as("vocab_hits"))
        .withColumn("coverage",
          when(col("n_tokens") > 0,
            col("vocab_hits").cast("double") / col("n_tokens"))
            .otherwise(lit(0.0)))
        .orderBy("doc_id")
    }),

    // Radius search: all corpus neighbors of the 5 probe vectors with
    // cosine >= 0.1 (threshold retrieval — the "everything this similar"
    // complement of top-k). Broadcast queries, map-side kernel, no
    // shuffle; output is the match set only.
    "sim_range_search" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.rangeSearch(emb, emb.where(col("vec_id") < 5), tau = 0.1)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("query_id", "corpus_id")
    }),

    // Brute-force cosine top-k (exact ANN baseline).
    "sim_brute_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 5), k = 10)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("query_id", "rank")
    }),

    // Matryoshka truncation audit: recall@10 of brute-force cosine
    // retrieval when embeddings are truncated to their first 16 of 64
    // dims (the MRL serving trade-off, Kusupati et al. 2022) against the
    // full-dim ranking. Both rankings use the exact per-partition kernel;
    // the report is pure integers (overlap count, truncating nano
    // recall), so cosine ULPs never surface.
    "sim_matryoshka_recall" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queries = emb.where(col("vec_id") < 5)
      def trunc(df: DataFrame) =
        df.withColumn("embedding", slice(col("embedding"), 1, 16))
      val full = Similarity.bruteForceTopK(emb, queries, k = 10)
        .select("query_id", "corpus_id")
      val cut = Similarity.bruteForceTopK(trunc(emb), trunc(queries), k = 10)
        .select("query_id", "corpus_id")
      val overlap = full.join(cut, Seq("query_id", "corpus_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("n_overlap"))
      queries.select(col("vec_id").as("query_id"))
        .join(overlap, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          expr("coalesce(n_overlap, 0L) * 1000000000L DIV 10")
            .as("recall_nano"))
        .orderBy("query_id")
    }),

    // Template-slot mining: per source and token position 0..9, the
    // positional MODE token and its share — the profile that exposes
    // templated openings ("Dear customer, ...") in a scraped corpus.
    // Argmax is a struct-min (count desc, token asc), never a window
    // over the corpus; shares are truncating integer nanos.
    "text_template_slots" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .where(col("text").isNotNull && trim(col("text")) =!= "" &&
          col("source").isNotNull)
        .select(col("source"),
          posexplode(split(trim(lower(col("text"))), "\\s+")))
        .where(col("pos") < 10 && col("col") =!= "")
        .select(col("source"), col("pos").cast("long").as("pos"),
          col("col").as("w"))
      val counts = toks.groupBy("source", "pos", "w")
        .agg(count(lit(1)).as("n"))
      val tot = counts.groupBy("source", "pos").agg(sum("n").as("n_tot"))
      counts.groupBy("source", "pos")
        .agg(min(struct((-col("n")).as("nn"), col("w").as("tw"),
          col("n").as("tn"))).as("m"))
        .join(tot, Seq("source", "pos"))
        .select(col("source"), col("pos"), col("m.tw").as("top_token"),
          col("m.tn").as("n"),
          expr("m.tn * 1000000000L DIV n_tot").as("share_nano"))
        .orderBy("source", "pos")
    }),

    // Windowed PMI collocation mining (the word2vec-era co-occurrence
    // statistic): token pairs within a +-2 position window, canonical
    // unordered form, PMI = ln(c_pair * N^2 / (P * c_a * c_b)) over
    // exact integer counts with ONE MathLn + nano rounding per surviving
    // pair (c_pair >= 5; repeated-word self-pairs count in P but are not
    // reported). Products are sized to stay in BIGINT through sf0.1.
    "text_pmi_pairs" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .where(col("text").isNotNull && trim(col("text")) =!= "")
        .select(col("doc_id"),
          posexplode(split(trim(lower(col("text"))), "\\s+")))
        .where(col("col") =!= "")
        .select(col("doc_id"), col("pos"), col("col").as("w"))
      val uni = toks.groupBy("w").agg(count(lit(1)).as("cw"))
      val nTok = toks.agg(count(lit(1)).as("n_tokens"))
      val grouped = toks.as("a").join(toks.as("b"),
          col("a.doc_id") === col("b.doc_id") &&
            (col("b.pos") - col("a.pos")).isin(1, 2))
        .select(least(col("a.w"), col("b.w")).as("w_a"),
          greatest(col("a.w"), col("b.w")).as("w_b"))
        .groupBy("w_a", "w_b").agg(count(lit(1)).as("c_pair"))
      val pTot = grouped.agg(sum("c_pair").as("p_total"))
      grouped.where(col("c_pair") >= 5 && col("w_a") =!= col("w_b"))
        .join(uni.select(col("w").as("w_a"), col("cw").as("c_a")), Seq("w_a"))
        .join(uni.select(col("w").as("w_b"), col("cw").as("c_b")), Seq("w_b"))
        .crossJoin(broadcast(nTok)).crossJoin(broadcast(pTot))
        .select(col("w_a"), col("w_b"), col("c_pair"), col("c_a"), col("c_b"),
          round(graft.plans.MathLn(
            (col("c_pair") * col("n_tokens") * col("n_tokens")).cast("double") /
            (col("p_total") * col("c_a") * col("c_b")).cast("double")) * 1e9)
            .cast("long").as("pmi_nano"))
        .orderBy("w_a", "w_b")
    }),

    // 1-bit binary quantization ANN: sign-bit pack to two 32-bit words
    // per vector, exact Hamming ranking via xor + popcount — the 1-bit
    // tier of the quantization ladder (brute / LSH / IVF / SQ8 / PQ /
    // binary), integer end to end.
    "sim_binary_hamming_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.binaryHammingTopK(emb, emb.where(col("vec_id") < 5), k = 10)
        .orderBy("query_id", "rank")
    }),

    // Hard-negative mining: per probe vector, the 10 most-similar
    // corpus vectors with a DIFFERENT label — the batch step that turns
    // a labeled corpus into contrastive training pairs.
    "sim_hard_negatives" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.hardNegatives(emb, emb.where(col("vec_id") < 5), k = 10)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("query_id", "rank")
    }),

    // Diverse retrieval: Maximal Marginal Relevance over each probe's
    // top-20 brute-force pool — 8 greedy picks balancing query relevance
    // against max similarity to already-picked docs (λ = 0.5). All
    // comparisons happen in exact integer nanos, so the whole greedy
    // chain (picks, ties, scores) replays as an unrolled SQL chain.
    "sim_mmr_select" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.mmrSelect(emb, emb.where(col("vec_id") < 3),
        poolK = 20, k = 8)
        .orderBy("query_id", "pick")
    }),

    // k-NN majority-vote pseudo-labeling: every 25th vector plays the
    // unlabeled query batch, the rest the labeled corpus; prediction =
    // most common label among the 10 exact-cosine nearest (ties to the
    // smallest label). True label joined back for accuracy inspection.
    "sim_knn_classify" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queries = emb.where(col("vec_id") % 25 === 0)
      val labeled = emb.where(col("vec_id") % 25 =!= 0)
      Similarity.knnClassify(labeled, queries, k = 10)
        .join(queries.select(col("vec_id").as("query_id"),
          col("label").as("true_label")), Seq("query_id"))
        .orderBy("query_id")
    }),

    // Embedding near-dup pairs: banded-LSH-bucketed (2 hash tables of 8
    // hyperplanes), candidates cosine-verified once (threshold 0.2 — demo
    // level for random vectors; production dedup uses ~0.95).
    "dedup_embedding" -> ((s, d) =>
      Dedup.embeddingNearDups(t(s, d, "embeddings"), "embedding", "vec_id",
        dim = 64, bits = 8, bands = 2, threshold = 0.2)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("id_a", "id_b")),

    // SemDeDup semantic dedup: Lloyd-trained k-means cells bound the
    // quadratic cosine search (sum |cell|^2, never n^2); within each cell
    // a vector is dropped iff some lower-id cellmate is >= threshold
    // cosine. Threshold 0.38 is demo level for these near-random
    // synthetic vectors (production uses ~0.95); training, assignment,
    // and the prune all replay in the oracle.
    "dedup_semantic" -> ((s, d) =>
      Dedup.semanticDedup(t(s, d, "embeddings"), "vec_id", "embedding",
        nCells = 16, iters = 2, threshold = 0.38)
        .orderBy("vec_id")),

    // IVF with Lloyd-TRAINED centroids (2 iterations from the prefix-
    // sample init): assignment + decimal-exact per-dimension means are
    // bit-reproducible, so even the TRAINING is oracle-replayed (the
    // DuckDB twin unrolls both iterations in SQL).
    "sim_ivf_trained_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.ivfTopKTrained(emb, emb.where(col("vec_id") < 5), k = 10,
        nCells = 16, nProbe = 2, iters = 2)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("query_id", "rank")
    }),

    // Per-label embedding centroids (class prototypes): relational
    // posexplode + decimal-exact per-dimension means + position-sorted
    // regroup — scales like a group-by, no per-group vector buffers.
    // (Scalar projection of the centroid rather than the raw list column:
    // Spark and DuckDB disagree on the arrow list CHILD FIELD NAME
    // ("element" vs "l"), a schema-compare hazard; the FULL centroids are
    // cross-checked anyway by emb_assign_nearest's distances.)
    "emb_label_centroids" -> ((s, d) =>
      graft.ops.EmbeddingAgg.groupCentroids(
        Graft.spread(t(s, d, "embeddings")), "label", "embedding")
        .select(col("label"), size(col("centroid")).cast("long").as("n_dims"),
          col("centroid")(0).as("c0"), col("centroid")(1).as("c1"),
          col("centroid")(2).as("c2"), col("centroid")(3).as("c3"))
        .orderBy("label")),

    // Vector-norm histogram: unit-wide buckets of the L2 norm over clean
    // 64-dim vectors (DotProduct kernel == the oracle's in-order fold,
    // so floor(norm) buckets bit-agree) — the scale-sanity profile run
    // before cosine math is trusted.
    "emb_norm_hist" -> ((s, d) => {
      val raw = col("embedding")
      val nrm = t(s, d, "embeddings")
        .where(raw.isNotNull && size(raw) === 64 && !exists(raw, _.isNull))
        .select(sqrt(graft.plans.DotProduct(raw, raw)).as("nrm"))
      nrm.groupBy(floor(col("nrm")).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"), min("nrm").as("min_norm"),
          max("nrm").as("max_norm"))
        .orderBy("bucket")
    }),

    // Embedding distribution drift: per label, L2 shift between the
    // decimal-exact centroids of the even and odd vec_id halves — the
    // embedding-space counterpart of dq_psi_drift. The centroid join is
    // label-keyed (bounded); the distance is the L2Sq kernel (bit-equal
    // to the oracle's in-order list fold), nano-rounded.
    "emb_centroid_drift" -> ((s, d) => {
      val emb = Graft.spread(t(s, d, "embeddings"))
        .where(col("label").isNotNull)
      val ha = emb.where(col("vec_id") % 2 === 0)
      val hb = emb.where(col("vec_id") % 2 === 1)
      def cent(df: DataFrame, out: String) =
        graft.ops.EmbeddingAgg.groupCentroids(df, "label", "embedding")
          .withColumnRenamed("centroid", out)
      def cnt(df: DataFrame, out: String) =
        df.groupBy("label").agg(count(lit(1)).as(out))
      cent(ha, "cva").join(cent(hb, "cvb"), Seq("label"))
        .join(cnt(ha, "n_a"), Seq("label"))
        .join(cnt(hb, "n_b"), Seq("label"))
        .select(col("label"), col("n_a"), col("n_b"),
          round(sqrt(graft.plans.L2Sq(col("cva"), col("cvb"))) * 1e9)
            .cast("long").as("shift_nano"))
        .orderBy("label")
    }),

    // Per-dimension embedding health profile (dead / degenerate / NaN-ish
    // dimension detection before training): positions present, non-null
    // count, decimal-nano-exact mean, min and max per dimension. One
    // posexplode + hash aggregate; output is bounded by the
    // dimensionality, never the corpus.
    "emb_dim_stats" -> ((s, d) =>
      t(s, d, "embeddings")
        .select(posexplode(Vectors.asDouble(col("embedding")))
          .as(Seq("i", "v")))
        .groupBy(col("i").cast("long").as("i"))
        .agg(count(lit(1)).as("n_pos"), count(col("v")).as("n"),
          (sum(expr("CAST(round(v * 1e9) AS BIGINT)")).cast("double") /
            count(col("v")) / lit(1.0e9)).as("mean"),
          min("v").as("mn"), max("v").as("mx"))
        .orderBy("i")),

    // Covariance of the embedding distribution (PCA input): upper-
    // triangle entries, nano-exact product sums so every double replays
    // bit-for-bit. The 64x64 matrix is the bounded output; the corpus
    // only streams through the (i, j) hash aggregate.
    "emb_covariance" -> ((s, d) =>
      graft.ops.EmbeddingAgg.covarianceUpper(
        Graft.spread(t(s, d, "embeddings")), "embedding", dim = 64)
        .orderBy("i", "j")),

    // PCA projection: the distributed covariance above collects to the
    // driver (2,080 entries — dim-bounded, never corpus-sized), 30
    // power-iteration rounds extract the first principal component, and
    // the corpus projects onto the broadcast direction in one map-side
    // pass (DotProduct kernel; degenerate vectors -> NULL score). The
    // oracle replays the iteration as a recursive CTE over the same
    // ordered folds, so every score lands bit-exact. At 100 TB the only
    // corpus-scale work is the covariance hash-aggregate + this map pass.
    "emb_pca_project" -> ((s, d) => {
      val emb = Graft.spread(t(s, d, "embeddings"))
      val cov = graft.ops.EmbeddingAgg.covarianceUpper(emb, "embedding", dim = 64)
      val pc = graft.ops.EmbeddingAgg.pc1(cov, dim = 64)
      val pcLit = array(pc.map(x => lit(x)): _*)
      emb.select(col("vec_id"),
        Vectors.dot(Vectors.asDouble(col("embedding")), pcLit).as("pc1_score"))
        .orderBy("vec_id")
    }),

    // Two-component PCA map: Hotelling deflation (C - λ v vᵀ) after the
    // first power iteration yields the second component; the corpus
    // projects onto both broadcast directions in the same map-side pass.
    // The oracle replays BOTH iterations (two recursive CTEs) plus the
    // Rayleigh quotient and deflation arithmetic, ordered-fold for
    // ordered-fold.
    "emb_pca_top2" -> ((s, d) => {
      val emb = Graft.spread(t(s, d, "embeddings"))
      val cov = graft.ops.EmbeddingAgg.covarianceUpper(emb, "embedding", dim = 64)
      val pcs = graft.ops.EmbeddingAgg.pcTop(cov, dim = 64, k = 2)
      val p1 = array(pcs(0)._1.map(x => lit(x)): _*)
      val p2 = array(pcs(1)._1.map(x => lit(x)): _*)
      emb.select(col("vec_id"),
        Vectors.dot(Vectors.asDouble(col("embedding")), p1).as("pc1_score"),
        Vectors.dot(Vectors.asDouble(col("embedding")), p2).as("pc2_score"))
        .orderBy("vec_id")
    }),

    // Per-label centroid-distance outliers (p95 cutoff broadcast back):
    // flags vectors far from their own class prototype — mislabeled or
    // anomalous rows — without any global sort. The verdict is coalesced
    // to a NON-NULL boolean (null dist stays as the degenerate marker):
    // nullable booleans round-trip differently through the two engines'
    // pandas conversions (None vs NaN), a compare-harness trap.
    "emb_outliers" -> ((s, d) =>
      graft.ops.EmbeddingAgg.centroidOutliers(
        Graft.spread(t(s, d, "embeddings")), "vec_id", "embedding", "label")
        .withColumn("dist", round(col("dist"), 6))
        .withColumn("is_outlier", coalesce(col("is_outlier"), lit(false)))
        .orderBy("vec_id")),

    // Nearest-centroid assignment (classify every vector against the
    // label prototypes): centroids broadcast, corpus scored map-side,
    // bounded top-1 finisher.
    "emb_assign_nearest" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val cents = graft.ops.EmbeddingAgg.groupCentroids(emb, "label", "embedding")
      graft.ops.EmbeddingAgg.assignNearest(
        Graft.spread(emb), "vec_id", "embedding", cents, "label", "centroid")
        .withColumn("dist", round(col("dist"), 6))
        .orderBy("vec_id")
    }),

    // S5 catalog scan: register views, list user tables filtered by the
    // engine-prefix pattern (F8). The expected listing is a fixed constant,
    // so even the catalog query gets an exact oracle.
    "s5_catalog" -> ((s, d) => {
      import s.implicits._
      Graft.tune(s)
      Seq("region", "nation", "customer").foreach { n =>
        t(s, d, n).createOrReplaceTempView(s"graft_$n")
      }
      graft.service.MetricsService.listTables(s)
        .filter(_.startsWith("graft_")).toDF("table_name")
        .orderBy("table_name")
    }),

    // LSH-bucketed approximate top-k (multi-probe random hyperplanes).
    // bits sized to the corpus (2^4 buckets over 500 vectors): recall@10
    // measured 0.26 vs 0.03 at 8 bits — see OpsSpec's recall test.
    "sim_lsh_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.lshTopK(emb, emb.where(col("vec_id") < 5), k = 10,
        dim = 64, bits = 4, probes = 3)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("query_id", "rank")
    }),

    // Product-quantization ANN (8 sub-spaces x 16 centroids = 64x vector
    // compression) with ADC scoring and exact rerank; the whole pipeline —
    // codebook, encode, lookup tables, candidate cut — replays in the
    // oracle.
    "sim_pq_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.pqTopK(emb, emb.where(col("vec_id") < 5), k = 10,
        m = 8, dsub = 8, codebookSize = 16, rerank = 40)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("query_id", "rank")
    }),

    // PQ with Lloyd-trained sub-codebooks (2 rounds of assign + decimal-
    // exact per-dim means, seeded from the same prefix sample): the whole
    // training chain replays in the oracle, like sim_ivf_trained_topk's.
    "sim_pq_trained_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.pqTopKTrained(emb, emb.where(col("vec_id") < 5), k = 10,
        m = 8, dsub = 8, codebookSize = 16, rerank = 40, iters = 2)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("query_id", "rank")
    }),

    // IVF-PQ composed index (the production FAISS-style layout): coarse
    // cells prune the candidate scan, PQ codes ADC-score what remains,
    // exact cosine reranks the winners. Both prunes replay in the oracle.
    "sim_ivfpq_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.ivfPqTopK(emb, emb.where(col("vec_id") < 5), k = 10,
        nCells = 16, nProbe = 4, m = 8, dsub = 8, codebookSize = 16,
        rerank = 40)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("query_id", "rank")
    }),

    // Scalar-quantized (int8) ANN with exact rerank: encode is replayed in
    // the oracle bit-for-bit (amax fold -> scale -> rounded tinyint codes),
    // approximate ranking picks 40 candidates, exact cosine reranks to 10.
    "sim_sq8_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.sq8TopK(emb, emb.where(col("vec_id") < 5), k = 10,
        rerank = 40)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("query_id", "rank")
    }),

    // IVF-style approximate top-k (centroid cells + nProbe probing).
    "sim_ivf_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.ivfTopK(emb, emb.where(col("vec_id") < 5), k = 10,
        nCells = 16, nProbe = 2)
        .withColumn("cosine", round(col("cosine"), 6))
        .orderBy("query_id", "rank")
    }),

    // Structured Streaming: watermarked tumbling-window aggregation run to
    // completion with Trigger.AvailableNow (north-star streaming path).
    "stream_window_counts" -> ((s, d) => {
      Graft.tune(s)
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val ev = graft.streaming.StreamingIngest
        .parquetStream(s, d, schema, globFilter = Some("events.parquet"))
        .transform(Graft.tsToNanos)
        .withColumn("ts_ts", Graft.nanosToTimestamp("ts"))
      val agg = ev
        .withWatermark("ts_ts", "2 hours")
        .groupBy(window(col("ts_ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(28, 10))).as("dv"))
      val res = graft.streaming.StreamingIngest
        .runAvailableNow(s, agg, "stream_window_counts_mem")
      res.select(
        col("window.start").cast("string").as("window_start"),
        col("event_type"), col("n_events"),
        col("dv").cast("double").as("total_value"))
        .orderBy("window_start", "event_type")
    }),

    // Streaming windowed top-k: watermarked per-(hour, user) counts
    // stream through the same AvailableNow harness, then the bounded
    // TopKAgg finisher ranks the top 3 users per window — the
    // "trending entities per window" shape with no corpus-wide sort.
    "stream_window_topk" -> ((s, d) => {
      Graft.tune(s)
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val ev = graft.streaming.StreamingIngest
        .parquetStream(s, d, schema, globFilter = Some("events.parquet"))
        .transform(Graft.tsToNanos)
        .withColumn("ts_ts", Graft.nanosToTimestamp("ts"))
        .where(col("user_id").isNotNull)
      val agg = ev
        .withWatermark("ts_ts", "2 hours")
        .groupBy(window(col("ts_ts"), "1 hour"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      val res = graft.streaming.StreamingIngest
        .runAvailableNow(s, agg, "stream_window_topk_mem")
        .select(col("window.start").cast("string").as("window_start"),
          col("user_id"), col("n_events"))
      graft.ops.TopK.perGroupTopK(
          res.withColumn("__s", col("n_events").cast("double")),
          Seq("window_start"), "user_id", "__s", 3)
        .select(col("window_start"), col("user_id"),
          col("__s").cast("long").as("n_events"), col("rank"))
        .orderBy("window_start", "rank")
    }),

    // RAKE keyphrase extraction: stopword-free runs scored deg/freq in
    // truncating integer nanos (TextAnalysis.rakeKeyphrases); phrases
    // seen at least twice corpus-wide.
    "text_rake_keyphrases" -> ((s, d) =>
      TextAnalysis.rakeKeyphrases(t(s, d, "documents"),
        Seq("a", "an", "the", "of", "to", "and", "in", "on", "is", "for"))
        .where(col("n_occ") >= 2)
        .orderBy("phrase")),

    // TF-IDF top-3 terms per document (corpus df model + per-doc top-k
    // window on the high-cardinality doc key).
    "text_tfidf" -> ((s, d) =>
      TextAnalysis.tfidfTopTerms(t(s, d, "documents"), k = 3)
        .orderBy("doc_id", "rank")),

    // Unigram-LM quality scoring: corpus-frequency model (pass 1) + mean
    // token log-prob per doc (pass 2) — see TextAnalysis.unigramLmScores
    // for the ordered-fold determinism contract.
    "text_unigram_lm" -> ((s, d) =>
      TextAnalysis.unigramLmScores(t(s, d, "documents")).orderBy("doc_id")),

    // HyperLogLog distinct-user estimate per event type next to the exact
    // count (graft.ops.Sketches.HllAgg: mergeable partial+final aggregate —
    // 4 KiB of registers per group cross the shuffle, never the user ids).
    // The estimate is deterministic (integer registers, fixed-order float
    // finish), so the oracle replays it bit-exactly.
    "sketch_hll_distinct" -> ((s, d) => {
      val ev = Graft.spread(t(s, d, "events")).where(col("user_id").isNotNull)
        .select(col("event_type"), col("user_id"),
          StableHash.hash60(col("user_id").cast("string")).as("h"))
      ev.groupBy("event_type")
        .agg(Sketches.hllDistinct(12)(col("h")).as("est_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .orderBy("event_type")
    }),

    // Grouped heavy hitters: top-3 terms per language through the bounded
    // TopKAgg (its id channel is Long, so terms ride as hash60 ids and the
    // winners join their strings back — k rows per group per partition
    // cross the shuffle, never the full term distribution).
    // String-id bounded top-k (TopKAggStr): terms rank directly through
    // the k-slot aggregate — no hash60 surrogate id + join-back, and ties
    // break on the term itself (UTF-8 byte order, DuckDB-identical).
    "text_top_terms" -> ((s, d) => {
      val toks = Graft.spread(t(s, d, "documents"))
        .select(col("lang"), explode(Text.tokens(col("text"))).as("w"))
        .where(col("w") =!= "")
      val counts = toks.groupBy("lang", "w").agg(count(lit(1)).as("c"))
      graft.ops.TopK.perGroupTopKStr(
        counts.withColumn("score", col("c").cast("double")),
        Seq("lang"), "w", "score", 3)
        .select(col("lang"), col("rank"), col("w").as("term"),
          col("score").cast("long").as("n"))
        .orderBy("lang", "rank")
    }),

    // Bigram-LM fluency scores (conditional log-prob transitions; the
    // word-order-sensitive sibling of text_unigram_lm).
    "text_bigram_lm" -> ((s, d) =>
      TextAnalysis.bigramLmScores(t(s, d, "documents")).orderBy("doc_id")),

    // DSIR importance weights: hashed n-gram log-likelihood ratio of the
    // English slice (target) vs the whole corpus (raw) — integer-nano
    // weights, bit-replayable (arXiv:2302.03169).
    "text_dsir_weights" -> ((s, d) =>
      TextAnalysis.dsirWeights(t(s, d, "documents"),
        targetPred = col("lang") === "en").orderBy("doc_id")),

    // CCNet-style head/middle/tail quality partition: exact tercile
    // cutoffs of the unigram-LM scores (scalar aggregate + broadcast,
    // never a global ntile), assignment map-side.
    "text_ppl_buckets" -> ((s, d) =>
      TextAnalysis.pplBuckets(t(s, d, "documents")).orderBy("doc_id")),

    // Gopher-style quality gate: per-rule boolean flags + the composite
    // keep verdict (thresholds tuned to split this synthetic corpus;
    // production uses the paper's 50..100k / 0.18 defaults).
    "text_quality_gate" -> ((s, d) =>
      TextAnalysis.qualityGate(t(s, d, "documents"),
        minTokens = 30, maxTokens = 80, maxPunctRatio = 0.2,
        minStopwordRatio = 0.05, maxDupLineFrac = 0.3,
        maxTopBigramFrac = 0.05)
        .orderBy("doc_id")),

    // Deterministic stratified sampling: per-source keep rates decided by
    // a stable id hash — reproducible across engines/partitionings, and
    // consistent (the same doc samples in everywhere).
    "sample_stratified" -> ((s, d) =>
      graft.ops.Sampling.stratified(
        t(s, d, "documents"), "source",
        Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.1),
        idCol = "doc_id", default = 0.05)
        .select("doc_id", "source")
        .orderBy("doc_id")),

    // Domain-mixture resampling: per-source acceptance rates that realize
    // a target mixture at maximum retention (binding stratum keeps 100%);
    // membership is the stable hash bucket vs the floor'd ppm threshold.
    // Output: per-source original count, rate, and post-sample count.
    "sample_mixture" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val targets = Map("src0" -> 0.3, "src1" -> 0.3, "src2" -> 0.4)
      val rates = graft.ops.Sampling.mixtureRates(docs, "source", targets)
      val kept = graft.ops.Sampling.mixture(docs, "source", targets, "doc_id")
        .groupBy("source").agg(count(lit(1)).as("n_kept"))
      rates.join(kept, Seq("source"), "left")
        .select(col("source"), col("n_orig"), col("rate_ppm"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
        .orderBy("source")
    }),

    // Temperature-reweighted language balancing (α = 1/2): target share
    // ∝ n^α; at max retention the rate is sqrt(n_min/n_s) — every step
    // IEEE exactly-rounded, so the ppm thresholds replay bit-for-bit.
    "sample_temperature" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val rates = graft.ops.Sampling.temperatureRates(docs, "lang", alpha = 0.5)
      val kept = graft.ops.Sampling
        .temperatureSample(docs, "lang", "doc_id", alpha = 0.5)
        .groupBy("lang").agg(count(lit(1)).as("n_kept"))
      rates.join(kept, Seq("lang"), "left")
        .select(col("lang"), col("n_orig"), col("rate_ppm"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
        .orderBy("lang")
    }),

    // Distribution matching against a REFERENCE dataset (the data-driven
    // twin of sample_mixture's explicit target map): resample the whole
    // corpus so its length-bucket profile matches the English docs'
    // profile. Membership is exact rational arithmetic — accept iff
    // hash(id) mod (m*·n_b) < n*·m_b with (n*, m*) the binding bucket —
    // so kept counts replay bit-for-bit.
    "sample_match_dist" -> ((s, d) => {
      val docs = t(s, d, "documents").where(col("n_chars").isNotNull)
        .withColumn("bucket", expr("n_chars DIV 100"))
      val ref = docs.where(col("lang") === "en")
      val kept = graft.ops.Sampling
        .matchDistribution(docs, ref, "bucket", "doc_id")
        .groupBy("bucket").agg(count(lit(1)).as("n_after"))
      val src = docs.groupBy("bucket").agg(count(lit(1)).as("n_src"))
      val rf = ref.groupBy("bucket").agg(count(lit(1)).as("n_ref"))
      src.join(rf, Seq("bucket"), "left").join(kept, Seq("bucket"), "left")
        .select(col("bucket"), col("n_src"),
          coalesce(col("n_ref"), lit(0L)).as("n_ref"),
          coalesce(col("n_after"), lit(0L)).as("n_after"))
        .orderBy("bucket")
    }),

    // Exactly-k uniform sample as the k smallest id hashes: a bounded
    // top-k (TakeOrderedAndProject), never a global sort.
    "sample_uniform_k" -> ((s, d) =>
      graft.ops.Sampling.uniformK(t(s, d, "events"), "event_id", k = 100)
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")),

    // Class-balanced subsampling: exactly k docs per language, smallest
    // stable hashes win (deterministic, layout-independent); bounded
    // k-slot buffers, no per-group sort. The hash folds mod 2^53 so the
    // aggregate's double score channel is exact.
    "sample_group_k" -> ((s, d) =>
      graft.ops.Sampling.groupK(t(s, d, "documents"), "lang", "doc_id",
        k = 20)
        .orderBy("lang", "rank")),

    // Largest-remainder (Hamilton) apportionment of a fixed sample
    // budget across strata: quota = floor share + one extra for the
    // largest remainders until the budget is exact. Pure integer
    // arithmetic — the deterministic stratified-allocation planner.
    "sample_apportion" -> ((s, d) => {
      val sizes = t(s, d, "documents").where(col("lang").isNotNull)
        .groupBy("lang").agg(count(lit(1)).as("n_s"))
      val tot = sizes.agg(sum("n_s").as("total"))
      val base = sizes.crossJoin(broadcast(tot))
        .withColumn("q0", expr("n_s * 100L DIV total"))
        .withColumn("rem", expr("(n_s * 100L) % total"))
      val deficit = base.agg((lit(100L) - sum("q0")).as("deficit"))
      base
        .withColumn("rr", row_number().over(
          Window.orderBy(col("rem").desc, col("lang").asc)).cast("long"))
        .crossJoin(broadcast(deficit))
        .select(col("lang"), col("n_s"),
          (col("q0") + when(col("rr") <= col("deficit"), 1L).otherwise(0L))
            .as("quota"))
        .orderBy("lang")
    }),

    // Class rebalancing: every source downsampled to the smallest
    // source's size; smallest stable hashes win, data-derived cut rides
    // a broadcast one-row min (Sampling.balanceClasses).
    "sample_balance_classes" -> ((s, d) =>
      graft.ops.Sampling.balanceClasses(t(s, d, "documents"),
        "source", "doc_id")
        .orderBy("source", "rank")),

    // Per-source char-budget quota: greedy in stable-hash order, a doc
    // survives iff the running char total including it stays within the
    // budget. Exact BIGINT cumsum (never a double) so the oracle replays
    // the cut point bit-for-bit.
    "sample_quota_budget" -> ((s, d) =>
      graft.ops.Sampling.quotaBudget(t(s, d, "documents"),
        "source", "doc_id", "n_chars", budget = 4000L)
        .select(col("source"), col("doc_id"),
          col("n_chars").cast("long").as("cost"), col("cum_cost"))
        .orderBy("source", "cum_cost")),

    // Weighted without-replacement sample (Efraimidis-Spirakis keys over
    // a stable hash + the portable software ln, so selection, rank and
    // key VALUES all replay bit-exactly in the oracle).
    "sample_weighted" -> ((s, d) =>
      graft.ops.Sampling.weightedK(
        t(s, d, "documents"), "doc_id", "n_chars", k = 50)
        .orderBy("rank")),

    // Count-min sketch token-frequency estimates for probe words, next to
    // exact counts. The sketch is one partial+final aggregate (3x512 exact
    // counters cross the shuffle); probe lookups read the collected sketch
    // (bounded driver work, same class as the catalog read).
    "sketch_cms_freq" -> ((s, d) => {
      import s.implicits._
      val toks = Graft.spread(t(s, d, "documents"))
        .select(explode(Text.tokens(col("text"))).as("w"))
        .where(col("w") =!= "")
      val skRow = toks
        .select(pmod(StableHash.hash60(col("w")), lit(Dedup.MinhashP)).as("h"))
        .agg(Sketches.cmsSketch(3, 512)(col("h"))).head
      // empty corpus (edge dataset): treat a null sketch as all-zero cells
      val sk: Seq[Long] =
        if (skRow.isNullAt(0)) Seq.fill(3 * 512)(0L) else skRow.getSeq[Long](0)
      val est = CmsProbeWords.map { wd =>
        val h = graft.plans.Hash60.hashUTF8(
          org.apache.spark.unsafe.types.UTF8String.fromString(wd)) %
          Dedup.MinhashP
        (wd, Sketches.cmsEstimate(sk, 3, 512, h))
      }.toDF("word", "est_count")
      val exact = toks.groupBy(col("w").as("word"))
        .agg(count(lit(1)).as("exact_count"))
      est.join(exact, Seq("word"), "left")
        .select(col("word"), col("est_count"),
          coalesce(col("exact_count"), lit(0L)).as("exact_count"))
        .orderBy("word")
    }),

    // Streaming dedup under load: every event arrives TWICE (self-union of
    // the file stream), dropDuplicatesWithinWatermark collapses them with
    // bounded state, and the survivors are profiled. Order-independent —
    // planted copies are byte-identical and source event_ids are unique —
    // so unlike most arrival-order streaming shapes this one supports a
    // strict oracle (= the same profile over the original events).
    "stream_dedup_counts" -> ((s, d) => {
      Graft.tune(s)
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val ev = graft.streaming.StreamingIngest
        .parquetStream(s, d, schema, globFilter = Some("events.parquet"))
        .transform(Graft.tsToNanos)
        .withColumn("ts", Graft.nanosToTimestamp("ts"))
      val planted = ev.union(ev)
      val ded = graft.streaming.StreamingIngest
        .dedupStream(planted, Seq("event_id"))
      val res = graft.streaming.StreamingIngest
        .runAvailableNow(s, ded, "stream_dedup_mem", outputMode = "append")
      res.groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type")
    }),

    // Deterministic 16-way shard assignment + balance audit (map-side
    // hash, k-row aggregate) — the reproducible global shuffle of a
    // training-data export.
    "shard_stats" -> ((s, d) =>
      graft.ops.Sharding.stats(
        t(s, d, "documents"), "doc_id", "n_chars", nShards = 16)
        .orderBy("shard")),

    // Sequence packing: global token offsets via the two-phase distributed
    // prefix sum (range partitions -> P-row driver scan -> partition-local
    // windows; NO single-partition global window), then 512-token sequence
    // spans.
    "pack_sequences" -> ((s, d) => {
      val withN = t(s, d, "documents").select(col("doc_id"),
        when(trim(coalesce(col("text"), lit(""))) === "", lit(0L))
          .otherwise(size(Text.tokens(col("text"))).cast("long"))
          .as("n_tokens"))
      graft.ops.Packing.packSequences(withN, "doc_id", "n_tokens", seqLen = 512)
        .orderBy("doc_id")
    }),

    // Test-set decontamination: training docs (doc_id >= 20) flagged by
    // 3-shingle overlap with a benchmark slice (doc_id < 20). Benchmark
    // shingle set broadcasts; the mark is a map-side probe.
    "text_decontaminate" -> ((s, d) => {
      val docs = t(s, d, "documents")
      TextAnalysis.decontaminate(
        docs.where(col("doc_id") >= 20), docs.where(col("doc_id") < 20),
        "text", "doc_id", shingleK = 3)
        .orderBy("doc_id")
    }),

    // Streaming funnel: per-user stateful aggregation (collect the event
    // multiset under AvailableNow), then a batch fold over the SORTED
    // timeline computes strict-order step times. Order-independent by
    // construction — the sorted array is a function of the multiset, and
    // Funnel.foldStepTimes compares ts values, never positions — so the
    // strict batch oracle (same SQL as funnel_user_steps) applies.
    // State is bounded per user at its funnel-step events only (the
    // type filter drops everything else before the agg).
    "stream_funnel_user_steps" -> ((s, d) => {
      Graft.tune(s)
      val steps = Seq("view", "click", "purchase")
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val ev = graft.streaming.StreamingIngest
        .parquetStream(s, d, schema, globFilter = Some("events.parquet"))
        .transform(Graft.tsToNanos)
        .where(col("user_id") <= 200 && col("event_type").isin(steps: _*))
        .select(col("user_id"), expr("ts DIV 1000").as("ts"), col("event_type"))
      val agg = ev.groupBy("user_id")
        .agg(collect_list(struct(col("ts"), col("event_type"))).as("evs"))
      val res = graft.streaming.StreamingIngest
        .runAvailableNow(s, agg, "stream_funnel_mem")
      res.select(col("user_id"),
          graft.ops.Funnel.foldStepTimes(sort_array(col("evs")), steps).as("st"))
        .where(col("st.step1_view").isNotNull)
        .select(col("user_id"), col("st.step1_view").as("step1_view"),
          col("st.step2_click").as("step2_click"),
          col("st.step3_purchase").as("step3_purchase"))
        .orderBy("user_id")
    }),

    // Stream-stream interval join under AvailableNow: every (view, click)
    // pair per user with the click inside [view, view + 1h]. Both sides
    // watermarked so state is evicted at watermark + window; an INNER
    // time-bounded join emits exactly the pair set regardless of arrival
    // order, so the strict batch oracle applies.
    "stream_interval_join" -> ((s, d) => {
      Graft.tune(s)
      val schema = s.read.parquet(s"$d/events.parquet").schema
      def src(tpe: String, a: String) = graft.streaming.StreamingIngest
        .parquetStream(s, d, schema, globFilter = Some("events.parquet"))
        .transform(Graft.tsToNanos)
        .where(col("event_type") === tpe && col("user_id") <= 100)
        .select(col("user_id").as(s"${a}_user"),
          Graft.nanosToTimestamp("ts").as(s"${a}_ts"),
          expr("ts DIV 1000").as(s"${a}_us"))
      val views = src("view", "v").withWatermark("v_ts", "2 hours")
      val clicks = src("click", "c").withWatermark("c_ts", "2 hours")
      val joined = views.join(clicks,
        expr("v_user = c_user AND c_ts >= v_ts AND c_ts <= v_ts + interval 1 hour"))
      graft.streaming.StreamingIngest
        .runAvailableNow(s, joined, "stream_ij_mem", outputMode = "append")
        .select(col("v_user").as("user_id"),
          col("v_us").as("view_us"), col("c_us").as("click_us"))
        .orderBy("user_id", "view_us", "click_us")
    }),

    // Streaming CDC merge: the update feed arrives as a stream, the
    // latest-version-per-key reduction runs INSIDE the stream (max-struct
    // argmax — commutative and associative, hence arrival-order-free),
    // and the batch anti-join+union applies the compacted delta to the
    // snapshot. Same strict oracle as the batch upsert_merge.
    "stream_upsert_merge" -> ((s, d) => {
      Graft.tune(s)
      val schema = s.read.parquet(s"$d/orders.parquet").schema
      val base = graft.streaming.StreamingIngest
        .parquetStream(s, d, schema, globFilter = Some("orders.parquet"))
        .where(col("o_orderkey") <= 5000 && col("o_orderkey") % 10 === 0)
      def version(bump: Double, seq: Long) = base.select(
        col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice") + bump).as("o_totalprice"), lit(seq).as("seq"))
      val updates = version(1.0, 1L).unionByName(version(2.0, 2L))
      val latest = graft.streaming.StreamingIngest.runAvailableNow(
        s, graft.ops.Upsert.latestPerKey(updates, Seq("o_orderkey"), "seq"),
        "stream_upsert_mem")
      val cur = t(s, d, "orders").where(col("o_orderkey") <= 5000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          lit(0L).as("seq"))
      cur.join(latest.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
        .unionByName(latest.select(cur.columns.map(col): _*))
        .orderBy("o_orderkey")
    }),

    // Streaming Bloom-prefiltered incremental dedup: the seen side seeds
    // an append-only target; incoming docs arrive as 4 parquet files
    // streamed one per micro-batch (file order is whatever the source
    // lists), and each batch appends only digests absent from the
    // target-so-far via the Bloom-routed anti-join. The returned NEW
    // DIGEST SET is arrival-order independent by construction.
    "stream_bloom_new_docs" -> ((s, d) => {
      Graft.tune(s)
      val docs = t(s, d, "documents")
      val root = java.nio.file.Files
        .createTempDirectory("graft_stream_bloom_").toString
      val target = s"$root/target"
      val inDir = s"$root/incoming"
      val seenDigests = docs.where(col("doc_id") < 250)
        .select(md5(col("text")).as("digest"), col("doc_id"))
      seenDigests.write.mode("overwrite").parquet(target)
      docs.where(col("doc_id") >= 250).select(col("doc_id"), col("text"))
        .repartition(4).write.mode("overwrite").parquet(inDir)
      val schema = s.read.parquet(inDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
        .select(md5(col("text")).as("digest"), col("doc_id"))
      val q = graft.streaming.StreamingIngest
        .bloomUpsertStream(stream, "digest", target, expectedItems = 1 << 16)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ck")
        .start()
      q.awaitTermination()
      // Appended rows are exactly those carrying incoming ids: a plain
      // anti-join readback against the seed would also surface a NULL-
      // digest SEED row (NULL never matches an anti join), while a null
      // digest must count as new only when an incoming doc carries it —
      // the oracle's NOT-EXISTS semantics (null is always "new").
      s.read.parquet(target).where(col("doc_id") >= 250)
        .select("digest").distinct().orderBy("digest")
    }),

    // Streaming per-key daily gap fill (transformWithState; O(1) state
    // per key — last day + value): missing days are emitted forward-
    // filled as observations arrive. With the whole file as one batch
    // the emitted series equals the batch gap fill exactly, which is
    // what the oracle replays; batch-boundary independence under
    // day-aligned splits is spec'd in StreamingSpec.
    "stream_gapfill" -> ((s, d) => {
      Graft.tune(s)
      val prev = s.conf.getOption(
        "spark.sql.streaming.stateStore.providerClass")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        import s.implicits._
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val ev = graft.streaming.StreamingIngest
          .parquetStream(s, d, schema, globFilter = Some("events.parquet"))
          .transform(Graft.tsToNanos)
          .where(col("ts").isNotNull && col("user_id").isNotNull &&
            col("value").isNotNull && col("user_id") <= 20)
          .select(col("user_id").cast("long"),
            datediff(date_trunc("day", Graft.nanosToTimestamp("ts"))
              .cast("date"), lit("1970-01-01").cast("date")).cast("int"),
            cents(col("value")))
          .as[(Long, Int, Long)]
        val filled = graft.streaming.GapFillStream.gapFillStream(ev)
          .toDF("user_id", "day_i", "cents", "filled")
        graft.streaming.StreamingIngest
          .runAvailableNow(s, filled, "stream_gapfill_mem",
            outputMode = "append")
          .select(col("user_id"),
            date_add(lit("1970-01-01").cast("date"), col("day_i"))
              .cast("string").as("day"),
            (col("cents").cast("double") / 100).as("v_ffill"),
            col("filled"))
          .orderBy("user_id", "day")
      } finally {
        prev match {
          case Some(p) => s.conf.set(
            "spark.sql.streaming.stateStore.providerClass", p)
          case None => s.conf.unset(
            "spark.sql.streaming.stateStore.providerClass")
        }
      }
    }),

    // Multimodal: synthetic media + metadata extraction (decode stays
    // stubbed; plumbing is real — see graft.ops.Multimodal).
    "mm_media_meta" -> ((s, d) => {
      val m = Multimodal.withMeta(
        Multimodal.syntheticMediaFromDocs(t(s, d, "documents")))
      m.select(col("media_id"), col("kind"),
        col("meta.n_bytes").as("n_bytes"),
        col("meta.digest").as("digest"),
        col("meta.format").as("format"))
        .orderBy("media_id")
    })
  )

  // ---- oracles ------------------------------------------------------------

  def oracleSql: Map[String, String] = Map(

    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         | CAST(SUM(${centsSql("l_quantity")}) AS DOUBLE) / 100 AS sum_qty,
         | CAST(SUM(${centsSql("l_extendedprice")}) AS DOUBLE) / 100 AS sum_base_price,
         | $revSql AS sum_disc_price,
         | CAST(SUM(${centsSql("l_quantity")}) AS DOUBLE) / 100 / COUNT(*) AS avg_qty,
         | COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "o3_zorder" -> {
      def zSql(a: String, b: String, bits: Int): String =
        (0 until bits).flatMap(i => Seq(
          s"(((CAST($a AS BIGINT) >> $i) & 1) << ${2 * i})",
          s"(((CAST($b AS BIGINT) >> $i) & 1) << ${2 * i + 1})"))
          .mkString("(", " | ", ")")
      s"""SELECT p_partkey, p_size, ${zSql("p_size", "p_partkey", 16)} AS z
         |FROM part ORDER BY z ASC, p_partkey ASC LIMIT 200""".stripMargin
    },

    "a15_salted_agg" ->
      s"""SELECT l_returnflag,
         | CAST(SUM(${centsSql("l_quantity")}) AS DOUBLE) / 100 AS sum_qty,
         | COUNT(*) AS n_rows
         |FROM lineitem GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin,

    "s2_json_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
        |ORDER BY s_suppkey""".stripMargin,

    "s3_orc_roundtrip" ->
      "SELECT * FROM part ORDER BY p_partkey",

    "s4_scan" -> "SELECT * FROM region ORDER BY r_regionkey",

    "s5_catalog" ->
      """SELECT * FROM (VALUES ('graft_customer'), ('graft_nation'),
        | ('graft_region')) t(table_name)
        |ORDER BY table_name""".stripMargin,

    "s6_filtered_scan" ->
      """SELECT n_nationkey, n_name FROM nation
        |WHERE n_regionkey = 2 ORDER BY n_nationkey""".stripMargin,

    "p2_project_cast" ->
      """SELECT o_orderkey AS order_id, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
        | COALESCE(o_totalprice, 0.0) AS total_price, o_orderpriority AS priority
        |FROM orders WHERE o_orderkey <= 3000 ORDER BY order_id""".stripMargin,

    "p3_horizontal_sum" ->
      """SELECT l_orderkey, l_linenumber,
        | COALESCE(l_quantity, 0.0) + COALESCE(l_discount, 0.0) + COALESCE(l_tax, 0.0) AS h_sum
        |FROM lineitem WHERE l_orderkey <= 2000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "f2_null_drop" ->
      """SELECT l_orderkey, l_linenumber,
        | NULLIF(l_discount, 0.0) AS disc_nz, NULLIF(l_tax, 0.0) AS tax_nz
        |FROM lineitem
        |WHERE l_orderkey <= 3000
        | AND NULLIF(l_discount, 0.0) IS NOT NULL AND NULLIF(l_tax, 0.0) IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "f3_zero_sentinel" ->
      """SELECT l_orderkey, l_linenumber,
        | CASE WHEN l_quantity = 0 OR l_discount = 0 OR l_tax = 0 THEN NULL ELSE l_quantity END AS l_quantity,
        | CASE WHEN l_quantity = 0 OR l_discount = 0 OR l_tax = 0 THEN NULL ELSE l_discount END AS l_discount,
        | CASE WHEN l_quantity = 0 OR l_discount = 0 OR l_tax = 0 THEN NULL ELSE l_tax END AS l_tax
        |FROM lineitem WHERE l_orderkey <= 2000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "f4_in_filter" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_nationkey IN (1, 3, 5)
        |ORDER BY c_custkey""".stripMargin,

    "f6_distinct" ->
      """SELECT DISTINCT c_mktsegment FROM customer
        |WHERE c_mktsegment IS NOT NULL ORDER BY c_mktsegment""".stripMargin,

    "j1_multiway_join" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_items, $revSql AS revenue
         |FROM lineitem
         | JOIN orders   ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         | JOIN nation   ON c_nationkey = n_nationkey
         | JOIN region   ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "j1_fold_join" ->
      """SELECT o_orderkey AS k, o_orderstatus AS status, o_totalprice AS val,
        | b.n_items, b.val_f1
        |FROM orders
        |JOIN (SELECT l_orderkey AS k, COUNT(*) AS n_items,
        |        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS val_f1
        |      FROM lineitem GROUP BY l_orderkey) b
        | ON o_orderkey = b.k
        |ORDER BY k""".stripMargin,

    "j2_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "j3_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "j4_asof_join" ->
      """WITH v AS (
        | SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
        | WHERE event_type = 'view' AND user_id <= 300),
        |p AS (
        | SELECT user_id, epoch_us(ts) AS ts_us, MAX(value) AS pval FROM events
        | WHERE event_type = 'purchase' AND user_id <= 300 GROUP BY 1, 2)
        |SELECT v.user_id, v.ts_us, v.event_id, p.pval AS asof_pval
        |FROM v ASOF LEFT JOIN p
        |  ON v.user_id = p.user_id AND v.ts_us >= p.ts_us
        |ORDER BY v.user_id, v.ts_us, v.event_id""".stripMargin,

    "j5_range_join" ->
      """WITH v AS (
        | SELECT user_id, epoch_us(ts) AS ts_us, event_id AS view_id FROM events
        | WHERE event_type = 'view' AND user_id <= 300),
        |w AS (
        | SELECT user_id, epoch_us(ts) AS start_us,
        |  epoch_us(ts) + 3600000000 AS end_us, event_id AS purchase_id
        | FROM events WHERE event_type = 'purchase' AND user_id <= 300)
        |SELECT v.user_id, v.view_id, w.purchase_id, v.ts_us, w.start_us
        |FROM v JOIN w ON v.user_id = w.user_id
        | AND v.ts_us >= w.start_us AND v.ts_us <= w.end_us
        |ORDER BY v.user_id, v.view_id, w.purchase_id""".stripMargin,

    "j7_interval_overlap" ->
      """WITH p AS (
        | SELECT user_id, epoch_us(ts) AS p_start,
        |  epoch_us(ts) + 3600000000 AS p_end, event_id AS purchase_id
        | FROM events WHERE event_type = 'purchase' AND user_id <= 300),
        |v AS (
        | SELECT user_id, epoch_us(ts) AS v_start,
        |  epoch_us(ts) + 1800000000 AS v_end, event_id AS view_id
        | FROM events WHERE event_type = 'view' AND user_id <= 300)
        |SELECT p.user_id, p.purchase_id, v.view_id,
        | least(p.p_end, v.v_end) - greatest(p.p_start, v.v_start)
        |   AS overlap_us
        |FROM p JOIN v ON v.user_id = p.user_id
        | AND p.p_start <= v.v_end AND v.v_start <= p.p_end
        |ORDER BY p.user_id, p.purchase_id, v.view_id""".stripMargin,

    "j6_null_safe_join" ->
      """WITH n AS (
        | SELECT n_nationkey, NULLIF(n_regionkey, 2) AS rk FROM nation)
        |SELECT a.n_nationkey AS k_a, b.n_nationkey AS k_b, a.rk
        |FROM n a JOIN n b ON a.rk IS NOT DISTINCT FROM b.rk
        |ORDER BY k_a, k_b""".stripMargin,

    "x7_array_funcs" ->
      """SELECT l_orderkey,
        | CAST(len(ls) AS BIGINT) AS n_lines,
        | array_to_string(list_transform(ls, x -> CAST(x AS VARCHAR)), ',') AS line_csv,
        | ls[1] AS first_line,
        | ls[-1] AS last_line
        |FROM (
        | SELECT l_orderkey, list_sort(list(l_linenumber)) AS ls
        | FROM lineitem WHERE l_orderkey <= 500 GROUP BY l_orderkey)
        |ORDER BY l_orderkey""".stripMargin,

    "a2_ratio" ->
      """SELECT o_orderpriority,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        | COUNT(*) AS n_orders,
        | CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |   / NULLIF(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END), 0) AS price_per_finished
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "a3_conditional_agg" ->
      """SELECT c_nationkey,
        | COUNT(*) AS n_customers,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
        | CAST(SUM(CASE WHEN c_acctbal > 0 THEN 1 END) AS BIGINT) AS n_positive,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_correlated_subquery" -> correlatedSubquerySql,

    "q_topn_per_group" -> topnPerGroupSql,

    "a4_dup_audit" ->
      """SELECT user_id, event_type, COUNT(*) AS n FROM events
        |GROUP BY user_id, event_type HAVING COUNT(*) > 1
        |ORDER BY user_id, event_type""".stripMargin,

    "a5_completeness" -> {
      val cols = Seq("event_id", "user_id", "event_type_nc", "value")
      cols.map { c =>
        s"""SELECT 'events' AS table_name, '$c' AS column_name,
           | COUNT(*) AS row_count, COUNT($c) AS non_null_count,
           | CASE WHEN COUNT(*) = 0 THEN 0.0
           |      ELSE CAST((COUNT($c) * 10000 + COUNT(*) // 2) // COUNT(*) AS DOUBLE) / 100
           | END AS pct_not_null
           |FROM (SELECT event_id, user_id,
           |        NULLIF(event_type, 'click') AS event_type_nc, value
           |      FROM events)""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },

    "a6_numeric_means" ->
      """SELECT
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_quantity,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_extendedprice,
        | CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_discount,
        | CAST(SUM(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_tax) AS avg_tax
        |FROM lineitem""".stripMargin,

    "a7_grouped_mean" ->
      """SELECT l_returnflag,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a9_count_distinct" ->
      """SELECT l_returnflag,
        | COUNT(DISTINCT l_suppkey) AS n_supp,
        | COUNT(DISTINCT l_partkey) AS n_part,
        | COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a10_rollup" ->
      """SELECT GROUPING(c_mktsegment) * 2 + GROUPING(c_nationkey) AS gid,
        | c_mktsegment, c_nationkey, COUNT(*) AS n,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer GROUP BY ROLLUP(c_mktsegment, c_nationkey)
        |ORDER BY gid, c_mktsegment, c_nationkey""".stripMargin,

    "a11_percentiles" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.5) AS median_qty,
        | quantile_cont(l_extendedprice, 0.9) AS p90_price,
        | quantile_cont(l_discount, 0.25) AS p25_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a13_argmax" ->
      """SELECT c_nationkey,
        | CAST(count_if(c_acctbal > 0) AS BIGINT) AS n_positive,
        | bool_and(c_acctbal > -1000) AS all_above_floor,
        | bool_or(c_acctbal > 9000) AS any_rich,
        | max_by(c_name, c_acctbal * 1000000 + c_custkey) AS richest,
        | min_by(c_name, c_acctbal * 1000000 + c_custkey) AS poorest
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "a14_stats" ->
      """WITH m AS (
        | SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sp,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sqq,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS spp,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sqp
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        | ROUND((sqq - sq * sq / n) / (n - 1), 6) AS var_qty,
        | ROUND((n * sqp - sq * sp) /
        |  sqrt((n * sqq - sq * sq) * (n * spp - sp * sp)), 9) AS corr_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "a18_regression" ->
      """WITH m AS (
        | SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
        | FROM lineitem GROUP BY l_returnflag),
        |f AS (
        | SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd, sx, sy, sxx, sxy, syy,
        |  CAST(n AS DOUBLE) * sxy - sx * sy AS covn,
        |  CAST(n AS DOUBLE) * sxx - sx * sx AS varxn,
        |  CAST(n AS DOUBLE) * syy - sy * sy AS varyn
        | FROM m)
        |SELECT l_returnflag, n,
        | ROUND(covn / NULLIF(varxn, 0.0), 9) AS slope,
        | ROUND((sy - (covn / NULLIF(varxn, 0.0)) * sx) / nd, 9) AS intercept,
        | ROUND(covn * covn / NULLIF(varxn * varyn, 0.0), 9) AS r2
        |FROM f ORDER BY l_returnflag""".stripMargin,

    "a16_cube" ->
      """SELECT GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
        | l_returnflag, l_linestatus, COUNT(*) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,

    "a19_grouping_sets" ->
      """WITH b AS (
        | SELECT event_type, CAST(user_id % 3 AS BIGINT) AS cohort
        | FROM events)
        |SELECT GROUPING(event_type) * 2 + GROUPING(cohort) AS gid,
        | event_type, cohort, COUNT(*) AS n
        |FROM b GROUP BY GROUPING SETS ((event_type), (cohort), ())
        |ORDER BY gid, event_type, cohort""".stripMargin,

    "a17_unpivot" ->
      """WITH src AS (SELECT * FROM lineitem WHERE l_orderkey <= 500)
        |SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM src
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM src
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM src
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM src
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,

    "w5_frames" ->
      """SELECT o_custkey, o_orderkey,
        | cume_dist() OVER w AS cd,
        | first_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_ok,
        | last_value(o_orderkey) OVER (w ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_ok,
        | nth_value(o_orderkey, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_ok,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |   OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3
        |FROM orders WHERE o_custkey <= 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    // The dynamic pivot discovers the same spine from the data, so its
    // oracle is the explicit-values statement.
    "a18_dynamic_pivot" -> {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val cases = types.map(ty =>
        s"CAST(SUM(CASE WHEN event_type = '$ty' THEN CAST(value AS DECIMAL(28,10)) END) AS DOUBLE) AS $ty")
        .mkString(",\n ")
      s"""SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
         | $cases
         |FROM events GROUP BY 1 ORDER BY day""".stripMargin
    },

    "a8_pivot" -> {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val cases = types.map(ty =>
        s"CAST(SUM(CASE WHEN event_type = '$ty' THEN CAST(value AS DECIMAL(28,10)) END) AS DOUBLE) AS $ty")
        .mkString(",\n ")
      s"""SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
         | $cases
         |FROM events GROUP BY 1 ORDER BY day""".stripMargin
    },

    "o1_sort" -> "SELECT n_nationkey, n_name FROM nation ORDER BY n_name",

    "o2_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "u1_union" ->
      """SELECT * FROM (
        | SELECT 'c' AS src, c_custkey AS id, c_name AS name, c_acctbal AS bal
        | FROM customer WHERE c_nationkey = 1
        | UNION ALL
        | SELECT 's' AS src, s_suppkey AS id, s_name AS name, NULL AS bal
        | FROM supplier WHERE s_nationkey = 1)
        |ORDER BY src, id""".stripMargin,

    "u2_intersect_except" ->
      """WITH b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        | u AS (SELECT o_custkey AS c_custkey FROM orders
        |       WHERE o_orderpriority = '1-URGENT')
        |SELECT * FROM (
        | SELECT c_custkey, 'both' AS src FROM (SELECT * FROM b INTERSECT SELECT * FROM u)
        | UNION ALL
        | SELECT c_custkey, 'building_only' AS src FROM (SELECT * FROM b EXCEPT SELECT * FROM u))
        |ORDER BY src, c_custkey""".stripMargin,

    "mm_frame_sample" ->
      """WITH decoded AS (
        | SELECT doc_id AS media_id,
        |  1 + CAST(COALESCE(octet_length(encode(text)), 0) % 30 AS INT) AS n_frames
        | FROM documents)
        |SELECT media_id, CAST(f.f AS INT) AS frame_idx
        |FROM decoded, (SELECT unnest(range(0, 30, 7)) AS f) f
        |WHERE f.f < n_frames
        |ORDER BY media_id, frame_idx""".stripMargin,

    "x6_string_funcs" ->
      """SELECT p_partkey,
        | upper(p_brand) AS u, lower(p_type) AS l,
        | length(p_name) AS len, substr(p_name, 1, 8) AS pre,
        | regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        | lpad(p_brand, 12, '.') AS padded,
        | (p_type LIKE '%BRASS%') AS is_brass
        |FROM part WHERE p_partkey <= 2000 ORDER BY p_partkey""".stripMargin,

    "x8_date_funcs" ->
      """SELECT o_orderkey,
        | year(o_orderdate) AS y, quarter(o_orderdate) AS q,
        | month(o_orderdate) AS m, day(o_orderdate) AS dom,
        | CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS plus30,
        | date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
        |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin,

    "x1_norm_identifier" ->
      """SELECT doc_id,
        | regexp_replace(regexp_replace(regexp_replace(
        |   regexp_replace(lower(source || ' (' || upper(lang) || ')'),
        |     '[^0-9a-z]+', '_', 'g'),
        |   '_+', '_', 'g'), '^_', ''), '_$', '') AS norm_name
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x4_coerce" ->
      """WITH base AS (
        | SELECT p_partkey AS id,
        |  list_extract([' 42 ','3.14','-7.5','1e3','abc','','  ','12abc','0042','+5'],
        |   CAST(p_partkey % 10 AS INT) + 1) AS raw_num,
        |  list_extract(['04/05/2021','2021-03-04','not-a-date','13/01/2021',
        |   '12/31/1999','02/29/2020','02/30/2021',''],
        |   CAST(p_partkey % 8 AS INT) + 1) AS raw_date,
        |  list_extract([' spaced ','nospaces','  double  ','',' mixed Case '],
        |   CAST(p_partkey % 5 AS INT) + 1) AS raw_str,
        |  p_size
        | FROM part WHERE p_partkey <= 2000)
        |SELECT id,
        | raw_num, TRY_CAST(raw_num AS DOUBLE) AS num,
        | raw_date,
        | CAST(COALESCE(CAST(try_strptime(raw_date, '%m/%d/%Y') AS DATE),
        |               TRY_CAST(raw_date AS DATE)) AS VARCHAR) AS dt,
        | raw_str, trim(raw_str) AS trimmed,
        | trim(CAST(p_size AS VARCHAR)) AS size_str
        |FROM base ORDER BY id""".stripMargin,

    "x3_quarter_norm" ->
      """WITH raws AS (
        | SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 3 = 0
        |       THEN CAST(year(o_orderdate) AS VARCHAR) || 'Q' || CAST(quarter(o_orderdate) AS VARCHAR)
        |       WHEN o_orderkey % 3 = 1
        |       THEN 'Quarter ' || CAST(quarter(o_orderdate) AS VARCHAR) || ' of ' || CAST(year(o_orderdate) AS VARCHAR)
        |       ELSE CAST(year(o_orderdate) AS VARCHAR) || ' Q' || CAST(quarter(o_orderdate) AS VARCHAR)
        |  END AS raw_quarter
        | FROM orders WHERE o_orderkey <= 3000)
        |SELECT o_orderkey, raw_quarter,
        | CASE WHEN regexp_extract(raw_quarter, '(20\d{2}).*?(\d)', 1) = ''
        |        OR regexp_extract(raw_quarter, '(20\d{2}).*?(\d)', 2) = ''
        |      THEN NULL
        |      ELSE regexp_extract(raw_quarter, '(20\d{2}).*?(\d)', 1) || '-Q'
        |           || regexp_extract(raw_quarter, '(20\d{2}).*?(\d)', 2)
        | END AS norm_quarter
        |FROM raws ORDER BY o_orderkey""".stripMargin,

    "x5_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE event_id <= 2000 ORDER BY event_id""".stripMargin,

    "w1_window" ->
      """SELECT o_custkey, o_orderkey,
        | ROW_NUMBER() OVER w AS rn,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders WHERE o_custkey <= 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,

    "w2_sessionize" ->
      """WITH flagged AS (
        | SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |       THEN 1 ELSE 0 END AS new_session
        | FROM events WHERE user_id <= 200
        | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |sessions AS (
        | SELECT user_id, event_id, ts_us,
        |  SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        | FROM flagged)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        | COUNT(*) AS n_events,
        | CAST(MIN(ts_us) AS BIGINT) AS start_us, CAST(MAX(ts_us) AS BIGINT) AS end_us
        |FROM sessions GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,

    "w3_session_window" ->
      """WITH flagged AS (
        | SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
        |       THEN 1 ELSE 0 END AS new_session
        | FROM events WHERE user_id <= 200
        | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |sessions AS (
        | SELECT user_id, event_id, ts_us,
        |  SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        | FROM flagged)
        |SELECT user_id,
        | CAST(MIN(ts_us) AS BIGINT) AS start_us,
        | CAST(MAX(ts_us) + 1800000000 AS BIGINT) AS end_us,
        | COUNT(*) AS n_events
        |FROM sessions GROUP BY user_id, session_seq
        |ORDER BY user_id, start_us""".stripMargin,

    "w4_rank_funcs" ->
      """SELECT c_nationkey, c_custkey,
        | CAST(RANK() OVER w AS BIGINT) AS rnk,
        | CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
        | CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        | LAG(c_custkey, 1) OVER w AS prev_cust,
        | LEAD(c_custkey, 1, -1) OVER w AS next_cust,
        | PERCENT_RANK() OVER w AS pct_rank
        |FROM customer WHERE c_nationkey <= 5
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
        |ORDER BY c_nationkey, rnk, c_custkey""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS digest, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY digest""".stripMargin,

    "incr_agg_merge" -> {
      val q = centsSql("l_quantity")
      s"""SELECT l_returnflag,
         | CAST(SUM($q) AS DOUBLE) / 100 AS total,
         | CAST(SUM($q) AS DOUBLE) / 100 / CAST(COUNT(l_quantity) AS DOUBLE) AS mean,
         | COUNT(l_quantity) AS n
         |FROM lineitem GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin
    },

    "f9_iqr_outliers" ->
      """WITH qs AS (
        | SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.25) AS q1,
        |  quantile_cont(o_totalprice, 0.75) AS q3
        | FROM orders GROUP BY 1)
        |SELECT o.o_orderpriority, o.o_orderkey, o.o_totalprice
        |FROM orders o JOIN qs USING (o_orderpriority)
        |WHERE o.o_totalprice < qs.q1 - (qs.q3 - qs.q1) * 0.5
        |   OR o.o_totalprice > qs.q3 + (qs.q3 - qs.q1) * 0.5
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "bloom_new_docs" ->
      """SELECT i.doc_id FROM documents i
        |WHERE i.doc_id >= 250 AND NOT EXISTS (
        |  SELECT 1 FROM documents s
        |  WHERE s.doc_id < 250 AND md5(s.text) = md5(i.text))
        |ORDER BY doc_id""".stripMargin,

    "stream_bloom_new_docs" ->
      """SELECT DISTINCT md5(i.text) AS digest FROM documents i
        |WHERE i.doc_id >= 250 AND NOT EXISTS (
        |  SELECT 1 FROM documents s
        |  WHERE s.doc_id < 250 AND md5(s.text) = md5(i.text))
        |ORDER BY digest""".stripMargin,

    "s7_schema_evolution" ->
      """SELECT o_orderkey, o_custkey,
        | CASE WHEN o_orderkey <= 1000 THEN NULL ELSE o_totalprice END AS o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "funnel_user_steps" -> funnelUserStepsSql,

    // identical semantics, streaming execution path on the Spark side
    "stream_funnel_user_steps" -> funnelUserStepsSql,

    "funnel_counts" ->
      """WITH ev AS (
        | SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |s1 AS (
        | SELECT user_id, MIN(ts_us) AS t FROM ev
        | WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        | SELECT e.user_id, MIN(e.ts_us) AS t
        | FROM ev e JOIN s1 ON e.user_id = s1.user_id
        | WHERE e.event_type = 'click' AND e.ts_us > s1.t GROUP BY 1),
        |s3 AS (
        | SELECT e.user_id, MIN(e.ts_us) AS t
        | FROM ev e JOIN s2 ON e.user_id = s2.user_id
        | WHERE e.event_type = 'purchase' AND e.ts_us > s2.t GROUP BY 1)
        |SELECT CAST(1 AS INTEGER) AS step_no, 'step1_view' AS step,
        |       (SELECT COUNT(*) FROM s1) AS n_entities
        |UNION ALL SELECT CAST(2 AS INTEGER), 'step2_click', (SELECT COUNT(*) FROM s2)
        |UNION ALL SELECT CAST(3 AS INTEGER), 'step3_purchase', (SELECT COUNT(*) FROM s3)
        |ORDER BY step_no""".stripMargin,

    // All-integer replay of Cohort.retention: epoch_us*1000 == the
    // engine's nano ts, truncating // == Spark DIV (all values positive).
    "cohort_retention" ->
      """WITH act AS (
        | SELECT DISTINCT user_id AS e,
        |  (epoch_us(ts) * 1000) // 86400000000000 AS pd
        | FROM events WHERE event_type = 'purchase'
        |   AND user_id IS NOT NULL AND ts IS NOT NULL),
        |coh AS (SELECT e, MIN(pd) AS c0 FROM act GROUP BY e),
        |sizes AS (SELECT c0, CAST(COUNT(*) AS BIGINT) AS cohort_size
        |          FROM coh GROUP BY c0),
        |m AS (SELECT c.c0 AS cohort_period, a.pd - c.c0 AS period_offset,
        |        CAST(COUNT(*) AS BIGINT) AS n_active
        |      FROM act a JOIN coh c ON c.e = a.e GROUP BY 1, 2)
        |SELECT m.cohort_period, m.period_offset, m.n_active, s.cohort_size,
        | CAST((m.n_active * 1000000000) // s.cohort_size AS BIGINT)
        |   AS retention_nano
        |FROM m JOIN sizes s ON s.c0 = m.cohort_period
        |ORDER BY cohort_period, period_offset""".stripMargin,

    // Replays snapshotDiff: same version derivations, FULL OUTER JOIN on
    // the key, IS DISTINCT FROM per value column, name-sorted change mask.
    "dq_snapshot_diff" ->
      """WITH o AS (
        | SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS tp
        | FROM orders WHERE o_orderkey <= 6000 AND o_orderkey % 7 <> 0),
        |n AS (
        | SELECT o_orderkey AS k,
        |  CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END AS st,
        |  CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
        |       ELSE o_totalprice END AS tp
        | FROM orders WHERE o_orderkey <= 6000 AND o_orderkey % 5 <> 0),
        |j AS (
        | SELECT COALESCE(o.k, n.k) AS o_orderkey,
        |  o.k IS NOT NULL AS in_old, n.k IS NOT NULL AS in_new,
        |  o.st IS DISTINCT FROM n.st AS d_st,
        |  o.tp IS DISTINCT FROM n.tp AS d_tp
        | FROM o FULL OUTER JOIN n ON n.k = o.k)
        |SELECT o_orderkey,
        | CASE WHEN NOT in_old THEN 'added'
        |      WHEN NOT in_new THEN 'removed'
        |      ELSE 'changed' END AS change,
        | CASE WHEN in_old AND in_new
        |      THEN CAST(d_st AS BIGINT) + CAST(d_tp AS BIGINT)
        |      ELSE 0 END AS n_cols_changed,
        | CASE WHEN in_old AND in_new THEN
        |   ltrim(CASE WHEN d_st THEN ',o_orderstatus' ELSE '' END ||
        |         CASE WHEN d_tp THEN ',o_totalprice' ELSE '' END, ',')
        |  ELSE '' END AS changed_cols
        |FROM j
        |WHERE NOT (in_old AND in_new) OR d_st OR d_tp
        |ORDER BY o_orderkey""".stripMargin,

    "upsert_merge" -> upsertMergeSql,

    "upsert_scd2" ->
      """WITH src AS (
        | SELECT user_id, event_id, event_type FROM events WHERE user_id <= 100),
        |chg AS (
        | SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev,
        |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        | FROM src),
        |keep AS (
        | SELECT user_id, event_id, event_type FROM chg
        | -- rn = 1 keeps a NULL-valued first version: the Spark side lags a
        | -- STRUCT (never null-equal to its first-row NULL), so the scalar
        | -- IS DISTINCT FROM alone would diverge on NULL-leading keys
        | WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
        |v AS (
        | SELECT user_id, event_type, event_id AS valid_from,
        |  lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS valid_to,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT) AS version_no
        | FROM keep)
        |SELECT user_id, event_type, valid_from, valid_to, version_no,
        | (valid_to IS NULL) AS is_current
        |FROM v ORDER BY user_id, version_no""".stripMargin,

    // identical semantics, streaming latest-per-key on the Spark side
    "stream_upsert_merge" -> upsertMergeSql,

    "stream_interval_join" ->
      """SELECT v.user_id, epoch_us(v.ts) AS view_us, epoch_us(c.ts) AS click_us
        |FROM events v JOIN events c
        | ON c.user_id = v.user_id
        | AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
        |WHERE v.event_type = 'view' AND c.event_type = 'click'
        | AND v.user_id <= 100
        |ORDER BY 1, 2, 3""".stripMargin,

    "dedup_minhash" -> minhashOracle,
    "dedup_minhash_calibration" -> minhashCalibrationOracle,

    "dedup_minhash_band_stats" -> {
      val p = Dedup.MinhashP
      val mins = (0 until 16).map { j =>
        val (a, b) = Dedup.minhashCoeffs(j)
        s"COALESCE(MIN((($a * (${hash60Sql("s.sh")} % $p)) + $b) % $p), ${Long.MaxValue}) AS h$j"
      }.mkString(",\n ")
      val bandRows = (0 until 4).map { bd =>
        val cat = (0 until 4).map(r => s"CAST(h${bd * 4 + r} AS VARCHAR)")
          .mkString(" || ',' || ")
        s"SELECT doc_id, CAST($bd AS INTEGER) AS band, md5($cat) AS bucket FROM sig"
      }.mkString("\n UNION ALL ")
      s"""WITH $shingleCtes,
         |sig AS (
         | SELECT d.doc_id,
         | $mins
         | FROM documents d LEFT JOIN shingles s ON s.doc_id = d.doc_id
         | GROUP BY d.doc_id),
         |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
         |bands AS (
         | $bandRows),
         |bk AS (SELECT band, bucket, CAST(COUNT(*) AS BIGINT) AS n_members
         |       FROM bands GROUP BY 1, 2),
         |mb AS (SELECT * FROM bk WHERE n_members > 1)
         |SELECT band, CAST(COUNT(*) AS BIGINT) AS n_multi_buckets,
         | MAX(n_members) AS max_bucket,
         | CAST(SUM(n_members * (n_members - 1) // 2) AS BIGINT)
         |   AS cand_pairs,
         | nd.n_docs - CAST(SUM(n_members) AS BIGINT) AS n_singletons
         |FROM mb CROSS JOIN nd GROUP BY band, nd.n_docs
         |ORDER BY band""".stripMargin
    },

    "dedup_winnow_fp" ->
      (s"""WITH $winnowCtes
        |SELECT doc_id, fp, fp_pos FROM fps
        |ORDER BY doc_id, fp_pos, fp""".stripMargin),

    "dedup_winnow" ->
      (s"""WITH $winnowCtes,
        |dfp AS (SELECT DISTINCT doc_id, fp FROM fps),
        |capped AS (
        | SELECT doc_id, fp FROM (
        |  SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS fdf FROM dfp)
        | WHERE fdf <= 10000)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        | CAST(count(*) AS BIGINT) AS n_shared
        |FROM capped a JOIN capped b ON b.fp = a.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 3
        |ORDER BY id_a, id_b""".stripMargin),

    "dedup_group_minhash" -> groupMinhashOracle,

    "dedup_simhash" -> simhashOracle(16),

    "dedup_ngram_jaccard" -> ngramJaccardOracle,
    "dedup_containment" -> containmentOracle,
    "dedup_threshold_sweep" -> thresholdSweepOracle,

    "text_uniqueness" ->
      """WITH docs AS (
        | SELECT doc_id, text FROM documents
        | WHERE text IS NOT NULL AND trim(text) <> ''),
        |words AS (
        | SELECT doc_id, w, i FROM (
        |  SELECT doc_id,
        |   unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |   generate_subscripts(string_split_regex(trim(lower(text)), '\s+'), 1) AS i
        |  FROM docs)),
        |shingles AS (
        | SELECT DISTINCT a.doc_id AS id, a.w || ' ' || b.w AS sh
        | FROM words a JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        | UNION
        | SELECT doc_id AS id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS sh
        | FROM docs
        | WHERE len(string_split_regex(trim(lower(text)), '\s+')) < 2),
        |dfreq AS (SELECT sh, COUNT(*) AS df FROM shingles GROUP BY sh)
        |SELECT id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
        | CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        | CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
        |   AS uniqueness
        |FROM shingles JOIN dfreq USING (sh)
        |GROUP BY id ORDER BY doc_id""".stripMargin,
    "emb_pca_top2" -> pcaTop2Oracle,

    "dedup_prefix_jaccard" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
        |toks AS (
        | SELECT DISTINCT doc_id AS id, w FROM (
        |  SELECT doc_id,
        |   unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        |  FROM docs WHERE trim(COALESCE(text, '')) <> '')),
        |wdf AS (SELECT w, COUNT(*) AS df FROM toks GROUP BY 1),
        |ranked AS (
        | SELECT t.id, t.w,
        |  row_number() OVER (PARTITION BY t.id ORDER BY d.df, t.w) AS rn,
        |  COUNT(*) OVER (PARTITION BY t.id) AS n
        | FROM toks t JOIN wdf d USING (w)),
        |pref AS (SELECT id, w, n FROM ranked
        |         WHERE rn <= n - CEIL(0.8 * n) + 1),
        |cand AS (
        | SELECT DISTINCT a.id AS id_a, a.n AS n_a, b.id AS id_b, b.n AS n_b
        | FROM pref a JOIN pref b USING (w)
        | WHERE a.id < b.id
        |   AND LEAST(a.n, b.n) >= 0.8 * GREATEST(a.n, b.n)),
        |inter AS (
        | SELECT c.id_a, c.id_b, c.n_a, c.n_b, COUNT(*) AS n_inter
        | FROM cand c
        | JOIN toks ta ON ta.id = c.id_a
        | JOIN toks tb ON tb.id = c.id_b AND tb.w = ta.w
        | GROUP BY 1, 2, 3, 4)
        |SELECT id_a, id_b,
        | CAST(n_inter AS DOUBLE) / CAST(n_a + n_b - n_inter AS DOUBLE)
        |  AS jaccard
        |FROM inter
        |WHERE CAST(n_inter AS DOUBLE) / CAST(n_a + n_b - n_inter AS DOUBLE)
        |  >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    "text_decontaminate" -> decontaminateOracle,

    // the oracle's single global window IS the naive shape the operator
    // exists to avoid — fine for DuckDB at verify scale
    "pack_sequences" ->
      """WITH n AS (
        | SELECT doc_id,
        |  CAST(CASE WHEN trim(COALESCE(text,'')) = '' THEN 0
        |   ELSE len(string_split_regex(trim(lower(text)), '\s+')) END
        |   AS BIGINT) AS n_tokens
        | FROM documents),
        |o AS (
        | SELECT doc_id, n_tokens,
        |  CAST(SUM(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   - n_tokens AS tok_offset
        | FROM n)
        |SELECT doc_id, n_tokens, tok_offset,
        | tok_offset // 512 AS seq_first,
        | CASE WHEN n_tokens > 0
        |  THEN (tok_offset + n_tokens - 1) // 512 END AS seq_last
        |FROM o ORDER BY doc_id""".stripMargin,

    "dedup_sorted_neighborhood" ->
      """WITH keyed AS (
        | SELECT source AS block, COALESCE(substr(text, 1, 16), '') AS skey,
        |  doc_id AS id
        | FROM documents),
        |lagged AS (
        | SELECT block, id,
        |  LAG(id, 1) OVER w AS p1, LAG(id, 2) OVER w AS p2
        | FROM keyed WINDOW w AS (PARTITION BY block ORDER BY skey, id))
        |SELECT block, p1 AS id_a, id AS id_b, 1 AS dist FROM lagged WHERE p1 IS NOT NULL
        |UNION ALL
        |SELECT block, p2, id, 2 FROM lagged WHERE p2 IS NOT NULL
        |ORDER BY block, id_b, dist""".stripMargin,

    "dedup_snm_multipass" ->
      """WITH k1 AS (
        | SELECT source AS block, COALESCE(substr(text, 1, 16), '') AS skey,
        |  doc_id AS id
        | FROM documents),
        |l1 AS (
        | SELECT id, LAG(id, 1) OVER w AS p1, LAG(id, 2) OVER w AS p2
        | FROM k1 WINDOW w AS (PARTITION BY block ORDER BY skey, id)),
        |k2 AS (
        | SELECT lang AS block,
        |  lpad(CAST(COALESCE(n_chars, 0) AS VARCHAR), 6, '0')
        |   || COALESCE(substr(text, 17, 16), '') AS skey,
        |  doc_id AS id
        | FROM documents),
        |l2 AS (
        | SELECT id, LAG(id, 1) OVER w AS p1, LAG(id, 2) OVER w AS p2
        | FROM k2 WINDOW w AS (PARTITION BY block ORDER BY skey, id)),
        |allp AS (
        | SELECT p1 AS a, id AS b, 1 AS dist FROM l1 WHERE p1 IS NOT NULL
        | UNION ALL SELECT p2, id, 2 FROM l1 WHERE p2 IS NOT NULL
        | UNION ALL SELECT p1, id, 1 FROM l2 WHERE p1 IS NOT NULL
        | UNION ALL SELECT p2, id, 2 FROM l2 WHERE p2 IS NOT NULL)
        |SELECT LEAST(a, b) AS id_a, GREATEST(a, b) AS id_b,
        | CAST(COUNT(*) AS BIGINT) AS n_passes, MIN(dist) AS min_dist
        |FROM allp GROUP BY 1, 2
        |ORDER BY id_a, id_b""".stripMargin,

    "attr_last_touch" ->
      """WITH ev AS (
        | SELECT user_id, event_id, epoch_us(ts) AS us, event_type
        | FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL),
        |a AS (
        | SELECT user_id, event_id, us, event_type,
        |  last_value(CASE WHEN event_type <> 'purchase' THEN us END
        |    IGNORE NULLS) OVER w AS attr_us,
        |  last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |    IGNORE NULLS) OVER w AS attr_type
        | FROM ev
        | WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT CASE WHEN attr_us IS NOT NULL
        |   AND us - attr_us <= 604800000000 THEN attr_type
        |  ELSE 'none' END AS channel,
        | CAST(COUNT(*) AS BIGINT) AS n_conversions
        |FROM a WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY channel""".stripMargin,

    "attr_first_touch" ->
      """WITH ev AS (
        | SELECT user_id, event_id, epoch_us(ts) AS us, event_type
        | FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL),
        |a AS (
        | SELECT user_id, event_id, us, event_type,
        |  MIN(CASE WHEN event_type <> 'purchase' THEN
        |    lpad(CAST(us AS VARCHAR), 20, '0') || '|' ||
        |    lpad(CAST(event_id AS VARCHAR), 12, '0') || '|' || event_type
        |   END) OVER (PARTITION BY user_id ORDER BY us
        |     RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)
        |   AS first_touch
        | FROM ev)
        |SELECT CASE WHEN first_touch IS NULL THEN 'none'
        |  ELSE split_part(first_touch, '|', 3) END AS channel,
        | CAST(COUNT(*) AS BIGINT) AS n_conversions
        |FROM a WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY channel""".stripMargin,

    "attr_time_decay" ->
      """WITH ev AS (
        | SELECT user_id, event_id, epoch_us(ts) AS us, event_type
        | FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL),
        |touches AS (
        | SELECT user_id, us AS t_us, event_type AS t_type
        | FROM ev WHERE event_type <> 'purchase'),
        |purch AS (
        | SELECT user_id, event_id AS p_eid, us AS p_us FROM ev
        | WHERE event_type = 'purchase'),
        |pairs AS (
        | SELECT p.user_id, p.p_eid, t.t_type,
        |  (p.p_us - t.t_us) // 86400000000 AS d
        | FROM purch p JOIN touches t ON t.user_id = p.user_id
        |  AND t.t_us BETWEEN p.p_us - 604800000000 AND p.p_us - 1),
        |w AS (
        | SELECT user_id, p_eid, t_type,
        |  1000000000 // (CAST(1 AS BIGINT) << CAST(d AS INT)) AS w_nano
        | FROM pairs),
        |tot AS (
        | SELECT user_id, p_eid, CAST(SUM(w_nano) AS BIGINT) AS tw
        | FROM w GROUP BY 1, 2),
        |cr AS (
        | SELECT w.t_type AS channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
        |  CAST(SUM(w.w_nano * 1000000000 // t.tw) AS BIGINT) AS credit_nano
        | FROM w JOIN tot t ON t.user_id = w.user_id AND t.p_eid = w.p_eid
        | GROUP BY 1),
        |noatt AS (
        | SELECT 'none' AS channel, CAST(0 AS BIGINT) AS n_touches,
        |  CAST(COUNT(*) * 1000000000 AS BIGINT) AS credit_nano
        | FROM purch p WHERE NOT EXISTS (
        |  SELECT 1 FROM pairs x
        |  WHERE x.user_id = p.user_id AND x.p_eid = p.p_eid))
        |SELECT * FROM cr
        |UNION ALL SELECT * FROM noatt
        |ORDER BY channel""".stripMargin,

    "text_js_divergence" ->
      """WITH words AS (
        | SELECT source,
        |  unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        | FROM documents
        | WHERE text IS NOT NULL AND trim(text) <> ''
        |   AND source IS NOT NULL),
        |ww AS (SELECT source, w FROM words WHERE w <> ''),
        |gc AS (SELECT w, COUNT(*) AS n FROM ww GROUP BY 1),
        |vocab AS (SELECT w FROM (
        |  SELECT w, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rn FROM gc)
        | WHERE rn <= 200),
        |sc AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM ww WHERE w IN (SELECT w FROM vocab) GROUP BY 1, 2),
        |grid AS (SELECT s.source, v.w
        |         FROM (SELECT DISTINCT source FROM ww) s CROSS JOIN vocab v),
        |cnt AS (SELECT g.source, g.w, COALESCE(sc.c, 0) AS c
        |        FROM grid g
        |        LEFT JOIN sc ON sc.source = g.source AND sc.w = g.w),
        |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n
        |        FROM cnt GROUP BY 1),
        |cn AS (SELECT c.source, c.w, c.c, t.n FROM cnt c
        |       JOIN tot t ON t.source = c.source WHERE t.n > 0),
        |j AS (
        | SELECT x.source AS source_a, y.source AS source_b,
        |  x.n AS n_a, y.n AS n_b, x.w,
        |  CAST(x.c AS DOUBLE) / CAST(x.n AS DOUBLE) AS p,
        |  CAST(y.c AS DOUBLE) / CAST(y.n AS DOUBLE) AS q
        | FROM cn x JOIN cn y ON y.w = x.w AND x.source < y.source),
        |terms AS (
        | SELECT source_a, source_b, n_a, n_b, w,
        |  (CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2))
        |        ELSE 0.0 END)
        |  + (CASE WHEN q > 0 THEN 0.5 * q * ln(q / ((p + q) / 2))
        |         ELSE 0.0 END) AS term
        | FROM j)
        |SELECT source_a, source_b, n_a, n_b,
        | CAST(round(list_sum(list(term ORDER BY w)) * 1e9) AS BIGINT)
        |   AS js_nano
        |FROM terms GROUP BY 1, 2, 3, 4
        |ORDER BY source_a, source_b""".stripMargin,

    "w7_running_distinct" ->
      """WITH days AS (
        | SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day
        | FROM events),
        |fs AS (
        | SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS day
        | FROM events GROUP BY 1),
        |nn AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new
        |       FROM fs GROUP BY 1)
        |SELECT CAST(d.day AS VARCHAR) AS day,
        | COALESCE(n.n_new, 0) AS n_new,
        | CAST(SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY d.day
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |  AS n_cum
        |FROM days d LEFT JOIN nn n USING (day)
        |ORDER BY day""".stripMargin,

    "w8_ewma" -> {
      // Same 20-term BIGINT weighted sum the engine builds: lag j in
      // cents times 2^(19-j), descaled once by 2^20 * 100.
      val terms = (s"COALESCE(vc, 0) * ${1L << 19}" +:
        (1 until 20).map(j =>
          s"COALESCE(lag(vc, $j) OVER w, 0) * ${1L << (19 - j)}"))
        .mkString(" + ")
      s"""WITH ev AS (
         | SELECT user_id, event_id, epoch_us(ts) AS us,
         |  ${centsSql("value")} AS vc
         | FROM events
         | WHERE ts IS NOT NULL AND event_id IS NOT NULL AND user_id <= 30)
         |SELECT user_id, event_id,
         | CAST($terms AS DOUBLE) / 104857600.0 AS ewma
         |FROM ev
         |WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
         |ORDER BY user_id, event_id""".stripMargin
    },

    "ts_rolling_median" ->
      """SELECT user_id, event_id,
        | quantile_cont(value, 0.5) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id, value
        |   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS roll_median
        |FROM events
        |WHERE user_id <= 50 AND ts IS NOT NULL AND event_id IS NOT NULL
        |ORDER BY user_id, event_id""".stripMargin,

    "f12_winsorize" ->
      """WITH ev AS (
        | SELECT event_id, event_type, value FROM events
        | WHERE value IS NOT NULL AND event_id IS NOT NULL),
        |cuts AS (
        | SELECT event_type, quantile_cont(value, 0.05) AS lo,
        |  quantile_cont(value, 0.95) AS hi
        | FROM ev GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.value,
        | LEAST(GREATEST(e.value, c.lo), c.hi) AS value_wins
        |FROM ev e JOIN cuts c USING (event_type)
        |ORDER BY event_id""".stripMargin,

    "ts_rolling" ->
      """WITH daily AS (
        | SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vc
        | FROM events WHERE user_id <= 20 GROUP BY 1, 2),
        |spine AS (
        | SELECT user_id,
        |  unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS day
        | FROM (SELECT user_id, MIN(day) AS mn, MAX(day) AS mx
        |       FROM daily GROUP BY 1)),
        |j AS (
        | SELECT s.user_id, s.day, d.vc
        | FROM spine s LEFT JOIN daily d USING (user_id, day))
        |SELECT user_id, CAST(day AS VARCHAR) AS day,
        | CAST(SUM(COALESCE(vc, 0)) OVER w AS DOUBLE) / 100 AS roll_sum,
        | CAST(COUNT(vc) OVER w AS BIGINT) AS roll_days
        |FROM j
        |WINDOW w AS (PARTITION BY user_id ORDER BY day
        |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, day""".stripMargin,

    "ts_interp" ->
      """WITH daily AS (
        | SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS v
        | FROM events WHERE user_id <= 20 GROUP BY 1, 2),
        |spine AS (
        | SELECT user_id,
        |  unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS day
        | FROM (SELECT user_id, MIN(day) AS mn, MAX(day) AS mx
        |       FROM daily GROUP BY 1)),
        |j AS (
        | SELECT s.user_id, s.day, d.v
        | FROM spine s LEFT JOIN daily d USING (user_id, day)),
        |f AS (
        | SELECT user_id, day, v,
        |  last_value(v IGNORE NULLS) OVER wp AS pv,
        |  last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |   OVER wp AS pd,
        |  first_value(v IGNORE NULLS) OVER wn AS nv,
        |  first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
        |   OVER wn AS nd
        | FROM j
        | WINDOW wp AS (PARTITION BY user_id ORDER BY day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wn AS (PARTITION BY user_id ORDER BY day
        |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, CAST(day AS VARCHAR) AS day,
        | CASE WHEN v IS NOT NULL THEN v
        |  WHEN pv IS NOT NULL AND nv IS NOT NULL
        |  THEN pv + (nv - pv) *
        |   (CAST(day - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE))
        | END AS v_interp
        |FROM f ORDER BY user_id, day""".stripMargin,

    "ts_gapfill" ->
      """WITH daily AS (
        | SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS v
        | FROM events WHERE user_id <= 20 GROUP BY 1, 2),
        |spine AS (
        | SELECT user_id,
        |  unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS day
        | FROM (SELECT user_id, MIN(day) AS mn, MAX(day) AS mx
        |       FROM daily GROUP BY 1)),
        |j AS (
        | SELECT s.user_id, s.day, d.n, d.v
        | FROM spine s LEFT JOIN daily d USING (user_id, day))
        |SELECT user_id, CAST(day AS VARCHAR) AS day,
        | COALESCE(n, 0) AS n,
        | last_value(v IGNORE NULLS) OVER (
        |   PARTITION BY user_id ORDER BY day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
        |FROM j ORDER BY user_id, day""".stripMargin,

    "stream_gapfill" ->
      """WITH daily AS (
        | SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
        | FROM events
        | WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |   AND value IS NOT NULL AND user_id <= 20
        | GROUP BY 1, 2),
        |spine AS (
        | SELECT user_id,
        |  unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS day
        | FROM (SELECT user_id, MIN(day) AS mn, MAX(day) AS mx
        |       FROM daily GROUP BY 1)),
        |j AS (
        | SELECT s.user_id, s.day, d.c
        | FROM spine s LEFT JOIN daily d USING (user_id, day))
        |SELECT user_id, CAST(day AS VARCHAR) AS day,
        | CAST(last_value(c IGNORE NULLS) OVER (
        |   PARTITION BY user_id ORDER BY day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  / 100 AS v_ffill,
        | (c IS NULL) AS filled
        |FROM j ORDER BY user_id, day""".stripMargin,

    "w6_time_range" ->
      """WITH ev AS (
        | SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        | FROM events WHERE user_id <= 100)
        |SELECT event_id, user_id, ts_us,
        | CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE) / 100 AS trail_sum,
        | CAST(COUNT(*) OVER w AS BIGINT) AS trail_n
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "f10_zscore" ->
      """WITH st AS (
        | SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
        | ROUND((l.l_quantity - sx / CAST(n AS DOUBLE)) /
        |  sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)), 9) AS z
        |FROM lineitem l JOIN st USING (l_returnflag)
        |WHERE l.l_orderkey <= 2000
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,

    "ts_anomaly_mad" ->
      """WITH meds AS (
        | SELECT event_type, quantile_cont(value, 0.5) AS med
        | FROM events GROUP BY 1),
        |d AS (
        | SELECT e.event_id, e.event_type, e.value, m.med
        | FROM events e JOIN meds m USING (event_type)),
        |mads AS (
        | SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
        | FROM d GROUP BY 1)
        |SELECT d.event_id, d.event_type, d.value, d.med, s.mad,
        | (d.value - d.med) / (1.4826 * s.mad) AS robust_z
        |FROM d JOIN mads s USING (event_type)
        |WHERE s.mad > 0
        |  AND abs((d.value - d.med) / (1.4826 * s.mad)) > 3.0
        |ORDER BY event_type, event_id""".stripMargin,

    // Integer division on both sides truncates toward zero (Spark DIV ==
    // DuckDB //, verified on negative operands), so signs agree too.
    "ts_seasonal" ->
      """WITH base AS (
        | SELECT event_type,
        |  ((epoch_us(ts) * 1000) // 86400000000000) % 7 AS dow,
        |  CAST(round(value * 1e9) AS BIGINT) AS v_nano
        | FROM events
        | WHERE ts IS NOT NULL AND value IS NOT NULL
        |   AND event_type IS NOT NULL),
        |seas AS (
        | SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n,
        |  SUM(v_nano) AS sv
        | FROM base GROUP BY 1, 2),
        |gl AS (
        | SELECT event_type, SUM(v_nano) // COUNT(*) AS global_nano
        | FROM base GROUP BY 1),
        |resid AS (
        | SELECT b.event_type, b.dow,
        |  SUM(abs(b.v_nano - s.sv // s.n)) // COUNT(*) AS mad_resid_nano
        | FROM base b JOIN seas s
        |  ON s.event_type = b.event_type AND s.dow = b.dow
        | GROUP BY 1, 2)
        |SELECT s.event_type, s.dow, s.n,
        | CAST(s.sv // s.n AS BIGINT) AS seasonal_nano,
        | CAST(s.sv // s.n - g.global_nano AS BIGINT) AS dev_global_nano,
        | CAST(r.mad_resid_nano AS BIGINT) AS mad_resid_nano
        |FROM seas s
        |JOIN gl g ON g.event_type = s.event_type
        |JOIN resid r ON r.event_type = s.event_type AND r.dow = s.dow
        |ORDER BY s.event_type, s.dow""".stripMargin,

    "ts_cusum" ->
      """WITH ev AS (
        | SELECT event_type, event_id, epoch_us(ts) AS us,
        |  CAST(round(value * 1e9) AS BIGINT) AS v
        | FROM events
        | WHERE ts IS NOT NULL AND event_id IS NOT NULL
        |   AND value IS NOT NULL AND event_type IS NOT NULL),
        |m AS (
        | SELECT event_type, SUM(v) // COUNT(*) AS mean_nano,
        |  CAST(COUNT(*) AS BIGINT) AS n
        | FROM ev GROUP BY 1),
        |cs AS (
        | SELECT e.event_type, e.event_id, m.n,
        |  CAST(SUM(e.v - m.mean_nano) OVER (
        |   PARTITION BY e.event_type ORDER BY e.us, e.event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS cusum
        | FROM ev e JOIN m USING (event_type)),
        |r AS (
        | SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |   ORDER BY abs(cusum) DESC, event_id) AS rn FROM cs)
        |SELECT event_type, n AS n_rows, event_id AS cp_event_id,
        | cusum AS cp_cusum_nano
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "ts_concurrency" ->
      """WITH ev AS (
        | SELECT event_type, epoch_us(ts) AS s_us, event_id FROM events
        | WHERE ts IS NOT NULL AND event_id IS NOT NULL
        |   AND event_type IS NOT NULL),
        |del AS (
        | SELECT event_type, s_us AS t, CAST(1 AS BIGINT) AS d, event_id
        | FROM ev
        | UNION ALL
        | SELECT event_type, s_us + 1800000000, CAST(-1 AS BIGINT), event_id
        | FROM ev),
        |r AS (
        | SELECT event_type, t, event_id,
        |  CAST(SUM(d) OVER (PARTITION BY event_type
        |   ORDER BY t, d, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS run
        | FROM del),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |  ORDER BY run DESC, t, event_id) AS rn FROM r)
        |SELECT event_type, run AS peak_concurrency, t AS peak_t_us
        |FROM rk WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "dq_cardinality_profile" -> {
      val cols = Seq("event_id", "ts", "user_id", "event_type", "value",
        "props")
      val ds = cols.map(c =>
        s"CAST(COUNT(DISTINCT $c) AS BIGINT) AS d_$c").mkString(",\n ")
      val rows = cols.map(c =>
        s"""SELECT '$c' AS column_name, n AS n_rows, d_$c AS n_distinct,
           | CAST(d_$c * 1000000000 // n AS BIGINT) AS distinct_ratio_nano
           |FROM w""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH w AS (
         | SELECT CAST(COUNT(*) AS BIGINT) AS n,
         | $ds
         | FROM events)
         |$rows
         |ORDER BY column_name""".stripMargin
    },

    "ts_acf" ->
      """WITH ev AS (
        | SELECT event_type, event_id, epoch_us(ts) AS us,
        |  CAST(round(value) AS BIGINT) AS vu
        | FROM events
        | WHERE ts IS NOT NULL AND event_id IS NOT NULL
        |   AND value IS NOT NULL AND event_type IS NOT NULL),
        |m AS (
        | SELECT event_type, SUM(vu) // COUNT(*) AS mu FROM ev GROUP BY 1),
        |r AS (
        | SELECT e.event_type, (e.vu - m.mu) AS r,
        |  lead(e.vu - m.mu, 1) OVER w AS r1,
        |  lead(e.vu - m.mu, 2) OVER w AS r2,
        |  lead(e.vu - m.mu, 3) OVER w AS r3
        | FROM ev e JOIN m USING (event_type)
        | WINDOW w AS (PARTITION BY e.event_type ORDER BY e.us, e.event_id)),
        |a AS (
        | SELECT event_type, CAST(SUM(r*r) AS BIGINT) AS den,
        |  CAST(SUM(r*r1) AS BIGINT) AS num1, CAST(COUNT(r1) AS BIGINT) AS c1,
        |  CAST(SUM(r*r2) AS BIGINT) AS num2, CAST(COUNT(r2) AS BIGINT) AS c2,
        |  CAST(SUM(r*r3) AS BIGINT) AS num3, CAST(COUNT(r3) AS BIGINT) AS c3
        | FROM r GROUP BY 1),
        |l AS (
        | SELECT event_type, CAST(1 AS BIGINT) AS lag, num1 AS num,
        |  c1 AS n_pairs, den FROM a
        | UNION ALL SELECT event_type, 2, num2, c2, den FROM a
        | UNION ALL SELECT event_type, 3, num3, c3, den FROM a)
        |SELECT event_type, lag, n_pairs,
        | CASE WHEN den > 0
        |      THEN CAST(num * 1000000000 // den AS BIGINT) END AS acf_nano
        |FROM l ORDER BY event_type, lag""".stripMargin,

    "q_table_checksum" -> {
      def ckSql(name: String, table: String, key: String) =
        s"""SELECT '$name' AS table_name,
           | bit_xor(${hash60Sql(key)}) AS xor_sig,
           | CAST(COUNT(*) AS BIGINT) AS n_rows FROM $table"""
      s"""${ckSql("nation", "nation",
        "concat_ws('|', n_nationkey, n_name, n_regionkey)")}
         |UNION ALL
         |${ckSql("region", "region", "concat_ws('|', r_regionkey, r_name)")}
         |UNION ALL
         |${ckSql("supplier", "supplier",
        "concat_ws('|', s_suppkey, s_name, s_nationkey, CAST(round(s_acctbal * 100) AS BIGINT))")}
         |ORDER BY table_name""".stripMargin
    },

    "graph_triangles" ->
      """WITH raw AS (
        | SELECT p_partkey AS src, (p_partkey * 31 + 7) % 1000 AS dst
        | FROM part WHERE p_partkey <= 1000
        | UNION ALL
        | SELECT p_partkey, (p_partkey * 17 + 3) % 1000
        | FROM part WHERE p_partkey <= 1000),
        |e AS (
        | SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        | FROM raw WHERE src <> dst AND src IS NOT NULL AND dst IS NOT NULL),
        |tri AS (
        | SELECT ab.a AS x, ab.b AS y, bc.b AS z
        | FROM e ab JOIN e bc ON bc.a = ab.b
        |  JOIN e ac ON ac.a = ab.a AND ac.b = bc.b),
        |pern AS (
        | SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT x AS id FROM tri
        |  UNION ALL SELECT y FROM tri
        |  UNION ALL SELECT z FROM tri) GROUP BY 1),
        |nodes AS (
        | SELECT DISTINCT src AS id FROM raw WHERE src IS NOT NULL
        | UNION SELECT dst FROM raw WHERE dst IS NOT NULL)
        |SELECT n.id, COALESCE(p.n, 0) AS n_triangles
        |FROM nodes n LEFT JOIN pern p USING (id)
        |ORDER BY id""".stripMargin,

    "graph_clustering_coeff" ->
      """WITH raw AS (
        | SELECT p_partkey AS src, (p_partkey * 31 + 7) % 1000 AS dst
        | FROM part WHERE p_partkey <= 1000
        | UNION ALL
        | SELECT p_partkey, (p_partkey * 17 + 3) % 1000
        | FROM part WHERE p_partkey <= 1000),
        |e AS (
        | SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        | FROM raw WHERE src <> dst AND src IS NOT NULL AND dst IS NOT NULL),
        |tri AS (
        | SELECT ab.a AS x, ab.b AS y, bc.b AS z
        | FROM e ab JOIN e bc ON bc.a = ab.b
        |  JOIN e ac ON ac.a = ab.a AND ac.b = bc.b),
        |pern AS (
        | SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT x AS id FROM tri
        |  UNION ALL SELECT y FROM tri
        |  UNION ALL SELECT z FROM tri) GROUP BY 1),
        |nodes AS (
        | SELECT DISTINCT src AS id FROM raw WHERE src IS NOT NULL
        | UNION SELECT dst FROM raw WHERE dst IS NOT NULL),
        |ntri AS (
        | SELECT n.id, COALESCE(p.n, 0) AS n_triangles
        | FROM nodes n LEFT JOIN pern p USING (id)),
        |deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM
        |         (SELECT a AS id FROM e UNION ALL SELECT b FROM e)
        |        GROUP BY 1)
        |SELECT t.id, d.deg, t.n_triangles,
        | CASE WHEN d.deg >= 2 THEN CAST(t.n_triangles * 2000000000
        |   // (d.deg * (d.deg - 1)) AS BIGINT) END AS coeff_nano
        |FROM ntri t JOIN deg d ON d.id = t.id
        |ORDER BY t.id""".stripMargin,

    "dedup_shingle_df_hist" -> {
      val words =
        """SELECT doc_id, w, i FROM (
          | SELECT doc_id,
          |  unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
          |  generate_subscripts(string_split_regex(trim(lower(text)), '\s+'), 1) AS i
          | FROM documents WHERE trim(text) <> '')""".stripMargin
      s"""WITH w AS ($words),
         |s0 AS (
         | SELECT DISTINCT a.doc_id AS id, a.w || ' ' || b.w || ' ' || c.w AS sh
         | FROM w a
         |  JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
         |  JOIN w c ON c.doc_id = a.doc_id AND c.i = a.i + 2
         | UNION
         | SELECT doc_id AS id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS sh
         | FROM documents WHERE trim(text) <> ''
         |  AND len(string_split_regex(trim(lower(text)), '\\s+')) < 3),
         |dfs AS (SELECT sh, CAST(COUNT(*) AS BIGINT) AS df
         |        FROM s0 GROUP BY 1),
         |b AS (
         | SELECT CASE WHEN df = 1 THEN 'df=1' WHEN df = 2 THEN 'df=2'
         |   WHEN df <= 10 THEN 'df=3-10' WHEN df <= 100 THEN 'df=11-100'
         |   ELSE 'df>100' END AS bucket, df
         | FROM dfs)
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         | CAST(SUM(df) AS BIGINT) AS n_postings
         |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin
    },

    "graph_pagerank" ->
      """WITH e AS (
        | SELECT p_partkey AS src, (p_partkey * 31 + 7) % 1000 AS dst
        | FROM part WHERE p_partkey <= 1000
        | UNION ALL
        | SELECT p_partkey, (p_partkey * 17 + 3) % 1000
        | FROM part WHERE p_partkey <= 1000),
        |nodes AS (SELECT DISTINCT id FROM
        | (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |outdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY src),
        |r0 AS (SELECT id, CAST(1000000000 AS BIGINT) AS r FROM nodes),
        |s1 AS (SELECT e.dst AS id, CAST(SUM(r0.r // o.outdeg) AS BIGINT) AS s
        |       FROM e JOIN r0 ON r0.id = e.src JOIN outdeg o ON o.src = e.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT n.id, 150000000 + (85 * COALESCE(s1.s, 0)) // 100 AS r
        |       FROM nodes n LEFT JOIN s1 USING (id)),
        |s2 AS (SELECT e.dst AS id, CAST(SUM(r1.r // o.outdeg) AS BIGINT) AS s
        |       FROM e JOIN r1 ON r1.id = e.src JOIN outdeg o ON o.src = e.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT n.id, 150000000 + (85 * COALESCE(s2.s, 0)) // 100 AS r
        |       FROM nodes n LEFT JOIN s2 USING (id))
        |SELECT id, CAST(r AS DOUBLE) / 1000000000.0 AS pagerank
        |FROM r2 ORDER BY id""".stripMargin,

    "dedup_components" ->
      """WITH RECURSIVE keyed AS (
        | SELECT source AS block, COALESCE(substr(text, 1, 16), '') AS skey,
        |  doc_id AS id
        | FROM documents),
        |lagged AS (
        | SELECT block, id, LAG(id, 1) OVER w AS p1, LAG(id, 2) OVER w AS p2
        | FROM keyed WINDOW w AS (PARTITION BY block ORDER BY skey, id)),
        |edges0 AS (
        | SELECT p1 AS a, id AS b FROM lagged WHERE p1 IS NOT NULL
        | UNION ALL SELECT p2, id FROM lagged WHERE p2 IS NOT NULL),
        |edges AS (SELECT a, b FROM edges0 UNION SELECT b, a FROM edges0),
        |reach AS (
        | SELECT doc_id AS id, doc_id AS r FROM documents
        | UNION
        | SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r)
        |SELECT id, MIN(r) AS component FROM reach GROUP BY id
        |ORDER BY id""".stripMargin,

    "dedup_representatives" ->
      """WITH RECURSIVE keyed AS (
        | SELECT source AS block, COALESCE(substr(text, 1, 16), '') AS skey,
        |  doc_id AS id
        | FROM documents),
        |lagged AS (
        | SELECT block, id, LAG(id, 1) OVER w AS p1, LAG(id, 2) OVER w AS p2
        | FROM keyed WINDOW w AS (PARTITION BY block ORDER BY skey, id)),
        |edges0 AS (
        | SELECT p1 AS a, id AS b FROM lagged WHERE p1 IS NOT NULL
        | UNION ALL SELECT p2, id FROM lagged WHERE p2 IS NOT NULL),
        |edges AS (SELECT a, b FROM edges0 UNION SELECT b, a FROM edges0),
        |reach AS (
        | SELECT doc_id AS id, doc_id AS r FROM documents
        | UNION
        | SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r),
        |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
        |sizes AS (
        | SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
        | FROM comp GROUP BY 1)
        |SELECT c.id, c.component, c.id = c.component AS is_kept,
        | s.cluster_size
        |FROM comp c JOIN sizes s USING (component)
        |ORDER BY c.id""".stripMargin,

    "dedup_cluster_stats" ->
      """WITH RECURSIVE keyed AS (
        | SELECT source AS block, COALESCE(substr(text, 1, 16), '') AS skey,
        |  doc_id AS id
        | FROM documents),
        |lagged AS (
        | SELECT block, id, LAG(id, 1) OVER w AS p1, LAG(id, 2) OVER w AS p2
        | FROM keyed WINDOW w AS (PARTITION BY block ORDER BY skey, id)),
        |edges0 AS (
        | SELECT p1 AS a, id AS b FROM lagged WHERE p1 IS NOT NULL
        | UNION ALL SELECT p2, id FROM lagged WHERE p2 IS NOT NULL),
        |edges AS (SELECT a, b FROM edges0 UNION SELECT b, a FROM edges0),
        |reach AS (
        | SELECT doc_id AS id, doc_id AS r FROM documents
        | UNION
        | SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r),
        |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
        |sizes AS (
        | SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
        | FROM comp GROUP BY 1)
        |SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
        | cluster_size * CAST(COUNT(*) AS BIGINT) AS n_docs,
        | (cluster_size - 1) * CAST(COUNT(*) AS BIGINT) AS n_dropped
        |FROM sizes GROUP BY cluster_size
        |ORDER BY cluster_size""".stripMargin,

    "s8_partitioned_scan" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |WHERE source = 'src3' ORDER BY doc_id""".stripMargin,

    "mine_pairs" ->
      """WITH it AS (
        | SELECT DISTINCT user_id, event_type FROM events WHERE user_id <= 500)
        |SELECT a.event_type AS item_a, b.event_type AS item_b,
        | CAST(COUNT(*) AS BIGINT) AS support
        |FROM it a JOIN it b
        | ON a.user_id = b.user_id AND a.event_type < b.event_type
        |GROUP BY 1, 2 HAVING COUNT(*) >= 10
        |ORDER BY item_a, item_b""".stripMargin,

    // Same (ts, event_id, event_type) total order — ts is a timestamp
    // here and epoch nanos on the Spark side, a monotone equivalence.
    "mine_transitions" ->
      """WITH ev AS (
        | SELECT user_id, ts, event_id, event_type FROM events
        | WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  AND event_type IS NOT NULL AND event_id IS NOT NULL),
        |seq AS (
        | SELECT event_type AS src,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id, event_type) AS dst
        | FROM ev),
        |trans AS (
        | SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
        | FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT src, CAST(SUM(n) AS BIGINT) AS n_src
        |        FROM trans GROUP BY 1)
        |SELECT src, dst, n, CAST(n AS DOUBLE) / CAST(n_src AS DOUBLE) AS p
        |FROM trans JOIN tot USING (src)
        |ORDER BY src, dst""".stripMargin,

    "mine_trigrams" ->
      """WITH ev AS (
        | SELECT user_id, ts, event_id, event_type FROM events
        | WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  AND event_type IS NOT NULL AND event_id IS NOT NULL),
        |seq AS (
        | SELECT user_id, event_type AS e1,
        |  lead(event_type, 1) OVER w AS e2,
        |  lead(event_type, 2) OVER w AS e3
        | FROM ev
        | WINDOW w AS (PARTITION BY user_id
        |   ORDER BY ts, event_id, event_type))
        |SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_occ,
        | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1, 2, 3 ORDER BY e1, e2, e3""".stripMargin,

    "mine_assoc_rules" ->
      """WITH it AS (
        | SELECT DISTINCT user_id, event_type FROM events WHERE user_id <= 500),
        |items AS (
        | SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_item
        | FROM it GROUP BY 1),
        |nb AS (
        | SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_baskets FROM it),
        |p AS (
        | SELECT a.event_type AS antecedent, b.event_type AS consequent,
        |  CAST(COUNT(*) AS BIGINT) AS support
        | FROM it a JOIN it b
        |  ON a.user_id = b.user_id AND a.event_type <> b.event_type
        | GROUP BY 1, 2 HAVING COUNT(*) >= 10)
        |SELECT antecedent, consequent, support,
        | ia.n_item AS n_a, ic.n_item AS n_c,
        | support * 1000000000 // ia.n_item AS conf_nano,
        | support * nb.n_baskets * 1000000000 // (ia.n_item * ic.n_item)
        |   AS lift_nano
        |FROM p
        |JOIN items ia ON ia.event_type = p.antecedent
        |JOIN items ic ON ic.event_type = p.consequent
        |CROSS JOIN nb
        |ORDER BY antecedent, consequent""".stripMargin,

    "graph_ppr" ->
      """WITH e AS (
        | SELECT p_partkey AS src, (p_partkey * 31 + 7) % 1000 AS dst
        | FROM part WHERE p_partkey <= 1000
        | UNION ALL
        | SELECT p_partkey, (p_partkey * 17 + 3) % 1000
        | FROM part WHERE p_partkey <= 1000),
        |nodes AS (SELECT DISTINCT id FROM
        | (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |outdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
        |           FROM e GROUP BY src),
        |r0 AS (SELECT id, CASE WHEN id < 10
        |         THEN CAST(1000000000 AS BIGINT)
        |         ELSE CAST(0 AS BIGINT) END AS r
        |       FROM nodes),
        |s1 AS (SELECT e.dst AS id, CAST(SUM(r0.r // o.outdeg) AS BIGINT) AS s
        |       FROM e JOIN r0 ON r0.id = e.src JOIN outdeg o ON o.src = e.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT n.id, CASE WHEN n.id < 10
        |         THEN 150000000 ELSE 0 END
        |         + (85 * COALESCE(s1.s, 0)) // 100 AS r
        |       FROM nodes n LEFT JOIN s1 USING (id)),
        |s2 AS (SELECT e.dst AS id, CAST(SUM(r1.r // o.outdeg) AS BIGINT) AS s
        |       FROM e JOIN r1 ON r1.id = e.src JOIN outdeg o ON o.src = e.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT n.id, CASE WHEN n.id < 10
        |         THEN 150000000 ELSE 0 END
        |         + (85 * COALESCE(s2.s, 0)) // 100 AS r
        |       FROM nodes n LEFT JOIN s2 USING (id))
        |SELECT id, CAST(r AS DOUBLE) / 1000000000.0 AS ppr
        |FROM r2 ORDER BY id""".stripMargin,

    "graph_jaccard_links" ->
      """WITH base AS (
        | SELECT p_partkey AS src, (p_partkey * 31 + 7) % 1000 AS dst
        | FROM part WHERE p_partkey <= 1000
        | UNION ALL
        | SELECT p_partkey, (p_partkey * 17 + 3) % 1000
        | FROM part WHERE p_partkey <= 1000),
        |e AS (
        | SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        | FROM base
        | WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),
        |adj AS (SELECT a AS id, b AS nb FROM e
        |        UNION ALL SELECT b, a FROM e),
        |deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS deg
        |        FROM adj GROUP BY id),
        |com AS (
        | SELECT u.id AS id_a, v.id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_common
        | FROM adj u JOIN adj v ON u.nb = v.nb AND u.id < v.id
        | GROUP BY 1, 2),
        |cand AS (
        | SELECT c.* FROM com c
        | WHERE NOT EXISTS (SELECT 1 FROM e
        |                   WHERE e.a = c.id_a AND e.b = c.id_b)),
        |scored AS (
        | SELECT cand.id_a, cand.id_b, cand.n_common,
        |  da.deg AS deg_a, db.deg AS deg_b,
        |  (cand.n_common * 1000000000) // (da.deg + db.deg - cand.n_common)
        |    AS jacc_nano
        | FROM cand
        |  JOIN deg da ON da.id = cand.id_a
        |  JOIN deg db ON db.id = cand.id_b),
        |top AS (
        | SELECT * FROM scored ORDER BY jacc_nano DESC, id_a, id_b LIMIT 50)
        |SELECT * FROM top ORDER BY id_a, id_b""".stripMargin,

    // Replays labelPropagation round-by-round: synchronous min-tie-break
    // updates are pure functions of the previous round, so three chained
    // (freq -> argmax) CTE pairs reproduce the engine bit-exactly.
    "graph_label_prop" ->
      """WITH raw AS (
        | SELECT p_partkey AS src, (p_partkey * 31 + 7) % 1000 AS dst
        | FROM part WHERE p_partkey <= 1000
        | UNION ALL
        | SELECT p_partkey, (p_partkey * 17 + 3) % 1000
        | FROM part WHERE p_partkey <= 1000),
        |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |      FROM raw WHERE src <> dst),
        |adj AS (SELECT a AS id, b AS nb FROM e
        |        UNION ALL SELECT b, a FROM e),
        |l0 AS (SELECT DISTINCT id, id AS label FROM adj),
        |f1 AS (SELECT adj.id, l.label, COUNT(*) AS cnt
        |       FROM adj JOIN l0 l ON l.id = adj.nb GROUP BY adj.id, l.label),
        |l1 AS (SELECT id, label FROM (
        |        SELECT id, label, ROW_NUMBER() OVER
        |          (PARTITION BY id ORDER BY cnt DESC, label) AS rn FROM f1)
        |       WHERE rn = 1),
        |f2 AS (SELECT adj.id, l.label, COUNT(*) AS cnt
        |       FROM adj JOIN l1 l ON l.id = adj.nb GROUP BY adj.id, l.label),
        |l2 AS (SELECT id, label FROM (
        |        SELECT id, label, ROW_NUMBER() OVER
        |          (PARTITION BY id ORDER BY cnt DESC, label) AS rn FROM f2)
        |       WHERE rn = 1),
        |f3 AS (SELECT adj.id, l.label, COUNT(*) AS cnt
        |       FROM adj JOIN l2 l ON l.id = adj.nb GROUP BY adj.id, l.label),
        |l3 AS (SELECT id, label FROM (
        |        SELECT id, label, ROW_NUMBER() OVER
        |          (PARTITION BY id ORDER BY cnt DESC, label) AS rn FROM f3)
        |       WHERE rn = 1),
        |spine AS (SELECT DISTINCT id FROM
        | (SELECT src AS id FROM raw UNION ALL SELECT dst FROM raw))
        |SELECT s.id, COALESCE(l3.label, s.id) AS label
        |FROM spine s LEFT JOIN l3 ON l3.id = s.id
        |ORDER BY s.id""".stripMargin,

    "graph_kcore" ->
      """WITH raw AS (
        | SELECT p_partkey AS src, (p_partkey * 31 + 7) % 1000 AS dst
        | FROM part WHERE p_partkey <= 1000
        | UNION ALL
        | SELECT p_partkey, (p_partkey * 17 + 3) % 1000
        | FROM part WHERE p_partkey <= 1000),
        |e0 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |       FROM raw WHERE src <> dst),
        |d1 AS (SELECT id, COUNT(*) AS deg FROM
        |        (SELECT a AS id FROM e0 UNION ALL SELECT b FROM e0)
        |       GROUP BY 1),
        |k1 AS (SELECT id FROM d1 WHERE deg >= 2),
        |e1 AS (SELECT a, b FROM e0
        |       WHERE a IN (SELECT id FROM k1) AND b IN (SELECT id FROM k1)),
        |d2 AS (SELECT id, COUNT(*) AS deg FROM
        |        (SELECT a AS id FROM e1 UNION ALL SELECT b FROM e1)
        |       GROUP BY 1),
        |k2 AS (SELECT id FROM d2 WHERE deg >= 2),
        |e2 AS (SELECT a, b FROM e1
        |       WHERE a IN (SELECT id FROM k2) AND b IN (SELECT id FROM k2)),
        |d3 AS (SELECT id, COUNT(*) AS deg FROM
        |        (SELECT a AS id FROM e2 UNION ALL SELECT b FROM e2)
        |       GROUP BY 1),
        |k3 AS (SELECT id FROM d3 WHERE deg >= 2),
        |e3 AS (SELECT a, b FROM e2
        |       WHERE a IN (SELECT id FROM k3) AND b IN (SELECT id FROM k3)),
        |dF AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM
        |        (SELECT a AS id FROM e3 UNION ALL SELECT b FROM e3)
        |       GROUP BY 1),
        |spine AS (SELECT DISTINCT id FROM
        | (SELECT src AS id FROM raw UNION ALL SELECT dst FROM raw))
        |SELECT s.id, COALESCE(dF.deg, 0) AS deg_end,
        | COALESCE(dF.deg, 0) >= 2 AS in_core
        |FROM spine s LEFT JOIN dF ON dF.id = s.id
        |ORDER BY s.id""".stripMargin,

    // Replays the label-prop chain (graph_label_prop's CTEs), then the
    // exact integer modularity aggregation.
    "graph_modularity" ->
      """WITH raw AS (
        | SELECT p_partkey AS src, (p_partkey * 31 + 7) % 1000 AS dst
        | FROM part WHERE p_partkey <= 1000
        | UNION ALL
        | SELECT p_partkey, (p_partkey * 17 + 3) % 1000
        | FROM part WHERE p_partkey <= 1000),
        |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |      FROM raw WHERE src <> dst),
        |adj AS (SELECT a AS id, b AS nb FROM e
        |        UNION ALL SELECT b, a FROM e),
        |l0 AS (SELECT DISTINCT id, id AS label FROM adj),
        |f1 AS (SELECT adj.id, l.label, COUNT(*) AS cnt
        |       FROM adj JOIN l0 l ON l.id = adj.nb GROUP BY adj.id, l.label),
        |l1 AS (SELECT id, label FROM (
        |        SELECT id, label, ROW_NUMBER() OVER
        |          (PARTITION BY id ORDER BY cnt DESC, label) AS rn FROM f1)
        |       WHERE rn = 1),
        |f2 AS (SELECT adj.id, l.label, COUNT(*) AS cnt
        |       FROM adj JOIN l1 l ON l.id = adj.nb GROUP BY adj.id, l.label),
        |l2 AS (SELECT id, label FROM (
        |        SELECT id, label, ROW_NUMBER() OVER
        |          (PARTITION BY id ORDER BY cnt DESC, label) AS rn FROM f2)
        |       WHERE rn = 1),
        |f3 AS (SELECT adj.id, l.label, COUNT(*) AS cnt
        |       FROM adj JOIN l2 l ON l.id = adj.nb GROUP BY adj.id, l.label),
        |l3 AS (SELECT id, label FROM (
        |        SELECT id, label, ROW_NUMBER() OVER
        |          (PARTITION BY id ORDER BY cnt DESC, label) AS rn FROM f3)
        |       WHERE rn = 1),
        |spine AS (SELECT DISTINCT id FROM
        | (SELECT src AS id FROM raw UNION ALL SELECT dst FROM raw)),
        |lbl AS (SELECT s.id, COALESCE(l3.label, s.id) AS label
        |        FROM spine s LEFT JOIN l3 ON l3.id = s.id),
        |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
        |tg AS (SELECT e.a, e.b, la.label AS la, lb.label AS lb
        |       FROM e JOIN lbl la ON la.id = e.a
        |       JOIN lbl lb ON lb.id = e.b),
        |ein AS (SELECT la AS community, CAST(COUNT(*) AS BIGINT) AS e_in
        |        FROM tg WHERE la = lb GROUP BY 1),
        |degc AS (SELECT community, CAST(COUNT(*) AS BIGINT) AS deg_sum
        |         FROM (SELECT la AS community FROM tg
        |               UNION ALL SELECT lb FROM tg) GROUP BY 1)
        |SELECT d.community, COALESCE(ein.e_in, 0) AS e_in, d.deg_sum,
        | CAST((4 * mm.m * COALESCE(ein.e_in, 0) - d.deg_sum * d.deg_sum)
        |   * 1000000000 // (4 * mm.m * mm.m) AS BIGINT) AS contrib_nano
        |FROM degc d LEFT JOIN ein ON ein.community = d.community
        |CROSS JOIN mm
        |ORDER BY d.community""".stripMargin,

    "graph_assortativity" ->
      """WITH raw AS (
        | SELECT p_partkey AS src, (p_partkey * 31 + 7) % 300 AS dst
        | FROM part WHERE p_partkey <= 300
        | UNION ALL
        | SELECT p_partkey, (p_partkey * 17 + 3) % 300
        | FROM part WHERE p_partkey <= 300),
        |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |      FROM raw WHERE src <> dst),
        |adj AS (SELECT a AS id, b AS nb FROM e
        |        UNION ALL SELECT b, a FROM e),
        |deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS deg
        |        FROM adj GROUP BY 1),
        |pairs AS (
        | SELECT dx.deg AS dx, dy.deg AS dy
        | FROM adj JOIN deg dx ON dx.id = adj.id
        | JOIN deg dy ON dy.id = adj.nb),
        |agg AS (
        | SELECT CAST(COUNT(*) AS BIGINT) AS m2,
        |  CAST(SUM(dx) AS BIGINT) AS sx,
        |  CAST(SUM(dx * dx) AS BIGINT) AS sxx,
        |  CAST(SUM(dx * dy) AS BIGINT) AS sxy
        | FROM pairs)
        |SELECT m2, sx, sxx, sxy,
        | CAST((m2 * sxy - sx * sx) * 1000000000
        |   // (m2 * sxx - sx * sx) AS BIGINT) AS r_nano
        |FROM agg""".stripMargin,

    // adj is MATERIALIZED: a recursive member re-derives every upstream
    // CTE per iteration otherwise (the emb_pca trap).
    "graph_bfs" ->
      """WITH RECURSIVE raw AS (
        | SELECT p_partkey AS src, (p_partkey * 31 + 7) % 1000 AS dst
        | FROM part WHERE p_partkey <= 1000
        | UNION ALL
        | SELECT p_partkey, (p_partkey * 17 + 3) % 1000
        | FROM part WHERE p_partkey <= 1000),
        |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |      FROM raw WHERE src <> dst),
        |adj AS MATERIALIZED (SELECT a AS id, b AS nb FROM e
        |       UNION ALL SELECT b, a FROM e),
        |seeds AS (SELECT DISTINCT p_partkey AS id FROM part
        |          WHERE p_partkey < 10),
        |walk(id, d) AS (
        | SELECT id, CAST(0 AS BIGINT) FROM seeds
        | UNION
        | SELECT a.nb, w.d + 1 FROM walk w JOIN adj a ON a.id = w.id
        | WHERE w.d < 4),
        |dist AS (SELECT id, MIN(d) AS dist FROM walk GROUP BY 1),
        |spine AS (SELECT DISTINCT id FROM
        | (SELECT src AS id FROM raw UNION ALL SELECT dst FROM raw))
        |SELECT s.id, COALESCE(dist.dist, -1) AS dist
        |FROM spine s LEFT JOIN dist ON dist.id = s.id
        |ORDER BY s.id""".stripMargin,

    "hier_closure" ->
      """WITH RECURSIVE e AS (
        | SELECT p_partkey AS id,
        |  CASE WHEN p_partkey > 0 THEN p_partkey // 4 END AS parent
        | FROM part WHERE p_partkey <= 2000),
        |walk AS (
        | SELECT id, id AS anc, CAST(0 AS BIGINT) AS depth, CAST(id AS VARCHAR) AS path
        | FROM e
        | UNION ALL
        | SELECT w.id, p.parent, w.depth + 1, CAST(p.parent AS VARCHAR) || '/' || w.path
        | FROM walk w JOIN e p ON p.id = w.anc AND p.parent IS NOT NULL)
        |SELECT id, anc AS root, depth, path FROM walk w
        |WHERE NOT EXISTS (
        | SELECT 1 FROM e p WHERE p.id = w.anc AND p.parent IS NOT NULL)
        |ORDER BY id""".stripMargin,

    "hier_rollup" ->
      """WITH RECURSIVE e AS (
        | SELECT p_partkey AS id,
        |  CASE WHEN p_partkey >= 4 THEN p_partkey // 4 END AS parent
        | FROM part WHERE p_partkey <= 2000),
        |walk AS (
        | SELECT id, id AS anc, CAST(0 AS BIGINT) AS depth FROM e
        | UNION ALL
        | SELECT w.id, p.parent, w.depth + 1
        | FROM walk w JOIN e p ON p.id = w.anc AND p.parent IS NOT NULL),
        |rp AS (
        | SELECT id, anc AS root, depth FROM walk w
        | WHERE NOT EXISTS (
        |  SELECT 1 FROM e p WHERE p.id = w.anc AND p.parent IS NOT NULL)),
        |v AS (
        | SELECT p_partkey AS id,
        |  CAST(round(p_retailprice * 100) AS BIGINT) AS vc
        | FROM part WHERE p_partkey <= 2000)
        |SELECT rp.root, CAST(COUNT(*) AS BIGINT) AS n_nodes,
        | CAST(MAX(rp.depth) AS BIGINT) AS max_depth,
        | CAST(SUM(v.vc) AS BIGINT) AS total_cents
        |FROM rp JOIN v ON v.id = rp.id
        |GROUP BY 1 ORDER BY root""".stripMargin,

    "dedup_passages" ->
      """WITH words AS (
        | SELECT doc_id,
        |  unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |  generate_subscripts(string_split_regex(trim(lower(text)), '\s+'), 1) AS i
        | FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |g AS (
        | SELECT doc_id, CAST(i AS BIGINT) AS p,
        |  w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win
        |    || ' ' || lead(w, 3) OVER win || ' ' || lead(w, 4) OVER win AS gram
        | FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
        |wg AS (SELECT doc_id, p, gram FROM g WHERE gram IS NOT NULL),
        |rep AS (SELECT gram FROM wg GROUP BY gram HAVING COUNT(*) >= 2),
        |m AS (SELECT doc_id, p FROM wg WHERE gram IN (SELECT gram FROM rep)),
        |isl AS (
        | SELECT doc_id, p,
        |  CASE WHEN lag(p) OVER w2 IS NULL OR p > lag(p) OVER w2 + 5
        |       THEN 1 ELSE 0 END AS nw
        | FROM m WINDOW w2 AS (PARTITION BY doc_id ORDER BY p)),
        |isl2 AS (
        | SELECT doc_id, p,
        |  SUM(nw) OVER (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING) AS island
        | FROM isl)
        |SELECT doc_id AS id, MIN(p) AS span_start, MAX(p) + 4 AS span_end,
        | MAX(p) + 4 - MIN(p) + 1 AS span_tokens, CAST(COUNT(*) AS BIGINT) AS n_windows
        |FROM isl2 GROUP BY doc_id, island
        |ORDER BY id, span_start""".stripMargin,

    "dedup_editdist" ->
      """WITH keyed AS (
        | SELECT source AS block, COALESCE(substr(text, 1, 16), '') AS skey,
        |  doc_id AS id
        | FROM documents),
        |lagged AS (
        | SELECT block, id,
        |  LAG(id, 1) OVER w AS p1, LAG(id, 2) OVER w AS p2
        | FROM keyed WINDOW w AS (PARTITION BY block ORDER BY skey, id)),
        |cands AS (
        | SELECT p1 AS id_a, id AS id_b FROM lagged WHERE p1 IS NOT NULL
        | UNION ALL
        | SELECT p2, id FROM lagged WHERE p2 IS NOT NULL),
        |pref AS (
        | SELECT doc_id,
        |  substr(regexp_replace(lower(COALESCE(text, '')), '[^a-z0-9 ]', '', 'g'),
        |   1, 24) AS p
        | FROM documents)
        |SELECT c.id_a, c.id_b,
        | CAST(levenshtein(a.p, b.p) AS BIGINT) AS lev
        |FROM cands c
        | JOIN pref a ON a.doc_id = c.id_a
        | JOIN pref b ON b.doc_id = c.id_b
        |WHERE levenshtein(a.p, b.p) <= 12
        |ORDER BY id_a, id_b""".stripMargin,

    "dedup_jarowinkler" ->
      """WITH keyed AS (
        | SELECT source AS block, COALESCE(substr(text, 1, 16), '') AS skey,
        |  doc_id AS id
        | FROM documents),
        |lagged AS (
        | SELECT block, id,
        |  LAG(id, 1) OVER w AS p1, LAG(id, 2) OVER w AS p2
        | FROM keyed WINDOW w AS (PARTITION BY block ORDER BY skey, id)),
        |cands AS (
        | SELECT p1 AS id_a, id AS id_b FROM lagged WHERE p1 IS NOT NULL
        | UNION ALL
        | SELECT p2, id FROM lagged WHERE p2 IS NOT NULL),
        |pref AS (
        | SELECT doc_id,
        |  substr(regexp_replace(lower(COALESCE(text, '')), '[^a-z0-9 ]', '', 'g'),
        |   1, 24) AS p
        | FROM documents)
        |SELECT id_a, id_b, jw FROM (
        | SELECT c.id_a, c.id_b,
        |  ROUND(jaro_winkler_similarity(a.p, b.p), 6) AS jw
        | FROM cands c
        |  JOIN pref a ON a.doc_id = c.id_a
        |  JOIN pref b ON b.doc_id = c.id_b)
        |WHERE jw >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    "split_kfold" -> {
      val h = hash60Sql("CAST(doc_id AS VARCHAR)")
      s"""WITH a AS (SELECT doc_id, $h % 5 AS fold FROM documents),
         |c AS (SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_val
         |      FROM a GROUP BY 1)
         |SELECT fold, n_val,
         | CAST(SUM(n_val) OVER () - n_val AS BIGINT) AS n_train
         |FROM c ORDER BY fold""".stripMargin
    },

    "split_group_holdout" -> {
      val h = hash60Sql("CAST(user_id AS VARCHAR)")
      s"""WITH ev AS (
         | SELECT user_id, event_id,
         |  CASE WHEN ($h % 100) < 80 THEN 'train' ELSE 'val' END AS split
         | FROM events WHERE user_id IS NOT NULL),
         |per AS (
         | SELECT split, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         |  CAST(COUNT(*) AS BIGINT) AS n_events
         | FROM ev GROUP BY split),
         |aud AS (
         | SELECT CAST(MAX(nsp) AS BIGINT) AS max_splits_per_user FROM
         |  (SELECT user_id, COUNT(DISTINCT split) AS nsp
         |   FROM ev GROUP BY user_id))
         |SELECT p.split, p.n_users, p.n_events, a.max_splits_per_user
         |FROM per p CROSS JOIN aud a ORDER BY split""".stripMargin
    },

    "f11_quantile_bins" ->
      """WITH ev AS (
        | SELECT event_type, value FROM events WHERE value IS NOT NULL),
        |q AS (
        | SELECT event_type,
        |  quantile_cont(value, 0.25) AS q1,
        |  quantile_cont(value, 0.5) AS q2,
        |  quantile_cont(value, 0.75) AS q3
        | FROM ev GROUP BY 1)
        |SELECT ev.event_type,
        | CAST(CASE WHEN value <= q1 THEN 1 WHEN value <= q2 THEN 2
        |  WHEN value <= q3 THEN 3 ELSE 4 END AS BIGINT) AS bin,
        | CAST(COUNT(*) AS BIGINT) AS n
        |FROM ev JOIN q USING (event_type)
        |GROUP BY 1, 2 ORDER BY event_type, bin""".stripMargin,

    "split_train_val" -> {
      val h = hash60Sql("CAST(doc_id AS VARCHAR)")
      s"""WITH assigned AS (
         | SELECT doc_id,
         |  CASE WHEN $h % 100 < 80 THEN 'train'
         |       WHEN $h % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split
         | FROM documents)
         |SELECT split, COUNT(*) AS n_docs,
         | MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
         |FROM assigned GROUP BY split ORDER BY split""".stripMargin
    },

    "text_histogram" ->
      """SELECT n_chars // 50 AS bucket, COUNT(*) AS n_docs
        |FROM documents GROUP BY bucket ORDER BY bucket""".stripMargin,

    // Relational twin of the sorted-run fold: per-codepoint counts via
    // unnest, then integer aggregates; the two divisions and the 1.0 -
    // subtraction mirror the engine's exact expression order. length()
    // counts codepoints in both engines; SUM(n*n) is HUGEINT -> BIGINT.
    "text_char_diversity" ->
      """WITH chars AS (
        | SELECT doc_id,
        |  unnest(list_transform(range(1, length(text) + 1),
        |    i -> substring(text, i, 1))) AS c
        | FROM documents WHERE text IS NOT NULL AND length(text) > 0),
        |cnt AS (SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS n
        |        FROM chars GROUP BY 1, 2),
        |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS k,
        |         MAX(n) AS mx, CAST(SUM(n * n) AS BIGINT) AS ss
        |        FROM cnt GROUP BY 1)
        |SELECT d.doc_id,
        | CASE WHEN d.text IS NULL THEN NULL
        |  ELSE CAST(length(d.text) AS BIGINT) END AS n_chars,
        | a.k AS distinct_chars,
        | CAST(a.mx AS DOUBLE) / CAST(length(d.text) AS DOUBLE) AS top_frac,
        | 1.0 - CAST(a.ss AS DOUBLE) /
        |  CAST(length(d.text) * length(d.text) AS DOUBLE) AS simpson
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "text_bm25_topk" ->
      """WITH q AS (SELECT CAST(qid AS BIGINT) AS query_id, word FROM (VALUES
        |  (1,'spark'),(1,'join'),(1,'fast'),
        |  (2,'customer'),(2,'query'),(2,'slow'),
        |  (3,'vector'),(3,'hash'),(3,'merge')) t(qid, word)),
        |tf AS (
        | SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf FROM (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> '')
        | WHERE word <> '' GROUP BY doc_id, word),
        |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
        |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS tot FROM dl),
        |dfs AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf
        |        WHERE word IN (SELECT word FROM q) GROUP BY word),
        |sc AS (
        | SELECT query_id, doc_id,
        |  CAST(SUM(CAST(round(
        |   ln((CAST(st.n AS DOUBLE) - CAST(dfs.df AS DOUBLE) + 0.5) / (CAST(dfs.df AS DOUBLE) + 0.5) + 1.0)
        |   * ((CAST(tf.tf AS DOUBLE) * 2.2) / (CAST(tf.tf AS DOUBLE)
        |      + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / (CAST(st.tot AS DOUBLE) / CAST(st.n AS DOUBLE))))))
        |   * 1000000000.0) AS BIGINT)) AS DOUBLE) / 1000000000.0 AS score
        | FROM q JOIN tf USING (word) JOIN dfs USING (word) JOIN dl USING (doc_id) CROSS JOIN st
        | GROUP BY query_id, doc_id),
        |r AS (SELECT query_id, doc_id, score,
        | CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
        | FROM sc)
        |SELECT query_id, doc_id, score, rank FROM r WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // BM25 scoring CTEs mirror text_bm25_topk (same query battery, rank
    // cap 20); the coverage ranker and the fused RRF re-rank are exact
    // integer arithmetic.
    "rank_fusion_rrf" ->
      """WITH q AS (SELECT CAST(qid AS BIGINT) AS query_id, word FROM (VALUES
        |  (1,'spark'),(1,'join'),(1,'fast'),
        |  (2,'customer'),(2,'query'),(2,'slow'),
        |  (3,'vector'),(3,'hash'),(3,'merge')) t(qid, word)),
        |tf AS (
        | SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf FROM (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> '')
        | WHERE word <> '' GROUP BY doc_id, word),
        |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
        |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS tot FROM dl),
        |dfs AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf
        |        WHERE word IN (SELECT word FROM q) GROUP BY word),
        |sc AS (
        | SELECT query_id, doc_id,
        |  CAST(SUM(CAST(round(
        |   ln((CAST(st.n AS DOUBLE) - CAST(dfs.df AS DOUBLE) + 0.5) / (CAST(dfs.df AS DOUBLE) + 0.5) + 1.0)
        |   * ((CAST(tf.tf AS DOUBLE) * 2.2) / (CAST(tf.tf AS DOUBLE)
        |      + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / (CAST(st.tot AS DOUBLE) / CAST(st.n AS DOUBLE))))))
        |   * 1000000000.0) AS BIGINT)) AS DOUBLE) / 1000000000.0 AS score
        | FROM q JOIN tf USING (word) JOIN dfs USING (word) JOIN dl USING (doc_id) CROSS JOIN st
        | GROUP BY query_id, doc_id),
        |r1 AS (SELECT query_id, doc_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
        | FROM sc QUALIFY rank <= 20),
        |cov AS (
        | SELECT query_id, doc_id, COUNT(DISTINCT word) AS nm
        | FROM (SELECT DISTINCT doc_id, word FROM tf) dw JOIN q USING (word)
        | GROUP BY 1, 2),
        |r2 AS (SELECT query_id, doc_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY nm DESC, doc_id ASC) AS BIGINT) AS rank
        | FROM cov QUALIFY rank <= 20),
        |fused AS (
        | SELECT query_id, doc_id, r1.rank AS rank_1, r2.rank AS rank_2,
        |  COALESCE(1000000000 // (60 + r1.rank), 0)
        |   + COALESCE(1000000000 // (60 + r2.rank), 0) AS rrf_nano
        | FROM r1 FULL OUTER JOIN r2 USING (query_id, doc_id))
        |SELECT query_id, doc_id, rank_1, rank_2,
        | CAST(rrf_nano AS BIGINT) AS rrf_nano,
        | CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |   ORDER BY rrf_nano DESC, doc_id) AS BIGINT) AS rrf_rank
        |FROM fused QUALIFY rrf_rank <= 10
        |ORDER BY query_id, rrf_rank""".stripMargin,

    "bpe_top_pairs" ->
      """WITH words AS (
        | SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> '')
        | WHERE word <> '' GROUP BY word),
        |pairs AS (
        | SELECT substr(word, CAST(i AS INTEGER), 2) AS pr, cnt
        | FROM words, unnest(range(1, length(word))) AS u(i)),
        |agg AS (
        | SELECT substr(pr, 1, 1) AS a, substr(pr, 2, 1) AS b,
        |  CAST(SUM(cnt) AS BIGINT) AS weight
        | FROM pairs GROUP BY 1, 2)
        |SELECT a, b, weight
        |FROM (SELECT * FROM agg ORDER BY weight DESC, a, b LIMIT 20)
        |ORDER BY a, b""".stripMargin,

    "text_postings" ->
      """WITH tf AS (
        | SELECT word, doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> '')
        | WHERE word <> '' GROUP BY word, doc_id),
        |del AS (
        | SELECT word, doc_id, tf,
        |  doc_id - lag(doc_id) OVER (PARTITION BY word ORDER BY doc_id) AS gap
        | FROM tf),
        |agg AS (
        | SELECT word, CAST(COUNT(*) AS BIGINT) AS df,
        |  CAST(SUM(tf) AS BIGINT) AS total_tf,
        |  string_agg(CAST(COALESCE(gap, doc_id) AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
        |             ',' ORDER BY doc_id) AS postings
        | FROM del GROUP BY word)
        |SELECT word, df, total_tf, postings
        |FROM (SELECT * FROM agg ORDER BY df DESC, word LIMIT 50)
        |ORDER BY word""".stripMargin,

    "text_clean" ->
      """SELECT doc_id,
        | lower(trim(regexp_replace(regexp_replace(regexp_replace(
        |   COALESCE(text, '') || ' visit https://example.com/x?q=1 or '
        |     || COALESCE(source, '') || '@mail.test  NOW',
        |   'https?://\S+', ' ', 'g'),
        |  '\S+@\S+', ' ', 'g'),
        | '\s+', ' ', 'g'))) AS cleaned
        |FROM documents ORDER BY doc_id""".stripMargin,

    "url_parse" ->
      s"""WITH raw AS (SELECT doc_id, ${messyUrlSql("doc_id")} AS url
         | FROM documents),
         |${urlPartsSql}
         |SELECT doc_id, url, scheme, host, ${domainSql("host", "labels")} AS domain,
         | rawpath AS path, ${canonicalSql} AS canonical
         |FROM k ORDER BY doc_id""".stripMargin,

    "url_domain_stats" ->
      s"""WITH raw AS (SELECT doc_id, lang, n_chars,
         |  ${messyUrlSql("doc_id")} AS url FROM documents),
         |${urlPartsSql}
         |SELECT ${domainSql("host", "labels")} AS domain,
         | COUNT(*) AS n_docs, COUNT(DISTINCT lang) AS n_langs,
         | CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM k GROUP BY 1 ORDER BY n_docs DESC, domain ASC""".stripMargin,

    "url_crawl_dedup" ->
      s"""WITH raw AS (SELECT doc_id,
         |  CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'https://www.' END
         |   || 'site'
         |   || CASE WHEN (doc_id % 50) % 3 = 0 THEN '.example.CO.UK'
         |           ELSE '.example.COM' END
         |   || CASE WHEN (doc_id % 50) % 5 = 1 THEN ':8080'
         |           WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END
         |   || '/Page/' || (doc_id % 50)
         |   || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
         |   || '?utm_campaign=c' || doc_id
         |   || '&item=' || (doc_id % 50) || '#s' || doc_id AS url
         | FROM documents),
         |${urlPartsSql}
         |SELECT ${canonicalSql} AS canonical, MIN(doc_id) AS keep_doc,
         | COUNT(*) AS n_raw, COUNT(DISTINCT url) AS n_raw_distinct
         |FROM k GROUP BY 1 ORDER BY canonical""".stripMargin,

    "text_vocab" -> {
      val stop = Text.stopwords.values.flatten.toSeq
        .map(w => s"'$w'").mkString("(", ", ", ")")
      s"""WITH words AS (
         | SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
         | FROM documents)
         |SELECT word, COUNT(*) AS n FROM words
         |WHERE word NOT IN $stop AND word <> ''
         |GROUP BY word ORDER BY n DESC, word ASC LIMIT 100""".stripMargin
    },

    "text_profile" -> textProfileOracle,

    "text_repetition" -> repetitionOracle,

    "text_quality_gate" -> qualityGateOracle(minTokens = 30, maxTokens = 80,
      maxPunct = 0.2, minStop = 0.05, maxDupLine = 0.3, maxTopBigram = 0.05),

    // Same oracle verbatim: the relational operator is contractually
    // output-identical to the HOF one (RepetitionRelationalSpec).
    "text_repetition_rel" -> repetitionOracle,

    "text_vocab_coverage" ->
      """WITH words AS (
        | SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        | FROM documents WHERE trim(text) <> ''),
        |vocab AS (
        | SELECT w AS word, COUNT(*) AS n FROM words WHERE w <> ''
        | GROUP BY w ORDER BY n DESC, word ASC LIMIT 100),
        |counts AS (
        | SELECT w.doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(CASE WHEN v.word IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS vocab_hits
        | FROM words w LEFT JOIN vocab v ON v.word = w.w
        | GROUP BY w.doc_id)
        |SELECT d.doc_id,
        | COALESCE(c.n_tokens, 0) AS n_tokens,
        | COALESCE(c.vocab_hits, 0) AS vocab_hits,
        | COALESCE(CAST(c.vocab_hits AS DOUBLE) / c.n_tokens, 0.0) AS coverage
        |FROM documents d LEFT JOIN counts c ON c.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "text_strip_accents" ->
      """SELECT doc_id,
        | strip_accents(COALESCE(text,'') || ' café Ünïcode ñandú crème brûlée Żółć naïve façade') AS stripped
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_chunks" ->
      """WITH words AS (
        | SELECT doc_id, w, i FROM (
        |  SELECT doc_id,
        |   unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |   generate_subscripts(string_split_regex(trim(lower(text)), '\s+'), 1) AS i
        |  FROM documents WHERE trim(text) <> '')),
        |n AS (SELECT doc_id, MAX(i) AS n FROM words GROUP BY doc_id),
        |starts AS (SELECT doc_id, unnest(range(1, n + 1, 6)) AS s FROM n),
        |chunks AS (
        | SELECT st.doc_id, st.s, string_agg(w.w, ' ' ORDER BY w.i) AS chunk
        | FROM starts st
        |  JOIN words w ON w.doc_id = st.doc_id AND w.i >= st.s AND w.i < st.s + 8
        | GROUP BY st.doc_id, st.s)
        |SELECT doc_id,
        | ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s) AS chunk_id,
        | chunk
        |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin,

    "text_pii_redact" ->
      """SELECT doc_id,
        | regexp_replace(
        |  regexp_replace(
        |   regexp_replace(
        |    COALESCE(text,'') || ' contact john.doe+x@mail-test.example.org or 10.0.42.7 or +1 (415) 555-0100 now',
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |  '\+?\d[\d() -]{6,}\d', '<PHONE>', 'g') AS redacted
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_lang_summary" -> textLangSummaryOracle,

    "dq_label_agreement" -> labelAgreementOracle,

    "dq_ref_integrity" -> {
      def fk(name: String, childSql: String, parentSql: String): String =
        s"""SELECT '$name' AS fk_name,
           | CAST(COUNT(*) AS BIGINT) AS child_rows,
           | CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |   AS orphan_rows,
           | CAST(COUNT(DISTINCT CASE WHEN p.k IS NULL THEN c.fk END) AS BIGINT)
           |   AS orphan_keys,
           | CAST(MIN(CASE WHEN p.k IS NULL THEN c.fk END) AS VARCHAR)
           |   AS min_orphan_key
           |FROM (SELECT fk FROM ($childSql) WHERE fk IS NOT NULL) c
           |LEFT JOIN (SELECT DISTINCT k FROM ($parentSql)
           |           WHERE k IS NOT NULL) p ON p.k = c.fk""".stripMargin
      (fk("orders.custkey->customer",
        """SELECT CASE WHEN o_orderkey % 97 = 0 THEN o_custkey + 10000000
          | ELSE o_custkey END AS fk FROM orders""".stripMargin,
        "SELECT c_custkey AS k FROM customer") +
        "\nUNION ALL\n" +
        fk("lineitem.partkey->part",
          "SELECT l_partkey AS fk FROM lineitem",
          "SELECT p_partkey AS k FROM part") +
        "\nUNION ALL\n" +
        fk("lineitem.suppkey->supplier",
          """SELECT CASE WHEN (l_orderkey * 7 + l_linenumber) % 89 = 0
            | THEN -(l_suppkey + 1) ELSE l_suppkey END AS fk
            |FROM lineitem""".stripMargin,
          "SELECT s_suppkey AS k FROM supplier") +
        "\nORDER BY fk_name")
    },

    "dq_benford" ->
      """WITH v AS (
        | SELECT CAST(round(abs(o_totalprice) * 100) AS BIGINT) AS u
        | FROM orders),
        |c AS (
        | SELECT CAST(substr(CAST(u AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |  CAST(COUNT(*) AS BIGINT) AS n
        | FROM v WHERE u >= 1 GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
        |spine AS (SELECT * FROM (VALUES
        | (CAST(1 AS BIGINT), CAST(301029996 AS BIGINT)), (2, 176091259),
        | (3, 124938737), (4, 96910013), (5, 79181246), (6, 66946790),
        | (7, 57991947), (8, 51152522), (9, 45757491))
        | AS t(digit, expected_nano))
        |SELECT s.digit, COALESCE(c.n, 0) AS n,
        | CAST(COALESCE(c.n, 0) * 1000000000 // tot.total AS BIGINT)
        |   AS share_nano,
        | s.expected_nano,
        | CAST(abs(COALESCE(c.n, 0) * 1000000000 // tot.total
        |   - s.expected_nano) AS BIGINT) AS dev_nano
        |FROM spine s LEFT JOIN c ON c.digit = s.digit CROSS JOIN tot
        |ORDER BY s.digit""".stripMargin,

    "f13_minmax_scale" ->
      """WITH ev AS (
        | SELECT event_type, event_id,
        |  CAST(round(value * 100) AS BIGINT) AS v
        | FROM events
        | WHERE value IS NOT NULL AND event_type IS NOT NULL
        |   AND event_id IS NOT NULL),
        |ext AS (
        | SELECT event_type, CAST(MIN(v) AS BIGINT) AS vmin,
        |  CAST(MAX(v) AS BIGINT) AS vmax
        | FROM ev GROUP BY 1)
        |SELECT e.event_type, e.event_id,
        | CASE WHEN x.vmax > x.vmin
        |  THEN CAST((e.v - x.vmin) * 1000000000 // (x.vmax - x.vmin)
        |       AS BIGINT) END AS scaled_nano
        |FROM ev e JOIN ext x USING (event_type)
        |ORDER BY e.event_type, e.event_id""".stripMargin,

    "q_skyline" ->
      """WITH p AS (
        | SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
        |  CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
        | FROM part
        | WHERE p_size IS NOT NULL AND p_retailprice IS NOT NULL)
        |SELECT p_partkey, p_size, price_cents FROM p x
        |WHERE NOT EXISTS (
        | SELECT 1 FROM p y
        | WHERE y.p_size <= x.p_size AND y.price_cents <= x.price_cents
        |  AND (y.p_size < x.p_size OR y.price_cents < x.price_cents))
        |ORDER BY p_size, price_cents, p_partkey""".stripMargin,

    "ab_assign_srm" ->
      s"""WITH o AS (
         | SELECT o_custkey,
         |  CAST(round(o_totalprice * 100) AS BIGINT) AS pc,
         |  CASE WHEN (${hash60Sql("CAST(o_custkey AS VARCHAR)")} % 100) < 50
         |       THEN 'A' ELSE 'B' END AS variant
         | FROM orders WHERE o_custkey IS NOT NULL),
         |per AS (
         | SELECT variant, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_users,
         |  CAST(COUNT(*) AS BIGINT) AS n_orders,
         |  CAST(SUM(pc) // COUNT(*) AS BIGINT) AS mean_cents
         | FROM o GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS nt,
         | MAX(CASE WHEN variant = 'A' THEN n_users END) AS na,
         | MAX(CASE WHEN variant = 'B' THEN n_users END) AS nb FROM per)
         |SELECT variant, n_users, n_orders, mean_cents,
         | CAST(abs(na - nb) * 1000000000 // nt AS BIGINT) AS srm_dev_nano
         |FROM per CROSS JOIN tot ORDER BY variant""".stripMargin,

    "dq_fd_check" ->
      """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_rows,
        | CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_variants
        |FROM orders WHERE o_custkey IS NOT NULL
        |GROUP BY 1 HAVING COUNT(DISTINCT o_orderpriority) > 1
        |ORDER BY o_custkey""".stripMargin,

    "sim_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
         |            label AS q_label
         |           FROM embeddings WHERE vec_id < 5),
         | c AS (SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS cv,
         |        label AS c_label
         |       FROM embeddings),
         | scored AS (
         |  SELECT q.query_id, c.corpus_id,
         |   ${cosineSql("q.qv", "c.cv")} AS cosine
         |  FROM c CROSS JOIN q
         |  WHERE c.corpus_id <> q.query_id
         |   AND c.c_label IS DISTINCT FROM q.q_label)
         |SELECT query_id, corpus_id, ROUND(cosine, 6) AS cosine, rank
         |FROM (
         |  SELECT query_id, corpus_id, cosine,
         |   ROW_NUMBER() OVER (PARTITION BY query_id
         |     ORDER BY cosine DESC, corpus_id ASC) AS rank
         |  FROM scored)
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "sim_range_search" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |           FROM embeddings WHERE vec_id < 5),
         | c AS (SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS cv
         |       FROM embeddings)
         |SELECT q.query_id, c.corpus_id,
         | ROUND(${cosineSql("q.qv", "c.cv")}, 6) AS cosine
         |FROM c CROSS JOIN q
         |WHERE c.corpus_id <> q.query_id
         | AND ${cosineSql("q.qv", "c.cv")} >= 0.1
         |ORDER BY query_id, corpus_id""".stripMargin,

    "sim_mmr_select" -> mmrSelectOracle,

    "sim_brute_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |           FROM embeddings WHERE vec_id < 5),
         | c AS (SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS cv FROM embeddings),
         | scored AS (
         |  SELECT q.query_id, c.corpus_id,
         |   ${cosineSql("q.qv", "c.cv")} AS cosine
         |  FROM c CROSS JOIN q WHERE c.corpus_id <> q.query_id),
         | ranked AS (
         |  SELECT query_id, corpus_id, cosine,
         |   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, corpus_id, ROUND(cosine, 6) AS cosine, rank
         |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "text_template_slots" ->
      """WITH toks AS (
        | SELECT source, i, w FROM (
        |  SELECT source,
        |   unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |   generate_subscripts(string_split_regex(trim(lower(text)), '\s+'), 1)
        |     - 1 AS i
        |  FROM documents
        |  WHERE text IS NOT NULL AND trim(text) <> ''
        |    AND source IS NOT NULL)
        | WHERE i < 10 AND w <> ''),
        |counts AS (
        | SELECT source, CAST(i AS BIGINT) AS pos, w,
        |  CAST(COUNT(*) AS BIGINT) AS n
        | FROM toks GROUP BY 1, 2, 3),
        |tot AS (SELECT source, pos, CAST(SUM(n) AS BIGINT) AS n_tot
        |        FROM counts GROUP BY 1, 2),
        |arg AS (
        | SELECT source, pos, w AS top_token, n FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source, pos
        |    ORDER BY n DESC, w ASC) AS rn FROM counts)
        | WHERE rn = 1)
        |SELECT a.source, a.pos, a.top_token, a.n,
        | CAST(a.n * 1000000000 // t.n_tot AS BIGINT) AS share_nano
        |FROM arg a JOIN tot t ON t.source = a.source AND t.pos = a.pos
        |ORDER BY a.source, a.pos""".stripMargin,

    "a21_weighted_median" ->
      """WITH li AS (
        | SELECT l_returnflag,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
        |  CAST(round(l_quantity) AS BIGINT) AS wu,
        |  l_orderkey, l_linenumber
        | FROM lineitem
        | WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
        |c AS (
        | SELECT l_returnflag, pc,
        |  CAST(SUM(wu) OVER (PARTITION BY l_returnflag
        |   ORDER BY pc, l_orderkey, l_linenumber
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS cw
        | FROM li),
        |tot AS (SELECT l_returnflag, CAST(SUM(wu) AS BIGINT) AS tw,
        |        CAST(COUNT(*) AS BIGINT) AS n_rows FROM li GROUP BY 1),
        |x AS (
        | SELECT c.l_returnflag, t.n_rows, t.tw AS total_weight, c.pc, c.cw
        | FROM c JOIN tot t USING (l_returnflag) WHERE c.cw * 2 >= t.tw),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |  ORDER BY cw, pc) AS rn FROM x)
        |SELECT l_returnflag, n_rows, total_weight, pc AS wmedian_cents
        |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,

    "a20_trimmed_mean" ->
      """WITH qs AS (
        | SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.05) AS p05,
        |  quantile_cont(o_totalprice, 0.95) AS p95
        | FROM orders GROUP BY 1)
        |SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_kept,
        | CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
        |   // COUNT(*) AS BIGINT) AS trimmed_mean_cents
        |FROM orders o JOIN qs ON qs.o_orderpriority = o.o_orderpriority
        |WHERE o.o_totalprice >= qs.p05 AND o.o_totalprice <= qs.p95
        |GROUP BY 1 ORDER BY o.o_orderpriority""".stripMargin,

    "text_rake_keyphrases" -> {
      val stop = "('a','an','the','of','to','and','in','on','is','for')"
      s"""WITH toks AS (
         | SELECT doc_id, i, w FROM (
         |  SELECT doc_id,
         |   unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w,
         |   generate_subscripts(string_split_regex(trim(lower(text)), '\\s+'), 1) AS i
         |  FROM documents WHERE text IS NOT NULL AND trim(text) <> '')
         | WHERE w <> ''),
         |mk AS (
         | SELECT doc_id, i, w,
         |  SUM(CASE WHEN w IN $stop THEN 1 ELSE 0 END) OVER (
         |   PARTITION BY doc_id ORDER BY i) AS island
         | FROM toks),
         |pt AS (SELECT doc_id, i, w, island FROM mk WHERE w NOT IN $stop),
         |ph AS (
         | SELECT doc_id, island, CAST(COUNT(*) AS BIGINT) AS len,
         |  array_to_string(list(w ORDER BY i), ' ') AS phrase
         | FROM pt GROUP BY 1, 2),
         |ws AS (
         | SELECT w,
         |  CAST(CAST(SUM(len) AS BIGINT) * 1000000000
         |   // CAST(COUNT(*) AS BIGINT) AS BIGINT) AS score_nano
         | FROM pt JOIN ph USING (doc_id, island) GROUP BY w),
         |psc AS (
         | SELECT pt.doc_id, pt.island,
         |  CAST(SUM(ws.score_nano) AS BIGINT) AS score_nano
         | FROM pt JOIN ws USING (w) GROUP BY 1, 2)
         |SELECT ph.phrase, ph.len AS n_words,
         | CAST(COUNT(*) AS BIGINT) AS n_occ, psc.score_nano
         |FROM ph JOIN psc USING (doc_id, island)
         |WHERE ph.len >= 2
         |GROUP BY ph.phrase, ph.len, psc.score_nano
         |HAVING COUNT(*) >= 2
         |ORDER BY phrase""".stripMargin
    },

    "text_pmi_pairs" ->
      """WITH toks AS (
        | SELECT doc_id, i, w FROM (
        |  SELECT doc_id,
        |   unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
        |   generate_subscripts(string_split_regex(trim(lower(text)), '\s+'), 1)
        |     - 1 AS i
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> '')
        | WHERE w <> ''),
        |uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cw FROM toks GROUP BY 1),
        |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens FROM toks),
        |grouped AS (
        | SELECT least(a.w, b.w) AS w_a, greatest(a.w, b.w) AS w_b,
        |  CAST(COUNT(*) AS BIGINT) AS c_pair
        | FROM toks a JOIN toks b
        |  ON b.doc_id = a.doc_id AND b.i - a.i IN (1, 2)
        | GROUP BY 1, 2),
        |pt AS (SELECT CAST(SUM(c_pair) AS BIGINT) AS p_total FROM grouped)
        |SELECT g.w_a, g.w_b, g.c_pair, ua.cw AS c_a, ub.cw AS c_b,
        | CAST(round(ln(
        |   CAST(g.c_pair * nt.n_tokens * nt.n_tokens AS DOUBLE)
        |   / CAST(pt.p_total * ua.cw * ub.cw AS DOUBLE)) * 1e9) AS BIGINT)
        |   AS pmi_nano
        |FROM grouped g
        |JOIN uni ua ON ua.w = g.w_a
        |JOIN uni ub ON ub.w = g.w_b
        |CROSS JOIN nt CROSS JOIN pt
        |WHERE g.c_pair >= 5 AND g.w_a <> g.w_b
        |ORDER BY g.w_a, g.w_b""".stripMargin,

    "dq_freshness" ->
      """WITH ev AS (
        | SELECT event_type, epoch_us(ts) AS us FROM events
        | WHERE ts IS NOT NULL AND event_type IS NOT NULL),
        |per AS (
        | SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MAX(us) AS BIGINT) AS max_us
        | FROM ev GROUP BY 1),
        |g AS (SELECT CAST(MAX(max_us) AS BIGINT) AS g_max FROM per)
        |SELECT event_type, n, max_us, g.g_max - max_us AS lag_us
        |FROM per CROSS JOIN g ORDER BY event_type""".stripMargin,

    "sim_binary_hamming_topk" ->
      """WITH clean AS (
        | SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        | WHERE embedding IS NOT NULL AND len(embedding) = 64
        |  AND len(embedding) = list_aggregate(embedding, 'count')),
        |el AS (SELECT vec_id, unnest(v) AS x,
        |        generate_subscripts(v, 1) - 1 AS i FROM clean),
        |wrd AS (SELECT vec_id,
        |  CAST(SUM(CASE WHEN i < 32 AND x >= 0 AND NOT isnan(x)
        |    THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END)
        |    AS BIGINT) AS w0,
        |  CAST(SUM(CASE WHEN i >= 32 AND x >= 0 AND NOT isnan(x)
        |    THEN (CAST(1 AS BIGINT) << CAST(i - 32 AS INT)) ELSE 0 END)
        |    AS BIGINT) AS w1
        | FROM el GROUP BY 1),
        |q AS (SELECT vec_id AS query_id, w0 AS q0, w1 AS q1
        |      FROM wrd WHERE vec_id < 5),
        |sc AS (SELECT q.query_id, c.vec_id AS corpus_id,
        |  CAST(bit_count(xor(c.w0, q.q0))
        |    + bit_count(xor(c.w1, q.q1)) AS BIGINT) AS hamming
        | FROM wrd c CROSS JOIN q WHERE c.vec_id <> q.query_id),
        |r AS (SELECT query_id, corpus_id, hamming,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY hamming ASC, corpus_id ASC) AS BIGINT) AS rank
        | FROM sc)
        |SELECT query_id, corpus_id, hamming, rank
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "sim_matryoshka_recall" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |           FROM embeddings WHERE vec_id < 5),
         | c AS (SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS cv
         |       FROM embeddings),
         | fr AS (
         |  SELECT query_id, corpus_id FROM (
         |   SELECT q.query_id, c.corpus_id,
         |    ROW_NUMBER() OVER (PARTITION BY q.query_id
         |      ORDER BY ${cosineSql("q.qv", "c.cv")} DESC,
         |      c.corpus_id ASC) AS rank
         |   FROM c CROSS JOIN q
         |   WHERE c.corpus_id <> q.query_id)
         |  WHERE rank <= 10),
         | qt AS (SELECT query_id, qv[1:16] AS qv FROM q),
         | ct AS (SELECT corpus_id, cv[1:16] AS cv FROM c),
         | tr AS (
         |  SELECT query_id, corpus_id FROM (
         |   SELECT qt.query_id, ct.corpus_id,
         |    ROW_NUMBER() OVER (PARTITION BY qt.query_id
         |      ORDER BY ${cosineSql("qt.qv", "ct.cv")} DESC,
         |      ct.corpus_id ASC) AS rank
         |   FROM ct CROSS JOIN qt
         |   WHERE ct.corpus_id <> qt.query_id)
         |  WHERE rank <= 10),
         | ov AS (
         |  SELECT f.query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
         |  FROM fr f JOIN tr USING (query_id, corpus_id) GROUP BY 1)
         |SELECT q.query_id, COALESCE(ov.n_overlap, 0) AS n_overlap,
         | CAST(COALESCE(ov.n_overlap, 0) * 1000000000 // 10 AS BIGINT)
         |   AS recall_nano
         |FROM q LEFT JOIN ov USING (query_id)
         |ORDER BY q.query_id""".stripMargin,

    "sim_knn_classify" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
         |            label AS true_label
         |           FROM embeddings WHERE vec_id % 25 = 0),
         | c AS (SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS cv, label
         |       FROM embeddings WHERE vec_id % 25 <> 0),
         | scored AS (
         |  SELECT q.query_id, c.corpus_id, c.label,
         |   ${cosineSql("q.qv", "c.cv")} AS cosine
         |  FROM c CROSS JOIN q),
         | ranked AS (
         |  SELECT query_id, corpus_id, label,
         |   ROW_NUMBER() OVER (PARTITION BY query_id
         |     ORDER BY cosine DESC, corpus_id ASC) AS rank
         |  FROM scored),
         | votes AS (
         |  SELECT query_id, label, CAST(COUNT(*) AS BIGINT) AS n_votes
         |  FROM ranked WHERE rank <= 10 GROUP BY query_id, label),
         | best AS (
         |  SELECT query_id, label AS pred_label, n_votes,
         |   ROW_NUMBER() OVER (PARTITION BY query_id
         |     ORDER BY n_votes DESC, label ASC NULLS LAST) AS rn
         |  FROM votes)
         |SELECT b.query_id, b.pred_label, b.n_votes, q.true_label
         |FROM best b JOIN q USING (query_id)
         |WHERE rn = 1 ORDER BY query_id""".stripMargin,

    "s1_csv_glob_scan" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,

    "dedup_embedding" -> embeddingNearDupOracle,

    "dedup_semantic" -> semanticDedupOracle(),

    "sim_lsh_topk" -> lshTopkOracle,

    "sim_sq8_topk" -> sq8TopkOracle(),

    "sim_pq_topk" -> pqTopkOracle(),

    "sim_pq_trained_topk" -> pqTopkOracle(iters = 2),

    "sim_ivfpq_topk" -> ivfPqTopkOracle(),

    "bpe_encode" -> bpeEncodeOracle(bpeEncodeMerges),

    "dq_constraints" ->
      """WITH s AS (
        | SELECT COUNT(*) AS n,
        |  COUNT(value) AS nn_value,
        |  COUNT(event_type) AS nn_et,
        |  COUNT(CASE WHEN event_type IN
        |    ('click','error','purchase','signup','view') THEN 1 END) AS c_set,
        |  COUNT(CASE WHEN value >= 0.0 AND value <= 500.0 THEN 1 END) AS c_btw,
        |  COUNT(DISTINCT event_id)
        |   + MAX(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS c_uni
        | FROM events)
        |SELECT * FROM (
        | SELECT 'between' AS check_name, 'value' AS target,
        |  CASE WHEN nn_value > 0 THEN CAST(c_btw AS DOUBLE) / nn_value
        |   ELSE 0.0 END AS observed,
        |  CAST(0.5 AS DOUBLE) AS threshold,
        |  (CASE WHEN nn_value > 0 THEN CAST(c_btw AS DOUBLE) / nn_value
        |   ELSE 0.0 END) >= 0.5 AS pass FROM s
        | UNION ALL
        | SELECT 'in_set', 'event_type',
        |  CASE WHEN nn_et > 0 THEN CAST(c_set AS DOUBLE) / nn_et ELSE 0.0 END,
        |  CAST(1.0 AS DOUBLE),
        |  (CASE WHEN nn_et > 0 THEN CAST(c_set AS DOUBLE) / nn_et
        |   ELSE 0.0 END) >= 1.0 FROM s
        | UNION ALL
        | SELECT 'not_null', 'value',
        |  CASE WHEN n > 0 THEN CAST(nn_value AS DOUBLE) / n ELSE 0.0 END,
        |  CAST(0.9 AS DOUBLE),
        |  (CASE WHEN n > 0 THEN CAST(nn_value AS DOUBLE) / n
        |   ELSE 0.0 END) >= 0.9 FROM s
        | UNION ALL
        | SELECT 'unique_ratio', 'event_id',
        |  CASE WHEN n > 0 THEN CAST(c_uni AS DOUBLE) / n ELSE 0.0 END,
        |  CAST(1.0 AS DOUBLE),
        |  (CASE WHEN n > 0 THEN CAST(c_uni AS DOUBLE) / n
        |   ELSE 0.0 END) >= 1.0 FROM s)
        |ORDER BY check_name, target""".stripMargin,

    // Mirrors DataQuality.psiDrift: same median split, same reference
    // deciles (quantile_cont == Spark percentile, both R-7), same
    // count(bounds < value) bucket, eps-floored shares, ln on identical
    // doubles, and the bucket-ordered list fold for the final sum. A key
    // with no current rows divides by zero inside the masked branch
    // (NULL here, NaN in Spark) — the CASE masks both to a NULL psi.
    "dq_psi_drift" ->
      """WITH ev AS (
        | SELECT event_type, value, event_id FROM events
        | WHERE event_id IS NOT NULL AND value IS NOT NULL),
        |med AS (
        | SELECT quantile_cont(CAST(event_id AS DOUBLE), 0.5) AS med FROM ev),
        |tagged AS (
        | SELECT event_type, value,
        |  CAST(event_id AS DOUBLE) <= med.med AS is_ref
        | FROM ev, med),
        |bounds AS (
        | SELECT event_type,
        |  quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5,
        |                        0.6, 0.7, 0.8, 0.9]) AS bounds
        | FROM tagged WHERE is_ref GROUP BY event_type),
        |bucketed AS (
        | SELECT t.event_type, t.is_ref,
        |  len(list_filter(b.bounds, x -> t.value > x)) AS bucket
        | FROM tagged t JOIN bounds b USING (event_type)),
        |counts AS (
        | SELECT event_type, bucket,
        |  CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS cr,
        |  CAST(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS cc
        | FROM bucketed GROUP BY 1, 2),
        |totals AS (
        | SELECT event_type, CAST(SUM(cr) AS BIGINT) AS nr,
        |  CAST(SUM(cc) AS BIGINT) AS nc
        | FROM counts GROUP BY 1),
        |terms AS (
        | SELECT c.event_type, c.bucket, t.nr, t.nc,
        |  (GREATEST(CAST(c.cr AS DOUBLE) / CAST(t.nr AS DOUBLE), 1e-6)
        |   - GREATEST(CAST(c.cc AS DOUBLE) / CAST(t.nc AS DOUBLE), 1e-6))
        |  * ln(GREATEST(CAST(c.cr AS DOUBLE) / CAST(t.nr AS DOUBLE), 1e-6)
        |     / GREATEST(CAST(c.cc AS DOUBLE) / CAST(t.nc AS DOUBLE), 1e-6))
        |  AS term
        | FROM counts c JOIN totals t USING (event_type))
        |SELECT event_type,
        | CAST(MAX(nr) AS BIGINT) AS n_ref, CAST(MAX(nc) AS BIGINT) AS n_cur,
        | CASE WHEN MAX(nc) > 0
        |      THEN list_sum(list(term ORDER BY bucket)) END AS psi
        |FROM terms GROUP BY event_type ORDER BY event_type""".stripMargin,

    "emb_dim_stats" ->
      """SELECT i, CAST(COUNT(*) AS BIGINT) AS n_pos,
        | CAST(COUNT(v) AS BIGINT) AS n,
        | CAST(SUM(CAST(round(v * 1e9) AS BIGINT)) AS DOUBLE)
        |   / COUNT(v) / 1e9 AS mean,
        | MIN(v) AS mn, MAX(v) AS mx
        |FROM (SELECT unnest(embedding::DOUBLE[]) AS v,
        |       CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i
        |      FROM embeddings)
        |GROUP BY i ORDER BY i""".stripMargin,

    "emb_covariance" ->
      """WITH clean AS (
        | SELECT embedding::DOUBLE[] AS v FROM embeddings
        | WHERE embedding IS NOT NULL AND len(embedding) = 64
        |  AND len(embedding) = list_aggregate(embedding, 'count')),
        |nn AS (SELECT COUNT(*) AS n FROM clean),
        |pairs AS (
        | SELECT i.i AS i, j.j AS j,
        |  CAST(ROUND(v[CAST(i.i AS INT) + 1] * v[CAST(j.j AS INT) + 1]
        |    * 1000000000.0) AS BIGINT) AS p
        | FROM clean CROSS JOIN range(0, 64) i(i) CROSS JOIN range(0, 64) j(j)
        | WHERE j.j >= i.i),
        |sums AS (SELECT i, j, SUM(p) AS s FROM pairs GROUP BY 1, 2),
        |mom AS (
        | SELECT t.i AS i,
        |  SUM(CAST(ROUND(v[CAST(t.i AS INT) + 1] * 1000000000.0) AS BIGINT)) AS sm
        | FROM clean CROSS JOIN range(0, 64) t(i) GROUP BY 1)
        |SELECT s.i, s.j,
        | CAST(s.s AS DOUBLE) / 1000000000.0 / nn.n
        |  - (CAST(mi.sm AS DOUBLE) / 1000000000.0 / nn.n)
        |    * (CAST(mj.sm AS DOUBLE) / 1000000000.0 / nn.n) AS cov
        |FROM sums s CROSS JOIN nn
        | JOIN mom mi ON mi.i = s.i
        | JOIN mom mj ON mj.i = s.j
        |ORDER BY s.i, s.j""".stripMargin,

    // Replays EmbeddingAgg.pc1 exactly: the covm CTEs are the
    // emb_covariance oracle verbatim; the recursive CTE mirrors the
    // driver's power iteration (matrix-vector left folds, left-fold norm,
    // norm>0 guard keeping the previous vector, first-nonzero sign fix) —
    // every fold is list-ordered, so the 30th iterate is bit-identical.
    // The NV expression is spelled out three times because DuckDB lambdas
    // reject subqueries and correlation only reaches one level deep;
    // duplication is deterministic so the copies agree bitwise.
    "emb_pca_project" ->
      """WITH RECURSIVE clean AS (
        | SELECT embedding::DOUBLE[] AS v FROM embeddings
        | WHERE embedding IS NOT NULL AND len(embedding) = 64
        |  AND len(embedding) = list_aggregate(embedding, 'count')),
        |nn AS (SELECT COUNT(*) AS n FROM clean),
        |pairs AS (
        | SELECT i.i AS i, j.j AS j,
        |  CAST(ROUND(v[CAST(i.i AS INT) + 1] * v[CAST(j.j AS INT) + 1]
        |    * 1000000000.0) AS BIGINT) AS p
        | FROM clean CROSS JOIN range(0, 64) i(i) CROSS JOIN range(0, 64) j(j)
        | WHERE j.j >= i.i),
        |sums AS (SELECT i, j, SUM(p) AS s FROM pairs GROUP BY 1, 2),
        |mom AS (
        | SELECT t.i AS i,
        |  SUM(CAST(ROUND(v[CAST(t.i AS INT) + 1] * 1000000000.0) AS BIGINT)) AS sm
        | FROM clean CROSS JOIN range(0, 64) t(i) GROUP BY 1),
        |covm AS (
        | SELECT s.i AS i, s.j AS j,
        |  CAST(s.s AS DOUBLE) / 1000000000.0 / nn.n
        |   - (CAST(mi.sm AS DOUBLE) / 1000000000.0 / nn.n)
        |     * (CAST(mj.sm AS DOUBLE) / 1000000000.0 / nn.n) AS cov
        | FROM sums s CROSS JOIN nn
        |  JOIN mom mi ON mi.i = s.i
        |  JOIN mom mj ON mj.i = s.j),
        |fullm AS (
        | SELECT i, j, cov FROM covm
        | UNION ALL
        | SELECT j AS i, i AS j, cov FROM covm WHERE i < j),
        |rows_m AS (SELECT i, list(cov ORDER BY j) AS r FROM fullm GROUP BY i),
        |mat AS (SELECT list(r ORDER BY i) AS m FROM rows_m),
        |it(k, v) AS (
        | SELECT 0 AS k, list_transform(range(0, 64), x -> 1.0 / sqrt(64.0)) AS v
        | UNION ALL
        | SELECT it.k + 1,
        |  CASE WHEN sqrt(list_sum(list_transform(
        |         list_transform(range(0, 64), ii ->
        |           list_sum(list_transform(
        |             list_zip(mat.m[CAST(ii AS INT) + 1], it.v),
        |             x -> x[1] * x[2]))), x -> x * x))) > 0
        |       THEN list_transform(
        |         list_transform(range(0, 64), ii ->
        |           list_sum(list_transform(
        |             list_zip(mat.m[CAST(ii AS INT) + 1], it.v),
        |             x -> x[1] * x[2]))),
        |         x -> x / sqrt(list_sum(list_transform(
        |           list_transform(range(0, 64), ii ->
        |             list_sum(list_transform(
        |               list_zip(mat.m[CAST(ii AS INT) + 1], it.v),
        |               x -> x[1] * x[2]))), x -> x * x))))
        |       ELSE it.v END
        | FROM it, mat WHERE it.k < 30),
        |fin AS (SELECT v FROM it WHERE k = 30),
        |lead AS (
        | SELECT min(r.ii) AS li FROM range(0, 64) r(ii), fin
        | WHERE fin.v[CAST(r.ii AS INT) + 1] <> 0.0),
        |pcv AS (
        | SELECT CASE WHEN lead.li IS NOT NULL
        |         AND fin.v[CAST(lead.li AS INT) + 1] < 0
        |        THEN list_transform(fin.v, x -> -x) ELSE fin.v END AS pc
        | FROM fin CROSS JOIN lead)
        |SELECT ev.vec_id,
        | (CASE WHEN len(ev.v) = len(pcv.pc)
        |   AND len(ev.v) = list_aggregate(ev.v, 'count')
        |   AND len(pcv.pc) = list_aggregate(pcv.pc, 'count')
        |  THEN list_sum(list_transform(list_zip(ev.v, pcv.pc), x -> x[1] * x[2]))
        |  END) AS pc1_score
        |FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) ev
        | CROSS JOIN pcv
        |ORDER BY vec_id""".stripMargin,

    "emb_label_centroids" ->
      (labelCentroidsSql +
        """
          |SELECT label, CAST(len(centroid) AS BIGINT) AS n_dims,
          | centroid[1] AS c0, centroid[2] AS c1,
          | centroid[3] AS c2, centroid[4] AS c3
          |FROM cents ORDER BY label""".stripMargin),

    "emb_norm_hist" -> {
      s"""WITH clean AS (
         | SELECT embedding::DOUBLE[] AS v FROM embeddings
         | WHERE embedding IS NOT NULL AND len(embedding) = 64
         |  AND len(embedding) = list_aggregate(embedding, 'count')),
         |nrm AS (SELECT sqrt(${dotSql("v", "v")}) AS nrm FROM clean)
         |SELECT CAST(floor(nrm) AS BIGINT) AS bucket,
         | CAST(COUNT(*) AS BIGINT) AS n,
         | MIN(nrm) AS min_norm, MAX(nrm) AS max_norm
         |FROM nrm GROUP BY 1 ORDER BY bucket""".stripMargin
    },

    "emb_centroid_drift" -> {
      def half(name: String, par: Int) =
        s"""d$name AS (
           | SELECT label, embedding FROM embeddings
           | WHERE label IS NOT NULL AND vec_id % 2 = $par),
           |dim$name AS (
           | SELECT label, i,
           |  CAST(SUM(CAST(round(v * 1e9) AS BIGINT)) AS DOUBLE)
           |   / COUNT(v) / 1e9 AS m
           | FROM (SELECT label, unnest(embedding::DOUBLE[]) AS v,
           |        generate_subscripts(embedding, 1) AS i
           |       FROM d$name)
           | GROUP BY label, i),
           |c$name AS (
           | SELECT label, list(m ORDER BY i) AS cv$name
           | FROM dim$name WHERE m IS NOT NULL GROUP BY label),
           |n$name AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_$name
           |           FROM d$name GROUP BY label)""".stripMargin
      s"""WITH ${half("a", 0)},
         |${half("b", 1)}
         |SELECT ca.label, na.n_a, nb.n_b,
         | CAST(round(${distSql("ca.cva", "cb.cvb")} * 1e9) AS BIGINT)
         |   AS shift_nano
         |FROM ca JOIN cb USING (label)
         |JOIN na USING (label) JOIN nb USING (label)
         |ORDER BY ca.label""".stripMargin
    },

    "emb_assign_nearest" -> {
      s"""$labelCentroidsSql,
         |scored AS (
         | SELECT e.vec_id, CAST(c.label AS BIGINT) AS nearest,
         |  ${distSql("e.embedding::DOUBLE[]", "c.centroid")} AS dist
         | FROM embeddings e CROSS JOIN cents c),
         |ranked AS (
         | SELECT vec_id, nearest, dist, ROW_NUMBER() OVER (
         |   PARTITION BY vec_id ORDER BY dist ASC, nearest ASC) AS rn
         | FROM scored)
         |SELECT vec_id, nearest, ROUND(dist, 6) AS dist
         |FROM ranked WHERE rn = 1 ORDER BY vec_id""".stripMargin
    },

    "emb_outliers" -> {
      s"""$labelCentroidsSql,
         |d AS (
         | SELECT e.vec_id, e.label,
         |  ${distSql("e.embedding::DOUBLE[]", "c.centroid")} AS dist
         | FROM embeddings e JOIN cents c USING (label)),
         |cut AS (SELECT quantile_cont(dist, 0.95) AS cutoff FROM d)
         |SELECT vec_id, label, ROUND(dist, 6) AS dist,
         | COALESCE(dist > cutoff, FALSE) AS is_outlier
         |FROM d CROSS JOIN cut ORDER BY vec_id""".stripMargin
    },

    "sim_ivf_trained_topk" -> ivfTrainedOracle(),

    "sim_ivf_topk" ->
      s"""WITH cents AS (
         |  SELECT vec_id AS cent_id, embedding::DOUBLE[] AS centv
         |  FROM embeddings ORDER BY vec_id LIMIT 16),
         | corpus AS (SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS cv FROM embeddings),
         | cassign AS (
         |  SELECT corpus_id, cv, cent_id AS cell FROM (
         |   SELECT c.corpus_id, c.cv, ct.cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY c.corpus_id
         |      ORDER BY ${distSql("c.cv", "ct.centv")} ASC, ct.cent_id ASC) AS rn
         |   FROM corpus c CROSS JOIN cents ct)
         |  WHERE rn = 1),
         | q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |       FROM embeddings WHERE vec_id < 5),
         | qprobe AS (
         |  SELECT query_id, qv, cent_id AS cell FROM (
         |   SELECT q.query_id, q.qv, ct.cent_id,
         |    ROW_NUMBER() OVER (PARTITION BY q.query_id
         |      ORDER BY ${distSql("q.qv", "ct.centv")} ASC, ct.cent_id ASC) AS rn
         |   FROM q CROSS JOIN cents ct)
         |  WHERE rn <= 2),
         | scored AS (
         |  SELECT qp.query_id, ca.corpus_id,
         |   ${cosineSql("qp.qv", "ca.cv")} AS cosine
         |  FROM cassign ca JOIN qprobe qp ON ca.cell = qp.cell
         |  WHERE ca.corpus_id <> qp.query_id)
         |SELECT query_id, corpus_id, ROUND(cosine, 6) AS cosine, rank
         |FROM (
         | SELECT query_id, corpus_id, cosine,
         |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id ASC) AS rank
         | FROM scored)
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "stream_window_counts" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start,
        | event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "stream_window_topk" ->
      """WITH c AS (
        | SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start,
        |  user_id, CAST(COUNT(*) AS BIGINT) AS n_events
        | FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (
        |   PARTITION BY window_start
        |   ORDER BY n_events DESC, user_id ASC) AS BIGINT) AS rank FROM c)
        |SELECT window_start, user_id, n_events, rank
        |FROM r WHERE rank <= 3
        |ORDER BY window_start, rank""".stripMargin,

    "mm_media_meta" ->
      """SELECT doc_id AS media_id,
        | CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | md5(text) AS digest,
        | upper(substr(to_base64(encode(text)), 1, 4)) AS format
        |FROM documents ORDER BY media_id""".stripMargin,

    // Dedup of the doubled stream == the original events (unique ids,
    // byte-identical copies), so the oracle profiles the source directly.
    "stream_dedup_counts" ->
      """SELECT event_type,
        | COUNT(*) AS n_events,
        | COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "sketch_hll_distinct" -> hllDistinctOracle,

    "sketch_cms_freq" -> cmsFreqOracle,

    "text_tfidf" ->
      """WITH toks AS (
        | SELECT doc_id, w FROM (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        |  FROM documents WHERE trim(text) <> '') WHERE w <> ''),
        |doctok AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks GROUP BY doc_id, w),
        |dfreq AS (SELECT w, COUNT(*) AS df FROM doctok GROUP BY w),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
        |scored AS (
        | SELECT dt.doc_id, dt.w, dt.tf,
        |  CAST(dt.tf AS DOUBLE) * ln(CAST(nd AS DOUBLE) / CAST(df AS DOUBLE)) AS tfidf
        | FROM doctok dt JOIN dfreq USING (w), n),
        |ranked AS (
        | SELECT *, row_number() OVER (
        |   PARTITION BY doc_id ORDER BY tfidf DESC, w ASC) AS rank
        | FROM scored)
        |SELECT doc_id, rank, w AS term, CAST(tf AS BIGINT) AS tf, tfidf
        |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // Per-type terms k*ln(c/N) are elementwise bit-deterministic (DuckDB
    // ln == the engine's MathLn); the per-doc sum replays the engine's
    // ordered fold as list_sum(list(term ORDER BY w)).
    // Thresholds are the INTEGER buckets Spark's truncating double->long
    // cast produces (DuckDB's double->BIGINT cast ROUNDS, so replaying the
    // float arithmetic would be engine-dependent at the margin).
    "sample_mixture" -> {
      val h = hash60Sql("CAST(doc_id AS VARCHAR)", 0)
      s"""WITH tgt AS (
         | SELECT source, CAST(tshare AS DOUBLE) AS tshare
         | FROM (VALUES ('src0', 0.3), ('src1', 0.3), ('src2', 0.4)) t(source, tshare)),
         |cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_orig
         |        FROM documents GROUP BY source),
         |j AS (SELECT c.source, c.n_orig, t.tshare FROM cnt c JOIN tgt t USING (source)),
         |m AS (SELECT MIN(CAST(n_orig AS DOUBLE) / tshare) AS mm FROM j),
         |rates AS (
         | SELECT source, n_orig,
         |  CAST(floor(tshare * mm / CAST(n_orig AS DOUBLE) * 1000000.0) AS BIGINT) AS rate_ppm
         | FROM j CROSS JOIN m),
         |kept AS (
         | SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept
         | FROM documents d JOIN rates r USING (source)
         | WHERE ($h % 1000000) < r.rate_ppm
         | GROUP BY d.source)
         |SELECT source, n_orig, rate_ppm, COALESCE(n_kept, 0) AS n_kept
         |FROM rates LEFT JOIN kept USING (source)
         |ORDER BY source""".stripMargin
    },

    "sample_temperature" -> {
      val h = hash60Sql("CAST(doc_id AS VARCHAR)", 0)
      s"""WITH cnt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_orig
         |            FROM documents GROUP BY lang),
         |wd AS (SELECT lang, n_orig, sqrt(CAST(n_orig AS DOUBLE)) AS dd FROM cnt),
         |m AS (SELECT MIN(dd) AS mm FROM wd),
         |rates AS (
         | SELECT lang, n_orig,
         |  CAST(floor(mm / dd * 1000000.0) AS BIGINT) AS rate_ppm
         | FROM wd CROSS JOIN m),
         |kept AS (
         | SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_kept
         | FROM documents d JOIN rates r USING (lang)
         | WHERE ($h % 1000000) < r.rate_ppm
         | GROUP BY d.lang)
         |SELECT lang, n_orig, rate_ppm, COALESCE(n_kept, 0) AS n_kept
         |FROM rates LEFT JOIN kept USING (lang)
         |ORDER BY lang""".stripMargin
    },

    "sample_match_dist" -> {
      val h = hash60Sql("CAST(doc_id AS VARCHAR)", 0)
      s"""WITH src AS (
         | SELECT doc_id, lang, n_chars // 100 AS bucket FROM documents
         | WHERE n_chars IS NOT NULL),
         |cnt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_src
         |        FROM src GROUP BY 1),
         |ref AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_ref
         |        FROM src WHERE lang = 'en' GROUP BY 1),
         |j AS (SELECT c.bucket, c.n_src, r.n_ref
         |      FROM cnt c JOIN ref r USING (bucket)),
         |binding AS (
         | SELECT n_src AS c_num, n_ref AS c_den FROM j
         | ORDER BY CAST(n_src AS DOUBLE) / n_ref ASC, bucket ASC LIMIT 1),
         |kept AS (
         | SELECT s.bucket FROM src s JOIN j USING (bucket)
         |  CROSS JOIN binding b
         | WHERE ($h) % (b.c_den * j.n_src) < b.c_num * j.n_ref),
         |ka AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_after
         |       FROM kept GROUP BY 1)
         |SELECT c.bucket, c.n_src, COALESCE(r.n_ref, 0) AS n_ref,
         | COALESCE(ka.n_after, 0) AS n_after
         |FROM cnt c LEFT JOIN ref r USING (bucket)
         | LEFT JOIN ka USING (bucket)
         |ORDER BY bucket""".stripMargin
    },

    "sample_stratified" -> {
      val h = hash60Sql("CAST(doc_id AS VARCHAR)", 0)
      s"""SELECT doc_id, source FROM documents
         |WHERE $h % 1000000 <
         | (CASE source WHEN 'src0' THEN 500000 WHEN 'src1' THEN 250000
         |   WHEN 'src2' THEN 100000 ELSE 50000 END)
         |ORDER BY doc_id""".stripMargin
    },

    "sample_uniform_k" -> {
      val h = hash60Sql("CAST(event_id AS VARCHAR)", 0)
      s"""SELECT event_id, user_id, event_type FROM (
         | SELECT event_id, user_id, event_type
         | FROM events ORDER BY $h, event_id LIMIT 100)
         |ORDER BY event_id""".stripMargin
    },

    "sample_weighted" -> sampleWeightedOracle,

    "shard_stats" -> {
      val h = hash60Sql("CAST(doc_id AS VARCHAR)", 0)
      s"""SELECT CAST($h % 16 AS BIGINT) AS shard,
         | COUNT(*) AS n_rows,
         | CAST(SUM(n_chars) AS BIGINT) AS total_size,
         | MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
         |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin
    },

    "text_top_terms" ->
      s"""WITH toks AS (
         | SELECT lang, w FROM (
         |  SELECT lang, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
         |  FROM documents WHERE trim(text) <> '') WHERE w <> ''),
         |counts AS (SELECT lang, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
         |ranked AS (
         | SELECT lang, w, c, ROW_NUMBER() OVER (
         |   PARTITION BY lang ORDER BY c DESC, w ASC) AS rank
         | FROM counts)
         |SELECT lang, rank, w AS term, c AS n
         |FROM ranked WHERE rank <= 3 ORDER BY lang, rank""".stripMargin,

    "sample_group_k" ->
      s"""WITH h AS (
         | SELECT lang, doc_id,
         |  (${hash60Sql("CAST(doc_id AS VARCHAR)", 0)}
         |    % 9007199254740992) AS hh
         | FROM documents),
         |r AS (
         | SELECT lang, doc_id, CAST(ROW_NUMBER() OVER (
         |   PARTITION BY lang ORDER BY hh ASC, doc_id ASC) AS BIGINT) AS rank
         | FROM h)
         |SELECT lang, doc_id, rank FROM r
         |WHERE rank <= 20 ORDER BY lang, rank""".stripMargin,

    "sample_apportion" ->
      """WITH sizes AS (
        | SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_s
        | FROM documents WHERE lang IS NOT NULL GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS total FROM sizes),
        |base AS (
        | SELECT lang, n_s,
        |  CAST(n_s * 100 // tot.total AS BIGINT) AS q0,
        |  CAST((n_s * 100) % tot.total AS BIGINT) AS rem
        | FROM sizes CROSS JOIN tot),
        |d AS (SELECT CAST(100 - SUM(q0) AS BIGINT) AS deficit FROM base),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (
        |   ORDER BY rem DESC, lang ASC) AS BIGINT) AS rr FROM base)
        |SELECT lang, n_s,
        | q0 + CASE WHEN rr <= d.deficit THEN 1 ELSE 0 END AS quota
        |FROM r CROSS JOIN d ORDER BY lang""".stripMargin,

    "sample_balance_classes" ->
      s"""WITH sizes AS (
         | SELECT source, CAST(COUNT(*) AS BIGINT) AS class_size
         | FROM documents GROUP BY 1),
         |kk AS (SELECT CAST(MIN(class_size) AS BIGINT) AS k_kept FROM sizes),
         |h AS (
         | SELECT source, doc_id,
         |  (${hash60Sql("CAST(doc_id AS VARCHAR)", 0)}
         |    % 9007199254740992) AS hh
         | FROM documents),
         |r AS (
         | SELECT source, doc_id, CAST(ROW_NUMBER() OVER (
         |   PARTITION BY source ORDER BY hh ASC, doc_id ASC) AS BIGINT)
         |   AS rank
         | FROM h)
         |SELECT r.source, r.doc_id, r.rank, s.class_size, kk.k_kept
         |FROM r JOIN sizes s ON s.source = r.source CROSS JOIN kk
         |WHERE r.rank <= kk.k_kept
         |ORDER BY r.source, r.rank""".stripMargin,

    "sample_quota_budget" ->
      s"""WITH h AS (
         | SELECT source, doc_id, CAST(n_chars AS BIGINT) AS cost,
         |  ${hash60Sql("CAST(doc_id AS VARCHAR)", 0)} AS hh
         | FROM documents),
         |c AS (
         | SELECT source, doc_id, cost,
         |  CAST(SUM(cost) OVER (PARTITION BY source
         |    ORDER BY hh ASC, doc_id ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |   AS BIGINT) AS cum_cost
         | FROM h)
         |SELECT source, doc_id, cost, cum_cost FROM c
         |WHERE cum_cost <= 4000 ORDER BY source, cum_cost""".stripMargin,

    "text_bigram_lm" ->
      """WITH base AS (
        | SELECT doc_id,
        |  list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |    w -> w <> '') AS ts
        | FROM documents WHERE trim(text) <> ''),
        |pairs AS (
        | SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        | FROM base, UNNEST(range(1, len(ts))) AS t(i)),
        |bg AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY 1, 2),
        |uni AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bg GROUP BY 1),
        |model AS (
        | SELECT w1, w2, ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)) AS lp
        | FROM bg JOIN uni USING (w1)),
        |docbg AS (
        | SELECT doc_id, w1, w2, COUNT(*) AS k FROM pairs GROUP BY 1, 2, 3),
        |terms AS (
        | SELECT db.doc_id, db.w1, db.w2, db.k, CAST(db.k AS DOUBLE) * m.lp AS term
        | FROM docbg db JOIN model m USING (w1, w2)),
        |agg AS (
        | SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_bigrams,
        |  list_sum(list(term ORDER BY w1, w2)) AS lsum
        | FROM terms GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(a.n_bigrams, 0) AS n_bigrams,
        | a.lsum / CAST(a.n_bigrams AS DOUBLE) AS lm_score
        |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // Replays dsirWeights exactly: same tokenize/bigram chain as the LM
    // oracles, hash60-mod bucketing, add-1 smoothed bucket LMs with the
    // division-then-ln shape the Spark side computes, ONE nano-round per
    // bucket (CAST(ROUND AS BIGINT) == Spark round+cast, the pdNano
    // discipline) — then all-integer per-doc sums, order-free.
    "text_dsir_weights" ->
      """WITH base AS (
        | SELECT doc_id, COALESCE(lang = 'en', FALSE) AS tgt,
        |  list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |    w -> w <> '') AS ts
        | FROM documents WHERE trim(text) <> ''),
        |feats AS (
        | SELECT doc_id, tgt, unnest(ts) AS f FROM base
        | UNION ALL
        | SELECT doc_id, tgt, ts[i] || ' ' || ts[i + 1] AS f
        | FROM base, UNNEST(range(1, len(ts))) AS t(i)),
        |fb AS (
        | SELECT doc_id, tgt,
        |  CAST(('0x' || substr(md5(f), 1, 15)) AS BIGINT) % 128 AS b
        | FROM feats),
        |bt AS (
        | SELECT b, COUNT(*) AS cr,
        |  COUNT(*) FILTER (WHERE tgt) AS ct
        | FROM fb GROUP BY b),
        |spine AS (
        | SELECT i AS b, COALESCE(cr, 0) AS cr, COALESCE(ct, 0) AS ct
        | FROM UNNEST(range(128)) AS s(i) LEFT JOIN bt ON bt.b = s.i),
        |tot AS (
        | SELECT CAST(SUM(cr) AS BIGINT) AS tr, CAST(SUM(ct) AS BIGINT) AS tt
        | FROM spine),
        |model AS (
        | SELECT b,
        |  CAST(ROUND((ln(CAST(ct + 1 AS DOUBLE) / CAST(tt + 128 AS DOUBLE))
        |    - ln(CAST(cr + 1 AS DOUBLE) / CAST(tr + 128 AS DOUBLE)))
        |   * 1e9) AS BIGINT) AS lr_nano
        | FROM spine, tot),
        |dk AS (SELECT doc_id, b, COUNT(*) AS k FROM fb GROUP BY 1, 2),
        |agg AS (
        | SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_features,
        |  CAST(SUM(k * lr_nano) AS BIGINT) AS logw_nanos
        | FROM dk JOIN model USING (b) GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(a.n_features, 0) AS n_features,
        | COALESCE(a.logw_nanos, 0) AS logw_nanos
        |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "text_unigram_lm" ->
      """WITH toks AS (
        | SELECT doc_id, w FROM (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        |  FROM documents WHERE trim(text) <> '') WHERE w <> ''),
        |vocab AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vocab),
        |model AS (
        | SELECT w, ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) AS lp
        | FROM vocab, tot),
        |doctok AS (SELECT doc_id, w, COUNT(*) AS k FROM toks GROUP BY doc_id, w),
        |terms AS (
        | SELECT dt.doc_id, dt.w, dt.k, CAST(dt.k AS DOUBLE) * m.lp AS term
        | FROM doctok dt JOIN model m USING (w)),
        |agg AS (
        | SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_tokens,
        |  list_sum(list(term ORDER BY w)) AS lsum
        | FROM terms GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(a.n_tokens, 0) AS n_tokens,
        | a.lsum / CAST(a.n_tokens AS DOUBLE) AS lm_score
        |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // Same LM chain as text_unigram_lm, then exact R-7 tercile cuts
    // (quantile_cont == Spark percentile) and the head/middle/tail CASE
    // on bit-identical doubles.
    "text_ppl_buckets" ->
      """WITH toks AS (
        | SELECT doc_id, w FROM (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        |  FROM documents WHERE trim(text) <> '') WHERE w <> ''),
        |vocab AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vocab),
        |model AS (
        | SELECT w, ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) AS lp
        | FROM vocab, tot),
        |doctok AS (SELECT doc_id, w, COUNT(*) AS k FROM toks GROUP BY doc_id, w),
        |terms AS (
        | SELECT dt.doc_id, dt.w, dt.k, CAST(dt.k AS DOUBLE) * m.lp AS term
        | FROM doctok dt JOIN model m USING (w)),
        |scored AS (
        | SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_tokens,
        |  list_sum(list(term ORDER BY w)) / CAST(SUM(k) AS DOUBLE) AS lm_score
        | FROM terms GROUP BY doc_id),
        |cuts AS (
        | SELECT quantile_cont(lm_score, CAST(1 AS DOUBLE)/3) AS c_lo,
        |  quantile_cont(lm_score, CAST(2 AS DOUBLE)/3) AS c_hi FROM scored)
        |SELECT s.doc_id, s.n_tokens, s.lm_score,
        | CASE WHEN s.lm_score >= c.c_hi THEN 'head'
        |      WHEN s.lm_score >= c.c_lo THEN 'middle'
        |      ELSE 'tail' END AS bucket
        |FROM scored s, cuts c ORDER BY s.doc_id""".stripMargin
  )

  // ---- generated oracles (shared hash/shingle SQL building blocks) --------

  /** TOTAL DuckDB dot product: NULL — never an error — on null list, null
    * element, or length mismatch, matching the engine's
    * [[graft.plans.DotProduct]] null semantics. `list_dot_product` RAISES
    * on ragged/null-element inputs, and DuckDB's CASE does NOT short-
    * circuit inside joins (measured: the THEN branch is evaluated on
    * masked rows too) — so the THEN branch must itself be total:
    * zip/transform/sum never error, sum accumulates in list order
    * (verified bit-equal to list_dot_product), and the guard only enforces
    * the NULL result for degenerate rows (masking a possibly-wrong but
    * never-erroring THEN value).
    */
  /** Unrolled SQL replay of [[graft.ops.Similarity.mmrSelect]] (poolK =
    * 20, k = 8, λ = 50%): the candidate pool and its pairwise
    * similarities land in exact integer nanos, then each greedy step is
    * one (scored, pick, sel) CTE triple. Every step CTE is MATERIALIZED —
    * DuckDB's default CTE inlining would otherwise re-derive the entire
    * upstream chain inside each of the 8 steps (the emb_pca_top2 trap).
    * The penalty MAX is a one-level correlated subquery (DuckDB's
    * correlation depth limit).
    */
  private def mmrSelectOracle: String = {
    val steps = (2 to 8).map { i =>
      val p = i - 1
      s"""scored$i AS MATERIALIZED (
         | SELECT c.query_id, c.corpus_id,
         |  50 * c.simq_nano - 50 * (
         |    SELECT MAX(p.s) FROM pair p JOIN sel$p ch
         |     ON ch.query_id = p.query_id AND ch.corpus_id = p.ib
         |    WHERE p.query_id = c.query_id AND p.ia = c.corpus_id)
         |   AS score_nano
         | FROM cand c
         | WHERE NOT EXISTS (SELECT 1 FROM sel$p ch
         |   WHERE ch.query_id = c.query_id AND ch.corpus_id = c.corpus_id)),
         |pick$i AS MATERIALIZED (
         | SELECT query_id, CAST($i AS BIGINT) AS pick, corpus_id, score_nano
         | FROM (SELECT query_id, corpus_id, score_nano,
         |   ROW_NUMBER() OVER (PARTITION BY query_id
         |     ORDER BY score_nano DESC, corpus_id ASC) AS rn FROM scored$i)
         | WHERE rn = 1),
         |sel$i AS MATERIALIZED (
         | SELECT * FROM sel$p UNION ALL SELECT * FROM pick$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH cand AS MATERIALIZED (
       | SELECT query_id, corpus_id, cv,
       |  CAST(ROUND(cosine * 1000000000.0) AS BIGINT) AS simq_nano
       | FROM (
       |  SELECT q.query_id, c.corpus_id, c.cv,
       |   ${cosineSql("q.qv", "c.cv")} AS cosine,
       |   ROW_NUMBER() OVER (PARTITION BY q.query_id
       |     ORDER BY ${cosineSql("q.qv", "c.cv")} DESC, c.corpus_id ASC) AS rn
       |  FROM (SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS cv
       |        FROM embeddings) c
       |   CROSS JOIN (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |               FROM embeddings WHERE vec_id < 3) q
       |  WHERE c.corpus_id <> q.query_id)
       | WHERE rn <= 20 AND cosine IS NOT NULL),
       |pair AS MATERIALIZED (
       | SELECT a.query_id, a.corpus_id AS ia, b.corpus_id AS ib,
       |  CAST(ROUND(${cosineSql("a.cv", "b.cv")} * 1000000000.0) AS BIGINT)
       |   AS s
       | FROM cand a JOIN cand b
       |  ON a.query_id = b.query_id AND a.corpus_id <> b.corpus_id),
       |sel1 AS MATERIALIZED (
       | SELECT query_id, CAST(1 AS BIGINT) AS pick, corpus_id,
       |  CAST(50 * simq_nano AS BIGINT) AS score_nano
       | FROM (SELECT query_id, corpus_id, simq_nano,
       |   ROW_NUMBER() OVER (PARTITION BY query_id
       |     ORDER BY simq_nano DESC, corpus_id ASC) AS rn FROM cand)
       | WHERE rn = 1),
       |$steps
       |SELECT query_id, pick, corpus_id, score_nano FROM sel8
       |ORDER BY query_id, pick""".stripMargin
  }

  private def dotSql(a: String, b: String): String =
    s"(CASE WHEN len($a) = len($b) AND len($a) = list_aggregate($a, 'count')" +
      s" AND len($b) = list_aggregate($b, 'count')" +
      s" THEN list_sum(list_transform(list_zip($a, $b), x -> x[1] * x[2])) END)"

  /** TOTAL DuckDB l2 distance, same guard discipline as [[dotSql]]; NULL
    * on any degenerate input, matching the engine's zip_with/aggregate
    * form (null-padded ragged element -> null sum). Bit-equal to
    * `list_distance` on clean inputs (same in-order accumulation).
    */
  private def distSql(a: String, b: String): String =
    s"(CASE WHEN len($a) = len($b) AND len($a) = list_aggregate($a, 'count')" +
      s" AND len($b) = list_aggregate($b, 'count')" +
      s" THEN sqrt(list_sum(list_transform(list_zip($a, $b)," +
      s" x -> (x[1] - x[2]) * (x[1] - x[2])))) END)"

  /** Total cosine from [[dotSql]] pieces: DuckDB's x/0 -> NULL reproduces
    * the engine's zero-norm -> NULL guard without an explicit CASE.
    */
  private def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  /** Shared CTE prefix: per-label decimal-exact centroids (same discipline
    * as the trained-IVF oracle; all-null dims are skipped, not
    * zero-filled, mirroring groupCentroids).
    */
  private val labelCentroidsSql: String =
    """WITH dims AS (
      | SELECT label, i,
      |  CAST(SUM(CAST(round(v * 1e9) AS BIGINT)) AS DOUBLE)
      |   / COUNT(v) / 1e9 AS m
      | FROM (SELECT label, unnest(embedding::DOUBLE[]) AS v,
      |        generate_subscripts(embedding, 1) AS i
      |       FROM embeddings)
      | GROUP BY label, i),
      |cents AS (
      | SELECT label, list(m ORDER BY i) AS centroid
      | FROM dims WHERE m IS NOT NULL GROUP BY label)""".stripMargin

  /** DuckDB replay of the [[messyUrl]] construction (url_parse /
    * url_domain_stats input).
    */
  private def messyUrlSql(id: String): String =
    s"""'HTTPS://WWW.' || upper(COALESCE(source, 's')) ||
       |  CASE WHEN $id % 3 = 0 THEN '.CO.UK' ELSE '.COM' END ||
       |  CASE WHEN $id % 5 = 0 THEN ':443'
       |       WHEN $id % 5 = 1 THEN ':8080' ELSE '' END ||
       |  '/Docs/' || COALESCE(lang, 'xx') || '/' || $id ||
       |  CASE WHEN $id % 2 = 0 THEN '/' ELSE '' END ||
       |  '?utm_source=feed&id=' || $id || '&ref=rss#frag'""".stripMargin

  /** CTE chain replaying [[Urls]] part extraction over a `raw(url, ...)`
    * CTE: p adds scheme/host/port/rawpath/q, k adds the canonical path,
    * kept query params, and host labels. Every regex is the verbatim
    * RE2-safe pattern from UrlFunctions.scala.
    */
  private val urlPartsSql: String =
    """p AS (SELECT raw.*,
      |  NULLIF(lower(regexp_extract(url,
      |    '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)), '') AS scheme,
      |  NULLIF(regexp_replace(lower(regexp_extract(url,
      |    '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)),
      |    '\.$', ''), '') AS host,
      |  regexp_extract(url,
      |    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*:([0-9]+)', 1) AS port,
      |  regexp_extract(url,
      |    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
      |  regexp_extract(url, '\?([^#]*)', 1) AS q
      | FROM raw),
      |k AS (SELECT p.*, regexp_replace(rawpath, '/+$', '') AS cpath,
      |  list_filter(string_split(q, '&'), x ->
      |    NOT regexp_matches(x,
      |      '^(utm_[A-Za-z0-9]*|fbclid|gclid|msclkid|ref)=') AND x <> '')
      |    AS kept,
      |  string_split(host, '.') AS labels
      | FROM p)""".stripMargin

  /** DuckDB replay of [[Urls.registeredDomain]] over pre-split labels. */
  private def domainSql(host: String, labels: String): String =
    s"""CASE WHEN $host IS NULL THEN NULL
       |  WHEN regexp_matches($host, '^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$$')
       |    THEN $host
       |  WHEN len($labels) >= 3 AND length($labels[-1]) = 2
       |    AND $labels[-2] IN ('co','com','net','org','gov','ac','edu')
       |    THEN $labels[-3] || '.' || $labels[-2] || '.' || $labels[-1]
       |  WHEN len($labels) >= 2 THEN $labels[-2] || '.' || $labels[-1]
       |  ELSE $host END""".stripMargin

  /** DuckDB replay of [[Urls.canonicalizeUrl]] over the k CTE columns. */
  private val canonicalSql: String =
    """CASE WHEN scheme IS NULL OR host IS NULL THEN NULL ELSE
      |  scheme || '://' || host ||
      |  CASE WHEN port <> '' AND NOT ((scheme = 'https' AND port = '443')
      |    OR (scheme = 'http' AND port = '80'))
      |    THEN ':' || port ELSE '' END ||
      |  cpath ||
      |  CASE WHEN len(kept) > 0
      |    THEN '?' || array_to_string(kept, '&') ELSE '' END
      |END""".stripMargin

  /** DuckDB SQL for StableHash.hash60(expr, seed). */
  private def hash60Sql(expr: String, seed: Int): String =
    s"CAST(('0x' || substr(md5('$seed:' || $expr), 1, 15)) AS BIGINT)"

  private def hash60Sql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"

  /** Shared by `text_repetition` (map-side HOF counting) and
    * `text_repetition_rel` (relational explode+groupBy twin for huge
    * docs): the DuckDB replay is necessarily relational, which is exactly
    * what makes one oracle serve both engine forms.
    */
  /** Replays `TextAnalysis.qualityGate`: the profile chain's token /
    * punct / stopword stats (same CTE shapes as `textProfileOracle`, no
    * language argmax) + the repetition chain on RAW text (no planted
    * duplication), then the threshold CASE per rule. Ratio thresholds
    * compare 6-dp-rounded values on both engines.
    */
  private def qualityGateOracle(minTokens: Long, maxTokens: Long,
      maxPunct: Double, minStop: Double, maxDupLine: Double,
      maxTopBigram: Double): String = {
    val inList = Text.stopwords.values.flatten.toSeq
      .map(w => s"'$w'").mkString("(", ", ", ")")
    s"""WITH words AS (
       | SELECT doc_id, w, i FROM (
       |  SELECT doc_id,
       |   unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w,
       |   generate_subscripts(string_split_regex(trim(lower(text)), '\\s+'), 1) AS i
       |  FROM documents WHERE text IS NOT NULL AND trim(text) <> '')),
       |ws AS (
       | SELECT doc_id, COUNT(*) AS n_tokens,
       |  SUM(CASE WHEN w IN $inList THEN 1 ELSE 0 END) AS h_all
       | FROM words GROUP BY doc_id),
       |cs AS (
       | SELECT doc_id, length(COALESCE(text, '')) AS n_chars,
       |  len(regexp_extract_all(COALESCE(text, ''), '[.,;:!?''"()\\[\\]{}]')) AS n_punct
       | FROM documents),
       |lines AS (
       | SELECT doc_id, trim(l) AS line
       | FROM documents, unnest(string_split(COALESCE(text, ''), chr(10))) AS u(l)
       | WHERE trim(l) <> ''),
       |lc AS (SELECT doc_id, line, COUNT(*) AS c FROM lines GROUP BY doc_id, line),
       |la AS (SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS nl,
       |        CAST(COUNT(*) AS DOUBLE) AS nd
       |       FROM lc GROUP BY doc_id),
       |bg AS (SELECT a.doc_id, a.w || ' ' || b.w AS bi
       |       FROM words a JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
       |bgc AS (SELECT doc_id, bi, COUNT(*) AS c FROM bg GROUP BY doc_id, bi),
       |bga AS (SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS nb,
       |        CAST(MAX(c) AS DOUBLE) AS maxc FROM bgc GROUP BY doc_id),
       |sig AS (
       | SELECT c.doc_id,
       |  CAST(COALESCE(w.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  CASE WHEN c.n_chars > 0
       |       THEN ROUND(CAST(c.n_punct AS DOUBLE) / c.n_chars, 6) ELSE 0.0 END AS punct_ratio,
       |  CASE WHEN COALESCE(w.n_tokens, 0) > 0
       |       THEN ROUND(CAST(w.h_all AS DOUBLE) / w.n_tokens, 6) ELSE 0.0 END AS stopword_ratio,
       |  COALESCE((la.nl - la.nd) / la.nl, 0.0) AS dup_line_frac,
       |  COALESCE(bga.maxc / bga.nb, 0.0) AS top_bigram_frac
       | FROM cs c LEFT JOIN ws w USING (doc_id)
       |  LEFT JOIN la ON la.doc_id = c.doc_id
       |  LEFT JOIN bga ON bga.doc_id = c.doc_id)
       |SELECT doc_id, n_tokens,
       | (n_tokens >= $minTokens AND n_tokens <= $maxTokens) AS ok_length,
       | (punct_ratio <= $maxPunct) AS ok_punct,
       | (stopword_ratio >= $minStop) AS ok_stopwords,
       | (dup_line_frac <= $maxDupLine) AS ok_dup_lines,
       | (top_bigram_frac <= $maxTopBigram) AS ok_bigram,
       | (n_tokens >= $minTokens AND n_tokens <= $maxTokens
       |  AND punct_ratio <= $maxPunct AND stopword_ratio >= $minStop
       |  AND dup_line_frac <= $maxDupLine
       |  AND top_bigram_frac <= $maxTopBigram) AS keep
       |FROM sig ORDER BY doc_id""".stripMargin
  }

  private val repetitionOracle: String =
    """WITH base AS (
      | SELECT doc_id,
      |  COALESCE(text,'') || chr(10) || substr(COALESCE(text,''),1,20)
      |   || chr(10) || substr(COALESCE(text,''),1,20) AS t
      | FROM documents),
      |lines AS (
      | SELECT doc_id, trim(l) AS line
      | FROM base, unnest(string_split(t, chr(10))) AS u(l)
      | WHERE trim(l) <> ''),
      |lc AS (SELECT doc_id, line, COUNT(*) AS c, len(line) AS ln
      |       FROM lines GROUP BY doc_id, line),
      |la AS (SELECT doc_id,
      |        CAST(SUM(c) AS DOUBLE) AS n_lines,
      |        CAST(COUNT(*) AS DOUBLE) AS n_distinct,
      |        CAST(SUM(c*ln) AS DOUBLE) AS total_chars,
      |        CAST(SUM(CASE WHEN c >= 2 THEN c*ln ELSE 0 END) AS DOUBLE) AS dup_chars
      |       FROM lc GROUP BY doc_id),
      |words AS (
      | SELECT doc_id, w, i FROM (
      |  SELECT doc_id,
      |   unnest(string_split_regex(trim(lower(t)), '\s+')) AS w,
      |   generate_subscripts(string_split_regex(trim(lower(t)), '\s+'), 1) AS i
      |  FROM base WHERE trim(t) <> '')),
      |bg AS (SELECT a.doc_id, a.w || ' ' || b.w AS bi
      |       FROM words a JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
      |bgc AS (SELECT doc_id, bi, COUNT(*) AS c FROM bg GROUP BY doc_id, bi),
      |bga AS (SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS nb,
      |        CAST(MAX(c) AS DOUBLE) AS maxc FROM bgc GROUP BY doc_id)
      |SELECT d.doc_id,
      | CAST(COALESCE(la.n_lines, 0) AS BIGINT) AS n_lines,
      | COALESCE((la.n_lines - la.n_distinct) / la.n_lines, 0.0) AS dup_line_frac,
      | COALESCE(la.dup_chars / la.total_chars, 0.0) AS dup_line_char_frac,
      | COALESCE(bga.maxc / bga.nb, 0.0) AS top_bigram_frac
      |FROM documents d
      | LEFT JOIN la ON la.doc_id = d.doc_id
      | LEFT JOIN bga ON bga.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Probe words for the count-min frequency query (high-frequency corpus
    * tokens + one guaranteed-absent token); shared verbatim by the query
    * and its oracle.
    */
  private val CmsProbeWords = Seq("join", "hash", "row", "batch", "scan",
    "merge", "vector", "table", "query", "zzzmissing")

  /** HLL registers replayed in SQL: bucket = top 12 hash bits, rank =
    * leading zeros of the remaining 48 bits + 1 via the binary-string
    * length trick (DuckDB has no clz); Σ2^-M_j is the exact HUGEINT
    * Σ2^(61-M_j) with zero registers contributing 2^61 each; the float
    * finish then mirrors [[graft.ops.Sketches.hllEstimate]] op-for-op
    * (÷, ×, ln are correctly rounded in both engines — ln was verified
    * bit-equal to Java Math.log, NOT StrictMath.log, which is why the
    * engine never uses Spark's builtin `log`), and
    * `floor(x+0.5) = Math.round`.
    */
  private def hllDistinctOracle: String = {
    val mask = (1L << 48) - 1
    s"""WITH src AS (
       | SELECT event_type, user_id,
       |  ${hash60Sql("CAST(user_id AS VARCHAR)")} AS h
       | FROM events WHERE user_id IS NOT NULL),
       |regs AS (
       | SELECT event_type, h >> 48 AS b,
       |  MAX(CASE WHEN (h & $mask) = 0 THEN 49
       |      ELSE 48 - (length(ltrim(bin(h & $mask), '0')) - 1) END) AS r
       | FROM src GROUP BY 1, 2),
       |sums AS (
       | SELECT event_type, COUNT(*) AS nz,
       |  SUM(1::HUGEINT << (61 - r)) AS s_nz
       | FROM regs GROUP BY 1),
       |est AS (
       | SELECT event_type, 4096 - nz AS zeros,
       |  (CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE) / 4096.0)) *
       |   (CAST(16777216::HUGEINT << 61 AS DOUBLE) /
       |    CAST(s_nz + CAST(4096 - nz AS HUGEINT) * (1::HUGEINT << 61) AS DOUBLE)) AS raw
       | FROM sums),
       |fin AS (
       | SELECT event_type,
       |  CASE WHEN raw <= 10240.0 AND zeros > 0
       |       THEN 4096.0 * ln(4096.0 / CAST(zeros AS DOUBLE))
       |       ELSE raw END AS e
       | FROM est),
       |exact AS (
       | SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
       | FROM events WHERE user_id IS NOT NULL GROUP BY 1)
       |SELECT f.event_type,
       | CAST(floor(f.e + 0.5) AS BIGINT) AS est_users,
       | x.exact_users
       |FROM fin f JOIN exact x USING (event_type)
       |ORDER BY f.event_type""".stripMargin
  }

  /** Count-min cells replayed in SQL: same base hash (md5-60 mod P) and
    * affine row reseedings as [[graft.ops.Sketches.CmsAgg]]
    * (Dedup.minhashCoeffs); estimates are MIN over rows of exact integer
    * cell counts — no float path at all. TOTAL over the edge corpus: an
    * empty token set leaves every cell 0 via the LEFT JOIN + COALESCE.
    */
  private def cmsFreqOracle: String = {
    val p = Dedup.MinhashP
    val coefRows = (0 until 3).map { j =>
      val (a, b) = Dedup.minhashCoeffs(j)
      s"($j, ${a}::BIGINT, ${b}::BIGINT)"
    }.mkString(", ")
    val probeRows = CmsProbeWords.map(w => s"('$w')").mkString(", ")
    s"""WITH toks AS (
       | SELECT w FROM (
       |  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
       |  FROM documents WHERE trim(text) <> '') WHERE w <> ''),
       |hashed AS (SELECT ${hash60Sql("w")} % $p AS h FROM toks),
       |coef(i, a, b) AS (VALUES $coefRows),
       |cells AS (
       | SELECT c.i, ((c.a * h.h + c.b) % $p) % 512 AS j, COUNT(*) AS cnt
       | FROM hashed h CROSS JOIN coef c GROUP BY 1, 2),
       |probes(word) AS (VALUES $probeRows),
       |pcells AS (
       | SELECT p.word, c.i,
       |  ((c.a * (${hash60Sql("p.word")} % $p) + c.b) % $p) % 512 AS j
       | FROM probes p CROSS JOIN coef c),
       |est AS (
       | SELECT pc.word, MIN(COALESCE(cl.cnt, 0)) AS est_count
       | FROM pcells pc LEFT JOIN cells cl ON cl.i = pc.i AND cl.j = pc.j
       | GROUP BY pc.word),
       |exact AS (SELECT w AS word, COUNT(*) AS exact_count FROM toks GROUP BY w)
       |SELECT e.word, CAST(e.est_count AS BIGINT) AS est_count,
       | CAST(COALESCE(x.exact_count, 0) AS BIGINT) AS exact_count
       |FROM est e LEFT JOIN exact x ON x.word = e.word
       |ORDER BY e.word""".stripMargin
  }

  /** Relational word + 3-shingle CTEs over `documents`, TOTAL over edge
    * cases to mirror Text.wordShingles exactly: >= 3 words -> distinct
    * 3-grams; 1-2 words -> one whole-text shingle (whitespace-normalized);
    * empty docs contribute no shingles (the minhash oracles LEFT JOIN from
    * documents and coalesce to Long.MaxValue, matching the engine).
    */
  private val shingleCtes: String =
    """words AS (
      | SELECT doc_id, w, i FROM (
      |  SELECT doc_id,
      |   unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
      |   generate_subscripts(string_split_regex(trim(lower(text)), '\s+'), 1) AS i
      |  FROM documents WHERE trim(text) <> '')),
      |shingles AS (
      | SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS sh
      | FROM words a
      | JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      | JOIN words c ON c.doc_id = a.doc_id AND c.i = a.i + 2
      | UNION
      | SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS sh
      | FROM documents
      | WHERE trim(text) <> ''
      |  AND len(string_split_regex(trim(lower(text)), '\s+')) < 3)""".stripMargin

  /** Winnowing CTE chain (k=2 grams, window=4) mirroring
    * [[graft.ops.Winnow.fingerprints]]: ordered bigrams with 1-based
    * positions (short docs -> one whole-text gram), packed
    * `h32 * 2^31 + (2^31-1-pos)` keys, frame-bounded window MIN, and the
    * full-window-or-pos-1 start filter. Integer-exact end to end.
    */
  private def winnowCtes: String =
    s"""words AS (
       | SELECT doc_id, w, i FROM (
       |  SELECT doc_id,
       |   unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w,
       |   generate_subscripts(string_split_regex(trim(lower(text)), '\\s+'), 1) AS i
       |  FROM documents WHERE trim(text) <> '')),
       |grams AS (
       | SELECT a.doc_id, CAST(a.i AS BIGINT) AS pos, a.w || ' ' || b.w AS gram
       | FROM words a JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
       | UNION ALL
       | SELECT doc_id, CAST(1 AS BIGINT) AS pos,
       |  regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS gram
       | FROM documents
       | WHERE trim(text) <> ''
       |  AND len(string_split_regex(trim(lower(text)), '\\s+')) < 2),
       |keys AS (
       | SELECT doc_id, pos,
       |  ((${hash60Sql("gram")} >> 28) * 2147483648 + (2147483647 - pos)) AS key
       | FROM grams),
       |wm AS (
       | SELECT doc_id, pos,
       |  min(key) OVER (PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
       |  count(*) OVER (PARTITION BY doc_id) AS n
       | FROM keys),
       |fps AS (
       | SELECT DISTINCT doc_id,
       |  (wmin >> 31) AS fp,
       |  2147483647 - (wmin & 2147483647) AS fp_pos
       | FROM wm WHERE pos <= n - 3 OR pos = 1)""".stripMargin

  private def minhashOracle: String = {
    val p = Dedup.MinhashP
    val mins = (0 until 4).map { j =>
      val (a, b) = Dedup.minhashCoeffs(j)
      // LEFT JOIN from documents + coalesce: empty docs keep Long.MaxValue
      // signatures, exactly like the engine's coalesce
      s"COALESCE(MIN((($a * (${hash60Sql("s.sh")} % $p)) + $b) % $p), ${Long.MaxValue}) AS h$j"
    }.mkString(",\n ")
    s"""WITH $shingleCtes
       |SELECT d.doc_id,
       | $mins
       |FROM documents d LEFT JOIN shingles s ON s.doc_id = d.doc_id
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
  }

  /** Replays [[graft.ops.Dedup.minhashSignatures]] at 16 hashes over the
    * SNM candidate pairs, next to the exact 3-gram Jaccard from the same
    * shingle universe — agreement and set counts in exact integers, the
    * two divisions last.
    */
  private def minhashCalibrationOracle: String = {
    val p = Dedup.MinhashP
    val sigCols = (0 until 16).map { j =>
      val (a, b) = Dedup.minhashCoeffs(j)
      s"COALESCE(MIN((($a * (${hash60Sql("s.sh")} % $p)) + $b) % $p), " +
        s"${Long.MaxValue}) AS h$j"
    }.mkString(",\n ")
    val agreeSum = (0 until 16).map(j =>
      s"CASE WHEN sa.h$j = sb.h$j THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH $shingleCtes,
       |sig AS (
       | SELECT d.doc_id,
       |  $sigCols
       | FROM documents d LEFT JOIN shingles s ON s.doc_id = d.doc_id
       | GROUP BY d.doc_id),
       |keyed AS (
       | SELECT source AS block, COALESCE(substr(text, 1, 16), '') AS skey,
       |  doc_id AS id
       | FROM documents),
       |lagged AS (
       | SELECT block, id, LAG(id, 1) OVER w AS p1, LAG(id, 2) OVER w AS p2
       | FROM keyed WINDOW w AS (PARTITION BY block ORDER BY skey, id)),
       |prs AS (
       | SELECT p1 AS id_a, id AS id_b FROM lagged WHERE p1 IS NOT NULL
       | UNION ALL
       | SELECT p2, id FROM lagged WHERE p2 IS NOT NULL),
       |sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
       |          FROM shingles GROUP BY doc_id),
       |inter AS (
       | SELECT pr.id_a, pr.id_b, CAST(COUNT(*) AS BIGINT) AS n_inter
       | FROM prs pr
       |  JOIN shingles x ON x.doc_id = pr.id_a
       |  JOIN shingles y ON y.doc_id = pr.id_b AND y.sh = x.sh
       | GROUP BY pr.id_a, pr.id_b),
       |rep AS (
       | SELECT pr.id_a, pr.id_b,
       |  CAST($agreeSum AS BIGINT) AS n_agree,
       |  COALESCE(za.n, 0) AS n_a, COALESCE(zb.n, 0) AS n_b,
       |  COALESCE(i.n_inter, 0) AS n_inter
       | FROM prs pr
       |  JOIN sig sa ON sa.doc_id = pr.id_a
       |  JOIN sig sb ON sb.doc_id = pr.id_b
       |  LEFT JOIN sizes za ON za.doc_id = pr.id_a
       |  LEFT JOIN sizes zb ON zb.doc_id = pr.id_b
       |  LEFT JOIN inter i ON i.id_a = pr.id_a AND i.id_b = pr.id_b)
       |SELECT id_a, id_b, n_agree, n_a, n_b, n_inter,
       | CAST(n_agree AS DOUBLE) / 16.0 AS est,
       | CAST(n_inter AS DOUBLE) / CAST(n_a + n_b - n_inter AS DOUBLE)
       |   AS exact_jaccard
       |FROM rep ORDER BY id_a, id_b""".stripMargin
  }

  /** Group-level signature: min over a source's docs of each doc's min =
    * min over ALL the source's shingle hashes; n_docs counted per doc.
    */
  private def groupMinhashOracle: String = {
    val p = Dedup.MinhashP
    val mins = (0 until 4).map { j =>
      val (a, b) = Dedup.minhashCoeffs(j)
      s"COALESCE(MIN((($a * (${hash60Sql("s.sh")} % $p)) + $b) % $p), ${Long.MaxValue}) AS h$j"
    }.mkString(",\n ")
    s"""WITH $shingleCtes
       |SELECT d.source,
       | $mins,
       | COUNT(DISTINCT d.doc_id) AS n_docs
       |FROM documents d LEFT JOIN shingles s ON s.doc_id = d.doc_id
       |GROUP BY d.source ORDER BY source""".stripMargin
  }

  private def simhashOracle(bits: Int): String = {
    val votes = (0 until bits).map(b =>
      s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b").mkString(",\n  ")
    // LEFT JOIN from documents: empty/whitespace-only docs have no token
    // rows; NULL votes fall through every CASE to 0 -> simhash 0, exactly
    // the engine's empty-token guard
    val bitsum = (0 until bits).map(b =>
      s"CASE WHEN v.v$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
    s"""WITH toks AS (
       | SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
       | FROM documents WHERE trim(text) <> ''),
       |hashed AS (SELECT doc_id, ${hash60Sql("w")} AS h FROM toks),
       |votes AS (
       | SELECT doc_id,
       |  $votes
       | FROM hashed GROUP BY doc_id)
       |SELECT d.doc_id, CAST($bitsum AS BIGINT) AS simhash
       |FROM documents d LEFT JOIN votes v ON v.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  private def ngramJaccardOracle: String =
    """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
      |words AS (
      | SELECT doc_id, w, i FROM (
      |  SELECT doc_id,
      |   unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
      |   generate_subscripts(string_split_regex(trim(lower(text)), '\s+'), 1) AS i
      |  FROM docs WHERE trim(text) <> '')),
      |shingles AS (
      | SELECT DISTINCT a.doc_id AS id, a.w || ' ' || b.w AS sh
      | FROM words a JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      | UNION
      | SELECT doc_id AS id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS sh
      | FROM docs
      | WHERE trim(text) <> ''
      |  AND len(string_split_regex(trim(lower(text)), '\s+')) < 2),
      |sizes AS (SELECT id, COUNT(*) AS n FROM shingles GROUP BY id),
      |inter AS (
      | SELECT x.id AS id_a, y.id AS id_b, COUNT(*) AS n_inter
      | FROM shingles x JOIN shingles y ON x.sh = y.sh AND x.id < y.id
      | GROUP BY x.id, y.id)
      |SELECT id_a, id_b,
      | CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE) AS jaccard
      |FROM inter
      | JOIN sizes sa ON sa.id = id_a
      | JOIN sizes sb ON sb.id = id_b
      |WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= 0.05
      |ORDER BY id_a, id_b""".stripMargin

  /** One 30-round power-iteration chain over the matrix CTE `mat`
    * (column `m`, one row): recursive CTE + first-nonzero sign fix,
    * mirroring EmbeddingAgg.powerIterate fold for fold. The NV
    * expression is spelled three times — DuckDB lambdas reject
    * subqueries and correlation reaches one level deep, so the
    * duplicated copies (deterministic, bitwise identical) stand in for
    * a binding.
    */
  private def powerIterSql(mat: String, it: String, fin: String,
      lead: String, pcv: String, pc: String): String = {
    val nv = "list_transform(range(0, 64), ii -> list_sum(list_transform(" +
      s"list_zip($mat.m[CAST(ii AS INT) + 1], $it.v), x -> x[1] * x[2])))"
    s"""$it(k, v) AS (
       | SELECT 0 AS k, list_transform(range(0, 64), x -> 1.0 / sqrt(64.0)) AS v
       | UNION ALL
       | SELECT $it.k + 1,
       |  CASE WHEN sqrt(list_sum(list_transform($nv, x -> x * x))) > 0
       |       THEN list_transform($nv,
       |         x -> x / sqrt(list_sum(list_transform($nv, x -> x * x))))
       |       ELSE $it.v END
       | FROM $it, $mat WHERE $it.k < 30),
       |$fin AS (SELECT v FROM $it WHERE k = 30),
       |$lead AS (
       | SELECT min(r.ii) AS li FROM range(0, 64) r(ii), $fin
       | WHERE $fin.v[CAST(r.ii AS INT) + 1] <> 0.0),
       |$pcv AS MATERIALIZED (
       | SELECT CASE WHEN $lead.li IS NOT NULL
       |         AND $fin.v[CAST($lead.li AS INT) + 1] < 0
       |        THEN list_transform($fin.v, x -> -x) ELSE $fin.v END AS $pc
       | FROM $fin CROSS JOIN $lead)""".stripMargin
  }

  /** The emb_covariance CTE chain up to the full-matrix `mat` row. */
  private val covMatSql: String =
    """clean AS (
      | SELECT embedding::DOUBLE[] AS v FROM embeddings
      | WHERE embedding IS NOT NULL AND len(embedding) = 64
      |  AND len(embedding) = list_aggregate(embedding, 'count')),
      |nn AS (SELECT COUNT(*) AS n FROM clean),
      |pairs AS (
      | SELECT i.i AS i, j.j AS j,
      |  CAST(ROUND(v[CAST(i.i AS INT) + 1] * v[CAST(j.j AS INT) + 1]
      |    * 1000000000.0) AS BIGINT) AS p
      | FROM clean CROSS JOIN range(0, 64) i(i) CROSS JOIN range(0, 64) j(j)
      | WHERE j.j >= i.i),
      |sums AS (SELECT i, j, SUM(p) AS s FROM pairs GROUP BY 1, 2),
      |mom AS (
      | SELECT t.i AS i,
      |  SUM(CAST(ROUND(v[CAST(t.i AS INT) + 1] * 1000000000.0) AS BIGINT)) AS sm
      | FROM clean CROSS JOIN range(0, 64) t(i) GROUP BY 1),
      |covm AS (
      | SELECT s.i AS i, s.j AS j,
      |  CAST(s.s AS DOUBLE) / 1000000000.0 / nn.n
      |   - (CAST(mi.sm AS DOUBLE) / 1000000000.0 / nn.n)
      |     * (CAST(mj.sm AS DOUBLE) / 1000000000.0 / nn.n) AS cov
      | FROM sums s CROSS JOIN nn
      |  JOIN mom mi ON mi.i = s.i
      |  JOIN mom mj ON mj.i = s.j),
      |fullm AS (
      | SELECT i, j, cov FROM covm
      | UNION ALL
      | SELECT j AS i, i AS j, cov FROM covm WHERE i < j),
      |rows_m AS (SELECT i, list(cov ORDER BY j) AS r FROM fullm GROUP BY i),
      |mat AS MATERIALIZED (SELECT list(r ORDER BY i) AS m FROM rows_m)""".stripMargin

  /** Replays EmbeddingAgg.pcTop(k=2): pc1 chain, Rayleigh quotient
    * λ = pcᵀ(M pc) (both folds ascending), Hotelling deflation
    * m2 = m - λ·(pc_i·pc_j), second chain over m2, projections on both.
    * The intermediate CTEs are MATERIALIZED — DuckDB inlines CTEs by
    * default, and re-deriving the whole first chain inside every
    * second-chain iteration turns a 1-second query into 5+ minutes
    * (measured 314 s plain vs 1.1 s materialized, identical results).
    */
  private def pcaTop2Oracle: String =
    s"""WITH RECURSIVE $covMatSql,
       |${powerIterSql("mat", "it", "fin", "lead", "pcv", "pc")},
       |mv AS MATERIALIZED (
       | SELECT list_transform(range(0, 64), i ->
       |   list_sum(list_transform(
       |     list_zip(mat.m[CAST(i AS INT) + 1], pcv.pc),
       |     x -> x[1] * x[2]))) AS mv
       | FROM mat, pcv),
       |lam AS MATERIALIZED (
       | SELECT list_sum(list_transform(list_zip(pcv.pc, mv.mv),
       |   x -> x[1] * x[2])) AS l
       | FROM pcv, mv),
       |mat2 AS MATERIALIZED (
       | SELECT list_transform(range(0, 64), i ->
       |   list_transform(range(0, 64), j ->
       |     mat.m[CAST(i AS INT) + 1][CAST(j AS INT) + 1]
       |      - lam.l * (pcv.pc[CAST(i AS INT) + 1]
       |                 * pcv.pc[CAST(j AS INT) + 1]))) AS m
       | FROM mat, pcv, lam),
       |${powerIterSql("mat2", "it2", "fin2", "lead2", "pcv2", "pc2")}
       |SELECT ev.vec_id,
       | (CASE WHEN len(ev.v) = len(pcv.pc)
       |   AND len(ev.v) = list_aggregate(ev.v, 'count')
       |   AND len(pcv.pc) = list_aggregate(pcv.pc, 'count')
       |  THEN list_sum(list_transform(list_zip(ev.v, pcv.pc), x -> x[1] * x[2]))
       |  END) AS pc1_score,
       | (CASE WHEN len(ev.v) = len(pcv2.pc2)
       |   AND len(ev.v) = list_aggregate(ev.v, 'count')
       |   AND len(pcv2.pc2) = list_aggregate(pcv2.pc2, 'count')
       |  THEN list_sum(list_transform(list_zip(ev.v, pcv2.pc2), x -> x[1] * x[2]))
       |  END) AS pc2_score
       |FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) ev
       | CROSS JOIN pcv CROSS JOIN pcv2
       |ORDER BY vec_id""".stripMargin

  /** Same shingle universe and pair counts as [[ngramJaccardOracle]];
    * per-threshold survivors decided by the exact integer predicate
    * `100·inter >= t·union`, then pair / distinct-doc counts per
    * threshold (zero-coalesced so every requested threshold reports).
    */
  private def thresholdSweepOracle: String =
    """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
      |words AS (
      | SELECT doc_id, w, i FROM (
      |  SELECT doc_id,
      |   unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
      |   generate_subscripts(string_split_regex(trim(lower(text)), '\s+'), 1) AS i
      |  FROM docs WHERE trim(text) <> '')),
      |shingles AS (
      | SELECT DISTINCT a.doc_id AS id, a.w || ' ' || b.w AS sh
      | FROM words a JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      | UNION
      | SELECT doc_id AS id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS sh
      | FROM docs
      | WHERE trim(text) <> ''
      |  AND len(string_split_regex(trim(lower(text)), '\s+')) < 2),
      |sizes AS (SELECT id, COUNT(*) AS n FROM shingles GROUP BY id),
      |inter AS (
      | SELECT x.id AS id_a, y.id AS id_b, COUNT(*) AS n_inter
      | FROM shingles x JOIN shingles y ON x.sh = y.sh AND x.id < y.id
      | GROUP BY x.id, y.id),
      |pairs AS (
      | SELECT id_a, id_b, n_inter, sa.n AS n_a, sb.n AS n_b
      | FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b),
      |th AS (SELECT CAST(t AS BIGINT) AS t_pct
      |       FROM (VALUES (5), (10), (25), (50), (75), (90), (100)) v(t)),
      |surv AS (
      | SELECT th.t_pct, p.id_a, p.id_b FROM pairs p CROSS JOIN th
      | WHERE p.n_inter * 100 >= th.t_pct * (p.n_a + p.n_b - p.n_inter)),
      |np AS (SELECT t_pct, CAST(COUNT(*) AS BIGINT) AS n_pairs
      |       FROM surv GROUP BY 1),
      |nd AS (SELECT t_pct, CAST(COUNT(DISTINCT id) AS BIGINT) AS n_docs
      |       FROM (SELECT t_pct, id_a AS id FROM surv
      |             UNION ALL SELECT t_pct, id_b FROM surv)
      |       GROUP BY 1)
      |SELECT th.t_pct, COALESCE(np.n_pairs, 0) AS n_pairs,
      | COALESCE(nd.n_docs, 0) AS n_docs
      |FROM th LEFT JOIN np USING (t_pct) LEFT JOIN nd USING (t_pct)
      |ORDER BY t_pct""".stripMargin

  /** Same shingle universe as [[ngramJaccardOracle]], containment
    * arithmetic per direction (n_a >= 1 by construction, so the
    * divisions are total).
    */
  private def containmentOracle: String =
    """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
      |words AS (
      | SELECT doc_id, w, i FROM (
      |  SELECT doc_id,
      |   unnest(string_split_regex(trim(lower(text)), '\s+')) AS w,
      |   generate_subscripts(string_split_regex(trim(lower(text)), '\s+'), 1) AS i
      |  FROM docs WHERE trim(text) <> '')),
      |shingles AS (
      | SELECT DISTINCT a.doc_id AS id, a.w || ' ' || b.w AS sh
      | FROM words a JOIN words b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      | UNION
      | SELECT doc_id AS id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS sh
      | FROM docs
      | WHERE trim(text) <> ''
      |  AND len(string_split_regex(trim(lower(text)), '\s+')) < 2),
      |sizes AS (SELECT id, COUNT(*) AS n FROM shingles GROUP BY id),
      |inter AS (
      | SELECT x.id AS id_a, y.id AS id_b, COUNT(*) AS n_inter
      | FROM shingles x JOIN shingles y ON x.sh = y.sh AND x.id < y.id
      | GROUP BY x.id, y.id)
      |SELECT id_a, id_b,
      | CAST(n_inter AS DOUBLE) / CAST(sa.n AS DOUBLE) AS c_ab,
      | CAST(n_inter AS DOUBLE) / CAST(sb.n AS DOUBLE) AS c_ba
      |FROM inter
      | JOIN sizes sa ON sa.id = id_a
      | JOIN sizes sb ON sb.id = id_b
      |WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n AS DOUBLE) >= 0.4
      |   OR CAST(n_inter AS DOUBLE) / CAST(sb.n AS DOUBLE) >= 0.4
      |ORDER BY id_a, id_b""".stripMargin

  /** Replays decontamination: distinct 3-shingles per side (with the
    * whole-text shingle for <3-word docs, mirroring wordShingles), then
    * per-training-doc totals and benchmark-membership hits; zero-shingle
    * docs re-enter via the doc-spine left join.
    */
  private def decontaminateOracle: String = {
    def words(src: String) =
      s"""SELECT doc_id, w, i FROM (
         | SELECT doc_id,
         |  unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w,
         |  generate_subscripts(string_split_regex(trim(lower(text)), '\\s+'), 1) AS i
         | FROM $src WHERE trim(text) <> '')""".stripMargin
    def shingles(wordsCte: String, src: String) =
      s"""SELECT DISTINCT a.doc_id AS id, a.w || ' ' || b.w || ' ' || c.w AS sh
         |FROM $wordsCte a
         | JOIN $wordsCte b ON b.doc_id = a.doc_id AND b.i = a.i + 1
         | JOIN $wordsCte c ON c.doc_id = a.doc_id AND c.i = a.i + 2
         |UNION
         |SELECT doc_id AS id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS sh
         |FROM $src WHERE trim(text) <> ''
         | AND len(string_split_regex(trim(lower(text)), '\\s+')) < 3""".stripMargin
    s"""WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
       |train AS (SELECT doc_id, text FROM documents WHERE doc_id >= 20),
       |bw AS (${words("bench")}),
       |tw AS (${words("train")}),
       |bsh AS (SELECT DISTINCT sh FROM (${shingles("bw", "bench")})),
       |tsh AS (${shingles("tw", "train")}),
       |agg AS (
       | SELECT id, COUNT(*) AS n_shingles,
       |  CAST(SUM(CASE WHEN sh IN (SELECT sh FROM bsh) THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
       | FROM tsh GROUP BY id)
       |SELECT t.doc_id,
       | CAST(COALESCE(agg.n_shingles, 0) AS BIGINT) AS n_shingles,
       | CAST(COALESCE(agg.n_hits, 0) AS BIGINT) AS n_hits,
       | CAST(CASE WHEN COALESCE(agg.n_hits, 0) > 0 THEN 1 ELSE 0 END AS INTEGER)
       |  AS is_contaminated
       |FROM train t LEFT JOIN agg ON agg.id = t.doc_id
       |ORDER BY t.doc_id""".stripMargin
  }

  /** Per-language stopword hit sums + argmax with the array_max-on-struct
    * tie-break (lexicographically LAST language wins ties).
    */
  private def textProfileOracle: String = {
    val langs = Text.stopwords.keys.toSeq.sorted
    def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("(", ", ", ")")
    val hitCols = langs.map(l =>
      s"SUM(CASE WHEN w IN ${inList(Text.stopwords(l))} THEN 1 ELSE 0 END) AS h_$l")
      .mkString(",\n  ")
    val allHits =
      s"SUM(CASE WHEN w IN ${inList(Text.stopwords.values.flatten.toSeq)} THEN 1 ELSE 0 END) AS h_all"
    // argmax, later-language wins ties (matches array_max on struct(hits,lang))
    val argmax = langs.reverse.zipWithIndex.map { case (l, idx) =>
      val others = langs.filterNot(_ == l)
      val cond = others.map(o => s"h_$l >= h_$o").mkString(" AND ")
      if (idx == langs.size - 1) s"ELSE '$l'"
      else (if (idx == 0) s"CASE WHEN $cond THEN '$l'" else s"WHEN $cond THEN '$l'")
    }.mkString(" ") + " END"
    val fp =
      s"SUM((${hash60Sql("w")} % 1000000) * i) AS fp_sum"
    // LEFT JOIN from charstats (all docs, incl. empty/whitespace-only/null
    // text) with zero-coalesced word stats, mirroring the engine's
    // when-guards: empty docs -> und / zero ratios / fingerprint 0.
    s"""WITH words AS (
       | SELECT doc_id, w, i FROM (
       |  SELECT doc_id,
       |   unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w,
       |   generate_subscripts(string_split_regex(trim(lower(text)), '\\s+'), 1) AS i
       |  FROM documents WHERE text IS NOT NULL AND trim(text) <> '')),
       |wordstats AS (
       | SELECT doc_id,
       |  COUNT(*) AS n_tokens,
       |  $hitCols,
       |  $allHits,
       |  $fp
       | FROM words GROUP BY doc_id),
       |charstats AS (
       | SELECT doc_id,
       |  length(COALESCE(text, '')) AS n_chars,
       |  len(regexp_extract_all(COALESCE(text, ''), '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
       |  len(regexp_extract_all(COALESCE(text, ''), '[.,;:!?''"()\\[\\]{}]')) AS n_punct
       | FROM documents),
       |joined AS (
       | SELECT c.doc_id,
       |  COALESCE(w.n_tokens, 0) AS n_tokens,
       |  COALESCE(w.h_all, 0) AS h_all,
       |  c.n_chars, c.n_bpe_tokens, c.n_punct,
       |  COALESCE(w.fp_sum, 0) AS fp_sum,
       |  $argmax AS best_lang,
       |  COALESCE(GREATEST(${langs.map(l => s"w.h_$l").mkString(", ")}), 0) AS best_hits
       | FROM charstats c LEFT JOIN wordstats w ON w.doc_id = c.doc_id)
       |SELECT doc_id,
       | CASE WHEN best_hits > 0 THEN best_lang ELSE 'und' END AS lang_pred,
       | CAST(n_chars AS BIGINT) AS n_chars,
       | CAST(n_tokens AS BIGINT) AS n_tokens,
       | CAST(n_bpe_tokens AS BIGINT) AS n_bpe_tokens,
       | CASE WHEN n_chars > 0
       |      THEN ROUND(CAST(n_punct AS DOUBLE) / n_chars, 6) ELSE 0.0 END AS punct_ratio,
       | CASE WHEN n_tokens > 0
       |      THEN ROUND(CAST(h_all AS DOUBLE) / n_tokens, 6) ELSE 0.0 END AS stopword_ratio,
       | ROUND((LEAST(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
       |      + GREATEST(1.0 - (CASE WHEN n_chars > 0
       |          THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END) * 5.0, 0.0)
       |      + LEAST((CASE WHEN n_tokens > 0
       |          THEN CAST(h_all AS DOUBLE) / n_tokens ELSE 0.0 END) * 4.0, 1.0)) / 3.0, 6) AS quality_score,
       | CAST(fp_sum % 2147483647 AS BIGINT) AS fingerprint
       |FROM joined ORDER BY doc_id""".stripMargin
  }

  /** LSH bucket expression over a DOUBLE[] column, with the SAME hyperplane
    * sign constants the engine uses (Vectors.hyperplaneSigns, seed 7) inlined
    * as literals — the projection fold is left-associative in both engines,
    * so buckets (and therefore candidates and ranks) match bit-for-bit.
    */
  private def lshBucketSql(vecExpr: String, bits: Int, dim: Int,
      seed: Int = 7): String = {
    val signs = Vectors.hyperplaneSigns(bits, dim, seed)
    (0 until bits).map { j =>
      val terms = (0 until dim).map { i =>
        val s = if (signs(j)(i) > 0) "" else "-"
        s"$s$vecExpr[${i + 1}]"
      }.mkString(" + ").replace("+ -", "- ")
      s"(CASE WHEN ($terms) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** Unrolled Lloyd training + IVF probe: c0 = prefix-sample init (cell =
    * rank of seed vec_id), then per iteration an argmin assignment CTE and
    * a decimal-exact per-dimension mean CTE. Mirrors
    * `Similarity.trainedCentroids` step for step — order-free decimal sums
    * are what make cross-engine bit-equality of TRAINED centroids (and
    * hence identical final assignments) possible.
    */
  /** Shared WITH-prefix (no leading `WITH`): embeddings as DOUBLE lists
    * (`e`) + the Lloyd-trained centroid chain — `c0` prefix seed, `iters`
    * unrolled assign/decimal-mean rounds — ending in CTE `c{iters}`.
    * Callers append their own CTEs; the chain replays
    * `Similarity.trainedCentroids` bit-for-bit.
    */
  private def trainedCentroidChainSql(nCells: Int, iters: Int,
      dim: Int): String = {
    val iterCtes = (1 to iters).map { it =>
      val prev = s"c${it - 1}"
      s"""a$it AS (
         | SELECT vec_id, v, cell FROM (
         |  SELECT e.vec_id, e.v, c.cell,
         |   ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |     ORDER BY ${distSql("e.v", "c.cv")} ASC, c.cell ASC) AS rn
         |  FROM e CROSS JOIN $prev c) WHERE rn = 1),
         |s$it AS (
         | SELECT a.cell, r.i,
         |  CAST(SUM(CAST(round(a.v[r.i] * 1e9) AS BIGINT)) AS DOUBLE)
         |    / COUNT(a.v[r.i]) / 1e9 AS m
         | FROM a$it a CROSS JOIN range(1, ${dim + 1}) r(i)
         | GROUP BY a.cell, r.i
         | HAVING COUNT(a.v[r.i]) > 0),
         |c$it AS (
         | SELECT cell, list(m ORDER BY i) AS cv FROM s$it GROUP BY cell
         | UNION ALL
         | SELECT p.cell, p.cv FROM $prev p
         | WHERE p.cell NOT IN (SELECT DISTINCT cell FROM s$it))""".stripMargin
    }.mkString(",\n")
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c0 AS (
       | SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
       | FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $nCells)),
       |$iterCtes""".stripMargin
  }

  private def ivfTrainedOracle(nCells: Int = 16, nProbe: Int = 2,
      iters: Int = 2, dim: Int = 64): String = {
    val fin = s"c$iters"
    s"""WITH ${trainedCentroidChainSql(nCells, iters, dim)},
       |corpus AS (SELECT vec_id AS corpus_id, v AS cv FROM e),
       |cassign AS (
       | SELECT corpus_id, cv, cell FROM (
       |  SELECT c.corpus_id, c.cv, ct.cell,
       |   ROW_NUMBER() OVER (PARTITION BY c.corpus_id
       |     ORDER BY ${distSql("c.cv", "ct.cv")} ASC, ct.cell ASC) AS rn
       |  FROM corpus c CROSS JOIN $fin ct) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |qprobe AS (
       | SELECT query_id, qv, cell FROM (
       |  SELECT q.query_id, q.qv, ct.cell,
       |   ROW_NUMBER() OVER (PARTITION BY q.query_id
       |     ORDER BY ${distSql("q.qv", "ct.cv")} ASC, ct.cell ASC) AS rn
       |  FROM q CROSS JOIN $fin ct) WHERE rn <= $nProbe),
       |scored AS (
       | SELECT qp.query_id, ca.corpus_id,
       |  ${cosineSql("qp.qv", "ca.cv")} AS cosine
       | FROM cassign ca JOIN qprobe qp ON ca.cell = qp.cell
       | WHERE ca.corpus_id <> qp.query_id)
       |SELECT query_id, corpus_id, ROUND(cosine, 6) AS cosine, rank
       |FROM (
       | SELECT query_id, corpus_id, cosine,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id ASC) AS rank
       | FROM scored)
       |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  /** Replays `Dedup.semanticDedup` end to end: the trained-centroid
    * chain, full-corpus nearest-cell assignment (NULL distances sort
    * last, so degenerate vectors take the smallest cell — matching
    * `assignNearest`), and the within-cell lower-id near-dup semi join.
    * cosineSql is the TOTAL in-order fold, bit-equal to the engine's
    * DotProduct, so the `>= threshold` cut is exact on both sides.
    */
  private def semanticDedupOracle(nCells: Int = 16, iters: Int = 2,
      dim: Int = 64, threshold: Double = 0.38): String = {
    val fin = s"c$iters"
    s"""WITH ${trainedCentroidChainSql(nCells, iters, dim)},
       |cassign AS (
       | SELECT vec_id, v, cell FROM (
       |  SELECT e.vec_id, e.v, ct.cell,
       |   ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |     ORDER BY ${distSql("e.v", "ct.cv")} ASC, ct.cell ASC) AS rn
       |  FROM e CROSS JOIN $fin ct) WHERE rn = 1),
       |drops AS (
       | SELECT DISTINCT b.vec_id
       | FROM cassign a JOIN cassign b
       |   ON a.cell = b.cell AND a.vec_id < b.vec_id
       | WHERE ${cosineSql("a.v", "b.v")} >= $threshold)
       |SELECT c.vec_id, c.cell, (d.vec_id IS NULL) AS kept
       |FROM cassign c LEFT JOIN drops d ON c.vec_id = d.vec_id
       |ORDER BY c.vec_id""".stripMargin
  }

  /** Replays the WHOLE sq8 path: amax -> scale -> tinyint codes (the
    * encoding), guarded in-order code-dot (dotSql discipline — list_sum
    * skips nulls where Spark's fold nulls out, hence the element-count
    * guard), approximate candidate cut, exact rerank. Degenerate-vector
    * routes (null / null-element / all-zero / ragged) all collapse to a
    * NULL score on both engines even though the intermediate `scale`
    * differs in null-ness (Spark folds to 0, list_max yields NULL) —
    * the codes are NULL either way.
    */
  private def sq8TopkOracle(rerank: Int = 40, k: Int = 10): String = {
    val codesDot =
      "(CASE WHEN len(codes) = len(qv) AND len(codes) = list_aggregate(codes, 'count')" +
        " AND len(qv) = list_aggregate(qv, 'count')" +
        " THEN list_sum(list_transform(list_zip(codes, qv), x -> x[1] * x[2])) END)"
    s"""WITH enc AS (
       |  SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS cv,
       |   sqrt(${dotSql("embedding::DOUBLE[]", "embedding::DOUBLE[]")}) AS cn,
       |   list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0 AS scale
       |  FROM embeddings),
       | enc2 AS (
       |  SELECT corpus_id, cv, cn, scale,
       |   CASE WHEN scale > 0
       |    THEN list_transform(cv, x -> CAST(round(x / scale) AS TINYINT)) END AS codes
       |  FROM enc),
       | q AS (
       |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
       |   sqrt(${dotSql("embedding::DOUBLE[]", "embedding::DOUBLE[]")}) AS qn
       |  FROM embeddings WHERE vec_id < 5),
       | approx AS (
       |  SELECT q.query_id, e.corpus_id,
       |   CASE WHEN q.qn > 0 AND e.cn > 0
       |    THEN (e.scale * $codesDot) / (q.qn * e.cn) END AS ascore
       |  FROM enc2 e CROSS JOIN q WHERE e.corpus_id <> q.query_id),
       | cands AS (
       |  SELECT query_id, corpus_id FROM (
       |   SELECT query_id, corpus_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY ascore DESC, corpus_id ASC) AS rn
       |   FROM approx) WHERE rn <= $rerank),
       | exact AS (
       |  SELECT ca.query_id, ca.corpus_id, ${cosineSql("q.qv", "e.cv")} AS cosine
       |  FROM cands ca JOIN enc2 e ON e.corpus_id = ca.corpus_id
       |                JOIN q ON q.query_id = ca.query_id)
       |SELECT query_id, corpus_id, ROUND(cosine, 6) AS cosine, rank
       |FROM (
       | SELECT query_id, corpus_id, cosine,
       |  ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, corpus_id ASC) AS rank
       | FROM exact)
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** Replays Sampling.weightedK bit-for-bit: the Efraimidis-Spirakis key
    * uses the PORTABLE ln (exact exponent via bin(), atanh Horner series
    * in the identical association order — see Sampling.portableLnStages),
    * so every double here is the same double Spark computes; native ln
    * would drift in the last ulp on ~0.1% of inputs.
    */
  private def sampleWeightedOracle: String = {
    val ln2 = "CAST(0.6931471805599453 AS DOUBLE)"
    def d(i: Int) = s"CAST($i AS DOUBLE)"
    // Horner shape identical to Sampling.portableLnStages' poly
    val poly = Seq(13, 11, 9, 7, 5, 3).foldLeft("") { (acc, q) =>
      if (acc.isEmpty) s"${d(1)}/${d(q)}"
      else s"${d(1)}/${d(q)} + z2*($acc)"
    }
    val h = hash60Sql("CAST(doc_id AS VARCHAR)", 0)
    s"""WITH w AS (
       | SELECT doc_id, n_chars FROM documents WHERE n_chars > 0),
       |st AS (SELECT doc_id, n_chars, $h + 1 AS n FROM w),
       |pp AS (SELECT doc_id, n_chars, n,
       |        CAST(len(bin(n)) - 1 AS INTEGER) AS p FROM st),
       |mm AS (SELECT doc_id, n_chars, p,
       |        CAST(n AS DOUBLE) / CAST((CAST(1 AS BIGINT) << p) AS DOUBLE) AS m
       |       FROM pp),
       |zz AS (SELECT doc_id, n_chars, p,
       |        (m - ${d(1)}) / (m + ${d(1)}) AS z FROM mm),
       |z2t AS (SELECT doc_id, n_chars, p, z, z*z AS z2 FROM zz),
       |kk AS (SELECT doc_id, n_chars,
       |  (CAST(p AS DOUBLE) * $ln2 +
       |   ${d(2)} * z * (${d(1)} + z2 * ($poly))
       |   - ${d(60)} * $ln2) / CAST(n_chars AS DOUBLE) AS key
       | FROM z2t)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY key DESC, doc_id) AS INTEGER) AS rank,
       | doc_id, n_chars, ROUND(key, 6) AS es_key
       |FROM (SELECT * FROM kk ORDER BY key DESC, doc_id LIMIT 50)
       |ORDER BY rank""".stripMargin
  }

  /** Shared by the batch and streaming funnel queries — the streaming path
    * is arrival-order-independent (sorted-multiset fold), so the strict
    * batch oracle applies to both.
    */
  private val funnelUserStepsSql: String =
    """WITH ev AS (
      | SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events
      | WHERE user_id <= 200),
      |s1 AS (
      | SELECT user_id, MIN(ts_us) AS step1_view FROM ev
      | WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (
      | SELECT e.user_id, MIN(e.ts_us) AS step2_click
      | FROM ev e JOIN s1 ON e.user_id = s1.user_id
      | WHERE e.event_type = 'click' AND e.ts_us > s1.step1_view GROUP BY 1),
      |s3 AS (
      | SELECT e.user_id, MIN(e.ts_us) AS step3_purchase
      | FROM ev e JOIN s2 ON e.user_id = s2.user_id
      | WHERE e.event_type = 'purchase' AND e.ts_us > s2.step2_click GROUP BY 1)
      |SELECT s1.user_id AS user_id, s1.step1_view, s2.step2_click, s3.step3_purchase
      |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
      |        LEFT JOIN s3 ON s1.user_id = s3.user_id
      |ORDER BY user_id""".stripMargin

  /** Shared by the batch and streaming upsert queries — the streaming
    * latest-per-key is a commutative/associative argmax, so arrival order
    * cannot change it.
    */
  private val upsertMergeSql: String =
    """WITH cur AS (
      | SELECT o_orderkey, o_custkey, o_totalprice, CAST(0 AS BIGINT) AS seq
      | FROM orders WHERE o_orderkey <= 5000),
      |upd AS (
      | SELECT o_orderkey, o_custkey, o_totalprice + 2.0 AS o_totalprice,
      |  CAST(2 AS BIGINT) AS seq
      | FROM cur WHERE o_orderkey % 10 = 0)
      |SELECT c.o_orderkey, c.o_custkey, c.o_totalprice, c.seq FROM cur c
      |WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = c.o_orderkey)
      |UNION ALL SELECT o_orderkey, o_custkey, o_totalprice, seq FROM upd
      |ORDER BY o_orderkey""".stripMargin

  /** Guarded squared-L2 (no sqrt — argmin/sum care only about order), same
    * totality discipline as [[distSql]].
    */
  private def l2sqSql(a: String, b: String): String =
    s"(CASE WHEN len($a) = len($b) AND len($a) = list_aggregate($a, 'count')" +
      s" AND len($b) = list_aggregate($b, 'count')" +
      s" THEN list_sum(list_transform(list_zip($a, $b)," +
      s" x -> (x[1] - x[2]) * (x[1] - x[2]))) END)"

  /** Replays the whole PQ pipeline: prefix-sample codebook (null seed
    * vectors excluded on both engines), per-sub-space argmin encode (all-
    * null distances -> j=0 by the j-asc tie-break), ADC lookup join, and a
    * TOTAL ordered sum for the approximate distance (list_sum skips nulls,
    * so the COUNT guard nulls the whole sum exactly where Spark's fold
    * does), then the exact cosine rerank.
    */
  /** Fixed BPE merge artifact for bpe_encode (common-English bigram
    * merges; what matters is the fold semantics, not the vocabulary). */
  private val bpeEncodeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n",
    "an" -> "d", "e" -> "r", "o" -> "n", "r" -> "e")

  /** Replays [[graft.ops.Bpe.encode]]: per word, sentinel-wrapped char
    * symbols folded through the merge list as chained REPLACEs (plain
    * substring replace is left-to-right non-overlapping in both engines —
    * exactly the greedy BPE rewrite), then split back to subwords.
    * Sentinels chr(1)/chr(2) are verified absent from every corpus.
    */
  private def bpeEncodeOracle(merges: Seq[(String, String)]): String = {
    def wrap(sym: String) = s"chr(1)||'$sym'||chr(2)"
    val wrapped = "list_aggregate(list_transform(string_split(w, '')," +
      " c -> chr(1)||c||chr(2)), 'string_agg', '')"
    val folded = merges.foldLeft(wrapped) { case (acc, (a, b)) =>
      s"REPLACE($acc, ${wrap(a)}||${wrap(b)}, ${wrap(a + b)})"
    }
    s"""WITH words AS (
       | SELECT doc_id, w, i FROM (
       |  SELECT doc_id,
       |   unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w,
       |   generate_subscripts(string_split_regex(trim(lower(text)), '\\s+'), 1) AS i
       |  FROM documents WHERE trim(text) <> '')
       | WHERE w <> ''),
       |enc0 AS (SELECT doc_id, i, $folded AS s FROM words),
       |enc AS (
       | SELECT doc_id, i,
       |  string_split(substr(s, 2, len(s) - 2), chr(2)||chr(1)) AS tk
       | FROM enc0),
       |toks AS (
       | SELECT doc_id, i, unnest(tk) AS t, generate_subscripts(tk, 1) AS j
       | FROM enc),
       |ord AS (
       | SELECT doc_id, t, ROW_NUMBER() OVER (
       |   PARTITION BY doc_id ORDER BY i, j) AS r
       | FROM toks)
       |SELECT d.doc_id,
       | COALESCE(c.n, 0) AS n_subwords,
       | COALESCE(h.head10, '') AS head10
       |FROM documents d
       | LEFT JOIN (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
       |            FROM ord GROUP BY 1) c ON c.doc_id = d.doc_id
       | LEFT JOIN (SELECT doc_id, string_agg(t, ' ' ORDER BY r) AS head10
       |            FROM ord WHERE r <= 10 GROUP BY doc_id) h
       |   ON h.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  private def pqTopkOracle(m: Int = 8, dsub: Int = 8, cbSize: Int = 16,
      rerank: Int = 40, k: Int = 10, iters: Int = 0): String = {
    // optional Lloyd chain: assign (argmin over cb{it-1}) -> per-dim
    // decimal-exact mean -> cb$it, empty (sub, j) cells carried forward —
    // mirrors Similarity.trainedPqCodebook round for round
    val trainCtes = (1 to iters).map { it =>
      val prev = s"cb${it - 1}"
      s""" a$it AS (
         |  SELECT corpus_id, sub, sv, j FROM (
         |   SELECT c.corpus_id, c.sub, c.sv, cb.j, ROW_NUMBER() OVER (
         |     PARTITION BY c.corpus_id, c.sub
         |     ORDER BY ${l2sqSql("c.sv", "cb.cvec")} ASC, cb.j ASC) AS rn
         |   FROM csub c JOIN $prev cb ON cb.sub = c.sub) WHERE rn = 1),
         | s$it AS (
         |  SELECT a.sub, a.j, r.i,
         |   CAST(SUM(CAST(round(a.sv[r.i] * 1e9) AS BIGINT)) AS DOUBLE)
         |     / COUNT(a.sv[r.i]) / 1e9 AS mv
         |  FROM a$it a CROSS JOIN range(1, ${dsub + 1}) r(i)
         |  GROUP BY a.sub, a.j, r.i
         |  HAVING COUNT(a.sv[r.i]) > 0),
         | cb$it AS (
         |  SELECT j, sub, list(mv ORDER BY i) AS cvec FROM s$it GROUP BY j, sub
         |  UNION ALL
         |  SELECT p.j, p.sub, p.cvec FROM $prev p
         |  WHERE NOT EXISTS (
         |   SELECT 1 FROM s$it s WHERE s.sub = p.sub AND s.j = p.j)),""".stripMargin
    }.mkString("\n")
    val cbFin = s"cb$iters"
    s"""WITH pref AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  ORDER BY vec_id LIMIT $cbSize),
       | jmap AS (
       |  SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS j
       |  FROM pref),
       | cb0 AS (
       |  SELECT jm.j, t.i AS sub, list_slice(p.v, t.i * $dsub + 1, t.i * $dsub + $dsub) AS cvec
       |  FROM pref p JOIN jmap jm USING (vec_id)
       |  CROSS JOIN (SELECT unnest(range(0, $m)) AS i) t
       |  WHERE p.v IS NOT NULL),
       | csub AS (
       |  SELECT e.vec_id AS corpus_id, t.i AS sub,
       |   list_slice(e.v, t.i * $dsub + 1, t.i * $dsub + $dsub) AS sv
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |        WHERE embedding IS NOT NULL) e
       |  CROSS JOIN (SELECT unnest(range(0, $m)) AS i) t),
       |$trainCtes
       | codes AS (
       |  SELECT corpus_id, sub, j FROM (
       |   SELECT c.corpus_id, c.sub, cb.j, ROW_NUMBER() OVER (
       |     PARTITION BY c.corpus_id, c.sub
       |     ORDER BY ${l2sqSql("c.sv", "cb.cvec")} ASC, cb.j ASC) AS rn
       |   FROM csub c JOIN $cbFin cb ON cb.sub = c.sub) WHERE rn = 1),
       | qsub AS (
       |  SELECT q.vec_id AS query_id, t.i AS sub,
       |   list_slice(q.v, t.i * $dsub + 1, t.i * $dsub + $dsub) AS qsv
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |        WHERE vec_id < 5 AND embedding IS NOT NULL) q
       |  CROSS JOIN (SELECT unnest(range(0, $m)) AS i) t),
       | qlut AS (
       |  SELECT qs.query_id, qs.sub, cb.j,
       |   CAST(ROUND((${l2sqSql("qs.qsv", "cb.cvec")}) * 1000000000.0) AS BIGINT) AS pd
       |  FROM qsub qs JOIN $cbFin cb ON cb.sub = qs.sub),
       | approx AS (
       |  SELECT ql.query_id, co.corpus_id,
       |   CASE WHEN COUNT(*) = COUNT(ql.pd) THEN SUM(ql.pd) END AS adist
       |  FROM codes co JOIN qlut ql ON ql.sub = co.sub AND ql.j = co.j
       |  WHERE co.corpus_id <> ql.query_id
       |  GROUP BY 1, 2),
       | cands AS (
       |  SELECT query_id, corpus_id FROM (
       |   SELECT query_id, corpus_id, ROW_NUMBER() OVER (
       |     PARTITION BY query_id ORDER BY adist ASC, corpus_id ASC) AS rn
       |   FROM approx) WHERE rn <= $rerank),
       | exact AS (
       |  SELECT ca.query_id, ca.corpus_id,
       |   ${cosineSql("q.qv", "e.cv")} AS cosine
       |  FROM cands ca
       |   JOIN (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings) e
       |     ON e.vec_id = ca.corpus_id
       |   JOIN (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |         FROM embeddings WHERE vec_id < 5) q
       |     ON q.query_id = ca.query_id)
       |SELECT query_id, corpus_id, ROUND(cosine, 6) AS cosine, rank
       |FROM (
       | SELECT query_id, corpus_id, cosine, ROW_NUMBER() OVER (
       |   PARTITION BY query_id ORDER BY cosine DESC, corpus_id ASC) AS rank
       | FROM exact)
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** Replays the composed IVF-PQ pipeline: prefix coarse cells + prefix
    * sub-codebooks, corpus cell assignment and PQ encode, query probes,
    * nano ADC restricted to probed cells, exact cosine rerank.
    */
  private def ivfPqTopkOracle(nCells: Int = 16, nProbe: Int = 4, m: Int = 8,
      dsub: Int = 8, cbSize: Int = 16, rerank: Int = 40, k: Int = 10): String =
    s"""WITH pref AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  ORDER BY vec_id LIMIT $cbSize),
       | jmap AS (
       |  SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS j
       |  FROM pref),
       | cb AS (
       |  SELECT jm.j, t.i AS sub, list_slice(p.v, t.i * $dsub + 1, t.i * $dsub + $dsub) AS cvec
       |  FROM pref p JOIN jmap jm USING (vec_id)
       |  CROSS JOIN (SELECT unnest(range(0, $m)) AS i) t
       |  WHERE p.v IS NOT NULL),
       | cents AS (
       |  SELECT vec_id AS cent_id, embedding::DOUBLE[] AS centv
       |  FROM embeddings ORDER BY vec_id LIMIT $nCells),
       | corpus AS (
       |  SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS cv FROM embeddings
       |  WHERE embedding IS NOT NULL),
       | cassign AS (
       |  SELECT corpus_id, cell FROM (
       |   SELECT c.corpus_id, ct.cent_id AS cell, ROW_NUMBER() OVER (
       |     PARTITION BY c.corpus_id
       |     ORDER BY ${distSql("c.cv", "ct.centv")} ASC, ct.cent_id ASC) AS rn
       |   FROM corpus c CROSS JOIN cents ct) WHERE rn = 1),
       | csub AS (
       |  SELECT c.corpus_id, t.i AS sub,
       |   list_slice(c.cv, t.i * $dsub + 1, t.i * $dsub + $dsub) AS sv
       |  FROM corpus c
       |  CROSS JOIN (SELECT unnest(range(0, $m)) AS i) t),
       | codes AS (
       |  SELECT corpus_id, sub, j FROM (
       |   SELECT c.corpus_id, c.sub, cb.j, ROW_NUMBER() OVER (
       |     PARTITION BY c.corpus_id, c.sub
       |     ORDER BY ${l2sqSql("c.sv", "cb.cvec")} ASC, cb.j ASC) AS rn
       |   FROM csub c JOIN cb ON cb.sub = c.sub) WHERE rn = 1),
       | q AS (
       |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings
       |  WHERE vec_id < 5 AND embedding IS NOT NULL),
       | qprobe AS (
       |  SELECT query_id, cell FROM (
       |   SELECT q.query_id, ct.cent_id AS cell, ROW_NUMBER() OVER (
       |     PARTITION BY q.query_id
       |     ORDER BY ${distSql("q.qv", "ct.centv")} ASC, ct.cent_id ASC) AS rn
       |   FROM q CROSS JOIN cents ct) WHERE rn <= $nProbe),
       | qsub AS (
       |  SELECT q.query_id, t.i AS sub,
       |   list_slice(q.qv, t.i * $dsub + 1, t.i * $dsub + $dsub) AS qsv
       |  FROM q CROSS JOIN (SELECT unnest(range(0, $m)) AS i) t),
       | qlut AS (
       |  SELECT qs.query_id, qs.sub, cb.j,
       |   CAST(ROUND((${l2sqSql("qs.qsv", "cb.cvec")}) * 1000000000.0) AS BIGINT) AS pd
       |  FROM qsub qs JOIN cb ON cb.sub = qs.sub),
       | approx AS (
       |  SELECT ql.query_id, co.corpus_id,
       |   CASE WHEN COUNT(*) = COUNT(ql.pd) THEN SUM(ql.pd) END AS adist
       |  FROM codes co
       |   JOIN cassign ca ON ca.corpus_id = co.corpus_id
       |   JOIN qprobe qp ON qp.cell = ca.cell
       |   JOIN qlut ql ON ql.sub = co.sub AND ql.j = co.j
       |     AND ql.query_id = qp.query_id
       |  WHERE co.corpus_id <> qp.query_id
       |  GROUP BY 1, 2),
       | cands AS (
       |  SELECT query_id, corpus_id FROM (
       |   SELECT query_id, corpus_id, ROW_NUMBER() OVER (
       |     PARTITION BY query_id ORDER BY adist ASC, corpus_id ASC) AS rn
       |   FROM approx) WHERE rn <= $rerank),
       | exact AS (
       |  SELECT ca.query_id, ca.corpus_id,
       |   ${cosineSql("q.qv", "e.cv")} AS cosine
       |  FROM cands ca
       |   JOIN (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings) e
       |     ON e.vec_id = ca.corpus_id
       |   JOIN (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |         FROM embeddings WHERE vec_id < 5) q
       |     ON q.query_id = ca.query_id)
       |SELECT query_id, corpus_id, ROUND(cosine, 6) AS cosine, rank
       |FROM (
       | SELECT query_id, corpus_id, cosine, ROW_NUMBER() OVER (
       |   PARTITION BY query_id ORDER BY cosine DESC, corpus_id ASC) AS rank
       | FROM exact)
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  private def lshTopkOracle: String = {
    val bucketC = lshBucketSql("cv", 4, 64)
    val bucketQ = lshBucketSql("qv", 4, 64)
    s"""WITH c AS (
       |  SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS cv FROM embeddings),
       | cb AS (SELECT corpus_id, cv, $bucketC AS bucket FROM c),
       | q AS (
       |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |  FROM embeddings WHERE vec_id < 5),
       | qb AS (SELECT query_id, qv, $bucketQ AS qbucket FROM q),
       | qp AS (
       |  SELECT query_id, qv, xor(qbucket, f.f) AS bucket
       |  FROM qb, (SELECT unnest([0, 1, 2]) AS f) f),
       | scored AS (
       |  SELECT qp.query_id, cb.corpus_id,
       |   ${cosineSql("qp.qv", "cb.cv")} AS cosine
       |  FROM cb JOIN qp ON cb.bucket = qp.bucket
       |  WHERE cb.corpus_id <> qp.query_id)
       |SELECT query_id, corpus_id, ROUND(cosine, 6) AS cosine, rank
       |FROM (
       |  SELECT query_id, corpus_id, cosine,
       |   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id ASC) AS rank
       |  FROM scored)
       |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  private def embeddingNearDupOracle: String = {
    // two bands = two seeded bucket tables; candidate = collision in ANY
    // band, verified once (DISTINCT before the cosine join), mirroring
    // Dedup.embeddingNearDups(bits = 8, bands = 2)
    val bucket0 = lshBucketSql("v", 8, 64, seed = 7)
    val bucket1 = lshBucketSql("v", 8, 64, seed = 8)
    s"""WITH e AS (
       |  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
       | eb AS (
       |  SELECT id, 0 AS band, $bucket0 AS bucket FROM e
       |  UNION ALL
       |  SELECT id, 1 AS band, $bucket1 AS bucket FROM e),
       | cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM eb a JOIN eb b ON a.band = b.band AND a.bucket = b.bucket
       |   AND a.id < b.id),
       | pairs AS (
       |  SELECT id_a, id_b,
       |   ${cosineSql("x.v", "y.v")} AS cosine
       |  FROM cand JOIN e x ON x.id = cand.id_a JOIN e y ON y.id = cand.id_b)
       |SELECT id_a, id_b, ROUND(cosine, 6) AS cosine
       |FROM pairs WHERE cosine >= 0.2 ORDER BY id_a, id_b""".stripMargin
  }

  private def textLangSummaryOracle: String = {
    // reuse the profile as a subquery
    s"""WITH profile AS (${textProfileOracle.replace("ORDER BY doc_id", "")})
       |SELECT lang_pred, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       | CAST(SUM(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_quality
       |FROM profile GROUP BY lang_pred ORDER BY lang_pred""".stripMargin
  }

  /** Cohen's kappa between the declared `lang` tag and the profile
    * chain's `lang_pred`: exact integer agreement and marginal-product
    * counts; the double divisions (po, pe, kappa) mirror the engine's
    * op order exactly, so even the floats replay bit-for-bit.
    */
  private def labelAgreementOracle: String =
    s"""WITH profile AS (${textProfileOracle.replace("ORDER BY doc_id", "")}),
       |pairs AS (
       | SELECT COALESCE(d.lang, '~') AS a, p.lang_pred AS b
       | FROM documents d JOIN profile p USING (doc_id)),
       |tot AS (
       | SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
       |  CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
       | FROM pairs),
       |ra AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS na FROM pairs GROUP BY a),
       |cb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS nb FROM pairs GROUP BY b),
       |num AS (
       | SELECT CAST(COALESCE(SUM(na * nb), 0) AS BIGINT) AS pe_num
       | FROM ra JOIN cb ON ra.a = cb.b)
       |SELECT t.n_total, t.n_agree,
       | CAST(t.n_agree AS DOUBLE) / t.n_total AS po,
       | CAST(n.pe_num AS DOUBLE) / t.n_total / t.n_total AS pe,
       | ((CAST(t.n_agree AS DOUBLE) / t.n_total)
       |   - (CAST(n.pe_num AS DOUBLE) / t.n_total / t.n_total))
       |  / (1.0 - (CAST(n.pe_num AS DOUBLE) / t.n_total / t.n_total)) AS kappa
       |FROM tot t CROSS JOIN num n""".stripMargin
}
