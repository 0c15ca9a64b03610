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

/** Stream slice of the SparkEntry corpus (see SparkEntry's scaladoc for the cross-engine
  * determinism rules every entry follows). Bodies moved verbatim from the
  * round-6 SparkEntry map literals; shared helpers live on SparkEntry
  * (private[graft]).
  */
private[graft] trait QueriesStream { this: SparkEntry.type =>

  protected def streamQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

    // Structured Streaming SESSION windows: the native session_window
    // operator merges per-user events within an 8h gap as the stream
    // runs — bounded per-key session state instead of the batch window
    // sort. Run in complete mode under AvailableNow (append would hold
    // back sessions the final watermark hasn't passed — with a finite
    // file that's every trailing session). The strict oracle is the
    // SAME gaps-and-islands SQL as ts_sessionize; the shared rule is
    // session_window's INCLUSIVE boundary (events exactly gap apart DO
    // merge — pinned by the StreamingSpec boundary test). Bounds are
    // emitted as epoch micros (no ts-to-string
    // formatting in the compare); session end = last event + gap on
    // both engines.
    "stream_session_windows" -> ((s, d) => {
      Graft.tune(s)
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val ev = graft.streaming.StreamingIngest
        .parquetStream(s, d, schema, globFilter = Some("events.parquet"))
        .transform(Graft.tsToNanos)
        .withColumn("ts_ts", Graft.nanosToTimestamp("ts"))
        .where(col("user_id").isNotNull && col("ts").isNotNull)
      val agg = ev
        .groupBy(session_window(col("ts_ts"), "8 hours"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      graft.streaming.StreamingIngest
        .runAvailableNow(s, agg, "stream_session_mem")
        .select(col("user_id"),
          expr("unix_micros(session_window.start)").as("session_start_us"),
          expr("unix_micros(session_window.end)").as("session_end_us"),
          col("n_events"))
        .orderBy("user_id", "session_start_us")
    }),

    // Session windows in APPEND + WATERMARK mode — the PRODUCTION mode a
    // 100 TB unbounded stream runs (stream_session_windows keeps the
    // COMPLETE form as the finite-file fallback: append emits a session
    // only once the watermark passes its end, and a finite file's final
    // watermark never passes the trailing sessions — the holdback is
    // pinned both ways by StreamingSpec). To run the production mode on
    // a finite fixture, the harness appends one EPILOGUE event (sentinel
    // user -1) past max(ts) + gap + watermark delay: the final no-data
    // micro-batch advances the watermark past every real session's end,
    // append emits them ALL, and the only held-back session is the
    // sentinel's own (excluded from the frame). The strict oracle is the
    // SAME gaps-and-islands SQL as stream_session_windows — append must
    // produce exactly the rows the batch twin computes.
    "stream_session_windows_append" -> ((s, d) => {
      Graft.tune(s)
      val gapUs = 8L * 3600 * 1000000L
      val delayUs = 2L * 3600 * 1000000L
      val ev0 = Graft.tsToNanos(s.read.parquet(s"$d/events.parquet"))
        .where(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), Graft.nanosToTimestamp("ts").as("ts_ts"))
      // driver-side scalar: the single max timestamp (bounded collect);
      // an empty fixture has no max — any epilogue ts works, the result
      // is empty either way (the null-unboxing NPE was the real hazard).
      val maxUs = Option(ev0.agg(max(expr("unix_micros(ts_ts)"))).head.get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      val epilogueUs = maxUs + gapUs + delayUs + 3600L * 1000000L
      val stage = java.nio.file.Files
        .createTempDirectory("graft_sess_append").toString
      try {
        ev0.unionByName(
            s.range(1).select(lit(-1L).as("user_id"),
              expr(s"timestamp_micros(${epilogueUs}L)").as("ts_ts")))
          .write.mode("overwrite").parquet(stage)
        val schema = s.read.parquet(stage).schema
        val agg = graft.streaming.StreamingIngest.parquetStream(s, stage, schema)
          .withWatermark("ts_ts", "2 hours")
          .groupBy(session_window(col("ts_ts"), "8 hours"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
        graft.streaming.StreamingIngest
          .runAvailableNow(s, agg, "stream_session_append_mem",
            outputMode = "append")
          .where(col("user_id") >= 0)
          .select(col("user_id"),
            expr("unix_micros(session_window.start)").as("session_start_us"),
            expr("unix_micros(session_window.end)").as("session_end_us"),
            col("n_events"))
          .orderBy("user_id", "session_start_us")
      } finally
        // safe to delete: runAvailableNow fully drained the file stream
        // into the memory sink, nothing lazy still reads the stage
        deleteStaging(stage)
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

    // Streaming Holt linear-trend smoothing (transformWithState; O(1)
    // state per key — high-water mark + level/trend/count): the
    // unbounded-history twin of ts_holt. With the whole file as one
    // batch the emitted series equals the batch operator exactly (same
    // in-batch (ord, tie) sort, same truncating halvings), so the
    // recursive-CTE oracle is shared verbatim; order-aligned-split
    // independence is spec'd in StreamingSpec.
    "stream_holt" -> ((s, d) => {
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
          .where(col("ts").isNotNull && col("event_id").isNotNull &&
            col("value").isNotNull && col("event_type").isNotNull)
          .select(col("event_type").as("k"),
            expr("ts DIV 1000").as("ord"), col("event_id").as("tie"),
            expr("CAST(round(value * 1e9) AS BIGINT)").as("y_nano"))
          .as[(String, Long, Long, Long)]
        val sm = graft.streaming.HoltStream.holtStream(ev, maxPoints = 500)
          .toDF("k", "rn", "y_nano", "l_nano", "b_nano", "fc_nano")
        graft.streaming.StreamingIngest
          .runAvailableNow(s, sm, "stream_holt_mem", outputMode = "append")
          .orderBy("k", "rn")
      } finally {
        prev match {
          case Some(p) => s.conf.set(
            "spark.sql.streaming.stateStore.providerClass", p)
          case None => s.conf.unset(
            "spark.sql.streaming.stateStore.providerClass")
        }
      }
    }),

    // Streaming per-key distinct-cardinality tracking via the KMV
    // sketch (transformWithState; state = at most 64 longs + a counter
    // per key). Arrival-order AND batch-split independent by
    // construction — the kept set is a pure function of the value SET —
    // so the oracle is the batch ranked-distinct replay; with one file
    // as one batch, exactly one snapshot row per key emits.
    "stream_kmv_distinct" -> ((s, d) => {
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
          .where(col("user_id").isNotNull)
          .select(col("event_type"),
            graft.functions.StableHash.hash60(col("user_id").cast("string"))
              .as("h"))
          .as[(String, Long)]
        val sk = graft.streaming.KmvStream.kmvStream(ev, k = 64)
          .toDF("k", "n_seen", "n_kept", "kth_min", "est_users")
        graft.streaming.StreamingIngest
          .runAvailableNow(s, sk, "stream_kmv_mem", outputMode = "append")
          .orderBy("k")
      } finally {
        prev match {
          case Some(p) => s.conf.set(
            "spark.sql.streaming.stateStore.providerClass", p)
          case None => s.conf.unset(
            "spark.sql.streaming.stateStore.providerClass")
        }
      }
    }),

    // Streaming pairwise content overlap: per-source 3-shingle KMV
    // sketches tracked with transformWithState (KmvSketchProcessor —
    // state ≤ 256 longs + a counter per source), final snapshot per key
    // taken by max n_seen (strictly monotone; with one file as one batch
    // it's the only row, and by split independence the kept set equals
    // the batch sketch under ANY batching), then the Beyer set-algebra
    // estimators from the sketches alone (Sketches.kmvSetOps). The
    // cross-shard overlap probe as a STANDING query: per-shard state
    // never exceeds k longs, and the pair frame joins sketches, never
    // data. Oracle = the batch replay (SparkEntry.kmvSetopsOracle),
    // shared with sketch_kmv_setops.
    "stream_kmv_setops" -> ((s, d) => {
      Graft.tune(s)
      val prev = s.conf.getOption(
        "spark.sql.streaming.stateStore.providerClass")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        import s.implicits._
        val schema = s.read.parquet(s"$d/documents.parquet").schema
        val sh = graft.streaming.StreamingIngest
          .parquetStream(s, d, schema, globFilter = Some("documents.parquet"))
          .where(col("text").isNotNull && trim(col("text")) =!= "")
          .select(col("source"),
            explode(Text.wordShingles(col("text"), 3)).as("sh"))
          .select(col("source"), StableHash.hash60(col("sh")).as("h"))
          .as[(String, Long)]
        val snaps = graft.streaming.KmvStream.kmvSketchStream(sh, k = 256)
          .toDF("source", "n_seen", "mins")
        val run = graft.streaming.StreamingIngest
          .runAvailableNow(s, snaps, "stream_kmv_setops_mem",
            outputMode = "append")
        // latest snapshot per key = max n_seen (strictly monotone); one
        // struct-max aggregate, no self-join on the memory-sink frame
        val latest = run
          .groupBy("source")
          .agg(max(struct(col("n_seen"), col("mins"))).as("__m"))
          .select(col("source"), col("__m.mins").as("mins"))
        Sketches.kmvSetOps(latest, "source", "mins", 256)
          .withColumnRenamed("key_a", "source_a")
          .withColumnRenamed("key_b", "source_b")
          .orderBy("source_a", "source_b")
      } finally {
        prev match {
          case Some(p) => s.conf.set(
            "spark.sql.streaming.stateStore.providerClass", p)
          case None => s.conf.unset(
            "spark.sql.streaming.stateStore.providerClass")
        }
      }
    }),

    // Streaming per-source token-frequency tracking via count-min
    // (transformWithState; fixed 3×512 Long counters + a seen-count
    // per source). Like stream_kmv the counters are additive, so
    // arrival-order and split independence hold by construction and
    // the oracle is the batch cell-addressing replay grouped by
    // source; each (source, probe-word) pair emits one snapshot row
    // with the whole file as one batch.
    "stream_cms_freq" -> ((s, d) => {
      Graft.tune(s)
      val prev = s.conf.getOption(
        "spark.sql.streaming.stateStore.providerClass")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        import s.implicits._
        val probes = CmsProbeWords.map { wd =>
          (wd, graft.plans.Hash60.hashUTF8(
            org.apache.spark.unsafe.types.UTF8String.fromString(wd)) %
            graft.ops.Dedup.MinhashP)
        }.toArray
        val schema = s.read.parquet(s"$d/documents.parquet").schema
        val toks = graft.streaming.StreamingIngest
          .parquetStream(s, d, schema,
            globFilter = Some("documents.parquet"))
          .where(col("source").isNotNull)
          .select(col("source"),
            explode(graft.functions.Text.tokens(col("text"))).as("w"))
          .where(col("w") =!= "")
          .select(col("source"),
            pmod(StableHash.hash60(col("w")),
              lit(graft.ops.Dedup.MinhashP)).as("h"))
          .as[(String, Long)]
        val sk = graft.streaming.CmsStream
          .cmsStream(toks, depth = 3, width = 512, probes)
          .toDF("source", "n_seen", "word", "est_count")
        graft.streaming.StreamingIngest
          .runAvailableNow(s, sk, "stream_cms_mem", outputMode = "append")
          .orderBy("source", "word")
      } finally {
        prev match {
          case Some(p) => s.conf.set(
            "spark.sql.streaming.stateStore.providerClass", p)
          case None => s.conf.unset(
            "spark.sql.streaming.stateStore.providerClass")
        }
      }
    }),

    // Streaming CCNet segment dedup: the boilerplate DETECTOR runs on the
    // document stream (4 files, one per micro-batch) with bounded per-key
    // state — a capped distinct-doc-id set that collapses to an O(1) hot
    // flag the moment a segment's distinct-doc count crosses 25 — and
    // emits each corpus-frequent segment key exactly once; the batch side
    // then drops hot segments and reassembles survivors in document
    // order. The emitted hot-key SET is arrival-order independent (a
    // distinct count doesn't depend on arrival order), so the result
    // equals batch dedup_segments exactly and shares its oracle;
    // batch-boundary independence is spec'd in StreamingSpec.
    "stream_dedup_segments" -> ((s, d) => {
      Graft.tune(s)
      val prev = s.conf.getOption(
        "spark.sql.streaming.stateStore.providerClass")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val root = java.nio.file.Files
        .createTempDirectory("graft_stream_seg_").toString
      try {
        import s.implicits._
        val docs = t(s, d, "documents")
        docs.select(col("doc_id").cast("long").as("doc_id"), col("text"))
          .repartition(4).write.mode("overwrite").parquet(root)
        val schema = s.read.parquet(root).schema
        val segStream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(root)
          .select(col("doc_id"),
            explode(split(col("text"),
              java.util.regex.Pattern.quote(" table "))).as("seg"))
          .select(trim(col("seg")).as("k"), col("doc_id"))
          .where(col("k") =!= "")
          .as[(String, Long)]
        val hot = graft.streaming.StreamingIngest.runAvailableNow(
          s, graft.streaming.HotSegments.hotKeys(segStream, 25L).toDF("k"),
          "stream_seg_mem", outputMode = "append")
        graft.streaming.HotSegments.applyHotFilter(
          docs, hot, "text", "doc_id", " table ")
          .orderBy("doc_id")
      } finally {
        prev match {
          case Some(p) => s.conf.set(
            "spark.sql.streaming.stateStore.providerClass", p)
          case None => s.conf.unset(
            "spark.sql.streaming.stateStore.providerClass")
        }
        // the file stream fully drained into the memory sink; the
        // returned frame reads docs + the memory table, never root
        deleteStaging(root)
      }
    }),

    // Streaming corpus-curation composite: the map-side Gopher gate
    // (TextAnalysis.qualityGateMapSide — a stateless projection, so it
    // composes into the append chain where the relational gate's
    // mid-stream groupBys could not) feeding the per-source admission
    // cap (CapPerKey on transformWithState, O(1) counter state per
    // key) — "gate the crawl, cap any one domain's share" in one pass.
    // WHICH docs are admitted is arrival-order dependent, but the
    // per-source admitted COUNT is min(cap, eligible) regardless of
    // order, so the strict oracle checks eligible/admitted/dropped
    // counts per source (cap 5 < most sources' eligible count at every
    // SF — the cap genuinely drops rows). The batch side of the
    // eligible count runs the RELATIONAL gate, so this entry also
    // cross-checks the two gate forms end-to-end: a flag mismatch
    // would surface as n_dropped <> n_eligible - n_admitted.
    "stream_quality_cap" -> ((s, d) => {
      Graft.tune(s)
      val prev = s.conf.getOption(
        "spark.sql.streaming.stateStore.providerClass")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        import s.implicits._
        val schema = s.read.parquet(s"$d/documents.parquet").schema
        val docs = graft.streaming.StreamingIngest
          .parquetStream(s, d, schema, globFilter = Some("documents.parquet"))
        val gated = TextAnalysis.qualityGateMapSide(docs,
          minTokens = 30, maxTokens = 80, maxPunctRatio = 0.2,
          minStopwordRatio = 0.05, maxDupLineFrac = 0.3,
          maxTopBigramFrac = 0.05)
          .where(col("keep"))
          .select(col("source"), col("doc_id").cast("long").as("doc_id"))
          .as[(String, Long)]
        val capped = graft.streaming.CapPerKey
          .capPerKey[String, (String, Long)](gated, _._1, maxPerKey = 5L)
        val admitted = graft.streaming.StreamingIngest
          .runAvailableNow(s, capped.toDF("source", "doc_id"),
            "stream_quality_cap_mem", outputMode = "append")
          .groupBy("source").agg(count(lit(1)).as("n_admitted"))
        val eligible = TextAnalysis.qualityGate(t(s, d, "documents"),
          minTokens = 30, maxTokens = 80, maxPunctRatio = 0.2,
          minStopwordRatio = 0.05, maxDupLineFrac = 0.3,
          maxTopBigramFrac = 0.05)
          .where(col("keep"))
          .join(t(s, d, "documents").select("doc_id", "source"),
            Seq("doc_id"))
          .groupBy("source").agg(count(lit(1)).as("n_eligible"))
        eligible.join(admitted, Seq("source"))
          .select(col("source"), col("n_eligible"), col("n_admitted"),
            (col("n_eligible") - col("n_admitted")).as("n_dropped"))
          .orderBy("source")
      } finally {
        prev match {
          case Some(p) => s.conf.set(
            "spark.sql.streaming.stateStore.providerClass", p)
          case None => s.conf.unset(
            "spark.sql.streaming.stateStore.providerClass")
        }
      }
    })
  )

  protected def streamOracles: Map[String, String] = Map(

    // The streamed hot-key set is arrival-order independent, so the
    // streaming pipeline computes exactly the batch rule.
    "stream_dedup_segments" -> segmentDedupOracleSql,

    // Gate flags replayed by the shared qualityGate CTE chain; the cap
    // is order-independent at the COUNT level: admitted = LEAST(cap,
    // eligible) per source whatever the arrival order.
    "stream_quality_cap" ->
      s"""WITH gate AS (
         |${qualityGateOracle(minTokens = 30, maxTokens = 80,
             maxPunct = 0.2, minStop = 0.05, maxDupLine = 0.3,
             maxTopBigram = 0.05, ordered = false)}
         |), elig AS (
         | SELECT d.source, COUNT(*) AS n_eligible
         | FROM gate g JOIN documents d USING (doc_id)
         | WHERE g.keep GROUP BY d.source)
         |SELECT source, n_eligible,
         | LEAST(5, n_eligible) AS n_admitted,
         | n_eligible - LEAST(5, n_eligible) AS n_dropped
         |FROM elig ORDER BY source""".stripMargin,

    "stream_bloom_new_docs" ->
      """SELECT DISTINCT md5(i.text) AS digest FROM documents i
        |WHERE i.doc_id >= 250 AND NOT EXISTS (
        |  SELECT 1 FROM documents s
        |  WHERE s.doc_id < 250 AND md5(s.text) = md5(i.text))
        |ORDER BY digest""".stripMargin,
    "stream_funnel_user_steps" -> funnelUserStepsSql,

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

    // The batch ts_holt oracle verbatim: one file = one micro-batch, so
    // the streamed series is contractually identical (QueriesStream
    // entry comment; split independence spec'd in StreamingSpec).
    "stream_holt" -> holtOracleSql,

    // Batch cell-addressing replay of the streamed CMS snapshots,
    // grouped by source (additive counters are order/split
    // independent); n_seen counts every folded token hash.
    "stream_cms_freq" -> {
      val p = Dedup.MinhashP
      val coefRows = (0 until 3).map { j =>
        val (a, b) = Dedup.minhashCoeffs(j)
        s"($j, ${a}::BIGINT, ${b}::BIGINT)"
      }.mkString(", ")
      val probeRows = CmsProbeWords.map(w => s"('$w')").mkString(", ")
      s"""WITH toks AS (
         | SELECT source, w FROM (
         |  SELECT source,
         |   unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
         |  FROM documents
         |  WHERE source IS NOT NULL AND trim(text) <> '') WHERE w <> ''),
         |hashed AS (SELECT source, ${hash60Sql("w")} % $p AS h FROM toks),
         |coef(i, a, b) AS (VALUES $coefRows),
         |cells AS (
         | SELECT source, c.i, ((c.a * h.h + c.b) % $p) % 512 AS j,
         |  COUNT(*) AS cnt
         | FROM hashed h CROSS JOIN coef c GROUP BY 1, 2, 3),
         |probes(word) AS (VALUES $probeRows),
         |pcells AS (
         | SELECT p.word, c.i,
         |  ((c.a * (${hash60Sql("p.word")} % $p) + c.b) % $p) % 512 AS j
         | FROM probes p CROSS JOIN coef c),
         |srcs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_seen
         |         FROM hashed GROUP BY 1),
         |est AS (
         | SELECT s.source, pc.word,
         |  MIN(COALESCE(cl.cnt, 0)) AS est
         | FROM srcs s CROSS JOIN pcells pc
         | LEFT JOIN cells cl
         |  ON cl.source = s.source AND cl.i = pc.i AND cl.j = pc.j
         | GROUP BY 1, 2)
         |SELECT e.source, s.n_seen, e.word,
         | CAST(e.est AS BIGINT) AS est_count
         |FROM est e JOIN srcs s USING (source)
         |ORDER BY e.source, e.word""".stripMargin
    },

    // Batch ranked-distinct replay of the streamed KMV snapshot (the
    // kept set is order/split independent, so the batch form IS the
    // final state); n_seen counts every non-null input row.
    "stream_kmv_distinct" -> {
      val h = hash60Sql("CAST(user_id AS VARCHAR)")
      s"""WITH hs AS (
         | SELECT event_type, $h AS h
         | FROM events WHERE user_id IS NOT NULL),
         |hd AS (SELECT DISTINCT event_type, h FROM hs),
         |r AS (
         | SELECT event_type, h,
         |  row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         | FROM hd),
         |kept AS (
         | SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |  CAST(MAX(h) AS BIGINT) AS kth_min
         | FROM r WHERE rn <= 64 GROUP BY 1),
         |seen AS (
         | SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_seen
         | FROM hs GROUP BY 1)
         |SELECT k.event_type AS k, s.n_seen, k.n_kept, k.kth_min,
         | CASE WHEN k.n_kept < 64 THEN k.n_kept
         |      WHEN k.kth_min = 0 THEN 0
         |      ELSE CAST(CAST(63 AS HUGEINT) * 1152921504606846976
         |             // k.kth_min AS BIGINT) END AS est_users
         |FROM kept k JOIN seen s USING (event_type)
         |ORDER BY k""".stripMargin
    },

    "stream_window_counts" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start,
        | event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    // Streaming KMV set algebra: identical replay to the batch twin —
    // split independence makes the streamed final snapshots equal the
    // batch sketches, so one oracle serves both.
    "stream_kmv_setops" -> kmvSetopsOracle,

    // Append-mode session windows: the SAME replay as
    // stream_session_windows — the epilogue discipline makes append
    // emit exactly the batch result (sentinel user excluded engine-side,
    // and its session is the held-back one anyway).
    "stream_session_windows_append" ->
      """WITH e AS (
        | SELECT user_id, epoch_us(ts) AS us FROM events
        | WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |x AS (
        | SELECT user_id, us,
        |  CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
        |        <= 28800000000 THEN 0 ELSE 1 END AS brk
        | FROM e),
        |g AS (
        | SELECT user_id, us,
        |  SUM(brk) OVER (PARTITION BY user_id ORDER BY us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        | FROM x)
        |SELECT user_id,
        | CAST(MIN(us) AS BIGINT) AS session_start_us,
        | CAST(MAX(us) + 28800000000 AS BIGINT) AS session_end_us,
        | CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,

    // Same gaps-and-islands replay as ts_sessionize — one oracle shape
    // for the batch window form and the native session_window operator
    // (inclusive merge at == gap, session_window's boundary).
    "stream_session_windows" ->
      """WITH e AS (
        | SELECT user_id, epoch_us(ts) AS us FROM events
        | WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |x AS (
        | SELECT user_id, us,
        |  CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
        |        <= 28800000000 THEN 0 ELSE 1 END AS brk
        | FROM e),
        |g AS (
        | SELECT user_id, us,
        |  SUM(brk) OVER (PARTITION BY user_id ORDER BY us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        | FROM x)
        |SELECT user_id,
        | CAST(MIN(us) AS BIGINT) AS session_start_us,
        | CAST(MAX(us) + 28800000000 AS BIGINT) AS session_end_us,
        | CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,

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

    // Dedup of the doubled stream == the original events (unique ids,
    // byte-identical copies), so the oracle profiles the source directly.
    "stream_dedup_counts" ->
      """SELECT event_type,
        | COUNT(*) AS n_events,
        | COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
