package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.streaming.StreamingIngest

/** Structured Streaming paths driven synchronously with AvailableNow. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val eventsDir: String = {
    val d = Files.createTempDirectory("graft_stream").toString
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:20:00"), "click", 2.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 11:10:00"), "view", 5.0),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 11:40:00"), "click", 3.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:06:00"), "click", 99.0) // dup id
    ).toDF("event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(d)
    d
  }

  test("windowed streaming aggregation equals the batch equivalent") {
    val schema = spark.read.parquet(eventsDir).schema
    val stream = StreamingIngest.parquetStream(spark, eventsDir, schema)
    val agg = StreamingIngest.windowedEventCounts(stream, "1 hour", "2 hours")
    val out = StreamingIngest.runAvailableNow(spark, agg, "win_test")
      .orderBy("window_start", "event_type").collect()
    assert(out.map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      .toSeq == Seq(
      ("2024-01-01 10:00:00.0", "click", 3L),
      ("2024-01-01 11:00:00.0", "click", 1L),
      ("2024-01-01 11:00:00.0", "view", 1L)))
    val clicks10 = out.head
    assert(clicks10.getDouble(3) == 1.0 + 2.0 + 99.0)
  }

  test("stateful sessionization closes sessions at the gap, keeps bounded state") {
    import graft.ops.Sessionize
    import graft.ops.Sessionize.{SessionEvent, SessionOut}
    val gap = 60L * 1000000000L // 1 minute in nanos
    val d = Files.createTempDirectory("graft_sess").toString
    Seq(
      SessionEvent(1L, 0L), SessionEvent(1L, 10L * 1000000000L),   // session 1
      SessionEvent(1L, 200L * 1000000000L),                        // session 2
      SessionEvent(2L, 5L * 1000000000L)                           // user 2
    ).toDF().write.mode("overwrite").parquet(d)
    val schema = spark.read.parquet(d).schema
    val stream = StreamingIngest.parquetStream(spark, d, schema).as[SessionEvent]
    val out = StreamingIngest.runAvailableNow(spark,
      Sessionize.streamingSessions(spark, stream, gap).toDF(),
      "sess_test", outputMode = "append")
    // only CLOSED sessions emit (open ones wait in state): user 1 session 1
    val rows = out.as[SessionOut].collect()
    assert(rows.toSeq == Seq(SessionOut(1L, 0L, 10L * 1000000000L, 2L)))
  }

  test("native session_window pins the merge boundary: exactly-gap apart MERGES " +
    "(inclusive), gap+1us splits; equals the batch gaps-and-islands rule") {
    val gapUs = 3600L * 1000000L // 1 hour
    val d = Files.createTempDirectory("graft_sesswin").toString
    // user 1: t0, t0+gap exactly (MERGES — session_window's boundary is
    // inclusive: an event AT the current session end still extends it),
    // then +gap+1us from the second event (splits); user 2: single event
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def ts(us: Long) = new java.sql.Timestamp(t0.getTime + us / 1000)
    val evs = Seq(
      (1L, ts(0L)), (1L, ts(gapUs)), (1L, ts(2 * gapUs + 1000000L)),
      (2L, ts(500L * 1000000L)))
    evs.toDF("user_id", "ts_ts").write.mode("overwrite").parquet(d)
    val schema = spark.read.parquet(d).schema
    val stream = StreamingIngest.parquetStream(spark, d, schema)
    val agg = stream
      .groupBy(session_window(col("ts_ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val got = StreamingIngest.runAvailableNow(spark, agg, "sesswin_test")
      .select(col("user_id"), expr("unix_micros(session_window.start)"),
        expr("unix_micros(session_window.end)"), col("n_events"))
      .orderBy("user_id", "session_window.start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val base = t0.getTime * 1000L
    assert(got.toSeq == Seq(
      // session 1: first two events merge (boundary inclusive), end =
      // second event + gap; the third event is 1us past that end
      (1L, base, base + 2 * gapUs, 2L),
      (1L, base + 2 * gapUs + 1000000L, base + 3 * gapUs + 1000000L, 1L),
      (2L, base + 500L * 1000000L, base + 500L * 1000000L + gapUs, 1L)),
      s"got=${got.toSeq}")
    // batch gaps-and-islands twin (the ts_sessionize rule: brk at diff > gap)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("us")
    val batch = spark.read.parquet(d)
      .select(col("user_id"), expr("unix_micros(ts_ts)").as("us"))
      .withColumn("brk",
        when(col("us") - lag("us", 1).over(w) <= gapUs, 0L).otherwise(1L))
      .withColumn("sid", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("us").as("s"), (max("us") + gapUs).as("e"),
        count(lit(1)).as("n"))
      .select("user_id", "s", "e", "n")
      .orderBy("user_id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(batch.toSeq == got.toSeq)
  }

  test("session_window in APPEND mode holds back sessions past the final " +
    "watermark — the reason stream_session_windows runs COMPLETE") {
    val d = Files.createTempDirectory("graft_sesswm").toString
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def ts(h: Long) = new java.sql.Timestamp(t0.getTime + h * 3600000L)
    // user 1: one session closing early (ends t0+1h) and one trailing
    // session (starts t0+10h) the final watermark (max - 2h = t0+8h)
    // never passes
    Seq((1L, ts(0)), (1L, ts(10)))
      .toDF("user_id", "ts_ts").write.mode("overwrite").parquet(d)
    val schema = spark.read.parquet(d).schema
    def run(mode: String, name: String): Long = {
      val sessions = StreamingIngest.parquetStream(spark, d, schema)
        .withWatermark("ts_ts", "2 hours")
        .groupBy(session_window(col("ts_ts"), "1 hour"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      StreamingIngest.runAvailableNow(spark, sessions, name,
        outputMode = mode).count()
    }
    assert(run("append", "sesswm_append") == 1L) // trailing session held
    assert(run("complete", "sesswm_complete") == 2L) // all sessions emit
  }

  test("watermark evicts dedup state across micro-batches (bounded memory)") {
    val src = Files.createTempDirectory("graft_late_src").toString
    val ck = Files.createTempDirectory("graft_late_ck").toString
    def write(rows: Seq[(Long, String, Double)]): Unit =
      rows.toDF("event_id", "tss", "value")
        .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
        .coalesce(1).write.mode("append").parquet(src)
    write(Seq(
      (1L, "2024-01-01 10:05:00", 1.0),
      (2L, "2024-01-01 13:00:00", 2.0))) // watermark after batch: 11:00 (2h)
    val out = Files.createTempDirectory("graft_late_out").toString + "/t"
    val schema = spark.read.parquet(src).schema
    // memory sink cannot recover a checkpoint; the parquet sink can
    def runOnce(): Unit = {
      val q = StreamingIngest.dedupStream(
        StreamingIngest.parquetStream(spark, src, schema), Seq("event_id"), "2 hours")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 2)
    // batch 2: a LATE duplicate of id 1 (behind the 11:00 watermark — the
    // operator DROPS late records outright rather than re-emitting, so
    // bounded state never produces duplicates) and a TIMELY duplicate of
    // id 2 (state alive -> deduplicated).
    write(Seq(
      (1L, "2024-01-01 10:10:00", 99.0),
      (2L, "2024-01-01 13:01:00", 4.0)))
    runOnce()
    val byId = spark.read.parquet(out).groupBy("event_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId == Map(1L -> 1L, 2L -> 1L)) // late row dropped; timely deduped
  }

  test("stream-stream interval join matches within the window, bounded state") {
    val d = Files.createTempDirectory("graft_ssj").toString
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "view"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), "purchase"), // in window
      (1L, java.sql.Timestamp.valueOf("2024-01-01 12:30:00"), "purchase"), // outside
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), "purchase")  // other user
    ).toDF("user_id", "ts", "kind").write.mode("overwrite").parquet(d)
    val schema = spark.read.parquet(d).schema
    def stream(kind: String) = StreamingIngest
      .parquetStream(spark, d, schema).where(col("kind") === kind)
      .select(col("user_id"), col("ts"))
    val joined = StreamingIngest.intervalJoin(
      stream("view"), stream("purchase"), "user_id", "1 hour", "2 hours")
    val out = StreamingIngest.runAvailableNow(spark,
      joined.select(col("l.user_id").as("u"), col("r.ts").as("purchase_ts")),
      "ssj_test", outputMode = "append").collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L)
    assert(out.head.getTimestamp(1).toString == "2024-01-01 10:30:00.0")
  }

  test("foreachBatch upsert appends only new keys across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    val target = Files.createTempDirectory("graft_upsert").toString + "/t"
    val schema = spark.read.parquet(eventsDir).schema
    def runOnce(): Unit = {
      val stream = StreamingIngest.parquetStream(spark, eventsDir, schema)
      val q = StreamingIngest.upsertStream(stream, Seq("event_id"), target)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          Files.createTempDirectory("graft_upsert_ck").toString)
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(target).count() == 4) // 5 rows, 1 dup id
    // re-run over the same source (fresh checkpoint): nothing new appends
    runOnce()
    assert(spark.read.parquet(target).count() == 4)
  }

  test("streaming gap fill equals batch gap fill, independent of day-aligned batch splits") {
    import graft.streaming.GapFillStream
    // (user, epoch-day, cents): gaps inside each user's span; day 13
    // split across two rows (summed within its batch)
    val rows = Seq(
      (1L, 10, 100L), (1L, 13, 40L), (1L, 13, 60L), (1L, 14, 7L),
      (2L, 11, 5L), (2L, 15, 9L),
      (3L, 12, 3L) // single-day user: no fills
    )
    def run(files: Seq[Seq[(Long, Int, Long)]]): Seq[(Long, Int, Long, Boolean)] = {
      val dir = Files.createTempDirectory("graft_sgf").toString
      files.zipWithIndex.foreach { case (part, i) =>
        part.toDF("user_id", "day", "cents").coalesce(1)
          .write.mode("append").parquet(s"$dir/f=$i")
      }
      val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val schema = spark.read.parquet(dir).schema
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(dir)
          .select("user_id", "day", "cents").as[(Long, Int, Long)]
        StreamingIngest.runAvailableNow(spark,
            GapFillStream.gapFillStream(stream).toDF("user_id", "day", "cents", "filled"),
            s"sgf_${files.size}", outputMode = "append")
          .collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
          .toSeq.sorted
      } finally {
        prev match {
          case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      }
    }
    val expected = Seq(
      (1L, 10, 100L, false), (1L, 11, 100L, true), (1L, 12, 100L, true),
      (1L, 13, 100L, false), (1L, 14, 7L, false),
      (2L, 11, 5L, false), (2L, 12, 5L, true), (2L, 13, 5L, true),
      (2L, 14, 5L, true), (2L, 15, 9L, false),
      (3L, 12, 3L, false))
    val oneBatch = run(Seq(rows))
    assert(oneBatch == expected)
    // day-aligned split: days 10-12 then 13-15 — state carries the fill
    // value across the batch boundary
    val split = run(Seq(rows.filter(_._2 <= 12), rows.filter(_._2 > 12)))
    assert(split == expected)
    // batch twin agrees: dailyGapFill over the same per-day sums
    val daily = rows.toDF("user_id", "day", "c")
      .groupBy("user_id", "day").agg(sum("c").as("c"))
    val batch = graft.ops.GapFill.dailyGapFill(daily, "user_id", "day", "c")
      .select(col("user_id"), col("day"), col("c_ffill"), col("c").isNull.as("filled"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
      .toSeq.sorted
    assert(batch == expected)
  }

  test("streaming Holt equals batch holtNano, independent of order-aligned splits") {
    import graft.streaming.HoltStream
    // two keys; key a's series exercises the negative-trend halvings
    // (same numbers as the batch OpsSpec case), fed out of order within
    // the batch (the processor sorts per batch)
    val rows = Seq(
      ("a", 3L, 0L, 6L), ("a", 1L, 0L, 8L), ("a", 2L, 0L, 4L),
      ("a", 4L, 0L, 10L), ("b", 1L, 0L, 5L), ("b", 2L, 0L, 9L))
    def run(files: Seq[Seq[(String, Long, Long, Long)]]): Seq[(String, Long, Long, Long, Long, Long)] = {
      val dir = Files.createTempDirectory("graft_sholt").toString
      files.zipWithIndex.foreach { case (part, i) =>
        part.toDF("k", "ord", "tie", "y_nano").coalesce(1)
          .write.mode("append").parquet(s"$dir/f=$i")
      }
      val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val schema = spark.read.parquet(dir).schema
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(dir)
          .select("k", "ord", "tie", "y_nano")
          .as[(String, Long, Long, Long)]
        StreamingIngest.runAvailableNow(spark,
            HoltStream.holtStream(stream, maxPoints = 10)
              .toDF("k", "rn", "y_nano", "l_nano", "b_nano", "fc_nano"),
            s"sholt_${files.size}", outputMode = "append")
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getLong(5)))
          .toSeq.sorted
      } finally {
        prev match {
          case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      }
    }
    val batch = graft.ops.Holt
      .holtNano(rows.toDF("k", "ord", "tie", "y_nano"), maxPoints = 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq.sorted
    val oneBatch = run(Seq(rows))
    assert(oneBatch == batch)
    // order-aligned split (ord <= 2 then ord > 2): level/trend state
    // carries across the micro-batch boundary
    val split = run(Seq(rows.filter(_._2 <= 2), rows.filter(_._2 > 2)))
    assert(split == batch)
    // a late row (at or before the high-water mark) is dropped, not folded
    val withLate = run(Seq(rows.filter(_._2 <= 3),
      Seq(("a", 2L, 0L, 999L)) ++ rows.filter(_._2 > 3)))
    assert(withLate == batch)
  }

  test("streaming KMV: final snapshot equals batch sketch under ANY split order") {
    import graft.streaming.KmvStream
    // 12 distinct hashes per key + duplicates; k=8 forces eviction
    val rows = (1L to 12L).map(h => ("a", h * 10)) ++
      (1L to 12L).map(h => ("a", h * 10)) ++ // dups change nothing
      Seq(("b", 5L), ("b", 7L), ("b", 5L))
    def run(files: Seq[Seq[(String, Long)]]): Map[String, (Long, Long, Long, Long)] = {
      val dir = Files.createTempDirectory("graft_skmv").toString
      files.zipWithIndex.foreach { case (part, i) =>
        part.toDF("k", "h").coalesce(1)
          .write.mode("append").parquet(s"$dir/f=$i")
      }
      val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val schema = spark.read.parquet(dir).schema
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(dir)
          .select("k", "h").as[(String, Long)]
        val out = StreamingIngest.runAvailableNow(spark,
            KmvStream.kmvStream(stream, k = 8)
              .toDF("k", "n_seen", "n_kept", "kth_min", "est"),
            s"skmv_${files.size}_${files.map(_.size).sum}",
            outputMode = "append")
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4)))
        // latest wins = max n_seen per key (strictly monotone)
        out.groupBy(_._1).map { case (k, rs) =>
          val last = rs.maxBy(_._2)
          k -> ((last._2, last._3, last._4, last._5))
        }
      } finally {
        prev match {
          case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      }
    }
    // expected: key a keeps {10..80}, kth=80, est=(8-1)*2^60/80; 24 rows seen
    val estA = ((BigInt(7) * (BigInt(1) << 60)) / 80).toLong
    val expected = Map(
      "a" -> ((24L, 8L, 80L, estA)),
      "b" -> ((3L, 2L, 7L, 2L)))
    assert(run(Seq(rows)) == expected)
    // REVERSED, interleaved split — same final snapshots (set semantics)
    val (f1, f2) = rows.reverse.splitAt(9)
    assert(run(Seq(f1, f2)) == expected)
  }

  test("streaming KMV sketch stream: final kept set equals batch kmvMins " +
    "under ANY split order (feeds kmvSetOps)") {
    import graft.streaming.KmvStream
    import graft.ops.Sketches
    val rows = (1L to 12L).map(h => ("a", h * 10)) ++
      Seq(("b", 5L), ("b", 7L), ("b", 5L))
    def run(files: Seq[Seq[(String, Long)]]): Map[String, Seq[Long]] = {
      val dir = Files.createTempDirectory("graft_skmvs").toString
      files.zipWithIndex.foreach { case (part, i) =>
        part.toDF("k", "h").coalesce(1)
          .write.mode("append").parquet(s"$dir/f=$i")
      }
      val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val schema = spark.read.parquet(dir).schema
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(dir)
          .select("k", "h").as[(String, Long)]
        val out = StreamingIngest.runAvailableNow(spark,
            KmvStream.kmvSketchStream(stream, k = 8)
              .toDF("k", "n_seen", "mins"),
            s"skmvs_${files.size}_${files.map(_.size).sum}",
            outputMode = "append")
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
        out.groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._2)._3 }
      } finally {
        prev match {
          case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      }
    }
    // batch twin: kmvMins over the same data
    val batch = rows.toDF("k", "h").groupBy("k")
      .agg(Sketches.kmvMins(8)(col("h")).as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(run(Seq(rows)) == batch)
    val (f1, f2) = rows.reverse.splitAt(7)
    assert(run(Seq(f1, f2)) == batch) // reversed split, same final sketch
  }

  test("append-mode session windows with the epilogue discipline emit " +
    "EVERY real session; only the sentinel's is held back") {
    val d = Files.createTempDirectory("graft_sessep").toString
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def ts(h: Long) = new java.sql.Timestamp(t0.getTime + h * 3600000L)
    // user 1: an early session AND a trailing session (starts t0+10h) a
    // bare finite run would hold back (watermark max-2h = t0+8h);
    // epilogue (user -1) at t0+10h+1h(gap)+2h(delay)+1h(margin)=t0+14h
    // pushes the final watermark past the trailing session's end (t0+11h)
    Seq((1L, ts(0)), (1L, ts(10)), (-1L, ts(14)))
      .toDF("user_id", "ts_ts").write.mode("overwrite").parquet(d)
    val schema = spark.read.parquet(d).schema
    val sessions = StreamingIngest.parquetStream(spark, d, schema)
      .withWatermark("ts_ts", "2 hours")
      .groupBy(session_window(col("ts_ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val got = StreamingIngest.runAvailableNow(spark, sessions,
        "sesswm_epilogue", outputMode = "append")
      .select("user_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 1L), s"got=$got") // both real sessions, no sentinel
  }

  test("streaming CMS: final estimates equal batch sketch under reversed splits") {
    import graft.streaming.CmsStream
    import graft.ops.{Dedup, Sketches}
    def h(w: String): Long = graft.plans.Hash60.hashUTF8(
      org.apache.spark.unsafe.types.UTF8String.fromString(w)) % Dedup.MinhashP
    val probes = Array("join" -> h("join"), "scan" -> h("scan"))
    // key a: 'join' ×5, 'scan' ×2; key b: 'join' ×1
    val rows = (Seq.fill(5)(("a", h("join"))) ++ Seq.fill(2)(("a", h("scan")))
      ++ Seq(("b", h("join"))))
    def run(files: Seq[Seq[(String, Long)]]): Map[(String, String), (Long, Long)] = {
      val dir = Files.createTempDirectory("graft_scms").toString
      files.zipWithIndex.foreach { case (part, i) =>
        part.toDF("k", "h").coalesce(1)
          .write.mode("append").parquet(s"$dir/f=$i")
      }
      val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val schema = spark.read.parquet(dir).schema
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(dir)
          .select("k", "h").as[(String, Long)]
        StreamingIngest.runAvailableNow(spark,
            CmsStream.cmsStream(stream, 3, 512, probes)
              .toDF("k", "n_seen", "word", "est"),
            s"scms_${files.size}_${files.map(_.size).sum}",
            outputMode = "append")
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
          .groupBy(t => (t._1, t._3))
          .map { case (kw, ts) =>
            val last = ts.maxBy(_._2); kw -> ((last._2, last._4)) }
      } finally {
        prev match {
          case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      }
    }
    // no collisions among 2 probe hashes at width 512 in 3 rows each
    val expected = Map(
      ("a", "join") -> ((7L, 5L)), ("a", "scan") -> ((7L, 2L)),
      ("b", "join") -> ((1L, 1L)), ("b", "scan") -> ((1L, 0L)))
    assert(run(Seq(rows)) == expected)
    val (f1, f2) = rows.reverse.splitAt(4)
    assert(run(Seq(f1, f2)) == expected)
    // batch-aggregator agreement on key a
    val sk = rows.filter(_._1 == "a").map(_._2).toDF("h")
      .agg(Sketches.cmsSketch(3, 512)(col("h"))).head.getSeq[Long](0)
    assert(Sketches.cmsEstimate(sk, 3, 512, h("join")) == 5L)
    assert(Sketches.cmsEstimate(sk, 3, 512, h("scan")) == 2L)
  }

  test("streaming hot-segment detector: hot set independent of batch splits, equals batch segmentDedup") {
    import graft.streaming.HotSegments
    // maxDocFreq=2: "nav bar" appears in 4 distinct docs (hot), "footer" in
    // exactly 2 (cold — the boundary), doc 5 repeats "nav bar" twice
    // WITHIN one doc (distinct-doc counting must not double-count it),
    // and every doc carries a unique body segment.
    val docs = Seq(
      (1L, "nav bar\nbody one\nfooter"),
      (2L, "nav bar\nbody two\nfooter"),
      (3L, "nav bar\nbody three"),
      (4L, "body four"),
      (5L, "nav bar\nbody five\nnav bar"))
    def run(files: Seq[Seq[(Long, String)]]): (Set[String], Seq[Row]) = {
      val dir = Files.createTempDirectory("graft_hotseg").toString
      files.zipWithIndex.foreach { case (part, i) =>
        part.toDF("doc_id", "text").coalesce(1)
          .write.mode("append").parquet(s"$dir/f=$i")
      }
      val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val schema = spark.read.parquet(dir).schema
        val segStream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(dir)
          .select(col("doc_id"),
            explode(split(col("text"), "\n")).as("seg"))
          .select(trim(col("seg")).as("k"), col("doc_id"))
          .where(col("k") =!= "")
          .as[(String, Long)]
        val hot = StreamingIngest.runAvailableNow(spark,
          HotSegments.hotKeys(segStream, maxDocFreq = 2).toDF("k"),
          s"hotseg_${files.size}_${files.hashCode.abs}", outputMode = "append")
        val hotSet = hot.collect().map(_.getString(0)).toSet
        val applied = HotSegments.applyHotFilter(
            docs.toDF("doc_id", "text"), hot, "text", "doc_id", "\n")
          .orderBy("doc_id").collect().toSeq
        (hotSet, applied)
      } finally {
        prev match {
          case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      }
    }
    val batchTwin = graft.ops.Dedup.segmentDedup(
        docs.toDF("doc_id", "text"), "text", "doc_id", "\n", maxDocFreq = 2)
      .orderBy("doc_id").collect().toSeq
    // one batch, and a split where "nav bar" only crosses the threshold in
    // the SECOND micro-batch (docs 1-2 then 3-5: the capped distinct set
    // must carry across the boundary); emitted-once means each split still
    // yields exactly one "nav bar" row
    val (hot1, out1) = run(Seq(docs))
    val (hot2, out2) = run(Seq(docs.take(2), docs.drop(2)))
    assert(hot1 == Set("nav bar"))
    assert(hot2 == Set("nav bar"))
    assert(out1 == batchTwin)
    assert(out2 == batchTwin)
    // the cold boundary key survived in every doc's clean text
    assert(out1.filter(_.getLong(0) <= 2L)
      .forall(_.getString(3).endsWith("footer")))
  }

  test("transformWithState per-source cap admits at most N docs per key across batches") {
    import graft.streaming.CapPerKey
    val dir = Files.createTempDirectory("graft_cap").toString
    // two files -> two micro-batches (maxFilesPerTrigger=1): the counter
    // state must survive the batch boundary for srcA/srcB to stay capped
    Seq(("srcA", 1L), ("srcA", 2L), ("srcB", 10L))
      .toDF("source", "doc_id").coalesce(1)
      .write.mode("overwrite").parquet(dir + "/batch=0")
    Seq(("srcA", 3L), ("srcB", 11L), ("srcB", 12L), ("srcC", 20L))
      .toDF("source", "doc_id").coalesce(1)
      .write.mode("append").parquet(dir + "/batch=1")
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = spark.read.parquet(dir).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .select("source", "doc_id").as[(String, Long)]
      val capped = CapPerKey.capPerKey[String, (String, Long)](
        stream, _._1, maxPerKey = 2)
      val out = StreamingIngest.runAvailableNow(spark, capped.toDF(),
        "cap_test", outputMode = "append")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val byKey = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert(byKey("srcA") == Set(1L, 2L)) // doc 3 (second batch) rejected
      assert(byKey("srcB").size == 2 && byKey("srcB").contains(10L))
      assert(byKey("srcC") == Set(20L))
      assert(out.length == 5)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming dedup on the natural key keeps one row per id") {
    val schema = spark.read.parquet(eventsDir).schema
    val stream = StreamingIngest.parquetStream(spark, eventsDir, schema)
    val dedup = StreamingIngest.dedupStream(stream, Seq("event_id"), "2 hours")
    val out = StreamingIngest.runAvailableNow(spark, dedup, "dedup_test",
      outputMode = "append")
    assert(out.select("event_id").distinct().count() == 4)
    assert(out.count() == 4)
  }

  test("bloomUpsertStream: final key set independent of micro-batch boundaries") {
    import org.apache.spark.sql.streaming.Trigger
    // seed {a,b}; incoming carries b (dup of seed), c twice (the second in
    // a LATER batch when split), and d — the new-key set must be {c,d}
    // whether the input arrives as one batch or two
    def run(groups: Seq[Seq[(String, Long)]]): Set[String] = {
      val root = Files.createTempDirectory("graft_bloom_up").toString
      val target = root + "/t"
      Seq(("a", 0L), ("b", 0L)).toDF("digest", "doc_id")
        .write.parquet(target)
      groups.foreach(_.toDF("digest", "doc_id").coalesce(1)
        .write.mode("append").parquet(root + "/in"))
      val schema = spark.read.parquet(root + "/in").schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(root + "/in")
      val q = StreamingIngest.bloomUpsertStream(stream, "digest", target, 1024)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", root + "/ck")
        .start()
      q.awaitTermination()
      spark.read.parquet(target).select("digest").as[String].collect().toSet --
        Set("a", "b")
    }
    val rows = Seq(("b", 1L), ("c", 2L), ("c", 3L), ("d", 4L))
    assert(run(Seq(rows)) == Set("c", "d"))
    assert(run(Seq(rows.take(2), rows.drop(2))) == Set("c", "d"))
  }
}
