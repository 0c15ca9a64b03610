package graft

import org.apache.spark.sql.functions._
import graft.ops.{Funnel, Upsert}
import graft.ingest.Bucketed

/** Funnel ordering semantics, batch upsert merge semantics, and the
  * exchange-free bucketed-join layout guarantee.
  */
class FunnelUpsertSpec extends SparkSpec {
  import spark.implicits._

  // (user, ts, type) planted funnel cases
  private lazy val ev = Seq(
    // u1 completes all three in order
    (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"),
    // u2 clicks BEFORE viewing; that click must not count, the later one does
    (2L, 5L, "click"), (2L, 10L, "view"), (2L, 40L, "click"),
    // u3 views only
    (3L, 7L, "view"),
    // u4 buys without ever viewing -> not in the funnel at all
    (4L, 9L, "buy"),
    // u5: buy lands BETWEEN view and click -> buy must not count (order!)
    (5L, 10L, "view"), (5L, 15L, "buy"), (5L, 20L, "click")
  ).toDF("user_id", "ts", "event_type")

  test("funnel stepTimes enforces strict step order per entity") {
    val st = Funnel.stepTimes(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "buy"))
    val rows = st.collect().map(r => r.getLong(0) ->
      (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(rows(1L) == ((Some(10L), Some(20L), Some(30L))))
    assert(rows(2L) == ((Some(10L), Some(40L), None))) // pre-view click ignored
    assert(rows(3L) == ((Some(7L), None, None)))
    assert(!rows.contains(4L)) // never entered the funnel
    assert(rows(5L) == ((Some(10L), Some(20L), None))) // buy-before-click ignored
  }

  test("funnel counts unpivots to ordered step counts") {
    val st = Funnel.stepTimes(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "buy"))
    val c = Funnel.counts(st, "user_id").orderBy("step_no")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(c.toSeq == Seq(
      (1, "step1_view", 4L), (2, "step2_click", 3L), (3, "step3_buy", 1L)))
  }

  test("foldStepTimes over the sorted multiset equals stepTimes, any arrival order") {
    val steps = Seq("view", "click", "buy")
    val batch = Funnel.stepTimes(ev, "user_id", "ts", "event_type", steps)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    // simulate streaming arrival in REVERSED order; sort_array + fold must
    // erase it (order-independence is what licenses the strict oracle)
    val folded = ev.orderBy($"ts".desc)
      .groupBy("user_id")
      .agg(collect_list(struct($"ts", $"event_type")).as("evs"))
      .select($"user_id",
        Funnel.foldStepTimes(sort_array($"evs"), steps).as("st"))
      .where($"st.step1_view".isNotNull)
      .collect().map(r => r.getLong(0) -> {
        val st = r.getStruct(1)
        (Option(st.get(0)), Option(st.get(1)), Option(st.get(2)))
      }).toMap
    assert(folded == batch)
  }

  private lazy val current = Seq(
    (1L, "a", 0L), (2L, "b", 0L), (3L, "c", 0L)
  ).toDF("k", "v", "seq")

  test("upsert merge: latest update wins, unmatched rows pass through, inserts appear") {
    val updates = Seq(
      (2L, "b1", 1L), (2L, "b2", 2L), // intra-batch conflict: seq 2 wins
      (4L, "d", 1L)                   // brand-new key (insert)
    ).toDF("k", "v", "seq")
    val out = Upsert.merge(current, updates, Seq("k"), "seq")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, "a", 0L), (2L, "b2", 2L), (3L, "c", 0L), (4L, "d", 1L)))
  }

  test("upsert with empty updates is identity; empty current is just the updates") {
    val empty = current.where($"k" < 0)
    assert(Upsert.merge(current, empty, Seq("k"), "seq").count() == 3)
    val out = Upsert.merge(empty, current, Seq("k"), "seq").orderBy("k")
      .select("k").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L, 3L))
  }

  test("incremental agg: any delta split and merge order equals from-scratch") {
    import graft.ops.IncrementalAgg
    val rows = (0L until 300L).map(i => (s"k${i % 3}", i, i * 7 % 101))
      .toDF("k", "id", "v")
    val direct = rows.groupBy("k")
      .agg(sum("v").as("psum"), count("v").as("pcnt"))
      .orderBy("k").collect().map(_.toSeq).toSeq
    def split(mod: Int) = (0 until mod).map(r =>
      IncrementalAgg.partials(rows.where($"id" % mod === r), Seq("k"), "v"))
    for (parts <- Seq(split(2), split(5), split(5).reverse)) {
      val merged = IncrementalAgg.merge(parts, Seq("k"))
        .orderBy("k").collect().map(_.toSeq).toSeq
      assert(merged == direct)
    }
    // and a state can itself be merged with a fresh delta (true increment)
    val s0 = IncrementalAgg.merge(split(2), Seq("k"))
    val more = Seq((s"k0", 999L, 50L)).toDF("k", "id", "v")
    val s1 = IncrementalAgg.merge(
      Seq(s0, IncrementalAgg.partials(more, Seq("k"), "v")), Seq("k"))
    val k0 = s1.where($"k" === "k0").collect().head
    assert(k0.getLong(1) == direct.find(_.head == "k0").get(1).asInstanceOf[Long] + 50L)
    assert(k0.getLong(2) == direct.find(_.head == "k0").get(2).asInstanceOf[Long] + 1L)
  }

  test("scd2History versions runs of equal values, null-safely") {
    val log = Seq(
      // k1: A A B A -> three versions (the repeat A at seq 2 collapses)
      (1L, 1L, Some("A")), (1L, 2L, Some("A")), (1L, 3L, Some("B")), (1L, 4L, Some("A")),
      // k2: null A null -> null states version correctly (null-safe compare)
      (2L, 1L, None), (2L, 2L, Some("A")), (2L, 3L, None),
      // k3: single row -> one current version
      (3L, 7L, Some("Z"))
    ).toDF("k", "seq", "v")
    val h = Upsert.scd2History(log, Seq("k"), "seq", Seq("v"))
      .orderBy("k", "version_no")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2),
        Option(r.get(3)), r.getLong(4), r.getBoolean(5)))
    assert(h.toSeq == Seq(
      (1L, Some("A"), 1L, Some(3L), 1L, false),
      (1L, Some("B"), 3L, Some(4L), 2L, false),
      (1L, Some("A"), 4L, None, 3L, true),
      (2L, None, 1L, Some(2L), 1L, false),
      (2L, Some("A"), 2L, Some(3L), 2L, false),
      (2L, None, 3L, None, 3L, true),
      (3L, Some("Z"), 7L, None, 1L, true)))
  }

  test("bucketed co-located join plans with zero exchanges") {
    val o = spark.range(0, 1000).select($"id".as("k"), ($"id" * 2).as("a"))
    val l = spark.range(0, 3000).select(($"id" % 1000).as("k"), $"id".as("b"))
    Bucketed.write(o, "bkt_o", "k", 8)
    Bucketed.write(l, "bkt_l", "k", 8)
    // force SMJ so the test exercises the exchange-removal path, not broadcast
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = Bucketed.read(spark, "bkt_o")
        .join(Bucketed.read(spark, "bkt_l"), Seq("k"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(800))
      assert(!p.contains("Exchange"), p.take(800)) // the whole point of bucketing
      assert(j.count() == 3000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("snapshotDiff: added/removed/changed with null-safe masks; equal rows drop") {
    val oldSnap = Seq(
      (1L, Some("a"), Some(1.0)), (2L, Some("b"), None),
      (3L, Some("c"), Some(3.0)), (4L, Some("d"), Some(4.0))
    ).toDF("k", "st", "tp")
    val newSnap = Seq(
      (2L, Some("b"), None),            // null-safely equal -> dropped
      (3L, Some("cx"), Some(3.0)),      // st changed
      (4L, Some("d"), Some(5.0)),       // tp changed
      (5L, Option.empty[String], Some(5.5)) // added (null value col ok)
    ).toDF("k", "st", "tp")
    val got = Upsert.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("st", "tp"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got == Map(
      1L -> (("removed", 0L, "")),
      3L -> (("changed", 1L, "st")),
      4L -> (("changed", 1L, "tp")),
      5L -> (("added", 0L, ""))), s"$got")
  }

  test("cohort retention: hand-traced matrix, nulls dropped, exact shares") {
    import graft.ops.Cohort
    // periodNanos = 10: A active periods {0,1,3}, B {0,2}, C {1};
    // cohorts A,B -> 0 (size 2), C -> 1 (size 1). Duplicate activity in
    // a period must not double-count; null user/ts rows drop.
    val ev = Seq(
      (Some(1L), Some(1L)), (Some(1L), Some(12L)), (Some(1L), Some(35L)),
      (Some(1L), Some(13L)), // dup period for A
      (Some(2L), Some(5L)), (Some(2L), Some(25L)),
      (Some(3L), Some(15L)),
      (None, Some(9L)), (Some(9L), None)
    ).toDF("user_id", "ts")
    val got = Cohort.retention(ev, "user_id", "ts", periodNanos = 10L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      (0L, 0L) -> ((2L, 2L, 1000000000L)),
      (0L, 1L) -> ((1L, 2L, 500000000L)),
      (0L, 2L) -> ((1L, 2L, 500000000L)),
      (0L, 3L) -> ((1L, 2L, 500000000L)),
      (1L, 0L) -> ((1L, 1L, 1000000000L))), s"$got")
  }
}
