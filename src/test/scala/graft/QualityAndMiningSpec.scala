package graft

import org.apache.spark.sql.functions._
import graft.ops.{Fusion, Graph, Seasonal}
import graft.quality.DataQuality

/** Planted-case semantics for the round-6 DQ / graph / seasonal batch:
  * FK orphan audit, Benford digits, FD violations, k-core peel, seasonal
  * profile (incl. the floor-division sign contract).
  */
class QualityAndMiningSpec extends SparkSpec {
  import spark.implicits._

  test("fkOrphans counts orphans, skips NULL FKs, reports numeric-min witness") {
    val child = Seq(Some(1L), Some(2L), Some(3L), Some(3L), Some(99L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = DataQuality.fkOrphans(child, "fk", parent, "pk", "t.fk->p").head()
    assert(r.getAs[String]("fk_name") == "t.fk->p")
    assert(r.getAs[Long]("child_rows") == 5)   // NULL FK skipped
    assert(r.getAs[Long]("orphan_rows") == 1)
    assert(r.getAs[Long]("orphan_keys") == 1)
    assert(r.getAs[String]("min_orphan_key") == "99")
  }

  test("fkOrphans on a clean FK reports zeros and a NULL witness") {
    val child = Seq(10L, 2L).toDF("fk")
    val parent = Seq(1L, 2L, 10L).toDF("pk")
    val r = DataQuality.fkOrphans(child, "fk", parent, "pk", "clean").head()
    assert(r.getAs[Long]("orphan_rows") == 0)
    assert(r.getAs[Long]("orphan_keys") == 0)
    assert(r.getAs[String]("min_orphan_key") == null)
    // min witness is the NUMERIC min cast after, not a lexicographic
    // string min: {100, 20} must report "20"
    val dirty = Seq(100L, 20L).toDF("fk")
    val r2 = DataQuality.fkOrphans(dirty, "fk",
      Seq(1L).toDF("pk"), "pk", "dirty").head()
    assert(r2.getAs[String]("min_orphan_key") == "20")
  }

  test("benfordDigits: cents snap, sub-cent and NULL rows drop, full spine") {
    val vals = Seq(Some(1.0), Some(2.0), Some(0.0), None, Some(9.99),
      Some(0.004), Some(30.0)).toDF("v")
    val out = DataQuality.benfordDigits(vals, "v")
      .orderBy("digit").collect()
    assert(out.length == 9) // spine guarantees all digits
    val byDigit = out.map(r => r.getAs[Long]("digit") ->
      (r.getAs[Long]("n"), r.getAs[Long]("share_nano"))).toMap
    assert(byDigit(1L) == (1L, 250000000L)) // 1.0 -> 100
    assert(byDigit(2L) == (1L, 250000000L))
    assert(byDigit(3L) == (1L, 250000000L)) // 30.0 -> 3000
    assert(byDigit(9L) == (1L, 250000000L)) // 9.99 -> 999
    assert(byDigit(4L) == (0L, 0L))
    val d1 = out.find(_.getAs[Long]("digit") == 1L).get
    assert(d1.getAs[Long]("expected_nano") == 301029996L)
    assert(d1.getAs[Long]("dev_nano") == 301029996L - 250000000L)
  }

  test("fdViolations flags only determinants with >1 distinct dependent") {
    val t = Seq(
      (1L, Some("a")), (1L, Some("a")),
      (2L, Some("a")), (2L, Some("b")),
      (3L, None), (3L, Some("c")),  // NULL is not a variant (bare column)
      (4L, None), (4L, None)
    ).toDF("k", "v")
    val out = DataQuality.fdViolations(t, Seq("k"), Seq("v")).collect()
    assert(out.map(_.getAs[Long]("k")).toSeq == Seq(2L))
    assert(out.head.getAs[Long]("n_rows") == 2)
    assert(out.head.getAs[Long]("n_variants") == 2)
  }

  test("kCore peels the pendant chain, keeps the triangle, non-null verdict") {
    // triangle 1-2-3 plus chain 3-4-5
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val out = Graph.kCore(edges, k = 2, rounds = 2).orderBy("id").collect()
    val m = out.map(r => r.getAs[Long]("id") ->
      (r.getAs[Long]("deg_end"), r.getAs[Boolean]("in_core"))).toMap
    assert(m(1L) == (2L, true) && m(2L) == (2L, true) && m(3L) == (2L, true))
    assert(m(4L) == (0L, false)) // peeled in round 2 after 5 left
    assert(m(5L) == (0L, false)) // peeled in round 1
    assert(out.forall(_.getAs[Any]("in_core") != null))
  }

  test("bfsDistances: exact hop counts, -1 beyond the round horizon, multi-seed min") {
    // path 1-2-3-4-5-6 plus seed 9 adjacent to 5
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (9L, 5L))
      .toDF("src", "dst")
    val one = Graph.bfsDistances(edges, Seq(1L).toDF("id"), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> -1L, 6L -> -1L, 9L -> -1L))
    val two = Graph.bfsDistances(edges, Seq(1L, 9L).toDF("id"), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two(5L) == 1L && two(6L) == 2L && two(4L) == 2L) // min over seeds
  }

  test("intervalOverlapJoin: each overlapping pair exactly once, touch counts, disjoint doesn't") {
    import graft.ops.RangeJoin
    // left interval [0, 95] spans many buckets of width 10; right
    // intervals: contained [30,40], touching at endpoint [95,99],
    // disjoint [200,210]; wrong-key copy never matches
    val left = Seq((1L, 0L, 95L, "L1"), (2L, 0L, 95L, "Lx"))
      .toDF("k", "ls", "le", "lid")
    val right = Seq((1L, 30L, 40L, "R1"), (1L, 95L, 99L, "R2"),
      (1L, 200L, 210L, "R3")).toDF("k", "rs", "re", "rid")
    val out = RangeJoin.intervalOverlapJoin(left, right, Seq("k"),
        "ls", "le", "rs", "re", bucket = 10L)
      .select("lid", "rid").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.sorted.toSeq == Seq(("L1", "R1"), ("L1", "R2"))) // exactly once each
  }

  test("rrf fuses overlapping lists with integer credits, NULL for absences") {
    val l1 = Seq((1L, "A", 1L), (1L, "B", 2L)).toDF("qid", "id", "rank")
    val l2 = Seq((1L, "B", 1L), (1L, "C", 2L)).toDF("qid", "id", "rank")
    val out = Fusion.rrf(Seq(l1, l2), Seq("qid"), "id", "rank")
      .orderBy("rrf_rank").collect()
    // B: 1e9/61 + 1e9/62; A: 1e9/61; C: 1e9/62 (truncating DIV)
    assert(out.map(_.getAs[String]("id")).toSeq == Seq("B", "A", "C"))
    assert(out(0).getAs[Long]("rrf_nano") == 16393442L + 16129032L)
    assert(out(1).getAs[Long]("rrf_nano") == 16393442L)
    assert(out(1).getAs[Any]("rank_2") == null) // A absent from list 2
    assert(out(2).getAs[Any]("rank_1") == null) // C absent from list 1
    assert(out.map(_.getAs[Long]("rrf_rank")).toSeq == Seq(1L, 2L, 3L))
  }

  test("seasonal profile: per-position means, global dev, MAD, truncation on negatives") {
    val rows = Seq(
      ("a", 0L, 10L), ("a", 0L, 20L), ("a", 1L, 30L),
      ("b", 0L, -3L), ("b", 0L, -4L)
    ).toDF("k", "pos", "v_nano")
    val out = Seasonal.profile(rows, "k", "pos", "v_nano")
      .orderBy("k", "pos").collect()
    val a0 = out(0); val a1 = out(1); val b0 = out(2)
    assert(a0.getAs[Long]("n") == 2 && a0.getAs[Long]("seasonal_nano") == 15)
    assert(a0.getAs[Long]("dev_global_nano") == -5) // global floor(60/3)=20
    assert(a0.getAs[Long]("mad_resid_nano") == 5)
    assert(a1.getAs[Long]("seasonal_nano") == 30 &&
      a1.getAs[Long]("dev_global_nano") == 10 &&
      a1.getAs[Long]("mad_resid_nano") == 0)
    // integer division truncates toward zero on BOTH engines (Spark DIV
    // == DuckDB //, verified on negative operands): -7/2 -> -3
    assert(b0.getAs[Long]("seasonal_nano") == -3)
    assert(b0.getAs[Long]("dev_global_nano") == 0)
  }
}
