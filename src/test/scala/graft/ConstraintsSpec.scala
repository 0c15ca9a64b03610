package graft

import graft.quality.Constraints
import graft.quality.Constraints._

/** Declarative DQ constraint suite semantics. */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private def resultMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getDouble(2), r.getBoolean(4))).toMap

  test("all four constraint kinds observe exact ratios in one pass") {
    val t = Seq(
      (Some(1L), Some("a"), Some(10.0)),
      (Some(2L), Some("a"), Some(20.0)),
      (Some(3L), Some("b"), None),        // null value
      (Some(4L), Some("zz"), Some(999.0)), // out of set, out of range
      (Some(4L), None, Some(30.0))         // dup id, null category
    ).toDF("id", "cat", "v")
    val out = resultMap(Constraints.check(t, Seq(
      NotNull("v", 0.9),
      InSet("cat", Seq("a", "b"), 0.7),
      Between("v", 0.0, 100.0, 0.7),
      UniqueRatio("id", 1.0))))
    assert(out(("not_null", "v")) == (0.8, false))       // 4/5 < 0.9
    assert(out(("in_set", "cat")) == (0.75, true))       // 3/4 non-null
    assert(out(("between", "v")) == (0.75, true))        // 3/4 non-null
    assert(out(("unique_ratio", "id")) == (0.8, false))  // 4 distinct / 5
  }

  test("null keys collapse to one distinct value in unique_ratio") {
    val t = Seq(Some(1L), None, None).toDF("id")
    val out = resultMap(Constraints.check(t, Seq(UniqueRatio("id", 1.0))))
    // distinct {1, NULL} = 2 of 3 rows
    assert(out(("unique_ratio", "id"))._1 == 2.0 / 3.0)
  }

  test("empty table observes 0.0 and fails positive thresholds") {
    val t = Seq.empty[(Option[Long], Option[String])].toDF("id", "cat")
    val out = resultMap(Constraints.check(t, Seq(
      NotNull("cat", 0.5), UniqueRatio("id", 0.5))))
    assert(out.values.toSeq == Seq((0.0, false), (0.0, false)))
  }
}
