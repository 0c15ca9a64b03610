package graft

import java.sql.Date

import graft.ops.GapFill

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  // Key "a" spans 4 days with a 2-day hole; key "b" is a single day
  // (spine of one, nothing to fill).
  private lazy val daily = Seq(
    ("a", d("2024-01-01"), Some(10.0)),
    ("a", d("2024-01-04"), Some(40.0)),
    ("b", d("2024-02-10"), Some(7.0))
  ).toDF("k", "day", "v")

  test("dailySpine spans each key's own [min, max], not the global range") {
    val spine = GapFill.dailySpine(daily, "k", "day")
      .as[(String, Date)].collect().toSet
    assert(spine == Set(
      ("a", d("2024-01-01")), ("a", d("2024-01-02")),
      ("a", d("2024-01-03")), ("a", d("2024-01-04")),
      ("b", d("2024-02-10"))))
  }

  test("dailyGapFill forward-fills gap days and leaves other cols NULL") {
    val out = GapFill.dailyGapFill(daily, "k", "day", "v")
      .orderBy("k", "day")
      .select("k", "day", "v", "v_ffill")
      .as[(String, Date, Option[Double], Option[Double])].collect()
    assert(out.toSeq == Seq(
      ("a", d("2024-01-01"), Some(10.0), Some(10.0)),
      ("a", d("2024-01-02"), None, Some(10.0)),
      ("a", d("2024-01-03"), None, Some(10.0)),
      ("a", d("2024-01-04"), Some(40.0), Some(40.0)),
      ("b", d("2024-02-10"), Some(7.0), Some(7.0))))
  }

  test("dailyInterp draws the straight line across a gap") {
    val out = GapFill.dailyInterp(daily, "k", "day", "v")
      .orderBy("k", "day").select("k", "day", "v_interp")
      .as[(String, Date, Option[Double])].collect()
    assert(out.toSeq == Seq(
      ("a", d("2024-01-01"), Some(10.0)),
      ("a", d("2024-01-02"), Some(20.0)),
      ("a", d("2024-01-03"), Some(30.0)),
      ("a", d("2024-01-04"), Some(40.0)),
      ("b", d("2024-02-10"), Some(7.0))))
  }

  test("dailyInterp never extrapolates past the observation edges") {
    // null-valued observations at the span ends: interior interpolates,
    // the edges have no surrounding pair and stay NULL
    val df = Seq(
      ("a", d("2024-01-01"), None: Option[Double]),
      ("a", d("2024-01-02"), Some(2.0)),
      ("a", d("2024-01-04"), Some(6.0)),
      ("a", d("2024-01-05"), None: Option[Double])
    ).toDF("k", "day", "v")
    val out = GapFill.dailyInterp(df, "k", "day", "v")
      .orderBy("day").select("v_interp")
      .as[Option[Double]].collect()
    assert(out.toSeq == Seq(None, Some(2.0), Some(4.0), Some(6.0), None))
  }

  test("leading gap rows before the first observation stay NULL") {
    // min comes from a NULL-valued observation: ffill has nothing to
    // carry until the first non-null value appears.
    val df = Seq(
      ("a", d("2024-01-01"), None: Option[Double]),
      ("a", d("2024-01-03"), Some(3.0))
    ).toDF("k", "day", "v")
    val out = GapFill.dailyGapFill(df, "k", "day", "v")
      .orderBy("day").select("v_ffill")
      .as[Option[Double]].collect()
    assert(out.toSeq == Seq(None, None, Some(3.0)))
  }
}
