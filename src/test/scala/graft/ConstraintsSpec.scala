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

  test("psiDrift: identical slices score ~0, a shifted slice scores high") {
    import graft.quality.DataQuality
    // key "same": current slice == reference slice (values 0..99 twice)
    // key "shift": current slice moved +100 — every row lands in the top
    // bucket, PSI blows up; key "gone": no current rows -> NULL psi
    val rows =
      (0 until 100).map(i => ("same", i.toDouble, true)) ++
      (0 until 100).map(i => ("same", i.toDouble, false)) ++
      (0 until 100).map(i => ("shift", i.toDouble, true)) ++
      (0 until 100).map(i => ("shift", i.toDouble + 100.0, false)) ++
      (0 until 10).map(i => ("gone", i.toDouble, true))
    val df = rows.toDF("k", "v", "is_ref")
    val out = DataQuality.psiDrift(df, "k", "v", "is_ref")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out("same")._1 == 100 && out("same")._2 == 100)
    assert(math.abs(out("same")._3.get) < 1e-12, s"same: ${out("same")._3}")
    // shifted: all current mass in the last bucket (share 1 vs 0.1) plus
    // nine emptied buckets at the eps floor -> PSI far above the 0.25
    // "significant drift" rule-of-thumb
    assert(out("shift")._3.get > 1.0, s"shift: ${out("shift")._3}")
    assert(out("gone")._2 == 0L && out("gone")._3.isEmpty)
    // brute-force replay for the shifted key: deciles of 0..99, every
    // current row > all bounds -> bucket 9
    val bounds = (1 to 9).map(q => {
      val h = (100 - 1) * (q / 10.0)
      val lo = h.toInt
      lo + (h - lo) * 1.0 // values are 0..99 so x[i] = i
    })
    val pRef = Array.fill(10)(10.0 / 100.0)
    val pCur = Array.tabulate(10)(b => if (b == 9) 1.0 else 0.0)
    val eps = 1e-6
    val want = (0 until 10).map { b =>
      val p = math.max(pRef(b), eps)
      val q = math.max(pCur(b), eps)
      (p - q) * math.log(p / q)
    }.sum
    assert(math.abs(out("shift")._3.get - want) < 1e-9,
      s"shift: ${out("shift")._3.get} vs $want (bounds $bounds)")
  }
}
