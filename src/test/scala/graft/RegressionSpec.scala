package graft

import graft.ops.Regression

/** Closed-form OLS: exact fit on a planted line, NULL on degenerate groups. */
class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("groupedOls recovers a planted line exactly and NULLs constant-x groups") {
    // g=a: y = 3 + 2x, exact 2-dp points -> exact sums -> exact fit
    val a = Seq(("a", 1.0, 5.0), ("a", 2.0, 7.0), ("a", 3.0, 9.0), ("a", 4.0, 11.0))
    // g=b: constant x -> var(x) = 0 -> NULL slope/intercept/r2
    val b = Seq(("b", 2.0, 1.0), ("b", 2.0, 2.0), ("b", 2.0, 3.0))
    val df = (a ++ b).toDF("g", "x", "y")
    val fit = Regression.groupedOls(df, Seq("g"), "x", "y")
      .orderBy("g").collect()
    val ra = fit(0)
    assert(ra.getString(0) == "a" && ra.getLong(1) == 4L)
    assert(ra.getDouble(2) == 2.0)   // slope
    assert(ra.getDouble(3) == 3.0)   // intercept
    assert(ra.getDouble(4) == 1.0)   // perfect fit
    val rb = fit(1)
    assert(rb.getString(0) == "b" && rb.isNullAt(2) && rb.isNullAt(3) && rb.isNullAt(4))
  }

  test("r2 equals squared Pearson correlation on noisy data") {
    val pts = (1 to 40).map(i => ("g", i.toDouble, (i * 1.5 + (i % 7) - 3).toDouble))
    val df = pts.toDF("g", "x", "y")
    val fit = Regression.groupedOls(df, Seq("g"), "x", "y").collect().head
    val corr = df.stat.corr("x", "y")
    assert(math.abs(fit.getDouble(4) - corr * corr) < 1e-6)
  }
}
