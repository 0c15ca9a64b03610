package graft

import org.apache.spark.sql.SparkSession

/** CI coverage for the SQL surface: builds a SECOND SparkSession (same
  * SparkContext, own sessionState) with GraftExtensions installed and
  * runs the full ExtensionsDemo battery — scalar natives plus the seven
  * operator TVFs (dedup, minhash pairs, knn join exact + IVF, quality
  * gate, as-of join, segment dedup), each compared against the library
  * API it splices in.
  */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions: scalar natives and operator TVFs match the API") {
    spark.sparkContext // ensure the shared context exists first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val ext =
      try SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      finally ()
    try {
      val fails = graft.tools.ExtensionsDemo.check(ext, "/root/testdata/sf0.001")
      assert(fails.isEmpty, fails.mkString("; "))
    } finally {
      // restore the shared session for the suites that follow
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
