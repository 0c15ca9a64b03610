package graft.tools

import org.apache.spark.sql.SparkSession

/** Drives GraftExtensions end-to-end: fresh session with the extension
  * installed, native functions called from SQL. Exits non-zero on
  * mismatch (used as a verification surface).
  */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-demo")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val row = spark.sql(
      """SELECT hash60('abc') AS h,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d""".stripMargin)
      .collect().head
    val expectedH = 648541476951500027L // ('0x'||substr(md5('abc'),1,15))::BIGINT
    val ok = row.getLong(0) == expectedH && row.getDouble(1) == 11.0
    println(s"[extensions-demo] hash60=${row.getLong(0)} dot=${row.getDouble(1)} ok=$ok")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
