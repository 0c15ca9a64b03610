package graft

/** Driver-contract hygiene: entry smoke, oracle/queries key alignment. */
class ContractSpec extends SparkSpec {

  test("entry() returns rows on the smoke scale (driver t1)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; non-oracle queries are known") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    // every query has an exact oracle — keep it that way
    assert((q -- o).isEmpty, s"unexpected rows-only queries: ${q -- o}")
  }

  test("oracle SQL contains no engine-specific Spark syntax markers") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("pmod("), s"$name uses Spark pmod in oracle")
      assert(!sql.toLowerCase.contains("get_json_object"), s"$name oracle not ANSI/DuckDB")
    }
  }
}
