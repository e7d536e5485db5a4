package graft

/** Contract guard: every SparkEntry.queries entry executes and returns
  * rows on the smallest fixture, every oracleSql key has a matching
  * query, and the flagship entry is non-empty — the invariants the
  * driver's smoke/correctness gates assume.
  */
class ContractSpec extends SparkSpec {

  test("every queries entry runs and returns rows at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sf).count()
        spark.catalog.clearCache()
        if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with empty results: $empty")
  }

  test("oracleSql keys are a subset of queries keys") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without a query: $orphans")
  }

  test("every query is oracle-checked (full coverage, no rows-only)") {
    // the plan/infra audits surface PHYSICAL-plan or session-registry
    // facts (shuffle-exchange count, finalized AQE partition count,
    // the injected SQL-function surface) that have no DuckDB
    // restatement — the consciously-allowed rows-only exceptions; their
    // strict asserts live in SourcesSpec / AqeSpec / ExtensionsSpec
    val rowsOnlyAllowed = Set("bucketed_join_audit", "aqe_coalesce_audit",
      "sql_extensions_audit")
    val unoracled = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- rowsOnlyAllowed
    assert(unoracled.isEmpty,
      s"queries without a DuckDB oracle: $unoracled — add one, or " +
        "consciously relax this guard for a genuinely non-SQL operator")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
