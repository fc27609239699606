package graft

/** The driver's contract: entry() returns rows, every oracle key has a
  * query, names match, and each registered query at least produces a
  * non-empty schema at the smallest SF. */
class DriverContractSpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("query names are unique across domain objects") {
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("all queries run and return rows at sf0.001") {
    val empty = SparkEntry.allDefs.flatMap { d =>
      val n = d.fn(spark, sfDir).count()
      if (n == 0) Some(d.name) else None
    }
    assert(empty.isEmpty, s"queries with 0 rows: $empty")
  }
}
