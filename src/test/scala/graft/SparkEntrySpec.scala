package graft

/** Driver-contract invariants: the exact properties the round harness
  * relies on (smoke entry, query map shape, oracle key subset). */
class SparkEntrySpec extends SparkSpec {

  test("query names are unique, well-formed, and match the declared defs") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(SparkEntry.queries.size == names.size)
    names.foreach(n => assert(n.matches("[a-z0-9_]+"), s"bad name: $n"))
  }

  test("every oracle key has a query implementation") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("oracle SQL is non-empty with balanced quotes") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, name)
      assert(sql.count(_ == '\'') % 2 == 0, s"$name: unbalanced quotes")
    }
  }

  test("entry (flagship smoke) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
