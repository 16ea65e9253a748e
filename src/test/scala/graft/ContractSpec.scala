package graft

/** Driver-contract invariants (SURVEY §0.3). */
class ContractSpec extends SparkSpec {

  test("every oracle key has a query implementation") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("registry names are unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size,
      names.groupBy(identity).filter(_._2.size > 1).keys.toSeq.toString)
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL stays single-line printable ASCII (Verify JSON escape)") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.exists(c => c < ' ' || c > '~'), s"$k has control/non-ascii chars")
    }
  }
}
