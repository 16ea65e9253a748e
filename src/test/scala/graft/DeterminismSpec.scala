package graft

/** Runs EVERY registered key twice on sf0.001 and asserts identical
  * collected rows — catches Spark-internal nondeterminism (under-specified
  * ORDER BY, unstable aggregation ties) that the cross-engine oracle can
  * mask. The oracle gate covers cross-engine agreement; this covers
  * run-to-run stability. */
class DeterminismSpec extends SparkSpec {

  test("every registered query is run-to-run deterministic at sf0.001") {
    val flaky = SparkEntry.registry.flatMap { q =>
      val a = q.fn(spark, sfDir).collect().toSeq
      val b = q.fn(spark, sfDir).collect().toSeq
      if (a == b) None else Some(q.name)
    }
    assert(flaky.isEmpty, s"nondeterministic keys: $flaky")
  }
}
