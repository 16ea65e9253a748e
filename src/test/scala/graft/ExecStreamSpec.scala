package graft

/** stream_exec_tumble: the executed-streaming key (StreamTwins) must (a)
  * reproduce the batch twin exactly — micro-batch execution, watermark
  * path and memory sink included — and (b) survive re-invocation in one
  * session (DeterminismSpec re-runs keys; the memory sink name must not
  * collide with the terminated first query). */
class ExecStreamSpec extends SparkSpec {

  test("executed streaming equals the batch twin and re-invokes cleanly") {
    val batch = SparkEntry.queries("stream_tumble")(spark, sfDir).collect().toSeq
    val exec1 = SparkEntry.queries("stream_exec_tumble")(spark, sfDir).collect().toSeq
    assert(exec1.nonEmpty, "sink populated")
    assert(exec1 == batch, "executed == batch twin")
    val exec2 = SparkEntry.queries("stream_exec_tumble")(spark, sfDir).collect().toSeq
    assert(exec2 == batch, "second invocation in the same session")
  }

  test("executed session windows equal the sessionization twin, twice") {
    val batch = SparkEntry.queries("stream_session")(spark, sfDir).collect().toSeq
    val exec1 = SparkEntry.queries("stream_exec_session")(spark, sfDir).collect().toSeq
    assert(exec1.nonEmpty, "sink populated")
    assert(exec1 == batch, "merging session state == lag+cumsum twin")
    val exec2 = SparkEntry.queries("stream_exec_session")(spark, sfDir).collect().toSeq
    assert(exec2 == batch, "second invocation in the same session")
  }

  test("executed stream-stream interval join equals the batch twin, twice") {
    val batch = SparkEntry.queries("stream_interval_join")(spark, sfDir).collect().toSeq
    val exec1 = SparkEntry.queries("stream_exec_join")(spark, sfDir).collect().toSeq
    assert(exec1.nonEmpty, "sink populated")
    assert(exec1 == batch, "buffered two-sided join state == batch twin")
    val exec2 = SparkEntry.queries("stream_exec_join")(spark, sfDir).collect().toSeq
    assert(exec2 == batch, "second invocation in the same session")
  }
}
