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

  test("executed sliding windows equal the offset-explode twin, twice") {
    import org.apache.spark.sql.functions._
    // the batch twin carries (event_type, win_start, n); project the
    // executed key down to the shared columns for the comparison
    val batch = SparkEntry.queries("stream_slide")(spark, sfDir).collect().toSeq
    def exec() = SparkEntry.queries("stream_exec_slide")(spark, sfDir)
      .select(col("event_type"), col("win_start"), col("n"))
      .collect().toSeq
    val exec1 = exec()
    assert(exec1.nonEmpty, "sink populated")
    assert(exec1 == batch, "real window() assignment == offset explode")
    assert(exec() == batch, "second invocation in the same session")
  }

  test("executed Update-mode history matches the scalar emission law, twice") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"), unix_timestamp(col("ts")).as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val mirror = ev.groupBy(e => (e._1, e._3 / 86400 * 86400)).map { case (k, xs) =>
      val n1 = xs.count(_._2 % 5 == 0).toLong
      val n2 = xs.count(_._2 % 5 != 0).toLong
      val nf = xs.length.toLong
      k -> (if (n1 > 0 && n2 > 0) 2L else 1L,
        nf + (if (n1 > 0 && n2 > 0) n1 else 0L), nf)
    }
    def run() = SparkEntry.queries("stream_exec_update_history")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val got = run()
    assert(got == mirror, "history == the two-batch emission law")
    // both shapes occur: some groups updated once, some twice
    assert(got.values.exists(_._1 == 1L) && got.values.exists(_._1 == 2L))
    assert(run() == mirror, "second invocation in the same session")
  }

  test("executed session windows equal the sessionization twin, twice") {
    val batch = SparkEntry.queries("stream_session")(spark, sfDir).collect().toSeq
    val exec1 = SparkEntry.queries("stream_exec_session")(spark, sfDir).collect().toSeq
    assert(exec1.nonEmpty, "sink populated")
    assert(exec1 == batch, "merging session state == lag+cumsum twin")
    val exec2 = SparkEntry.queries("stream_exec_session")(spark, sfDir).collect().toSeq
    assert(exec2 == batch, "second invocation in the same session")
  }

  test("executed flatMapGroupsWithState equals the per-user aggregate, twice") {
    import org.apache.spark.sql.functions._
    val batch = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1e6 + 0.5).cast("long")).as("sum_val"))
      .orderBy("user_id").collect().toSeq
    val exec1 = SparkEntry.queries("stream_exec_fmgws")(spark, sfDir).collect().toSeq
    assert(exec1.nonEmpty, "sink populated")
    assert(exec1 == batch, "custom state fold == per-user aggregate")
    val exec2 = SparkEntry.queries("stream_exec_fmgws")(spark, sfDir).collect().toSeq
    assert(exec2 == batch, "second invocation in the same session")
  }

  test("executed checkpoint restart recovers state and skips committed files") {
    val batch = SparkEntry.queries("stream_tumble")(spark, sfDir).collect().toSeq
    val exec1 = SparkEntry.queries("stream_exec_restart")(spark, sfDir).collect().toSeq
    assert(exec1.nonEmpty, "sink populated")
    // equality against the ALL-events twin is the recovery proof: lost
    // state halves the counts, a re-read first file doubles them
    assert(exec1 == batch, "restarted query == all-events batch twin")
    val exec2 = SparkEntry.queries("stream_exec_restart")(spark, sfDir).collect().toSeq
    assert(exec2 == batch, "second invocation in the same session")
  }

  test("executed watermark late-drop matches the scalar kept-law, twice") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("stream_exec_late")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def s6v(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"),
        unix_timestamp(col("ts")).as("te"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val sent = ev.map(e => (e._3, e._2)).min._2
    val wmA = ev.filter(e => e._2 % 2 == 0 && e._2 != sent).map(_._3).max - 3600
    val kept = ev.filter(e => e._2 % 2 == 0 || e._2 == sent
      || (e._3 / 3600) * 3600 + 3600 > wmA)
    val mirror = kept.groupBy(e => (e._1, (e._3 / 3600) * 3600))
      .map { case ((t, w), xs) =>
        (t, w, xs.length.toLong, xs.map(x => s6v(x._4)).sum) }
      .toSeq.sortBy(x => (x._1, x._2))
    assert(got.toSeq == mirror, "executed == scalar kept-law")
    assert(kept.length < ev.length, "the watermark actually dropped rows")
    val again = SparkEntry.queries("stream_exec_late")(spark, sfDir)
      .collect().length
    assert(again == got.length, "second invocation in the same session")
  }

  test("executed stream-stream interval join equals the batch twin, twice") {
    val batch = SparkEntry.queries("stream_interval_join")(spark, sfDir).collect().toSeq
    val exec1 = SparkEntry.queries("stream_exec_join")(spark, sfDir).collect().toSeq
    assert(exec1.nonEmpty, "sink populated")
    assert(exec1 == batch, "buffered two-sided join state == batch twin")
    val exec2 = SparkEntry.queries("stream_exec_join")(spark, sfDir).collect().toSeq
    assert(exec2 == batch, "second invocation in the same session")
  }

  test("executed event-time timeout matches the scalar emission law, twice") {
    import org.apache.spark.sql.functions._
    // scalar mirror of the three-lane law: batch-2 timeouts vs W1 (the
    // one-batch watermark lag), flush-batch timeouts vs W2, survivors
    // emit nothing; values fold over everything the state absorbed
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("te"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val (mn, mx) = (ev.map(_._2).min, ev.map(_._2).max)
    val tm = Math.floorDiv(mn + mx, 2L)
    val a = ev.filter(_._2 <= tm)
    val b = ev.filter(r => r._2 > tm && r._1 % 3 == 0)
    val w1 = a.map(_._2).max - 3600
    val w2 = b.map(_._2).max - 3600
    def s6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val ag = a.groupBy(_._1).map { case (u, xs) =>
      u -> ((xs.length.toLong, xs.map(r => s6d(r._3)).sum, xs.map(_._2).max)) }
    val bg = b.groupBy(_._1).map { case (u, xs) =>
      u -> ((xs.length.toLong, xs.map(r => s6d(r._3)).sum, xs.map(_._2).max)) }
    val expect = (ag.keySet ++ bg.keySet).toSeq.sorted.flatMap { u =>
      val (na, sa, ma) = ag.getOrElse(u, (0L, 0L, Long.MinValue))
      val (nb, sb, mb) = bg.getOrElse(u, (0L, 0L, Long.MinValue))
      val fired =
        if (!bg.contains(u)) ma + 86400 < w1 || ma + 86400 < w2
        else mb + 86400 < w2
      if (fired) Some((u, na + nb, sa + sb)) else None
    }
    def run() = SparkEntry.queries("stream_exec_timeout")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = run()
    assert(got.nonEmpty && got == expect, s"got $got\nexpect $expect")
    assert(run() == expect, "second invocation in the same session")
  }

  test("executed initial-state seeding equals the merged snapshot+stream fold, twice") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("te"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val (mn, mx) = (ev.map(_._2).min, ev.map(_._2).max)
    val tm = Math.floorDiv(mn + mx, 2L)
    def s6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    // only users with SECOND-half (stream) rows emit — the snapshot
    // alone never invokes the function — and they emit the FULL fold
    val streamUsers = ev.filter(_._2 > tm).map(_._1).toSet
    val expect = ev.filter(e => streamUsers(e._1)).groupBy(_._1).toSeq
      .map { case (u, xs) => (u, xs.length.toLong, xs.map(e => s6d(e._3)).sum) }
      .sortBy(_._1)
    def run() = SparkEntry.queries("stream_exec_istate")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = run()
    assert(got.nonEmpty && got == expect, s"got ${got.take(3)}…\nexpect ${expect.take(3)}…")
    // the snapshot genuinely contributes: some emitted user carries
    // more rows than its stream share alone
    val sndCounts = ev.filter(_._2 > tm).groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(got.exists { case (u, n, _) => n > sndCounts(u) }, "snapshot never merged")
    assert(run() == expect, "second invocation in the same session")
  }

  test("executed transformWithState round-trips two state variables, twice") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("te"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val (mn, mx) = (ev.map(_._2).min, ev.map(_._2).max)
    val tm = Math.floorDiv(mn + mx, 2L)
    def s6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val a = ev.filter(_._2 <= tm)
    val b = ev.filter(e => e._2 > tm && e._1 % 3 == 0)
    val aUsers = a.map(_._1).toSet
    val e1 = a.groupBy(_._1).toSeq.map { case (u, xs) =>
      (u, 1L, xs.length.toLong, xs.map(e => s6d(e._3)).sum) }
    val bUsers = b.map(_._1).toSet
    val e2 = (a.filter(e => bUsers(e._1)) ++ b).groupBy(_._1).toSeq.map {
      case (u, xs) =>
        (u, if (aUsers(u)) 2L else 1L, xs.length.toLong,
          xs.map(e => s6d(e._3)).sum)
    }
    val expect = (e1 ++ e2).sortBy(t => (t._1, t._2))
    def run() = SparkEntry.queries("stream_exec_tws")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val got = run()
    assert(got.nonEmpty && got == expect,
      s"got ${got.take(3)}…\nexpect ${expect.take(3)}…")
    // the ValueState genuinely persisted across micro-batches: every
    // second-invocation fold strictly extends the same user's first
    assert(got.exists(_._2 == 2L), "no second-batch emission")
    val firstN = got.filter(_._2 == 1L).map(t => t._1 -> t._3).toMap
    assert(got.filter(_._2 == 2L).forall(t => t._3 > firstN(t._1)),
      "batch-2 fold did not extend batch-1 state")
    // the RocksDB provider swap was restored after the run
    val prov = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    assert(!prov.exists(_.contains("RocksDB")), "provider conf leaked")
    assert(run() == expect, "second invocation in the same session")
  }

  test("executed v2-API timers fire once per key with the full staged fold, twice") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("te"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val (mn, mx) = (ev.map(_._2).min, ev.map(_._2).max)
    val tm = Math.floorDiv(mn + mx, 2L)
    def s6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val staged = ev.filter(e => e._2 <= tm || (e._2 > tm && e._1 % 3 == 0))
    val expect = staged.groupBy(_._1).toSeq
      .map { case (u, xs) => (u, xs.length.toLong, xs.map(e => s6d(e._3)).sum) }
      .sortBy(_._1)
    def run() = SparkEntry.queries("stream_exec_tws_timer")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = run()
    // exactly one timer emission per staged key, each the complete fold
    // (data-before-timers batch ordering + the empty-state guard)
    assert(got.nonEmpty && got == expect,
      s"got ${got.take(3)}…\nexpect ${expect.take(3)}…")
    assert(got.map(_._1).distinct.size == got.size, "a key emitted twice")
    assert(run() == expect, "second invocation in the same session")
  }

  test("executed v2-API TTL state expires between batches, twice") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("te"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val (mn, mx) = (ev.map(_._2).min, ev.map(_._2).max)
    val tm = Math.floorDiv(mn + mx, 2L)
    def s6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val a = ev.filter(_._2 <= tm)
    val b = ev.filter(e => e._2 > tm && e._1 % 3 == 0)
    def fold(xs: Seq[(Long, Long, Double)]) = xs.groupBy(_._1).toSeq
      .map { case (u, ys) => (u, ys.length.toLong, ys.map(y => s6d(y._3)).sum) }
    val expect = (fold(a.toSeq) ++ fold(b.toSeq)).sortBy(t => (t._1, t._2, t._3))
    def run() = SparkEntry.queries("stream_exec_tws_ttl")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = run()
    assert(got.nonEmpty && got == expect,
      s"got ${got.take(3)}…\nexpect ${expect.take(3)}…")
    // the PROOF the TTL fired: every B-user's second emission is its
    // batch-2 share ALONE — the un-TTL'd tws key would emit the merged
    // A∪B fold for the same user, a strictly larger n
    val bFolds = fold(b.toSeq).map(t => t._1 -> t._2).toMap
    val aFolds = fold(a.toSeq).map(t => t._1 -> t._2).toMap
    bFolds.foreach { case (u, nb) =>
      val second = got.filter(_._1 == u).map(_._2).sorted
      assert(second.contains(nb), s"user $u batch-2 fold missing")
      aFolds.get(u).filter(_ > 0).foreach(na =>
        assert(!second.contains(na + nb), s"user $u state survived the TTL"))
    }
    assert(run() == expect, "second invocation in the same session")
  }
}
