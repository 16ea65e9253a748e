package graft

import org.apache.spark.sql.functions._

/** stream_session_native grades the real `session_window` expression
  * against the lag+cumsum twin's SQL oracle. That only works if the two
  * agree at the EXACT gap boundary, which floored integer seconds do hit:
  * the twin keeps gap <= 1800 in one session (new session iff gap > 1800),
  * so session_window must MERGE an event that starts exactly at the
  * previous window's end (prev_ts + 1800). This spec pins that convention
  * — if a Spark upgrade ever flips the boundary to strict overlap, the
  * graded key must switch its gap to 1801 seconds (equivalent on integer
  * seconds) and this test is the tripwire. */
class SessionNativeBoundarySpec extends SparkSpec {

  private def sessions(gaps: Seq[Long]): Long = {
    // one user; event k at cumulative offset sum(gaps.take(k))
    val ts = gaps.scanLeft(100000L)(_ + _)
    import spark.implicits._
    ts.toDF("te")
      .groupBy(session_window(timestamp_seconds(col("te")), "30 minutes"))
      .count()
      .count()
  }

  test("session_window merges at gap == 1800 s and splits at 1801 s (the twin's convention)") {
    assert(sessions(Seq(1799L)) == 1)
    assert(sessions(Seq(1800L)) == 1, "gap == 1800 must stay ONE session")
    assert(sessions(Seq(1801L)) == 2, "gap == 1801 must split")
    assert(sessions(Seq(1800L, 1800L, 1801L, 5L)) == 2)
  }

  test("native session key equals the lag+cumsum twin on the graded corpus") {
    val twin = SparkEntry.queries("stream_session")(spark, sfDir).collect().toSeq
    val native = SparkEntry.queries("stream_session_native")(spark, sfDir).collect().toSeq
    assert(native == twin)
  }
}
