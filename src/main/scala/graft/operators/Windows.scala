package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Q, Tables => T}
import Det._

/** SURVEY.md §3.5: window functions.
  *
  * All windows partition by o_custkey / c_custkey — at 100 TB this is the
  * natural shuffle key (bounded partition sizes: orders-per-customer), never
  * an unpartitioned global window. Frame sums accumulate integer cents
  * (Det.s2 elements) so the engine's incremental frame evaluation order
  * can't perturb the result; moving averages divide an exact integer
  * frame-sum by the frame count rather than trusting a sliding double
  * accumulator. Value-copy outputs (lag/lead/first/nth) project scaled
  * longs of the copied value (Det scaladoc rule 1).
  * Reference analogue: per-pixel rolling temporal composites (xarray.rolling).
  */
object Windows {

  private val byCust = Window.partitionBy("o_custkey")
  private val custDateKey =
    byCust.orderBy(col("o_orderdate"), col("o_orderkey"))

  val all: Seq[Q] = Seq(

    Q("win_rownum", Some(
      "SELECT o_custkey, o_orderkey, CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey) AS INT) AS rn FROM orders " +
        "ORDER BY o_custkey, rn"),
      (s, d) =>
        T.orders(s, d)
          .withColumn("rn", row_number().over(custDateKey))
          .select("o_custkey", "o_orderkey", "rn")
          .orderBy("o_custkey", "rn")),

    Q("win_rank", Some(
      "SELECT o_custkey, o_orderkey, " +
        "CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)) AS INT) AS rk, " +
        "CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)) AS INT) AS drk " +
        "FROM orders ORDER BY o_custkey, rk, o_orderkey"),
      (s, d) => {
        val w = byCust.orderBy(to_date(col("o_orderdate")))
        T.orders(s, d)
          .withColumn("rk", rank().over(w))
          .withColumn("drk", dense_rank().over(w))
          .select("o_custkey", "o_orderkey", "rk", "drk")
          .orderBy("o_custkey", "rk", "o_orderkey")
      }),

    // Global quartiles WITHOUT the single-partition global window sort
    // (`ntile(4).over(Window.orderBy(...))` moves the whole table to one
    // task — the r6 "No Partition Defined for Window" scale flag). The
    // scale-safe form: range-repartition on the sort key (each partition
    // holds a contiguous key range), compute per-partition row counts
    // (32-row collect), broadcast the cumulative offsets back, global
    // row number = offset + per-partition local row_number, and NTILE
    // becomes closed-form arithmetic over (rn, N) — the same larger-
    // buckets-first distribution the SQL NTILE defines. Every stage is
    // distributed; the only driver data is one row per partition.
    // BUILD-TIME SIDE EFFECT: the two-pass form necessarily runs the
    // range shuffle + count jobs EAGERLY when the query is built (the
    // offsets are data), and the persisted range stays cached until the
    // harness's per-key clearCache (Bench/Verify) — callers embedding
    // this in a long-lived session should clearCache or unpersist.
    Q("win_ntile", Some(
      "SELECT c_custkey, CAST(NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS INT) AS quartile " +
        "FROM customer ORDER BY c_custkey"),
      (s, d) => {
        val sortCols = Seq(col("c_acctbal"), col("c_custkey"))
        val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
        val ranged = T.customer(s, d)
          .repartitionByRange(parts, sortCols: _*)
          .withColumn("_pid", spark_partition_id())
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // one row per partition: (pid, rows) -> cumulative start offsets
        val counts = ranged.groupBy("_pid").count().collect()
          .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
        val n = counts.map(_._2).sum
        val offs = counts.map(_._1).zip(
          counts.scanLeft(0L)(_ + _._2).dropRight(1))
        val offsDf = s.createDataFrame(offs.toSeq).toDF("_pid", "_off")
        // rn = global rank; tile sizes: ceil(n/4) for the first n%4
        // tiles, floor(n/4) after (the SQL NTILE contract)
        val q = n / 4
        val r = n % 4
        val cut = r * (q + 1)
        // true 64-bit integer division (`div`), not Column `/`: IEEE double
        // division + trunc equals floor only below 2^53 rows — `div` has no
        // such bound (ADVICE r7)
        ranged.join(broadcast(offsDf), "_pid")
          .withColumn("_rn", col("_off") +
            row_number().over(Window.partitionBy("_pid").orderBy(sortCols: _*)))
          .withColumn("quartile",
            when(col("_rn") <= cut, expr(s"(_rn - 1) div ${q + 1}") + 1)
              .otherwise(lit(r) + expr(s"(_rn - 1 - $cut) div ${math.max(q, 1L)}") + 1)
              .cast("int"))
          .select("c_custkey", "quartile")
          .orderBy("c_custkey")
      }),

    Q("win_lag_lead", Some(
      "SELECT o_custkey, o_orderkey, " +
        sqlS6("o_totalprice - LAG(o_totalprice) OVER (PARTITION BY o_custkey " +
          "ORDER BY o_orderdate, o_orderkey)") + " AS delta_prev, " +
        sqlS6("LEAD(o_totalprice) OVER (PARTITION BY o_custkey " +
          "ORDER BY o_orderdate, o_orderkey) - o_totalprice") + " AS delta_next " +
        "FROM orders ORDER BY o_custkey, o_orderkey, delta_prev NULLS FIRST, delta_next NULLS FIRST"),
      (s, d) =>
        T.orders(s, d)
          .withColumn("delta_prev",
            s6(col("o_totalprice") - lag("o_totalprice", 1).over(custDateKey)))
          .withColumn("delta_next",
            s6(lead("o_totalprice", 1).over(custDateKey) - col("o_totalprice")))
          .select("o_custkey", "o_orderkey", "delta_prev", "delta_next")
          .orderBy(col("o_custkey"), col("o_orderkey"),
            col("delta_prev").asc_nulls_first, col("delta_next").asc_nulls_first)),

    Q("win_runsum", Some(
      "SELECT o_custkey, o_orderkey, CAST(SUM(" + sqlS2("o_totalprice") + ") OVER (" +
        "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_rev " +
        "FROM orders ORDER BY o_custkey, o_orderkey, run_rev"),
      (s, d) =>
        T.orders(s, d)
          .withColumn("run_rev",
            sum(s2(col("o_totalprice")))
              .over(custDateKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select("o_custkey", "o_orderkey", "run_rev")
          .orderBy("o_custkey", "o_orderkey", "run_rev")),

    Q("win_movavg", Some(
      "SELECT o_custkey, o_orderkey, " +
        "CAST(FLOOR(CAST(SUM(" + sqlS2("o_totalprice") + ") OVER w AS DOUBLE) " +
        "* 1e4 / (COUNT(*) OVER w) + 0.5) AS BIGINT) AS mov3 " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) ORDER BY o_custkey, o_orderkey, mov3"),
      (s, d) => {
        val w = custDateKey.rowsBetween(-2, Window.currentRow)
        T.orders(s, d)
          .withColumn("mov3",
            floor(sum(s2(col("o_totalprice"))).over(w).cast("double")
              * lit(1e4) / count(lit(1)).over(w) + lit(0.5)).cast("long"))
          .select("o_custkey", "o_orderkey", "mov3")
          .orderBy("o_custkey", "o_orderkey", "mov3")
      }),

    Q("win_rangeframe", Some(
      "SELECT o_custkey, o_orderkey, " +
        "CAST(COUNT(*) OVER w AS BIGINT) AS n_near, " +
        "CAST(SUM(" + sqlS2("o_totalprice") + ") OVER w AS BIGINT) AS sum_near " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice " +
        "RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) " +
        "ORDER BY o_custkey, o_orderkey, n_near, sum_near"),
      (s, d) => {
        val w = byCust.orderBy(col("o_totalprice")).rangeBetween(-1000, 1000)
        T.orders(s, d)
          .withColumn("n_near", count(lit(1)).over(w))
          .withColumn("sum_near", sum(s2(col("o_totalprice"))).over(w))
          .select("o_custkey", "o_orderkey", "n_near", "sum_near")
          .orderBy("o_custkey", "o_orderkey", "n_near", "sum_near")
      }),

    Q("win_firstlast", Some(
      "SELECT o_custkey, o_orderkey, " +
        sqlS2("(FIRST_VALUE(o_totalprice) OVER w)") + " AS first_price, " +
        sqlS2("(LAST_VALUE(o_totalprice) OVER w)") + " AS last_price " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "ORDER BY o_custkey, o_orderkey, first_price, last_price"),
      (s, d) => {
        val w = custDateKey.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        T.orders(s, d)
          .withColumn("first_price", s2(first("o_totalprice").over(w)))
          .withColumn("last_price", s2(last("o_totalprice").over(w)))
          .select("o_custkey", "o_orderkey", "first_price", "last_price")
          .orderBy("o_custkey", "o_orderkey", "first_price", "last_price")
      }),

    // OHLC bar resampling (round 10) — the market-bar shape of every
    // time-series store: per (event_type, day) the open / high / low /
    // close of the s6-scaled value plus the tick count. Open/close are
    // picked by STRUCT ordering over the composite (t, event_id) key
    // on BOTH engines (VERDICT r11: the former oracle packed
    // t*1e8+event_id arithmetically, silently corrupting if an
    // event_id ≥ 1e8 ever entered a corpus; DuckDB's MIN/MAX over a
    // named struct orders lexicographically like Spark's min_by/max_by
    // over struct(t, tie), with no magnitude bound). event_id is
    // corpus-unique, so picks are tie-free. Thin instantiation of
    // analytics.Timeseries.ohlc: ONE keyed partial agg — bytes
    // shuffled scale with bars, not ticks, the aggregation-pushdown
    // story a 100 TB tick archive needs (no window function anywhere
    // in the plan).
    Q("win_ohlc", Some(
      "WITH d AS (SELECT event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t, " +
        "event_id, " + sqlS6("value") + " AS v6 FROM events) " +
        "SELECT event_type AS symbol, CAST(FLOOR(t / 86400.0) AS BIGINT) AS bar, " +
        "(MIN({'t': t, 'tie': event_id, 'v': v6})).v AS open6, " +
        "MAX(v6) AS high6, MIN(v6) AS low6, " +
        "(MAX({'t': t, 'tie': event_id, 'v': v6})).v AS close6, " +
        "CAST(COUNT(*) AS BIGINT) AS n_ticks " +
        "FROM d GROUP BY symbol, bar ORDER BY symbol, bar"),
      (s, d) =>
        graft.analytics.Timeseries.ohlc(T.events(s, d), col("event_type"),
            epochS(col("ts")), col("event_id"), s6(col("value")), 86400L)
          .orderBy("symbol", "bar")),

    Q("win_nthvalue", Some(
      "SELECT o_custkey, o_orderkey, " +
        sqlS2("(NTH_VALUE(o_totalprice, 2) OVER w)") + " AS second_price " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "ORDER BY o_custkey, o_orderkey, second_price NULLS FIRST"),
      (s, d) => {
        val w = custDateKey.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        T.orders(s, d)
          .withColumn("second_price", s2(nth_value(col("o_totalprice"), 2).over(w)))
          .select("o_custkey", "o_orderkey", "second_price")
          .orderBy(col("o_custkey"), col("o_orderkey"), col("second_price").asc_nulls_first)
      }),

    // percent_rank/cume_dist are single ratios of window-local integers —
    // one IEEE divide, engine-identical (Det rule 3), then s6-projected.
    Q("win_pctrank", Some(
      "SELECT o_custkey, o_orderkey, " +
        sqlS6("(PERCENT_RANK() OVER w)") + " AS pct_rk, " +
        sqlS6("(CUME_DIST() OVER w)") + " AS cume " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) " +
        "ORDER BY o_custkey, o_orderkey, pct_rk, cume"),
      (s, d) => {
        val w = byCust.orderBy(col("o_totalprice"), col("o_orderkey"))
        T.orders(s, d)
          .withColumn("pct_rk", s6(percent_rank().over(w)))
          .withColumn("cume", s6(cume_dist().over(w)))
          .select("o_custkey", "o_orderkey", "pct_rk", "cume")
          .orderBy("o_custkey", "o_orderkey", "pct_rk", "cume")
      }),

    // Gaps-and-islands sessionization in batch (the classic lag + step-sum
    // rewrite): a new session starts after a >600 s silence; per-user
    // session count and largest-session size. Time is whole epoch seconds
    // (engine-identical, Det.epochS); (t, event_id) orders ties away.
    Q("win_gaps_islands", Some(
      "WITH d AS (SELECT user_id, event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t FROM events), " +
        "flagged AS (SELECT user_id, event_id, t, " +
        "CASE WHEN t - LAG(t) OVER w > 600 OR LAG(t) OVER w IS NULL THEN 1 ELSE 0 END AS new_s " +
        "FROM d WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), " +
        "sess AS (SELECT user_id, event_id, " +
        "SUM(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id " +
        "ROWS UNBOUNDED PRECEDING) AS sid FROM flagged), " +
        "per AS (SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_events " +
        "FROM sess GROUP BY user_id, sid) " +
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions, " +
        "MAX(n_events) AS max_session_events " +
        "FROM per GROUP BY user_id ORDER BY user_id"),
      // thin instantiation of the user-facing API (round 10): the
      // sessionization itself lives in analytics.Sessionize.sessions
      (s, d) => graft.analytics.Sessionize.sessions(
        T.events(s, d)
          .select(col("user_id"), col("event_id"), epochS(col("ts")).as("t")),
        "user_id", "t", "event_id", 600)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          max(col("n_events")).as("max_session_events"))
        .orderBy("user_id")),

    // Per-entity session statistics (round 10) — the engagement-duration
    // rollup every product-analytics stack reports next to the session
    // count (avg session length, total time-on-site): the SAME
    // Sessionize.sessions API call as win_gaps_islands, aggregated on
    // durations instead of event counts — written as a ≤10-line
    // instantiation of the user-facing API (VERDICT r9 "missing" #5).
    // Durations are exact integer seconds; the mean is ONE IEEE divide
    // of exact longs (Det rule 3), s6-floored. Single-event sessions
    // contribute 0 s, identically on both engines. One entity-keyed
    // shuffle end-to-end at any scale.
    Q("win_session_stats", Some(
      "WITH d AS (SELECT user_id, event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t FROM events), " +
        "flagged AS (SELECT user_id, event_id, t, " +
        "CASE WHEN t - LAG(t) OVER w > 600 OR LAG(t) OVER w IS NULL THEN 1 ELSE 0 END AS new_s " +
        "FROM d WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), " +
        "sess AS (SELECT user_id, t, " +
        "SUM(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id " +
        "ROWS UNBOUNDED PRECEDING) AS sid FROM flagged), " +
        "per AS (SELECT user_id, sid, MAX(t) - MIN(t) AS dur " +
        "FROM sess GROUP BY user_id, sid) " +
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions, " +
        "CAST(SUM(dur) AS BIGINT) AS total_dur_s, " +
        sqlS6("CAST(SUM(dur) AS DOUBLE) / COUNT(*)") + " AS mean_dur6 " +
        "FROM per GROUP BY user_id ORDER BY user_id"),
      (s, d) => graft.analytics.Sessionize.sessions(
        T.events(s, d)
          .select(col("user_id"), col("event_id"), epochS(col("ts")).as("t")),
        "user_id", "t", "event_id", 600)
        .select(col("user_id"), (col("t_end") - col("t_start")).as("dur"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("dur")).as("total_dur_s"),
          s6(sum(col("dur")).cast("double") / count(lit(1))).as("mean_dur6"))
        .orderBy("user_id")),

    // Per-entity z-score standardization — the feature-normalization op
    // every ML feature pipeline runs before training: each event's value
    // standardized against ITS USER's distribution. The agg_stats moment
    // discipline moved into a window: v = s6(value) exact longs, window
    // partials n/Σv/Σv² exact integer window sums over the user
    // partition, then ONE fixed double sequence per row (sample
    // variance), s6-projected. v is CENT-scaled (s2), not s6: squares
    // of s6 values would overflow the 63-bit window sums at ~10 rows
    // (and DuckDB widens SUM(BIGINT) to HUGEINT where Spark wraps, so
    // overflow would also DIVERGE, not just lose precision); s2 keeps
    // 2^63/(max_cents^2) ~ 10^9 rows/user of headroom and z-scores are
    // scale-invariant, so the statistic is unchanged. Degenerate
    // partitions (n < 2 or zero
    // variance) emit NULL, spelled identically in both engines.
    // Entity-bounded: user partitions scale with per-user history.
    Q("win_zscore", Some(
      "WITH v AS (SELECT event_id, user_id, " + sqlS2("value") + " AS vi FROM events), " +
        "m AS (SELECT event_id, user_id, vi, " +
        "CAST(COUNT(*) OVER w AS BIGINT) AS n, " +
        "CAST(SUM(vi) OVER w AS BIGINT) AS sv, " +
        "CAST(SUM(vi * vi) OVER w AS BIGINT) AS svv " +
        "FROM v WINDOW w AS (PARTITION BY user_id)) " +
        "SELECT event_id, user_id, " +
        "CASE WHEN n < 2 OR CAST(n AS DOUBLE) * CAST(svv AS DOUBLE) - " +
        "CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) <= 0.0 THEN NULL ELSE " +
        sqlS6("(CAST(vi AS DOUBLE) - CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)) / " +
          "SQRT((CAST(n AS DOUBLE) * CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)) / " +
          "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))") +
        " END AS z6 FROM m ORDER BY event_id"),
      (s, d) =>
        // thin instantiation of the promoted analytics API (round 10):
        // the exact-moment z-score lives in analytics.Anomalies
        graft.analytics.Anomalies.groupZscore(
            T.events(s, d), "user_id", "event_id", "value")
          .select(col("event_id"), col("user_id"), col("z6"))
          .orderBy("event_id")),

    // SCD2 history build — the slowly-changing-dimension type-2
    // materialization every warehouse runs over a CDC change stream:
    // compress consecutive same-state observations per entity into one
    // validity interval [valid_from, valid_to), open-ended + flagged on
    // the current state. Two window passes, both entity-partitioned:
    // lag(state) finds the change points, lead(t) OVER THE CHANGE ROWS
    // closes each interval with the next change's start. Whole epoch
    // seconds (Det.epochS), (t, event_id) orders ties away.
    Q("win_scd2", Some(
      "WITH d AS (SELECT user_id, event_id, event_type AS state, " +
        "CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t FROM events), " +
        "chg AS (SELECT user_id, event_id, state, t, " +
        "CASE WHEN LAG(state) OVER w IS NULL OR LAG(state) OVER w <> state THEN 1 ELSE 0 END AS is_chg " +
        "FROM d WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), " +
        "iv AS (SELECT user_id, state, t AS valid_from, " +
        "LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS valid_to " +
        "FROM chg WHERE is_chg = 1) " +
        "SELECT user_id, state, valid_from, valid_to, " +
        "CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS INT) AS is_current " +
        // valid_to completes the total order: a same-state re-entry
        // within one floored second yields two rows tying on (user,
        // valid_from, state) — any rows still tying after valid_to are
        // bit-identical, so produced order can't diverge. NULLS FIRST
        // spelled on both sides (DuckDB defaults NULLS LAST, Spark FIRST).
        "FROM iv ORDER BY user_id, valid_from, state, valid_to NULLS FIRST"),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
        val chg = T.events(s, d)
          .select(col("user_id"), col("event_id"),
            col("event_type").as("state"), epochS(col("ts")).as("t"))
          .withColumn("is_chg",
            when(lag(col("state"), 1).over(w).isNull ||
              lag(col("state"), 1).over(w) =!= col("state"), 1).otherwise(0))
          .where(col("is_chg") === 1)
        chg
          .withColumn("valid_to", lead(col("t"), 1).over(w))
          .select(col("user_id"), col("state"), col("t").as("valid_from"),
            col("valid_to"),
            when(col("valid_to").isNull, 1).otherwise(0).cast("int").as("is_current"))
          .orderBy(col("user_id"), col("valid_from"), col("state"),
            col("valid_to").asc_nulls_first)
      }),

    // Exponentially-weighted moving average (the pandas `ewm` / time-series
    // smoothing op) in its DYADIC-EXACT finite form: alpha = 1/2 over the
    // last 8 observations, so the weight of lag k is 2^-(k+1) and the
    // NUMERATOR sum_{k} lag(v,k) * 2^(7-k) is exact integer math on both
    // engines (v = user_id, an integer). Rows with fewer than 8 priors
    // renormalize over the weights actually present — num/den is ONE IEEE
    // divide of exact longs (Det rule 3), s6-projected. The infinite-tail
    // EWMA is an order-dependent recursion no shuffle-safe aggregate can
    // host; the truncated form is the standard bounded-state rewrite (a
    // streaming engine keeps the same 8-value ring buffer) and at 2^-8 the
    // dropped tail is below the s6 grid for this value range anyway.
    // Entity-bounded window: partitions by event_type scale with per-key
    // history, never corpus size.
    Q("win_ewma", Some(
      "WITH d AS (SELECT event_type, event_id, user_id, " +
        "CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t FROM events), " +
        "lagged AS (SELECT event_type, event_id, " +
        (0 until 8).map(k =>
          s"LAG(user_id, $k) OVER (PARTITION BY event_type ORDER BY t, event_id) AS v$k")
          .mkString(", ") +
        " FROM d) " +
        "SELECT event_id, " +
        "CAST(" + (0 until 8).map(k => s"COALESCE(v$k, 0) * ${1L << (7 - k)}").mkString(" + ") +
        " AS BIGINT) AS ewm_num, " +
        sqlS6("CAST(" +
          (0 until 8).map(k => s"COALESCE(v$k, 0) * ${1L << (7 - k)}").mkString(" + ") +
          " AS DOUBLE) / CAST(" +
          (0 until 8).map(k => s"CASE WHEN v$k IS NULL THEN 0 ELSE ${1L << (7 - k)} END").mkString(" + ") +
          " AS DOUBLE)") + " AS ewma6 " +
        "FROM lagged ORDER BY event_id"),
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy(col("t"), col("event_id"))
        val lags = (0 until 8).map(k => lag(col("user_id"), k).over(w).as(s"v$k"))
        val num = (0 until 8).map(k =>
          coalesce(col(s"v$k"), lit(0L)) * (1L << (7 - k))).reduce(_ + _)
        val den = (0 until 8).map(k =>
          when(col(s"v$k").isNull, 0L).otherwise(1L << (7 - k))).reduce(_ + _)
        T.events(s, d)
          .select(col("event_type"), col("event_id"), col("user_id"),
            epochS(col("ts")).as("t"))
          .select(Seq(col("event_id")) ++ lags: _*)
          .select(col("event_id"), num.cast("long").as("ewm_num"),
            s6(num.cast("double") / den.cast("double")).as("ewma6"))
          .orderBy("event_id")
      }),

    // Exponentially-weighted moving VARIANCE (round 10) — pandas
    // `ewm(...).var()`'s biased form, the adaptive volatility estimate
    // risk/monitoring pipelines pair with the EWMA level: same dyadic
    // alpha = 1/2 truncated-8 window as win_ewma, so the three weighted
    // sums (Σw, Σw·v, Σw·v²) are EXACT integers (v = user_id ≤ ~150,
    // v²·2^7 ≪ 2^63), and var = Σwv²/Σw − (Σwv/Σw)² is ONE fixed IEEE
    // sequence both engines share (two divides, one multiply-subtract),
    // s6-floored. Same entity-bounded lag window — no new shuffle shape.
    Q("win_ewvar", Some(
      "WITH d AS (SELECT event_type, event_id, user_id, " +
        "CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t FROM events), " +
        "lagged AS (SELECT event_type, event_id, " +
        (0 until 8).map(k =>
          s"LAG(user_id, $k) OVER (PARTITION BY event_type ORDER BY t, event_id) AS v$k")
          .mkString(", ") +
        " FROM d), " +
        "m AS (SELECT event_id, " +
        "CAST(" + (0 until 8).map(k => s"COALESCE(v$k, 0) * ${1L << (7 - k)}").mkString(" + ") +
        " AS BIGINT) AS n1, " +
        "CAST(" + (0 until 8).map(k => s"COALESCE(v$k * v$k, 0) * ${1L << (7 - k)}").mkString(" + ") +
        " AS BIGINT) AS n2, " +
        "CAST(" + (0 until 8).map(k => s"CASE WHEN v$k IS NULL THEN 0 ELSE ${1L << (7 - k)} END").mkString(" + ") +
        " AS BIGINT) AS dn FROM lagged) " +
        "SELECT event_id, n2, " +
        sqlS6("CAST(n2 AS DOUBLE) / CAST(dn AS DOUBLE) - " +
          "(CAST(n1 AS DOUBLE) / CAST(dn AS DOUBLE)) * (CAST(n1 AS DOUBLE) / CAST(dn AS DOUBLE))") +
        " AS ewvar6 FROM m ORDER BY event_id"),
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy(col("t"), col("event_id"))
        val lags = (0 until 8).map(k => lag(col("user_id"), k).over(w).as(s"v$k"))
        val n1 = (0 until 8).map(k =>
          coalesce(col(s"v$k"), lit(0L)) * (1L << (7 - k))).reduce(_ + _)
        val n2 = (0 until 8).map(k =>
          coalesce(col(s"v$k") * col(s"v$k"), lit(0L)) * (1L << (7 - k))).reduce(_ + _)
        val dn = (0 until 8).map(k =>
          when(col(s"v$k").isNull, 0L).otherwise(1L << (7 - k))).reduce(_ + _)
        val mean = n1.cast("double") / dn.cast("double")
        T.events(s, d)
          .select(col("event_type"), col("event_id"), col("user_id"),
            epochS(col("ts")).as("t"))
          .select(Seq(col("event_id")) ++ lags: _*)
          .select(col("event_id"), n2.cast("long").as("n2"),
            s6(n2.cast("double") / dn.cast("double") - mean * mean).as("ewvar6"))
          .orderBy("event_id")
      }),

    // Holt's linear-trend double exponential smoothing (round 10) — the
    // level+trend forecaster one rung above win_ewma [Holt 1957; the
    // statsmodels/pandas Holt default shape], alpha = beta = 1/2, in the
    // same BOUNDED-STATE truncated form: the two-state recursion
    // l' = y/2 + (l+b)/2, b' = (l'-l)/2 + b/2 initialized at the oldest
    // of the last 8 observations (l = y[t-7], b = 0) is LINEAR in the
    // window, so it unrolls into two fixed 8-tap integer kernels with
    // EXACT dyadic coefficients over denominator 2^14 (computed once by
    // symbolic unrolling; ΣL = 16384 ≡ 1 and ΣB = 0, so a constant
    // series reproduces itself with zero trend — the spec pins both).
    // l_num/b_num are exact int64 dot products on both engines; level,
    // trend and the one-step forecast l+b are ONE IEEE divide each off
    // the 2^14 grid, s6-floored. Rows with fewer than 8 priors emit
    // NULL (the kernel needs its full support — the partial-history
    // renormalization that is well-defined for one state has no unique
    // two-state analogue). Entity-bounded lag window, zero new shuffle
    // shapes; a streaming engine keeps the same 8-value ring buffer.
    Q("win_holt", Some {
      val lCoef = Seq(8192L, 6144L, 3584L, 1408L, -32L, -744L, -914L, -1254L)
      val bCoef = Seq(4096L, 1024L, -768L, -1472L, -1456L, -1084L, -627L, 287L)
      "WITH d AS (SELECT event_type, event_id, user_id, " +
        "CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t FROM events), " +
        "lagged AS (SELECT event_type, event_id, " +
        (0 until 8).map(k =>
          s"LAG(user_id, $k) OVER (PARTITION BY event_type ORDER BY t, event_id) AS v$k")
          .mkString(", ") +
        " FROM d), " +
        "m AS (SELECT event_id, v7, " +
        "CAST(" + (0 until 8).map(k => s"v$k * (${lCoef(k)})").mkString(" + ") +
        " AS BIGINT) AS l_num, " +
        "CAST(" + (0 until 8).map(k => s"v$k * (${bCoef(k)})").mkString(" + ") +
        " AS BIGINT) AS b_num FROM lagged) " +
        "SELECT event_id, l_num, b_num, " +
        "CASE WHEN v7 IS NULL THEN NULL ELSE " +
        sqlS6("CAST(l_num AS DOUBLE) / 16384.0") + " END AS level6, " +
        "CASE WHEN v7 IS NULL THEN NULL ELSE " +
        sqlS6("CAST(l_num + b_num AS DOUBLE) / 16384.0") + " END AS fcast6 " +
        "FROM m ORDER BY event_id"
    },
      (s, d) => {
        val lCoef = Seq(8192L, 6144L, 3584L, 1408L, -32L, -744L, -914L, -1254L)
        val bCoef = Seq(4096L, 1024L, -768L, -1472L, -1456L, -1084L, -627L, 287L)
        val w = Window.partitionBy("event_type").orderBy(col("t"), col("event_id"))
        val lags = (0 until 8).map(k => lag(col("user_id"), k).over(w).as(s"v$k"))
        val lNum = (0 until 8).map(k => col(s"v$k") * lCoef(k)).reduce(_ + _)
        val bNum = (0 until 8).map(k => col(s"v$k") * bCoef(k)).reduce(_ + _)
        T.events(s, d)
          .select(col("event_type"), col("event_id"), col("user_id"),
            epochS(col("ts")).as("t"))
          .select(Seq(col("event_id")) ++ lags: _*)
          .select(col("event_id"), lNum.cast("long").as("l_num"),
            bNum.cast("long").as("b_num"), col("v7"))
          .select(col("event_id"), col("l_num"), col("b_num"),
            when(col("v7").isNull, lit(null))
              .otherwise(s6(col("l_num").cast("double") / lit(16384.0))).as("level6"),
            when(col("v7").isNull, lit(null))
              .otherwise(s6((col("l_num") + col("b_num")).cast("double") / lit(16384.0)))
              .as("fcast6"))
          .orderBy("event_id")
      }),

    // Ordered conversion funnel (round 9) — the product-analytics staple:
    // per user, the earliest view, the earliest click AFTER that view,
    // and the earliest purchase AFTER that click (strict event-order
    // dependency, not three independent mins). Three user-level partial
    // aggregates chained by per-user joins — every join key is user_id,
    // so at 100 TB the whole funnel is ONE shuffle footprint on the
    // natural key, each stage's input already a user-sized table (the
    // stage tables are orders-of-magnitude smaller than the event log;
    // AQE broadcasts them when they fit). stage = deepest stage reached.
    Q("win_funnel", Some(
      "WITH d AS (SELECT user_id, event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t FROM events), " +
        "v AS (SELECT user_id, MIN(t) AS t_view FROM d WHERE event_type = 'view' GROUP BY user_id), " +
        "c AS (SELECT d.user_id, MIN(d.t) AS t_click FROM d JOIN v ON v.user_id = d.user_id " +
        "WHERE d.event_type = 'click' AND d.t > v.t_view GROUP BY d.user_id), " +
        "p AS (SELECT d.user_id, MIN(d.t) AS t_purchase FROM d JOIN c ON c.user_id = d.user_id " +
        "WHERE d.event_type = 'purchase' AND d.t > c.t_click GROUP BY d.user_id) " +
        "SELECT v.user_id, v.t_view, c.t_click, p.t_purchase, " +
        "CAST(CASE WHEN p.user_id IS NOT NULL THEN 3 WHEN c.user_id IS NOT NULL THEN 2 " +
        "ELSE 1 END AS INT) AS stage " +
        "FROM v LEFT JOIN c ON c.user_id = v.user_id LEFT JOIN p ON p.user_id = v.user_id " +
        "ORDER BY v.user_id"),
      // thin instantiation of the parameterized library op (round 10)
      (s, dd) => graft.analytics.Funnels.funnel(
        T.events(s, dd).select(col("user_id"), col("event_type"),
          epochS(col("ts")).as("t")),
        entity = "user_id", typeCol = "event_type", tCol = "t",
        steps = Seq("view", "click", "purchase"))
        .orderBy("user_id")),

    // Point-in-time (feature-store) join against the win_scd2 history
    // (round 9): for each purchase, the state the user was in 15 minutes
    // BEFORE the purchase — the "as the training example saw the world"
    // lookup every feature store serves [PK point-in-time correctness].
    // SCD2 intervals are half-open [valid_from, valid_to) and disjoint
    // per user, so the range join matches AT MOST once and the left join
    // preserves probe cardinality exactly (early probes before the first
    // interval get NULL). At 100 TB: the equi key user_id carries the
    // shuffle; the range predicate evaluates inside the per-user join
    // group, whose size is the user's interval count — bounded by
    // per-user history, never corpus size.
    Q("join_scd2_asof", Some(
      "WITH d AS (SELECT user_id, event_id, event_type AS state, " +
        "CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t FROM events), " +
        "chg AS (SELECT user_id, event_id, state, t, " +
        "CASE WHEN LAG(state) OVER w IS NULL OR LAG(state) OVER w <> state THEN 1 ELSE 0 END AS is_chg " +
        "FROM d WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), " +
        "iv AS (SELECT user_id, state, t AS valid_from, " +
        "LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS valid_to " +
        "FROM chg WHERE is_chg = 1), " +
        "probe AS (SELECT event_id, user_id, t - 900 AS pt FROM d WHERE state = 'purchase') " +
        "SELECT p.event_id, p.user_id, p.pt, iv.state AS prior_state " +
        "FROM probe p LEFT JOIN iv ON iv.user_id = p.user_id " +
        "AND p.pt >= iv.valid_from AND (iv.valid_to IS NULL OR p.pt < iv.valid_to) " +
        "ORDER BY p.event_id"),
      (s, dd) => {
        val w = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
        val d = T.events(s, dd)
          .select(col("user_id"), col("event_id"),
            col("event_type").as("state"), epochS(col("ts")).as("t"))
        val iv = d
          .withColumn("is_chg",
            when(lag(col("state"), 1).over(w).isNull ||
              lag(col("state"), 1).over(w) =!= col("state"), 1).otherwise(0))
          .where(col("is_chg") === 1)
          .withColumn("valid_to", lead(col("t"), 1).over(w))
          .select(col("user_id").as("iv_user"),
            col("state").as("prior_state"), col("t").as("valid_from"), col("valid_to"))
        val probe = d.where(col("state") === "purchase")
          .select(col("event_id"), col("user_id"), (col("t") - 900).as("pt"))
        probe.join(iv,
            probe("user_id") === iv("iv_user")
              && col("pt") >= col("valid_from")
              && (col("valid_to").isNull || col("pt") < col("valid_to")), "left")
          .select(col("event_id"), col("user_id"), col("pt"), col("prior_state"))
          .orderBy("event_id")
      }),

    // Cohort retention triangle (round 9) — the growth-analytics staple:
    // users cohorted by first-active epoch week, retention(cohort, k) =
    // distinct users active in week cohort+k / cohort size. Dedup to
    // (user, week) FIRST (the data-sized reduction happens map-side in
    // one user-keyed shuffle), then the cohort join and the (cohort,
    // offset) count run on user-sized tables. The share is ONE IEEE
    // divide of exact longs on the s6 grid. At 100 TB the plan's only
    // fact-sized exchange is the initial distinct.
    Q("win_retention", Some(
      "WITH d AS (SELECT DISTINCT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 604800 AS wk FROM events), " +
        "f AS (SELECT user_id, MIN(wk) AS cwk FROM d GROUP BY user_id), " +
        "a AS (SELECT d.user_id, f.cwk, d.wk - f.cwk AS offs FROM d JOIN f ON f.user_id = d.user_id), " +
        "r AS (SELECT cwk, offs, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active FROM a GROUP BY cwk, offs), " +
        "c AS (SELECT cwk, n_active AS cohort_size FROM r WHERE offs = 0) " +
        "SELECT r.cwk AS cohort_week, CAST(r.offs AS INT) AS week_offset, r.n_active, " +
        "c.cohort_size, " +
        sqlS6("CAST(r.n_active AS DOUBLE) / CAST(c.cohort_size AS DOUBLE)") + " AS retention6 " +
        "FROM r JOIN c ON c.cwk = r.cwk ORDER BY cohort_week, week_offset"),
      // thin instantiation of the parameterized library op (round 10)
      (s, dd) => graft.analytics.Retention.cohortRetention(
        T.events(s, dd), entity = "user_id", tsCol = "ts",
        periodSecs = 604800L)
        .withColumnRenamed("cohort_period", "cohort_week")
        .withColumnRenamed("period_offset", "week_offset")
        .orderBy("cohort_week", "week_offset")),

    // Moving median (round 9) — the ROBUST member of the moving-stat
    // family (win_movavg's mean is spike-sensitive; the rolling median is
    // the standard despiking filter, e.g. temporal smoothing of EO
    // time-series [PK xarray rolling median]). Graded EXACTLY by the
    // doubled-median trick: 2·median of integers is always an integer
    // (odd frame: 2·mid; even: mid1+mid2), so no interpolation double
    // ever reaches the output. Spark has no framed median — the frame is
    // materialized per row (collect_list over ROWS BETWEEN 2 PRECEDING
    // AND 2 FOLLOWING, ≤5 longs — bounded state, the streaming ring
    // buffer) and sorted per row; DuckDB's framed MEDIAN×2 is the twin.
    // Entity-partitioned: per-customer frames, never a global window.
    Q("win_movmedian", Some(
      "SELECT o_custkey, o_orderkey, " +
        "CAST(MEDIAN(" + sqlS2("o_totalprice") + ") OVER w * 2 AS BIGINT) AS med2c " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) ORDER BY o_custkey, o_orderkey"),
      (s, d) => {
        val w5 = custDateKey.rowsBetween(-2, 2)
        T.orders(s, d)
          .withColumn("fr", sort_array(collect_list(s2(col("o_totalprice"))).over(w5)))
          .withColumn("med2c", expr(
            "CASE WHEN size(fr) % 2 = 1 THEN element_at(fr, CAST((size(fr) + 1) DIV 2 AS INT)) * 2 " +
              "ELSE element_at(fr, CAST(size(fr) DIV 2 AS INT)) + " +
              "element_at(fr, CAST(size(fr) DIV 2 + 1 AS INT)) END"))
          .select("o_custkey", "o_orderkey", "med2c")
          .orderBy("o_custkey", "o_orderkey")
      }),

    // Time-series resample + forward-fill (round 9) — the pandas
    // `resample('6H').ffill()` / xarray regularization step that precedes
    // any composite over irregular observations [PK]: per user, the
    // COMPLETE 6-hour bucket grid between the user's first and last
    // observation (empty buckets materialized via sequence/explode — a
    // per-entity-bounded fan-out, never a global calendar join), per-
    // bucket exact grid means, and empty buckets forward-filled with the
    // last observed mean (last(ignoreNulls) over the entity-ordered
    // window = LAST_VALUE IGNORE NULLS). The first bucket is always
    // observed (the grid starts at min(b)), so the fill never dangles.
    // At 100 TB: one shuffle on (user, bucket) for the agg, one on user
    // for grid+fill — both entity-bounded; no global structure anywhere.
    Q("win_resample_ffill", Some(
      "WITH te AS (SELECT user_id, (CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 21600) * 21600 AS b, value FROM events), " +
        "g AS (SELECT user_id, b, CAST(COUNT(*) AS BIGINT) AS n, " +
        sqlMean6("value") + " AS m6 FROM te GROUP BY user_id, b), " +
        "bounds AS (SELECT user_id, MIN(b) AS b0, MAX(b) AS b1 FROM g GROUP BY user_id), " +
        "grid AS (SELECT user_id, UNNEST(GENERATE_SERIES(b0, b1, 21600)) AS b FROM bounds), " +
        "j AS (SELECT grid.user_id, grid.b, COALESCE(g.n, 0) AS n_obs, g.m6 " +
        "FROM grid LEFT JOIN g ON g.user_id = grid.user_id AND g.b = grid.b) " +
        "SELECT user_id, b AS bucket, CAST(n_obs AS BIGINT) AS n_obs, " +
        "LAST_VALUE(m6 IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY b " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill6 " +
        "FROM j ORDER BY user_id, bucket"),
      (s, dd) => {
        val g = T.events(s, dd)
          .select(col("user_id"),
            (floor(epochS(col("ts")) / 21600) * 21600).cast("long").as("b"),
            col("value"))
          .groupBy("user_id", "b")
          .agg(count(lit(1)).as("n"), mean6(col("value")).as("m6"))
        val grid = g.groupBy("user_id")
          .agg(min(col("b")).as("b0"), max(col("b")).as("b1"))
          .select(col("user_id"),
            explode(sequence(col("b0"), col("b1"), lit(21600L))).as("b"))
        val wFill = Window.partitionBy("user_id").orderBy("b")
          .rowsBetween(Window.unboundedPreceding, 0)
        grid.join(g, Seq("user_id", "b"), "left")
          .select(col("user_id"), col("b").as("bucket"),
            coalesce(col("n"), lit(0L)).as("n_obs"),
            last(col("m6"), ignoreNulls = true).over(wFill).as("ffill6"))
          .orderBy("user_id", "bucket")
      }),

    // Linear-interpolation resample (round 9, second wave) — the gap-fill
    // a numeric sensor series wants where ffill is a step function: each
    // empty bucket takes pv + (nv−pv)·(b−pb)/(nb−pb) between its
    // bracketing observed buckets. The brackets come from four IGNORE
    // NULLS window picks over the SAME (user_id, b) sort — backward
    // last_value pairs and forward first_value pairs share one exchange
    // and one sort (two Window nodes, zero extra shuffles). The grid
    // spans [min,max] of each entity's OBSERVED buckets, so every empty
    // bucket is interior and both brackets exist — no edge-null branch.
    // Determinism: pv/nv are s6 longs and pb/nb/b exact epochs, so the
    // lerp is one fixed double sequence re-floored to the s6 grid (Det
    // rule 3); observed buckets pass their exact m6 through untouched.
    Q("win_interpolate", Some(
      "WITH te AS (SELECT user_id, (CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 21600) * 21600 AS b, value FROM events), " +
        "g AS (SELECT user_id, b, CAST(COUNT(*) AS BIGINT) AS n, " +
        sqlMean6("value") + " AS m6 FROM te GROUP BY user_id, b), " +
        "bounds AS (SELECT user_id, MIN(b) AS b0, MAX(b) AS b1 FROM g GROUP BY user_id), " +
        "grid AS (SELECT user_id, UNNEST(GENERATE_SERIES(b0, b1, 21600)) AS b FROM bounds), " +
        "j AS (SELECT grid.user_id, grid.b, COALESCE(g.n, 0) AS n_obs, g.m6 " +
        "FROM grid LEFT JOIN g ON g.user_id = grid.user_id AND g.b = grid.b), " +
        "w AS (SELECT user_id, b, n_obs, m6, " +
        "LAST_VALUE(m6 IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY b " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv, " +
        "LAST_VALUE(CASE WHEN m6 IS NOT NULL THEN b END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY b " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb, " +
        "FIRST_VALUE(m6 IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY b " +
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv, " +
        "FIRST_VALUE(CASE WHEN m6 IS NOT NULL THEN b END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY b " +
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb FROM j) " +
        "SELECT user_id, b AS bucket, CAST(n_obs AS BIGINT) AS n_obs, " +
        "CAST(CASE WHEN n_obs > 0 THEN m6 ELSE " +
        "CAST(FLOOR((CAST(pv AS DOUBLE) + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE)) * " +
        "(CAST(b - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE))) + 0.5) AS BIGINT) END AS BIGINT) AS interp6 " +
        "FROM w ORDER BY user_id, bucket"),
      (s, dd) => {
        val g = T.events(s, dd)
          .select(col("user_id"),
            (floor(epochS(col("ts")) / 21600) * 21600).cast("long").as("b"),
            col("value"))
          .groupBy("user_id", "b")
          .agg(count(lit(1)).as("n"), mean6(col("value")).as("m6"))
        val grid = g.groupBy("user_id")
          .agg(min(col("b")).as("b0"), max(col("b")).as("b1"))
          .select(col("user_id"),
            explode(sequence(col("b0"), col("b1"), lit(21600L))).as("b"))
        val back = Window.partitionBy("user_id").orderBy("b")
          .rowsBetween(Window.unboundedPreceding, 0)
        val fwd = Window.partitionBy("user_id").orderBy("b")
          .rowsBetween(0, Window.unboundedFollowing)
        val obsB = when(col("m6").isNotNull, col("b"))
        val j = grid.join(g, Seq("user_id", "b"), "left")
          .select(col("user_id"), col("b"),
            coalesce(col("n"), lit(0L)).as("n_obs"), col("m6"),
            last(col("m6"), ignoreNulls = true).over(back).as("pv"),
            last(obsB, ignoreNulls = true).over(back).as("pb"),
            first(col("m6"), ignoreNulls = true).over(fwd).as("nv"),
            first(obsB, ignoreNulls = true).over(fwd).as("nb"))
        val lerp = col("pv").cast("double") +
          (col("nv").cast("double") - col("pv").cast("double")) *
            ((col("b") - col("pb")).cast("double") /
              (col("nb") - col("pb")).cast("double"))
        j.select(col("user_id"), col("b").as("bucket"), col("n_obs"),
            when(col("n_obs") > 0, col("m6"))
              .otherwise(floor(lerp + lit(0.5)).cast("long")).as("interp6"))
          .orderBy("user_id", "bucket")
      }),

    // Maximum drawdown (round 9, second wave) — the running-peak
    // retracement statistic (risk analytics, but generically "how far
    // below its best has this series fallen"): per entity, cumulative
    // s6 value sums in (t, event_id) order, running max of that, and
    // the largest peak−current gap. Entirely integer: the cumsum is
    // exact grid-longs (stream_runtotal's discipline), the running max
    // and the final MAX(gap) are order-pinned longs. One shuffle + one
    // entity sort shared by both window passes.
    Q("win_drawdown", Some(
      "WITH c AS (SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t, event_id, " +
        "CAST(SUM(" + sqlS6("value") + ") OVER (" +
        "PARTITION BY user_id ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT), event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM events), " +
        "p AS (SELECT user_id, cum, MAX(cum) OVER (PARTITION BY user_id ORDER BY t, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak FROM c) " +
        "SELECT user_id, CAST(MAX(peak) AS BIGINT) AS peak_total, " +
        "CAST(MAX(peak - cum) AS BIGINT) AS max_drawdown " +
        "FROM p GROUP BY user_id ORDER BY user_id"),
      (s, dd) => {
        val ord = Window.partitionBy("user_id")
          .orderBy(epochS(col("ts")), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        T.events(s, dd)
          .withColumn("cum", sum(s6(col("value"))).over(ord))
          .withColumn("peak", max(col("cum")).over(ord))
          .groupBy("user_id")
          .agg(max(col("peak")).as("peak_total"),
            max(col("peak") - col("cum")).as("max_drawdown"))
          .orderBy("user_id")
      }),

    // CUSUM change detection (round 9, third wave) — Page's cumulative-
    // sum statistic per entity: how far the running sum of deviations
    // from the series mean wanders (a drifting sensor / behavior shift
    // shows as a large |CUSUM| range; Page 1954). Kept integer-exact by
    // scaling: Σ(n·xᵢ − S) over the prefix is n·prefix_sum − i·S, all
    // int64 on cents (n ≤ partition size keeps products ≪ 2⁶³). The
    // per-entity (n, S) window and the running sum share ONE shuffle +
    // sort on the entity key; the final per-entity extrema collapse in
    // the same partitioning. At 100 TB: partition = events-per-entity,
    // bounded; no global window anywhere.
    Q("win_cusum", Some(
      "WITH v AS (SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t, event_id, " +
        sqlS2("value") + " AS x FROM events), " +
        "m AS (SELECT user_id, t, event_id, x, " +
        "CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n, " +
        "CAST(SUM(x) OVER (PARTITION BY user_id) AS BIGINT) AS sv FROM v), " +
        "c AS (SELECT user_id, n, " +
        "CAST(SUM(n * x - sv) OVER (PARTITION BY user_id ORDER BY t, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cusum FROM m) " +
        "SELECT user_id, CAST(MAX(n) AS BIGINT) AS n, " +
        "CAST(MAX(cusum) AS BIGINT) AS cusum_max, CAST(MIN(cusum) AS BIGINT) AS cusum_min, " +
        "CAST(MAX(cusum) - MIN(cusum) AS BIGINT) AS cusum_range " +
        "FROM c GROUP BY user_id ORDER BY user_id"),
      (s, dd) => {
        val byU = Window.partitionBy("user_id")
        val ord = byU.orderBy(col("t"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        T.events(s, dd)
          .select(col("user_id"), epochS(col("ts")).as("t"), col("event_id"),
            s2(col("value")).as("x"))
          .withColumn("n", count(lit(1)).over(byU))
          .withColumn("sv", sum(col("x")).over(byU))
          .withColumn("cusum", sum(col("n") * col("x") - col("sv")).over(ord))
          .groupBy("user_id")
          .agg(max(col("n")).as("n"),
            max(col("cusum")).as("cusum_max"), min(col("cusum")).as("cusum_min"),
            (max(col("cusum")) - min(col("cusum"))).as("cusum_range"))
          .orderBy("user_id")
      }),

    // Pareto / Lorenz concentration curve (round 9, third wave) — "what
    // share of total value do the top-k entities hold": entities ranked
    // by exact cent totals descending, cumulative share on the s6 grid.
    // The data-sized work is the per-entity aggregate (one shuffle); the
    // ranking window then runs over ENTITY-level rows only — bounded by
    // the entity space, the same post-aggregation-window justification
    // as agg_topk_group. At an unbounded entity count the two-pass
    // range-partition + broadcast-offset form (win_ntile's construction)
    // replaces the single ordering. Top 20 ranks graded; (cents DESC,
    // user_id) is a total order so ranks never tie ambiguously.
    Q("win_pareto", Some(
      "WITH u AS (SELECT user_id, " + sqlCentSum("value") + " AS cents " +
        "FROM events GROUP BY user_id), " +
        "r AS (SELECT user_id, cents, " +
        "CAST(ROW_NUMBER() OVER (ORDER BY cents DESC, user_id) AS BIGINT) AS rnk, " +
        "CAST(SUM(cents) OVER (ORDER BY cents DESC, user_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum, " +
        "CAST(SUM(cents) OVER () AS BIGINT) AS tot FROM u) " +
        "SELECT rnk, user_id, cents, cum AS cum_cents, " +
        sqlS6("CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)") + " AS share6 " +
        "FROM r WHERE rnk <= 20 ORDER BY rnk"),
      (s, dd) => {
        val u = T.events(s, dd).groupBy("user_id").agg(centSum(col("value")).as("cents"))
        val ord = Window.orderBy(col("cents").desc, col("user_id"))
        val cumW = ord.rowsBetween(Window.unboundedPreceding, 0)
        u.withColumn("rnk", row_number().over(ord).cast("long"))
          .withColumn("cum", sum(col("cents")).over(cumW))
          .withColumn("tot", sum(col("cents")).over(
            Window.partitionBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .where(col("rnk") <= 20)
          .select(col("rnk"), col("user_id"), col("cents"), col("cum").as("cum_cents"),
            s6(col("cum").cast("double") / col("tot").cast("double")).as("share6"))
          .orderBy("rnk")
      }),

    // Longest strictly-increasing streak (round 9, third wave) — the
    // run-length analytics shape (consecutive-growth streaks, monotone
    // sensor runs) as a VALUE-conditioned island build: a new run starts
    // wherever xₜ ≤ xₜ₋₁ (or at the series head), run ids are the
    // running sum of those starts, run lengths collapse per (entity,
    // run). Complements win_gaps_islands (whose islands are TIME-gap
    // driven). All integer: cents comparisons, int64 run ids/lengths.
    // One shuffle + entity sort shared by the lag and the running sum;
    // the two aggregates stay on the same key. Partition = one entity's
    // events, bounded at any corpus scale.
    Q("win_streak", Some(
      "WITH v AS (SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t, event_id, " +
        sqlS2("value") + " AS x FROM events), " +
        "f AS (SELECT user_id, t, event_id, x, " +
        "CASE WHEN LAG(x) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL " +
        "OR x <= LAG(x) OVER (PARTITION BY user_id ORDER BY t, event_id) " +
        "THEN 1 ELSE 0 END AS brk FROM v), " +
        "r AS (SELECT user_id, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY t, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id FROM f), " +
        "l AS (SELECT user_id, run_id, CAST(COUNT(*) AS BIGINT) AS len " +
        "FROM r GROUP BY user_id, run_id) " +
        "SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak, " +
        "CAST(COUNT(*) AS BIGINT) AS n_runs, CAST(SUM(len) AS BIGINT) AS n " +
        "FROM l GROUP BY user_id ORDER BY user_id"),
      (s, dd) => {
        val ord = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
        val cum = ord.rowsBetween(Window.unboundedPreceding, 0)
        val prev = lag(col("x"), 1).over(ord)
        T.events(s, dd)
          .select(col("user_id"), epochS(col("ts")).as("t"), col("event_id"),
            s2(col("value")).as("x"))
          .withColumn("brk",
            when(prev.isNull || col("x") <= prev, 1L).otherwise(0L))
          .withColumn("run_id", sum(col("brk")).over(cum))
          .groupBy("user_id", "run_id")
          .agg(count(lit(1)).as("len"))
          .groupBy("user_id")
          .agg(max(col("len")).as("max_streak"), count(lit(1)).as("n_runs"),
            sum(col("len")).as("n"))
          .orderBy("user_id")
      }),

    // Hampel despiking filter (round 9, third wave) — the robust
    // outlier detector of sensor/time-series QA (Hampel 1974; Pearson's
    // process-data survey popularized the 3·MAD rule): a point is a
    // spike when |x − med| > 3·MAD over its centered 5-point window.
    // Exactness by DOUBLING TWICE (win_movmedian's trick, iterated):
    // med2 = 2·median is an int; dᵢ = |2xᵢ − med2| = 2|xᵢ−med| is an
    // int; mad4 = 2·median(d) = 4·MAD is an int; the flag compares
    // 2·d > 3·mad4 ⟺ |x−med| > 3·MAD — no fractional value ever
    // materializes. Full 5-windows only (interior points, odd count ⇒
    // both medians are middle-element picks). One entity shuffle/sort;
    // the ≤5-element frame materializes per row — the streaming ring
    // buffer, same cost class as win_movmedian.
    Q("win_hampel", Some(
      "WITH v AS (SELECT user_id, event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t, " +
        sqlS2("value") + " AS x FROM events), " +
        "w AS (SELECT user_id, event_id, x, " +
        "LIST(x) OVER win AS fr, COUNT(*) OVER win AS nw " +
        "FROM v WINDOW win AS (PARTITION BY user_id ORDER BY t, event_id " +
        "ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)), " +
        "f AS (SELECT user_id, event_id, x, fr, " +
        "CAST(LIST_SORT(fr)[3] * 2 AS BIGINT) AS med2 FROM w WHERE nw = 5), " +
        "g AS (SELECT user_id, event_id, x, med2, " +
        "CAST(LIST_SORT(LIST_TRANSFORM(fr, e -> ABS(2 * e - med2)))[3] * 2 AS BIGINT) AS mad4 " +
        "FROM f) " +
        "SELECT event_id, user_id, x, med2, mad4, " +
        "CAST(CASE WHEN 2 * ABS(2 * x - med2) > 3 * mad4 THEN 1 ELSE 0 END AS BIGINT) AS spike " +
        "FROM g ORDER BY event_id"),
      (s, dd) => {
        val w5 = Window.partitionBy("user_id")
          .orderBy(col("t"), col("event_id")).rowsBetween(-2, 2)
        T.events(s, dd)
          .select(col("user_id"), col("event_id"), epochS(col("ts")).as("t"),
            s2(col("value")).as("x"))
          .withColumn("fr", collect_list(col("x")).over(w5))
          .withColumn("nw", count(lit(1)).over(w5))
          .where(col("nw") === 5)
          .withColumn("med2", element_at(array_sort(col("fr")), 3) * 2)
          .withColumn("mad4", element_at(array_sort(
            transform(col("fr"), e => abs(e * 2 - col("med2")))), 3) * 2)
          .select(col("event_id"), col("user_id"), col("x"), col("med2"), col("mad4"),
            when(lit(2) * abs(lit(2) * col("x") - col("med2")) > lit(3) * col("mad4"), 1L)
              .otherwise(0L).as("spike"))
          .orderBy("event_id")
      }),

    // Time-weighted average (round 9, fourth wave) — the TSDB/metrics
    // aggregate that plain AVG gets wrong on irregular samples: each
    // observation holds until the next one, so its weight is the
    // interval it covers (step interpolation, the standard TWA). Per
    // entity: Σ xᵢ·(tᵢ₊₁ − tᵢ) over all but the last observation,
    // divided by the covered span — cent·second products stay exact
    // int64 (≤ ~1.3e11/row at this domain), the divide is ONE IEEE op
    // onto the s6 grid. The lead-window pass and the aggregate share
    // one entity shuffle; ties order away on (t, event_id). Entities
    // with a single observation carry no covered interval → NULL.
    Q("win_twa", Some(
      "WITH v AS (SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t, event_id, " +
        sqlS2("value") + " AS x FROM events), " +
        "p AS (SELECT user_id, x, t, " +
        "LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS nt FROM v), " +
        "m AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_iv, " +
        "CAST(SUM(x * (nt - t)) AS BIGINT) AS sw, CAST(SUM(nt - t) AS BIGINT) AS span " +
        "FROM p WHERE nt IS NOT NULL GROUP BY user_id) " +
        "SELECT user_id, n_iv, span, " +
        "CASE WHEN span <= 0 THEN NULL ELSE " +
        sqlS6("CAST(sw AS DOUBLE) / CAST(span AS DOUBLE)") + " END AS twa_c6 " +
        "FROM m ORDER BY user_id"),
      (s, dd) => {
        val ord = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
        val m = T.events(s, dd)
          .select(col("user_id"), epochS(col("ts")).as("t"), col("event_id"),
            s2(col("value")).as("x"))
          .withColumn("nt", lead(col("t"), 1).over(ord))
          .where(col("nt").isNotNull)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_iv"),
            sum(col("x") * (col("nt") - col("t"))).as("sw"),
            sum(col("nt") - col("t")).as("span"))
        m.select(col("user_id"), col("n_iv"), col("span"),
            when(col("span") <= 0, lit(null))
              .otherwise(s6(col("sw").cast("double") / col("span").cast("double")))
              .as("twa_c6"))
          .orderBy("user_id")
      }),

    // Last-touch attribution (round 9, fifth wave) — the marketing-
    // analytics staple: each purchase credits the LAST non-purchase
    // event ("channel") the same user emitted strictly before it. ONE
    // ignore-nulls last_value pass over the mixed per-user stream (the
    // win_interpolate bracket idiom — no self-join, no as-of pass),
    // then a channel-level rollup; purchases with no prior touch credit
    // 'none'. One entity shuffle/sort; output is channel-count-sized.
    Q("win_attribution", Some(
      "WITH v AS (SELECT user_id, event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t, " +
        "event_type FROM events), " +
        "w AS (SELECT user_id, event_id, t, event_type, " +
        "LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS) " +
        "OVER (PARTITION BY user_id ORDER BY t, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch FROM v) " +
        "SELECT COALESCE(touch, 'none') AS channel, CAST(COUNT(*) AS BIGINT) AS n_credits, " +
        "CAST(SUM(event_id) AS BIGINT) AS cksum " +
        "FROM w WHERE event_type = 'purchase' GROUP BY channel ORDER BY channel"),
      (s, dd) => {
        val ord = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        T.events(s, dd)
          .select(col("user_id"), col("event_id"), epochS(col("ts")).as("t"),
            col("event_type"))
          .withColumn("touch", last(
            when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(ord))
          .where(col("event_type") === "purchase")
          .groupBy(coalesce(col("touch"), lit("none")).as("channel"))
          .agg(count(lit(1)).as("n_credits"), sum(col("event_id")).as("cksum"))
          .orderBy("channel")
      }),

    // Bollinger bands (round 9, sixth wave) — the rolling mean ± 2σ
    // envelope of monitoring/trading dashboards, over a 5-row frame per
    // entity. The win_zscore moment discipline in a bounded frame:
    // n/Σv/Σv² as exact integer cent sums over the frame, the variance
    // NUMERATOR n·Σv²−(Σv)² stays a LONG (frame ≤ 5 rows of cents keeps
    // it ≪ 2^63) so the degenerate test is an integer compare, then the
    // band edges are ONE shared IEEE sequence each, floored to nearest
    // cents BEFORE the breach compare — so the breach flag is an exact
    // integer three-way on both engines, never a float compare.
    // Entity-bounded frame: shuffle on user_id only.
    Q("win_bollinger", Some(
      "WITH v AS (SELECT event_id, user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t, " +
        sqlS2("value") + " AS vi FROM events), " +
        "m AS (SELECT event_id, user_id, vi, " +
        "CAST(COUNT(*) OVER w AS BIGINT) AS n, " +
        "CAST(SUM(vi) OVER w AS BIGINT) AS sv, " +
        "CAST(SUM(vi * vi) OVER w AS BIGINT) AS svv " +
        "FROM v WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id " +
        "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)), " +
        "b AS (SELECT event_id, user_id, vi, n, n * svv - sv * sv AS num, " +
        "CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS mc, " +
        "SQRT(CAST(n * svv - sv * sv AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS sd " +
        "FROM m) " +
        "SELECT event_id, user_id, vi, " +
        "CASE WHEN n < 2 OR num <= 0 THEN NULL ELSE " + sqlS0("mc + 2.0 * sd") + " END AS ub_c, " +
        "CASE WHEN n < 2 OR num <= 0 THEN NULL ELSE " + sqlS0("mc - 2.0 * sd") + " END AS lb_c, " +
        "CASE WHEN n < 2 OR num <= 0 THEN NULL " +
        "WHEN vi > " + sqlS0("mc + 2.0 * sd") + " THEN 1 " +
        "WHEN vi < " + sqlS0("mc - 2.0 * sd") + " THEN -1 ELSE 0 END AS breach " +
        "FROM b ORDER BY event_id"),
      (s, dd) => {
        val w = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
          .rowsBetween(-4, Window.currentRow)
        val base = T.events(s, dd)
          .select(col("event_id"), col("user_id"), epochS(col("ts")).as("t"),
            s2(col("value")).as("vi"))
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("sv", sum(col("vi")).over(w))
          .withColumn("svv", sum(col("vi") * col("vi")).over(w))
        val num = col("n") * col("svv") - col("sv") * col("sv")
        val mc = col("sv").cast("double") / col("n").cast("double")
        val nD = col("n").cast("double")
        val sd = sqrt(num.cast("double") / (nD * (nD - lit(1.0))))
        val ub = s0(mc + lit(2.0) * sd); val lb = s0(mc - lit(2.0) * sd)
        val degen = col("n") < 2 || num <= 0
        base.select(col("event_id"), col("user_id"), col("vi"),
            when(degen, lit(null)).otherwise(ub).as("ub_c"),
            when(degen, lit(null)).otherwise(lb).as("lb_c"),
            when(degen, lit(null))
              .when(col("vi") > ub, lit(1))
              .when(col("vi") < lb, lit(-1))
              .otherwise(lit(0)).as("breach"))
          .orderBy("event_id")
      }),

    // Rolling correlation (round 9, sixth wave) — the co-movement
    // monitor between two per-entity series (here the event value and
    // its props payload integer) over a 7-row frame: six exact integer
    // window moments, then Pearson as ONE fixed double sequence with the
    // agg_stats sqrt(vx)·sqrt(vy) denominator form (never vx·vy — the
    // long product would overflow where the double √ pair cannot).
    // Degeneracy (n<2 or a zero-variance side) tested on the exact LONG
    // numerators. Entity-bounded frame; one shuffle on user_id.
    Q("win_rolling_corr", Some(
      "WITH v AS (SELECT event_id, user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t, " +
        sqlS2("value") + " AS x, " +
        "CAST(json_extract_string(props, '$.k') AS BIGINT) AS y FROM events), " +
        "m AS (SELECT event_id, user_id, " +
        "CAST(COUNT(*) OVER w AS BIGINT) AS n, " +
        "CAST(SUM(x) OVER w AS BIGINT) AS sx, CAST(SUM(y) OVER w AS BIGINT) AS sy, " +
        "CAST(SUM(x * x) OVER w AS BIGINT) AS sxx, CAST(SUM(y * y) OVER w AS BIGINT) AS syy, " +
        "CAST(SUM(x * y) OVER w AS BIGINT) AS sxy " +
        "FROM v WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id " +
        "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) " +
        "SELECT event_id, user_id, n, " +
        "CASE WHEN n < 2 OR n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0 THEN NULL ELSE " +
        sqlS6("CAST(n * sxy - sx * sy AS DOUBLE) / " +
          "(SQRT(CAST(n * sxx - sx * sx AS DOUBLE)) * SQRT(CAST(n * syy - sy * sy AS DOUBLE)))") +
        " END AS r6 FROM m ORDER BY event_id"),
      (s, dd) => {
        val w = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
          .rowsBetween(-6, Window.currentRow)
        val base = T.events(s, dd)
          .select(col("event_id"), col("user_id"), epochS(col("ts")).as("t"),
            s2(col("value")).as("x"),
            get_json_object(col("props"), "$.k").cast("long").as("y"))
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("sx", sum(col("x")).over(w))
          .withColumn("sy", sum(col("y")).over(w))
          .withColumn("sxx", sum(col("x") * col("x")).over(w))
          .withColumn("syy", sum(col("y") * col("y")).over(w))
          .withColumn("sxy", sum(col("x") * col("y")).over(w))
        val vx = col("n") * col("sxx") - col("sx") * col("sx")
        val vy = col("n") * col("syy") - col("sy") * col("sy")
        val r = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt(vx.cast("double")) * sqrt(vy.cast("double")))
        base.select(col("event_id"), col("user_id"), col("n"),
            when(col("n") < 2 || vx <= 0 || vy <= 0, lit(null))
              .otherwise(s6(r)).as("r6"))
          .orderBy("event_id")
      }),

    // Seasonal-naive forecast backtest (round 9, sixth wave) — the
    // capacity-planning baseline every forecasting system is judged
    // against (Hyndman's snaive): ŷ(d) = y(d−7), scored per entity by
    // MAE and signed bias over the days where a week-old ancestor
    // exists. The daily series is the eo_mk_trend collapse (earliest
    // observation per (entity, day) — a deterministic shared pick);
    // the forecast join is an EQUI join on (entity, day−7) — map-side
    // after the one shuffle both sides already share. |err| and bias
    // are exact integer cents; MAE is one divide on the s6 grid.
    Q("win_forecast_snaive", Some(
      "WITH e AS (SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS x, " +
        "CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t, event_id, " + sqlS2("value") + " AS y " +
        "FROM events), " +
        "d AS (SELECT user_id, x, y FROM (SELECT user_id, x, y, " +
        "ROW_NUMBER() OVER (PARTITION BY user_id, x ORDER BY t, event_id) AS rn FROM e) z " +
        "WHERE rn = 1), " +
        "j AS (SELECT a.user_id, a.y, p.y AS yhat FROM d a " +
        "LEFT JOIN d p ON p.user_id = a.user_id AND p.x = a.x - 7) " +
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_days, " +
        "CAST(COUNT(yhat) AS BIGINT) AS n_fc, " +
        "CAST(SUM(CASE WHEN yhat IS NULL THEN 0 ELSE y - yhat END) AS BIGINT) AS bias_c, " +
        "CASE WHEN COUNT(yhat) = 0 THEN NULL ELSE " +
        "CAST(FLOOR(CAST(CAST(SUM(CASE WHEN yhat IS NULL THEN 0 ELSE ABS(y - yhat) END) AS BIGINT) AS DOUBLE) " +
        "* 1e4 / CAST(COUNT(yhat) AS DOUBLE) + 0.5) AS BIGINT) END AS mae6 " +
        "FROM j GROUP BY user_id ORDER BY user_id"),
      (s, dd) => {
        val w = Window.partitionBy("user_id", "x").orderBy(col("t"), col("event_id"))
        val d = T.events(s, dd)
          .select(col("user_id"), expr("unix_timestamp(ts) div 86400").as("x"),
            epochS(col("ts")).as("t"), col("event_id"), s2(col("value")).as("y"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select("user_id", "x", "y")
        val p = d.select(col("user_id").as("pu"), col("x").as("px"),
          col("y").as("yhat"))
        d.join(p, col("pu") === col("user_id") && col("px") === col("x") - 7, "left")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_days"),
            count(col("yhat")).as("n_fc"),
            sum(when(col("yhat").isNull, 0L).otherwise(col("y") - col("yhat")))
              .as("bias_c"),
            sum(when(col("yhat").isNull, 0L).otherwise(abs(col("y") - col("yhat"))))
              .as("sae"))
          .select(col("user_id"), col("n_days"), col("n_fc"), col("bias_c"),
            when(col("n_fc") === 0, lit(null))
              .otherwise(floor(col("sae").cast("double") * lit(1e4) /
                col("n_fc").cast("double") + 0.5).cast("long")).as("mae6"))
          .orderBy("user_id")
      }),

    // Local-maximum peak detection (round 9, sixth wave) — the
    // signal-processing peak picker (scipy.signal.find_peaks' core
    // rule) over each entity's observation series: a peak is a strict
    // local maximum over both immediate neighbors (plateau rows are NOT
    // peaks — the strict/strict rule is fixed and shared), with a
    // 50-cent prominence floor over the LOWER neighbor. Interior rows
    // only (lag and lead both defined). Pure integer comparisons on
    // cents; one entity shuffle; summary output is entity-sized with a
    // position checksum pinning WHICH rows were peaks.
    Q("win_peak_detect", Some(
      "WITH v AS (SELECT user_id, event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t, " +
        sqlS2("value") + " AS vi FROM events), " +
        "n AS (SELECT user_id, event_id, vi, " +
        "LAG(vi) OVER w AS pv, LEAD(vi) OVER w AS nv " +
        "FROM v WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), " +
        "p AS (SELECT user_id, event_id, vi, " +
        "CASE WHEN pv IS NOT NULL AND nv IS NOT NULL AND vi > pv AND vi > nv " +
        "AND vi - GREATEST(pv, nv) >= 50 THEN 1 ELSE 0 END AS is_peak FROM n) " +
        "SELECT user_id, CAST(SUM(is_peak) AS BIGINT) AS n_peaks, " +
        "CAST(SUM(is_peak * event_id) AS BIGINT) AS cksum, " +
        "MAX(CASE WHEN is_peak = 1 THEN vi END) AS max_peak_c " +
        "FROM p GROUP BY user_id ORDER BY user_id"),
      (s, dd) => {
        val w = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
        val n = T.events(s, dd)
          .select(col("user_id"), col("event_id"), epochS(col("ts")).as("t"),
            s2(col("value")).as("vi"))
          .withColumn("pv", lag(col("vi"), 1).over(w))
          .withColumn("nv", lead(col("vi"), 1).over(w))
        val isPeak = when(col("pv").isNotNull && col("nv").isNotNull &&
          col("vi") > col("pv") && col("vi") > col("nv") &&
          col("vi") - greatest(col("pv"), col("nv")) >= 50, 1L).otherwise(0L)
        n.select(col("user_id"), col("event_id"), col("vi"), isPeak.as("is_peak"))
          .groupBy("user_id")
          .agg(sum(col("is_peak")).as("n_peaks"),
            sum(col("is_peak") * col("event_id")).as("cksum"),
            max(when(col("is_peak") === 1, col("vi"))).as("max_peak_c"))
          .orderBy("user_id")
      }),

    // RFM segmentation (round 9, sixth wave) — the marketing staple:
    // each customer scored 1-5 on Recency / Frequency / Monetary by
    // global quintile. The quintile ranks run over the CUSTOMER
    // AGGREGATE (dimension-sized), and each uses win_ntile's
    // range-partition + broadcast-offset two-pass instead of a
    // single-partition global window (globalNtile below) — the
    // VERDICT-r6 ntile lesson applied three times over the same
    // aggregate. Metrics are exact integers (epoch-day recency, order
    // counts, cent sums); ties pin to c_custkey. Output score =
    // 100·R + 10·F + M.
    Q("win_rfm", Some(
      "WITH m AS (SELECT o_custkey, MAX(CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) // 86400) AS rec_day, " +
        "CAST(COUNT(*) AS BIGINT) AS freq, " +
        "CAST(SUM(" + sqlS2("o_totalprice") + ") AS BIGINT) AS mon_c FROM orders GROUP BY o_custkey) " +
        "SELECT o_custkey, rec_day, freq, mon_c, " +
        "CAST(NTILE(5) OVER (ORDER BY rec_day, o_custkey) * 100 + " +
        "NTILE(5) OVER (ORDER BY freq, o_custkey) * 10 + " +
        "NTILE(5) OVER (ORDER BY mon_c, o_custkey) AS INTEGER) AS rfm " +
        "FROM m ORDER BY o_custkey"),
      (s, d) => {
        val m = T.orders(s, d)
          .groupBy("o_custkey")
          .agg(max(expr("unix_timestamp(o_orderdate) div 86400")).as("rec_day"),
            count(lit(1)).as("freq"), sum(s2(col("o_totalprice"))).as("mon_c"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val r = globalNtile(m, Seq(col("rec_day"), col("o_custkey")), 5, "r_s")
          .select(col("o_custkey"), col("r_s"))
        val f = globalNtile(m, Seq(col("freq"), col("o_custkey")), 5, "f_s")
          .select(col("o_custkey").as("fk"), col("f_s"))
        val mo = globalNtile(m, Seq(col("mon_c"), col("o_custkey")), 5, "m_s")
          .select(col("o_custkey").as("mk"), col("m_s"))
        m.join(r, "o_custkey")
          .join(f, col("fk") === col("o_custkey"))
          .join(mo, col("mk") === col("o_custkey"))
          .select(col("o_custkey"), col("rec_day"), col("freq"), col("mon_c"),
            (col("r_s") * 100 + col("f_s") * 10 + col("m_s")).cast("int").as("rfm"))
          .orderBy("o_custkey")
      }),

    // First-order Markov transition matrix of user behavior (round 9,
    // seventh wave) — the sequence-analytics primitive behind next-event
    // prediction and funnel simulation: P(curr | prev) estimated from
    // every consecutive event pair per user. ONE user_id shuffle carries
    // the lag window ((ts, event_id) total order — no tie ambiguity);
    // the pair counts collapse to the |types|² domain before the final
    // broadcast row-normalization, so all post-window work is
    // domain-sized at any corpus scale. Probabilities are one IEEE
    // divide of two exact counts onto the s6 grid.
    Q("win_markov", Some(
      "WITH o AS (SELECT event_type AS curr, " +
        "LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev " +
        "FROM events), " +
        "p AS (SELECT prev, curr, CAST(COUNT(*) AS BIGINT) AS n_pairs " +
        "FROM o WHERE prev IS NOT NULL GROUP BY prev, curr), " +
        "t AS (SELECT prev, CAST(SUM(n_pairs) AS BIGINT) AS tot FROM p GROUP BY prev) " +
        "SELECT p.prev, p.curr, p.n_pairs, " +
        sqlS6("CAST(p.n_pairs AS DOUBLE) / CAST(t.tot AS DOUBLE)") + " AS p6 " +
        "FROM p JOIN t USING (prev) ORDER BY p.prev, p.curr"),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val p = T.events(s, d)
          .select(col("event_type").as("curr"),
            lag(col("event_type"), 1).over(w).as("prev"))
          .filter(col("prev").isNotNull)
          .groupBy("prev", "curr").agg(count(lit(1)).as("n_pairs"))
        val t = p.groupBy("prev").agg(sum("n_pairs").as("tot"))
        p.join(broadcast(t), "prev")
          .select(col("prev"), col("curr"), col("n_pairs"),
            s6(col("n_pairs").cast("double") / col("tot").cast("double")).as("p6"))
          .orderBy("prev", "curr")
      }),

    // Moving-average crossover signals (round 9, seventh wave) — the
    // classic trend-following detector (golden / death cross) over each
    // user's daily value series: a fast 3-day mean crossing a slow
    // 7-day mean. Entirely integer: both frames keep their SUMS and the
    // comparison cross-multiplies (7·fast3 vs 3·slow7), so no mean ever
    // materializes; a signal fires where the sign of the difference
    // changes between consecutive days. The daily collapse is the one
    // data-sized shuffle; the frame windows ride a single (user, day)
    // sort. Partial-history rows (fewer than 7 prior days) emit no
    // signal on either engine by the same frame-count test.
    Q("win_sma_cross", Some(
      "WITH g AS (SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS day, " +
        "CAST(SUM(" + sqlS2("value") + ") AS BIGINT) AS v FROM events GROUP BY user_id, day), " +
        "f AS (SELECT user_id, day, " +
        "SUM(v) OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS s3, " +
        "SUM(v) OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS s7, " +
        "COUNT(*) OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS n7 " +
        "FROM g), " +
        "sg AS (SELECT user_id, day, n7, " +
        "CASE WHEN 7 * s3 > 3 * s7 THEN 1 WHEN 7 * s3 < 3 * s7 THEN -1 ELSE 0 END AS side " +
        "FROM f), " +
        "x AS (SELECT user_id, day, side, " +
        "LAG(side) OVER (PARTITION BY user_id ORDER BY day) AS pside, " +
        "LAG(n7) OVER (PARTITION BY user_id ORDER BY day) AS pn7, n7 FROM sg) " +
        "SELECT user_id, CAST(day AS BIGINT) AS day, " +
        "CAST(side AS INTEGER) AS direction " +
        "FROM x WHERE n7 = 7 AND pn7 = 7 AND pside IS NOT NULL " +
        "AND side <> pside AND side <> 0 ORDER BY user_id, day"),
      (s, d) => {
        val g = T.events(s, d)
          .groupBy(col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"))
          .agg(sum(s2(col("value"))).as("v"))
        val ord = Window.partitionBy("user_id").orderBy("day")
        val f3 = ord.rowsBetween(-2, 0)
        val f7 = ord.rowsBetween(-6, 0)
        val sg = g.select(col("user_id"), col("day"),
          sum("v").over(f3).as("s3"), sum("v").over(f7).as("s7"),
          count(lit(1)).over(f7).as("n7"))
          .withColumn("side",
            when(lit(7) * col("s3") > lit(3) * col("s7"), 1)
              .when(lit(7) * col("s3") < lit(3) * col("s7"), -1).otherwise(0))
        sg.select(col("user_id"), col("day"), col("side"), col("n7"),
          lag(col("side"), 1).over(ord).as("pside"),
          lag(col("n7"), 1).over(ord).as("pn7"))
          .filter(col("n7") === 7 && col("pn7") === 7 && col("pside").isNotNull &&
            col("side") =!= col("pside") && col("side") =!= 0)
          .select(col("user_id"), col("day").cast("long").as("day"),
            col("side").cast("int").as("direction"))
          .orderBy("user_id", "day")
      }),

    // Classical seasonal decomposition (round 9, seventh wave) — the
    // STL-shaped additive split y = trend + seasonal + residual on the
    // global daily revenue series with weekly seasonality, made
    // INTEGER-EXACT by working in 7× units: trend stays the centered
    // 7-day SUM, the detrended value is 7·y − trend (exact int64), the
    // weekday seasonal index is the floored mean of those integers, and
    // the residual their exact difference. No division ever reaches a
    // summed value. The data-sized work is one daily partial agg; every
    // window/join after runs over the calendar-bounded day series (the
    // dq_volume_anomaly precedent), with the weekday index broadcast
    // back. Only full-window days decompose — same frame-count test on
    // both engines.
    Q("win_decompose", Some(
      "WITH g AS (SELECT CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) // 86400 AS day, " +
        "CAST(SUM(" + sqlS2("o_totalprice") + ") AS BIGINT) AS v FROM orders GROUP BY day), " +
        "f AS (SELECT day, v, " +
        "SUM(v) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS t7, " +
        "COUNT(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7 " +
        "FROM g), " +
        "d AS (SELECT day, v, t7, day % 7 AS wd, 7 * v - t7 AS detr " +
        "FROM f WHERE n7 = 7), " +
        "sidx AS (SELECT wd, CAST(" +
        sqlHalfUpDiv("CAST(SUM(detr) AS BIGINT)", "COUNT(*)") +
        " AS BIGINT) AS seas " +
        "FROM d GROUP BY wd) " +
        "SELECT d.day, d.v AS v_c, CAST(d.t7 AS BIGINT) AS trend7s, sidx.seas AS seas7s, " +
        "CAST(d.detr - sidx.seas AS BIGINT) AS resid7s " +
        "FROM d JOIN sidx USING (wd) ORDER BY d.day"),
      (s, d) => {
        val g = T.orders(s, d)
          .groupBy(expr("unix_timestamp(o_orderdate) div 86400").as("day"))
          .agg(sum(s2(col("o_totalprice"))).as("v"))
        val w = Window.orderBy("day").rowsBetween(-3, 3)
        val dd = g.select(col("day"), col("v"),
          sum("v").over(w).as("t7"), count(lit(1)).over(w).as("n7"))
          .where(col("n7") === 7)
          .select(col("day"), col("v"), col("t7"), (col("day") % 7).as("wd"),
            (lit(7) * col("v") - col("t7")).as("detr"))
        val sidx = dd.groupBy("wd")
          .agg(halfUpDiv(sum("detr"), count(lit(1))).as("seas"))
        dd.join(broadcast(sidx), "wd")
          .select(col("day"), col("v").as("v_c"), col("t7").as("trend7s"),
            col("seas").as("seas7s"), (col("detr") - col("seas")).as("resid7s"))
          .orderBy("day")
      }),

    // Nelson-Aalen survival curve (round 9, seventh wave; REVISED round
    // 10) — the counting-process cumulative-hazard estimator behind
    // every conversion/churn readout, here on TIME TO FIRST PURCHASE: a
    // user "dies" at their first purchase (duration = first event →
    // first purchase, whole days) and is right-CENSORED at their last
    // event if they never purchase — the textbook conversion-survival
    // framing. Round 9's product-limit (Kaplan-Meier) form graded
    // s6(LN(1 − d/n)) and the driver's libm disagreed with the local
    // one by an ulp (the Det.scala "accepted residual risk" realized);
    // Nelson-Aalen H(t) = Σ dᵢ/nᵢ needs NO transcendental: each step
    // hazard is ONE correctly-rounded IEEE divide of two exact integers
    // (bit-identical in every engine), s6 floors it to the grid, and
    // H(t) is the order-free integer cumsum. S(t) = exp(−H(t)) is the
    // caller's one off-grid step. The at-risk count is N minus a
    // domain-sized cumsum (durations are calendar-bounded).
    Q("win_survival", Some {
      val term = "CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)"
      "WITH u AS (SELECT user_id, " +
        "MIN(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) AS first_t, " +
        "MAX(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) AS last_t, " +
        "MIN(CASE WHEN event_type = 'purchase' THEN CAST(FLOOR(EPOCH(ts)) AS BIGINT) END) AS fp_t " +
        "FROM events GROUP BY user_id), " +
        "lab AS (SELECT (COALESCE(fp_t, last_t) - first_t) // 86400 AS dur, " +
        "CASE WHEN fp_t IS NULL THEN 0 ELSE 1 END AS death FROM u), " +
        "t AS (SELECT dur, CAST(SUM(death) AS BIGINT) AS d, " +
        "CAST(SUM(1 - death) AS BIGINT) AS c, CAST(COUNT(*) AS BIGINT) AS tot FROM lab GROUP BY dur), " +
        "rk AS (SELECT dur, d, c, " +
        "CAST(CAST((SELECT COUNT(*) FROM u) AS BIGINT) - COALESCE(SUM(tot) OVER (ORDER BY dur " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk FROM t), " +
        "f AS (SELECT dur, d, c, n_risk, " + sqlS6(term) + " AS term6 " +
        "FROM rk WHERE d > 0), " +
        "s AS (SELECT dur, d, c, n_risk, " +
        "CAST(SUM(term6) OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumhaz6 " +
        "FROM f) " +
        "SELECT dur AS t_days, n_risk, d, c, cumhaz6 FROM s ORDER BY t_days"
    },
      (s, d) => {
        val u = T.events(s, d)
          .groupBy("user_id")
          .agg(min(epochS(col("ts"))).as("first_t"),
            max(epochS(col("ts"))).as("last_t"),
            min(when(col("event_type") === "purchase", epochS(col("ts")))).as("fp_t"))
        val nTot = u.agg(count(lit(1)).as("n_total"))
        val lab = u.select(
          expr("(coalesce(fp_t, last_t) - first_t) div 86400").as("dur"),
          when(col("fp_t").isNull, 0L).otherwise(1L).as("death"))
        val t = lab.groupBy("dur")
          .agg(sum("death").as("d"), sum(lit(1L) - col("death")).as("c"),
            count(lit(1)).as("tot"))
        val wOrd = Window.orderBy("dur")
        val rk = t.crossJoin(broadcast(nTot))
          .withColumn("n_risk", col("n_total") -
            coalesce(sum("tot").over(wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        val term = s6(col("d").cast("double") / col("n_risk").cast("double"))
        rk.where(col("d") > 0)
          .withColumn("term6", term)
          .withColumn("cumhaz6",
            sum("term6").over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
          .select(col("dur").as("t_days"), col("n_risk"), col("d"), col("c"),
            col("cumhaz6"))
          .orderBy("t_days")
      }),

    // STL-residual anomaly flags (round 9, seventh wave; REVISED round
    // 10) — the decomposition-based detector (the Twitter/Netflix
    // S-H-ESD shape in its deterministic core): win_decompose's additive
    // split, then any day whose residual sits beyond 3 robust sigmas —
    // median ± 3·MAD — is flagged. The win_hampel DOUBLING discipline
    // keeps everything integer, and since round 10 the medians are taken
    // by NEAREST-RANK ORDER STATISTICS, not the engine's interpolating
    // QUANTILE (whose lerp the driver's build resolved differently):
    // med2 = x(⌊(n+1)/2⌋) + x(⌊n/2⌋+1) over the sorted residuals — the
    // doubled interpolated median of integers, expressed as a sum of
    // two order stats picked by ROW_NUMBER (exact on both engines) —
    // dev2 = |2·resid − med2|, mad4 the same doubled median of dev2,
    // flag ⟺ 2·dev2 > 3·mad4. The two medians run over the calendar-
    // bounded day series; data-sized work stays the one daily agg.
    Q("win_stl_anomaly", Some(
      "WITH g AS (SELECT CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) // 86400 AS day, " +
        "CAST(SUM(" + sqlS2("o_totalprice") + ") AS BIGINT) AS v FROM orders GROUP BY day), " +
        "f AS (SELECT day, v, " +
        "SUM(v) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS t7, " +
        "COUNT(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7 " +
        "FROM g), " +
        "d AS (SELECT day, v, t7, day % 7 AS wd, 7 * v - t7 AS detr " +
        "FROM f WHERE n7 = 7), " +
        "sidx AS (SELECT wd, CAST(" +
        sqlHalfUpDiv("CAST(SUM(detr) AS BIGINT)", "COUNT(*)") +
        " AS BIGINT) AS seas " +
        "FROM d GROUP BY wd), " +
        "r AS (SELECT d.day, CAST(d.detr - sidx.seas AS BIGINT) AS resid FROM d JOIN sidx USING (wd)), " +
        "rr AS (SELECT day, resid, ROW_NUMBER() OVER (ORDER BY resid, day) AS rn, " +
        "COUNT(*) OVER () AS n FROM r), " +
        "m1 AS (SELECT CAST(SUM(CASE WHEN rn = (n+1)//2 THEN resid ELSE 0 END) + " +
        "SUM(CASE WHEN rn = n//2+1 THEN resid ELSE 0 END) AS BIGINT) AS med2 FROM rr), " +
        "dv AS (SELECT day, resid, CAST(ABS(2 * resid - (SELECT med2 FROM m1)) AS BIGINT) AS dev2 FROM r), " +
        "dr AS (SELECT day, dev2, ROW_NUMBER() OVER (ORDER BY dev2, day) AS rn, " +
        "COUNT(*) OVER () AS n FROM dv), " +
        "m2 AS (SELECT CAST(SUM(CASE WHEN rn = (n+1)//2 THEN dev2 ELSE 0 END) + " +
        "SUM(CASE WHEN rn = n//2+1 THEN dev2 ELSE 0 END) AS BIGINT) AS mad4 FROM dr) " +
        "SELECT day, resid, dev2, " +
        "CAST(CASE WHEN 2 * dev2 > 3 * (SELECT mad4 FROM m2) THEN 1 ELSE 0 END AS BIGINT) AS anomaly " +
        "FROM dv ORDER BY day"),
      (s, d) => {
        val r = decomposedResid(s, d)
        val m1 = doubledMedian(r, "resid", "day", "med2")
        val dv = r.crossJoin(broadcast(m1))
          .select(col("day"), col("resid"),
            abs(lit(2) * col("resid") - col("med2")).as("dev2"))
        val m2 = doubledMedian(dv, "dev2", "day", "mad4")
        dv.crossJoin(broadcast(m2))
          .select(col("day"), col("resid"), col("dev2"),
            when(lit(2) * col("dev2") > lit(3) * col("mad4"), 1L).otherwise(0L)
              .as("anomaly"))
          .orderBy("day")
      }),

    // Growth accounting (round 9, seventh wave) — the DAU/MAU decomposition
    // every product-analytics readout opens with: per 7-day period, each
    // active user classifies as NEW (first period ever), RETAINED (also
    // active the prior period) or RESURRECTED (active before, skipped the
    // prior period); CHURNED(p) = active(p−1) − retained(p) closes the
    // identity. One user_id shuffle carries the per-user period sequence
    // (first-period min + lag over ≤ period-count rows per user); the
    // classification rollup and the prior-period totals join are
    // period-domain-sized. All outputs exact counts, and the conservation
    // identity active = new + retained + resurrected holds row for row.
    Q("win_growth_accounting", Some(
      "WITH a AS (SELECT DISTINCT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 // 7 AS p FROM events), " +
        "c AS (SELECT user_id, p, MIN(p) OVER (PARTITION BY user_id) AS first_p, " +
        "LAG(p) OVER (PARTITION BY user_id ORDER BY p) AS prev_p FROM a), " +
        "k AS (SELECT p, " +
        "CAST(SUM(CASE WHEN p = first_p THEN 1 ELSE 0 END) AS BIGINT) AS n_new, " +
        "CAST(SUM(CASE WHEN prev_p = p - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained, " +
        "CAST(SUM(CASE WHEN p > first_p AND (prev_p IS NULL OR prev_p < p - 1) THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected, " +
        "CAST(COUNT(*) AS BIGINT) AS n_active FROM c GROUP BY p) " +
        "SELECT k.p, k.n_active, k.n_new, k.n_retained, k.n_resurrected, " +
        "CAST(COALESCE(prev.n_active, 0) - k.n_retained AS BIGINT) AS n_churned " +
        "FROM k LEFT JOIN k prev ON prev.p = k.p - 1 ORDER BY k.p"),
      (s, d) => {
        val a = T.events(s, d)
          .select(col("user_id"), expr("unix_timestamp(ts) div 86400 div 7").as("p"))
          .distinct()
        val wU = Window.partitionBy("user_id")
        val c = a.select(col("user_id"), col("p"),
          min("p").over(wU).as("first_p"),
          lag("p", 1).over(wU.orderBy("p")).as("prev_p"))
        val k = c.groupBy("p").agg(
          sum(when(col("p") === col("first_p"), 1L).otherwise(0L)).as("n_new"),
          sum(when(col("prev_p") === col("p") - 1, 1L).otherwise(0L)).as("n_retained"),
          sum(when(col("p") > col("first_p") &&
            (col("prev_p").isNull || col("prev_p") < col("p") - 1), 1L)
            .otherwise(0L)).as("n_resurrected"),
          count(lit(1)).as("n_active"))
        val prev = k.select((col("p") + 1).as("p"), col("n_active").as("prev_active"))
        k.join(broadcast(prev), Seq("p"), "left")
          .select(col("p"), col("n_active"), col("n_new"), col("n_retained"),
            col("n_resurrected"),
            (coalesce(col("prev_active"), lit(0L)) - col("n_retained"))
              .cast("long").as("n_churned"))
          .orderBy("p")
      }),

    // Clamped running balance by Skorokhod reflection (round 9, seventh
    // wave) — the inventory/wallet balance that can never go negative:
    // purchases add stock, clicks consume it, and the floor at zero
    // would seem to force sequential state (each clamp depends on the
    // last), but the reflection identity B_t = S_t − least(0, min_{j≤t}
    // S_j) turns it into TWO plain window functions over one entity
    // sort — the closed form every windowed engine should use instead
    // of a per-key state loop. Exact cents throughout; per-user summary
    // keeps the output entity-sized (final/max balance, depletion
    // count, and the total shortfall the clamp absorbed).
    Q("win_reflected_runsum", Some(
      "WITH e AS (SELECT user_id, event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t, " +
        "CASE WHEN event_type = 'purchase' THEN " + sqlS2("value") +
        " WHEN event_type = 'click' THEN -" + sqlS2("value") + " ELSE 0 END AS delta " +
        "FROM events WHERE event_type IN ('purchase', 'click')), " +
        "c1 AS (SELECT user_id, event_id, t, delta, " +
        "SUM(delta) OVER (PARTITION BY user_id ORDER BY t, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sr FROM e), " +
        "c2 AS (SELECT user_id, delta, sr, " +
        "MIN(sr) OVER (PARTITION BY user_id ORDER BY t, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmin, " +
        "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t, event_id) AS rn, " +
        "COUNT(*) OVER (PARTITION BY user_id) AS n FROM c1), " +
        "b AS (SELECT user_id, delta, sr, rn, n, " +
        "sr - LEAST(CAST(0 AS BIGINT), runmin) AS bal FROM c2) " +
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_moves, " +
        "CAST(MAX(bal) AS BIGINT) AS max_bal, " +
        "CAST(SUM(CASE WHEN bal = 0 AND delta < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_depleted, " +
        "CAST(GREATEST(CAST(0 AS BIGINT), -MIN(sr)) AS BIGINT) AS shortfall_c, " +
        "CAST(MAX(CASE WHEN rn = n THEN bal END) AS BIGINT) AS final_bal " +
        "FROM b GROUP BY user_id ORDER BY user_id"),
      (s, d) => {
        val e = T.events(s, d)
          .where(col("event_type").isin("purchase", "click"))
          .select(col("user_id"), col("event_id"), epochS(col("ts")).as("t"),
            when(col("event_type") === "purchase", s2(col("value")))
              .otherwise(-s2(col("value"))).as("delta"))
        val w = Window.partitionBy("user_id").orderBy("t", "event_id")
          .rowsBetween(Window.unboundedPreceding, 0)
        val c = e.withColumn("sr", sum("delta").over(w))
          .withColumn("refl", least(lit(0L), min(col("sr")).over(w)))
          .withColumn("bal", col("sr") - col("refl"))
        val wAll = Window.partitionBy("user_id")
          .orderBy(col("t"), col("event_id"))
        c.withColumn("rn", row_number().over(wAll))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("user_id")))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_moves"), max("bal").as("max_bal"),
            sum(when(col("bal") === 0 && col("delta") < 0, 1L).otherwise(0L))
              .as("n_depleted"),
            greatest(lit(0L), -min(col("sr"))).as("shortfall_c"),
            max(when(col("rn") === col("n"), col("bal"))).as("final_bal"))
          .orderBy("user_id")
      }),

    // MTBF / MTTR (round 9, closing wave) — the reliability pair every
    // incident review reports: per user, Mean Time Between Failures =
    // mean gap between consecutive 'error' events, and Mean Time To
    // Recovery = mean gap from each error to the next NON-error event.
    // Both ride ONE entity-ordered window pass: errors lag against the
    // previous error (a conditional last_value ignore-nulls), recovery
    // via the min following non-error time per error (lead over the
    // error-partitioned frame is wrong under consecutive errors, so
    // recovery uses the ignore-nulls mirror — next non-error timestamp
    // carried backwards). Exact integer seconds; means one IEEE divide
    // each, floored to whole seconds.
    Q("win_mtbf", Some(
      "WITH e AS (SELECT user_id, event_id, event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t FROM events), " +
        "w AS (SELECT user_id, event_id, event_type, t, " +
        "LAG(CASE WHEN event_type = 'error' THEN t END IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY t, event_id) AS prev_err, " +
        "LEAD(CASE WHEN event_type <> 'error' THEN t END IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY t, event_id) AS next_ok FROM e), " +
        "f AS (SELECT user_id, " +
        "CASE WHEN event_type = 'error' AND prev_err IS NOT NULL THEN t - prev_err END AS tbf, " +
        "CASE WHEN event_type = 'error' AND next_ok IS NOT NULL THEN next_ok - t END AS ttr " +
        "FROM w WHERE event_type = 'error') " +
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_failures, " +
        "CAST(COUNT(tbf) AS BIGINT) AS n_gaps, " +
        "CAST(FLOOR(CAST(SUM(tbf) AS DOUBLE) / COUNT(tbf) + 0.5) AS BIGINT) AS mtbf_s, " +
        "CAST(FLOOR(CAST(SUM(ttr) AS DOUBLE) / COUNT(ttr) + 0.5) AS BIGINT) AS mttr_s " +
        "FROM f GROUP BY user_id ORDER BY user_id"),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("t", "event_id")
        val e = T.events(s, d).select(col("user_id"), col("event_id"),
          col("event_type"), epochS(col("ts")).as("t"))
        val prevErr = lag(when(col("event_type") === "error", col("t")), 1, null, true)
          .over(w)
        val nextOk = lead(when(col("event_type") =!= "error", col("t")), 1, null, true)
          .over(w)
        e.select(col("user_id"), col("event_type"), col("t"),
            prevErr.as("prev_err"), nextOk.as("next_ok"))
          .where(col("event_type") === "error")
          .select(col("user_id"),
            when(col("prev_err").isNotNull, col("t") - col("prev_err")).as("tbf"),
            when(col("next_ok").isNotNull, col("next_ok") - col("t")).as("ttr"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_failures"), count("tbf").as("n_gaps"),
            floor(sum("tbf").cast("double") / count("tbf") + 0.5).cast("long").as("mtbf_s"),
            floor(sum("ttr").cast("double") / count("ttr") + 0.5).cast("long").as("mttr_s"))
          .orderBy("user_id")
      }),

    // Multiwindow SLO burn-rate alerts (round 9, seventh wave) — the
    // Google SRE error-budget recipe: alert only when BOTH a fast (1 h)
    // and a slow (6 h) window burn the budget, so blips don't page but
    // sustained burns do. Budget = 20% error share; burn = rate/0.2.
    // The alert decision is INTEGER throughout — 50·err > 12·tot for
    // the 1.2× fast window and 500·err₆ > 105·tot₆ for the 1.05× slow
    // one (cross-multiplied, no rate ever materializes) — while the
    // reported burn values are one IEEE divide each on the s6 grid.
    // Hourly rollup first; the 6-h window rides the calendar-bounded
    // hour series.
    Q("win_slo_burn", Some(
      "WITH h AS (SELECT CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 3600 AS hr, " +
        "CAST(COUNT(*) AS BIGINT) AS tot, " +
        "CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS err " +
        "FROM events GROUP BY hr), " +
        "w AS (SELECT hr, tot, err, " +
        "CAST(SUM(tot) OVER win6 AS BIGINT) AS tot6, CAST(SUM(err) OVER win6 AS BIGINT) AS err6 " +
        "FROM h WINDOW win6 AS (ORDER BY hr ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)) " +
        "SELECT hr, tot, err, " +
        sqlS6("CAST(err AS DOUBLE) / CAST(tot AS DOUBLE) / 0.2") + " AS burn1h6, " +
        sqlS6("CAST(err6 AS DOUBLE) / CAST(tot6 AS DOUBLE) / 0.2") + " AS burn6h6, " +
        "CAST(CASE WHEN 50 * err > 12 * tot AND 500 * err6 > 105 * tot6 THEN 1 ELSE 0 END AS BIGINT) AS alert " +
        "FROM w ORDER BY hr"),
      (s, d) => {
        val h = T.events(s, d)
          .groupBy(expr("unix_timestamp(ts) div 3600").as("hr"))
          .agg(count(lit(1)).as("tot"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("err"))
        val w6 = Window.orderBy("hr").rowsBetween(-5, 0)
        h.withColumn("tot6", sum("tot").over(w6))
          .withColumn("err6", sum("err").over(w6))
          .select(col("hr"), col("tot"), col("err"),
            s6(col("err").cast("double") / col("tot").cast("double") / 0.2).as("burn1h6"),
            s6(col("err6").cast("double") / col("tot6").cast("double") / 0.2).as("burn6h6"),
            when(lit(50) * col("err") > lit(12) * col("tot") &&
              lit(500) * col("err6") > lit(105) * col("tot6"), 1L).otherwise(0L)
              .as("alert"))
          .orderBy("hr")
      }),

    // Largest-triangle downsampling (round 9, seventh wave) — the LTTB
    // family's deterministic one-bucket variant (Steinarsson 2013): the
    // day-series point kept per 7-day bucket is the one subtending the
    // largest triangle against the NEIGHBOR BUCKET CENTROIDS — the
    // visual-fidelity downsampler time-series dashboards ship instead
    // of naive striding. Exactness: the triangle area comparison is
    // cross-multiplied by the neighbor counts so every compared metric
    // is an exact int64 (|·| of integer products) — no centroid double
    // ever enters the ordering; ties break to the earlier day. Interior
    // buckets only (both neighbors exist); everything after the daily
    // agg is calendar-bounded.
    Q("win_lttb", Some(
      "WITH g AS (SELECT CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) // 86400 AS day, " +
        "CAST(SUM(" + sqlS2("o_totalprice") + ") AS BIGINT) AS v FROM orders GROUP BY day), " +
        "b AS (SELECT day // 7 AS bk, CAST(COUNT(*) AS BIGINT) AS c, " +
        "CAST(SUM(day) AS BIGINT) AS sd, CAST(SUM(v) AS BIGINT) AS sv FROM g GROUP BY bk), " +
        "j AS (SELECT g.day, g.v, g.day // 7 AS bk, " +
        "a.c AS ca, a.sd AS sda, a.sv AS sva, nb.c AS cb, nb.sd AS sdb, nb.sv AS svb " +
        "FROM g JOIN b a ON a.bk = g.day // 7 - 1 JOIN b nb ON nb.bk = g.day // 7 + 1), " +
        "m AS (SELECT day, v, bk, " +
        "ABS((sda * cb - sdb * ca) * (v * ca - sva) - (sda - day * ca) * (svb * ca - sva * cb)) AS metric " +
        "FROM j), " +
        "r AS (SELECT day, v, bk, metric, " +
        "ROW_NUMBER() OVER (PARTITION BY bk ORDER BY metric DESC, day) AS rn FROM m) " +
        "SELECT bk, day, v AS v_c, metric FROM r WHERE rn = 1 ORDER BY bk"),
      (s, d) => {
        val g = T.orders(s, d)
          .groupBy(expr("unix_timestamp(o_orderdate) div 86400").as("day"))
          .agg(sum(s2(col("o_totalprice"))).as("v"))
        val b = g.groupBy(expr("day div 7").as("bk"))
          .agg(count(lit(1)).as("c"), sum("day").as("sd"), sum("v").as("sv"))
        val withBk = g.withColumn("bk", expr("day div 7"))
        val j = withBk
          .join(broadcast(b.select((col("bk") + 1).as("bk"), col("c").as("ca"),
            col("sd").as("sda"), col("sv").as("sva"))), "bk")
          .join(broadcast(b.select((col("bk") - 1).as("bk"), col("c").as("cb"),
            col("sd").as("sdb"), col("sv").as("svb"))), "bk")
        val metric = abs(
          (col("sda") * col("cb") - col("sdb") * col("ca")) *
            (col("v") * col("ca") - col("sva")) -
            (col("sda") - col("day") * col("ca")) *
              (col("svb") * col("ca") - col("sva") * col("cb")))
        val wB = Window.partitionBy("bk").orderBy(col("metric").desc, col("day"))
        j.withColumn("metric", metric)
          .withColumn("rn", row_number().over(wB))
          .where(col("rn") === 1)
          .select(col("bk"), col("day"), col("v").as("v_c"), col("metric"))
          .orderBy("bk")
      }),

    // Impossible-travel detection (round 9, seventh wave) — the
    // account-takeover heuristic every auth pipeline runs: consecutive
    // events of one user whose implied ground speed exceeds a bound.
    // Coordinates are the eo_geohash micro-degree synthesis; the test
    // stays INTEGER by comparing squared equirectangular distance
    // against (v·Δt)² cross-multiplied — no √, no trig, no division:
    // flag ⟺ dy² + dx² > (VMAX_µdeg/s · Δt)², with Δt clamped to one
    // day (longer gaps are never "impossible" AND the clamp keeps the
    // right-hand side inside int64 on any corpus span). One entity-ordered lag
    // window; per-user rollup keeps the output entity-sized (flag count
    // plus the worst squared-speed ratio's event id).
    Q("win_impossible_travel", Some {
      val latU = "((event_id * 131) % 180000001 - 90000000)"
      val lonU = "((event_id * 7919) % 360000001 - 180000000)"
      "WITH e AS (SELECT user_id, event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t, " +
        s"$latU AS la, $lonU AS lo FROM events), " +
        "w AS (SELECT user_id, event_id, t, la, lo, " +
        "LAG(t) OVER win AS pt, LAG(la) OVER win AS pla, LAG(lo) OVER win AS plo " +
        "FROM e WINDOW win AS (PARTITION BY user_id ORDER BY t, event_id)), " +
        "f AS (SELECT user_id, event_id, " +
        "(la - pla) * (la - pla) + (lo - plo) * (lo - plo) AS d2, " +
        "LEAST(GREATEST(t - pt, 1), 86400) AS dt FROM w WHERE pt IS NOT NULL), " +
        "g AS (SELECT user_id, event_id, d2, dt, " +
        "CASE WHEN d2 > 1000000 * dt * dt THEN 1 ELSE 0 END AS flag FROM f) " +
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_hops, " +
        "CAST(SUM(flag) AS BIGINT) AS n_flagged, " +
        "CAST(MIN(CASE WHEN flag = 1 THEN event_id END) AS BIGINT) AS first_flagged " +
        "FROM g GROUP BY user_id ORDER BY user_id"
    },
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("t", "event_id")
        val e = T.events(s, d).select(col("user_id"), col("event_id"),
          epochS(col("ts")).as("t"),
          expr("(event_id * 131) % 180000001 - 90000000").as("la"),
          expr("(event_id * 7919) % 360000001 - 180000000").as("lo"))
        val f = e.select(col("user_id"), col("event_id"), col("t"), col("la"), col("lo"),
            lag("t", 1).over(w).as("pt"), lag("la", 1).over(w).as("pla"),
            lag("lo", 1).over(w).as("plo"))
          .where(col("pt").isNotNull)
          .select(col("user_id"), col("event_id"),
            ((col("la") - col("pla")) * (col("la") - col("pla")) +
              (col("lo") - col("plo")) * (col("lo") - col("plo"))).as("d2"),
            least(greatest(col("t") - col("pt"), lit(1L)), lit(86400L)).as("dt"))
        f.withColumn("flag",
            when(col("d2") > lit(1000000L) * col("dt") * col("dt"), 1L).otherwise(0L))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_hops"), sum("flag").as("n_flagged"),
            min(when(col("flag") === 1, col("event_id"))).as("first_flagged"))
          .orderBy("user_id")
      }),

    // Top-k leaderboard churn (round 9, seventh wave) — how stable is
    // the weekly top-5 spenders list: consecutive weeks' top sets
    // compared by Jaccard overlap, the rank-stability readout ops teams
    // watch for sudden cohort shifts (a crash to 0 means the board
    // turned over entirely). Weekly top-5 via a per-week rank window
    // over the (week, user) aggregate — week-bounded partitions, exact
    // cents, (revenue DESC, user_id) ties — then ONE equi self-join on
    // the adjacent week pairs the sets; |A∪B| = 10 − |A∩B| because both
    // sets hold exactly 5. Output rows are week-domain-sized.
    Q("win_topk_churn", Some(
      "WITH g AS (SELECT CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 604800 AS wk, user_id, " +
        "CAST(SUM(" + sqlS2("value") + ") AS BIGINT) AS rev FROM events " +
        "WHERE event_type = 'purchase' GROUP BY wk, user_id), " +
        "r AS (SELECT wk, user_id, " +
        "ROW_NUMBER() OVER (PARTITION BY wk ORDER BY rev DESC, user_id) AS rn FROM g), " +
        "t AS (SELECT wk, user_id FROM r WHERE rn <= 5), " +
        "j AS (SELECT a.wk AS wk_from, CAST(COUNT(*) AS BIGINT) AS n_common " +
        "FROM t a JOIN t b ON b.wk = a.wk + 1 AND b.user_id = a.user_id GROUP BY a.wk), " +
        "sz AS (SELECT wk, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY wk), " +
        "wks AS (SELECT DISTINCT wk FROM t WHERE EXISTS (SELECT 1 FROM t i WHERE i.wk = t.wk + 1)) " +
        "SELECT wks.wk AS wk_from, COALESCE(j.n_common, 0) AS n_common, " +
        sqlS6("CAST(COALESCE(j.n_common, 0) AS DOUBLE) / " +
          "CAST(sa.n + sb.n - COALESCE(j.n_common, 0) AS DOUBLE)") +
        " AS jaccard6 FROM wks LEFT JOIN j ON j.wk_from = wks.wk " +
        "JOIN sz sa ON sa.wk = wks.wk JOIN sz sb ON sb.wk = wks.wk + 1 " +
        "ORDER BY wk_from"),
      (s, d) => {
        val g = T.events(s, d).where(col("event_type") === "purchase")
          .groupBy(expr("unix_timestamp(ts) div 604800").as("wk"), col("user_id"))
          .agg(sum(s2(col("value"))).as("rev"))
        val wWk = Window.partitionBy("wk").orderBy(col("rev").desc, col("user_id"))
        // BUILD-TIME SIDE EFFECT (the win_ntile note): t persists for its
        // five consumers below and relies on the harness's per-key
        // clearCache to release it — nothing here unpersists, since the
        // returned plan is lazy and consumes the cache at execution.
        val t = g.withColumn("rn", row_number().over(wWk))
          .where(col("rn") <= 5).select("wk", "user_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nxt = t.select((col("wk") - 1).as("wk"), col("user_id"))
        val j = t.join(nxt, Seq("wk", "user_id"))
          .groupBy(col("wk").as("wk_from")).agg(count(lit(1)).as("n_common"))
        val sz = t.groupBy("wk").agg(count(lit(1)).as("n"))
        val wks = t.select("wk").distinct()
          .join(t.select((col("wk") - 1).as("wk")).distinct(), Seq("wk"))
          .select(col("wk").as("wk_from"))
        val nc = coalesce(col("n_common"), lit(0L))
        // true Jaccard: |A∩B| / (|A| + |B| − |A∩B|) with the ACTUAL week
        // list sizes (a week can hold < 5 purchase-active users — the
        // fixed 10-denominator form mislabeled those weeks; ADVICE r9)
        wks.join(j, Seq("wk_from"), "left")
          .join(broadcast(sz.select(col("wk").as("wk_from"), col("n").as("na"))),
            "wk_from")
          .join(broadcast(sz.select((col("wk") - 1).as("wk_from"), col("n").as("nb"))),
            "wk_from")
          .select(col("wk_from"), nc.as("n_common"),
            s6(nc.cast("double") /
              (col("na") + col("nb") - nc).cast("double")).as("jaccard6"))
          .orderBy("wk_from")
      }),

    // Time-in-state accounting (round 9, seventh wave) — how long each
    // user SPENDS in each behavioral state, where the state holds from
    // an event until the next one (the session-replay / device-state
    // accounting shape): lead(t) − t per row via one entity-ordered
    // window, summed per (user's) state with exact integer seconds;
    // terminal events carry no duration on either engine. The per-type
    // rollup also reports each state's share of the user's total tracked
    // time as one IEEE divide on the s6 grid.
    Q("win_state_duration", Some(
      "WITH e AS (SELECT user_id, event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t, event_id FROM events), " +
        "g AS (SELECT user_id, event_type, " +
        "LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t AS dur FROM e), " +
        "st AS (SELECT user_id, event_type, CAST(SUM(dur) AS BIGINT) AS secs, " +
        "CAST(COUNT(dur) AS BIGINT) AS n_holds FROM g WHERE dur IS NOT NULL " +
        "GROUP BY user_id, event_type), " +
        "tot AS (SELECT user_id, CAST(SUM(secs) AS BIGINT) AS total FROM st GROUP BY user_id) " +
        "SELECT st.user_id, st.event_type, st.n_holds, st.secs, " +
        sqlS6("CAST(st.secs AS DOUBLE) / CAST(tot.total AS DOUBLE)") + " AS share6 " +
        "FROM st JOIN tot ON tot.user_id = st.user_id " +
        "ORDER BY st.user_id, st.event_type"),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("t", "event_id")
        val g = T.events(s, d)
          .select(col("user_id"), col("event_type"), epochS(col("ts")).as("t"),
            col("event_id"))
          .withColumn("dur", lead(col("t"), 1).over(w) - col("t"))
          .where(col("dur").isNotNull)
        val st = g.groupBy("user_id", "event_type")
          .agg(sum("dur").as("secs"), count("dur").as("n_holds"))
        val tot = st.groupBy("user_id").agg(sum("secs").as("total"))
        st.join(broadcast(tot), "user_id")
          .select(col("user_id"), col("event_type"), col("n_holds"), col("secs"),
            s6(col("secs").cast("double") / col("total").cast("double")).as("share6"))
          .orderBy("user_id", "event_type")
      }),

    // Cohort LTV curves (round 9, seventh wave) — the revenue companion
    // to win_retention's active-user triangle: users cohort by their
    // FIRST purchase week, and each (cohort, weeks-since) cell carries
    // that week's purchase revenue plus the running cumulative — the
    // lifetime-value curve finance reads off the diagonal. Exact cents
    // everywhere; the one data-sized shuffle is the user_id rollup that
    // pins each user's cohort, then everything is (cohort × age)-sized,
    // including the cumulative window (entity-partitioned by cohort).
    Q("win_cohort_ltv", Some(
      "WITH pur AS (SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 604800 AS wk, " +
        sqlS2("value") + " AS v FROM events WHERE event_type = 'purchase'), " +
        "coh AS (SELECT user_id, MIN(wk) AS cohort FROM pur GROUP BY user_id), " +
        "cell AS (SELECT c.cohort, p.wk - c.cohort AS age, " +
        "CAST(SUM(p.v) AS BIGINT) AS rev_c, CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS n_buyers " +
        "FROM pur p JOIN coh c ON c.user_id = p.user_id GROUP BY c.cohort, age) " +
        "SELECT cohort, age, n_buyers, rev_c, " +
        "CAST(SUM(rev_c) OVER (PARTITION BY cohort ORDER BY age " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_rev_c " +
        "FROM cell ORDER BY cohort, age"),
      (s, d) => {
        val pur = T.events(s, d).where(col("event_type") === "purchase")
          .select(col("user_id"), expr("unix_timestamp(ts) div 604800").as("wk"),
            s2(col("value")).as("v"))
        val coh = pur.groupBy("user_id").agg(min("wk").as("cohort"))
        val cell = pur.join(coh, "user_id")
          .groupBy(col("cohort"), (col("wk") - col("cohort")).as("age"))
          .agg(sum("v").as("rev_c"), countDistinct(col("user_id")).as("n_buyers"))
        val wC = Window.partitionBy("cohort").orderBy("age")
          .rowsBetween(Window.unboundedPreceding, 0)
        cell.select(col("cohort"), col("age"), col("n_buyers"), col("rev_c"),
            sum("rev_c").over(wC).as("cum_rev_c"))
          .orderBy("cohort", "age")
      }),

    // Seasonal strength (round 9, seventh wave) — Hyndman's tsfeatures
    // F_s = max(0, 1 − Var(resid)/Var(seas + resid)): the scalar that
    // says whether win_decompose's weekly component is real signal or
    // noise (the model-selection gate before fitting seasonal
    // forecasters). Both variances come from exact integer moment sums
    // over the decomposition's integer residuals/deseasonalized values
    // (all in 7× units, which cancel in the ratio), then one fixed IEEE
    // sequence onto the s6 grid. Day-series-sized everywhere after the
    // daily partial agg.
    Q("win_seasonal_strength", Some {
      val vr = "((CAST(n AS DOUBLE) * CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)) / " +
        "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))"
      val vd = "((CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)) / " +
        "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))"
      "WITH g AS (SELECT CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) // 86400 AS day, " +
        "CAST(SUM(" + sqlS2("o_totalprice") + ") AS BIGINT) AS v FROM orders GROUP BY day), " +
        "f AS (SELECT day, v, " +
        "SUM(v) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS t7, " +
        "COUNT(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7 " +
        "FROM g), " +
        "d AS (SELECT day, v, t7, day % 7 AS wd, 7 * v - t7 AS detr " +
        "FROM f WHERE n7 = 7), " +
        "sidx AS (SELECT wd, CAST(" +
        sqlHalfUpDiv("CAST(SUM(detr) AS BIGINT)", "COUNT(*)") +
        " AS BIGINT) AS seas " +
        "FROM d GROUP BY wd), " +
        "r0 AS (SELECT d.detr AS ds, d.detr - sidx.seas AS resid FROM d JOIN sidx USING (wd)), " +
        "r AS (SELECT CAST(FLOOR(CAST(ds AS DOUBLE) / 1e4) AS BIGINT) AS ds, " +
        "CAST(FLOOR(CAST(resid AS DOUBLE) / 1e4) AS BIGINT) AS resid FROM r0), " +
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(resid) AS BIGINT) AS sr, CAST(SUM(resid * resid) AS BIGINT) AS srr, " +
        "CAST(SUM(ds) AS BIGINT) AS sd, CAST(SUM(ds * ds) AS BIGINT) AS sdd FROM r) " +
        s"SELECT n, " + sqlS6(s"GREATEST(0.0, 1.0 - $vr / $vd)") + " AS strength6 FROM m"
    },
      (s, d) => {
        // moments in hundred-dollar (1e4-cent) units: cent-scale squares
        // overflow int64 over the full calendar (the win_zscore lesson);
        // the 1e4 quantization cancels in the variance ratio to ~1e-8
        val base = decomposedDetrResid(s, d).select(
          floor(col("ds").cast("double") / 1e4).cast("long").as("ds"),
          floor(col("resid").cast("double") / 1e4).cast("long").as("resid"))
        val m = base.agg(count(lit(1)).as("n"),
          sum("resid").as("sr"), sum(col("resid") * col("resid")).as("srr"),
          sum("ds").as("sd"), sum(col("ds") * col("ds")).as("sdd"))
        val nD = col("n").cast("double")
        val vr = (nD * col("srr").cast("double") -
          col("sr").cast("double") * col("sr").cast("double")) / (nD * (nD - lit(1.0)))
        val vd = (nD * col("sdd").cast("double") -
          col("sd").cast("double") * col("sd").cast("double")) / (nD * (nD - lit(1.0)))
        m.select(col("n"), s6(greatest(lit(0.0), lit(1.0) - vr / vd)).as("strength6"))
      }),

    // Sequential probability ratio test (round 9, seventh wave) — Wald's
    // SPRT, the always-valid sequential monitor that lets an A/B readout
    // stop EARLY instead of waiting for agg_ab_lift's fixed-horizon z:
    // H0 p=0.2 vs H1 p=0.3 on per-user conversion, users observed in
    // user_id order (the deterministic stand-in for arrival order). Each
    // observation adds one of two CONSTANT log-likelihood-ratio terms —
    // s6-floored double literals, so no libm call exists anywhere — and
    // the decision compares the exact integer cumsum against the
    // ±ln((1−β)/α) Wald boundaries (α=β=0.05). Output = one trajectory
    // summary row: final LLR, first boundary-crossing index each way,
    // and the decision. The cumsum window runs over the user-level
    // rollup (dimension-sized); SPRT is inherently sequential, so at
    // scale the same plan runs per experiment cell, not per corpus.
    Q("win_sprt", Some {
      // ln(0.3/0.2), ln(0.7/0.8), ln(19) as double literals; s6 floors
      val aT = "CAST(FLOOR(0.4054651081081644 * 1e6 + 0.5) AS BIGINT)"
      val bT = "CAST(FLOOR(-0.13353139262452263 * 1e6 + 0.5) AS BIGINT)"
      val bound = "CAST(FLOOR(2.9444389791664403 * 1e6 + 0.5) AS BIGINT)"
      "WITH u AS (SELECT user_id, MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv " +
        "FROM events GROUP BY user_id), " +
        s"t AS (SELECT user_id, conv, CASE WHEN conv = 1 THEN $aT ELSE $bT END AS term6 FROM u), " +
        "c AS (SELECT user_id, conv, " +
        "CAST(SUM(term6) OVER (ORDER BY user_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS llr6, " +
        "ROW_NUMBER() OVER (ORDER BY user_id) AS rn FROM t) " +
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_users, " +
        "CAST(SUM(conv) AS BIGINT) AS n_conv, " +
        "CAST(MAX(CASE WHEN rn = (SELECT COUNT(*) FROM u) THEN llr6 END) AS BIGINT) AS llr6_final, " +
        s"CAST(MIN(CASE WHEN llr6 >= $bound THEN rn END) AS BIGINT) AS first_accept, " +
        s"CAST(MIN(CASE WHEN llr6 <= -$bound THEN rn END) AS BIGINT) AS first_reject, " +
        s"CAST(CASE WHEN MIN(CASE WHEN llr6 >= $bound THEN rn END) IS NOT NULL " +
        s"AND (MIN(CASE WHEN llr6 <= -$bound THEN rn END) IS NULL " +
        s"OR MIN(CASE WHEN llr6 >= $bound THEN rn END) < MIN(CASE WHEN llr6 <= -$bound THEN rn END)) THEN 1 " +
        s"WHEN MIN(CASE WHEN llr6 <= -$bound THEN rn END) IS NOT NULL THEN -1 ELSE 0 END AS INTEGER) AS decision " +
        "FROM c"
    },
      (s, d) => {
        val aT = floor(lit(0.4054651081081644) * 1e6 + 0.5).cast("long")
        val bT = floor(lit(-0.13353139262452263) * 1e6 + 0.5).cast("long")
        val bound = floor(lit(2.9444389791664403) * 1e6 + 0.5).cast("long")
        val u = T.events(s, d).groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
        val wOrd = Window.orderBy("user_id")
        val c = u.select(col("user_id"), col("conv"),
            when(col("conv") === 1, aT).otherwise(bT).as("term6"))
          .select(col("conv"),
            sum("term6").over(wOrd.rowsBetween(Window.unboundedPreceding, 0)).as("llr6"),
            row_number().over(wOrd).as("rn"))
        val nTot = u.agg(count(lit(1)).as("n_all"))
        val acc = min(when(col("llr6") >= bound, col("rn"))).cast("long")
        val rej = min(when(col("llr6") <= -bound, col("rn"))).cast("long")
        c.crossJoin(broadcast(nTot))
          .agg(count(lit(1)).as("n_users"), sum("conv").as("n_conv"),
            max(when(col("rn") === col("n_all"), col("llr6"))).as("llr6_final"),
            acc.as("first_accept"), rej.as("first_reject"))
          .select(col("n_users"), col("n_conv"), col("llr6_final"),
            col("first_accept"), col("first_reject"),
            when(col("first_accept").isNotNull &&
              (col("first_reject").isNull ||
                col("first_accept") < col("first_reject")), 1)
              .when(col("first_reject").isNotNull, -1).otherwise(0)
              .cast("int").as("decision"))
      }),

    // Pettitt changepoint test (round 10, third wave) — the rank-based
    // single-changepoint detector [Pettitt 1979] every hydrology/climate
    // homogeneity screen runs, here over the daily revenue series. 100%
    // integer: S_t = #{j: x_j < x_t} − #{j: x_j > x_t} comes from the
    // day-domain² sign cross (the series is CALENDAR-sized — a few
    // hundred rows at any corpus scale, after one linear (day) partial
    // agg collapses the data-sized input — so the broadcast cross join
    // is domain², never data²), U_t = running Σ S_t in day order (the
    // Pettitt recurrence U_t = U_{t−1} + Σ_j sgn(x_t − x_j)), and the
    // changepoint is the EARLIEST argmax of |U_t|. U_n ≡ 0 by
    // antisymmetry — the spec's invariant. The significance exponential
    // exp(−6K²/(n³+n²)) stays out of the graded surface (Det rule: no
    // libm); K itself is the graded statistic.
    Q("win_pettitt", Some(
      "WITH dly AS (SELECT CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS day, " +
        "CAST(SUM(" + sqlS2("value") + ") AS BIGINT) AS x FROM events GROUP BY day), " +
        "sg AS (SELECT a.day, CAST(SUM(CASE WHEN b.x < a.x THEN 1 " +
        "WHEN b.x > a.x THEN -1 ELSE 0 END) AS BIGINT) AS s " +
        "FROM dly a CROSS JOIN dly b GROUP BY a.day), " +
        "u AS (SELECT day, s, CAST(SUM(s) OVER (ORDER BY day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS u FROM sg), " +
        "mx AS (SELECT MAX(ABS(u)) AS k, MIN(CASE WHEN ABS(u) = (SELECT MAX(ABS(u)) FROM u) " +
        "THEN day END) AS kday FROM u) " +
        "SELECT day, s, u, CAST(CASE WHEN day = (SELECT kday FROM mx) " +
        "THEN 1 ELSE 0 END AS INT) AS is_cp FROM u ORDER BY day"),
      (s, d) => {
        val dly = T.events(s, d)
          .groupBy(expr("unix_timestamp(ts) div 86400").as("day"))
          .agg(sum(s2(col("value"))).as("x"))
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val b = dly.select(col("x").as("x2"))
        val sg = dly.crossJoin(broadcast(b))
          .groupBy("day")
          .agg(sum(when(col("x2") < col("x"), 1L)
            .when(col("x2") > col("x"), -1L).otherwise(0L)).as("s"))
        val wOrd = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, 0)
        val u = sg.withColumn("u", sum(col("s")).over(wOrd))
        val mx = u.agg(max(abs(col("u"))).as("k"))
          .crossJoin(u.select(col("day").as("d2"), col("u").as("u2")))
          .where(abs(col("u2")) === col("k"))
          .agg(min(col("d2")).as("kday"))
        u.crossJoin(broadcast(mx))
          .select(col("day"), col("s"), col("u"),
            when(col("day") === col("kday"), 1).otherwise(0)
              .cast("int").as("is_cp"))
          .orderBy("day")
      }),

    // Periodogram / DFT power (round 12, third wave) [Schuster 1898;
    // the spectral density every seasonality detector reads] — the
    // Fourier view next to win_haar's dyadic one: for harmonics
    // k = 1..3 over each type's daily cent series, a_k = Σ xᵢ·cos4,
    // b_k = Σ xᵢ·sin4 with the eo_harmonic coarse-grid trig rule
    // (angles 2πki/n are exact shared rationals, trig results
    // s4-floored BEFORE the multiply, so a_k/b_k are exact integer
    // dot products); power = (a/10⁴)² + (b/10⁴)² is two IEEE squares
    // + one add, s0-floored (cents² stays inside int64 where a
    // squared s6 would not). One daily rollup shuffle + a 3-row
    // harmonic explode — calendar-bounded like the rest of the family.
    Q("win_dft_power", Some(
      "WITH dly AS (SELECT event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS day, " +
        "CAST(SUM(" + sqlS2("value") + ") AS BIGINT) AS x FROM events GROUP BY event_type, day), " +
        "p AS (SELECT event_type, x, " +
        "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) - 1 AS i, " +
        "COUNT(*) OVER (PARTITION BY event_type) AS n FROM dly), " +
        "h AS (SELECT p.event_type, p.x, p.i, p.n, k.k, p.i * k.k AS ki " +
        "FROM p CROSS JOIN (SELECT UNNEST(ARRAY[1, 2, 3]) AS k) k), " +
        "t AS (SELECT event_type, k, n, x, " +
        sqlS4("COS(2.0 * PI() * CAST(ki AS DOUBLE) / CAST(n AS DOUBLE))") + " AS c4, " +
        sqlS4("SIN(2.0 * PI() * CAST(ki AS DOUBLE) / CAST(n AS DOUBLE))") + " AS s4 FROM h), " +
        "m AS (SELECT event_type, k, CAST(MAX(n) AS BIGINT) AS n, " +
        "CAST(SUM(x * c4) AS BIGINT) AS a4, CAST(SUM(x * s4) AS BIGINT) AS b4 " +
        "FROM t GROUP BY event_type, k) " +
        "SELECT event_type, CAST(k AS BIGINT) AS k, n, a4, b4, " +
        sqlS0("(CAST(a4 AS DOUBLE) / 10000.0) * (CAST(a4 AS DOUBLE) / 10000.0) + " +
          "(CAST(b4 AS DOUBLE) / 10000.0) * (CAST(b4 AS DOUBLE) / 10000.0)") +
        " AS power0 FROM m ORDER BY event_type, k"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val dly = T.events(s, d)
          .groupBy(col("event_type"),
            expr("unix_timestamp(ts) div 86400").as("day"))
          .agg(sum(s2(col("value"))).as("x"))
        val p = dly
          .withColumn("i", row_number().over(
            Window.partitionBy("event_type").orderBy("day")).cast("long") - 1)
          .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        val ks = s.range(1, 4).select(col("id").as("k"))
        val h = p.crossJoin(broadcast(ks))
          .withColumn("ki", col("i") * col("k"))
        val ang = lit(2.0) * lit(math.Pi) * col("ki").cast("double") /
          col("n").cast("double")
        val t = h.select(col("event_type"), col("k"), col("n"), col("x"),
          Det.s4(cos(ang)).as("c4"), Det.s4(sin(ang)).as("s4"))
        val m = t.groupBy("event_type", "k")
          .agg(max(col("n")).as("n"), sum(col("x") * col("c4")).as("a4"),
            sum(col("x") * col("s4")).as("b4"))
        val da = col("a4").cast("double") / lit(10000.0)
        val db = col("b4").cast("double") / lit(10000.0)
        m.select(col("event_type"), col("k"), col("n"), col("a4"), col("b4"),
            s0(da * da + db * db).as("power0"))
          .orderBy("event_type", "k")
      }),

    // Haar wavelet decomposition (round 12, third wave) [Haar 1910;
    // Mallat 1989 multiresolution] — the dyadic frequency split
    // win_decompose's moving averages approximate: two UNNORMALIZED
    // Haar levels over each type's daily cent-sum series (a = x₂ᵢ+x₂ᵢ₊₁,
    // d = x₂ᵢ−x₂ᵢ₊₁, level 2 over level-1 approximations), which keeps
    // every coefficient an EXACT INTEGER — the graph_katz determinism
    // class, nothing to quantize. Graded per (type, level): coefficient
    // count, detail energy Σd² (the scale's variance share — the
    // wavelet periodogram), and the position-weighted checksum pinning
    // every coefficient to its slot. Odd tails drop (the standard
    // truncation). One daily rollup shuffle + calendar-bounded windows.
    Q("win_haar", Some(
      "WITH dly AS (SELECT event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS day, " +
        "CAST(SUM(" + sqlS2("value") + ") AS BIGINT) AS x FROM events GROUP BY event_type, day), " +
        "p AS (SELECT event_type, x, " +
        "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) - 1 AS i FROM dly), " +
        "l1 AS (SELECT event_type, i // 2 AS j, " +
        "CAST(SUM(CASE WHEN i % 2 = 0 THEN x ELSE 0 END) + SUM(CASE WHEN i % 2 = 1 THEN x ELSE 0 END) AS BIGINT) AS a, " +
        "CAST(SUM(CASE WHEN i % 2 = 0 THEN x ELSE 0 END) - SUM(CASE WHEN i % 2 = 1 THEN x ELSE 0 END) AS BIGINT) AS dd " +
        "FROM p GROUP BY event_type, j HAVING COUNT(*) = 2), " +
        "l2 AS (SELECT event_type, j // 2 AS k, " +
        "CAST(SUM(CASE WHEN j % 2 = 0 THEN a ELSE 0 END) + SUM(CASE WHEN j % 2 = 1 THEN a ELSE 0 END) AS BIGINT) AS a2, " +
        "CAST(SUM(CASE WHEN j % 2 = 0 THEN a ELSE 0 END) - SUM(CASE WHEN j % 2 = 1 THEN a ELSE 0 END) AS BIGINT) AS dd " +
        "FROM l1 GROUP BY event_type, k HAVING COUNT(*) = 2) " +
        "SELECT event_type, CAST(1 AS BIGINT) AS level, CAST(COUNT(*) AS BIGINT) AS n_coef, " +
        "CAST(SUM(dd * dd) AS BIGINT) AS energy, CAST(SUM(dd * (j + 1)) AS BIGINT) AS checksum " +
        "FROM l1 GROUP BY event_type " +
        "UNION ALL SELECT event_type, 2, CAST(COUNT(*) AS BIGINT), " +
        "CAST(SUM(dd * dd) AS BIGINT), CAST(SUM(dd * (k + 1)) AS BIGINT) " +
        "FROM l2 GROUP BY event_type ORDER BY event_type, level"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val dly = T.events(s, d)
          .groupBy(col("event_type"),
            expr("unix_timestamp(ts) div 86400").as("day"))
          .agg(sum(s2(col("value"))).as("x"))
        val p = dly.withColumn("i",
          row_number().over(
            Window.partitionBy("event_type").orderBy("day")).cast("long") - 1)
        def pair(src: org.apache.spark.sql.DataFrame, idx: String, va: String): org.apache.spark.sql.DataFrame =
          src.groupBy(col("event_type"), expr(s"$idx div 2").as("j"))
            .agg(count(lit(1)).as("cnt"),
              (sum(when(col(idx) % 2 === 0, col(va)).otherwise(0L)) +
                sum(when(col(idx) % 2 === 1, col(va)).otherwise(0L))).as("a"),
              (sum(when(col(idx) % 2 === 0, col(va)).otherwise(0L)) -
                sum(when(col(idx) % 2 === 1, col(va)).otherwise(0L))).as("dd"))
            .where(col("cnt") === 2)
        val l1 = pair(p, "i", "x")
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val l2 = pair(l1.select(col("event_type"), col("j").as("i2"), col("a")),
          "i2", "a")
        def roll(lvl: Int, frame: org.apache.spark.sql.DataFrame) = frame
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_coef"), sum(col("dd") * col("dd")).as("energy"),
            sum(col("dd") * (col("j") + 1)).as("checksum"))
          .select(col("event_type"), lit(lvl.toLong).as("level"),
            col("n_coef"), col("energy"), col("checksum"))
        roll(1, l1).unionAll(roll(2, l2)).orderBy("event_type", "level")
      }),

    // Binary segmentation (round 12, third wave) [Scott & Knott 1974;
    // the ruptures/changepoint BinSeg default] — the MULTI-changepoint
    // extension of win_pettitt's single test: two recursion levels over
    // each type's daily cent-sum series give up to three mean-shift
    // split points. The CUSUM objective is kept EXACT-INTEGER by
    // cross-multiplication: at split k of segment (lo, hi],
    // sc = |(hi−lo)·(S_k−S_lo) − (k−lo)·(S_hi−S_lo)| — the |Σleft −
    // (len_left/len)·Σ| deviation scaled by the segment length, so no
    // division enters the argmax and ties break at the smallest k
    // identically on both engines. Level 1 scans all splits; level 2
    // rescans each side with its own (lo, hi); a side too short to
    // split reports NULL. Three window passes + one broadcast join per
    // level — the day series is calendar-bounded, so the whole key is
    // SF-independent after the one daily rollup shuffle.
    Q("win_binseg", Some(
      "WITH dly AS (SELECT event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS day, " +
        "CAST(SUM(" + sqlS2("value") + ") AS BIGINT) AS x FROM events GROUP BY event_type, day), " +
        "p AS (SELECT event_type, day, x, " +
        "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i, " +
        "CAST(SUM(x) OVER (PARTITION BY event_type ORDER BY day " +
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s, " +
        "COUNT(*) OVER (PARTITION BY event_type) AS n, " +
        "CAST(SUM(x) OVER (PARTITION BY event_type) AS BIGINT) AS st FROM dly), " +
        "l1 AS (SELECT event_type, i, s, n, st, ABS(n * s - i * st) AS sc " +
        "FROM p WHERE i < n), " +
        "kk AS (SELECT event_type, i AS k1, s AS sk1, n, st, sc AS sc1 FROM " +
        "(SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY sc DESC, i) AS rn " +
        "FROM l1) WHERE rn = 1), " +
        "l2 AS (SELECT p.event_type, p.i, " +
        "CASE WHEN p.i < kk.k1 THEN 'L' ELSE 'R' END AS side, " +
        "CASE WHEN p.i < kk.k1 THEN ABS(kk.k1 * p.s - p.i * kk.sk1) " +
        "ELSE ABS((kk.n - kk.k1) * (p.s - kk.sk1) - (p.i - kk.k1) * (kk.st - kk.sk1)) END AS sc " +
        "FROM p JOIN kk ON kk.event_type = p.event_type " +
        "WHERE p.i <> kk.k1 AND p.i < p.n), " +
        "pick AS (SELECT event_type, side, i, sc, " +
        "ROW_NUMBER() OVER (PARTITION BY event_type, side ORDER BY sc DESC, i) AS rn FROM l2) " +
        "SELECT kk.event_type, CAST(kk.n AS BIGINT) AS n, CAST(kk.k1 AS BIGINT) AS k1, " +
        "kk.sc1, CAST(l.i AS BIGINT) AS kl, l.sc AS scl, " +
        "CAST(r.i AS BIGINT) AS kr, r.sc AS scr " +
        "FROM kk LEFT JOIN pick l ON l.event_type = kk.event_type AND l.side = 'L' AND l.rn = 1 " +
        "LEFT JOIN pick r ON r.event_type = kk.event_type AND r.side = 'R' AND r.rn = 1 " +
        "ORDER BY kk.event_type"),
      (s, d) => {
        val dly = T.events(s, d)
          .groupBy(col("event_type"),
            expr("unix_timestamp(ts) div 86400").as("day"))
          .agg(sum(s2(col("value"))).as("x"))
        val wOrd = Window.partitionBy("event_type").orderBy("day")
        val wAll = Window.partitionBy("event_type")
        val p = dly
          .withColumn("i", row_number().over(wOrd).cast("long"))
          .withColumn("s", sum(col("x")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("st", sum(col("x")).over(wAll))
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val l1 = p.where(col("i") < col("n"))
          .withColumn("sc", abs(col("n") * col("s") - col("i") * col("st")))
        val kk = l1.withColumn("rn", row_number().over(
            Window.partitionBy("event_type").orderBy(col("sc").desc, col("i"))))
          .where(col("rn") === 1)
          .select(col("event_type"), col("i").as("k1"), col("s").as("sk1"),
            col("n").as("kn"), col("st").as("kst"), col("sc").as("sc1"))
        val l2 = p.join(broadcast(kk), Seq("event_type"))
          .where(col("i") =!= col("k1") && col("i") < col("n"))
          .select(col("event_type"), col("i"),
            when(col("i") < col("k1"), "L").otherwise("R").as("side"),
            when(col("i") < col("k1"),
              abs(col("k1") * col("s") - col("i") * col("sk1")))
              .otherwise(abs((col("kn") - col("k1")) * (col("s") - col("sk1")) -
                (col("i") - col("k1")) * (col("kst") - col("sk1")))).as("sc"))
        val pick = l2.withColumn("rn", row_number().over(
            Window.partitionBy("event_type", "side").orderBy(col("sc").desc, col("i"))))
          .where(col("rn") === 1)
        val pl = pick.where(col("side") === "L")
          .select(col("event_type"), col("i").as("kl"), col("sc").as("scl"))
        val pr = pick.where(col("side") === "R")
          .select(col("event_type"), col("i").as("kr"), col("sc").as("scr"))
        kk.join(pl, Seq("event_type"), "left")
          .join(pr, Seq("event_type"), "left")
          .select(col("event_type"), col("kn").as("n"), col("k1"), col("sc1"),
            col("kl"), col("scl"), col("kr"), col("scr"))
          .orderBy("event_type")
      }))

  /** win_decompose's day/trend/seasonal pipeline up to the residual —
    * shared by win_stl_anomaly (the same CTE chain, one more robust-
    * threshold stage). */
  private def decomposedResid(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    decomposedDetrResid(s, d).select(col("day"), col("resid"))

  /** win_decompose's pipeline up to (detrended, residual) in 7× units —
    * shared by win_stl_anomaly and win_seasonal_strength. */
  private def decomposedDetrResid(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val g = T.orders(s, d)
      .groupBy(expr("unix_timestamp(o_orderdate) div 86400").as("day"))
      .agg(sum(s2(col("o_totalprice"))).as("v"))
    val w = Window.orderBy("day").rowsBetween(-3, 3)
    val dd = g.select(col("day"), col("v"),
      sum("v").over(w).as("t7"), count(lit(1)).over(w).as("n7"))
      .where(col("n7") === 7)
      .select(col("day"), (col("day") % 7).as("wd"),
        (lit(7) * col("v") - col("t7")).as("detr"))
    val sidx = dd.groupBy("wd")
      .agg(halfUpDiv(sum("detr"), count(lit(1))).as("seas"))
    dd.join(broadcast(sidx), "wd")
      .select(col("day"), col("detr").as("ds"),
        (col("detr") - col("seas")).as("resid"))
  }

  /** Exact doubled median of an integer column by nearest-rank order
    * statistics: x(⌊(n+1)/2⌋) + x(⌊n/2⌋+1) over (v, tie)-sorted rows —
    * for odd n the two ranks coincide (2·x_mid), for even n they bracket
    * the middle, so the value equals 2× the interpolated median of
    * integers WITHOUT any engine lerp (win_stl_anomaly's r9 driver-red
    * was QUANTILE_CONT's interpolation differing between builds).
    * Returns a 1-row frame with the single column `out`. The global
    * window is fine: callers pass domain-sized series (calendar days). */
  private def doubledMedian(df: org.apache.spark.sql.DataFrame, v: String,
      tie: String, out: String): org.apache.spark.sql.DataFrame = {
    val wOrd = Window.orderBy(col(v), col(tie))
    df.select(col(v),
        row_number().over(wOrd).as("_rn"),
        count(lit(1)).over(Window.partitionBy(lit(1))).as("_n"))
      .agg((sum(when(col("_rn") === shiftright(col("_n") + 1, 1), col(v))
          .otherwise(0L)) +
        sum(when(col("_rn") === shiftright(col("_n"), 1) + 1, col(v))
          .otherwise(0L))).as(out))
  }

  /** The win_ntile range-partition + broadcast-offset global NTILE(n)
    * without a single-partition window: repartitionByRange on the sort
    * key, per-partition counts (ONE row per partition collected) →
    * cumulative start offsets broadcast back, global rank = offset +
    * in-partition row_number, SQL NTILE tile sizing (first n%k tiles
    * get the extra row). Shared by win_rfm's three scores; win_ntile
    * keeps its original inline form (same construction, graded since
    * round 7). */
  private def globalNtile(df: org.apache.spark.sql.DataFrame,
      sortCols: Seq[org.apache.spark.sql.Column], k: Int,
      outCol: String): org.apache.spark.sql.DataFrame = {
    val s = df.sparkSession
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(parts, sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = ranged.groupBy("_pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = counts.map(_._2).sum
    val offs = counts.map(_._1).zip(counts.scanLeft(0L)(_ + _._2).dropRight(1))
    val offsDf = s.createDataFrame(offs.toSeq).toDF("_pid", "_off")
    val q = n / k
    val r = n % k
    val cut = r * (q + 1)
    ranged.join(broadcast(offsDf), "_pid")
      .withColumn("_rn", col("_off") +
        row_number().over(Window.partitionBy("_pid").orderBy(sortCols: _*)))
      .withColumn(outCol,
        when(col("_rn") <= cut, expr(s"(_rn - 1) div ${q + 1}") + 1)
          .otherwise(lit(r) + expr(s"(_rn - 1 - $cut) div ${math.max(q, 1L)}") + 1)
          .cast("int"))
      .drop("_pid", "_off", "_rn")
  }
}
