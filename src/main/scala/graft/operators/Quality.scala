package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Det, Q, Tables => T}
import Det._

/** Data-quality operators (round 9, second wave) — the profile/constraint
  * surface every ingestion pipeline runs before a corpus is trusted
  * (Deequ-style checks re-expressed as plain declarative aggregates; see
  * SURVEY.md §3.13). Both keys are single-pass shapes: the profile is one
  * hash aggregate over the table (plus Spark's Expand for the exact
  * distinct counts), the constraint sweep is one conditional aggregate
  * plus one broadcast anti-join — at 100 TB each costs one scan.
  *
  * Determinism: every metric is an exact BIGINT (counts, scaled cents,
  * epoch seconds) — no doubles reach the output, so the usual Det
  * ordering arguments are not even needed beyond the final ORDER BY.
  */
object Quality {

  /** Canonical physical-type names shared by the schema-drift key's two
    * readers (Spark StructType vs DuckDB parquet_schema). */
  private def canonicalType(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => "int64"
      case IntegerType => "int32"
      case DoubleType => "double"
      case FloatType => "float"
      case StringType => "string"
      case TimestampType => "timestamp"
      case other => other.simpleString
    }
  }

  private val DriftDir =
    graft.GraftTmp.dir("schema_drift")

  val all: Seq[Q] = Seq(

    // Schema-drift audit between two table vintages (round 11) — the
    // ops check every long-lived lake needs when producers evolve: two
    // parquet vintages are written (v2 DROPS a column, ADDS another and
    // WIDENS int32→int64 on a third), then BOTH engines read the actual
    // parquet FOOTERS — Spark via the reader's StructType, DuckDB via
    // parquet_schema() — normalize physical types to one canonical
    // vocabulary, and emit per-column added/removed/type_changed/
    // unchanged verdicts. Grading footer-derived metadata (not data)
    // pins the end-to-end write→footer→read fidelity of both engines'
    // parquet stacks; the comparison itself is METADATA-sized (a
    // schema's worth of driver rows, documented — never a data path).
    Q("dq_schema_drift", Some {
      def side(n: Int) =
        // explicit converted_type matches with a LOUD else (ADVICE r11):
        // an INT64 with a future DECIMAL/unsigned converted_type must
        // surface as an unmapped marker — which can never equal the
        // Spark-side canonical name, so it grades as a visible
        // type_changed/mismatch instead of silently reading 'timestamp'
        s"s$n AS (SELECT name, CASE " +
          "WHEN type = 'INT64' AND converted_type IS NULL THEN 'int64' " +
          "WHEN type = 'INT64' AND converted_type LIKE 'TIMESTAMP%' THEN 'timestamp' " +
          "WHEN type = 'INT96' THEN 'timestamp' " + // Spark default writer
          "WHEN type = 'INT32' AND converted_type IS NULL THEN 'int32' " +
          "WHEN type = 'DOUBLE' THEN 'double' " +
          "WHEN type = 'FLOAT' THEN 'float' " +
          "WHEN type = 'BYTE_ARRAY' THEN 'string' " +
          "ELSE 'UNMAPPED:' || type || '/' || COALESCE(converted_type, '-') END AS t " +
          s"FROM parquet_schema('$DriftDir/v$n/*.parquet') WHERE type IS NOT NULL)"
      "WITH " + side(1) + ", " + side(2) + " " +
        "SELECT COALESCE(s1.name, s2.name) AS col_name, " +
        "s1.t AS type_v1, s2.t AS type_v2, " +
        "CASE WHEN s1.name IS NULL THEN 'added' " +
        "WHEN s2.name IS NULL THEN 'removed' " +
        "WHEN s1.t <> s2.t THEN 'type_changed' ELSE 'unchanged' END AS verdict " +
        "FROM s1 FULL OUTER JOIN s2 ON s2.name = s1.name ORDER BY col_name"
    },
      (s, d) => {
        import s.implicits._
        // BUILD-TIME SIDE EFFECT: write the two vintages (the
        // scan_merge_schema discipline; one file each, metadata-sized)
        T.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey").cast("int"),
            col("o_totalprice"), col("o_orderdate").as("order_ts"))
          .coalesce(1).write.mode("overwrite").parquet(s"$DriftDir/v1")
        T.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey").cast("long"),
            col("o_orderpriority").as("priority"),
            col("o_orderdate").as("order_ts"))
          .coalesce(1).write.mode("overwrite").parquet(s"$DriftDir/v2")
        // read back the FOOTERS; the drift table is schema-sized
        val v1 = s.read.parquet(s"$DriftDir/v1").schema.fields
          .map(f => f.name -> canonicalType(f.dataType)).toMap
        val v2 = s.read.parquet(s"$DriftDir/v2").schema.fields
          .map(f => f.name -> canonicalType(f.dataType)).toMap
        val rows = (v1.keySet ++ v2.keySet).toSeq.sorted.map { name =>
          val (t1, t2) = (v1.get(name), v2.get(name))
          val verdict =
            if (t1.isEmpty) "added"
            else if (t2.isEmpty) "removed"
            else if (t1 != t2) "type_changed"
            else "unchanged"
          (name, t1.orNull, t2.orNull, verdict)
        }
        rows.toDF("col_name", "type_v1", "type_v2", "verdict")
          .orderBy("col_name")
      }),

    // Sharded table fingerprint (round 10, fifth wave) — the
    // replication/migration audit every cross-system copy runs: an
    // ORDER-FREE content checksum per shard (sum of a portable per-row
    // hash over a canonical column serialization), so two engines — or
    // the same table before and after a rewrite/compaction — can be
    // compared without moving rows. Hash = Det.hash32 (md5-derived,
    // bit-identical to DuckDB's masked md5_number_upper); the canonical
    // string uses only integer/text columns (double→string formatting is
    // engine-dependent — cents-scale any money column before
    // fingerprinting it). ONE scan, one shard-keyed partial agg; the sum
    // is exact int64 (≤ rows·2³²) and merge-order-free, so AQE/skew
    // re-planning can't change it.
    Q("dq_fingerprint", Some(
      "WITH r AS (SELECT o_orderkey AS k, " +
        "CONCAT(CAST(o_orderkey AS VARCHAR), '|', CAST(o_custkey AS VARCHAR), " +
        "'|', o_orderstatus, '|', o_orderpriority) AS row_str FROM orders) " +
        "SELECT k % 8 AS shard, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(" + sqlHash32("row_str") + ") AS BIGINT) AS fingerprint " +
        "FROM r GROUP BY shard ORDER BY shard"),
      (s, d) =>
        T.orders(s, d)
          .select(col("o_orderkey").as("k"),
            concat_ws("|", col("o_orderkey").cast("string"),
              col("o_custkey").cast("string"), col("o_orderstatus"),
              col("o_orderpriority")).as("row_str"))
          .groupBy((col("k") % 8).as("shard"))
          .agg(count(lit(1)).as("n"),
            sum(hash32(col("row_str"))).as("fingerprint"))
          .orderBy("shard")),

    // Functional-dependency audit (round 10, fifth wave) — the
    // Deequ/profiler check that catches silently denormalized or
    // corrupted joins: for each declared FD X → Y, a violating group is
    // an X value observing >1 distinct Y. Three FDs graded: two that
    // HOLD by construction (o_orderkey → o_custkey on the order lines;
    // c_custkey → c_nationkey) and one that genuinely FAILS (events
    // user_id → event_type — users emit many types), so both the zero
    // and nonzero lanes of the verdict are exercised. Each FD is one
    // (X)-keyed partial agg with an exact distinct count — at 100 TB
    // swap COUNT(DISTINCT) for the HLL sketch (agg_hll grades it) when
    // Y cardinality per group explodes; the verdict (violations > 0)
    // only needs "≥ 2", which a 2-element min/max check answers in one
    // pass without Expand.
    Q("dq_fd_violations", Some(
      "WITH fd1 AS (SELECT l_orderkey AS x, o_custkey AS y FROM lineitem " +
        "JOIN orders ON l_orderkey = o_orderkey), " +
        "g1 AS (SELECT x, COUNT(DISTINCT y) AS dy FROM fd1 GROUP BY x), " +
        "fd2 AS (SELECT c_custkey AS x, c_nationkey AS y FROM customer), " +
        "g2 AS (SELECT x, COUNT(DISTINCT y) AS dy FROM fd2 GROUP BY x), " +
        "fd3 AS (SELECT user_id AS x, event_type AS y FROM events), " +
        "g3 AS (SELECT x, COUNT(DISTINCT y) AS dy FROM fd3 GROUP BY x) " +
        "SELECT fd, n_groups, n_violating FROM (" +
        "SELECT 'l_orderkey->o_custkey' AS fd, CAST(COUNT(*) AS BIGINT) AS n_groups, " +
        "CAST(SUM(CASE WHEN dy > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating FROM g1 " +
        "UNION ALL SELECT 'c_custkey->c_nationkey', CAST(COUNT(*) AS BIGINT), " +
        "CAST(SUM(CASE WHEN dy > 1 THEN 1 ELSE 0 END) AS BIGINT) FROM g2 " +
        "UNION ALL SELECT 'user_id->event_type', CAST(COUNT(*) AS BIGINT), " +
        "CAST(SUM(CASE WHEN dy > 1 THEN 1 ELSE 0 END) AS BIGINT) FROM g3) " +
        "ORDER BY fd"),
      (s, d) => {
        def audit(name: String, df: DataFrame, x: Column, y: Column): DataFrame =
          df.groupBy(x.as("x")).agg(countDistinct(y).as("dy"))
            .agg(count(lit(1)).as("n_groups"),
              sum(when(col("dy") > 1, 1L).otherwise(0L)).as("n_violating"))
            .select(lit(name).as("fd"), col("n_groups"), col("n_violating"))
        val fd1 = T.lineitem(s, d).select("l_orderkey")
          .join(T.orders(s, d).select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
        audit("l_orderkey->o_custkey", fd1, col("l_orderkey"), col("o_custkey"))
          .unionAll(audit("c_custkey->c_nationkey", T.customer(s, d),
            col("c_custkey"), col("c_nationkey")))
          .unionAll(audit("user_id->event_type", T.events(s, d),
            col("user_id"), col("event_type")))
          .orderBy("fd")
      }),

    // Per-column profile of `orders` in long format: row/null/distinct
    // counts for every column plus scaled min/max where the type admits
    // an exact integer embedding (keys as-is, money as cents, timestamps
    // as epoch seconds; strings carry NULL bounds — a string min/max
    // would hash-compare fine but collation is engine-config-dependent,
    // so the graded surface stays integer). ONE aggregate produces all
    // 26 metrics; the exact n_distinct columns make Catalyst plan an
    // Expand (one input row per distinct-column) — the documented cost
    // of exactness. At 100 TB the profile swaps COUNT(DISTINCT) for
    // approx_count_distinct per column (single pass, no Expand) — the
    // agg_hll key IS that estimator, graded separately.
    Q("dq_profile", Some(profileOracle),
      (s, d) => {
        val o = T.orders(s, d)
        val m = o.agg(
          count(lit(1)).as("n_rows"),
          count(col("o_orderkey")).as("nn_orderkey"),
          countDistinct(col("o_orderkey")).as("nd_orderkey"),
          min(col("o_orderkey")).as("mn_orderkey"),
          max(col("o_orderkey")).as("mx_orderkey"),
          count(col("o_custkey")).as("nn_custkey"),
          countDistinct(col("o_custkey")).as("nd_custkey"),
          min(col("o_custkey")).as("mn_custkey"),
          max(col("o_custkey")).as("mx_custkey"),
          count(col("o_orderstatus")).as("nn_status"),
          countDistinct(col("o_orderstatus")).as("nd_status"),
          count(col("o_totalprice")).as("nn_price"),
          countDistinct(col("o_totalprice")).as("nd_price"),
          min(s2(col("o_totalprice"))).as("mn_price"),
          max(s2(col("o_totalprice"))).as("mx_price"),
          count(col("o_orderdate")).as("nn_date"),
          countDistinct(col("o_orderdate")).as("nd_date"),
          min(epochS(col("o_orderdate"))).as("mn_date"),
          max(epochS(col("o_orderdate"))).as("mx_date"),
          count(col("o_orderpriority")).as("nn_prio"),
          countDistinct(col("o_orderpriority")).as("nd_prio"))
        m.select(expr(
            "stack(6, " +
              "'o_orderkey',      nn_orderkey, nd_orderkey, mn_orderkey, mx_orderkey, " +
              "'o_custkey',       nn_custkey,  nd_custkey,  mn_custkey,  mx_custkey, " +
              "'o_orderstatus',   nn_status,   nd_status,   CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), " +
              "'o_totalprice',    nn_price,    nd_price,    mn_price,    mx_price, " +
              "'o_orderdate',     nn_date,     nd_date,     mn_date,     mx_date, " +
              "'o_orderpriority', nn_prio,     nd_prio,     CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)) " +
              "AS (col_name, n_notnull, n_distinct, min_l, max_l)"),
            col("n_rows"))
          .select(col("col_name"), col("n_rows"),
            (col("n_rows") - col("n_notnull")).as("n_null"),
            col("n_distinct"), col("min_l"), col("max_l"))
          .orderBy("col_name")
      }),

    // Constraint sweep over `orders`: named rules → violation counts.
    // Domain/null/range/duplicate rules fold into ONE conditional
    // aggregate (map-side partials, order-free longs); the referential
    // rule is a broadcast LEFT ANTI against the customer key set — the
    // orphan count a real FK check needs, linear in the fact side. The
    // result unions six one-row subplans of constants — negligible at
    // any scale next to the two scans.
    Q("dq_constraints", Some(constraintsOracle),
      (s, d) => {
        val o = T.orders(s, d)
        val base = o.agg(
          sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("pk_null"),
          (count(lit(1)) - countDistinct(col("o_orderkey"))).as("pk_dup"),
          sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("price_nonpos"),
          sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1L).otherwise(0L))
            .as("status_domain"),
          sum(when(col("o_orderdate") < to_timestamp(lit("1990-01-01")) ||
              col("o_orderdate") >= to_timestamp(lit("2030-01-01")), 1L)
            .otherwise(0L)).as("date_range"))
        val rules = base.select(expr(
          "stack(5, " +
            "'date_range', date_range, " +
            "'pk_dup', pk_dup, " +
            "'pk_null', pk_null, " +
            "'price_nonpos', price_nonpos, " +
            "'status_domain', status_domain) AS (rule, violations)"))
        val orphan = o.select("o_custkey")
          .join(broadcast(T.customer(s, d).select("c_custkey")),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit("fk_orphan").as("rule"), col("violations"))
        rules.unionByName(orphan).orderBy("rule")
      }),

    // Tukey-fence outlier screen (round 9, second wave) — the IQR rule
    // every numeric-column profiler ships: values outside
    // [q1 − 1.5·IQR, q3 + 1.5·IQR] per segment. Quantiles run over
    // exact integer cents at p ∈ {.25,.75} (Det rule 4 — the lerp is
    // exact in double space on both engines), the fences are one shared
    // IEEE sequence, and the flag count is an order-free long. Pass 1
    // is a per-group quantile agg; pass 2 re-scans with the fences
    // broadcast — two scans, no window, no skew sensitivity.
    Q("dq_anomaly_iqr", Some {
      val lo = "(q1 - 1.5 * (q3 - q1))"
      val hi = "(q3 + 1.5 * (q3 - q1))"
      "WITH b AS (SELECT l_returnflag, " + sqlS2("l_extendedprice") + " AS x FROM lineitem), " +
        "q AS (SELECT l_returnflag, QUANTILE_CONT(x, 0.25) AS q1, " +
        "QUANTILE_CONT(x, 0.75) AS q3 FROM b GROUP BY l_returnflag) " +
        "SELECT b.l_returnflag, " +
        sqlS2("q.q1") + " AS q1_cc, " + sqlS2("q.q3") + " AS q3_cc, " +
        "CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        s"CAST(SUM(CASE WHEN CAST(b.x AS DOUBLE) < $lo OR CAST(b.x AS DOUBLE) > $hi " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_out " +
        "FROM b JOIN q ON b.l_returnflag = q.l_returnflag " +
        "GROUP BY b.l_returnflag, q.q1, q.q3 ORDER BY b.l_returnflag"
    },
      (s, d) => {
        val b = T.lineitem(s, d)
          .select(col("l_returnflag"), s2(col("l_extendedprice")).as("x"))
        val q = b.groupBy("l_returnflag")
          .agg(percentile(col("x"), lit(0.25)).as("q1"),
            percentile(col("x"), lit(0.75)).as("q3"))
        val lo = col("q1") - lit(1.5) * (col("q3") - col("q1"))
        val hi = col("q3") + lit(1.5) * (col("q3") - col("q1"))
        b.join(broadcast(q), "l_returnflag")
          .groupBy(col("l_returnflag"), col("q1"), col("q3"))
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("x").cast("double") < lo || col("x").cast("double") > hi, 1L)
              .otherwise(0L)).as("n_out"))
          .select(col("l_returnflag"), s2(col("q1")).as("q1_cc"),
            s2(col("q3")).as("q3_cc"), col("n_rows"), col("n_out"))
          .orderBy("l_returnflag")
      }),

    // Partition-volume anomaly monitor (round 9, third wave) — the
    // freshness/volume check every ingestion DQ suite runs per arriving
    // partition: daily row volume against its own trailing-week
    // baseline, flagging silent drops (>50% below) and floods (>2x
    // above). Entirely integer: epoch-day buckets, exact counts, and
    // the thresholds cross-multiplied (14·n < s7, 7·n > 2·s7) so no
    // ratio ever materializes. The ordered window runs over PER-DAY
    // aggregate rows — calendar-bounded, thousands of rows at any
    // corpus scale — after the one data-sized shuffle (the daily
    // partial agg). Days without a full 7-day history flag NULL, both
    // engines by the same frame-count test.
    Q("dq_volume_anomaly", Some(
      "WITH g AS (SELECT CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS day, " +
        "CAST(COUNT(*) AS BIGINT) AS n, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users " +
        "FROM events GROUP BY day), " +
        "w AS (SELECT day, n, n_users, " +
        "CAST(SUM(n) OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS s7, " +
        "CAST(COUNT(*) OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS d7 " +
        "FROM g) " +
        "SELECT day, n, n_users, " +
        "CASE WHEN d7 = 7 THEN s7 END AS s7, " +
        "CASE WHEN d7 < 7 THEN NULL WHEN 14 * n < s7 THEN 'LOW' " +
        "WHEN 7 * n > 2 * s7 THEN 'HIGH' ELSE 'OK' END AS flag " +
        "FROM w ORDER BY day"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val g = T.events(s, d)
          .groupBy(expr("unix_timestamp(ts) div 86400").as("day"))
          .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        val trail = Window.orderBy("day").rowsBetween(-7, -1)
        g.withColumn("s7r", sum(col("n")).over(trail))
          .withColumn("d7", count(lit(1)).over(trail))
          .select(col("day"), col("n"), col("n_users"),
            when(col("d7") === 7, col("s7r")).as("s7"),
            when(col("d7") < 7, lit(null))
              .when(lit(14) * col("n") < col("s7r"), "LOW")
              .when(lit(7) * col("n") > lit(2) * col("s7r"), "HIGH")
              .otherwise("OK").as("flag"))
          .orderBy("day")
      }),

    // Distribution-drift monitor (round 9, third wave) — the Population
    // Stability Index every ML-monitoring suite computes between a
    // reference and a current window: PSI = Σ(pᵢ−qᵢ)·ln(pᵢ/qᵢ) over
    // fixed value bins, here first-half vs second-half of the corpus
    // time span per event type. Determinism: the split point is the
    // integer midpoint (es·2 < min+max — no division), bins are
    // FLOOR(value/50) clamped to 10, Laplace +1 smoothing makes every
    // bin's ratio finite without an epsilon, and each bin's term is
    // s6-floored BEFORE the sum (the agg_entropy LN discipline — a raw
    // double sum over partials would be merge-order-dependent). The
    // full type×bin grid is generated so zero-count bins still
    // contribute; all data-sized work is one conditional partial agg.
    Q("dq_drift_psi", Some(
      "WITH b AS (SELECT event_type, " +
        "CASE WHEN CAST(FLOOR(EPOCH(ts)) AS BIGINT) * 2 < " +
        "(SELECT CAST(MIN(FLOOR(EPOCH(ts))) AS BIGINT) + CAST(MAX(FLOOR(EPOCH(ts))) AS BIGINT) FROM events) " +
        "THEN 0 ELSE 1 END AS half, " +
        "LEAST(CAST(FLOOR(value / 50.0) AS BIGINT), 9) AS bin FROM events), " +
        "c AS (SELECT event_type, bin, " +
        "CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca, " +
        "CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb " +
        "FROM b GROUP BY event_type, bin), " +
        "grid AS (SELECT t.event_type, g.bin FROM (SELECT DISTINCT event_type FROM events) t " +
        "CROSS JOIN (SELECT UNNEST(RANGE(0, 10)) AS bin) g), " +
        "full_c AS (SELECT grid.event_type, grid.bin, COALESCE(c.ca, 0) AS ca, COALESCE(c.cb, 0) AS cb " +
        "FROM grid LEFT JOIN c ON c.event_type = grid.event_type AND c.bin = grid.bin), " +
        "tot AS (SELECT event_type, CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb " +
        "FROM full_c GROUP BY event_type), " +
        "terms AS (SELECT f.event_type, t.na, t.nb, " +
        sqlS6("(CAST(f.ca + 1 AS DOUBLE) / CAST(t.na + 10 AS DOUBLE) - " +
          "CAST(f.cb + 1 AS DOUBLE) / CAST(t.nb + 10 AS DOUBLE)) * " +
          s"(((${sqlLnInt("(f.ca + 1)")} - ${sqlLnInt("(t.na + 10)")}) - " +
          s"${sqlLnInt("(f.cb + 1)")}) + ${sqlLnInt("(t.nb + 10)")})") + " AS t6 " +
        "FROM full_c f JOIN tot t ON t.event_type = f.event_type) " +
        "SELECT event_type, CAST(MAX(na) AS BIGINT) AS n_ref, CAST(MAX(nb) AS BIGINT) AS n_cur, " +
        "CAST(SUM(t6) AS BIGINT) AS psi6 " +
        "FROM terms GROUP BY event_type ORDER BY event_type"),
      (s, d) => {
        val es = expr("unix_timestamp(ts)")
        val ev = T.events(s, d)
        // midpoint rides the plan as a broadcast scalar (no driver round
        // trip): es·2 < min+max avoids any division
        val mm = ev.agg((min(es) + max(es)).as("m"))
        val c = ev.crossJoin(broadcast(mm))
          .select(col("event_type"),
            when(es * 2 < col("m"), 0).otherwise(1).as("half"),
            least(floor(col("value") / lit(50.0)).cast("long"), lit(9L)).as("bin"))
          .groupBy("event_type", "bin")
          .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("ca"),
            sum(when(col("half") === 1, 1L).otherwise(0L)).as("cb"))
        val grid = ev.select("event_type").distinct()
          .crossJoin(spark_range10(s))
        val fullC = grid.join(c, Seq("event_type", "bin"), "left")
          .select(col("event_type"), col("bin"),
            coalesce(col("ca"), lit(0L)).as("ca"), coalesce(col("cb"), lit(0L)).as("cb"))
        val tot = fullC.groupBy("event_type")
          .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
        val p = (col("ca") + 1).cast("double") / (col("na") + 10).cast("double")
        val q = (col("cb") + 1).cast("double") / (col("nb") + 10).cast("double")
        // ln(p/q) as four portable lnInt terms in a pinned order
        val lnpq = lnInt(col("ca") + 1) - lnInt(col("na") + 10) -
          lnInt(col("cb") + 1) + lnInt(col("nb") + 10)
        fullC.join(broadcast(tot), "event_type")
          .select(col("event_type"), col("na"), col("nb"),
            s6((p - q) * lnpq).as("t6"))
          .groupBy("event_type")
          .agg(max(col("na")).as("n_ref"), max(col("nb")).as("n_cur"),
            sum(col("t6")).as("psi6"))
          .orderBy("event_type")
      }),

    // Benford first-digit audit (round 9, fifth wave) — the classic
    // forensic-accounting screen (Benford 1938; Nigrini's audit
    // practice): naturally-occurring monetary amounts put digit d first
    // with probability log10(1 + 1/d); fabricated data rarely does. The
    // leading digit comes from the STRING form of the exact cent
    // integer (identical on both engines — no log10/power decade
    // arithmetic, whose 1-ulp drift at exact decade boundaries could
    // flip a digit), shares land on the s6 grid from exact longs, and
    // the reference distribution is the portable lnRatio over (d+1, d)
    // — no libm (round 10). One aggregate pass; output is 9 rows.
    Q("dq_benford", Some(
      "WITH d AS (SELECT SUBSTRING(CAST(" + sqlS2("o_totalprice") + " AS VARCHAR), 1, 1) AS digit " +
        "FROM orders WHERE o_totalprice > 0), " +
        "c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit), " +
        "t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM c) " +
        "SELECT digit, n, " +
        sqlS6("CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)") + " AS share6, " +
        sqlS6(sqlLnRatio("(CAST(digit AS BIGINT) + 1)", "digit") +
          " / 2.302585092994046") + " AS benford6 " +
        "FROM c, t ORDER BY digit"),
      (s, d) => {
        val c = T.orders(s, d)
          .where(col("o_totalprice") > 0)
          .select(substring(s2(col("o_totalprice")).cast("string"), 1, 1).as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n"))
        val t = c.agg(sum(col("n")).as("tot"))
        c.crossJoin(broadcast(t))
          .select(col("digit"), col("n"),
            s6(col("n").cast("double") / col("tot").cast("double")).as("share6"),
            s6(lnRatio(col("digit").cast("long") + 1, col("digit")) /
              lit(2.302585092994046)).as("benford6"))
          .orderBy("digit")
      }),

    // Freshness / SLA lag monitor (round 9, sixth wave) — the "is this
    // feed still flowing" check every ingestion pipeline alarms on: per
    // event type, the lag between its newest record and the newest
    // record ANYWHERE in the table, in whole seconds (exact integer
    // subtraction — no float time math), flagged stale beyond a 24 h
    // SLA. One partial-agg shuffle to the per-type maxima; the global
    // maximum is the 1-row rollup of THOSE (never a second scan),
    // broadcast back over the type-count-sized result.
    // XmR individuals control chart (round 12, third wave) [Shewhart
    // 1931; Wheeler's XmR form — the SPC chart ops teams run on daily
    // volumes]: per type's daily cent-sum series, moving ranges
    // mR_i = |x_i − x_{i−1}|, natural process limits x̄ ± 2.66·mR̄, and
    // three Western-Electric-style rules graded per day — rule 1
    // (outside the 3σ natural limits) kept EXACT-INTEGER by
    // cross-multiplication |x_i·n − Σx|·m·100 > 266·ΣmR·n (never a
    // divided limit), the 2σ WARNING line (same cross-mult, ·300 vs
    // ·532 — measured to fire 5-7 times per corpus while the iid
    // daily sums stay inside 3σ, correctly: an in-control process
    // SHOULD flag ~0 on rule 1, and the spec pins warn2 as the live
    // lane), and the run-of-8 same-side drift rule via an 8-row
    // window sum of the integer above-mean flag. One daily rollup
    // shuffle, then calendar-bounded window work.
    Q("dq_xmr_control", Some(
      "WITH dly AS (SELECT event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS day, " +
        "CAST(SUM(" + sqlS2("value") + ") AS BIGINT) AS x FROM events GROUP BY event_type, day), " +
        "p AS (SELECT event_type, day, x, " +
        "LAG(x) OVER (PARTITION BY event_type ORDER BY day) AS xp, " +
        "CAST(SUM(x) OVER (PARTITION BY event_type) AS BIGINT) AS sx, " +
        "COUNT(*) OVER (PARTITION BY event_type) AS n FROM dly), " +
        "r AS (SELECT *, CASE WHEN xp IS NULL THEN NULL ELSE ABS(x - xp) END AS mr FROM p), " +
        "m AS (SELECT event_type, CAST(SUM(mr) AS BIGINT) AS sr, " +
        "CAST(COUNT(mr) AS BIGINT) AS mm FROM r GROUP BY event_type), " +
        "f AS (SELECT r.event_type, r.day, r.x, r.mr, " +
        "CASE WHEN ABS(r.x * r.n - r.sx) * m.mm * 100 > 266 * m.sr * r.n THEN 1 ELSE 0 END AS oob, " +
        "CASE WHEN ABS(r.x * r.n - r.sx) * m.mm * 300 > 532 * m.sr * r.n THEN 1 ELSE 0 END AS warn2, " +
        "CASE WHEN r.x * r.n > r.sx THEN 1 ELSE 0 END AS above " +
        "FROM r JOIN m ON m.event_type = r.event_type), " +
        "g AS (SELECT *, SUM(above) OVER (PARTITION BY event_type ORDER BY day " +
        "ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS a8, " +
        "COUNT(*) OVER (PARTITION BY event_type ORDER BY day " +
        "ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS c8 FROM f) " +
        "SELECT event_type, day, x, mr, CAST(oob AS INT) AS oob, " +
        "CAST(warn2 AS INT) AS warn2, " +
        "CAST(CASE WHEN c8 = 8 AND (a8 = 8 OR a8 = 0) THEN 1 ELSE 0 END AS INT) AS run8 " +
        "FROM g ORDER BY event_type, day"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wOrd = Window.partitionBy("event_type").orderBy("day")
        val wAll = Window.partitionBy("event_type")
        val w8 = wOrd.rowsBetween(-7, Window.currentRow)
        val dly = T.events(s, d)
          .groupBy(col("event_type"),
            expr("unix_timestamp(ts) div 86400").as("day"))
          .agg(sum(s2(col("value"))).as("x"))
        val r = dly
          .withColumn("xp", lag(col("x"), 1).over(wOrd))
          .withColumn("sx", sum(col("x")).over(wAll))
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("mr", when(col("xp").isNull, lit(null))
            .otherwise(abs(col("x") - col("xp"))))
        val m = r.groupBy("event_type")
          .agg(sum(col("mr")).as("sr"), count(col("mr")).as("mm"))
        val f = r.join(broadcast(m), Seq("event_type"))
          .withColumn("oob",
            when(abs(col("x") * col("n") - col("sx")) * col("mm") * 100 >
              lit(266L) * col("sr") * col("n"), 1).otherwise(0))
          .withColumn("warn2",
            when(abs(col("x") * col("n") - col("sx")) * col("mm") * 300 >
              lit(532L) * col("sr") * col("n"), 1).otherwise(0))
          .withColumn("above",
            when(col("x") * col("n") > col("sx"), 1L).otherwise(0L))
        f.withColumn("a8", sum(col("above")).over(w8))
          .withColumn("c8", count(lit(1)).over(w8))
          .select(col("event_type"), col("day"), col("x"), col("mr"),
            col("oob").cast("int").as("oob"),
            col("warn2").cast("int").as("warn2"),
            when(col("c8") === 8 && (col("a8") === 8 || col("a8") === 0), 1)
              .otherwise(0).cast("int").as("run8"))
          .orderBy("event_type", "day")
      }),

    Q("dq_freshness", Some(
      "WITH m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, " +
        "MAX(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) AS max_t FROM events GROUP BY event_type), " +
        "g AS (SELECT MAX(max_t) AS gmax FROM m) " +
        "SELECT event_type, n, max_t, gmax - max_t AS lag_s, " +
        "CASE WHEN gmax - max_t > 86400 THEN 1 ELSE 0 END AS stale " +
        "FROM m, g ORDER BY event_type"),
      (s, d) => {
        val m = T.events(s, d)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), max(epochS(col("ts"))).as("max_t"))
        val g = m.agg(max(col("max_t")).as("gmax"))
        m.crossJoin(broadcast(g))
          .select(col("event_type"), col("n"), col("max_t"),
            (col("gmax") - col("max_t")).as("lag_s"),
            when(col("gmax") - col("max_t") > 86400, 1).otherwise(0).as("stale"))
          .orderBy("event_type")
      }),

    // Referential-integrity sweep (round 9, seventh wave) — the
    // whole-schema audit dq_constraints' single fk rule scales up to:
    // every foreign-key edge of the TPC-H-ish schema checked for
    // orphaned children (anti-join count), plus the reverse childless-
    // parent counts a warehouse migration always wants next to them.
    // Each row is one anti-join + count, all unioned into ONE plan; the
    // dimension sides broadcast, the two fact-sized checks (lineitem →
    // orders/part) shuffle on their join key exactly once. All outputs
    // are exact counts.
    Q("dq_referential", Some(Seq(
      ("customer->nation", "customer", "nation",
        "NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)", "c"),
      ("childless_customer", "customer", "orders",
        "NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)", "c"),
      ("childless_part", "part", "lineitem",
        "NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)", "p"),
      ("lineitem->orders", "lineitem", "orders",
        "NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)", "l"),
      ("lineitem->part", "lineitem", "part",
        "NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)", "l"),
      ("lineitem->supplier", "lineitem", "supplier",
        "NOT EXISTS (SELECT 1 FROM supplier su WHERE su.s_suppkey = l.l_suppkey)", "l"),
      ("orders->customer", "orders", "customer",
        "NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)", "o"),
      ("supplier->nation", "supplier", "nation",
        "NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = su.s_nationkey)", "su"))
      .map { case (name, child, _, pred, alias) =>
        s"SELECT '$name' AS relation, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
          s"CAST(SUM(CASE WHEN $pred THEN 1 ELSE 0 END) AS BIGINT) AS n_bad " +
          s"FROM $child $alias"
      }.mkString("", " UNION ALL ", " ORDER BY relation")),
      (s, d) => {
        def audit(name: String, child: DataFrame, childKey: String,
            parent: DataFrame, parentKey: String): DataFrame = {
          val orphans = child
            .join(parent.select(col(parentKey).as(childKey)).distinct(),
              Seq(childKey), "left_anti")
          child.agg(count(lit(1)).as("n_rows"))
            .crossJoin(orphans.agg(count(lit(1)).as("n_bad")))
            .select(lit(name).as("relation"), col("n_rows"), col("n_bad"))
        }
        val li = T.lineitem(s, d); val or = T.orders(s, d)
        val cu = T.customer(s, d); val pa = T.part(s, d)
        val su = T.supplier(s, d); val na = T.nation(s, d)
        audit("customer->nation", cu.select(col("c_nationkey")), "c_nationkey",
          na, "n_nationkey")
          .unionAll(audit("childless_customer", cu.select(col("c_custkey")),
            "c_custkey", or, "o_custkey"))
          .unionAll(audit("childless_part", pa.select(col("p_partkey")),
            "p_partkey", li, "l_partkey"))
          .unionAll(audit("lineitem->orders", li.select(col("l_orderkey")),
            "l_orderkey", or, "o_orderkey"))
          .unionAll(audit("lineitem->part", li.select(col("l_partkey")),
            "l_partkey", pa, "p_partkey"))
          .unionAll(audit("lineitem->supplier", li.select(col("l_suppkey")),
            "l_suppkey", su, "s_suppkey"))
          .unionAll(audit("orders->customer", or.select(col("o_custkey")),
            "o_custkey", cu, "c_custkey"))
          .unionAll(audit("supplier->nation", su.select(col("s_nationkey")),
            "s_nationkey", na, "n_nationkey"))
          .orderBy("relation")
      }),

    // k-anonymity audit (round 9, seventh wave) — the release-readiness
    // check privacy reviews run before sharing a derived table: every
    // quasi-identifier combination (here lang × source) must describe at
    // least k=5 records, else those rows need suppression or
    // generalization. One hash aggregate gives the equivalence classes;
    // the output is the per-class size with its violation flag plus the
    // suppression cost (rows inside sub-k classes). Exact counts only;
    // at 100 TB this is one partial-agg shuffle over the QI key.
    Q("dq_k_anonymity", Some(
      "WITH g AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS k FROM documents " +
        "GROUP BY lang, source) " +
        "SELECT lang, source, k, " +
        "CAST(CASE WHEN k < 5 THEN 1 ELSE 0 END AS BIGINT) AS violates, " +
        "CAST(CASE WHEN k < 5 THEN k ELSE 0 END AS BIGINT) AS rows_to_suppress " +
        "FROM g ORDER BY lang, source"),
      (s, d) =>
        T.documents(s, d)
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("k"))
          .select(col("lang"), col("source"), col("k"),
            when(col("k") < 5, 1L).otherwise(0L).as("violates"),
            when(col("k") < 5, col("k")).otherwise(0L).as("rows_to_suppress"))
          .orderBy("lang", "source")),

    // Surrogate-key gap audit (round 9, seventh wave) — the completeness
    // check CDC and batch-ingest reconciliation runs on a PARTIAL feed
    // (here the urgent-priority export; a filtered slice of a dense key
    // space is naturally gappy, exactly the shape a dropped-batch
    // investigation starts from): total missing ids from span arithmetic
    // alone (no sort), and the number of gap RUNS via an equi ANTI
    // self-join on key+1 — a present key starts a gap iff its successor
    // id is absent and it is not the maximum. No global-sort window
    // anywhere, so the audit stays two hash joins/aggregates at any
    // key-space size.
    Q("dq_id_gaps", Some(
      "WITH k AS (SELECT o_orderkey AS id FROM orders WHERE o_orderpriority = '1-URGENT'), " +
        "b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(MIN(id) AS BIGINT) AS lo, " +
        "CAST(MAX(id) AS BIGINT) AS hi FROM k), " +
        "gs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_gap_runs FROM k a " +
        "WHERE NOT EXISTS (SELECT 1 FROM k b2 WHERE b2.id = a.id + 1) " +
        "AND a.id < (SELECT hi FROM b)) " +
        "SELECT n, lo, hi, CAST(hi - lo + 1 - n AS BIGINT) AS n_missing, " +
        "(SELECT n_gap_runs FROM gs) AS n_gap_runs FROM b"),
      (s, d) => {
        val k = T.orders(s, d).where(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey").as("id"))
        val b = k.agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
        val succ = k.select((col("id") - 1).as("id"))
        val gapStarts = k.join(succ, Seq("id"), "left_anti")
          .crossJoin(broadcast(b.select(col("hi").as("hi2"))))
          .where(col("id") < col("hi2"))
          .agg(count(lit(1)).as("n_gap_runs"))
        b.crossJoin(broadcast(gapStarts))
          .select(col("n"), col("lo"), col("hi"),
            (col("hi") - col("lo") + 1 - col("n")).as("n_missing"),
            col("n_gap_runs"))
      }),

    // String-column profile (round 9, closing wave) — the character-class
    // statistics a Deequ-style profiler reports for free-text columns
    // (the screen that catches encoding regressions and schema drift in
    // string feeds): per language, exact length extrema/sums plus the
    // whitespace and vowel character shares — every character count is
    // an exact integer (length of the class-stripped string subtracted
    // from the total), shares one IEEE divide on the s6 grid. One scan,
    // one partial agg; the regex classes are shared POSIX sets.
    Q("dq_string_profile", Some(
      "WITH b AS (SELECT lang, CAST(LENGTH(text) AS BIGINT) AS len, " +
        "CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS BIGINT) AS n_space, " +
        "CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[aeiou]', '', 'g')) AS BIGINT) AS n_vowel " +
        "FROM documents) " +
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(MIN(len) AS BIGINT) AS len_min, CAST(MAX(len) AS BIGINT) AS len_max, " +
        "CAST(SUM(len) AS BIGINT) AS len_sum, " +
        sqlS6("CAST(SUM(n_space) AS DOUBLE) / CAST(SUM(len) AS DOUBLE)") + " AS space_share6, " +
        sqlS6("CAST(SUM(n_vowel) AS DOUBLE) / CAST(SUM(len) AS DOUBLE)") + " AS vowel_share6 " +
        "FROM b GROUP BY lang ORDER BY lang"),
      (s, d) =>
        T.documents(s, d)
          .select(col("lang"), length(col("text")).cast("long").as("len"),
            (length(col("text")) -
              length(regexp_replace(col("text"), " ", ""))).cast("long").as("n_space"),
            (length(col("text")) -
              length(regexp_replace(col("text"), "[aeiou]", ""))).cast("long").as("n_vowel"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), min("len").as("len_min"),
            max("len").as("len_max"), sum("len").as("len_sum"),
            s6(sum("n_space").cast("double") / sum("len").cast("double")).as("space_share6"),
            s6(sum("n_vowel").cast("double") / sum("len").cast("double")).as("vowel_share6"))
          .orderBy("lang")),

    // Bivariate Mahalanobis outlier screen (round 10, fourth wave) —
    // the multivariate upgrade of dq_anomaly_iqr: a (quantity, price)
    // pair can be individually unremarkable yet jointly anomalous, and
    // D² = (v−μ)ᵀ Σ⁻¹ (v−μ) is the standard detector. Made EXACT
    // integer end-to-end: with integer observations (x, y), scaled
    // deviations dx = n·x − Σx, dy = n·y − Σy and scatter entries
    // A = n·Σxx − (Σx)², B = n·Σxy − ΣxΣy, C = n·Σyy − (Σy)², the n²
    // factors cancel so D² > 5 is the pure integer
    // comparison C·dx² − 2B·dx·dy + A·dy² > 5·(AC − B²) (uniform bivariate
    // data has compact D² support ≈ 6, so 5 flags the ~1.5% joint tail;
    // heavy-tailed segments would use the χ²₂ 95% cut ≈ 6) — no division,
    // no sqrt, no engine-specific covariance kernel. Intermediates
    // exceed int64 (C ≈ 4e20 at sf0.1), so the quadratic form runs in
    // DECIMAL(38,0) Spark-side and HUGEINT oracle-side — both exact;
    // headroom to ~1e38 bounds per-group n·y² ≲ 1e24, far beyond any
    // per-segment group this pipeline sees (rescale y first if not).
    // Two scans (moments, then flags with the 3-row stats broadcast) —
    // the dq_anomaly_iqr cost shape.
    Q("dq_mahalanobis", Some(
      "WITH b AS (SELECT l_returnflag AS rf, " +
        "CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS x, " +
        "CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT) AS y FROM lineitem), " +
        "m AS (SELECT rf, CAST(COUNT(*) AS HUGEINT) AS n, " +
        "CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy, " +
        "CAST(SUM(x*x) AS HUGEINT) AS sxx, CAST(SUM(y*y) AS HUGEINT) AS syy, " +
        "CAST(SUM(x*y) AS HUGEINT) AS sxy FROM b GROUP BY rf), " +
        "st AS (SELECT rf, n, sx, sy, n*sxx - sx*sx AS a, " +
        "n*sxy - sx*sy AS bxy, n*syy - sy*sy AS c FROM m) " +
        "SELECT b.rf AS l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(SUM(CASE WHEN " +
        "st.c*(st.n*b.x - st.sx)*(st.n*b.x - st.sx) " +
        "- 2*st.bxy*(st.n*b.x - st.sx)*(st.n*b.y - st.sy) " +
        "+ st.a*(st.n*b.y - st.sy)*(st.n*b.y - st.sy) " +
        "> 5*(st.a*st.c - st.bxy*st.bxy) THEN 1 ELSE 0 END) AS BIGINT) AS n_out " +
        "FROM b JOIN st ON b.rf = st.rf GROUP BY b.rf ORDER BY l_returnflag"),
      (s, d) => {
        val dec = "decimal(38,0)"
        val b = T.lineitem(s, d).select(col("l_returnflag").as("rf"),
          s0(col("l_quantity")).as("x"), s0(col("l_extendedprice")).as("y"))
        val m = b.groupBy("rf").agg(
          count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        def D(c: org.apache.spark.sql.Column) = c.cast(dec)
        val st = m.select(col("rf"), col("n"), col("sx"), col("sy"),
          (D(col("n")) * D(col("sxx")) - D(col("sx")) * D(col("sx"))).as("a"),
          (D(col("n")) * D(col("sxy")) - D(col("sx")) * D(col("sy"))).as("bxy"),
          (D(col("n")) * D(col("syy")) - D(col("sy")) * D(col("sy"))).as("c"))
        // dx/dy fit int64 (n·x ≲ 1e7, n·y ≲ 2.2e10); square in decimal
        val dx = D(col("n") * col("x") - col("sx"))
        val dy = D(col("n") * col("y") - col("sy"))
        val num = col("c") * dx * dx - lit(2).cast(dec) * col("bxy") * dx * dy +
          col("a") * dy * dy
        val det9 = lit(5).cast(dec) * (col("a") * col("c") - col("bxy") * col("bxy"))
        b.join(broadcast(st), "rf")
          .groupBy(col("rf").as("l_returnflag"))
          .agg(count(lit(1)).as("n_rows"),
            sum(when(num > det9, 1L).otherwise(0L)).as("n_out"))
          .orderBy("l_returnflag")
      }),

    // Local Outlier Factor (round 12) — the density-based outlier score
    // [Breunig et al. 2000, SIGMOD] the distance-free screens
    // (dq_anomaly_iqr's univariate fences, dq_mahalanobis's global
    // ellipse) cannot express: a point is anomalous relative to its
    // NEIGHBORHOOD's density, so clusters of different densities each
    // keep their own baseline. k=5 over the label-blocked embedding
    // table: pairwise distances stay inside a label (the
    // llm_embed_neardup blocking), distances are the geomad-discipline
    // integer quantization (exact long d², one IEEE sqrt, s6), k-dist
    // is the 5th neighbor by (d6, vec_id), N_k is the CORRECT ≥k tie
    // set (all o with d ≤ k-dist), and both density ratios are
    // all-integer halfUpDiv forms — no bare double sum anywhere, so
    // the classic ratio-of-ratios grades exactly. The flag threshold is
    // 1.01 (s6): this corpus is uniform-ish noise whose LOF tops out
    // near 1.03, so the canonical 1.5 would leave the flagged lane
    // dead — 1.01 fires ~11% at sf0.01 and both lanes grade (the
    // eo_unmix3 both-lanes discipline). At corpus scale the
    // pair stage swaps to the ANN-kNN funnel (llm_ann_* rungs) feeding
    // the SAME reach-dist/lrd/LOF tail — the tail's cost is k·n. That
    // funnel IS GRADED since round 13: dq_outlier_lof_ann below runs
    // Lloyd-cell IVF candidates through this exact tail (r12 verdict
    // item 1), so this all-pairs form is the semantics anchor, not the
    // scale path.
    Q("dq_outlier_lof", Some {
      val lrdCap = "1000000000" // degenerate-duplicate sentinel; see key comment
      "WITH ux AS MATERIALIZED (SELECT vec_id, label, CAST(UNNEST(embedding) AS DOUBLE) AS x, " +
        "UNNEST(RANGE(0, LEN(embedding))) AS pos FROM embeddings), " +
        "pd AS MATERIALIZED (SELECT a.label, a.vec_id AS p, b.vec_id AS o, " +
        sqlS6("SQRT(CAST(SUM(CAST(FLOOR((a.x - b.x) * (a.x - b.x) * 1e10 + 0.5) AS BIGINT)) AS DOUBLE) / 1e10)") +
        " AS d6 FROM ux a JOIN ux b ON b.label = a.label AND b.pos = a.pos " +
        "AND b.vec_id <> a.vec_id GROUP BY 1, 2, 3), " +
        "kd AS MATERIALIZED (SELECT p, d6 AS kdist FROM (SELECT p, d6, " +
        "ROW_NUMBER() OVER (PARTITION BY p ORDER BY d6, o) AS rn FROM pd) WHERE rn = 5), " +
        "nk AS MATERIALIZED (SELECT pd.p, pd.o, pd.d6 FROM pd " +
        "JOIN kd ON kd.p = pd.p WHERE pd.d6 <= kd.kdist), " +
        "rd AS (SELECT nk.p, nk.o, GREATEST(ko.kdist, nk.d6) AS rd6 " +
        "FROM nk JOIN kd ko ON ko.p = nk.o), " +
        "lrd AS MATERIALIZED (SELECT p, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(LEAST(CASE WHEN SUM(rd6) = 0 THEN " + lrdCap + " ELSE " +
        Det.sqlHalfUpDiv("COUNT(*) * 1000000000000", "SUM(rd6)") + " END, " +
        lrdCap + ") AS BIGINT) AS lrd6 FROM rd GROUP BY p), " +
        "lf AS (SELECT nk.p, CAST(COUNT(*) AS BIGINT) AS n_k, " +
        "CAST(SUM(" + Det.sqlHalfUpDiv("lo.lrd6 * 1000000", "lp.lrd6") + ") AS BIGINT) AS st " +
        "FROM nk JOIN lrd lo ON lo.p = nk.o JOIN lrd lp ON lp.p = nk.p GROUP BY nk.p) " +
        "SELECT lf.p AS vec_id, lf.n_k, kd.kdist AS kdist6, lrd.lrd6, " +
        "CAST(" + Det.sqlHalfUpDiv("lf.st", "lf.n_k") + " AS BIGINT) AS lof6, " +
        "CAST(CASE WHEN " + Det.sqlHalfUpDiv("lf.st", "lf.n_k") + " > 1010000 THEN 1 ELSE 0 END AS BIGINT) AS flagged " +
        "FROM lf JOIN kd ON kd.p = lf.p JOIN lrd ON lrd.p = lf.p ORDER BY vec_id"
    },
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        graft.functions.VectorExprs.register(s)
        import graft.functions.VectorExprs.sl2e10
        val lrdCap = 1000000000L
        val emb = T.embeddings(s, d).select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
        val a = emb.select(col("label"), col("vec_id").as("p"), col("e").as("ea"))
        val b = emb.select(col("label"), col("vec_id").as("o"), col("e").as("eb"))
        // label-blocked pair distances, array-at-a-time (no 64× explode):
        // per-element floor quantization then an exact long fold — the
        // same arithmetic the oracle spells via UNNEST + SUM(FLOOR(...)),
        // run by the codegen'd DoubleVecScaledL2E10 (round 13: the
        // zip_with+aggregate HOF form is CodegenFallback — interpreted —
        // and was the key's hot loop)
        val pd = a.join(b, Seq("label")).where(col("p") =!= col("o"))
          .select(col("p"), col("o"),
            s6(sqrt(sl2e10(col("ea"), col("eb")).cast("double") / lit(1e10)))
              .as("d6"))
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val kd = pd
          .withColumn("rn", row_number().over(
            Window.partitionBy("p").orderBy(col("d6"), col("o"))))
          .where(col("rn") === 5)
          .select(col("p"), col("d6").as("kdist"))
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val nk = pd.join(kd, "p").where(col("d6") <= col("kdist"))
          .select(col("p"), col("o"), col("d6"))
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val rd = nk.join(kd.select(col("p").as("o"), col("kdist").as("ko")), "o")
          .select(col("p"), col("o"), greatest(col("ko"), col("d6")).as("rd6"))
        val lrd = rd.groupBy("p")
          .agg(count(lit(1)).as("n"), sum("rd6").as("srd"))
          .select(col("p"),
            least(when(col("srd") === 0, lit(lrdCap))
              .otherwise(Det.halfUpDiv(col("n") * lit(1000000000000L), col("srd"))),
              lit(lrdCap)).as("lrd6"))
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val lf = nk
          .join(lrd.select(col("p").as("o"), col("lrd6").as("lo")), "o")
          .join(lrd.select(col("p"), col("lrd6").as("lp")), "p")
          .groupBy("p")
          .agg(count(lit(1)).as("n_k"),
            sum(Det.halfUpDiv(col("lo") * lit(1000000L), col("lp"))).as("st"))
        lf.join(kd, "p").join(lrd, "p")
          .select(col("p").as("vec_id"), col("n_k"),
            col("kdist").as("kdist6"), col("lrd6"),
            Det.halfUpDiv(col("st"), col("n_k")).as("lof6"),
            when(Det.halfUpDiv(col("st"), col("n_k")) > 1010000L, 1L)
              .otherwise(0L).as("flagged"))
          .orderBy("vec_id")
      }),

    // LOF over the ANN candidate funnel (round 13, VERDICT r12 item 1) —
    // the composed key that grades dq_outlier_lof's NAMED 100 TB path:
    // candidate generation by IVF probing [Jégou et al. 2011; FAISS
    // IVFFlat] feeding the IDENTICAL reach-dist/lrd/LOF tail [Breunig
    // et al. 2000]. The coarse quantizer is the llm_kmeans_lloyd chain
    // verbatim (8 cells seeded from vec_id < 8, 3 Lloyd rounds under the
    // iterate-QUANTIZE discipline — every round's centroids land on the
    // 1e-6 grid so both engines iterate on bit-identical inputs); each
    // point then probes its 4 nearest cells by scaled-long distance to
    // the QUANTIZED round-3 centroids and its candidate set is the
    // probed cells' membership — never all-pairs, and unlike
    // dq_outlier_lof's label blocking the cells are GEOMETRIC, the form
    // that exists at corpus scale where curated labels don't. kNN (k=5),
    // k-dist, the ≥k tie set, reach-dist, lrd and the LOF ratio are
    // byte-for-byte dq_outlier_lof's integer forms over the candidate
    // relation. MEASURED on this corpus (64-dim uniform noise — the
    // ANN-hostile regime): 5NN recall of the 4-probe funnel = 0.76,
    // flagged-set agreement vs EXACT all-pairs LOF = 0.962 (sf0.01) /
    // 0.970 (sf0.001) at the 1.015 flag threshold (Round13OpsSpec pins
    // agreement ≥ 0.9); 1.015 rather than the exact key's 1.01 because
    // candidate-restricted k-dists bias LOF upward and 1.01 fires a
    // third of the corpus (agreement 0.78). Both lanes alive: 21/500
    // flagged at sf0.01, 13/500 at sf0.001. At scale every stage is
    // linear-ish: n·K centroid distances (broadcast K×dim), a bucket
    // join on cell id, per-point top-k, then the k·n tail — the
    // registry's last quadratic graded plan now has its funnel graded.
    Q("dq_outlier_lof_ann", Some {
      val lrdCap = "1000000000"
      val kmRounds = (1 to 3).map { r =>
        val cj =
          if (r == 1) "seeds s ON u.pos = s.pos"
          else s"(SELECT ck, pos, CAST(c6 AS DOUBLE) / 1e6 AS c FROM cent${r - 1}) s ON u.pos = s.pos"
        s"dist$r AS MATERIALIZED (SELECT u.vec_id, s.ck, " +
          "CAST(SUM(CAST(FLOOR((u.x - s.c) * (u.x - s.c) * 1e14 + 0.5) AS BIGINT)) AS BIGINT) AS d2 " +
          s"FROM ux u JOIN $cj GROUP BY u.vec_id, s.ck), " +
          s"asg$r AS MATERIALIZED (SELECT vec_id, ck FROM (SELECT vec_id, ck, " +
          s"ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, ck) AS rn FROM dist$r) WHERE rn = 1), " +
          s"cent$r AS MATERIALIZED (SELECT a.ck, u.pos, " + sqlMean6("u.x") + " AS c6 " +
          s"FROM ux u JOIN asg$r a ON a.vec_id = u.vec_id GROUP BY a.ck, u.pos)"
      }.mkString(", ")
      "WITH ux AS MATERIALIZED (SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS x, " +
        "UNNEST(RANGE(0, LEN(embedding))) AS pos FROM embeddings), " +
        "seeds AS (SELECT vec_id AS ck, pos, x AS c FROM ux WHERE vec_id < 8), " +
        kmRounds + ", " +
        "pq AS (SELECT u.vec_id, s.ck, " +
        "CAST(SUM(CAST(FLOOR((u.x - CAST(s.c6 AS DOUBLE) / 1e6) * (u.x - CAST(s.c6 AS DOUBLE) / 1e6) * 1e14 + 0.5) AS BIGINT)) AS BIGINT) AS d2 " +
        "FROM ux u JOIN cent3 s ON s.pos = u.pos GROUP BY u.vec_id, s.ck), " +
        "probes AS (SELECT vec_id AS p, ck FROM (SELECT vec_id, ck, " +
        "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, ck) AS rn FROM pq) WHERE rn <= 4), " +
        "cand AS MATERIALIZED (SELECT pr.p, m.vec_id AS o FROM probes pr " +
        "JOIN asg3 m ON m.ck = pr.ck AND m.vec_id <> pr.p), " +
        "pd AS MATERIALIZED (SELECT c.p, c.o, " +
        sqlS6("SQRT(CAST(SUM(CAST(FLOOR((a.x - b.x) * (a.x - b.x) * 1e10 + 0.5) AS BIGINT)) AS DOUBLE) / 1e10)") +
        " AS d6 FROM cand c JOIN ux a ON a.vec_id = c.p " +
        "JOIN ux b ON b.vec_id = c.o AND b.pos = a.pos GROUP BY 1, 2), " +
        "kd AS MATERIALIZED (SELECT p, d6 AS kdist FROM (SELECT p, d6, " +
        "ROW_NUMBER() OVER (PARTITION BY p ORDER BY d6, o) AS rn FROM pd) WHERE rn = 5), " +
        "nk AS MATERIALIZED (SELECT pd.p, pd.o, pd.d6 FROM pd " +
        "JOIN kd ON kd.p = pd.p WHERE pd.d6 <= kd.kdist), " +
        "rd AS (SELECT nk.p, nk.o, GREATEST(ko.kdist, nk.d6) AS rd6 " +
        "FROM nk JOIN kd ko ON ko.p = nk.o), " +
        "lrd AS MATERIALIZED (SELECT p, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(LEAST(CASE WHEN SUM(rd6) = 0 THEN " + lrdCap + " ELSE " +
        Det.sqlHalfUpDiv("COUNT(*) * 1000000000000", "SUM(rd6)") + " END, " +
        lrdCap + ") AS BIGINT) AS lrd6 FROM rd GROUP BY p), " +
        "lf AS (SELECT nk.p, CAST(COUNT(*) AS BIGINT) AS n_k, " +
        "CAST(SUM(" + Det.sqlHalfUpDiv("lo.lrd6 * 1000000", "lp.lrd6") + ") AS BIGINT) AS st " +
        "FROM nk JOIN lrd lo ON lo.p = nk.o JOIN lrd lp ON lp.p = nk.p GROUP BY nk.p) " +
        "SELECT lf.p AS vec_id, lf.n_k, kd.kdist AS kdist6, lrd.lrd6, " +
        "CAST(" + Det.sqlHalfUpDiv("lf.st", "lf.n_k") + " AS BIGINT) AS lof6, " +
        "CAST(CASE WHEN " + Det.sqlHalfUpDiv("lf.st", "lf.n_k") + " > 1015000 THEN 1 ELSE 0 END AS BIGINT) AS flagged " +
        "FROM lf JOIN kd ON kd.p = lf.p JOIN lrd ON lrd.p = lf.p ORDER BY vec_id"
    },
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        graft.functions.VectorExprs.register(s)
        import graft.functions.VectorExprs.sl2
        val lrdCap = 1000000000L
        val emb = T.embeddings(s, d).select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
        val vecs = emb.select(col("vec_id"), col("e").as("dvec"))
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val ux = emb.select(col("vec_id"), posexplode(col("e")).as(Seq("pos", "x")))
        val wAsg = Window.partitionBy("vec_id").orderBy(col("d2"), col("ck"))
        var centArr = emb.where(col("vec_id") < 8)
          .select(col("vec_id").as("ck"), col("e").as("cvec"))
        var asg: DataFrame = null
        for (_ <- 1 to 3) {
          asg = vecs.crossJoin(broadcast(centArr))
            .select(col("vec_id"), col("ck"), sl2(col("dvec"), col("cvec")).as("d2"))
            .withColumn("rn", row_number().over(wAsg))
            .where(col("rn") === 1)
            .select("vec_id", "ck")
            .localCheckpoint()
          centArr = ux.join(asg, "vec_id")
            .groupBy(col("ck"), col("pos"))
            .agg(mean6(col("x")).as("c6"))
            .groupBy("ck")
            .agg(transform(array_sort(collect_list(struct(col("pos"),
              (col("c6").cast("double") / lit(1e6)).as("c")))),
              e => e.getField("c")).as("cvec"))
            .localCheckpoint()
        }
        val probes = vecs.crossJoin(broadcast(centArr))
          .select(col("vec_id").as("p"), col("ck"),
            sl2(col("dvec"), col("cvec")).as("d2"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("p").orderBy(col("d2"), col("ck"))))
          .where(col("rn") <= 4)
          .select(col("p"), col("ck"))
        val cand = probes
          .join(asg.select(col("vec_id").as("o"), col("ck")), "ck")
          .where(col("o") =!= col("p"))
          .select(col("p"), col("o"))
        val ea = emb.select(col("vec_id").as("p"), col("e").as("ea"))
        val eb = emb.select(col("vec_id").as("o"), col("e").as("eb"))
        import graft.functions.VectorExprs.sl2e10
        val pd = cand.join(ea, "p").join(eb, "o")
          .select(col("p"), col("o"),
            s6(sqrt(sl2e10(col("ea"), col("eb")).cast("double") / lit(1e10)))
              .as("d6"))
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val kd = pd
          .withColumn("rn", row_number().over(
            Window.partitionBy("p").orderBy(col("d6"), col("o"))))
          .where(col("rn") === 5)
          .select(col("p"), col("d6").as("kdist"))
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val nk = pd.join(kd, "p").where(col("d6") <= col("kdist"))
          .select(col("p"), col("o"), col("d6"))
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val rd = nk.join(kd.select(col("p").as("o"), col("kdist").as("ko")), "o")
          .select(col("p"), col("o"), greatest(col("ko"), col("d6")).as("rd6"))
        val lrd = rd.groupBy("p")
          .agg(count(lit(1)).as("n"), sum("rd6").as("srd"))
          .select(col("p"),
            least(when(col("srd") === 0, lit(lrdCap))
              .otherwise(Det.halfUpDiv(col("n") * lit(1000000000000L), col("srd"))),
              lit(lrdCap)).as("lrd6"))
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val lf = nk
          .join(lrd.select(col("p").as("o"), col("lrd6").as("lo")), "o")
          .join(lrd.select(col("p"), col("lrd6").as("lp")), "p")
          .groupBy("p")
          .agg(count(lit(1)).as("n_k"),
            sum(Det.halfUpDiv(col("lo") * lit(1000000L), col("lp"))).as("st"))
        lf.join(kd, "p").join(lrd, "p")
          .select(col("p").as("vec_id"), col("n_k"),
            col("kdist").as("kdist6"), col("lrd6"),
            Det.halfUpDiv(col("st"), col("n_k")).as("lof6"),
            when(Det.halfUpDiv(col("st"), col("n_k")) > 1015000L, 1L)
              .otherwise(0L).as("flagged"))
          .orderBy("vec_id")
      }))

  /** The 10-row bin grid (0..9) as a DataFrame — tiny, broadcast into
    * the type×bin cross. */
  private def spark_range10(s: SparkSession): DataFrame =
    s.range(0, 10).select(col("id").as("bin"))

  /** Oracle twin of dq_profile — one SELECT per column UNION ALL'd, each
    * computing the same exact-integer metrics (n_null spelled as
    * COUNT(*) − COUNT(col), the Column form's subtraction). */
  private def profileOracle: String = {
    def row(name: String, colSql: String, minSql: String, maxSql: String) =
      s"SELECT '$name' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        s"CAST(COUNT(*) - COUNT($colSql) AS BIGINT) AS n_null, " +
        s"CAST(COUNT(DISTINCT $colSql) AS BIGINT) AS n_distinct, " +
        s"$minSql AS min_l, $maxSql AS max_l FROM orders"
    val nul = "CAST(NULL AS BIGINT)"
    Seq(
      row("o_orderkey", "o_orderkey",
        "CAST(MIN(o_orderkey) AS BIGINT)", "CAST(MAX(o_orderkey) AS BIGINT)"),
      row("o_custkey", "o_custkey",
        "CAST(MIN(o_custkey) AS BIGINT)", "CAST(MAX(o_custkey) AS BIGINT)"),
      row("o_orderstatus", "o_orderstatus", nul, nul),
      row("o_totalprice", "o_totalprice",
        "CAST(MIN(" + sqlS2("o_totalprice") + ") AS BIGINT)",
        "CAST(MAX(" + sqlS2("o_totalprice") + ") AS BIGINT)"),
      row("o_orderdate", "o_orderdate",
        "CAST(MIN(CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT)) AS BIGINT)",
        "CAST(MAX(CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT)) AS BIGINT)"),
      row("o_orderpriority", "o_orderpriority", nul, nul))
      .mkString("", " UNION ALL ", " ORDER BY col_name")
  }

  /** Oracle twin of dq_constraints — the same six rules as scalar
    * aggregates UNION ALL'd (fk_orphan as a NOT-EXISTS count). */
  private def constraintsOracle: String =
    "SELECT 'date_range' AS rule, CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01' " +
      "OR o_orderdate >= TIMESTAMP '2030-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM orders " +
      "UNION ALL SELECT 'fk_orphan', CAST(COUNT(*) AS BIGINT) FROM orders o " +
      "WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey) " +
      "UNION ALL SELECT 'pk_dup', CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders " +
      "UNION ALL SELECT 'pk_null', CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders " +
      "UNION ALL SELECT 'price_nonpos', CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM orders " +
      "UNION ALL SELECT 'status_domain', CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END) AS BIGINT) FROM orders " +
      "ORDER BY rule"
}
