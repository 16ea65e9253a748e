package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Det, Q, Tables => T}
import Det._

/** SURVEY.md §3.4: aggregations.
  *
  * All double SUMs go through Det.dsum (exact decimal accumulation —
  * order-insensitive, so Spark's partial/final split and AQE coalescing are
  * free to reorder at any scale); AVG / variance-family stay double and are
  * rounded (Det scaladoc). Reference analogues: per-pixel temporal
  * reductions and WOfS-style clear-observation ratios (SURVEY §3.4).
  */
object Aggregates {

  /** Flagship TPC-H-Q1-style pricing summary — also SparkEntry.entry.
    * Hash-aggregate with map-side partial aggregation; one shuffle on the
    * two low-cardinality group keys. */
  def aggGroup(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
          .as("sum_charge"),
        d6(avg(col("l_quantity"))).as("avg_qty"),
        d6(avg(col("l_extendedprice"))).as("avg_price"),
        d6(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val aggGroupOracle: String =
    "SELECT l_returnflag, l_linestatus, " +
      "SUM(CAST(l_quantity AS DECIMAL(28,10))) AS sum_qty, " +
      "SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS sum_base, " +
      "SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS sum_disc, " +
      "SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,10))) AS sum_charge, " +
      "CAST(ROUND(AVG(l_quantity), 6) AS DECIMAL(38,6)) AS avg_qty, " +
      "CAST(ROUND(AVG(l_extendedprice), 6) AS DECIMAL(38,6)) AS avg_price, " +
      "CAST(ROUND(AVG(l_discount), 6) AS DECIMAL(38,6)) AS avg_disc, " +
      "CAST(COUNT(*) AS BIGINT) AS count_order " +
      "FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"

  val all: Seq[Q] = Seq(

    Q("agg_group", Some(aggGroupOracle), aggGroup),

    Q("agg_global", Some(
      "SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
        "SUM(CAST(l_quantity AS DECIMAL(28,10))) AS sum_qty, " +
        "CAST(ROUND(AVG(l_extendedprice), 6) AS DECIMAL(38,6)) AS avg_price, " +
        "CAST(ROUND(MIN(l_extendedprice), 6) AS DECIMAL(38,6)) AS min_price, " +
        "CAST(ROUND(MAX(l_extendedprice), 6) AS DECIMAL(38,6)) AS max_price FROM lineitem"),
      (s, d) =>
        T.lineitem(s, d).agg(
          count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("sum_qty"),
          d6(avg(col("l_extendedprice"))).as("avg_price"),
          d6(min(col("l_extendedprice"))).as("min_price"),
          d6(max(col("l_extendedprice"))).as("max_price"))),

    Q("agg_distinct", Some(
      "SELECT c_mktsegment, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust, " +
        "CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
      (s, d) =>
        T.orders(s, d)
          .join(broadcast(T.customer(s, d)), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n_orders"))
          .orderBy("c_mktsegment")),

    // HLL++ sketch — approximate by design, no portable oracle (SURVEY §3.4 ✘);
    // accuracy vs exact is property-tested in AggregatesSpec.
    Q("agg_hll", None,
      (s, d) =>
        T.events(s, d)
          .groupBy("event_type")
          .agg(approx_count_distinct(col("user_id")).as("approx_users"))
          .orderBy("event_type")),

    Q("agg_rollup", Some(
      "SELECT r_name, n_name, CAST(GROUPING(r_name, n_name) AS INTEGER) AS gid, " +
        "CAST(COUNT(*) AS BIGINT) AS n_cust, SUM(CAST(c_acctbal AS DECIMAL(28,10))) AS sum_bal " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY ROLLUP (r_name, n_name) " +
        "ORDER BY r_name NULLS FIRST, n_name NULLS FIRST"),
      (s, d) => {
        // Dataset.rollup trips the analyzer's ambiguous-self-join heuristic on
        // this join tree (Spark 4.1 false positive); the SQL form builds the
        // identical Aggregate(Rollup) plan without it.
        custNationRegion(s, d).createOrReplaceTempView("crn_rollup")
        s.sql(
          "SELECT r_name, n_name, CAST(GROUPING_ID() AS INT) AS gid, " +
            "COUNT(*) AS n_cust, SUM(CAST(c_acctbal AS DECIMAL(28,10))) AS sum_bal " +
            "FROM crn_rollup GROUP BY ROLLUP(r_name, n_name) " +
            "ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST")
      }),

    Q("agg_cube", Some(
      "SELECT r_name, n_name, CAST(GROUPING(r_name, n_name) AS INTEGER) AS gid, " +
        "CAST(COUNT(*) AS BIGINT) AS n_cust FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY CUBE (r_name, n_name) " +
        "ORDER BY r_name NULLS FIRST, n_name NULLS FIRST, gid"),
      (s, d) => {
        custNationRegion(s, d).createOrReplaceTempView("crn_cube")
        s.sql(
          "SELECT r_name, n_name, CAST(GROUPING_ID() AS INT) AS gid, COUNT(*) AS n_cust " +
            "FROM crn_cube GROUP BY CUBE(r_name, n_name) " +
            "ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST, gid")
      }),

    Q("agg_gsets", Some(
      "SELECT r_name, n_name, CAST(GROUPING(r_name, n_name) AS INTEGER) AS gid, " +
        "CAST(COUNT(*) AS BIGINT) AS n_cust FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY GROUPING SETS ((r_name), (n_name), ()) " +
        "ORDER BY r_name NULLS FIRST, n_name NULLS FIRST, gid"),
      (s, d) =>
        custNationRegion(s, d)
          .groupingSets(
            Seq(Seq(col("r_name")), Seq(col("n_name")), Seq.empty),
            col("r_name"), col("n_name"))
          .agg(grouping_id().cast("int").as("gid"), count(lit(1)).as("n_cust"))
          .select("r_name", "n_name", "gid", "n_cust")
          .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first, col("gid"))),

    // max_by/min_by (DuckDB arg_max/arg_min): the ordering value embeds the
    // unique orderkey so ties cannot make the argmax engine-dependent.
    Q("agg_minmax_by", Some(
      "SELECT o_custkey, " +
        "ARG_MAX(o_orderkey, CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) * 10000000 + o_orderkey) AS biggest_order, " +
        "ARG_MIN(o_orderkey, CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) * 10000000 + o_orderkey) AS smallest_order " +
        "FROM orders GROUP BY o_custkey ORDER BY o_custkey"),
      (s, d) => {
        val rankVal = floor(col("o_totalprice") * 100 + 0.5).cast("long") * 10000000L +
          col("o_orderkey")
        T.orders(s, d)
          .groupBy("o_custkey")
          .agg(
            max_by(col("o_orderkey"), rankVal).as("biggest_order"),
            min_by(col("o_orderkey"), rankVal).as("smallest_order"))
          .orderBy("o_custkey")
      }),

    // Pivot: linestatus becomes columns (reference analogue: per-band
    // columns out of a long (pixel, band, value) layout). Pivot values are
    // declared, not discovered — no extra distinct pass, stable schema.
    Q("agg_pivot", Some(
      "SELECT l_returnflag, " +
        "SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END AS DECIMAL(28,10))) AS F, " +
        "SUM(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END AS DECIMAL(28,10))) AS O " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      (s, d) =>
        T.lineitem(s, d)
          .groupBy("l_returnflag")
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(sum(col("l_quantity").cast(Dec28_10)))
          .na.fill(0.0)
          .orderBy("l_returnflag")),

    // Unpivot/melt: wide -> long (the inverse raster layout move).
    Q("agg_unpivot", Some(
      "SELECT o_orderkey, metric, CAST(ROUND(v, 6) AS DECIMAL(38,6)) AS v FROM (" +
        "SELECT o_orderkey, 'price' AS metric, o_totalprice AS v FROM orders " +
        "UNION ALL SELECT o_orderkey, 'key100' AS metric, CAST(o_custkey * 100 AS DOUBLE) AS v FROM orders) u " +
        "ORDER BY o_orderkey, metric"),
      (s, d) =>
        T.orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice").as("price"),
            (col("o_custkey") * 100).cast("double").as("key100"))
          .unpivot(Array(col("o_orderkey")), Array(col("price"), col("key100")),
            "metric", "v")
          .select(col("o_orderkey"), col("metric"), d6(col("v")).as("v"))
          .orderBy("o_orderkey", "metric")),

    Q("agg_filtered", Some(
      "SELECT l_returnflag, " +
        "SUM(CAST(CASE WHEN l_discount > 0.05 THEN l_quantity ELSE 0 END AS DECIMAL(28,10))) AS qty_highdisc, " +
        "CAST(SUM(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      (s, d) =>
        T.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            sum(when(col("l_discount") > 0.05, col("l_quantity")).otherwise(lit(0))
              .cast(Dec28_10)).as("qty_highdisc"),
            sum(when(col("l_quantity") >= 25, 1).otherwise(0)).cast("bigint").as("n_bulk"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")),

    Q("agg_stats", Some(
      "SELECT l_returnflag, " +
        "CAST(ROUND(STDDEV_SAMP(l_quantity), 4) AS DECIMAL(38,4)) AS sd_qty, " +
        "CAST(ROUND(VAR_SAMP(l_quantity), 4) AS DECIMAL(38,4)) AS var_qty, " +
        "CAST(ROUND(CORR(l_extendedprice, l_quantity), 4) AS DECIMAL(38,4)) AS corr_pq, " +
        "CAST(ROUND(COVAR_SAMP(l_extendedprice, l_quantity), 4) AS DECIMAL(38,4)) AS cov_pq " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      (s, d) =>
        T.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            d4(stddev_samp(col("l_quantity"))).as("sd_qty"),
            d4(var_samp(col("l_quantity"))).as("var_qty"),
            d4(corr(col("l_extendedprice"), col("l_quantity"))).as("corr_pq"),
            d4(covar_samp(col("l_extendedprice"), col("l_quantity"))).as("cov_pq"))
          .orderBy("l_returnflag")),

    Q("agg_median_pct", Some(
      "SELECT l_returnflag, " +
        "CAST(ROUND(MEDIAN(l_quantity), 6) AS DECIMAL(38,6)) AS med_qty, " +
        "CAST(ROUND(QUANTILE_CONT(l_quantity, 0.25), 6) AS DECIMAL(38,6)) AS q25, " +
        "CAST(ROUND(QUANTILE_CONT(l_quantity, 0.75), 6) AS DECIMAL(38,6)) AS q75 " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      (s, d) =>
        T.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            d6(median(col("l_quantity"))).as("med_qty"),
            d6(percentile(col("l_quantity"), lit(0.25))).as("q25"),
            d6(percentile(col("l_quantity"), lit(0.75))).as("q75"))
          .orderBy("l_returnflag")),

    // approx_percentile — the bounded-memory sketch the exact
    // median/percentile keys fall back to when a single group outgrows its
    // sort buffer (SCALING.md). Approximate -> no oracle; accuracy vs the
    // exact percentile is asserted in SketchSpec.
    Q("agg_approx_pct", None,
      (s, d) =>
        T.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50_approx"),
            expr("approx_percentile(l_extendedprice, 0.95, 10000)").as("p95_approx"))
          .orderBy("l_returnflag")),

    Q("agg_listagg", Some(
      "SELECT n_name, STRING_AGG(c_name, ',' ORDER BY c_name) AS names " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY n_name ORDER BY n_name"),
      (s, d) =>
        T.customer(s, d)
          .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(concat_ws(",", array_sort(collect_list(col("c_name")))).as("names"))
          .orderBy("n_name")),

    Q("agg_topk_group", Some(
      "SELECT o_custkey, o_orderkey, CAST(rn AS INTEGER) AS rn FROM (" +
        "SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER (PARTITION BY o_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) x " +
        "WHERE rn <= 3 ORDER BY o_custkey, rn"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
        T.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "rn")
          .orderBy("o_custkey", "rn")
      }))

  private def custNationRegion(s: SparkSession, d: String): DataFrame =
    T.customer(s, d)
      .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      // Narrow before rollup/cube: a fresh projection gives the grouping
      // attributes a single lineage, avoiding spurious self-join ambiguity.
      .select("r_name", "n_name", "c_acctbal")
}
