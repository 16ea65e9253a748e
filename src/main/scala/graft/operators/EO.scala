package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Q, Tables => T}
import Det._

/** SURVEY.md §3.9: the reference's own EO computations, re-expressed over
  * the graded relational corpus (no raster fixtures exist yet — SURVEY
  * §8.3): band math -> arithmetic over value columns, bitmask QA -> integer
  * bit ops, regrid -> integer bucketing, composites/anomaly/zonal ->
  * grouped/windowed reductions, WOfS decision tree -> chained CASE,
  * geomedian -> typed Aggregator (functions.Geomedian).
  */
object EO {

  val all: Seq[Q] = Seq(

    // NDVI-shaped normalized difference with div-0 guard (xr.where analogue).
    Q("eo_bandmath", Some(
      "SELECT l_orderkey, l_linenumber, " +
        "CASE WHEN (l_extendedprice + l_extendedprice * l_discount) = 0 THEN NULL " +
        "ELSE CAST(ROUND((l_extendedprice - l_extendedprice * l_discount) / " +
        "(l_extendedprice + l_extendedprice * l_discount), 6) AS DECIMAL(38,6)) END AS nd " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, nd"),
      (s, d) => {
        val a = col("l_extendedprice")
        val b = col("l_extendedprice") * col("l_discount")
        T.lineitem(s, d)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            when(a + b === 0, lit(null)).otherwise(d6((a - b) / (a + b))).as("nd"))
          .orderBy("l_orderkey", "l_linenumber", "nd")
      }),

    // Landsat pixel_qa-style bitmask filter + clear-count (synthesized flags).
    Q("eo_bitmask", Some(
      "SELECT l_returnflag, " +
        "CAST(SUM(CASE WHEN ((l_orderkey % 256) & 3) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clear, " +
        "CAST(COUNT(*) AS BIGINT) AS n_total FROM lineitem " +
        "GROUP BY l_returnflag ORDER BY l_returnflag"),
      (s, d) =>
        T.lineitem(s, d)
          .withColumn("flags", col("l_orderkey") % 256)
          .groupBy("l_returnflag")
          .agg(
            sum(when(col("flags").bitwiseAND(3) === 0, 1).otherwise(0))
              .cast("bigint").as("n_clear"),
            count(lit(1)).as("n_total"))
          .orderBy("l_returnflag")),

    // Resample onto a coarse output grid (dc.load(resolution=...) analogue):
    // integer cell ids, per-cell mean + count.
    Q("eo_regrid", Some(
      "SELECT CAST(FLOOR(value / 50) AS BIGINT) AS gx, user_id % 10 AS gy, " +
        "CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(ROUND(AVG(value), 6) AS DECIMAL(38,6)) AS mean_val, " +
        "SUM(CAST(value AS DECIMAL(28,10))) AS sum_val " +
        "FROM events GROUP BY gx, gy ORDER BY gx, gy"),
      (s, d) =>
        T.events(s, d)
          .groupBy(
            floor(col("value") / 50).as("gx"),
            (col("user_id") % 10).as("gy"))
          .agg(
            count(lit(1)).as("n"),
            d6(avg(col("value"))).as("mean_val"),
            dsum(col("value")).as("sum_val"))
          .orderBy("gx", "gy")),

    // Per-pixel temporal median mosaic analogue: exact median per user.
    Q("eo_composite_median", Some(
      "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(ROUND(MEDIAN(value), 6) AS DECIMAL(38,6)) AS med_val " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
      (s, d) =>
        T.events(s, d)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"), d6(median(col("value"))).as("med_val"))
          .orderBy("user_id")),

    // NDVI-anomaly analogue: observation minus (event_type x month)
    // climatology. One shuffle: the climatology is a window mean, not a
    // separate aggregate + join.
    Q("eo_anomaly", Some(
      "SELECT event_id, event_type, CAST(ROUND(value - clim, 4) AS DECIMAL(38,4)) AS anomaly " +
        "FROM (SELECT event_id, event_type, value, " +
        "AVG(value) OVER (PARTITION BY event_type, MONTH(ts)) AS clim FROM events) x " +
        "ORDER BY event_id"),
      (s, d) => {
        val w = Window.partitionBy(col("event_type"), month(col("ts")))
        T.events(s, d)
          .withColumn("clim", avg(col("value")).over(w))
          .select(
            col("event_id"), col("event_type"),
            d4(col("value") - col("clim")).as("anomaly"))
          .orderBy("event_id")
      }),

    // WOfS-style regression-tree classifier (Mueller et al. 2016, RSE 174):
    // chained threshold CASE over two derived bands, class counts per group.
    Q("eo_decision_tree", Some(
      "SELECT l_returnflag, cls, CAST(COUNT(*) AS BIGINT) AS n FROM (" +
        "SELECT l_returnflag, CASE " +
        "WHEN l_discount > 0.06 AND l_tax > 0.04 THEN 'A' " +
        "WHEN l_discount > 0.06 THEN 'B' " +
        "WHEN l_tax > 0.04 THEN 'C' ELSE 'D' END AS cls FROM lineitem) x " +
        "GROUP BY l_returnflag, cls ORDER BY l_returnflag, cls"),
      (s, d) =>
        T.lineitem(s, d)
          .withColumn("cls",
            when(col("l_discount") > 0.06 && col("l_tax") > 0.04, "A")
              .when(col("l_discount") > 0.06, "B")
              .when(col("l_tax") > 0.04, "C")
              .otherwise("D"))
          .groupBy("l_returnflag", "cls")
          .agg(count(lit(1)).as("n"))
          .orderBy("l_returnflag", "cls")),

    // Zonal statistics over AOI polygons analogue: zones from a broadcast
    // dimension join, stats per zone.
    Q("eo_zonal_stats", Some(
      "SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(ROUND(MIN(value), 6) AS DECIMAL(38,6)) AS min_val, " +
        "CAST(ROUND(MAX(value), 6) AS DECIMAL(38,6)) AS max_val, " +
        "CAST(ROUND(AVG(value), 6) AS DECIMAL(38,6)) AS mean_val, " +
        "SUM(CAST(value AS DECIMAL(28,10))) AS sum_val " +
        "FROM events JOIN nation ON CAST(user_id % 25 AS INT) = n_nationkey " +
        "GROUP BY n_name ORDER BY n_name"),
      (s, d) =>
        T.events(s, d)
          .join(broadcast(T.nation(s, d)),
            (col("user_id") % 25).cast("int") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(
            count(lit(1)).as("n"),
            d6(min(col("value"))).as("min_val"),
            d6(max(col("value"))).as("max_val"),
            d6(avg(col("value"))).as("mean_val"),
            dsum(col("value")).as("sum_val"))
          .orderBy("n_name")),

    // Max-NDVI mosaic: per pixel-group, keep the observation with the
    // highest index value (the reference's max-NDVI composite product) —
    // argmax via window, ties broken by event_id.
    Q("eo_composite_maxndvi", Some(
      "SELECT user_id, event_id, CAST(ROUND(value, 6) AS DECIMAL(38,6)) AS best_val FROM (" +
        "SELECT user_id, event_id, value, ROW_NUMBER() OVER (" +
        "PARTITION BY user_id ORDER BY value DESC, event_id) AS rn FROM events) x " +
        "WHERE rn = 1 ORDER BY user_id"),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
        T.events(s, d)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("user_id"), col("event_id"), d6(col("value")).as("best_val"))
          .orderBy("user_id")
      }),

    // Water-permanency statistics (WOfS summary product): per pixel-group,
    // the share of observations classified wet, over all clear obs.
    Q("eo_water_permanency", Some(
      "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_obs, " +
        "CAST(SUM(CASE WHEN value > 250 THEN 1 ELSE 0 END) AS BIGINT) AS n_wet, " +
        "CAST(ROUND(CAST(SUM(CASE WHEN value > 250 THEN 1 ELSE 0 END) AS DOUBLE) " +
        "/ CAST(COUNT(*) AS DOUBLE), 6) AS DECIMAL(38,6)) AS pct_wet " +
        "FROM events GROUP BY user_id ORDER BY user_id"),
      (s, d) =>
        T.events(s, d)
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_obs"),
            sum(when(col("value") > 250, 1).otherwise(0)).cast("bigint").as("n_wet"),
            d6(sum(when(col("value") > 250, 1).otherwise(0)).cast("double")
              / count(lit(1)).cast("double")).as("pct_wet"))
          .orderBy("user_id")),

    // Two-endmember linear unmixing (fractional-cover product family):
    // closed-form fraction clamp((x - e0) / (e1 - e0), 0, 1).
    Q("eo_unmix", Some(
      "SELECT event_id, CAST(ROUND(LEAST(GREATEST((value - 50.0) / (400.0 - 50.0), 0.0), 1.0), 6) " +
        "AS DECIMAL(38,6)) AS veg_fraction FROM events ORDER BY event_id"),
      (s, d) =>
        T.events(s, d)
          .select(col("event_id"),
            d6(least(greatest((col("value") - 50.0) / (400.0 - 50.0), lit(0.0)), lit(1.0)))
              .as("veg_fraction"))
          .orderBy("event_id")),

    // End-to-end product generation in ONE Catalyst plan — the reference's
    // per-product worker shape (SURVEY §1): QA-mask -> band math ->
    // temporal composite -> per-zone summary. No intermediate
    // materialization; the optimizer fuses mask+bandmath into the scan.
    Q("eo_product_pipeline", Some(
      "WITH masked AS (SELECT l_returnflag, YEAR(l_shipdate) AS y, " +
        "(l_extendedprice - l_extendedprice * l_discount) / " +
        "(l_extendedprice + l_extendedprice * l_discount) AS nd " +
        "FROM lineitem WHERE ((l_orderkey % 256) & 3) = 0), " +
        "composite AS (SELECT l_returnflag, y, MEDIAN(nd) AS med_nd, " +
        "CAST(COUNT(*) AS BIGINT) AS n_obs FROM masked GROUP BY l_returnflag, y) " +
        "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_years, " +
        "CAST(SUM(n_obs) AS BIGINT) AS n_obs, " +
        "CAST(ROUND(AVG(med_nd), 6) AS DECIMAL(38,6)) AS mean_yearly_median " +
        "FROM composite GROUP BY l_returnflag ORDER BY l_returnflag"),
      (s, d) => {
        val a = col("l_extendedprice")
        val b = col("l_extendedprice") * col("l_discount")
        T.lineitem(s, d)
          .where(((col("l_orderkey") % 256).bitwiseAND(3)) === 0)
          .select(col("l_returnflag"), year(col("l_shipdate")).as("y"),
            ((a - b) / (a + b)).as("nd"))
          .groupBy("l_returnflag", "y")
          .agg(median(col("nd")).as("med_nd"), count(lit(1)).as("n_obs"))
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n_years"),
            sum(col("n_obs")).as("n_obs"),
            d6(avg(col("med_nd"))).as("mean_yearly_median"))
          .orderBy("l_returnflag")
      }),

    // Geomedian composite per label (Roberts et al. 2017) — iterative
    // Weiszfeld, not SQL-expressible; property-tested in GeomedianSpec.
    Q("eo_geomedian", None,
      (s, d) => {
        val gm = udaf(new graft.functions.GeomedianAgg())
        T.embeddings(s, d)
          .groupBy("label")
          .agg(count(lit(1)).as("n"), gm(col("embedding")).as("gmed"))
          .select(
            col("label"), col("n"),
            d6(element_at(col("gmed"), 1)).as("g1"),
            d6(element_at(col("gmed"), 2)).as("g2"),
            d6(element_at(col("gmed"), 3)).as("g3"),
            d6(element_at(col("gmed"), 4)).as("g4"))
          .orderBy("label")
      }))
}
