package graft

import org.apache.spark.sql.functions._

/** Round-10 fourth wave, each key pinned against an independent Scala
  * mirror (the Round10OpsSpec discipline: the DuckDB oracle and these
  * mirrors are separate implementations, so the two engine sides can't
  * share a bug).
  */
class Round10dOpsSpec extends SparkSpec {

  private def s6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  /** (event_id, epoch_s, event_type, value) straight from the parquet
    * truth — the shared input of the ohlc/skip mirrors. */
  private lazy val ev: Array[(Long, Long, String, Double)] =
    Tables.events(spark, sfDir)
      .select(col("event_id"), unix_timestamp(col("ts")).as("t"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))

  test("win_ohlc: bars match a scalar open/high/low/close mirror") {
    val got = SparkEntry.queries("win_ohlc")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    val mirror = ev.groupBy(e => (e._3, math.floor(e._2 / 86400.0).toLong))
      .map { case (k, rows) =>
        // lexicographic (t, event_id) tuple — the struct ordering both
        // engines use since round 12; no packed-long magnitude bound
        val keyed = rows.map(e => ((e._2, e._1), s6(e._4)))
        k -> (keyed.minBy(_._1)._2, keyed.map(_._2).max,
          keyed.map(_._2).min, keyed.maxBy(_._1)._2, keyed.length.toLong)
      }
    assert(got == mirror)
    // bars must be far coarser than ticks (the shuffle-bytes claim)
    assert(got.size.toLong < ev.length / 5)
  }

  test("maint_stats_skip: manifest pruning reads 3 of 16 files, values exact") {
    val r = SparkEntry.queries("maint_stats_skip")(spark, sfDir).collect()
    assert(r.length == 1)
    val (nFiles, nRows, sumId, sumV6) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    val mx = ev.map(_._1).max
    val w = (mx + 16) / 16
    val (lo, hi) = (3 * w, 5 * w + w / 2)
    // mirror the manifest: per-bucket min/max over the truth
    val sel = ev.groupBy(_._1 / w).values
      .count(rows => rows.map(_._1).min <= hi && rows.map(_._1).max >= lo)
    val hit = ev.filter(e => e._1 >= lo && e._1 <= hi)
    assert(nFiles == sel)
    assert(nFiles < 16, "pruning must actually skip files")
    assert(nRows == hit.length)
    assert(sumId == hit.map(_._1).sum)
    assert(sumV6 == hit.map(e => s6(e._4)).sum)
  }

  test("scan_xml_roundtrip: XML write/read loses nothing vs the parquet truth") {
    val got = SparkEntry.queries("scan_xml_roundtrip")(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val props = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"), col("props"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    val mirror = props.groupBy(_._2 % 10).map { case (b, rows) =>
      b -> (rows.length.toLong, rows.map(_._1).sum,
        rows.map(e => s6(e._3)).sum,
        rows.map(e => e._4.length + "<&\"tail".length).map(_.toLong).sum)
    }
    assert(got == mirror)
  }

  test("maint_snapshot_diff: CDF classes match a scalar snapshot diff") {
    val got = SparkEntry.queries("maint_snapshot_diff")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // scalar mirror: build both snapshots from the raw rows, classify
    val raw = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    def cells(f: ((Long, Long, String, Double)) => Boolean) =
      raw.filter(f).groupBy(e => (e._2, e._3))
        .map { case (k, g) => k -> (g.length.toLong, g.map(e => s6(e._4)).sum) }
    val a = cells(_ => true)
    val b = cells(e => e._3 != "error" && (e._3 != "view" || e._1 % 2 == 0)) ++
      raw.filter(_._3 != "error").groupBy(_._2).map { case (u, g) =>
        (u, "total") -> (g.length.toLong, g.map(e => s6(e._4)).sum)
      }
    val emitted = (a.keySet ++ b.keySet).toSeq.flatMap { k =>
      (a.get(k), b.get(k)) match {
        case (None, Some(v))            => Seq(("insert", k, v))
        case (Some(v), None)            => Seq(("delete", k, v))
        case (Some(p), Some(q)) if p == q => Seq(("unchanged", k, q))
        case (Some(p), Some(q)) =>
          Seq(("update_preimage", k, p), ("update_postimage", k, q))
      }
    }
    val mirror = emitted.groupBy(_._1).map { case (ct, g) =>
      ct -> (g.length.toLong, g.map(_._2._1).sum,
        g.map(_._3._1).sum, g.map(_._3._2).sum)
    }
    assert(got == mirror)
    // all five CDF classes must fire on this corpus
    assert(got.keySet == Set("insert", "delete", "unchanged",
      "update_preimage", "update_postimage"))
  }

  test("dq_mahalanobis: flags match a BigInt quadratic-form mirror") {
    val got = SparkEntry.queries("dq_mahalanobis")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        floor(col("l_quantity") + 0.5).cast("long"),
        floor(col("l_extendedprice") + 0.5).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val mirror = rows.groupBy(_._1).map { case (rf, g) =>
      val n = BigInt(g.length)
      val sx = BigInt(g.map(_._2).sum); val sy = BigInt(g.map(_._3).sum)
      val sxx = g.map(e => BigInt(e._2) * e._2).sum
      val syy = g.map(e => BigInt(e._3) * e._3).sum
      val sxy = g.map(e => BigInt(e._2) * e._3).sum
      val a = n * sxx - sx * sx; val b = n * sxy - sx * sy
      val c = n * syy - sy * sy
      val nOut = g.count { e =>
        val dx = n * e._2 - sx; val dy = n * e._3 - sy
        c * dx * dx - 2 * b * dx * dy + a * dy * dy > 5 * (a * c - b * b)
      }
      rf -> (g.length.toLong, nOut.toLong)
    }
    assert(got == mirror)
    // the screen must actually flag a joint tail on this corpus
    assert(got.values.map(_._2).sum > 0)
  }

  test("sql_groupby_all: grouping arity matches the explicit GROUP BY") {
    val got = SparkEntry.queries("sql_groupby_all")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue) ->
        (r.getLong(2), r.getLong(3)))
      .toMap
    val mirror = Tables.customer(spark, sfDir)
      .groupBy(col("c_mktsegment"), (col("c_nationkey") % 5).as("nb"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("c_acctbal") * 100 + 0.5).cast("long")).as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1).toLong) ->
        (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == mirror)
  }
}
