package graft

import org.apache.spark.sql.functions._

/** Seventh-wave round-9 operators, each pinned against an independent
  * Scala mirror on the sf0.001 corpus (the oracle gate grades the same
  * keys against DuckDB; these mirrors are a third implementation so the
  * two engine sides can't share a bug). */
class Round9eOpsSpec extends SparkSpec {

  private def s6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
  private def s2(x: Double): Long = math.floor(x * 100 + 0.5).toLong
  private def s0(x: Double): Long = math.floor(x + 0.5).toLong

  /** (returnflag, linestatus, quantity, extendedprice). */
  private lazy val li: Seq[(String, String, Double, Double)] =
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        col("l_extendedprice"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))

  /** (user_id, event_id, epoch_s, value, event_type). */
  private lazy val events: Seq[(Long, Long, Long, Double, String)] =
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("t"),
        col("value"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4)))

  test("agg_cramers_v: V matches the contingency mirror and sits in [0,1]") {
    val row = SparkEntry.queries("agg_cramers_v")(spark, sfDir).collect().head
    val cells = li.groupBy(r => (r._1, r._2)).map { case (k, v) => k -> v.size.toLong }
    val rt = cells.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    val ct = cells.groupBy(_._1._2).map { case (st, m) => st -> m.values.sum }
    val n = cells.values.sum
    val chi26 = cells.map { case ((f, st), c) =>
      val e = rt(f).toDouble * ct(st).toDouble / n.toDouble
      s6((c - e) * (c - e) / e)
    }.sum
    val mdof = math.min(rt.size - 1, ct.size - 1).toLong
    assert(row.getLong(0) == n && row.getLong(1) == mdof)
    assert(row.getLong(2) == chi26, "chi2_6")
    val v6 = s6(math.sqrt(chi26.toDouble / 1e6 / n / mdof))
    assert(row.getLong(3) == v6, "v6")
    assert(row.getLong(3) >= 0 && row.getLong(3) <= 1000000)
  }

  test("agg_cohens_d: d and Hedges g match the pooled-moment mirror") {
    val got = SparkEntry.queries("agg_cohens_d")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    val byStatus = li.filter(r => r._1 == "A" || r._1 == "R").groupBy(_._2)
    byStatus.foreach { case (st, rows) =>
      val xa = rows.filter(_._1 == "A").map(r => s0(r._3))
      val xr = rows.filter(_._1 == "R").map(r => s0(r._3))
      val (na, nr) = (xa.size.toLong, xr.size.toLong)
      val (sa, sr) = (xa.sum, xr.sum)
      val (saa, srr) = (xa.map(x => x * x).sum, xr.map(x => x * x).sum)
      val m1 = sa.toDouble / na; val m2 = sr.toDouble / nr
      val v1 = (saa - sa.toDouble * sa / na) / (na - 1.0)
      val v2 = (srr - sr.toDouble * sr / nr) / (nr - 1.0)
      val df = na + nr - 2.0
      val d = (m1 - m2) / math.sqrt(((na - 1.0) * v1 + (nr - 1.0) * v2) / df)
      val j = 1.0 - 3.0 / (4.0 * df - 1.0)
      val (gna, gnr, d6, g6) = got(st)
      assert(gna == na && gnr == nr, s"$st counts")
      assert(d6 == s6(d), s"$st d6")
      assert(g6 == s6(j * d), s"$st g6")
      // |g| < |d|: the small-sample correction always shrinks
      assert(math.abs(g6) <= math.abs(d6), s"$st shrinkage")
    }
  }

  test("agg_pca2: closed-form eigenpair matches the moment mirror") {
    val got = SparkEntry.queries("agg_pca2")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    li.groupBy(_._1).foreach { case (f, rows) =>
      val xs = rows.map(r => s0(r._3)); val ys = rows.map(r => s0(r._4))
      val n = rows.size.toLong
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(x => x * x).sum
      val syy = ys.map(y => y * y).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val nD = n.toDouble
      val a = (nD * sxx - sx.toDouble * sx) / (nD * (nD - 1.0))
      val b = (nD * sxy - sx.toDouble * sy) / (nD * (nD - 1.0))
      val c = (nD * syy - sy.toDouble * sy) / (nD * (nD - 1.0))
      val h = (a - c) / 2.0
      val disc = math.sqrt(h * h + b * b)
      val lam1 = (a + c) / 2.0 + disc
      val (gn, lam16, evr6, align6) = got(f)
      assert(gn == n, s"$f n")
      assert(lam16 == s6(lam1), s"$f lam1")
      assert(evr6 == s6(lam1 / (a + c)), s"$f evr")
      assert(align6 == s6(h / disc), s"$f align")
      // λ1 is the LARGER eigenvalue: explained ratio in [1/2, 1]
      assert(evr6 >= 500000 && evr6 <= 1000000, s"$f evr range")
    }
  }

  test("win_markov: transition rows match the per-user lag mirror; rows sum to 1") {
    val got = SparkEntry.queries("win_markov")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val pairs = events.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(e => (e._3, e._2)).map(_._5)
      ordered.zip(ordered.drop(1))
    }
    val counts = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val totals = counts.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    assert(got.keySet == counts.keySet, "pair domain")
    counts.foreach { case ((p, c), n) =>
      val (gn, gp6) = got((p, c))
      assert(gn == n, s"$p->$c count")
      assert(gp6 == s6(n.toDouble / totals(p)), s"$p->$c prob")
    }
    // each row of the transition matrix sums to ~1 on the s6 grid
    got.toSeq.groupBy(_._1._1).foreach { case (p, rows) =>
      val tot = rows.map(_._2._2).sum
      assert(math.abs(tot - 1000000L) <= rows.size, s"$p row sum")
    }
  }

  test("win_sma_cross: signals match the integer crossover mirror") {
    val got = SparkEntry.queries("win_sma_cross")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val expect = scala.collection.mutable.Map[(Long, Long), Int]()
    events.groupBy(_._1).foreach { case (u, rows) =>
      val daily = rows.groupBy(_._3 / 86400).toSeq
        .map { case (day, es) => (day, es.map(e => s2(e._4)).sum) }
        .sortBy(_._1)
      val sides = daily.indices.map { i =>
        val f3 = daily.slice(math.max(0, i - 2), i + 1).map(_._2).sum
        val s7win = daily.slice(math.max(0, i - 6), i + 1)
        val s7 = s7win.map(_._2).sum
        val side = if (7 * f3 > 3 * s7) 1 else if (7 * f3 < 3 * s7) -1 else 0
        (daily(i)._1, side, s7win.size)
      }
      sides.zip(sides.drop(1)).foreach { case ((_, ps, pn), (day, s, n)) =>
        if (n == 7 && pn == 7 && s != ps && s != 0) expect((u, day)) = s
      }
    }
    assert(got == expect.toMap, "signal set")
  }
}
