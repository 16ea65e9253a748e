package graft

import org.apache.spark.sql.functions._

/** Sixth-wave round-9 operators, each pinned against an independent Scala
  * mirror on the sf0.001 corpus (the oracle gate grades the same keys
  * against DuckDB at sf0.01; these mirrors assert the semantics with a
  * third implementation so the two engine sides can't share a bug). */
class Round9dOpsSpec extends SparkSpec {

  private def s6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
  private def s2(x: Double): Long = math.floor(x * 100 + 0.5).toLong
  private def s0(x: Double): Long = math.floor(x + 0.5).toLong

  /** (user_id, event_id, epoch_s, value, event_type, k). */
  private lazy val events: Seq[(Long, Long, Long, Double, String, Long)] =
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("t"),
        col("value"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4), r.getLong(5)))

  private lazy val docs: Seq[(Long, String, String)] =
    Tables.documents(spark, sfDir).select(col("doc_id"), col("text"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("win_bollinger: bands and breach match the frame-moment mirror") {
    val got = SparkEntry.queries("win_bollinger")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getInt(5))))).toMap
    events.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(e => (e._3, e._2))
      ordered.zipWithIndex.foreach { case (e, i) =>
        val frame = ordered.slice(math.max(0, i - 4), i + 1).map(x => s2(x._4))
        val n = frame.size.toLong
        val sv = frame.sum; val svv = frame.map(v => v * v).sum
        val num = n * svv - sv * sv
        val (vi, ub, lb, br) = got(e._2)
        assert(vi == s2(e._4), s"event ${e._2} vi")
        if (n < 2 || num <= 0) assert(ub.isEmpty && lb.isEmpty && br.isEmpty)
        else {
          val mc = sv.toDouble / n
          val sd = math.sqrt(num.toDouble / (n * (n - 1.0)))
          assert(ub.contains(s0(mc + 2 * sd)) && lb.contains(s0(mc - 2 * sd)),
            s"event ${e._2} bands")
          val expect = if (vi > ub.get) 1 else if (vi < lb.get) -1 else 0
          assert(br.contains(expect), s"event ${e._2} breach")
          // band sanity: the envelope brackets the mean
          assert(lb.get <= ub.get)
        }
      }
    }
  }

  test("win_rolling_corr: r matches the six-moment mirror and |r| <= 1") {
    val got = SparkEntry.queries("win_rolling_corr")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    events.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(e => (e._3, e._2))
      ordered.zipWithIndex.foreach { case (e, i) =>
        val frame = ordered.slice(math.max(0, i - 6), i + 1)
        val xs = frame.map(x => s2(x._4)); val ys = frame.map(_._6)
        val n = frame.size.toLong
        val sx = xs.sum; val sy = ys.sum
        val sxx = xs.map(v => v * v).sum; val syy = ys.map(v => v * v).sum
        val sxy = xs.zip(ys).map(p => p._1 * p._2).sum
        val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
        if (n < 2 || vx <= 0 || vy <= 0) assert(got(e._2).isEmpty, s"event ${e._2}")
        else {
          val r = (n * sxy - sx * sy).toDouble /
            (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble))
          assert(got(e._2).contains(s6(r)), s"event ${e._2} r")
          assert(math.abs(r) <= 1.0 + 1e-12)
        }
      }
    }
  }

  test("eo_composite_latest: newest clear observation per pixel group") {
    val got = SparkEntry.queries("eo_composite_latest")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val clear = events.filter(_._5 != "error").groupBy(_._1)
    assert(got.keySet == clear.keySet)
    clear.foreach { case (u, rows) =>
      val best = rows.maxBy(e => (e._3, e._2))
      assert(got(u) == ((best._2, best._3, s6(best._4))), s"pixel $u")
    }
  }

  test("eo_theilsen: doubled median of pairwise slopes; OLS-slope sanity") {
    val got = SparkEntry.queries("eo_theilsen")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    events.groupBy(_._1).foreach { case (u, rows) =>
      val obs = rows.map(e => (e._3 / 86400, s2(e._4)))
      val slopes = (for {
        a <- obs; b <- obs; if b._1 > a._1
      } yield s6((b._2 - a._2).toDouble / (b._1 - a._1).toDouble)).sorted
      if (slopes.isEmpty) assert(!got.contains(u), s"pixel $u should drop out")
      else {
        val m = slopes.size
        val med2 = if (m % 2 == 1) 2 * slopes(m / 2)
        else slopes(m / 2 - 1) + slopes(m / 2)
        assert(got(u) == ((m.toLong, med2)), s"pixel $u")
      }
    }
  }

  test("agg_spearman: rho matches a rank-then-Pearson mirror, |rho| <= 1") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val got = SparkEntry.queries("agg_spearman")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    li.groupBy(_._1).foreach { case (f, rows) =>
      def ranks2(xs: Seq[Double]): Seq[Long] = {
        val sorted = xs.sorted.zipWithIndex // rank positions 0-based
        val first = sorted.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
        val cnt = xs.groupBy(identity).view.mapValues(_.size).toMap
        // doubled average rank = (first+1) + (first+cnt) = 2*first + cnt + 1
        xs.map(x => (2 * first(x) + cnt(x) + 1).toLong)
      }
      val rx = ranks2(rows.map(_._2)); val ry = ranks2(rows.map(_._3))
      val n = rows.size.toLong
      val sx = rx.sum; val sy = ry.sum
      val sxx = rx.map(v => v * v).sum; val syy = ry.map(v => v * v).sum
      val sxy = rx.zip(ry).map(p => p._1 * p._2).sum
      val nD = n.toDouble
      val vx = nD * sxx - sx.toDouble * sx.toDouble
      val vy = nD * syy - sy.toDouble * sy.toDouble
      assert(got(f)._1 == n, s"flag $f n")
      if (n < 2 || vx <= 0 || vy <= 0) assert(got(f)._2.isEmpty)
      else {
        val rho = (nD * sxy - sx.toDouble * sy.toDouble) /
          (math.sqrt(vx) * math.sqrt(vy))
        assert(got(f)._2.contains(s6(rho)), s"flag $f rho")
        assert(math.abs(rho) <= 1.0 + 1e-12)
      }
    }
  }

  test("agg_theil: index matches the term mirror and is nonnegative") {
    val ords = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val got = SparkEntry.queries("agg_theil")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    ords.groupBy(_._1).foreach { case (pri, rows) =>
      val xc = rows.map(r => s2(r._2))
      val n = xc.size.toLong
      val mu = xc.sum.toDouble / n
      val sc = xc.sum
      val terms = xc.map { x =>
        val ratio = x / mu
        s6(ratio * (Det.lnIntD(x) + Det.lnIntD(n) - Det.lnIntD(sc)))
      }
      val theil6 = math.floor(terms.sum.toDouble / n + 0.5).toLong
      assert(got(pri) == ((n, theil6)), s"priority $pri")
      // Theil index is >= 0 up to per-term grid rounding (n terms, half
      // a grid cell each)
      assert(got(pri)._2 >= -(n + 1) / 2, s"priority $pri negative beyond grid")
    }
  }

  test("graph_reciprocity: mutual-edge shares match a set mirror") {
    val got = SparkEntry.queries("graph_reciprocity")(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // independent edge build straight from the tables
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ordCust = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val custNat = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val suppNat = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val edges = li.map { case (ok, sk) =>
      (custNat(ordCust(ok)), suppNat(sk))
    }.filter(e => e._1 != e._2).toSet
    val bySrc = edges.groupBy(_._1)
    assert(got.keySet == bySrc.keySet)
    bySrc.foreach { case (src, es) =>
      val mutual = es.count(e => edges.contains((e._2, e._1))).toLong
      val n = es.size.toLong
      assert(got(src) == ((n, mutual, s6(mutual.toDouble / n))), s"src $src")
    }
  }

  test("llm_dup_ngram_fraction: corpus-shared 8-gram share per doc") {
    val got = SparkEntry.queries("llm_dup_ngram_fraction")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val perDoc = docs.map { case (id, text, _) =>
      id -> text.split(" ").sliding(8).filter(_.size == 8)
        .map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty).toMap
    val dfm = perDoc.toSeq.flatMap { case (id, ngs) => ngs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    assert(got.keySet == perDoc.keySet)
    perDoc.foreach { case (id, ngs) =>
      val nd = ngs.count(ng => dfm(ng) >= 2).toLong
      val n = ngs.size.toLong
      assert(got(id) == ((n, nd, s6(nd.toDouble / n))), s"doc $id")
    }
  }

  test("llm_dsir: weights match the hashed-bucket mirror; en scores higher") {
    val got = SparkEntry.queries("llm_dsir")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // portable hash32 mirror via the Spark expression itself (the spec
    // pins the SCORING math, not the hash; SketchSpec pins the hash)
    val tokBuckets = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("t"))
      .select(col("doc_id"), col("lang"), (Det.hash32(col("t")) % 1024).as("b"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ct = tokBuckets.filter(_._2 == "en").groupBy(_._3).view
      .mapValues(_.size.toLong).toMap.withDefaultValue(0L)
    val cr = tokBuckets.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nt = tokBuckets.count(_._2 == "en").toDouble
    val nr = tokBuckets.size.toDouble
    val byDoc = tokBuckets.groupBy(_._1)
    assert(got.keySet == byDoc.keySet)
    val avgByLang = docs.map { case (id, _, lang) =>
      val rows = byDoc(id)
      val w = rows.map { r =>
        s6(Det.lnIntD(ct(r._3).toLong + 1) - Det.lnIntD(nt.toLong + 1024) -
          Det.lnIntD(cr(r._3).toLong + 1) + Det.lnIntD(nr.toLong + 1024))
      }.sum
      assert(got(id) == ((rows.size.toLong, w)), s"doc $id")
      (lang, w.toDouble / rows.size)
    }.groupBy(_._1).view.mapValues(vs => vs.map(_._2).sum / vs.size).toMap
    // the selector must rank the target language above every other slice
    avgByLang.filter(_._1 != "en").foreach { case (lang, avg) =>
      assert(avgByLang("en") > avg, s"en should outscore $lang")
    }
  }

  test("eo_mk_trend: S, tie variance and Z match the pair mirror") {
    val got = SparkEntry.queries("eo_mk_trend")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    events.groupBy(_._1).foreach { case (u, rows) =>
      // daily collapse: earliest by (t, event_id)
      val daily = rows.groupBy(_._3 / 86400).toSeq
        .map { case (x, es) => (x, s2(es.minBy(e => (e._3, e._2))._4)) }
        .sortBy(_._1)
      val n = daily.size.toLong
      val sStat = (for {
        (a, i) <- daily.zipWithIndex; b <- daily.drop(i + 1)
      } yield java.lang.Long.signum(b._2 - a._2).toLong).sum
      val tieAdj = daily.groupBy(_._2).values
        .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
      val var18 = n * (n - 1) * (2 * n + 5) - tieAdj
      assert(got(u)._1 == n && got(u)._2 == sStat, s"pixel $u moments")
      if (var18 <= 0) assert(got(u)._3.isEmpty, s"pixel $u degenerate")
      else {
        val sd = math.sqrt(var18.toDouble / 18.0)
        val z = if (sStat > 0) s6((sStat - 1) / sd)
        else if (sStat < 0) s6((sStat + 1) / sd) else 0L
        assert(got(u)._3.contains(z), s"pixel $u z")
      }
    }
  }

  test("agg_winsorized_mean: clamped mean between min and raw mean bounds") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val got = SparkEntry.queries("agg_winsorized_mean")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    li.groupBy(_._1).foreach { case (f, rows) =>
      val xs = rows.map(r => s2(r._2)).sorted
      val n = xs.size.toLong
      val lo = xs((math.max(1, n * 5 / 100) - 1).toInt)
      val hi = xs((math.max(1, n * 95 / 100) - 1).toInt)
      val clamped = xs.map(x => math.min(math.max(x, lo), hi))
      val wm = math.floor(clamped.sum.toDouble * 1e4 / n + 0.5).toLong
      assert(got(f) == ((n, lo, hi, wm)), s"flag $f")
      // robustness: the winsorized mean is within the clamp bounds
      assert(got(f)._4 >= lo * 10000 - 1 && got(f)._4 <= hi * 10000 + 1)
    }
  }

  test("graph_hits: converges toward the dominant eigen-direction; " +
    "scores sum to the grid and top authority has in-links") {
    val rows = SparkEntry.queries("graph_hits")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 25)
    // sum-normalized grid: each score vector sums to ~1e9 (per-node
    // rounding moves the total by at most half a cell per node)
    assert(math.abs(rows.map(_._2).sum - 1000000000L) <= 25)
    assert(math.abs(rows.map(_._3).sum - 1000000000L) <= 25)
    assert(rows.forall(r => r._2 >= 0 && r._3 >= 0))
    // a node with zero in-edges must have zero authority
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ordCust = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val custNat = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val suppNat = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val dsts = li.map { case (ok, sk) => suppNat(sk) }.toSet
    val srcs = li.map { case (ok, sk) => custNat(ordCust(ok)) }.toSet
    rows.foreach { case (v, auth, hub) =>
      if (!dsts.contains(v)) assert(auth == 0L, s"node $v authority")
      if (!srcs.contains(v)) assert(hub == 0L, s"node $v hub")
    }
  }

  test("llm_ccnet_bucket: terciles split each language by the LM score") {
    val rows = SparkEntry.queries("llm_ccnet_bucket")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val n = rs.size
      // bucket sizes follow the (rn-1)*3 div n law
      val expected = (1 to n).groupBy(rn => (rn - 1) * 3 / n).view
        .mapValues(_.size).toMap
      val gotSizes = rs.groupBy(_._4).map {
        case ("head", g) => 0 -> g.size
        case ("middle", g) => 1 -> g.size
        case ("tail", g) => 2 -> g.size
      }
      assert(gotSizes == expected.filter(_._2 > 0), s"lang $lang sizes")
      // ordering: every head score <= every tail score
      val headMax = rs.filter(_._4 == "head").map(_._3).max
      val tailMin = rs.filter(_._4 == "tail").map(_._3).min
      assert(headMax <= tailMin, s"lang $lang head/tail order")
    }
  }

  test("join_fuzzy: matched pairs are exactly the dist<=2 dictionary pairs") {
    val got = SparkEntry.queries("join_fuzzy")(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getInt(2), r.getLong(3),
        r.getLong(4)))).toMap
    val names = Tables.part(spark, sfDir).select("p_name").collect()
      .map(_.getString(0))
    val dict = names.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      a <- dict.keys; b <- dict.keys
      if a < b && lev(a, b) <= 2
    } yield ((a, b), (lev(a, b), dict(a), dict(b)))).toMap
    assert(got == expected)
    // the length band never excluded a true match (lev >= |len diff|)
    expected.keys.foreach { case (a, b) =>
      assert(math.abs(a.length - b.length) <= 2)
    }
  }

  test("eo_tile_sieve: rollup equals the clump table filtered at 3 px") {
    val clumps = SparkEntry.queries("eo_tile_clump")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = SparkEntry.queries("eo_tile_sieve")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    val byTile = clumps.groupBy(_._1)
    assert(got.keySet == byTile.keySet)
    byTile.foreach { case (tile, cs) =>
      val kept = cs.filter(_._3 >= 3)
      val removed = cs.filter(_._3 < 3)
      assert(got(tile) == ((kept.size.toLong, kept.map(_._3).sum,
        removed.map(_._3).sum, kept.map(_._4).sum)), s"tile $tile")
    }
  }

  test("win_forecast_snaive: MAE/bias match the day-7 ancestor mirror") {
    val got = SparkEntry.queries("win_forecast_snaive")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    events.groupBy(_._1).foreach { case (u, rows) =>
      val daily = rows.groupBy(_._3 / 86400).toSeq
        .map { case (x, es) => (x, s2(es.minBy(e => (e._3, e._2))._4)) }.toMap
      val n = daily.size.toLong
      val fc = daily.toSeq.flatMap { case (x, y) =>
        daily.get(x - 7).map(yhat => (y, yhat))
      }
      val nFc = fc.size.toLong
      val bias = fc.map(p => p._1 - p._2).sum
      assert(got(u)._1 == n && got(u)._2 == nFc && got(u)._3 == bias, s"user $u")
      if (nFc == 0) assert(got(u)._4.isEmpty)
      else {
        val mae = math.floor(
          fc.map(p => math.abs(p._1 - p._2)).sum.toDouble * 1e4 / nFc + 0.5).toLong
        assert(got(u)._4.contains(mae), s"user $u mae")
      }
    }
  }

  test("agg_ols_multi: coefficients solve the normal equations") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_discount"),
        col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    val got = SparkEntry.queries("agg_ols_multi")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    li.groupBy(_._1).foreach { case (f, rows) =>
      val x1 = rows.map(r => math.floor(r._2 + 0.5).toLong)
      val x2 = rows.map(r => math.floor(r._3 * 1e4 + 0.5).toLong)
      val y = rows.map(r => s2(r._4))
      val n = rows.size.toLong
      // independent solve: Gaussian elimination over the Gram system
      val a = Array(
        Array(n.toDouble, x1.sum.toDouble, x2.sum.toDouble, y.sum.toDouble),
        Array(x1.sum.toDouble, x1.map(v => v * v).sum.toDouble,
          x1.zip(x2).map(p => p._1 * p._2).sum.toDouble,
          x1.zip(y).map(p => p._1 * p._2).sum.toDouble),
        Array(x2.sum.toDouble, x1.zip(x2).map(p => p._1 * p._2).sum.toDouble,
          x2.map(v => v * v).sum.toDouble,
          x2.zip(y).map(p => p._1 * p._2).sum.toDouble))
      for (i <- 0 until 3; j <- 0 until 3 if j != i) {
        val fct = a(j)(i) / a(i)(i)
        for (k <- 0 to 3) a(j)(k) -= fct * a(i)(k)
      }
      val b1 = a(1)(3) / a(1)(1); val b2 = a(2)(3) / a(2)(2)
      assert(got(f)._1 == n)
      // elimination vs Cramer agree within a grid cell
      got(f)._2.foreach(v => assert(math.abs(v - s6(b1)) <= 1, s"flag $f b1"))
      got(f)._3.foreach(v => assert(math.abs(v - s6(b2)) <= 1, s"flag $f b2"))
      assert(got(f)._2.nonEmpty && got(f)._3.nonEmpty, s"flag $f degenerate")
    }
  }

  test("eo_harmonic: amplitude recovers a synthetic seasonal signal") {
    // residual check on the real corpus: the fitted (a, B, Γ) from the
    // key must satisfy the first normal equation Σ(y − a − B·cos −
    // Γ·sin) ≈ 0 is NOT directly recoverable from (mean, amp); instead
    // pin the key's output against an independent least-squares solve.
    val got = SparkEntry.queries("eo_harmonic")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    events.groupBy(_._1).foreach { case (u, rows) =>
      val q = rows.map { e =>
        val yday = (e._3 / 86400) % 365
        val ang = 2.0 * math.Pi * yday / 365.0
        (s2(e._4), s6(math.cos(ang)), s6(math.sin(ang)))
      }
      val n = q.size.toLong
      val (sy, sc, ss) = (q.map(_._1).sum, q.map(_._2).sum, q.map(_._3).sum)
      val scc = q.map(v => v._2 * v._2).sum; val scs = q.map(v => v._2 * v._3).sum
      val sss = q.map(v => v._3 * v._3).sum
      val syc = q.map(v => v._1 * v._2).sum; val sys = q.map(v => v._1 * v._3).sum
      val nD = n.toDouble
      val det = nD * (scc.toDouble * sss - scs.toDouble * scs) -
        sc.toDouble * (sc.toDouble * sss - scs.toDouble * ss) +
        ss.toDouble * (sc.toDouble * scs - scc.toDouble * ss)
      assert(got(u)._1 == n)
      if (det <= 0) assert(got(u)._2.isEmpty && got(u)._3.isEmpty)
      else {
        val det0 = sy.toDouble * (scc.toDouble * sss - scs.toDouble * scs) -
          syc.toDouble * (sc.toDouble * sss - ss.toDouble * scs) +
          sys.toDouble * (sc.toDouble * scs - ss.toDouble * scc)
        val det1 = nD * (syc.toDouble * sss - scs.toDouble * sys) -
          sc.toDouble * (sy.toDouble * sss - ss.toDouble * sys) +
          ss.toDouble * (sy.toDouble * scs - ss.toDouble * syc)
        val det2 = nD * (scc.toDouble * sys - syc.toDouble * scs) -
          sc.toDouble * (sc.toDouble * sys - sy.toDouble * scs) +
          ss.toDouble * (sc.toDouble * syc - sy.toDouble * scc)
        val bb = det1 / det * 1e6; val gg = det2 / det * 1e6
        assert(got(u)._2.contains(s0(det0 / det)), s"pixel $u mean")
        assert(got(u)._3.contains(s0(math.sqrt(bb * bb + gg * gg))), s"pixel $u amp")
        assert(got(u)._3.get >= 0)
      }
    }
  }

  test("eo_harmonic: exact recovery on a constructed pure-harmonic series") {
    // a planted signal y = 500 + 300·cos(ωd) must come back with
    // amplitude ≈ 300·100 cents and mean ≈ 500·100 — the regression
    // identifies the planted coefficients through the quantized-trig
    // moments (sanity that the solver solves the right system).
    import spark.implicits._
    val days = (0 until 365 by 5)
    val rows = days.map { d =>
      val y = 500.0 + 300.0 * math.cos(2.0 * math.Pi * (d % 365) / 365.0)
      (1L, d.toLong * 86400, y)
    }
    val df = rows.toDF("user_id", "epoch", "value")
      .select(col("user_id"), col("epoch"), col("value"))
    val q = df.select(col("user_id"),
      ((col("epoch") / 86400).cast("long") % 365).as("yday"), col("value"))
    val withTrig = q.select(col("user_id"), col("value"),
      Det.s6(cos(lit(2.0) * lit(math.Pi) * col("yday").cast("double") / lit(365.0))).as("c6"),
      Det.s6(sin(lit(2.0) * lit(math.Pi) * col("yday").cast("double") / lit(365.0))).as("s6v"),
      Det.s2(col("value")).as("y"))
    val r = withTrig.agg(count(lit(1)).as("n"), sum("c6").as("sc"), sum("s6v").as("ss"),
      sum("y").as("sy"), sum(col("c6") * col("c6")).as("scc"),
      sum(col("c6") * col("s6v")).as("scs"), sum(col("s6v") * col("s6v")).as("sss"),
      sum(col("y") * col("c6")).as("syc"), sum(col("y") * col("s6v")).as("sys"))
      .collect()(0)
    val (n, sc, ss, sy) = (r.getLong(0).toDouble, r.getLong(1).toDouble,
      r.getLong(2).toDouble, r.getLong(3).toDouble)
    val (scc, scs, sss, syc, sys) = (r.getLong(4).toDouble, r.getLong(5).toDouble,
      r.getLong(6).toDouble, r.getLong(7).toDouble, r.getLong(8).toDouble)
    val det = n * (scc * sss - scs * scs) - sc * (sc * sss - scs * ss) +
      ss * (sc * scs - scc * ss)
    val det1 = n * (syc * sss - scs * sys) - sc * (sy * sss - ss * sys) +
      ss * (sy * scs - ss * syc)
    val det2 = n * (scc * sys - syc * scs) - sc * (sc * sys - sy * scs) +
      ss * (sc * syc - sy * scc)
    val amp = math.sqrt(math.pow(det1 / det * 1e6, 2) + math.pow(det2 / det * 1e6, 2))
    assert(math.abs(amp - 30000.0) < 50.0, s"planted amplitude, got $amp")
  }

  test("win_peak_detect: peaks match the strict-neighbor mirror") {
    val got = SparkEntry.queries("win_peak_detect")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    events.groupBy(_._1).foreach { case (u, rows) =>
      val xs = rows.sortBy(e => (e._3, e._2)).map(e => (e._2, s2(e._4)))
      val peaks = xs.sliding(3).filter(_.size == 3).collect {
        case Seq((_, pv), (id, vi), (_, nv))
          if vi > pv && vi > nv && vi - math.max(pv, nv) >= 50 => (id, vi)
      }.toSeq
      val expected = (peaks.size.toLong, peaks.map(_._1).sum,
        if (peaks.isEmpty) None else Some(peaks.map(_._2).max))
      assert(got(u) == expected, s"user $u")
    }
  }

  test("eo_tile_distance: the K=8 relaxation equals true multi-source BFS") {
    val got = SparkEntry.queries("eo_tile_distance")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    // independent fixpoint BFS per full tile from the same construction
    val px = Tables.events(spark, sfDir)
      .selectExpr("(event_id div 4) div 256 AS tile",
        "((event_id div 4) % 256) div 16 AS py",
        "((event_id div 4) % 256) % 16 AS px",
        "event_id div 4 AS pid", "event_id % 4 AS t", "user_id % 2 AS m")
      .where(col("t") === 0).collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt, r.getLong(5)))
    val full = px.groupBy(_._1).filter(_._2.length == 256)
    if (full.isEmpty) assert(got.isEmpty)
    full.foreach { case (tile, ps) =>
      val mask = ps.filter(_._4 == 1).map(p => (p._2, p._3)).toSet
      val dist = scala.collection.mutable.Map[(Int, Int), Int]()
      var frontier = mask
      mask.foreach(p => dist(p) = 0)
      var d = 0
      while (frontier.nonEmpty) {
        d += 1
        frontier = frontier.flatMap { case (y, x) =>
          Seq((y + 1, x), (y - 1, x), (y, x + 1), (y, x - 1))
        }.filter { case (y, x) =>
          y >= 0 && y < 16 && x >= 0 && x < 16 && !dist.contains((y, x))
        }
        frontier.foreach(p => dist(p) = d)
      }
      val hist = ps.map { p =>
        val bfsD = dist.getOrElse((p._2, p._3), 999)
        (if (bfsD > 8) 999L else bfsD.toLong, p._2 * 16 + p._3 + 1)
      }.groupBy(_._1).view
        .mapValues(g => (g.length.toLong, g.map(_._2.toLong).sum)).toMap
      hist.foreach { case (dd, exp) =>
        assert(got((tile, dd)) == exp, s"tile $tile dist $dd")
      }
      assert(got.keys.count(_._1 == tile) == hist.size, s"tile $tile rows")
    }
  }

  test("llm_dedup_weight: cluster mass sums to one document") {
    val got = SparkEntry.queries("llm_dedup_weight")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byText = docs.groupBy(_._2)
    assert(got.length == docs.length)
    val cnt = byText.view.mapValues(_.size.toLong).toMap
    val textOf = docs.map(d => d._1 -> d._2).toMap
    got.foreach { case (id, dc, w6) =>
      val c = cnt(textOf(id))
      assert(dc == c && w6 == s6(1.0 / c), s"doc $id")
    }
    // per-cluster weight mass = 1e6 within per-member rounding
    byText.values.foreach { g =>
      val ids = g.map(_._1).toSet
      val mass = got.filter(r => ids(r._1)).map(_._3).sum
      assert(math.abs(mass - 1000000L) <= g.size, s"cluster mass $mass")
    }
  }

  test("stream_disorder: out-of-order shares match the running-max mirror") {
    val got = SparkEntry.queries("stream_disorder")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    events.groupBy(_._5).foreach { case (et, rows) =>
      val arr = rows.sortBy(_._2) // event_id = arrival order
      var hwm = Long.MinValue
      var nOoo = 0L; var maxLate = 0L
      arr.foreach { e =>
        if (hwm != Long.MinValue && e._3 < hwm) {
          nOoo += 1; maxLate = math.max(maxLate, hwm - e._3)
        }
        hwm = math.max(hwm, e._3)
      }
      val n = arr.size.toLong
      assert(got(et) == ((n, nOoo, s6(nOoo.toDouble / n), maxLate)), s"type $et")
    }
    // calibration link: the graded watermark (3600 s in stream_late)
    // must dominate every stream's observed max lateness OR the
    // disorder metric is telling the user to widen it — either way the
    // metric is the decision input; here just pin nonnegativity
    assert(got.values.forall(v => v._4 >= 0 && v._2 <= v._1))
  }

  test("join_spatial_knn: top-3 scene centers match brute force") {
    val got = SparkEntry.queries("join_spatial_knn")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5)))).toMap
    val centers = events.groupBy(e => ((e._1 % 8).toInt, (e._1 % 5).toInt))
      .view.mapValues(_.size.toLong).toMap
    val aois = Tables.nation(spark, sfDir).select("n_nationkey").collect()
      .map(_.getInt(0))
    aois.foreach { a =>
      val (px, py) = (a % 11, a % 7)
      val ranked = centers.toSeq.map { case ((x, y), n) =>
        (((x - px).toLong * (x - px) + (y - py).toLong * (y - py)), x, y, n)
      }.sortBy(t => (t._1, t._2, t._3)).take(3)
      ranked.zipWithIndex.foreach { case ((d2, x, y, n), i) =>
        assert(got((a, i + 1)) == ((x, y, d2, n)), s"aoi $a rank ${i + 1}")
      }
    }
    assert(got.size == aois.length * 3)
  }

  test("win_rfm: scores match the NTILE law per metric") {
    val got = SparkEntry.queries("win_rfm")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))).toMap
    val ords = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), expr("unix_timestamp(o_orderdate) div 86400"),
        Det.s2(col("o_totalprice")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val m = ords.groupBy(_._1).map { case (ck, rows) =>
      (ck, rows.map(_._2).max, rows.size.toLong, rows.map(_._3).sum)
    }.toSeq
    def ntile5(sorted: Seq[Long]): Map[Long, Int] = {
      val n = sorted.size
      val q = n / 5; val r = n % 5; val cut = r * (q + 1)
      sorted.zipWithIndex.map { case (ck, i) =>
        val rn = i + 1
        ck -> (if (rn <= cut) (rn - 1) / (q + 1) + 1
        else r + (rn - 1 - cut) / math.max(q, 1) + 1)
      }.toMap
    }
    val rS = ntile5(m.sortBy(x => (x._2, x._1)).map(_._1))
    val fS = ntile5(m.sortBy(x => (x._3, x._1)).map(_._1))
    val mS = ntile5(m.sortBy(x => (x._4, x._1)).map(_._1))
    assert(got.keySet == m.map(_._1).toSet)
    m.foreach { case (ck, rec, fr, mon) =>
      assert(got(ck) == ((rec, fr, mon, rS(ck) * 100 + fS(ck) * 10 + mS(ck))),
        s"cust $ck")
    }
  }

  test("agg_ab_lift: the z statistic matches the pooled-proportion mirror") {
    val r = SparkEntry.queries("agg_ab_lift")(spark, sfDir).collect()(0)
    val perUser = events.groupBy(_._1).toSeq.map { case (u, rows) =>
      (u % 2, if (rows.exists(_._5 == "purchase")) 1L else 0L)
    }
    val n0 = perUser.count(_._1 == 0).toLong; val n1 = perUser.count(_._1 == 1).toLong
    val c0 = perUser.filter(_._1 == 0).map(_._2).sum
    val c1 = perUser.filter(_._1 == 1).map(_._2).sum
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((n0, n1, c0, c1)))
    val p0 = c0.toDouble / n0; val p1 = c1.toDouble / n1
    val pp = (c0 + c1).toDouble / (n0 + n1)
    if (c0 == 0) assert(r.isNullAt(4))
    else assert(r.getLong(4) == s6(p1 / p0 - 1.0))
    if (pp <= 0.0 || pp >= 1.0) assert(r.isNullAt(5))
    else {
      val z = (p1 - p0) /
        math.sqrt(pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1))
      assert(r.getLong(5) == s6(z))
    }
  }

  test("eo_texture_entropy: histogram entropy within [0, ln 16]") {
    val got = SparkEntry.queries("eo_texture_entropy")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // mirror from the tile construction
    val px = Tables.events(spark, sfDir)
      .selectExpr("(event_id div 4) div 256 AS tile", "event_id % 4 AS t",
        "user_id AS v")
      .where(col("t") === 0).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val full = px.groupBy(_._1).filter(_._2.length == 256)
    assert(got.map(_._1).toSet == full.keySet)
    got.foreach { case (tile, nBins, e6) =>
      val hist = full(tile).map(p => math.min(p._2 / 32, 15L))
        .groupBy(identity).view.mapValues(_.size).toMap
      val expected = hist.values.map { c =>
        val p = c / 256.0; s6(-p * Det.lnRatioD(c.toLong, 256L))
      }.sum
      assert(nBins == hist.size.toLong && e6 == expected, s"tile $tile")
      assert(e6 >= 0 && e6 <= s6(math.log(16.0)) + hist.size, s"tile $tile range")
    }
  }

  test("fn_haversine: distances match the scalar mirror and the metric axioms") {
    val got = SparkEntry.queries("fn_haversine")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val keys = Tables.nation(spark, sfDir).select("n_nationkey").collect()
      .map(_.getInt(0))
    val rad = math.Pi / 180.0
    def pos(k: Int) = ((k % 90 - 45) * rad, ((k * 7) % 360 - 180) * rad)
    def hav(a: Int, b: Int): Long = {
      val (la1, lo1) = pos(a); val (la2, lo2) = pos(b)
      val h = math.pow(math.sin((la2 - la1) / 2), 2) +
        math.cos(la1) * math.cos(la2) * math.pow(math.sin((lo2 - lo1) / 2), 2)
      math.floor(2.0 * 6371000.0 * math.asin(math.sqrt(h)) + 0.5).toLong
    }
    assert(got.size == keys.length * (keys.length - 1) / 2)
    for (a <- keys; b <- keys if a < b) {
      // pow-vs-multiply mirror differs by ulps; the integer-meter grid
      // absorbs far more than that
      assert(math.abs(got((a, b)) - hav(a, b)) <= 1, s"pair ($a,$b)")
      assert(got((a, b)) >= 0 && got((a, b)) <= 20015087L + 1, s"pair ($a,$b) range")
    }
    // triangle inequality on a sample of triples (great-circle metric)
    for (a <- keys.take(5); b <- keys.slice(5, 10); c <- keys.slice(10, 15)) {
      def d(x: Int, y: Int) =
        if (x == y) 0L else got.getOrElse((math.min(x, y), math.max(x, y)), 0L)
      assert(d(a, c) <= d(a, b) + d(b, c) + 2, s"triangle ($a,$b,$c)")
    }
  }

  test("dq_freshness: per-type lags against a scalar mirror") {
    val got = SparkEntry.queries("dq_freshness")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))).toMap
    val byType = events.groupBy(_._5)
    val gmax = events.map(_._3).max
    assert(got.keySet == byType.keySet)
    byType.foreach { case (et, rows) =>
      val mt = rows.map(_._3).max
      assert(got(et) == ((rows.size.toLong, mt, gmax - mt,
        if (gmax - mt > 86400) 1 else 0)), s"type $et")
    }
    // at least one type is the global max (lag 0)
    assert(got.values.exists(_._3 == 0L))
  }
}
