package graft

/** Independent scalar mirrors for round-12 keys (the Round*OpsSpec
  * discipline: plain driver-side Scala over collected parquet, never the
  * oracle's arithmetic path).
  */
class Round12OpsSpec extends SparkSpec {

  test("eo_unmix3 equals a scalar barycentric solve with clamp; both lanes fire") {
    val rows = Tables.events(spark, sfDir)
      .select("event_id", "value", "user_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def s6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val expect = rows.map { case (id, v, uid) =>
      val b1 = v; val b2 = (uid % 512).toDouble
      val f1 = ((b1 - 170.0) * -525.0 - 160.0 * (b2 - 520.0)) / 168000.0
      val f2 = (-160.0 * (b2 - 520.0) + (b1 - 170.0) * 525.0) / 168000.0
      val f3 = 1.0 - f1 - f2
      val inside = if (f1 >= 0 && f2 >= 0 && f3 >= 0) 1L else 0L
      val (c1, c2, c3) = (math.max(f1, 0), math.max(f2, 0), math.max(f3, 0))
      val s = c1 + c2 + c3
      (id, inside, s6d(c1 / s), s6d(c2 / s), s6d(c3 / s))
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("eo_unmix3")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect)
    // both the inside-triangle and clamped lanes must be exercised
    assert(got.exists(_._2 == 1L) && got.exists(_._2 == 0L), "both lanes")
    // clamped fractions renormalize: s6 components sum to 1e6 ± rounding
    got.foreach { case (id, _, a, b, c) =>
      assert(math.abs(a + b + c - 1000000L) <= 2, s"event $id sum-to-one")
    }
  }

  test("llm_substr_dedup equals a scalar anchor+extend span mirror") {
    val L = 5
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val grams = docs.flatMap { case (id, tk) =>
      (0 to tk.length - L).map(i0 => (id, i0 + 1L, tk.slice(i0, i0 + L).mkString(" ")))
    }
    val dup = grams.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.size >= 2).keySet
    val expect = grams.filter(g => dup(g._3))
      .groupBy(_._1).toSeq.map { case (id, as) =>
        val is = as.map(_._2).sorted
        // gaps-and-islands: i - rank is constant within a run
        val spans = is.zipWithIndex.groupBy { case (i, r) => i - r }
          .values.map(run => (run.length.toLong + L - 1, run.map(_._1).min))
          .toSeq
        (id, spans.size.toLong, spans.map(_._1).sum, spans.map(_._1).max,
          spans.map(_._2).min)
      }.sortBy(_._1)
    val got = SparkEntry.queries("llm_substr_dedup")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got.nonEmpty && got == expect, s"got ${got.take(3)}…\nexpect ${expect.take(3)}…")
    // a span is at least L tokens and never longer than the doc
    val lens = docs.toMap
    got.foreach { case (id, n, tot, mx, _) =>
      assert(mx >= L && tot >= n * L && mx <= lens(id).length.toLong)
    }
  }

  test("eo_polygonize equals a scalar flood-fill + corner-count mirror") {
    // sf0.001 has no complete tiles — drive at sf0.01 like eo_tile_clump
    val dir01 = "/root/testdata/sf0.01"
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, dir01).select("event_id", "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val px = ev.filter(e => e._1 % 4 == 0)
      .map { case (eid, uid) =>
        val pid = eid / 4
        (pid / 256, ((pid % 256) / 16).toInt, (pid % 16).toInt, pid, uid % 2)
      }
    val fullTiles = px.groupBy(_._1).filter(_._2.length == 256).keySet
    val mask = px.filter(p => fullTiles(p._1) && p._5 == 1)
      .map(p => (p._1, p._2, p._3, p._4))
    // scalar 4-adjacency CC per tile, min-pid label (union-find)
    val parent = collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val byCell = mask.map(p => (p._1, p._2, p._3) -> p._4).toMap
    mask.foreach { case (t, py, pxx, pid) =>
      byCell.get((t, py, pxx + 1)).foreach(union(pid, _))
      byCell.get((t, py + 1, pxx)).foreach(union(pid, _))
    }
    val labeled = mask.map { case (t, py, pxx, pid) => (t, find(pid), py, pxx) }
    val expect = labeled.groupBy(p => (p._1, p._2)).toSeq.map {
      case ((t, cl), cells) =>
        val cellSet = cells.map(c => (c._3, c._4)).toSet
        val area = cells.length.toLong
        val nAdj = cellSet.toSeq.map { case (y, x) =>
          (if (cellSet((y, x + 1))) 1 else 0) + (if (cellSet((y + 1, x))) 1 else 0)
        }.sum.toLong
        // corner counting over the 17x17 lattice
        var nv = 0L; var ck = 0L
        for (cy <- 0 to 16; cx <- 0 to 16) {
          val around = Seq((cy - 1, cx - 1, 3), (cy - 1, cx, 2),
            (cy, cx - 1, 1), (cy, cx, 0))
            .filter { case (y, x, _) => cellSet((y, x)) }
          val k = around.size
          val sq = around.map(_._3).sum
          val v = if (k == 1 || k == 3) 1L
            else if (k == 2 && sq == 3) 2L else 0L
          nv += v; ck += v * (cy * 17 + cx + 1)
        }
        (t, cl, area, 4 * area - 2 * nAdj, nv, ck)
    }.sortBy(p => (p._1, p._2))
    val got = SparkEntry.queries("eo_polygonize")(spark, dir01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got.nonEmpty && got == expect, s"got ${got.take(3)}…\nexpect ${expect.take(3)}…")
    // rectilinear-polygon invariants: even vertex count >= 4, even
    // perimeter >= 4, and singleton regions are exactly unit squares
    got.foreach { case (t, cl, area, per, nv, _) =>
      assert(nv % 2 == 0 && nv >= 4, s"($t,$cl) vertex parity")
      assert(per % 2 == 0 && per >= 4, s"($t,$cl) perimeter")
      if (area == 1) assert(per == 4 && nv == 4, s"($t,$cl) unit square")
    }
  }

  test("llm_ann_ivfpq beats IVF-alone recall at lower scan-byte cost") {
    val rows = Tables.embeddings(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val q = rows.find(_._1 == 0L).get._2
    def fdot(a: Array[Double], b: Array[Double]): Long =
      a.zip(b).map { case (x, y) => math.floor(x * y * 1e14 + 0.5).toLong }.sum
    val nq = math.sqrt(fdot(q, q).toDouble / 1e14)
    val exact = rows.filter(_._1 != 0L).map { case (id, v) =>
      val c = (fdot(v, q).toDouble / 1e14) /
        (math.sqrt(fdot(v, v).toDouble / 1e14) * nq)
      (id, c)
    }.sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet
    val got = SparkEntry.queries("llm_ann_ivfpq")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.length == 10, "full reranked top-10")
    // the rerank orders by exact cosine: s6 values non-increasing
    got.sliding(2).foreach { case Array((_, a), (_, b)) => assert(a >= b) }
    val hitsIvfpq = got.map(_._1).count(exact)
    // IVF-alone at 2 probes: the graded llm_ann_recall_eval number
    val evalRow = SparkEntry.queries("llm_ann_recall_eval")(spark, sfDir)
      .collect().head
    val hitsIvf = evalRow.getLong(evalRow.fieldIndex("hits_ivf10"))
    assert(hitsIvfpq >= hitsIvf,
      s"ivfpq $hitsIvfpq < ivf-alone $hitsIvf — the 4-probe PQ rung must not lose")
    assert(hitsIvfpq >= 4L, s"measured 5/10 at both SFs; got $hitsIvfpq")
  }

  test("executed processing-time timeout equals the per-user staged fold, twice") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("te"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val (mn, mx) = (ev.map(_._2).min, ev.map(_._2).max)
    val tm = Math.floorDiv(mn + mx, 2L)
    def s6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val staged = ev.filter(_._2 <= tm) ++
      ev.filter(r => r._2 > tm && r._1 % 3 == 0)
    // every staged user times out exactly once (batch 2 or the first
    // empty batch) with the full fold — the measured 1 ms expiry law
    val expect = staged.groupBy(_._1).toSeq.map { case (u, xs) =>
      (u, xs.length.toLong, xs.map(r => s6d(r._3)).sum)
    }.sortBy(_._1)
    def run() = SparkEntry.queries("stream_exec_ptimeout")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = run()
    assert(got.nonEmpty && got == expect, s"got ${got.take(3)}…\nexpect ${expect.take(3)}…")
    assert(run() == expect, "second invocation in the same session")
  }

  test("eo_tasseled_cap equals a scalar Kauth-Thomas dot-product mirror") {
    import org.apache.spark.sql.functions.col
    def s6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val rows = Tables.events(spark, sfDir)
      .select(col("event_id"), col("value"), col("user_id")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val expect = rows.map { case (eid, v, uid) =>
      val bands = Seq(v / 1000.0, (uid % 512).toDouble / 512.0,
        (eid % 97).toDouble / 97.0, (uid % 101).toDouble / 101.0,
        (eid % 89).toDouble / 89.0, (uid % 83).toDouble / 83.0)
      def dot(cs: Seq[Double]) =
        cs.zip(bands).map { case (c, b) => c * b }.reduce(_ + _)
      val tcg6 = s6d(dot(Seq(-0.2848, -0.2435, -0.5436, 0.7243, 0.0840, -0.1800)))
      (eid, s6d(dot(Seq(0.3037, 0.2793, 0.4743, 0.5585, 0.5082, 0.1863))),
        tcg6, s6d(dot(Seq(0.1509, 0.1973, 0.3279, 0.3406, -0.7112, -0.4572))),
        if (tcg6 > 100000L) 1L else 0L)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("eo_tasseled_cap")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got.nonEmpty && got == expect)
  }

  test("eo_tile_watershed equals a scalar follow-the-flow mirror; J+1 doubling is a fixpoint") {
    // sf0.001 has no complete tiles — drive at sf0.01 like eo_tile_clump
    val dir01 = "/root/testdata/sf0.01"
    import org.apache.spark.sql.functions.col
    def s2d(x: Double) = math.floor(x * 100 + 0.5).toLong
    val ev = Tables.events(spark, dir01).select("event_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val px = ev.filter(_._1 % 4 == 0).map { case (eid, v) =>
      val pid = eid / 4
      (pid / 256, (pid % 256).toInt, s2d(v))
    }
    val tiles = px.groupBy(_._1).filter(_._2.length == 256)
      .map { case (t, ps) =>
        val z = Array.ofDim[Long](256)
        ps.foreach(p => z(p._2) = p._3)
        t -> z
      }
    val offs = Seq((0, 1, 1), (1, 1, 2), (1, 0, 4), (1, -1, 8),
      (0, -1, 16), (-1, -1, 32), (-1, 0, 64), (-1, 1, 128))
    def interior(p: Int) = (p / 16) >= 1 && (p / 16) <= 14 &&
      (p % 16) >= 1 && (p % 16) <= 14
    val expect = tiles.toSeq.flatMap { case (t, z) =>
      val flow = Array.tabulate(256) { p =>
        if (!interior(p)) -1
        else {
          // (drop, -dir) lexicographic max — the struct-greatest pick
          val (drop, _, np) = offs.map { case (dy, dx, dir) =>
            val np = p + dy * 16 + dx
            (z(p) - z(np), -dir, np)
          }.max
          if (drop > 0 && interior(np)) np else -1
        }
      }
      def root(p: Int): Int = if (flow(p) == -1) p else root(flow(p))
      (0 until 256).filter(interior).groupBy(root).toSeq.map {
        case (basin, ps) => (t, basin.toLong, ps.length.toLong, ps.map(_ + 1L).sum)
      }
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("eo_tile_watershed")(spark, dir01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty && got == expect, s"got ${got.take(3)}…\nexpect ${expect.take(3)}…")
    // J=8 is exact root resolution: one more doubling changes nothing
    val a = graft.operators.EO.watershedBasins(spark, dir01, 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val b = graft.operators.EO.watershedBasins(spark, dir01, 9).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(a == b, "doubling fixpoint")
  }

  test("eo_geomad equals a full scalar quantized-Weiszfeld + MAD mirror") {
    def s6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    def q10(x: Double) = math.floor(x * 1e10 + 0.5).toLong
    val byLabel = Tables.embeddings(spark, sfDir).collect()
      .map(r => (r.getInt(2), r.getSeq[Float](1).toArray.map(_.toDouble)))
      .groupBy(_._1)
    val expect = byLabel.toSeq.map { case (label, vsL) =>
      val vs = vsL.map(_._2)
      val dim = vs.head.length
      // m0: the 6-dp-grid mean (Det.mean6), then 6 quantized Weiszfeld
      // rounds — GeomedianRounds is 6 (pinned here so a drift fails loud)
      var med = Array.tabulate(dim) { p =>
        math.floor(vs.map(v => s6d(v(p))).sum.toDouble / vs.length + 0.5) / 1e6
      }
      for (_ <- 1 to 6) {
        val w = vs.map { v =>
          val d2l = (0 until dim).map(p => q10((v(p) - med(p)) * (v(p) - med(p)))).sum
          if (d2l == 0L) 100000.0 else 1.0 / math.sqrt(d2l.toDouble / 1e10)
        }
        med = Array.tabulate(dim) { p =>
          val numl = vs.zip(w).map { case (v, wi) => q10(v(p) * wi) }.sum
          val denl = w.map(wi => q10(wi)).sum
          numl.toDouble / denl.toDouble
        }
      }
      val ds = vs.map { v =>
        val d2l = (0 until dim).map(p => q10((v(p) - med(p)) * (v(p) - med(p)))).sum
        val dotl = (0 until dim).map(p => q10(v(p) * med(p))).sum
        val xxl = (0 until dim).map(p => q10(v(p) * v(p))).sum
        val vvl = (0 until dim).map(p => q10(med(p) * med(p))).sum
        val bnl = (0 until dim).map(p => q10(math.abs(v(p) - med(p)))).sum
        val bdl = (0 until dim).map(p => q10(v(p) + med(p))).sum
        (s6d(math.sqrt(d2l.toDouble / 1e10)),
          s6d(if (xxl == 0L || vvl == 0L) 0.0
            else 1.0 - dotl.toDouble / (math.sqrt(xxl.toDouble) * math.sqrt(vvl.toDouble))),
          s6d(if (bdl == 0L) 0.0 else bnl.toDouble / bdl.toDouble))
      }
      def medOf(xs: Seq[Long]) = xs.sorted.apply((xs.length - 1) / 2)
      (label, vs.length.toLong, medOf(ds.map(_._1).toSeq),
        medOf(ds.map(_._2).toSeq), medOf(ds.map(_._3).toSeq))
    }.sortBy(_._1)
    val got = SparkEntry.queries("eo_geomad")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got.nonEmpty && got == expect, s"got ${got.take(3)}…\nexpect ${expect.take(3)}…")
    // dispersion is a real signal: every label has a nonzero EMAD
    got.foreach { case (l, _, e, _, _) => assert(e > 0L, s"label $l emad") }
  }

  test("dq_outlier_lof equals a scalar Breunig k=5 LOF mirror; both lanes fire") {
    def s6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    def q10(x: Double) = math.floor(x * 1e10 + 0.5).toLong
    def halfUp(s: Long, n: Long): Long = { // round-half-up s/n, both >= 0
      val a = 2 * s + n; (a - a % (2 * n)) / (2 * n)
    }
    val vecs = Tables.embeddings(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getSeq[Float](1).toArray.map(_.toDouble)))
    val byLabel = vecs.groupBy(_._2)
    val expect = byLabel.values.flatMap { vs =>
      val d6 = (for { a <- vs; b <- vs if a._1 != b._1 } yield {
        val d2l = (0 until a._3.length)
          .map(p => q10((a._3(p) - b._3(p)) * (a._3(p) - b._3(p)))).sum
        (a._1, b._1) -> s6d(math.sqrt(d2l.toDouble / 1e10))
      }).toMap
      val ids = vs.map(_._1)
      val kdist = ids.map { p =>
        p -> ids.filter(_ != p).map(o => (d6((p, o)), o)).sorted.apply(4)._1
      }.toMap
      val nk = ids.map { p =>
        p -> ids.filter(o => o != p && d6((p, o)) <= kdist(p))
      }.toMap
      val lrd = ids.map { p =>
        val srd = nk(p).map(o => math.max(kdist(o), d6((p, o)))).sum
        p -> math.min(if (srd == 0) 1000000000L
          else halfUp(nk(p).size * 1000000000000L, srd), 1000000000L)
      }.toMap
      ids.map { p =>
        val st = nk(p).map(o => halfUp(lrd(o) * 1000000L, lrd(p))).sum
        val lof6 = halfUp(st, nk(p).size)
        (p, nk(p).size.toLong, kdist(p), lrd(p), lof6,
          if (lof6 > 1010000L) 1L else 0L)
      }
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("dq_outlier_lof")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got.nonEmpty && got == expect, s"got ${got.take(3)}…\nexpect ${expect.take(3)}…")
    assert(got.exists(_._6 == 1L) && got.exists(_._6 == 0L), "both lanes")
  }

  test("eo_twi equals a scalar flow-acc + gradient + portable-ln mirror") {
    // sf0.001 has no complete tiles — drive at sf0.01 like eo_tile_clump
    val dir01 = "/root/testdata/sf0.01"
    def s2d(x: Double) = math.floor(x * 100 + 0.5).toLong
    def s6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val ev = Tables.events(spark, dir01).select("event_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val px = ev.filter(_._1 % 4 == 0).map { case (eid, v) =>
      val pid = eid / 4
      (pid / 256, (pid % 256).toInt, s2d(v))
    }
    val tiles = px.groupBy(_._1).filter(_._2.length == 256)
      .map { case (t, ps) =>
        val z = Array.ofDim[Long](256); ps.foreach(p => z(p._2) = p._3); t -> z
      }
    val offs = Seq((0, 1, 1), (1, 1, 2), (1, 0, 4), (1, -1, 8),
      (0, -1, 16), (-1, -1, 32), (-1, 0, 64), (-1, 1, 128))
    def interior(p: Int) = (p / 16) >= 1 && (p / 16) <= 14 &&
      (p % 16) >= 1 && (p % 16) <= 14
    val expect = tiles.toSeq.flatMap { case (t, z) =>
      val flow = Array.tabulate(256) { p =>
        if (!interior(p)) -1
        else {
          val (drop, _, np) = offs.map { case (dy, dx, dir) =>
            val np = p + dy * 16 + dx
            (z(p) - z(np), -dir, np)
          }.max
          if (drop > 0 && interior(np)) np else -1
        }
      }
      var acc = Array.tabulate(256)(p => if (interior(p)) 1L else 0L)
      for (_ <- 1 to 10) { // FlowAccRounds
        acc = Array.tabulate(256) { p =>
          if (!interior(p)) 0L
          else 1L + offs.map { case (dy, dx, _) =>
            val np = p + dy * 16 + dx
            if (flow(np) == p) acc(np) else 0L
          }.sum
        }
      }
      (0 until 256).filter(interior).map { p =>
        val gx = z(p + 1) - z(p - 1); val gy = z(p + 16) - z(p - 16)
        val g2 = math.max(gx * gx + gy * gy, 1L)
        (t, p.toLong, acc(p),
          s6d(Det.lnIntD(acc(p)) - 0.5 * Det.lnIntD(g2)))
      }
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("eo_twi")(spark, dir01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty && got == expect, s"got ${got.take(3)}…\nexpect ${expect.take(3)}…")
  }

  test("agg_ljungbox equals a scalar portmanteau mirror; both lanes fire at sf0.01") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val dir01 = "/root/testdata/sf0.01" // 150 users; the rejected lane fires
    def s2d(x: Double) = math.floor(x * 100 + 0.5).toLong
    def s6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val ev = Tables.events(spark, dir01)
      .select(col("user_id"), unix_micros(col("ts")).as("te"), col("event_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expect = ev.groupBy(_._1).toSeq.collect {
      case (u, rows) if rows.length >= 8 =>
        val xs = rows.sortBy(r => (r._2, r._3)).map(r => s2d(r._4))
        val n = xs.length
        val nD = n.toDouble
        val xbar = xs.sum.toDouble / nD
        val den = xs.map(x => x * x).sum.toDouble - nD * (xbar * xbar)
        def rk(k: Int) = {
          val sxy = (k until n).map(i => xs(i) * xs(i - k)).sum
          val sh = (k until n).map(i => xs(i - k)).sum
          val st = (k until n).map(i => xs(i)).sum
          (sxy.toDouble - xbar * (sh.toDouble + st.toDouble) +
            (n - k).toDouble * (xbar * xbar)) / den
        }
        val q = (nD * (nD + 2.0)) * ((rk(1) * rk(1) / (nD - 1.0)) +
          (rk(2) * rk(2) / (nD - 2.0)) + (rk(3) * rk(3) / (nD - 3.0)))
        val q6 = s6d(q)
        (u, n.toLong, s6d(rk(1)), s6d(rk(2)), s6d(rk(3)), q6,
          if (q6 > 7815000L) 1L else 0L)
    }.sortBy(_._1)
    val got = SparkEntry.queries("agg_ljungbox")(spark, dir01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got.nonEmpty && got == expect, s"got ${got.take(3)}…\nexpect ${expect.take(3)}…")
    assert(got.exists(_._7 == 1L) && got.exists(_._7 == 0L), "both lanes")
  }

  test("sql_pivot PIVOT clause equals a scalar rotation mirror") {
    val rows = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_linestatus", "l_quantity").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    def q2(x: Double) = math.floor(x * 100 + 0.5).toLong
    val expect = rows.groupBy(_._1).toSeq.map { case (rf, rs) =>
      def tot(ls: String) = rs.filter(_._2 == ls).map(r => q2(r._3)).sum
      (rf, tot("F"), tot("O"), tot("P"))
    }.sortBy(_._1)
    val got = SparkEntry.queries("sql_pivot")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.nonEmpty && got == expect)
  }

  test("agg_eqdepth_hist equals a scalar rank-bucket mirror; depths balance") {
    import org.apache.spark.sql.functions.col
    def q2(x: Double) = math.floor(x * 100 + 0.5).toLong
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), q2(r.getDouble(2))))
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (t, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2))
      val n = sorted.length.toLong
      sorted.zipWithIndex.groupBy { case (_, i) => i.toLong * 4 / n }
        .toSeq.map { case (b, ms) =>
          (t, b, ms.length.toLong, ms.map(_._1._3).min, ms.map(_._1._3).max)
        }
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("agg_eqdepth_hist")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got.nonEmpty && got == expect)
    // equi-depth law: within a type, bucket counts differ by at most 1
    got.groupBy(_._1).values.foreach { bs =>
      val cs = bs.map(_._3)
      assert(cs.max - cs.min <= 1, s"unbalanced depths: $bs")
    }
  }

  test("graph_walk_corpus equals a scalar derandomized-walk mirror") {
    import org.apache.spark.sql.functions.col
    def h32(s: String): Long = { // scalar mirror of Det.hash32
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((d(3).toLong & 0xff) << 24) | ((d(2).toLong & 0xff) << 16) |
        ((d(1).toLong & 0xff) << 8) | (d(0).toLong & 0xff)
    }
    val e = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(t => t._1 != t._2)
      .map(t => (math.min(t._1, t._2), math.max(t._1, t._2))).distinct
    val adj = (e ++ e.map(_.swap)).groupBy(_._1)
      .map { case (v, ns) => v -> ns.map(_._2).sorted }
    val expect = adj.keySet.toSeq.sorted.flatMap { start =>
      var v = start
      val traj = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      traj += ((start, 0L, start))
      for (t <- 1 to 6) {
        val ns = adj(v)
        v = ns((h32(s"$start:$t:$v") % ns.length).toInt)
        traj += ((start, t.toLong, v))
      }
      traj.toSeq
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("graph_walk_corpus")(spark, sfDir).collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty && got == expect, s"got ${got.take(4)}…\nexpect ${expect.take(4)}…")
    // every hop is a real edge
    got.sliding(2).foreach {
      case Seq((s1, t1, a), (s2, t2, b)) if s1 == s2 && t2 == t1 + 1 =>
        assert(adj(a).contains(b), s"non-edge hop $a->$b")
      case _ =>
    }
  }

  test("llm_pref_pairs equals a scalar widest-gap pairing mirror") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      val ranked = ds.map(d => (d._1, d._3.split(" ").distinct.length.toLong))
        .sortBy(d => (-d._2, d._1)).zipWithIndex
        .map { case ((id, q), i) => (i + 1L, id, q) }
      val n = ranked.length
      ranked.filter(_._1 * 2 <= n).flatMap { case (rk, cid, cq) =>
        val (_, rid, rq) = ranked(n - rk.toInt)
        if (cq > rq) Some((lang, rk, cid, rid, cq - rq)) else None
      }
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("llm_pref_pairs")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got.nonEmpty && got == expect, s"got ${got.take(3)}…\nexpect ${expect.take(3)}…")
    // a pair never inverts quality, and gaps weakly shrink with rank
    got.groupBy(_._1).values.foreach { ps =>
      val gaps = ps.sortBy(_._2).map(_._5)
      assert(gaps.forall(_ > 0L))
      assert(gaps.zip(gaps.tail).forall { case (a, b) => a >= b }, s"gaps not sorted: $gaps")
    }
  }

  test("maint_partition_evolution equals a scalar two-spec mirror; the v1 prune is physical") {
    import org.apache.spark.sql.functions.{col, unix_timestamp}
    def s6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val ev = Tables.events(spark, sfDir)
      .select(unix_timestamp(col("ts")).as("te"), col("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val (mn, mx) = (ev.map(_._1).min, ev.map(_._1).max)
    val tm = Math.floorDiv(mn + mx, 2L)
    val lo = mn + (mx - mn) / 4; val hi = mn + (mx - mn) * 3 / 4
    def sideM(name: String, rows: Seq[(Long, Double)], unit: Long) = {
      val parts = rows.map(_._1 / unit).distinct
      val inR = rows.filter(r => r._1 >= lo && r._1 <= hi)
      (name, parts.size.toLong,
        parts.count(p => p >= lo / unit && p <= hi / unit).toLong,
        inR.size.toLong, inR.map(r => s6d(r._2)).sum)
    }
    val expect = Seq(
      sideM("v1_day", ev.filter(_._1 <= tm).toSeq, 86400L),
      sideM("v2_month", ev.filter(_._1 > tm).toSeq, 86400L * 30))
    val got = SparkEntry.queries("maint_partition_evolution")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect, s"got $got\nexpect $expect")
    // the day-spec prune must be PHYSICAL: the range predicate lands in
    // the scan's PartitionFilters and the scan touches strictly fewer
    // files than the layout holds (inputFiles ignores pushed filters —
    // selectedPartitions is the real post-prune census)
    val dir = graft.GraftTmp.dir("part_evo")
    val pruned = spark.read.parquet(s"$dir/v1")
      .where(col("pday").between(lo / 86400, hi / 86400))
    val scan = pruned.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(scan.partitionFilters.exists(_.toString.contains("pday")),
      "pday not in PartitionFilters")
    assert(scan.selectedPartitions.totalNumberOfFiles <
      scan.relation.location.inputFiles.length,
      "scan read every partition — the evolution prune is not physical")
  }

  test("agg_ransac equals a scalar derandomized-consensus mirror") {
    import java.security.MessageDigest
    import org.apache.spark.sql.functions.{col, unix_timestamp}
    def h32(t: String): Long = {
      val dg = MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      (0 until 4).map(i => (dg(i).toLong & 0xffL) << (8 * i)).sum
    }
    def s6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"),
        unix_timestamp(col("ts")).as("x"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), s6d(r.getDouble(3))))
    val expect = ev.groupBy(_._1).toSeq.map { case (et, rows) =>
      val ranked = rows.sortBy(r => (h32(s"ransac:${r._2}"), r._2))
        .map(r => (r._3, r._4))
      val cands = (0 until 8).flatMap { k =>
        if (ranked.length < 2 * k + 2) None
        else {
          val (p1, p2) = (ranked(2 * k), ranked(2 * k + 1))
          if (p1._1 == p2._1) None
          else {
            val Seq(pa, pb) = Seq(p1, p2).sortBy(_._1)
            val nInl = ranked.count { case (x, y) =>
              math.abs((pb._2 - pa._2) * (x - pa._1) -
                (pb._1 - pa._1) * (y - pa._2)) <=
                20000000L * (pb._1 - pa._1)
            }
            Some((k.toLong, pa, pb, nInl.toLong))
          }
        }
      }
      val best = cands.minBy(c => (-c._4, c._1))
      val (dy, dx) = (best._3._2 - best._2._2, best._3._1 - best._2._1)
      val slope = { // halfUpDiv(dy * 1e6, dx) scalar twin
        val (a, b) = (dy * 1000000L * 2 + dx, dx * 2)
        ((a - math.floorMod(a, b)).toDouble / b.toDouble).toLong
      }
      (et, best._1, ranked.length.toLong, best._4, slope)
    }.sortBy(_._1)
    val got = SparkEntry.queries("agg_ransac")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect, s"got $got\nexpect $expect")
    // the consensus is discriminative: the winner never swallows the
    // whole series and never degenerates to just its own two points
    assert(got.forall(g => g._4 > 2 && g._4 < g._3), "degenerate consensus")
  }

  test("maint_wap: branch isolation is physical and publish is metadata-only") {
    import org.apache.spark.sql.functions.{col, input_file_name, unix_timestamp}
    val S = graft.maintenance.Snapshots
    // the graded key (runs the whole WAP lifecycle as a side effect)
    val got = SparkEntry.queries("maint_wap")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def s6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val ev = Tables.events(spark, sfDir)
      .select(unix_timestamp(col("ts")).as("te"), col("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val tm = Math.floorDiv(ev.map(_._1).min + ev.map(_._1).max, 2L)
    val h1 = ev.filter(_._1 <= tm)
    val expect = Seq(
      (1L, h1.length.toLong, h1.map(e => s6d(e._2)).sum, 2L),
      (2L, ev.length.toLong, ev.map(e => s6d(e._2)).sum, 3L),
      (3L, ev.length.toLong, ev.map(e => s6d(e._2)).sum, 3L))
    assert(got.toSeq == expect, s"got ${got.toSeq}\nexpect $expect")
    // after the build: main and audit point at the same version, the
    // directory holds exactly the 3 immutable files, and the publish
    // left the snapshot history untouched (metadata-only fast-forward)
    val dir = graft.GraftTmp.dir("wap")
    assert(S.refVersion(dir, "main") == S.refVersion(dir, "audit"))
    assert(S.latestVersion(dir) == 2, "publish minted a new version")
    assert(S.dataFiles(dir).size == 3)
    // isolation re-derived: a reader pinned to v1 still scans only the
    // two v1 files even though the staged file is in the same directory
    val snap = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("te",
        org.apache.spark.sql.types.LongType)))
    val v1Files = S.readAsOf(spark, dir, snap, 1)
      .select(input_file_name()).distinct().count()
    assert(v1Files == 2L, s"v1 read touched $v1Files files")
  }

  test("agg_isotonic equals quantized minimax and tracks true PAVA within 1 ulp") {
    import org.apache.spark.sql.functions.{col, unix_timestamp}
    def s6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    def hud(s: Long, n: Long): Long = { // halfUpDiv scalar twin (s >= 0)
      val (a, b) = (2 * s + n, 2 * n)
      ((a - math.floorMod(a, b)).toDouble / b.toDouble).toLong
    }
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), unix_timestamp(col("ts")).as("te"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1) / 86400, s6d(r.getDouble(2))))
    val got = SparkEntry.queries("agg_isotonic")(spark, sfDir)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    ev.groupBy(_._1).foreach { case (et, rows) =>
      val ys = rows.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (day, xs) =>
          (day, hud(xs.map(_._3).sum, xs.length.toLong)) }
      val n = ys.length
      val pre = ys.scanLeft(0L)(_ + _._2).tail // prefix sums of y6
      def a6(j: Int, k: Int): Long = // quantized mean over [j..k], 1-based
        hud(pre(k - 1) - pre(j - 1) + ys(j - 1)._2, (k - j + 1).toLong)
      // (1) independent minimax evaluation of the same quantized law
      val mm = (1 to n).map(i =>
        (1 to i).map(j => (i to n).map(k => a6(j, k)).min).max)
      // (2) true sequential PAVA with exact rational block means
      case class Blk(sum: Long, len: Long)
      val blocks = scala.collection.mutable.ArrayBuffer.empty[Blk]
      ys.foreach { case (_, y) =>
        var b = Blk(y, 1)
        while (blocks.nonEmpty &&
            blocks.last.sum * b.len >= b.sum * blocks.last.len) {
          val p = blocks.remove(blocks.length - 1)
          b = Blk(p.sum + b.sum, p.len + b.len)
        }
        blocks += b
      }
      val pava = blocks.flatMap(b =>
        Seq.fill(b.len.toInt)(b.sum.toDouble / b.len.toDouble))
      (1 to n).foreach { i =>
        val (gy, gday, gfit) = {
          val g = got((et, i.toLong)); (g._2, g._1, g._3)
        }
        assert(gday == ys(i - 1)._1 && gy == ys(i - 1)._2, s"$et day/y6 @$i")
        assert(gfit == mm(i - 1), s"$et minimax mismatch @$i")
        assert(math.abs(gfit - pava(i - 1)) <= 1.0,
          s"$et fit drifts from true PAVA @$i: $gfit vs ${pava(i - 1)}")
      }
      // monotone and genuinely pooled
      val fits = (1 to n).map(i => got((et, i.toLong))._3)
      assert(fits.zip(fits.tail).forall(p => p._1 <= p._2), s"$et not monotone")
      assert(fits.distinct.size < n, s"$et never pooled")
    }
  }

  test("llm_rouge equals a scalar clipped-overlap mirror") {
    import org.apache.spark.sql.functions.col
    def s6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val got = SparkEntry.queries("llm_rouge")(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    docs.groupBy(_._2).foreach { case (lang, ds) =>
      def counts(text: String): Map[String, Long] =
        text.split(" ", -1).groupBy(identity).view.mapValues(_.length.toLong).toMap
      val refId = ds.map(d => (d._1, counts(d._3).size))
        .sortBy(t => (-t._2, t._1)).head._1
      val refC = counts(ds.find(_._1 == refId).get._3)
      val nRef = refC.values.sum
      val cands = ds.filter(_._1 != refId)
      assert(cands.nonEmpty)
      cands.foreach { case (id, _, text) =>
        val c = counts(text)
        val o = c.map { case (w, n) => math.min(n, refC.getOrElse(w, 0L)) }.sum
        val nc = c.values.sum
        val expect = (o, nc, nRef, s6d(o.toDouble / nc.toDouble),
          s6d(o.toDouble / nRef.toDouble),
          s6d(2.0 * o / (nc + nRef).toDouble))
        assert(got((id, lang)) == expect, s"doc $id/$lang: ${got((id, lang))} vs $expect")
      }
      // discriminative: scores spread (near-dups of the reference score
      // high, unrelated docs low) — not a constant metric
      val fs = cands.map(cd => got((cd._1, lang))._6)
      assert(fs.max > fs.min, s"$lang: degenerate ROUGE distribution")
    }
  }

  test("eo_tile_curvature equals a scalar Zevenbergen-Thorne mirror") {
    import org.apache.spark.sql.functions.col
    // sf0.001 has no complete tiles — drive at sf0.01 like eo_tile_clump
    val tileSf = "/root/testdata/sf0.01"
    val ev = Tables.events(spark, tileSf).select(col("event_id"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val tiles = ev.map { case (eid, v) =>
      val pid = eid / 4
      ((pid / 256, eid % 4), ((pid % 256) / 16, pid % 16, v))
    }.groupBy(_._1).collect { case ((tile, 0L), xs) if xs.length == 256 =>
      val g = Array.ofDim[Long](16, 16)
      xs.foreach { case (_, (py, px, v)) => g(py.toInt)(px.toInt) = v }
      tile -> g
    }
    val expect = tiles.toSeq.map { case (tile, g) =>
      val rows = for (oy <- 1 to 14; ox <- 1 to 14) yield {
        val d2 = g(oy)(ox - 1) + g(oy)(ox + 1) - 2 * g(oy)(ox)
        val e2 = g(oy - 1)(ox) + g(oy + 1)(ox) - 2 * g(oy)(ox)
        val f4 = -g(oy - 1)(ox - 1) + g(oy - 1)(ox + 1) +
          g(oy + 1)(ox - 1) - g(oy + 1)(ox + 1)
        val g2 = g(oy)(ox + 1) - g(oy)(ox - 1)
        val h2 = g(oy - 1)(ox) - g(oy + 1)(ox)
        val pn = 2 * d2 * h2 * h2 + 2 * e2 * g2 * g2 - f4 * g2 * h2
        val fn = -(2 * d2 * g2 * g2 + 2 * e2 * h2 * h2 + f4 * g2 * h2)
        val opos = (oy - 1) * 14 + (ox - 1)
        (opos.toLong, pn, fn)
      }
      (tile, rows.length.toLong, rows.map(_._2).sum,
        rows.map(r => math.abs(r._2)).sum, rows.map(_._3).sum,
        rows.map(r => r._2 * (r._1 + 1)).sum)
    }.sortBy(_._1)
    val got = SparkEntry.queries("eo_tile_curvature")(spark, tileSf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got.nonEmpty && got == expect,
      s"got ${got.take(2)}…\nexpect ${expect.take(2)}…")
    // curvature genuinely varies: some tile has nonzero plan curvature
    // mass, and plan/profile are not identical fields
    assert(got.exists(_._4 > 0L))
    assert(got.exists(t => t._3 != t._5))
  }

  test("llm_bleu equals a scalar clipped-precision + brevity-penalty mirror") {
    import org.apache.spark.sql.functions.col
    def s6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val got = SparkEntry.queries("llm_bleu")(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))).toMap
    docs.groupBy(_._2).foreach { case (lang, ds) =>
      def uni(t: String) = t.split(" ", -1).toSeq
      def big(t: String) = { val u = uni(t); u.zip(u.tail).map(p => p._1 + " " + p._2) }
      def cm(xs: Seq[String]) = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val refId = ds.map(d => (d._1, uni(d._3).distinct.size))
        .sortBy(t => (-t._2, t._1)).head._1
      val refT = ds.find(_._1 == refId).get._3
      val (r1c, r2c) = (cm(uni(refT)), cm(big(refT)))
      val r1 = r1c.values.sum
      ds.filter(_._1 != refId).foreach { case (id, _, text) =>
        val (c1c, c2c) = (cm(uni(text)), cm(big(text)))
        val (c1, c2) = (c1c.values.sum, c2c.values.sum)
        val o1 = c1c.map { case (w, n) => math.min(n, r1c.getOrElse(w, 0L)) }.sum
        val o2 = c2c.map { case (w, n) => math.min(n, r2c.getOrElse(w, 0L)) }.sum
        val bleu = if (o1 == 0 || o2 == 0) 0L else {
          val lnp = (Det.lnRatioD(o1, c1) + Det.lnRatioD(o2, c2)) / 2.0
          val bp = if (c1 >= r1) 0.0 else 1.0 - r1.toDouble / c1.toDouble
          s6d(Det.expPD(lnp + bp))
        }
        val expect = (o1, c1, o2, c2, r1, bleu)
        assert(got((id, lang)) == expect,
          s"doc $id/$lang: ${got((id, lang))} vs $expect")
      }
    }
    // both lanes fire somewhere in the corpus: zero-rule scores and
    // genuine positive scores
    assert(got.values.exists(_._6 == 0L) && got.values.exists(_._6 > 0L))
  }

  test("win_binseg equals a scalar two-level CUSUM mirror") {
    import org.apache.spark.sql.functions.{col, unix_timestamp}
    def s2d(x: Double) = math.floor(x * 100 + 0.5).toLong
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), unix_timestamp(col("ts")).as("te"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1) / 86400, s2d(r.getDouble(2))))
    val got = SparkEntry.queries("win_binseg")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), Option(r.get(4)).map(_ => r.getLong(4)),
        Option(r.get(5)).map(_ => r.getLong(5)),
        Option(r.get(6)).map(_ => r.getLong(6)),
        Option(r.get(7)).map(_ => r.getLong(7)))).toMap
    ev.groupBy(_._1).foreach { case (et, rows) =>
      val xs = rows.groupBy(_._2).toSeq.sortBy(_._1).map(_._2.map(_._3).sum)
      val n = xs.length.toLong
      val pre = xs.scanLeft(0L)(_ + _).tail
      def best(lo: Int, hi: Int): Option[(Long, Long)] = {
        // splits k in (lo, hi) exclusive; returns (k 1-based, score)
        val cands = ((lo + 1) until hi).map { k =>
          val sLo = if (lo == 0) 0L else pre(lo - 1)
          val sc = math.abs((hi - lo).toLong * (pre(k - 1) - sLo) -
            (k - lo).toLong * (pre(hi - 1) - sLo))
          (k.toLong, sc)
        }
        if (cands.isEmpty) None else Some(cands.minBy(c => (-c._2, c._1)))
      }
      val Some((k1, sc1)) = best(0, xs.length)
      val left = best(0, k1.toInt)
      val right = best(k1.toInt, xs.length)
      val expect = (n, k1, sc1, left.map(_._1), left.map(_._2),
        right.map(_._1), right.map(_._2))
      assert(got(et) == expect, s"$et: ${got(et)} vs $expect")
    }
    // at least one type splits on both sides (30-day series, k1 interior)
    assert(got.values.exists(v => v._4.isDefined && v._6.isDefined))
  }

  test("eo_sun_position equals a scalar solar-geometry mirror; both lanes fire") {
    import org.apache.spark.sql.functions.{col, unix_timestamp}
    def s4d(x: Double) = math.floor(x * 1e4 + 0.5).toLong
    def hud(s: Long, n: Long): Long = {
      val (a, b) = (2 * s + n, 2 * n)
      ((a - math.floorMod(a, b)).toDouble / b.toDouble).toLong
    }
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("te"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = ev.map { case (eid, uid, te) =>
      val lat = (uid % 13) * 10 - 60
      val lon = (eid % 24) * 15 - 180
      val d = (te / 86400) % 365
      val hs = te % 86400
      val dec4 = s4d(-23.44 *
        math.cos(math.Pi * ((d + 10).toDouble * 360.0 / 365.0) / 180.0))
      val hdeg = (hs * 15 + lon * 3600 - 648000).toDouble / 3600.0
      val sdec4 = s4d(math.sin(math.Pi * (dec4.toDouble / 10000.0) / 180.0))
      val cdec4 = s4d(math.cos(math.Pi * (dec4.toDouble / 10000.0) / 180.0))
      val sphi4 = s4d(math.sin(math.Pi * lat.toDouble / 180.0))
      val cphi4 = s4d(math.cos(math.Pi * lat.toDouble / 180.0))
      val cha4 = s4d(math.cos(math.Pi * hdeg / 180.0))
      val se8 = sphi4 * sdec4 + hud(cphi4 * cdec4 * cha4, 10000L)
      (eid, lat, lon, d, dec4, s4d(hdeg), se8, if (se8 > 0) 1 else 0)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("eo_sun_position")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getInt(7)))
      .toSeq
    assert(got == expect, s"got ${got.take(2)}…\nexpect ${expect.take(2)}…")
    // physical sanity: both day and night occur, and the declination
    // stays inside the tropics
    assert(got.exists(_._8 == 1) && got.exists(_._8 == 0))
    assert(got.forall(g => math.abs(g._5) <= 234400L))
  }

  test("dq_xmr_control equals a scalar Shewhart mirror; the warning lane fires") {
    import org.apache.spark.sql.functions.{col, unix_timestamp}
    def s2d(x: Double) = math.floor(x * 100 + 0.5).toLong
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), unix_timestamp(col("ts")).as("te"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1) / 86400, s2d(r.getDouble(2))))
    val got = SparkEntry.queries("dq_xmr_control")(spark, sfDir)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), Option(r.get(3)).map(_ => r.getLong(3)),
          r.getInt(4), r.getInt(5), r.getInt(6)))).toMap
    ev.groupBy(_._1).foreach { case (et, rows) =>
      val days = rows.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (day, xs) => (day, xs.map(_._3).sum) }
      val n = days.length.toLong
      val sx = days.map(_._2).sum
      val mrs = days.map(_._2).zip(days.map(_._2).tail).map(p => math.abs(p._2 - p._1))
      val (sr, mm) = (mrs.sum, mrs.length.toLong)
      days.zipWithIndex.foreach { case ((day, x), i) =>
        val mr = if (i == 0) None else Some(math.abs(x - days(i - 1)._2))
        val oob = if (math.abs(x * n - sx) * mm * 100 > 266 * sr * n) 1 else 0
        val warn = if (math.abs(x * n - sx) * mm * 300 > 532 * sr * n) 1 else 0
        val run8 = if (i >= 7 && (math.max(i - 7, 0) to i).forall(j =>
            days(j)._2 * n > sx) ||
          i >= 7 && (math.max(i - 7, 0) to i).forall(j => days(j)._2 * n <= sx)) 1
        else 0
        assert(got((et, day)) == (x, mr, oob, warn, run8),
          s"$et@$day: ${got((et, day))} vs ${(x, mr, oob, warn, run8)}")
      }
    }
    // the corpus is in-control at 3σ (correct behavior for iid daily
    // sums) while the 2σ warning line genuinely fires
    assert(got.values.forall(_._3 == 0))
    assert(got.values.exists(_._4 == 1))
  }

  test("maint_incremental_view: refresh equals full recompute and reads only the delta") {
    import org.apache.spark.sql.functions.{col, unix_timestamp}
    def s2d(x: Double) = math.floor(x * 100 + 0.5).toLong
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), unix_timestamp(col("ts")).as("te"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), s2d(r.getDouble(2))))
    val tm = Math.floorDiv(ev.map(_._2).min + ev.map(_._2).max, 2L)
    def viewOf(rows: Seq[(String, Long, Long)]) =
      rows.groupBy(_._1).view.mapValues(xs => (xs.length.toLong, xs.map(_._3).sum)).toMap
    val (full, half) = (viewOf(ev.toSeq), viewOf(ev.filter(_._2 <= tm).toSeq))
    val got = SparkEntry.queries("maint_incremental_view")(spark, sfDir)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    half.foreach { case (et, (n, s)) =>
      assert(got(("v1_build", et)) == (n, s, 2L), s"v1 $et") }
    full.foreach { case (et, (n, s)) =>
      // the merged view equals the full recompute, built from ONE file
      assert(got(("v2_incr", et)) == (n, s, 1L), s"v2 $et") }
    // the delta genuinely contributed (the view moved between versions)
    assert(full.exists { case (et, v) => half.get(et).exists(_ != v) })
  }

  test("llm_cdc_shingle equals a scalar rolling-boundary mirror; boundaries re-align") {
    import java.security.MessageDigest
    import org.apache.spark.sql.functions.col
    def h32(t: String): Long = {
      val dg = MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      (0 until 4).map(i => (dg(i).toLong & 0xffL) << (8 * i)).sum
    }
    def chunksOf(toks: Seq[String]): Seq[Seq[String]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[String]
      toks.zipWithIndex.foreach { case (tok, p0) =>
        cur += tok
        val i = p0 + 1
        if (i >= 4 &&
            h32("cdc:" + toks.slice(i - 4, i).mkString(" ")) % 16 == 0) {
          out += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty
        }
      }
      if (cur.nonEmpty) out += cur.toSeq
      out.toSeq
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val allChunks = docs.map { case (id, text) =>
      id -> chunksOf(text.split(" ", -1).toSeq).map(c =>
        (h32("ck:" + c.mkString(" ")), c.length.toLong))
    }.toMap
    val dfm = allChunks.toSeq.flatMap { case (id, cs) => cs.map(c => (c._1, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val expect = allChunks.toSeq.map { case (id, cs) =>
      (id, cs.length.toLong, cs.map(_._2).sum, cs.map(_._1).sum,
        cs.count(c => dfm(c._1) >= 2).toLong)
    }.sortBy(_._1)
    val got = SparkEntry.queries("llm_cdc_shingle")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect, s"got ${got.take(2)}…\nexpect ${expect.take(2)}…")
    // the CDC property the key exists for: near-dup docs share chunks
    assert(got.exists(_._5 > 0L), "no chunk re-alignment on a near-dup corpus")
    // boundaries are content-defined, not fixed-stride: chunk counts vary
    assert(got.map(_._2).distinct.size > 1)
  }

  test("limit_offset returns exactly rows 41-50 of the total order") {
    import org.apache.spark.sql.functions.col
    def s2d(x: Double) = math.floor(x * 100 + 0.5).toLong
    val all = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(t => (-t._2, t._1))
    val expect = all.slice(40, 50).map(t => (t._1, s2d(t._2))).toSeq
    val got = SparkEntry.queries("limit_offset")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect, s"page mismatch: $got vs $expect")
  }

  test("scan_parquet_decimal: the decimal file carries HALF_UP cents of the doubles") {
    import org.apache.spark.sql.functions.col
    val got = SparkEntry.queries("scan_parquet_decimal")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val mirror = ev.groupBy(_._1).view.mapValues { xs =>
      val cents = xs.map(e => new java.math.BigDecimal(e._2)
        .setScale(2, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact())
      (xs.length.toLong, cents.sum, cents.min, cents.max)
    }.toMap
    assert(got == mirror, s"decimal interchange drifted: ${got.headOption}")
    // the written footer genuinely carries the DECIMAL logical type
    val field = spark.read.parquet(graft.GraftTmp.dir("dec_scan")).schema("v")
    assert(field.dataType ==
      org.apache.spark.sql.types.DecimalType(12, 2), field.dataType.toString)
  }

  test("llm_kn_logprob equals a scalar Kneser-Ney mirror; backoff lane fires") {
    import java.security.MessageDigest
    import org.apache.spark.sql.functions.col
    def h32(t: String): Long = {
      val dg = MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      (0 until 4).map(i => (dg(i).toLong & 0xffL) << (8 * i)).sum
    }
    def s6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    // the shared integer-rational KN term, the formula BOTH engines spell
    def ceTerm(c12: Option[Long], c1: Option[(Long, Long)], nw2: Long,
        nt: Long): Double = {
      val (num, den) = c1 match {
        case Some((cc1, n1w1)) =>
          (math.max(math.max(4 * c12.getOrElse(0L) - 3, 0L) * nt +
            3 * n1w1 * nw2, 1L), 4 * cc1 * nt)
        case None => (math.max(4 * nw2, 1L), 4 * nt)
      }
      Det.lnIntD(den) - Det.lnIntD(num)
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(_._3.split(" ", -1).length >= 2)
    def bigrams(t: String) = {
      val u = t.split(" ", -1); u.zip(u.tail).map(p => p._1 + " " + p._2).toSeq
    }
    val expect = docs.groupBy(_._2).toSeq.map { case (lang, ds) =>
      val (tr, te) = ds.partition(d => h32(d._1.toString) % 5 != 0)
      val c12 = tr.flatMap(d => bigrams(d._3)).groupBy(identity)
        .view.mapValues(_.length.toLong).toMap
      val byW1 = c12.toSeq.groupBy(_._1.split(" ")(0))
        .view.mapValues(xs => (xs.map(_._2).sum, xs.length.toLong)).toMap
      val byW2 = c12.keys.toSeq.groupBy(_.split(" ")(1))
        .view.mapValues(_.length.toLong).toMap
      val nt = c12.size.toLong
      val terms = te.flatMap(d => bigrams(d._3).map(b => (d._1, b)))
      val ce = terms.map { case (_, b) =>
        s6d(ceTerm(c12.get(b), byW1.get(b.split(" ")(0)),
          byW2.getOrElse(b.split(" ")(1), 0L), nt))
      }.sum
      (lang, te.map(_._1).distinct.size.toLong, terms.length.toLong,
        terms.count(t => !c12.contains(t._2)).toLong,
        terms.count(t => !byW1.contains(t._2.split(" ")(0))).toLong, ce)
    }.sortBy(_._1)
    val got = SparkEntry.queries("llm_kn_logprob")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect, s"got $got\nexpect $expect")
    // the continuation-backoff lane genuinely fires somewhere
    assert(got.map(_._4).sum > 0L, "no unseen bigram scored")
    // the unseen-CONTEXT branch is corpus-dead (closed vocabulary) —
    // pin the branch formula itself: Pcont-only scoring is
    // lnInt(4·nt) − lnInt(max(4·nw2, 1)) and degrades to the OOV floor
    assert(ceTerm(None, None, 5L, 100L) ==
      Det.lnIntD(400L) - Det.lnIntD(20L))
    assert(ceTerm(None, None, 0L, 100L) ==
      Det.lnIntD(400L) - Det.lnIntD(1L))
  }

  test("eo_spectral_indices equals a scalar index mirror; all covers fire") {
    import org.apache.spark.sql.functions.col
    def hud(s: Long, n: Long): Long = {
      val (a, b) = (2 * s + n, 2 * n)
      ((a - math.floorMod(a, b)).toDouble / b.toDouble).toLong
    }
    val ev = Tables.events(spark, sfDir).select(col("event_id"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = ev.map { case (eid, uid) =>
      val (bl, gr, rd, nr) = (uid % 83, eid % 89, uid % 101, eid % 97)
      val ndvi = if (nr + rd == 0) None else Some(hud((nr - rd) * 1000000L, nr + rd))
      val ndwi = if (gr + nr == 0) None else Some(hud((gr - nr) * 1000000L, gr + nr))
      val savi = hud(3 * (nr - rd) * 1000000L, 2 * (nr + rd) + 1)
      val eden = 2 * nr + 12 * rd - 15 * bl + 2
      val evi = if (eden <= 0) None else Some(hud(5 * (nr - rd) * 1000000L, eden))
      val cover = if (ndvi.exists(_ > 300000L)) "veg"
        else if (ndwi.exists(_ > 0L)) "water" else "other"
      (eid, ndvi, ndwi, savi, evi, cover)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("eo_spectral_indices")(spark, sfDir)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_ => r.getLong(1)),
        Option(r.get(2)).map(_ => r.getLong(2)), r.getLong(3),
        Option(r.get(4)).map(_ => r.getLong(4)), r.getString(5))).toSeq
    assert(got == expect, s"got ${got.take(2)}…\nexpect ${expect.take(2)}…")
    assert(got.map(_._6).distinct.toSet == Set("veg", "water", "other"))
  }

  test("agg_mcnemar equals a scalar paired-cells mirror; discordance fires") {
    import org.apache.spark.sql.functions.{col, unix_timestamp}
    def hud(s: Long, n: Long): Long = {
      val (a, b) = (2 * s + n, 2 * n)
      ((a - math.floorMod(a, b)).toDouble / b.toDouble).toLong
    }
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val tm = Math.floorDiv(ev.map(_._3).min + ev.map(_._3).max, 2L)
    val got = SparkEntry.queries("agg_mcnemar")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), Option(r.get(4)).map(_ => r.getLong(4)), r.getInt(5))).toMap
    ev.groupBy(_._2).foreach { case (et, rows) =>
      val byU = rows.groupBy(_._1).view.mapValues { xs =>
        (xs.count(_._3 <= tm).toLong, xs.count(_._3 > tm).toLong) }.toMap
      val nu = byU.size.toLong
      val tot = byU.values.map(p => p._1 + p._2).sum
      val cells = byU.values.map { case (c1, c2) =>
        (if (2 * nu * c1 > tot) 1 else 0, if (2 * nu * c2 > tot) 1 else 0) }
      val b = cells.count(_ == (1, 0)).toLong
      val c = cells.count(_ == (0, 1)).toLong
      val chi = if (b + c == 0) None
        else Some(hud((math.abs(b - c) - 1) * (math.abs(b - c) - 1) * 1000000L, b + c))
      val rej = if (chi.exists(_ > 3841000L)) 1 else 0
      assert(got(et) == (nu, b, c, chi, rej), s"$et: ${got(et)}")
      assert(b + c > 0, s"$et: no discordant pairs — degenerate")
    }
    // the null holds on iid behavior (reject=0 everywhere is the
    // CORRECT verdict) while the statistic itself genuinely varies
    assert(got.values.map(_._4).flatten.toSeq.distinct.size > 1)
  }

  test("llm_filter_kappa equals a scalar Cohen mirror and the po/pe definition") {
    import org.apache.spark.sql.functions.col
    def hud(s: Long, n: Long): Long = {
      val (a, b) = (2 * s + n, 2 * n)
      ((a - math.floorMod(a, b)).toDouble / b.toDouble).toLong
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3).split(" ", -1).distinct.length.toLong))
    val got = SparkEntry.queries("llm_filter_kappa")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5),
        Option(r.get(6)).map(_ => r.getLong(6)))).toMap
    docs.groupBy(_._2).foreach { case (lang, ds) =>
      val n = ds.length
      def median(xs: Seq[Long], ids: Seq[Long]): Long =
        xs.zip(ids).sortBy(identity).apply((n - 1) / 2)._1
      val md1 = median(ds.map(_._3).toSeq, ds.map(_._1).toSeq)
      val md2 = median(ds.map(_._4).toSeq, ds.map(_._1).toSeq)
      val cells = ds.map(dd =>
        (if (dd._3 > md1) 1 else 0, if (dd._4 > md2) 1 else 0))
      val (a, b, c, d2) = (cells.count(_ == (1, 1)).toLong,
        cells.count(_ == (1, 0)).toLong, cells.count(_ == (0, 1)).toLong,
        cells.count(_ == (0, 0)).toLong)
      val den = (a + b) * (b + d2) + (a + c) * (c + d2)
      val kap = if (den == 0) None else Some(hud(2 * (a * d2 - b * c) * 1000000L, den))
      assert(got(lang) == (n.toLong, a, b, c, d2, kap), s"$lang: ${got(lang)}")
      // the integer identity equals the textbook (po−pe)/(1−pe) form
      kap.foreach { k =>
        val po = (a + d2).toDouble / n
        val pe = ((a + b) * (a + c) + (c + d2) * (b + d2)).toDouble / (n.toLong * n)
        assert(math.abs(k / 1e6 - (po - pe) / (1 - pe)) < 1e-5, s"$lang identity")
      }
      // the two filters agree beyond chance but are not identical
      assert(kap.exists(k => k > 300000L && k < 1000000L), s"$lang kappa degenerate")
    }
  }

  test("win_haar equals a scalar two-level Haar mirror; Parseval-bounded") {
    import org.apache.spark.sql.functions.{col, unix_timestamp}
    def s2d(x: Double) = math.floor(x * 100 + 0.5).toLong
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), unix_timestamp(col("ts")).as("te"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1) / 86400, s2d(r.getDouble(2))))
    val got = SparkEntry.queries("win_haar")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    ev.groupBy(_._1).foreach { case (et, rows) =>
      val xs = rows.groupBy(_._2).toSeq.sortBy(_._1).map(_._2.map(_._3).sum)
      def level(in: Seq[Long]): (Seq[Long], Seq[Long]) = {
        val pairs = in.grouped(2).filter(_.length == 2).toSeq
        (pairs.map(p => p(0) + p(1)), pairs.map(p => p(0) - p(1)))
      }
      val (a1, d1) = level(xs)
      val (_, d2) = level(a1)
      def roll(ds: Seq[Long]) = (ds.length.toLong, ds.map(x => x * x).sum,
        ds.zipWithIndex.map { case (x, j) => x * (j + 1) }.sum)
      assert(got((et, 1L)) == roll(d1), s"$et L1")
      assert(got((et, 2L)) == roll(d2), s"$et L2")
      // unnormalized-Haar Parseval bound: Σd² per level ≤ 2^level·Σx²
      val sx2 = xs.map(x => x * x).sum
      assert(roll(d1)._2 <= 2 * sx2 && roll(d2)._2 <= 4 * sx2, s"$et energy bound")
      assert(roll(d1)._2 > 0L, s"$et flat series — degenerate")
    }
  }

  test("win_dft_power equals a scalar harmonic mirror through libm") {
    import org.apache.spark.sql.functions.{col, unix_timestamp}
    def s4d(x: Double) = math.floor(x * 1e4 + 0.5).toLong
    def s2d(x: Double) = math.floor(x * 100 + 0.5).toLong
    def s0d(x: Double) = math.floor(x + 0.5).toLong
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), unix_timestamp(col("ts")).as("te"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1) / 86400, s2d(r.getDouble(2))))
    val got = SparkEntry.queries("win_dft_power")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    ev.groupBy(_._1).foreach { case (et, rows) =>
      val xs = rows.groupBy(_._2).toSeq.sortBy(_._1).map(_._2.map(_._3).sum)
      val n = xs.length
      (1 to 3).foreach { k =>
        val terms = xs.zipWithIndex.map { case (x, i) =>
          val ang = 2.0 * math.Pi * (i.toLong * k).toDouble / n.toDouble
          (x * s4d(math.cos(ang)), x * s4d(math.sin(ang)))
        }
        val (a4, b4) = (terms.map(_._1).sum, terms.map(_._2).sum)
        val pw = s0d((a4.toDouble / 10000.0) * (a4.toDouble / 10000.0) +
          (b4.toDouble / 10000.0) * (b4.toDouble / 10000.0))
        assert(got((et, k.toLong)) == (n.toLong, a4, b4, pw), s"$et k=$k")
      }
      // spectrum varies across harmonics (not a constant artifact)
      val pws = (1 to 3).map(k => got((et, k.toLong))._4)
      assert(pws.distinct.size > 1, s"$et flat spectrum")
    }
  }

  test("fn_fiscal equals a java.time mirror of the April-start calendar") {
    import org.apache.spark.sql.functions.col
    val got = SparkEntry.queries("fn_fiscal")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val ords = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderdate"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1)))
    ords.foreach { case (k, ts) =>
      val ld = ts.toLocalDateTime.toLocalDate
      val (y, m) = (ld.getYear.toLong, ld.getMonthValue.toLong)
      val fy = if (m >= 4) y else y - 1
      val fm = (m + 8) % 12 + 1
      val fq = (m + 8) % 12 / 3 + 1
      val fh = if ((m + 8) % 12 < 6) 1L else 2L
      assert(got(k) == (y, m, fy, fq, fh, fm), s"order $k @$ld: ${got(k)}")
    }
    // both fiscal halves and all four quarters occur in the span
    assert(got.values.map(_._4).toSet == Set(1L, 2L, 3L, 4L))
    assert(got.values.map(_._5).toSet == Set(1L, 2L))
  }
}
