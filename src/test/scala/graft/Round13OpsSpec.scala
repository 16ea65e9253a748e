package graft

/** Independent scalar mirrors for round-13 keys (the Round*OpsSpec
  * discipline: plain driver-side Scala over collected parquet, never the
  * oracle's arithmetic path).
  */
class Round13OpsSpec extends SparkSpec {

  private def h32(str: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(str.getBytes("UTF-8"))
    ((d(3) & 0xffL) << 24) | ((d(2) & 0xffL) << 16) |
      ((d(1) & 0xffL) << 8) | (d(0) & 0xffL)
  }

  private def hud(s: Long, n: Long): Long = (2 * s + n) / (2 * n) // nonneg

  private def s6d(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  private def embMap: Map[Long, Array[Double]] =
    Tables.embeddings(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

  test("dq_outlier_lof_ann: flagged-set agreement >= 0.9 vs exact all-pairs LOF; both lanes fire") {
    val emb = embMap
    val ids = emb.keys.toSeq.sorted
    def d6(a: Array[Double], b: Array[Double]): Long = {
      var acc = 0L; var i = 0
      while (i < a.length) {
        val dd = a(i) - b(i)
        acc += math.floor(dd * dd * 1e10 + 0.5).toLong
        i += 1
      }
      s6d(math.sqrt(acc.toDouble / 1e10))
    }
    val cap = 1000000000L
    // exact LOF over ALL pairs — the ground truth the ANN funnel
    // approximates (the key's label-free analogue of dq_outlier_lof)
    val pd = ids.map(p =>
      p -> ids.filter(_ != p).map(o => o -> d6(emb(p), emb(o))).toMap).toMap
    val kd = ids.map { p =>
      p -> pd(p).toSeq.sortBy { case (o, dd) => (dd, o) }.apply(4)._2
    }.toMap
    val nk = ids.map(p => p -> pd(p).filter(_._2 <= kd(p)).keys.toSeq).toMap
    val lrd = ids.map { p =>
      val rds = nk(p).map(o => math.max(kd(o), pd(p)(o)))
      val srd = rds.sum
      p -> math.min(cap,
        if (srd == 0) cap else hud(rds.length.toLong * 1000000000000L, srd))
    }.toMap
    val exactFlag = ids.map { p =>
      val st = nk(p).map(o => hud(lrd(o) * 1000000L, lrd(p))).sum
      p -> (if (hud(st, nk(p).length.toLong) > 1015000L) 1L else 0L)
    }.toMap
    val got = SparkEntry.queries("dq_outlier_lof_ann")(spark, sfDir)
      .select("vec_id", "flagged").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == ids.toSet, "one LOF row per vector")
    val agree = ids.count(p => got(p) == exactFlag(p)).toDouble / ids.size
    assert(agree >= 0.9, s"flagged-set agreement $agree < 0.9")
    assert(got.values.exists(_ == 1L) && got.values.exists(_ == 0L),
      "both flag lanes fire")
  }

  test("llm_ann_nsw: recall@10 >= the IVF-PQ rung at bounded budget; hit flags exact") {
    val emb = embMap
    val q = emb(0L)
    def dotl(a: Array[Double], b: Array[Double]): Long = {
      var acc = 0L; var i = 0
      while (i < a.length) {
        acc += math.floor(a(i) * b(i) * 1e14 + 0.5).toLong; i += 1
      }
      acc
    }
    def cos(v: Array[Double]): Double =
      (dotl(v, q).toDouble / 1e14) /
        (math.sqrt(dotl(v, v).toDouble / 1e14) * math.sqrt(dotl(q, q).toDouble / 1e14))
    val top10 = emb.keys.filter(_ != 0L).toSeq
      .sortBy(v => (-cos(emb(v)), v)).take(10).toSet
    val nsw = SparkEntry.queries("llm_ann_nsw")(spark, sfDir).collect()
    assert(nsw.length == 10, "top-10 rows")
    val hits = nsw.map(_.getAs[Long]("in_exact10")).sum
    val visited = nsw.head.getAs[Long]("n_visited")
    nsw.foreach { r =>
      val expectHit = if (top10(r.getAs[Long]("vec_id"))) 1L else 0L
      assert(r.getAs[Long]("in_exact10") == expectHit,
        s"hit flag of ${r.getAs[Long]("vec_id")}")
    }
    val ivfpqHits = SparkEntry.queries("llm_ann_ivfpq")(spark, sfDir)
      .collect().map(_.getLong(0)).count(top10)
    assert(hits >= ivfpqHits, s"nsw $hits < ivfpq $ivfpqHits")
    // bounds live next to the NSW geometry they were swept with
    // (LlmExtras.NswMinHits10/NswMaxVisited) — a regen re-tunes one place
    assert(hits >= operators.LlmExtras.NswMinHits10,
      s"nsw recall@10 $hits/10 (measured 8-9)")
    assert(visited > 0 && visited <= operators.LlmExtras.NswMaxVisited,
      s"candidate budget $visited")
  }

  test("eo_polygon_overlay equals a ray-cast rasterized mirror; decomposition law holds") {
    val aois = operators.EO.OverlayAois
    val rects = operators.EO.OverlayAoiRects
    // (1) Σ disjoint-rect areas == shoelace area, per AOI
    val shoelace = aois.map { p =>
      math.abs(p.indices.map { i =>
        val (x1, y1) = p(i); val (x2, y2) = p((i + 1) % p.size)
        x1.toLong * y2 - x2.toLong * y1
      }.sum) / 2
    }
    aois.indices.foreach { id =>
      val ra = rects(id).map { case (x0, y0, x1, y1) =>
        (x1 - x0).toLong * (y1 - y0)
      }.sum
      assert(shoelace(id) == ra, s"aoi $id: shoelace ${shoelace(id)} != rects $ra")
      for (i <- rects(id).indices; j <- rects(id).indices if i < j) {
        val a = rects(id)(i); val b = rects(id)(j)
        val ox = math.min(a._3, b._3) - math.max(a._1, b._1)
        val oy = math.min(a._4, b._4) - math.max(a._2, b._2)
        assert(ox <= 0 || oy <= 0, s"aoi $id rects $i,$j overlap")
      }
    }
    // (2) rasterized PIP mirror: per AOI a 288x288 inside-raster from a
    // ray cast over the VERTEX list (independent of the rectangle
    // decomposition), prefix-summed so a footprint's intersection is an
    // O(1) rectangle sum
    val n = 288
    def inPoly(p: Seq[(Int, Int)], cx: Double, cy: Double): Boolean = {
      var c = false; var i = 0
      while (i < p.size) {
        val (x1, y1) = p(i); val (x2, y2) = p((i + 1) % p.size)
        if ((y1 > cy) != (y2 > cy) &&
          cx < x1 + (cy - y1) * (x2 - x1).toDouble / (y2 - y1)) c = !c
        i += 1
      }
      c
    }
    val prefix = aois.map { p =>
      val ps = Array.ofDim[Long](n + 1, n + 1)
      for (y <- 0 until n; x <- 0 until n) {
        val in = if (inPoly(p, x + 0.5, y + 0.5)) 1L else 0L
        ps(y + 1)(x + 1) = in + ps(y)(x + 1) + ps(y + 1)(x) - ps(y)(x)
      }
      ps
    }
    def rectSum(ps: Array[Array[Long]], x0: Long, y0: Long, x1: Long, y1: Long): Long = {
      val (a, b) = (math.max(0, x0).toInt, math.max(0, y0).toInt)
      val (c, dd) = (math.min(n.toLong, x1).toInt, math.min(n.toLong, y1).toInt)
      if (c <= a || dd <= b) 0L
      else ps(dd)(c) - ps(b)(c) - ps(dd)(a) + ps(b)(a)
    }
    val scenes = Tables.events(spark, sfDir).select("event_id").collect()
      .map(_.getLong(0))
    val perAoi = aois.indices.map { id =>
      val hits = scenes.flatMap { sid =>
        val fx0 = sid % 256; val fy0 = sid * 37 % 256
        val fx1 = fx0 + 8 + sid % 25; val fy1 = fy0 + 8 + sid * 13 % 25
        val inter = rectSum(prefix(id), fx0, fy0, fx1, fy1)
        if (inter > 0) {
          val fpArea = (fx1 - fx0) * (fy1 - fy0)
          val iou = s6d(inter.toDouble / (fpArea + shoelace(id) - inter).toDouble)
          Some((sid, inter, iou))
        } else None
      }
      (id.toLong, shoelace(id), hits.length.toLong, hits.map(_._2).sum,
        hits.map(_._1).sum, hits.map(_._3).max)
    }.filter(_._3 > 0)
    val got = SparkEntry.queries("eo_polygon_overlay")(spark, sfDir).collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)
    assert(got.nonEmpty, "overlay output must not be empty")
    assert(got == perAoi, s"got ${got}\nexpect $perAoi")
  }

  test("agg_kll equals an order-free scalar compactor mirror; rank error inside the structural bound") {
    val rows = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "value").collect()
      .map(r => (s6d(r.getDouble(2)), r.getLong(0), r.getLong(1) % 32))
    // deterministic SHUFFLE of the input order: the mirror must still
    // reproduce the key exactly — the merge-order-free law
    val shuffled = rows.sortBy(t => (t._2 * 2654435761L) % 1000003)
    def compact(items: Seq[(Long, Long)], off: Long): Seq[(Long, Long)] =
      items.sortBy(identity).zipWithIndex
        .filter { case (_, i) => (i + 1) % 2 == off }.map(_._1)
    val l0 = shuffled.groupBy(_._3).toSeq.flatMap { case (b, xs) =>
      compact(xs.map(t => (t._1, t._2)), h32(s"kll:$b") % 2)
        .map { case (v, eid) => (v, eid, b / 4) }
    }
    val l1 = l0.groupBy(_._3).toSeq.flatMap { case (sb, xs) =>
      compact(xs.map(t => (t._1, t._2)), h32(s"kll:s:$sb") % 2)
    }.sortBy(identity)
    val w = 4L * l1.length
    def est(p: Long): Long = {
      val target = (p * w + 99) / 100
      l1(((target + 3) / 4 - 1).toInt)._1 // cumw of item i (1-based) = 4i
    }
    val exactSorted = rows.map(_._1).sorted
    val got = SparkEntry.queries("agg_kll")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("p") ->
        ((r.getAs[Long]("est6"), r.getAs[Long]("n_rows"),
          r.getAs[Long]("w_total"), r.getAs[Long]("n_retained")))).toMap
    assert(got.keySet == Set(25L, 50L, 75L))
    Seq(25L, 50L, 75L).foreach { p =>
      val (e, nr, wt, ret) = got(p)
      assert(e == est(p), s"p$p: key ${e} != mirror ${est(p)}")
      assert(nr == rows.length && wt == w && ret == l1.length, s"p$p budget")
      // structural compactor bound: each of the 32 L0 compactions
      // perturbs a rank by <= 1, each of the 8 L1 compactions by <= 2,
      // plus the final weight-4 quantization
      val rank = exactSorted.count(_ <= e)
      val target = p.toDouble * rows.length / 100
      assert(math.abs(rank - target) <= 32 + 16 + 4,
        s"p$p rank error ${math.abs(rank - target)}")
    }
  }

  test("llm_bpe_train equals a symbol-list mirror on the split; held-out compression is real") {
    val k = 6
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def vocab(par: Long): Map[String, Map[List[String], Long]] =
      docs.filter(_._1 % 2 == par)
        .flatMap { case (_, lang, text) => text.split(" ").map(t => (lang, t)) }
        .groupBy(_._1)
        .map { case (lang, ts) =>
          lang -> ts.groupBy(_._2).map { case (t, xs) =>
            t.split("").toList -> xs.length.toLong
          }
        }
    def greedyMerge(syms: List[String], a: String, b: String): List[String] = {
      val out = List.newBuilder[String]
      var rest = syms
      while (rest.nonEmpty) rest match {
        case x :: y :: tail if x == a && y == b => out += (a + b); rest = tail
        case x :: tail => out += x; rest = tail
        case Nil => ()
      }
      out.result()
    }
    val sep = "\u001f"
    val train0 = vocab(0); val held0 = vocab(1)
    def syms(v: Map[List[String], Long]): Long =
      v.map { case (s2, f) => s2.length * f }.sum
    val expect = collection.mutable.Map.empty[(String, Long), (String, Long)]
    var train = train0; var held = held0
    (1 to k).foreach { r =>
      val picks = train.map { case (lang, v) =>
        val counts = collection.mutable.Map.empty[(String, String), Long]
        v.foreach { case (sy, f) =>
          sy.zip(sy.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
        }
        val ((a, b), cnt) = counts.minBy { case ((a1, b1), n1) =>
          (-n1, sep + a1 + sep + sep + b1 + sep)
        }
        expect((lang, r.toLong)) = (a + b, cnt)
        lang -> ((a, b))
      }
      def applyAll(vs: Map[String, Map[List[String], Long]]) = vs.map {
        case (lang, v) =>
          lang -> (picks.get(lang) match {
            case Some((a, b)) => v.toSeq
              .map { case (sy, f) => greedyMerge(sy, a, b) -> f }
              .groupBy(_._1).map { case (sy, xs) => sy -> xs.map(_._2).sum }
            case None => v
          })
      }
      train = applyAll(train); held = applyAll(held)
    }
    val got = SparkEntry.queries("llm_bpe_train")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == expect.keySet.toSet, "merge-table keys")
    got.foreach { case ((lang, r), (m, cnt, h0, hk)) =>
      assert((m, cnt) == expect((lang, r)), s"($lang,$r) merge")
      assert(h0 == syms(held0(lang)), s"$lang heldout_syms0")
      assert(hk == syms(held(lang)), s"$lang heldout_symsk")
      assert(hk < h0, s"$lang: held-out compression lane dead ($hk !< $h0)")
    }
  }

  test("llm_langid_nb equals a scalar NB mirror; diagonal mass beats chance") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val train = docs.filter(_._1 % 2 == 0)
    val heldout = docs.filter(_._1 % 2 == 1)
    val cnt = collection.mutable.Map.empty[(String, String), Long]
    val tot = collection.mutable.Map.empty[String, Long]
    train.foreach { case (_, lang, t) =>
      t.split(" ").foreach { w =>
        cnt((lang, w)) = cnt.getOrElse((lang, w), 0L) + 1
        tot(lang) = tot.getOrElse(lang, 0L) + 1
      }
    }
    val voc = cnt.keys.map(_._2).toSet
    val langs = tot.keys.toSeq.sorted
    val vn = voc.size.toLong
    val nd = train.groupBy(_._2).map { case (l, xs) => l -> xs.length.toLong }
    val na = train.length.toLong
    val lp = (for (l <- langs; w <- voc)
      yield (l, w) -> s6d(Det.lnRatioD(cnt.getOrElse((l, w), 0L) + 1, tot(l) + vn))).toMap
    val pri = langs.map(l => l -> s6d(Det.lnRatioD(nd(l), na))).toMap
    val conf = collection.mutable.Map.empty[(String, String), Long]
    heldout.foreach { case (_, lang, t) =>
      val ws = t.split(" ").filter(voc)
      if (ws.nonEmpty) { // the key's inner join: out-of-vocab-only docs drop
        val best = langs.map { l =>
          (l, pri(l) + ws.groupBy(identity).map { case (w, xs) =>
            xs.length * lp((l, w))
          }.sum)
        }.minBy { case (l, sc) => (-sc, l) }._1
        conf((lang, best)) = conf.getOrElse((lang, best), 0L) + 1
      }
    }
    val got = SparkEntry.queries("llm_langid_nb")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == conf.toMap, s"confusion mismatch: got $got\nexpect $conf")
    val diag = conf.collect { case ((a, b), n) if a == b => n }.sum
    val n = conf.values.sum
    assert(diag.toDouble / n >= 1.2 / langs.size,
      s"diagonal $diag/$n does not beat 1.2x the 1/${langs.size} chance floor")
  }

  test("stream_exec_changelog equals the batch fold and physically writes changelogs") {
    val got = SparkEntry.queries("stream_exec_changelog")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val expect = Tables.events(spark, sfDir)
      .select("event_type", "ts", "value").collect()
      .map { r =>
        val te = r.getTimestamp(1).getTime / 1000L
        ((r.getString(0), te / 3600L * 3600L),
          math.floor(r.getDouble(2) * 1e6 + 0.5).toLong)
      }
      .groupBy(_._1).toSeq
      .map { case ((t, w), xs) => (t, w, xs.length.toLong, xs.map(_._2).sum) }
      .sortBy(x => (x._1, x._2))
    assert(got == expect, s"changelog restart fold mismatch (${got.take(3)}…)")
    // physical proof the CHANGELOG recovery path ran: the key's
    // checkpoint holds .changelog commits (RocksDB changelog
    // checkpointing), which the HDFS/snapshot restart twin never writes
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    // exact checkpoint path published by THE run under test (no tmpdir
    // glob — a stale dir from a prior run could win maxBy(lastModified))
    val dirs = streaming.StreamTwins.chlogDirs.get()
    assert(dirs != null, "stream_exec_changelog did not publish its dirs")
    val nCh = walk(dirs._2.toFile).count(_.getName.endsWith(".changelog"))
    assert(nCh > 0, s"no .changelog files under ${dirs._2}")
  }

  test("sql_qualify equals a scalar top-3 mirror; sql_tablesample is the pure hash gate") {
    val custs = Tables.load(spark, sfDir, "customer")
      .select("c_mktsegment", "c_custkey", "c_acctbal").collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val expectQ = custs.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      xs.sortBy(t => (-t._3, t._2)).take(3)
    }.sortBy(t => (t._1, t._2))
    val gotQ = SparkEntry.queries("sql_qualify")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotQ == expectQ, "qualify rewrite == scalar top-3 mirror")

    val orders = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val expectS = orders.filter { case (k2, _) => h32(s"ts:$k2") % 10 < 2 }
      .sortBy(_._1).toSeq
    val gotS = SparkEntry.queries("sql_tablesample")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotS == expectS, "hash-gate sample row-for-row")
    val frac = gotS.length.toDouble / orders.length
    assert(frac > 0.1 && frac < 0.3, s"sample fraction $frac (expect ~0.2)")
  }
}
