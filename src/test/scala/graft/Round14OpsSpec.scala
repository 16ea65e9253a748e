package graft

/** Independent scalar mirrors for round-14 keys (the Round*OpsSpec
  * discipline: plain driver-side Scala over collected parquet, never the
  * oracle's arithmetic path).
  */
class Round14OpsSpec extends SparkSpec {

  private def s6d(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  private def embMap: Map[Long, Array[Double]] =
    Tables.embeddings(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

  test("llm_ann_batch_ivf: every odd id graded with 10 exact-cosine ranks; mean recall@10 >= the single-query IVF rung") {
    val emb = embMap
    val qids = emb.keys.filter(_ % 2 == 1).toSeq.sorted
    val iids = emb.keys.filter(_ % 2 == 0).toSeq.sorted
    def dotl(a: Array[Double], b: Array[Double]): Long = {
      var acc = 0L; var i = 0
      while (i < a.length) {
        acc += math.floor(a(i) * b(i) * 1e14 + 0.5).toLong
        i += 1
      }
      acc
    }
    val nl = emb.map { case (k, v) => k -> dotl(v, v) }
    def cosv(q: Long, v: Long): Double =
      (dotl(emb(q), emb(v)).toDouble / 1e14) /
        (math.sqrt(nl(v).toDouble / 1e14) * math.sqrt(nl(q).toDouble / 1e14))
    // exact per-query top-10 over the index half — the batched ground
    // truth (disjoint halves, so no self-match exclusion is needed)
    val exact = qids.map(q =>
      q -> iids.sortBy(v => (-cosv(q, v), v)).take(10).toSet).toMap
    val got = SparkEntry.queries("llm_ann_batch_ivf")(spark, sfDir).collect()
    val byQ = got.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == qids.toSet, "every odd vec_id is a graded query")
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to 10L),
        s"ranks of query $q")
      rows.foreach { r => // the graded cosine mirrors the scalar chain
        assert(r.getAs[Long]("cos_sim") ==
          s6d(cosv(q, r.getAs[Long]("vec_id"))),
          s"cos_sim of (query $q, hit ${r.getAs[Long]("vec_id")})")
      }
    }
    val hits = qids.map(q =>
      byQ(q).count(r => exact(q)(r.getAs[Long]("vec_id")))).sum
    val meanRecall = hits.toDouble / (10.0 * qids.size)
    // the single-query rung's recall@10, read from its own graded output
    // (hits_ivf10 of llm_ann_recall_eval) — the VERDICT r13 item-1 bar:
    // batching must not cost recall vs the same probe law run one query
    // at a time. Both sides are deterministic on a fixed corpus and move
    // together on a regeneration (identical probe law).
    val eval = SparkEntry.queries("llm_ann_recall_eval")(spark, sfDir)
      .collect().head
    val ivfRecall = eval.getAs[Long]("hits_ivf10").toDouble / 10.0
    assert(meanRecall >= ivfRecall,
      s"batched mean recall@10 $meanRecall < single-query IVF rung $ivfRecall")
  }

  test("llm_ann_batch_nsw: batched graph search beats the batched IVF rung's recall at a bounded budget") {
    val emb = embMap
    val qids = emb.keys.filter(_ % 2 == 1).toSeq.sorted
    val iids = emb.keys.filter(_ % 2 == 0).toSeq.sorted
    def dotl(a: Array[Double], b: Array[Double]): Long = {
      var acc = 0L; var i = 0
      while (i < a.length) {
        acc += math.floor(a(i) * b(i) * 1e14 + 0.5).toLong
        i += 1
      }
      acc
    }
    val nl = emb.map { case (k, v) => k -> dotl(v, v) }
    def cosv(q: Long, v: Long): Double =
      (dotl(emb(q), emb(v)).toDouble / 1e14) /
        (math.sqrt(nl(v).toDouble / 1e14) * math.sqrt(nl(q).toDouble / 1e14))
    val exact = qids.map(q =>
      q -> iids.sortBy(v => (-cosv(q, v), v)).take(10).toSet).toMap
    def meanRecall(key: String): Double = {
      val byQ = SparkEntry.queries(key)(spark, sfDir).collect()
        .groupBy(_.getAs[Long]("query_id"))
      assert(byQ.keySet == qids.toSet, s"$key covers every odd vec_id")
      byQ.map { case (q, rows) =>
        rows.count(r => exact(q)(r.getAs[Long]("vec_id")))
      }.sum.toDouble / (10.0 * qids.size)
    }
    val nswR = meanRecall("llm_ann_batch_nsw")
    val ivfR = meanRecall("llm_ann_batch_ivf")
    // the graph search's adaptive exploration should clear the fixed
    // 2-probe IVF comfortably (measured 0.745/0.784 vs 0.33) — pin a
    // strict improvement, not the exact values
    assert(nswR > ivfR, s"batched nsw recall $nswR <= batched ivf $ivfR")
    // budget: per-query visited stays within the geometry's bound
    val vs = SparkEntry.queries("llm_ann_batch_nsw")(spark, sfDir).collect()
      .map(_.getAs[Long]("n_visited"))
    assert(vs.forall(v => v > 0 && v <= operators.LlmExtras.NswMaxVisited),
      s"visited out of bounds: ${vs.max}")
  }

  test("eo_idw equals a scalar ring-IDW mirror; weights and estimates vary") {
    val evs = Tables.events(spark, sfDir).select("event_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val st = evs
      .filter { case (id, _) => Det.hash32Scala(s"idw:$id") % 20 == 0 }
      .map { case (id, v) =>
        (id * 37 % 256, id * 13 % 256, math.floor(v * 1e6 + 0.5).toLong)
      }
    val expect = (for (gx <- 0L until 16L; gy <- 0L until 16L) yield {
      val nbrs = st.filter { case (sx, sy, _) =>
        math.abs(sx / 16 - gx) <= 1 && math.abs(sy / 16 - gy) <= 1 }
      if (nbrs.isEmpty) None else {
        val ws = nbrs.map { case (sx, sy, v6) =>
          val d2 = (sx - (gx * 16 + 8)) * (sx - (gx * 16 + 8)) +
            (sy - (gy * 16 + 8)) * (sy - (gy * 16 + 8))
          (math.floor(1e6 / (d2 + 1)).toLong, v6)
        }
        val sw = ws.map(_._1).sum
        val swv = ws.map { case (w, v) => w * v }.sum
        Some((gx, gy, nbrs.length.toLong, (2 * swv + sw) / (2 * sw)))
      }
    }).flatten
    val got = SparkEntry.queries("eo_idw")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect.toSeq, s"idw mirror mismatch (${got.take(3)}…)")
    // degenerate-lane guard: estimates and neighbor counts must vary
    assert(got.map(_._4).distinct.size > got.size / 2, "est6 collapsed")
    assert(got.map(_._3).distinct.size > 3, "n_nbrs collapsed")
  }

  test("eo_polygon_dissolve equals a scalar sweep mirror; inclusion-exclusion holds") {
    // the key's column sweep, run as plain Scala
    def unionByColumn(rects: Seq[(Long, Long, Long, Long, Long)])
        : Map[Long, (Long, Long)] = // x -> (rawl, union)
      rects.flatMap { case (id, x0, y0, x1, y1) =>
        (x0 until x1).map(x => (x, y0, y1, id)) }
        .groupBy(_._1).map { case (x, ivs) =>
          var pm = Long.MinValue
          var union = 0L
          ivs.sortBy(t => (t._2, t._3, t._4)).foreach { case (_, y0, y1, _) =>
            val lo = if (pm == Long.MinValue) y0 else math.max(y0, pm)
            union += math.max(0L, y1 - lo)
            pm = math.max(if (pm == Long.MinValue) y1 else pm, y1)
          }
          x -> (ivs.map(t => t._3 - t._2).sum, union)
        }
    // (1) inclusion-exclusion on a hand-checked overlap: [0,10)x[0,10)
    // ∪ [5,15)x[5,15) = 100 + 100 − 25 = 175
    val lit2 = Seq((1L, 0L, 0L, 10L, 10L), (2L, 5L, 5L, 15L, 15L))
    assert(unionByColumn(lit2).values.map(_._2).sum == 175L,
      "inclusion-exclusion law")
    // (2) full mirror on the graded corpus
    val fp = Tables.events(spark, sfDir).select("event_id").collect()
      .map(_.getLong(0)).map { id =>
        (id, id % 256, id * 37 % 256,
          id % 256 + 8 + id % 25, id * 37 % 256 + 8 + id * 13 % 25)
      }
    val byCol = unionByColumn(fp.toSeq)
    val expect = byCol.toSeq.groupBy(_._1 / 16).map { case (band, xs) =>
      (band, xs.size.toLong, xs.map(_._2._1).sum, xs.map(_._2._2).sum)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("eo_polygon_dissolve")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect, s"dissolve mirror mismatch (${got.take(3)}…)")
    // the dissolve actually dissolved: union strictly below raw length
    assert(got.map(_._4).sum < got.map(_._3).sum, "no overlap was merged")
  }

  test("llm_unigram_train equals a scalar hard-EM mirror; all three lattice paths fire") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // units = adjacent token pairs joined by '_', odd tail stays single
    def unitsOf(t: String): Seq[String] =
      t.split(" ").grouped(2).map(_.mkString("_")).toSeq
    def types(par: Long): Map[(String, String), Long] = docs
      .filter(_._1 % 2 == par)
      .flatMap { case (_, l, t) => unitsOf(t).map(u => (l, u)) }
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val wt = types(0); val ht = types(1)
    def lp6Of(vocab: Map[(String, String), Long]): Map[(String, String), Long] = {
      val tot = vocab.groupBy(_._1._1)
        .map { case (l, m) => l -> (m.values.sum, m.size.toLong) }
      vocab.map { case ((l, p), c) =>
        (l, p) -> math.floor(
          Det.lnRatioD(c + 1, tot(l)._1 + tot(l)._2) * 1e6 + 0.5).toLong
      }
    }
    def halves(w: String): (String, String) = {
      val i = w.indexOf('_')
      (w.substring(0, i), w.substring(i + 1))
    }
    // path per unit: 0 whole, 1 split, 2 chars (ties whole > split > chars)
    def path(l: String, w: String,
        lp: Map[(String, String), Long]): Int = {
      val llc = w.map(c => lp.getOrElse((l, c.toString), 0L)).sum
      val llw = if (w.length >= 2) lp.get((l, w)) else None
      val lls = if (w.contains('_')) {
        val (a, b) = halves(w)
        for (x <- lp.get((l, a)); y <- lp.get((l, b))) yield x + y
      } else None
      if (llw.exists(v => v >= lls.getOrElse(Long.MinValue) && v >= llc)) 0
      else if (lls.exists(_ >= llc)) 1 else 2
    }
    val seed = collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    wt.foreach { case ((l, w), f) =>
      if (w.length >= 2) seed((l, w)) += f
      if (w.contains('_')) { val (a, b) = halves(w); seed((l, a)) += f; seed((l, b)) += f }
      w.foreach(c => seed((l, c.toString)) += f)
    }
    val chars = wt.keys.flatMap { case (l, w) => w.map(c => (l, c.toString)) }.toSet
    var lp = lp6Of(seed.toMap)
    var surv = Map.empty[(String, String), Long]
    var lastPaths = Map.empty[(String, String), Int]
    for (_ <- 1 to operators.LlmExtras.UnigramRounds) {
      lastPaths = wt.keys.map(k => k -> path(k._1, k._2, lp)).toMap
      val cnt = collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      wt.foreach { case ((l, w), f) =>
        lastPaths((l, w)) match {
          case 0 => cnt((l, w)) += f
          case 1 => val (a, b) = halves(w); cnt((l, a)) += f; cnt((l, b)) += f
          case _ => w.foreach(c => cnt((l, c.toString)) += f)
        }
      }
      surv = cnt.toMap.filter(_._1._2.length >= 2)
        .groupBy(_._1._1).flatMap { case (_, m) =>
          val ranked = m.toSeq.sortBy { case ((_, p), c) => (-c, p) }
          ranked.take(((3 * ranked.size + 3) / 4).toInt)
        }
      val vocab = surv ++ chars.map(k => k -> cnt.toMap.getOrElse(k, 0L))
      lp = lp6Of(vocab)
    }
    val hh = ht.toSeq.groupBy(_._1._1).map { case (l, m) =>
      val (p, w) = m.map { case ((_, word), f) =>
        (path(l, word, lp) match {
          case 0 => f; case 1 => 2 * f; case _ => word.length * f
        }, f)
      }.unzip
      l -> (p.sum, w.sum)
    }
    val expect = surv.toSeq.map { case ((l, p), c) =>
      (l, p, c, lp((l, p)), hh(l)._1, hh(l)._2)
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("llm_unigram_train")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect, s"unigram mirror mismatch (${got.take(2)}…)")
    // degenerate-lane guard: the lattice genuinely competes — every path
    // chosen somewhere in the final round, and pruning was non-trivial
    assert(lastPaths.values.toSet == Set(0, 1, 2),
      s"dead lattice path: ${lastPaths.values.toSet}")
    assert(got.map(t => (t._1, t._2)).toSet.size < seed.keySet.count(_._2.length >= 2),
      "pruning removed nothing")
  }
}
