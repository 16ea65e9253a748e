package graft

/** Independent scalar mirrors for round-16 keys (the Round*OpsSpec
  * discipline: plain driver-side Scala over collected parquet, never the
  * oracle's arithmetic path).
  */
class Round16OpsSpec extends SparkSpec {

  private def embMap: Map[Long, Array[Double]] =
    Tables.embeddings(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

  private def sl2s(a: Array[Double], b: Array[Double]): Long = {
    var acc = 0L; var i = 0
    while (i < a.length) {
      val dd = a(i) - b(i)
      acc += math.floor(dd * dd * 1e14 + 0.5).toLong
      i += 1
    }
    acc
  }

  test("llm_ann_hnsw_upsert: edge census + exact link distances + " +
    "insertion-quality parity vs the exact local neighborhood") {
    val emb = embMap
    val ids = emb.keys.filter(_ != 0L).toSeq.sorted
    // the ivf_upsert hash split, scalar side (hash32Scala is the pinned
    // twin of the Column/SQL forms — DetLemmaSpec)
    val deltaSet = ids.filter(v => Det.hash32Scala(s"upsert:$v") % 4 == 0).toSet
    val baseIds = ids.filterNot(deltaSet)
    val got = SparkEntry.queries("llm_ann_hnsw_upsert")(spark, sfDir).collect()
    val byQ = got.groupBy(_.getAs[Long]("query_id"))
    // census law 1: every delta node (and only delta nodes) inserts
    assert(byQ.keySet == deltaSet, "inserted node set == the hash split")
    byQ.foreach { case (q, rows) =>
      // census law 2: exactly NswM links, ranks 1..4, d2 non-decreasing
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to 4L),
        s"link ranks of delta $q")
      val sorted = rows.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("d2")).toSeq ==
        sorted.map(_.getAs[Long]("d2")).sortBy(identity).toSeq,
        s"link distances of delta $q ordered by rank")
      sorted.foreach { r =>
        val t = r.getAs[Long]("vec_id")
        // census law 3: links go to BASE members only — never to the
        // query vector, another delta, or the node itself
        assert(t != 0L && t != q && !deltaSet(t), s"link target $t of $q")
        // exact-arithmetic law: d2 is the scaled-long L2, re-derived
        // scalar-side (independent of both engines' plans)
        assert(r.getAs[Long]("d2") == sl2s(emb(q), emb(t)),
          s"d2 of link ($q -> $t)")
      }
    }
    // insertion-quality parity (the merged-vs-rebuilt lemma, VERDICT r15
    // #3): a rebuilt-from-scratch index would wire each delta to (a
    // pool-restricted approximation of) its true neighborhood; the
    // inserted links must stay comparable to the EXACT 4-NN among base.
    // MEASURED mean link-recall@4 on this uniform-noise ANN-hostile
    // corpus: 0.662 (sf0.001) / 0.705 (sf0.01) — in the family band
    // (batch-hnsw recall@10 0.756/0.792). Floor pinned one stall below
    // the weaker measurement.
    val recall = byQ.toSeq.map { case (q, rows) =>
      val exact4 = baseIds.sortBy(v => (sl2s(emb(q), emb(v)), v)).take(4).toSet
      rows.count(r => exact4(r.getAs[Long]("vec_id"))).toDouble / 4.0
    }
    val mean = recall.sum / recall.size
    assert(mean >= 0.55, s"mean link-recall@4 = $mean")
    // budget law: the descent's visited set stays bounded (measured
    // 129-221 at sf0.001; geometry bound, not corpus-size-proportional)
    got.foreach { r =>
      assert(r.getAs[Long]("n_visited") <= 320L,
        s"visited budget of delta ${r.getAs[Long]("query_id")}")
    }
  }
}
