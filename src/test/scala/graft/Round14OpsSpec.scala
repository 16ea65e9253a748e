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
}
