package graft

import org.apache.spark.sql.functions._

/** Round-7 corpus-assembly operators: hash-gated stratified sampling,
  * mixture weights, and near-dup connected components. */
class CorpusSpec extends SparkSpec {

  test("stratified sample is deterministic and tracks its per-lang rate") {
    val q = SparkEntry.queries("llm_sample_stratified")
    val r1 = q(spark, sfDir).collect()
    val r2 = q(spark, sfDir).collect()
    // hash gate => bit-identical across runs (no RNG, no partition-order
    // dependence)
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
    // every lang's realized rate is within a loose binomial band of its
    // declared permille (500-doc corpus: 4 sigma)
    val total = Tables.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = r1.groupBy(_.getString(1))
    sampled.foreach { case (lang, rows) =>
      val p = rows.head.getLong(2) / 1000.0
      val n = total(lang).toDouble
      val sigma = math.sqrt(n * p * (1 - p))
      assert(math.abs(rows.length - n * p) <= 4 * sigma + 1,
        s"$lang: ${rows.length} of $n at p=$p")
    }
    // the filter is map-only: no shuffle in the plan before the sort
    val plan = q(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"), s"sample plan aggregates:\n$plan")
  }

  test("mix weights: shares sum to ~1e6 per axis and counts are exact") {
    val rows = SparkEntry.queries("llm_mix_weights")(spark, sfDir).collect()
    assert(rows.map(_.getLong(2)).sum == 500) // n_docs covers the corpus
    val corpusShares = rows.map(_.getLong(4)).sum
    assert(math.abs(corpusShares - 1000000L) <= rows.length, // s6 rounding
      s"corpus shares sum to $corpusShares")
    rows.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      val s = rs.map(_.getLong(5)).sum
      assert(math.abs(s - 1000000L) <= rs.length, s"$lang lang shares sum to $s")
    }
  }

  test("dedup clusters equal an independent union-find over the exact pair graph") {
    // brute-force reference: same masks semantics recomputed from raw
    // text in Scala, pairs by direct Jaccard, components by union-find
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val sets = docs.map { case (id, lang, text) =>
      (id, lang, text.split(" ").toSet)
    }
    val parent = scala.collection.mutable.Map(sets.map(s => s._1 -> s._1): _*)
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r)
      var c = x; while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def union(x: Long, y: Long): Unit = {
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
    }
    sets.groupBy(_._2).foreach { case (_, ds) =>
      for (i <- ds.indices; j <- (i + 1) until ds.length) {
        val (a, b) = (ds(i)._3, ds(j)._3)
        val inter = (a & b).size.toDouble
        if (inter / (a | b).size >= 0.5) union(ds(i)._1, ds(j)._1)
      }
    }
    val expect = sets.map(_._1).groupBy(find)
      .map { case (root, ms) => (root, ms.length.toLong, ms.max) }
      .toSeq.sortBy(_._1)
    val got = SparkEntry.queries("llm_dedup_cluster")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
  }
}
