package graft

import org.apache.spark.sql.functions._

/** Accuracy/recall tests for the approximate keys (SURVEY §6.2): HLL vs
  * exact, MinHash-LSH and SimHash vs the exact Jaccard pass, ANN-LSH vs
  * the brute-force top-k, and determinism (two runs, identical rows). */
class SketchSpec extends SparkSpec {

  test("agg_hll within 5% of exact distinct counts") {
    val approx = SparkEntry.queries("agg_hll")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n <= 0.05,
        s"$k: approx=${approx(k)} exact=$n")
    }
  }

  test("agg_hll_merge: split-build-merge estimate equals the single-pass sketch") {
    val merged = SparkEntry.queries("agg_hll_merge")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sorted
    val single = SparkEntry.queries("agg_hll")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sorted
    // register-wise MAX over any partition of the items equals the global
    // register table, so the merge path must reproduce agg_hll exactly
    assert(merged == single)
  }

  test("agg_hll_intersect within 15% of exact pairwise overlaps") {
    val approx = SparkEntry.queries("agg_hll_intersect")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val users = Tables.events(spark, sfDir)
      .select("event_type", "user_id").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    val types = users.keys.toSeq.sorted
    for (ta <- types; tb <- types if ta < tb) {
      val exact = (users(ta) & users(tb)).size
      val est = approx((ta, tb))
      // inclusion-exclusion compounds three LC-regime estimates; allow
      // 15% relative or ±4 absolute, whichever is looser
      assert(math.abs(est - exact) <= math.max(4.0, 0.15 * exact),
        s"($ta,$tb): est=$est exact=$exact")
    }
  }

  test("agg_hist_merge: half-built merged histogram equals the single-pass quantiles") {
    val merged = SparkEntry.queries("agg_hist_merge")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val single = SparkEntry.queries("agg_approx_pct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // the grid is pinned by the same global (min,max), and count SUM over
    // any partition of the rows equals the global histogram — so the
    // merge path must reproduce agg_approx_pct EXACTLY, not approximately
    assert(merged == single)
  }

  test("agg_countmin: estimates are >= exact counts and within e/w * N") {
    val est = SparkEntry.queries("agg_countmin")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    // CMS bias is one-sided (collisions only ADD); published bound:
    // est <= exact + (e/w) * N with prob 1 - e^-d (w=256, d=4)
    val eps = math.E / 256.0
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k: CMS underestimated — est=${est(k)} exact=$n")
      assert(est(k) <= n + eps * total,
        s"$k: est=${est(k)} exceeds exact=$n + ${eps * total}")
    }
  }

  test("llm_minhash_est tracks exact Jaccard on candidate pairs (Broder estimator)") {
    val est = SparkEntry.queries("llm_minhash_est")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3) / 1e6).toMap
    val exact = SparkEntry.queries("llm_dedup_near")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2) / 1e6).toMap
    val shared = est.keySet & exact.keySet
    assert(shared.nonEmpty)
    // per-pair: sd of a 16-component estimate is sqrt(j(1-j))/4 <= 0.125;
    // allow 4 sd. aggregate: the unbiased estimator's mean error shrinks
    // as 1/sqrt(n), allow 0.1
    shared.foreach { p =>
      assert(math.abs(est(p) - exact(p)) <= 0.5, s"$p: est=${est(p)} j=${exact(p)}")
    }
    val meanErr = shared.toSeq.map(p => est(p) - exact(p)).sum / shared.size
    assert(math.abs(meanErr) <= 0.1, s"mean signed error $meanErr")
  }

  test("llm_minhash candidates recall most exact near-dup pairs") {
    val exact = SparkEntry.queries("llm_dedup_near")(spark, sfDir)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = SparkEntry.queries("llm_minhash")(spark, sfDir)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 4x4 banding targets high similarity; require >=60% recall of j>=0.5 pairs
    val recall = if (exact.isEmpty) 1.0
      else exact.count(cand.contains).toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall over ${exact.size} exact pairs")
  }

  test("llm_simhash: near-dup pairs closer in hamming space than random pairs") {
    val sig = SparkEntry.queries("llm_simhash")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val near = SparkEntry.queries("llm_dedup_near")(spark, sfDir)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val nearMean = near.map { case (a, b) => ham(sig(a), sig(b)) }.sum.toDouble / near.length
    val ids = sig.keys.toArray.sorted
    val randomPairs = ids.take(50).flatMap(a => ids.takeRight(50).map(b => (a, b)))
      .filter { case (a, b) => a < b }
    val randMean = randomPairs.map { case (a, b) => ham(sig(a), sig(b)) }
      .sum.toDouble / randomPairs.length
    assert(nearMean < randMean,
      s"near-dup mean hamming $nearMean !< random mean $randMean")
  }

  test("llm_ann_ivf probes nearest cells and ranks by cosine") {
    val rows = SparkEntry.queries("llm_ann_ivf")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 3)
    val sims = rows.map(_.getLong(2))
    assert(sims.sameElements(sims.sorted.reverse), "not ranked desc")
    assert(rows.map(_.getInt(1)).distinct.length <= 2, "probed more than 2 cells")
  }

  test("llm_ann_lsh returns same-bucket vectors ranked by cosine") {
    val rows = SparkEntry.queries("llm_ann_lsh")(spark, sfDir).collect()
    assert(rows.length <= 3 && rows.nonEmpty)
    val sims = rows.map(_.getLong(2))
    assert(sims.sameElements(sims.sorted.reverse), "not ranked desc")
  }

  test("llm_dedup_pipeline is exact beyond a 63-token vocabulary (multiword masks)") {
    // 70-token vocabulary: a single 64-bit mask would silently wrap
    // shiftleft mod 64 and corrupt the Jaccards; the multiword (w, bit)
    // layout must stay exact. Regression for VERDICT r01 "What's wrong" #3.
    import spark.implicits._
    val vocab = (0 until 70).map(i => f"tok$i%02d")
    def doc(id: Long, toks: Seq[String], lang: String) = {
      val text = toks.mkString(" ")
      (id, text, lang, "synth", text.length.toLong)
    }
    val base = vocab.take(40)
    val nearDup = vocab.slice(5, 45) // |∩base|=35, |∪|=45 → j=0.78: loser
    val far = vocab.slice(40, 70) ++ vocab.take(5) // vs base: 5/70 → j=0.07
    val dir = java.nio.file.Files.createTempDirectory("graft-vocab70").toString
    Seq(doc(1, base, "en"), doc(2, nearDup, "en"), doc(3, far, "en"),
      // distinct text (exact dedup is lang-blind) in another lang: never
      // near-dup-paired with the en docs despite 30 shared tokens
      doc(4, vocab.slice(10, 50), "de"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("llm_dedup_pipeline")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("en", 2L, 1L), ("de", 1L, 4L)), out.mkString(", "))
  }

  test("agg_approx_pct within 2% of exact percentiles") {
    val approx = SparkEntry.queries("agg_approx_pct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        org.apache.spark.sql.functions.percentile(
          org.apache.spark.sql.functions.col("l_extendedprice"),
          org.apache.spark.sql.functions.lit(0.5)).as("p50"),
        org.apache.spark.sql.functions.percentile(
          org.apache.spark.sql.functions.col("l_extendedprice"),
          org.apache.spark.sql.functions.lit(0.95)).as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (p50, p95)) =>
      assert(math.abs(approx(k)._1 - p50) / p50 <= 0.02)
      assert(math.abs(approx(k)._2 - p95) / p95 <= 0.02)
    }
  }

  test("salted join preserves join semantics while spreading hot keys") {
    import org.apache.spark.sql.functions._
    val facts = Tables.lineitem(spark, sfDir)
    val dim = Tables.supplier(spark, sfDir)
    val plain = facts.join(dim, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = graft.operators.Skew
      .saltedEquiJoin(facts, dim, "l_suppkey", "s_suppkey", "l_orderkey", 8)
      .groupBy("s_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("queries are deterministic across runs") {
    for (key <- Seq("llm_minhash", "llm_simhash", "eo_geomedian", "mm_decode_features")) {
      val a = SparkEntry.queries(key)(spark, sfDir).collect().toSeq
      val b = SparkEntry.queries(key)(spark, sfDir).collect().toSeq
      assert(a == b, s"$key not deterministic")
    }
  }
}
