package graft

import org.apache.spark.sql.Row

/** llm_dedup_cluster_banded (minhash-banded candidate edges into the same
  * star-contraction clustering) vs llm_dedup_cluster (exact all-pairs
  * edges).
  *
  * Banded candidates are verified against the exact mask Jaccard before
  * entering the graph, so every banded edge is a true j >= 0.5 edge —
  * banding can only LOWER recall, never add edges. Two consequences,
  * both pinned here:
  *
  *  1. On a THRESHOLD-SEPARATED corpus — within-group token sets
  *     identical (j = 1), across-group disjoint (j = 0) — banding is
  *     provably complete: j = 1 pairs have identical minhash signatures
  *     in EVERY band (same token set -> same 16 hash minima), so every
  *     true edge surfaces as a candidate and the banded rollup must
  *     EQUAL the exact rollup exactly.
  *
  *  2. On ANY corpus (the dup-dense graded one here, with pairs at
  *     intermediate j where 4x4 banding probabilistically misses),
  *     banded components REFINE exact components: same total node
  *     count, at least as many clusters, and every exact cluster id
  *     (its min member) is also a banded cluster id — the banded
  *     component containing an exact component's minimum doc lies
  *     inside that component, so that doc is still its own minimum.
  */
class LlmClusterBandedSpec extends SparkSpec {

  private def writeCorpus(docs: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_cluster_gen").toString
    val rows = docs.map { case (id, lang, text) =>
      Row(id, text, lang, "gen", text.length.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), Tables.documentsSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def rollup(key: String, dir: String): Seq[(Long, Long, Long)] =
    SparkEntry.queries(key)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("banded equals exact on a threshold-separated corpus (banding provably complete)") {
    val rnd = new scala.util.Random(2468)
    val vocab = (0 until 60).map(i => f"w$i%02d") // 60 <= 63-token mask limit
    val docs = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()
    val expected = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    var id = 0L
    for (g <- 0 until 6) {
      val toks = vocab.slice(g * 10, g * 10 + 10)
      val members = 3 + rnd.nextInt(3)
      val first = id
      for (_ <- 0 until members) {
        // permutation + repeated tokens: DISTINCT set identical across the
        // group (j = 1), exact texts differ (not trivially exact dups)
        val extra = Seq.fill(rnd.nextInt(4))(toks(rnd.nextInt(toks.size)))
        docs += ((id, "aa", rnd.shuffle(toks ++ extra).mkString(" ")))
        id += 1
      }
      expected += ((first, members.toLong, id - 1))
    }
    val dir = writeCorpus(docs.toSeq)
    val exact = rollup("llm_dedup_cluster", dir)
    val banded = rollup("llm_dedup_cluster_banded", dir)
    assert(exact == expected.toSeq)
    assert(banded == exact)
  }

  test("banded refines exact on the dup-dense graded corpus") {
    val exact = rollup("llm_dedup_cluster", sfDir)
    val banded = rollup("llm_dedup_cluster_banded", sfDir)
    assert(banded.map(_._2).sum == exact.map(_._2).sum,
      "refinement preserves the node count")
    assert(banded.size >= exact.size,
      "a refinement cannot have fewer clusters")
    val bandedIds = banded.map(_._1).toSet
    assert(exact.map(_._1).forall(bandedIds),
      "every exact cluster minimum must still lead a banded cluster")
  }
}
