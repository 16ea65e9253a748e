package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Sliding 13-gram decontamination (llm_decontaminate_sliding): window
  * emission semantics, and the alignment-independence property that
  * motivates the sliding variant over the disjoint stride. */
class DecontaminateSlidingSpec extends SparkSpec {

  test("sliding13 emits every 13-token window; short docs contribute nothing") {
    import spark.implicits._
    val toks = (1 to 40).map(i => s"w$i")
    val docs = Seq((1L, toks.mkString(" ")), (2L, "a b c"))
      .toDF("doc_id", "text")
    val got = TextOps.sliding13(docs)
      .as[(Long, String)].collect().toSet
    val want = (0 to 40 - 13)
      .map(i => (1L, toks.slice(i, i + 13).mkString(" "))).toSet
    assert(got == want)
  }

  private def writeCorpus(docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_decon").toString
    val rows = docs.map { case (id, text) =>
      Row(id, text, "en", "gen", text.length.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Tables.documentsSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("sliding catches misaligned overlap the disjoint stride misses") {
    // a 13-token run shared between eval doc 10 (offset 2) and train
    // doc 1 (offset 6): no disjoint 10-token chunk of the two docs is
    // equal, but the shared run IS a sliding window of both
    val shared = (0 until 13).map(i => s"s$i")
    val train = (0 until 6).map(i => s"t$i") ++ shared ++
      (0 until 11).map(i => s"u$i")
    val eval_ = (0 until 2).map(i => s"e$i") ++ shared ++
      (0 until 15).map(i => s"f$i")
    val dir = writeCorpus(Seq(1L -> train.mkString(" "), 10L -> eval_.mkString(" ")))

    val disjoint = SparkEntry.queries("llm_decontaminate")(spark, dir)
    assert(disjoint.count() == 0, "disjoint stride should miss this alignment")

    val sliding = SparkEntry.queries("llm_decontaminate_sliding")(spark, dir)
    val rows = sliding.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("doc_id") == 1L)
    assert(rows.head.getAs[Long]("n_shared") == 1L) // exactly the one run
    assert(rows.head.getAs[Long]("first_eval_doc") == 10L)
  }
}
