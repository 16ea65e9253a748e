package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** llm_winnow's semantic guarantee — the winnowing local property
  * [PK Schleimer et al. 2003 §3]: two documents sharing a token run of at
  * least k + w - 1 = 7 tokens select at least one common fingerprint,
  * because the shared run contains a full guarantee window and window
  * minima depend only on the window's k-gram hashes. The graded key's
  * oracle pins the exact fingerprint sets; this spec pins the property
  * the sets exist FOR, on adversarially built corpora.
  */
class WinnowSpec extends SparkSpec {

  /** Distinct fingerprints per doc via the same pipeline the key runs. */
  private def fps(docs: Seq[(Long, String)]): Map[Long, Set[Long]] = {
    import spark.implicits._
    val df: DataFrame = docs.toDF("doc_id", "text")
    import org.apache.spark.sql.expressions.Window
    val kgrams = df
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= 3)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("t")) - 3),
        i => Det.hash32(concat_ws(" ",
          element_at(col("t"), i + 1),
          element_at(col("t"), i + 2),
          element_at(col("t"), i + 3))))).as(Seq("pos", "kh")))
    val w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-3, 0)
    kgrams.withColumn("sel", min(col("kh")).over(w))
      .where(col("pos") >= 3)
      .select("doc_id", "sel").distinct()
      .collect()
      .groupBy(_.getLong(0)).map { case (k, rs) =>
        k -> rs.map(_.getLong(1)).toSet
      }
  }

  test("docs sharing a 7-token run share a fingerprint; disjoint docs share none") {
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val a = 1L -> s"one two three $shared four five six seven"
    val b = 2L -> s"red green blue $shared cyan magenta yellow black"
    // disjoint vocabulary — no common trigram exists at all
    val c = 3L -> "p q r s t u v w x y z aa bb cc"
    val m = fps(Seq(a, b, c))
    assert((m(1L) & m(2L)).nonEmpty,
      "shared >=7-token run failed the winnowing guarantee")
    assert((m(1L) & m(3L)).isEmpty && (m(2L) & m(3L)).isEmpty,
      "disjoint-vocabulary docs cannot share a fingerprint")
  }

  test("fingerprint density is ~1/w of the k-gram stream, never the full set") {
    val text = (0 until 400).map(i => s"tok${i % 97}").mkString(" ")
    val m = fps(Seq(10L -> text))
    val nKgrams = 400 - 2
    // winnowing selects >= n/(w) and far fewer than all k-grams; the
    // classic expected density is 2/(w+1) ~ 0.4 here
    assert(m(10L).size < nKgrams / 2, s"density too high: ${m(10L).size}")
    assert(m(10L).nonEmpty)
  }
}
