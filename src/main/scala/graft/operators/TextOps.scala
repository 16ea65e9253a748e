package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared text primitives for the LLM operator family — one definition of
  * tokenization-derived shapes so an edge-case fix lands everywhere. */
object TextOps {

  /** One row per word-bigram occurrence, carrying `keep` columns from
    * `documents`. Documents with fewer than two tokens contribute nothing. */
  def bigrams(docs: DataFrame, keep: String*): DataFrame =
    docs
      .select(keep.map(col) :+ split(col("text"), " ").as("tk"): _*)
      .where(size(col("tk")) >= 2)
      .select(keep.map(col) :+
        explode(transform(
          sequence(lit(1), size(col("tk")) - 1),
          i => concat(element_at(col("tk"), i), lit(" "), element_at(col("tk"), i + 1))))
          .as("bigram"): _*)
}
