package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

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

  /** Dense 0..n-1 ids for a distinct-values relation WITHOUT the
    * single-partition `dense_rank().over(Window.orderBy(...))` dictionary
    * (Spark: "No Partition Defined for Window ... Moving all data to a
    * single partition" — a one-executor sort of the whole vocabulary at
    * open-corpus scale). `zipWithIndex` assigns ids in partition order, so
    * they are NOT the oracle's lexicographic dense_rank ids — but every
    * consumer is permutation-invariant: the ids only place each value into
    * a unique (word, bit) mask slot, and |A∩B| / |A∪B| popcount sums are
    * identical under any bijective slot assignment. */
  def denseIds(distinctVals: DataFrame, idCol: String): DataFrame = {
    val spark = distinctVals.sparkSession
    val schema = StructType(distinctVals.schema.fields :+
      StructField(idCol, IntegerType, nullable = false))
    val rdd = distinctVals.rdd.zipWithIndex().map {
      case (r, i) => Row.fromSeq(r.toSeq :+ i.toInt)
    }
    spark.createDataFrame(rdd, schema)
  }
}
