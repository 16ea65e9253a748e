package graft.functions

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

import graft.{Det, Q, Tables => T}
import Det._

/** SURVEY.md §3.12: user-defined scalar / aggregate / table functions.
  * These exist to exercise the extension surface; everything else in the
  * library prefers codegen'd built-ins (a Scala udf boxes every row).
  */
object Udfs {

  /** Weighted mean with exact decimal accumulators: each (x, w) is rounded
    * to DECIMAL scale 10 exactly like CAST(x AS DECIMAL(28,10)) (HALF_UP;
    * tie-free for doubles — Det scaladoc), so partial-merge order cannot
    * perturb the sums; the final division happens once, in double space,
    * identically to the oracle's CAST(sum AS DOUBLE)/CAST(sum AS DOUBLE). */
  class WeightedMeanAgg extends Aggregator[(Double, Double), (JBigDecimal, JBigDecimal), Double] {
    private def dec10(x: Double): JBigDecimal =
      new JBigDecimal(x, MathContext.UNLIMITED).setScale(10, RoundingMode.HALF_UP)
    override def zero: (JBigDecimal, JBigDecimal) =
      (JBigDecimal.ZERO.setScale(10), JBigDecimal.ZERO.setScale(10))
    override def reduce(b: (JBigDecimal, JBigDecimal), a: (Double, Double)): (JBigDecimal, JBigDecimal) =
      (b._1.add(dec10(a._1 * a._2)), b._2.add(dec10(a._2)))
    override def merge(b1: (JBigDecimal, JBigDecimal), b2: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
      (b1._1.add(b2._1), b1._2.add(b2._2))
    override def finish(r: (JBigDecimal, JBigDecimal)): Double =
      r._1.doubleValue() / r._2.doubleValue()
    override def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
      Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val all: Seq[Q] = Seq(

    // Scalar Scala udf; the oracle is the equivalent plain arithmetic —
    // identical IEEE ops, so results match bit-for-bit before rounding.
    Q("udf_scalar", Some(
      "SELECT l_orderkey, l_linenumber, " +
        "CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(38,6)) AS discounted " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, discounted"),
      (s, d) => {
        val discounted = udf((price: Double, disc: Double) => price * (1 - disc))
        T.lineitem(s, d)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            d6(discounted(col("l_extendedprice"), col("l_discount"))).as("discounted"))
          .orderBy("l_orderkey", "l_linenumber", "discounted")
      }),

    // Typed Aggregator: quantity-weighted mean price per return flag.
    Q("udaf_weighted", Some(
      "SELECT l_returnflag, CAST(ROUND(" +
        "CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,10))) AS DOUBLE) / " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE), 6) AS DECIMAL(38,6)) AS wmean_price " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      (s, d) => {
        val wmean = udaf(new WeightedMeanAgg())
        T.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(d6(wmean(col("l_extendedprice"), col("l_quantity"))).as("wmean_price"))
          .orderBy("l_returnflag")
      }),

    // Generator/UDTF shape: split each document into 10-token "sentences".
    Q("udtf_sentences", Some(
      "WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents) " +
        "SELECT doc_id, CAST(i AS INT) AS sent_idx, " +
        "ARRAY_TO_STRING(LIST_SLICE(toks, i * 10 + 1, i * 10 + 10), ' ') AS sentence " +
        "FROM t, (SELECT UNNEST(RANGE(0, 1000)) AS i) idx " +
        "WHERE i * 10 < LEN(toks) ORDER BY doc_id, sent_idx"),
      (s, d) => {
        import s.implicits._
        T.documents(s, d)
          .select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .flatMap { case (id, text) =>
            text.split(' ').grouped(10).zipWithIndex.map {
              case (chunk, i) => (id, i, chunk.mkString(" "))
            }
          }
          .toDF("doc_id", "sent_idx", "sentence")
          .orderBy("doc_id", "sent_idx")
      }))
}
