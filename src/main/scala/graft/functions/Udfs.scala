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

  /** Weighted mean with exact scaled-long accumulators (Det rule 3): each
    * (x, w) contributes FLOOR(x*w*100 + 0.5) and FLOOR(w*100 + 0.5) — pure
    * IEEE double ops, bit-identical to the oracle's twin expressions — and
    * the long sums are exact and merge-order-free. The final division
    * happens once, in double space, identically on both sides. */
  class WeightedMeanAgg extends Aggregator[(Double, Double), (Long, Long), Double] {
    private def s2(x: Double): Long = math.floor(x * 100 + 0.5).toLong
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: (Double, Double)): (Long, Long) =
      (b._1 + s2(a._1 * a._2), b._2 + s2(a._2))
    override def merge(b1: (Long, Long), b2: (Long, Long)): (Long, Long) =
      (b1._1 + b2._1, b1._2 + b2._2)
    override def finish(r: (Long, Long)): Double =
      r._1.toDouble / r._2.toDouble
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Typed Aggregator for udx_typed_agg: (count, price cents, quantity
    * cents) — exact long accumulators (Det rule 3), the per-row floors
    * the oracle spells verbatim. */
  class TypedCentsAgg
      extends Aggregator[(String, Double, Double), (Long, Long, Long), (Long, Long, Long)] {
    private def s2(x: Double): Long = math.floor(x * 100 + 0.5).toLong
    override def zero: (Long, Long, Long) = (0L, 0L, 0L)
    override def reduce(b: (Long, Long, Long), a: (String, Double, Double)): (Long, Long, Long) =
      (b._1 + 1L, b._2 + s2(a._3), b._3 + s2(a._2))
    override def merge(b1: (Long, Long, Long), b2: (Long, Long, Long)): (Long, Long, Long) =
      (b1._1 + b2._1, b1._2 + b2._2, b1._3 + b2._3)
    override def finish(r: (Long, Long, Long)): (Long, Long, Long) = r
    override def bufferEncoder: Encoder[(Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[(Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
  }

  val all: Seq[Q] = Seq(

    // Scalar Scala udf; the oracle is the equivalent plain arithmetic —
    // identical IEEE ops, so results match bit-for-bit before rounding.
    Q("udf_scalar", Some(
      "SELECT l_orderkey, l_linenumber, " +
        sqlS6("l_extendedprice * (1 - l_discount)") + " AS discounted " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, discounted"),
      (s, d) => {
        val discounted = udf((price: Double, disc: Double) => price * (1 - disc))
        T.lineitem(s, d)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            s6(discounted(col("l_extendedprice"), col("l_discount"))).as("discounted"))
          .orderBy("l_orderkey", "l_linenumber", "discounted")
      }),

    // Typed Aggregator: quantity-weighted mean price per return flag.
    // Oracle twin of the aggregator's own arithmetic: per-row cent
    // canonicalization (FLOOR(x*w*100+0.5), FLOOR(w*100+0.5)), exact long
    // sums, ONE double division, then the s6 projection — identical IEEE op
    // sequence on both sides.
    Q("udaf_weighted", Some(
      "SELECT l_returnflag, CAST(FLOOR((" +
        "CAST(SUM(CAST(FLOOR(l_extendedprice * l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / " +
        "CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE)" +
        ") * 1e6 + 0.5) AS BIGINT) AS wmean_price " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      (s, d) => {
        val wmean = udaf(new WeightedMeanAgg())
        T.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(s6(wmean(col("l_extendedprice"), col("l_quantity"))).as("wmean_price"))
          .orderBy("l_returnflag")
      }),

    // Typed Dataset pipeline (round 10, fifth wave) — the ONE Spark API
    // family the registry didn't yet grade: a case-class Dataset[T]
    // through groupByKey + a typed Aggregator (Aggregator[IN, BUF, OUT]
    // via .toColumn, not the untyped udaf() wrapper udaf_weighted
    // grades) + a typed .map over the (key, out) pairs. Encoders derive
    // from the case class / tuples, so the whole path round-trips
    // through Tungsten rows with compile-time types. Cents discipline
    // keeps the aggregation exact; groupByKey hash-partitions on the
    // flag key like any relational groupBy — the typed API costs the
    // deserialize/serialize boundary (documented reason the rest of the
    // library prefers columns), not a different shuffle shape.
    Q("udx_typed_agg", Some(
      "SELECT l_returnflag AS flag, CAST(COUNT(*) AS BIGINT) AS n_items, " +
        sqlCentSum("l_extendedprice") + " AS price_cents, " +
        "CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty_cents " +
        "FROM lineitem GROUP BY flag ORDER BY flag"),
      (s, d) => {
        import s.implicits._
        T.lineitem(s, d)
          .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
          .as[(String, Double, Double)]
          .groupByKey(_._1)
          .agg(new TypedCentsAgg().toColumn)
          .map { case (flag, (n, pc, qc)) => (flag, n, pc, qc) }
          .toDF("flag", "n_items", "price_cents", "qty_cents")
          .orderBy("flag")
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
