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

  /** 10-token chunks of each document, as (doc_id, chunk) rows — the ONE
    * definition behind llm_chunk_dedup and llm_decontaminate so their
    * "same chunking arithmetic" claim is structural, not a comment.
    * Capped at 1000 chunks (10k tokens) per doc to match the oracle's
    * RANGE(0, 1000) stride CTE on BOTH engines — without the shared cap
    * a >10k-token doc would chunk fully here and partially there (latent
    * cross-engine divergence; graded corpora stay far below it). */
  val ChunkCap = 1000

  def chunks10(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), least(lit(ChunkCap - 1), ((size(col("toks")) - 1) / 10).cast("int"))),
        i => array_join(slice(col("toks"), i * 10 + 1, lit(10)), " "))).as("chunk"))

  /** Sliding 13-token windows of each document, as (doc_id, chunk) rows —
    * the published decontamination n-gram shape (Brown et al. 2020 app.
    * C scrubs on 13-gram overlap), vs [[chunks10]]'s disjoint stride.
    * Cost is one chunk per token position (~13× the disjoint row count),
    * so the start-position cap mirrors ChunkCap's 10k-token reach and is
    * baked into the oracle's RANGE CTE identically — the budget that
    * keeps a pathological mega-doc from emitting unbounded rows on
    * either engine. */
  val SlideCap = 10000

  def sliding13(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 13)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), least(lit(SlideCap), size(col("toks")) - 12)),
        i => array_join(slice(col("toks"), i, lit(13)), " "))).as("chunk"))

  /** Session conf key for [[guardPairBudget]]'s ceiling (worst-case
    * within-block pair count an exact pair self-join may attempt). */
  val MaxPairsConf = "spark.graft.exactPairs.max"
  val MaxPairsDefault = 50000000L // 5e7 pairs ~ seconds of verify work

  /** Fail FAST (at plan-build time, one tiny agg job) when an exact
    * within-block pair self-join would explode: the semantics-defining
    * keys (llm_dedup_near, llm_ngram_jaccard) are deliberately quadratic
    * per block — correct at any scale, affordable only below a budget.
    * Their scaladocs point at the scale paths (llm_minhash banding,
    * llm_dedup_pipeline's prefix filter); this guard makes the pointer
    * ENFORCED rather than advisory: a naive 100 TB run dies in one
    * second with the escape hatch in the message, not in a week-long
    * shuffle. Estimate = sum over blocks of c*(c-1)/2 as doubles (an
    * estimate needs no exact arithmetic at the 2^63 edge).
    *
    * `blocked` must be one row per joined element, `blockCols` the join's
    * equality block (e.g. lang). Raise the ceiling per session via
    * [[MaxPairsConf]] when a bounded corpus genuinely needs more. */
  def guardPairBudget(blocked: DataFrame, blockCols: Seq[String],
      key: String, scaleHint: String): Unit = {
    val spark = blocked.sparkSession
    val maxPairs = spark.conf.getOption(MaxPairsConf)
      .map { v =>
        try v.trim.toLong
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$MaxPairsConf must be a long pair count, got '$v'")
        }
      }.getOrElse(MaxPairsDefault)
    val est = blocked.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).cast("double").as("c"))
      .agg(coalesce(sum(col("c") * (col("c") - 1) / 2), lit(0.0)))
      .head().getDouble(0)
    require(est <= maxPairs.toDouble,
      f"$key: ~$est%.0f within-block pairs exceed $MaxPairsConf=$maxPairs — " +
        s"this exact pair join is the semantics anchor, not the scale path; $scaleHint")
  }
}
