package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for the 100 TB path (SCALING.md): when one key
  * holds a disproportionate share of the rows, a single reducer (or a
  * single sort-merge partition) becomes the straggler. AQE's skew-join
  * splitting covers the join case at runtime; these helpers are the
  * explicit, planner-independent forms for when the skew is known.
  *
  * Both are pure plan rewrites — results are provably identical to the
  * direct operation (spec-checked in SaltSpec):
  *  - salted aggregation: algebraic aggregates decompose over a two-level
  *    reduction (partial per (key, salt), final per key), so the hot key's
  *    rows spread across `saltN` reducers before converging;
  *  - salted join: replicating the OTHER side saltN× and joining on
  *    (key, salt) splits the hot key's probe rows over saltN partitions;
  *    each original pair appears exactly once because the salt of a probe
  *    row is a function, not a generator.
  */
object Salt {

  /** Two-level skew-spread aggregation. `aggs` maps output column name to
    * (inputColumn, op) with op ∈ {sum, count, min, max} — the algebraic
    * aggregates whose partial/final decomposition is exact. The salt is
    * derived from `saltSrc` (any roughly-uniform column, e.g. a row id). */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltSrc: Column,
      saltN: Int,
      aggs: Seq[(String, (Column, String))]): DataFrame = {
    def partialOf(op: String, c: Column): Column = op match {
      case "sum" => sum(c)
      case "count" => count(c)
      case "min" => min(c)
      case "max" => max(c)
    }
    def finalOf(op: String, c: Column): Column = op match {
      case "sum" | "count" => sum(c) // counts combine by summing
      case "min" => min(c)
      case "max" => max(c)
    }
    val partialCols = aggs.map { case (out, (c, op)) => partialOf(op, c).as(s"__p_$out") }
    val finalCols = aggs.map { case (out, (_, op)) => finalOf(op, col(s"__p_$out")).as(out) }
    df.withColumn("__salt", pmod(xxhash64(saltSrc), lit(saltN)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialCols.head, partialCols.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalCols.head, finalCols.tail: _*)
  }

  /** Skew-spread inner equi-join: the probe side's hot keys are split over
    * saltN partitions; the build side is replicated saltN× (explode of a
    * literal range — build must be the SMALLER side, its shuffled volume
    * multiplies by saltN). */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      probeSaltSrc: Column,
      saltN: Int): DataFrame = {
    val p = probe.withColumn("__salt", pmod(xxhash64(probeSaltSrc), lit(saltN)))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltN - 1L))))
    p.join(b, Seq(key, "__salt")).drop("__salt")
  }
}
