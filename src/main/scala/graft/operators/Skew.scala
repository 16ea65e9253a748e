package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{Det, Q, Tables => T}

/** Skew-handling primitives (SCALING.md "skew answers"): when one key
  * carries a pathological share of the rows, AQE's skew-join split handles
  * sort-merge cases at runtime, but salting is the portable answer that
  * also covers aggregations and known-skew plans. Both rewrites are
  * result-identical to the direct operation (SkewSpec proves it on a
  * 90%-skew corpus).
  */
object Skew {

  /** GRADED key (round 7): the salted join driven end-to-end against the
    * PLAIN join's oracle — the grade IS the semantics-preservation proof
    * at the harness level (SkewSpec keeps the 90%-skew unit proof).
    * lineitem⋈part on partkey through 8 salts, then a per-brand rollup
    * with an exact cent sum; the oracle is the direct join + group. */
  val all: Seq[Q] = Seq(
    Q("join_salted", Some(
      "SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n, " +
        Det.sqlCentSum("l.l_extendedprice") + " AS revenue_c " +
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey " +
        "GROUP BY p.p_brand ORDER BY p.p_brand"),
      (s, d) => {
        val facts = T.lineitem(s, d)
          .select("l_partkey", "l_orderkey", "l_extendedprice")
        val dim = T.part(s, d).select("p_partkey", "p_brand")
        saltedEquiJoin(facts, dim, "l_partkey", "p_partkey", "l_orderkey", 8)
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"),
            Det.centSum(col("l_extendedprice")).as("revenue_c"))
          .orderBy("p_brand")
      }))

  /** `facts ⋈ dim ON key` rewritten as
    * `facts+salt ⋈ (dim × salt_range) ON (key, salt)`: each fact row gets
    * a deterministic salt in [0, salts) (hash of the key PLUS a
    * caller-chosen discriminator column — hashing a nondeterministic row
    * id would break re-execution), and the dimension is replicated
    * `salts` times, so one hot key spreads over `salts` reducers. Row
    * multiplicity is unchanged — the replicated dim matches exactly one
    * salt per fact row. The build side's shuffled volume multiplies by
    * `salts`; it must be the smaller side. */
  def saltedEquiJoin(
      facts: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      discriminator: String,
      salts: Int): DataFrame = {
    val spark = facts.sparkSession
    val salted = facts.withColumn("__salt",
      pmod(xxhash64(col(factKey), col(discriminator)), lit(salts)).cast("int"))
    val saltRange = spark.range(0, salts).select(col("id").cast("int").as("__salt"))
    val dimRep = dim.crossJoin(broadcast(saltRange))
    salted.join(dimRep,
        salted(factKey) === dimRep(dimKey) && salted("__salt") === dimRep("__salt"))
      .drop("__salt")
  }

  /** Two-level skew-spread aggregation: partial per (key, salt), final per
    * key — the hot key's rows converge through `saltN` reducers instead of
    * one. `aggs` maps output name to (inputColumn, op) with
    * op ∈ {sum, count, min, max}: the algebraic aggregates whose
    * partial/final decomposition is exact (counts combine by summing).
    * The salt derives from `saltSrc`, any roughly-uniform column. */
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
      case "sum" | "count" => sum(c)
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
}
