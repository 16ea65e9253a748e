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

    // Runtime Bloom-filter join pruning, graded (round 8): the dim side's
    // key set is folded into an 8192-bit / 4-hash Bloom filter (128
    // longs), broadcast, and the FACT side is pruned by the filter BEFORE
    // its join shuffle — the runtime-filter rewrite for the 100 TB case
    // where the dim is too big to broadcast as a hash relation but its
    // key membership compresses to a KB-scale bitmap, so the fact
    // shuffle only carries probable matches (Bloom 1970; Spark's own
    // InjectRuntimeFilter applies the same rewrite internally — this key
    // grades OUR portable, deterministic construction). Bloom filters
    // have NO false negatives, and the exact join runs after the prune,
    // so the result is identical to the direct join: like join_salted,
    // the oracle IS the plain join, sealing semantics preservation.
    // False positives only cost shuffled rows; BloomSpec pins the
    // measured prune rate and the no-false-negative construction.
    Q("join_bloom", Some(
      "SELECT o.o_orderkey, c.c_name, " + Det.sqlS2("o.o_totalprice") + " AS price_c " +
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey " +
        "WHERE c.c_mktsegment = 'BUILDING' ORDER BY o.o_orderkey"),
      (s, d) => {
        val dim = T.customer(s, d)
          .where(col("c_mktsegment") === "BUILDING")
          .select("c_custkey", "c_name")
        val facts = T.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
        bloomPrune(facts, dim, "o_custkey", "c_custkey")
          .join(dim.hint("merge"), col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("c_name"),
            Det.s2(col("o_totalprice")).as("price_c"))
          .orderBy("o_orderkey")
      }),

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

  // ---- Bloom-filter runtime pruning (join_bloom) ----

  /** 8192 bits = 128 longs: broadcastable at any dim cardinality; at the
    * ~1 bit/key regime (8k dim keys) FP ≈ (1-e^-k·n/m)^k ≈ 2.4% — each FP
    * costs one shuffled fact row, never a wrong result. */
  private val BloomBits = 8192
  private val BloomK = 4

  /** The k probe positions for one key — Det.hash32 over the key text
    * plus a per-hash suffix, so build and probe sides agree bit-for-bit
    * on any engine that can reproduce md5 (portability discipline shared
    * with the sketch family). */
  private def bloomPositions(key: Column): Seq[Column] =
    (0 until BloomK).map(i =>
      pmod(Det.hash32(concat(key.cast("string"), lit("#b" + i))), lit(BloomBits)))

  /** Prune `facts` to rows whose `factKey` is PROBABLY in `dim.dimKey`:
    * build the dim side's Bloom words (one tiny aggregation →
    * `BloomBits/64` rows → a single map row), broadcast it, and keep the
    * fact rows whose k probe bits are all set. No false negatives by
    * construction (every inserted key set exactly the probed bits), so
    * `prune → exact join ≡ exact join`. The fact side is touched
    * map-only: no shuffle is added, and the downstream join's shuffle
    * shrinks to the candidate set. */
  def bloomPrune(
      facts: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String): DataFrame = {
    val words = dim
      .select(explode(array(bloomPositions(col(dimKey)): _*)).as("p"))
      .select(expr("CAST(p DIV 64 AS INT)").as("wi"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").as("bit"))
      .groupBy("wi").agg(bit_or(col("bit")).as("bits"))
    val filterRow = words.agg(
      map_from_entries(collect_list(struct(col("wi"), col("bits")))).as("__bloom"))
    val posCols = (0 until BloomK).map(i => s"__bp$i")
    val withPos = bloomPositions(col(factKey)).zip(posCols)
      .foldLeft(facts.crossJoin(broadcast(filterRow))) {
        case (df, (p, name)) => df.withColumn(name, p)
      }
    val pass = posCols.map { bp =>
      coalesce(element_at(col("__bloom"), expr(s"CAST($bp DIV 64 AS INT)")), lit(0L))
        .bitwiseAND(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($bp % 64 AS INT))")) =!= 0L
    }.reduce(_ && _)
    withPos.where(pass).drop("__bloom" +: posCols: _*)
  }

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
