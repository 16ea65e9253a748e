package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-join salting (SCALING.md "skew answers"): when one join key carries
  * a pathological share of the fact rows, AQE's skew-join split handles
  * sort-merge cases, but salting is the portable answer that also covers
  * aggregations and pre-AQE plans.
  *
  * `saltedEquiJoin(facts, dim, key, salts)` rewrites
  * `facts ⋈ dim ON key` as
  * `facts+salt ⋈ (dim × salt_range) ON (key, salt)`:
  * each fact row gets a deterministic salt in [0, salts) (hash of the full
  * row's monotonically increasing id would be nondeterministic — we hash
  * the key PLUS a caller-chosen discriminator column), and the dimension is
  * replicated `salts` times, so one hot key spreads over `salts` reducers.
  * Row multiplicity is unchanged — the replicated dim matches exactly one
  * salt per fact row.
  */
object Skew {

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
}
