package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for the DuckDB-oracle hash match (SURVEY.md §8.2).
  *
  * The governing numeric facts, relied on throughout:
  *
  *  - A float64 can never sit exactly on a decimal rounding tie at scale
  *    s >= 1 (a tie needs value = odd/(2*10^s), whose denominator carries a
  *    factor 5^s — not representable in binary). So `round(x, s)` and
  *    `cast(x as decimal(p, s))` produce identical results in Spark
  *    (HALF_UP) and DuckDB (HALF_EVEN) for every double, despite the
  *    different tie-break modes. Never round to scale 0 (x.5 IS exact).
  *
  *  - SUMs of doubles are order-dependent; a 60k-row sum can differ between
  *    engines by ~1e-5 absolute, which rounding cannot hide. Therefore every
  *    graded double SUM casts each element to DECIMAL(28,10) first — the
  *    per-element cast is deterministic (above), and decimal addition is
  *    exact and associative, so partial/final aggregation order is free.
  *    Spark types sum(decimal(28,10)) as DECIMAL(38,10); DuckDB agrees.
  *
  *  - AVG/stats of doubles stay double-valued: their cross-engine error is
  *    ~1e-12 relative, so rounding at 6 (avg) or 4 (variance-family) decimal
  *    places is collision-safe.
  */
object Det {

  /** Element type for exact decimal sums over money-scale doubles. */
  val Dec28_10: DecimalType = DecimalType(28, 10)

  /** Element type for exact decimal sums over unit-scale doubles (vector
    * dot products, squared distances). */
  val Dec28_14: DecimalType = DecimalType(28, 14)

  val Dec38_6: DecimalType = DecimalType(38, 6)
  val Dec38_4: DecimalType = DecimalType(38, 4)

  /** Exact, order-insensitive sum of a double column.
    * Oracle twin: SUM(CAST(x AS DECIMAL(28,10))). */
  def dsum(c: Column): Column = sum(c.cast(Dec28_10))

  /** Canonical 6-dp projection of a computed double.
    * Oracle twin: CAST(ROUND(x, 6) AS DECIMAL(38,6)). */
  def d6(c: Column): Column = round(c, 6).cast(Dec38_6)

  /** 4-dp projection for variance-family stats, where engine-internal
    * merge order costs more ulps. Oracle: CAST(ROUND(x,4) AS DECIMAL(38,4)). */
  def d4(c: Column): Column = round(c, 4).cast(Dec38_4)

  /** Whole seconds since epoch for the ns-precision `events.ts` (both
    * engines already agree at µs; second floor is engine-identical).
    * Oracle twin: CAST(FLOOR(EPOCH(ts)) AS BIGINT). */
  def epochS(c: Column): Column = unix_timestamp(c)
}
