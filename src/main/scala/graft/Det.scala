package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for the DuckDB-oracle hash match (SURVEY.md §8.2).
  *
  * REVISED after round 1: the original strategy projected DECIMAL columns
  * (round→cast, decimal-element sums). The driver's CORRECTNESS_r01.json
  * falsified it — all 41 hash-failing keys carried a DECIMAL column derived
  * from doubles, zero non-decimal keys failed, and the "a float64 can never
  * sit on a decimal rounding tie" assumption broke empirically:
  * AVG(l_discount) at sf0.01 = 0.0499185000000047, i.e. frac(x·1e6) =
  * 0.50000000469 — a knife-edge 6dp tie that different engine builds may
  * round apart. VERDICT.md (round 1) prescribes the replacement used here.
  *
  * The surviving, provable rules:
  *
  *  1. Canonical numeric output = scaled BIGINT, never DECIMAL and never a
  *     derived DOUBLE. `FLOOR(x*1e6 + 0.5)` is a pure IEEE-double op
  *     sequence: given bit-identical `x` it is bit-identical in every
  *     engine, and the resulting integers hash identically everywhere.
  *     (For negative x this is round-half-toward-+∞ — one shared definition
  *     on both sides, still deterministic.)
  *
  *  2. A per-row scalar computed from parquet values with +,-,*,/ , abs,
  *     floor/ceil, greatest/least, sqrt (all IEEE-exact or correctly
  *     rounded) is bit-identical across engines, so rule 1 applies to it
  *     directly. ln/log10/pow may differ by 1 ulp between libm builds —
  *     accepted residual risk of ~1e-9 per value against the 1e-6 grid.
  *
  *  3. An engine-internal double AGGREGATION (SUM/AVG/STDDEV over doubles)
  *     is order-dependent and must never reach an output. Canonicalize each
  *     element to the integer grid FIRST (`s2`/`s6`), sum the longs
  *     (exact, order-free, codegen'd), and derive ratios/means/variances
  *     from those exact integers with a FIXED double op sequence — each op
  *     has identical integer inputs on both engines, so the double result
  *     is bit-identical by induction.
  *
  *  4. Percentile interpolation over INTEGER inputs with p ∈ {.25,.5,.75}
  *     is exact in double space (both engines' lerp formulas agree on
  *     exact values), so percentiles run over scaled longs and re-scale
  *     the result by 100 into an integer output.
  *
  * DuckDB twins (see each helper): SUM(BIGINT) is HUGEINT there — always
  * CAST the outer sum back to BIGINT; FLOOR returns DOUBLE there — the
  * value is integral, so CAST AS BIGINT is exact.
  */
object Det {

  /** Canonical 6-dp scaled-long projection of a deterministic double.
    * Oracle twin: CAST(FLOOR((x) * 1e6 + 0.5) AS BIGINT). */
  def s6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)).cast("long")

  /** 4-dp variant. Oracle: CAST(FLOOR((x) * 1e4 + 0.5) AS BIGINT). */
  def s4(c: Column): Column = floor(c * lit(1e4) + lit(0.5)).cast("long")

  /** Integer cents of a 2-dp money double (exact: representation error of
    * a 2-dp value is ≪ 0.5 cent). Oracle: CAST(FLOOR((x) * 100 + 0.5) AS BIGINT). */
  def s2(c: Column): Column = floor(c * lit(100) + lit(0.5)).cast("long")

  /** Nearest-integer units (scale 0: FLOOR(x+0.5) is the same op on both
    * engines, so even exact .5 ties break identically).
    * Oracle: CAST(FLOOR((x) + 0.5) AS BIGINT). */
  def s0(c: Column): Column = floor(c + lit(0.5)).cast("long")

  /** Exact, order-free integer-cent sum of a 2-dp money double.
    * Oracle twin: CAST(SUM(CAST(FLOOR((x) * 100 + 0.5) AS BIGINT)) AS BIGINT). */
  def centSum(c: Column): Column = sum(s2(c))

  /** 6-dp scaled mean of a 2-dp money double, derived exactly:
    * FLOOR(centSum * 1e4 / n + 0.5). The sum and count are exact integers;
    * the multiply and divide are one IEEE op each.
    * Oracle twin: [[Det.sqlAvg6]]. */
  def avg6(c: Column): Column =
    floor(sum(s2(c)).cast("double") * lit(1e4) / count(lit(1)) + lit(0.5)).cast("long")

  /** Exact, order-free sum over the 6-dp grid of an arbitrary-precision
    * double (canonicalize per element, then sum longs).
    * Oracle twin: [[Det.sqlSum6]]. */
  def sum6(c: Column): Column = sum(s6(c))

  /** 6-dp-grid mean of an arbitrary-precision double: exact grid-sum and
    * count, one cast, one divide. Oracle twin: [[Det.sqlMean6]]. */
  def mean6(c: Column): Column =
    floor(sum(s6(c)).cast("double") / count(lit(1)) + lit(0.5)).cast("long")

  /** Whole seconds since epoch for the ns-precision `events.ts` (both
    * engines already agree at µs; second floor is engine-identical).
    * Oracle twin: CAST(FLOOR(EPOCH(ts)) AS BIGINT). */
  def epochS(c: Column): Column = unix_timestamp(c)

  /** Exact integer round-half-up of the rational s/n — the ALL-INTEGER
    * replacement for `FLOOR(CAST(sum AS DOUBLE)/count + 0.5)` (r9's
    * win_decompose driver-red showed the double-divide form is not
    * portable across engine builds when the numerator is negative).
    * Requires n > 0 (any sign s); equals floor(s/n + 1/2) exactly.
    *
    * Implementation: floor((2s+n)/(2n)) via the pmod identity
    * a − pmod(a,b) = b·⌊a/b⌋; the final divide is of an exact multiple
    * of b, hence IEEE-exact. Bound: |2s+n| must stay < 2^53 (callers
    * sum day-series cents — ≲1e12 ≪ 2^53).
    * Oracle twin: [[Det.sqlHalfUpDiv]] (mathematically identical, spelled
    * with `//` applied to NON-NEGATIVE operands only, where floor- and
    * truncation-style integer division agree on every DuckDB build —
    * local 1.0.0 truncates `-7//2 = -3`, other builds floor; graded
    * surfaces must never hand `//` a negative operand). */
  def halfUpDiv(s: Column, n: Column): Column = {
    val a = s.cast("long") * 2 + n.cast("long")
    val b = n.cast("long") * 2
    ((a - pmod(a, b)).cast("double") / b.cast("double")).cast("long")
  }

  /** Oracle twin of [[halfUpDiv]]: round-half-up of s/n (n > 0) with
    * every `//` operand non-negative, so floor/trunc `//` builds agree.
    * s<0 branch: floor((2s+n)/(2n)) = −((−2s+n−1) // (2n)). */
  def sqlHalfUpDiv(s: String, n: String): String =
    s"(CASE WHEN ($s) >= 0 THEN (2*($s) + ($n)) // (2*($n)) " +
      s"ELSE -(((-2)*($s) + ($n) - 1) // (2*($n))) END)"

  // ---- oracle-SQL twins (string builders keep both sides textually in
  // ---- lock-step; every helper above has exactly one SQL form)

  /** Portable 32-bit string hash shared bit-for-bit with DuckDB: the
    * little-endian uint32 of the FIRST FOUR md5 digest bytes. Spark reads
    * it from the hex text (byte-swapped 8-char conv); DuckDB masks its
    * md5_number_upper (the LE uint64 of digest bytes 1-8). Exists so
    * sketch operators (minhash/simhash/sign-LSH) can be graded against
    * the oracle — crc32 has no DuckDB twin. */
  def hash32(c: Column): Column = {
    val m = md5(c)
    conv(concat(substring(m, 7, 2), substring(m, 5, 2),
      substring(m, 3, 2), substring(m, 1, 2)), 16, 10).cast("long")
  }

  def sqlS6(x: String): String = s"CAST(FLOOR(($x) * 1e6 + 0.5) AS BIGINT)"

  /** Oracle twin of [[hash32]]. */
  def sqlHash32(x: String): String =
    s"CAST(md5_number_upper($x) & 4294967295 AS BIGINT)"
  def sqlS4(x: String): String = s"CAST(FLOOR(($x) * 1e4 + 0.5) AS BIGINT)"
  def sqlS2(x: String): String = s"CAST(FLOOR(($x) * 100 + 0.5) AS BIGINT)"
  def sqlS0(x: String): String = s"CAST(FLOOR(($x) + 0.5) AS BIGINT)"
  def sqlCentSum(x: String): String =
    s"CAST(SUM(${sqlS2(x)}) AS BIGINT)"
  def sqlSum6(x: String): String =
    s"CAST(SUM(${sqlS6(x)}) AS BIGINT)"
  def sqlMean6(x: String): String =
    s"CAST(FLOOR(CAST(SUM(${sqlS6(x)}) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)"
  def sqlAvg6(x: String): String =
    s"CAST(FLOOR(CAST(SUM(${sqlS2(x)}) AS DOUBLE) * 1e4 / COUNT(*) + 0.5) AS BIGINT)"
}
