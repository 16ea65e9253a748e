package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Det, Q, Tables => T}
import Det._

/** SURVEY.md §3.4: aggregations.
  *
  * All graded numeric outputs are scaled BIGINTs (Det scaladoc): money
  * sums are exact integer-cent sums (order-free — Spark's partial/final
  * split and AQE coalescing are free to reorder at any scale), means and
  * variance-family stats are derived from exact integer moments with a
  * fixed double op sequence, and percentiles run over scaled longs.
  * Reference analogues: per-pixel temporal reductions and WOfS-style
  * clear-observation ratios (SURVEY §3.4).
  */
object Aggregates {

  /** Flagship TPC-H-Q1-style pricing summary — also SparkEntry.entry.
    * Hash-aggregate with map-side partial aggregation; one shuffle on the
    * two low-cardinality group keys. */
  def aggGroup(s: SparkSession, d: String): DataFrame = {
    val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val charge = disc * (lit(1) + col("l_tax"))
    T.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        centSum(col("l_quantity")).as("sum_qty"),
        centSum(col("l_extendedprice")).as("sum_base"),
        sum(s4(disc)).as("sum_disc"),
        sum(s6(charge)).as("sum_charge"),
        avg6(col("l_quantity")).as("avg_qty"),
        avg6(col("l_extendedprice")).as("avg_price"),
        avg6(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val aggGroupOracle: String =
    "SELECT l_returnflag, l_linestatus, " +
      sqlCentSum("l_quantity") + " AS sum_qty, " +
      sqlCentSum("l_extendedprice") + " AS sum_base, " +
      "CAST(SUM(" + sqlS4("l_extendedprice * (1 - l_discount)") + ") AS BIGINT) AS sum_disc, " +
      "CAST(SUM(" + sqlS6("l_extendedprice * (1 - l_discount) * (1 + l_tax)") + ") AS BIGINT) AS sum_charge, " +
      sqlAvg6("l_quantity") + " AS avg_qty, " +
      sqlAvg6("l_extendedprice") + " AS avg_price, " +
      sqlAvg6("l_discount") + " AS avg_disc, " +
      "CAST(COUNT(*) AS BIGINT) AS count_order " +
      "FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"

  // ---- HyperLogLog plumbing shared by agg_hll and agg_hll_merge (the
  // ---- sketch build/estimate is identical; only the register source
  // ---- differs). See the agg_hll key comment for the numeric argument.
  private val HllM = 256
  private val HllAlpha = 0.7213 / (1 + 1.079 / HllM)

  /** rho = leading-zero count of the 24 post-bucket hash bits + 1, as a
    * comparison chain over `w` — no log2, no floor-boundary risk. */
  private def hllRho: Column =
    (1 to 24).foldRight(lit(25): Column) { (r, acc) =>
      when(col("w") >= (1L << (24 - r)), r).otherwise(acc)
    }

  private val hllRhoSql: String = (1 to 24).map(r =>
    s"WHEN w >= ${1L << (24 - r)} THEN $r").mkString(
    "CASE ", " ", " ELSE 25 END")

  /** (event_type, hv) from events — the hashed item stream. */
  private def hllItems(s: SparkSession, d: String): DataFrame =
    T.events(s, d).select(col("event_type"),
      hash32(col("user_id").cast("string")).as("hv"))

  /** Raw-double estimate from a finished register table (keys..., j,
    * mreg): exact-dyadic harmonic sum + the published linear-counting
    * correction below 2.5m. Kept unscaled so composite keys
    * (inclusion-exclusion) can combine estimates before the single
    * final rounding. */
  private def hllEstimateRaw(regs: DataFrame, keys: String*): DataFrame = {
    val eraw = lit(HllAlpha) * HllM * HllM /
      (col("spresent") + (lit(HllM) - col("npresent")).cast("double"))
    val v = lit(HllM.toLong) - col("npresent")
    regs.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("npresent"),
        sum(lit(1.0) / expr("CAST(shiftleft(1L, mreg) AS DOUBLE)")).as("spresent"))
      .select(keys.map(col) :+
        when(eraw <= 2.5 * HllM && v > 0,
          lit(HllM) * lnRatio(lit(HllM.toLong), v)).otherwise(eraw).as("est"): _*)
  }

  /** Estimate from a finished register table (event_type, j, mreg). */
  private def hllEstimate(regs: DataFrame): DataFrame =
    hllEstimateRaw(regs, "event_type")
      .select(col("event_type"), s0(col("est")).as("approx_users"))
      .orderBy("event_type")

  /** Per-key-list SQL twin of [[hllEstimateRaw]]: agg + estimate CTEs
    * named `<p>agg`/`<p>est`, reading CTE `<regs>` grouped by `keyList`.
    * Textually the same arithmetic as the Column form. */
  private def hllEstimateRawSql(p: String, regs: String, keyList: String): String =
    s"${p}agg AS (SELECT $keyList, CAST(COUNT(*) AS BIGINT) AS npresent, " +
      s"CAST($HllM AS BIGINT) - CAST(COUNT(*) AS BIGINT) AS v, " +
      s"SUM(1.0 / CAST(CAST(1 AS BIGINT) << mreg AS DOUBLE)) AS spresent FROM $regs GROUP BY $keyList), " +
      s"${p}est AS (SELECT $keyList, " +
      s"CASE WHEN (CAST($HllAlpha AS DOUBLE) * $HllM * $HllM / (spresent + CAST($HllM - npresent AS DOUBLE))) <= ${2.5 * HllM} " +
      s"AND v > 0 THEN $HllM * ${sqlLnRatio(s"$HllM", "v")} " +
      s"ELSE CAST($HllAlpha AS DOUBLE) * $HllM * $HllM / (spresent + CAST($HllM - npresent AS DOUBLE)) END AS est FROM ${p}agg)"

  /** Oracle tail from a `regs(event_type, j, mreg)` CTE — textually the
    * same estimate arithmetic as [[hllEstimate]]. */
  private def hllEstimateSql(withRegsCtes: String): String =
    withRegsCtes +
      ", agg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS npresent, " +
      "SUM(1.0 / CAST(CAST(1 AS BIGINT) << mreg AS DOUBLE)) AS spresent FROM regs GROUP BY event_type), " +
      s"est AS (SELECT event_type, CAST($HllM AS BIGINT) - npresent AS v, " +
      s"CAST($HllAlpha AS DOUBLE) * $HllM * $HllM / (spresent + CAST($HllM - npresent AS DOUBLE)) AS eraw FROM agg) " +
      "SELECT event_type, " +
      sqlS0(s"CASE WHEN eraw <= ${2.5 * HllM} AND v > 0 THEN $HllM * ${sqlLnRatio(s"$HllM", "v")} ELSE eraw END") +
      " AS approx_users FROM est ORDER BY event_type"

  val all: Seq[Q] = Seq(

    Q("agg_group", Some(aggGroupOracle), aggGroup),

    Q("agg_global", Some(
      "SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
        sqlCentSum("l_quantity") + " AS sum_qty, " +
        sqlAvg6("l_extendedprice") + " AS avg_price, " +
        sqlS2("MIN(l_extendedprice)") + " AS min_price, " +
        sqlS2("MAX(l_extendedprice)") + " AS max_price FROM lineitem"),
      (s, d) =>
        T.lineitem(s, d).agg(
          count(lit(1)).as("n"),
          centSum(col("l_quantity")).as("sum_qty"),
          avg6(col("l_extendedprice")).as("avg_price"),
          s2(min(col("l_extendedprice"))).as("min_price"),
          s2(max(col("l_extendedprice"))).as("max_price"))),

    Q("agg_distinct", Some(
      "SELECT c_mktsegment, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust, " +
        "CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
      (s, d) =>
        T.orders(s, d)
          .join(broadcast(T.customer(s, d)), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n_orders"))
          .orderBy("c_mktsegment")),

    // HyperLogLog, HAND-IMPLEMENTED relationally (Flajolet, Fusy, Gandon
    // & Meunier 2007) — round 6 replaced the opaque approx_count_distinct
    // call so the sketch itself is part of the library AND oracle-graded:
    // registers from the portable Det.hash32 (j = h % m, rho = leading
    // zeros of the remaining 24 bits + 1 via a COMPARISON chain — no
    // log2, no floor-boundary risk), MAX-merged per (group, register) —
    // a classic two-level aggregation, merge-order-free by construction.
    // The harmonic sum's 2^-M terms are exact dyadic doubles (lsb 2^-25,
    // Half-sample replication error bars (round 10, fifth wave) — the
    // DETERMINISTIC bootstrap a distributed engine can actually grade:
    // B=16 half-sample replicates, membership decided by the portable
    // Det.hash32 gate (row ∈ replicate b iff hash(b:id) is even — no
    // RNG, no resample shuffle: the replicate table is one hash-gated
    // row fan-out), each replicate's mean on the 1e-6 grid, and the
    // spread of those 16 integers estimates the standard error
    // (half-sample McCarthy replication: Var(m_b − m̄) = 2σ²/n + σ²/n −
    // 2·σ²/n = σ²/n, so the raw spread IS se(full mean) — measured 1.35
    // vs σ/√n ≈ 1.6 at sf0.001).
    // Variance is computed on avg6-CENTERED deviations so every moment
    // stays far inside int64; the only doubles are ONE division and ONE
    // correctly-rounded sqrt (IEEE-exact on both engines, the win_zscore
    // rule — never a libm transcendental). At 100 TB this is how error
    // bars ship with every metric: B linear passes fused into one scan
    // (the fan-out is a broadcast range join), no data resampling.
    Q("agg_halfsample_ci", Some(
      "WITH r AS (SELECT event_id, " + sqlS2("value") + " AS v FROM events), " +
        "fl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(FLOOR(CAST(SUM(v) AS DOUBLE) * 1e4 / COUNT(*) + 0.5) AS BIGINT) AS avg6 FROM r), " +
        "b AS (SELECT UNNEST(RANGE(0, 16)) AS bi), " +
        "hs AS (SELECT b.bi, r.v FROM r CROSS JOIN b " +
        "WHERE " + sqlHash32("CONCAT(CAST(b.bi AS VARCHAR), ':', CAST(r.event_id AS VARCHAR))") + " % 2 = 0), " +
        "m AS (SELECT bi, CAST(FLOOR(CAST(SUM(v) AS DOUBLE) * 1e4 / COUNT(*) + 0.5) AS BIGINT) AS m6 " +
        "FROM hs GROUP BY bi), " +
        "dev AS (SELECT m.m6 - fl.avg6 AS dd FROM m, fl), " +
        "st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb, CAST(SUM(dd) AS BIGINT) AS sd, " +
        "CAST(SUM(dd * dd) AS BIGINT) AS sdd FROM dev) " +
        "SELECT fl.n, fl.avg6, " +
        "CAST(FLOOR(SQRT(CAST(st.nb * st.sdd - st.sd * st.sd AS DOUBLE) / " +
        "(st.nb * (st.nb - 1))) + 0.5) AS BIGINT) AS spread6 " +
        "FROM fl, st"),
      (s, d) => {
        val r = T.events(s, d).select(col("event_id"), s2(col("value")).as("v"))
        val fl = r.agg(count(lit(1)).as("n"),
          floor(sum("v").cast("double") * lit(1e4) / count(lit(1)) + 0.5)
            .cast("long").as("avg6"))
        val bs = s.range(0, 16).select(col("id").as("bi"))
        val m = r.crossJoin(broadcast(bs))
          .where(hash32(concat(col("bi").cast("string"), lit(":"),
            col("event_id").cast("string"))) % 2 === 0)
          .groupBy("bi")
          .agg(floor(sum("v").cast("double") * lit(1e4) / count(lit(1)) + 0.5)
            .cast("long").as("m6"))
        val st = m.crossJoin(broadcast(fl.select(col("avg6").as("a6"))))
          .select((col("m6") - col("a6")).as("dd"))
          .agg(count(lit(1)).as("nb"), sum("dd").as("sd"),
            sum(col("dd") * col("dd")).as("sdd"))
        fl.crossJoin(broadcast(st))
          .select(col("n"), col("avg6"),
            floor(sqrt((col("nb") * col("sdd") - col("sd") * col("sd")).cast("double") /
              (col("nb") * (col("nb") - 1))) + 0.5).cast("long").as("spread6"))
      }),

    // total < m => 33 significand bits), so S is EXACT in any order, and
    // the small-range linear-counting correction m*ln(m/V) applies below
    // 2.5m exactly as published. Accuracy stays property-tested (±5%
    // vs exact; at this corpus's ~150 distinct per group the LC regime
    // estimate is within ~1%).
    Q("agg_hll", Some(hllEstimateSql(
      "WITH h AS (SELECT event_type, " + sqlHash32("CAST(user_id AS VARCHAR)") + " AS hv " +
        "FROM events), " +
        s"jr AS (SELECT event_type, hv % $HllM AS j, hv // $HllM AS w FROM h), " +
        s"regs AS (SELECT event_type, j, MAX($hllRhoSql) AS mreg FROM jr GROUP BY event_type, j)")),
      (s, d) => {
        val regs = hllItems(s, d)
          .select(col("event_type"), (col("hv") % HllM).as("j"),
            expr(s"hv div $HllM").as("w"))
          .groupBy("event_type", "j")
          .agg(max(hllRho).as("mreg"))
        hllEstimate(regs)
      }),

    // Sketch MERGEABILITY, graded (round 8): two HLL sketches built
    // INDEPENDENTLY on disjoint halves of the stream (event_id parity —
    // the per-partition / per-day build at 100 TB, where each ingest
    // batch keeps an O(m) sketch and the union is answered without
    // re-touching the data), then merged register-wise by MAX and
    // estimated. Register MAX over a partition of the items equals the
    // global register, so the estimate must hash-match agg_hll — but the
    // PLAN is the real merge path (two independent aggregations unioned),
    // and the oracle spells the same split/merge, sealing the
    // "sketches compose" claim the HLL key comment only asserted.
    Q("agg_hll_merge", Some(hllEstimateSql(
      "WITH h AS (SELECT event_type, event_id % 2 AS half, " +
        sqlHash32("CAST(user_id AS VARCHAR)") + " AS hv FROM events), " +
        s"jr AS (SELECT event_type, half, hv % $HllM AS j, hv // $HllM AS w FROM h), " +
        s"partials AS (SELECT event_type, half, j, MAX($hllRhoSql) AS mreg " +
        "FROM jr GROUP BY event_type, half, j), " +
        "regs AS (SELECT event_type, j, MAX(mreg) AS mreg FROM partials GROUP BY event_type, j)")),
      (s, d) => {
        val jr = T.events(s, d).select(col("event_type"),
            (col("event_id") % 2).as("half"),
            hash32(col("user_id").cast("string")).as("hv"))
          .select(col("event_type"), col("half"), (col("hv") % HllM).as("j"),
            expr(s"hv div $HllM").as("w"))
        val partials = jr.groupBy("event_type", "half", "j")
          .agg(max(hllRho).as("mreg"))
        val regs = partials.groupBy("event_type", "j").agg(max("mreg").as("mreg"))
        hllEstimate(regs)
      }),

    // Count-Min sketch (Cormode & Muthukrishnan 2005), HAND-IMPLEMENTED
    // relationally and oracle-graded like the HLL: d=4 rows × w=256
    // counters; row i hashes an item to pmod(hash32(item || "#i"), w) and
    // the point estimate is MIN over the 4 rows' counters. The sketch
    // build is one count aggregation on (row, pos) — 1024 cells total
    // regardless of stream size, merge = counter SUM (order-free) — and
    // probing broadcasts the finished sketch to the query keys. Estimates
    // are biased HIGH only (collisions add, never subtract): the ≥-exact
    // bound and the published ε=e/w error bound are property-tested in
    // SketchSpec; the oracle spells the identical sketch, grading the
    // implementation itself.
    Q("agg_countmin", Some {
      val posSql = sqlHash32("event_type || '#' || CAST(rw AS VARCHAR)") + " % 256"
      "WITH rows4 AS (SELECT UNNEST([0, 1, 2, 3]) AS rw), " +
        s"cells AS (SELECT rw, $posSql AS pos FROM events CROSS JOIN rows4), " +
        "sketch AS (SELECT rw, pos, CAST(COUNT(*) AS BIGINT) AS cnt FROM cells GROUP BY rw, pos), " +
        "keys AS (SELECT DISTINCT event_type FROM events), " +
        s"probes AS (SELECT event_type, rw, $posSql AS pos FROM keys CROSS JOIN rows4) " +
        "SELECT p.event_type, MIN(s.cnt) AS est_n FROM probes p " +
        "JOIN sketch s ON s.rw = p.rw AND s.pos = p.pos " +
        "GROUP BY p.event_type ORDER BY p.event_type"
    },
      (s, d) => {
        val cmD = 4; val cmW = 256
        def positions(item: Column): Column = array((0 until cmD).map(i =>
          pmod(hash32(concat(item, lit("#" + i))), lit(cmW))): _*)
        val cells = T.events(s, d).select(
          posexplode(positions(col("event_type"))).as(Seq("rw", "pos")))
        val sketch = cells.groupBy("rw", "pos").agg(count(lit(1)).as("cnt"))
        val probes = T.events(s, d).select("event_type").distinct()
          .select(col("event_type"),
            posexplode(positions(col("event_type"))).as(Seq("rw", "pos")))
        probes.join(broadcast(sketch), Seq("rw", "pos"))
          .groupBy("event_type").agg(min(col("cnt")).as("est_n"))
          .orderBy("event_type")
      }),

    // EXACT distinct counting via 64-bit word bitmaps (round 8) — the
    // dense-integer-ID regime where a bitmap beats both COUNT(DISTINCT)'s
    // value shuffle and the HLL's approximation (the roaring-bitmap dense
    // container / bitmap-index pattern). Each key sets bit (k % 64) of
    // word (k div 64); partial state per (group, word) is a single long
    // merged by BIT_OR — idempotent AND order-free, so duplicate keys
    // collapse map-side and the shuffle carries at most maxkey/64 words
    // per group NO MATTER how many input rows (at 100 TB: rows shrink to
    // a fixed-size bitmap before moving). popcount-sum over words is the
    // exact distinct count; the oracle is plain COUNT(DISTINCT), grading
    // that the bitmap loses and invents nothing.
    Q("agg_bitmap_distinct", Some(
      "SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust " +
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
      (s, d) => {
        val words = T.orders(s, d)
          .select(col("o_orderpriority"),
            expr("o_custkey DIV 64").as("wi"),
            expr("shiftleft(CAST(1 AS BIGINT), CAST(o_custkey % 64 AS INT))").as("bit"))
          .groupBy("o_orderpriority", "wi")
          .agg(bit_or(col("bit")).as("bits"))
        words.groupBy("o_orderpriority")
          .agg(sum(expr("bit_count(bits)")).as("n_cust"))
          .orderBy("o_orderpriority")
      }),

    // Sketch SET ALGEBRA (round 8): audience overlap |A∩B| between every
    // pair of event types by inclusion-exclusion over the SAME HLL
    // registers as agg_hll — est(A) + est(B) − est(A∪B), where the union
    // estimate comes from a register-wise MAX merge (the only set op HLL
    // supports natively; intersection has no direct sketch, which is WHY
    // the published recipe is inclusion-exclusion, e.g. the theta-sketch
    // comparison literature). At 100 TB the per-type registers are O(m)
    // each and every join below is a broadcast of sketch-sized tables —
    // the raw stream is touched exactly once to build `regs`. All three
    // estimates stay raw doubles until ONE final s0 rounding, and the
    // oracle spells the identical register algebra, so the subtraction
    // of two ~equal estimates is the same IEEE sequence on both engines.
    Q("agg_hll_intersect", Some {
      val regsCte =
        "WITH h AS (SELECT event_type, " + sqlHash32("CAST(user_id AS VARCHAR)") + " AS hv FROM events), " +
          s"jr AS (SELECT event_type, hv % $HllM AS j, hv // $HllM AS w FROM h), " +
          s"regs AS (SELECT event_type, j, MAX($hllRhoSql) AS mreg FROM jr GROUP BY event_type, j), " +
          "pairs AS (SELECT a.event_type AS ta, b.event_type AS tb " +
          "FROM (SELECT DISTINCT event_type FROM events) a " +
          "JOIN (SELECT DISTINCT event_type FROM events) b ON a.event_type < b.event_type), " +
          "uregs AS (SELECT p.ta, p.tb, r.j, MAX(r.mreg) AS mreg FROM pairs p " +
          "JOIN regs r ON r.event_type = p.ta OR r.event_type = p.tb GROUP BY p.ta, p.tb, r.j)"
      regsCte + ", " +
        hllEstimateRawSql("t", "regs", "event_type") + ", " +
        hllEstimateRawSql("u", "uregs", "ta, tb") +
        " SELECT u.ta, u.tb, " + sqlS0("a.est + b.est - u.est") + " AS inter_est " +
        "FROM uest u JOIN test a ON a.event_type = u.ta " +
        "JOIN test b ON b.event_type = u.tb ORDER BY u.ta, u.tb"
    },
      (s, d) => {
        val regs = hllItems(s, d)
          .select(col("event_type"), (col("hv") % HllM).as("j"),
            expr(s"hv div $HllM").as("w"))
          .groupBy("event_type", "j")
          .agg(max(hllRho).as("mreg"))
        val types = regs.select("event_type").distinct()
        val pairs = types.as("a").join(types.as("b"),
            col("a.event_type") < col("b.event_type"))
          .select(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
        val unionRegs = regs.join(broadcast(pairs),
            col("event_type") === col("ta") || col("event_type") === col("tb"))
          .groupBy("ta", "tb", "j").agg(max("mreg").as("mreg"))
        val estT = hllEstimateRaw(regs, "event_type")
        hllEstimateRaw(unionRegs, "ta", "tb").withColumnRenamed("est", "eu")
          .join(broadcast(estT.select(col("event_type").as("ta"), col("est").as("ea"))), "ta")
          .join(broadcast(estT.select(col("event_type").as("tb"), col("est").as("eb"))), "tb")
          .select(col("ta"), col("tb"),
            s0(col("ea") + col("eb") - col("eu")).as("inter_est"))
          .orderBy("ta", "tb")
      }),

    // Histogram MERGEABILITY (round 8) — the agg_hll_merge argument made
    // for the quantile sketch: two fixed-grid histograms built
    // INDEPENDENTLY on disjoint halves of lineitem (orderkey parity — the
    // per-ingest-batch build at 100 TB), merged by plain count SUM, then
    // quantiled. The grid is pinned by the same global (min, max) pass
    // agg_approx_pct already needs, so half-built bins land on identical
    // edges and the merged histogram is EQUAL to the single-pass one —
    // count addition is order-free, unlike KLL/t-digest compaction. The
    // oracle spells the same split/merge; equality with agg_approx_pct
    // itself is asserted in SketchSpec.
    Q("agg_hist_merge", Some(
      "WITH stats AS (SELECT l_returnflag, MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY l_returnflag), " +
        "binned AS (SELECT l.l_returnflag, l.l_orderkey % 2 AS half, CASE WHEN s.mx = s.mn THEN 0 ELSE " +
        "LEAST(CAST(FLOOR((l.l_extendedprice - s.mn) / (s.mx - s.mn) * 4096.0) AS BIGINT), 4095) END AS bin " +
        "FROM lineitem l JOIN stats s ON l.l_returnflag = s.l_returnflag), " +
        "partials AS (SELECT l_returnflag, half, bin, CAST(COUNT(*) AS BIGINT) AS c " +
        "FROM binned GROUP BY l_returnflag, half, bin), " +
        "hist AS (SELECT l_returnflag, bin, CAST(SUM(c) AS BIGINT) AS c FROM partials GROUP BY l_returnflag, bin), " +
        "cum AS (SELECT h.l_returnflag, h.bin, SUM(h.c) OVER (PARTITION BY h.l_returnflag ORDER BY h.bin " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, s.mn, s.mx, s.n " +
        "FROM hist h JOIN stats s ON h.l_returnflag = s.l_returnflag) " +
        "SELECT l_returnflag, " +
        "MIN(CASE WHEN cum >= CAST(CEIL(0.5 * n) AS BIGINT) THEN mn + bin * (mx - mn) / 4096.0 END) AS p50_approx, " +
        "MIN(CASE WHEN cum >= CAST(CEIL(0.95 * n) AS BIGINT) THEN mn + bin * (mx - mn) / 4096.0 END) AS p95_approx " +
        "FROM cum GROUP BY l_returnflag ORDER BY l_returnflag"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val price = col("l_extendedprice")
        val stats = T.lineitem(s, d).groupBy("l_returnflag")
          .agg(min(price).as("mn"), max(price).as("mx"), count(lit(1)).as("n"))
        val binned = T.lineitem(s, d).join(broadcast(stats), "l_returnflag")
          .select(col("l_returnflag"), (col("l_orderkey") % 2).as("half"),
            when(col("mx") === col("mn"), 0L).otherwise(
              least(floor((price - col("mn")) / (col("mx") - col("mn")) * 4096.0), lit(4095L)))
              .as("bin"))
        val partials = binned.groupBy("l_returnflag", "half", "bin")
          .agg(count(lit(1)).as("c"))
        val hist = partials.groupBy("l_returnflag", "bin").agg(sum("c").as("c"))
        val w = Window.partitionBy("l_returnflag").orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, 0)
        val edge = col("mn") + col("bin") * (col("mx") - col("mn")) / 4096.0
        def estAt(p: Double) =
          min(when(col("cum") >= ceil(lit(p) * col("n")), edge))
        hist.withColumn("cum", sum(col("c")).over(w))
          .join(broadcast(stats), "l_returnflag")
          .groupBy("l_returnflag")
          .agg(estAt(0.5).as("p50_approx"), estAt(0.95).as("p95_approx"))
          .orderBy("l_returnflag")
      }),

    Q("agg_rollup", Some(
      "SELECT r_name, n_name, CAST(GROUPING(r_name, n_name) AS INTEGER) AS gid, " +
        "CAST(COUNT(*) AS BIGINT) AS n_cust, " + sqlCentSum("c_acctbal") + " AS sum_bal " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY ROLLUP (r_name, n_name) " +
        "ORDER BY r_name NULLS FIRST, n_name NULLS FIRST"),
      (s, d) => {
        // Dataset.rollup trips the analyzer's ambiguous-self-join heuristic on
        // this join tree (Spark 4.1 false positive); the SQL form builds the
        // identical Aggregate(Rollup) plan without it.
        custNationRegion(s, d).createOrReplaceTempView("crn_rollup")
        s.sql(
          "SELECT r_name, n_name, CAST(GROUPING_ID() AS INT) AS gid, " +
            "COUNT(*) AS n_cust, SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS sum_bal " +
            "FROM crn_rollup GROUP BY ROLLUP(r_name, n_name) " +
            "ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST")
      }),

    Q("agg_cube", Some(
      "SELECT r_name, n_name, CAST(GROUPING(r_name, n_name) AS INTEGER) AS gid, " +
        "CAST(COUNT(*) AS BIGINT) AS n_cust FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY CUBE (r_name, n_name) " +
        "ORDER BY r_name NULLS FIRST, n_name NULLS FIRST, gid"),
      (s, d) => {
        custNationRegion(s, d).createOrReplaceTempView("crn_cube")
        s.sql(
          "SELECT r_name, n_name, CAST(GROUPING_ID() AS INT) AS gid, COUNT(*) AS n_cust " +
            "FROM crn_cube GROUP BY CUBE(r_name, n_name) " +
            "ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST, gid")
      }),

    Q("agg_gsets", Some(
      "SELECT r_name, n_name, CAST(GROUPING(r_name, n_name) AS INTEGER) AS gid, " +
        "CAST(COUNT(*) AS BIGINT) AS n_cust FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY GROUPING SETS ((r_name), (n_name), ()) " +
        "ORDER BY r_name NULLS FIRST, n_name NULLS FIRST, gid"),
      (s, d) =>
        custNationRegion(s, d)
          .groupingSets(
            Seq(Seq(col("r_name")), Seq(col("n_name")), Seq.empty),
            col("r_name"), col("n_name"))
          .agg(grouping_id().cast("int").as("gid"), count(lit(1)).as("n_cust"))
          .select("r_name", "n_name", "gid", "n_cust")
          .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first, col("gid"))),

    // max_by/min_by (DuckDB arg_max/arg_min): the ordering value embeds the
    // unique orderkey so ties cannot make the argmax engine-dependent.
    Q("agg_minmax_by", Some(
      "SELECT o_custkey, " +
        "ARG_MAX(o_orderkey, CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) * 10000000 + o_orderkey) AS biggest_order, " +
        "ARG_MIN(o_orderkey, CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) * 10000000 + o_orderkey) AS smallest_order " +
        "FROM orders GROUP BY o_custkey ORDER BY o_custkey"),
      (s, d) => {
        val rankVal = floor(col("o_totalprice") * 100 + 0.5).cast("long") * 10000000L +
          col("o_orderkey")
        T.orders(s, d)
          .groupBy("o_custkey")
          .agg(
            max_by(col("o_orderkey"), rankVal).as("biggest_order"),
            min_by(col("o_orderkey"), rankVal).as("smallest_order"))
          .orderBy("o_custkey")
      }),

    // Pivot: linestatus becomes columns (reference analogue: per-band
    // columns out of a long (pixel, band, value) layout). Pivot values are
    // declared, not discovered — no extra distinct pass, stable schema.
    Q("agg_pivot", Some(
      "SELECT l_returnflag, " +
        "CAST(SUM(CASE WHEN l_linestatus = 'F' THEN " + sqlS2("l_quantity") + " ELSE 0 END) AS BIGINT) AS F, " +
        "CAST(SUM(CASE WHEN l_linestatus = 'O' THEN " + sqlS2("l_quantity") + " ELSE 0 END) AS BIGINT) AS O " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      (s, d) =>
        T.lineitem(s, d)
          .groupBy("l_returnflag")
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(sum(s2(col("l_quantity"))))
          .na.fill(0L)
          .orderBy("l_returnflag")),

    // Unpivot/melt: wide -> long (the inverse raster layout move).
    Q("agg_unpivot", Some(
      "SELECT o_orderkey, metric, " + sqlS6("v") + " AS v FROM (" +
        "SELECT o_orderkey, 'price' AS metric, o_totalprice AS v FROM orders " +
        "UNION ALL SELECT o_orderkey, 'key100' AS metric, CAST(o_custkey * 100 AS DOUBLE) AS v FROM orders) u " +
        "ORDER BY o_orderkey, metric"),
      (s, d) =>
        T.orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice").as("price"),
            (col("o_custkey") * 100).cast("double").as("key100"))
          .unpivot(Array(col("o_orderkey")), Array(col("price"), col("key100")),
            "metric", "v")
          .select(col("o_orderkey"), col("metric"), s6(col("v")).as("v"))
          .orderBy("o_orderkey", "metric")),

    Q("agg_filtered", Some(
      "SELECT l_returnflag, " +
        "CAST(SUM(CASE WHEN l_discount > 0.05 THEN " + sqlS2("l_quantity") + " ELSE 0 END) AS BIGINT) AS qty_highdisc, " +
        "CAST(SUM(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      (s, d) =>
        T.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            sum(when(col("l_discount") > 0.05, s2(col("l_quantity"))).otherwise(lit(0L)))
              .as("qty_highdisc"),
            sum(when(col("l_quantity") >= 25, 1).otherwise(0)).cast("bigint").as("n_bulk"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")),

    // Variance family from exact integer moments (n, Σx, Σx², Σxy over
    // nearest-integer units): the sums are order-free longs, and every
    // derived double op below has identical integer inputs on both engines,
    // so sd/var/corr/cov are bit-identical before the s4 projection.
    // SCALE BOUND (documented, not hit at any graded SF): the second
    // moments accumulate pi² ≈ 1e10 per row (pi = l_extendedprice in whole
    // currency units, ≤ ~1.1e5), so a single group overflows the exact
    // BIGINT sum beyond ~9.2e18/1e10 ≈ 9e8 rows — and Spark's non-ANSI
    // long sum wraps silently while DuckDB's HUGEINT raises, so the two
    // engines would fail DIFFERENTLY past that point. Likewise the
    // n·spp products leave the 2^53 exact-integer range of doubles around
    // ~1e8 rows/group (the double results stay bit-identical across
    // engines — rule 3's fixed-op-sequence argument — but are no longer
    // exact integers). Past ~1e8 rows per group, shard the moments:
    // pre-aggregate per (group, salt) with salt = hash(pk) % K so each
    // shard's sums stay exact, then combine shard moments — same algebra,
    // one extra exact reduction level.
    Q("agg_stats", Some(statsOracle),
      (s, d) => {
        val qi = s0(col("l_quantity"))
        val pi = s0(col("l_extendedprice"))
        val m = T.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            sum(qi).as("sq"), sum(qi * qi).as("sqq"),
            sum(pi).as("sp"), sum(pi * pi).as("spp"),
            sum(pi * qi).as("spq"))
        val nD = col("n").cast("double")
        val sqD = col("sq").cast("double"); val sqqD = col("sqq").cast("double")
        val spD = col("sp").cast("double"); val sppD = col("spp").cast("double")
        val spqD = col("spq").cast("double")
        val varQ = (nD * sqqD - sqD * sqD) / (nD * (nD - lit(1.0)))
        val covPQ = (nD * spqD - spD * sqD) / (nD * (nD - lit(1.0)))
        val corrPQ = (nD * spqD - spD * sqD) /
          (sqrt(nD * sqqD - sqD * sqD) * sqrt(nD * sppD - spD * spD))
        m.select(
            col("l_returnflag"),
            s4(sqrt(varQ)).as("sd_qty"),
            s4(varQ).as("var_qty"),
            s4(corrPQ).as("corr_pq"),
            s4(covPQ).as("cov_pq"))
          .orderBy("l_returnflag")
      }),

    // Linear-regression aggregates (regr_slope / regr_intercept / regr_r2)
    // derived from the SAME exact integer moments as agg_stats — Spark's
    // built-in regr_* aggregate doubles directly and is merge-order-
    // dependent, so the graded form reduces to exact scaled-long sums
    // (n, Σx, Σy, Σxy, Σx², Σy²) first and derives the statistics with a
    // fixed double op sequence (Det rule 3: identical integer inputs ⇒
    // bit-identical doubles on both engines). Same 2^53 headroom note and
    // per-(group, salt) sharding remedy as agg_stats at ≥1e8 rows/group.
    Q("agg_regr", Some(regrOracle),
      (s, d) => {
        val xi = s0(col("l_quantity"))
        val yi = s0(col("l_extendedprice"))
        val m = T.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            sum(xi).as("sx"), sum(xi * xi).as("sxx"),
            sum(yi).as("sy"), sum(yi * yi).as("syy"),
            sum(xi * yi).as("sxy"))
        val nD = col("n").cast("double")
        val sxD = col("sx").cast("double"); val sxxD = col("sxx").cast("double")
        val syD = col("sy").cast("double"); val syyD = col("syy").cast("double")
        val sxyD = col("sxy").cast("double")
        val cov = nD * sxyD - sxD * syD
        val varX = nD * sxxD - sxD * sxD
        val varY = nD * syyD - syD * syD
        val slope = cov / varX
        val intercept = (syD - slope * sxD) / nD
        val r2 = (cov * cov) / (varX * varY)
        m.select(
            col("l_returnflag"), col("n"),
            s6(slope).as("slope6"),
            s4(intercept).as("icept4"),
            s6(r2).as("r2_6"))
          .orderBy("l_returnflag")
      }),

    // Higher-moment shape statistics (skewness / excess kurtosis) from
    // the SAME exact integer-moment discipline as agg_stats/agg_regr:
    // n, Σx..Σx⁴ as exact longs (x = integer quantities ≤ 50, so Σx⁴
    // stays under 2^53 through ~10^9 rows/group; beyond that the same
    // per-(group, salt) sharding remedy applies), then ONE fixed double
    // op sequence per statistic. m2^1.5 is spelled m2*SQRT(m2), never
    // POWER() — sqrt is IEEE-correctly-rounded everywhere, pow is not
    // (the Det trig-ulp rule). The built-in skewness/kurtosis aggregates
    // are merge-order-dependent doubles, which is WHY the graded form
    // reduces to moments first.
    Q("agg_skew_kurt", Some(skewKurtOracle),
      (s, d) => {
        val xi = s0(col("l_quantity"))
        val m = T.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            sum(xi).as("s1"), sum(xi * xi).as("s2"),
            sum(xi * xi * xi).as("s3"), sum(xi * xi * xi * xi).as("s4m"))
        val nD = col("n").cast("double")
        val s1D = col("s1").cast("double"); val s2D = col("s2").cast("double")
        val s3D = col("s3").cast("double"); val s4D = col("s4m").cast("double")
        val mu = s1D / nD
        val m2 = s2D / nD - mu * mu
        val m3 = s3D / nD - lit(3.0) * mu * (s2D / nD) + lit(2.0) * mu * mu * mu
        val m4 = s4D / nD - lit(4.0) * mu * (s3D / nD) +
          lit(6.0) * mu * mu * (s2D / nD) - lit(3.0) * mu * mu * mu * mu
        m.select(
            col("l_returnflag"), col("n"),
            s6(m3 / (m2 * sqrt(m2))).as("skew6"),
            s6(m4 / (m2 * m2) - lit(3.0)).as("kurt6"))
          .orderBy("l_returnflag")
      }),

    // Shannon entropy of each user's event-type mix — the behavioral-
    // diversity feature of engagement/quality scoring (and the split
    // criterion of every decision tree). The llm_unigram_logprob LN
    // discipline: each -(c/n)ln(c/n) term is s6-floored BEFORE the
    // per-user sum, so the aggregate is an order-free integer (a raw
    // double SUM over partials would be merge-order-dependent); c and n
    // are exact longs, so the per-term double sequence is engine-
    // identical. Single-type users hit ln(1) = 0 exactly. Linear: two
    // exchanges — (user_id, event_type) for the count, then user_id for
    // the window (hashpartitioning(user_id, event_type) does NOT satisfy
    // the window's user_id clustering); the final user_id agg reuses the
    // second.
    Q("agg_entropy", Some(
      "WITH g AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c " +
        "FROM events GROUP BY user_id, event_type), " +
        "t0 AS (SELECT user_id, c, " +
        "CAST(SUM(c) OVER (PARTITION BY user_id) AS BIGINT) AS n FROM g), " +
        "t AS (SELECT user_id, c, " +
        sqlS6("(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * " + sqlLnRatio("c", "n")) +
        " AS term6 FROM t0) " +
        "SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events, " +
        "CAST(COUNT(*) AS BIGINT) AS n_types, " +
        "CAST(-SUM(term6) AS BIGINT) AS ent6 " +
        "FROM t GROUP BY user_id ORDER BY user_id"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val g = T.events(s, d)
          .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
        val wu = Window.partitionBy("user_id")
        val g2 = g.withColumn("n", sum(col("c")).over(wu))
        val p = col("c").cast("double") / col("n").cast("double")
        g2.withColumn("term6", s6(p * lnRatio(col("c"), col("n"))))
          .groupBy("user_id")
          .agg(sum(col("c")).as("n_events"), count(lit(1)).as("n_types"),
            (-sum(col("term6"))).as("ent6"))
          .orderBy("user_id")
      }),

    // Exact weighted median (round 9) — the revenue-weighted "typical
    // order size" statistic no built-in serves (percentile_approx is
    // unweighted and approximate): the smallest quantity whose cumulative
    // revenue weight reaches half the group's total. All integer math:
    // weights are exact cents, the value domain is collapsed FIRST
    // (groupBy flag+quantity — ~50 distinct quantities regardless of
    // corpus size), so the window cumsum runs over a value-domain-sized
    // table, not the fact table. At 100 TB: one partial-agg shuffle on
    // (flag, q) does all the data-sized work map-side; the cumulative
    // pick is a few hundred rows. The lower-median convention (2*cw >=
    // W) is pinned on both engines.
    Q("agg_weighted_median", Some(
      "WITH w AS (SELECT l_returnflag AS flag, l_quantity AS q, " +
        sqlS2("l_extendedprice") + " AS wt FROM lineitem), " +
        "g AS (SELECT flag, q, CAST(SUM(wt) AS BIGINT) AS wq FROM w GROUP BY flag, q), " +
        "c AS (SELECT flag, q, wq, " +
        "CAST(SUM(wq) OVER (PARTITION BY flag ORDER BY q) AS BIGINT) AS cw, " +
        "CAST(SUM(wq) OVER (PARTITION BY flag) AS BIGINT) AS tw FROM g) " +
        "SELECT flag AS l_returnflag, " +
        sqlS2("MIN(CASE WHEN 2 * cw >= tw THEN q END)") + " AS wmedian_c " +
        "FROM c GROUP BY flag ORDER BY l_returnflag"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val g = T.lineitem(s, d)
          .select(col("l_returnflag").as("flag"), col("l_quantity").as("q"),
            s2(col("l_extendedprice")).as("wt"))
          .groupBy("flag", "q").agg(sum(col("wt")).as("wq"))
        val byFlag = Window.partitionBy("flag")
        g.withColumn("cw", sum(col("wq")).over(byFlag.orderBy("q")))
          .withColumn("tw", sum(col("wq")).over(byFlag))
          .groupBy("flag")
          .agg(s2(min(when(col("cw") * 2 >= col("tw"), col("q")))).as("wmedian_c"))
          .select(col("flag").as("l_returnflag"), col("wmedian_c"))
          .orderBy("l_returnflag")
      }),

    // Gini concentration coefficient (round 9) — the inequality metric of
    // revenue/engagement concentration analysis, in its exact sorted-
    // cumulative form G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over cents ranked
    // ascending per segment. Determinism: ties on x get arbitrary ranks
    // but Σ i·xᵢ is INVARIANT under permutations within a tie group (the
    // tied x factors out of its fixed rank-index set), so the integer
    // sums are engine-exact without a tie-break column; the final
    // expression is one fixed double sequence on the s6 grid. Scale: one
    // shuffle on segment + an in-partition sort; i·x sums stay in int64
    // up to ~1e8 rows/segment at this value range — beyond that (or for
    // unsorted streams) the binned Lorenz approximation replaces the
    // exact rank form (the agg_approx_pct histogram trade, documented).
    Q("agg_gini", Some(
      "WITH b AS (SELECT c.c_mktsegment AS seg, " + sqlS2("o.o_totalprice") + " AS x " +
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey), " +
        "r AS (SELECT seg, x, ROW_NUMBER() OVER (PARTITION BY seg ORDER BY x) AS i FROM b), " +
        "g AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx, " +
        "CAST(SUM(i * x) AS BIGINT) AS six FROM r GROUP BY seg) " +
        "SELECT seg, n, " +
        sqlS6("2.0 * CAST(six AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) " +
          "- (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)") + " AS gini6 " +
        "FROM g ORDER BY seg"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val b = T.orders(s, d)
          .join(broadcast(T.customer(s, d).select("c_custkey", "c_mktsegment")),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"), s2(col("o_totalprice")).as("x"))
        val i = row_number().over(Window.partitionBy("seg").orderBy("x"))
        val g = b.withColumn("i", i)
          .groupBy("seg")
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("i") * col("x")).as("six"))
        g.select(col("seg"), col("n"),
            s6(lit(2.0) * col("six").cast("double")
              / (col("n").cast("double") * col("sx").cast("double"))
              - (col("n").cast("double") + lit(1.0)) / col("n").cast("double")).as("gini6"))
          .orderBy("seg")
      }),

    // Herfindahl-Hirschman concentration index (round 9, third wave) —
    // the companion of agg_gini on the CATEGORICAL axis: how concentrated
    // is each user bucket's activity across event types (market-share
    // concentration, source-mix concentration in corpus audits). Shares
    // never materialize: HHI = Σ(nᵢ/N)² = (Σnᵢ²)/N², so both sums stay
    // exact int64 counts through the two-level aggregate and ONE double
    // divide at the end lands the statistic on the s6 grid (Det rule 3).
    // Scale: two partial-agg shuffles, the second over ≤|buckets| rows;
    // the nᵢ² sums fit int64 up to ~3e9 rows/cell.
    Q("agg_hhi", Some(
      "WITH c AS (SELECT user_id % 10 AS bucket, event_type, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY bucket, event_type), " +
        "a AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_types, " +
        "CAST(SUM(n) AS BIGINT) AS tot, CAST(SUM(n * n) AS BIGINT) AS ss FROM c GROUP BY bucket) " +
        "SELECT bucket, n_types, tot, " +
        sqlS6("CAST(ss AS DOUBLE) / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))") +
        " AS hhi6 FROM a ORDER BY bucket"),
      (s, d) => {
        val c = T.events(s, d)
          .groupBy((col("user_id") % 10).as("bucket"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        c.groupBy("bucket")
          .agg(count(lit(1)).as("n_types"), sum(col("n")).as("tot"),
            sum(col("n") * col("n")).as("ss"))
          .select(col("bucket"), col("n_types"), col("tot"),
            s6(col("ss").cast("double")
              / (col("tot").cast("double") * col("tot").cast("double"))).as("hhi6"))
          .orderBy("bucket")
      }),

    // Lag-1 autocorrelation per entity series (round 9, third wave) —
    // the first-order serial-dependence statistic of time-series QA
    // (is a sensor/user stream white or trending?). The (xₜ, xₜ₊₁) pairs
    // come from ONE entity-partitioned lead window over (ts, event_id)
    // — the same shuffle the per-entity aggregate reuses — and the
    // Pearson r over pairs follows agg_stats' exact-moment discipline:
    // six int64 sums (cents in, products ≤ ~1e10/row), then one fixed
    // double sequence (Det rule 3). NULL when fewer than 2 pairs or a
    // degenerate (constant) margin, identically on both engines. Scale:
    // one shuffle total; partition size = events-per-entity, bounded.
    Q("agg_autocorr", Some {
      val nD = "CAST(n AS DOUBLE)"
      val sxD = "CAST(sx AS DOUBLE)"; val syD = "CAST(sy AS DOUBLE)"
      val sxyD = "CAST(sxy AS DOUBLE)"
      val sxxD = "CAST(sxx AS DOUBLE)"; val syyD = "CAST(syy AS DOUBLE)"
      val denx = s"($nD * $sxxD - $sxD * $sxD)"
      val deny = s"($nD * $syyD - $syD * $syD)"
      "WITH v AS (SELECT user_id, ts, event_id, " + sqlS2("value") + " AS x FROM events), " +
        "p AS (SELECT user_id, x, LEAD(x) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y FROM v), " +
        "m AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, " +
        "CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx, " +
        "CAST(SUM(y * y) AS BIGINT) AS syy FROM p WHERE y IS NOT NULL GROUP BY user_id) " +
        "SELECT user_id, n AS n_pairs, " +
        s"CASE WHEN n < 2 OR $denx <= 0.0 OR $deny <= 0.0 THEN NULL ELSE " +
        sqlS6(s"($nD * $sxyD - $sxD * $syD) / (SQRT($denx) * SQRT($deny))") +
        " END AS r6 FROM m ORDER BY user_id"
    },
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val lead1 = lead(col("x"), 1)
          .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        val m = T.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), s2(col("value")).as("x"))
          .withColumn("y", lead1)
          .where(col("y").isNotNull)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
        val nD = col("n").cast("double")
        val sxD = col("sx").cast("double"); val syD = col("sy").cast("double")
        val sxyD = col("sxy").cast("double")
        val sxxD = col("sxx").cast("double"); val syyD = col("syy").cast("double")
        val denx = nD * sxxD - sxD * sxD
        val deny = nD * syyD - syD * syD
        val r = (nD * sxyD - sxD * syD) / (sqrt(denx) * sqrt(deny))
        m.select(col("user_id"), col("n").as("n_pairs"),
            when(col("n") < 2 || denx <= 0.0 || deny <= 0.0, lit(null))
              .otherwise(s6(r)).as("r6"))
          .orderBy("user_id")
      }),

    // Ljung-Box portmanteau test (round 12) — the residual-whiteness
    // check [Ljung & Box 1978] that upgrades agg_autocorr's single lag
    // to the m=3 joint statistic Q = n(n+2)·Σ ρ_k²/(n−k): per user
    // series, lag-k autocorrelations from EXACT integer moments (lagged
    // cross/head/tail sums via three LAGs over ONE shared per-entity
    // window sort), expanded around the mean as a fixed IEEE expression
    // so both engines compute identical doubles; each ρ and Q land on
    // the s6 grid, and the flag compares Q6 to the χ²₍₃,0.05₎ critical
    // value 7.815 as an integer. One shuffle on the entity key; the
    // window is entity-bounded at any corpus scale.
    Q("agg_ljungbox", Some {
      val nD = "CAST(n AS DOUBLE)"
      def rk(k: Int) =
        s"((CAST(sxy$k AS DOUBLE) - xbar * (CAST(sh$k AS DOUBLE) + CAST(st$k AS DOUBLE)) " +
          s"+ CAST(nk$k AS DOUBLE) * (xbar * xbar)) / den)"
      "WITH v AS (SELECT user_id, ts, event_id, " + sqlS2("value") + " AS x FROM events), " +
        "p AS (SELECT user_id, x, " +
        (1 to 3).map(k =>
          s"LAG(x, $k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS l$k")
          .mkString(", ") + " FROM v), " +
        "m AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(x) AS BIGINT) AS s, CAST(SUM(x * x) AS BIGINT) AS sxx, " +
        (1 to 3).map(k =>
          s"CAST(SUM(x * l$k) AS BIGINT) AS sxy$k, " +
            s"CAST(SUM(CASE WHEN l$k IS NOT NULL THEN l$k END) AS BIGINT) AS sh$k, " +
            s"CAST(SUM(CASE WHEN l$k IS NOT NULL THEN x END) AS BIGINT) AS st$k, " +
            s"CAST(COUNT(l$k) AS BIGINT) AS nk$k").mkString(", ") +
        " FROM p GROUP BY user_id), " +
        s"e AS (SELECT user_id, n, CAST(s AS DOUBLE) / $nD AS xbar, " +
        s"CAST(sxx AS DOUBLE) - $nD * ((CAST(s AS DOUBLE) / $nD) * (CAST(s AS DOUBLE) / $nD)) AS den, " +
        "sxy1, sh1, st1, nk1, sxy2, sh2, st2, nk2, sxy3, sh3, st3, nk3 FROM m WHERE n >= 8) " +
        "SELECT user_id, n, " +
        (1 to 3).map(k => "CASE WHEN den <= 0.0 THEN NULL ELSE " +
          sqlS6(rk(k)) + s" END AS r${k}_6").mkString(", ") + ", " +
        "CASE WHEN den <= 0.0 THEN NULL ELSE " +
        sqlS6(s"($nD * ($nD + 2.0)) * ((${rk(1)} * ${rk(1)} / ($nD - 1.0)) " +
          s"+ (${rk(2)} * ${rk(2)} / ($nD - 2.0)) + (${rk(3)} * ${rk(3)} / ($nD - 3.0)))") +
        " END AS q6, " +
        "CAST(CASE WHEN den <= 0.0 THEN NULL WHEN " +
        sqlS6(s"($nD * ($nD + 2.0)) * ((${rk(1)} * ${rk(1)} / ($nD - 1.0)) " +
          s"+ (${rk(2)} * ${rk(2)} / ($nD - 2.0)) + (${rk(3)} * ${rk(3)} / ($nD - 3.0)))") +
        " > 7815000 THEN 1 ELSE 0 END AS BIGINT) AS rejected " +
        "FROM e ORDER BY user_id"
    },
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val base = T.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), s2(col("value")).as("x"))
          .select(col("user_id") +: col("x") +:
            (1 to 3).map(k => lag(col("x"), k).over(w).as(s"l$k")): _*)
        val aggs: Seq[Column] =
          Seq(sum(col("x")).as("s"), sum(col("x") * col("x")).as("sxx")) ++
            (1 to 3).flatMap { k =>
              Seq(sum(col("x") * col(s"l$k")).as(s"sxy$k"),
                sum(when(col(s"l$k").isNotNull, col(s"l$k"))).as(s"sh$k"),
                sum(when(col(s"l$k").isNotNull, col("x"))).as(s"st$k"),
                count(col(s"l$k")).as(s"nk$k"))
            }
        val m = base.groupBy("user_id")
          .agg(count(lit(1)).as("n"), aggs: _*)
          .where(col("n") >= 8)
        val nD = col("n").cast("double")
        val xbar = col("s").cast("double") / nD
        val den = col("sxx").cast("double") - nD * (xbar * xbar)
        def rk(k: Int) =
          (col(s"sxy$k").cast("double") - xbar *
            (col(s"sh$k").cast("double") + col(s"st$k").cast("double")) +
            col(s"nk$k").cast("double") * (xbar * xbar)) / den
        val q = (nD * (nD + lit(2.0))) *
          ((rk(1) * rk(1) / (nD - lit(1.0))) + (rk(2) * rk(2) / (nD - lit(2.0))) +
            (rk(3) * rk(3) / (nD - lit(3.0))))
        m.select(col("user_id"), col("n"),
            when(den <= 0.0, lit(null)).otherwise(s6(rk(1))).as("r1_6"),
            when(den <= 0.0, lit(null)).otherwise(s6(rk(2))).as("r2_6"),
            when(den <= 0.0, lit(null)).otherwise(s6(rk(3))).as("r3_6"),
            when(den <= 0.0, lit(null)).otherwise(s6(q)).as("q6"),
            when(den <= 0.0, lit(null))
              .otherwise(when(s6(q) > 7815000L, 1L).otherwise(0L)).as("rejected"))
          .orderBy("user_id")
      }),

    // Equi-depth histogram (round 12) — the optimizer-statistics shape
    // (ANALYZE ... COMPUTE STATISTICS histograms; DB2/Postgres
    // equi-height buckets): per event_type, B=4 buckets each holding an
    // equal SHARE OF ROWS (not an equal value range — agg_log2_hist is
    // the equi-width sibling), so bucket boundaries track the data
    // distribution and selectivity estimates stay honest under skew.
    // Bucket of a row = ⌊(rank−1)·B / n⌋ with the (x, event_id) total
    // tie order — pure integer index math, no interpolation (the
    // nearest-rank discipline). Graded per (type, bucket): count and the
    // [lo, hi] cent bounds. One shuffle + per-type sort; at scale the
    // rank pass swaps to the win_ntile two-pass form, the boundaries to
    // an approx-quantile sketch (agg_approx_pct grades that rung).
    Q("agg_eqdepth_hist", Some(
      "WITH b AS (SELECT event_type, event_id, " + sqlS2("value") + " AS x FROM events), " +
        "r AS (SELECT event_type, x, " +
        "CAST((ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x, event_id) - 1) * 4 AS BIGINT) AS r4, " +
        "CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n FROM b) " +
        "SELECT event_type, r4 // n AS bucket, " +
        "CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(MIN(x) AS BIGINT) AS lo2, CAST(MAX(x) AS BIGINT) AS hi2 " +
        "FROM r GROUP BY event_type, bucket ORDER BY event_type, bucket"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("event_type").orderBy("x", "event_id")
        val wAll = Window.partitionBy("event_type")
        T.events(s, d)
          .select(col("event_type"), col("event_id"), s2(col("value")).as("x"))
          .withColumn("r4", (row_number().over(w).cast("long") - 1) * 4)
          .withColumn("n", count(lit(1)).over(wAll))
          .groupBy(col("event_type"), expr("r4 div n").as("bucket"))
          .agg(count(lit(1)).as("n_rows"), min(col("x")).as("lo2"),
            max(col("x")).as("hi2"))
          .orderBy("event_type", "bucket")
      }),

    // McNemar's test (round 12, third wave) [McNemar 1947; Edwards 1948
    // continuity correction] — the paired-proportions test the
    // independent-sample agg_ttest/agg_chisq family cannot replace:
    // "did behavior change WITHIN each user between the two halves of
    // the window" (the before/after A-B on paired data). Per event
    // type: the paired binary outcome is ABOVE-MEAN ACTIVITY per half
    // — x_h = (user's half-h count of the type) > (type's mean count
    // per user-half), the integer cross-multiplication 2·nu·cnt_h >
    // tot so no divided mean enters the cell assignment. (Mere
    // PRESENCE was measured fully concordant at both SFs — every user
    // emits every type in both halves — the degenerate-cell trap.)
    // Only the DISCORDANT cells matter — b = (1,0), c = (0,1) — and
    // χ² = (|b−c|−1)²/(b+c) is one integer square + one halfUpDiv;
    // the rejection flag is the integer compare vs χ²₍₁,.05₎ = 3.841.
    // Two keyed aggregates, no pair join.
    Q("agg_mcnemar", Some(
      "WITH te AS (SELECT user_id, event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t FROM events), " +
        "mm AS (SELECT (MIN(t) + MAX(t)) // 2 AS tm FROM te), " +
        "u AS (SELECT event_type, user_id, " +
        "CAST(SUM(CASE WHEN t <= (SELECT tm FROM mm) THEN 1 ELSE 0 END) AS BIGINT) AS c1, " +
        "CAST(SUM(CASE WHEN t > (SELECT tm FROM mm) THEN 1 ELSE 0 END) AS BIGINT) AS c2 " +
        "FROM te GROUP BY event_type, user_id), " +
        "g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nu, " +
        "CAST(SUM(c1 + c2) AS BIGINT) AS tot FROM u GROUP BY event_type), " +
        "x AS (SELECT u.event_type, u.user_id, " +
        "CASE WHEN 2 * g.nu * u.c1 > g.tot THEN 1 ELSE 0 END AS x1, " +
        "CASE WHEN 2 * g.nu * u.c2 > g.tot THEN 1 ELSE 0 END AS x2 " +
        "FROM u JOIN g ON g.event_type = u.event_type), " +
        "m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs, " +
        "CAST(SUM(CASE WHEN x1 = 1 AND x2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b, " +
        "CAST(SUM(CASE WHEN x1 = 0 AND x2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c " +
        "FROM x GROUP BY event_type) " +
        "SELECT event_type, n_pairs, b, c, " +
        "CASE WHEN b + c = 0 THEN NULL ELSE " +
        sqlHalfUpDiv("(ABS(b - c) - 1) * (ABS(b - c) - 1) * 1000000", "b + c") +
        " END AS chi6, " +
        "CAST(CASE WHEN b + c > 0 AND " +
        sqlHalfUpDiv("(ABS(b - c) - 1) * (ABS(b - c) - 1) * 1000000", "b + c") +
        " > 3841000 THEN 1 ELSE 0 END AS INT) AS reject " +
        "FROM m ORDER BY event_type"),
      (s, d) => {
        val te = T.events(s, d).select(col("user_id"), col("event_type"),
          epochS(col("ts")).as("t"))
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val Array(mn, mx) = te.agg(min(col("t")), max(col("t")))
          .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
        val tm = Math.floorDiv(mn + mx, 2L)
        val u = te.groupBy("event_type", "user_id")
          .agg(sum(when(col("t") <= tm, 1L).otherwise(0L)).as("c1"),
            sum(when(col("t") > tm, 1L).otherwise(0L)).as("c2"))
        val g = u.groupBy("event_type")
          .agg(count(lit(1)).as("nu"), sum(col("c1") + col("c2")).as("tot"))
        val x = u.join(broadcast(g), Seq("event_type"))
          .select(col("event_type"),
            when(lit(2) * col("nu") * col("c1") > col("tot"), 1).otherwise(0).as("x1"),
            when(lit(2) * col("nu") * col("c2") > col("tot"), 1).otherwise(0).as("x2"))
        val m = x.groupBy("event_type")
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("x1") === 1 && col("x2") === 0, 1L).otherwise(0L)).as("b"),
            sum(when(col("x1") === 0 && col("x2") === 1, 1L).otherwise(0L)).as("c"))
        val chi = halfUpDiv(
          (abs(col("b") - col("c")) - 1) * (abs(col("b") - col("c")) - 1) *
            lit(1000000L), col("b") + col("c"))
        m.select(col("event_type"), col("n_pairs"), col("b"), col("c"),
            when(col("b") + col("c") === 0, lit(null)).otherwise(chi).as("chi6"),
            when(col("b") + col("c") > 0 && chi > 3841000L, 1).otherwise(0)
              .cast("int").as("reject"))
          .orderBy("event_type")
      }),

    // Derandomized RANSAC line fit (round 12, third wave) [Fischler &
    // Bolles 1981] — the robust-regression counterpoint to agg_regr's
    // least squares (one gross outlier can swing OLS arbitrarily;
    // RANSAC's consensus count is immune to anything outside the
    // inlier band). The "random" sampling is DERANDOMIZED the
    // graph_walk_corpus way: rows rank by the portable
    // Det.hash32("ransac:" || event_id) — a uniform reshuffle-proof
    // draw — and candidates k=0..7 are the rank-(2k+1, 2k+2) pairs,
    // normalized so xa < xb (equal-x pairs drop on both engines).
    // The inlier test is EXACT integer cross-multiplication:
    // |dy·(x−xa) − dx·(y−ya)| ≤ TOL·dx with TOL = 20 value-units s6
    // (products ≲ 5e15 at the current corpus — |dy| ≲ 2e9 s6 × span
    // ≲ 2.6e6 s, ~2000× int64 headroom), so no slope double ever enters the
    // consensus count; the winning model is (inliers DESC, k) and only
    // its slope is presented, as the halfUpDiv micro-slope. One window
    // rank + a ≤40-row broadcast of candidates against one pass over
    // the points — at archive scale the rank pass narrows to a
    // per-type reservoir of the 16 smallest hashes (a top-k, not a
    // sort) and the consensus stays one map-side-combinable pass.
    Q("agg_ransac", Some(
      "WITH p AS (SELECT event_type, event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS x, " +
        sqlS6("value") + " AS y, " +
        sqlHash32("'ransac:' || CAST(event_id AS VARCHAR)") + " AS h FROM events), " +
        "r AS (SELECT event_type, x, y, " +
        "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h, event_id) AS rk FROM p), " +
        "pr AS (SELECT a.event_type, CAST((a.rk - 1) // 2 AS BIGINT) AS k, " +
        "a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2 " +
        "FROM r a JOIN r b ON b.event_type = a.event_type AND b.rk = a.rk + 1 " +
        "WHERE a.rk % 2 = 1 AND a.rk <= 16 AND a.x <> b.x), " +
        "c AS (SELECT event_type, k, " +
        "CASE WHEN x1 <= x2 THEN x1 ELSE x2 END AS xa, " +
        "CASE WHEN x1 <= x2 THEN y1 ELSE y2 END AS ya, " +
        "CASE WHEN x1 <= x2 THEN x2 ELSE x1 END AS xb, " +
        "CASE WHEN x1 <= x2 THEN y2 ELSE y1 END AS yb FROM pr), " +
        "i AS (SELECT c.event_type, c.k, c.xa, c.ya, c.xb, c.yb, " +
        "CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(CASE WHEN ABS((c.yb - c.ya) * (r.x - c.xa) - (c.xb - c.xa) * (r.y - c.ya)) " +
        "<= 20000000 * (c.xb - c.xa) THEN 1 ELSE 0 END) AS BIGINT) AS n_inl " +
        "FROM c JOIN r ON r.event_type = c.event_type " +
        "GROUP BY c.event_type, c.k, c.xa, c.ya, c.xb, c.yb), " +
        "b AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type " +
        "ORDER BY n_inl DESC, k) AS pick FROM i) " +
        "SELECT event_type, k, n, n_inl, " +
        sqlHalfUpDiv("(yb - ya) * 1000000", "xb - xa") + " AS slope_micro " +
        "FROM b WHERE pick = 1 ORDER BY event_type"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val p = T.events(s, d).select(col("event_type"), col("event_id"),
          epochS(col("ts")).as("x"), s6(col("value")).as("y"),
          hash32(concat(lit("ransac:"), col("event_id").cast("string"))).as("h"))
        val r = p
          .withColumn("rk", row_number().over(
            Window.partitionBy("event_type").orderBy("h", "event_id")))
          .select("event_type", "x", "y", "rk")
        val a = r.where(col("rk") % 2 === 1 && col("rk") <= 16)
          .select(col("event_type"), expr("CAST((rk - 1) DIV 2 AS BIGINT)").as("k"),
            col("x").as("x1"), col("y").as("y1"), col("rk").as("rka"))
        val b2 = r.where(col("rk") % 2 === 0 && col("rk") <= 16)
          .select(col("event_type").as("et2"), col("rk").as("rkb"),
            col("x").as("x2"), col("y").as("y2"))
        val pr = a.join(b2,
            col("event_type") === col("et2") && col("rkb") === col("rka") + 1)
          .where(col("x1") =!= col("x2"))
        val c = pr.select(col("event_type"), col("k"),
          when(col("x1") <= col("x2"), col("x1")).otherwise(col("x2")).as("xa"),
          when(col("x1") <= col("x2"), col("y1")).otherwise(col("y2")).as("ya"),
          when(col("x1") <= col("x2"), col("x2")).otherwise(col("x1")).as("xb"),
          when(col("x1") <= col("x2"), col("y2")).otherwise(col("y1")).as("yb"))
        val inlier = abs((col("yb") - col("ya")) * (col("x") - col("xa")) -
          (col("xb") - col("xa")) * (col("y") - col("ya"))) <=
          lit(20000000L) * (col("xb") - col("xa"))
        val i = broadcast(c).join(r, Seq("event_type"))
          .groupBy("event_type", "k", "xa", "ya", "xb", "yb")
          .agg(count(lit(1)).as("n"),
            sum(when(inlier, 1L).otherwise(0L)).as("n_inl"))
        i.withColumn("pick", row_number().over(
            Window.partitionBy("event_type").orderBy(col("n_inl").desc, col("k"))))
          .where(col("pick") === 1)
          .select(col("event_type"), col("k"), col("n"), col("n_inl"),
            halfUpDiv((col("yb") - col("ya")) * 1000000L,
              col("xb") - col("xa")).as("slope_micro"))
          .orderBy("event_type")
      }),

    // Isotonic regression (round 12, third wave) [Ayer et al. 1955;
    // Barlow & Brunk 1972; the sklearn/calibration staple PAVA solves]
    // — the monotone fit to each type's daily-mean series, via the
    // CLOSED-FORM minimax identity instead of the inherently sequential
    // pool-adjacent-violators loop: fit_i = max_{j≤i} min_{k≥i}
    // avg(y[j..k]). Interval means come from prefix sums and are
    // halfUpDiv-quantized BEFORE the min/max lattice, so both engines
    // compare identical integers (the fit is the exact isotonic
    // solution of the quantized interval-mean matrix — monotone for ANY
    // matrix, since growing i enlarges the max-set and shrinks the
    // min-set). Cost: the day series is CALENDAR-BOUNDED (n ≈ span
    // days, data-size-independent), so the n²/2 interval table is tiny
    // at any SF; one running-min window + one groupBy max. At unbounded
    // n the same identity runs per pooled segment (PAVA's merge tree);
    // the bounded-series form is the graded anchor.
    Q("agg_isotonic", Some(
      "WITH b AS (SELECT event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS day, " +
        sqlS6("value") + " AS v6 FROM events), " +
        "dy AS (SELECT event_type, day, " +
        sqlHalfUpDiv("CAST(SUM(v6) AS BIGINT)", "COUNT(*)") + " AS y6 " +
        "FROM b GROUP BY event_type, day), " +
        "p AS (SELECT event_type, day, y6, " +
        "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i, " +
        "CAST(SUM(y6) OVER (PARTITION BY event_type ORDER BY day " +
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s FROM dy), " +
        "iv AS (SELECT a.event_type, a.i AS j, b2.i AS k, " +
        sqlHalfUpDiv("b2.s - a.s + a.y6", "b2.i - a.i + 1") + " AS a6 " +
        "FROM p a JOIN p b2 ON b2.event_type = a.event_type AND b2.i >= a.i), " +
        "m AS (SELECT event_type, j, k AS i, " +
        "MIN(a6) OVER (PARTITION BY event_type, j ORDER BY k DESC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mji FROM iv), " +
        "f AS (SELECT event_type, i, CAST(MAX(mji) AS BIGINT) AS fit6 " +
        "FROM m GROUP BY event_type, i) " +
        "SELECT p.event_type, CAST(p.i AS BIGINT) AS i, CAST(p.day AS BIGINT) AS day, " +
        "CAST(p.y6 AS BIGINT) AS y6, f.fit6 " +
        "FROM p JOIN f ON f.event_type = p.event_type AND f.i = p.i " +
        "ORDER BY p.event_type, p.i"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val days = T.events(s, d)
          .select(col("event_type"), expr("unix_timestamp(ts) div 86400").as("day"),
            s6(col("value")).as("v6"))
          .groupBy("event_type", "day")
          .agg(halfUpDiv(sum(col("v6")), count(lit(1))).as("y6"))
        val wOrd = Window.partitionBy("event_type").orderBy("day")
        val p = days
          .withColumn("i", row_number().over(wOrd).cast("long"))
          .withColumn("s", sum(col("y6")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val a = p.select(col("event_type"), col("i").as("j"),
          col("s").as("sj"), col("y6").as("yj"))
        val b2 = p.select(col("event_type").as("et2"), col("i").as("k"),
          col("s").as("sk"))
        val iv = a.join(b2,
            col("event_type") === col("et2") && col("k") >= col("j"))
          .select(col("event_type"), col("j"), col("k"),
            halfUpDiv(col("sk") - col("sj") + col("yj"),
              col("k") - col("j") + 1).as("a6"))
        val wMin = Window.partitionBy("event_type", "j").orderBy(col("k").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val f = iv.withColumn("mji", min(col("a6")).over(wMin))
          .groupBy(col("event_type"), col("k").as("i"))
          .agg(max(col("mji")).as("fit6"))
        p.select(col("event_type"), col("i"), col("day"), col("y6"))
          .join(f, Seq("event_type", "i"))
          .select(col("event_type"), col("i"), col("day"), col("y6"), col("fit6"))
          .orderBy("event_type", "i")
      }),

    // Tail-latency ratio (round 9, fifth wave) — the SRE/SLO staple:
    // p50/p95/p99 of the value distribution per event type and the
    // p99/p50 tail ratio (how heavy is the tail relative to the
    // median). Percentiles are NEAREST-RANK-LOWER integer index picks
    // over cents (the eo_composite_percentile rule — no interpolation),
    // the ratio one IEEE divide on the s6 grid. One shuffle + one
    // in-partition sort; partition = one type's rows.
    Q("agg_tail_ratio", Some(
      "WITH b AS (SELECT event_type, " + sqlS2("value") + " AS x FROM events), " +
        "r AS (SELECT event_type, x, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x) AS rn, " +
        "COUNT(*) OVER (PARTITION BY event_type) AS n FROM b), " +
        "p AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n, " +
        "CAST(MIN(CASE WHEN rn = ((n - 1) * 50) // 100 + 1 THEN x END) AS BIGINT) AS p50, " +
        "CAST(MIN(CASE WHEN rn = ((n - 1) * 95) // 100 + 1 THEN x END) AS BIGINT) AS p95, " +
        "CAST(MIN(CASE WHEN rn = ((n - 1) * 99) // 100 + 1 THEN x END) AS BIGINT) AS p99 " +
        "FROM r GROUP BY event_type) " +
        "SELECT event_type, n, p50, p95, p99, " +
        "CASE WHEN p50 <= 0 THEN NULL ELSE " +
        sqlS6("CAST(p99 AS DOUBLE) / CAST(p50 AS DOUBLE)") + " END AS tail6 " +
        "FROM p ORDER BY event_type"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wT = Window.partitionBy("event_type")
        val r = T.events(s, d)
          .select(col("event_type"), s2(col("value")).as("x"))
          .withColumn("rn", row_number().over(wT.orderBy("x")))
          .withColumn("n", count(lit(1)).over(wT))
        val p = r.groupBy("event_type").agg(
          max(col("n")).as("n"),
          min(when(col("rn") === expr("((n - 1) * 50) div 100 + 1"), col("x"))).as("p50"),
          min(when(col("rn") === expr("((n - 1) * 95) div 100 + 1"), col("x"))).as("p95"),
          min(when(col("rn") === expr("((n - 1) * 99) div 100 + 1"), col("x"))).as("p99"))
        p.select(col("event_type"), col("n"), col("p50"), col("p95"), col("p99"),
            when(col("p50") <= 0, lit(null))
              .otherwise(s6(col("p99").cast("double") / col("p50").cast("double")))
              .as("tail6"))
          .orderBy("event_type")
      }),

    // Geometric + harmonic means (round 9, fourth wave; REVISED round
    // 10) — the other two Pythagorean means, the right averages for
    // ratios/rates where the arithmetic mean misleads. Discipline: each
    // ln(x) / 1/x term is s6-FLOORED before the order-free integer sum
    // (the agg_entropy LN rule); since round 10 both transcendentals run
    // through the Det portable sequences — lnInt on the integral
    // quantity, expP on the exact mean-of-logs — so no libm call and no
    // cross-build ulp remains anywhere in the surface.
    // AM ≥ GM ≥ HM by construction — the spec pins the inequality.
    Q("agg_geo_mean", Some(
      "WITH b AS (SELECT l_returnflag, " +
        sqlS6(sqlLnInt("l_quantity")) + " AS lx, " + sqlS6("1.0 / l_quantity") + " AS rx, " +
        sqlS0("l_quantity") + " AS x FROM lineitem WHERE l_quantity > 0), " +
        "m AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(lx) AS BIGINT) AS sl, CAST(SUM(rx) AS BIGINT) AS sr, " +
        "CAST(SUM(x) AS BIGINT) AS sx FROM b GROUP BY l_returnflag), " +
        "m2 AS (SELECT l_returnflag, n, sr, sx, " +
        "(CAST(sl AS DOUBLE) / CAST(n AS DOUBLE) / 1e6) AS mlq FROM m) " +
        "SELECT l_returnflag, n, " +
        sqlS2(sqlExpP("mlq")) + " AS gm_c, " +
        sqlS2("CAST(n AS DOUBLE) / (CAST(sr AS DOUBLE) / 1e6)") + " AS hm_c, " +
        sqlS2("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)") + " AS am_c " +
        "FROM m2 ORDER BY l_returnflag"),
      (s, d) => {
        val m = T.lineitem(s, d)
          .where(col("l_quantity") > 0)
          .select(col("l_returnflag"),
            s6(lnInt(col("l_quantity"))).as("lx"),
            s6(lit(1.0) / col("l_quantity")).as("rx"),
            s0(col("l_quantity")).as("x"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum(col("lx")).as("sl"),
            sum(col("rx")).as("sr"), sum(col("x")).as("sx"))
        val nD = col("n").cast("double")
        m.withColumn("mlq", col("sl").cast("double") / nD / lit(1e6))
          .select(col("l_returnflag"), col("n"),
            s2(expP(col("mlq"))).as("gm_c"),
            s2(nD / (col("sr").cast("double") / lit(1e6))).as("hm_c"),
            s2(col("sx").cast("double") / nD).as("am_c"))
          .orderBy("l_returnflag")
      }),

    // Welch two-sample t statistic + Welch-Satterthwaite df (round 9,
    // second wave) — the hypothesis-testing primitive of A/B analysis,
    // comparing returned ('A') vs refused ('R') quantities per linestatus.
    // Same exact-integer-moment discipline as agg_regr: ONE conditional-
    // aggregation pass produces (n, Σx, Σx²) per arm as exact longs
    // (merge-order-free), then each statistic is a FIXED double op
    // sequence over those integers — divisions, multiplies and one sqrt,
    // all IEEE-correctly-rounded, so both engines agree bit-for-bit (Det
    // rule 3). Linear, one shuffle on the group key; the two arms ride
    // the same partial aggregate, not two scans.
    Q("agg_ttest", Some(ttestOracle),
      (s, d) => {
        val xi = s0(col("l_quantity"))
        def arm(flag: String, e: Column): Column =
          sum(when(col("l_returnflag") === flag, e).otherwise(lit(0L)))
        val m = T.lineitem(s, d)
          .where(col("l_returnflag").isin("A", "R"))
          .groupBy("l_linestatus")
          .agg(
            arm("A", lit(1L)).as("na"), arm("A", xi).as("sa"),
            arm("A", xi * xi).as("saa"),
            arm("R", lit(1L)).as("nr"), arm("R", xi).as("sr"),
            arm("R", xi * xi).as("srr"))
        val naD = col("na").cast("double"); val nrD = col("nr").cast("double")
        val saD = col("sa").cast("double"); val saaD = col("saa").cast("double")
        val srD = col("sr").cast("double"); val srrD = col("srr").cast("double")
        val m1 = saD / naD; val m2 = srD / nrD
        val v1 = (saaD - saD * saD / naD) / (naD - lit(1.0))
        val v2 = (srrD - srD * srD / nrD) / (nrD - lit(1.0))
        val g1 = v1 / naD; val g2 = v2 / nrD
        val se2 = g1 + g2
        val t = (m1 - m2) / sqrt(se2)
        val df = (se2 * se2) /
          ((g1 * g1) / (naD - lit(1.0)) + (g2 * g2) / (nrD - lit(1.0)))
        m.select(col("l_linestatus"), col("na"), col("nr"),
            s6(t).as("t6"), s4(df).as("df4"))
          .orderBy("l_linestatus")
      }),

    // Mann-Whitney U rank-sum test (round 9, second wave) — the
    // NONPARAMETRIC sibling of agg_ttest, comparing the same two arms
    // without a normality assumption. Everything stays integer until
    // the final z: tie-averaged ranks are half-integers, so the DOUBLED
    // rank is exact — per value v, 2·avgrank = 2·(count below) +
    // (count equal) + 1, accumulated from ONE per-(group, value) count
    // table and a domain-sized window cumsum (the agg_weighted_median
    // shape: all data-sized work is the first partial agg). 2U and the
    // tie-correction Σ(t³−t) are exact longs; the normal-approximation
    // z with tie-corrected variance is one fixed double sequence.
    Q("agg_mannwhitney", Some(mannWhitneyOracle),
      (s, dd) => {
        import org.apache.spark.sql.expressions.Window
        val g = T.lineitem(s, dd)
          .where(col("l_returnflag").isin("A", "R"))
          .select(col("l_linestatus").as("st"), col("l_returnflag").as("f"),
            s0(col("l_quantity")).as("q"))
          .groupBy("st", "q")
          .agg(sum(when(col("f") === "A", 1L).otherwise(0L)).as("ca"),
            sum(when(col("f") === "R", 1L).otherwise(0L)).as("cr"))
        val w = Window.partitionBy("st").orderBy("q")
          .rowsBetween(Window.unboundedPreceding, -1)
        val t = col("ca") + col("cr")
        val m = g
          .withColumn("below", coalesce(sum(col("ca") + col("cr")).over(w), lit(0L)))
          .groupBy("st")
          .agg(sum(col("ca")).as("na"), sum(col("cr")).as("nr"),
            sum(col("ca") * (lit(2L) * col("below") + t + lit(1L))).as("r2a"),
            sum(t * t * t - t).as("ties"))
        val naD = col("na").cast("double"); val nrD = col("nr").cast("double")
        val nD = (col("na") + col("nr")).cast("double")
        val u2 = col("r2a") - col("na") * (col("na") + lit(1L))
        val varU = (naD * nrD / lit(12.0)) *
          ((nD + lit(1.0)) - col("ties").cast("double") / (nD * (nD - lit(1.0))))
        val z = (u2.cast("double") - naD * nrD) / (lit(2.0) * sqrt(varU))
        m.select(col("st").as("l_linestatus"), col("na"), col("nr"),
            u2.as("u2a"), s6(z).as("z6"))
          .orderBy("l_linestatus")
      }),

    // Kolmogorov-Smirnov two-sample D (round 9, second wave) — completes
    // the classic test trio (t / U / KS): D = max |ECDF_A − ECDF_R| over
    // the shared value domain. The same domain-collapsed count table as
    // agg_mannwhitney feeds per-value cumulative counts; each candidate
    // |caCum/na − crCum/nr| is one fixed double from exact longs, and MAX
    // over an identical candidate set is engine-identical (no epsilon
    // needed). All data-sized work is the first partial agg.
    Q("agg_ks", Some(ksOracle),
      (s, dd) => {
        import org.apache.spark.sql.expressions.Window
        val g = T.lineitem(s, dd)
          .where(col("l_returnflag").isin("A", "R"))
          .select(col("l_linestatus").as("st"), col("l_returnflag").as("f"),
            s0(col("l_quantity")).as("q"))
          .groupBy("st", "q")
          .agg(sum(when(col("f") === "A", 1L).otherwise(0L)).as("ca"),
            sum(when(col("f") === "R", 1L).otherwise(0L)).as("cr"))
        val w = Window.partitionBy("st").orderBy("q")
          .rowsBetween(Window.unboundedPreceding, 0)
        val c = g
          .withColumn("cca", sum(col("ca")).over(w))
          .withColumn("ccr", sum(col("cr")).over(w))
        val wAll = Window.partitionBy("st")
        val diff = abs(col("cca").cast("double") / col("na").cast("double")
          - col("ccr").cast("double") / col("nr").cast("double"))
        c.withColumn("na", sum(col("ca")).over(wAll))
          .withColumn("nr", sum(col("cr")).over(wAll))
          .groupBy("st")
          .agg(max(col("na")).as("na2"), max(col("nr")).as("nr2"),
            max(s6(diff)).as("d6"))
          .select(col("st").as("l_linestatus"), col("na2").as("na"),
            col("nr2").as("nr"), col("d6"))
          .orderBy("l_linestatus")
      }),

    // Pearson chi-squared independence statistic over the returnflag ×
    // linestatus contingency table (round 9, second wave). Cell counts,
    // row/col totals and the grand total are exact longs; each cell's
    // (o−e)²/e term is s6-floored BEFORE the sum (the agg_entropy LN
    // discipline — a raw double SUM over partials would be merge-order-
    // dependent), so the statistic is an order-free integer sum. One
    // heavy pass (the cell count agg); the marginal/total aggregates and
    // dof arithmetic run over ≤|R|·|C| rows, joined broadcast — the
    // 100 TB cost profile is exactly one shuffle on the two keys.
    Q("agg_chisq", Some(chisqOracle),
      (s, d) => {
        val cells = T.lineitem(s, d)
          .groupBy(col("l_returnflag").as("f"), col("l_linestatus").as("st"))
          .agg(count(lit(1)).as("c"))
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val rt = cells.groupBy("f").agg(sum("c").as("r"))
        val ct = cells.groupBy("st").agg(sum("c").as("k"))
        val tot = cells.agg(sum("c").as("n"))
        val e = col("r").cast("double") * col("k").cast("double") /
          col("n").cast("double")
        val cD = col("c").cast("double")
        val terms = cells
          .join(broadcast(rt), "f").join(broadcast(ct), "st")
          .crossJoin(broadcast(tot))
          .select(s6((cD - e) * (cD - e) / e).as("term6"))
        val nrDf = rt.agg(count(lit(1)).as("nrows"))
        val ncDf = ct.agg(count(lit(1)).as("ncols"))
        terms.agg(count(lit(1)).as("n_cells"), sum(col("term6")).as("chi2_6"))
          .crossJoin(broadcast(nrDf)).crossJoin(broadcast(ncDf))
          .select(col("n_cells"),
            ((col("nrows") - lit(1L)) * (col("ncols") - lit(1L))).as("dof"),
            col("chi2_6"))
      }),

    // Exact percentiles over scaled-long cents: interpolation at p ∈
    // {.25,.5,.75} over integers is exact in double space (Det rule 4), so
    // the ×100 re-scale is an exact integer on both engines.
    Q("agg_median_pct", Some(
      "SELECT l_returnflag, " +
        "CAST(FLOOR(QUANTILE_CONT(" + sqlS2("l_quantity") + ", 0.5) * 100 + 0.5) AS BIGINT) AS med_qty, " +
        "CAST(FLOOR(QUANTILE_CONT(" + sqlS2("l_quantity") + ", 0.25) * 100 + 0.5) AS BIGINT) AS q25, " +
        "CAST(FLOOR(QUANTILE_CONT(" + sqlS2("l_quantity") + ", 0.75) * 100 + 0.5) AS BIGINT) AS q75 " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
      (s, d) => {
        def pct(p: Double): Column =
          floor(percentile(s2(col("l_quantity")), lit(p)) * 100 + 0.5).cast("long")
        T.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(pct(0.5).as("med_qty"), pct(0.25).as("q25"), pct(0.75).as("q75"))
          .orderBy("l_returnflag")
      }),

    // approx_percentile — the bounded-memory sketch the exact
    // median/percentile keys fall back to when a single group outgrows its
    // sort buffer (SCALING.md). Approximate -> no oracle; accuracy vs the
    // exact percentile is asserted in SketchSpec.
    // Bounded-memory approximate percentiles, HAND-IMPLEMENTED as a
    // fixed-grid histogram quantile (round 6; replaces the opaque
    // approx_percentile whose KLL-style sketch has no cross-engine twin):
    // pass 1 takes per-group (min, max, n); pass 2 bins each value onto a
    // 4096-cell grid (pure IEEE arithmetic — bit-identical bins on both
    // engines); the p-quantile estimate is the lower edge of the first
    // bin whose cumulative count reaches ceil(p*n). Error is bounded by
    // one bin width (range/4096 — ~0.07% of the p50 here; the ±2%
    // property test stays). State is O(bins) per group and the histogram
    // merge is a count sum — merge-order-free at any scale, unlike a
    // sketch with order-dependent compaction.
    Q("agg_approx_pct", Some(
      "WITH stats AS (SELECT l_returnflag, MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY l_returnflag), " +
        "binned AS (SELECT l.l_returnflag, CASE WHEN s.mx = s.mn THEN 0 ELSE " +
        "LEAST(CAST(FLOOR((l.l_extendedprice - s.mn) / (s.mx - s.mn) * 4096.0) AS BIGINT), 4095) END AS bin " +
        "FROM lineitem l JOIN stats s ON l.l_returnflag = s.l_returnflag), " +
        "hist AS (SELECT l_returnflag, bin, CAST(COUNT(*) AS BIGINT) AS c FROM binned GROUP BY l_returnflag, bin), " +
        "cum AS (SELECT h.l_returnflag, h.bin, SUM(h.c) OVER (PARTITION BY h.l_returnflag ORDER BY h.bin " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, s.mn, s.mx, s.n " +
        "FROM hist h JOIN stats s ON h.l_returnflag = s.l_returnflag) " +
        "SELECT l_returnflag, " +
        "MIN(CASE WHEN cum >= CAST(CEIL(0.5 * n) AS BIGINT) THEN mn + bin * (mx - mn) / 4096.0 END) AS p50_approx, " +
        "MIN(CASE WHEN cum >= CAST(CEIL(0.95 * n) AS BIGINT) THEN mn + bin * (mx - mn) / 4096.0 END) AS p95_approx " +
        "FROM cum GROUP BY l_returnflag ORDER BY l_returnflag"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val price = col("l_extendedprice")
        val stats = T.lineitem(s, d).groupBy("l_returnflag")
          .agg(min(price).as("mn"), max(price).as("mx"), count(lit(1)).as("n"))
        // mx == mn (a constant group) would make the bin 0/0 -> NaN ->
        // a loud ANSI cast error; a constant group's quantile is mn and
        // bin 0 yields exactly that
        val binned = T.lineitem(s, d).join(broadcast(stats), "l_returnflag")
          .select(col("l_returnflag"),
            when(col("mx") === col("mn"), 0L).otherwise(
              least(floor((price - col("mn")) / (col("mx") - col("mn")) * 4096.0), lit(4095L)))
              .as("bin"))
        val w = Window.partitionBy("l_returnflag").orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, 0)
        val edge = col("mn") + col("bin") * (col("mx") - col("mn")) / 4096.0
        def estAt(p: Double) =
          min(when(col("cum") >= ceil(lit(p) * col("n")), edge))
        binned.groupBy("l_returnflag", "bin").agg(count(lit(1)).as("c"))
          .withColumn("cum", sum(col("c")).over(w))
          .join(broadcast(stats), "l_returnflag")
          .groupBy("l_returnflag")
          .agg(estAt(0.5).as("p50_approx"), estAt(0.95).as("p95_approx"))
          .orderBy("l_returnflag")
      }),

    // Two-level KLL-style compactor sketch (round 13, VERDICT r12 item
    // 8) [Karnin, Lang & Liberty 2016, "Optimal quantile approximation
    // in streams"] — the MERGEABLE percentile story agg_approx_pct's
    // fixed grid lacks (a histogram needs min/max up front; a compactor
    // sketch streams and merges free of any range knowledge). The
    // paper's random compaction offset is hash-DERANDOMIZED (the
    // agg_ransac draw): level 0 runs one compaction per partition
    // bucket b = user_id % 32 — sort the bucket's values by (v, eid),
    // keep alternating ranks starting at hash32('kll:'||b) % 2, weight
    // 2 — and level 1 merges 4 level-0 sketches per super-bucket and
    // compacts again the same way (weight 4). BOTH levels sort before
    // compacting, so the result depends only on the input MULTISET —
    // merge-order-free by construction, the agg_hll law (SketchSpec
    // re-runs it under a shuffled partitioning and asserts identical
    // rows, plus the rank-error bound). Quantile query: smallest
    // retained v whose cumulative weight reaches ceil(p·W) — the scan
    // is SKETCH-local (the retained set IS the sketch; at production
    // capacity k it is |buckets|·k rows on one node). Graded at p ∈
    // {25, 50, 75} against the EXACT interpolated percentile computed
    // from integer ORDER STATISTICS on both engines (no library
    // quantile — Det rule 4), so the estimator's error is itself a
    // graded integer and can never drift with an engine's
    // interpolation arithmetic.
    Q("agg_kll", Some {
      val offB = sqlHash32("'kll:' || CAST(b AS VARCHAR)") + " % 2"
      val offS = sqlHash32("'kll:s:' || CAST(sb AS VARCHAR)") + " % 2"
      "WITH vals AS (SELECT " + sqlS6("value") + " AS v, event_id AS eid, " +
        "user_id % 32 AS b FROM events), " +
        "l0 AS MATERIALIZED (SELECT v, eid, b, b // 4 AS sb FROM (" +
        "SELECT v, eid, b, ROW_NUMBER() OVER (PARTITION BY b ORDER BY v, eid) AS rk " +
        "FROM vals) WHERE rk % 2 = " + offB + "), " +
        "l1 AS MATERIALIZED (SELECT v, eid FROM (" +
        "SELECT v, eid, sb, ROW_NUMBER() OVER (PARTITION BY sb ORDER BY v, eid) AS rk " +
        "FROM l0) WHERE rk % 2 = " + offS + "), " +
        "cw AS (SELECT v, SUM(4) OVER (ORDER BY v, eid " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw FROM l1), " +
        "tot AS (SELECT CAST((SELECT COUNT(*) FROM vals) AS BIGINT) AS n_rows, " +
        "CAST(4 * (SELECT COUNT(*) FROM l1) AS BIGINT) AS w_total, " +
        "CAST((SELECT COUNT(*) FROM l1) AS BIGINT) AS n_retained), " +
        "ps AS (SELECT UNNEST([25, 50, 75]) AS p), " +
        "est AS (SELECT ps.p, MIN(cw.v) AS est6 FROM ps JOIN cw " +
        "ON cw.cumw >= (ps.p * (SELECT w_total FROM tot) + 99) // 100 GROUP BY ps.p), " +
        // exact lane from integer ORDER STATISTICS, not a library quantile
        // (ADVICE r13 #4): p = k/4 → 0-based offset g = (n−1)·k/4, so
        // lo = (n−1)·k // 4 + 1 (1-based), rem = (n−1)·k % 4, and
        // halfUp(v_lo + rem/4·(v_hi − v_lo)) = (4·v_lo + rem·Δ + 2) // 4
        // — pure int64 plus one exact double divide on both engines.
        "exr AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, eid) AS rn FROM vals), " +
        "exk AS (SELECT k, ((tot.n_rows - 1) * k) // 4 + 1 AS lo, " +
        "((tot.n_rows - 1) * k) % 4 AS rem FROM tot, (SELECT UNNEST([1, 2, 3]) AS k)), " +
        "ex AS (SELECT k, CAST(FLOOR((4 * v1 + rem * (COALESCE(v2, v1) - v1) + 2) / 4.0) AS BIGINT) AS e6 FROM (" +
        "SELECT exk.k, MIN(CASE WHEN rn = lo THEN v END) AS v1, " +
        "MIN(CASE WHEN rn = lo + 1 THEN v END) AS v2, MIN(rem) AS rem " +
        "FROM exk JOIN exr ON rn = lo OR rn = lo + 1 GROUP BY exk.k)) " +
        "SELECT CAST(est.p AS BIGINT) AS p, CAST(est.est6 AS BIGINT) AS est6, " +
        "ex.e6 AS exact6, CAST(est.est6 - ex.e6 AS BIGINT) AS err6, " +
        "tot.n_rows, tot.w_total, tot.n_retained " +
        "FROM est JOIN ex ON ex.k * 25 = est.p, tot ORDER BY p"
    },
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val vals = T.events(s, d)
          .select(s6(col("value")).as("v"), col("event_id").as("eid"),
            (col("user_id") % 32).as("b"))
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val offB = pmod(hash32(concat(lit("kll:"), col("b").cast("string"))), lit(2))
        val l0 = vals
          .withColumn("rk", row_number().over(
            Window.partitionBy("b").orderBy(col("v"), col("eid"))))
          .where(col("rk") % 2 === offB)
          .select(col("v"), col("eid"), (col("b") / 4).cast("long").as("sb"))
        val offS = pmod(hash32(concat(lit("kll:s:"), col("sb").cast("string"))), lit(2))
        val l1 = l0
          .withColumn("rk", row_number().over(
            Window.partitionBy("sb").orderBy(col("v"), col("eid"))))
          .where(col("rk") % 2 === offS)
          .select(col("v"), col("eid"))
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        // sketch-local scan: l1 IS the sketch (n/4 here; |buckets|·k in
        // production), so the single-partition cumulative window is
        // bounded by the sketch budget, not the data
        val cw = l1.withColumn("cumw", sum(lit(4L)).over(
          Window.orderBy(col("v"), col("eid"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        val tot = vals.agg(count(lit(1)).as("n_rows"))
          .crossJoin(broadcast(l1.agg((count(lit(1)) * 4).as("w_total"),
            count(lit(1)).as("n_retained"))))
        val sq = s
        import sq.implicits._
        val ps = Seq(25L, 50L, 75L).toDF("p")
        // ceil(p·W/100) = (p·W + 99) // 100 — the floor of the double
        // divide is exact (operands ≪ 2^53, exact multiples representable)
        val target = floor((col("p") * col("wt") + lit(99L)) / 100)
        val est = broadcast(ps).join(
            cw.crossJoin(broadcast(tot.select(col("w_total").as("wt")))),
            col("cumw") >= target)
          .groupBy("p").agg(min(col("v")).as("est6"))
        // exact lane from integer ORDER STATISTICS (ADVICE r13 #4): no
        // percentile()/QUANTILE_CONT — the graded value is
        // halfUp(v_lo + rem/4·(v_hi−v_lo)) = floor((4·v_lo + rem·Δ + 2)/4),
        // pure int64 plus one exact double divide, immune to either
        // engine's quantile-interpolation arithmetic. Same single-task
        // cost class as the percentile() it replaces — the exact lane is
        // the purchased truth anchor; est6 is the scale path.
        val ranked = vals.withColumn("rn",
          row_number().over(Window.orderBy(col("v"), col("eid"))))
        val exk = broadcast(Seq(1L, 2L, 3L).toDF("k")
          .crossJoin(broadcast(tot.select(col("n_rows"))))
          .select(col("k"),
            (floor((col("n_rows") - 1) * col("k") / 4) + 1).cast("long").as("lo"),
            ((col("n_rows") - 1) * col("k") % 4).as("rem")))
        val ex = exk
          .join(ranked, col("rn") === col("lo") || col("rn") === col("lo") + 1)
          .groupBy("k").agg(
            min(when(col("rn") === col("lo"), col("v"))).as("v1"),
            min(when(col("rn") === col("lo") + 1, col("v"))).as("v2"),
            min(col("rem")).as("rem"))
          .select(col("k"), floor((lit(4) * col("v1") +
              col("rem") * (coalesce(col("v2"), col("v1")) - col("v1")) + 2) / 4)
            .cast("long").as("e6"))
        est.join(broadcast(ex), col("k") * 25 === col("p"))
          .crossJoin(broadcast(tot))
          .select(col("p"), col("est6"), col("e6").as("exact6"),
            (col("est6") - col("e6")).as("err6"),
            col("n_rows"), col("w_total"), col("n_retained"))
          .orderBy("p")
      }),

    // Boolean aggregate family (round 6): bool_and/bool_or plus a
    // conditional count — pure predicate folds, map-side combinable.
    Q("agg_bool", Some(
      "SELECT event_type, " +
        "CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_big, " +
        "BOOL_AND(value >= 0) AS all_nonneg, " +
        "BOOL_OR(value > 400) AS any_huge " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
      (s, d) =>
        T.events(s, d)
          .groupBy("event_type")
          .agg(
            sum(when(col("value") > 100, 1).otherwise(0)).cast("bigint").as("n_big"),
            bool_and(col("value") >= 0).as("all_nonneg"),
            bool_or(col("value") > 400).as("any_huge"))
          .orderBy("event_type")),

    // Deterministic mode (round 6): most frequent cent residue of value
    // per event_type, ties broken by smallest value — built-in MODE()'s
    // tie order is engine-arbitrary, so BOTH engines spell the same
    // (count DESC, value ASC) pick; the residue is an exact s2-grid
    // integer.
    Q("agg_mode", Some(
      "WITH c AS (SELECT event_type, " + sqlS2("value") + " % 100 AS cents, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY event_type, cents) " +
        "SELECT event_type, cents AS mode_cents, n FROM (" +
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n DESC, cents ASC) AS rn FROM c) x " +
        "WHERE rn = 1 ORDER BY event_type"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("event_type").orderBy(col("n").desc, col("cents").asc)
        T.events(s, d)
          .groupBy(col("event_type"), (s2(col("value")) % 100).as("cents"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("event_type"), col("cents").as("mode_cents"), col("n"))
          .orderBy("event_type")
      }),

    Q("agg_listagg", Some(
      "SELECT n_name, STRING_AGG(c_name, ',' ORDER BY c_name) AS names " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "GROUP BY n_name ORDER BY n_name"),
      (s, d) =>
        T.customer(s, d)
          .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(concat_ws(",", array_sort(collect_list(col("c_name")))).as("names"))
          .orderBy("n_name")),

    Q("agg_topk_group", Some(
      "SELECT o_custkey, o_orderkey, CAST(rn AS INTEGER) AS rn FROM (" +
        "SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER (PARTITION BY o_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) x " +
        "WHERE rn <= 3 ORDER BY o_custkey, rn"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
        T.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "rn")
          .orderBy("o_custkey", "rn")
      }),

    // Spearman rank correlation (round 9, sixth wave) — the
    // distribution-free monotone-association test screening pipelines
    // run where Pearson's linearity assumption fails. Average-rank tie
    // handling made EXACT by the doubled-rank grid: avg rank =
    // (first+last)/2 over a tie group, so 2·avgrank = 2·RANK() +
    // tiecount − 1, an integer on both engines (RANK from a per-group
    // window, tiecount from a (group, value) partition count — doubles
    // PARTITION the window but are never aggregated). Then Pearson over
    // the integer doubled ranks via six exact moments and ONE double
    // sequence with the agg_stats √·√ denominator. Two window passes +
    // one aggregate, all shuffling on the same group key. Magnitude
    // audit: ranks ≤ 2·n so Σr² ≤ 4n³ — inside int64 to n ~ 10⁸ rows
    // PER GROUP; beyond that the moment sums move to DECIMAL(38,0),
    // documented here rather than silently wrong.
    Q("agg_spearman", Some {
      val nD = "CAST(n AS DOUBLE)"
      val sxD = "CAST(sx AS DOUBLE)"; val syD = "CAST(sy AS DOUBLE)"
      val sxxD = "CAST(sxx AS DOUBLE)"; val syyD = "CAST(syy AS DOUBLE)"
      val sxyD = "CAST(sxy AS DOUBLE)"
      "WITH r AS (SELECT l_returnflag AS f, " +
        "2 * RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) + " +
        "COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1 AS rx, " +
        "2 * RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) + " +
        "COUNT(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1 AS ry " +
        "FROM lineitem), " +
        "m AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy, " +
        "CAST(SUM(rx * rx) AS BIGINT) AS sxx, CAST(SUM(ry * ry) AS BIGINT) AS syy, " +
        "CAST(SUM(rx * ry) AS BIGINT) AS sxy FROM r GROUP BY f) " +
        "SELECT f, n, " +
        s"CASE WHEN n < 2 OR $nD * $sxxD - $sxD * $sxD <= 0.0 OR " +
        s"$nD * $syyD - $syD * $syD <= 0.0 THEN NULL ELSE " +
        sqlS6(s"($nD * $sxyD - $sxD * $syD) / " +
          s"(SQRT($nD * $sxxD - $sxD * $sxD) * SQRT($nD * $syyD - $syD * $syD))") +
        " END AS rho6 FROM m ORDER BY f"
    },
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wq = Window.partitionBy("l_returnflag").orderBy("l_quantity")
        val wqt = Window.partitionBy("l_returnflag", "l_quantity")
        val wp = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
        val wpt = Window.partitionBy("l_returnflag", "l_extendedprice")
        val r = T.lineitem(s, d)
          .select(col("l_returnflag").as("f"),
            (lit(2) * rank().over(wq) + count(lit(1)).over(wqt) - 1).as("rx"),
            (lit(2) * rank().over(wp) + count(lit(1)).over(wpt) - 1).as("ry"))
        val m = r.groupBy("f")
          .agg(count(lit(1)).as("n"),
            sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
            sum(col("rx") * col("rx")).as("sxx"),
            sum(col("ry") * col("ry")).as("syy"),
            sum(col("rx") * col("ry")).as("sxy"))
        val nD = col("n").cast("double")
        val sxD = col("sx").cast("double"); val syD = col("sy").cast("double")
        val vx = nD * col("sxx").cast("double") - sxD * sxD
        val vy = nD * col("syy").cast("double") - syD * syD
        val rho = (nD * col("sxy").cast("double") - sxD * syD) /
          (sqrt(vx) * sqrt(vy))
        m.select(col("f"), col("n"),
            when(col("n") < 2 || vx <= 0.0 || vy <= 0.0, lit(null))
              .otherwise(s6(rho)).as("rho6"))
          .orderBy("f")
      }),

    // Theil T inequality index (round 9, sixth wave) — the
    // decomposable concentration measure complementing agg_gini/agg_hhi
    // (Theil 1967): T = mean over x of (x/μ)·ln(x/μ). μ comes from the
    // exact integer cent sum and count (one divide); each row's term is
    // ONE shared IEEE sequence s6-FLOORED BEFORE the order-free long
    // sum (the PMI/logprob LN discipline, via the round-10 portable
    // lnInt — no libm), and the final mean is one more divide on the
    // s6 grid. One partial-agg shuffle for the
    // moments + one broadcast of the group means back over the rows.
    Q("agg_theil", Some(
      "WITH b AS (SELECT o_orderpriority AS pri, " + sqlS2("o_totalprice") + " AS xc " +
        "FROM orders), " +
        "m AS (SELECT pri, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(xc) AS BIGINT) AS sc FROM b GROUP BY pri), " +
        "t AS (SELECT b.pri, n, " +
        sqlS6("(CAST(xc AS DOUBLE) / (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE))) * " +
          s"((${sqlLnInt("xc")} + ${sqlLnInt("n")}) - ${sqlLnInt("sc")})") +
        " AS t6 FROM b JOIN m ON m.pri = b.pri) " +
        "SELECT pri, n, " +
        "CAST(FLOOR(CAST(CAST(SUM(t6) AS BIGINT) AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS theil6 " +
        "FROM t GROUP BY pri, n ORDER BY pri"),
      (s, d) => {
        val b = T.orders(s, d)
          .select(col("o_orderpriority").as("pri"), s2(col("o_totalprice")).as("xc"))
        val m = b.groupBy("pri")
          .agg(count(lit(1)).as("n"), sum(col("xc")).as("sc"))
        val mu = col("sc").cast("double") / col("n").cast("double")
        val ratio = col("xc").cast("double") / mu
        // ln(x/mu) = lnInt(xc) + lnInt(n) - lnInt(sc): three portable
        // terms, no product that could overflow int64
        val lnRat = lnInt(col("xc")) + lnInt(col("n")) - lnInt(col("sc"))
        b.join(broadcast(m), "pri")
          .select(col("pri"), col("n"), s6(ratio * lnRat).as("t6"))
          .groupBy("pri", "n")
          .agg(sum(col("t6")).as("st"))
          .select(col("pri"), col("n"),
            floor(col("st").cast("double") / col("n").cast("double") + 0.5)
              .cast("long").as("theil6"))
          .orderBy("pri")
      }),

    // Winsorized mean (round 9, sixth wave) — the robust location
    // estimate monitoring pipelines use when trimming is too lossy:
    // clamp to the p5/p95 picks, then average. DISTRIBUTED-SAFE
    // percentile picks (no per-group collect): a per-group value rank
    // (ties resolve arbitrarily — the value AT an index is a multiset
    // property, so any tie order yields the same pick), the two
    // nearest-rank-lower indexes i = max(1, (p·n) div 100), the picked
    // cut values joined back BROADCAST (group-count-sized), clamp as
    // integer LEAST/GREATEST on cents, exact sum, one final divide on
    // the avg6 grid. Two shuffles on the group key, both partial-agg.
    Q("agg_winsorized_mean", Some(
      "WITH b AS (SELECT l_returnflag AS f, " + sqlS2("l_extendedprice") + " AS xc " +
        "FROM lineitem), " +
        "r AS (SELECT f, xc, ROW_NUMBER() OVER (PARTITION BY f ORDER BY xc) AS rn, " +
        "COUNT(*) OVER (PARTITION BY f) AS n FROM b), " +
        "cuts AS (SELECT f, " +
        "MAX(CASE WHEN rn = GREATEST(1, n * 5 // 100) THEN xc END) AS lo_c, " +
        "MAX(CASE WHEN rn = GREATEST(1, n * 95 // 100) THEN xc END) AS hi_c, " +
        "CAST(MAX(n) AS BIGINT) AS n FROM r GROUP BY f) " +
        "SELECT b.f, cuts.n, lo_c, hi_c, " +
        "CAST(FLOOR(CAST(CAST(SUM(LEAST(GREATEST(xc, lo_c), hi_c)) AS BIGINT) AS DOUBLE) " +
        "* 1e4 / CAST(cuts.n AS DOUBLE) + 0.5) AS BIGINT) AS wmean6 " +
        "FROM b JOIN cuts ON cuts.f = b.f GROUP BY b.f, cuts.n, lo_c, hi_c ORDER BY b.f"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val b = T.lineitem(s, d)
          .select(col("l_returnflag").as("f"), s2(col("l_extendedprice")).as("xc"))
        val r = b
          .withColumn("rn", row_number().over(Window.partitionBy("f").orderBy("xc")))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("f")))
        val cuts = r.groupBy("f")
          .agg(
            max(when(col("rn") === greatest(lit(1L), expr("n * 5 div 100")), col("xc")))
              .as("lo_c"),
            max(when(col("rn") === greatest(lit(1L), expr("n * 95 div 100")), col("xc")))
              .as("hi_c"),
            max(col("n")).as("n"))
        b.join(broadcast(cuts), "f")
          .select(col("f"), col("n"), col("lo_c"), col("hi_c"),
            least(greatest(col("xc"), col("lo_c")), col("hi_c")).as("cl"))
          .groupBy("f", "n", "lo_c", "hi_c")
          .agg(sum(col("cl")).as("sc"))
          .select(col("f"), col("n"), col("lo_c"), col("hi_c"),
            floor(col("sc").cast("double") * lit(1e4) / col("n").cast("double") + 0.5)
              .cast("long").as("wmean6"))
          .orderBy("f")
      }),

    // Two-predictor OLS (round 9, sixth wave) — agg_regr widened to the
    // multiple-regression normal equations (price ~ quantity +
    // discount): nine exact integer moments per group (y cents, x₁
    // whole units, x₂ 4-dp discount — every product ≪ 2^63 at any
    // graded SF; magnitudes documented), then Cramer's rule over the
    // 3×3 Gram matrix as ONE fixed double sequence per group. The Gram
    // determinant of a nondegenerate design is > 0; both engines
    // compute the identical double, so the degenerate branch (D ≤ 0)
    // agrees bit-for-bit. One partial-agg shuffle total.
    Q("agg_ols_multi", Some {
      def D(x: String) = s"CAST($x AS DOUBLE)"
      val (n, s1, s2v, sy) = (D("n"), D("s1"), D("s2"), D("sy"))
      val (s11, s12, s22, s1y, s2y) =
        (D("s11"), D("s12"), D("s22"), D("s1y"), D("s2y"))
      // det [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]]
      val det = s"($n * ($s11 * $s22 - $s12 * $s12) - $s1 * ($s1 * $s22 - $s12 * $s2v) + " +
        s"$s2v * ($s1 * $s12 - $s11 * $s2v))"
      val det1 = s"($n * ($s1y * $s22 - $s12 * $s2y) - $s1 * ($sy * $s22 - $s2v * $s2y) + " +
        s"$s2v * ($sy * $s12 - $s2v * $s1y))"
      val det2 = s"($n * ($s11 * $s2y - $s1y * $s12) - $s1 * ($s1 * $s2y - $sy * $s12) + " +
        s"$s2v * ($s1 * $s1y - $sy * $s11))"
      "WITH b AS (SELECT l_returnflag AS f, " + sqlS0("l_quantity") + " AS x1, " +
        sqlS4("l_discount") + " AS x2, " + sqlS2("l_extendedprice") + " AS y " +
        "FROM lineitem), " +
        "m AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2, " +
        "CAST(SUM(y) AS BIGINT) AS sy, " +
        "CAST(SUM(x1 * x1) AS BIGINT) AS s11, CAST(SUM(x1 * x2) AS BIGINT) AS s12, " +
        "CAST(SUM(x2 * x2) AS BIGINT) AS s22, " +
        "CAST(SUM(x1 * y) AS BIGINT) AS s1y, CAST(SUM(x2 * y) AS BIGINT) AS s2y " +
        "FROM b GROUP BY f) " +
        "SELECT f, n, " +
        s"CASE WHEN $det <= 0.0 THEN NULL ELSE " + sqlS6(s"$det1 / $det") + " END AS b1_6, " +
        s"CASE WHEN $det <= 0.0 THEN NULL ELSE " + sqlS6(s"$det2 / $det") + " END AS b2_6 " +
        "FROM m ORDER BY f"
    },
      (s, d) => {
        val b = T.lineitem(s, d).select(col("l_returnflag").as("f"),
          s0(col("l_quantity")).as("x1"), s4(col("l_discount")).as("x2"),
          s2(col("l_extendedprice")).as("y"))
        val m = b.groupBy("f").agg(count(lit(1)).as("n"),
          sum(col("x1")).as("s1"), sum(col("x2")).as("s2"), sum(col("y")).as("sy"),
          sum(col("x1") * col("x1")).as("s11"), sum(col("x1") * col("x2")).as("s12"),
          sum(col("x2") * col("x2")).as("s22"),
          sum(col("x1") * col("y")).as("s1y"), sum(col("x2") * col("y")).as("s2y"))
        def D(c: String) = col(c).cast("double")
        val (n, s1, s2v, sy) = (D("n"), D("s1"), D("s2"), D("sy"))
        val (s11, s12, s22, s1y, s2y) = (D("s11"), D("s12"), D("s22"), D("s1y"), D("s2y"))
        val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2v) +
          s2v * (s1 * s12 - s11 * s2v)
        val det1 = n * (s1y * s22 - s12 * s2y) - s1 * (sy * s22 - s2v * s2y) +
          s2v * (sy * s12 - s2v * s1y)
        val det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - sy * s12) +
          s2v * (s1 * s1y - sy * s11)
        m.select(col("f"), col("n"),
            when(det <= 0.0, lit(null)).otherwise(s6(det1 / det)).as("b1_6"),
            when(det <= 0.0, lit(null)).otherwise(s6(det2 / det)).as("b2_6"))
          .orderBy("f")
      }),

    // A/B conversion lift (round 9, sixth wave) — the two-PROPORTION
    // z-test agg_ttest's mean comparison doesn't cover, the primary
    // experimentation metric: per-user conversion flags (any purchase)
    // rolled into cohort counts (user_id parity as the assignment
    // hash), relative lift p₁/p₀ − 1 and the pooled z statistic, each
    // ONE fixed double sequence over four exact integers. Two
    // partial-agg shuffles (user rollup, then the 2-row cohort
    // aggregate); NULLs on the degenerate branches (p₀ = 0, pooled p
    // at 0 or 1) spelled identically on both engines.
    Q("agg_ab_lift", Some {
      val p0 = "(CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
      val p1 = "(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
      val pp = "(CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))"
      "WITH u AS (SELECT user_id, CAST(user_id % 2 AS INTEGER) AS grp, " +
        "MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv " +
        "FROM events GROUP BY user_id), " +
        "c AS (SELECT " +
        "CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0, " +
        "CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1, " +
        "CAST(SUM(CASE WHEN grp = 0 THEN conv ELSE 0 END) AS BIGINT) AS c0, " +
        "CAST(SUM(CASE WHEN grp = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1 FROM u) " +
        "SELECT n0, n1, c0, c1, " +
        s"CASE WHEN c0 = 0 THEN NULL ELSE " + sqlS6(s"$p1 / $p0 - 1.0") + " END AS lift6, " +
        s"CASE WHEN $pp <= 0.0 OR $pp >= 1.0 THEN NULL ELSE " +
        sqlS6(s"($p1 - $p0) / SQRT($pp * (1.0 - $pp) * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))") +
        " END AS z6 FROM c"
    },
      (s, d) => {
        val u = T.events(s, d)
          .groupBy(col("user_id"), (col("user_id") % 2).cast("int").as("grp"))
          .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
        val c = u.agg(
          sum(when(col("grp") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("grp") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("grp") === 0, col("conv")).otherwise(0)).cast("long").as("c0"),
          sum(when(col("grp") === 1, col("conv")).otherwise(0)).cast("long").as("c1"))
        val p0 = col("c0").cast("double") / col("n0").cast("double")
        val p1 = col("c1").cast("double") / col("n1").cast("double")
        val pp = (col("c0") + col("c1")).cast("double") /
          (col("n0") + col("n1")).cast("double")
        val z = (p1 - p0) / sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / col("n0").cast("double") + lit(1.0) / col("n1").cast("double")))
        c.select(col("n0"), col("n1"), col("c0"), col("c1"),
          when(col("c0") === 0, lit(null)).otherwise(s6(p1 / p0 - 1.0)).as("lift6"),
          when(pp <= 0.0 || pp >= 1.0, lit(null)).otherwise(s6(z)).as("z6"))
      }),

    // Cramér's V (round 9, seventh wave) — the EFFECT-SIZE companion to
    // agg_chisq's significance test: V = √(χ²/n/min(r−1,c−1)) ∈ [0,1]
    // makes contingency association comparable across table sizes (the
    // feature-selection screen for categorical pairs). χ² re-derives by
    // the agg_chisq machinery (exact cell/marginal counts, per-cell
    // s6-floored terms); V is then ONE fixed double sequence over three
    // exact integers — χ²₆, n, min-dof — so the s6 output is
    // bit-identical by induction. Same single-pass cost: one cell agg
    // over the table, everything after is domain-sized.
    Q("agg_cramers_v", Some(cramersVOracle),
      (s, d) => {
        val cells = T.lineitem(s, d)
          .groupBy(col("l_returnflag").as("f"), col("l_linestatus").as("st"))
          .agg(count(lit(1)).as("c"))
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val rt = cells.groupBy("f").agg(sum("c").as("r"))
        val ct = cells.groupBy("st").agg(sum("c").as("k"))
        val tot = cells.agg(sum("c").as("n"))
        val e = col("r").cast("double") * col("k").cast("double") /
          col("n").cast("double")
        val cD = col("c").cast("double")
        val terms = cells
          .join(broadcast(rt), "f").join(broadcast(ct), "st")
          .crossJoin(broadcast(tot))
          .select(s6((cD - e) * (cD - e) / e).as("term6"))
        val nrDf = rt.agg(count(lit(1)).as("nrows"))
        val ncDf = ct.agg(count(lit(1)).as("ncols"))
        val base = terms.agg(sum(col("term6")).as("chi2_6"))
          .crossJoin(broadcast(tot)).crossJoin(broadcast(nrDf))
          .crossJoin(broadcast(ncDf))
          .select(col("n"), col("chi2_6"),
            least(col("nrows") - lit(1L), col("ncols") - lit(1L)).as("mdof"))
        val v = sqrt(col("chi2_6").cast("double") / lit(1e6) /
          col("n").cast("double") / col("mdof").cast("double"))
        base.select(col("n"), col("mdof"), col("chi2_6"), s6(v).as("v6"))
      }),

    // Cohen's d / Hedges' g (round 9, seventh wave) — the standardized
    // mean difference the A/B readout reports NEXT TO agg_ttest's
    // significance: d = (m₁−m₂)/s_pooled, with Hedges' small-sample
    // correction g = J·d, J = 1 − 3/(4·df−1). Identical single-pass
    // conditional-moment shape as agg_ttest (six exact integer sums per
    // stratum), then one fixed IEEE sequence per statistic — no
    // engine-internal double aggregation anywhere.
    Q("agg_cohens_d", Some(cohensDOracle),
      (s, d) => {
        val b = T.lineitem(s, d)
          .filter(col("l_returnflag").isin("A", "R"))
          .select(col("l_linestatus"), col("l_returnflag"),
            s0(col("l_quantity")).as("xi"))
        val m = b.groupBy("l_linestatus").agg(
          sum(when(col("l_returnflag") === "A", 1L).otherwise(0L)).as("na"),
          sum(when(col("l_returnflag") === "A", col("xi")).otherwise(0L)).as("sa"),
          sum(when(col("l_returnflag") === "A", col("xi") * col("xi")).otherwise(0L)).as("saa"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("nr"),
          sum(when(col("l_returnflag") === "R", col("xi")).otherwise(0L)).as("sr"),
          sum(when(col("l_returnflag") === "R", col("xi") * col("xi")).otherwise(0L)).as("srr"))
        val naD = col("na").cast("double"); val nrD = col("nr").cast("double")
        val saD = col("sa").cast("double"); val saaD = col("saa").cast("double")
        val srD = col("sr").cast("double"); val srrD = col("srr").cast("double")
        val m1 = saD / naD; val m2 = srD / nrD
        val v1 = (saaD - saD * saD / naD) / (naD - lit(1.0))
        val v2 = (srrD - srD * srD / nrD) / (nrD - lit(1.0))
        val df = naD + nrD - lit(2.0)
        val sp2 = ((naD - lit(1.0)) * v1 + (nrD - lit(1.0)) * v2) / df
        val dd = (m1 - m2) / sqrt(sp2)
        val j = lit(1.0) - lit(3.0) / (lit(4.0) * df - lit(1.0))
        m.select(col("l_linestatus"), col("na"), col("nr"),
          s6(dd).as("d6"), s6(j * dd).as("g6"))
          .orderBy("l_linestatus")
      }),

    // Two-variable PCA (round 9, seventh wave) — the 2×2
    // eigen-decomposition in closed form, the building block of
    // correlation-structure screens and whitening: per returnflag, the
    // covariance matrix of (quantity units, price whole-dollars) from
    // six exact integer moments, then λ₁ = (a+c)/2 + √(((a−c)/2)² + b²)
    // and the alignment cos2θ = h/√(h²+b²) — all closed-form arithmetic,
    // NO trig and no iterative solver, so every output is one fixed
    // IEEE sequence over exact integers. Whole-dollar units keep the
    // Σy² moment inside int64 through the graded SFs; at archive scale
    // the moments widen to DECIMAL(38) sums or center first — the
    // documented trade (win_zscore's overflow note, applied here).
    Q("agg_pca2", Some(pca2Oracle),
      (s, d) => {
        val b = T.lineitem(s, d).select(col("l_returnflag"),
          s0(col("l_quantity")).as("x"), s0(col("l_extendedprice")).as("y"))
        val m = b.groupBy("l_returnflag").agg(
          count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        val nD = col("n").cast("double")
        val a = (nD * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")) / (nD * (nD - lit(1.0)))
        val bb = (nD * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) / (nD * (nD - lit(1.0)))
        val c = (nD * col("syy").cast("double") -
          col("sy").cast("double") * col("sy").cast("double")) / (nD * (nD - lit(1.0)))
        val h = (a - c) / lit(2.0)
        val disc = sqrt(h * h + bb * bb)
        val lam1 = (a + c) / lit(2.0) + disc
        m.select(col("l_returnflag"), col("n"),
          s6(lam1).as("lam1_6"),
          s6(lam1 / (a + c)).as("evr6"),
          s6(h / disc).as("align6"))
          .orderBy("l_returnflag")
      }),

    // ROC-AUC (round 9, seventh wave) — the standard ranking-quality
    // readout for a score against a binary outcome (here: does event
    // value rank purchases above non-purchases), computed EXACTLY by the
    // rank-sum identity AUC = (R⁺ − n⁺(n⁺+1)/2)/(n⁺n⁻) with tie-averaged
    // ranks — agg_mannwhitney's doubled-rank machinery pointed at model
    // evaluation instead of hypothesis testing (no variance/z): the
    // per-value count table collapses the data once, a domain-sized
    // window cumsum yields exact doubled rank sums, and AUC + the Gini
    // coefficient 2·AUC−1 are one IEEE divide each over exact longs.
    Q("agg_auc", Some {
      val u2 = "(r2p - np * (np + 1))"
      "WITH b AS (SELECT " + sqlS2("value") + " AS v, " +
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y FROM events), " +
        "g AS (SELECT v, CAST(SUM(y) AS BIGINT) AS cp, " +
        "CAST(SUM(1 - y) AS BIGINT) AS cn FROM b GROUP BY v), " +
        "c AS (SELECT v, cp, cn, cp + cn AS t, " +
        "COALESCE(SUM(cp + cn) OVER (ORDER BY v " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below FROM g), " +
        "m AS (SELECT CAST(SUM(cp) AS BIGINT) AS np, CAST(SUM(cn) AS BIGINT) AS nn, " +
        "CAST(SUM(cp * (2 * below + t + 1)) AS BIGINT) AS r2p FROM c) " +
        s"SELECT np, nn, CAST($u2 AS BIGINT) AS u2p, " +
        sqlS6(s"CAST($u2 AS DOUBLE) / (2.0 * CAST(np AS DOUBLE) * CAST(nn AS DOUBLE))") + " AS auc6, " +
        sqlS6(s"CAST($u2 AS DOUBLE) / (CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)) - 1.0") + " AS gini6 " +
        "FROM m"
    },
      (s, d) => {
        val b = T.events(s, d).select(s2(col("value")).as("v"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        val g = b.groupBy("v")
          .agg(sum("y").as("cp"), sum(lit(1L) - col("y")).as("cn"))
        val w = org.apache.spark.sql.expressions.Window.orderBy("v")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val c = g.select(col("cp"), (col("cp") + col("cn")).as("t"),
          coalesce(sum(col("cp") + col("cn")).over(w), lit(0L)).as("below"))
        val m = c.agg(sum("cp").as("np"),
          sum(col("t") - col("cp")).as("nn"),
          sum(col("cp") * (lit(2) * col("below") + col("t") + 1)).as("r2p"))
        val u2 = col("r2p") - col("np") * (col("np") + 1)
        val npD = col("np").cast("double"); val nnD = col("nn").cast("double")
        m.select(col("np"), col("nn"), u2.cast("long").as("u2p"),
          s6(u2.cast("double") / (lit(2.0) * npD * nnD)).as("auc6"),
          s6(u2.cast("double") / (npD * nnD) - lit(1.0)).as("gini6"))
      }),

    // Process-capability indices Cp / Cpk (round 9, seventh wave) — the
    // SPC readout manufacturing and SLO monitoring run against fixed
    // spec limits (here LSL=5, USL=45 on order quantity): Cp compares
    // the spec width to 6σ, Cpk penalizes off-center processes via the
    // nearer limit. agg_stats' exact-moment discipline: three integer
    // sums per group, then each index is one fixed IEEE sequence with
    // the √ of the n−1 variance — no engine-internal double aggregation.
    Q("agg_cpk", Some {
      val nD = "CAST(n AS DOUBLE)"; val sD = "CAST(s AS DOUBLE)"
      val ssD = "CAST(ss AS DOUBLE)"
      val mean = s"($sD / $nD)"
      val sd = s"SQRT(($ssD - $sD * $sD / $nD) / ($nD - 1.0))"
      val cp = s"((45.0 - 5.0) / (6.0 * $sd))"
      val cpu = s"((45.0 - $mean) / (3.0 * $sd))"
      val cpl = s"(($mean - 5.0) / (3.0 * $sd))"
      "WITH b AS (SELECT l_returnflag, " + sqlS0("l_quantity") + " AS q FROM lineitem), " +
        "m AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(q) AS BIGINT) AS s, CAST(SUM(q * q) AS BIGINT) AS ss " +
        "FROM b GROUP BY l_returnflag) " +
        "SELECT l_returnflag, n, " + sqlS6(cp) + " AS cp6, " +
        sqlS6(s"LEAST($cpu, $cpl)") + " AS cpk6 " +
        "FROM m ORDER BY l_returnflag"
    },
      (s, d) => {
        val m = T.lineitem(s, d)
          .select(col("l_returnflag"), s0(col("l_quantity")).as("q"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum("q").as("s"),
            sum(col("q") * col("q")).as("ss"))
        val nD = col("n").cast("double"); val sD = col("s").cast("double")
        val ssD = col("ss").cast("double")
        val mean = sD / nD
        val sd = sqrt((ssD - sD * sD / nD) / (nD - lit(1.0)))
        val cp = (lit(45.0) - lit(5.0)) / (lit(6.0) * sd)
        val cpu = (lit(45.0) - mean) / (lit(3.0) * sd)
        val cpl = (mean - lit(5.0)) / (lit(3.0) * sd)
        m.select(col("l_returnflag"), col("n"),
          s6(cp).as("cp6"), s6(least(cpu, cpl)).as("cpk6"))
          .orderBy("l_returnflag")
      }),

    // Value-at-Risk and expected shortfall (round 9, seventh wave) — the
    // tail-risk pair every financial / capacity-planning readout wants
    // past agg_tail_ratio's percentile picks: VaR95 by the established
    // nearest-rank-lower index, CVaR as the EXACT mean of the tail at or
    // above that rank (integer tail sum and count, one IEEE divide onto
    // whole cents). The rank window is the agg_tail_ratio shape — tie
    // permutations cannot move either output because only values and
    // rank-set sums are consumed.
    Q("agg_cvar", Some(
      "WITH b AS (SELECT event_type, " + sqlS2("value") + " AS x FROM events), " +
        "r AS (SELECT event_type, x, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x) AS rn, " +
        "COUNT(*) OVER (PARTITION BY event_type) AS n FROM b), " +
        "p AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n, " +
        "CAST(MIN(CASE WHEN rn = ((n - 1) * 95) // 100 + 1 THEN x END) AS BIGINT) AS var95_c, " +
        "CAST(SUM(CASE WHEN rn >= ((n - 1) * 95) // 100 + 1 THEN x ELSE 0 END) AS BIGINT) AS tail_sum, " +
        "CAST(SUM(CASE WHEN rn >= ((n - 1) * 95) // 100 + 1 THEN 1 ELSE 0 END) AS BIGINT) AS tail_n " +
        "FROM r GROUP BY event_type) " +
        "SELECT event_type, n, var95_c, tail_n, " +
        "CAST(FLOOR(CAST(tail_sum AS DOUBLE) / CAST(tail_n AS DOUBLE) + 0.5) AS BIGINT) AS cvar95_c " +
        "FROM p ORDER BY event_type"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val wT = Window.partitionBy("event_type")
        val r = T.events(s, d)
          .select(col("event_type"), s2(col("value")).as("x"))
          .withColumn("rn", row_number().over(wT.orderBy("x")))
          .withColumn("n", count(lit(1)).over(wT))
        val idx = expr("((n - 1) * 95) div 100 + 1")
        val p = r.groupBy("event_type").agg(
          max(col("n")).as("n"),
          min(when(col("rn") === idx, col("x"))).as("var95_c"),
          sum(when(col("rn") >= idx, col("x")).otherwise(0L)).as("tail_sum"),
          sum(when(col("rn") >= idx, 1L).otherwise(0L)).as("tail_n"))
        p.select(col("event_type"), col("n"), col("var95_c"), col("tail_n"),
          floor(col("tail_sum").cast("double") / col("tail_n").cast("double") + 0.5)
            .cast("long").as("cvar95_c"))
          .orderBy("event_type")
      }),

    // Rescaled-range Hurst exponent (round 9, seventh wave) — the
    // long-memory diagnostic (Hurst 1951; Mandelbrot & Wallis 1969)
    // capacity planners run on demand series: H ≈ 0.5 means the daily
    // revenue increments are memoryless, H > 0.5 persistent. Classic
    // two-scale R/S estimation, engine-exact end to end: the daily
    // series quantizes to hundred-dollar integers (the win_zscore
    // overflow trade), each complete m-day segment (m = 16, 64) computes
    // its cumulative-deviation RANGE as the exact integer
    // max−min of U_j = m·Σ_{i≤j}v − j·S (the win_cusum n-scaling trick),
    // its sd from exact moments, one fixed IEEE R/S sequence s6-floored
    // per segment, integer segment means, and H = Δln(R/S)/ln 4 as one
    // final fixed sequence. Everything after the daily partial agg is
    // calendar-bounded.
    Q("agg_hurst", Some(hurstOracle),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val g = T.orders(s, d)
          .groupBy(expr("unix_timestamp(o_orderdate) div 86400").as("day"))
          .agg(sum(s2(col("o_totalprice"))).as("vc"))
          .select(col("day"), floor(col("vc").cast("double") / 1e4).cast("long").as("v"))
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        def rsAtScale(m: Int): DataFrame = {
          val seg = g.withColumn("seg", expr(s"day div $m"))
          val full = seg.groupBy("seg").agg(
            count(lit(1)).as("n"), sum("v").as("sv"),
            sum(col("v") * col("v")).as("svv"))
            .where(col("n") === m)
          val wSeg = Window.partitionBy("seg").orderBy("day")
          val u = seg.join(full.select("seg", "sv", "svv"), "seg")
            .withColumn("j", row_number().over(wSeg))
            .withColumn("cum", sum("v").over(wSeg.rowsBetween(Window.unboundedPreceding, 0)))
            .withColumn("u", lit(m.toLong) * col("cum") - col("j") * col("sv"))
          val mD = lit(m.toDouble)
          val varS = (mD * col("svv").cast("double") -
            col("sv").cast("double") * col("sv").cast("double")) / (mD * (mD - lit(1.0)))
          val rs = (col("r").cast("double") / mD) / sqrt(varS)
          u.groupBy("seg").agg(max("u").as("umax"), min("u").as("umin"),
              max("sv").as("sv"), max("svv").as("svv"))
            .withColumn("r", col("umax") - col("umin"))
            .where(varS > 0)
            .select(s6(rs).as("rs6"))
            .agg(count(lit(1)).as("n_seg"),
              floor(sum("rs6").cast("double") / count(lit(1)) + 0.5)
                .cast("long").as("rs_mean6"))
        }
        val a = rsAtScale(16).select(col("n_seg").as("n16"), col("rs_mean6").as("rs16"))
        val b = rsAtScale(64).select(col("n_seg").as("n64"), col("rs_mean6").as("rs64"))
        val h = lnRatio(col("rs64"), col("rs16")) / lit(1.3862943611198906)
        a.crossJoin(broadcast(b))
          .select(col("n16"), col("n64"), col("rs16"), col("rs64"), s6(h).as("h6"))
      }),

    // Capture-recapture population estimate (round 9, seventh wave) —
    // Lincoln-Petersen: how many DISTINCT users exist when you can only
    // afford two partial samples (the dedup/census estimator for uniques
    // you never observe jointly): sample 1 = users seen in even events,
    // sample 2 = odd events, N̂ = n₁·n₂/m with m the recapture overlap.
    // The Chapman small-sample correction ((n₁+1)(n₂+1)/(m+1) − 1) rides
    // along. Exact distinct counts via one aggregate over the (user,
    // parity) dedup; both estimators are one fixed IEEE sequence each.
    // The spec pins N̂ ≥ the observed union (estimators never undercount
    // the census here).
    Q("agg_capture_recapture", Some {
      val lp = "(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / CAST(m AS DOUBLE))"
      val ch = "((CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE) / CAST(m + 1 AS DOUBLE)) - 1.0)"
      "WITH up AS (SELECT DISTINCT user_id, CAST(event_id % 2 AS INTEGER) AS s FROM events), " +
        "c AS (SELECT " +
        "CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1, " +
        "CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2, " +
        "CAST(COUNT(*) - COUNT(DISTINCT user_id) AS BIGINT) AS m, " +
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_union FROM up) " +
        "SELECT n1, n2, m, n_union, " +
        s"CASE WHEN m = 0 THEN NULL ELSE CAST(FLOOR($lp + 0.5) AS BIGINT) END AS lp_est, " +
        s"CAST(FLOOR($ch + 0.5) AS BIGINT) AS chapman_est FROM c"
    },
      (s, d) => {
        val up = T.events(s, d)
          .select(col("user_id"), (col("event_id") % 2).cast("int").as("s"))
          .distinct()
        val c = up.agg(
          sum(when(col("s") === 0, 1L).otherwise(0L)).as("n1"),
          sum(when(col("s") === 1, 1L).otherwise(0L)).as("n2"),
          (count(lit(1)) - countDistinct(col("user_id"))).as("m"),
          countDistinct(col("user_id")).as("n_union"))
        val lp = col("n1").cast("double") * col("n2").cast("double") /
          col("m").cast("double")
        val ch = (col("n1") + 1).cast("double") * (col("n2") + 1).cast("double") /
          (col("m") + 1).cast("double") - lit(1.0)
        c.select(col("n1"), col("n2"), col("m"), col("n_union"),
          when(col("m") === 0, lit(null))
            .otherwise(floor(lp + 0.5).cast("long")).as("lp_est"),
          floor(ch + 0.5).cast("long").as("chapman_est"))
      }),

    // Time-decayed mean (round 9, closing wave) — the recency-weighted
    // feature every feature store materializes (recent behavior counts
    // more): half-life decay with the weight kept EXACTLY DYADIC —
    // age buckets of 7 days give w = 2^(−k), realized as the integer
    // shift 2²⁰ >> k, so numerator Σ v·(2²⁰>>k) and denominator
    // Σ(2²⁰>>k) are exact int64 sums and the decayed mean is ONE
    // integer-ratio floor. No pow(), no float weight, merge-order-free
    // by construction. One user_id partial agg; ages derive from the
    // corpus max (broadcast).
    Q("agg_decay_mean", Some(
      "WITH g AS (SELECT MAX(CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400) AS dmax FROM events), " +
        "b AS (SELECT user_id, " + sqlS2("value") + " AS v, " +
        "LEAST(((SELECT dmax FROM g) - CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400) // 7, 20) AS k " +
        "FROM events WHERE event_type = 'purchase'), " +
        "w AS (SELECT user_id, v, (1048576 >> CAST(k AS INTEGER)) AS wt FROM b) " +
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(wt) AS BIGINT) AS wsum, " +
        "CAST(FLOOR(CAST(SUM(v * wt) AS DOUBLE) / CAST(SUM(wt) AS DOUBLE) + 0.5) AS BIGINT) AS decayed_c, " +
        "CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS plain_c " +
        "FROM w GROUP BY user_id ORDER BY user_id"),
      (s, d) => {
        val g = T.events(s, d)
          .agg(max(expr("unix_timestamp(ts) div 86400")).as("dmax"))
        val b = T.events(s, d).where(col("event_type") === "purchase")
          .crossJoin(broadcast(g))
          .select(col("user_id"), s2(col("value")).as("v"),
            least(expr("(dmax - unix_timestamp(ts) div 86400) div 7"), lit(20L))
              .as("k"))
        b.withColumn("wt", expr("shiftright(1048576L, cast(k as int))"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"), sum("wt").as("wsum"),
            floor(sum(col("v") * col("wt")).cast("double") /
              sum("wt").cast("double") + 0.5).cast("long").as("decayed_c"),
            floor(sum("v").cast("double") / count(lit(1)) + 0.5).cast("long")
              .as("plain_c"))
          .orderBy("user_id")
      }),

    // Continuous-time exponential decay (round 10 second wave) — the
    // IRREGULAR-timestamp half of the recency-weighting pair: where
    // agg_decay_mean buckets age into integer weeks for exact dyadic
    // shifts, this key weights every event by e^(−Δt/τ) at its ACTUAL
    // second-resolution age (τ = 1 week), the form TSDB/feature-store
    // decay aggregates actually compute [e.g. the decaying counters of
    // Cormode et al. 2009 "Forward decay"]. Portable because round 10's
    // expP is ONE fixed IEEE sequence both engines share — no libm pow
    // anywhere — and each weighted term is s6-floored BEFORE the
    // order-free long sum (Det rule 2). The max-timestamp anchor is a
    // broadcast scalar (forward-decay trick: one anchor, no per-row
    // rescan); plan = one global max + one map + one keyed partial agg.
    Q("agg_decay_time", Some(
      "WITH mx AS (SELECT MAX(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) AS tmax FROM events), " +
        "b AS (SELECT event_type, " + sqlS2("value") + " AS vc, " +
        "CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t FROM events), " +
        "c AS (SELECT event_type, vc, " +
        "(CAST(t - (SELECT tmax FROM mx) AS DOUBLE) / 604800.0) AS a FROM b), " +
        "w AS (SELECT event_type, vc, " + sqlS6(
          s"CAST(vc AS DOUBLE) / 100.0 * ${Det.sqlExpP("a")}") + " AS w6 FROM c) " +
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(vc) AS BIGINT) AS plain_c, " +
        "CAST(SUM(w6) AS BIGINT) AS decayed6 " +
        "FROM w GROUP BY event_type ORDER BY event_type"),
      (s, d) => {
        val mx = T.events(s, d).agg(max(epochS(col("ts"))).as("tmax"))
        T.events(s, d)
          .crossJoin(broadcast(mx))
          .select(col("event_type"), s2(col("value")).as("vc"),
            ((epochS(col("ts")) - col("tmax")).cast("double") / lit(604800.0))
              .as("a"))
          .select(col("event_type"), col("vc"),
            s6(col("vc").cast("double") / lit(100.0) * expP(col("a"))).as("w6"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("vc")).as("plain_c"),
            sum(col("w6")).as("decayed6"))
          .orderBy("event_type")
      }),

    // Hill diversity numbers (round 9, seventh wave) — ecology's unified
    // diversity ladder applied to behavioral mixes (Hill 1973): per
    // user-decile bucket, ⁰D = richness (distinct event types), ¹D =
    // exp(Shannon entropy) and ²D = inverse Simpson N²/Σn² — the three
    // "effective type counts" that agree iff the mix is even. ²D is one
    // IEEE divide over exact integers; ¹D rides agg_entropy's s6-floored
    // term discipline with one EXP at the end (≤1-ulp inside the 1e-2
    // output grid); the evenness ordering ⁰D ≥ ¹D ≥ ²D is pinned in the
    // spec. One (bucket, type) partial agg, domain-sized after.
    Q("agg_hill_diversity", Some {
      val d2 = "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) / CAST(ss AS DOUBLE))"
      "WITH b AS (SELECT user_id % 10 AS bucket, event_type FROM events), " +
        "c AS (SELECT bucket, event_type, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY bucket, event_type), " +
        "t AS (SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS d0, " +
        "CAST(SUM(cnt * cnt) AS BIGINT) AS ss FROM c GROUP BY bucket), " +
        "h AS (SELECT c.bucket, CAST(SUM(" +
        sqlS6("-(CAST(cnt AS DOUBLE) / CAST(t.n AS DOUBLE)) * " +
          sqlLnRatio("cnt", "t.n")) +
        ") AS BIGINT) AS h6 FROM c JOIN t ON t.bucket = c.bucket GROUP BY c.bucket), " +
        "h2 AS (SELECT bucket, h6, (CAST(h6 AS DOUBLE) / 1e6) AS hd FROM h) " +
        "SELECT t.bucket, t.n, t.d0, " +
        "CAST(FLOOR(" + sqlExpP("hd") + " * 100 + 0.5) AS BIGINT) AS d1_c, " +
        "CAST(FLOOR(" + d2 + " * 100 + 0.5) AS BIGINT) AS d2_c " +
        "FROM t JOIN h2 ON h2.bucket = t.bucket ORDER BY t.bucket"
    },
      (s, d) => {
        val c = T.events(s, d)
          .groupBy((col("user_id") % 10).as("bucket"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        val t = c.groupBy("bucket")
          .agg(sum("cnt").as("n"), count(lit(1)).as("d0"),
            sum(col("cnt") * col("cnt")).as("ss"))
        val p = col("cnt").cast("double") / col("n").cast("double")
        val h = c.join(broadcast(t.select(col("bucket"), col("n"))), "bucket")
          .groupBy("bucket")
          .agg(sum(s6(-p * lnRatio(col("cnt"), col("n")))).as("h6"))
          .withColumn("hd", col("h6").cast("double") / lit(1e6))
        val d1 = expP(col("hd"))
        val d2 = col("n").cast("double") * col("n").cast("double") /
          col("ss").cast("double")
        t.join(broadcast(h), "bucket")
          .select(col("bucket"), col("n"), col("d0"),
            floor(d1 * 100 + 0.5).cast("long").as("d1_c"),
            floor(d2 * 100 + 0.5).cast("long").as("d2_c"))
          .orderBy("bucket")
      }),

    // Pairwise correlation matrix (round 9, seventh wave) — the
    // first screen of any multivariate analysis: all three Pearson r
    // between (quantity, price-dollars, discount-percent) in ONE pass
    // of nine exact integer moments (the agg_ols_multi Gram layout),
    // each r one fixed IEEE sequence. Long-format output (var_a, var_b,
    // r6) so the matrix reads like a table at any width.
    Q("agg_corr_matrix", Some {
      def r(sab: String, sa: String, sb: String, saa: String, sbb: String) =
        s"((CAST(n AS DOUBLE) * CAST($sab AS DOUBLE) - CAST($sa AS DOUBLE) * CAST($sb AS DOUBLE)) / " +
          s"(SQRT(CAST(n AS DOUBLE) * CAST($saa AS DOUBLE) - CAST($sa AS DOUBLE) * CAST($sa AS DOUBLE)) * " +
          s"SQRT(CAST(n AS DOUBLE) * CAST($sbb AS DOUBLE) - CAST($sb AS DOUBLE) * CAST($sb AS DOUBLE))))"
      "WITH b AS (SELECT " + sqlS0("l_quantity") + " AS x, " + sqlS0("l_extendedprice") + " AS y, " +
        sqlS2("l_discount") + " AS z FROM lineitem), " +
        "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(z) AS BIGINT) AS sz, " +
        "CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy, CAST(SUM(z * z) AS BIGINT) AS szz, " +
        "CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * z) AS BIGINT) AS sxz, CAST(SUM(y * z) AS BIGINT) AS syz FROM b) " +
        "SELECT 'qty' AS var_a, 'price' AS var_b, " + sqlS6(r("sxy", "sx", "sy", "sxx", "syy")) + " AS r6 FROM m " +
        "UNION ALL SELECT 'qty', 'disc', " + sqlS6(r("sxz", "sx", "sz", "sxx", "szz")) + " FROM m " +
        "UNION ALL SELECT 'price', 'disc', " + sqlS6(r("syz", "sy", "sz", "syy", "szz")) + " FROM m " +
        "ORDER BY var_a, var_b"
    },
      (s, d) => {
        val m = T.lineitem(s, d)
          .select(s0(col("l_quantity")).as("x"), s0(col("l_extendedprice")).as("y"),
            s2(col("l_discount")).as("z"))
          .agg(count(lit(1)).as("n"),
            sum("x").as("sx"), sum("y").as("sy"), sum("z").as("sz"),
            sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
            sum(col("z") * col("z")).as("szz"),
            sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("z")).as("sxz"),
            sum(col("y") * col("z")).as("syz"))
        val nD = col("n").cast("double")
        def r(sab: String, sa: String, sb: String, saa: String, sbb: String) =
          (nD * col(sab).cast("double") - col(sa).cast("double") * col(sb).cast("double")) /
            (sqrt(nD * col(saa).cast("double") - col(sa).cast("double") * col(sa).cast("double")) *
              sqrt(nD * col(sbb).cast("double") - col(sb).cast("double") * col(sb).cast("double")))
        val a = m.select(lit("qty").as("var_a"), lit("price").as("var_b"),
          s6(r("sxy", "sx", "sy", "sxx", "syy")).as("r6"))
        val b2 = m.select(lit("qty").as("var_a"), lit("disc").as("var_b"),
          s6(r("sxz", "sx", "sz", "sxx", "szz")).as("r6"))
        val c2 = m.select(lit("price").as("var_a"), lit("disc").as("var_b"),
          s6(r("syz", "sy", "sz", "syy", "szz")).as("r6"))
        a.unionAll(b2).unionAll(c2).orderBy("var_a", "var_b")
      }),

    // Median absolute deviation (round 9, seventh wave) — the robust
    // scale estimate per segment (the global-aggregate sibling of
    // win_hampel's rolling filter and eo_composite_mad's per-pixel
    // form): med2 = 2·median and mad4 = 2·median(|2x − med2|) keep both
    // medians exact integers (interpolated medians of ints ×2, Det rule
    // 4), and the robust outlier count compares 2·|2x − med2| > 3·mad4
    // — all integer. Two quantile passes + one rejoin, the
    // dq_anomaly_iqr shape with the doubled-median discipline.
    Q("agg_mad", Some(
      "WITH b AS (SELECT l_returnflag AS g, " + sqlS0("l_quantity") + " AS x FROM lineitem), " +
        "m1 AS (SELECT g, CAST(FLOOR(QUANTILE_CONT(x, 0.5) * 2 + 0.5) AS BIGINT) AS med2 FROM b GROUP BY g), " +
        "dv AS (SELECT b.g, b.x, m1.med2, ABS(2 * b.x - m1.med2) AS d2v FROM b JOIN m1 ON m1.g = b.g), " +
        "m2 AS (SELECT g, CAST(FLOOR(QUANTILE_CONT(d2v, 0.5) * 2 + 0.5) AS BIGINT) AS mad4 FROM dv GROUP BY g) " +
        "SELECT dv.g, CAST(COUNT(*) AS BIGINT) AS n, MAX(dv.med2) AS med2, MAX(m2.mad4) AS mad4, " +
        "CAST(SUM(CASE WHEN 2 * dv.d2v > 3 * m2.mad4 THEN 1 ELSE 0 END) AS BIGINT) AS n_out " +
        "FROM dv JOIN m2 ON m2.g = dv.g GROUP BY dv.g ORDER BY dv.g"),
      (s, d) => {
        val b = T.lineitem(s, d)
          .select(col("l_returnflag").as("g"), s0(col("l_quantity")).as("x"))
        val m1 = b.groupBy("g")
          .agg(floor(percentile(col("x"), lit(0.5)) * 2 + 0.5).cast("long").as("med2"))
        val dv = b.join(broadcast(m1), "g")
          .withColumn("d2v", abs(lit(2) * col("x") - col("med2")))
        val m2 = dv.groupBy("g")
          .agg(floor(percentile(col("d2v"), lit(0.5)) * 2 + 0.5).cast("long").as("mad4"))
        dv.join(broadcast(m2), "g")
          .groupBy("g")
          .agg(count(lit(1)).as("n"), max("med2").as("med2"), max("mad4").as("mad4"),
            sum(when(lit(2) * col("d2v") > lit(3) * col("mad4"), 1L).otherwise(0L))
              .as("n_out"))
          .orderBy("g")
      }),

    // Market-basket association (round 9, seventh wave) — the apriori
    // first pass every recommender bootstrap runs: brand pairs
    // co-occurring in one order, scored by support, confidence and LIFT
    // = P(a,b)/(P(a)P(b)). The fact table collapses to DISTINCT (order,
    // brand) FIRST, so the pair self-join is bounded by basket width ×
    // the ~25-brand dictionary, never line items²; singles broadcast
    // back over the pair domain. Counts exact; confidence/lift one IEEE
    // divide each on the s6 grid; top 20 by (lift DESC, a, b).
    Q("agg_basket_lift", Some {
      val conf = "(CAST(nab AS DOUBLE) / CAST(na AS DOUBLE))"
      val lift = "(CAST(nab AS DOUBLE) * CAST(nt AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))"
      "WITH ob AS (SELECT DISTINCT l_orderkey AS o, p_brand AS b FROM lineitem " +
        "JOIN part ON p_partkey = l_partkey), " +
        "nt AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS nt FROM ob), " +
        "s AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n FROM ob GROUP BY b), " +
        "pr AS (SELECT x.b AS a, y.b AS b2, CAST(COUNT(*) AS BIGINT) AS nab " +
        "FROM ob x JOIN ob y ON y.o = x.o AND x.b < y.b GROUP BY x.b, y.b), " +
        "sc AS (SELECT pr.a, pr.b2, pr.nab, sa.n AS na, sb.n AS nb, " +
        "(SELECT nt FROM nt) AS nt FROM pr " +
        "JOIN s sa ON sa.b = pr.a JOIN s sb ON sb.b = pr.b2), " +
        "r AS (SELECT a, b2, nab, " + sqlS6(conf) + " AS conf6, " + sqlS6(lift) + " AS lift6, " +
        s"ROW_NUMBER() OVER (ORDER BY $lift DESC, a, b2) AS rn FROM sc) " +
        "SELECT a, b2 AS b, nab, conf6, lift6, CAST(rn AS INT) AS rn " +
        "FROM r WHERE rn <= 20 ORDER BY rn"
    },
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ob = T.lineitem(s, d).select(col("l_orderkey").as("o"), col("l_partkey"))
          .join(broadcast(T.part(s, d).select(col("p_partkey"), col("p_brand").as("b"))),
            col("l_partkey") === col("p_partkey"))
          .select("o", "b").distinct()
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val nt = ob.agg(countDistinct(col("o")).as("nt"))
        val singles = ob.groupBy("b").agg(count(lit(1)).as("n"))
        val pr = ob.select(col("o"), col("b").as("a"))
          .join(ob.select(col("o"), col("b").as("b2")), "o")
          .where(col("a") < col("b2"))
          .groupBy("a", "b2").agg(count(lit(1)).as("nab"))
        val sc = pr
          .join(broadcast(singles.select(col("b").as("a"), col("n").as("na"))), "a")
          .join(broadcast(singles.select(col("b").as("b2"), col("n").as("nb"))), "b2")
          .crossJoin(broadcast(nt))
        val conf = col("nab").cast("double") / col("na").cast("double")
        val lift = col("nab").cast("double") * col("nt").cast("double") /
          (col("na").cast("double") * col("nb").cast("double"))
        val w = Window.orderBy(lift.desc, col("a"), col("b2"))
        sc.withColumn("rn", row_number().over(w))
          .where(col("rn") <= 20)
          .select(col("a"), col("b2").as("b"), col("nab"),
            s6(conf).as("conf6"), s6(lift).as("lift6"), col("rn").cast("int").as("rn"))
          .orderBy("rn")
      }),

    // One-way ANOVA (round 9, seventh wave) — the k-group extension of
    // agg_ttest (here: does order quantity differ across the three
    // return flags): F = (SSB/(k−1))/(SSW/(n−k)) from per-group exact
    // integer moments (n_g, Σx, Σx²) combined in ONE more aggregate —
    // SSB and SSW each reduce to fixed IEEE sequences over exact longs,
    // so the statistic is bit-identical by the Det induction. Two
    // partial-agg passes, both map-side combinable.
    Q("agg_anova", Some {
      // the between-groups Σ sg²/ng term s6-floors PER GROUP before its
      // long sum (Det rule 3 — a double sum across groups would be
      // merge-order-dependent), so ssb/ssw/F are fixed sequences over
      // exact integers throughout
      val sxgD = "(CAST(sxg6 AS DOUBLE) / 1e6)"
      val ssb = s"($sxgD - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
      val ssw = s"(CAST(sxx AS DOUBLE) - $sxgD)"
      val f = s"(($ssb / (CAST(k AS DOUBLE) - 1.0)) / ($ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))))"
      "WITH b AS (SELECT l_returnflag AS g, " + sqlS0("l_quantity") + " AS x FROM lineitem), " +
        "m AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng, CAST(SUM(x) AS BIGINT) AS sg, " +
        "CAST(SUM(x * x) AS BIGINT) AS ssg FROM b GROUP BY g), " +
        "c AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ng) AS BIGINT) AS n, " +
        "CAST(SUM(sg) AS BIGINT) AS sx, CAST(SUM(ssg) AS BIGINT) AS sxx, " +
        "CAST(SUM(" + sqlS6("CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)") +
        ") AS BIGINT) AS sxg6 FROM m) " +
        "SELECT k, n, " + sqlS6(ssb) + " AS ssb6, " + sqlS6(ssw) + " AS ssw6, " +
        sqlS6(f) + " AS f6 FROM c"
    },
      (s, d) => {
        val m = T.lineitem(s, d)
          .select(col("l_returnflag").as("g"), s0(col("l_quantity")).as("x"))
          .groupBy("g")
          .agg(count(lit(1)).as("ng"), sum("x").as("sg"),
            sum(col("x") * col("x")).as("ssg"))
        val c = m.agg(count(lit(1)).as("k"), sum("ng").as("n"),
          sum("sg").as("sx"), sum("ssg").as("sxx"),
          sum(s6(col("sg").cast("double") * col("sg").cast("double") /
            col("ng").cast("double"))).as("sxg6"))
        val sxgD = col("sxg6").cast("double") / lit(1e6)
        val ssb = sxgD -
          col("sx").cast("double") * col("sx").cast("double") / col("n").cast("double")
        val ssw = col("sxx").cast("double") - sxgD
        val f = (ssb / (col("k").cast("double") - lit(1.0))) /
          (ssw / (col("n").cast("double") - col("k").cast("double")))
        c.select(col("k"), col("n"), s6(ssb).as("ssb6"), s6(ssw).as("ssw6"),
          s6(f).as("f6"))
      }),

    // Wilson score interval (round 9, seventh wave) — the proportion CI
    // every dashboard SHOULD use instead of the Wald ±z√(p(1−p)/n)
    // (which collapses at p near 0/1): per event type, the share of
    // high-value events with its 95% Wilson bounds. Closed form over two
    // exact integers (k successes, n trials) with z = 1.96 as a double
    // literal — one fixed IEEE sequence per bound, s6-floored; the spec
    // pins 0 ≤ lo ≤ p̂ ≤ hi ≤ 1 and shrinking width with n.
    Q("agg_wilson", Some {
      val z = "1.96"; val nD = "CAST(n AS DOUBLE)"; val kD = "CAST(k AS DOUBLE)"
      val p = s"($kD / $nD)"
      val denom = s"(1.0 + $z * $z / $nD)"
      val center = s"(($p + $z * $z / (2.0 * $nD)) / $denom)"
      val half = s"(($z * SQRT($p * (1.0 - $p) / $nD + $z * $z / (4.0 * $nD * $nD))) / $denom)"
      "WITH b AS (SELECT event_type, CASE WHEN value > 500 THEN 1 ELSE 0 END AS hit FROM events), " +
        "m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(hit) AS BIGINT) AS k FROM b GROUP BY event_type) " +
        "SELECT event_type, n, k, " + sqlS6(p) + " AS p6, " +
        sqlS6(s"$center - $half") + " AS lo6, " +
        sqlS6(s"$center + $half") + " AS hi6 " +
        "FROM m ORDER BY event_type"
    },
      (s, d) => {
        val m = T.events(s, d)
          .select(col("event_type"),
            when(col("value") > 500, 1L).otherwise(0L).as("hit"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("hit").as("k"))
        val z = lit(1.96)
        val nD = col("n").cast("double"); val kD = col("k").cast("double")
        val p = kD / nD
        val denom = lit(1.0) + z * z / nD
        val center = (p + z * z / (lit(2.0) * nD)) / denom
        val half = (z * sqrt(p * (lit(1.0) - p) / nD +
          z * z / (lit(4.0) * nD * nD))) / denom
        m.select(col("event_type"), col("n"), col("k"), s6(p).as("p6"),
          s6(center - half).as("lo6"), s6(center + half).as("hi6"))
          .orderBy("event_type")
      }),

    // Power-of-two (log2) histogram (round 9, seventh wave) — the
    // latency-histogram layout every observability backend stores
    // (HdrHistogram / Prometheus-exponential buckets): bucket k holds
    // values in [2^k, 2^(k+1)). The bucket index is a generated integer
    // CASE bisection over exact cents — no log2() call exists, so there
    // is no float-tie risk at exact powers and the whole key is map +
    // one domain-sized partial agg (≤ 41 buckets per type). Non-positive
    // values land in the sentinel bucket −1.
    Q("agg_log2_hist", Some {
      val cases = (40 to 0 by -1)
        .map(k => s"WHEN x >= ${1L << k} THEN $k").mkString(" ")
      "WITH b AS (SELECT event_type, " + sqlS2("value") + " AS x FROM events), " +
        s"k AS (SELECT event_type, x, CAST(CASE $cases ELSE -1 END AS BIGINT) AS bucket FROM b) " +
        "SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(MIN(x) AS BIGINT) AS min_c, CAST(MAX(x) AS BIGINT) AS max_c " +
        "FROM k GROUP BY event_type, bucket ORDER BY event_type, bucket"
    },
      (s, d) => {
        val bucket = (40 to 0 by -1).foldLeft(when(lit(false), -1)) {
          (acc, k) => acc.when(col("x") >= lit(1L << k), k)
        }.otherwise(-1).cast("long")
        T.events(s, d)
          .select(col("event_type"), s2(col("value")).as("x"))
          .withColumn("bucket", bucket)
          .groupBy("event_type", "bucket")
          .agg(count(lit(1)).as("n"), min("x").as("min_c"), max("x").as("max_c"))
          .orderBy("event_type", "bucket")
      }),

    // Kendall's τ-b rank correlation (round 10, third wave) — the
    // tie-adjusted concordance statistic [Kendall 1945] completing the
    // correlation trio next to agg_regr (Pearson) and agg_spearman.
    // Naively τ is a Σ over all n² row pairs — the agg_mannwhitney
    // scale lesson applies: both variables live on SMALL INTEGER
    // domains (l_quantity 1..50, l_linenumber 1..7), so the pair sums
    // COLLAPSE onto the ≤350-cell contingency table: concordant C =
    // Σ_{cells a,b: b.x>a.x ∧ b.y>a.y} m_a·m_b (each unordered pair
    // counted once — only one direction satisfies both strict
    // inequalities), discordant D the mirror, tie terms n1/n2 from the
    // margins, n0 = n(n−1)/2. One linear partial agg + a domain²
    // broadcast join — never a row-pair shuffle at ANY corpus size.
    // All counts exact int64 (C ≤ n0 ≈ 1.8e11 at sf0.1; the n0−n1
    // products exceed int64, so the denominator is the agg_spearman
    // √·√ split — ONE shared IEEE sequence, s6-floored). Integer
    // divisions use div/` // ` on provably non-negative operands only
    // (Det scaladoc rule).
    Q("agg_kendall_tau", Some {
      val n0 = "CAST((n * (n - 1)) // 2 AS BIGINT)"
      "WITH c AS (SELECT l_quantity AS x, l_linenumber AS y, " +
        "CAST(COUNT(*) AS BIGINT) AS m FROM lineitem GROUP BY x, y), " +
        "tot AS (SELECT CAST(SUM(m) AS BIGINT) AS n FROM c), " +
        "cd AS (SELECT " +
        "CAST(COALESCE(SUM(CASE WHEN b.y > a.y THEN a.m * b.m END), 0) AS BIGINT) AS conc, " +
        "CAST(COALESCE(SUM(CASE WHEN b.y < a.y THEN a.m * b.m END), 0) AS BIGINT) AS disc " +
        "FROM c a JOIN c b ON b.x > a.x), " +
        "tx AS (SELECT CAST(SUM((s * (s - 1)) // 2) AS BIGINT) AS n1 " +
        "FROM (SELECT CAST(SUM(m) AS BIGINT) AS s FROM c GROUP BY x) g), " +
        "ty AS (SELECT CAST(SUM((s * (s - 1)) // 2) AS BIGINT) AS n2 " +
        "FROM (SELECT CAST(SUM(m) AS BIGINT) AS s FROM c GROUP BY y) g) " +
        "SELECT n, conc, disc, " +
        s"CASE WHEN $n0 - n1 <= 0 OR $n0 - n2 <= 0 THEN NULL ELSE " +
        sqlS6(s"CAST(conc - disc AS DOUBLE) / " +
          s"(SQRT(CAST($n0 - n1 AS DOUBLE)) * SQRT(CAST($n0 - n2 AS DOUBLE)))") +
        " END AS tau6 FROM cd, tot, tx, ty"
    },
      (s, d) => {
        val c = T.lineitem(s, d)
          .groupBy(col("l_quantity").as("x"), col("l_linenumber").as("y"))
          .agg(count(lit(1)).as("m"))
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val tot = c.agg(sum(col("m")).as("n"))
        val b = c.select(col("x").as("x2"), col("y").as("y2"), col("m").as("m2"))
        val cd = c.join(broadcast(b), col("x2") > col("x"))
          .agg(
            coalesce(sum(when(col("y2") > col("y"), col("m") * col("m2"))), lit(0L))
              .as("conc"),
            coalesce(sum(when(col("y2") < col("y"), col("m") * col("m2"))), lit(0L))
              .as("disc"))
        def tiePairs(k: String, out: String) = c.groupBy(col(k))
          .agg(sum(col("m")).as("s"))
          .agg(sum(expr("(s * (s - 1)) div 2")).as(out))
        val n0 = expr("(n * (n - 1)) div 2")
        cd.crossJoin(broadcast(tot))
          .crossJoin(broadcast(tiePairs("x", "n1")))
          .crossJoin(broadcast(tiePairs("y", "n2")))
          .select(col("n"), col("conc"), col("disc"),
            when(n0 - col("n1") <= 0 || n0 - col("n2") <= 0, lit(null))
              .otherwise(s6((col("conc") - col("disc")).cast("double") /
                (sqrt((n0 - col("n1")).cast("double")) *
                  sqrt((n0 - col("n2")).cast("double"))))).as("tau6"))
      }))

  /** agg_stats oracle: the same exact-integer-moment formulas, textually
    * op-for-op aligned with the Spark side (Det rule 3). */
  private lazy val statsOracle: String = {
    val nD = "CAST(n AS DOUBLE)"
    val sqD = "CAST(sq AS DOUBLE)"; val sqqD = "CAST(sqq AS DOUBLE)"
    val spD = "CAST(sp AS DOUBLE)"; val sppD = "CAST(spp AS DOUBLE)"
    val spqD = "CAST(spq AS DOUBLE)"
    val varQ = s"($nD * $sqqD - $sqD * $sqD) / ($nD * ($nD - 1.0))"
    val covPQ = s"($nD * $spqD - $spD * $sqD) / ($nD * ($nD - 1.0))"
    val corrPQ = s"($nD * $spqD - $spD * $sqD) / " +
      s"(SQRT($nD * $sqqD - $sqD * $sqD) * SQRT($nD * $sppD - $spD * $spD))"
    "WITH b AS (SELECT l_returnflag, " + sqlS0("l_quantity") + " AS qi, " +
      sqlS0("l_extendedprice") + " AS pi FROM lineitem), " +
      "m AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, " +
      "CAST(SUM(qi) AS BIGINT) AS sq, CAST(SUM(qi * qi) AS BIGINT) AS sqq, " +
      "CAST(SUM(pi) AS BIGINT) AS sp, CAST(SUM(pi * pi) AS BIGINT) AS spp, " +
      "CAST(SUM(pi * qi) AS BIGINT) AS spq FROM b GROUP BY l_returnflag) " +
      "SELECT l_returnflag, " +
      sqlS4(s"SQRT($varQ)") + " AS sd_qty, " +
      sqlS4(varQ) + " AS var_qty, " +
      sqlS4(corrPQ) + " AS corr_pq, " +
      sqlS4(covPQ) + " AS cov_pq " +
      "FROM m ORDER BY l_returnflag"
  }

  /** Oracle twin of agg_skew_kurt — identical moment sums and double op
    * sequence (m2^1.5 spelled as m2*SQRT(m2), matching the Column form). */
  private def skewKurtOracle: String = {
    val nD = "CAST(n AS DOUBLE)"
    val s1D = "CAST(s1 AS DOUBLE)"; val s2D = "CAST(s2 AS DOUBLE)"
    val s3D = "CAST(s3 AS DOUBLE)"; val s4D = "CAST(s4m AS DOUBLE)"
    val mu = s"($s1D / $nD)"
    val m2 = s"($s2D / $nD - $mu * $mu)"
    val m3 = s"($s3D / $nD - 3.0 * $mu * ($s2D / $nD) + 2.0 * $mu * $mu * $mu)"
    val m4 = s"($s4D / $nD - 4.0 * $mu * ($s3D / $nD) + " +
      s"6.0 * $mu * $mu * ($s2D / $nD) - 3.0 * $mu * $mu * $mu * $mu)"
    "WITH b AS (SELECT l_returnflag, " + sqlS0("l_quantity") + " AS xi FROM lineitem), " +
      "m AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, " +
      "CAST(SUM(xi) AS BIGINT) AS s1, CAST(SUM(xi * xi) AS BIGINT) AS s2, " +
      "CAST(SUM(xi * xi * xi) AS BIGINT) AS s3, " +
      "CAST(SUM(xi * xi * xi * xi) AS BIGINT) AS s4m FROM b GROUP BY l_returnflag) " +
      "SELECT l_returnflag, n, " +
      sqlS6(s"$m3 / ($m2 * SQRT($m2))") + " AS skew6, " +
      sqlS6(s"$m4 / ($m2 * $m2) - 3.0") + " AS kurt6 " +
      "FROM m ORDER BY l_returnflag"
  }

  /** Oracle twin of agg_regr — the identical moment sums and double op
    * sequence, spelled once (the Spark side mirrors it term for term). */
  private def regrOracle: String = {
    val nD = "CAST(n AS DOUBLE)"
    val sxD = "CAST(sx AS DOUBLE)"; val sxxD = "CAST(sxx AS DOUBLE)"
    val syD = "CAST(sy AS DOUBLE)"; val syyD = "CAST(syy AS DOUBLE)"
    val sxyD = "CAST(sxy AS DOUBLE)"
    val cov = s"($nD * $sxyD - $sxD * $syD)"
    val varX = s"($nD * $sxxD - $sxD * $sxD)"
    val varY = s"($nD * $syyD - $syD * $syD)"
    val slope = s"($cov / $varX)"
    val intercept = s"(($syD - $slope * $sxD) / $nD)"
    val r2 = s"(($cov * $cov) / ($varX * $varY))"
    "WITH b AS (SELECT l_returnflag, " + sqlS0("l_quantity") + " AS xi, " +
      sqlS0("l_extendedprice") + " AS yi FROM lineitem), " +
      "m AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, " +
      "CAST(SUM(xi) AS BIGINT) AS sx, CAST(SUM(xi * xi) AS BIGINT) AS sxx, " +
      "CAST(SUM(yi) AS BIGINT) AS sy, CAST(SUM(yi * yi) AS BIGINT) AS syy, " +
      "CAST(SUM(xi * yi) AS BIGINT) AS sxy FROM b GROUP BY l_returnflag) " +
      "SELECT l_returnflag, n, " +
      sqlS6(slope) + " AS slope6, " +
      sqlS4(intercept) + " AS icept4, " +
      sqlS6(r2) + " AS r2_6 " +
      "FROM m ORDER BY l_returnflag"
  }

  /** Oracle twin of agg_ttest — identical conditional moment sums and
    * double op sequence (one CASE-aggregation pass, then Welch's t and
    * the Satterthwaite df with the Column form's exact parenthesization). */
  private def ttestOracle: String = {
    val naD = "CAST(na AS DOUBLE)"; val nrD = "CAST(nr AS DOUBLE)"
    val saD = "CAST(sa AS DOUBLE)"; val saaD = "CAST(saa AS DOUBLE)"
    val srD = "CAST(sr AS DOUBLE)"; val srrD = "CAST(srr AS DOUBLE)"
    val m1 = s"($saD / $naD)"; val m2 = s"($srD / $nrD)"
    val v1 = s"(($saaD - $saD * $saD / $naD) / ($naD - 1.0))"
    val v2 = s"(($srrD - $srD * $srD / $nrD) / ($nrD - 1.0))"
    val g1 = s"($v1 / $naD)"; val g2 = s"($v2 / $nrD)"
    val se2 = s"($g1 + $g2)"
    val t = s"(($m1 - $m2) / SQRT($se2))"
    val df = s"(($se2 * $se2) / " +
      s"(($g1 * $g1) / ($naD - 1.0) + ($g2 * $g2) / ($nrD - 1.0)))"
    "WITH b AS (SELECT l_linestatus, l_returnflag, " + sqlS0("l_quantity") +
      " AS xi FROM lineitem WHERE l_returnflag IN ('A', 'R')), " +
      "m AS (SELECT l_linestatus, " +
      "CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na, " +
      "CAST(SUM(CASE WHEN l_returnflag = 'A' THEN xi ELSE 0 END) AS BIGINT) AS sa, " +
      "CAST(SUM(CASE WHEN l_returnflag = 'A' THEN xi * xi ELSE 0 END) AS BIGINT) AS saa, " +
      "CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS nr, " +
      "CAST(SUM(CASE WHEN l_returnflag = 'R' THEN xi ELSE 0 END) AS BIGINT) AS sr, " +
      "CAST(SUM(CASE WHEN l_returnflag = 'R' THEN xi * xi ELSE 0 END) AS BIGINT) AS srr " +
      "FROM b GROUP BY l_linestatus) " +
      "SELECT l_linestatus, na, nr, " +
      sqlS6(t) + " AS t6, " + sqlS4(df) + " AS df4 " +
      "FROM m ORDER BY l_linestatus"
  }

  /** Oracle twin of agg_mannwhitney — the same per-value count table,
    * domain-window cumsum, doubled-rank/tie long sums and z sequence. */
  private def mannWhitneyOracle: String = {
    val naD = "CAST(na AS DOUBLE)"; val nrD = "CAST(nr AS DOUBLE)"
    val nD = "CAST(na + nr AS DOUBLE)"
    val u2 = "(r2a - na * (na + 1))"
    val varU = s"(($naD * $nrD / 12.0) * " +
      s"(($nD + 1.0) - CAST(ties AS DOUBLE) / ($nD * ($nD - 1.0))))"
    val z = s"((CAST($u2 AS DOUBLE) - $naD * $nrD) / (2.0 * SQRT($varU)))"
    "WITH b AS (SELECT l_linestatus AS st, l_returnflag AS f, " +
      sqlS0("l_quantity") + " AS q FROM lineitem WHERE l_returnflag IN ('A', 'R')), " +
      "g AS (SELECT st, q, " +
      "CAST(SUM(CASE WHEN f = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca, " +
      "CAST(SUM(CASE WHEN f = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cr " +
      "FROM b GROUP BY st, q), " +
      "c AS (SELECT st, q, ca, cr, ca + cr AS t, " +
      "COALESCE(SUM(ca + cr) OVER (PARTITION BY st ORDER BY q " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below FROM g), " +
      "m AS (SELECT st, CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cr) AS BIGINT) AS nr, " +
      "CAST(SUM(ca * (2 * below + t + 1)) AS BIGINT) AS r2a, " +
      "CAST(SUM(t * t * t - t) AS BIGINT) AS ties FROM c GROUP BY st) " +
      "SELECT st AS l_linestatus, na, nr, " +
      s"CAST($u2 AS BIGINT) AS u2a, " + sqlS6(z) + " AS z6 " +
      "FROM m ORDER BY l_linestatus"
  }

  /** Oracle twin of agg_ks — the same count table, cumulative/total
    * window sums, s6-floored per-value ECDF gaps and MAX pick. */
  private def ksOracle: String =
    "WITH b AS (SELECT l_linestatus AS st, l_returnflag AS f, " +
      sqlS0("l_quantity") + " AS q FROM lineitem WHERE l_returnflag IN ('A', 'R')), " +
      "g AS (SELECT st, q, " +
      "CAST(SUM(CASE WHEN f = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca, " +
      "CAST(SUM(CASE WHEN f = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cr " +
      "FROM b GROUP BY st, q), " +
      "c AS (SELECT st, ca, cr, " +
      "SUM(ca) OVER (PARTITION BY st ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cca, " +
      "SUM(cr) OVER (PARTITION BY st ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ccr, " +
      "SUM(ca) OVER (PARTITION BY st) AS na, SUM(cr) OVER (PARTITION BY st) AS nr FROM g) " +
      "SELECT st AS l_linestatus, CAST(MAX(na) AS BIGINT) AS na, " +
      "CAST(MAX(nr) AS BIGINT) AS nr, " +
      "CAST(MAX(" +
      sqlS6("ABS(CAST(cca AS DOUBLE) / CAST(na AS DOUBLE) - CAST(ccr AS DOUBLE) / CAST(nr AS DOUBLE))") +
      ") AS BIGINT) AS d6 " +
      "FROM c GROUP BY st ORDER BY l_linestatus"

  /** Oracle twin of agg_chisq — identical cell/marginal integer sums,
    * the same per-cell s6-floored (o−e)²/e term, and the same dof
    * arithmetic, spelled with scalar subqueries. */
  private def chisqOracle: String = {
    val e = "(CAST(r AS DOUBLE) * CAST(k AS DOUBLE) / CAST(n AS DOUBLE))"
    val cD = "CAST(c AS DOUBLE)"
    "WITH cells AS (SELECT l_returnflag AS f, l_linestatus AS st, " +
      "CAST(COUNT(*) AS BIGINT) AS c FROM lineitem GROUP BY l_returnflag, l_linestatus), " +
      "rt AS (SELECT f, CAST(SUM(c) AS BIGINT) AS r FROM cells GROUP BY f), " +
      "ct AS (SELECT st, CAST(SUM(c) AS BIGINT) AS k FROM cells GROUP BY st), " +
      "tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells), " +
      "terms AS (SELECT " +
      sqlS6(s"($cD - $e) * ($cD - $e) / $e") + " AS term6 " +
      "FROM cells JOIN rt USING (f) JOIN ct USING (st) CROSS JOIN tot) " +
      "SELECT CAST(COUNT(*) AS BIGINT) AS n_cells, " +
      "CAST(((SELECT COUNT(*) FROM rt) - 1) * ((SELECT COUNT(*) FROM ct) - 1) AS BIGINT) AS dof, " +
      "CAST(SUM(term6) AS BIGINT) AS chi2_6 FROM terms"
  }

  /** Oracle twin of agg_hurst — identical day quantization, per-segment
    * integer range/moment math, s6 R/S terms, integer means and the
    * final Δln/ln4 sequence, generated per scale. */
  private def hurstOracle: String = {
    def scale(m: Int, tag: String): String = {
      val mD = s"$m.0"
      val varS = s"(($mD * CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)) / ($mD * ($mD - 1.0)))"
      val rs = s"((CAST(r AS DOUBLE) / $mD) / SQRT($varS))"
      s"seg$tag AS (SELECT day, v, day // $m AS seg FROM g), " +
        s"full$tag AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS sv, " +
        s"CAST(SUM(v * v) AS BIGINT) AS svv FROM seg$tag GROUP BY seg HAVING COUNT(*) = $m), " +
        s"u$tag AS (SELECT s.seg, f.sv, f.svv, " +
        s"CAST($m AS BIGINT) * SUM(s.v) OVER (PARTITION BY s.seg ORDER BY s.day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - " +
        s"ROW_NUMBER() OVER (PARTITION BY s.seg ORDER BY s.day) * f.sv AS u " +
        s"FROM seg$tag s JOIN full$tag f ON f.seg = s.seg), " +
        s"r$tag AS (SELECT seg, MAX(sv) AS sv, MAX(svv) AS svv, " +
        s"MAX(u) - MIN(u) AS r FROM u$tag GROUP BY seg), " +
        s"m$tag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_seg, " +
        s"CAST(FLOOR(CAST(SUM(" + sqlS6(rs) + s") AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS rs_mean6 " +
        s"FROM r$tag WHERE $varS > 0)"
    }
    // ln(rs64/1e6) - ln(rs16/1e6) = lnInt(rs64) - lnInt(rs16) exactly
    // (the 1e6 scales cancel), via the round-10 portable lnInt
    val h = s"(${sqlLnRatio("rs64", "rs16")} / 1.3862943611198906)"
    "WITH g0 AS (SELECT CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) // 86400 AS day, " +
      "CAST(SUM(" + sqlS2("o_totalprice") + ") AS BIGINT) AS vc FROM orders GROUP BY day), " +
      "g AS (SELECT day, CAST(FLOOR(CAST(vc AS DOUBLE) / 1e4) AS BIGINT) AS v FROM g0), " +
      scale(16, "16") + ", " + scale(64, "64") + " " +
      "SELECT m16.n_seg AS n16, m64.n_seg AS n64, " +
      "m16.rs_mean6 AS rs16, m64.rs_mean6 AS rs64, " +
      sqlS6(h) + " AS h6 FROM m16 CROSS JOIN m64"
  }

  /** Oracle twin of agg_cramers_v — the agg_chisq cell/marginal machinery
    * plus the identical V = √(χ²₆/1e6/n/mdof) double sequence. */
  private def cramersVOracle: String = {
    val e = "(CAST(r AS DOUBLE) * CAST(k AS DOUBLE) / CAST(n AS DOUBLE))"
    val cD = "CAST(c AS DOUBLE)"
    val v = "SQRT(CAST(chi2_6 AS DOUBLE) / 1e6 / CAST(n AS DOUBLE) / CAST(mdof AS DOUBLE))"
    "WITH cells AS (SELECT l_returnflag AS f, l_linestatus AS st, " +
      "CAST(COUNT(*) AS BIGINT) AS c FROM lineitem GROUP BY l_returnflag, l_linestatus), " +
      "rt AS (SELECT f, CAST(SUM(c) AS BIGINT) AS r FROM cells GROUP BY f), " +
      "ct AS (SELECT st, CAST(SUM(c) AS BIGINT) AS k FROM cells GROUP BY st), " +
      "tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells), " +
      "terms AS (SELECT " +
      sqlS6(s"($cD - $e) * ($cD - $e) / $e") + " AS term6 " +
      "FROM cells JOIN rt USING (f) JOIN ct USING (st) CROSS JOIN tot), " +
      "m AS (SELECT (SELECT n FROM tot) AS n, " +
      "CAST(LEAST((SELECT COUNT(*) FROM rt) - 1, (SELECT COUNT(*) FROM ct) - 1) AS BIGINT) AS mdof, " +
      "CAST(SUM(term6) AS BIGINT) AS chi2_6 FROM terms) " +
      s"SELECT n, mdof, chi2_6, " + sqlS6(v) + " AS v6 FROM m"
  }

  /** Oracle twin of agg_cohens_d — agg_ttest's conditional moment sums
    * with the pooled-variance d and Hedges-J sequences. */
  private def cohensDOracle: String = {
    val naD = "CAST(na AS DOUBLE)"; val nrD = "CAST(nr AS DOUBLE)"
    val saD = "CAST(sa AS DOUBLE)"; val saaD = "CAST(saa AS DOUBLE)"
    val srD = "CAST(sr AS DOUBLE)"; val srrD = "CAST(srr AS DOUBLE)"
    val m1 = s"($saD / $naD)"; val m2 = s"($srD / $nrD)"
    val v1 = s"(($saaD - $saD * $saD / $naD) / ($naD - 1.0))"
    val v2 = s"(($srrD - $srD * $srD / $nrD) / ($nrD - 1.0))"
    val df = s"($naD + $nrD - 2.0)"
    val sp2 = s"((($naD - 1.0) * $v1 + ($nrD - 1.0) * $v2) / $df)"
    val dd = s"(($m1 - $m2) / SQRT($sp2))"
    val j = s"(1.0 - 3.0 / (4.0 * $df - 1.0))"
    "WITH b AS (SELECT l_linestatus, l_returnflag, " + sqlS0("l_quantity") +
      " AS xi FROM lineitem WHERE l_returnflag IN ('A', 'R')), " +
      "m AS (SELECT l_linestatus, " +
      "CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na, " +
      "CAST(SUM(CASE WHEN l_returnflag = 'A' THEN xi ELSE 0 END) AS BIGINT) AS sa, " +
      "CAST(SUM(CASE WHEN l_returnflag = 'A' THEN xi * xi ELSE 0 END) AS BIGINT) AS saa, " +
      "CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS nr, " +
      "CAST(SUM(CASE WHEN l_returnflag = 'R' THEN xi ELSE 0 END) AS BIGINT) AS sr, " +
      "CAST(SUM(CASE WHEN l_returnflag = 'R' THEN xi * xi ELSE 0 END) AS BIGINT) AS srr " +
      "FROM b GROUP BY l_linestatus) " +
      "SELECT l_linestatus, na, nr, " +
      sqlS6(dd) + " AS d6, " + sqlS6(s"$j * $dd") + " AS g6 " +
      "FROM m ORDER BY l_linestatus"
  }

  /** Oracle twin of agg_pca2 — identical six-moment sums and the
    * closed-form λ₁ / explained-ratio / alignment sequences. */
  private def pca2Oracle: String = {
    val nD = "CAST(n AS DOUBLE)"
    val a = s"(($nD * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / ($nD * ($nD - 1.0)))"
    val b = s"(($nD * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / ($nD * ($nD - 1.0)))"
    val c = s"(($nD * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) / ($nD * ($nD - 1.0)))"
    val h = s"(($a - $c) / 2.0)"
    val disc = s"SQRT($h * $h + $b * $b)"
    val lam1 = s"(($a + $c) / 2.0 + $disc)"
    "WITH b AS (SELECT l_returnflag, " + sqlS0("l_quantity") + " AS x, " +
      sqlS0("l_extendedprice") + " AS y FROM lineitem), " +
      "m AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, " +
      "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, " +
      "CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy, " +
      "CAST(SUM(x * y) AS BIGINT) AS sxy FROM b GROUP BY l_returnflag) " +
      "SELECT l_returnflag, n, " +
      sqlS6(lam1) + " AS lam1_6, " +
      sqlS6(s"$lam1 / ($a + $c)") + " AS evr6, " +
      sqlS6(s"$h / $disc") + " AS align6 " +
      "FROM m ORDER BY l_returnflag"
  }

  private def custNationRegion(s: SparkSession, d: String): DataFrame =
    T.customer(s, d)
      .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      // Narrow before rollup/cube: a fresh projection gives the grouping
      // attributes a single lineage, avoiding spurious self-join ambiguity.
      .select("r_name", "n_name", "c_acctbal")
}
