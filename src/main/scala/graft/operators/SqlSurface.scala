package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{Q, Tables => T}

/** The `spark.sql` entry point over registered views — the reference's ad
  * hoc SQL/notebook surface. These keys exercise Catalyst features only the
  * SQL path reaches naturally: correlated EXISTS/IN decorrelation (rewritten
  * to semi joins), scalar subqueries, and CTE reuse. Oracle SQL is the
  * *same* portable statement, so these double as dialect-compat proof.
  */
object SqlSurface {

  /** Register the corpus tables as temp views (the session-catalog analogue
    * of the ODC index). Idempotent per session+dir. */
  def registerViews(s: SparkSession, d: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
      .foreach(t => T.load(s, d, t).createOrReplaceTempView(t))
  // events is excluded: its ns->us conversion lives in Tables.events, so
  // SQL-surface queries over raw `events` views would bypass it.

  private def mk(name: String, statement: String): Q =
    Q(name, Some(statement), (s, d) => {
      registerViews(s, d)
      s.sql(statement)
    })

  val all: Seq[Q] = Seq(

    // Correlated EXISTS — Catalyst decorrelates to a left-semi join.
    mk("sql_exists_subq",
      "SELECT o_orderkey FROM orders o WHERE EXISTS (" +
        "SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey " +
        "AND l.l_discount > 0.09) ORDER BY o_orderkey"),

    // IN subquery with its own aggregation.
    mk("sql_in_subq",
      "SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey IN (" +
        "SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15) " +
        "ORDER BY c_custkey"),

    // Scalar subqueries in a predicate (single-row aggregate broadcast).
    // The 1.5×-average threshold is evaluated in exact integer space
    // (2·cents·n > 3·Σcents) so an order-dependent double AVG can never
    // flip a knife-edge row between engines (Det rule 3).
    mk("sql_scalar_subq",
      "SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents " +
        "FROM orders " +
        "WHERE 2 * CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) * (SELECT COUNT(*) FROM orders) " +
        "> 3 * (SELECT SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) FROM orders) " +
        "ORDER BY o_orderkey"),

    // CTE referenced twice — plan-level reuse of the aggregated subtree.
    mk("sql_cte_reuse",
      "WITH seg AS (SELECT c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS n " +
        "FROM customer GROUP BY c_mktsegment) " +
        "SELECT a.seg AS seg1, b.seg AS seg2, a.n + b.n AS combined " +
        "FROM seg a JOIN seg b ON a.n < b.n " +
        "ORDER BY seg1, seg2"),

    // Correlated LATERAL subquery with per-row ORDER BY + LIMIT (the
    // top-N-per-group "cross apply" surface; Catalyst plans a LateralJoin
    // and pushes the per-group limit). Deterministic: the inner ordering
    // covers the tie-break key. Identical portable statement in DuckDB.
    mk("sql_lateral",
      "SELECT c.c_custkey, t.o_orderkey, " +
        "CAST(FLOOR(t.o_totalprice * 100 + 0.5) AS BIGINT) AS price2 " +
        "FROM customer c, LATERAL (" +
        "SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_custkey = c.c_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t " +
        "ORDER BY c_custkey, o_orderkey"),

    // GROUP BY ALL (round 10) — the modern-dialect ergonomic both
    // engines added independently: every non-aggregate select item
    // becomes a grouping key. Graded because the resolution rule (which
    // expressions are keys) is pure frontend — a dialect divergence
    // would change the grouping arity and break rows+hash at once.
    mk("sql_groupby_all",
      "SELECT c_mktsegment, c_nationkey % 5 AS nation_bucket, " +
        "CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT) AS bal_cents " +
        "FROM customer GROUP BY ALL " +
        "ORDER BY c_mktsegment, nation_bucket"),

    // Recursive CTE (Spark 4's WITH RECURSIVE — the iterative plan
    // surface): a generated month ladder left-joined back to the data.
    // Identical portable statement in DuckDB.
    mk("sql_recursive_cte",
      "WITH RECURSIVE months(m) AS (" +
        "SELECT 1 UNION ALL SELECT m + 1 FROM months WHERE m < 12) " +
        "SELECT m, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders " +
        "FROM months LEFT JOIN orders ON MONTH(o_orderdate) = m " +
        "GROUP BY m ORDER BY m"),

    // SQL-dialect PIVOT (round 12) — the relational-rotation FRONTEND
    // beside agg_pivot's DataFrame .pivot: Spark parses the ANSI-ish
    // PIVOT (agg FOR col IN (...)) clause into the same Aggregate plan,
    // and that parse is the graded surface (a dialect divergence changes
    // column arity/names, exactly like sql_groupby_all). The oracle
    // spells the rotation as portable CASE aggregation — DuckDB's own
    // PIVOT syntax differs, and grading against the CASE form proves the
    // two frontends reach one semantics. Sums over exact cents (SUM of
    // BIGINT is HUGEINT in DuckDB — CAST per the oracle OUTPUT-TYPE
    // gate); absent (flag, status) cells are COALESCE-pinned to 0.
    Q("sql_pivot", Some(
      "SELECT l_returnflag, " +
        Seq("F", "O", "P").map(v =>
          s"CAST(COALESCE(SUM(CASE WHEN l_linestatus = '$v' THEN q END), 0) AS BIGINT) " +
            s"AS ${v.toLowerCase}_q2").mkString(", ") +
        " FROM (SELECT l_returnflag, l_linestatus, " +
        "CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS q FROM lineitem) " +
        "GROUP BY l_returnflag ORDER BY l_returnflag"),
      (s, d) => {
        registerViews(s, d)
        s.sql(
          "SELECT l_returnflag, COALESCE(F, 0) AS f_q2, COALESCE(O, 0) AS o_q2, " +
            "COALESCE(P, 0) AS p_q2 " +
            "FROM (SELECT l_returnflag, l_linestatus, " +
            "CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS q FROM lineitem) " +
            "PIVOT (SUM(q) FOR l_linestatus IN ('F' AS F, 'O' AS O, 'P' AS P)) " +
            "ORDER BY l_returnflag")
      }),

    // SQL-dialect UNPIVOT (round 12, third wave) — the inverse rotation
    // FRONTEND beside agg_unpivot's stack(): Spark parses the
    // UNPIVOT (v FOR metric IN (...)) clause [SPARK-39876, 3.4+] into the
    // same Expand plan, and that parse is the graded surface. The
    // load-bearing dialect law is NULL EXCLUSION: UNPIVOT drops NULL
    // cells by default, so one cell is deliberately NULLed (qty2 for
    // returnflag 'N') and the oracle's portable UNION ALL form carries
    // the matching IS NOT NULL guard — a frontend that kept the NULL row
    // would change the row count and break the hash. All measures are
    // exact-cent BIGINTs so the unified value column has one type.
    Q("sql_unpivot", Some(
      "WITH w AS (SELECT l_returnflag, " +
        "CASE WHEN l_returnflag = 'N' THEN NULL ELSE " +
        "CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) END AS qty2, " +
        "CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS price2, " +
        "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY l_returnflag) " +
        "SELECT l_returnflag, metric, v FROM (" +
        "SELECT l_returnflag, 'qty2' AS metric, qty2 AS v FROM w " +
        "UNION ALL SELECT l_returnflag, 'price2', price2 FROM w " +
        "UNION ALL SELECT l_returnflag, 'n', n FROM w) " +
        "WHERE v IS NOT NULL ORDER BY l_returnflag, metric"),
      (s, d) => {
        registerViews(s, d)
        s.sql(
          "WITH w AS (SELECT l_returnflag, " +
            "CASE WHEN l_returnflag = 'N' THEN NULL ELSE " +
            "SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) END AS qty2, " +
            "SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS price2, " +
            "COUNT(*) AS n FROM lineitem GROUP BY l_returnflag) " +
            "SELECT l_returnflag, metric, v FROM w " +
            "UNPIVOT (v FOR metric IN (qty2, price2, n)) " +
            "ORDER BY l_returnflag, metric")
      }),

    // QUALIFY window-filter semantics (round 13, VERDICT r12 item 3) —
    // the everyday top-N-per-group clause. MEASURED dialect fact this
    // key pins: OSS Spark 4.1.2 does NOT parse QUALIFY
    // (PARSE_SYNTAX_ERROR at the keyword — it is a Databricks-SQL /
    // DuckDB / Snowflake extension, not yet in the OSS grammar), so the
    // Spark side runs the CANONICAL REWRITE every QUALIFY implementation
    // lowers to — rank in a subquery, filter outside — while the DuckDB
    // oracle runs the NATIVE QUALIFY clause. Grading the rewrite against
    // the native clause proves the two frontends reach one semantics
    // (the sql_pivot CASE-vs-PIVOT discipline, in the other direction).
    // The rn <= 3 filter plans as WindowGroupLimit — per-partition top-k
    // heaps, never a global sort.
    Q("sql_qualify", Some(
      "SELECT c_mktsegment, c_custkey, bal2 FROM (" +
        "SELECT c_mktsegment, c_custkey, " +
        "CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal2 FROM customer) " +
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY c_mktsegment " +
        "ORDER BY bal2 DESC, c_custkey) <= 3 " +
        "ORDER BY c_mktsegment, c_custkey"),
      (s, d) => {
        registerViews(s, d)
        s.sql(
          "SELECT c_mktsegment, c_custkey, bal2 FROM (" +
            "SELECT c_mktsegment, c_custkey, bal2, " +
            "ROW_NUMBER() OVER (PARTITION BY c_mktsegment " +
            "ORDER BY bal2 DESC, c_custkey) AS rn FROM (" +
            "SELECT c_mktsegment, c_custkey, " +
            "CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal2 FROM customer)) " +
            "WHERE rn <= 3 ORDER BY c_mktsegment, c_custkey")
      }),

    // Deterministic TABLESAMPLE (round 13, VERDICT r12 item 3) — the
    // analyst sampling surface, made REPRODUCIBLE. MEASURED dialect
    // facts pinned here: Spark's native `TABLESAMPLE (p PERCENT)
    // REPEATABLE (seed)` is seed+PARTITION-LAYOUT dependent (a 50%
    // sample of a 20-row view returned 6 rows; a repartition changes
    // the kept set), and DuckDB's USING SAMPLE runs its own PRNG — so
    // NO native sampler can be cross-engine row-graded. The graded
    // sample is therefore the hash-GATE form production pipelines use
    // for reshuffle-proof samples (the llm_sample_* discipline on the
    // SQL frontend): keep rows with hash32('ts:' || key) % 10 < 2 — an
    // exact 20%-expectation Bernoulli draw that is bit-identical on
    // both engines and under any partitioning. The Spark side still
    // pipes the scan through the native `TABLESAMPLE (100 PERCENT)
    // REPEATABLE (42)` clause, so the parse and SampleExec operator are
    // exercised without perturbing the graded rows.
    Q("sql_tablesample", Some(
      "SELECT o_orderkey, cents FROM (SELECT o_orderkey, " +
        "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents, " +
        graft.Det.sqlHash32("'ts:' || CAST(o_orderkey AS VARCHAR)") +
        " % 10 AS h FROM orders) WHERE h < 2 ORDER BY o_orderkey"),
      (s, d) => {
        registerViews(s, d)
        // Spark-SQL spelling of Det.hash32 (little-endian first 4 md5
        // bytes — the portable draw; equality with the oracle's
        // md5_number_upper & mask form is pinned by DetLemmaSpec's
        // hash32 law)
        val m = "md5(CONCAT('ts:', CAST(o_orderkey AS STRING)))"
        val h32 = s"CAST(CONV(CONCAT(SUBSTRING($m,7,2), SUBSTRING($m,5,2), " +
          s"SUBSTRING($m,3,2), SUBSTRING($m,1,2)), 16, 10) AS BIGINT)"
        s.sql(
          "SELECT o_orderkey, cents FROM (SELECT o_orderkey, " +
            "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents, " +
            s"$h32 % 10 AS h " +
            "FROM orders TABLESAMPLE (100 PERCENT) REPEATABLE (42)) " +
            "WHERE h < 2 ORDER BY o_orderkey")
      }))
}
