package graft.operators

import org.apache.spark.sql.functions._

import graft.{Det, Q, Tables => T}
import Det._

/** SURVEY.md §3.6–§3.7: sorts / limits / top-k and set operations.
  *
  * `limit_topk` must plan as TakeOrderedAndProject (per-partition heap +
  * driver merge — no global sort, the only sane global-top-k at 100 TB).
  * Set ops shuffle on the full row; both inputs here are projections of the
  * same scan, so Catalyst reuses the exchange where possible.
  */
object SortSet {

  val all: Seq[Q] = Seq(

    Q("sort_multi", Some(
      "SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS st, o_totalprice FROM orders " +
        "ORDER BY st ASC NULLS FIRST, o_totalprice DESC, o_orderkey"),
      (s, d) =>
        T.orders(s, d)
          .select(
            col("o_orderkey"),
            expr("NULLIF(o_orderstatus, 'P')").as("st"),
            col("o_totalprice"))
          .orderBy(col("st").asc_nulls_first, col("o_totalprice").desc, col("o_orderkey"))),

    Q("limit_topk", Some(
      "SELECT o_orderkey, " + sqlS2("o_totalprice") + " AS top_price " +
        "FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"),
      (s, d) =>
        T.orders(s, d)
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)
          .select(col("o_orderkey"), s2(col("o_totalprice")).as("top_price"))),

    // LIMIT/OFFSET pagination (round 12, third wave) [SPARK-28330 /
    // SPARK-39159: the OFFSET clause and Dataset.offset, 3.4+] — the
    // keyset-less paging surface every API backend runs: page 5 of the
    // price-ranked orders, i.e. rows 41-50 under a TOTAL order (the
    // (price, key) tie-break makes the page set-stable, so the graded
    // hash pins the offset law itself — an off-by-one page boundary or
    // an offset applied before the sort changes the rows). Spark plans
    // a global-sort + CollectLimit with the offset folded in; at scale
    // the same query should become keyset pagination (WHERE key >
    // last_seen ORDER BY LIMIT), which join_asof-style predicates
    // already express — this key grades the OFFSET semantics, not the
    // recommended access path.
    Q("limit_offset", Some(
      "SELECT o_orderkey, " + sqlS2("o_totalprice") + " AS price2 " +
        "FROM orders ORDER BY o_totalprice DESC, o_orderkey " +
        "LIMIT 10 OFFSET 40"),
      (s, d) =>
        T.orders(s, d)
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .offset(40)
          .limit(10)
          .select(col("o_orderkey"), s2(col("o_totalprice")).as("price2"))),

    Q("set_union_all", Some(
      "SELECT o_custkey FROM orders WHERE o_totalprice > 300000 " +
        "UNION ALL SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT' " +
        "ORDER BY o_custkey"),
      (s, d) => {
        val o = T.orders(s, d)
        o.where(col("o_totalprice") > 300000).select("o_custkey")
          .unionByName(o.where(col("o_orderpriority") === "1-URGENT").select("o_custkey"))
          .orderBy("o_custkey")
      }),

    // Schema-ALIGNED union with missing columns (round 10, fifth wave):
    // unionByName(allowMissingColumns = true) — the union every
    // multi-vintage ingest actually needs (positional union silently
    // misassigns when two extracts order columns differently; a column
    // absent from one side must arrive as NULL, not an error). One side
    // carries (custkey, price_cents), the other (custkey, prio) with
    // the columns DECLARED in a different order — the graded values
    // prove the match was by NAME. Oracle = the explicit NULL-padded
    // UNION ALL. scan_merge_schema grades the storage-side analogue;
    // this grades the in-memory operator.
    Q("set_union_by_name", Some(
      "WITH u AS (SELECT o_custkey, CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents, " +
        "CAST(NULL AS VARCHAR) AS prio FROM orders WHERE o_totalprice > 300000 " +
        "UNION ALL SELECT o_custkey, CAST(NULL AS BIGINT), o_orderpriority " +
        "FROM orders WHERE o_orderpriority = '1-URGENT') " +
        "SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(COUNT(price_cents) AS BIGINT) AS n_priced, " +
        "CAST(SUM(price_cents) AS BIGINT) AS sum_cents, " +
        "CAST(COUNT(prio) AS BIGINT) AS n_prio " +
        "FROM u GROUP BY o_custkey ORDER BY o_custkey"),
      (s, d) => {
        val o = T.orders(s, d)
        val a = o.where(col("o_totalprice") > 300000)
          .select(col("o_custkey"), s2(col("o_totalprice")).as("price_cents"))
        // deliberately DIFFERENT column order: name alignment is the claim
        val b = o.where(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderpriority").as("prio"), col("o_custkey"))
        a.unionByName(b, allowMissingColumns = true)
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n"),
            count(col("price_cents")).as("n_priced"),
            sum(col("price_cents")).as("sum_cents"),
            count(col("prio")).as("n_prio"))
          .orderBy("o_custkey")
      }),

    Q("set_union", Some(
      "SELECT o_custkey FROM orders WHERE o_totalprice > 300000 " +
        "UNION SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT' " +
        "ORDER BY o_custkey"),
      (s, d) => {
        val o = T.orders(s, d)
        o.where(col("o_totalprice") > 300000).select("o_custkey")
          .unionByName(o.where(col("o_orderpriority") === "1-URGENT").select("o_custkey"))
          .distinct()
          .orderBy("o_custkey")
      }),

    Q("set_intersect", Some(
      "SELECT o_custkey FROM orders WHERE o_totalprice > 200000 " +
        "INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' " +
        "ORDER BY o_custkey"),
      (s, d) => {
        val o = T.orders(s, d)
        o.where(col("o_totalprice") > 200000).select("o_custkey")
          .intersect(o.where(col("o_orderstatus") === "F").select("o_custkey"))
          .orderBy("o_custkey")
      }),

    Q("set_intersect_all", Some(
      "SELECT o_custkey FROM orders WHERE o_totalprice > 200000 " +
        "INTERSECT ALL SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' " +
        "ORDER BY o_custkey"),
      (s, d) => {
        val o = T.orders(s, d)
        o.where(col("o_totalprice") > 200000).select("o_custkey")
          .intersectAll(o.where(col("o_orderstatus") === "F").select("o_custkey"))
          .orderBy("o_custkey")
      }),

    Q("set_except", Some(
      "SELECT o_custkey FROM orders WHERE o_totalprice > 200000 " +
        "EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' " +
        "ORDER BY o_custkey"),
      (s, d) => {
        val o = T.orders(s, d)
        o.where(col("o_totalprice") > 200000).select("o_custkey")
          .except(o.where(col("o_orderstatus") === "F").select("o_custkey"))
          .orderBy("o_custkey")
      }),

    Q("set_except_all", Some(
      "SELECT o_custkey FROM orders WHERE o_totalprice > 200000 " +
        "EXCEPT ALL SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' " +
        "ORDER BY o_custkey"),
      (s, d) => {
        val o = T.orders(s, d)
        o.where(col("o_totalprice") > 200000).select("o_custkey")
          .exceptAll(o.where(col("o_orderstatus") === "F").select("o_custkey"))
          .orderBy("o_custkey")
      }))
}
