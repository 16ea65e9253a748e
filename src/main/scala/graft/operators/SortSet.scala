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
