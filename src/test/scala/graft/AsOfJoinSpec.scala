package graft

import org.apache.spark.sql.functions._

import graft.plans.AsOf

/** The native as-of operator: plan shape, agreement with the compositional
  * window formulation, and edge semantics. */
class AsOfJoinSpec extends SparkSpec {

  private def purchases = Tables.events(spark, sfDir)
    .where(col("event_type") === "purchase")
    .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))

  private def clicks = Tables.events(spark, sfDir)
    .where(col("event_type") === "click")
    .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))

  test("plans as AsOfJoinExec, not a window over an inequality join") {
    val df = AsOf.join(purchases, clicks, "p_user", "c_user", "p_ts", "c_ts", "c_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"native operator missing:\n$plan")
    assert(!plan.contains("Window"), "window stage should not exist")
  }

  test("matches the compositional row_number formulation (inner subset)") {
    val native = AsOf.join(purchases, clicks, "p_user", "c_user", "p_ts", "c_ts", "c_id")
      .where(col("c_id").isNotNull)
      .select(col("p_id"), col("c_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val compositional = SparkEntry.queries("join_asof")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == compositional)
  }

  test("left rows with no prior right row survive with nulls") {
    val rows = AsOf.join(purchases, clicks, "p_user", "c_user", "p_ts", "c_ts", "c_id")
      .collect()
    assert(rows.length == purchases.count())
    assert(rows.exists(_.isNullAt(3)), "expected at least one unmatched purchase")
  }

  test("left-side predicates push below the as-of join (AsOfPushDown rule)") {
    val df = AsOf.join(purchases, clicks, "p_user", "c_user", "p_ts", "c_ts", "c_id")
      .where(col("p_id") % 2 === 0)
    val optimized = df.queryExecution.optimizedPlan
    val asOf = optimized.collectFirst { case a: graft.plans.AsOfJoinPlan => a }.get
    // the filter must sit inside the join's left child, not above the join
    assert(asOf.left.toString.contains("p_id"),
      s"left-side filter not pushed:\n$optimized")
    val expect = AsOf.join(
      purchases.where(col("p_id") % 2 === 0), clicks,
      "p_user", "c_user", "p_ts", "c_ts", "c_id").collect().toSeq
    assert(df.collect().toSeq == expect)
  }

  test("null left keys null-extend instead of failing") {
    import spark.implicits._
    val l = Seq((Some(1L), 10L, 100L), (None, 11L, 101L))
      .toDF("lk", "lt", "l_payload")
    val r = Seq((1L, 9L, 7L)).toDF("rk", "rt", "rid")
    val out = AsOf.join(l, r, "lk", "rk", "lt", "rt", "rid")
      .orderBy(col("l_payload")).collect()
    assert(out.length == 2)
    assert(out(0).getLong(5) == 7L)   // matched row
    assert(out(1).isNullAt(3))        // null-key row survives, null-extended
  }

  test("tie on right time resolves to the largest tiebreak id") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L)).toDF("lk", "lt", "l_payload")
    val r = Seq((1L, 10L, 7L), (1L, 10L, 9L), (1L, 9L, 8L))
      .toDF("rk", "rt", "rid")
    val out = AsOf.join(l, r, "lk", "rk", "lt", "rt", "rid").collect()
    assert(out.length == 1)
    assert(out(0).getLong(5) == 9L) // rid of the tied-latest row
  }

  test("tolerance null-extends a latest-prior match that is too old") {
    import spark.implicits._
    val l = Seq((1L, 100L, 0L), (1L, 200L, 1L)).toDF("lk", "lt", "l_payload")
    val r = Seq((1L, 95L, 7L)).toDF("rk", "rt", "rid")
    // within 10 ticks: lt=100 matches (age 5); lt=200 does not (age 105)
    val out = AsOf.join(l, r, "lk", "rk", "lt", "rt", "rid",
        tolerance = Some(10L))
      .orderBy("l_payload").collect()
    assert(out(0).getLong(5) == 7L)
    assert(out(1).isNullAt(3), "stale match must null-extend under tolerance")
    // and without tolerance the stale row matches
    val unbounded = AsOf.join(l, r, "lk", "rk", "lt", "rt", "rid")
      .orderBy("l_payload").collect()
    assert(unbounded(1).getLong(5) == 7L)
  }
}
