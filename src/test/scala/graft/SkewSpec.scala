package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Skew-salting rewrites must be result-identical to the direct ops on a
  * deliberately skewed dataset (90% of rows on one key). */
class SkewSpec extends SparkSpec {

  // lineitem with l_suppkey skewed: map most rows onto supplier 1
  private def skewed = Tables.lineitem(spark, sfDir)
    .withColumn("k", when(col("l_orderkey") % 10 < 9, 1L).otherwise(col("l_suppkey")))

  test("salted aggregation equals direct aggregation on skewed keys") {
    val direct = skewed.groupBy("k")
      .agg(sum(col("l_quantity")).as("sq"), count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("mn"), max(col("l_extendedprice")).as("mx"))
      .orderBy("k").collect()
    val salted = Skew.saltedAgg(skewed, Seq("k"), col("l_orderkey"), saltN = 8,
      Seq("sq" -> (col("l_quantity"), "sum"), "n" -> (lit(1), "count"),
        "mn" -> (col("l_extendedprice"), "min"), "mx" -> (col("l_extendedprice"), "max")))
      .orderBy("k").collect()
    assert(salted.toSeq == direct.toSeq)
    // the hot key really is spread: >1 salt bucket for k=1
    val partials = skewed.withColumn("__salt",
        pmod(xxhash64(col("l_orderkey")), lit(8)))
      .where(col("k") === 1).select("__salt").distinct().count()
    assert(partials > 1, "salt did not spread the hot key")
  }

  test("salted aggregation is result-identical on arbitrary generated corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(300, Gen.zip(
      Gen.chooseNum(0L, 4L), Gen.chooseNum(-1000L, 1000L)))
    // deterministic seeds — reproducible failures
    (1 to 5).foreach { s =>
      val rows = gen(Gen.Parameters.default, Seed(s.toLong)).get
      import spark.implicits._
      val df = rows.toDF("k", "v")
      val direct = df.groupBy("k")
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"),
          min(col("v")).as("mn"), max(col("v")).as("mx"))
        .orderBy("k").collect().toSeq
      val salted = Skew.saltedAgg(df, Seq("k"), col("v"), saltN = 1 + s,
        Seq("sv" -> (col("v"), "sum"), "n" -> (lit(1), "count"),
          "mn" -> (col("v"), "min"), "mx" -> (col("v"), "max")))
        .orderBy("k").collect().toSeq
      assert(salted == direct, s"seed $s diverged")
    }
  }

  test("salted join equals direct join and preserves multiplicity") {
    val build = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("dk"), col("s_name"))
    val direct = skewed.select("k", "l_orderkey", "l_linenumber")
      .join(build, col("k") === col("dk"))
      .select("k", "l_orderkey", "l_linenumber", "s_name")
      .orderBy("k", "l_orderkey", "l_linenumber").collect()
    val salted = Skew.saltedEquiJoin(
      skewed.select("k", "l_orderkey", "l_linenumber"), build,
      "k", "dk", "l_orderkey", salts = 8)
      .select("k", "l_orderkey", "l_linenumber", "s_name")
      .orderBy("k", "l_orderkey", "l_linenumber").collect()
    assert(salted.length == direct.length, "row multiplicity changed")
    assert(salted.map(_.toSeq).toSeq == direct.map(_.toSeq).toSeq)
  }

  test("bloom prune keeps every matching fact row and actually prunes") {
    val dim = Tables.customer(spark, sfDir)
      .where(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val facts = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val pruned = Skew.bloomPrune(facts, dim, "o_custkey", "c_custkey")
    // no false negatives: every fact row whose key IS in the dim survives
    val matchingLost = facts.join(dim, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey")
      .exceptAll(pruned.join(dim, col("o_custkey") === col("c_custkey"))
        .select("o_orderkey"))
      .count()
    assert(matchingLost == 0, s"bloom dropped $matchingLost matching rows")
    // and it prunes: BUILDING is ~1/5 of customers, FP rate ~(n*k/m)^k —
    // the candidate set must be well under the full fact table
    val total = facts.count(); val kept = pruned.count()
    assert(kept < total * 0.5, s"prune ineffective: kept $kept of $total")
  }
}
