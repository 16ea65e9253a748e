package graft

import org.apache.spark.sql.functions._

import graft.analytics._

/** The parameterized analytics API (analytics/Analytics.scala): each test
  * expresses a NEW query — different steps, period, thresholds, zone —
  * in a handful of lines against the library, and checks it against an
  * independent in-memory mirror. The graded keys win_funnel /
  * win_retention / llm_quality_filter / eo_zonal_stats are thin
  * instantiations of the same functions, so the oracle gate already
  * pins the canonical parameterizations. */
class AnalyticsSpec extends SparkSpec {

  private lazy val ev: Seq[(Long, Long, String)] =
    Tables.events(spark, sfDir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("t"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

  test("a NEW two-step funnel (click -> purchase) in three lines") {
    val got = Funnels.funnel(
      Tables.events(spark, sfDir).select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("t")),
      "user_id", "event_type", "t", Seq("click", "purchase"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getInt(3)))).toMap
    val byUser = ev.groupBy(_._1)
    val expect = byUser.flatMap { case (u, es) =>
      val clicks = es.filter(_._3 == "click").map(_._2)
      if (clicks.isEmpty) None else {
        val tc = clicks.min
        val purch = es.filter(e => e._3 == "purchase" && e._2 > tc).map(_._2)
        Some(u -> ((tc, purch.minOption, if (purch.nonEmpty) 2 else 1)))
      }
    }
    assert(got == expect, "two-step funnel")
  }

  test("a NEW daily retention (86400 s periods) holds its invariants") {
    val rows = Retention.cohortRetention(
      Tables.events(spark, sfDir), "user_id", "ts", 86400L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // offset-0 cell is the cohort itself: retention exactly 1e6
    rows.filter(_._2 == 0).foreach { case (_, _, na, cs, r6) =>
      assert(na == cs && r6 == 1000000L)
    }
    // mirror one cohort cell exactly
    val daily = ev.map(e => (e._1, e._2 / 86400)).distinct
    val cohort = daily.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cells = daily.groupBy(p => (cohort(p._1), p._2 - cohort(p._1)))
      .view.mapValues(_.map(_._1).distinct.size.toLong).toMap
    rows.foreach { case (c, o, na, cs, r6) =>
      assert(na == cells((c, o.toLong)), s"cell ($c,$o)")
      assert(cs == cells((c, 0L)), s"cohort $c size")
      assert(r6 == math.floor(na.toDouble / cs * 1e6 + 0.5).toLong, s"cell ($c,$o) share")
    }
  }

  test("a NEW stricter quality filter only tightens the kept set") {
    val base = QualityFilters.c4Filter(Tables.documents(spark, sfDir),
      "doc_id", "text", Seq("the", "a", "of", "and", "to", "in", "is", "on"),
      20L, 600000L, 100000L, 200000L)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    val strict = QualityFilters.c4Filter(Tables.documents(spark, sfDir),
      "doc_id", "text", Seq("the", "a", "of", "and", "to", "in", "is", "on"),
      40L, 500000L, 200000L, 150000L)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(base.keySet == strict.keySet, "same doc domain")
    strict.foreach { case (id, k) =>
      assert(k <= base(id), s"doc $id: strict keep implies base keep")
    }
    assert(strict.values.sum < base.values.sum, "strictness bites")
  }

  test("a NEW cosine top-k (query vec 7, k=5) in three lines") {
    val emb = Tables.embeddings(spark, sfDir)
    val got = Similarity.cosineTopK(
      emb.where(col("vec_id") =!= 7), emb.where(col("vec_id") === 7),
      "embedding", "vec_id", 5)
      .select(col("vec_id"), col("c"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def sdot(a: Seq[Float], b: Seq[Float]): Long =
      a.zip(b).map { case (x, y) =>
        math.floor(x.toDouble * y.toDouble * 1e14 + 0.5).toLong
      }.sum
    val q = vecs(7L)
    val expect = vecs.view.filterKeys(_ != 7L).map { case (id, v) =>
      (id, (sdot(v, q).toDouble / 1e14) /
        (math.sqrt(sdot(v, v).toDouble / 1e14) * math.sqrt(sdot(q, q).toDouble / 1e14)))
    }.toSeq.sortBy { case (id, c) => (-c, id) }.take(5)
    assert(got.toSeq == expect, "top-5 by exact scaled-long cosine")
  }

  test("a NEW z-score grouping (by event_type) matches a scalar mirror") {
    val got = Anomalies.groupZscore(
      Tables.events(spark, sfDir), "event_type", "event_id", "value")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    def s2v(x: Double) = math.floor(x * 100 + 0.5).toLong
    def s6v(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val rows = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val mirror = rows.groupBy(_._2).toSeq.flatMap { case (_, es) =>
      val vis = es.map(e => s2v(e._3))
      val n = vis.length.toDouble
      val sv = vis.sum.toDouble
      val svv = vis.map(v => v * v).sum.toDouble
      val num = n * svv - sv * sv
      es.toSeq.map { e =>
        val vi = s2v(e._3)
        e._1 -> (if (vis.length < 2 || num <= 0.0) None
          else Some(s6v((vi - sv / n) / math.sqrt(num / (n * (n - 1.0))))))
      }
    }.toMap
    assert(got == mirror, "per-type z-scores equal the scalar mirror")
    assert(got.values.exists(_.isDefined), "nondegenerate groups exist")
  }

  test("a NEW pagerank (3 rounds, d=0.5, 1e6 grid) matches a scalar mirror") {
    val e = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .count().withColumnRenamed("count", "w")
    // N=25 nations: r0 = 1e6/25 = 40000, base = 0.5*1e6/25 = 20000.0
    val got = Graphs.pagerank(e, "src", "dst", "w",
      Tables.nation(spark, sfDir), "n_nationkey", 3, 0.5, 20000.0, 40000L)
      .collect().map(r => r.getAs[Number]("v").longValue -> r.getLong(1)).toMap

    val ew = e.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val wt = ew.groupBy(_._1._1).map { case (s, xs) => s -> xs.values.sum }
    val nodes = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long")).collect().map(_.getLong(0))
    var r = nodes.map(_ -> 40000L).toMap
    for (_ <- 1 to 3) {
      val contrib = ew.toSeq.map { case ((s, d), w) =>
        d -> math.floor(r(s).toDouble * w / wt(s) + 0.5).toLong
      }.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      r = nodes.map(v => v ->
        math.floor(20000.0 + 0.5 * contrib.getOrElse(v, 0L).toDouble + 0.5).toLong).toMap
    }
    assert(got == r, "parameterized pagerank equals the scalar mirror")
  }

  test("a NEW connected-components rule (2x-mean edges) matches union-find") {
    val e = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .count().withColumnRenamed("count", "w")
      .where(col("src") =!= col("dst"))
    val ew = e.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val mu = ew.values.sum.toDouble / ew.size
    val strong = e.where(col("w") >= lit(2.0) * lit(mu))
    val got = Graphs.connectedComponents(
      Tables.nation(spark, sfDir), "n_nationkey", strong, "src", "dst")
      .collect().map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap

    val ue = ew.filter(_._2 >= 2.0 * mu).keySet
      .map { case (s, d) => (math.min(s, d), math.max(s, d)) }
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r2 = find(p); parent(x) = r2; r2 }
    }
    ue.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    got.foreach { case (v, c) =>
      val want = if (parent.contains(v)) find(v) else v
      assert(c == want, s"node $v: component $c vs union-find root $want")
    }
  }

  test("MinHash.candidates instantiates llm_minhash exactly; blocking bites") {
    val docs = Tables.documents(spark, sfDir)
    val api = MinHash.candidates(docs, "doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val graded = SparkEntry.queries("llm_minhash")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(api == graded, "API instantiation == the graded pair set")
    // a NEW blocking rule (single global block) can only ADD candidates
    val global = MinHash.candidates(docs.withColumn("one", lit("x")),
      "doc_id", "text", "one")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(api.subsetOf(global), "coarser blocking is a superset")
  }

  test("a NEW zonal rollup over a different zone key in two lines") {
    val got = Zonal.stats(Tables.events(spark, sfDir),
      zone = col("event_type"), value = col("value"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val vals = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    vals.groupBy(_._1).foreach { case (ty, rows) =>
      val xs = rows.map(_._2)
      def s6(x: Double) = math.floor(x * 1e6 + 0.5).toLong
      val sum6 = xs.map(s6).sum
      val (n, mn, mx, mean, sm) = got(ty)
      assert(n == xs.size.toLong && mn == s6(xs.min) && mx == s6(xs.max), s"$ty extrema")
      assert(sm == sum6, s"$ty sum")
      assert(mean == math.floor(sum6.toDouble / xs.size + 0.5).toLong, s"$ty mean")
    }
  }
}
