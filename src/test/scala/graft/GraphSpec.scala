package graft

import org.apache.spark.sql.functions._

/** graph_pagerank semantics: the graded Spark loop must equal an
  * INDEPENDENT scalar re-implementation of the same quantized power
  * iteration run on the driver from the raw tables — same 1e-9 grid,
  * same floor points, zero Spark machinery. Catches any drift between
  * the loop, the broadcast joins and the documented algorithm. */
class GraphSpec extends SparkSpec {

  test("graph_pagerank equals a driver-side scalar power iteration") {
    val got = SparkEntry.queries("graph_pagerank")(spark, sfDir)
      .select(col("nationkey").cast("long"), col("rank9").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    def pairs(df: org.apache.spark.sql.DataFrame, a: String, b: String) =
      df.select(col(a).cast("long"), col(b).cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    val li = pairs(Tables.lineitem(spark, sfDir), "l_orderkey", "l_suppkey")
    val ord = pairs(Tables.orders(spark, sfDir), "o_orderkey", "o_custkey").toMap
    val cust = pairs(Tables.customer(spark, sfDir), "c_custkey", "c_nationkey").toMap
    val supp = pairs(Tables.supplier(spark, sfDir), "s_suppkey", "s_nationkey").toMap
    val nations = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long"))
      .collect().map(_.getLong(0)).sorted

    val w = li.groupBy { case (ok, sk) => (cust(ord(ok)), supp(sk)) }
      .map { case (k, xs) => k -> xs.size.toLong }
    val wt = w.groupBy(_._1._1).map { case (s, xs) => s -> xs.values.sum }

    var r = nations.map(_ -> 40000000L).toMap
    for (_ <- 1 to 5) {
      val s = w.toSeq
        .map { case ((src, dst), ww) =>
          dst -> math.floor(r(src).toDouble * ww / wt(src) + 0.5).toLong }
        .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).sum }
      r = nations.map(v =>
        v -> math.floor(6000000.0 + 0.85 * s.getOrElse(v, 0L).toDouble + 0.5).toLong).toMap
    }
    assert(got == r)
    // mass sanity: dangling drop only shrinks the total, never grows it
    assert(got.values.sum <= 1000000000L + nations.size)
    assert(got.values.forall(_ >= 6000000L))
  }

  test("graph_triangles equals a brute-force scalar recount") {
    val got = SparkEntry.queries("graph_triangles")(spark, sfDir)
      .select(col("nationkey").cast("long"), col("n_tri"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val e = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      .filter { case ((s, d), _) => s != d }
    val mu = e.values.sum.toDouble / e.size
    val ue = e.filter(_._2 >= 1.25 * mu).keySet
      .map { case (s, d) => (math.min(s, d), math.max(s, d)) }
    val nodes = ue.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val triCount = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (a, b) <- ue; (b2, c) <- ue if b2 == b && ue.contains((a, c))
    } { triCount(a) += 1; triCount(b) += 1; triCount(c) += 1 }
    got.foreach { case (v, n) => assert(n == triCount(v), s"nation $v") }
    assert(nodes.forall(got.contains))
  }

  test("graph_cc CONVERGED: labels equal union-find components (K >= diameter)") {
    // the graded contract only pins both engines to the same K rounds;
    // this asserts K actually sufficed on this corpus, so `component`
    // semantically IS the connected component, not a truncated label
    val got = SparkEntry.queries("graph_cc")(spark, sfDir)
      .select(col("nationkey").cast("long"), col("component"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val e = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      .filter { case ((s, d), _) => s != d }
    val mu = e.values.sum.toDouble / e.size
    val ue = e.filter(_._2 >= 3.0 * mu).keySet
      .map { case (s, d) => (math.min(s, d), math.max(s, d)) }
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    ue.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    got.foreach { case (v, lbl) =>
      val want = if (parent.contains(v)) find(v) else v
      assert(lbl == want, s"nation $v: label $lbl vs component root $want")
    }
  }

  test("graph_ktruss CONVERGED (K and K+1 agree) and equals a scalar peel") {
    def rows(k: Int) = operators.Graph.ktrussSupport(spark, sfDir, k)
      .select(col("a").cast("long"), col("b").cast("long"), col("supp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = rows(4)
    assert(got == rows(5), "peel reached its fixpoint within K rounds")

    // scalar mirror: mean-threshold undirected edges, T=4 peel to
    // fixpoint, final support over the survivors
    val e = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      .filter { case ((s, d), _) => s != d }
    val und = e.toSeq
      .map { case ((s, d), w) => (math.min(s, d), math.max(s, d)) -> w }
      .groupBy(_._1).map { case (k2, xs) => k2 -> xs.map(_._2).sum }
    val tot = und.values.sum
    val ne = und.size.toLong
    var edges = und.filter { case (_, w2) => w2 * ne >= tot }.keySet
    def support(es: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val adj = es.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k2, xs) => k2 -> xs.map(_._2).toSet }
      es.map(ed => ed -> (adj(ed._1) & adj(ed._2)).size.toLong).toMap
    }
    var done = false
    while (!done) {
      val keep = support(edges).filter(_._2 >= 4L).keySet
      done = keep == edges
      edges = keep
    }
    val expect = support(edges).map { case ((a, b), c) => (a, b, c) }.toSet
    assert(got == expect, "converged truss edges + supports match the mirror")
    assert(got.nonEmpty, "nontrivial truss on this corpus")
  }

  test("graph_closeness_pivot: estimates are bounded by the exact keys") {
    // The landmark estimate relaxes from a SUBSET of sources, so per node:
    // pivot distance-sum <= exact all-source sum, pivot count <= |V|-1,
    // and the pivot eccentricity is a LOWER bound on the exact one.
    val pivots = (0L to 24L)
      .filter(v => ((v * 2654435761L) % 4294967296L) % 5L == 0L).toSet
    assert(pivots == Set(0L, 11L, 12L, 13L, 24L), "hash pick is the pinned set")
    val est = SparkEntry.queries("graph_closeness_pivot")(spark, sfDir)
      .collect().map(r => r.getInt(0).toLong ->
        ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    val exactC = SparkEntry.queries("graph_closeness")(spark, sfDir)
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    val exactE = SparkEntry.queries("graph_ecc")(spark, sfDir)
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    assert(est.keySet == exactC.keySet, "every node gets an estimate")
    est.foreach { case (v, (nPiv, sumD, eccLb)) =>
      val expectedN = if (pivots(v)) pivots.size - 1L else pivots.size.toLong
      assert(nPiv == expectedN, s"node $v pivot count")
      assert(sumD <= exactC(v), s"node $v pivot sum exceeds exact sum")
      assert(eccLb <= exactE(v), s"node $v ecc bound exceeds exact ecc")
    }
    // Pivots see each other symmetrically: a pivot's own estimate row uses
    // the same converged matrix, so its ecc_lb must be positive on this
    // connected corpus.
    pivots.foreach(p => assert(est(p)._3 > 0L, s"pivot $p reaches others"))
  }

  test("graph_betweenness_pivot equals a scalar Brandes-with-pivots mirror") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("graph_betweenness_pivot")(spark, sfDir)
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    // rebuild the mutual-top-4 undirected graph scalar-side (the
    // graph_ktruss mirror discipline)
    val e = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      .filter { case ((a, b), _) => a != b }
    // .toSeq before flatMap: flatMapping a Map with a pair-valued body
    // would re-collect into a Map and silently dedupe by source key
    val top4 = e.groupBy(_._1._1).toSeq.flatMap { case (_, xs) =>
      xs.toSeq.sortBy { case ((_, dst), w) => (-w, dst) }.take(4)
        .map { case ((a, b), _) => (a, b) }
    }.toSet
    val und = top4.filter { case (a, b) => top4.contains((b, a)) }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val adj = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k2, xs) => k2 -> xs.map(_._2).toSet }
    def hud(s2: Long, n2: Long): Long = Math.floorDiv(2 * s2 + n2, 2 * n2)
    val pivots = (0L to 24L)
      .filter(v => ((v * 2654435761L) % 4294967296L) % 5L == 0L)
    val K = 8
    val bc = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    pivots.foreach { s0 =>
      // level-synchronous BFS with path counts, capped at K hops
      val dist = collection.mutable.Map(s0 -> 0)
      val sig = collection.mutable.Map(s0 -> 1L)
      var frontier = Set(s0)
      var lv = 0
      while (frontier.nonEmpty && lv < K) {
        lv += 1
        val next = collection.mutable.Map.empty[Long, Long]
        frontier.foreach(u => adj.getOrElse(u, Set.empty).foreach { w =>
          if (!dist.contains(w)) next(w) = next.getOrElse(w, 0L) + sig(u)
        })
        next.foreach { case (w, sg) => dist(w) = lv; sig(w) = sg }
        frontier = next.keySet.toSet
      }
      // integer-grid backward accumulation, deepest level first
      val d6 = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      ((K - 1) to 1 by -1).foreach { lev =>
        dist.filter(_._2 == lev).keys.foreach { u =>
          val terms = adj.getOrElse(u, Set.empty).toSeq
            .filter(w => dist.get(w).contains(lev + 1))
            .map(w => hud(sig(u) * (1000000L + d6(w)), sig(w)))
          d6(u) = terms.sum
        }
      }
      dist.foreach { case (v, dd) => if (dd >= 1) bc(v) += d6(v) }
    }
    val expect = (0L to 24L).map(v => v -> bc(v)).toMap
    assert(got == expect, s"got $got\nexpect $expect")
    assert(got.values.exists(_ > 0L), "nontrivial centrality on this corpus")
  }

  test("graph_louvain_contract equals a scalar phase-2 mirror over the moved partition") {
    import org.apache.spark.sql.functions._
    // phase-1 partition straight from the graded move key
    val comm = SparkEntry.queries("graph_louvain_move")(spark, sfDir)
      .collect().map(r => r.getInt(0).toLong -> r.getLong(2)).toMap
    // scalar mutual-top-4 undirected edges (the Brandes-mirror recipe)
    val e = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      .filter { case ((a, b), _) => a != b }
    val top4 = e.groupBy(_._1._1).toSeq.flatMap { case (_, xs) =>
      xs.toSeq.sortBy { case ((_, dst), w) => (-w, dst) }.take(4)
        .map { case ((a, b), _) => (a, b) }
    }.toSet
    val und = top4.filter { case (a, b) => top4.contains((b, a)) }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    // contraction: super-edges with self-loops for intra weight
    val se = und.toSeq.groupBy { case (a, b) =>
      val (ca, cb) = (comm(a), comm(b))
      (math.min(ca, cb), math.max(ca, cb))
    }.map { case (k2, xs) => k2 -> xs.length.toLong }
    val mw = se.values.sum
    val nodes2 = comm.values.toSet
    val nbW = se.toSeq.filter { case ((a, b), _) => a != b }
      .flatMap { case ((a, b), w) => Seq((a, b) -> w, (b, a) -> w) }.toMap
    val selfW = se.collect { case ((a, b), w) if a == b => a -> w }
    val k = nodes2.map(i => i ->
      (nbW.collect { case ((x, _), w) if x == i => w }.sum +
        2 * selfW.getOrElse(i, 0L))).toMap
    val expect = nodes2.toSeq.sorted.map { i =>
      val cands = nbW.collect { case ((x, j), w) if x == i =>
        j -> (2 * mw * w - k(j) * k(i))
      }.toSeq
      val (c, g) =
        if (cands.isEmpty) (i, 0L)
        else cands.minBy { case (j, gg) => (-gg, j) }
      (i, k(i), selfW.getOrElse(i, 0L),
        if (g > 0) c else i, math.max(g, 0L))
    }
    val got = SparkEntry.queries("graph_louvain_contract")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect, s"got $got\nexpect $expect")
    // conservation: strengths sum to twice the total super-edge weight,
    // which equals the original undirected edge count
    assert(k.values.sum == 2 * mw && mw == und.size.toLong)
  }

  test("graph_mst_boruvka equals a scalar Kruskal union-find MST") {
    // independent mirror: Kruskal (sort + union-find), NOT the engines'
    // Borůvka hooking schedule — unique costs make the MST itself unique,
    // so the two algorithms must agree edge-for-edge
    val e = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(t => t._1 != t._2)
      .groupBy(t => (math.min(t._1, t._2), math.max(t._1, t._2)))
      .map { case ((x, y), ts) =>
        (x, y, ts.map(_._3).sum * 10000 + x * 100 + y)
      }.toSeq
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(v: Long): Long = {
      val p = parent.getOrElse(v, v)
      if (p == v) v else { val r = find(p); parent(v) = r; r }
    }
    val mst = e.sortBy(_._3).filter { case (x, y, _) =>
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) { parent(rx) = ry; true } else false
    }
    val got = SparkEntry.queries("graph_mst_boruvka")(spark, sfDir).collect()
      .map(r => (r.getInt(0).toLong, r.getInt(1).toLong, r.getLong(2))).toSeq
    assert(got.nonEmpty && got == mst.sortBy(_._3),
      s"got ${got.take(4)}…\nkruskal ${mst.take(4)}…")
    // spanning: |V_touched| - #components edges, acyclic by union-find
    val vs = e.flatMap(t => Seq(t._1, t._2)).distinct
    val comps = vs.map(find).distinct.size
    assert(got.size == vs.size - comps)
  }

  test("graph_dag_layers equals a scalar topological DP + transitive closure") {
    // independent mirror: longest-path DP in id order (valid topological
    // order since every DAG edge goes low→high) + a closure for the
    // ancestor census — NOT the engines' max-plus doubling schedule
    val dag = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(t => t._1 != t._2)
      .map(t => (math.min(t._1, t._2), math.max(t._1, t._2)))
      .distinct.toSeq
    val nations = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long")).collect().map(_.getLong(0))
      .sorted.toSeq
    val inEdges = dag.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val layer = scala.collection.mutable.Map.empty[Long, Long]
    val anc = scala.collection.mutable.Map.empty[Long, Set[Long]]
    for (v <- nations) { // id order IS a topological order here
      val preds = inEdges.getOrElse(v, Seq.empty)
      layer(v) = if (preds.isEmpty) 0L
        else preds.map(u => layer(u) + 1).max
      anc(v) = preds.toSet ++ preds.flatMap(u => anc(u))
    }
    val expect = nations.map(v => (v, layer(v), anc(v).size.toLong))
    val got = SparkEntry.queries("graph_dag_layers")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"got ${got.take(5)}…\nexpect ${expect.take(5)}…")
    // non-degenerate: sources exist and at least one chain is deep
    assert(got.exists(_._2 == 0L) && got.exists(_._2 >= 2L))
  }

  test("graph_simrank equals a scalar quantized SimRank mirror; scores spread") {
    // independent mirror: in-memory K=3 SimRank over the mutual-top-4
    // graph with the identical halfUpDiv quantization per round
    val e = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(t => t._1 != t._2)
    val top4 = e.groupBy(_._1).toSeq.flatMap { case (src, es) =>
      es.sortBy(t => (-t._3, t._2)).take(4).map(t => (src, t._2))
    }.toSet
    val ue = top4.filter { case (a, b) => top4((b, a)) }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val sym = ue.toSeq.flatMap(p => Seq(p, p.swap))
    val inN = sym.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    def hud(s: Long, n: Long): Long = {
      val (a, b) = (2 * s + n, 2 * n)
      ((a - math.floorMod(a, b)).toDouble / b.toDouble).toLong
    }
    val nodes = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long")).collect().map(_.getLong(0)).sorted
    var s6m = nodes.flatMap(a => nodes.map(b =>
      (a, b) -> (if (a == b) 1000000L else 0L))).toMap
    for (_ <- 1 to 3) {
      s6m = nodes.flatMap(a => nodes.map { b =>
        val v = if (a == b) 1000000L
        else (inN.get(a), inN.get(b)) match {
          case (Some(ia), Some(ib)) =>
            hud(4 * ia.flatMap(i => ib.map(j => s6m((i, j)))).sum,
              5 * ia.size.toLong * ib.size.toLong)
          case _ => 0L
        }
        (a, b) -> v
      }).toMap
    }
    val expect = nodes.flatMap(a => nodes.filter(_ > a).map(b => (a, b, s6m((a, b)))))
      .filter(_._3 > 0L).sortBy(t => (t._1, t._2)).toSeq
    val got = SparkEntry.queries("graph_simrank")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"got ${got.take(4)}…\nexpect ${expect.take(4)}…")
    // discriminative on the sparse graph (the complete digraph was
    // measured uniform — the reason the key runs on mutual-top-4)
    assert(got.nonEmpty && got.map(_._3).distinct.size > 1)
  }

  test("graph_katz equals a scalar attenuated path-count mirror") {
    val e = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(t => t._1 != t._2)
    val top4 = e.groupBy(_._1).toSeq.flatMap { case (src, es) =>
      es.sortBy(t => (-t._3, t._2)).take(4).map(t => (src, t._2))
    }.toSet
    val de = top4.filter { case (a, b) => top4((b, a)) }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toSeq.flatMap(p => Seq(p, p.swap))
    val nodes = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long")).collect().map(_.getLong(0)).sorted
    val outE = de.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var p = nodes.map(_ -> 1L).toMap
    val perK = (1 to 4).map { _ =>
      val nxt = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      p.foreach { case (u, c) =>
        outE.getOrElse(u, Seq.empty).foreach(v => nxt(v) += c) }
      p = nxt.toMap
      p
    }
    val expect = nodes.map { v =>
      val cs = perK.map(_.getOrElse(v, 0L))
      (v, cs(0), cs(3), cs(0) * 512 + cs(1) * 64 + cs(2) * 8 + cs(3))
    }.toSeq
    val got = SparkEntry.queries("graph_katz")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect, s"got ${got.take(4)}…\nexpect ${expect.take(4)}…")
    // attenuation genuinely ranks on the sparse graph: more than two
    // score levels (the complete digraph was measured two-valued)
    assert(got.map(_._4).distinct.size > 2)
  }
}
