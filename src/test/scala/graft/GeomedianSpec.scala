package graft

import graft.functions.Geomedian

/** Property tests for the non-SQL-expressible geomedian (SURVEY §6.2):
  * permutation invariance, 1-D reduction to the median interval, and the
  * defining minimizer property against perturbations. Seeded generators
  * (no scalatestplus bridge in the offline cache). */
class GeomedianSpec extends SparkSpec {

  private def cost(points: Seq[Array[Double]], v: Array[Double]): Double =
    points.map(p => math.sqrt(p.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum)).sum

  private def randomSets(seed: Int, trials: Int): Seq[List[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    (1 to trials).map { _ =>
      val n = 3 + rnd.nextInt(18)
      List.fill(n)(Array.fill(4)(rnd.nextDouble() * 20 - 10))
    }
  }

  test("permutation invariance") {
    randomSets(seed = 42, trials = 50).foreach { pts =>
      val a = Geomedian.weiszfeld(pts)
      val b = Geomedian.weiszfeld(pts.reverse)
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-6) }
    }
  }

  test("minimizer property: no axis perturbation improves the cost") {
    randomSets(seed = 7, trials = 50).foreach { pts =>
      val v = Geomedian.weiszfeld(pts)
      val c0 = cost(pts, v)
      for (dim <- v.indices; eps <- Seq(-0.05, 0.05)) {
        val w = v.clone(); w(dim) += eps
        assert(cost(pts, w) >= c0 - 1e-7)
      }
    }
  }

  test("1-D geomedian lies in the median interval") {
    val rnd = new scala.util.Random(13)
    (1 to 50).foreach { _ =>
      val xs = List.fill(3 + rnd.nextInt(22))(rnd.nextDouble() * 200 - 100)
      val gm = Geomedian.weiszfeld(xs.map(Array(_)))(0)
      val sorted = xs.sorted
      val (lo, hi) =
        if (sorted.size % 2 == 1) { val m = sorted(sorted.size / 2); (m, m) }
        else (sorted(sorted.size / 2 - 1), sorted(sorted.size / 2))
      // fixed 20 iterations converge to ~1e-3 of the interval, not machine eps
      assert(gm >= lo - 1e-2 && gm <= hi + 1e-2)
    }
  }

  test("eo_geomedian query runs and groups by label") {
    val rows = SparkEntry.queries("eo_geomedian")(spark, sfDir).collect()
    assert(rows.length == 10) // labels 0..9
    assert(rows.map(_.getInt(0)).toSeq == (0 until 10))
  }

  test("the grid-quantized relational iteration tracks the classic Weiszfeld") {
    // round 6 made the graded key a 1e-10-grid-quantized K-round
    // Weiszfeld (K = EO.GeomedianRounds; engine-exact => oracle-graded);
    // it must stay within
    // iteration-convergence distance of the float-precision classic on
    // every label's first four dimensions
    val got = SparkEntry.queries("eo_geomedian")(spark, sfDir).collect()
      .map(r => r.getInt(0) -> Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val byLabel = Tables.embeddings(spark, sfDir).collect()
      .map(r => (r.getInt(2), r.getSeq[Float](1).toArray.map(_.toDouble)))
      .groupBy(_._1)
    byLabel.foreach { case (label, vs) =>
      val classic = graft.functions.Geomedian.weiszfeld(vs.map(_._2).toSeq)
      val quantized = got(label).map(_ / 1e6)
      (0 until 4).foreach { i =>
        assert(math.abs(quantized(i) - classic(i)) < 1e-3,
          s"label=$label dim=$i quantized=${quantized(i)} classic=${classic(i)}")
      }
    }
  }
}
