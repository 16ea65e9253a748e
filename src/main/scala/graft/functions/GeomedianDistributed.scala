package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The 100 TB geomedian path (SURVEY §8.3): Weiszfeld as K fixed map-reduce
  * rounds instead of collect-per-group.
  *
  * The v1 [[GeomedianAgg]] buffers every vector of a group — fine when
  * groups are label-sized, impossible when a group is a pixel's multi-year
  * time series across a 100 TB archive. Here cross-round state is O(groups
  * x dim):
  *
  *   1. round 0: per-group centroid (one partially-aggregated reduce);
  *   2. each round: broadcast current estimates v_g; one pass maps each
  *      vector x to (x / ||x - v_g||, 1 / ||x - v_g||) and reduces
  *      elementwise per group (map-side combine via reduceGroups, one
  *      shuffle on the group key);
  *   3. driver updates v_g = num/den; K = 15 rounds, fixed for determinism
  *      of the iteration count.
  *
  * The input is consumed once per round — cache() it when it fits,
  * checkpoint at archive scale. Unlike the graded keys, per-round double
  * sums here are not decimal-exact: the estimate moves ~1e-12 per merge
  * reorder, far below composite tolerance, and O(dim) state is the right
  * trade at scale.
  */
object GeomedianDistributed {

  val Rounds = 15
  val Eps = 1e-7
  /** Early-exit threshold: stop when no group's estimate moved more than
    * this between rounds (each round is a full pass over the archive —
    * converged groups make further passes pure cost). Deterministic for a
    * given dataset; Rounds stays the hard cap. */
  val ConvergeTol = 1e-9

  /** df must have columns (groupCol, vecCol: array<float|double>).
    * Returns (group string, gmed array<double>), one row per group. */
  def geomedian(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val vecs = df.select(
        col(groupCol).cast("string").as("g"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .as[(String, Seq[Double])]
      .cache()

    def zipAdd(a: Seq[Double], b: Seq[Double]): Seq[Double] =
      a.zip(b).map { case (x, y) => x + y }

    // round 0: centroid = elementwise mean
    var est: Map[String, Array[Double]] = vecs
      .map { case (g, v) => (g, v, 1L) }
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, zipAdd(a._2, b._2), a._3 + b._3))
      .map { case (g, (_, sums, n)) => (g, sums.map(_ / n)) }
      .collect()
      .map { case (g, c) => g -> c.toArray }
      .toMap

    var round = 0
    while (round < Rounds) {
      val bEst = spark.sparkContext.broadcast(est)
      val updated = vecs
        .map { case (g, v) =>
          val e = bEst.value(g)
          var d2 = 0.0
          var i = 0
          while (i < e.length) { val t = v(i) - e(i); d2 += t * t; i += 1 }
          val dist = math.sqrt(d2)
          if (dist < Eps) (g, v.map(_ => 0.0), 0.0)
          else { val w = 1.0 / dist; (g, v.map(_ * w), w) }
        }
        .groupByKey(_._1)
        .reduceGroups((a, b) => (a._1, zipAdd(a._2, b._2), a._3 + b._3))
        .map { case (g, (_, num, den)) => (g, num, den) }
        .collect()
      bEst.destroy()
      var maxMove = 0.0
      est = updated.map { case (g, num, den) =>
        // den == 0 => every point coincides with the estimate; keep it
        val next = if (den == 0.0) est(g) else num.map(_ / den).toArray
        val prev = est(g)
        var i = 0
        while (i < next.length) {
          val m = math.abs(next(i) - prev(i)); if (m > maxMove) maxMove = m
          i += 1
        }
        g -> next
      }.toMap
      round += 1
      if (maxMove < ConvergeTol) round = Rounds // converged: skip remaining passes
    }
    vecs.unpersist()

    val out = est.toSeq.sortBy(_._1).map { case (g, v) => (g, v.toSeq) }
    spark.createDataFrame(out).toDF("g", "gmed")
  }
}
