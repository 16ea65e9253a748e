package graft

import org.apache.spark.sql.functions._

import graft.functions.Geometry

/** Convex/concave/boundary cases for the integer ray-casting
  * point-in-polygon (functions/Geometry.scala), plus the three-form
  * agreement (Column == Scala mirror) the eo_catalog_polygon_load
  * oracle relies on. */
class GeometrySpec extends SparkSpec {

  private val square = Seq[(Long, Long)]((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L))
  // the catalog key's concave "C": notch at y in (36,52), x > 52
  private val cShape = Seq[(Long, Long)](
    (4L, 4L), (124L, 4L), (124L, 36L), (52L, 36L),
    (52L, 52L), (124L, 52L), (124L, 76L), (4L, 76L))
  // a non-axis-aligned convex triangle
  private val tri = Seq[(Long, Long)]((0L, 0L), (20L, 0L), (10L, 30L))

  test("convex: square interior/exterior and the half-open boundary rule") {
    assert(Geometry.pointInPolygonD(5, 5, square), "center in")
    assert(!Geometry.pointInPolygonD(15, 5, square), "right out")
    assert(!Geometry.pointInPolygonD(-1, 5, square), "left out")
    assert(!Geometry.pointInPolygonD(5, 11, square), "above out")
    // half-open: lower/left edges in, upper/right edges out
    assert(Geometry.pointInPolygonD(0, 5, square), "left edge in")
    assert(!Geometry.pointInPolygonD(10, 5, square), "right edge out")
    assert(Geometry.pointInPolygonD(5, 0, square), "bottom edge in")
    assert(!Geometry.pointInPolygonD(5, 10, square), "top edge out")
    assert(Geometry.pointInPolygonD(0, 0, square), "lower-left corner in")
    assert(!Geometry.pointInPolygonD(10, 10, square), "upper-right corner out")
  }

  test("concave: the C-shape notch is excluded, arms included") {
    assert(Geometry.pointInPolygonD(24, 24, cShape), "lower arm in")
    assert(Geometry.pointInPolygonD(24, 44, cShape), "spine at notch height in")
    assert(Geometry.pointInPolygonD(24, 72, cShape), "upper arm in")
    assert(!Geometry.pointInPolygonD(88, 44, cShape), "notch excluded")
    assert(!Geometry.pointInPolygonD(126, 44, cShape), "right of notch out")
    assert(Geometry.pointInPolygonD(88, 24, cShape), "lower arm right in")
    assert(Geometry.pointInPolygonD(88, 72, cShape), "upper arm right in")
  }

  test("non-axis-aligned edges stay exact (triangle sloped sides)") {
    assert(Geometry.pointInPolygonD(10, 1, tri), "base interior")
    assert(Geometry.pointInPolygonD(10, 29, tri), "apex interior")
    assert(!Geometry.pointInPolygonD(1, 20, tri), "left of slope")
    assert(!Geometry.pointInPolygonD(19, 20, tri), "right of slope")
    assert(!Geometry.pointInPolygonD(10, 31, tri), "above apex")
  }

  test("Spark Column predicate agrees with the mirror over a dense grid") {
    import spark.implicits._
    val pts = for (x <- -2L to 130L by 2; y <- -2L to 80L by 2) yield (x, y)
    for (poly <- Seq(square, cShape, tri)) {
      val got = spark.createDataset(pts.toSeq).toDF("px", "py")
        .withColumn("inside",
          Geometry.pointInPolygon(col("px"), col("py"), poly))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2))
        .toMap
      pts.foreach { case (x, y) =>
        assert(got((x, y)) == Geometry.pointInPolygonD(x, y, poly),
          s"($x,$y) poly size ${poly.size}")
      }
    }
  }

  test("bbox covers the polygon and the prefilter never drops an inside point") {
    val (x0, y0, x1, y1) = Geometry.bbox(cShape)
    assert((x0, y0, x1, y1) == ((4L, 4L, 124L, 76L)))
    for (x <- 0L to 130L; y <- 0L to 80L
         if Geometry.pointInPolygonD(x, y, cShape)) {
      assert(x >= x0 && x <= x1 && y >= y0 && y <= y1, s"bbox lost ($x,$y)")
    }
  }

  test("join_pip census matches the scalar ray-cast mirror over all polygons") {
    def run(dir: String): (Map[Int, (Long, Long)], Map[Int, (Long, Long)]) = {
      val got = SparkEntry.queries("join_pip")(spark, dir).collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
      val pts = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id")).collect()
        .map(r => (r.getLong(0), r.getLong(0) % 256, r.getLong(1) % 256))
      val mirror = graft.operators.Relational.PipPolygons.zipWithIndex.flatMap {
        case (poly, id) =>
          val in = pts.filter(p => Geometry.pointInPolygonD(p._2, p._3, poly))
          if (in.isEmpty) None
          else Some(id -> (in.length.toLong, in.map(_._1).sum))
      }.toMap
      (got, mirror)
    }
    val (g0, m0) = run(sfDir)
    assert(g0 == m0)
    // sf0.001's user domain is too sparse to reach every polygon; the
    // all-three-populated check runs where the corpus covers the grid
    val (g1, m1) = run("/root/testdata/sf0.01")
    assert(g1 == m1)
    assert(m1.size == 3, "every polygon holds points at sf0.01")
  }

  test("eo_rasterize: per-pixel brute-force burn mirror over the AOI draw") {
    // scalar mirror of the burn-in: enumerate every pixel of every AOI
    // rect directly (no cells, no clipping) and roll up per tile — any
    // clip-boundary or cover-cell error in the key breaks equality
    val aos = SparkEntry.queries("eo_rasterize")(spark, sfDir)
    val events = Tables.events(spark, sfDir)
      .select(col("event_id")).collect().map(_.getLong(0))
    val draw = events.filter(e => Det.hash32Scala(s"aoi:$e") % 200 == 0)
    assert(draw.nonEmpty, "AOI draw empty")
    val burn = scala.collection.mutable.Map[(Long, Long), Long]()
    draw.foreach { e =>
      val (ax0, ay0) = (e * 53 % 256, e * 29 % 256)
      val (ax1, ay1) = (ax0 + 16 + e % 33, ay0 + 16 + (e * 7) % 17)
      for (x <- ax0 until ax1; y <- ay0 until ay1)
        burn((x, y)) = burn.getOrElse((x, y), 0L) + 1L
    }
    val expected = burn.toSeq.groupBy { case ((x, y), _) => (x / 16, y / 16) }
      .map { case (tile, px) =>
        tile -> (px.size.toLong, px.map(_._2).sum,
          px.map { case ((x, y), b) => ((y % 16) * 16 + (x % 16) + 1) * b }.sum)
      }
    val got = aos.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getAs[Long]("n_px"), r.getAs[Long]("burn_sum"), r.getAs[Long]("cksum"))).toMap
    assert(got == expected, s"tiles: got ${got.size} vs ${expected.size}")
  }
}
