package graft

import org.apache.spark.sql.functions._

import graft.functions.Crs

/** Datum-true UTM <-> WGS84 reprojection (Crs scaladoc): round-trip
  * accuracy across a zone, known-geometry anchors, and the codegen plan
  * contract (pure column math, no UDF). */
class CrsSpec extends SparkSpec {

  test("forward-inverse round-trip is millimeter-level across zone 33N") {
    import spark.implicits._
    // a lat/lon grid across UTM zone 33 (12E..18E), 0..84N proper extent
    val grid = (for {
      lat <- BigDecimal(0.5) to BigDecimal(83.5) by BigDecimal(4.15)
      lon <- BigDecimal(12.1) to BigDecimal(17.9) by BigDecimal(0.58)
    } yield (lat.toDouble, lon.toDouble)).toDF("lat", "lon")
    val rt = grid
      .withColumn("utm", Crs.utmForward(col("lat"), col("lon"), 33))
      .withColumn("back", Crs.utmInverse(col("utm.easting"), col("utm.northing"), 33, southern = false))
      .select(
        max(abs(col("back.lat") - col("lat"))).as("dlat"),
        max(abs(col("back.lon") - col("lon"))).as("dlon"))
      .head()
    // 2e-8 degrees ~ 2 mm on the ground (series truncation order)
    assert(rt.getDouble(0) < 2e-8 && rt.getDouble(1) < 2e-8, rt.toString)
  }

  test("southern hemisphere carries the 10000 km false northing and round-trips") {
    import spark.implicits._
    val grid = Seq((-33.8688, 151.2093), (-0.5, 153.1), (-79.9, 150.2))
      .toDF("lat", "lon") // zone 56S
    val rows = grid
      .withColumn("utm", Crs.utmForward(col("lat"), col("lon"), 56))
      .withColumn("back", Crs.utmInverse(col("utm.easting"), col("utm.northing"), 56, southern = true))
      .collect()
    rows.foreach { r =>
      val n = r.getStruct(2).getDouble(1)
      assert(n > 0 && n < 10000000, s"southern northing out of band: $n")
      val back = r.getStruct(3)
      assert(math.abs(back.getDouble(0) - r.getDouble(0)) < 2e-8)
      assert(math.abs(back.getDouble(1) - r.getDouble(1)) < 2e-8)
    }
  }

  test("known geometry anchors: central meridian, scale factor, equator") {
    import spark.implicits._
    val r = Seq((0.0, 15.0)).toDF("lat", "lon")
      .select(Crs.utmForward(col("lat"), col("lon"), 33).as("utm"))
      .head().getStruct(0)
    // equator x central meridian of zone 33 -> exactly the false origin
    assert(math.abs(r.getDouble(0) - 500000.0) < 1e-6)
    assert(math.abs(r.getDouble(1)) < 1e-6)
    // k0: one degree of longitude at the equator on the central meridian
    // spans ~111.32 km * 0.9996 of easting
    val e1 = Seq((0.0, 16.0)).toDF("lat", "lon")
      .select(Crs.utmForward(col("lat"), col("lon"), 33).as("utm"))
      .head().getStruct(0).getDouble(0)
    val span = e1 - 500000.0
    assert(span > 111000 && span < 111500, s"1-degree easting span $span")
  }

  test("per-row-zone forward agrees with the fixed-zone path inside each zone") {
    import spark.implicits._
    // points across zones 26-35; inside a zone's own band the dynamic
    // path must match utmForward(zone) bit-for-bit (same series, same
    // lam0), and the derived zone must be the standard floor((lon+180)/6)+1
    val grid = (for {
      lat <- Seq(-35.25, -4.5, 0.5, 47.75)
      lon <- BigDecimal(-29.5) to BigDecimal(29.5) by BigDecimal(1.75)
    } yield (lat, lon.toDouble)).toDF("lat", "lon")
    val rows = grid
      .withColumn("dyn", Crs.utmForwardZoned(col("lat"), col("lon")))
      .collect()
    rows.foreach { r =>
      val (lat, lon) = (r.getDouble(0), r.getDouble(1))
      val dyn = r.getStruct(2)
      val zone = math.floor((lon + 180.0) / 6.0).toInt + 1
      assert(dyn.getInt(0) == zone, s"zone for lon=$lon")
      val fixed = Seq((lat, lon)).toDF("lat", "lon")
        .select(Crs.utmForward(col("lat"), col("lon"), zone).as("u"))
        .head().getStruct(0)
      assert(dyn.getDouble(1) == fixed.getDouble(0), s"easting at ($lat,$lon)")
      assert(dyn.getDouble(2) == fixed.getDouble(1), s"northing at ($lat,$lon)")
    }
  }

  test("the reprojection is pure codegen column math — no UDF, no mapPartitions") {
    import spark.implicits._
    val df = Seq((40.5, 14.2)).toDF("lat", "lon")
      .withColumn("utm", Crs.utmForward(col("lat"), col("lon"), 33))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEval") && !plan.contains("MapPartitions") &&
      !plan.contains("Invoke"), s"reprojection left codegen:\n$plan")
  }

  test("sinusoidal projection: anchors, equal-area scaling, and roundtrip error bound") {
    val R = 6371007.181
    def fwd(lat: Double, lon: Double): (Double, Double) =
      (R * math.toRadians(lon) * math.cos(math.toRadians(lat)),
        R * math.toRadians(lat))
    def inv(x: Double, y: Double): (Double, Double) =
      (math.toDegrees(y / R), math.toDegrees(x / (R * math.cos(y / R))))
    // equator anchor: x = R * lambda, y = 0 — one degree of longitude at
    // the equator is R * pi/180 ~ 111.19 km on the MODIS sphere
    val (xe, ye) = fwd(0.0, 1.0)
    assert(math.abs(xe - 111194.99) < 1.0 && ye == 0.0, s"equator anchor $xe")
    // central meridian anchor: x = 0 at lon 0 for every latitude
    (-60 to 60 by 15).foreach(lat => assert(fwd(lat, 0.0)._1 == 0.0))
    // the parallel scale is cos(lat): x at 60N is half the equator x
    assert(math.abs(fwd(60.0, 1.0)._1 / xe - 0.5) < 1e-9, "cos(60) = 1/2")
    // roundtrip through the INTEGER-METER grid stays within the 6-dp
    // degree grid's half-step everywhere the key samples
    for (li <- 0 to 10; lj <- 0 to 10) {
      val lat = -40.0 + li * 7.3; val lon = -30.0 + lj * 5.7
      val (x, y) = fwd(lat, lon)
      val (lat2, lon2) = inv(math.floor(x + 0.5), math.floor(y + 0.5))
      assert(math.abs(lat2 - lat) < 1e-5, s"lat roundtrip at ($lat,$lon)")
      assert(math.abs(lon2 - lon) < 1e-5, s"lon roundtrip at ($lat,$lon)")
    }
    // and the graded key's own outputs satisfy the same bound
    val rows = SparkEntry.queries("eo_reproject_sinu")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lat6, lon6) = (r.getLong(3), r.getLong(4))
      val (lat2, lon2) = inv(r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(lat6 - math.floor(lat2 * 1e6 + 0.5)) <= 1, "key lat6")
      assert(math.abs(lon6 - math.floor(lon2 * 1e6 + 0.5)) <= 1, "key lon6")
    }
  }

  test("Albers conic: origin/parallel anchors and the inverse recovers the grid") {
    // scalar mirror with the key's exact shared literals
    val n = 0.6028370046288244; val cC = 1.351221325417899
    val rho0 = 9914729.120503271; val lam0 = -1.6755160819145565
    val r = 6371007.181
    def fwd(lat: Double, lon: Double): (Double, Double) = {
      val rho = r * math.sqrt(cC - 2 * n * math.sin(math.toRadians(lat))) / n
      val th = n * (math.toRadians(lon) - lam0)
      (rho * math.sin(th), rho0 - rho * math.cos(th))
    }
    def inv(x: Double, y: Double): (Double, Double) = {
      val dy = rho0 - y
      val rho = math.sqrt(x * x + dy * dy)
      val th = math.atan2(x, dy)
      (math.toDegrees(math.asin((cC - (rho * n / r) * (rho * n / r)) / (2 * n))),
        math.toDegrees(lam0 + th / n))
    }
    // the projection origin maps to (0, 0)
    val (x0, y0) = fwd(23.0, -96.0)
    assert(math.abs(x0) < 1e-6 && math.abs(y0) < 1e-6, s"origin ($x0,$y0)")
    // east of the central meridian x > 0; north of the origin y > 0
    assert(fwd(23.0, -90.0)._1 > 0 && fwd(40.0, -96.0)._2 > 0)
    // on a standard parallel the cone is tangent-true: one degree of
    // longitude at 29.5N spans R*cos(29.5 deg)*(pi/180) meters of arc
    val arc = {
      val (xa, ya) = fwd(29.5, -96.0); val (xb, yb) = fwd(29.5, -95.0)
      math.hypot(xb - xa, yb - ya)
    }
    val trueArc = r * math.cos(math.toRadians(29.5)) * math.Pi / 180
    assert(math.abs(arc / trueArc - 1.0) < 1e-4, s"parallel scale $arc vs $trueArc")
    // the graded key's inverse recovers its own synthesized grid through
    // the integer-meter quantization, within the 6-dp degree grid
    val rows = SparkEntry.queries("eo_reproject_albers")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val (lat6, lon6) = (row.getLong(3), row.getLong(4))
      val (lat2, lon2) = inv(row.getLong(1).toDouble, row.getLong(2).toDouble)
      assert(math.abs(lat6 - math.floor(lat2 * 1e6 + 0.5)) <= 1, "albers lat6")
      assert(math.abs(lon6 - math.floor(lon2 * 1e6 + 0.5)) <= 1, "albers lon6")
    }
  }
}
