package graft

import graft.sources.SceneCatalog

/** The ODC-index analogue: JSON dataset documents -> typed catalog ->
  * pruned dc.load-shaped queries -> solar-day grouping. */
class SceneCatalogSpec extends SparkSpec {

  private lazy val catalog =
    SceneCatalog.parse(SceneCatalog.demoDocs(spark, sfDir)).cache()

  test("parses dataset documents into the typed catalog") {
    assert(catalog.count() == 1000)
    assert(catalog.schema("time").dataType.typeName == "timestamp")
    assert(catalog.schema("props").dataType.typeName.startsWith("map"))
  }

  test("malformed documents become null rows and are dropped") {
    import spark.implicits._
    val mixed = spark.createDataset(Seq(
      """{"product": "p1", "tile_x": 1, "tile_y": 2, "time": "2024-01-01 00:00:00", "path": "a", "props": {}}""",
      """not json at all"""))
    assert(SceneCatalog.parse(mixed).count() == 1)
  }

  test("dc.load-shaped query prunes by product, time and bbox") {
    val scenes = SceneCatalog.query(catalog,
      "ndvi_click", "2024-01-05", "2024-01-20", (0, 0, 3, 3))
    val rows = scenes.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("product") == "ndvi_click"))
    assert(rows.forall(r => r.getAs[Int]("tile_x") <= 3 && r.getAs[Int]("tile_y") <= 3))
    // predicate must reach the filter, catalog-side, not post-collect
    val plan = scenes.queryExecution.optimizedPlan.toString
    assert(plan.contains("ndvi_click"))
  }

  test("solar-day grouping yields one row per (tile, day) with sorted paths") {
    val grouped = SceneCatalog.groupBySolarDay(
      SceneCatalog.query(catalog, "ndvi_view", "2024-01-01", "2024-02-01", (0, 0, 7, 4)))
    val rows = grouped.collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getInt(0), r.getInt(1), r.getDate(2).toString))
    assert(keys.distinct.length == keys.length)
    rows.foreach { r =>
      val paths = r.getSeq[String](4)
      assert(paths == paths.sorted)
    }
  }

  test("latest non-archived dataset wins per observation group; archived never load") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def doc(tx: Int, hour: Int, v: Int, archived: Boolean, path: String) =
      s"""{"product": "p", "tile_x": $tx, "tile_y": 0, """ +
        s""""time": "2024-01-01 0$hour:00:00", "path": "$path", "props": {}, """ +
        s""""version": $v, "archived": $archived}"""
    val cat = SceneCatalog.parse(spark.createDataset(Seq(
      // group 0: highest LIVE version wins (the archived v2 must lose)
      doc(0, 1, 0, archived = false, "a0"),
      doc(0, 2, 2, archived = true, "a1"),
      doc(0, 3, 1, archived = false, "a2"),
      // group 1: fully archived -> loads nothing
      doc(1, 1, 0, archived = true, "b0"),
      doc(1, 2, 1, archived = true, "b1"),
      // group 2: equal versions -> tie-break (latest time) wins
      doc(2, 1, 1, archived = false, "c0"),
      doc(2, 2, 1, archived = false, "c1"))))
    val picked = SceneCatalog.latestNonArchived(
        cat, Seq(col("time").desc, col("path").desc))
      .collect().map(r => r.getAs[Int]("tile_x") -> r.getAs[String]("path")).toMap
    assert(picked == Map(0 -> "a2", 2 -> "c1"))
  }

  test("product write emits dataset docs; catalog registers, queries and prunes the read-back") {
    import org.apache.spark.sql.functions._
    import graft.sources.ProductSink
    // a 4x3-tile composite "product" with one acquisition time per tile
    val grid = graft.raster.RasterGrid.synthesize(
      spark, "ndvi_comp", "ndvi", 4, 3, 4, 4, Seq(86400))((x, y, t) => x + y)
    val out = java.nio.file.Files.createTempDirectory("graft_sink_docs").toString
    val m = ProductSink.writeWithDatasets(grid, "ndvi_comp", out,
      "tile_x", "tile_y", "time", lineage = Some("events:sf0.001"))
    assert(m.rows == 12)
    // register: one eo3-shaped document per tile, in SceneCatalog's schema
    val cat = ProductSink.catalog(spark, out, "ndvi_comp")
    assert(cat.count() == 12)
    assert(cat.schema.fieldNames.toSeq == SceneCatalog.documentSchema.fieldNames.toSeq)
    assert(cat.where(col("props")("lineage") === "events:sf0.001").count() == 12)
    // dc.load-shaped index query prunes to the bbox
    val hits = SceneCatalog.query(cat, "ndvi_comp",
      "1970-01-01", "1970-01-03", bbox = (0, 0, 1, 1)).collect()
    assert(hits.length == 4)
    // the catalog's path column points at that tile's partition directory:
    // reading it touches ONLY the selected tile's files
    val one = hits.minBy(r => (r.getAs[Int]("tile_x"), r.getAs[Int]("tile_y")))
    val tile = spark.read.parquet(one.getAs[String]("path"))
    assert(tile.count() == 1)
    assert(tile.select("band").head().getString(0) == "ndvi")
  }
}
