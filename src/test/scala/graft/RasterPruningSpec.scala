package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.raster.RasterGrid

/** The measured analogue of ODC's spatial index: a RasterGrid written as
  * parquet partitioned by (time, tile_y, tile_x) must answer tile- and
  * bbox-scoped queries by PRUNING partitions at the scan — the driver
  * lists only the matching hive directories, so a 100 TB archive query
  * for one tile touches one tile's files. Proven here with the scan's own
  * numPartitions/numFiles metrics, not just plan text. */
class RasterPruningSpec extends SparkSpec {

  private def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => fileScans(q.plan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(fileScans)
  }

  // 4x3 tile grid, 8x8 pixels, 2 times -> 24 hive partitions
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_raster_part").toString
    RasterGrid.synthesize(spark, "p", "b", 4, 3, 8, 8, Seq(0, 1))(
      (x, y, t) => (x + 10 * y + 100 * t).toFloat)
      .write.partitionBy("time", "tile_y", "tile_x").mode("overwrite").parquet(d)
    d
  }

  test("single-tile query prunes 24 hive partitions down to 1 at the scan") {
    val q = spark.read.parquet(dir)
      .where(col("time") === 0 && col("tile_y") === 1 && col("tile_x") === 2)
    val rows = q.collect()
    assert(rows.length == 1)
    val scan = fileScans(q.queryExecution.executedPlan).head
    assert(scan.metrics("numPartitions").value == 1,
      s"expected 1 of 24 partitions read, got ${scan.metrics("numPartitions").value}")
    assert(q.queryExecution.executedPlan.toString.contains("PartitionFilters"),
      "tile predicate did not become a partition filter")
    // roundtrip: the pruned read returns the exact pixels that were written
    val data = rows.head.getAs[scala.collection.Seq[Float]]("data")
    // global pixel (px=16..23, py=8..15) at t=0: x + 10y
    assert(data(0) == (2 * 8 + 10 * (1 * 8)).toFloat)
    assert(data(63) == (2 * 8 + 7 + 10 * (1 * 8 + 7)).toFloat)
  }

  test("bbox range predicate prunes to the covered tile rectangle") {
    // tiles with tile_y >= 1 and tile_x <= 1: 2 x 2 tiles x 2 times = 8
    val q = spark.read.parquet(dir)
      .where(col("tile_y") >= 1 && col("tile_x") <= 1)
    // collect() on THIS queryExecution — metrics live on the executed plan
    assert(q.collect().length == 8)
    val scan = fileScans(q.queryExecution.executedPlan).head
    assert(scan.metrics("numPartitions").value == 8,
      s"expected 8 of 24 partitions read, got ${scan.metrics("numPartitions").value}")
  }

  test("a whole-archive aggregation still reads every partition (no false pruning)") {
    val q = spark.read.parquet(dir).groupBy("time").count()
    assert(q.collect().map(_.getLong(1)).toSeq == Seq(12L, 12L))
    // under AQE the scan sits inside a materialized QueryStageExec
    val scan = fileScans(q.queryExecution.executedPlan).head
    assert(scan.metrics("numPartitions").value == 24)
  }
}
