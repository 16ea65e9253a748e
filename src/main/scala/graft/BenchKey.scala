package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time specific keys N times inside ONE warmed JVM —
  * `runMain graft.BenchKey <sfDir> <reps> <key> [key ...]`. The shared
  * box's ±10 s noise swamps single full-bench runs; repeated in-JVM
  * timings isolate a key's steady-state cost. */
object BenchKey {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").count()
    args.drop(2).foreach { key =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(key)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[benchkey] $key reps=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
