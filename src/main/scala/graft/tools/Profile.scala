package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}

/** Throwaway local profiler for single keys (not part of the driver
  * contract): times N repeated runs of the named keys in one JVM and,
  * per rep, prints every Spark job's wall time and stage count so the
  * expensive jobs inside a multi-action key (iterative loops,
  * localCheckpoints, build phases) are visible individually. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobInfo = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    @volatile var record = false
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobStart.put(js.jobId, System.nanoTime())
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        jobInfo.put(js.jobId, s"stages=${js.stageIds.size} $site")
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        // a job whose start event was missed has no t0 — skip it instead
        // of printing an absurd wall time measured from the epoch
        val t0 = jobStart.get(je.jobId)
        if (record && t0 != 0L) {
          val ms = (System.nanoTime() - t0) / 1e6
          lines.add((je.jobId,
            f"[job] id=${je.jobId} ${ms}%8.0f ms ${jobInfo.get(je.jobId)}"))
        }
      }
    })

    spark.range(1000).selectExpr("sum(id)").count()
    args.foreach { name =>
      (1 to reps).foreach { r =>
        lines.clear()
        record = true
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        val total = (System.nanoTime() - t0) / 1e9
        record = false
        spark.catalog.clearCache()
        if (r == reps) {
          import scala.jdk.CollectionConverters._
          lines.asScala.toSeq.sortBy(_._1).foreach(l => println(l._2))
        }
        println(f"[profile] $name rep$r: $total%.2f s")
      }
    }
    spark.stop()
  }
}
