// scratch runner: sbt "runMain graft.tools.Explain <key> [sfDir]"
package graft.tools

import org.apache.spark.sql.SparkSession

object Explain {
  def main(args: Array[String]): Unit = {
    // trailing arg that looks like a path selects the scale dir
    val (keyArgs, dirArgs) = args.toSeq.partition(a => !a.startsWith("/"))
    val sfDir = dirArgs.lastOption.getOrElse("/root/testdata/sf0.01")
    val keys = if (keyArgs.isEmpty) Seq("scan_pruned") else keyArgs
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    keys.foreach { k =>
      println(s"\n===== $k =====")
      graft.SparkEntry.queries(k)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
