// scratch runner: sbt "runMain graft.tools.Explain <key> [sfDir]"
package graft.tools

import org.apache.spark.sql.SparkSession

object Explain {
  def main(args: Array[String]): Unit = {
    val keys = if (args.isEmpty) Seq("scan_pruned") else args.toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    keys.foreach { k =>
      println(s"\n===== $k =====")
      graft.SparkEntry.queries(k)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
