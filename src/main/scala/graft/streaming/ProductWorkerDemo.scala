package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.sources.ProductSink

/** The reference's queue-worker loop (SURVEY §1 step 1), re-expressed:
  * Redis BRPOP becomes a Structured Streaming file source over a job-spec
  * directory — each JSON file is one product-generation job (product name,
  * input scale dir, output location). `foreachBatch` plays the worker body:
  * it resolves the product to a registered graft query, runs it on the
  * cluster, and commits the result through ProductSink (data first, then
  * manifest). Job transport is driver-side by design — the JOBS are tiny,
  * the PROCESSING is distributed.
  *
  * Run: sbt "runMain graft.streaming.ProductWorkerDemo"
  */
object ProductWorkerDemo {

  val jobSchema: StructType = StructType(Seq(
    StructField("job_id", LongType),
    StructField("product", StringType),
    StructField("sf_dir", StringType),
    StructField("out_dir", StringType)))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val work = Files.createTempDirectory("graft_worker").toString
    val jobsDir = s"$work/jobs"
    val outDir = s"$work/products"
    Files.createDirectories(Paths.get(jobsDir))

    // enqueue three product jobs (the queue producer)
    Seq(
      (1L, "eo_product_pipeline"),
      (2L, "eo_water_permanency"),
      (3L, "llm_text_stats")
    ).foreach { case (id, product) =>
      Files.writeString(Paths.get(jobsDir, s"job_$id.json"),
        s"""{"job_id": $id, "product": "$product", "sf_dir": "$sfDir", "out_dir": "$outDir"}""")
    }

    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-product-worker")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = spark.readStream.schema(jobSchema).json(jobsDir)

    val query = jobs.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.orderBy("job_id").collect().foreach { job =>
          val product = job.getAs[String]("product")
          val dir = job.getAs[String]("sf_dir")
          val out = job.getAs[String]("out_dir")
          graft.SparkEntry.queries.get(product) match {
            case Some(q) =>
              val m = ProductSink.write(q(spark, dir), product, out, Seq.empty)
              println(s"[worker] job ${job.getAs[Long]("job_id")} -> " +
                s"$product: ${m.rows} rows at ${m.path}")
            case None =>
              println(s"[worker] job ${job.getAs[Long]("job_id")}: " +
                s"unknown product $product (dead-lettered)")
          }
        }
      }
      .start()
    query.awaitTermination(180000)

    val written = new java.io.File(outDir).list()
    println(s"[worker] products written: ${Option(written).map(_.sorted.mkString(", ")).getOrElse("none")}")
    spark.stop()
  }
}
