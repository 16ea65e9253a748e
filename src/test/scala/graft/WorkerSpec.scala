package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}

import graft.streaming.ProductWorkerDemo
import graft.streaming.ProductWorkerDemo.{Dead, Done}

/** Queue-worker failure semantics: bounded retries, dead-lettering, and a
  * poison job never wedging the batch. */
class WorkerSpec extends SparkSpec {

  private def job(id: Long, product: String, dir: String, out: String): Row =
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      Array[Any](id, product, dir, out), ProductWorkerDemo.jobSchema)

  test("worker commits good jobs and dead-letters poison ones") {
    val work = Files.createTempDirectory("graft_wspec").toString
    val out = s"$work/products"
    val dead = s"$work/dead"
    val batch = spark.createDataFrame(
      java.util.Arrays.asList(
        job(1L, "eo_bandmath", sfDir, out),
        job(2L, "no_such_product", sfDir, out),      // unknown -> dead, 0 attempts
        job(3L, "eo_bandmath", "/nonexistent", out)  // throws -> retried, then dead
      ),
      ProductWorkerDemo.jobSchema)

    val results = ProductWorkerDemo.runBatch(spark, batch, dead)
    assert(results.length == 3)

    val byId = results.map { case r @ Done(id, _, _, _) => id -> r
                             case r @ Dead(id, _, _, _) => id -> r }.toMap
    assert(byId(1L).isInstanceOf[Done])
    val d2 = byId(2L).asInstanceOf[Dead]
    assert(d2.attempts == 0 && d2.error.contains("unknown product"))
    val d3 = byId(3L).asInstanceOf[Dead]
    assert(d3.attempts == 3, s"expected 3 attempts, got ${d3.attempts}")

    // dead-letter files carry the job spec + error for replay
    val deadFiles = Option(new java.io.File(dead).list()).map(_.sorted.toSeq)
    assert(deadFiles.contains(Seq("job_2.json", "job_3.json")), s"$deadFiles")
    val dl3 = Files.readString(Paths.get(dead, "job_3.json"))
    assert(dl3.contains("\"attempts\": 3") && dl3.contains("eo_bandmath"))

    // the good product committed data AND manifest
    assert(new java.io.File(s"$out/eo_bandmath/_manifest.json").exists())
  }
}
