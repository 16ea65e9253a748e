package graft

import java.nio.file.Paths

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.maintenance.Compaction

/** File-level behavior of the compaction primitive (maintenance/
  * Compaction.scala) that the maint_compact oracle can't see: the
  * before-state really is fragmented, stats() reports it, and the
  * rewrite collapses it without touching a byte of data. */
class CompactionSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("value", DoubleType)))

  test("compaction collapses the file count and preserves rows exactly") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_compact_spec"
    Compaction.deleteRecursively(Paths.get(dir))
    val src = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "value", "event_type")
    src.repartition(13)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)

    val before = Compaction.stats(dir)
    assert(before.nonEmpty, "partitions exist")
    assert(before.forall(_._2 > 1), "ingest layout is fragmented")
    val truth = src.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(Det.s2(col("value"))).as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    Compaction.compact(spark, dir, schema, rowsPerFile = 1000000L)

    val after = Compaction.stats(dir)
    assert(after.map(_._1).sorted == before.map(_._1).sorted, "partition set")
    after.foreach { case (p, nf, bytes) =>
      assert(nf == 1, s"$p collapsed to one file (small corpus)")
      assert(bytes > 0, s"$p non-empty")
    }
    val got = spark.read.schema(StructType(schema.fields :+
        StructField("event_type", StringType))).parquet(dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(Det.s2(col("value"))).as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == truth, "row truth preserved bit-exactly")
    // idempotent: a second compaction is a no-op on the file count
    Compaction.compact(spark, dir, schema, rowsPerFile = 1000000L)
    assert(Compaction.stats(dir).forall(_._2 == 1), "idempotent")
  }

  test("rowsPerFile drives a deterministic multi-file split") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_compact_spec2"
    Compaction.deleteRecursively(Paths.get(dir))
    Tables.events(spark, sfDir)
      .select("event_id", "user_id", "value", "event_type")
      .repartition(7)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val counts = Tables.events(spark, sfDir).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Compaction.compact(spark, dir, schema, rowsPerFile = 500L)
    Compaction.stats(dir).foreach { case (p, nf, _) =>
      val ty = p.split("=")(1)
      val expect = math.max(1L, (counts(ty) + 499) / 500)
      assert(nf == expect, s"$p file count = ceil(n/500)")
    }
  }
}
