package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Det, Q, Tables => T}
import Det._

/** SURVEY.md §3.1 addendum (round 10): table-maintenance operations. */
object Maintenance {

  private val eventsProj = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("value", DoubleType)))

  val all: Seq[Q] = Seq(

    // Small-file compaction graded end-to-end (VERDICT r9 "missing" #4):
    // a deliberately fragmented ingest layout (17 writer tasks ×
    // partitionBy → up to 85 small files) is compacted by
    // graft.maintenance.Compaction to ⌈rows/50k⌉ files per partition,
    // then the compacted table is read back and graded on BOTH axes:
    // row truth (count + order-free cent sum per partition must be
    // untouched) and the compaction effect itself — n_files comes from
    // COUNT(DISTINCT input_file_name()) over the rewritten layout and
    // must equal the oracle's arithmetic ⌈n/50k⌉, which only holds if
    // the rewrite actually produced that many files and the swap lost
    // nothing. BUILD-TIME SIDE EFFECT: writes + compacts a temp table
    // at plan-construction time.
    Q("maint_compact", Some(
      "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        sqlSum6("value") + " AS sum_v6, " +
        "CAST((COUNT(*) + 49999) // 50000 AS BIGINT) AS n_files " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
      (s, d) => {
        val dir = s"${System.getProperty("java.io.tmpdir")}/graft_compact"
        graft.maintenance.Compaction.deleteRecursively(
          java.nio.file.Paths.get(dir))
        // fragmented ingest: 17 writer tasks per partition directory
        T.events(s, d)
          .select("event_id", "user_id", "value", "event_type")
          .repartition(17)
          .write.mode("overwrite").partitionBy("event_type").parquet(dir)
        graft.maintenance.Compaction.compact(s, dir, eventsProj, 50000L)
        s.read.schema(StructType(eventsProj.fields :+
            StructField("event_type", StringType))).parquet(dir)
          // input_file_name() is non-deterministic to Catalyst — project
          // it to a plain column first, then aggregate the column
          .withColumn("_file", input_file_name())
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"),
            sum6(col("value")).as("sum_v6"),
            countDistinct(col("_file")).as("n_files"))
          .orderBy("event_type")
      }))
}
