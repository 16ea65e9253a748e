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
      }),

    // Snapshot isolation + time travel + rollback graded end-to-end
    // (round 10): the manifest commit protocol of maintenance.Snapshots
    // driven through a full lifecycle — v1 = full ingest, v2 = a logical
    // DELETE of the 'error' rows REWRITTEN as new files into the SAME
    // directory (old files untouched — the immutable-data-file
    // contract), v3 = rollback to v1 (one manifest write, zero data
    // movement). The graded frame unions per-type aggregates of all
    // three AS-OF reads: v1 must still hash the full truth AFTER v2's
    // files landed beside it (snapshot isolation), v2 must hash the
    // filtered truth (the delete took), and v3 must re-hash the full
    // truth (rollback restored visibility without restoring bytes).
    // One leaked file in any manifest double-counts a type and breaks
    // the hash. BUILD-TIME SIDE EFFECT: writes + commits a temp table
    // at plan-construction time (the maint_compact discipline).
    Q("maint_snapshot_asof", Some {
      val full = "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        sqlSum6("value") + " AS sum_v6 FROM events GROUP BY event_type"
      val filt = "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        sqlSum6("value") + " AS sum_v6 FROM events WHERE event_type <> 'error' " +
        "GROUP BY event_type"
      s"SELECT 1 AS version, * FROM ($full) v1 UNION ALL " +
        s"SELECT 2 AS version, * FROM ($filt) v2 UNION ALL " +
        s"SELECT 3 AS version, * FROM ($full) v3 ORDER BY version, event_type"
    },
      (s, d) => {
        val dir = s"${System.getProperty("java.io.tmpdir")}/graft_snapshots"
        graft.maintenance.Compaction.deleteRecursively(
          java.nio.file.Paths.get(dir))
        val snap = StructType(eventsProj.fields :+
          StructField("event_type", StringType))
        val src = T.events(s, d)
          .select("event_id", "user_id", "value", "event_type")
        src.write.mode("overwrite").parquet(dir)
        val v1 = graft.maintenance.Snapshots.commit(dir)
        val v1Files = graft.maintenance.Snapshots.files(dir, v1).toSet
        // logical delete: rewrite the surviving rows as NEW files
        src.where(col("event_type") =!= "error")
          .write.mode("append").parquet(dir)
        val v2Files = graft.maintenance.Snapshots.dataFiles(dir)
          .filterNot(v1Files)
        val v2 = graft.maintenance.Snapshots.commit(dir, v2Files)
        val v3 = graft.maintenance.Snapshots.rollback(dir, v1)
        def agg(v: Int) = graft.maintenance.Snapshots
          .readAsOf(s, dir, snap, v)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"), sum6(col("value")).as("sum_v6"))
          .select(lit(v).as("version"), col("event_type"),
            col("n_rows"), col("sum_v6"))
        agg(v1).unionAll(agg(v2)).unionAll(agg(v3))
          .orderBy("version", "event_type")
      }))
}
