package graft.operators

import org.apache.spark.sql.DataFrame
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
        val dir = graft.GraftTmp.dir("compact")
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
    // Shallow clone (round 10, fifth wave) — the Delta CLONE SHALLOW /
    // Iceberg snapshot-ref completing the lifecycle: the clone is ONE
    // metadata commit whose manifest references the source snapshot's
    // files by relative path — zero data bytes move (CloneSpec pins the
    // clone dir holds no .parquet at all). The source then evolves
    // (append + commit v2) and the graded surface proves isolation: the
    // clone still reads EXACTLY the v1 state while the source's latest
    // reads the evolved one. Oracle recomputes both states from events
    // (v2 = full + clicks appended twice). The Delta caveat is in the
    // cloneShallow scaladoc: vacuuming the SOURCE can strand the clone.
    Q("maint_clone", Some {
      val v1 = "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        sqlSum6("value") + " AS sum_v6 FROM events GROUP BY event_type"
      val v2 = "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        sqlSum6("value") + " AS sum_v6 FROM (SELECT event_type, value FROM events " +
        "UNION ALL SELECT event_type, value FROM events WHERE event_type = 'click') " +
        "GROUP BY event_type"
      s"SELECT 'clone_v1' AS side, * FROM ($v1) a UNION ALL " +
        s"SELECT 'src_v2' AS side, * FROM ($v2) b ORDER BY side, event_type"
    },
      (s, d) => {
        val srcDir = graft.GraftTmp.dir("clone_src")
        val dstDir = graft.GraftTmp.dir("clone_dst")
        graft.maintenance.Compaction.deleteRecursively(
          java.nio.file.Paths.get(srcDir))
        graft.maintenance.Compaction.deleteRecursively(
          java.nio.file.Paths.get(dstDir))
        val snap = StructType(eventsProj.fields :+
          StructField("event_type", StringType))
        val src = T.events(s, d)
          .select("event_id", "user_id", "value", "event_type")
        src.write.mode("overwrite").parquet(srcDir)
        val v1 = graft.maintenance.Snapshots.commit(srcDir)
        graft.maintenance.Snapshots.cloneShallow(srcDir, dstDir, v1)
        // the source evolves AFTER the clone; the clone must not see it
        src.where(col("event_type") === "click")
          .write.mode("append").parquet(srcDir)
        val v2 = graft.maintenance.Snapshots.commit(srcDir)
        def agg(label: String, df: DataFrame) =
          df.groupBy("event_type")
            .agg(count(lit(1)).as("n_rows"), sum6(col("value")).as("sum_v6"))
            .select(lit(label).as("side"), col("event_type"),
              col("n_rows"), col("sum_v6"))
        val cloneRead = graft.maintenance.Snapshots.readAsOf(s, dstDir, snap,
          graft.maintenance.Snapshots.latestVersion(dstDir))
        val srcRead = graft.maintenance.Snapshots.readAsOf(s, srcDir, snap, v2)
        agg("clone_v1", cloneRead).unionAll(agg("src_v2", srcRead))
          .orderBy("side", "event_type")
      }),

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
        val dir = graft.GraftTmp.dir("snapshots")
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
      }),

    // Vacuum / expire-snapshots graded end-to-end (round 10 third wave)
    // — the space-reclaim step that completes the maintenance triad
    // (compact = layout, snapshots = visibility, vacuum = physical GC):
    // a fragmented ingest (repartition(17) ⇒ exactly 17 part files,
    // round-robin leaves none empty) is committed as v1, compacted into
    // ⌈rows/50k⌉ NEW files committed as v2 (old files untouched — the
    // immutable-file contract), then Snapshots.vacuum deletes every file
    // v2 does not reference. The graded frame reads the directory
    // DIRECTLY (plain parquet scan, not as-of) — before the vacuum that
    // read would double-count every row, so n_rows/sum_v6 grade that
    // deletion removed ALL 17 orphans and ONLY orphans; n_files =
    // COUNT(DISTINCT input_file_name()) grades the surviving layout is
    // exactly the compacted one; n_orphans is the vacuum's own deletion
    // census against the arithmetic 17. BUILD-TIME SIDE EFFECT: writes,
    // commits and vacuums a temp table at plan-construction time (the
    // maint_compact discipline).
    Q("maint_vacuum", Some(
      "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        sqlSum6("value") + " AS sum_v6, " +
        "CAST((COUNT(*) + 49999) // 50000 AS BIGINT) AS n_files, " +
        "CAST(17 AS BIGINT) AS n_orphans FROM events"),
      (s, d) => {
        val dir = graft.GraftTmp.dir("vacuum")
        graft.maintenance.Compaction.deleteRecursively(
          java.nio.file.Paths.get(dir))
        val src = T.events(s, d).select("event_id", "user_id", "value")
        src.repartition(17).write.mode("overwrite").parquet(dir)
        val v1 = graft.maintenance.Snapshots.commit(dir)
        val v1Files = graft.maintenance.Snapshots.files(dir, v1).toSet
        val vacSchema = StructType(Seq(
          StructField("event_id", LongType),
          StructField("user_id", LongType),
          StructField("value", DoubleType)))
        // the compaction rewrite: v1's rows into ⌈n/50k⌉ new files
        val asOf1 = graft.maintenance.Snapshots.readAsOf(s, dir, vacSchema, v1)
        val nParts = math.max(1,
          math.ceil(asOf1.count() / 50000.0).toInt)
        asOf1.repartition(nParts).write.mode("append").parquet(dir)
        val v2Files = graft.maintenance.Snapshots.dataFiles(dir)
          .filterNot(v1Files)
        graft.maintenance.Snapshots.commit(dir, v2Files)
        val deleted = graft.maintenance.Snapshots.vacuum(dir)
        s.read.schema(vacSchema).parquet(dir)
          .withColumn("_file", input_file_name())
          .agg(count(lit(1)).as("n_rows"),
            sum6(col("value")).as("sum_v6"),
            countDistinct(col("_file")).as("n_files"),
            lit(deleted.size.toLong).as("n_orphans"))
      }),

    // MERGE INTO graded end-to-end (round 10 third wave) — the upsert
    // write every lakehouse sink ultimately runs (Delta/Iceberg MERGE,
    // the batch half of stream_cdc_apply's changelog semantics): the
    // BASE target is the latest-per-user snapshot of the non-%3 event
    // rows EXCLUDING users ≡ 0 (mod 5) (committed v1 through
    // Snapshots), the CHANGE set is the latest-per-user %3 rows
    // excluding users ≡ 0 (mod 7), read as a changelog ('error' =
    // DELETE, else UPSERT) — the two user-level exclusions are what
    // make ALL FIVE clauses fire on this corpus (every user has rows
    // on both %3 sides, so a plain event split never produces inserts,
    // no-ops or untouched rows — measured), and the merge law is the
    // full clause table —
    // matched+delete drops, matched+upsert updates, unmatched+upsert
    // inserts, unmatched+delete no-ops, unmatched-target rows carry
    // over untouched. The merged target is REWRITTEN as new files and
    // committed v2 (old files untouched — the immutable-file contract);
    // rows carry their merge action as an audit column so the graded
    // per-action rows for the SURVIVING actions come from the AS-OF v2
    // READ-BACK (a dropped or doubled file breaks n/sum), while the
    // delete/noop rows — absent from the target by definition — come
    // from the merge computation itself. At scale the merge is ONE full
    // outer join on the key (shuffle or bucket-colocated) and the
    // rewrite is executor-parallel; the clause logic is a row map.
    // BUILD-TIME SIDE EFFECT: writes + commits a temp table at
    // plan-construction time (the maint_compact discipline).
    Q("maint_merge_into", Some(
      "WITH e AS (SELECT user_id, event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t, " +
        "event_type, value FROM events), " +
        "base_r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id " +
        "ORDER BY t DESC, event_id DESC) AS rn FROM e " +
        "WHERE event_id % 3 <> 0 AND user_id % 5 <> 0), " +
        "base AS (SELECT user_id, value FROM base_r WHERE rn = 1), " +
        "chg_r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id " +
        "ORDER BY t DESC, event_id DESC) AS rn FROM e " +
        "WHERE event_id % 3 = 0 AND user_id % 7 <> 0), " +
        "chg AS (SELECT user_id, CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op, " +
        "value FROM chg_r WHERE rn = 1), " +
        "merged AS (SELECT COALESCE(b.user_id, c.user_id) AS user_id, " +
        "CASE WHEN c.user_id IS NULL THEN b.value " +
        "WHEN c.op = 'U' THEN c.value END AS value, " +
        "CASE WHEN c.user_id IS NULL THEN 'untouched' " +
        "WHEN b.user_id IS NULL AND c.op = 'U' THEN 'insert' " +
        "WHEN b.user_id IS NULL THEN 'noop' " +
        "WHEN c.op = 'D' THEN 'delete' ELSE 'update' END AS act " +
        "FROM base b FULL JOIN chg c ON b.user_id = c.user_id) " +
        "SELECT act, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CASE WHEN act IN ('untouched', 'insert', 'update') THEN " +
        sqlSum6("value") + " END AS sum_v6 " +
        "FROM merged GROUP BY act ORDER BY act"),
      (s, d) => {
        val dir = graft.GraftTmp.dir("merge")
        graft.maintenance.Compaction.deleteRecursively(
          java.nio.file.Paths.get(dir))
        val wLast = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("t").desc, col("event_id").desc)
        val e = T.events(s, d).select(col("user_id"), col("event_id"),
          epochS(col("ts")).as("t"), col("event_type"), col("value"))
        val base = e.where(col("event_id") % 3 =!= 0 && col("user_id") % 5 =!= 0)
          .withColumn("rn", row_number().over(wLast)).where(col("rn") === 1)
          .select("user_id", "value")
        base.write.mode("overwrite").parquet(dir)
        val v1 = graft.maintenance.Snapshots.commit(dir)
        val v1Files = graft.maintenance.Snapshots.files(dir, v1).toSet
        val chg = e.where(col("event_id") % 3 === 0 && col("user_id") % 7 =!= 0)
          .withColumn("rn", row_number().over(wLast)).where(col("rn") === 1)
          .select(col("user_id").as("c_uid"),
            when(col("event_type") === "error", "D").otherwise("U").as("op"),
            col("value").as("c_value"))
        val baseSchema = StructType(Seq(
          StructField("user_id", LongType),
          StructField("value", DoubleType)))
        val merged = graft.maintenance.Snapshots.readAsOf(s, dir, baseSchema, v1)
          .join(chg, col("user_id") === col("c_uid"), "full")
          .select(coalesce(col("user_id"), col("c_uid")).as("user_id"),
            when(col("c_uid").isNull, col("value"))
              .when(col("op") === "U", col("c_value")).as("value"),
            when(col("c_uid").isNull, "untouched")
              .when(col("user_id").isNull && col("op") === "U", "insert")
              .when(col("user_id").isNull, "noop")
              .when(col("op") === "D", "delete").otherwise("update").as("act"))
        // rewrite: the surviving target (with its audit column) as NEW
        // files beside the untouched v1 set, committed v2
        merged.where(col("act").isin("untouched", "insert", "update"))
          .write.mode("append").parquet(dir)
        val v2Files = graft.maintenance.Snapshots.dataFiles(dir)
          .filterNot(v1Files)
        graft.maintenance.Snapshots.commit(dir, v2Files)
        val tgtSchema = StructType(baseSchema.fields :+
          StructField("act", StringType))
        val survived = graft.maintenance.Snapshots
          .readAsOf(s, dir, tgtSchema, v1 + 1)
          .groupBy("act")
          .agg(count(lit(1)).as("n"), sum6(col("value")).as("sum_v6"))
        val gone = merged.where(col("act").isin("delete", "noop"))
          .groupBy("act")
          .agg(count(lit(1)).as("n"),
            lit(null).cast(LongType).as("sum_v6"))
        survived.unionAll(gone).orderBy("act")
      }),

    // Z-order rewrite + pruned box query graded end-to-end (round 10
    // second wave) — the OPTIMIZE ZORDER maintenance op every lakehouse
    // runs so multi-dimensional range queries touch few files: the
    // table is rewritten partitioned by the Morton bucket zb = z div
    // 1024 (eo_zorder's interleave, 64 dirs, repartition(zb) ⇒ exactly
    // one file per nonempty dir — each key lives in one task), then a
    // fixed box query (x ∈ [32,79], y ∈ [8,71]) is PLANNED into its
    // bucket list from a GENERATED 2-D grid — never by scanning data,
    // the z-range-decomposition step — and executed as `zb IN (plan)`
    // (directory/partition pruning) AND the exact residual predicate.
    // Graded: the row truth of the box, n_files = COUNT(DISTINCT
    // input_file_name) over matched rows — which the one-file-per-
    // bucket layout makes equal to the number of DISTINCT buckets
    // holding matching rows, the clustering law itself — and
    // n_planned = the planning grid's bucket count (pruning upper
    // bound, oracled by the same arithmetic). A rewrite that broke
    // z-locality or a planner that missed a bucket breaks the hash.
    // BUILD-TIME SIDE EFFECT: writes + rewrites a temp table at
    // plan-construction time (the maint_compact discipline).
    Q("maint_zorder_rewrite", Some {
      val x = "(event_id % 256)"; val y = "(user_id % 256)"
      val z = (0 until 8).map(b =>
        s"((($x >> $b) & 1) << ${2 * b}) + ((($y >> $b) & 1) << ${2 * b + 1})")
        .mkString(" + ")
      val zg = (0 until 8).map(b =>
        s"(((gx >> $b) & 1) << ${2 * b}) + (((gy >> $b) & 1) << ${2 * b + 1})")
        .mkString(" + ")
      "WITH zk AS (SELECT event_id, user_id, value, " +
        s"CAST(($z) // 1024 AS BIGINT) AS zb FROM events), " +
        "m AS (SELECT * FROM zk WHERE (event_id % 256) BETWEEN 32 AND 79 " +
        "AND (user_id % 256) BETWEEN 8 AND 71), " +
        s"plan AS (SELECT DISTINCT CAST(($zg) // 1024 AS BIGINT) AS zb " +
        "FROM (SELECT UNNEST(RANGE(32, 80)) AS gx) a, " +
        "(SELECT UNNEST(RANGE(8, 72)) AS gy) b) " +
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        sqlSum6("value") + " AS sum_v6, " +
        "CAST(COUNT(DISTINCT zb) AS BIGINT) AS n_files, " +
        "CAST((SELECT COUNT(*) FROM plan) AS BIGINT) AS n_planned FROM m"
    },
      (s, d) => {
        val dir = graft.GraftTmp.dir("zorder")
        graft.maintenance.Compaction.deleteRecursively(
          java.nio.file.Paths.get(dir))
        def morton(x: org.apache.spark.sql.Column,
            y: org.apache.spark.sql.Column) =
          (0 until 8).map { b =>
            (shiftright(x, b).bitwiseAND(lit(1)) * lit(1L << (2 * b))) +
              (shiftright(y, b).bitwiseAND(lit(1)) * lit(1L << (2 * b + 1)))
          }.reduce(_ + _)
        // the rewrite: cluster by Morton bucket, one file per bucket dir
        T.events(s, d)
          .select(col("event_id"), col("user_id"), col("value"))
          .withColumn("zb",
            (morton(col("event_id") % 256, col("user_id") % 256) / 1024)
              .cast("long"))
          .repartition(col("zb"))
          .write.mode("overwrite").partitionBy("zb").parquet(dir)
        // plan the box into buckets from a GENERATED grid (no data scan)
        val grid = s.range(32, 80).select(col("id").as("gx"))
          .crossJoin(s.range(8, 72).select(col("id").as("gy")))
          .select((morton(col("gx"), col("gy")) / 1024).cast("long").as("zb"))
          .distinct()
        val planned = grid.collect().map(_.getLong(0)).sorted // ≤64 buckets
        val snap = StructType(Seq(
          StructField("event_id", LongType),
          StructField("user_id", LongType),
          StructField("value", DoubleType),
          StructField("zb", LongType)))
        val back = s.read.schema(snap).parquet(dir)
          .where(col("zb").isin(planned: _*))
          .where((col("event_id") % 256).between(32, 79) &&
            (col("user_id") % 256).between(8, 71))
          .withColumn("_file", input_file_name())
        back.agg(
            count(lit(1)).as("n_rows"),
            sum6(col("value")).as("sum_v6"),
            countDistinct(col("_file")).as("n_files"),
            lit(planned.length.toLong).as("n_planned"))
      }),

    // Change data feed between snapshots (round 10, fourth wave) — the
    // Delta CDF / Iceberg changelog read completing the lifecycle:
    // commit → as-of → rollback → vacuum → merge → DIFF. Two per-
    // (user, event_type) aggregate snapshots are committed through
    // Snapshots (v2's transform: error cells dropped ⇒ DELETEs, odd-id
    // view events removed ⇒ UPDATEs with both images, per-user 'total'
    // cells added ⇒ INSERTs, everything else ⇒ unchanged — all four
    // classes nonempty on this corpus at both SFs), then
    // Snapshots.diff classifies every key via ONE co-partitioned full
    // outer join of the two as-of reads and emits the Delta-style
    // update_preimage/update_postimage row pair. The graded frame
    // aggregates per change_type, so a misclassified key moves integer
    // mass between rows and breaks the hash. BUILD-TIME SIDE EFFECT:
    // writes + commits a temp table at plan-construction time.
    Q("maint_snapshot_diff", Some {
      val aggCols = "CAST(COUNT(*) AS BIGINT) AS n, " +
        sqlSum6("value") + " AS v6"
      "WITH a AS (SELECT user_id, event_type AS et, " + aggCols +
        " FROM events GROUP BY user_id, et), " +
        "b AS (SELECT user_id, event_type AS et, " + aggCols +
        " FROM events WHERE event_type <> 'error' AND " +
        "(event_type <> 'view' OR event_id % 2 = 0) GROUP BY user_id, et " +
        "UNION ALL SELECT user_id, 'total' AS et, " + aggCols +
        " FROM events WHERE event_type <> 'error' GROUP BY user_id), " +
        "j AS (SELECT COALESCE(a.user_id, b.user_id) AS uid, " +
        "a.n AS an, a.v6 AS av6, b.n AS bn, b.v6 AS bv6, " +
        "CASE WHEN a.user_id IS NULL THEN 'i' WHEN b.user_id IS NULL THEN 'd' " +
        "WHEN a.n = b.n AND a.v6 = b.v6 THEN 'u0' ELSE 'u1' END AS cls " +
        "FROM a FULL OUTER JOIN b ON a.user_id = b.user_id AND a.et = b.et), " +
        "r AS (SELECT 'insert' AS change_type, uid, bn AS n, bv6 AS v6 FROM j WHERE cls = 'i' " +
        "UNION ALL SELECT 'delete', uid, an, av6 FROM j WHERE cls = 'd' " +
        "UNION ALL SELECT 'update_preimage', uid, an, av6 FROM j WHERE cls = 'u1' " +
        "UNION ALL SELECT 'update_postimage', uid, bn, bv6 FROM j WHERE cls = 'u1' " +
        "UNION ALL SELECT 'unchanged', uid, bn, bv6 FROM j WHERE cls = 'u0') " +
        "SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n_keys, " +
        "CAST(SUM(uid) AS BIGINT) AS sum_uid, CAST(SUM(n) AS BIGINT) AS sum_n, " +
        "CAST(SUM(v6) AS BIGINT) AS sum_v6 " +
        "FROM r GROUP BY change_type ORDER BY change_type"
    },
      (s, d) => {
        val dir = graft.GraftTmp.dir("cdf")
        graft.maintenance.Compaction.deleteRecursively(
          java.nio.file.Paths.get(dir))
        val snap = StructType(Seq(
          StructField("user_id", LongType),
          StructField("et", StringType),
          StructField("n", LongType),
          StructField("v6", LongType)))
        val ev = T.events(s, d)
        def cells(src: org.apache.spark.sql.DataFrame) =
          src.groupBy(col("user_id"), col("event_type").as("et"))
            .agg(count(lit(1)).as("n"), sum6(col("value")).as("v6"))
        cells(ev).write.mode("overwrite").parquet(dir)
        val v1 = graft.maintenance.Snapshots.commit(dir)
        val v1Files = graft.maintenance.Snapshots.files(dir, v1).toSet
        val nonErr = ev.where(col("event_type") =!= "error")
        val b0 = cells(nonErr.where(col("event_type") =!= "view" ||
          col("event_id") % 2 === 0))
        val bt = nonErr.groupBy("user_id")
          .agg(count(lit(1)).as("n"), sum6(col("value")).as("v6"))
          .select(col("user_id"), lit("total").as("et"), col("n"), col("v6"))
        b0.unionByName(bt).write.mode("append").parquet(dir)
        val v2Files = graft.maintenance.Snapshots.dataFiles(dir)
          .filterNot(v1Files)
        val v2 = graft.maintenance.Snapshots.commit(dir, v2Files)
        graft.maintenance.Snapshots
          .diff(s, dir, snap, v1, v2, Seq("user_id", "et"))
          .groupBy("change_type")
          .agg(count(lit(1)).as("n_keys"), sum("user_id").as("sum_uid"),
            sum("n").as("sum_n"), sum("v6").as("sum_v6"))
          .orderBy("change_type")
      }),

    // File-level min/max data skipping (round 10) — the OTHER half of
    // the lakehouse pruning story: maint_zorder prunes on a clustered
    // partition VALUE, this key prunes on collected per-file COLUMN
    // STATISTICS, the mechanism behind Delta/Iceberg manifests and
    // parquet row-group skipping. The table is range-clustered into 16
    // bucket files (one write job: repartition on the bucket key +
    // partitionBy splits one file per bucket dir), a stats manifest
    // (file → min/max event_id, ≤16 rows — bounded driver state) is
    // collected, and a BETWEEN query is planned manifest-first: only
    // files whose [min,max] overlaps the predicate are handed to the
    // reader. Graded on both axes: n_files proves the plan touched 3 of
    // 16 files (the oracle derives the same count from bucket-group
    // min/max — identical by construction since file contents ARE the
    // bucket contents), and the aggregate proves the skipped files held
    // nothing the query needed. All bounds are data-driven integer
    // arithmetic (w = ⌈(max+1)/16⌉, lo = 3w, hi = 5w + w/2), so the key
    // is SF-invariant. BUILD-TIME SIDE EFFECT: writes + reads a temp
    // table at plan-construction time (the maint_compact discipline).
    Q("maint_stats_skip", Some(
      "WITH m AS (SELECT (MAX(event_id) + 16) // 16 AS w FROM events), " +
        "b AS (SELECT 3 * w AS lo, 5 * w + w // 2 AS hi FROM m), " +
        "f AS (SELECT event_id // m.w AS bk, MIN(event_id) AS mn, " +
        "MAX(event_id) AS mx FROM events, m GROUP BY bk), " +
        "sel AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_files FROM f, b " +
        "WHERE f.mn <= b.hi AND f.mx >= b.lo), " +
        "ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(SUM(event_id) AS BIGINT) AS sum_id, " +
        sqlSum6("value") + " AS sum_v6 " +
        "FROM events, b WHERE event_id BETWEEN b.lo AND b.hi) " +
        "SELECT sel.n_files, ag.n_rows, ag.sum_id, ag.sum_v6 FROM sel, ag"),
      (s, d) => {
        val dir = graft.GraftTmp.dir("statsskip")
        graft.maintenance.Compaction.deleteRecursively(
          java.nio.file.Paths.get(dir))
        val ev = T.events(s, d).select("event_id", "value")
        val mx = ev.agg(max("event_id")).head.getLong(0)
        val w = (mx + 16) / 16
        ev.withColumn("b", expr(s"event_id DIV $w"))
          .repartition(16, col("b"))
          .write.mode("overwrite").partitionBy("b").parquet(dir)
        val snap = StructType(Seq(
          StructField("event_id", LongType),
          StructField("value", DoubleType),
          StructField("b", LongType)))
        // stats collection: one pass builds the (file, min, max) manifest
        val manifest = s.read.schema(snap).parquet(dir)
          .withColumn("_file", input_file_name())
          .groupBy("_file")
          .agg(min("event_id").as("mn"), max("event_id").as("mxv"))
          .collect() // ≤16 rows — manifest-sized, never data-sized
        val (lo, hi) = (3 * w, 5 * w + w / 2)
        val selected = manifest
          .filter(r => r.getLong(1) <= hi && r.getLong(2) >= lo)
          .map(_.getString(0)).sorted
        val fileSchema = StructType(Seq(
          StructField("event_id", LongType),
          StructField("value", DoubleType)))
        s.read.schema(fileSchema).parquet(selected: _*)
          .where(col("event_id").between(lo, hi))
          .agg(
            lit(selected.length.toLong).as("n_files"),
            count(lit(1)).as("n_rows"),
            sum(col("event_id")).as("sum_id"),
            sum6(col("value")).as("sum_v6"))
      }),

    // Partition-spec EVOLUTION (round 12) — the Iceberg marquee feature
    // [PK Iceberg spec §partition-evolution] none of the other maint
    // keys touch: a long-lived table changes its partition layout
    // WITHOUT rewriting history. First-half events commit under the v1
    // spec (one directory per 86400-s day); the spec then evolves and
    // second-half events commit under v2 (one directory per 30-day
    // month) — both vintages coexist and a reader must plan each
    // vintage under ITS OWN spec. Graded per layout: the partition
    // census (total dirs written / dirs surviving the mid-span range
    // prune — pure functions of the data, so the oracle derives them
    // from events arithmetic) and the row truth (count + order-free s6
    // sum of in-range rows read back THROUGH the pruned layout). A lost
    // vintage, a mis-derived partition value, or pruning against the
    // wrong spec all break the hash; the spec additionally proves the
    // prune is physical (inputFiles strictly shrink). BUILD-TIME SIDE
    // EFFECT: writes both vintages at plan-construction time.
    Q("maint_partition_evolution", Some(
      "WITH te AS (SELECT CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS te, value FROM events), " +
        "mm AS (SELECT MIN(te) AS mn, MAX(te) AS mx, (MIN(te) + MAX(te)) // 2 AS tm FROM te), " +
        "rg AS (SELECT mn + (mx - mn) // 4 AS lo, mn + ((mx - mn) * 3) // 4 AS hi FROM mm), " +
        "d AS (SELECT te, value, te // 86400 AS day, te // 86400 // 30 AS mon FROM te), " +
        "v1 AS (SELECT 'v1_day' AS layout, " +
        "CAST(COUNT(DISTINCT day) AS BIGINT) AS n_parts, " +
        "CAST(COUNT(DISTINCT CASE WHEN day BETWEEN (SELECT lo FROM rg) // 86400 " +
        "AND (SELECT hi FROM rg) // 86400 THEN day END) AS BIGINT) AS n_pruned, " +
        "CAST(COUNT(CASE WHEN te BETWEEN (SELECT lo FROM rg) AND (SELECT hi FROM rg) THEN 1 END) AS BIGINT) AS n_rows, " +
        "CAST(SUM(CASE WHEN te BETWEEN (SELECT lo FROM rg) AND (SELECT hi FROM rg) " +
        "THEN " + sqlS6("value") + " ELSE 0 END) AS BIGINT) AS sum_v6 " +
        "FROM d WHERE te <= (SELECT tm FROM mm)), " +
        "v2 AS (SELECT 'v2_month' AS layout, " +
        "CAST(COUNT(DISTINCT mon) AS BIGINT) AS n_parts, " +
        "CAST(COUNT(DISTINCT CASE WHEN mon BETWEEN (SELECT lo FROM rg) // 86400 // 30 " +
        "AND (SELECT hi FROM rg) // 86400 // 30 THEN mon END) AS BIGINT) AS n_pruned, " +
        "CAST(COUNT(CASE WHEN te BETWEEN (SELECT lo FROM rg) AND (SELECT hi FROM rg) THEN 1 END) AS BIGINT) AS n_rows, " +
        "CAST(SUM(CASE WHEN te BETWEEN (SELECT lo FROM rg) AND (SELECT hi FROM rg) " +
        "THEN " + sqlS6("value") + " ELSE 0 END) AS BIGINT) AS sum_v6 " +
        "FROM d WHERE te > (SELECT tm FROM mm)) " +
        "SELECT * FROM v1 UNION ALL SELECT * FROM v2 ORDER BY layout"),
      (s, d) => {
        val dir = graft.GraftTmp.dir("part_evo")
        graft.maintenance.Compaction.deleteRecursively(
          java.nio.file.Paths.get(dir))
        val ev = T.events(s, d)
          .select(epochS(col("ts")).as("te"), col("value"))
          .withColumn("day", expr("te div 86400"))
          .withColumn("mon", expr("te div 86400 div 30"))
        val Array(mn, mx) = ev.agg(min("te"), max("te"))
          .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
        val tm = Math.floorDiv(mn + mx, 2L)
        val lo = mn + (mx - mn) / 4
        val hi = mn + (mx - mn) * 3 / 4
        // v1 spec: day partitions; v2 spec: 30-day-month partitions
        ev.where(col("te") <= tm).withColumn("pday", col("day"))
          .write.partitionBy("pday").mode("overwrite").parquet(s"$dir/v1")
        ev.where(col("te") > tm).withColumn("pmon", col("mon"))
          .write.partitionBy("pmon").mode("overwrite").parquet(s"$dir/v2")
        // read back: each vintage pruned under ITS OWN spec
        def side(layout: String, sub: String, pcol: String,
            ploLit: Long, phiLit: Long): DataFrame = {
          val full = s.read.parquet(s"$dir/$sub")
          val pruned = full.where(col(pcol).between(ploLit, phiLit))
          val stats = pruned
            .where(col("te").between(lo, hi))
            .agg(coalesce(count(lit(1)), lit(0L)).as("n_rows"),
              coalesce(sum(s6(col("value"))), lit(0L)).as("sum_v6"))
          full.select(countDistinct(col(pcol)).as("n_parts"))
            .crossJoin(pruned.select(countDistinct(col(pcol)).as("n_pruned")))
            .crossJoin(stats)
            .select(lit(layout).as("layout"), col("n_parts"),
              col("n_pruned"), col("n_rows"), col("sum_v6"))
        }
        side("v1_day", "v1", "pday", lo / 86400, hi / 86400)
          .unionAll(side("v2_month", "v2", "pmon", lo / 86400 / 30, hi / 86400 / 30))
          .orderBy("layout")
      }),

    // Incremental materialized-view refresh (round 12, third wave)
    // [PK: Delta/Snowflake/Materialize incremental view maintenance —
    // the additive-aggregate case]: a per-type (count, Σcents) view is
    // materialized at v1; v2 appends new data files; the refresh reads
    // ONLY the delta files (the Snapshots manifest diff — never a full
    // rescan), partial-aggregates them, and MERGES into the stored
    // view by additive union (outer union + sum — the classic IVM
    // delta rule for SUM/COUNT). Graded per version: the view rows AND
    // n_files_read, where the refresh lane's 1 (vs the base build's 2)
    // PROVES the incrementality is physical — both vintages' files sit
    // in one directory and the refresh must touch only the delta (the
    // maint_wap exactly-n-files census trick). The oracle recomputes
    // both vintages from event arithmetic; a refresh that dropped the
    // stored view, double-applied the delta, or rescanned everything
    // breaks rows or the file census. BUILD-TIME SIDE EFFECT: commits
    // a temp table + materializes the view twice at plan-construction
    // time.
    Q("maint_incremental_view", Some(
      "WITH te AS (SELECT event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t, value FROM events), " +
        "mm AS (SELECT (MIN(t) + MAX(t)) // 2 AS tm FROM te), " +
        "v1 AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(" + sqlS2("value") + ") AS BIGINT) AS sum_c2 " +
        "FROM te WHERE t <= (SELECT tm FROM mm) GROUP BY event_type), " +
        "v2 AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(" + sqlS2("value") + ") AS BIGINT) AS sum_c2 " +
        "FROM te GROUP BY event_type) " +
        "SELECT 'v1_build' AS phase, event_type, n, sum_c2, CAST(2 AS BIGINT) AS n_files_read FROM v1 " +
        "UNION ALL SELECT 'v2_incr', event_type, n, sum_c2, CAST(1 AS BIGINT) FROM v2 " +
        "ORDER BY phase, event_type"),
      (s, d) => {
        val dir = graft.GraftTmp.dir("ivm")
        graft.maintenance.Compaction.deleteRecursively(
          java.nio.file.Paths.get(dir))
        val S = graft.maintenance.Snapshots
        val snap = StructType(eventsProj.fields :+
          StructField("event_type", StringType) :+
          StructField("te", LongType))
        val ev = T.events(s, d)
          .select(col("event_id"), col("user_id"), col("value"),
            col("event_type"), epochS(col("ts")).as("te"))
        val Array(mn, mx) = ev.agg(min(col("te")), max(col("te")))
          .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
        val tm = Math.floorDiv(mn + mx, 2L)
        ev.where(col("te") <= tm).repartition(2)
          .write.mode("overwrite").parquet(dir)
        val v1 = S.commit(dir)
        val v1Files = S.files(dir, v1).toSet
        def agg(frame: DataFrame) = frame
          .withColumn("_f", input_file_name())
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(s2(col("value"))).as("sum_c2"),
            countDistinct(col("_f")).as("nf"))
        // v1 build: full scan of the v1 snapshot → the stored view
        val mv1 = agg(S.readAsOf(s, dir, snap, v1))
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        // v2: the second half lands as ONE new file
        ev.where(col("te") > tm).coalesce(1)
          .write.mode("append").parquet(dir)
        val v2 = S.commit(dir)
        val deltaFiles = S.files(dir, v2).filterNot(v1Files)
        require(deltaFiles.size == 1, s"delta census: $deltaFiles")
        // incremental refresh: partial-agg ONLY the delta files, then
        // the additive outer merge into the stored view
        val delta = agg(s.read.schema(snap)
          .parquet(deltaFiles.map(f => s"$dir/$f"): _*))
          .transform(Cached(_))
        // The oracle hardcodes n_files_read=1 for every v2_incr type, so
        // every stored-view type must appear in the delta half — assert it
        // at build time so a corpus regeneration fails loudly, not as an
        // opaque hash mismatch (coalesce(nf2,0) would grade 0 vs 1).
        val uncov = mv1.select(col("event_type"))
          .except(delta.select(col("event_type"))).count()
        require(uncov == 0,
          s"ivm delta census: $uncov stored-view event_type(s) have no delta rows")
        val merged = mv1.select(col("event_type"), col("n").as("n1"),
            col("sum_c2").as("s1"))
          .join(delta.select(col("event_type"), col("n").as("n2"),
            col("sum_c2").as("s2"), col("nf").as("nf2")), Seq("event_type"), "full_outer")
          .select(col("event_type"),
            (coalesce(col("n1"), lit(0L)) + coalesce(col("n2"), lit(0L))).as("n"),
            (coalesce(col("s1"), lit(0L)) + coalesce(col("s2"), lit(0L))).as("sum_c2"),
            coalesce(col("nf2"), lit(0L)).as("nf"))
        def shape(phase: String, frame: DataFrame) =
          frame.select(lit(phase).as("phase"), col("event_type"),
            col("n"), col("sum_c2"), col("nf").as("n_files_read"))
        shape("v1_build", mv1).unionAll(shape("v2_incr", merged))
          .orderBy("phase", "event_type")
      }),

    // Write-audit-publish graded end-to-end (round 12, third wave) —
    // the Iceberg WAP branch workflow [PK: Iceberg spark.wap.branch /
    // fast_forward], the deploy gate every production lake runs: new
    // data lands on a STAGING branch, an audit query validates it
    // there, and only then does `main` fast-forward — consumers pinned
    // to main never see unaudited rows, even though the staged files
    // are already physically in the table directory. Census per stage:
    //   1 main@pre-publish  = first-half rows only (2 files),
    //   2 audit branch      = all staged rows (3 files),
    //   3 main@post-publish = all rows (3 files) — publish moved ONLY
    //     the ref (no new version, no manifest, no data file).
    // n_files comes from COUNT(DISTINCT input_file_name()) on each
    // read, so stage 1's `2` PROVES the isolation is physical — the
    // staged third file sits in the same directory and the main read
    // must not touch it (the repartition(2)/coalesce(1) writer counts
    // are the maint_vacuum exactly-n-files law). The audit gate itself
    // (staged rows all carry valid user_ids, row count strictly grows)
    // is asserted in the build and pinned by Round12OpsSpec. BUILD-TIME
    // SIDE EFFECT: writes, commits, branches and publishes a temp table
    // at plan-construction time.
    Q("maint_wap", Some(
      "WITH te AS (SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS te, value FROM events), " +
        "mm AS (SELECT (MIN(te) + MAX(te)) // 2 AS tm FROM te), " +
        "h1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        sqlSum6("value") + " AS sum_v6 FROM te WHERE te <= (SELECT tm FROM mm)), " +
        "al AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        sqlSum6("value") + " AS sum_v6 FROM te) " +
        "SELECT CAST(1 AS BIGINT) AS stage, n_rows, sum_v6, CAST(2 AS BIGINT) AS n_files FROM h1 " +
        "UNION ALL SELECT CAST(2 AS BIGINT), n_rows, sum_v6, CAST(3 AS BIGINT) FROM al " +
        "UNION ALL SELECT CAST(3 AS BIGINT), n_rows, sum_v6, CAST(3 AS BIGINT) FROM al " +
        "ORDER BY stage"),
      (s, d) => {
        val dir = graft.GraftTmp.dir("wap")
        graft.maintenance.Compaction.deleteRecursively(
          java.nio.file.Paths.get(dir))
        val S = graft.maintenance.Snapshots
        val ev = T.events(s, d)
          .select(col("event_id"), col("user_id"), col("value"),
            epochS(col("ts")).as("te"))
        val Array(mn, mx) = ev.agg(min(col("te")), max(col("te")))
          .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
        val tm = Math.floorDiv(mn + mx, 2L)
        val snap = StructType(eventsProj.fields :+
          StructField("te", LongType))
        // v1: audited history on main (exactly 2 files)
        ev.where(col("te") <= tm).repartition(2)
          .write.mode("overwrite").parquet(dir)
        val v1 = S.commit(dir)
        S.setRef(dir, "main", v1)
        // staged write: second half lands as 1 NEW file, committed as
        // v2 and branched — main does not move
        ev.where(col("te") > tm).coalesce(1)
          .write.mode("append").parquet(dir)
        val v2 = S.commit(dir)
        S.setRef(dir, "audit", v2)
        def census(stage: Int, frame: DataFrame) =
          frame.withColumn("_f", input_file_name())
            .agg(count(lit(1)).as("n_rows"), sum6(col("value")).as("sum_v6"),
              countDistinct(col("_f")).as("n_files"))
            .select(lit(stage.toLong).as("stage"), col("n_rows"),
              col("sum_v6"), col("n_files"))
        val mainPre = census(1, S.readRef(s, dir, snap, "main"))
        val audit = S.readRef(s, dir, snap, "audit")
        // the audit gate: staged rows are well-formed and the branch
        // strictly extends main — only then may main fast-forward
        val Array(nBadIds, nAudit) = audit
          .agg(sum(when(col("user_id").isNull || col("user_id") < 0, 1L)
            .otherwise(0L)), count(lit(1)))
          .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
        val nMain = S.readRef(s, dir, snap, "main").count()
        require(nBadIds == 0 && nAudit > nMain,
          s"WAP audit failed: bad_ids=$nBadIds audit=$nAudit main=$nMain")
        val published = S.publish(dir, "audit", "main")
        require(published == v2 && S.latestVersion(dir) == v2,
          "publish must be metadata-only (no new snapshot version)")
        val auditC = census(2, audit)
        val mainPost = census(3, S.readRef(s, dir, snap, "main"))
        mainPre.unionAll(auditC).unionAll(mainPost).orderBy("stage")
      }))
}
