package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.Tables

/** Non-graded Structured Streaming demonstration (SURVEY §3.11): the graded
  * batch twins' expressions running under readStream/writeStream.
  *
  * Reads the static events parquet as a file-stream source (no Kafka jar in
  * this environment — SURVEY §0.3), applies: watermarked 1h tumbling
  * aggregation, dropDuplicates on event_id, and a flatMapGroupsWithState
  * per-user running total, each into a memory sink, processing all
  * available data then stopping.
  *
  * Run: sbt "runMain graft.streaming.StreamingDemo /root/testdata/sf0.001"
  */
object StreamingDemo {

  case class Ev(event_id: Long, user_id: Long, value: Double, tsec: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // scale-grade state backend: RocksDB keeps watermark/dedup/session
    // state off-heap and spillable — at archive scale the HDFS-backed
    // in-memory store OOMs on wide key spaces; this is the cluster conf
    // (rocksdbjni ships with Spark 4), exercised here by all five queries
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._

    // file-stream source needs a directory: stage the events file into a
    // landing dir (the realistic arrival pattern), same declared schema
    val landing = java.nio.file.Files.createTempDirectory("graft_landing")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      landing.resolve("events.parquet"))
    // probe the footer the same way Tables.events does: `ts` has shipped
    // as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across corpus versions
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val onDisk = spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    val rawStream = spark.readStream
      .schema(Tables.eventsSchemaWith(onDisk))
      .parquet(landing.toString)
    val stream = onDisk match {
      case org.apache.spark.sql.types.LongType =>
        rawStream.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _ => rawStream.withColumn("ts", col("ts").cast("timestamp"))
    }

    // 1) watermark + tumbling window (streaming shape of stream_tumble/late)
    val tumble = stream
      .withWatermark("ts", "1 hour")
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_val"))
    val q1 = tumble.writeStream.format("memory").queryName("demo_tumble")
      .outputMode(OutputMode.Update()).trigger(Trigger.AvailableNow()).start()

    // 2) exactly-once by event_id within the watermark
    val dedup = stream.withWatermark("ts", "1 hour").dropDuplicates("event_id")
    val q2 = dedup.select("event_id", "user_id").writeStream.format("memory")
      .queryName("demo_dedup").outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()

    // 3) custom state: per-user running total via flatMapGroupsWithState
    val updateState = (user: Long, rows: Iterator[Ev], state: GroupState[Double]) => {
      var total = state.getOption.getOrElse(0.0)
      val out = rows.toSeq.sortBy(e => (e.tsec, e.event_id)).map { e =>
        total += e.value
        (e.event_id, user, total)
      }
      state.update(total)
      out.iterator
    }
    val running = stream
      .select(col("event_id"), col("user_id"), col("value"),
        unix_timestamp(col("ts")).as("tsec"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(updateState)
      .toDF("event_id", "user_id", "run_total")
    val q3 = running.writeStream.format("memory").queryName("demo_runtotal")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()

    // 4) session windows (30-min gap), the streaming shape of stream_session
    val sess = stream
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
    val q4 = sess.writeStream.format("memory").queryName("demo_session")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()

    // 5) stream-stream interval join with watermarks on BOTH sides (the
    // streaming shape of join_interval): each purchase joined to the same
    // user's clicks within the following 5 minutes. State on both sides is
    // bounded by the watermark + the time-range condition — the canonical
    // Structured Streaming join pattern.
    val purchases = stream.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = stream.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val joined = purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") &&
        col("c_ts") <= col("p_ts") + expr("INTERVAL 5 MINUTES"))
    val q5 = joined.select("p_id", "c_id").writeStream.format("memory")
      .queryName("demo_sjoin").outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()

    Seq(q1, q2, q3, q4, q5).foreach(_.awaitTermination(120000))
    println(s"demo_tumble rows:   ${spark.table("demo_tumble").count()}")
    println(s"demo_dedup rows:    ${spark.table("demo_dedup").count()}")
    println(s"demo_runtotal rows: ${spark.table("demo_runtotal").count()}")
    println(s"demo_session rows:  ${spark.table("demo_session").count()}")
    // self-check: the stream-stream join must equal its batch twin
    val batchTwin = {
      val ev = Tables.events(spark, sfDir)
      val p = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("p_id"), col("ts").as("p_ts"))
      val c = ev.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("c_id"), col("ts").as("c_ts"))
      p.join(c, col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") &&
        col("c_ts") <= col("p_ts") + expr("INTERVAL 5 MINUTES")).count()
    }
    val streamed = spark.table("demo_sjoin").count()
    println(s"demo_sjoin rows:    $streamed (batch twin: $batchTwin, " +
      (if (streamed == batchTwin) "MATCH" else "MISMATCH") + ")")
    spark.stop()
  }
}
