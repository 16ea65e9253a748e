package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Declared schemas + loaders for the driver-generated corpus
  * under /root/testdata/sf0.001 .. sf0.1 (measured in FIXTURES.md).
  *
  * Schemas are always declared, never inferred (SURVEY.md §2.2): inference
  * costs a footer pass per query and can disagree with the DuckDB oracle's
  * view of the same files. This mirrors the reference's fixed per-product
  * "measurement spec" schema discipline (SURVEY §2.1) — and at 100 TB a
  * schema-declared scan also skips the file-listing + sampling step.
  *
  * Note `events.ts` has shipped as BOTH timestamp[ns] (rounds 1-8) and
  * timestamp[us] (round 9 regeneration) across driver corpus versions, so
  * [[events]] probes the footer type per path instead of hard-coding the
  * ns→µs conversion; both engines agree at µs either way (graded outputs
  * still project whole seconds, SURVEY §8.2).
  */
object Tables {

  val lineitemSchema: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  val ordersSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val customerSchema: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplierSchema: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val partSchema: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val nationSchema: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val regionSchema: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  /** Logical schema after [[events]] normalizes `ts` (see
    * [[eventsSchemaWith]] for the on-disk variants). */
  val eventsSchema: StructType = eventsSchemaWith(TimestampType)

  /** On-disk `ts` has two corpus variants: INT64 TIMESTAMP(NANOS) (read as
    * raw-nanos LongType via the `nanosAsLong` legacy conf, then floor-div
    * 1000 → µs, matching DuckDB's ns→µs truncation) and plain
    * TIMESTAMP(MICROS) (possibly NTZ). [[events]] probes the footer once
    * per path and declares the matching type. */
  def eventsSchemaWith(ts: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", ts),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private val schemas: Map[String, StructType] = Map(
    "lineitem" -> lineitemSchema,
    "orders" -> ordersSchema,
    "customer" -> customerSchema,
    "supplier" -> supplierSchema,
    "part" -> partSchema,
    "nation" -> nationSchema,
    "region" -> regionSchema,
    "events" -> eventsSchema,
    "documents" -> documentsSchema,
    "embeddings" -> embeddingsSchema)

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.schema(schemas(name)).parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** Footer-probed `ts` type per events path (one footer read per path per
    * JVM; the probe itself needs `nanosAsLong` set so a NANOS column infers
    * as LongType instead of erroring). */
  private val eventsTsType =
    new java.util.concurrent.ConcurrentHashMap[String, DataType]()

  /** NOTE: sets `spark.sql.legacy.parquet.nanosAsLong` on the session
    * (required to read an INT64(NANOS) `ts`; sticky session-wide — any
    * later ns-timestamp parquet read in the same session also sees longs).
    * This corpus has exactly one ns-capable column, so the trade is
    * intentional: the loader stays self-sufficient for whichever session
    * the driver constructs. The corpus has shipped `ts` as both
    * TIMESTAMP(NANOS) and TIMESTAMP(MICROS[,NTZ]); the footer probe picks
    * the conversion, and every downstream query sees a session-TZ µs
    * TimestampType either way. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$d/events.parquet"
    val onDisk = eventsTsType.computeIfAbsent(path,
      _ => s.read.parquet(path).schema("ts").dataType)
    val raw = s.read.schema(eventsSchemaWith(onDisk)).parquet(path)
    onDisk match {
      case LongType => // legacy TIMESTAMP(NANOS): floor-div matches DuckDB
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts DIV 1000)"))
      case TimestampType => raw
      case _ => // TIMESTAMP_NTZ: same wall-clock instant under the UTC session
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Streaming twin of [[events]]: a readStream over `landingDir` (where
    * the caller staged the events file) with the SAME footer-probed `ts`
    * conversion, so batch and executed-streaming keys see identical
    * instants. The probe reads the ORIGINAL corpus path under `d` (the
    * staged copy is byte-identical). */
  def eventsStream(s: SparkSession, d: String, landingDir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$d/events.parquet"
    val onDisk = eventsTsType.computeIfAbsent(path,
      _ => s.read.parquet(path).schema("ts").dataType)
    val rdr = s.readStream.schema(eventsSchemaWith(onDisk))
    // caps files per micro-batch (respected by Trigger.AvailableNow) —
    // the knob that lets an executed key stage MULTI-batch scenarios
    // (watermark progression between batches) from a static landing dir
    maxFilesPerTrigger.foreach(n => rdr.option("maxFilesPerTrigger", n))
    val raw = rdr.parquet(landingDir)
    onDisk match {
      case LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts DIV 1000)"))
      case TimestampType => raw
      case _ =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(TimestampType))
    }
  }
}
