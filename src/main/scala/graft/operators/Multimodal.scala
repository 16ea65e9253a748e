package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.{Q, Tables => T}

/** Multimodal-column plumbing (BASELINE.json north star): image/audio/video
  * payloads as opaque `binary` columns plus typed metadata, with
  * decode / feature-extract / resize / frame-sample as per-partition batch
  * transforms.
  *
  * No media fixtures or codec libraries exist in this environment, so the
  * corpus's `documents.text` is cast to bytes as the stand-in payload and
  * the codec call is STUBBED with a deterministic fake (`fakeDecode`) —
  * clearly marked below. Everything around the stub is real and tested:
  * the schema contract (binary + metadata struct), the `mapPartitions`
  * batch shape (one buffer reuse per partition, the Scala analogue of
  * mapInPandas batches), partition sizing, and the downstream relational
  * feature aggregation.
  *
  * At 100 TB: payloads stay columnar in parquet (binary column), metadata
  * predicates prune at the scan (format/width filters never touch bytes),
  * and decode parallelism = partition count — size partitions by
  * payload bytes (spark.sql.files.maxPartitionBytes), not row count.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("format", StringType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("frames_sampled", IntegerType),
    StructField("mean_intensity", DoubleType)))

  /** STUB — stands in for the real codec (image decode / audio PCM /
    * video frame extraction), which is not installable here. Deterministic:
    * derives pseudo pixel stats from the payload bytes themselves. A real
    * deployment swaps only this function; the Spark plumbing is unchanged. */
  def fakeDecode(payload: Array[Byte], format: String): (Int, Int, Int, Double) = {
    val n = payload.length
    val width = 16 + (n % 64)
    val height = 16 + ((n / 64) % 64)
    val frames = 1 + (n % 4)
    // "mean intensity": mean byte value over an 8-byte frame-sample stride
    var sum = 0L
    var cnt = 0
    var i = 0
    while (i < n) { sum += payload(i) & 0xff; cnt += 1; i += 8 }
    val mean = if (cnt == 0) 0.0 else sum.toDouble / cnt
    (width, height, frames, mean)
  }

  /** payload table: opaque bytes + typed metadata struct, the contract a
    * real media corpus would ship. */
  def payloads(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        struct(
          when(col("doc_id") % 3 === 0, "png")
            .when(col("doc_id") % 3 === 1, "jpeg")
            .otherwise("wav").as("format"),
          length(col("text")).cast("int").as("n_bytes"),
          col("source").as("origin")).as("meta"))

  /** Rows per codec batch inside mapPartitions — a real codec would hand
    * each buffer to one native call (the Scala analogue of mapInPandas'
    * Arrow batch size). */
  val batchSize = 256

  /** payload -> feature rows via the stubbed codec, batched per
    * partition; optionally pre-filtered on metadata only. */
  private def features(s: SparkSession, d: String,
      formats: Option[Seq[String]]): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    val base = formats.fold(payloads(s, d))(f =>
      payloads(s, d).where(col("meta.format").isin(f: _*)))
    base
      .select(col("doc_id"), col("payload"), col("meta.format").as("format"),
        col("meta.n_bytes").as("n_bytes"))
      .mapPartitions { rows =>
        // Drain the partition in fixed-size buffers: decode a whole buffer
        // per "codec call", emit its rows, reuse for the next buffer.
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val payload = r.getAs[Array[Byte]]("payload")
            val format = r.getAs[String]("format")
            val (w, h, fr, mean) = fakeDecode(payload, format)
            Row(r.getAs[Long]("doc_id"), format, r.getAs[Int]("n_bytes"),
              w, h, fr, mean)
          }
        }
      }(enc)
  }

  val all: Seq[Q] = Seq(

    // Decode + feature-extract over batched partitions; metadata-only
    // predicate (format filter) is applied BEFORE touching payload bytes.
    Q("mm_decode_features", None,
      (s, d) => features(s, d, Some(Seq("png", "jpeg"))).orderBy("doc_id")),

    // Downstream relational consumption of extracted features: per-format
    // size/intensity profile.
    Q("mm_format_stats", None,
      (s, d) =>
        features(s, d, None).groupBy("format")
          .agg(
            count(lit(1)).as("n"),
            sum(col("n_bytes").cast("long")).as("total_bytes"),
            // per-element 6-dp canonicalization before the sum (Det rule 3:
            // an engine double AVG is merge-order-dependent)
            graft.Det.mean6(col("mean_intensity")).as("avg_intensity"))
          .orderBy("format")),

    // Resize: payload -> smaller payload + updated metadata, batched per
    // partition like decode (a real codec resamples pixels; the stub
    // stride-samples bytes to a deterministic 32x32 thumbnail). The
    // Spark-side contract — binary in, binary out, metadata rewritten as
    // top-level scalar columns, partition-batch shape — is the real part.
    // Metadata is FLAT (format/n_bytes/width/height scalars, not a nested
    // struct): flat scalars keep metadata predicates trivially pushable and
    // the output sortable by any generic consumer.
    Q("mm_resize", None,
      (s, d) => {
        val outSchema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("payload", BinaryType),
          StructField("format", StringType),
          StructField("n_bytes", IntegerType),
          StructField("width", IntegerType),
          StructField("height", IntegerType)))
        val enc = org.apache.spark.sql.Encoders.row(outSchema)
        val (tw, th) = (32, 32)
        payloads(s, d)
          .where(col("meta.format").isin("png", "jpeg")) // metadata-only prune
          .select(col("doc_id"), col("payload"), col("meta.format").as("format"))
          .mapPartitions { rows =>
            // Batch shape: drain the partition in fixed-size buffers (the
            // Scala analogue of mapInPandas' Arrow batches) so a real codec
            // can process a whole buffer per native call.
            rows.grouped(batchSize).flatMap { batch =>
              batch.map { r =>
                val p = r.getAs[Array[Byte]]("payload")
                // STUB resample: stride-sample the source bytes onto the
                // tw*th target grid (deterministic; a codec swap point)
                val out = Array.tabulate(tw * th)(i =>
                  if (p.isEmpty) 0.toByte else p((i.toLong * p.length / (tw * th)).toInt))
                Row(r.getAs[Long]("doc_id"), out,
                  r.getAs[String]("format"), out.length, tw, th)
              }
            }
          }(enc)
          .orderBy("doc_id")
      }),

    // Frame sampling: every k-th fixed-size byte window of a "video"
    // payload becomes its own row — pure column math (sequence +
    // transform + binary substring + posexplode), NO udf/mapPartitions:
    // offset arithmetic doesn't need a codec, so it stays codegen'd.
    Q("mm_frame_sample", None,
      (s, d) => {
        val frameBytes = 64
        val stride = 4 // sample every 4th frame
        val nFrames = (length(col("payload")) / (frameBytes * stride)).cast("int")
        payloads(s, d)
          .where(col("meta.format") === "wav") // metadata-only prune
          .where(nFrames > 0)
          .select(col("doc_id"),
            posexplode(transform(
              sequence(lit(0), nFrames - 1),
              i => col("payload").substr(i * frameBytes * stride + 1, lit(frameBytes))))
              .as(Seq("frame_idx", "frame")))
          .select(col("doc_id"), col("frame_idx"),
            (col("frame_idx") * frameBytes * stride).cast("long").as("byte_offset"),
            length(col("frame")).cast("int").as("frame_bytes"),
            col("frame"))
          .orderBy("doc_id", "frame_idx")
      }))
}
