package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.{Det, Q, Tables => T}

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
  * Round 6/7: all four keys carry DuckDB ORACLES — the stub's byte math is
  * deterministic arithmetic over the ASCII payload, so the oracle spells
  * the same strides/offsets with SUBSTRING/ASCII over the text (1 char ==
  * 1 byte). Binary-producing keys (mm_resize, mm_frame_sample) grade an
  * `md5(bytes)` hex digest + byte length rather than the raw BinaryType
  * column: the grading harness's pandas capture cannot sort bytearrays
  * (r6 err rows), and md5+length is content-equivalent (collision-proof
  * for grading purposes) while staying sortable on both engines. The raw
  * byte outputs remain asserted in MultimodalSpec. A real codec swap
  * would return these keys to property-only coverage — by then real
  * fixtures exist to grade against.
  *
  * Corpus contract (asserted by the oracle pairing, documented here): the
  * documents table holds NON-EMPTY ASCII text. The SUBSTRING/ASCII oracle
  * twin assumes 1 char == 1 byte (breaks on multi-byte UTF-8), and an
  * empty payload would diverge (fakeDecode/resize emit a zero row where
  * the oracle's stride CTE drops the doc). The driver-generated corpora
  * satisfy both; a real media corpus replaces the oracle entirely.
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

  /** Resize: payload -> smaller payload + updated metadata, batched per
    * partition like decode (a real codec resamples pixels; the stub
    * stride-samples bytes to a deterministic 32x32 thumbnail). Binary in,
    * binary out, metadata rewritten as FLAT scalar columns (pushable
    * predicates, sortable by any generic consumer). The graded key
    * projects md5 over this; MultimodalSpec asserts the bytes. */
  def resized(s: SparkSession, d: String): DataFrame = {
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
  }

  /** Frame sampling: every k-th fixed-size byte window of a "video"
    * payload becomes its own row — pure column math (sequence + transform
    * + binary substring + posexplode), NO udf/mapPartitions: offset
    * arithmetic doesn't need a codec, so it stays codegen'd. The graded
    * key projects md5 over the frame bytes; MultimodalSpec asserts them. */
  def frameSamples(s: SparkSession, d: String): DataFrame = {
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
  }

  /** 60-bit average-hash per "image" payload — 60 stride-sampled bytes,
    * bit b set iff sample_b exceeds the sample mean (integer-exact:
    * s_b * 60 > sum), built in the SAME mapPartitions codec-batch shape as
    * decode/resize (see mm_dedup_ahash's key comment for why higher-order
    * column expressions lost by 10x here). Returned PERSISTED: the pair /
    * band self-join's two sides and the budget guard all read one
    * materialization. BUILD-TIME SIDE EFFECT (ADVICE r7, the win_ntile
    * precedent): the cached hash table stays resident until the harness's
    * per-key clearCache (Bench/Verify) — callers embedding these keys in a
    * long-lived session should clearCache or unpersist once the pair join
    * has materialized. */
  private def ahashes(s: SparkSession, d: String): DataFrame = {
    val hashSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("format", StringType),
      StructField("ahash", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(hashSchema)
    payloads(s, d)
      .where(col("meta.format").isin("png", "jpeg")) // metadata prune
      .select(col("doc_id"), col("payload"), col("meta.format").as("format"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val p = r.getAs[Array[Byte]]("payload")
            // STUB "decode + ahash" in one codec call: stride-sample
            // 60 bytes, bit b set iff sample*60 > sample sum
            val sb = Array.tabulate(60)(b =>
              if (p.isEmpty) 0L else (p((b.toLong * p.length / 60).toInt) & 0xff).toLong)
            val tot = sb.sum
            var hash = 0L
            var b = 0
            while (b < 60) { if (sb(b) * 60 > tot) hash |= 1L << b; b += 1 }
            Row(r.getAs[Long]("doc_id"), r.getAs[String]("format"), hash)
          }
        }
      }(enc)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Oracle shared by mm_dedup_ahash and mm_dedup_ahash_banded: the banded
    * plan provably returns the exact key's pair set (see the banded key's
    * comment), so both grade against the one all-pairs SQL definition. */
  /** Integer DCT-II cosine table: DctQ(u)(y) = ⌊cos(π(2y+1)u/16)·2^14⌉,
    * generated ONCE and embedded as literals here AND in the mm_phash
    * oracle (built from this array) — no runtime cos on either engine,
    * so no libm ulp can flip a hash bit. */
  private val DctQ: Array[Array[Long]] = Array(
    Array(16384L, 16384L, 16384L, 16384L, 16384L, 16384L, 16384L, 16384L),
    Array(16069L, 13623L, 9102L, 3196L, -3196L, -9102L, -13623L, -16069L),
    Array(15137L, 6270L, -6270L, -15137L, -15137L, -6270L, 6270L, 15137L),
    Array(13623L, -3196L, -16069L, -9102L, 9102L, 16069L, 3196L, -13623L),
    Array(11585L, -11585L, -11585L, 11585L, 11585L, -11585L, -11585L, 11585L),
    Array(9102L, -16069L, 3196L, 13623L, -13623L, -3196L, 16069L, -9102L),
    Array(6270L, -15137L, 15137L, -6270L, -6270L, 15137L, -15137L, 6270L),
    Array(3196L, -9102L, 13623L, -16069L, 16069L, -13623L, 9102L, -3196L))

  /** pHash per payload: 8×8 stride thumbnail → exact-integer 2-D DCT-II
    * (DctQ coefficients, int64 throughout) → 63 AC coefficients bit-set
    * iff 63·c > Σ(AC) — the standard pHash recipe with the mean in
    * place of the median, integer-exact. Same codec-batch shape and
    * PERSIST lifecycle as [[ahashes]] (BUILD-TIME SIDE EFFECT — the
    * harness's per-key clearCache is the release point; see the
    * [[Cached]] scaladoc for the contract). */
  private def phashes(s: SparkSession, d: String): DataFrame = {
    val hashSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("format", StringType),
      StructField("phash", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(hashSchema)
    payloads(s, d)
      .where(col("meta.format").isin("png", "jpeg")) // metadata prune
      .select(col("doc_id"), col("payload"), col("meta.format").as("format"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val p = r.getAs[Array[Byte]]("payload")
            val n = p.length
            val smp = Array.tabulate(64)(i =>
              if (n == 0) 0L else (p((i.toLong * n / 64).toInt) & 0xff).toLong)
            val c = Array.ofDim[Long](8, 8)
            var u = 0
            while (u < 8) {
              var v = 0
              while (v < 8) {
                var acc = 0L
                var y = 0
                while (y < 8) {
                  var x = 0
                  while (x < 8) {
                    acc += DctQ(u)(y) * DctQ(v)(x) * smp(y * 8 + x)
                    x += 1
                  }
                  y += 1
                }
                c(u)(v) = acc
                v += 1
              }
              u += 1
            }
            var s63 = 0L
            for (u2 <- 0 until 8; v2 <- 0 until 8 if u2 != 0 || v2 != 0)
              s63 += c(u2)(v2)
            var hash = 0L
            for (u2 <- 0 until 8; v2 <- 0 until 8 if u2 != 0 || v2 != 0)
              if (c(u2)(v2) * 63 > s63) hash |= 1L << (u2 * 8 + v2 - 1)
            Row(r.getAs[Long]("doc_id"), r.getAs[String]("format"), hash)
          }
        }
      }(enc)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Oracle for mm_phash: the same integer DCT spelled relationally —
    * stride samples × the DctQ VALUES table twice → coefficient
    * partial agg → AC-mean threshold bits → banded-equivalent all-pairs
    * Hamming (the banded plan is pigeonhole-complete at radius 8 over
    * 9 bands of 7 bits, so one SQL definition grades it). */
  private val phashPairsSql: String = {
    val qRows = (for (u <- 0 until 8; y <- 0 until 8)
      yield s"($u, $y, ${DctQ(u)(y)})").mkString(", ")
    "WITH p AS (SELECT doc_id, text, CAST(LENGTH(text) AS INTEGER) AS n, " +
      "CASE WHEN doc_id % 3 = 0 THEN 'png' ELSE 'jpeg' END AS format " +
      "FROM documents WHERE doc_id % 3 IN (0, 1)), " +
      "smp AS (SELECT doc_id, format, i // 8 AS y, i % 8 AS x, " +
      "CAST(ASCII(SUBSTRING(text, CAST((i * n) // 64 AS INTEGER) + 1, 1)) AS BIGINT) AS sv " +
      "FROM p, (SELECT UNNEST(RANGE(0, 64)) AS i) ii), " +
      s"qt AS (SELECT * FROM (VALUES $qRows) AS q(u, y, qv)), " +
      "c AS (SELECT s.doc_id, s.format, qu.u AS u, qv.u AS v, " +
      "CAST(SUM(qu.qv * qv.qv * s.sv) AS BIGINT) AS cv " +
      "FROM smp s JOIN qt qu ON qu.y = s.y JOIN qt qv ON qv.y = s.x " +
      "GROUP BY s.doc_id, s.format, qu.u, qv.u), " +
      "t AS (SELECT doc_id, CAST(SUM(CASE WHEN u = 0 AND v = 0 THEN 0 ELSE cv END) AS BIGINT) AS s63 " +
      "FROM c GROUP BY doc_id), " +
      "h AS (SELECT c.doc_id, c.format, CAST(SUM(CASE WHEN c.u = 0 AND c.v = 0 THEN 0 " +
      "WHEN c.cv * 63 > t.s63 THEN CAST(1 AS BIGINT) << CAST(c.u * 8 + c.v - 1 AS INTEGER) " +
      "ELSE 0 END) AS BIGINT) AS ph " +
      "FROM c JOIN t ON t.doc_id = c.doc_id GROUP BY c.doc_id, c.format) " +
      "SELECT a.doc_id AS d1, b.doc_id AS d2, " +
      "CAST(BIT_COUNT(XOR(a.ph, b.ph)) AS INTEGER) AS hamming " +
      "FROM h a JOIN h b ON a.format = b.format AND a.doc_id < b.doc_id " +
      "WHERE BIT_COUNT(XOR(a.ph, b.ph)) <= 16 ORDER BY d1, d2"
  }

  private val ahashPairsSql: String =
    "WITH p AS (SELECT doc_id, text, CAST(LENGTH(text) AS INTEGER) AS n, " +
      "CASE WHEN doc_id % 3 = 0 THEN 'png' ELSE 'jpeg' END AS format " +
      "FROM documents WHERE doc_id % 3 IN (0, 1)), " +
      "s AS (SELECT doc_id, format, LIST_TRANSFORM(RANGE(0, 60), " +
      "b -> ASCII(SUBSTRING(text, CAST((b * n) // 60 AS INTEGER) + 1, 1))) AS sb FROM p), " +
      "t AS (SELECT doc_id, format, sb, CAST(LIST_SUM(sb) AS BIGINT) AS tot FROM s), " +
      "h AS (SELECT doc_id, format, CAST(LIST_SUM(LIST_TRANSFORM(RANGE(0, 60), " +
      "b -> CASE WHEN sb[CAST(b AS INTEGER) + 1] * 60 > tot " +
      "THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS ahash FROM t) " +
      "SELECT a.doc_id AS d1, b.doc_id AS d2, " +
      "CAST(BIT_COUNT(XOR(a.ahash, b.ahash)) AS INTEGER) AS hamming " +
      "FROM h a JOIN h b ON a.format = b.format AND a.doc_id < b.doc_id " +
      "WHERE BIT_COUNT(XOR(a.ahash, b.ahash)) <= 8 ORDER BY d1, d2"

  val all: Seq[Q] = Seq(

    // Decode + feature-extract over batched partitions; metadata-only
    // predicate (format filter) is applied BEFORE touching payload bytes.
    // The oracle replicates fakeDecode's byte arithmetic over the ASCII
    // text (stride-8 mean, n-derived dims): exact-integer sums, one
    // IEEE division — bit-identical across engines.
    Q("mm_decode_features", Some(
      "WITH p AS (SELECT doc_id, text, CAST(LENGTH(text) AS INTEGER) AS n, " +
        "CASE WHEN doc_id % 3 = 0 THEN 'png' ELSE 'jpeg' END AS format " +
        "FROM documents WHERE doc_id % 3 IN (0, 1)), " +
        "st AS (SELECT doc_id, UNNEST(RANGE(0, (n + 7) // 8)) AS k FROM p), " +
        "i AS (SELECT st.doc_id, SUM(ASCII(SUBSTRING(p.text, CAST(st.k * 8 AS INTEGER) + 1, 1))) AS ssum, " +
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM st JOIN p USING (doc_id) GROUP BY st.doc_id) " +
        "SELECT p.doc_id, p.format, p.n AS n_bytes, " +
        "CAST(16 + (p.n % 64) AS INTEGER) AS width, " +
        "CAST(16 + ((p.n // 64) % 64) AS INTEGER) AS height, " +
        "CAST(1 + (p.n % 4) AS INTEGER) AS frames_sampled, " +
        "CAST(i.ssum AS DOUBLE) / i.cnt AS mean_intensity " +
        "FROM p JOIN i USING (doc_id) ORDER BY doc_id"),
      (s, d) => features(s, d, Some(Seq("png", "jpeg"))).orderBy("doc_id")),

    // Downstream relational consumption of extracted features: per-format
    // size/intensity profile (same feature CTE as mm_decode_features, all
    // three formats; avg intensity on the 6-dp grid per Det rule 3).
    Q("mm_format_stats", Some(
      "WITH p AS (SELECT doc_id, text, CAST(LENGTH(text) AS INTEGER) AS n, " +
        "CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'wav' END AS format " +
        "FROM documents), " +
        "st AS (SELECT doc_id, UNNEST(RANGE(0, (n + 7) // 8)) AS k FROM p), " +
        "i AS (SELECT st.doc_id, SUM(ASCII(SUBSTRING(p.text, CAST(st.k * 8 AS INTEGER) + 1, 1))) AS ssum, " +
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM st JOIN p USING (doc_id) GROUP BY st.doc_id), " +
        "f AS (SELECT p.doc_id, p.format, p.n, CAST(i.ssum AS DOUBLE) / i.cnt AS mi " +
        "FROM p JOIN i USING (doc_id)) " +
        "SELECT format, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(CAST(n AS BIGINT)) AS BIGINT) AS total_bytes, " +
        Det.sqlMean6("mi") + " AS avg_intensity " +
        "FROM f GROUP BY format ORDER BY format"),
      (s, d) =>
        features(s, d, None).groupBy("format")
          .agg(
            count(lit(1)).as("n"),
            sum(col("n_bytes").cast("long")).as("total_bytes"),
            // per-element 6-dp canonicalization before the sum (Det rule 3:
            // an engine double AVG is merge-order-dependent)
            graft.Det.mean6(col("mean_intensity")).as("avg_intensity"))
          .orderBy("format")),

    // Multimodal quality gate (round 10, fifth wave) — the LAION-style
    // image-corpus funnel beside llm_quality_filter's C4 text funnel:
    // size, aspect-ratio and intensity rules with FIRST-FAIL reasons
    // (too_small → bad_aspect → too_dark → keep), rolled up per
    // (format, reason) so the funnel report is the graded surface. All
    // three rules are exact integer comparisons (the darkness rule is
    // ssum < 100·cnt — never a double mean); the stride sums come from
    // the SAME codec-batch mapPartitions boundary as fakeDecode (a real
    // decode swaps in without touching the classification). Threshold
    // 100 measured to fire all four classes at sf0.001/0.01/0.1.
    // Empty-payload caveat shared with mm_decode_features (module
    // scaladoc): the oracle's stride join drops zero-length docs.
    Q("mm_quality_filter", Some(
      "WITH p AS (SELECT doc_id, text, CAST(LENGTH(text) AS INTEGER) AS n, " +
        "CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'wav' END AS format " +
        "FROM documents), " +
        "st AS (SELECT doc_id, UNNEST(RANGE(0, (n + 7) // 8)) AS k FROM p), " +
        "i AS (SELECT st.doc_id, SUM(ASCII(SUBSTRING(p.text, CAST(st.k * 8 AS INTEGER) + 1, 1))) AS ssum, " +
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM st JOIN p USING (doc_id) GROUP BY st.doc_id), " +
        "f AS (SELECT p.doc_id, p.format, p.n, 16 + (p.n % 64) AS w, " +
        "16 + ((p.n // 64) % 64) AS h, i.ssum, i.cnt FROM p JOIN i USING (doc_id)), " +
        "r AS (SELECT format, n, CASE WHEN n < 300 THEN 'too_small' " +
        "WHEN 2 * w < h OR 2 * h < w THEN 'bad_aspect' " +
        "WHEN ssum < 100 * cnt THEN 'too_dark' ELSE 'keep' END AS reason FROM f) " +
        "SELECT format, reason, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(CAST(n AS BIGINT)) AS BIGINT) AS sum_bytes " +
        "FROM r GROUP BY format, reason ORDER BY format, reason"),
      (s, d) => {
        val qSchema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("format", StringType),
          StructField("n_bytes", IntegerType),
          StructField("w", IntegerType),
          StructField("h", IntegerType),
          StructField("ssum", LongType),
          StructField("cnt", LongType)))
        val enc = org.apache.spark.sql.Encoders.row(qSchema)
        val feats = payloads(s, d)
          .select(col("doc_id"), col("payload"),
            col("meta.format").as("format"), col("meta.n_bytes").as("n_bytes"))
          .mapPartitions { rows =>
            rows.grouped(batchSize).flatMap { batch =>
              batch.map { r =>
                val p = r.getAs[Array[Byte]]("payload")
                val n = p.length
                var sum = 0L; var cnt = 0L; var i = 0
                while (i < n) { sum += p(i) & 0xff; cnt += 1; i += 8 }
                Row(r.getAs[Long]("doc_id"), r.getAs[String]("format"),
                  r.getAs[Int]("n_bytes"), 16 + (n % 64), 16 + ((n / 64) % 64),
                  sum, cnt)
              }
            }
          }(enc)
        feats
          .select(col("format"), col("n_bytes"),
            when(col("n_bytes") < 300, "too_small")
              .when(lit(2) * col("w") < col("h") || lit(2) * col("h") < col("w"),
                "bad_aspect")
              .when(col("ssum") < lit(100L) * col("cnt"), "too_dark")
              .otherwise("keep").as("reason"))
          .groupBy("format", "reason")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_bytes").cast("long")).as("sum_bytes"))
          .orderBy("format", "reason")
      }),

    // Text↔media alignment scoring (round 10, fifth wave) — the
    // CLIP-score-shaped pair filter of every image-text corpus build
    // (LAION's third gate after size/quality): each document's caption
    // side becomes a 64-dim signed feature-hash vector (llm_feature_hash's
    // machinery), the media side is its 64-dim embedding row, and the
    // alignment score is their cosine — per-term FLOOR scaled-long dot
    // (exact, order-free) + one fixed IEEE normalize, s6-graded with a
    // keep flag at cos ≥ 0. A real deployment swaps the feature hash for
    // a text encoder and the embedding for the image tower — the
    // pairing join, the exact dot discipline, and the funnel shape are
    // the production plumbing. Sparse text vector ⇒ the dot join only
    // touches nonzero buckets; everything shuffles on the pair id.
    Q("mm_text_image_align", Some(
      "WITH t AS (SELECT doc_id, " + Det.sqlHash32("UNNEST(STRING_SPLIT(text, ' '))") +
        " AS h FROM documents), " +
        "v AS (SELECT doc_id, h % 64 AS bucket, CAST(SUM(CASE WHEN (h // 64) % 2 = 0 " +
        "THEN 1 ELSE -1 END) AS BIGINT) AS w FROM t GROUP BY doc_id, bucket), " +
        "ux AS (SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS x, " +
        "UNNEST(RANGE(0, LEN(embedding))) AS pos FROM embeddings), " +
        "dots AS (SELECT v.doc_id, SUM(CAST(FLOOR(v.w * u.x * 1e6 + 0.5) AS BIGINT)) AS dotl " +
        "FROM v JOIN ux u ON u.vec_id = v.doc_id AND u.pos = v.bucket GROUP BY v.doc_id), " +
        "nw AS (SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS nw2 FROM v GROUP BY doc_id), " +
        "ne AS (SELECT vec_id, SUM(CAST(FLOOR(x * x * 1e14 + 0.5) AS BIGINT)) AS ne2 " +
        "FROM ux GROUP BY vec_id), " +
        "sc AS (SELECT d.doc_id, (CAST(d.dotl AS DOUBLE) / 1e6) / " +
        "(SQRT(CAST(w.nw2 AS DOUBLE)) * SQRT(CAST(e.ne2 AS DOUBLE) / 1e14)) AS c " +
        "FROM dots d JOIN nw w USING (doc_id) JOIN ne e ON e.vec_id = d.doc_id) " +
        "SELECT doc_id % 10 AS grp, CAST(COUNT(*) AS BIGINT) AS n_pairs, " +
        "CAST(SUM(CASE WHEN c >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep, " +
        "CAST(SUM(" + Det.sqlS6("c") + ") AS BIGINT) AS align_sum6 " +
        "FROM sc GROUP BY grp ORDER BY grp"),
      (s, d) => {
        val v = T.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .select(col("doc_id"), Det.hash32(col("tok")).as("h"))
          .select(col("doc_id"), (col("h") % 64).as("bucket"),
            when(expr("(h div 64) % 2") === 0, 1L).otherwise(-1L).as("sg"))
          .groupBy("doc_id", "bucket").agg(sum("sg").as("w"))
        val ux = T.embeddings(s, d)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "xf")))
          .withColumn("x", col("xf").cast("double"))
        val dots = v.join(ux,
            col("doc_id") === col("vec_id") && col("bucket") === col("pos"))
          .groupBy("doc_id")
          .agg(sum(floor(col("w") * col("x") * lit(1e6) + 0.5).cast("long")).as("dotl"))
        val nw = v.groupBy("doc_id").agg(sum(col("w") * col("w")).as("nw2"))
        val ne = ux.groupBy("vec_id")
          .agg(sum(floor(col("x") * col("x") * lit(1e14) + 0.5).cast("long")).as("ne2"))
        val c = (col("dotl").cast("double") / lit(1e6)) /
          (sqrt(col("nw2").cast("double")) * sqrt(col("ne2").cast("double") / lit(1e14)))
        dots.join(nw, "doc_id")
          .join(ne, col("doc_id") === col("vec_id"))
          .select(col("doc_id"), c.as("c"))
          .groupBy((col("doc_id") % 10).as("grp"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("c") >= 0, 1L).otherwise(0L)).as("n_keep"),
            sum(graft.Det.s6(col("c"))).as("align_sum6"))
          .orderBy("grp")
      }),

    // Resize (see `resized` above for the binary batch path).
    // Oracle: the stub's stride resample is out[i] = payload[(i*n)//1024]
    // — the same integer index arithmetic over SUBSTRING. Graded as
    // MD5(reassembled thumbnail string) — identical to md5 of the bytes
    // since the corpus is ASCII (1 char == 1 byte) — because the harness's
    // pandas capture cannot sort a raw binary column.
    Q("mm_resize", Some(
      "WITH p AS (SELECT doc_id, text, CAST(LENGTH(text) AS INTEGER) AS n, " +
        "CASE WHEN doc_id % 3 = 0 THEN 'png' ELSE 'jpeg' END AS format " +
        "FROM documents WHERE doc_id % 3 IN (0, 1)), " +
        "r AS (SELECT doc_id, format, ARRAY_TO_STRING(LIST_TRANSFORM(RANGE(0, 1024), " +
        "i -> SUBSTRING(text, CAST((i * n) // 1024 AS INTEGER) + 1, 1)), '') AS thumb FROM p) " +
        "SELECT doc_id, MD5(thumb) AS payload_md5, " +
        "format, CAST(1024 AS INTEGER) AS n_bytes, " +
        "CAST(32 AS INTEGER) AS width, CAST(32 AS INTEGER) AS height " +
        "FROM r ORDER BY doc_id"),
      (s, d) =>
        // Graded projection: md5 hex of the resampled bytes (+ length,
        // dims) — the binary production path is exercised in full, but
        // the harness capture cannot sort raw bytearrays.
        resized(s, d)
          .select(col("doc_id"), md5(col("payload")).as("payload_md5"),
            col("format"), col("n_bytes"), col("width"), col("height"))
          .orderBy("doc_id")),

    // Frame sampling (see `frameSamples` above for the codegen-only path).
    // Oracle: frame k = 64 bytes at offset k*256 of the wav payloads —
    // SUBSTRING windows, count n // 256 (matches the int division of the
    // Spark nFrames cast). Graded as MD5(window) + window length — the
    // harness capture cannot sort a raw binary frame column.
    Q("mm_frame_sample", Some(
      "WITH p AS (SELECT doc_id, text, CAST(LENGTH(text) AS INTEGER) AS n FROM documents " +
        "WHERE doc_id % 3 = 2 AND LENGTH(text) // 256 > 0), " +
        "f AS (SELECT doc_id, text, UNNEST(RANGE(0, n // 256)) AS k FROM p) " +
        "SELECT doc_id, CAST(k AS INTEGER) AS frame_idx, " +
        "CAST(k * 256 AS BIGINT) AS byte_offset, " +
        "CAST(LENGTH(SUBSTRING(text, CAST(k * 256 AS INTEGER) + 1, 64)) AS INTEGER) AS frame_bytes, " +
        "MD5(SUBSTRING(text, CAST(k * 256 AS INTEGER) + 1, 64)) AS frame_md5 " +
        "FROM f ORDER BY doc_id, frame_idx"),
      (s, d) =>
        // Graded projection: md5 hex of the frame bytes + byte length —
        // byte-exact content grading without a raw binary column.
        frameSamples(s, d)
          .select(col("doc_id"), col("frame_idx"), col("byte_offset"),
            col("frame_bytes"), md5(col("frame")).as("frame_md5"))
          .orderBy("doc_id", "frame_idx")),

    // Perceptual near-dup over "image" payloads (round 7): average-hash —
    // 60 stride-sampled bytes per payload, bit b set iff sample_b exceeds
    // the sample mean (integer-exact: s_b * 60 > sum), packed into one
    // 60-bit BIGINT; near-dup pairs = same-format docs with Hamming
    // distance <= 8 between hashes. The real-image analogue is aHash over
    // a resized grayscale thumbnail; the byte-stride stub stands in for
    // the decode (same swap point as fakeDecode). The hash builds in the
    // SAME mapPartitions codec-batch shape as decode/resize — a
    // deliberate choice over higher-order column expressions, which are
    // interpreted (CodegenFallback) AND got the per-row mean re-inlined
    // into the per-element lambda by CollapseProject (60x re-aggregation
    // per row + a duplicated null-check filter: measured 14-17 s at
    // sf0.1 vs <2 s for this form). The hash table is persisted so the
    // pair self-join's two sides and the budget guard read one
    // materialization. Pair stage is quadratic per format block BY
    // DESIGN (semantics anchor, like llm_dedup_near): guardPairBudget
    // enforces the band-bucketing switch at scale (split the 60-bit hash
    // into bands, join on any equal band — complete for small Hamming
    // radii by pigeonhole).
    Q("mm_dedup_ahash", Some(ahashPairsSql),
      (s, d) => {
        val h = ahashes(s, d)
        TextOps.guardPairBudget(h, Seq("format"), "mm_dedup_ahash",
          "use mm_dedup_ahash_banded (band-bucketed, identical pairs) at corpus scale")
        val ham = bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int")
        h.select(col("doc_id").as("d1"), col("format").as("fa"), col("ahash").as("ha"))
          .join(h.select(col("doc_id").as("d2"), col("format").as("fb"), col("ahash").as("hb")),
            col("fa") === col("fb") && col("d1") < col("d2"))
          .where(ham <= 8)
          .select(col("d1"), col("d2"), ham.as("hamming"))
          .orderBy("d1", "d2")
      }),

    // The SCALE path for ahash near-dup (round 8, VERDICT r7 "next" #2),
    // graded against the SAME all-pairs oracle: split the 60-bit hash into
    // 10 disjoint 6-bit bands and join only on (format, band index, band
    // value) — a pair at Hamming distance <= 8 differs in at most 8 bands,
    // so (pigeonhole: 9 bands already suffice) at least TWO bands are
    // bit-identical and the pair is GUARANTEED to surface as a candidate.
    // The exact Hamming verify then runs over candidates only. Unlike
    // minhash banding this is deterministic-complete, not probabilistic:
    // banded candidates + verify produce exactly the all-pairs result at
    // any scale, which is why the one oracle grades both keys. Cost is
    // linear in docs + band-bucket collisions (no quadratic block join —
    // PlanContractSpec pins the plan to the band-key equi-join), so no
    // pair-budget guard: this is where the guard on mm_dedup_ahash points.
    Q("mm_dedup_ahash_banded", Some(ahashPairsSql),
      (s, d) => {
        val h = ahashes(s, d)
        // 10 static band columns (Scala-level unroll — stays codegen'd)
        val bandVals = array((0 until 10).map(b =>
          shiftright(col("ahash"), 6 * b).bitwiseAND(lit(63L))): _*)
        val bands = h.select(col("doc_id"), col("format"), col("ahash"),
          posexplode(bandVals).as(Seq("band", "bv")))
        val ham = bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int")
        bands.select(col("doc_id").as("d1"), col("ahash").as("ha"),
            col("format"), col("band"), col("bv"))
          .join(bands.select(col("doc_id").as("d2"), col("ahash").as("hb"),
            col("format"), col("band"), col("bv")), Seq("format", "band", "bv"))
          .where(col("d1") < col("d2"))
          // hashes ride the candidate rows (functionally dependent on the
          // ids), so the verify needs no second join back to h — and runs
          // BEFORE the dedup shuffle, so failed candidates never shuffle
          .where(ham <= 8)
          .select(col("d1"), col("d2"), ham.as("hamming"))
          .distinct()
          .orderBy("d1", "d2")
      }),

    // Perceptual DCT hash (round 10 second wave) — pHash, the stronger
    // rung above mm_dedup_ahash's brightness bits [the standard
    // pHash/ImageHash recipe]: an 8×8 stride thumbnail through an
    // EXACT-INTEGER 2-D DCT-II (cosines pre-quantized to a 2^14 literal
    // table shared verbatim with the oracle — no runtime cos on either
    // engine), the 63 AC coefficients thresholded against their mean
    // (63·c > ΣAC cross-multiplied, no divide), packed to a 63-bit
    // BIGINT. aHash sees global brightness; the DCT sees low-frequency
    // STRUCTURE, which survives blur/resize — why production image
    // dedup runs pHash. The match radius is 16 (measured: this corpus'
    // text-byte payloads bottom out at Hamming 15 — pHash separates
    // harder than aHash), surfaced through a 21×3-bit banded equi-join:
    // multi-index hashing [Norouzi, Punjani & Fleet 2012],
    // pigeonhole-complete at radius 16 (≤16 differing bands of 21 ⇒ ≥5
    // identical bands), graded against the all-pairs SQL definition it
    // provably equals. The radius/band tradeoff is the documented cost:
    // 3-bit bands collide in n/8-sized buckets, so candidate volume
    // grows with bucket mass — the MIH regime, not minhash's; shrink
    // the radius (wider bands) or add a second probe table at scales
    // where that mass dominates.
    Q("mm_phash", Some(phashPairsSql),
      (s, d) => {
        val h = phashes(s, d)
        val bandVals = array((0 until 21).map(b =>
          shiftright(col("phash"), 3 * b).bitwiseAND(lit(7L))): _*)
        val bands = h.select(col("doc_id"), col("format"), col("phash"),
          posexplode(bandVals).as(Seq("band", "bv")))
        val ham = bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int")
        bands.select(col("doc_id").as("d1"), col("phash").as("ha"),
            col("format"), col("band"), col("bv"))
          .join(bands.select(col("doc_id").as("d2"), col("phash").as("hb"),
            col("format"), col("band"), col("bv")), Seq("format", "band", "bv"))
          .where(col("d1") < col("d2"))
          .where(ham <= 16)
          .select(col("d1"), col("d2"), ham.as("hamming"))
          .distinct()
          .orderBy("d1", "d2")
      }),

    // Voice-activity-style segmentation over "audio" payloads (round 9,
    // third wave) — the energy-threshold VAD every speech pipeline runs
    // before transcription: frame the waveform, score per-frame energy,
    // threshold, merge consecutive active frames into segments. The
    // energy stub is the non-space byte count of each 64-byte frame
    // (the same swap point as fakeDecode: a real frontend computes RMS
    // over PCM samples in the codec batch; the FRAMING, thresholding
    // and island-merge plumbing graded here is what survives the swap).
    // Active = energy ≥ 80% of the frame (10·e ≥ 512, integer). The
    // merge is the gaps-islands run build (k − ROW_NUMBER), per-doc
    // partitions — one shuffle on doc_id, segments collapse in the same
    // partitioning. Everything downstream of the frame explode is
    // linear in frames.
    Q("mm_energy_segments", Some(
      "WITH p AS (SELECT doc_id, text, CAST(LENGTH(text) AS INTEGER) AS n FROM documents " +
        "WHERE doc_id % 3 = 2 AND LENGTH(text) // 64 > 0), " +
        "f AS (SELECT doc_id, text, UNNEST(RANGE(0, n // 64)) AS k FROM p), " +
        "e AS (SELECT doc_id, CAST(k AS BIGINT) AS k, " +
        "CAST(LENGTH(REPLACE(SUBSTRING(text, CAST(k * 64 AS INTEGER) + 1, 64), ' ', '')) AS BIGINT) AS energy " +
        "FROM f), " +
        "a AS (SELECT doc_id, k, energy FROM e WHERE 10 * energy >= 512), " +
        "r AS (SELECT doc_id, k, energy, " +
        "k - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY k) AS run FROM a) " +
        "SELECT doc_id, CAST(MIN(k) AS BIGINT) AS seg_start, CAST(MAX(k) AS BIGINT) AS seg_end, " +
        "CAST(COUNT(*) AS BIGINT) AS n_frames, CAST(SUM(energy) AS BIGINT) AS sum_energy " +
        "FROM r GROUP BY doc_id, run ORDER BY doc_id, seg_start"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val p = T.documents(s, d)
          .where(col("doc_id") % 3 === 2 && expr("length(text) div 64") > 0)
          .select(col("doc_id"), col("text"),
            expr("length(text) div 64").cast("int").as("nf"))
        val e = p
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(0), col("nf") - 1)).as("k"))
          .select(col("doc_id"), col("k").cast("long").as("k"),
            length(regexp_replace(
              expr("substring(text, cast(k * 64 as int) + 1, 64)"), " ", ""))
              .cast("long").as("energy"))
        val r = e.where(lit(10) * col("energy") >= 512)
          .withColumn("run", col("k") -
            row_number().over(Window.partitionBy("doc_id").orderBy("k")))
        r.groupBy("doc_id", "run")
          .agg(min(col("k")).as("seg_start"), max(col("k")).as("seg_end"),
            count(lit(1)).as("n_frames"), sum(col("energy")).as("sum_energy"))
          .select("doc_id", "seg_start", "seg_end", "n_frames", "sum_energy")
          .orderBy("doc_id", "seg_start")
      }),

    // Shot-boundary detection (round 9, fifth wave) — the scene-cut
    // step of video preprocessing (frame-difference thresholding, the
    // classic pre-neural detector): a cut lands where consecutive
    // frames' energies jump by ≥ 16 (25% of the 64-byte frame) — the
    // real detector diffs histogram/embedding distances in the codec
    // batch, the SAME swap point as fakeDecode; the framing, lag diff
    // and per-asset rollup graded here survive that swap. One lag pass
    // per doc partition, integer throughout.
    Q("mm_scene_cuts", Some(
      "WITH p AS (SELECT doc_id, text, CAST(LENGTH(text) AS INTEGER) AS n FROM documents " +
        "WHERE doc_id % 3 = 2 AND LENGTH(text) // 64 > 0), " +
        "f AS (SELECT doc_id, text, UNNEST(RANGE(0, n // 64)) AS k FROM p), " +
        "e AS (SELECT doc_id, CAST(k AS BIGINT) AS k, " +
        "CAST(LENGTH(REPLACE(SUBSTRING(text, CAST(k * 64 AS INTEGER) + 1, 64), ' ', '')) AS BIGINT) AS energy " +
        "FROM f), " +
        "d AS (SELECT doc_id, k, energy, " +
        "ABS(energy - LAG(energy) OVER (PARTITION BY doc_id ORDER BY k)) AS jump FROM e) " +
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames, " +
        "CAST(SUM(CASE WHEN jump >= 16 THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts, " +
        "MIN(CASE WHEN jump >= 16 THEN k END) AS first_cut, " +
        "MAX(CASE WHEN jump >= 16 THEN k END) AS last_cut, " +
        "CAST(SUM(CASE WHEN jump >= 16 THEN k ELSE 0 END) AS BIGINT) AS cksum " +
        "FROM d GROUP BY doc_id ORDER BY doc_id"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = T.documents(s, d)
          .where(col("doc_id") % 3 === 2 && expr("length(text) div 64") > 0)
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(0), expr("length(text) div 64").cast("int") - 1)).as("k"))
          .select(col("doc_id"), col("k").cast("long").as("k"),
            length(regexp_replace(
              expr("substring(text, cast(k * 64 as int) + 1, 64)"), " ", ""))
              .cast("long").as("energy"))
        val jump = abs(col("energy") -
          lag(col("energy"), 1).over(Window.partitionBy("doc_id").orderBy("k")))
        e.withColumn("jump", jump)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_frames"),
            sum(when(col("jump") >= 16, 1L).otherwise(0L)).as("n_cuts"),
            min(when(col("jump") >= 16, col("k"))).as("first_cut"),
            max(when(col("jump") >= 16, col("k"))).as("last_cut"),
            sum(when(col("jump") >= 16, col("k")).otherwise(0L)).as("cksum"))
          .orderBy("doc_id")
      }),

    // WebDataset-style shard manifest (round 9, seventh wave) — the
    // step that turns a media corpus into fixed-size tar shards for
    // sequential dataloader reads: samples pack GREEDILY IN doc_id
    // ORDER per format stream, each member costing its TAR footprint
    // (512-byte header + payload rounded up to a 512 block), shard =
    // floor(bytes-before / 10240) — llm_pack's streaming-cumsum shape
    // with the tar block arithmetic that makes byte budgeting real.
    // All integer: sizes, padding, cumsum, one `div`; fill6 is one
    // IEEE divide on the s6 grid. The window partitions by format —
    // per-stream history — and everything else is one partial agg.
    Q("mm_shard_pack", Some(
      "WITH p AS (SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n, " +
        "CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'wav' END AS format " +
        "FROM documents), " +
        "t AS (SELECT doc_id, format, n, 512 + ((n + 511) // 512) * 512 AS tar_bytes FROM p), " +
        "c AS (SELECT doc_id, format, n, tar_bytes, " +
        "CAST(SUM(tar_bytes) OVER (PARTITION BY format ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tar_bytes AS BIGINT) AS before_b FROM t), " +
        "b AS (SELECT format, before_b // 10240 AS shard, n, tar_bytes FROM c) " +
        "SELECT format, shard, CAST(COUNT(*) AS BIGINT) AS n_items, " +
        "CAST(SUM(n) AS BIGINT) AS payload_bytes, " +
        "CAST(SUM(tar_bytes) AS BIGINT) AS tar_bytes, " +
        Det.sqlS6("CAST(SUM(tar_bytes) AS DOUBLE) / 10240.0") + " AS fill6 " +
        "FROM b GROUP BY format, shard ORDER BY format, shard"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("format").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, 0)
        payloads(s, d)
          .select(col("doc_id"), col("meta.format").as("format"),
            col("meta.n_bytes").cast("long").as("n"))
          .withColumn("tar_bytes",
            lit(512L) + expr("((n + 511) div 512) * 512"))
          .withColumn("before_b", sum(col("tar_bytes")).over(w) - col("tar_bytes"))
          .withColumn("shard", expr("before_b div 10240"))
          .groupBy("format", "shard")
          .agg(count(lit(1)).as("n_items"), sum("n").as("payload_bytes"),
            sum("tar_bytes").as("tar_bytes"),
            Det.s6(sum("tar_bytes").cast("double") / 10240.0).as("fill6"))
          .orderBy("format", "shard")
      }),

    // Audio constellation fingerprints (round 11) — the Shazam-family
    // landmark hash [Wang 2003, "An industrial-strength audio search
    // algorithm"]: a coarse 16-frame × 8-band "spectrogram" (the stub
    // codec's stride samples — a real STFT swaps in at the same
    // boundary), ONE peak band per frame (max energy, ties → lowest
    // band), and each anchor frame paired with its next 3 peaks into
    // the classic (band₁, band₂, Δt) hash = b₁·32 + b₂·4 + Δt. The
    // graded surface is the per-doc fingerprint: hash count, distinct
    // hashes, the modal hash (count DESC, hash ASC tie) and a
    // position-weighted checksum that pins every hash to its anchor.
    // Spark extracts peaks INSIDE the codec-batch mapPartitions
    // boundary (the ahash discipline — one buffer per codec call);
    // the oracle spells the identical stride/argmax/pair arithmetic
    // over SUBSTRING/ASCII. Matching at scale rides the same
    // banded-bucket joins the image hashes grade (hash equality IS the
    // bucket key) — the fingerprint build here is the per-doc linear
    // stage of that pipeline.
    // CORPUS ASSUMPTION (ADVICE r11): Spark indexes payload BYTES,
    // the oracle indexes text CHARACTERS — they agree because this
    // corpus is pure ASCII (MultimodalSpec pins that loudly, so a
    // regenerated non-ASCII corpus fails the spec, not the hash).
    // Zero-length payloads are excluded on BOTH sides: a fingerprint
    // over no samples is undefined, and the stride read would index
    // an empty buffer.
    Q("mm_audio_fingerprint", Some(
      "WITH p AS (SELECT doc_id, text, CAST(LENGTH(text) AS BIGINT) AS n FROM documents " +
        "WHERE doc_id % 3 = 2 AND LENGTH(text) > 0), " +
        "e AS (SELECT doc_id, fb // 8 AS f, fb % 8 AS b, " +
        "CAST(ASCII(SUBSTRING(text, CAST((fb * n) // 128 AS INTEGER) + 1, 1)) AS BIGINT) AS en " +
        "FROM p, (SELECT UNNEST(RANGE(0, 128)) AS fb) ix), " +
        "pk AS (SELECT doc_id, f, b AS peak FROM (SELECT doc_id, f, b, " +
        "ROW_NUMBER() OVER (PARTITION BY doc_id, f ORDER BY en DESC, b) AS rn FROM e) WHERE rn = 1), " +
        "h AS (SELECT a.doc_id, a.f, " +
        "a.peak * 32 + t.peak * 4 + (t.f - a.f) AS hash " +
        "FROM pk a JOIN pk t ON t.doc_id = a.doc_id " +
        "AND t.f BETWEEN a.f + 1 AND a.f + 3 WHERE a.f <= 12), " +
        "md AS (SELECT doc_id, hash AS top_hash FROM (SELECT doc_id, hash, " +
        "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY COUNT(*) DESC, hash) AS rn " +
        "FROM h GROUP BY doc_id, hash) WHERE rn = 1) " +
        "SELECT h.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hashes, " +
        "CAST(COUNT(DISTINCT h.hash) AS BIGINT) AS n_distinct, " +
        "CAST(MAX(md.top_hash) AS BIGINT) AS top_hash, " +
        "CAST(SUM(h.hash * (h.f + 1)) AS BIGINT) AS fp_checksum " +
        "FROM h JOIN md ON md.doc_id = h.doc_id " +
        "GROUP BY h.doc_id ORDER BY h.doc_id"),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val hashSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("f",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("hash",
            org.apache.spark.sql.types.LongType)))
        val enc = org.apache.spark.sql.Encoders.row(hashSchema)
        val h = payloads(s, d)
          // metadata prune; empty payloads excluded (see key comment)
          .where(col("meta.format") === "wav" && col("meta.n_bytes") > 0)
          .select(col("doc_id"), col("payload"))
          .mapPartitions { rows =>
            rows.grouped(batchSize).flatMap { batch =>
              batch.flatMap { r =>
                val p = r.getAs[Array[Byte]]("payload")
                val n = p.length.toLong
                // stub "STFT": energy(f,b) = stride byte; peak per frame
                val peaks = Array.tabulate(16) { f =>
                  var best = -1L; var bb = 0
                  var b = 0
                  while (b < 8) {
                    val fb = f * 8 + b
                    val en = (p(((fb * n) / 128).toInt) & 0xff).toLong
                    if (en > best) { best = en; bb = b }
                    b += 1
                  }
                  bb.toLong
                }
                for (f <- 0 to 12; dt <- 1 to 3) yield
                  org.apache.spark.sql.Row(r.getAs[Long]("doc_id"), f.toLong,
                    peaks(f) * 32 + peaks(f + dt) * 4 + dt)
              }
            }
          }(enc)
        val wMode = Window.partitionBy("doc_id")
          .orderBy(col("cnt").desc, col("hash"))
        val md = h.groupBy("doc_id", "hash").agg(count(lit(1)).as("cnt"))
          .withColumn("rn", row_number().over(wMode))
          .where(col("rn") === 1)
          .select(col("doc_id"), col("hash").as("top_hash"))
        h.join(broadcast(md), "doc_id")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_hashes"),
            countDistinct(col("hash")).as("n_distinct"),
            max(col("top_hash")).as("top_hash"),
            sum(col("hash") * (col("f") + 1)).as("fp_checksum"))
          .orderBy("doc_id")
      }))
}
