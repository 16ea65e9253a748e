package graft

import graft.operators.Multimodal

/** The multimodal plumbing around the stubbed codec (Multimodal scaladoc):
  * schema contract, metadata pruning, batch transform, aggregation. */
class MultimodalSpec extends SparkSpec {

  test("payload table carries binary payload + typed metadata") {
    val df = Multimodal.payloads(spark, sfDir)
    val schema = df.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    assert(df.count() == 500)
  }

  test("decode features respects the metadata format filter") {
    val rows = SparkEntry.queries("mm_decode_features")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set("png", "jpeg")(r.getString(1))))
    // stub geometry invariants
    assert(rows.forall(r => r.getInt(3) >= 16 && r.getInt(4) >= 16))
    assert(rows.forall(r => (1 to 4).contains(r.getInt(5))))
  }

  test("format stats aggregates all three formats") {
    val rows = SparkEntry.queries("mm_format_stats")(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet == Set("jpeg", "png", "wav"))
    assert(rows.map(_.getLong(1)).sum == 500)
  }

  test("resize emits fixed-geometry thumbnails with rewritten flat metadata") {
    val df = Multimodal.resized(spark, sfDir)
    // metadata is flat scalars (no nested struct): any generic consumer can
    // sort/hash every column
    assert(df.schema.fields.forall(_.dataType.typeName != "struct"))
    val rows = df.orderBy("doc_id").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      assert(payload.length == 32 * 32)
      assert(r.getAs[Int]("width") == 32 && r.getAs[Int]("height") == 32)
      assert(r.getAs[Int]("n_bytes") == payload.length)
      assert(Set("png", "jpeg")(r.getAs[String]("format"))) // wav pruned
    }
    // deterministic stub: first sampled byte is the payload's first byte
    val src = Multimodal.payloads(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("doc_id") === rows.head.getLong(0))
      .head().getAs[Array[Byte]]("payload")
    assert(rows.head.getAs[Array[Byte]]("payload")(0) == src(0))
    // graded projection = md5 hex of exactly these bytes
    val graded = SparkEntry.queries("mm_resize")(spark, sfDir).collect()
    assert(graded.length == rows.length)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = rows.head.getAs[Array[Byte]]("payload")
    val hex = md.digest(expect).map("%02x".format(_)).mkString
    assert(graded.head.getAs[String]("payload_md5") == hex)
  }

  test("frame sampling slices every k-th fixed-size byte window, codegen only") {
    val df = Multimodal.frameSamples(spark, sfDir)
    // no UDF/mapPartitions in this one: offset math must stay declarative
    // (check the GRADED plan too — the md5 projection must not break it)
    Seq(df, SparkEntry.queries("mm_frame_sample")(spark, sfDir)).foreach { q =>
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("MapPartitions") && !plan.contains("BatchEvalPython"),
        s"frame sampling left codegen:\n$plan")
    }
    val rows = df.orderBy("doc_id", "frame_idx").collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (_, frames) =>
      // contiguous frame indices from 0, stride-4 offsets, 64-byte frames
      assert(frames.map(_.getInt(1)).sorted.toSeq == frames.indices.toSeq)
      frames.foreach { f =>
        assert(f.getLong(2) == f.getInt(1).toLong * 64 * 4)
        assert(f.getInt(3) == 64)
      }
    }
    // slice content check against the source payload, on a doc with a
    // second sampled frame (payload >= 512 bytes)
    val d0 = byDoc.collectFirst { case (id, fs) if fs.length >= 2 => id }.get
    val src = Multimodal.payloads(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("doc_id") === d0)
      .head().getAs[Array[Byte]]("payload")
    val f1 = rows.filter(r => r.getLong(0) == d0 && r.getInt(1) == 1).head
    assert(f1.getAs[Array[Byte]]("frame").sameElements(src.slice(256, 256 + 64)))
    // graded projection = md5 hex of exactly these frame bytes
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(f1.getAs[Array[Byte]]("frame")).map("%02x".format(_)).mkString
    val g1 = SparkEntry.queries("mm_frame_sample")(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("doc_id") === d0)
      .where(org.apache.spark.sql.functions.col("frame_idx") === 1)
      .head()
    assert(g1.getAs[String]("frame_md5") == hex)
  }

  test("fn_map builds per-doc token count maps") {
    val rows = SparkEntry.queries("fn_map")(spark, sfDir).collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getInt(1) > 0))
  }

  test("banded ahash pairs are IDENTICAL to the exact all-pairs result") {
    // 10 disjoint 6-bit bands over the 60-bit hash: Hamming <= 8 flips at
    // most 8 bands, so at least two band values match (pigeonhole) and
    // every true pair is guaranteed a candidate — deterministic-complete,
    // unlike probabilistic minhash banding. Equality must be exact.
    def pairs(key: String) =
      SparkEntry.queries(key)(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val exact = pairs("mm_dedup_ahash")
    val banded = pairs("mm_dedup_ahash_banded")
    assert(exact.nonEmpty, "corpus has no ahash near-dup pairs to compare")
    assert(banded == exact)
  }

  test("mm_audio_fingerprint equals a scalar constellation mirror") {
    import org.apache.spark.sql.functions.col
    val got = SparkEntry.queries("mm_audio_fingerprint")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val docs = Tables.documents(spark, sfDir)
      .where(col("doc_id") % 3 === 2)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(docs.nonEmpty)
    // the key's corpus assumption, pinned LOUDLY (ADVICE r11): Spark
    // reads payload BYTES, the oracle reads CHARACTERS — they agree only
    // on pure-ASCII text, so a regenerated non-ASCII corpus must fail
    // here, not as a silent dual-engine hash red. Empty docs are
    // excluded by both engines (undefined fingerprint, empty buffer).
    docs.foreach { case (id, text) =>
      assert(text.forall(c => c >= 1 && c < 128),
        s"doc $id is not pure ASCII — the byte-indexed Spark side and " +
          "char-indexed oracle would diverge; re-grade the key on bytes")
    }
    val expect = docs.filter(_._2.nonEmpty).map { case (id, text) =>
      val p = text.getBytes("US-ASCII"); val n = p.length.toLong
      val peaks = Array.tabulate(16) { f =>
        (0 until 8).map(b => (b,
          (p(((f * 8 + b) * n / 128).toInt) & 0xff))).maxBy(t => (t._2, -t._1))._1
      }
      val hashes = for (f <- 0 to 12; dt <- 1 to 3)
        yield (f, peaks(f) * 32L + peaks(f + dt) * 4L + dt)
      val top = hashes.groupBy(_._2).toSeq
        .minBy { case (hh, xs) => (-xs.length, hh) }._1
      id -> ((hashes.length.toLong, hashes.map(_._2).distinct.length.toLong,
        top, hashes.map { case (f, hh) => hh * (f + 1) }.sum))
    }.toMap
    assert(got == expect)
  }
}
