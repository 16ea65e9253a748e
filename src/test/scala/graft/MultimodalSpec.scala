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

  test("fn_map builds per-doc token count maps") {
    val rows = SparkEntry.queries("fn_map")(spark, sfDir).collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getInt(1) > 0))
  }
}
