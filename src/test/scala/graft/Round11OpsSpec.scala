package graft

/** Independent scalar mirrors for round-11 keys that don't already have
  * one in a domain spec (the Round*OpsSpec discipline: never the
  * oracle's arithmetic path — plain driver-side Scala over collected
  * parquet).
  */
class Round11OpsSpec extends SparkSpec {

  test("llm_ann_pq equals a scalar Lloyd-trained product-quantization mirror") {
    val rows = Tables.embeddings(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val m = 16; val sub = 4; val k = 16; val rounds = 3
    val vecById = rows.map(r => r._1 -> r._2).toMap
    def s6d(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    def sv(v: Array[Float], ms: Int): Array[Double] =
      (ms * sub until (ms + 1) * sub).map(i => v(i).toDouble).toArray
    def d2(a: Array[Double], b: Array[Double]): Long =
      a.zip(b).map { case (x, c) =>
        val df = x - c; math.floor(df * df * 1e14 + 0.5).toLong
      }.sum
    // seeds: subspace ms's centroid ck = vec (ck+1)'s ms-th subvector
    var cent: Map[(Int, Long), Array[Double]] =
      (for (ms <- 0 until m; ck <- 0L until k.toLong)
        yield (ms, ck) -> sv(vecById(ck + 1), ms)).toMap
    var asg: Map[(Long, Int), Long] = Map.empty
    for (_ <- 1 to rounds) {
      // assignment vs the CURRENT codebook (= cent_{r-1}), ties smallest ck
      asg = (for ((id, vec, _) <- rows; ms <- 0 until m) yield {
        val cks = cent.keys.collect { case (`ms`, ck) => ck }.toSeq.sorted
        (id, ms) -> cks.minBy(ck => (d2(sv(vec, ms), cent((ms, ck))), ck))
      }).toMap
      // centroid update on the mean6 grid, exactly Det.mean6
      cent = asg.toSeq.groupBy { case ((_, ms), ck) => (ms, ck) }
        .map { case ((ms, ck), members) =>
          val svs = members.map { case ((id, _), _) => sv(vecById(id), ms) }
          (ms, ck) -> (0 until sub).map { j =>
            val s = svs.map(a => s6d(a(j))).sum
            math.floor(s.toDouble / svs.length + 0.5).toLong.toDouble / 1e6
          }.toArray
        }
    }
    val qvec = vecById(0L)
    val lut = cent.map { case ((ms, ck), c) => (ms, ck) -> d2(c, sv(qvec, ms)) }
    val scored = rows.filter(_._1 != 0L).map { case (id, _, lb) =>
      val codes = (0 until m).map(ms => asg((id, ms)))
      val adc = codes.zipWithIndex.map { case (c, ms) => lut((ms, c)) }.sum
      (id, lb, codes.mkString(","), adc)
    }
    val expect = scored.sortBy(t => (t._4, t._1)).take(3).toSeq
    val got = SparkEntry.queries("llm_ann_pq")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expect, s"got $got\nexpect $expect")
    // code alphabet sanity: 16 codes, each a trained centroid id
    got.foreach { case (_, _, cs, _) =>
      val parts = cs.split(",").map(_.toInt)
      assert(parts.length == m && parts.forall(c => c >= 0 && c < k), cs)
    }
  }

  test("llm_ann_pq_recall: shortlist+rerank counts are consistent and recall@10 meets the 0.8 target") {
    val r = SparkEntry.queries("llm_ann_pq_recall")(spark, sfDir).collect().head
    val (nShort, hitsShort, nTop, hits, recall6) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nShort == 50L, "ADC shortlist is full")
    assert(nTop == 10L, "reranked top list is full")
    // the rerank can only surface what the shortlist contains
    assert(hits <= hitsShort && hitsShort <= 10L, s"hits $hits / short $hitsShort")
    // VERDICT r11 item 1's done-bar: recall@10 >= 0.8 (measured 0.9)
    assert(hits >= 8L, s"trained-PQ rerank recall@10 = $hits/10 below target")
    assert(recall6 == math.floor(hits.toDouble / nTop * 1e6 + 0.5).toLong,
      "recall is the s6 of hits/n")
    // PQ's top-3 must obey the (adc14, vec_id) tie rule
    val top3 = SparkEntry.queries("llm_ann_pq")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(top3.length == 3)
    top3.sliding(2).foreach { case Array((idA, a), (idB, b)) =>
      assert(a < b || (a == b && idA < idB), "ADC ordering with vec_id ties")
    }
  }

  test("eo_stac_items: the assembled document is valid JSON that round-trips its fields") {
    import org.apache.spark.sql.functions._
    val dir01 = "/root/testdata/sf0.01" // scenes need >= 1 full tile
    val rows = SparkEntry.queries("eo_stac_items")(spark, dir01)
    val parsed = rows.select(col("scene"), col("item_id"), col("ox"),
        col("oy"), col("n_tiles"), col("dt"),
        from_json(col("item_json"), org.apache.spark.sql.types.StructType.fromDDL(
          "type STRING, id STRING, bbox ARRAY<BIGINT>, " +
            "properties STRUCT<datetime: STRING, `graft:n_tiles`: BIGINT>, " +
            "assets STRUCT<data: STRUCT<href: STRING>>")).as("j"))
      .collect()
    assert(parsed.nonEmpty, "at least one scene item at sf0.01")
    parsed.foreach { r =>
      val j = r.getStruct(6)
      assert(j.getString(0) == "Feature", "type survives parsing")
      assert(j.getString(1) == r.getString(1), "id round-trips")
      val bbox = j.getSeq[Long](2)
      assert(bbox == Seq(r.getLong(2), r.getLong(3),
        r.getLong(2) + 128, r.getLong(3) + 128), "bbox round-trips")
      assert(j.getStruct(3).getString(0) == r.getString(5), "datetime round-trips")
      assert(j.getStruct(3).getLong(1) == r.getLong(4), "n_tiles round-trips")
      assert(j.getStruct(4).getStruct(0).getString(0) ==
        s"scenes/${r.getString(1)}.tif", "asset href")
      // RFC3339 shape, UTC-pinned
      assert(r.getString(5).matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z"""))
    }
  }

  test("llm_kmeans_lloyd equals a scalar iterate-quantize Lloyd mirror") {
    val vecs = Tables.embeddings(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val dim = 64
    def s6d(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    var cent: Map[Long, Array[Double]] =
      (0L until 8L).map(k => k -> vecs(k)).toMap
    var asg = Map.empty[Long, Long]
    var asgPrev = Map.empty[Long, Long]
    var c6out = Map.empty[(Long, Int), Long]
    (1 to 3).foreach { _ =>
      asgPrev = asg
      asg = vecs.map { case (id, v) =>
        id -> cent.toSeq.map { case (k, c) =>
          val d2 = (0 until dim).map { i =>
            val df = v(i) - c(i)
            math.floor(df * df * 1e14 + 0.5).toLong
          }.sum
          (k, d2)
        }.minBy { case (k, d2) => (d2, k) }._1
      }
      val members = asg.groupBy(_._2).map { case (k, xs) => k -> xs.keys.toSeq }
      c6out = members.flatMap { case (k, ids) =>
        (0 until dim).map { i =>
          val s = ids.map(id => s6d(vecs(id)(i))).sum
          (k, i) -> math.floor(s.toDouble / ids.length + 0.5).toLong
        }
      }
      cent = members.map { case (k, _) =>
        k -> Array.tabulate(dim)(i => c6out((k, i)).toDouble / 1e6)
      }
    }
    val nm = asg.groupBy(_._2).map { case (k, xs) => k -> xs.size.toLong }
    val mv = asg.groupBy(_._2).map { case (k, xs) =>
      k -> xs.keys.count(id => asgPrev(id) != k).toLong
    }
    val expect = c6out.map { case ((k, i), c6) =>
      (k, i) -> ((c6, nm(k), mv(k)))
    }
    val got = SparkEntry.queries("llm_kmeans_lloyd")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.nonEmpty && got == expect)
    assert(nm.values.sum == vecs.size.toLong, "every vector assigned")
  }

  test("dq_schema_drift verdicts match the vintage-generating rule exactly") {
    val got = SparkEntry.queries("dq_schema_drift")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((Option(r.getString(1)), Option(r.getString(2)), r.getString(3))))
      .toMap
    // v1 = (o_orderkey int64, o_custkey int32, o_totalprice double,
    //       order_ts timestamp); v2 drops o_totalprice, adds priority
    //       string, widens o_custkey to int64
    val expect = Map(
      "o_orderkey" -> ((Some("int64"), Some("int64"), "unchanged")),
      "o_custkey" -> ((Some("int32"), Some("int64"), "type_changed")),
      "o_totalprice" -> ((Some("double"), None, "removed")),
      "priority" -> ((None, Some("string"), "added")),
      "order_ts" -> ((Some("timestamp"), Some("timestamp"), "unchanged")))
    assert(got == expect, s"got $got")
  }
}
