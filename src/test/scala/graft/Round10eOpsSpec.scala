package graft

import org.apache.spark.sql.functions._

/** Round-10 fifth wave, each key pinned against an independent Scala
  * mirror (the Round10OpsSpec discipline: the DuckDB oracle and these
  * mirrors are separate implementations, so the two engine sides can't
  * share a bug). graph_ktruss's mirror lives in GraphSpec; join_dpp's
  * plan contract in PlanContractSpec.
  */
class Round10eOpsSpec extends SparkSpec {

  test("fn_printf: formatting matches a hand-rolled pad/hex mirror") {
    val got = SparkEntry.queries("fn_printf")(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4)))
      .toMap
    val parts = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // manual mirror: no java.util.Formatter anywhere (format_string IS
    // the Formatter, so using it here would grade nothing)
    def zeroPad(n: Long, w: Int): String = {
      val d = n.toString; ("0" * math.max(0, w - d.length)) + d
    }
    def rightPad(s: String, w: Int): String =
      s + (" " * math.max(0, w - s.length))
    def leftPad(s: String, w: Int): String =
      (" " * math.max(0, w - s.length)) + s
    parts.foreach { case (k, brand, size) =>
      val (idPad, idHex, brandJust, sizePct) = got(k)
      assert(idPad == zeroPad(k, 8), s"part $k id_pad")
      assert(idHex == java.lang.Long.toHexString(k * 2654435761L), s"part $k id_hex")
      assert(brandJust == "[" + rightPad(brand, 12) + "]", s"part $k brand_just")
      assert(sizePct == leftPad(size.toString, 3) + "%", s"part $k size_pct")
    }
    assert(got.size == parts.length)
  }

  test("fn_trycast: parse successes and sums match a scalar parse mirror") {
    val got = SparkEntry.queries("fn_trycast")(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val keys = Tables.orders(spark, sfDir)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    def s2(x: Double): Long = math.floor(x * 100 + 0.5).toLong
    val mirror = keys.groupBy(_ % 7).map { case (b, ks) =>
      val pis = ks.flatMap { k =>
        (k % 5) match {
          case 0 | 1 => Some(k) // plain / whitespace-wrapped int
          case 4 => Some(-k)
          case _ => None // 'n/a', ''
        }
      }
      val pds = ks.flatMap { k =>
        (k % 4) match {
          case 0 => Some(k + 0.75)
          case 1 => Some((k % 9).toDouble * 1000.0)
          case 2 => Some(k + 0.5)
          case _ => None // 'oops'
        }
      }
      b -> (ks.length.toLong, pis.length.toLong, pis.sum,
        pds.length.toLong, pds.map(s2).sum)
    }
    assert(got == mirror, "per-bucket parse counts and sums")
    // both lanes must have real failures AND real successes
    assert(got.values.map(_._2).sum > 0 && got.values.map(_._2).sum < keys.length)
    assert(got.values.map(_._4).sum > 0 && got.values.map(_._4).sum < keys.length)
  }

  test("join_dpp: values match a scalar dim-parity join mirror") {
    val got = SparkEntry.queries("join_dpp")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byType = ev.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val sel = byType.filter(_._2 % 2 == 1)
    assert(sel.nonEmpty && sel.size < byType.size, "parity filter bites both ways")
    val kept = ev.filter(e => sel.contains(e._3))
    val mirror = kept.groupBy(_._2 % 10).map { case (b, rows) =>
      b -> (rows.length.toLong, rows.map(_._1).sum, rows.map(e => sel(e._3)).sum)
    }
    assert(got == mirror)
  }

  test("scan_nested_roundtrip: nested loop equals the flat-truth mirror") {
    val got = SparkEntry.queries("scan_nested_roundtrip")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .filter(l => ord.contains(l._1))
    def s2(x: Double): Long = math.floor(x * 100 + 0.5).toLong
    val mirror = li.groupBy(_._1 % 10).map { case (b, rows) =>
      b -> (rows.map(_._1).distinct.length.toLong, rows.length.toLong,
        rows.map(l => ord(l._1)).sum,
        rows.map(l => l._2.toLong * s2(l._3)).sum)
    }
    assert(got == mirror)
  }

  test("udx_typed_agg: the typed Aggregator equals a scalar cents mirror") {
    val got = SparkEntry.queries("udx_typed_agg")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    def s2(x: Double): Long = math.floor(x * 100 + 0.5).toLong
    val mirror = li.groupBy(_._1).map { case (f, rows) =>
      f -> (rows.length.toLong, rows.map(r => s2(r._3)).sum, rows.map(r => s2(r._2)).sum)
    }
    assert(got == mirror)
  }

  test("fn_variant: typed extraction equals the generating rule (no JSON)") {
    val got = SparkEntry.queries("fn_variant")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) None else Some(r.getInt(1))),
        r.getString(2), r.getBoolean(3)))
      .toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // mirror straight from the generating rule — the JSON encode/decode
    // round-trip through VARIANT must be the identity on these fields
    ev.foreach { case (id, ty) =>
      val (score, tag2, flag) = got(id)
      assert(score == (if (id % 5 == 0) None else Some((id % 97).toInt)), s"event $id score")
      assert(tag2 == ty, s"event $id tag2")
      assert(flag == (id % 2 == 0), s"event $id flag")
    }
    assert(got.size == ev.length)
  }

  test("dq_fingerprint: shard checksums match a scalar md5 mirror") {
    val got = SparkEntry.queries("dq_fingerprint")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"))
      .collect().map(r => (r.getLong(0),
        s"${r.getLong(0)}|${r.getLong(1)}|${r.getString(2)}|${r.getString(3)}"))
    // hash32 mirror: little-endian uint32 of the first 4 md5 bytes
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(s: String): Long = {
      val d = md.digest(s.getBytes("UTF-8"))
      ((d(3) & 0xffL) << 24) | ((d(2) & 0xffL) << 16) |
        ((d(1) & 0xffL) << 8) | (d(0) & 0xffL)
    }
    val mirror = rows.groupBy(_._1 % 8).map { case (sh, rs) =>
      sh -> (rs.length.toLong, rs.map(r => h32(r._2)).sum)
    }
    assert(got == mirror)
    // the fingerprint is ORDER-FREE by construction (a sum) — permuting
    // rows cannot change it; two shards colliding is astronomically
    // unlikely, so they must differ on this corpus
    assert(got.values.map(_._2).toSet.size == got.size)
  }

  test("llm_dedup_recall_eval: counts tie out against mask truth + llm_minhash") {
    val r = SparkEntry.queries("llm_dedup_recall_eval")(spark, sfDir)
      .collect().head
    val (nTruth, nCand, nHit, recall6) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // candidate set IS llm_minhash's graded pair set
    val cand = SparkEntry.queries("llm_minhash")(spark, sfDir).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(nCand == cand.size.toLong, "n_cand == llm_minhash pairs")
    // truth mirror: all-pairs mask Jaccard >= 0.5 per lang, scalar-side
    val masks = operators.Llm.docMasks(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("mask"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val truth = (for {
      a <- masks; b <- masks
      if a._2 == b._2 && a._1 < b._1
      inter = java.lang.Long.bitCount(a._3 & b._3).toDouble
      uni = java.lang.Long.bitCount(a._3 | b._3).toDouble
      if inter / uni >= 0.5
    } yield (a._1, b._1)).toSet
    assert(nTruth == truth.size.toLong, "n_truth == scalar mask-pair truth")
    assert(nHit == (truth & cand).size.toLong, "n_hit == the intersection")
    assert(recall6 ==
      math.floor(nHit.toDouble / nTruth * 1e6 + 0.5).toLong)
    // the S-curve must actually bite both ways on this corpus: some
    // truth pairs missed, some candidates are non-duplicates
    assert(nHit < nTruth && nHit < nCand)
  }

  test("agg_halfsample_ci: replicate spread matches a scalar md5 mirror") {
    val r = SparkEntry.queries("agg_halfsample_ci")(spark, sfDir).collect().head
    val (n, avg6, spread6) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val rows = Tables.events(spark, sfDir)
      .select(col("event_id"), col("value"))
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    def s2v(x: Double) = math.floor(x * 100 + 0.5).toLong
    def a6(vs: Seq[Long]): Long =
      math.floor(vs.sum.toDouble * 1e4 / vs.length + 0.5).toLong
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(s: String): Long = {
      val d = md.digest(s.getBytes("UTF-8"))
      ((d(3) & 0xffL) << 24) | ((d(2) & 0xffL) << 16) |
        ((d(1) & 0xffL) << 8) | (d(0) & 0xffL)
    }
    val all = rows.map(x => (x._1, s2v(x._2)))
    assert(n == all.length.toLong)
    assert(avg6 == a6(all.map(_._2).toSeq))
    val devs = (0 until 16).map { b =>
      a6(all.filter(x => h32(s"$b:${x._1}") % 2 == 0).map(_._2).toSeq) - avg6
    }
    val nb = devs.length.toLong
    val (sd, sdd) = (devs.sum, devs.map(x => x * x).sum)
    val want = math.floor(math.sqrt(
      (nb * sdd - sd * sd).toDouble / (nb * (nb - 1))) + 0.5).toLong
    assert(spread6 == want, "replicate spread")
    assert(spread6 > 0, "nondegenerate spread")
  }

  test("scan_csv_permissive: corrupt split matches the generating rule") {
    val r = SparkEntry.queries("scan_csv_permissive")(spark, sfDir).collect().head
    val (nTotal, nCorrupt, nGood, sumV) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val ks = Tables.orders(spark, sfDir)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    assert(nTotal == ks.length.toLong)
    assert(nCorrupt == ks.count(_ % 7 == 3).toLong, "type failures quarantined")
    assert(nGood == ks.count(_ % 7 != 3).toLong,
      "extra-token lines parse as good (Spark's measured truncation)")
    assert(sumV == ks.filter(_ % 7 != 3)
      .map(k => if (k % 7 == 5) 1L else k % 100).sum)
    assert(nCorrupt > 0, "the corrupt lane actually fires")
  }

  test("mm_quality_filter: the funnel matches a scalar gate mirror") {
    val got = SparkEntry.queries("mm_quality_filter")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val mirror = docs.map { case (id, text) =>
      val b = text.getBytes("UTF-8")
      val n = b.length
      val fmt = (id % 3) match { case 0 => "png"; case 1 => "jpeg"; case _ => "wav" }
      val (w, h) = (16 + (n % 64), 16 + ((n / 64) % 64))
      var sum = 0L; var cnt = 0L; var i = 0
      while (i < n) { sum += b(i) & 0xff; cnt += 1; i += 8 }
      val reason =
        if (n < 300) "too_small"
        else if (2 * w < h || 2 * h < w) "bad_aspect"
        else if (sum < 100L * cnt) "too_dark"
        else "keep"
      ((fmt, reason), n.toLong)
    }.groupBy(_._1).map { case (k, xs) => k -> (xs.length.toLong, xs.map(_._2).sum) }
    assert(got == mirror)
    // all four classes fire on this corpus (threshold-choice contract)
    assert(got.keys.map(_._2).toSet == Set("keep", "too_small", "bad_aspect", "too_dark"))
  }

  test("maint_clone: zero-copy isolation matches the scalar mirror") {
    val got = SparkEntry.queries("maint_clone")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    def s6v(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val ev = Tables.events(spark, sfDir).select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    ev.groupBy(_._1).foreach { case (ty, xs) =>
      assert(got(("clone_v1", ty)) == (xs.length.toLong, xs.map(x => s6v(x._2)).sum),
        s"clone still reads the v1 state for $ty")
      val mult = if (ty == "click") 2 else 1
      assert(got(("src_v2", ty)) ==
        (xs.length.toLong * mult, xs.map(x => s6v(x._2)).sum * mult),
        s"source evolved independently for $ty")
    }
    // ZERO-copy: the clone directory holds manifests only, no data files
    val dst = new java.io.File(graft.GraftTmp.dir("clone_dst"))
    assert(dst.listFiles.forall(f => !f.getName.endsWith(".parquet")),
      "clone dir must contain no data files")
  }

  test("scan_glob_recursive: nested dirs found, decoys never opened") {
    val got = SparkEntry.queries("scan_glob_recursive")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def s2v(x: Double) = math.floor(x * 100 + 0.5).toLong
    val ords = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val mirror = ords.groupBy(_._1 % 3).map { case (srcK, xs) =>
      srcK -> (xs.length.toLong, xs.map(_._1).sum, xs.map(o => s2v(o._2)).sum)
    }
    assert(got == mirror, "all three nest shapes recovered, nothing extra")
    // the decoy sidecars exist on disk next to the data the read used
    val base = graft.GraftTmp.dir("landing")
    assert(new java.io.File(s"$base/2024/jan/manifest.json").exists)
  }

  test("mm_text_image_align: scores match a scalar hash+cosine mirror") {
    val got = SparkEntry.queries("mm_text_image_align")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(s2: String): Long = {
      val dd = md.digest(s2.getBytes("UTF-8"))
      ((dd(3) & 0xffL) << 24) | ((dd(2) & 0xffL) << 16) |
        ((dd(1) & 0xffL) << 8) | (dd(0) & 0xffL)
    }
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val embs = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val scores = docs.map { case (id, text) =>
      val w = new Array[Long](64)
      text.split(' ').foreach { tok =>
        val h = h32(tok)
        w((h % 64).toInt) += (if ((h / 64) % 2 == 0) 1L else -1L)
      }
      val e = embs(id)
      var dotl = 0L; var ne2 = 0L
      var i = 0
      while (i < 64) {
        dotl += math.floor(w(i) * e(i).toDouble * 1e6 + 0.5).toLong
        ne2 += math.floor(e(i).toDouble * e(i).toDouble * 1e14 + 0.5).toLong
        i += 1
      }
      val nw2 = w.map(x => x * x).sum
      (id, (dotl.toDouble / 1e6) / (math.sqrt(nw2.toDouble) * math.sqrt(ne2.toDouble / 1e14)))
    }
    val mirror = scores.groupBy(_._1 % 10).map { case (g, xs) =>
      g -> (xs.length.toLong, xs.count(_._2 >= 0).toLong,
        xs.map(x => math.floor(x._2 * 1e6 + 0.5).toLong).sum)
    }
    assert(got == mirror)
    // the gate must actually split the corpus
    val keeps = got.values.map(_._2).sum
    assert(keeps > 0 && keeps < got.values.map(_._1).sum)
  }

  test("set_union_by_name: NAME alignment proven by the per-side values") {
    val got = SparkEntry.queries("set_union_by_name")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        (if (r.isNullAt(3)) None else Some(r.getLong(3))), r.getLong(4)))
      .toMap
    def s2v(x: Double) = math.floor(x * 100 + 0.5).toLong
    val ords = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val aSide = ords.filter(_._2 > 300000).map(o => (o._1, Some(s2v(o._2)), None: Option[String]))
    val bSide = ords.filter(_._3 == "1-URGENT").map(o => (o._1, None: Option[Long], Some(o._3)))
    val mirror = (aSide ++ bSide).groupBy(_._1).map { case (k, xs) =>
      k -> (xs.length.toLong, xs.count(_._2.isDefined).toLong,
        { val ps = xs.flatMap(_._2); if (ps.isEmpty) None else Some(ps.sum) },
        xs.count(_._3.isDefined).toLong)
    }
    assert(got == mirror)
    // a positional (mis)union would have put prio strings in the cents
    // column — the per-side value split proves the by-name alignment
    assert(got.values.exists(v => v._2 > 0) && got.values.exists(v => v._4 > 0))
  }

  test("fn_sequence: calendars match a scalar day-walk mirror") {
    val got = SparkEntry.queries("fn_sequence")(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getDate(1).toLocalDate, r.getDate(2).toLocalDate, r.getLong(3), r.getLong(4)))
      .toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val mirror = ev.groupBy(_._1).map { case (u, xs) =>
      val d0 = xs.map(_._2).min(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
      val d1 = xs.map(_._2).max(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
      val days = Iterator.iterate(d0)(_.plusDays(1))
        .takeWhile(!_.isAfter(d1)).toSeq
      u -> (d0, d1, days.length.toLong,
        days.map(_.toEpochDay % 97).sum)
    }
    assert(got == mirror)
    assert(got.values.exists(_._3 > 1), "multi-day calendars exist")
  }

  test("dq_fd_violations: the audit matches scalar group recounts") {
    val got = SparkEntry.queries("dq_fd_violations")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def audit[X, Y](pairs: Seq[(X, Y)]): (Long, Long) = {
      val g = pairs.groupBy(_._1).map { case (_, xs) => xs.map(_._2).distinct.size }
      (g.size.toLong, g.count(_ > 1).toLong)
    }
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey")
      .collect().map(_.getLong(0)).filter(ord.contains).map(k => k -> ord(k))
    assert(got("l_orderkey->o_custkey") == audit(li.toSeq))
    val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(got("c_custkey->c_nationkey") == audit(cust.toSeq))
    val ev = Tables.events(spark, sfDir).select("user_id", "event_type")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(got("user_id->event_type") == audit(ev.toSeq))
    // both verdict lanes fire: the true FDs hold, the false one breaks
    assert(got("l_orderkey->o_custkey")._2 == 0)
    assert(got("user_id->event_type")._2 > 0)
  }

  test("eo_catalog_antimeridian: wrapped AOI matches a scalar two-range mirror") {
    val got = SparkEntry.queries("eo_catalog_antimeridian")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    def s6v(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val mirror = ev.map { case (id, v) =>
      ((id % 36).toInt * 10 - 180, ((id / 36) % 18).toInt * 10 - 90, v)
    }.filter { case (lon, lat, _) =>
      (lon >= 150 || lon < -150) && lat >= -30 && lat <= 30 // the split form
    }.groupBy(c => (c._1, c._2)).map { case (k, xs) =>
      k -> (xs.length.toLong, xs.map(x => s6v(x._3)).sum)
    }
    assert(got == mirror, "modular membership == two-range union")
    // both sides of the dateline are populated
    assert(got.keys.exists(_._1 >= 150) && got.keys.exists(_._1 < -150))
  }

  test("graph_ecc: eccentricities CONVERGED and match a scalar BFS mirror") {
    val got = SparkEntry.queries("graph_ecc")(spark, sfDir).collect()
      .map(r => r.getAs[Number](0).longValue ->
        (r.getLong(1), r.getInt(2), r.getInt(3)))
      .toMap
    val e = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .where(col("src") =!= col("dst")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = e.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long")).collect().map(_.getLong(0))
    def bfsEcc(s: Long): Long = {
      var dist = Map(s -> 0L)
      var frontier = Set(s)
      var lvl = 0L
      while (frontier.nonEmpty) {
        lvl += 1
        val next = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
          .filterNot(dist.contains)
        next.foreach(v => dist += v -> lvl)
        frontier = next
      }
      // ecc over the OTHER nodes; unreached = the 999 sentinel
      nodes.filter(_ != s).map(v => dist.getOrElse(v, 999L)).max
    }
    val ecc = nodes.map(v => v -> bfsEcc(v)).toMap
    val rad = ecc.values.min
    val diam = ecc.values.max
    nodes.foreach { v =>
      val (ge, ic, ip) = got(v)
      assert(ge == ecc(v), s"nation $v ecc")
      assert(ic == (if (ecc(v) == rad) 1 else 0), s"nation $v center flag")
      assert(ip == (if (ecc(v) == diam) 1 else 0), s"nation $v periphery flag")
    }
  }
}
