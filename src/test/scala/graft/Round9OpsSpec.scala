package graft

import org.apache.spark.sql.functions._

/** Round-9 operators, each pinned against an independent Scala mirror on
  * the sf0.001 corpus (the oracle gate grades the same keys against DuckDB
  * at sf0.01; these specs assert the SEMANTICS with a second, non-SQL
  * implementation so both engine sides can't share a common bug). */
class Round9OpsSpec extends SparkSpec {

  /** (user_id, event_id, t, event_type, value) in (t, event_id) order. */
  private lazy val events: Seq[(Long, Long, Long, String, Double)] =
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("t"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .sortBy(e => (e._3, e._2))

  test("win_funnel: stages are strictly ordered and match brute force") {
    val got = SparkEntry.queries("win_funnel")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val byUser = events.groupBy(_._1)
    var nChecked = 0
    byUser.foreach { case (u, es) =>
      val tv = es.filter(_._4 == "view").map(_._3).minOption
      val tc = tv.flatMap(v => es.filter(e => e._4 == "click" && e._3 > v).map(_._3).minOption)
      val tp = tc.flatMap(c => es.filter(e => e._4 == "purchase" && e._3 > c).map(_._3).minOption)
      tv match {
        case None => assert(!got.contains(u), s"user $u has no view but a funnel row")
        case Some(v) =>
          val r = got(u)
          assert(r.getLong(1) == v)
          assert(Option(r.get(2)).map(_.asInstanceOf[Long]) == tc)
          assert(Option(r.get(3)).map(_.asInstanceOf[Long]) == tp)
          val stage = if (tp.isDefined) 3 else if (tc.isDefined) 2 else 1
          assert(r.getInt(4) == stage, s"user $u stage")
          nChecked += 1
      }
    }
    assert(nChecked == got.size)
    // the dependency is strict: every present pair is strictly increasing
    got.values.foreach { r =>
      if (!r.isNullAt(2)) assert(r.getLong(1) < r.getLong(2))
      if (!r.isNullAt(3)) assert(r.getLong(2) < r.getLong(3))
    }
  }

  test("join_scd2_asof: probe cardinality preserved; state = last change <= pt") {
    val got = SparkEntry.queries("join_scd2_asof")(spark, sfDir).collect()
    val purchases = events.filter(_._4 == "purchase")
    assert(got.length == purchases.length, "left PIT join must preserve probes")
    // brute force: per user the ordered state-change list (first event and
    // every type flip); the valid state at pt is the last change at or
    // before pt, none if pt precedes the first event
    val changes: Map[Long, Seq[(Long, String)]] = events.groupBy(_._1).map {
      case (u, es) =>
        val chg = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
        es.foreach { e => if (chg.isEmpty || chg.last._2 != e._4) chg += ((e._3, e._4)) }
        u -> chg.toSeq
    }
    val byEvent = purchases.map(e => e._2 -> e).toMap
    got.foreach { r =>
      val (u, eid, pt) = (r.getLong(1), r.getLong(0), r.getLong(2))
      val e = byEvent(eid)
      assert(e._1 == u && pt == e._3 - 900)
      val want = changes(u).takeWhile(_._1 <= pt).lastOption.map(_._2)
      val gotState = Option(r.getString(3))
      assert(gotState == want, s"event $eid: PIT state $gotState vs $want")
    }
  }

  test("stream_cdc_apply: snapshot = last change per key, deletes absent") {
    val got = SparkEntry.queries("stream_cdc_apply")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = events.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val last = es.maxBy(e => (e._3, e._2))
      if (last._4 == "error") None
      else Some((u, last._3, math.floor(last._5 * 1e6 + 0.5).toLong))
    }.sortBy(_._1)
    assert(got.toSeq == want)
  }

  test("llm_rag_chunk: stride-4/window-8 tiling reconstructs every doc") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = SparkEntry.queries("llm_rag_chunk")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .groupBy(_._1)
    assert(chunks.keySet == docs.keySet)
    docs.foreach { case (id, text) =>
      val toks = text.split(" ")
      val cs = chunks(id).sortBy(_._2)
      // one chunk per stride position; each is exactly the slice it claims
      assert(cs.length == (toks.length + 3) / 4)
      cs.foreach { case (_, cid, ntok, ctext) =>
        val want = toks.slice(cid * 4, cid * 4 + 8)
        assert(ntok == want.length && ctext == want.mkString(" "), s"doc $id chunk $cid")
      }
      // consecutive chunks overlap by 4 tokens (except a short tail)
      cs.sliding(2).foreach {
        case Array(a, b) if a._3 == 8 =>
          assert(a._4.split(" ").drop(4).sameElements(b._4.split(" ").take(math.min(4, b._3))))
        case _ => ()
      }
    }
  }

  test("agg_weighted_median: matches brute-force cumulative pick") {
    val rows = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1), math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val got = SparkEntry.queries("agg_weighted_median")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (flag, rs) =>
      val byQ = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val total = byQ.map(_._2).sum
      var cw = 0L
      val wm = byQ.collectFirst { case (q, w) if { cw += w; 2 * cw >= total } => q }.get
      assert(got(flag) == math.floor(wm * 100 + 0.5).toLong, s"flag $flag")
    }
  }

  test("win_resample_ffill: complete grid, exact means, dangling-free fill") {
    val got = SparkEntry.queries("win_resample_ffill")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = events.groupBy(_._1)
    val rows = got.groupBy(_._1)
    assert(rows.keySet == byUser.keySet)
    byUser.foreach { case (u, es) =>
      val obs = es.groupBy(e => (e._3 / 21600) * 21600).view
        .mapValues { g =>
          val s = g.map(e => math.floor(e._5 * 1e6 + 0.5).toLong).sum
          (g.size.toLong, math.floor(s.toDouble / g.size + 0.5).toLong)
        }.toMap
      val (b0, b1) = (obs.keys.min, obs.keys.max)
      val want = Seq.range(b0, b1 + 1, 21600L).foldLeft((Seq.empty[(Long, Long, Long, Long)], 0L)) {
        case ((acc, lastFill), b) =>
          val (n, m) = obs.getOrElse(b, (0L, lastFill))
          val fill = if (n > 0) m else lastFill
          (acc :+ ((u, b, n, fill)), fill)
      }._1
      assert(rows(u).sortBy(_._2).toSeq == want, s"user $u")
    }
  }

  test("agg_gini: matches the scalar sorted-cumulative formula") {
    val rows = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "o_totalprice").collect()
      .map(r => r.getString(0) -> math.floor(r.getDouble(1) * 100 + 0.5).toLong)
    val got = SparkEntry.queries("agg_gini")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows.groupBy(_._1).foreach { case (seg, rs) =>
      val xs = rs.map(_._2).sorted
      val n = xs.length.toLong
      val six = xs.zipWithIndex.map { case (x, i0) => (i0 + 1).toLong * x }.sum
      val gini = 2.0 * six.toDouble / (n.toDouble * xs.sum.toDouble) - (n.toDouble + 1.0) / n.toDouble
      val want = math.floor(gini * 1e6 + 0.5).toLong
      assert(got(seg) == ((n, want)), s"segment $seg")
      // Gini of a non-degenerate positive distribution lies in (0, 1)
      assert(want > 0 && want < 1000000L)
    }
  }

  test("llm_dedup_semantic: one max-norm representative per cosine component") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    // mirror of the scaled-long pair plan: label-blocked exact cosines
    def sdotl(x: Array[Float], y: Array[Float]): Long =
      x.zip(y).map { case (a, b) => math.floor(a.toDouble * b.toDouble * 1e14 + 0.5).toLong }.sum
    val norms = vecs.map(v => v._1 -> sdotl(v._3, v._3)).toMap
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for {
      pair <- vecs.combinations(2)
      a = pair(0); b = pair(1)
      if a._2 == b._2
      c = (sdotl(a._3, b._3).toDouble / 1e14) /
        (math.sqrt(norms(a._1).toDouble / 1e14) * math.sqrt(norms(b._1).toDouble / 1e14))
      if c >= 0.3
    } {
      val (ra, rb) = (find(a._1), find(b._1))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comps = vecs.map(_._1).groupBy(find)
    val want = comps.map { case (root, members) =>
      val kept = members.minBy(id => (-norms(id), id))
      (root, kept, members.length.toLong)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("llm_dedup_semantic")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("eo_tile_morph: closing matches a direct 2D morphology mirror") {
    // rebuild the full t=0 tiles (parity mask) exactly as eventTiles does
    val px = events.map { e =>
      val rest = e._2 / 4
      (rest / 256, (e._2 % 4).toInt, (rest % 256).toInt, (e._1 % 2).toInt)
    }.filter(_._2 == 0)
    val full = px.groupBy(_._1).filter(_._2.length == 256)
    val want = full.toSeq.sortBy(_._1).map { case (tile, ps) =>
      val m = Array.ofDim[Int](16, 16)
      ps.foreach { case (_, _, pos, v) => m(pos / 16)(pos % 16) = v }
      def sum9(g: Array[Array[Int]], y: Int, x: Int): Int =
        (for { dy <- -1 to 1; dx <- -1 to 1 } yield g(y + dy)(x + dx)).sum
      val dil = Array.tabulate(16, 16)((y, x) =>
        if (y >= 1 && y <= 14 && x >= 1 && x <= 14 && sum9(m, y, x) > 0) 1 else 0)
      var nSet = 0L; var checksum = 0L
      for (y <- 2 to 13; x <- 2 to 13) {
        val cm = if (sum9(dil, y, x) == 9) 1 else 0
        val opos = (y - 2) * 12 + (x - 2)
        nSet += cm; checksum += cm.toLong * (opos + 1)
      }
      (tile, 144L, nSet, checksum)
    }
    val got = SparkEntry.queries("eo_tile_morph")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
  }
}
