package graft

import org.apache.spark.sql.functions._

/** Round-10 operator wave, each key pinned against an independent Scala
  * mirror (the oracle gate grades the same keys against DuckDB at
  * sf0.01; these mirrors are a third implementation so the two engine
  * sides can't share a bug). */
class Round10OpsSpec extends SparkSpec {

  private def s6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
  private def s2(x: Double): Long = math.floor(x * 100 + 0.5).toLong

  /** (user_id, event_id, epoch_s, value, event_type). */
  private lazy val events: Seq[(Long, Long, Long, Double, String)] =
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("t"),
        col("value"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4)))

  test("eo_pansharpen: Brovey bands match the per-row mirror") {
    val got = SparkEntry.queries("eo_pansharpen")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    events.foreach { case (uid, eid, _, v, _) =>
      val cents = s2(v)
      val (r, g, bl) = (cents % 256, (cents / 256) % 256, uid % 256)
      val pan = 1 + eid % 255
      val den = r + g + bl
      val row = got(eid)
      assert(row.getLong(1) == den, s"intens eid=$eid")
      if (den == 0) assert(row.isNullAt(2) && row.isNullAt(3) && row.isNullAt(4))
      else {
        assert(row.getLong(2) == s6(3.0 * r * pan / den), s"r6 eid=$eid")
        assert(row.getLong(3) == s6(3.0 * g * pan / den), s"g6 eid=$eid")
        assert(row.getLong(4) == s6(3.0 * bl * pan / den), s"b6 eid=$eid")
      }
    }
  }

  test("eo_tile_contour: case histogram matches a pixel mirror (sf0.01)") {
    // sf0.001 has no complete 256-pixel tiles — assert that, then mirror
    // the marching-squares cases at sf0.01 where full tiles exist
    assert(SparkEntry.queries("eo_tile_contour")(spark, sfDir).count() == 0)
    val sf01 = "/root/testdata/sf0.01"
    val px = Tables.events(spark, sf01)
      .select(col("event_id"), col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._1 % 4 == 0)
      .map { case (eid, uid) =>
        val pid = eid / 4
        ((pid / 256, (pid % 256) / 16, (pid % 256) % 16),
          if (uid >= 64) 1L else 0L)
      }.toMap
    val fullTiles = px.keys.groupBy(_._1).collect {
      case (t, ps) if ps.size == 256 => t
    }.toSet
    val mirror = (for {
      t <- fullTiles.toSeq; cy <- 0 to 14; cx <- 0 to 14
    } yield {
      val m = 8 * px((t, cy.toLong, cx.toLong)) +
        4 * px((t, cy.toLong, cx + 1L)) +
        2 * px((t, cy + 1L, cx.toLong)) + px((t, cy + 1L, cx + 1L))
      (t, m)
    }).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = SparkEntry.queries("eo_tile_contour")(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == mirror)
    // topology sanity: every graded case id is one of the 16
    assert(got.keys.forall { case (_, m) => m >= 0 && m <= 15 })
  }

  test("graph_label_prop: labels match a scalar synchronous LPA and reach a fixpoint") {
    val got = SparkEntry.queries("graph_label_prop")(spark, sfDir).collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    // scalar mirror: rebuild the mutual-top-4 strongest-partner graph
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .count().collect()
      .map(r => (r.getInt(0).toLong, r.getInt(1).toLong, r.getLong(2)))
      .filter(e => e._1 != e._2)
    val top4 = edges.groupBy(_._1).values.flatMap(
      _.sortBy(e => (-e._3, e._2)).take(4).map(e => (e._1, e._2))).toSet
    val und = top4.filter(e => top4((e._2, e._1)))
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSeq }
    val nodes = Tables.nation(spark, sfDir).select("n_nationkey").collect()
      .map(_.getInt(0).toLong).sorted
    def step(l: Map[Long, Long]): Map[Long, Long] =
      nodes.map { v =>
        val votes = (l(v) +: adj.getOrElse(v, Seq.empty).map(l))
          .groupBy(identity).map { case (lab, xs) => (lab, xs.size) }
        v -> votes.toSeq.minBy { case (lab, c) => (-c, lab) }._1
      }.toMap
    var lbl = nodes.map(v => v -> v).toMap
    (1 to 4).foreach(_ => lbl = step(lbl))
    assert(got == lbl)
    assert(lbl.values.toSet.size > 1, "degenerate single community")
    // fixpoint: a fifth synchronous round changes nothing on this corpus
    assert(step(lbl) == lbl, "LPA did not converge in 4 rounds")
  }

  test("win_ewvar: matches the ring-buffer mirror and is never below -1ulp grid") {
    val got = SparkEntry.queries("win_ewvar")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    events.groupBy(_._5).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      ordered.zipWithIndex.foreach { case ((_, eid, _, _, _), i) =>
        val win = (0 until 8).flatMap { k =>
          if (i - k >= 0) Some((ordered(i - k)._1, 1L << (7 - k))) else None
        }
        val n1 = win.map { case (v, w) => v * w }.sum
        val n2 = win.map { case (v, w) => v * v * w }.sum
        val dn = win.map(_._2).sum
        val mean = n1.toDouble / dn.toDouble
        val ev = s6(n2.toDouble / dn.toDouble - mean * mean)
        assert(got(eid) == ((n2, ev)), s"eid=$eid")
        assert(ev >= -1L) // biased weighted variance is >= 0 up to grid round
      }
    }
  }

  test("win_session_stats: durations match the scalar sessionizer and gaps_islands counts") {
    val got = SparkEntry.queries("win_session_stats")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val gi = SparkEntry.queries("win_gaps_islands")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    events.groupBy(_._1).foreach { case (uid, rows) =>
      val ts = rows.map(r => (r._3, r._2)).sortBy(identity)
      val sessions = ts.tail.foldLeft(List(List(ts.head))) { (acc, cur) =>
        if (cur._1 - acc.head.head._1 > 600) List(cur) :: acc
        else (cur :: acc.head) :: acc.tail
      }.map(s => s.map(_._1))
      val durs = sessions.map(s => s.max - s.min)
      val (n, tot) = (durs.size.toLong, durs.sum)
      assert(got(uid) == ((n, tot, s6(tot.toDouble / n))), s"uid=$uid")
      assert(gi(uid) == n, s"gaps_islands n_sessions uid=$uid")
    }
  }

  test("maint_zorder_rewrite: one file per bucket, pruning law, scalar row truth") {
    val row = SparkEntry.queries("maint_zorder_rewrite")(spark, sfDir).collect().head
    def morton(x: Long, y: Long): Long =
      (0 until 8).map(b => (((x >> b) & 1) << (2 * b)) | (((y >> b) & 1) << (2 * b + 1))).sum
    val boxRows = events.filter { r =>
      val (x, y) = (r._2 % 256, r._1 % 256)
      x >= 32 && x <= 79 && y >= 8 && y <= 71
    }
    assert(row.getLong(0) == boxRows.size.toLong, "n_rows")
    assert(row.getLong(1) == boxRows.map(r => s6(r._4)).sum, "sum_v6")
    val touched = boxRows.map(r => morton(r._2 % 256, r._1 % 256) / 1024).toSet
    val planned = (for (gx <- 32L to 79L; gy <- 8L to 71L)
      yield morton(gx, gy) / 1024).toSet
    assert(row.getLong(2) == touched.size.toLong, "n_files == touched buckets")
    assert(row.getLong(3) == planned.size.toLong, "n_planned")
    assert(touched.subsetOf(planned), "planner missed a bucket")
    // layout law: the rewrite left exactly one parquet file per bucket dir
    val root = java.nio.file.Paths.get(graft.GraftTmp.dir("zorder"))
    import scala.jdk.CollectionConverters._
    val dirs = java.nio.file.Files.list(root).iterator().asScala
      .filter(p => java.nio.file.Files.isDirectory(p)).toSeq
    assert(dirs.nonEmpty)
    dirs.foreach { p =>
      val files = java.nio.file.Files.list(p).iterator().asScala
        .count(_.getFileName.toString.endsWith(".parquet"))
      assert(files == 1, s"${p.getFileName}: $files files")
    }
  }

  test("mm_phash: pairs match a scalar DCT-hash mirror; flat payloads hash to 0") {
    val dctQ: Array[Array[Long]] = Array(
      Array(16384L, 16384L, 16384L, 16384L, 16384L, 16384L, 16384L, 16384L),
      Array(16069L, 13623L, 9102L, 3196L, -3196L, -9102L, -13623L, -16069L),
      Array(15137L, 6270L, -6270L, -15137L, -15137L, -6270L, 6270L, 15137L),
      Array(13623L, -3196L, -16069L, -9102L, 9102L, 16069L, 3196L, -13623L),
      Array(11585L, -11585L, -11585L, 11585L, 11585L, -11585L, -11585L, 11585L),
      Array(9102L, -16069L, 3196L, 13623L, -13623L, -3196L, 16069L, -9102L),
      Array(6270L, -15137L, 15137L, -6270L, -6270L, 15137L, -15137L, 6270L),
      Array(3196L, -9102L, 13623L, -16069L, 16069L, -13623L, 9102L, -3196L))
    def phash(bytes: Array[Byte]): Long = {
      val n = bytes.length
      val smp = Array.tabulate(64)(i =>
        if (n == 0) 0L else (bytes((i.toLong * n / 64).toInt) & 0xff).toLong)
      val c = Array.tabulate(8, 8)((u, v) =>
        (for (y <- 0 until 8; x <- 0 until 8)
          yield dctQ(u)(y) * dctQ(v)(x) * smp(y * 8 + x)).sum)
      val ac = for (u <- 0 until 8; v <- 0 until 8 if u != 0 || v != 0)
        yield (u * 8 + v - 1, c(u)(v))
      val s63 = ac.map(_._2).sum
      ac.foldLeft(0L) { case (h, (i, cv)) =>
        if (cv * 63 > s63) h | (1L << i) else h
      }
    }
    // flat payload: every sample equal -> all AC coefficients 0, never > mean
    assert(phash(Array.fill(100)(65.toByte)) == 0L)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._1 % 3 != 2)
    val hashes = docs.map { case (id, t) =>
      (id, if (id % 3 == 0) "png" else "jpeg", phash(t.getBytes("UTF-8")))
    }
    val expect = (for {
      (d1, f1, h1) <- hashes; (d2, f2, h2) <- hashes
      if f1 == f2 && d1 < d2
      ham = java.lang.Long.bitCount(h1 ^ h2)
      if ham <= 16
    } yield (d1, d2, ham)).toSet
    val got = SparkEntry.queries("mm_phash")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expect)
  }

  test("eo_tile_hillshade: dot products match a pixel mirror (sf0.01)") {
    val sf01 = "/root/testdata/sf0.01"
    val px = Tables.events(spark, sf01)
      .select(col("event_id"), col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._1 % 4 == 0)
      .map { case (eid, uid) =>
        val pid = eid / 4
        ((pid / 256, (pid % 256) / 16, (pid % 256) % 16), uid)
      }.toMap
    val fullTiles = px.keys.groupBy(_._1).collect {
      case (t, ps) if ps.size == 256 => t
    }.toSet
    val mirror = fullTiles.toSeq.map { t =>
      val ds = for (py <- 1 to 14; qx <- 1 to 14) yield {
        def v(dy: Int, dx: Int) = px((t, py + dy.toLong, qx + dx.toLong))
        val gx = (0 to 0).map(_ =>
          2 * (v(0, 1) - v(0, -1)) + (v(-1, 1) - v(-1, -1)) + (v(1, 1) - v(1, -1))).head
        val gy = 2 * (v(1, 0) - v(-1, 0)) + (v(1, -1) - v(-1, -1)) + (v(1, 1) - v(-1, 1))
        val opos = (py - 1) * 14 + (qx - 1)
        (opos.toLong, -2 * gx + 3 * gy + 48)
      }
      t -> ((ds.count(_._2 > 0).toLong, ds.count(_._2 <= 0).toLong,
        ds.map(_._2).sum, ds.map { case (p, d) => d * (p + 1) }.sum))
    }.toMap
    val got = SparkEntry.queries("eo_tile_hillshade")(spark, sf01).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == mirror)
    // partition covers every interior pixel
    got.values.foreach { case (lit_, shadow, _, _) =>
      assert(lit_ + shadow == 196L)
    }
  }

  test("agg_decay_time: continuous decay matches the expPD scalar mirror") {
    val got = SparkEntry.queries("agg_decay_time")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val tmax = events.map(_._3).max
    val expect = events.groupBy(_._5).map { case (t, rows) =>
      val w6 = rows.map { r =>
        val vc = s2(r._4)
        s6(vc.toDouble / 100.0 * Det.expPD((r._3 - tmax).toDouble / 604800.0))
      }.sum
      t -> ((rows.size.toLong, rows.map(r => s2(r._4)).sum, w6))
    }
    assert(got == expect)
    // decay only shrinks: decayed6 <= plain dollars on the same grid
    got.values.foreach { case (_, plainC, dec6) =>
      assert(dec6 <= plainC * 10000, "decay amplified value")
      assert(dec6 >= 0)
    }
  }

  test("graph_modularity: per-component Q matches a scalar union-find mirror") {
    val got = SparkEntry.queries("graph_modularity")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // rebuild the mutual-top-4 graph (same construction as the LPA spec)
    val edges = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .count().collect()
      .map(r => (r.getInt(0).toLong, r.getInt(1).toLong, r.getLong(2)))
      .filter(e => e._1 != e._2)
    val top4 = edges.groupBy(_._1).values.flatMap(
      _.sortBy(e => (-e._3, e._2)).take(4).map(e => (e._1, e._2))).toSet
    val und = top4.filter(e => top4((e._2, e._1)))
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
    val nodes = Tables.nation(spark, sfDir).select("n_nationkey").collect()
      .map(_.getInt(0).toLong)
    // union-find components
    val parent = scala.collection.mutable.Map(nodes.map(v => v -> v): _*)
    def find(v: Long): Long =
      if (parent(v) == v) v else { parent(v) = find(parent(v)); parent(v) }
    und.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comp = nodes.map(v => v -> find(v)).toMap
    val m = und.size.toLong
    val deg = (und.toSeq ++ und.toSeq.map(_.swap)).groupBy(_._1)
      .map { case (v, xs) => v -> xs.size.toLong }
    val expect = nodes.groupBy(comp).map { case (c, vs) =>
      val dTot = vs.map(v => deg.getOrElse(v, 0L)).sum
      val eIn = und.count { case (a, b) => comp(a) == c && comp(b) == c }.toLong
      val q6 = if (dTot == 0) 0L
        else s6(eIn.toDouble / m - (dTot / (2.0 * m)) * (dTot / (2.0 * m)))
      c -> ((vs.size.toLong, eIn, dTot, q6))
    }
    assert(got == expect)
    // global Q of a partition is bounded
    val qTot = got.values.map(_._4).sum
    assert(qTot >= -1000000L && qTot <= 1000000L)
  }

  test("fn_soundex: codes match a scalar soundex of the simple variant") {
    val classes = "01230120022455012623010202"
    def sdx(word: String): String = {
      val up = word.toUpperCase
      def cls(ch: Char): Char =
        if (ch >= 'A' && ch <= 'Z') classes(ch - 'A') else ch
      val tr = up.map(cls)
      val collapsed = tr.foldLeft(new StringBuilder) { (sb, ch) =>
        if (sb.nonEmpty && sb.last == ch) sb else sb.append(ch)
      }.toString
      val dg0 = collapsed.filter(_ != '0')
      val tail = if (cls(up.head) != '0') dg0.drop(1) else dg0
      up.head.toString + tail.padTo(3, '0').take(3)
    }
    val words = Tables.part(spark, sfDir).select("p_name").collect()
      .map(_.getString(0).split(" ").head)
    val expect = words.groupBy(sdx).map { case (c, ws) =>
      c -> ((ws.length.toLong, ws.distinct.length.toLong, ws.min))
    }
    val got = SparkEntry.queries("fn_soundex")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got == expect)
    // the classic textbook vectors hold for the generated pipeline too
    assert(sdx("pfister") == "P236" && sdx("robert") == "R163" &&
      sdx("rupert") == "R163" && sdx("ashcraft") == "A226")
  }

  test("win_holt: the unrolled kernel equals the SEQUENTIAL Holt recursion") {
    val got = SparkEntry.queries("win_holt")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    events.groupBy(_._5).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      ordered.zipWithIndex.foreach { case ((_, eid, _, _, _), i) =>
        val row = got(eid)
        if (i < 7) assert(row.isNullAt(3) && row.isNullAt(4), s"eid=$eid")
        else {
          // run the recursion itself, NOT the kernel — an independent
          // derivation of the coefficient table
          val win = (i - 7 to i).map(k => ordered(k)._1)
          var l = win.head.toDouble
          var b = 0.0
          win.tail.foreach { y =>
            val l2 = y / 2.0 + (l + b) / 2.0
            b = (l2 - l) / 2.0 + b / 2.0
            l = l2
          }
          // dyadic arithmetic is exact in double, so 2^14-scaling recovers
          // the integer kernel outputs bit-for-bat
          assert(row.getLong(1) == math.round(l * 16384), s"l_num eid=$eid")
          assert(row.getLong(2) == math.round(b * 16384), s"b_num eid=$eid")
          assert(row.getLong(3) == s6(row.getLong(1).toDouble / 16384.0))
          assert(row.getLong(4) == s6((row.getLong(1) + row.getLong(2)).toDouble / 16384.0))
        }
      }
    }
    // constant-series identity: SUM(L)=2^14, SUM(B)=0
    val lCoef = Seq(8192L, 6144L, 3584L, 1408L, -32L, -744L, -914L, -1254L)
    val bCoef = Seq(4096L, 1024L, -768L, -1472L, -1456L, -1084L, -627L, 287L)
    assert(lCoef.sum == 16384L && bCoef.sum == 0L)
  }

  test("llm_mmr_select: picks match a scalar greedy MMR over the top-50 pool") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def dotl(a: Array[Double], b: Array[Double]): Long =
      a.indices.map(i => math.floor(a(i) * b(i) * 1e14 + 0.5).toLong).sum
    def cos(i: Long, j: Long): Double = {
      val (a, b) = (vecs(i), vecs(j))
      (dotl(a, b).toDouble / 1e14) /
        (math.sqrt(dotl(a, a).toDouble / 1e14) * math.sqrt(dotl(b, b).toDouble / 1e14))
    }
    val rel = vecs.keys.filter(_ != 0L).map(i => i -> cos(i, 0L)).toMap
    val pool = rel.toSeq.sortBy { case (i, r) => (-r, i) }.take(50).map(_._1)
    var sel = Vector((1, pool.head, rel(pool.head), 0.0))
    for (k <- 2 to 5) {
      val chosen = sel.map(_._2).toSet
      val cand = pool.filterNot(chosen)
      val scored = cand.map { i =>
        val ms = chosen.map(j => cos(i, j)).max
        (i, rel(i), ms, 0.7 * rel(i) - 0.3 * ms)
      }
      val best = scored.minBy { case (i, _, _, sc) => (-sc, i) }
      sel :+= ((k, best._1, best._2, best._3))
    }
    val expect = sel.map { case (k, i, r, ms) =>
      (k, i, s6(r), s6(0.7 * r - 0.3 * ms))
    }
    val got = SparkEntry.queries("llm_mmr_select")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toVector
    assert(got == expect)
    // diversity actually bites: the 5 picks are distinct and not simply
    // the top-5 by relevance unless redundancy never dominated
    assert(got.map(_._2).distinct.size == 5)
  }

  test("Snapshots: commit/readAsOf/rollback isolate versions over immutable files") {
    import graft.maintenance.Snapshots
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_spec").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    spark.range(0, 10).toDF("id").write.mode("overwrite").parquet(dir)
    val v1 = Snapshots.commit(dir)
    val v1Files = Snapshots.files(dir, v1).toSet
    spark.range(10, 15).toDF("id").write.mode("append").parquet(dir)
    val v2 = Snapshots.commit(dir, Snapshots.dataFiles(dir).filterNot(v1Files))
    assert(v1 == 1 && v2 == 2)
    // v1 files untouched by the append (immutable-data-file contract)
    assert(Snapshots.files(dir, v1).toSet.subsetOf(Snapshots.dataFiles(dir).toSet))
    assert(Snapshots.readAsOf(spark, dir, schema, v1).collect().map(_.getLong(0)).sorted
      .sameElements(0L until 10L))
    assert(Snapshots.readAsOf(spark, dir, schema, v2).collect().map(_.getLong(0)).sorted
      .sameElements(10L until 15L))
    val v3 = Snapshots.rollback(dir, v1)
    assert(v3 == 3 && Snapshots.files(dir, v3) == Snapshots.files(dir, v1))
    // the graded key's three versions: v1 == v3 == full truth, v2 filtered
    val rows = SparkEntry.queries("maint_snapshot_asof")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byV = rows.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4)).toSet)
    assert(byV(1) == byV(3), "rollback did not restore v1 visibility")
    assert(!byV(2).exists(_._1 == "error") && byV(2).subsetOf(byV(1)))
  }

  test("stream_exec_dedup: the sink collapses the doubled landing to batch truth, twice") {
    val batch = events.groupBy(_._5).map { case (t, rows) =>
      t -> ((rows.size.toLong, rows.map(r => s6(r._4)).sum))
    }
    def run() = SparkEntry.queries("stream_exec_dedup")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(run() == batch)
    // same-session re-invocation must restage and re-execute cleanly
    assert(run() == batch)
  }
}
