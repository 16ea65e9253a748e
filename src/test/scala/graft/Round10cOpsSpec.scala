package graft

import org.apache.spark.sql.functions._

/** Round-10 third wave, each key pinned against an independent Scala
  * mirror (the Round10OpsSpec discipline: the DuckDB oracle and these
  * mirrors are separate implementations, so the two engine sides can't
  * share a bug).
  */
class Round10cOpsSpec extends SparkSpec {

  private def s6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  test("graph_betweenness: stress matches a scalar Brandes forward pass") {
    val got = SparkEntry.queries("graph_betweenness")(spark, sfDir).collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    // scalar mirror: rebuild the mutual-top-4 graph (the label_prop spec's
    // derivation), then per-source BFS with path counts
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
    // BFS with σ from each source; also pin the K=8 round budget
    def bfs(s: Long): Map[Long, (Int, Long)] = {
      var seen = Map(s -> (0, 1L))
      var frontier = Seq(s)
      var depth = 0
      while (frontier.nonEmpty) {
        depth += 1
        val cand = frontier.flatMap(v => adj.getOrElse(v, Seq.empty)
          .map(w => w -> seen(v)._2))
          .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
          .filterNot { case (w, _) => seen.contains(w) }
        cand.foreach { case (w, sig) => seen += w -> (depth, sig) }
        frontier = cand.keys.toSeq
      }
      assert(depth - 1 <= 8, s"BFS from $s exceeded the StressRounds budget")
      seen
    }
    val sp = nodes.map(s => s -> bfs(s)).toMap
    val mirror = nodes.map { v =>
      v -> (for {
        s <- nodes if s != v
        t <- nodes if t > s && t != v
        dv <- sp(s).get(v)
        dt <- sp(v).get(t)
        dst <- sp(s).get(t)
        if dv._1 + dt._1 == dst._1
      } yield dv._2 * dt._2).sum
    }.toMap
    assert(got == mirror)
    assert(mirror.values.exists(_ > 0L), "degenerate all-zero stress")
  }

  test("agg_kendall_tau: matches a brute-force pair count over all rows") {
    val row = SparkEntry.queries("agg_kendall_tau")(spark, sfDir).collect().head
    val xy = Tables.lineitem(spark, sfDir)
      .select("l_quantity", "l_linenumber").collect()
      .map(r => (r.getDouble(0).toLong, r.getInt(1).toLong))
    val n = xy.length.toLong
    var conc = 0L; var disc = 0L
    var i = 0
    while (i < xy.length) {
      var j = i + 1
      while (j < xy.length) {
        val dx = java.lang.Long.signum(xy(j)._1 - xy(i)._1)
        val dy = java.lang.Long.signum(xy(j)._2 - xy(i)._2)
        if (dx * dy > 0) conc += 1 else if (dx * dy < 0) disc += 1
        j += 1
      }
      i += 1
    }
    val n0 = n * (n - 1) / 2
    val n1 = xy.groupBy(_._1).values.map(g => g.length.toLong * (g.length - 1) / 2).sum
    val n2 = xy.groupBy(_._2).values.map(g => g.length.toLong * (g.length - 1) / 2).sum
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == conc, "concordant")
    assert(row.getLong(2) == disc, "discordant")
    assert(row.getLong(3) == s6((conc - disc).toDouble /
      (math.sqrt((n0 - n1).toDouble) * math.sqrt((n0 - n2).toDouble))))
  }

  test("win_pettitt: U matches the scalar sign cross; U_n == 0; earliest argmax") {
    val got = SparkEntry.queries("win_pettitt")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    def s2v(x: Double): Long = math.floor(x * 100 + 0.5).toLong
    val daily = Tables.events(spark, sfDir)
      .select(unix_timestamp(col("ts")).as("t"), col("value")).collect()
      .map(r => (r.getLong(0) / 86400, s2v(r.getDouble(1))))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      .toSeq.sortBy(_._1)
    val sMap = daily.map { case (d, x) =>
      d -> daily.map { case (_, x2) =>
        if (x2 < x) 1L else if (x2 > x) -1L else 0L }.sum
    }
    var acc = 0L
    val mirror = sMap.map { case (d, sv) => acc += sv; (d, sv, acc) }
    assert(got.map(g => (g._1, g._2, g._3)).toSeq == mirror)
    assert(mirror.last._3 == 0L, "U_n = 0 by antisymmetry")
    val k = mirror.map(m => math.abs(m._3)).max
    val kday = mirror.filter(m => math.abs(m._3) == k).map(_._1).min
    assert(got.filter(_._4 == 1).map(_._1).toSeq == Seq(kday))
  }

  test("graph_louvain_move: gains match a scalar sweep; moves fire at sf0.01") {
    def mirror(dir: String): Seq[(Long, Long, Long, Long)] = {
      val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
      val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
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
      val m = und.size.toLong
      val adj = (und ++ und.map(_.swap)).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).toSeq }
      val nodes = Tables.nation(spark, dir).select("n_nationkey").collect()
        .map(_.getInt(0).toLong).sorted
      val deg = nodes.map(v => v -> adj.getOrElse(v, Seq.empty).size.toLong).toMap
      nodes.map { v =>
        // singleton start: community c == node c, Σtot(c) = deg(c)
        val kin = adj.getOrElse(v, Seq.empty).groupBy(identity)
          .map { case (c, xs) => c -> xs.size.toLong }
        val cands = (kin.keySet + v).toSeq.map { c =>
          val st = deg.getOrElse(c, 0L) - (if (c == v) deg(v) else 0L)
          (c, 2 * m * kin.getOrElse(c, 0L) - st * deg(v))
        }
        val (nc, g) = cands.minBy { case (c, gg) => (-gg, c) }
        (v, v, nc, g)
      }.toSeq
    }
    def got(dir: String) = SparkEntry.queries("graph_louvain_move")(spark, dir)
      .collect().map(r =>
        (r.getInt(0).toLong, r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got(sfDir) == mirror(sfDir))
    val sf01 = "/root/testdata/sf0.01"
    val g01 = got(sf01)
    assert(g01 == mirror(sf01))
    assert(g01.exists(r => r._2 != r._3 && r._4 > 0),
      "the sweep must actually move nodes with positive gain")
  }

  test("eo_cog_overview_select: selection law + mass conservation (sf0.01)") {
    // sf0.001 has no complete 256-pixel tiles — assert that, then mirror
    // at sf0.01 where full tiles exist (the eo_tile_contour discipline)
    assert(SparkEntry.queries("eo_cog_overview_select")(spark, sfDir).count() == 0)
    val sf01 = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("eo_cog_overview_select")(spark, sf01).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // the GDAL law: largest level with 2^L <= factor, capped at 2
    val law = Map(1 -> 0, 2 -> 1, 3 -> 1, 4 -> 2, 5 -> 2, 8 -> 2)
    assert(got.map(g => g._1 -> g._2).toMap == law)
    // scalar mirror of the level-2 census from raw pixels
    val px = Tables.events(spark, sf01)
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._1 % 4 == 0)
      .map { case (eid, uid) => ((eid / 4) / 256, (eid / 4) % 256, uid) }
    val fullTiles = px.groupBy(_._1).collect {
      case (t, ps) if ps.length == 256 => t }.toSet
    val l2 = px.filter(p => fullTiles(p._1))
      .groupBy(p => (p._1, ((p._2 / 16) / 4) * 4 + (p._2 % 16) / 4))
      .map { case (k, ps) => (k, ps.map(_._3).sum) }
    val c2 = got.find(_._2 == 2).get
    assert(c2._3 == fullTiles.size * 16L, "level-2 pixel count")
    assert(c2._4 == l2.values.sum, "level-2 exact 4^L-scaled mass")
    // mass conservation: every level carries the same total
    assert(got.map(_._4).distinct.length == 1, "block means conserve mass")
  }

  test("eo_tile_resample_majority: block winners match a scalar mode pick (sf0.01)") {
    assert(SparkEntry.queries("eo_tile_resample_majority")(spark, sfDir).count() == 0)
    val sf01 = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("eo_tile_resample_majority")(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val px = Tables.events(spark, sf01)
      .select(col("event_id"), col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._1 % 4 == 0)
      .map { case (eid, uid) => ((eid / 4) / 256, ((eid / 4) % 256).toInt, uid % 8) }
    val fullTiles = px.groupBy(_._1).collect {
      case (t, ps) if ps.length == 256 => t }.toSet
    val mirror = px.filter(p => fullTiles(p._1))
      .groupBy(p => (p._1, ((p._2 / 16) / 2) * 8 + (p._2 % 16) / 2))
      .map { case ((tile, opos), ps) =>
        val winner = ps.groupBy(_._3).map { case (v, xs) => (v, xs.length) }
          .toSeq.minBy { case (v, c) => (-c, v) }._1
        (tile, opos, winner)
      }
      .groupBy(_._1)
      .map { case (tile, cells) =>
        (tile, cells.size.toLong, cells.map(_._3).sum,
          cells.map(c => c._3 * (c._2 + 1)).sum) }
      .toSeq.sortBy(_._1)
    assert(got.toSeq == mirror)
    assert(mirror.forall(_._2 == 64L), "8x8 output per full tile")
  }

  test("maint_merge_into: clause table matches a scalar merge; all five fire at sf0.01") {
    def mirror(dir: String): Map[String, (Long, Option[Long])] = {
      val ev = Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("t"),
          col("event_type"), col("value")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
          r.getDouble(4)))
      def latest(rows: Array[(Long, Long, Long, String, Double)]) =
        rows.groupBy(_._1).map { case (u, xs) =>
          u -> xs.maxBy(x => (x._3, x._2)) }
      val base = latest(ev.filter(e => e._2 % 3 != 0 && e._1 % 5 != 0))
      val chg = latest(ev.filter(e => e._2 % 3 == 0 && e._1 % 7 != 0))
      val acts = (base.keySet ++ chg.keySet).toSeq.map { u =>
        (base.get(u), chg.get(u)) match {
          case (Some(b), None) => ("untouched", Some(b._5))
          case (None, Some(c)) if c._4 != "error" => ("insert", Some(c._5))
          case (None, Some(_)) => ("noop", None)
          case (Some(_), Some(c)) if c._4 == "error" => ("delete", None)
          case (Some(_), Some(c)) => ("update", Some(c._5))
        }
      }
      acts.groupBy(_._1).map { case (a, xs) =>
        a -> (xs.length.toLong,
          if (xs.head._2.isEmpty) None
          else Some(xs.map(x => s6(x._2.get)).sum))
      }
    }
    def got(dir: String) = SparkEntry.queries("maint_merge_into")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got(sfDir) == mirror(sfDir))
    val sf01 = "/root/testdata/sf0.01"
    val g01 = got(sf01)
    assert(g01 == mirror(sf01))
    assert(g01.keySet ==
      Set("untouched", "insert", "noop", "delete", "update"),
      "all five merge clauses must fire on the graded corpus")
  }

  test("maint_vacuum: orphans physically gone, retention contract enforced") {
    val row = SparkEntry.queries("maint_vacuum")(spark, sfDir).collect().head
    val (nRows, sumV6, nFiles, nOrphans) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    // scalar row truth + the fragmentation/compaction arithmetic
    val vals = Tables.events(spark, sfDir).select("value").collect()
      .map(_.getDouble(0))
    assert(nRows == vals.length)
    assert(sumV6 == vals.map(s6).sum)
    assert(nFiles == (vals.length + 49999) / 50000)
    assert(nOrphans == 17L, "the 17-way fragmented ingest was the orphan set")
    // the directory now holds EXACTLY the live compacted files
    val dir = graft.GraftTmp.dir("vacuum")
    assert(graft.maintenance.Snapshots.dataFiles(dir).size.toLong == nFiles)
    // retention contract: v1's manifest references deleted files, so the
    // time-travel read must now fail (expire_snapshots semantics)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType)))
    intercept[Exception] {
      graft.maintenance.Snapshots.readAsOf(spark, dir, schema, 1).collect()
    }
  }
}
