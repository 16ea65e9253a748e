package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{Q, Tables => T}

/** SURVEY.md §3.1 addendum (round 10): the binary raster ingest boundary.
  *
  * The reference's real input is windowed rasterio/GDAL reads of Cloud-
  * Optimized GeoTIFFs [PK — SURVEY §1 step 2]; every downstream raster
  * op in this repo starts from parquet-packed tiles. This key closes the
  * byte-level gap as a graded ROUNDTRIP (the scan_orc_roundtrip shape):
  * full 16×16 event tiles are encoded by [[GeoTiff]] — one genuine
  * georeferenced Float32 .tif per tile — written as individual files,
  * read back through Spark's `binaryFile` source, decoded by the generic
  * IFD walk, and re-keyed PURELY from the decoded ModelTiepoint (tile =
  * f(origin), never the filename) so the georeferencing fidelity is part
  * of the hash. The oracle computes the same aggregates straight from
  * the parquet truth: any byte lost in encode/write/list/read/decode
  * breaks it.
  *
  * Scale: binaryFile lists and reads per-file (COG-sized objects on a
  * store), pixels explode map-side into the same partial-agg shape every
  * tile key uses — one (tile)-keyed exchange, no driver data path. The
  * per-pixel value is `user_id % 2^20`, Float32-exact (< 2^24), so the
  * float strip reproduces the integers bit-exactly.
  */
object GeoTiffScan {

  private def clearDir(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      val st = Files.walk(p)
      try st.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally st.close()
    }
    Files.createDirectories(p)
  }

  val all: Seq[Q] = Seq(
    Q("scan_geotiff_roundtrip", Some(
      "WITH px AS (SELECT (event_id // 4) // 256 AS tile, " +
        "(event_id // 4) % 256 AS pos, CAST(user_id % 1048576 AS BIGINT) AS v " +
        "FROM events WHERE event_id % 4 = 0), " +
        "full_t AS (SELECT tile FROM px GROUP BY tile HAVING COUNT(*) = 256) " +
        "SELECT p.tile, CAST(COUNT(*) AS BIGINT) AS n_px, " +
        "CAST(SUM(v) AS BIGINT) AS sum_v, " +
        "CAST(SUM(v * (pos + 1)) AS BIGINT) AS checksum, " +
        "CAST((p.tile % 8) * 16 AS BIGINT) AS origin_x, " +
        "CAST((p.tile // 8) * 16 AS BIGINT) AS origin_y " +
        "FROM px p JOIN full_t USING (tile) GROUP BY p.tile ORDER BY p.tile"),
      (s, d) => {
        import s.implicits._
        val dir = graft.GraftTmp.dir("geotiff")
        val px = T.events(s, d).where(col("event_id") % 4 === 0)
          .select(expr("(event_id div 4) div 256").as("tile"),
            expr("(event_id div 4) % 256").as("pos"),
            (col("user_id") % 1048576).cast("float").as("v"))
        val full = px.groupBy("tile")
          .agg(count(lit(1)).as("c"),
            sort_array(collect_list(struct(col("pos"), col("v")))).as("pxs"))
          .where(col("c") === 256)
          .select(col("tile"),
            transform(col("pxs"), p => p("v")).as("data"))
        // BUILD-TIME SIDE EFFECT: executors encode + write one .tif per
        // tile (a shared store at scale; java.io.tmpdir under local[*])
        clearDir(dir)
        full.as[(Long, Array[Float])].foreachPartition {
          it: Iterator[(Long, Array[Float])] =>
            it.foreach { case (tile, data) =>
              val r = GeoTiff.Raster(16, 16, data, 1.0,
                (tile % 8) * 16.0, (tile / 8) * 16.0)
              Files.write(Paths.get(dir, f"tile_$tile%06d.tif"),
                GeoTiff.encode(r))
            }
        }
        // read back: binaryFile -> generic IFD decode; the tile key is
        // REDERIVED from the decoded tiepoint, grading georeferencing
        val decoded = s.read.format("binaryFile").load(dir)
          .select(col("content")).as[Array[Byte]]
          .map { bytes =>
            val r = GeoTiff.decode(bytes)
            (r.originX, r.originY, r.data)
          }
          .toDF("ox", "oy", "data")
        decoded
          .select(
            expr("(cast(oy as bigint) div 16) * 8 + cast(ox as bigint) div 16")
              .as("tile"),
            col("ox").cast("long").as("origin_x"),
            col("oy").cast("long").as("origin_y"),
            posexplode(col("data")).as(Seq("pos", "v")))
          .groupBy("tile")
          .agg(count(lit(1)).as("n_px"),
            sum(col("v").cast("long")).as("sum_v"),
            sum(col("v").cast("long") * (col("pos") + 1)).as("checksum"),
            max(col("origin_x")).as("origin_x"),
            max(col("origin_y")).as("origin_y"))
          .select("tile", "n_px", "sum_v", "checksum", "origin_x", "origin_y")
          .orderBy("tile")
      }),

    // DEFLATE + multi-strip roundtrip (round 10 second wave) — the two
    // features every real COG uses (GDAL COMPRESS=DEFLATE, strip/tile
    // layout): same pipeline as scan_geotiff_roundtrip but each tile is
    // written with Compression=8 and RowsPerStrip=4 (⇒ 4 independently
    // deflated strips, StripOffsets/StripByteCounts as counted LONG
    // arrays), then decoded by the SAME generic IFD walk. Compressed
    // bytes are never graded (zlib output may vary across builds) —
    // only the decoded values and layout are: n_strips comes from the
    // DECODED strip table and must equal the literal 4, so a decoder
    // that silently fell back to the single-strip path fails the hash.
    Q("scan_geotiff_deflate", Some(
      "WITH px AS (SELECT (event_id // 4) // 256 AS tile, " +
        "(event_id // 4) % 256 AS pos, CAST(user_id % 1048576 AS BIGINT) AS v " +
        "FROM events WHERE event_id % 4 = 0), " +
        "full_t AS (SELECT tile FROM px GROUP BY tile HAVING COUNT(*) = 256) " +
        "SELECT p.tile, CAST(4 AS BIGINT) AS n_strips, " +
        "CAST(COUNT(*) AS BIGINT) AS n_px, " +
        "CAST(SUM(v) AS BIGINT) AS sum_v, " +
        "CAST(SUM(v * (pos + 1)) AS BIGINT) AS checksum " +
        "FROM px p JOIN full_t USING (tile) GROUP BY p.tile ORDER BY p.tile"),
      (s, d) => {
        import s.implicits._
        val dir = graft.GraftTmp.dir("geotiff_deflate")
        val px = T.events(s, d).where(col("event_id") % 4 === 0)
          .select(expr("(event_id div 4) div 256").as("tile"),
            expr("(event_id div 4) % 256").as("pos"),
            (col("user_id") % 1048576).cast("float").as("v"))
        val full = px.groupBy("tile")
          .agg(count(lit(1)).as("c"),
            sort_array(collect_list(struct(col("pos"), col("v")))).as("pxs"))
          .where(col("c") === 256)
          .select(col("tile"),
            transform(col("pxs"), p => p("v")).as("data"))
        // BUILD-TIME SIDE EFFECT: executors encode + write one .tif per
        // tile (the scan_geotiff_roundtrip discipline)
        clearDir(dir)
        full.as[(Long, Array[Float])].foreachPartition {
          it: Iterator[(Long, Array[Float])] =>
            it.foreach { case (tile, data) =>
              val r = GeoTiff.Raster(16, 16, data, 1.0,
                (tile % 8) * 16.0, (tile / 8) * 16.0)
              Files.write(Paths.get(dir, f"tile_$tile%06d.tif"),
                GeoTiff.encode(r, GeoTiff.CompDeflate, rowsPerStrip = 4))
            }
        }
        val decoded = s.read.format("binaryFile").load(dir)
          .select(col("content")).as[Array[Byte]]
          .map { bytes =>
            val r = GeoTiff.decode(bytes)
            (r.originX, r.originY, r.nStrips, r.data)
          }
          .toDF("ox", "oy", "n_strips", "data")
        decoded
          .select(
            expr("(cast(oy as bigint) div 16) * 8 + cast(ox as bigint) div 16")
              .as("tile"),
            col("n_strips").cast("long").as("n_strips"),
            posexplode(col("data")).as(Seq("pos", "v")))
          .groupBy("tile")
          .agg(max(col("n_strips")).as("n_strips"),
            count(lit(1)).as("n_px"),
            sum(col("v").cast("long")).as("sum_v"),
            sum(col("v").cast("long") * (col("pos") + 1)).as("checksum"))
          .select("tile", "n_strips", "n_px", "sum_v", "checksum")
          .orderBy("tile")
      }),

    // Multi-band signed-int16 + nodata ingest (round 11, VERDICT r10
    // missing #2) — SURVEY §2.1 names sentinel→NULL as *the* semantic
    // translation decision at the raster ingest boundary, and this key
    // exercises it END TO END: each full event tile is written as a
    // 2-band chunky int16 GeoTIFF (negative band-1 values exercise the
    // sign bit) whose GDAL_NODATA tag declares -32768, with the
    // sentinel injected per-band by event_type; ingest decodes the
    // bytes, reads the nodata DECLARATION from the tag (never a
    // constant), and maps sentinel→NULL at the DataFrame boundary.
    // The masked aggregates are graded against an oracle that applies
    // the same sentinel predicate to the parquet truth — so a decoder
    // that mangled the sign, the band interleave, or the nodata tag
    // all fail the hash.
    Q("scan_geotiff_nodata", Some(
      "WITH px AS (SELECT (event_id // 4) // 256 AS tile, " +
        "(event_id // 4) % 256 AS pos, " +
        "CASE WHEN event_type = 'error' THEN NULL " +
        "ELSE CAST(user_id % 500 - 250 AS BIGINT) END AS b1, " +
        "CASE WHEN event_type = 'signup' THEN NULL " +
        "ELSE CAST(FLOOR(value * 100 + 0.5) AS BIGINT) % 300 END AS b2 " +
        "FROM events WHERE event_id % 4 = 0), " +
        "full_t AS (SELECT tile FROM px GROUP BY tile HAVING COUNT(*) = 256) " +
        "SELECT p.tile, CAST(-32768 AS BIGINT) AS nodata_val, " +
        "CAST(COUNT(b1) AS BIGINT) AS n_valid_b1, " +
        "CAST(SUM(b1) AS BIGINT) AS sum_b1, CAST(MIN(b1) AS BIGINT) AS min_b1, " +
        "CAST(COUNT(b2) AS BIGINT) AS n_valid_b2, " +
        "CAST(SUM(b2) AS BIGINT) AS sum_b2, CAST(MIN(b2) AS BIGINT) AS min_b2 " +
        "FROM px p JOIN full_t USING (tile) GROUP BY p.tile ORDER BY p.tile"),
      (s, d) => {
        import s.implicits._
        val dir = graft.GraftTmp.dir("geotiff_nodata")
        val nd = -32768
        val px = T.events(s, d).where(col("event_id") % 4 === 0)
          .select(expr("(event_id div 4) div 256").as("tile"),
            expr("(event_id div 4) % 256").as("pos"),
            when(col("event_type") === "error", lit(nd))
              .otherwise((col("user_id") % 500 - 250).cast("int")).as("b1"),
            when(col("event_type") === "signup", lit(nd))
              .otherwise((graft.Det.s2(col("value")) % 300).cast("int")).as("b2"))
        val full = px.groupBy("tile")
          .agg(count(lit(1)).as("c"),
            collect_list(struct(col("pos"), col("b1"), col("b2"))).as("pxs"))
          .where(col("c") === 256)
          .select(col("tile"), col("pxs"))
        // BUILD-TIME SIDE EFFECT: executors write one 2-band int16 .tif
        // per tile (the scan_geotiff_roundtrip discipline)
        clearDir(dir)
        full.as[(Long, Seq[(Long, Int, Int)])].foreachPartition {
          it: Iterator[(Long, Seq[(Long, Int, Int)])] =>
            it.foreach { case (tile, pxs) =>
              val data = new Array[Short](256 * 2)
              pxs.foreach { case (pos, b1, b2) =>
                data(pos.toInt * 2) = b1.toShort
                data(pos.toInt * 2 + 1) = b2.toShort
              }
              val r = GeoTiff.RasterI16(16, 16, 2, data, nd.toShort, 1.0,
                (tile % 8) * 16.0, (tile / 8) * 16.0)
              Files.write(Paths.get(dir, f"tile_$tile%06d.tif"),
                GeoTiff.encodeI16(r, GeoTiff.CompDeflate))
            }
        }
        // INGEST: decode, read the nodata declaration FROM THE TAG, and
        // translate sentinel→NULL at the DataFrame boundary (Option)
        val rows = s.read.format("binaryFile").load(dir)
          .select(col("content")).as[Array[Byte]]
          .flatMap { bytes =>
            val r = GeoTiff.decodeI16(bytes)
            val tile = (r.originY / 16).toLong * 8 + (r.originX / 16).toLong
            (0 until r.width * r.height).map { p =>
              def v(b: Int): Option[Long] = {
                val x = r.data(p * r.bands + b)
                if (x == r.nodata) None else Some(x.toLong)
              }
              (tile, r.nodata.toLong, v(0), v(1))
            }
          }
          .toDF("tile", "nodata_val", "b1", "b2")
        rows.groupBy("tile")
          .agg(max(col("nodata_val")).as("nodata_val"),
            count(col("b1")).as("n_valid_b1"),
            sum(col("b1")).as("sum_b1"), min(col("b1")).as("min_b1"),
            count(col("b2")).as("n_valid_b2"),
            sum(col("b2")).as("sum_b2"), min(col("b2")).as("min_b2"))
          .select("tile", "nodata_val", "n_valid_b1", "sum_b1", "min_b1",
            "n_valid_b2", "sum_b2", "min_b2")
          .orderBy("tile")
      }),

    // STAC-shaped item documents for the COG scenes (round 11) — the
    // metadata half of the product sink: every real catalog ingests a
    // JSON item per asset (id, bbox, datetime, href) [PK: STAC / the
    // eo3 dataset documents ODC indexes]. The document is assembled by
    // EXPLICIT string concatenation — one canonical serialization, no
    // engine JSON writer whose key order or spacing could differ — and
    // the datetime is the scene's max observation formatted from the
    // naive UTC instant (Spark date_format under the session's UTC zone
    // vs DuckDB strftime over a TZ-free make_timestamp — same digits by
    // construction). Graded on the parsed FIELDS and the full JSON
    // string, so any drift in either engine's formatting surfaces.
    Q("eo_stac_items", Some(
      "WITH px AS (SELECT (event_id // 4) // 256 AS tile, " +
        "CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS te FROM events WHERE event_id % 4 = 0), " +
        "cnt AS (SELECT tile, CAST(COUNT(*) AS BIGINT) AS c, MAX(te) AS mt " +
        "FROM px GROUP BY tile), " +
        "sc AS (SELECT tile // 64 AS scene, CAST(COUNT(*) AS BIGINT) AS n_tiles, " +
        "MAX(mt) AS max_te FROM cnt WHERE c = 256 GROUP BY scene), " +
        "f AS (SELECT scene, n_tiles, max_te, " +
        "'scene_' || LPAD(CAST(scene AS VARCHAR), 4, '0') AS item_id, " +
        "(scene % 8) * 128 AS ox, (scene // 8) * 128 AS oy, " +
        "STRFTIME(make_timestamp(max_te * 1000000), '%Y-%m-%dT%H:%M:%SZ') AS dt " +
        "FROM sc) " +
        "SELECT scene, item_id, ox, oy, n_tiles, max_te, dt, " +
        "'{\"type\":\"Feature\",\"id\":\"' || item_id || '\",\"bbox\":[' || " +
        "CAST(ox AS VARCHAR) || ',' || CAST(oy AS VARCHAR) || ',' || " +
        "CAST(ox + 128 AS VARCHAR) || ',' || CAST(oy + 128 AS VARCHAR) || " +
        "'],\"properties\":{\"datetime\":\"' || dt || '\",\"graft:n_tiles\":' || " +
        "CAST(n_tiles AS VARCHAR) || '},\"assets\":{\"data\":{\"href\":\"scenes/' || " +
        "item_id || '.tif\"}}}' AS item_json " +
        "FROM f ORDER BY scene"),
      (s, d) => {
        val px = T.events(s, d).where(col("event_id") % 4 === 0)
          .select(expr("(event_id div 4) div 256").as("tile"),
            graft.Det.epochS(col("ts")).as("te"))
        val cnt = px.groupBy("tile")
          .agg(count(lit(1)).as("c"), max(col("te")).as("mt"))
        val sc = cnt.where(col("c") === 256)
          .groupBy(expr("tile div 64").as("scene"))
          .agg(count(lit(1)).as("n_tiles"), max(col("mt")).as("max_te"))
        val f = sc.select(col("scene"), col("n_tiles"), col("max_te"),
          concat(lit("scene_"), lpad(col("scene").cast("string"), 4, "0"))
            .as("item_id"),
          ((col("scene") % 8) * 128).as("ox"),
          (expr("scene div 8") * 128).as("oy"),
          date_format(timestamp_seconds(col("max_te")),
            "yyyy-MM-dd'T'HH:mm:ss'Z'").as("dt"))
        f.select(col("scene"), col("item_id"), col("ox"), col("oy"),
            col("n_tiles"), col("max_te"), col("dt"),
            concat(
              lit("{\"type\":\"Feature\",\"id\":\""), col("item_id"),
              lit("\",\"bbox\":["), col("ox").cast("string"), lit(","),
              col("oy").cast("string"), lit(","),
              (col("ox") + 128).cast("string"), lit(","),
              (col("oy") + 128).cast("string"),
              lit("],\"properties\":{\"datetime\":\""), col("dt"),
              lit("\",\"graft:n_tiles\":"), col("n_tiles").cast("string"),
              lit("},\"assets\":{\"data\":{\"href\":\"scenes/"), col("item_id"),
              lit(".tif\"}}}")).as("item_json"))
          .orderBy("scene")
      }),

    // Cloud-Optimized-LAYOUT sink + roundtrip (round 11, VERDICT r10
    // missing #1 — the reference's actual output format [PK: COG to
    // object storage]). 64 event tiles assemble one 128×128 SCENE per
    // `scene = tile div 64`; each scene is written by
    // [[GeoTiff.encodeCog]] as a genuinely tiled GeoTIFF (TileWidth/
    // TileLength 16, DEFLATE) with an embedded 2× overview IFD
    // (NewSubfileType=1) whose tile data PRECEDES the full-res data —
    // the byte layout that makes range-request previews cheap. Both
    // pyramid levels are read back through binaryFile + the generic
    // multi-IFD walk and graded against the parquet truth: level 0 on
    // the raw integers, level 1 on the exact 2×2 block sums (the
    // Float32 average ×4 is bit-exact — each partial sum < 2^22).
    // The scene key is REDERIVED from each level's decoded tiepoint.
    // GeoTiffSpec pins the COG byte contract itself: a prefix cut at
    // the first full-res tile still decodes the overview, at less than
    // half the object's bytes.
    Q("scan_cog_roundtrip", Some(
      "WITH px AS (SELECT (event_id // 4) // 256 AS tile, " +
        "(event_id // 4) % 256 AS pos, CAST(user_id % 1048576 AS BIGINT) AS v " +
        "FROM events WHERE event_id % 4 = 0), " +
        "full_t AS (SELECT tile FROM px GROUP BY tile HAVING COUNT(*) = 256), " +
        "fp AS (SELECT p.tile // 64 AS scene, " +
        "((p.tile % 64) // 8) * 16 + p.pos // 16 AS row, " +
        "((p.tile % 64) % 8) * 16 + p.pos % 16 AS col, v " +
        "FROM px p JOIN full_t USING (tile)), " +
        "l0 AS (SELECT scene, CAST(0 AS BIGINT) AS level, " +
        "CAST(16384 AS BIGINT) AS n_px, " +
        "4 * CAST(SUM(v) AS BIGINT) AS sum4, " +
        "4 * CAST(SUM(v * (row * 128 + col + 1)) AS BIGINT) AS checksum4 " +
        "FROM fp GROUP BY scene), " +
        "l1 AS (SELECT scene, CAST(1 AS BIGINT) AS level, " +
        "CAST(4096 AS BIGINT) AS n_px, " +
        "CAST(SUM(v) AS BIGINT) AS sum4, " +
        "CAST(SUM(v * ((row // 2) * 64 + (col // 2) + 1)) AS BIGINT) AS checksum4 " +
        "FROM fp GROUP BY scene) " +
        "SELECT scene, level, n_px, sum4, checksum4 FROM " +
        "(SELECT * FROM l0 UNION ALL SELECT * FROM l1) ORDER BY scene, level"),
      (s, d) => {
        import s.implicits._
        val dir = graft.GraftTmp.dir("cog")
        val px = T.events(s, d).where(col("event_id") % 4 === 0)
          .select(expr("(event_id div 4) div 256").as("tile"),
            expr("(event_id div 4) % 256").as("pos"),
            (col("user_id") % 1048576).cast("float").as("v"))
        val fullT = px.groupBy("tile").agg(count(lit(1)).as("c"))
          .where(col("c") === 256).select("tile")
        val fp = px.join(fullT, "tile")
          .select(expr("tile div 64").as("scene"),
            (expr("((tile % 64) div 8) * 16 + pos div 16") * 128 +
              expr("((tile % 64) % 8) * 16 + pos % 16")).as("spos"),
            col("v"))
        val scenes = fp.groupBy("scene")
          .agg(collect_list(struct(col("spos"), col("v"))).as("pxs"))
        // BUILD-TIME SIDE EFFECT: executors assemble + write one COG per
        // scene (the scan_geotiff_roundtrip discipline; ~70 KB objects)
        clearDir(dir)
        scenes.as[(Long, Seq[(Long, Float)])].foreachPartition {
          it: Iterator[(Long, Seq[(Long, Float)])] =>
            it.foreach { case (scene, pxs) =>
              val data = new Array[Float](128 * 128)
              pxs.foreach { case (spos, v) => data(spos.toInt) = v }
              val r = GeoTiff.Raster(128, 128, data, 1.0,
                (scene % 8) * 128.0, (scene / 8) * 128.0)
              Files.write(Paths.get(dir, f"scene_$scene%04d.tif"),
                GeoTiff.encodeCog(r, tileSize = 16, GeoTiff.CompDeflate))
            }
        }
        // read back BOTH levels via the generic multi-IFD walk; scene and
        // level are rederived from decoded geometry, never the filename
        val decoded = s.read.format("binaryFile").load(dir)
          .select(col("content")).as[Array[Byte]]
          .flatMap { bytes =>
            GeoTiff.decodeAll(bytes).map(r =>
              (r.originX, r.originY, r.width, r.data))
          }
          .toDF("ox", "oy", "w", "data")
        decoded
          .select(
            (expr("cast(oy as bigint) div 128") * 8 +
              expr("cast(ox as bigint) div 128")).as("scene"),
            when(col("w") === 128, 0L).otherwise(1L).as("level"),
            posexplode(col("data")).as(Seq("pos", "v")))
          .groupBy("scene", "level")
          .agg(count(lit(1)).as("n_px"),
            sum((col("v").cast("double") * 4).cast("long")).as("sum4"),
            sum((col("v").cast("double") * 4).cast("long") * (col("pos") + 1))
              .as("checksum4"))
          .select("scene", "level", "n_px", "sum4", "checksum4")
          .orderBy("scene", "level")
      }))
}
