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
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
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
        val dir = s"${System.getProperty("java.io.tmpdir")}/graft_geotiff"
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
        val dir = s"${System.getProperty("java.io.tmpdir")}/graft_geotiff_deflate"
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
      }))
}
