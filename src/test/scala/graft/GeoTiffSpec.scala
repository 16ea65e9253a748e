package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.sources.GeoTiff

/** Byte-level and property checks of the minimal GeoTIFF codec behind
  * scan_geotiff_roundtrip (sources/GeoTiff.scala). */
class GeoTiffSpec extends SparkSpec {

  private def raster(seed: Long, w: Int, h: Int): GeoTiff.Raster = {
    val vals = Gen.listOfN(w * h, Gen.chooseNum(-1e6f, 1e6f))
      .apply(Gen.Parameters.default, Seed(seed)).get
    GeoTiff.Raster(w, h, vals.toArray, 2.5, 1600.0, -320.0)
  }

  test("golden header: magic, IFD shape and fixed tags are to TIFF spec") {
    val r = GeoTiff.Raster(4, 2, Array.tabulate(8)(_.toFloat), 1.0, 16.0, 32.0)
    val b = ByteBuffer.wrap(GeoTiff.encode(r)).order(ByteOrder.LITTLE_ENDIAN)
    assert(b.get(0) == 'I' && b.get(1) == 'I', "byte order marker")
    assert(b.getShort(2) == 42, "magic")
    val ifd = b.getInt(4)
    assert(ifd == 8, "IFD directly after header")
    val n = b.getShort(ifd) & 0xffff
    assert(n == 12, "entry count")
    // entries ascend by tag (required by the TIFF spec)
    val tags = (0 until n).map(i => b.getShort(ifd + 2 + i * 12) & 0xffff)
    assert(tags == tags.sorted, "ascending tags")
    assert(tags == Seq(256, 257, 258, 259, 262, 273, 277, 278, 279, 339,
      33550, 33922), "tag set")
    // width/height land in the SHORT value slots
    assert((b.getShort(ifd + 2 + 8) & 0xffff) == 4, "width")
    assert((b.getShort(ifd + 2 + 12 + 8) & 0xffff) == 2, "height")
    // next-IFD pointer is zero (single-image file)
    assert(b.getInt(ifd + 2 + n * 12) == 0, "IFD chain terminates")
  }

  test("encode/decode roundtrip is bit-exact incl. NaN and georeferencing") {
    for (seed <- 1L to 5L; (w, h) <- Seq((16, 16), (8, 4), (1, 1), (3, 7))) {
      val r0 = raster(seed, w, h)
      // salt in special values: NaN, infinities, -0.0
      r0.data(0) = Float.NaN
      if (r0.data.length > 3) {
        r0.data(1) = Float.PositiveInfinity
        r0.data(2) = -0.0f
      }
      val r1 = GeoTiff.decode(GeoTiff.encode(r0))
      assert(r1.width == w && r1.height == h, "dims")
      assert(r1.pixelSize == 2.5 && r1.originX == 1600.0 && r1.originY == -320.0,
        "georeferencing")
      r0.data.zip(r1.data).zipWithIndex.foreach { case ((a, b2), i) =>
        assert(java.lang.Float.floatToRawIntBits(a) ==
          java.lang.Float.floatToRawIntBits(b2), s"px $i bits")
      }
    }
  }

  test("decoder rejects malformed input instead of mis-reading it") {
    val good = GeoTiff.encode(raster(9L, 4, 4))
    intercept[Exception](GeoTiff.decode(good.take(6))) // truncated header
    val bigEndian = good.clone(); bigEndian(0) = 'M'.toByte; bigEndian(1) = 'M'.toByte
    intercept[Exception](GeoTiff.decode(bigEndian))
    val compressed = good.clone()
    // flip Compression (tag 259, entry index 3) value slot to 5 (LZW)
    val off = 8 + 2 + 3 * 12 + 8
    compressed(off) = 5
    intercept[Exception](GeoTiff.decode(compressed))
  }

  test("deflate + multi-strip roundtrip is bit-exact at awkward strip sizes") {
    // heights NOT divisible by rowsPerStrip exercise the short last strip
    for (seed <- 11L to 13L; (w, h, rps) <- Seq((16, 16, 4), (5, 7, 3), (3, 1, 4))) {
      val r0 = raster(seed, w, h)
      r0.data(0) = Float.NaN
      val bytes = GeoTiff.encode(r0, GeoTiff.CompDeflate, rowsPerStrip = rps)
      val r1 = GeoTiff.decode(bytes)
      assert(r1.nStrips == (h + rps - 1) / rps, "strip count")
      r0.data.zip(r1.data).zipWithIndex.foreach { case ((a, b2), i) =>
        assert(java.lang.Float.floatToRawIntBits(a) ==
          java.lang.Float.floatToRawIntBits(b2), s"px $i bits (deflate)")
      }
      // deflate actually compresses the header-dominated constant raster
      val flat = GeoTiff.Raster(16, 16, Array.fill(256)(7.5f), 1.0, 0.0, 0.0)
      assert(GeoTiff.encode(flat, GeoTiff.CompDeflate).length <
        GeoTiff.encode(flat).length, "deflate smaller on constant data")
    }
    // uncompressed multi-strip from the ENCODER (round 10: it can emit
    // them now) decodes through the same walk
    val r = raster(21L, 6, 9)
    val r2 = GeoTiff.decode(GeoTiff.encode(r, GeoTiff.CompNone, rowsPerStrip = 2))
    assert(r2.nStrips == 5 && r2.data.toSeq.map(java.lang.Float.floatToRawIntBits)
      == r.data.toSeq.map(java.lang.Float.floatToRawIntBits))
  }

  test("decoder accepts a multi-strip layout the encoder never emits") {
    // hand-build a 2-strip 2x4 file: the generic IFD walk must reassemble
    val r = GeoTiff.Raster(2, 4, Array.tabulate(8)(i => i * 1.5f), 1.0, 0.0, 0.0)
    val one = GeoTiff.encode(r)
    val b = ByteBuffer.wrap(one).order(ByteOrder.LITTLE_ENDIAN)
    val stripOff = b.getInt(8 + 2 + 5 * 12 + 8) // tag 273 value
    // rewrite as two strips of 2 rows each, arrays appended at the end
    val out = ByteBuffer.allocate(one.length + 16).order(ByteOrder.LITTLE_ENDIAN)
    out.put(one)
    val offsArr = one.length
    val cntsArr = one.length + 8
    out.putInt(offsArr, stripOff).putInt(offsArr + 4, stripOff + 16)
    out.putInt(cntsArr, 16).putInt(cntsArr + 4, 16)
    out.putShort(8 + 2 + 5 * 12 + 4, 2) // StripOffsets count = 2 (low short of int)
    out.putShort(8 + 2 + 5 * 12 + 6, 0)
    out.putInt(8 + 2 + 5 * 12 + 8, offsArr)
    out.putShort(8 + 2 + 8 * 12 + 4, 2) // StripByteCounts count = 2
    out.putShort(8 + 2 + 8 * 12 + 6, 0)
    out.putInt(8 + 2 + 8 * 12 + 8, cntsArr)
    val r2 = GeoTiff.decode(out.array())
    assert(r2.data.toSeq == r.data.toSeq, "two-strip reassembly")
  }

  test("COG layout: tiled roundtrip, overview math, and the prefix-read byte contract") {
    import graft.sources.GeoTiff
    val rnd = new scala.util.Random(7)
    // 48x32 full res (3x2 tiles of 16), integer-valued so the 2x average is exact
    val w = 48; val h = 32
    val data = Array.fill(w * h)(rnd.nextInt(1 << 20).toFloat)
    val r = GeoTiff.Raster(w, h, data, 2.5, 100.0, 200.0)
    Seq(GeoTiff.CompNone, GeoTiff.CompDeflate).foreach { comp =>
      val bytes = GeoTiff.encodeCog(r, tileSize = 16, comp)
      val levels = GeoTiff.decodeAll(bytes)
      assert(levels.length == 2, "full res + one overview")
      val l0 = levels.head; val ov = levels(1)
      assert(l0.width == w && l0.height == h && l0.data.toSeq == data.toSeq,
        "level 0 bit-exact")
      assert(ov.width == 24 && ov.height == 16, "overview is the 2x level")
      assert(l0.pixelSize == 2.5 && ov.pixelSize == 5.0, "overview pixel size doubles")
      assert(ov.originX == 100.0 && ov.originY == 200.0, "shared origin")
      // overview value = exact Float32 average of its 2x2 block
      (0 until ov.height).foreach { oy =>
        (0 until ov.width).foreach { ox =>
          val s = data((oy * 2) * w + ox * 2) + data((oy * 2) * w + ox * 2 + 1) +
            data((oy * 2 + 1) * w + ox * 2) + data((oy * 2 + 1) * w + ox * 2 + 1)
          assert(ov.data(oy * ov.width + ox) == s * 0.25f, s"ov($oy,$ox)")
        }
      }
      // the COG byte contract: everything a reduced-resolution reader
      // needs sits BEFORE the first full-res tile, in < half the object
      val prefixLen = GeoTiff.cogOverviewPrefixLen(bytes)
      assert(prefixLen * 2 < bytes.length,
        s"overview prefix $prefixLen vs total ${bytes.length}")
      val prefix = java.util.Arrays.copyOfRange(bytes, 0, prefixLen)
      val fromPrefix = GeoTiff.decodeAll(prefix, skipUnreadable = true)
      assert(fromPrefix.length == 1, "prefix decodes exactly the overview")
      assert(fromPrefix.head.data.toSeq == ov.data.toSeq,
        "prefix overview bit-exact")
      // and WITHOUT skipUnreadable the truncation fails loudly
      intercept[Exception](GeoTiff.decodeAll(prefix))
    }
    // odd dimensions: edge replication in the overview, padded edge tiles
    val w2 = 17; val h2 = 5
    val d2 = Array.tabulate(w2 * h2)(i => (i * 3 % 97).toFloat)
    val r2c = GeoTiff.Raster(w2, h2, d2, 1.0, 0.0, 0.0)
    val lv2 = GeoTiff.decodeAll(GeoTiff.encodeCog(r2c, 16, GeoTiff.CompDeflate))
    assert(lv2.head.data.toSeq == d2.toSeq, "odd-size level 0")
    assert(lv2(1).width == 9 && lv2(1).height == 3, "odd-size overview dims")
    val ovr = GeoTiff.overview2x(r2c)
    assert(lv2(1).data.toSeq == ovr.data.toSeq, "odd-size overview values")
  }

  test("int16 multi-band + GDAL_NODATA roundtrip: sign, interleave, and the tag") {
    import graft.sources.GeoTiff
    val rnd = new scala.util.Random(13)
    Seq(2, 3).foreach { bands => // 3 bands forces the external SHORT arrays
      Seq(GeoTiff.CompNone, GeoTiff.CompDeflate).foreach { comp =>
        val w = 7; val h = 5
        val data = Array.tabulate(w * h * bands) { i =>
          if (i % 11 == 0) (-32768).toShort // sentinel pixels
          else (rnd.nextInt(65536) - 32768).toShort // full signed range
        }
        val r = GeoTiff.RasterI16(w, h, bands, data, -32768, 0.5, -10.0, 42.0)
        val bytes = GeoTiff.encodeI16(r, comp)
        val back = GeoTiff.decodeI16(bytes)
        assert(back.width == w && back.height == h && back.bands == bands)
        assert(back.nodata == -32768, "nodata read from the GDAL_NODATA tag")
        assert(back.data.toSeq == data.toSeq, "samples bit-exact incl. sign")
        assert(back.pixelSize == 0.5 && back.originX == -10.0 &&
          back.originY == 42.0, "georeferencing")
      }
    }
    // a positive nodata declaration also roundtrips (tag is parsed, not assumed)
    val r2i = GeoTiff.RasterI16(2, 2, 1, Array[Short](1, 2, 255, 4), 255, 1, 0, 0)
    assert(GeoTiff.decodeI16(GeoTiff.encodeI16(r2i)).nodata == 255)
  }
}
