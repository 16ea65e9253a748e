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
}
