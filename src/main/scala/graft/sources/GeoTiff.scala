package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal single-strip uncompressed Float32 GeoTIFF codec.
  *
  * The reference's real input boundary is windowed reads of Cloud-
  * Optimized GeoTIFFs via rasterio/GDAL [PK — the ODC load path]; this
  * repo's raster layer starts from parquet-packed tiles, so this codec
  * closes the byte-level gap with NO native dependency: a header + one
  * IFD + the GeoTIFF georeferencing tags (ModelPixelScale 33550,
  * ModelTiepoint 33922) + one uncompressed strip of IEEE-754 Float32
  * samples, little-endian throughout ("II" byte order).
  *
  * Layout (all offsets fixed by construction):
  *   0   "II", 42, IFD offset = 8
  *   8   IFD: 12 entries ascending by tag, then next-IFD = 0
  *   158 ModelPixelScale  (3 DOUBLEs)
  *   182 ModelTiepoint    (6 DOUBLEs: raster 0,0,0 -> world x,y,0)
  *   230 strip data       (h*w Float32, row-major)
  *
  * The decoder is a GENERIC IFD walk (tag/type/count/value-or-offset),
  * not an offset mirror of the encoder — it accepts any conforming
  * single-strip Float32 TIFF (multi-strip files too), so the roundtrip
  * key actually exercises parsing, not memcpy.
  */
object GeoTiff {

  private val TShort = 3
  private val TLong = 4
  private val TDouble = 12

  final case class Raster(
      width: Int,
      height: Int,
      data: Array[Float],
      pixelSize: Double,
      originX: Double,
      originY: Double)

  /** Encode one tile as GeoTIFF bytes. */
  def encode(r: Raster): Array[Byte] = {
    require(r.data.length == r.width * r.height, "data size")
    val nEntries = 12
    val ifdOff = 8
    val geoScaleOff = ifdOff + 2 + nEntries * 12 + 4
    val geoTieOff = geoScaleOff + 24
    val stripOff = geoTieOff + 48
    val stripBytes = r.width * r.height * 4
    val buf = ByteBuffer.allocate(stripOff + stripBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    buf.putShort(nEntries.toShort)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      buf.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (typ == TShort && count == 1) buf.putShort(value.toShort).putShort(0)
      else buf.putInt(value)
    }
    entry(256, TShort, 1, r.width) // ImageWidth
    entry(257, TShort, 1, r.height) // ImageLength
    entry(258, TShort, 1, 32) // BitsPerSample
    entry(259, TShort, 1, 1) // Compression = none
    entry(262, TShort, 1, 1) // Photometric = BlackIsZero
    entry(273, TLong, 1, stripOff) // StripOffsets
    entry(277, TShort, 1, 1) // SamplesPerPixel
    entry(278, TLong, 1, r.height) // RowsPerStrip (single strip)
    entry(279, TLong, 1, stripBytes) // StripByteCounts
    entry(339, TShort, 1, 3) // SampleFormat = IEEE float
    entry(33550, TDouble, 3, geoScaleOff) // ModelPixelScale
    entry(33922, TDouble, 6, geoTieOff) // ModelTiepoint
    buf.putInt(0) // next IFD
    buf.putDouble(r.pixelSize).putDouble(r.pixelSize).putDouble(0.0)
    buf.putDouble(0.0).putDouble(0.0).putDouble(0.0) // raster tiepoint
    buf.putDouble(r.originX).putDouble(r.originY).putDouble(0.0)
    r.data.foreach(buf.putFloat)
    buf.array()
  }

  /** Decode a conforming little-endian uncompressed Float32 TIFF. */
  def decode(bytes: Array[Byte]): Raster = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get(0) == 'I' && buf.get(1) == 'I', "not little-endian TIFF")
    require(buf.getShort(2) == 42, "bad TIFF magic")
    val ifdOff = buf.getInt(4)
    val n = buf.getShort(ifdOff) & 0xffff
    // tag -> (type, count, raw 4-byte value field, entry offset)
    var tags = Map.empty[Int, (Int, Int, Int, Int)]
    (0 until n).foreach { i =>
      val e = ifdOff + 2 + i * 12
      val tag = buf.getShort(e) & 0xffff
      val typ = buf.getShort(e + 2) & 0xffff
      val cnt = buf.getInt(e + 4)
      tags += tag -> ((typ, cnt, buf.getInt(e + 8), e + 8))
    }
    def scalar(tag: Int): Int = {
      val (typ, cnt, v, off) = tags(tag)
      require(cnt == 1, s"tag $tag not scalar")
      if (typ == TShort) buf.getShort(off) & 0xffff else v
    }
    // counted LONG/SHORT values: inline when they fit in 4 bytes
    def longs(tag: Int): Array[Long] = {
      val (typ, cnt, v, off) = tags(tag)
      val width = if (typ == TShort) 2 else 4
      val base = if (cnt * width <= 4) off else v
      Array.tabulate(cnt)(i =>
        if (typ == TShort) (buf.getShort(base + i * 2) & 0xffff).toLong
        else buf.getInt(base + i * 4).toLong)
    }
    def doubles(tag: Int): Array[Double] = {
      val (typ, cnt, v, _) = tags(tag)
      require(typ == TDouble, s"tag $tag not DOUBLE")
      Array.tabulate(cnt)(i => buf.getDouble(v + i * 8))
    }
    require(scalar(259) == 1, "compressed TIFF unsupported")
    require(scalar(258) == 32 && tags.get(339).forall(_ => scalar(339) == 3),
      "only Float32 samples supported")
    val w = scalar(256)
    val h = scalar(257)
    val offs = longs(273)
    val counts = longs(279)
    val data = new Array[Float](w * h)
    var k = 0
    offs.zip(counts).foreach { case (o, c) =>
      var p = 0
      while (p < c) { data(k) = buf.getFloat(o.toInt + p); k += 1; p += 4 }
    }
    require(k == w * h, "strip bytes do not cover the raster")
    val scale = doubles(33550)
    val tie = doubles(33922)
    Raster(w, h, data, scale(0), tie(3), tie(4))
  }
}
