package graft.multimodal

/** Minimal deterministic PNG encoder: 8-bit grayscale, zlib stream with
  * STORED (uncompressed) deflate blocks. Every byte of the output is a
  * closed-form function of (width, height, pixels):
  *
  *   length(w, h) = 8 (signature) + 25 (IHDR) + 12 (IDAT overhead)
  *                + 2 (zlib hdr) + 5·nBlocks + h·(w+1) (filtered rows)
  *                + 4 (adler32) + 12 (IEND),   nBlocks = ceil(h·(w+1)/65535)
  *
  * which is what lets the DuckDB oracle predict the on-disk byte count of
  * a REAL image without a PNG codec, while the Spark side decodes the
  * bytes with the real JDK decoder (javax.imageio) — the decode path under
  * test is genuine, the test fixture is predictable. CRC32/Adler32 are
  * java.util.zip (bit-exact everywhere).
  */
object Png {

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Deterministic byte length of [[encodeGray]]'s output. */
  def expectedLength(width: Int, height: Int): Long = {
    val raw = height.toLong * (width + 1)
    val nBlocks = (raw + 65534) / 65535
    8L + 25 + 12 + 2 + 5 * nBlocks + raw + 4 + 12
  }

  /** Encode `pixels` (row-major, width·height gray bytes) as a valid
    * 8-bit-grayscale PNG readable by any conformant decoder. */
  def encodeGray(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height,
      s"pixels ${pixels.length} != $width x $height")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)

    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte))
      val typed = typ.getBytes("US-ASCII") ++ data
      out.write(typed)
      val crc = new java.util.zip.CRC32()
      crc.update(typed)
      val c = crc.getValue
      out.write(Array((c >>> 24).toByte, (c >>> 16).toByte,
        (c >>> 8).toByte, c.toByte))
    }

    // IHDR: width, height, bit depth 8, color type 0 (gray), defaults
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())

    // raw scanlines: filter byte 0 + row pixels
    val raw = new Array[Byte](height * (width + 1))
    var y = 0
    while (y < height) {
      // raw(y*(width+1)) = 0 — filter None
      System.arraycopy(pixels, y * width, raw, y * (width + 1) + 1, width)
      y += 1
    }

    // zlib: 0x78 0x01 header, stored deflate blocks, adler32 of raw
    val idat = new java.io.ByteArrayOutputStream()
    idat.write(0x78); idat.write(0x01)
    var off = 0
    while (off < raw.length) { // raw.length = h·(w+1) >= 2 — never empty
      val n = math.min(65535, raw.length - off)
      val last = off + n >= raw.length
      idat.write(if (last) 0x01 else 0x00) // BFINAL | BTYPE=00 (stored)
      idat.write(n & 0xFF); idat.write((n >>> 8) & 0xFF)         // LEN (LE)
      idat.write((~n) & 0xFF); idat.write(((~n) >>> 8) & 0xFF)   // NLEN
      idat.write(raw, off, n)
      off += n
    }
    val adler = new java.util.zip.Adler32()
    adler.update(raw)
    val a = adler.getValue
    idat.write(Array((a >>> 24).toByte, (a >>> 16).toByte,
      (a >>> 8).toByte, a.toByte))
    chunk("IDAT", idat.toByteArray)
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }
}
