package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Real (if minimal) image codecs for the multimodal decode contract:
  * binary P6 PPM and uncompressed 24-bit BMP — the two classic formats
  * parseable with zero external libraries, so the decode step of
  * [[MultimodalOps]] works on ACTUAL pixel bytes offline. Decoders see
  * only bytes (never the generator's parameters): width/height/channels
  * come from the parsed header, the pixel statistic from walking the
  * pixel array — including skipping BMP row padding, which the fixture
  * generator deliberately fills with a non-zero byte so a decoder that
  * naively sums the whole data block fails the oracle.
  *
  * Fail-loud contract: malformed payloads throw (bad magic, truncated
  * header or pixel data, unsupported variant) — at 100 TB a silent
  * zero-feature row is corpus poison; the pipeline routes rejects
  * explicitly or dies.
  */
object ImageCodecs {

  /** (width, height, channels, sum of pixel component bytes). */
  type Decoded = (Long, Long, Long, Long)

  /** Binary PPM (P6): `P6 <w> <h> <maxval>` in ASCII with whitespace
    * separators, then 3·w·h raw RGB bytes.
    */
  def decodePpm(bytes: Array[Byte]): Decoded = {
    val (w, h, px) = ppmPixels(bytes)
    var sum = 0L
    var i = 0
    while (i < px.length) { sum += px(i) & 0xff; i += 1 }
    (w, h, 3L, sum)
  }

  /** Full PPM decode: (width, height, 3·w·h pixel component bytes in
    * row-major RGB order) — the form resampling kernels consume.
    */
  def ppmPixels(bytes: Array[Byte]): (Long, Long, Array[Byte]) =
    pnmPixels(bytes, '6', 3, "PPM")

  /** Binary PGM (P5): the single-channel sibling of P6 — same ASCII
    * header grammar, w·h raw grayscale bytes.
    */
  def decodePgm(bytes: Array[Byte]): Decoded = {
    val (w, h, px) = pgmPixels(bytes)
    var sum = 0L
    var i = 0
    while (i < px.length) { sum += px(i) & 0xff; i += 1 }
    (w, h, 1L, sum)
  }

  /** Full PGM decode: (width, height, w·h grayscale bytes row-major). */
  def pgmPixels(bytes: Array[Byte]): (Long, Long, Array[Byte]) =
    pnmPixels(bytes, '5', 1, "PGM")

  /** Shared binary-PNM parser: magic `P<digit>`, ASCII `<w> <h> <maxval>`
    * with whitespace separators, then channels·w·h raw bytes.
    */
  private def pnmPixels(
      bytes: Array[Byte], magic: Char, channels: Int, fmt: String): (Long, Long, Array[Byte]) = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == magic,
      s"not a P$magic $fmt: bad magic")
    var pos = 2
    def token(): String = {
      while (pos < bytes.length && (bytes(pos) & 0xff).toChar.isWhitespace) pos += 1
      val start = pos
      while (pos < bytes.length && !(bytes(pos) & 0xff).toChar.isWhitespace) pos += 1
      require(pos > start, s"truncated $fmt header")
      new String(bytes, start, pos - start, US_ASCII)
    }
    val w = token().toLong
    val h = token().toLong
    val maxval = token().toLong
    require(w > 0 && h > 0, s"bad $fmt dimensions ${w}x$h")
    require(maxval == 255, s"unsupported $fmt maxval $maxval (8-bit only)")
    pos += 1 // exactly ONE whitespace byte separates maxval from pixel data
    // declared dims must fit a JVM array BEFORE any Int math touches them
    require(channels.toLong * w * h <= Int.MaxValue - pos,
      s"$fmt dimensions ${w}x$h overflow the pixel buffer")
    val need = channels * w * h
    require(bytes.length - pos >= need,
      s"truncated $fmt pixel data: need $need, have ${bytes.length - pos}")
    (w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + need.toInt))
  }

  /** Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB): little-endian
    * header fields, bottom-up rows padded to 4-byte boundaries — the
    * padding bytes are NOT pixel data and are excluded from the sum.
    */
  def decodeBmp(bytes: Array[Byte]): Decoded = {
    val (w, h, px) = bmpPixels(bytes)
    var sum = 0L
    var i = 0
    while (i < px.length) { sum += px(i) & 0xff; i += 1 }
    (w, h, 3L, sum)
  }

  /** Full BMP decode: (width, height, 3·w·h pixel component bytes with
    * the row padding STRIPPED, rows in stored bottom-up order).
    */
  def bmpPixels(bytes: Array[Byte]): (Long, Long, Array[Byte]) = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP: bad magic")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = b.getInt(10)
    val w = b.getInt(18)
    val h = b.getInt(22)
    val planes = b.getShort(26)
    val bpp = b.getShort(28)
    val compression = b.getInt(30)
    require(w > 0 && h > 0, s"bad BMP dimensions ${w}x$h (top-down unsupported)")
    require(planes == 1 && bpp == 24 && compression == 0,
      s"unsupported BMP variant: planes=$planes bpp=$bpp compression=$compression")
    // declared dims must fit a JVM array BEFORE any Int math touches
    // them — including the stride's +3 padding headroom
    require(3L * w * h <= Int.MaxValue - 3,
      s"BMP dimensions ${w}x$h overflow the pixel buffer")
    val stride = (3 * w + 3) / 4 * 4 // 3w+3 fits Int: guarded above (h >= 1)
    require(dataOffset >= 54 && bytes.length.toLong >= dataOffset.toLong + stride.toLong * h,
      s"truncated BMP pixel data: need ${stride.toLong * h}, have ${bytes.length - dataOffset}")
    val out = new Array[Byte](3 * w * h)
    var row = 0
    while (row < h) {
      System.arraycopy(bytes, dataOffset + row * stride, out, row * 3 * w, 3 * w)
      row += 1
    }
    (w, h, out)
  }
}

/** Deterministic image payload GENERATORS — fixture machinery (the binary
  * analog of the driver's parquet generator), kept strictly separate from
  * the decoders: generators know the doc_id formulas, decoders see only
  * bytes. The DuckDB oracle replays the same formulas symbolically, so a
  * hash-match proves the codec round-trips real headers and pixels.
  */
object ImageFixtures {
  val PpmMime = "image/x-portable-pixmap"
  val BmpMime = "image/bmp"
  val PgmMime = "image/x-portable-graymap"

  /** Pixel component byte i of document id — shared by all formats. */
  def pxByte(id: Long, i: Long): Byte = ((id * 31 + i) % 256).toByte

  /** P6 PPM, (id%13+1) × (id%7+1). */
  def ppm(id: Long): Array[Byte] = {
    val w = (id % 13 + 1).toInt
    val h = (id % 7 + 1).toInt
    val header = s"P6\n$w $h\n255\n".getBytes(US_ASCII)
    val out = new Array[Byte](header.length + 3 * w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < 3 * w * h) { out(header.length + i) = pxByte(id, i); i += 1 }
    out
  }

  /** P5 PGM (grayscale), (id%9+1) × (id%4+1). */
  def pgm(id: Long): Array[Byte] = {
    val w = (id % 9 + 1).toInt
    val h = (id % 4 + 1).toInt
    val header = s"P5\n$w $h\n255\n".getBytes(US_ASCII)
    val out = new Array[Byte](header.length + w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < w * h) { out(header.length + i) = pxByte(id, i); i += 1 }
    out
  }

  /** 24-bit BI_RGB BMP, (id%11+1) × (id%5+1), rows bottom-up and padded
    * to 4 bytes. Padding is filled with 0xAB — legal (writers may leave
    * anything there) and chosen non-zero so a decoder that sums the raw
    * data block instead of the pixels diverges from the oracle.
    */
  def bmp(id: Long): Array[Byte] = {
    val w = (id % 11 + 1).toInt
    val h = (id % 5 + 1).toInt
    val stride = (3 * w + 3) / 4 * 4
    val size = 54 + stride * h
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size)
      .putInt(0).putInt(54) // reserved, pixel-data offset
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(stride * h) // BI_RGB, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette unused
    var i = 0L
    var row = 0
    while (row < h) {
      var x = 0
      while (x < 3 * w) { b.put(pxByte(id, i)); i += 1; x += 1 }
      var p = 3 * w
      while (p < stride) { b.put(0xab.toByte); p += 1 }
      row += 1
    }
    b.array()
  }
}
