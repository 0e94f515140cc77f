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

  /** Real PNG (color types 0 grayscale, 2 RGB, 3 palette, 4 gray+alpha,
    * 6 RGBA; bit depth 8, or 16 for the non-palette types): signature,
    * chunk walk with CRC32 verification, multi-IDAT zlib stream inflated
    * via the JDK's `java.util.zip.Inflater` (zero external dependencies),
    * and scanline UN-FILTERING — each row carries a filter byte (0 none /
    * 1 sub / 2 up / 3 average / 4 paeth) whose prediction is reversed
    * byte-wise mod 256 at the color type's pixel stride in BYTES
    * (channels·depth/8 — per the spec, 16-bit samples filter as byte
    * pairs). Palette images expand through the PLTE chunk to 3-channel
    * RGB — a real corpus's PNGs are majority palette/alpha, so both
    * paths matter. The fixture generator cycles ALL FIVE filter types
    * across rows, so a reader that skips un-filtering (summing the raw
    * inflated bytes) diverges from the oracle — the compressed-format
    * analog of the BMP row-padding trap.
    *
    * Adam7 INTERLACED images decode too: the seven passes un-filter
    * independently and scatter onto the output grid, so decoded pixels
    * are layout-identical to the sequential form.
    *
    * Fail-loud contract like the other codecs: bad signature, CRC
    * mismatch, unsupported IHDR variant (color type outside 0/2/3/4/6,
    * depth outside 8/16, 16-bit palette, interlace > 1), missing/short
    * PLTE, out-of-range palette index, truncated or oversized inflate
    * all throw.
    */
  def decodePng(bytes: Array[Byte]): Decoded = {
    val (w, h, c, px) = pngPixels(bytes)
    var sum = 0L
    var i = 0
    while (i < px.length) { sum += px(i) & 0xff; i += 1 }
    (w, h, c, sum)
  }

  /** Channel count of PNG color type `ct` (palette counts its 1 index
    * byte pre-expansion; decode expands it to 3).
    */
  def pngChannels(ct: Int): Int = ct match {
    case 0 => 1 // grayscale
    case 2 => 3 // truecolor RGB
    case 3 => 1 // palette index
    case 4 => 2 // gray + alpha
    case 6 => 4 // truecolor + alpha
    case _ => throw new IllegalArgumentException(
      s"PNG: unsupported color type $ct")
  }

  /** Number of IDAT chunks in a PNG payload — the multi-chunk layout
    * statistic the registered query reports (a single zlib stream may
    * legally split across any number of IDATs).
    */
  def pngIdatCount(bytes: Array[Byte]): Long =
    pngChunks(bytes).count(_._1 == "IDAT").toLong

  /** Full PNG decode: (width, height, channels,
    * channels·(depth/8)·w·h pixel bytes row-major, un-filtered; 16-bit
    * samples stay as big-endian byte pairs; palette images arrive
    * EXPANDED to RGB).
    */
  def pngPixels(bytes: Array[Byte]): (Long, Long, Long, Array[Byte]) = {
    val chunks = pngChunks(bytes)
    require(chunks.nonEmpty && chunks.head._1 == "IHDR", "PNG: IHDR not first")
    require(chunks.last._1 == "IEND", "PNG: missing IEND")
    val ihdr = chunks.head._2
    require(ihdr.length == 13, s"PNG: IHDR length ${ihdr.length}")
    val hb = ByteBuffer.wrap(ihdr).order(ByteOrder.BIG_ENDIAN)
    val w = hb.getInt(0)
    val h = hb.getInt(4)
    val (depth, color) = (ihdr(8) & 0xff, ihdr(9) & 0xff)
    val (comp, filt, interlace) = (ihdr(10) & 0xff, ihdr(11) & 0xff, ihdr(12) & 0xff)
    require(w > 0 && h > 0, s"PNG: bad dimensions ${w}x$h")
    val channels = pngChannels(color) // throws on color types outside 0/2/3/4/6
    require(depth == 8 || (color != 3 && depth == 16),
      s"PNG: unsupported bit depth $depth for color type $color")
    // bytes per pixel in the FILTERED stream (the predictor stride —
    // per the spec, filtering operates on BYTES at this stride even for
    // 16-bit samples)
    val bpp = channels * (depth / 8)
    require(comp == 0 && filt == 0 && interlace <= 1,
      s"PNG: unsupported comp/filter/interlace $comp/$filt/$interlace")
    require(4L * w * h <= Int.MaxValue, s"PNG: ${w}x$h overflows the buffer")
    val idat = chunks.filter(_._1 == "IDAT").map(_._2)
    require(idat.nonEmpty, "PNG: no IDAT chunk")
    val stream = new Array[Byte](idat.map(_.length).sum)
    idat.foldLeft(0) { (off, c) => System.arraycopy(c, 0, stream, off, c.length); off + c.length }
    // One zlib stream across all IDATs. Sequential layout: h scanlines of
    // (1 filter byte + bpp·w pixel bytes). Adam7 interlace: seven passes,
    // each a sub-image of every (xStep, yStep)-th pixel, INDEPENDENTLY
    // filtered (an empty pass contributes no scanlines at all).
    val passes: Seq[(Int, Int, Int, Int)] =
      if (interlace == 0) Seq((0, 0, 1, 1)) else Adam7Passes
    val passDims = passes.map { case (x0, y0, xs, ys) =>
      (math.max(0, (w - x0 + xs - 1) / xs), math.max(0, (h - y0 + ys - 1) / ys))
    }
    // Long arithmetic for the filtered-stream length: Adam7 carries up to
    // ~1.875·h filter bytes (one per pass scanline), so an adversarial
    // near-2 GB interlaced IHDR could overflow an Int sum while passing a
    // sequential-layout guard.
    val rawLenL = passes.indices.map { p =>
      val (wp, hp) = passDims(p)
      if (wp == 0 || hp == 0) 0L else hp.toLong * (1L + bpp.toLong * wp)
    }.sum
    require(rawLenL <= Int.MaxValue,
      s"PNG: ${w}x$h filtered stream overflows the buffer")
    val rawLen = rawLenL.toInt
    // Drain loop: Inflater.inflate may legally return fewer bytes than
    // available per call, and a stream decoding to MORE than the image
    // must fail loud, so loop to finished() and check both directions.
    val raw = new Array[Byte](rawLen)
    val inf = new java.util.zip.Inflater()
    val got = try {
      inf.setInput(stream)
      var n = 0
      var stalled = false
      while (!inf.finished() && n < raw.length && !stalled) {
        val k = inf.inflate(raw, n, raw.length - n)
        if (k == 0 && !inf.finished()) stalled = true // truncated/needs-input
        n += k
      }
      require(!stalled, s"PNG: truncated zlib stream (inflated $n of ${raw.length} bytes)")
      require(inf.finished(), s"PNG: zlib stream larger than the ${raw.length}-byte image")
      n
    } finally inf.end()
    require(got == raw.length, s"PNG: inflated $got of ${raw.length} bytes")
    // Un-filter each pass independently, then scatter its pixels onto the
    // output grid (for the sequential layout the single pass IS the grid).
    val out = new Array[Byte](h * bpp * w)
    var off = 0
    passes.indices.foreach { p =>
      val (x0, y0, xs, ys) = passes(p)
      val (wp, hp) = passDims(p)
      if (wp > 0 && hp > 0) {
        val sub = unfilterPass(raw, off, wp, hp, bpp)
        off += hp * (1 + bpp * wp)
        var py = 0
        while (py < hp) {
          var px = 0
          while (px < wp) {
            System.arraycopy(sub, (py * wp + px) * bpp,
              out, ((y0 + py * ys) * w + (x0 + px * xs)) * bpp, bpp)
            px += 1
          }
          py += 1
        }
      }
    }
    if (color == 3) {
      // Palette expansion: every index byte looks up its 3-byte PLTE
      // entry. PLTE is mandatory for color type 3 and precedes IDAT.
      val plteIdx = chunks.indexWhere(_._1 == "PLTE")
      require(plteIdx >= 0, "PNG: palette image without PLTE chunk")
      require(plteIdx < chunks.indexWhere(_._1 == "IDAT"),
        "PNG: PLTE must precede IDAT")
      val plte = chunks(plteIdx)._2
      require(plte.length % 3 == 0 && plte.length > 0 && plte.length <= 3 * 256,
        s"PNG: bad PLTE length ${plte.length}")
      val entries = plte.length / 3
      val rgb = new Array[Byte](3 * w * h)
      var i = 0
      while (i < out.length) {
        val e = out(i) & 0xff
        require(e < entries, s"PNG: palette index $e >= $entries entries")
        rgb(3 * i) = plte(3 * e)
        rgb(3 * i + 1) = plte(3 * e + 1)
        rgb(3 * i + 2) = plte(3 * e + 2)
        i += 1
      }
      (w, h, 3L, rgb)
    } else (w, h, channels.toLong, out)
  }

  /** Adam7 pass grid: (xStart, yStart, xStep, yStep) per pass — the
    * spec's interlace order (pass k carries every (xStep, yStep)-th
    * pixel offset by (xStart, yStart)).
    */
  private[operators] val Adam7Passes: Seq[(Int, Int, Int, Int)] = Seq(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Reverse the scanline filters of ONE pass: `hPx` rows of
    * (1 filter byte + bpp·wPx pixel bytes) starting at `raw(off)`,
    * predictors byte-wise mod 256 at stride `bpp`, previous-row
    * references resolving WITHIN the pass (each Adam7 pass filters
    * independently). Returns the bpp·wPx·hPx un-filtered pixel bytes.
    */
  private def unfilterPass(
      raw: Array[Byte], off: Int, wPx: Int, hPx: Int, bpp: Int): Array[Byte] = {
    val stride = bpp * wPx
    val out = new Array[Byte](hPx * stride)
    var y = 0
    while (y < hPx) {
      val rowIn = off + y * (1 + stride) + 1
      val rowOut = y * stride
      val f = raw(rowIn - 1) & 0xff
      require(f <= 4, s"PNG: unknown filter type $f in row $y")
      var x = 0
      while (x < stride) {
        val a = if (x >= bpp) out(rowOut + x - bpp) & 0xff else 0 // left
        val b = if (y > 0) out(rowOut - stride + x) & 0xff else 0 // up
        val c = if (x >= bpp && y > 0) out(rowOut - stride + x - bpp) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => // Paeth predictor
            val p = a + b - c
            val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        out(rowOut + x) = ((raw(rowIn + x) & 0xff) + pred).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** PNG chunk walk: verifies the 8-byte signature and EVERY chunk's
    * CRC32 (over type+data), returns (type, data) in file order.
    */
  private def pngChunks(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    require(bytes.length >= 8 && bytes.take(8).sameElements(sig),
      "not a PNG: bad signature")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val out = Seq.newBuilder[(String, Array[Byte])]
    var pos = 8
    while (pos < bytes.length) {
      require(pos + 12 <= bytes.length, "PNG: truncated chunk header")
      val len = b.getInt(pos)
      require(len >= 0 && pos + 12 + len <= bytes.length,
        s"PNG: truncated chunk data (len $len at $pos)")
      val typ = new String(bytes, pos + 4, 4, US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue.toInt == b.getInt(pos + 8 + len),
        s"PNG: CRC mismatch in '$typ' chunk")
      out += ((typ, java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)))
      pos += 12 + len
    }
    out.result()
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
  val PngMime = "image/png"

  /** PNG chunk assembly with a real CRC32 — exposed so specs can author
    * variant payloads (e.g. an unsupported-IHDR case with a VALID CRC,
    * proving the reject happens at the variant check, not the CRC guard).
    */
  def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(12 + data.length).order(ByteOrder.BIG_ENDIAN)
    out.putInt(data.length).put(typ.getBytes(US_ASCII)).put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(typ.getBytes(US_ASCII)); crc.update(data)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** Color type of fixture PNG `id`: ids cycle 2 (RGB) / 6 (RGBA) /
    * 3 (palette) / 0 (grayscale) / 4 (gray+alpha) by id%5 — a real
    * corpus's PNGs span all five, so the decoder must handle them all.
    */
  def pngColorType(id: Long): Int =
    (id % 5).toInt match {
      case 0 => 2; case 1 => 6; case 2 => 3; case 3 => 0; case _ => 4
    }

  /** Bit depth of fixture PNG `id`: every 7th non-palette id is 16-bit
    * (big-endian sample pairs; palette is 8-bit by the spec for sub-256
    * palettes and stays 8 here).
    */
  def pngBitDepth(id: Long): Int =
    if (pngColorType(id) != 3 && id % 7 == 0) 16 else 8

  /** Every 13th-ish fixture id (id % 13 == 11) stores its scanlines in
    * the Adam7 INTERLACED layout — same decoded pixels, different
    * storage order, so the oracle is layout-blind and a decoder that
    * ignores the interlace flag diverges.
    */
  def pngInterlaced(id: Long): Boolean = id % 13 == 11

  /** PLTE entry byte (entry e, component c) of fixture PNG `id`. */
  def paletteByte(id: Long, e: Int, c: Int): Byte =
    ((id * 13 + e * 3 + c) % 256).toByte

  private val PaletteEntries = 16

  /** Palette index of pixel i for a palette fixture: (id·31 + i) % 16. */
  def paletteIdx(id: Long, i: Long): Byte = ((id * 31 + i) % PaletteEntries).toByte

  /** Real PNG, (id%11+1) × (id%5+4), color type by [[pngColorType]]
    * (RGB / RGBA / palette / grayscale / gray+alpha cycling with id%5),
    * bit depth by [[pngBitDepth]] (every 7th non-palette id is 16-bit):
    * raw stream byte i is [[pxByte]] (for 16-bit images the big-endian
    * sample pairs are simply consecutive [[pxByte]] bytes — the oracle
    * sums bytes, not samples) or palette index [[paletteIdx]] with PLTE
    * entries [[paletteByte]]; row r is FILTERED with type r % 5 at the
    * color type's pixel stride in BYTES (so every image with h >= 5
    * exercises none/sub/up/average/paeth — the decoder must reverse all
    * four non-trivial predictors to recover the pixels), the filtered
    * scanlines deflate into ONE zlib stream split across TWO IDAT chunks
    * (multi-IDAT concatenation is part of the format), and every chunk
    * carries a real CRC32. h >= 4 guarantees sub/up/average appear even
    * in the smallest image; compressed byte counts are
    * Deflater-version-dependent, so the oracle never references payload
    * size — only header fields and pixel statistics.
    */
  def png(id: Long): Array[Byte] = {
    val w = (id % 11 + 1).toInt
    val h = (id % 5 + 4).toInt
    val colorType = pngColorType(id)
    val depth = pngBitDepth(id)
    val bpp = ImageCodecs.pngChannels(colorType) * (depth / 8)
    val stride = bpp * w
    // raw image bytes in row-major grid order — IDENTICAL for the
    // sequential and interlaced layouts, so the oracle's pixel formulas
    // never mention interlacing (only the STORAGE order differs; a
    // decoder that ignores the interlace flag scatters pixels wrongly
    // and diverges).
    val raw = Array.tabulate(h * stride) { i =>
      if (colorType == 3) paletteIdx(id, i) else pxByte(id, i)
    }
    // Filter rows of one (sub-)image; previous-row references resolve
    // within the sub-image (each Adam7 pass filters independently).
    def filterRows(sub: Array[Byte], wPx: Int, hPx: Int, fOf: Int => Int): Array[Byte] = {
      val st = bpp * wPx
      val out = new Array[Byte](hPx * (1 + st))
      var y = 0
      while (y < hPx) {
        val f = fOf(y)
        out(y * (1 + st)) = f.toByte
        var x = 0
        while (x < st) {
          val cur = sub(y * st + x) & 0xff
          val a = if (x >= bpp) sub(y * st + x - bpp) & 0xff else 0
          val b = if (y > 0) sub((y - 1) * st + x) & 0xff else 0
          val c = if (x >= bpp && y > 0) sub((y - 1) * st + x - bpp) & 0xff else 0
          val pred = f match {
            case 0 => 0
            case 1 => a
            case 2 => b
            case 3 => (a + b) / 2
            case 4 =>
              val p = a + b - c
              val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
              if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
          }
          out(y * (1 + st) + 1 + x) = (cur - pred).toByte
          x += 1
        }
        y += 1
      }
      out
    }
    val filtered: Array[Byte] =
      if (!pngInterlaced(id)) filterRows(raw, w, h, y => y % 5)
      else {
        // Adam7: gather each pass's sub-image from the grid, filter it
        // independently, concatenate in pass order. The filter-type
        // cycle runs over the GLOBAL scanline counter so all five
        // types still appear.
        var rowCounter = 0
        val parts = ImageCodecs.Adam7Passes.map { case (x0, y0, xs, ys) =>
          val wp = math.max(0, (w - x0 + xs - 1) / xs)
          val hp = math.max(0, (h - y0 + ys - 1) / ys)
          if (wp == 0 || hp == 0) Array.emptyByteArray
          else {
            val sub = new Array[Byte](hp * bpp * wp)
            for (py <- 0 until hp; px <- 0 until wp)
              System.arraycopy(raw, ((y0 + py * ys) * w + (x0 + px * xs)) * bpp,
                sub, (py * wp + px) * bpp, bpp)
            val base = rowCounter
            rowCounter += hp
            filterRows(sub, wp, hp, y => (base + y) % 5)
          }
        }
        parts.flatten.toArray
      }
    val defl = new java.util.zip.Deflater()
    defl.setInput(filtered)
    defl.finish()
    val zbuf = new Array[Byte](filtered.length + 64)
    val zlen = defl.deflate(zbuf)
    val done = defl.finished()
    defl.end()
    require(done, "deflate output buffer too small for the fixture image")
    val z = java.util.Arrays.copyOf(zbuf, zlen)
    val chunk = pngChunk _
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(w).putInt(h).put(depth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte)
      .put((if (pngInterlaced(id)) 1 else 0).toByte).array()
    val plte =
      if (colorType == 3)
        chunk("PLTE", Array.tabulate(3 * PaletteEntries)(j => paletteByte(id, j / 3, j % 3)))
      else Array.emptyByteArray
    val (z1, z2) = z.splitAt(math.max(1, z.length / 2))
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ plte ++ chunk("IDAT", z1) ++ chunk("IDAT", z2) ++
      chunk("IEND", Array.emptyByteArray)
  }

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
