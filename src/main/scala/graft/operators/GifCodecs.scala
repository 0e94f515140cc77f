package graft.operators

import java.nio.charset.StandardCharsets.US_ASCII

/** GIF89a decode — the palette-animation container (CompuServe GIF89a
  * spec, 1990-07-31; the LZW variant is the GIF flavor: variable code
  * width 3..12 bits LSB-first, CLEAR/EOI codes, frozen table at 4096).
  * Reference analog: the reference stores opaque media URIs
  * (/root/reference/src/utils/subgraph.py blob fields) — decode semantics
  * come from the public spec, like JPEG (T.81) and ADPCM did.
  *
  * What decoding proves, per feature column:
  *   - `width`/`height`: logical-screen descriptor parse (LE u16s);
  *   - `n_frames`/`delay_sum`: the block walk — image descriptors
  *     interleaved with graphic-control/comment/application extensions,
  *     each of which must be sub-block-walked to its terminator;
  *   - `idx_sum`: the LZW entropy decode itself (variable width,
  *     dictionary growth, mid-stream CLEAR resets, the KwKwK case,
  *     multi-sub-block reassembly) plus the 4-pass interlace scatter;
  *   - `px_sum`: palette resolution — global vs per-frame local tables;
  *   - `n_local`: local-color-table flags.
  *
  * Fail-loud contract like the other codecs: truncated streams, codes
  * beyond the dictionary, pixel overrun/underrun vs the descriptor's
  * area, and a missing trailer all throw with a named reason.
  */
object GifCodecs {

  /** One decoded frame: palette indices in GRID order (de-interlaced)
    * plus the palette that was active for the frame.
    */
  private[operators] case class Frame(
      w: Int, h: Int, interlaced: Boolean, localTable: Boolean,
      delayCs: Int, indices: Array[Byte], palette: Array[Byte])

  private[operators] case class Decoded(
      width: Int, height: Int, frames: Seq[Frame])

  /** GIF interlace passes: (first row, row step). */
  private[operators] val InterlacePasses: Seq[(Int, Int)] =
    Seq((0, 8), (4, 8), (2, 4), (1, 2))

  def decodeGif(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 13, "GIF truncated before the screen descriptor")
    val sig = new String(bytes, 0, 6, US_ASCII)
    require(sig == "GIF89a" || sig == "GIF87a", s"not a GIF signature: $sig")
    def u16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    val w = u16(6)
    val h = u16(8)
    val packed = bytes(10) & 0xff
    var pos = 13
    val globalTable: Array[Byte] =
      if ((packed & 0x80) != 0) {
        val n = 3 * (1 << ((packed & 0x07) + 1))
        require(pos + n <= bytes.length, "GIF truncated inside the global color table")
        val t = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
        pos += n
        t
      } else Array.emptyByteArray

    val frames = scala.collection.mutable.ArrayBuffer[Frame]()
    var pendingDelayCs = 0
    var sawTrailer = false
    while (!sawTrailer) {
      require(pos < bytes.length, "GIF truncated before the trailer")
      (bytes(pos) & 0xff) match {
        case 0x3b => // trailer
          sawTrailer = true
          pos += 1
        case 0x21 => // extension: label, then sub-blocks to a 0 terminator
          require(pos + 2 <= bytes.length, "GIF truncated inside an extension header")
          val label = bytes(pos + 1) & 0xff
          pos += 2
          if (label == 0xf9) { // graphic control: fixed 4-byte block
            require(pos + 6 <= bytes.length && (bytes(pos) & 0xff) == 4,
              "malformed graphic-control extension")
            pendingDelayCs = u16(pos + 2)
            pos += 5
            require((bytes(pos) & 0xff) == 0, "graphic-control block not terminated")
            pos += 1
          } else { // comment / application / plain-text: skip sub-blocks
            require(pos < bytes.length, "GIF truncated before an extension sub-block length")
            var len = bytes(pos) & 0xff
            pos += 1
            while (len != 0) {
              pos += len
              require(pos < bytes.length, "GIF truncated inside an extension")
              len = bytes(pos) & 0xff
              pos += 1
            }
          }
        case 0x2c => // image descriptor
          require(pos + 10 <= bytes.length, "GIF truncated inside an image descriptor")
          val fw = u16(pos + 5)
          val fh = u16(pos + 7)
          val fPacked = bytes(pos + 9) & 0xff
          val interlaced = (fPacked & 0x40) != 0
          val hasLocal = (fPacked & 0x80) != 0
          pos += 10
          val table =
            if (hasLocal) {
              val n = 3 * (1 << ((fPacked & 0x07) + 1))
              require(pos + n <= bytes.length, "GIF truncated inside a local color table")
              val t = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
              pos += n
              t
            } else {
              require(globalTable.nonEmpty,
                "frame has no local color table and the GIF has no global one")
              globalTable
            }
          require(pos < bytes.length, "GIF truncated before the LZW stream")
          val minCode = bytes(pos) & 0xff
          pos += 1
          // Reassemble the LZW byte stream from its sub-blocks.
          val data = new java.io.ByteArrayOutputStream()
          require(pos < bytes.length, "GIF truncated before an image sub-block length")
          var len = bytes(pos) & 0xff
          pos += 1
          while (len != 0) {
            require(pos + len <= bytes.length, "GIF truncated inside image data")
            data.write(bytes, pos, len)
            pos += len
            require(pos < bytes.length, "GIF truncated before an image sub-block length")
            len = bytes(pos) & 0xff
            pos += 1
          }
          val raw = lzwDecode(data.toByteArray, minCode, fw * fh)
          val grid = if (interlaced) deinterlace(raw, fw, fh) else raw
          frames += Frame(fw, fh, interlaced, hasLocal, pendingDelayCs, grid, table)
          pendingDelayCs = 0
        case b =>
          throw new IllegalArgumentException(f"unknown GIF block 0x$b%02x at $pos")
      }
    }
    require(frames.nonEmpty, "GIF carries no image frame")
    Decoded(w, h, frames.toSeq)
  }

  /** GIF-variant LZW decode: codes LSB-first at a width that starts at
    * minCode+1 and grows as the dictionary fills (to 12 bits, where the
    * table FREEZES until a CLEAR); CLEAR = 1<<minCode reinitializes,
    * EOI = CLEAR+1 ends the stream. `expect` pins the decoded pixel
    * count — over- or under-producing the descriptor's area is malformed.
    */
  private[operators] def lzwDecode(
      data: Array[Byte], minCode: Int, expect: Int): Array[Byte] = {
    require(minCode >= 2 && minCode <= 8, s"LZW min code size $minCode out of range")
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream(expect)
    // Dictionary as (prefix code, appended byte) pairs; single-index
    // entries are implicit (code < clear).
    val prefixOf = new Array[Int](4096)
    val byteOf = new Array[Byte](4096)
    var nextFree = clear + 2
    var width = minCode + 1
    var prev = -1
    var acc = 0L
    var accBits = 0
    var di = 0
    def emit(code: Int): Byte = { // writes the entry's bytes, returns its FIRST byte
      var stack = List.empty[Byte]
      var c = code
      while (c >= clear) { stack = byteOf(c) :: stack; c = prefixOf(c) }
      val first = c.toByte
      out.write(first)
      stack.foreach(out.write(_))
      first
    }
    var done = false
    while (!done) {
      while (accBits < width && di < data.length) {
        acc |= (data(di) & 0xffL) << accBits
        accBits += 8
        di += 1
      }
      require(accBits >= width, "LZW stream ended before EOI")
      val code = (acc & ((1 << width) - 1)).toInt
      acc >>>= width
      accBits -= width
      if (code == clear) {
        nextFree = clear + 2
        width = minCode + 1
        prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev < 0) { // first code after (re)init: a literal index
        require(code < clear, s"LZW first code $code is not a literal")
        out.write(code)
        prev = code
      } else {
        require(code <= nextFree && code != eoi,
          s"LZW code $code beyond dictionary size $nextFree")
        val first =
          if (code < nextFree) emit(code)
          else { // KwKwK: the just-about-to-be-defined entry
            val f = firstByteOf(code = prev, clear, prefixOf, byteOf)
            emit(prev)
            out.write(f)
            f
          }
        if (nextFree < 4096) { // table frozen at 4096 until a CLEAR
          prefixOf(nextFree) = prev
          byteOf(nextFree) = first
          nextFree += 1
          // The standard GIF rule: widen when the add fills the current
          // width's code space. (An encoder counting its OWN adds sits
          // one ahead — its first post-CLEAR code adds an entry, the
          // decoder's does not — so a naive encoder must widen at
          // 2^width + 1; the fixture encoder sidesteps the off-by-one by
          // simulating THIS counter.) Pinned both directions against the
          // JDK's independent ImageIO GIF implementation in GifSpec,
          // including streams that exercise growth mid-frame.
          if (nextFree == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    val px = out.toByteArray
    require(px.length == expect,
      s"LZW decoded ${px.length} pixels for a ${expect}-pixel frame")
    px
  }

  private def firstByteOf(
      code: Int, clear: Int, prefixOf: Array[Int], byteOf: Array[Byte]): Byte = {
    var c = code
    while (c >= clear) c = prefixOf(c)
    c.toByte
  }

  /** Scatter pass-ordered rows into the grid (GIF Appendix E: rows
    * 0,8,16.. then 4,12.. then 2,6,10.. then the odd rows).
    */
  private[operators] def deinterlace(raw: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val grid = new Array[Byte](raw.length)
    var src = 0
    InterlacePasses.foreach { case (first, step) =>
      var row = first
      while (row < h) {
        System.arraycopy(raw, src * w, grid, row * w, w)
        src += 1
        row += step
      }
    }
    grid
  }
}

/** Deterministic GIF fixtures + the generated DuckDB oracle — the
  * ImageFixtures pattern: payload bytes derive from doc_id formulas the
  * oracle replays symbolically, so a hash-match proves the Spark side
  * really walked the blocks, LZW-decoded the indices, de-interlaced, and
  * resolved the right palette. The encoder emits a CLEAR mid-stream
  * every [[ResetEvery]] pixels (dictionary reset is part of the format —
  * real encoders do this under adverse data) and splits the code bytes
  * into 17-byte sub-blocks (multi-block reassembly is mandatory).
  */
object GifFixtures {
  val GifMime = "image/gif"

  /** Palette size: 16 entries (size field 3). */
  private val PalBits = 3
  private val PalEntries = 1 << (PalBits + 1)

  /** Force a dictionary reset every this many pixels — tiny, so even the
    * smallest fixture exercises CLEAR handling mid-stream.
    */
  private val ResetEvery = 37

  def width(id: Long): Int = (id % 9 + 2).toInt
  def height(id: Long): Int = (id % 5 + 2).toInt
  def nFrames(id: Long): Int = (id % 3 + 1).toInt
  def interlaced(id: Long): Boolean = id % 4 == 1
  def hasLocalTable(id: Long, f: Int): Boolean = (id + f) % 3 == 2
  def delayCs(id: Long, f: Int): Int = ((id + 3 * f) % 100).toInt
  def palIdx(id: Long, f: Int, i: Int): Int = ((id * 31 + f * 7 + i) % PalEntries).toInt
  def globalPalByte(id: Long, e: Int, c: Int): Byte = ((id * 17 + e * 3 + c) % 256).toByte
  def localPalByte(id: Long, f: Int, e: Int, c: Int): Byte =
    ((id * 23 + f * 5 + e * 3 + c) % 256).toByte

  /** Real GIF89a: 1-3 full-frame images at (id%9+2) × (id%5+2), global
    * 16-entry palette, every (id+f)%3==2 frame carrying a LOCAL table,
    * all frames interlaced when id%4==1, per-frame graphic-control
    * delays, plus a comment and a NETSCAPE application extension the
    * decoder must skip.
    */
  def gif(id: Long): Array[Byte] = {
    val w = width(id)
    val h = height(id)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes(US_ASCII))
    // logical screen descriptor + global color table
    writeU16(out, w); writeU16(out, h)
    out.write(0x80 | (PalBits << 4) | PalBits) // GCT present, size 3 -> 16
    out.write(0) // background color index
    out.write(0) // aspect
    for (e <- 0 until PalEntries; c <- 0 until 3)
      out.write(globalPalByte(id, e, c) & 0xff)
    // a comment extension (skipped content)
    out.write(0x21); out.write(0xfe)
    val comment = s"fixture $id".getBytes(US_ASCII)
    out.write(comment.length); out.write(comment); out.write(0)
    // NETSCAPE2.0 application extension (loop count)
    out.write(0x21); out.write(0xff); out.write(11)
    out.write("NETSCAPE2.0".getBytes(US_ASCII))
    out.write(3); out.write(1); writeU16(out, 0); out.write(0)
    for (f <- 0 until nFrames(id)) {
      // graphic control
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0) // packed: no disposal, no transparency
      writeU16(out, delayCs(id, f))
      out.write(0) // transparent index (unused)
      out.write(0) // terminator
      // image descriptor
      out.write(0x2c)
      writeU16(out, 0); writeU16(out, 0); writeU16(out, w); writeU16(out, h)
      val local = hasLocalTable(id, f)
      out.write((if (local) 0x80 else 0) | (if (interlaced(id)) 0x40 else 0)
        | (if (local) PalBits else 0))
      if (local)
        for (e <- 0 until PalEntries; c <- 0 until 3)
          out.write(localPalByte(id, f, e, c) & 0xff)
      // pixel indices in GRID order, then reordered to the storage order
      val grid = Array.tabulate(w * h)(i => palIdx(id, f, i).toByte)
      val stored =
        if (!interlaced(id)) grid
        else {
          val rows = GifCodecs.InterlacePasses.flatMap { case (first, step) =>
            Iterator.iterate(first)(_ + step).takeWhile(_ < h).toSeq
          }
          rows.flatMap(r => grid.slice(r * w, (r + 1) * w)).toArray
        }
      val minCode = PalBits + 1 // 4 bits for 16 colors
      out.write(minCode)
      val lzw = lzwEncode(stored, minCode)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(17, lzw.length - off)
        out.write(n); out.write(lzw, off, n)
        off += n
      }
      out.write(0) // data terminator
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** GIF-variant LZW encode, with a forced CLEAR every [[ResetEvery]]
    * pixels. The code WIDTH is driven by an exact simulation of the
    * decoder's dictionary counter (the decoder adds one entry per DATA
    * code after the first since a CLEAR, and widens at 2^width - 1), so
    * the two sides cannot drift even at the no-add boundary emits right
    * before a CLEAR or the EOI — the width schedule is a pure function
    * of the code stream both sides see.
    */
  private[operators] def lzwEncode(px: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var accBits = 0
    var width = minCode + 1
    // The decoder's view: entries it will have added, first-code flag.
    var decNext = clear + 2
    var firstSinceClear = true
    def put(code: Int): Unit = {
      acc |= code.toLong << accBits
      accBits += width
      while (accBits >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; accBits -= 8 }
    }
    def putData(code: Int): Unit = {
      put(code)
      if (firstSinceClear) firstSinceClear = false
      else if (decNext < 4096) {
        decNext += 1
        if (decNext == (1 << width) && width < 12) width += 1
      }
    }
    def flush(): Unit = if (accBits > 0) { out.write((acc & 0xff).toInt); acc = 0; accBits = 0 }
    var dict = scala.collection.mutable.HashMap[(Int, Byte), Int]()
    var nextFree = clear + 2
    def resetTables(): Unit = {
      dict = scala.collection.mutable.HashMap()
      nextFree = clear + 2
      decNext = clear + 2
      firstSinceClear = true
      width = minCode + 1
    }
    put(clear)
    var prefix = -1
    var sincePixel = 0
    px.foreach { b =>
      val k = b & 0xff
      if (prefix < 0) prefix = k
      else dict.get((prefix, b)) match {
        case Some(c) => prefix = c
        case None =>
          putData(prefix)
          if (nextFree < 4096) {
            dict((prefix, b)) = nextFree
            nextFree += 1
          }
          prefix = k
      }
      sincePixel += 1
      if (sincePixel % ResetEvery == 0) {
        putData(prefix)
        put(clear)
        resetTables()
        prefix = -1
      }
    }
    if (prefix >= 0) putData(prefix)
    put(eoi)
    flush()
    out.toByteArray
  }

  private def writeU16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }

  /** DuckDB replay of the fixture formulas — idx_sum walks every frame's
    * pixel indices, px_sum resolves each index through the frame's
    * (local or global) palette, delay/local counts replay the per-frame
    * formulas. A hash-match proves the real decode.
    */
  val oracleSql: String =
    s"""WITH g AS (
      |  SELECT doc_id,
      |         CAST(doc_id % 9 + 2 AS BIGINT) AS w,
      |         CAST(doc_id % 5 + 2 AS BIGINT) AS h,
      |         CAST(doc_id % 3 + 1 AS BIGINT) AS nf
      |  FROM documents WHERE doc_id % 7 = 5),
      |f AS (
      |  SELECT doc_id, w, h, unnest(generate_series(0, nf - 1)) AS fr
      |  FROM g),
      |p AS (
      |  SELECT doc_id, fr,
      |         ((doc_id*31 + fr*7 + unnest(generate_series(0, w*h - 1))) % $PalEntries) AS e,
      |         CASE WHEN (doc_id + fr) % 3 = 2 THEN 1 ELSE 0 END AS loc
      |  FROM f),
      |s AS (
      |  SELECT doc_id,
      |         CAST(SUM(e) AS BIGINT) AS idx_sum,
      |         CAST(SUM(CASE WHEN loc = 1
      |           THEN (doc_id*23 + fr*5 + e*3    ) % 256
      |              + (doc_id*23 + fr*5 + e*3 + 1) % 256
      |              + (doc_id*23 + fr*5 + e*3 + 2) % 256
      |           ELSE (doc_id*17 + e*3    ) % 256
      |              + (doc_id*17 + e*3 + 1) % 256
      |              + (doc_id*17 + e*3 + 2) % 256 END) AS BIGINT) AS px_sum
      |  FROM p GROUP BY doc_id),
      |d AS (
      |  SELECT doc_id,
      |         CAST(SUM((doc_id + 3*fr) % 100) AS BIGINT) AS delay_sum,
      |         CAST(SUM(CASE WHEN (doc_id + fr) % 3 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_local
      |  FROM f GROUP BY doc_id)
      |SELECT g.doc_id, '$GifMime' AS mime, g.w AS width, g.h AS height,
      |       g.nf AS n_frames, d.n_local,
      |       CAST(CASE WHEN g.doc_id % 4 = 1 THEN 1 ELSE 0 END AS BIGINT) AS interlaced,
      |       d.delay_sum, s.idx_sum, s.px_sum
      |FROM g JOIN s USING (doc_id) JOIN d USING (doc_id)
      |ORDER BY g.doc_id""".stripMargin
}
