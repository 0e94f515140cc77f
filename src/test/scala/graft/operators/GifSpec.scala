package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** GIF codec contract. Two interop pins matter more than the
  * self-round-trip: GIF's variable-width LZW has a notorious
  * encoder/decoder width-schedule off-by-one (the decoder's dictionary
  * add lags the encoder's by one code), so the fixture encoder and our
  * decoder are each checked against the JDK's independent ImageIO GIF
  * implementation — agreeing with ourselves proves nothing if both sides
  * share a dialect bug.
  */
class GifSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  test("LZW round-trip: random index streams across reset and width-growth boundaries") {
    for (seed <- 1 to 8; n <- Seq(1, 5, 36, 37, 38, 74, 200, 1000)) {
      val r = rng(seed * 1000L + n)
      val px = Array.fill(n)((r.nextInt(16)).toByte)
      val enc = GifFixtures.lzwEncode(px, 4)
      val dec = GifCodecs.lzwDecode(enc, 4, n)
      assert(dec.sameElements(px), s"round-trip broke at seed=$seed n=$n")
    }
    // Low-entropy data grows long dictionary chains (fast width growth).
    val runs = Array.tabulate(3000)(i => ((i / 97) % 4).toByte)
    assert(GifCodecs.lzwDecode(GifFixtures.lzwEncode(runs, 2), 2, runs.length)
      .sameElements(runs))
  }

  /** Single-frame GIF from our encoder at an arbitrary size — the oracle
    * fixtures are deliberately tiny, but the JDK READER mangles images
    * below ~65 pixels (measured on its own writer's output: a 7x2 loses
    * its last row, 16x4 loses 15 pixels, 8x8/13x9/40x30 are clean — the
    * truncated-final-block GIFImageReader bug class), so the
    * reader-direction interop pin runs at sizes the JDK handles.
    */
  private def bigGif(w: Int, h: Int, interlace: Boolean, seed: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(w & 0xff); out.write(w >> 8); out.write(h & 0xff); out.write(h >> 8)
    out.write(0x80 | 0x30 | 3); out.write(0); out.write(0)
    for (e <- 0 until 16; c <- 0 until 3) out.write(((seed * 11 + e * 3 + c) % 256).toInt)
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(w & 0xff); out.write(w >> 8); out.write(h & 0xff); out.write(h >> 8)
    out.write(if (interlace) 0x40 else 0)
    val grid = Array.tabulate(w * h)(i => ((seed * 31 + i * i) % 16).toByte)
    val stored =
      if (!interlace) grid
      else GifCodecs.InterlacePasses.flatMap { case (first, step) =>
        Iterator.iterate(first)(_ + step).takeWhile(_ < h)
          .flatMap(r => grid.slice(r * w, (r + 1) * w)).toSeq
      }.toArray
    out.write(4)
    val lzw = GifFixtures.lzwEncode(stored, 4)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(200, lzw.length - off)
      out.write(n); out.write(lzw, off, n)
      off += n
    }
    out.write(0); out.write(0x3b)
    out.toByteArray
  }

  test("our encoder's streams decode identically under the JDK's independent ImageIO reader") {
    // Sizes past the JDK reader's small-image bug; all exceed the forced
    // CLEAR cadence (37 px) so mid-stream resets and width growth are in
    // the stream the JDK validates.
    for (((w, h, inter), seed) <- Seq((10, 10, false), (40, 30, false),
        (33, 17, true), (13, 9, true)).zipWithIndex) {
      val bytes = bigGif(w, h, inter, seed + 2L)
      val ours = GifCodecs.decodeGif(bytes)
      val fr = ours.frames.head
      val rd = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      rd.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      val img = rd.read(0)
      assert(img.getWidth == w && img.getHeight == h, s"${w}x$h dims")
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val e = (fr.indices(y * w + x) & 0xff) * 3
        val want = (0xff << 24) | ((fr.palette(e) & 0xff) << 16) |
          ((fr.palette(e + 1) & 0xff) << 8) | (fr.palette(e + 2) & 0xff)
        assert(rgb == want,
          f"${w}x$h interlace=$inter pixel ($x,$y): jdk=0x$rgb%08x ours=0x$want%08x")
      }
      rd.dispose()
    }
  }

  test("the JDK's ImageIO GIF writer produces streams our decoder reads (incl. interlaced)") {
    for (seed <- Seq(3L, 8L, 21L, 34L, 55L)) {
      val r = rng(seed)
      val w = 2 + r.nextInt(40)
      val h = 2 + r.nextInt(30)
      val interlace = seed % 2 == 1
      val pal = Array.tabulate(16)(e => Array.tabulate(3)(c => ((seed * 7 + e * 3 + c) % 256).toByte))
      val cm = new java.awt.image.IndexColorModel(4, 16,
        pal.map(_(0)), pal.map(_(1)), pal.map(_(2)))
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      val idx = Array.tabulate(w * h)(i => ((seed * 31 + i) % 16).toInt)
      for (y <- 0 until h; x <- 0 until w) {
        val e = idx(y * w + x)
        img.setRGB(x, y, (0xff << 24) | ((pal(e)(0) & 0xff) << 16) |
          ((pal(e)(1) & 0xff) << 8) | (pal(e)(2) & 0xff))
      }
      val bos = new java.io.ByteArrayOutputStream()
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val p = wr.getDefaultWriteParam
      if (interlace)
        p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      else
        p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      wr.setOutput(ios)
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close(); wr.dispose()
      val d = GifCodecs.decodeGif(bos.toByteArray)
      assert(d.frames.size == 1)
      val fr = d.frames.head
      assert(fr.interlaced == interlace, s"seed=$seed interlace flag ${fr.interlaced}")
      assert(fr.w == w && fr.h == h, s"seed=$seed dims ${fr.w}x${fr.h} want ${w}x$h")
      for (i <- 0 until w * h) {
        val e = (fr.indices(i) & 0xff) * 3
        val got = ((fr.palette(e) & 0xff), (fr.palette(e + 1) & 0xff), (fr.palette(e + 2) & 0xff))
        val want = ((pal(idx(i))(0) & 0xff), (pal(idx(i))(1) & 0xff), (pal(idx(i))(2) & 0xff))
        assert(got == want, s"seed=$seed pixel $i: $got want $want")
      }
    }
  }

  test("interlaced storage decodes to the same grid as sequential") {
    // id=1 is interlaced (1%4==1); id=13 has the same (w,h,frames) class
    // formulas except interlace. Compare each against the formula directly.
    for (id <- Seq(1L, 13L, 17L, 33L)) {
      val d = GifCodecs.decodeGif(GifFixtures.gif(id))
      for ((fr, f) <- d.frames.zipWithIndex; i <- 0 until fr.w * fr.h)
        assert((fr.indices(i) & 0xff) == GifFixtures.palIdx(id, f, i),
          s"id=$id frame $f pixel $i (interlaced=${fr.interlaced})")
    }
  }

  test("malformed streams fail loud") {
    val good = GifFixtures.gif(5L)
    // signature
    val badSig = good.clone(); badSig(0) = 'J'.toByte
    assertThrows[IllegalArgumentException](GifCodecs.decodeGif(badSig))
    // missing trailer
    assertThrows[IllegalArgumentException](
      GifCodecs.decodeGif(java.util.Arrays.copyOf(good, good.length - 1)))
    // LZW code beyond the dictionary: feed a 4-bit stream whose second
    // code references an entry that cannot exist yet.
    val bogus = Array[Byte]((0x10 | (0x1f >> 4)).toByte, 0x1f.toByte, 0x00)
    assertThrows[IllegalArgumentException](GifCodecs.lzwDecode(
      Array[Byte](0x10, 0xff.toByte, 0x03), 4, 4))
    assert(bogus.length == 3) // (silence unused-val lint in older scalac)
    // pixel-count mismatch vs the descriptor
    assertThrows[IllegalArgumentException](GifCodecs.lzwDecode(
      GifFixtures.lzwEncode(Array[Byte](1, 2, 3, 4), 4), 4, 5))
    // truncation at EVERY prefix length must be the named
    // IllegalArgumentException, never an ArrayIndexOutOfBounds — this
    // sweeps the stream through every sub-block-length read site.
    for (n <- 0 until good.length - 1) {
      val e = intercept[IllegalArgumentException](
        GifCodecs.decodeGif(java.util.Arrays.copyOf(good, n)))
      assert(e.getMessage != null, s"unnamed failure at prefix $n")
    }
  }
}
