package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real-codec contract: decoders parse actual bytes, reject malformed
  * payloads, and the mixed-mime features query routes every mime to the
  * right decoder.
  */
class MultimodalSpec extends SparkSpec {

  private def expectedPxSum(id: Long, nPx: Long): Long =
    (0L until nPx).map(i => (id * 31 + i) % 256).sum

  test("PPM codec round-trips generated headers and pixels") {
    for (id <- Seq(0L, 1L, 7L, 12L, 13L, 99L, 1000L)) {
      val (w, h, c, s) = ImageCodecs.decodePpm(ImageFixtures.ppm(id))
      assert((w, h, c) == (id % 13 + 1, id % 7 + 1, 3L), s"id=$id header")
      assert(s == expectedPxSum(id, 3 * w * h), s"id=$id pixel sum")
    }
  }

  test("PPM codec parses the header from bytes, not from conventions") {
    // hand-authored payload with multi-digit dims and extra whitespace
    val px = Array.tabulate(3 * 20 * 11)(_.toByte)
    val bytes = "P6\n  20\t 11 \n255\n".getBytes("US-ASCII") ++ px
    val (w, h, c, s) = ImageCodecs.decodePpm(bytes)
    assert((w, h, c) == (20L, 11L, 3L))
    assert(s == px.map(_ & 0xff).map(_.toLong).sum)
  }

  test("PGM codec round-trips generated headers and pixels (1 channel)") {
    for (id <- Seq(2L, 8L, 14L, 20L, 98L, 1004L)) {
      val (w, h, c, s) = ImageCodecs.decodePgm(ImageFixtures.pgm(id))
      assert((w, h, c) == (id % 9 + 1, id % 4 + 1, 1L), s"id=$id header")
      assert(s == expectedPxSum(id, w * h), s"id=$id pixel sum")
    }
    // hand-authored multi-digit dims with extra whitespace
    val px = Array.tabulate(17 * 12)(_.toByte)
    val bytes = "P5\n  17\t 12 \n255\n".getBytes("US-ASCII") ++ px
    val (w, h, c, s) = ImageCodecs.decodePgm(bytes)
    assert((w, h, c) == (17L, 12L, 1L))
    assert(s == px.map(b => (b & 0xff).toLong).sum)
    // P5 and P6 magics must not cross-decode
    intercept[IllegalArgumentException](ImageCodecs.decodePgm(ImageFixtures.ppm(1L)))
    intercept[IllegalArgumentException](ImageCodecs.decodePpm(ImageFixtures.pgm(2L)))
    // truncated pixel data
    intercept[IllegalArgumentException](
      ImageCodecs.decodePgm(ImageFixtures.pgm(8L).dropRight(1)))
  }

  test("BMP codec round-trips and skips row padding") {
    for (id <- Seq(0L, 3L, 6L, 9L, 33L, 999L)) {
      val bytes = ImageFixtures.bmp(id)
      val (w, h, c, s) = ImageCodecs.decodeBmp(bytes)
      assert((w, h, c) == (id % 11 + 1, id % 5 + 1, 3L), s"id=$id header")
      assert(s == expectedPxSum(id, 3 * w * h), s"id=$id pixel sum")
      // the generator pads rows with 0xAB: when padding exists, a naive
      // whole-block sum must DIVERGE from the codec's pixel-only sum
      if ((3 * w) % 4 != 0) {
        val naive = bytes.drop(54).map(b => (b & 0xff).toLong).sum
        assert(naive != s, s"id=$id: padding bytes leaked into the sum")
      }
    }
  }

  test("codecs fail loud on malformed payloads") {
    val okPpm = ImageFixtures.ppm(5L)
    val okBmp = ImageFixtures.bmp(6L)
    // bad magic
    intercept[IllegalArgumentException](ImageCodecs.decodePpm(okBmp))
    intercept[IllegalArgumentException](ImageCodecs.decodeBmp(okPpm))
    // truncated pixel data
    intercept[IllegalArgumentException](
      ImageCodecs.decodePpm(okPpm.dropRight(1)))
    intercept[IllegalArgumentException](
      ImageCodecs.decodeBmp(okBmp.dropRight(1)))
    // unsupported variant: flip bpp to 32
    val bad = okBmp.clone(); bad(28) = 32.toByte
    intercept[IllegalArgumentException](ImageCodecs.decodeBmp(bad))
  }

  /** Expected decoded pixel byte i for fixture PNG `id` (palette images
    * expand through the PLTE entries).
    */
  private def pngExpectedByte(id: Long, i: Int): Byte =
    ImageFixtures.pngColorType(id) match {
      case 3 =>
        val idx = ImageFixtures.paletteIdx(id, i / 3) & 0xff
        ImageFixtures.paletteByte(id, idx, i % 3)
      case _ => ImageFixtures.pxByte(id, i)
    }

  test("PNG codec round-trips all five color types and both bit depths") {
    // id%5 cycles RGB/RGBA/palette/gray/gray+alpha; 0, 14, 21, 28 are
    // 16-bit (id%7 == 0, non-palette)
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 5L, 7L, 14L, 19L, 21L, 28L, 43L, 1000L)) {
      val bytes = ImageFixtures.png(id)
      val ct = ImageFixtures.pngColorType(id)
      val bpc = ImageFixtures.pngBitDepth(id) / 8
      val chOut = if (ct == 3) 3L else ImageCodecs.pngChannels(ct).toLong
      val (w, h, c, s) = ImageCodecs.decodePng(bytes)
      assert((w, h, c) == (id % 11 + 1, id % 5 + 4, chOut), s"id=$id header")
      assert(ImageCodecs.pngIdatCount(bytes) == 2L, s"id=$id idat count")
      // byte-exact reconstruction, not just the sum (16-bit images carry
      // twice the bytes per channel)
      val (_, _, _, px) = ImageCodecs.pngPixels(bytes)
      val nOut = if (ct == 3) 3 * w * h
                 else ImageCodecs.pngChannels(ct) * bpc * w * h
      assert(px.length == nOut, s"id=$id pixel count")
      px.zipWithIndex.foreach { case (b, i) =>
        assert(b == pngExpectedByte(id, i), s"id=$id ct=$ct pixel $i")
      }
      assert(s == px.map(b => (b & 0xff).toLong).sum, s"id=$id pixel sum")
    }
  }

  test("Adam7 interlaced fixtures decode to the same pixels as the sequential layout") {
    // id % 13 == 11 stores Adam7 passes: 24 gray+alpha, 37 palette,
    // 50 RGB, 63 gray 16-bit — decoded pixels must be byte-identical to
    // the row-major grid (the oracle is layout-blind; a decoder that
    // ignores the interlace flag scatters pixels wrongly and diverges)
    for (id <- Seq(24L, 37L, 50L, 63L)) {
      assert(ImageFixtures.pngInterlaced(id), s"id=$id not an interlaced fixture")
      val (w, h, _, px) = ImageCodecs.pngPixels(ImageFixtures.png(id))
      assert((w, h) == (id % 11 + 1, id % 5 + 4))
      px.zipWithIndex.foreach { case (b, i) =>
        assert(b == pngExpectedByte(id, i), s"id=$id pixel $i")
      }
    }
    // the interlace flag round-trips through the real IHDR byte
    assert((ImageFixtures.png(24L)(28) & 0xff) == 1)
    assert((ImageFixtures.png(23L)(28) & 0xff) == 0)
  }

  test("PNG filters really change the stored bytes (an unfiltered reader diverges)") {
    // h >= 4 guarantees sub/up/average rows in every image, h >= 5 adds
    // paeth. Summing the raw inflated bytes (minus filter bytes) must NOT
    // equal the true pixel sum — the trap the un-filter step exists for.
    // One id per stride class: 9 gray+alpha, 7 palette, 5 RGB (the
    // palette naive sum additionally skips the PLTE expansion, diverging
    // twice over).
    for (id <- Seq(9L, 7L, 5L)) {
      val bytes = ImageFixtures.png(id)
      val bpp = ImageCodecs.pngChannels(ImageFixtures.pngColorType(id)) *
        (ImageFixtures.pngBitDepth(id) / 8)
      val (w, h, _, trueSum) = ImageCodecs.decodePng(bytes)
      // naive read: inflate and sum everything except the filter bytes
      val chunks = collection.mutable.ArrayBuffer[Byte]()
      var pos = 8
      val bb = java.nio.ByteBuffer.wrap(bytes)
      while (pos < bytes.length) {
        val len = bb.getInt(pos)
        if (new String(bytes, pos + 4, 4, "US-ASCII") == "IDAT")
          chunks ++= bytes.slice(pos + 8, pos + 8 + len)
        pos += 12 + len
      }
      val stride = bpp * w.toInt
      val raw = new Array[Byte](h.toInt * (1 + stride))
      val inf = new java.util.zip.Inflater()
      inf.setInput(chunks.toArray)
      inf.inflate(raw); inf.end()
      val naive = (0 until h.toInt).map { y =>
        raw.slice(y * (1 + stride) + 1, (y + 1) * (1 + stride))
          .map(b => (b & 0xff).toLong).sum
      }.sum
      assert(naive != trueSum,
        s"id=$id: filters were all no-ops — the trap is not exercised")
    }
  }

  test("PNG codec fails loud on malformed payloads") {
    val good = ImageFixtures.png(7L)
    // corrupted CRC: flip a byte inside the first IDAT's data
    val idatData = good.indexOfSlice("IDAT".getBytes("US-ASCII")) + 4
    val bad = good.clone()
    bad(idatData + 5) = (bad(idatData + 5) ^ 0x5a).toByte
    intercept[IllegalArgumentException](ImageCodecs.decodePng(bad))
    // truncated file
    intercept[IllegalArgumentException](
      ImageCodecs.decodePng(good.dropRight(6)))
    // bad signature
    intercept[IllegalArgumentException](
      ImageCodecs.decodePng("not a png at all".getBytes("US-ASCII")))
    // unsupported color type (7 does not exist): rebuild the IHDR chunk
    // with a RECOMPUTED CRC so the reject provably happens at the variant
    // check, not the CRC guard
    val ihdrData = good.slice(16, 29)
    ihdrData(9) = 7.toByte // color type byte
    val badType = good.take(8) ++ ImageFixtures.pngChunk("IHDR", ihdrData) ++ good.drop(33)
    val typeErr = intercept[IllegalArgumentException](ImageCodecs.decodePng(badType))
    assert(typeErr.getMessage.contains("color type"), s"wrong reject: $typeErr")
    // 16-bit PALETTE (spec-invalid; 16-bit is supported only for the
    // non-palette types), same CRC-valid discipline — good is id 7,
    // a palette fixture under the id%5 cycle
    val deep = good.slice(16, 29); deep(8) = 16.toByte
    val deepErr = intercept[IllegalArgumentException](ImageCodecs.decodePng(
      good.take(8) ++ ImageFixtures.pngChunk("IHDR", deep) ++ good.drop(33)))
    assert(deepErr.getMessage.contains("bit depth"), s"wrong reject: $deepErr")
    // ...and a depth that exists in no PNG variant
    val d4 = good.slice(16, 29); d4(8) = 4.toByte
    val d4Err = intercept[IllegalArgumentException](ImageCodecs.decodePng(
      good.take(8) ++ ImageFixtures.pngChunk("IHDR", d4) ++ good.drop(33)))
    assert(d4Err.getMessage.contains("bit depth"), s"wrong reject: $d4Err")
    // palette image with the PLTE chunk spliced out
    val pal = ImageFixtures.png(7L) // id%5=2 -> color type 3
    val plteAt = pal.indexOfSlice("PLTE".getBytes("US-ASCII")) - 4
    assert(plteAt >= 0, "fixture 7 must carry a PLTE chunk")
    val plteLen = java.nio.ByteBuffer.wrap(pal).getInt(plteAt)
    val noPlte = pal.take(plteAt) ++ pal.drop(plteAt + 12 + plteLen)
    val plteErr = intercept[IllegalArgumentException](ImageCodecs.decodePng(noPlte))
    assert(plteErr.getMessage.contains("PLTE"), s"wrong reject: $plteErr")
  }

  test("png query decodes real PNGs of all five color types and both depths batch-wide") {
    val rows = MultimodalOps.nsMultimodalPng(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val seenTypes = collection.mutable.Set[Long]()
    val seenDepths = collection.mutable.Set[Long]()
    rows.foreach { r =>
      val (id, w, h, ct, bd, il, ch, px, ni) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
          r.getLong(9))
      assert(id % 4 == 3)
      assert((w, h) == (id % 11 + 1, id % 5 + 4))
      assert(ct == ImageFixtures.pngColorType(id))
      assert(bd == ImageFixtures.pngBitDepth(id))
      assert(il == (if (ImageFixtures.pngInterlaced(id)) 1L else 0L))
      val chRaw = ImageCodecs.pngChannels(ct.toInt)
      assert(ch == (if (ct == 3) 3L else chRaw.toLong))
      val n = (if (ct == 3) 3 * w * h else chRaw * (bd / 8) * w * h).toInt
      assert(px == (0 until n).map(i => (pngExpectedByte(id, i) & 0xff).toLong).sum,
        s"id=$id px_sum")
      assert(ni == 2L)
      seenTypes += ct
      seenDepths += bd
    }
    assert(seenTypes == Set(0L, 2L, 3L, 4L, 6L),
      "corpus must exercise all five color types")
    assert(seenDepths == Set(8L, 16L), "corpus must exercise both bit depths")
    assert(rows.exists(_.getLong(6) == 1L), "corpus must exercise Adam7 interlacing")
  }

  test("WAV codec round-trips generated chunk lists and samples") {
    for (id <- Seq(1L, 5L, 13L, 57L, 121L, 1001L)) {
      val d = AudioCodecs.decodeWav(AudioFixtures.wav(id))
      val n = AudioFixtures.nSamples(id)
      assert((d.sampleRate, d.channels, d.nSamples) == (8000L, 1L, n.toLong), s"id=$id header")
      val samples = (0 until n).map(i => AudioFixtures.sample(id, i).toLong)
      assert(d.absSum == samples.map(math.abs).sum, s"id=$id absSum")
      assert(d.peak == samples.map(math.abs).max, s"id=$id peak")
    }
  }

  test("WAV codec walks chunks (junk LIST) and handles stereo and odd-sized chunks") {
    import java.nio.{ByteBuffer, ByteOrder}
    // hand-authored stereo PCM16 with an ODD-sized junk chunk (forces the
    // RIFF pad byte) before data
    val samples = Array[Short](100, -200, 300, -400, 32767, -32768)
    val junk = 3
    val dataBytes = samples.length * 2
    val buf = ByteBuffer.allocate(12 + 24 + 8 + junk + 1 + 8 + dataBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(buf.capacity - 8)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1).putShort(2).putInt(44100).putInt(44100 * 4)
    buf.putShort(4).putShort(16)
    buf.put("junk".getBytes("US-ASCII")).putInt(junk)
    buf.put(Array[Byte](0xCD.toByte, 0xCD.toByte, 0xCD.toByte, 0)) // body + pad
    buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    samples.foreach(buf.putShort)
    val d = AudioCodecs.decodeWav(buf.array())
    assert((d.sampleRate, d.channels, d.nSamples) == (44100L, 2L, 3L))
    assert(d.absSum == samples.map(s => math.abs(s.toLong)).sum)
    assert(d.peak == 32768L)
  }

  test("WAV codec fails loud on malformed payloads") {
    val ok = AudioFixtures.wav(9L)
    // a fixed-offset decoder would read the LIST trap bytes as samples:
    // prove data is NOT at byte 44
    assert(new String(ok, 36, 4, "US-ASCII") != "data")
    // bad magic
    intercept[IllegalArgumentException](AudioCodecs.decodeWav(ImageFixtures.ppm(3L)))
    // truncated data chunk
    intercept[IllegalArgumentException](AudioCodecs.decodeWav(ok.dropRight(1)))
    // inconsistent RIFF size
    val badSize = ok.clone(); badSize(4) = (badSize(4) + 1).toByte
    intercept[IllegalArgumentException](AudioCodecs.decodeWav(badSize))
    // non-PCM format code
    val badFmt = ok.clone(); badFmt(20) = 3.toByte
    intercept[IllegalArgumentException](AudioCodecs.decodeWav(badFmt))
    // unsupported bit depth
    val badBits = ok.clone(); badBits(34) = 8.toByte
    intercept[IllegalArgumentException](AudioCodecs.decodeWav(badBits))
  }

  test("audio query decodes real WAVs batch-wide") {
    val rows = MultimodalOps.nsMultimodalAudio(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(id % 4 == 1)
      val d = AudioCodecs.decodeWav(AudioFixtures.wav(id))
      assert(r.getLong(4) == d.nSamples && r.getLong(6) == d.absSum
        && r.getLong(7) == d.peak, s"id=$id row mismatch")
      assert(r.getLong(2) == 60L + 2 * d.nSamples, s"id=$id n_bytes")
      assert(r.getLong(5) == d.nSamples * 1000L / 8000L, s"id=$id duration")
    }
  }

  test("AVI codec round-trips generated frames and skips DIB row padding") {
    for (id <- Seq(2L, 7L, 12L, 57L, 102L)) {
      val bytes = AviFixtures.avi(id)
      val d = VideoCodecs.decodeAvi(bytes)
      val (w, h, n) = (AviFixtures.width(id), AviFixtures.height(id), AviFixtures.nFrames(id))
      assert((d.width, d.height, d.frameSums.length) == (w.toLong, h.toLong, n), s"id=$id header")
      (0 until n).foreach { f =>
        val want = (0L until 3L * w * h)
          .map(k => (AviFixtures.pxByte(id, f, k) & 0xff).toLong).sum
        assert(d.frameSums(f) == want, s"id=$id frame $f")
      }
      // padding trap: when rows pad, a naive whole-movi byte sum diverges
      if ((3 * w) % 4 != 0) {
        val stride = (3 * w + 3) / 4 * 4
        assert(stride * h > 3 * w * h) // padding exists for this id
      }
    }
  }

  test("AVI codec fails loud on malformed payloads") {
    val ok = AviFixtures.avi(7L)
    // bad magic
    intercept[IllegalArgumentException](VideoCodecs.decodeAvi(AudioFixtures.wav(7L)))
    // truncated frame data
    intercept[IllegalArgumentException](VideoCodecs.decodeAvi(ok.dropRight(1)))
    // inconsistent RIFF size
    val badSize = ok.clone(); badSize(4) = (badSize(4) + 1).toByte
    intercept[IllegalArgumentException](VideoCodecs.decodeAvi(badSize))
    // frame-count mismatch: bump avih total_frames — avih body starts at
    // RIFF(12) + LIST hdr(8) + 'hdrl'(4) + avih hdr(8) = 32, field at +16
    val badN = ok.clone(); badN(48) = (badN(48) + 1).toByte
    intercept[IllegalArgumentException](VideoCodecs.decodeAvi(badN))
    // unsupported bit depth: strf biBitCount lives 14 bytes into strf body
    val strfBody = ok.indexOfSlice("strf".getBytes("US-ASCII")) + 8
    val badBits = ok.clone(); badBits(strfBody + 14) = 32.toByte
    intercept[IllegalArgumentException](VideoCodecs.decodeAvi(badBits))
    // compressed stream rejected
    val badComp = ok.clone(); badComp(strfBody + 16) = 1.toByte
    intercept[IllegalArgumentException](VideoCodecs.decodeAvi(badComp))
  }

  test("video query samples every 2nd real decoded frame batch-wide") {
    val rows = MultimodalOps.nsMultimodalVideo(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, f) = (r.getLong(0), r.getLong(1))
      assert(id % 5 == 2 && f % 2 == 0)
      val d = VideoCodecs.decodeAvi(AviFixtures.avi(id))
      assert(r.getLong(2) == d.width && r.getLong(3) == d.height
        && r.getLong(4) == d.frameSums.length && r.getLong(5) == d.frameSums(f.toInt),
        s"id=$id frame $f")
    }
    // sampled-per-doc counts: ceil(n_frames / 2)
    rows.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      assert(rs.length == (AviFixtures.nFrames(id) + 1) / 2, s"id=$id count")
    }
  }

  test("resize decimates real pixels with input-position weights") {
    def brute(w: Long, h: Long, px: Array[Byte]): (Long, Long, Long) = {
      val (ow, oh) = ((w + 1) / 2, (h + 1) / 2)
      val sum = (for {
        oy <- 0L until oh; ox <- 0L until ow; c <- 0 until 3
      } yield {
        val i = ((oy * 2) * w + ox * 2) * 3 + c
        (px(i.toInt) & 0xff).toLong * ((i % 97) + 1)
      }).sum
      (ow, oh, sum)
    }
    // PPM ids cover odd AND even dims (w=id%13+1, h=id%7+1)
    for (id <- Seq(1L, 4L, 7L, 13L, 100L)) {
      val rec = MultimodalOps.MediaRecord(id, ImageFixtures.PpmMime, ImageFixtures.ppm(id))
      val got = MultimodalOps.Resampler.resize(rec)
      val (w, h, px) = ImageCodecs.ppmPixels(rec.payload)
      val (ow, oh, sum) = brute(w, h, px)
      assert((got.out_w, got.out_h, got.kept_units, got.resize_checksum) ==
        (ow, oh, ow * oh * 3, sum), s"ppm id=$id")
    }
    // BMP path: same arithmetic after the codec strips row padding
    for (id <- Seq(3L, 6L, 9L)) {
      val rec = MultimodalOps.MediaRecord(id, ImageFixtures.BmpMime, ImageFixtures.bmp(id))
      val got = MultimodalOps.Resampler.resize(rec)
      val (w, h, px) = ImageCodecs.bmpPixels(rec.payload)
      val (ow, oh, sum) = brute(w, h, px)
      assert((got.out_w, got.out_h, got.resize_checksum) == (ow, oh, sum), s"bmp id=$id")
    }
    // PGM path: single-channel stride (i = (oy·2)·w + ox·2)
    for (id <- Seq(2L, 8L, 14L, 20L)) {
      val rec = MultimodalOps.MediaRecord(id, ImageFixtures.PgmMime, ImageFixtures.pgm(id))
      val got = MultimodalOps.Resampler.resize(rec)
      val (w, h, px) = ImageCodecs.pgmPixels(rec.payload)
      val (ow, oh) = ((w + 1) / 2, (h + 1) / 2)
      val sum = (for { oy <- 0L until oh; ox <- 0L until ow } yield {
        val i = (oy * 2) * w + ox * 2
        (px(i.toInt) & 0xff).toLong * ((i % 97) + 1)
      }).sum
      assert((got.out_w, got.out_h, got.kept_units, got.resize_checksum) ==
        (ow, oh, ow * oh, sum), s"pgm id=$id")
    }
  }

  test("features query decodes all four mimes with real headers") {
    val rows = MultimodalOps.nsMultimodalFeatures(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byMime = rows.groupBy(_.getString(1))
    assert(byMime.keySet ==
      Set(ImageFixtures.PpmMime, ImageFixtures.BmpMime, ImageFixtures.PgmMime,
        "text/plain"))
    rows.foreach { r =>
      val (id, mime, w, h, px) =
        (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4), r.getLong(6))
      mime match {
        case ImageFixtures.PpmMime =>
          assert((w, h) == (id % 13 + 1, id % 7 + 1) && px >= 0)
        case ImageFixtures.BmpMime =>
          assert((w, h) == (id % 11 + 1, id % 5 + 1) && px >= 0)
        case ImageFixtures.PgmMime =>
          assert((w, h) == (id % 9 + 1, id % 4 + 1) && px >= 0)
          assert(r.getLong(5) == 1L, "pgm must report 1 channel")
        case _ => assert(px == -1L, "stub rows must mark px_sum = -1")
      }
    }
  }
}
