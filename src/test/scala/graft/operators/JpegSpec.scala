package graft.operators

/** JPEG contract, baseline AND progressive: the decoder recovers the
  * exact pixel-domain expectation from the real entropy-coded stream
  * (Huffman DC prediction with restart resets, AC run-length with ZRL,
  * byte stuffing, 4:2:0 upsampling, fixed-point color conversion;
  * progressive adds spectral selection, successive approximation, EOB
  * runs and refinement correction bits), the generated streams really
  * contain the structural features the decoder claims to handle, and
  * everything outside the two Huffman profiles rejects fail-loud.
  */
class JpegSpec extends org.scalatest.funsuite.AnyFunSuite {

  import JpegFixtures._

  /** Pixel-domain expectation computed directly from the coefficient
    * formulas (never through the byte stream) — what the DuckDB oracle
    * replays in SQL.
    */
  private def expected(id: Long): (Int, Int, Int, Int, Int, Long) = {
    val w = jpegWidth(id); val h = jpegHeight(id)
    val gray = isGray(id); val dri = restartInterval(id)
    def sgn(c: Int): Int = if (c % 4 == 0 || c % 4 == 3) 1 else -1
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (gray) {
          val b = (y / 8).toLong * ((w + 7) / 8) + (x / 8)
          val sx = sgn(x % 8); val sy = sgn(y % 8)
          sum += 128 + 2 * lumaDc(id, b) + sx * lumaAc40(id, b) +
            sy * lumaAc04(id, b) + sx * sy * lumaAc44(id, b)
        } else {
          val m = (y / 16).toLong * ((w + 15) / 16) + (x / 16)
          val lb = m * 4 + (y % 16) / 8 * 2 + (x % 16) / 8
          val sx = sgn(x % 8); val sy = sgn(y % 8)
          val yv = 128 + 2 * lumaDc(id, lb) + sx * lumaAc40(id, lb) +
            sy * lumaAc04(id, lb) + sx * sy * lumaAc44(id, lb)
          val scx = sgn((x % 16) / 2); val scy = sgn((y % 16) / 2)
          def ch(c: Int): Int =
            128 + 3 * chromaDc(id, m, c) + 2 * (scx * chromaAc40(id, m, c) +
              scy * chromaAc04(id, m, c) + scx * scy * chromaAc44(id, m, c))
          val (r, g, b2) = JpegCodecs.ycbcrToRgb(yv, ch(1), ch(2))
          sum += r + g + b2
        }
        x += 1
      }
      y += 1
    }
    val nMcus =
      if (gray) ((w + 7) / 8) * ((h + 7) / 8) else ((w + 15) / 16) * ((h + 15) / 16)
    // Progressive fixtures carry no DRI — the restart columns are 0.
    if (isProgressive(id)) (w, h, if (gray) 1 else 3, 0, 0, sum)
    else (w, h, if (gray) 1 else 3, dri, (nMcus - 1) / dri, sum)
  }

  // Mix of grayscale/color, both parities of partial edge MCUs, all
  // three restart intervals (id/6 % 3 spans 0,1,2 across the baseline
  // slice), and both encodings (id % 8 >= 4 is progressive, covering
  // gray 29/53 and color 5/23/47).
  private val ids = Seq(5L, 11L, 17L, 23L, 29L, 35L, 41L, 47L, 53L, 101L, 233L, 1001L)

  test("decode recovers the exact pixel-domain expectation from the entropy stream") {
    for (id <- ids) {
      val d = JpegCodecs.decodeJpeg(jpeg(id))
      val (w, h, nc, dri, nrst, sum) = expected(id)
      assert((d.width, d.height, d.nComponents) == ((w, h, nc)), s"id=$id dims")
      assert(d.restartInterval == dri, s"id=$id DRI")
      assert(d.nRestarts == nrst, s"id=$id restart count")
      assert(d.pxSum == sum, s"id=$id px_sum")
    }
  }

  test("the generated streams really contain restarts, stuffing and skipped segments") {
    // An id whose MCU count exceeds its restart interval: RST markers and
    // DC-predictor resets are live, not just declared in DRI.
    val withRestarts = ids.filter(id => expected(id)._5 > 0)
    assert(withRestarts.nonEmpty, "fixture sample must include restart-bearing streams")
    for (id <- withRestarts) {
      val b = jpeg(id)
      val rsts = (0 until b.length - 1).count(i =>
        (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) >= 0xd0 && (b(i + 1) & 0xff) <= 0xd7)
      assert(rsts == expected(id)._5, s"id=$id RST marker count in stream")
    }
    // Byte stuffing occurs somewhere across the corpus (FF 00 inside the
    // scan) — a decoder that does not un-stuff would desync there. FF
    // bytes are rare under the fixtures' low-valued canonical codes, so
    // scan a wide id range; the found stream must also decode, proving
    // the un-stuffing path really ran.
    val stuffed = (0 until 2000).iterator.map(k => 6L * k + 5).find { id =>
      val b = jpeg(id)
      (0 until b.length - 1).exists(i => (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0x00)
    }
    assert(stuffed.nonEmpty, "no stuffed byte in any fixture stream — stuffing path untested")
    assert(JpegCodecs.decodeJpeg(jpeg(stuffed.get)).pxSum == expected(stuffed.get)._6,
      s"stuffed stream ${stuffed.get} mis-decoded")
    // The COM segment is present and skipped (decode already succeeded above).
    val b5 = jpeg(5L)
    assert(new String(b5, "ISO-8859-1").contains("graft fixture 5"), "COM segment missing")
  }

  test("luma and chroma Huffman tables differ, and the stream carries custom tables") {
    val b = jpeg(11L)
    // DHT payload: 4 tables; luma DC lists sizes ascending, chroma DC the
    // reverse — byte-compare the two value lists inside the segment.
    val dhtAt = (0 until b.length - 1).indexWhere(i =>
      (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xc4)
    assert(dhtAt > 0, "DHT segment missing")
    val p = dhtAt + 4 // skip marker + length
    val lumaDcVals = b.slice(p + 17, p + 17 + 8).toSeq
    assert(lumaDcVals == (0 to 7).map(_.toByte).toSeq, "luma DC table not canonical ascending")
    // Annex K's luma DC BITS is (0,1,5,1,1,1,1,1,1,0,...) — ours is a flat
    // 8-codes-at-length-4 table, so a decoder hardcoding the standard
    // tables cannot decode these streams.
    val lumaDcBits = b.slice(p + 1, p + 17).map(_ & 0xff).toSeq
    assert(lumaDcBits == Seq(0, 0, 0, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
  }

  test("non-baseline and malformed streams reject fail-loud") {
    val good = jpeg(17L)
    // Lossless SOF3 named in the error (SOF2 is SUPPORTED since round 10).
    val sof3 = good.clone()
    val sofAt = (0 until sof3.length - 1).indexWhere(i =>
      (sof3(i) & 0xff) == 0xff && (sof3(i + 1) & 0xff) == 0xc0)
    sof3(sofAt + 1) = 0xc3.toByte
    val e1 = intercept[IllegalArgumentException](JpegCodecs.decodeJpeg(sof3))
    assert(e1.getMessage.contains("SOF"))
    // ...and rewriting a BASELINE stream's SOF0 marker to SOF2 must not
    // decode: its single full-band scan violates the progressive scan
    // constraints (Ss=0 requires Se=0).
    val sof2 = good.clone()
    sof2(sofAt + 1) = 0xc2.toByte
    intercept[IllegalArgumentException](JpegCodecs.decodeJpeg(sof2))
    // 16-bit DQT precision is not baseline.
    val dqt16 = good.clone()
    val dqtAt = (0 until dqt16.length - 1).indexWhere(i =>
      (dqt16(i) & 0xff) == 0xff && (dqt16(i + 1) & 0xff) == 0xdb)
    dqt16(dqtAt + 4) = 0x10.toByte
    val e2 = intercept[IllegalArgumentException](JpegCodecs.decodeJpeg(dqt16))
    assert(e2.getMessage.contains("DQT"))
    // Truncation inside the entropy stream.
    intercept[Exception](JpegCodecs.decodeJpeg(good.take(good.length - 6)))
    // Missing SOI.
    intercept[IllegalArgumentException](JpegCodecs.decodeJpeg(good.drop(2)))
  }

  test("progressive streams are real SOF2 multi-scan and decode to the baseline pixels") {
    val progIds = ids.filter(isProgressive)
    assert(progIds.exists(isGray) && progIds.exists(!isGray(_)),
      "progressive sample must cover grayscale and color")
    for (id <- progIds) {
      val b = jpeg(id)
      def markers(m: Int): Int = (0 until b.length - 1).count(i =>
        (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == m)
      assert(markers(0xc2) == 1 && markers(0xc0) == 0, s"id=$id not SOF2")
      assert(markers(0xdd) == 0, s"id=$id progressive fixture carries DRI")
      val nScans = markers(0xda)
      val expScans = if (isGray(id)) 2 + 4 else 2 + 12
      assert(nScans == expScans, s"id=$id scan count $nScans != $expScans")
      // Same coefficients, different scan script: the progressive decode
      // must land on EXACTLY the baseline encoding's pixels.
      val prog = JpegCodecs.decodeJpeg(b)
      val base = JpegCodecs.decodeJpeg(jpegBaseline(id))
      assert(prog.pxSum == base.pxSum && prog.width == base.width &&
        prog.height == base.height && prog.nComponents == base.nComponents,
        s"id=$id progressive decode diverges from baseline")
    }
  }

  test("progressive scan-script violations reject fail-loud") {
    val b = jpeg(23L) // color progressive
    // Third SOS is the first AC scan (ns=1): header bytes
    // [ff da len2 ns cs tdta ss se ahal] — corrupt Ss to 0 while Se stays
    // 20: a "DC" scan carrying AC must be rejected.
    val sosOffsets = (0 until b.length - 1).filter(i =>
      (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xda)
    assert(sosOffsets.length == 14)
    val acSos = sosOffsets(2)
    assert((b(acSos + 4) & 0xff) == 1 && (b(acSos + 7) & 0xff) == 1,
      "third scan is not the expected ns=1 Ss=1 AC scan")
    val badSs = b.clone()
    badSs(acSos + 7) = 0
    intercept[IllegalArgumentException](JpegCodecs.decodeJpeg(badSs))
    // Successive approximation must step one bit: Ah=2 with Al=0.
    val refSos = sosOffsets(8) // first refinement AC scan
    assert((b(refSos + 9) & 0xff) == 0x10, "ninth scan is not an Ah=1 refinement")
    val badAh = b.clone()
    badAh(refSos + 9) = 0x20.toByte
    intercept[IllegalArgumentException](JpegCodecs.decodeJpeg(badAh))
  }

  test("a flipped entropy bit never passes silently") {
    for (id <- Seq(5L, 11L)) {
      val good = jpeg(id)
      val want = JpegCodecs.decodeJpeg(good).pxSum
      // Flip the FIRST bit of the scan — always the opening bit of the
      // first DC Huffman code, never restart-boundary padding (padding
      // bits are don't-care by spec and CAN be absorbed silently).
      val sosAt = (0 until good.length - 1).indexWhere(i =>
        (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda)
      val scan = sosAt + 4 + (((good(sosAt + 2) & 0xff) << 8 | (good(sosAt + 3) & 0xff)) - 2)
      val bad = good.clone()
      bad(scan) = (bad(scan) ^ 0x80).toByte
      val outcome = try Some(JpegCodecs.decodeJpeg(bad).pxSum) catch { case _: Exception => None }
      assert(outcome != Some(want), s"id=$id bit flip was silently absorbed")
    }
  }
}
