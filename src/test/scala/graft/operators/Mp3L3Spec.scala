package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Layer III contract: the decoder recovers EXACTLY the values the fixture
  * generator authored — through the bit reservoir, the canonical Huffman
  * codebooks, linbits escapes, sign bits, scfsi sharing and all four block
  * types — fails loud on everything outside the profile, the codebooks are
  * valid prefix codes that round-trip, and trailing count1 stuffing bits
  * are rewound, not decoded.
  */
class Mp3L3Spec extends AnyFunSuite {
  import Mp3L3Codecs._

  /** Feature recompute straight from the fixture formulas — an independent
    * path (no bitstream) to the same numbers the decoder must extract from
    * the packed bits. The DuckDB oracle is the third, engine-independent
    * path.
    */
  private def expected(d: Long): Mp3L3Decoded = {
    import Mp3L3Fixtures._
    val nf = nFrames(d)
    var side = 0L; var scf = 0L; var huff = 0L; var deq = 0L
    var alias0 = 0L; var imdct0 = 0L; var vA = 0L; var synA = 0L
    for (f <- 0 until nf) {
      val scfsi = scfsiOf(d, f)
      side += mdBeginOf(d, f) + scfsi
      for (g <- 0 until 2) {
        val bt = blockType(d, f, g); val ws = bt != 0
        val sc = scalefacCompress(d, f, g); val s1 = Slen1(sc); val s2 = Slen2(sc)
        val gg = globalGain(d, f, g); val sfs = scalefacScale(d, g)
        val pre = preflagOf(d, f, g); val c1 = count1Table(d, f, g)
        val nq = nQuads(d, f, g); val bv = bigValues(d, f, g)
        var part2 = 0
        val scfL = new Array[Int](22); val scfS = Array.ofDim[Int](12, 3)
        if (bt == 2) {
          part2 = 3 * (6 * s1 + 6 * s2)
          for (b <- 0 until 12; w <- 0 until 3) {
            val sl = if (b < 6) s1 else s2
            scfS(b)(w) = scfShort(d, f, g, b, w, sl); scf += scfS(b)(w)
          }
        } else {
          for (b <- 0 until 21) {
            val group = if (b < 6) 0 else if (b < 11) 1 else if (b < 16) 2 else 3
            val shared = g == 1 && ((scfsi >> (3 - group)) & 1) == 1
            val ge = if (shared) 0 else g
            val sce = scalefacCompress(d, f, ge)
            val sl = if (b < 11) Slen1(sce) else Slen2(sce)
            scfL(b) = scfLong(d, f, ge, b, sl); scf += scfL(b)
            if (!shared) part2 += sl
          }
        }
        var part3 = 0
        val av = new Array[Int](576); val ng = new Array[Boolean](576)
        for (p <- 0 until bv) {
          val p0 = 2 * p
          val tid = tableFor(d, f, g, regionOf(d, f, g, p0))
          if (tid != 0) {
            val pt = PairTables(tid)
            val rx = rawVal(d, f, g, p0, pt.dim)
            val ry = rawVal(d, f, g, p0 + 1, pt.dim)
            part3 += math.min(22, 2 + rx + ry)
            for ((raw, pp) <- Seq((rx, p0), (ry, p0 + 1))) {
              val esc = if (pt.linbits > 0 && raw == 15) escVal(d, f, pp, tid) else 0
              av(pp) = raw + esc; ng(pp) = negOf(d, f, g, pp); huff += av(pp)
              part3 += (if (pt.linbits > 0 && raw == 15) pt.linbits else 0) +
                (if (av(pp) != 0) 1 else 0)
            }
          }
        }
        for (p <- 0 until nq) {
          val pos0 = 2 * bv + 4 * p
          var ones = 0
          for (k <- 0 until 4) {
            val b = quadBit(d, f, g, p, k)
            av(pos0 + k) = b; ng(pos0 + k) = negOf(d, f, g, pos0 + k)
            ones += b; huff += b
          }
          part3 += (if (c1 == 0) 3 + ones else 4) + ones
        }
        side += (part2 + part3) + bv + gg + sc + (if (ws) 1 else 0) +
          (if (ws) bt + tableFor(d, f, g, 0) + tableFor(d, f, g, 1) +
            (0 until 3).map(subblockGain(d, f, _)).sum
           else (0 until 3).map(tableFor(d, f, g, _)).sum +
            region0Count(d, f) + region1Count(d, g)) +
          pre + sfs + c1
        // requantization
        val n = 2 * bv + 4 * nq
        val xr = new Array[Long](576)
        for (p <- 0 until n if av(p) != 0) {
          val q =
            if (bt == 2) {
              var b = 0; while (3 * ShortIdx(b + 1) <= p) b += 1
              val wdt = ShortIdx(b + 1) - ShortIdx(b)
              val w = (p - 3 * ShortIdx(b)) / wdt
              gg - 210 - 8 * subblockGain(d, f, w) - 2 * (1 + sfs) * scfS(b)(w)
            } else {
              var b = 0; while (LongIdx(b + 1) <= p) b += 1
              gg - 210 - 2 * (1 + sfs) * (scfL(b) + pre * Pretab(b))
            }
          xr(p) = requantQ24(av(p), ng(p), q)
          deq += math.abs(xr(p))
        }
        if (f == 0 && g == 0) {
          import Mp3Codecs.smDiv
          val xa = xr.clone()
          for (s <- 1 until 32; k <- 0 until 8) {
            val lo = 18 * s - 1 - k; val hi = 18 * s + k
            val aIn = xr(lo); val bIn = xr(hi)
            if (aIn != 0 || bIn != 0) {
              xa(lo) = smDiv(CsQ30(k) * aIn, 1L << 30) - smDiv(CaQ30(k) * bIn, 1L << 30)
              xa(hi) = smDiv(CsQ30(k) * bIn, 1L << 30) + smDiv(CaQ30(k) * aIn, 1L << 30)
            }
          }
          alias0 += xa.map(math.abs).sum
          val out0 = new Array[Long](32); val out1 = new Array[Long](32)
          for (sb <- 0 until 32; t <- 0 until 18) {
            var acc = 0L
            for (k <- 0 until 18; x = xa(18 * sb + k) if x != 0)
              acc += smDiv(Imdct36Q30(t)(k) * x, 1L << 30)
            val wv = smDiv(acc * Win36Q30(t), 1L << 30)
            imdct0 += math.abs(wv)
            val inv = if (sb % 2 == 1 && t % 2 == 1) -wv else wv
            if (t == 0) out0(sb) = inv
            if (t == 1) out1(sb) = inv
          }
          val va = new Array[Long](64); val vb = new Array[Long](64)
          for (i <- 0 until 64) {
            va(i) = (0 until 32).map(k =>
              if (out0(k) == 0) 0L else smDiv(Mp3Codecs.CosQ30(i)(k) * out0(k), 1L << 30)).sum
            vb(i) = (0 until 32).map(k =>
              if (out1(k) == 0) 0L else smDiv(Mp3Codecs.CosQ30(i)(k) * out1(k), 1L << 30)).sum
            vA += math.abs(va(i)) + math.abs(vb(i))
          }
          for (j <- 0 until 32) {
            val p1 = smDiv(Mp3Codecs.WinQ30(j) * va(j), 1L << 30)
            val p2 = smDiv(Mp3Codecs.WinQ30(j) * vb(j), 1L << 30) +
              smDiv(Mp3Codecs.WinQ30(j + 32) * va(32 + j), 1L << 30)
            synA += math.abs(p1) + math.abs(p2)
          }
        }
      }
    }
    Mp3L3Decoded(nf.toLong, 32000L, bitrateKbps(d).toLong, nf * 1152L,
      side, scf, huff, deq, alias0, imdct0, vA, synA)
  }

  test("decode(generate(id)) round-trips every authored value across all variants") {
    // 60 stripe ids cover all (nFrames, bitrate) pairs, all four granule-1
    // block types, scfsi modes, both count1 tables, and every table in the
    // {1,5,7,10,13,16,24,30} selector cycle incl. linbits escapes.
    for (k <- 0 until 60) {
      val d = 7L + 9L * k
      val got = Mp3L3Codecs.decodeMp3L3(Mp3L3Fixtures.mp3l3(d))
      assert(got == expected(d), s"doc $d: $got != ${expected(d)}")
    }
  }

  test("the fixtures exercise a live bit reservoir (nonzero main_data_begin)") {
    val withReservoir = (0 until 60).map(k => 7L + 9L * k).filter { d =>
      Mp3L3Fixtures.nFrames(d) >= 2 &&
        (1 until Mp3L3Fixtures.nFrames(d)).exists(Mp3L3Fixtures.mdBeginOf(d, _) > 0)
    }
    assert(withReservoir.size > 20, s"only ${withReservoir.size} reservoir docs in the sweep")
    // Corrupting main_data_begin must fail loud (underrun), never silently
    // shift the read position. d=16: 64 kbps, slot 267 bytes, 2 frames —
    // a >=510-byte pointer always points before the stream.
    val d = 16L
    assert(Mp3L3Fixtures.bitrateKbps(d) == 64 && Mp3L3Fixtures.nFrames(d) == 2)
    val bytes = Mp3L3Fixtures.mp3l3(d)
    val frameBytes = 144 * 64 * 1000 / 32000
    // main_data_begin is the first 9 bits after the 4-byte header of frame 1
    val mut = bytes.clone()
    mut(frameBytes + 4) = 0xff.toByte
    val e = intercept[IllegalArgumentException](Mp3L3Codecs.decodeMp3L3(mut))
    assert(e.getMessage.contains("reservoir"), e.getMessage)
  }

  test("fail-loud: out-of-profile streams are rejected by name, never mis-decoded") {
    val good = Mp3L3Fixtures.mp3l3(7L)
    def mut(i: Int, b: Int): Array[Byte] = { val c = good.clone(); c(i) = b.toByte; c }
    // byte1 = sync 1111, ID 1, layer 10 (Layer II), prot 1 = 0xFD
    val l2 = intercept[IllegalArgumentException](Mp3L3Codecs.decodeMp3L3(mut(1, 0xfd)))
    assert(l2.getMessage.contains("Layer III"), l2.getMessage)
    // stereo mode '00' (byte3 high bits)
    val st = intercept[IllegalArgumentException](Mp3L3Codecs.decodeMp3L3(mut(3, good(3) & 0x3f)))
    assert(st.getMessage.contains("mono"), st.getMessage)
    // broken sync
    assertThrows[IllegalArgumentException](Mp3L3Codecs.decodeMp3L3(mut(0, 0x00)))
    // truncated body
    assertThrows[IllegalArgumentException](Mp3L3Codecs.decodeMp3L3(good.take(good.length - 1)))
    // 44.1 kHz sampling bits '00'
    assertThrows[IllegalArgumentException](Mp3L3Codecs.decodeMp3L3(mut(2, good(2) & 0xf3)))
  }

  test("canonical pair codebooks are prefix-free and round-trip through the bit cursor") {
    for (pt <- PairTables.values) {
      // prefix-freeness: no code is a prefix of a longer one
      val codes = pt.enc.toSeq
      for (Seq((c1, l1), (c2, l2)) <- codes.combinations(2).map(_.sortBy(_._2))) {
        assert(l1 != l2 || c1 != c2, s"table ${pt.id}: duplicate code")
        if (l1 < l2) assert((c2 >> (l2 - l1)) != c1,
          s"table ${pt.id}: ($c1,$l1) prefixes ($c2,$l2)")
      }
      // encode -> BitCursor decode round trip over every symbol
      val bb = new Mp3L3Fixtures.BitBuf
      val syms = (0 until pt.dim * pt.dim).map(s => { val (c, l) = pt.enc(s); bb.write(c, l); s })
      val cur = new BitCursor(bb.toBytes, 0)
      for (s <- syms) {
        var code = 0; var len = 0; var got = -1
        while (got < 0 && len < pt.maxLen) {
          code = (code << 1) | cur.read1(); len += 1
          got = pt.dec.getOrElse((len, code), -1)
        }
        assert(got == s, s"table ${pt.id}: symbol $s decoded as $got")
      }
    }
    // count1 table A same properties
    for (Seq(a, b) <- QuadAEnc.toSeq.combinations(2).map(_.sortBy(_._2))) {
      if (a._2 < b._2) assert((b._1 >> (b._2 - a._2)) != a._1, "count1 A prefix violation")
      else assert(a != b, "count1 A duplicate")
    }
  }

  test("count1 table B is the spec's 4-bit ones'-complement code") {
    // encode v as (~v)&0xF in 4 bits; decoding inverts back — a bijection
    // whose all-zero quadruple gets code 1111 (never a sync-like run)
    for (v <- 0 until 16) {
      val code = (~v) & 0xf
      assert(((~code) & 0xf) == v)
    }
    assert(((~0) & 0xf) == 15)
  }

  test("trailing stuffing bits inside part2_3_length are rewound, not decoded (table B)") {
    // Hand-assemble a single frame whose granule data is followed by 3
    // stuffing bits counted inside part2_3_length: with count1 table B a
    // quadruple needs >= 4 bits, so the decoder must rewind and stop.
    val d = 7L
    // find (f,g)=(0,gx) with count1 table B; (d+f+g)%2==1 -> g=0 for d=7
    assert(Mp3L3Fixtures.count1Table(d, 0, 0) == 1)
    val scfsi = Mp3L3Fixtures.scfsiOf(d, 0)
    val g0 = Mp3L3Fixtures.granuleBits(d, 0, 0, scfsi)
    val g1 = Mp3L3Fixtures.granuleBits(d, 0, 1, scfsi)
    val part230 = g0.length + 3 // 3 stuffing bits
    val fb = new Mp3L3Fixtures.BitBuf
    fb.append(g0); fb.write(5, 3) // stuffing '101'
    fb.append(g1)
    val kbps = Mp3L3Fixtures.bitrateKbps(d)
    val frameBytes = 144 * kbps * 1000 / 32000
    val slot = frameBytes - 21
    val w = new Mp3Codecs.BitWriter
    w.write(0xfff, 12); w.write(1, 1); w.write(1, 2); w.write(1, 1)
    w.write(kbps match { case 64 => 5; case 96 => 7; case _ => 9 }, 4)
    w.write(2, 2); w.write(0, 1); w.write(0, 1)
    w.write(3, 2); w.write(0, 2); w.write(0, 1); w.write(1, 1); w.write(0, 2)
    w.write(0, 9); w.write(0, 5); w.write(scfsi, 4)
    for (g <- 0 until 2) {
      val bt = Mp3L3Fixtures.blockType(d, 0, g); val ws = bt != 0
      w.write(if (g == 0) part230 else g1.length, 12)
      w.write(Mp3L3Fixtures.bigValues(d, 0, g), 9)
      w.write(Mp3L3Fixtures.globalGain(d, 0, g), 8)
      w.write(Mp3L3Fixtures.scalefacCompress(d, 0, g), 4)
      w.write(if (ws) 1 else 0, 1)
      if (ws) {
        w.write(bt, 2); w.write(0, 1)
        w.write(Mp3L3Fixtures.tableFor(d, 0, g, 0), 5)
        w.write(Mp3L3Fixtures.tableFor(d, 0, g, 1), 5)
        for (k <- 0 until 3) w.write(Mp3L3Fixtures.subblockGain(d, 0, k), 3)
      } else {
        for (reg <- 0 until 3) w.write(Mp3L3Fixtures.tableFor(d, 0, g, reg), 5)
        w.write(Mp3L3Fixtures.region0Count(d, 0), 4)
        w.write(Mp3L3Fixtures.region1Count(d, g), 3)
      }
      w.write(Mp3L3Fixtures.preflagOf(d, 0, g), 1)
      w.write(Mp3L3Fixtures.scalefacScale(d, g), 1)
      w.write(Mp3L3Fixtures.count1Table(d, 0, g), 1)
    }
    val head = w.bytes
    assert(head.length == 21)
    val md = java.util.Arrays.copyOf(fb.toBytes, slot)
    val frame = head ++ md
    val got = Mp3L3Codecs.decodeMp3L3(frame)
    // Same decoded values as the unstuffed single-frame stream except the
    // 3 extra accounted bits in side_sum.
    val clean = Mp3L3Codecs.decodeMp3L3(Mp3L3Fixtures.mp3l3(d).take(frameBytes))
    assert(got.copy(sideSum = got.sideSum - 3) == clean)
  }

  test("window/ladder tables have the spec shapes") {
    assert(QuarterQ12.toSeq == Seq(4096L, 4871L, 5793L, 6889L))
    assert(WinStartQ30.slice(18, 24).forall(_ == (1L << 30)))
    assert(WinStartQ30.slice(30, 36).forall(_ == 0L))
    assert(WinStopQ30.take(6).forall(_ == 0L))
    assert(WinStopQ30.slice(12, 18).forall(_ == (1L << 30)))
    assert(LongIdx.head == 0 && LongIdx.last == 576 && LongIdx.length == 23)
    assert(ShortIdx.head == 0 && ShortIdx.last == 192 && ShortIdx.length == 13)
    assert(LongIdx.sliding(2).forall(p => p(1) > p(0) && (p(1) - p(0)) % 2 == 0))
    assert(pow43Q14(0) == 0L && pow43Q14(1) == (1L << 14) && pow43Q14(27) == 81L * (1L << 14))
  }
}
