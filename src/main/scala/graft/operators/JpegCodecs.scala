package graft.operators

import java.nio.charset.StandardCharsets.US_ASCII

/** Baseline-sequential AND progressive JPEG (ITU-T T.81 / JFIF) — a REAL
  * entropy-coded decoder, zero dependencies: marker walk,
  * DQT/DHT/SOF0/SOF2/DRI/SOS parsing, canonical Huffman decode (spec
  * F.2.2.3) with DC prediction and EXTEND, progressive spectral selection
  * + successive approximation (Annex G) accumulated in a shared
  * coefficient store with the IDCT after EOI, byte-stuffing (FF 00) and
  * restart-marker handling, zigzag + dequantize, full 2-D separable IDCT,
  * nearest-neighbor chroma upsampling for any (h,v) sampling factors up
  * to the baseline limit, and the libjpeg-style fixed-point YCbCr->RGB
  * conversion. Closes the codec ladder that PNG opened (reference stores
  * media URIs only — e.g. the dApp metadata in
  * /root/reference/src/utils/subgraph.py fetches opaque blobs; decode
  * semantics come from the public JPEG spec, not the reference).
  *
  * Deliberately fail-loud like [[ImageCodecs]]: arithmetic coding, 12-bit
  * precision, 16-bit DQT entries, malformed progressive parameter sets
  * and truncated streams all throw with the offending marker named. The
  * decoder reads every table from the stream (nothing assumes the Annex K
  * defaults — the fixtures use custom canonical tables precisely so a
  * decoder hardcoding the standard tables diverges).
  *
  * Scale posture: decode is a pure per-row kernel behind mapPartitions —
  * payloads never cross a shuffle; at 100 TB the decode parallelism is the
  * scan parallelism.
  */
object JpegCodecs {

  /** Decoded summary: grid dims, component count, restart bookkeeping and
    * the pixel statistic (sum of R+G+B over the w*h grid for 3-component
    * images after color conversion; sum of gray for 1-component). All
    * integers so the DuckDB oracle replays exactly.
    */
  final case class JpegDecoded(
      width: Int, height: Int, nComponents: Int, restartInterval: Int,
      nRestarts: Int, pxSum: Long)

  /** Zigzag order -> natural (row*8+col) index, ITU-T T.81 Figure 5. */
  val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // C(u)*cos((2x+1)*u*pi/16) — the 1-D IDCT basis, precomputed.
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Canonical Huffman table per T.81 Annex C / F.2.2.3: `bits(l)` counts
    * codes of length l+1, `vals` lists symbols in canonical order.
    */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    require(bits.length == 16, "DHT BITS must have 16 entries")
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
      require(k == vals.length, "DHT value count mismatch")
    }
    def decode(in: BitReader): Int = {
      var code = in.nextBit()
      var l = 1
      // code < minCode(l) is unreachable for any VALID code of this or a
      // greater length (canonical codes only grow past maxCode), but a
      // corrupt stream can produce it — keep reading so it surfaces as the
      // descriptive invalid-code error below, never a negative vals index.
      while (l <= 16 && (maxCode(l) < 0 || code > maxCode(l) || code < minCode(l))) {
        code = (code << 1) | in.nextBit()
        l += 1
      }
      require(l <= 16, "invalid Huffman code (no table entry within 16 bits)")
      vals(valPtr(l) + code - minCode(l))
    }
  }

  /** Entropy-segment bit reader: un-stuffs FF 00, refuses to read past a
    * marker (the scan loop consumes RSTn explicitly via [[expectRestart]]).
    */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var cur = 0
    private var cnt = 0
    def nextBit(): Int = {
      if (cnt == 0) {
        require(pos < data.length, "entropy stream truncated")
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          require(pos < data.length, "entropy stream truncated at FF")
          val m = data(pos) & 0xff
          require(m == 0x00, f"marker FF$m%02X inside entropy data (expected stuffing)")
          pos += 1
        }
        cur = b; cnt = 8
      }
      cnt -= 1
      (cur >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Byte-align and consume the expected RSTm marker. */
    def expectRestart(m: Int): Unit = {
      cnt = 0
      require(pos + 1 < data.length, "stream truncated at restart boundary")
      val a = data(pos) & 0xff; val b = data(pos + 1) & 0xff
      require(a == 0xff && b == 0xd0 + m,
        f"expected RST$m (FFD${m}) at ${pos}, found $a%02X$b%02X")
      pos += 2
    }
  }

  /** EXTEND (T.81 F.2.2.1): map the n-bit magnitude field to its signed
    * coefficient value.
    */
  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  private final case class Component(
      id: Int, h: Int, v: Int, tq: Int, var td: Int = 0, var ta: Int = 0)

  /** Dequantize (natural order) + 2-D separable IDCT + level shift + clamp:
    * returns the 64 pixel samples of one block, row-major.
    */
  private def idctBlock(coef: Array[Int], q: Array[Int]): Array[Int] = {
    val f = new Array[Double](64)
    var k = 0
    while (k < 64) { f(Zigzag(k)) = coef(Zigzag(k)).toDouble * q(k); k += 1 }
    // tmp(u, y) = sum_v CosT(y)(v) * F(v*8+u)
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0; var v = 0
        while (v < 8) { s += CosT(y)(v) * f(v * 8 + u); v += 1 }
        tmp(u * 8 + y) = s
        y += 1
      }
      u += 1
    }
    val out = new Array[Int](64)
    var yy = 0
    while (yy < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var uu = 0
        while (uu < 8) { s += CosT(x)(uu) * tmp(uu * 8 + yy); uu += 1 }
        val px = math.round(0.25 * s).toInt + 128
        out(yy * 8 + x) = math.max(0, math.min(255, px))
        x += 1
      }
      yy += 1
    }
    out
  }

  /** Fixed-point YCbCr -> RGB (the libjpeg integer constants, floor
    * division — the oracle replays floor((k*d + 32768)/65536) exactly).
    */
  def ycbcrToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def fd(n: Long): Int = Math.floorDiv(n + 32768L, 65536L).toInt
    def clamp(v: Int): Int = math.max(0, math.min(255, v))
    (clamp(y + fd(91881L * (cr - 128))),
      clamp(y - fd(22554L * (cb - 128) + 46802L * (cr - 128))),
      clamp(y + fd(116130L * (cb - 128))))
  }

  private def u16(d: Array[Byte], p: Int): Int =
    ((d(p) & 0xff) << 8) | (d(p + 1) & 0xff)

  /** One scan's header: selected component indices with their table ids,
    * spectral band and successive-approximation bits.
    */
  private final case class ScanHeader(
      compIdx: Array[Int], ss: Int, se: Int, ah: Int, al: Int)

  /** Decode a baseline-sequential (SOF0) or progressive (SOF2) Huffman
    * JFIF stream. Both profiles decode through one coefficient store:
    * every scan accumulates into per-component coefficient planes
    * (baseline is the single full-band ss=0..63, ah=al=0 interleaved
    * scan), and the IDCT runs once after EOI — so progressive spectral
    * selection and successive approximation (T.81 Annex G: DC-first /
    * DC-refine / AC-first with EOB runs / AC-refine correction bits)
    * land in exactly the shared pixel path. Fail-loud outside these two
    * profiles (arithmetic coding, 12-bit, hierarchical all throw with
    * the offending marker named).
    */
  def decodeJpeg(bytes: Array[Byte]): JpegDecoded = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "not a JPEG stream (missing SOI)")
    val quant = new Array[Array[Int]](4) // zigzag-order entries, per DQT
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var progressive = false
    var pos = 2
    var sawEoi = false
    var nRestarts = 0
    // Per-component coefficient planes (natural order within each block),
    // allocated at SOF over the padded MCU grid; every scan writes here.
    var coefs: Array[Array[Int]] = null
    var blocksW: Array[Int] = null
    var mcusX = 0; var mcusY = 0
    var hMax = 1; var vMax = 1
    var dcDone: Array[Boolean] = null

    def parseSof(seg: Int, prog: Boolean): Unit = {
      require((bytes(seg) & 0xff) == 8, "only 8-bit precision is supported")
      progressive = prog
      height = u16(bytes, seg + 1)
      width = u16(bytes, seg + 3)
      val nf = bytes(seg + 5) & 0xff
      require(nf == 1 || nf == 3, s"unsupported component count $nf")
      comps = Array.tabulate(nf) { i =>
        val b = seg + 6 + 3 * i
        Component(bytes(b) & 0xff, (bytes(b + 1) & 0xff) >> 4,
          bytes(b + 1) & 0x0f, bytes(b + 2) & 0xff)
      }
      hMax = comps.map(_.h).max
      vMax = comps.map(_.v).max
      mcusX = (width + 8 * hMax - 1) / (8 * hMax)
      mcusY = (height + 8 * vMax - 1) / (8 * vMax)
      blocksW = comps.map(c => mcusX * c.h)
      coefs = comps.map(c => new Array[Int](mcusX * c.h * mcusY * c.v * 64))
      dcDone = new Array[Boolean](nf)
    }

    def decodeScan(header: ScanHeader, start: Int): Int = {
      val ScanHeader(sel, ss, se, ah, al) = header
      val in = new BitReader(bytes, start)
      val dcPred = new Array[Int](comps.length)
      var eobrun = 0
      var rst = 0
      var unitsSinceRestart = 0
      def maybeRestart(): Unit =
        if (restartInterval > 0 && unitsSinceRestart == restartInterval) {
          in.expectRestart(rst % 8)
          rst += 1; nRestarts += 1
          java.util.Arrays.fill(dcPred, 0)
          eobrun = 0
          unitsSinceRestart = 0
        }

      def decodeDcInto(ci: Int, blk: Int): Unit = {
        val c = comps(ci)
        val base = blk * 64
        if (ah == 0) {
          val dcTab = dcTabs(c.td)
          require(dcTab != null, "scan uses undefined DC Huffman table")
          val t = dcTab.decode(in)
          dcPred(ci) += extend(in.receive(t), t)
          coefs(ci)(base) = dcPred(ci) << al
        } else {
          // DC refinement: one raw bit per block, no Huffman table.
          coefs(ci)(base) |= in.nextBit() << al
        }
      }

      def decodeAcFirstInto(ci: Int, blk: Int): Unit = {
        val acTab = acTabs(comps(ci).ta)
        require(acTab != null, "scan uses undefined AC Huffman table")
        val base = blk * 64
        if (eobrun > 0) { eobrun -= 1; return }
        var k = ss
        while (k <= se) {
          val rs = acTab.decode(in)
          val r = rs >> 4; val s = rs & 0x0f
          if (s == 0) {
            if (r == 15) {
              k += 16 // ZRL inside the band
              require(k <= se + 1, "AC ZRL run past end of band")
            } else {
              // EOBn: 2^r + receive(r) blocks end-of-band, this one included
              eobrun = (1 << r) - 1 + (if (r > 0) in.receive(r) else 0)
              k = se + 1
            }
          } else {
            k += r
            require(k <= se, "AC run past end of band")
            coefs(ci)(base + Zigzag(k)) = extend(in.receive(s), s) << al
            k += 1
          }
        }
      }

      /** AC successive-approximation refinement (T.81 G.1.2.3): a
        * correction bit per already-significant band coefficient, (run, 1)
        * symbols for newly-significant ones, EOB runs carrying the
        * trailing correction bits.
        */
      def decodeAcRefineInto(ci: Int, blk: Int): Unit = {
        val acTab = acTabs(comps(ci).ta)
        require(acTab != null, "scan uses undefined AC Huffman table")
        val base = blk * 64
        val p1 = 1 << al; val m1 = -1 << al
        def correct(idx: Int): Unit =
          if (in.nextBit() == 1 && (coefs(ci)(base + idx) & p1) == 0)
            coefs(ci)(base + idx) += (if (coefs(ci)(base + idx) >= 0) p1 else m1)
        var k = ss
        if (eobrun == 0) {
          var brk = false
          while (k <= se && !brk) {
            val rs = acTab.decode(in)
            var r = rs >> 4; val s = rs & 0x0f
            var newVal = 0
            if (s != 0) {
              require(s == 1, s"AC refinement magnitude category $s (must be 1)")
              newVal = if (in.nextBit() == 1) p1 else m1
            } else if (r != 15) {
              // EOBn in refinement: the CURRENT block's remaining band is
              // corrected by the EOB walk below, THEN the run decrements —
              // so no -1 here (unlike the first-scan convention, where the
              // break itself finishes the current block).
              eobrun = (1 << r) + (if (r > 0) in.receive(r) else 0)
              brk = true
            } // r == 15, s == 0: ZRL — skip 16 zero-HISTORY positions
            if (!brk) {
              var placed = false
              while (!placed && k <= se) {
                val idx = Zigzag(k)
                if (coefs(ci)(base + idx) != 0) correct(idx)
                else if (r == 0) {
                  if (newVal != 0) coefs(ci)(base + idx) = newVal
                  placed = true
                } else r -= 1
                k += 1
              }
              require(placed || newVal == 0,
                "newly-significant AC coefficient placed past end of band")
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) {
            val idx = Zigzag(k)
            if (coefs(ci)(base + idx) != 0) correct(idx)
            k += 1
          }
          eobrun -= 1
        }
      }

      if (sel.length > 1 || (!progressive && sel.length == comps.length)) {
        // MCU-interleaved traversal (baseline always; progressive DC scans
        // with ns > 1).
        require(ss == 0, "interleaved scans carry the DC band")
        var mcu = 0
        val nMcus = mcusX * mcusY
        while (mcu < nMcus) {
          maybeRestart()
          val mx = mcu % mcusX; val my = mcu / mcusX
          var si = 0
          while (si < sel.length) {
            val ci = sel(si); val c = comps(ci)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                val blk = (my * c.v + by) * blocksW(ci) + (mx * c.h + bx)
                decodeDcInto(ci, blk)
                if (se > 0) { // baseline: the full band rides the block
                  val acTab = acTabs(c.ta)
                  require(acTab != null, "scan uses undefined AC Huffman table")
                  val base = blk * 64
                  var k = 1
                  while (k < 64) {
                    val rs = acTab.decode(in)
                    val r = rs >> 4; val s = rs & 0x0f
                    if (s == 0) {
                      if (r == 15) { // ZRL: 16 zero coefficients
                        k += 16
                        require(k <= 64, "AC ZRL run past end of block")
                      } else {
                        // (run, 0) with 0 < run < 15 is undefined in
                        // baseline — reject, never treat as EOB.
                        require(r == 0, f"undefined AC symbol (run=$r, size=0)")
                        k = 64 // EOB
                      }
                    } else {
                      k += r
                      require(k < 64, "AC run past end of block")
                      coefs(ci)(base + Zigzag(k)) = extend(in.receive(s), s)
                      k += 1
                    }
                  }
                }
                bx += 1
              }
              by += 1
            }
            si += 1
          }
          unitsSinceRestart += 1
          mcu += 1
        }
      } else {
        // Non-interleaved: one component, raster over ITS OWN block grid
        // (ceil(comp-size / 8) per T.81 A.2.2 — smaller than the padded
        // MCU grid for partial-MCU images).
        val ci = sel(0); val c = comps(ci)
        val bw = (width * c.h + 8 * hMax - 1) / (8 * hMax)
        val bh = (height * c.v + 8 * vMax - 1) / (8 * vMax)
        var by = 0
        while (by < bh) {
          var bx = 0
          while (bx < bw) {
            maybeRestart()
            val blk = by * blocksW(ci) + bx
            if (ss == 0) decodeDcInto(ci, blk)
            else if (ah == 0) decodeAcFirstInto(ci, blk)
            else decodeAcRefineInto(ci, blk)
            unitsSinceRestart += 1
            bx += 1
          }
          by += 1
        }
      }
      require(eobrun == 0, "EOB run spills past the end of the scan")
      // Byte-align: the writer 1-pads the final partial byte.
      in.pos
    }

    while (!sawEoi) {
      require(pos + 2 <= bytes.length, "stream truncated before EOI")
      require((bytes(pos) & 0xff) == 0xff, f"expected marker at $pos")
      val marker = bytes(pos + 1) & 0xff
      if (marker == 0xd9) { sawEoi = true }
      else {
        require(pos + 4 <= bytes.length, "stream truncated inside marker segment")
        val len = u16(bytes, pos + 2)
        val seg = pos + 4
        var nextPos = pos + 2 + len
        marker match {
          case 0xdb => // DQT — one or more tables per segment
            var p = seg
            while (p < pos + 2 + len) {
              val pq = (bytes(p) & 0xff) >> 4
              val tq = bytes(p) & 0x0f
              require(pq == 0, "16-bit DQT precision is not supported")
              quant(tq) = Array.tabulate(64)(i => bytes(p + 1 + i) & 0xff)
              p += 65
            }
          case 0xc4 => // DHT — one or more tables per segment
            var p = seg
            while (p < pos + 2 + len) {
              val tc = (bytes(p) & 0xff) >> 4
              val th = bytes(p) & 0x0f
              val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
              val n = bits.sum
              val vals = Array.tabulate(n)(i => bytes(p + 17 + i) & 0xff)
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              p += 17 + n
            }
          case 0xc0 => parseSof(seg, prog = false) // SOF0 baseline
          case 0xc2 => parseSof(seg, prog = true) // SOF2 progressive
          case m if m == 0xc1 || m == 0xc3 || (m >= 0xc5 && m <= 0xc7) ||
            (m >= 0xc9 && m <= 0xcb) || (m >= 0xcd && m <= 0xcf) =>
            throw new IllegalArgumentException(
              f"SOF marker FF$m%02X is not baseline or progressive Huffman")
          case 0xdd => restartInterval = u16(bytes, seg)
          case 0xda => // SOS — parse the scan header, decode its segment
            require(comps != null, "SOS before SOF")
            val ns = bytes(seg) & 0xff
            val sel = new Array[Int](ns)
            var i = 0
            while (i < ns) {
              val cs = bytes(seg + 1 + 2 * i) & 0xff
              val ci = comps.indexWhere(_.id == cs)
              require(ci >= 0, s"SOS names unknown component $cs")
              comps(ci).td = (bytes(seg + 2 + 2 * i) & 0xff) >> 4
              comps(ci).ta = bytes(seg + 2 + 2 * i) & 0x0f
              sel(i) = ci
              i += 1
            }
            val ss = bytes(seg + 1 + 2 * ns) & 0xff
            val se = bytes(seg + 2 + 2 * ns) & 0xff
            val ahal = bytes(seg + 3 + 2 * ns) & 0xff
            val ah = ahal >> 4; val al = ahal & 0x0f
            if (!progressive) {
              require(ns == comps.length, "partial scans are not baseline-interleaved")
              require(ss == 0 && se == 63 && ah == 0 && al == 0,
                "baseline scan must cover the full band at full precision")
            } else {
              require(se >= ss && se <= 63, s"bad spectral band $ss..$se")
              if (ss == 0) require(se == 0,
                "progressive DC scan must not carry AC (Ss=0 requires Se=0)")
              else {
                require(ns == 1, "progressive AC scans are single-component")
                require(dcDone(sel(0)),
                  "AC scan before the component's first DC scan")
              }
              if (ah != 0) require(ah == al + 1,
                s"successive approximation must step one bit (Ah=$ah, Al=$al)")
            }
            sel.foreach { ci =>
              require(quant(comps(ci).tq) != null,
                s"component ${comps(ci).id} uses undefined quant table ${comps(ci).tq}")
            }
            nextPos = decodeScan(ScanHeader(sel, ss, se, ah, al), pos + 2 + len)
            if (ss == 0) sel.foreach(ci => dcDone(ci) = true)
          case m if (m >= 0xe0 && m <= 0xef) || m == 0xfe => () // APPn / COM: skip
          case m =>
            throw new IllegalArgumentException(f"unexpected marker FF$m%02X")
        }
        pos = nextPos
      }
    }
    require(comps != null, "EOI before any SOF/SOS")
    require(dcDone.forall(identity), "EOI before every component's DC scan")

    // IDCT once over the accumulated coefficients (baseline and
    // progressive converge here).
    val planes = comps.map(c => new Array[Int](mcusX * c.h * 8 * mcusY * c.v * 8))
    val planeW = comps.map(c => mcusX * c.h * 8)
    val coef = new Array[Int](64)
    var ci = 0
    while (ci < comps.length) {
      val c = comps(ci)
      val q = quant(c.tq)
      val bw = blocksW(ci)
      val nBlocks = bw * mcusY * c.v
      var blk = 0
      while (blk < nBlocks) {
        System.arraycopy(coefs(ci), blk * 64, coef, 0, 64)
        val px = idctBlock(coef, q)
        val px0 = (blk % bw) * 8; val py0 = (blk / bw) * 8
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            planes(ci)((py0 + yy) * planeW(ci) + px0 + xx) = px(yy * 8 + xx)
            xx += 1
          }
          yy += 1
        }
        blk += 1
      }
      ci += 1
    }

    // Crop to the declared grid, upsample chroma by sample replication
    // (x*h/hMax — nearest neighbor), convert, sum.
    var pxSum = 0L
    if (comps.length == 1) {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { pxSum += planes(0)(y * planeW(0) + x); x += 1 }
        y += 1
      }
    } else {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          def samp(ci: Int): Int = {
            val c = comps(ci)
            planes(ci)((y * c.v / vMax) * planeW(ci) + (x * c.h / hMax))
          }
          val (r, g, b) = ycbcrToRgb(samp(0), samp(1), samp(2))
          pxSum += r + g + b
          x += 1
        }
        y += 1
      }
    }
    JpegDecoded(width, height, comps.length, restartInterval, nRestarts, pxSum)
  }
}

/** Deterministic baseline-JPEG GENERATOR — fixture machinery in the
  * [[ImageFixtures]] mold: the encoder authors QUANTIZED COEFFICIENTS
  * directly (never pixels through an FDCT), restricted to the four DCT
  * frequencies (0,0), (4,0), (0,4), (4,4) whose 8x8 basis values are
  * exactly +-1/8 — so the decoded pixels are exact integer formulas of
  * (doc_id, block index) that the DuckDB oracle replays symbolically,
  * while the BYTE STREAM is a full-fidelity baseline JPEG: canonical
  * Huffman DC-difference and AC run-length coding, byte stuffing,
  * restart markers with predictor reset, 4:2:0 subsampling with
  * partial-MCU edge padding, and CUSTOM (non-Annex-K) Huffman tables so
  * a decoder that hardcodes the standard tables diverges.
  */
object JpegFixtures {
  val JpegMime = "image/jpeg"

  import JpegCodecs.Zigzag

  /** Grayscale (single-component) fixture when doc_id % 4 == 1; color
    * 4:2:0 otherwise (the query keys on doc_id % 6 == 5, all odd, so the
    * mod-4 residues alternate 1/3).
    */
  def isGray(id: Long): Boolean = id % 4 == 1
  def jpegWidth(id: Long): Int = (id % 23 + 9).toInt
  def jpegHeight(id: Long): Int = (id % 19 + 9).toInt
  /** Restart interval in MCUs (1..3; id/6 varies where id % 6 is fixed). */
  def restartInterval(id: Long): Int = ((id / 6) % 3 + 1).toInt

  // Quantized-coefficient formulas. Luma dequant: DC 16, AC 8 — pixel =
  // 128 + 2*F00 + sx*F40 + sy*F04 + sx*sy*F44 (range [73,183], no clamp).
  def lumaDc(id: Long, b: Long): Int = ((id * 7 + b * 5) % 41).toInt - 20
  def lumaAc40(id: Long, b: Long): Int = ((id * 11 + b * 3) % 11).toInt - 5
  def lumaAc04(id: Long, b: Long): Int = ((id * 5 + b * 7) % 11).toInt - 5
  def lumaAc44(id: Long, b: Long): Int = ((id * 3 + b * 11) % 11).toInt - 5
  // Chroma dequant: DC 24, AC 16 — sample = 128 + 3*G00 + 2*(signed ACs);
  // comp c (1=Cb, 2=Cr) offsets the formulas by 17*c.
  def chromaDc(id: Long, b: Long, c: Int): Int =
    ((id * 7 + b * 5 + 17L * c) % 21).toInt - 10
  def chromaAc40(id: Long, b: Long, c: Int): Int =
    ((id * 11 + b * 3 + 17L * c) % 7).toInt - 3
  def chromaAc04(id: Long, b: Long, c: Int): Int =
    ((id * 5 + b * 7 + 17L * c) % 7).toInt - 3
  def chromaAc44(id: Long, b: Long, c: Int): Int =
    ((id * 3 + b * 11 + 17L * c) % 7).toInt - 3

  // DQT entries in zigzag order: position 0 is DC.
  private val lumaQ: Array[Int] = Array.tabulate(64)(k => if (k == 0) 16 else 8)
  private val chromaQ: Array[Int] = Array.tabulate(64)(k => if (k == 0) 24 else 16)

  /** Custom canonical Huffman tables (deliberately NOT Annex K). DC: size
    * categories 0..7, all length 4. AC: every (run, size) for size 1..4
    * plus EOB and ZRL, all length 7 (66 codes < 128; the all-ones code is
    * never assigned, so 1-padding can never decode). The chroma tables
    * list the same symbols in REVERSED canonical order — different codes,
    * so conflating table ids diverges.
    */
  private final class FixtureHuff(symbols: Array[Int], codeLen: Int) {
    val bits: Array[Int] = Array.tabulate(16)(l => if (l + 1 == codeLen) symbols.length else 0)
    val vals: Array[Int] = symbols
    private val codeOf: Map[Int, Int] = symbols.zipWithIndex.toMap
    def code(sym: Int): (Int, Int) = codeOf.get(sym) match {
      case Some(i) => (i, codeLen)
      case None => throw new IllegalStateException(f"fixture emits untabled symbol $sym%02X")
    }
  }
  private val dcSyms = Array.tabulate(8)(identity)
  // (run, size) for size 1..4 plus EOB0/ZRL plus the progressive EOBn
  // symbols (r<<4, r=1..7 — EOB runs up to 255 blocks, far beyond any
  // fixture scan). 73 codes of length 7 < 127; the all-ones code stays
  // unassigned so 1-padding can never decode.
  private val acSyms: Array[Int] =
    (0x00 +: 0xf0 +: ((1 to 7).map(_ << 4) ++
      (for (r <- 0 to 15; s <- 1 to 4) yield (r << 4) | s))).toArray
  private val lumaDcT = new FixtureHuff(dcSyms, 4)
  private val lumaAcT = new FixtureHuff(acSyms, 7)
  private val chromaDcT = new FixtureHuff(dcSyms.reverse, 4)
  private val chromaAcT = new FixtureHuff(acSyms.reverse, 7)

  private final class BitWriter {
    private val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) { emit(); }
        i -= 1
      }
    }
    private def emit(): Unit = {
      out += acc.toByte
      if (acc == 0xff) out += 0x00.toByte // byte stuffing
      acc = 0; n = 0
    }
    /** Pad the current byte with 1-bits (T.81 B.1.1.5) — used before
      * restart markers and at end of scan.
      */
    def align(): Unit = if (n > 0) { acc = (acc << (8 - n)) | ((1 << (8 - n)) - 1); n = 8; emit(); n = 0 }
    def raw(b: Int): Unit = { require(n == 0); out += b.toByte }
    def bytes: Array[Byte] = out.toArray
  }

  private def sizeOf(v: Int): Int = {
    var s = 0; var a = math.abs(v)
    while (a > 0) { s += 1; a >>= 1 }
    s
  }

  private def encodeBlock(coefNat: Array[Int], pred: Int,
      dcT: FixtureHuff, acT: FixtureHuff, bw: BitWriter): Int = {
    val diff = coefNat(0) - pred
    val s = sizeOf(diff)
    val (dc, dl) = dcT.code(s)
    bw.put(dc, dl)
    if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    var run = 0
    var k = 1
    while (k < 64) {
      val c = coefNat(Zigzag(k))
      if (c == 0) run += 1
      else {
        while (run > 15) { val (z, zl) = acT.code(0xf0); bw.put(z, zl); run -= 16 }
        val cs = sizeOf(c)
        val (a, al) = acT.code((run << 4) | cs)
        bw.put(a, al)
        bw.put(if (c < 0) c + (1 << cs) - 1 else c, cs)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (e, el) = acT.code(0x00); bw.put(e, el) }
    coefNat(0)
  }

  private def segment(marker: Int, payload: Array[Byte]): Array[Byte] =
    Array(0xff.toByte, marker.toByte,
      ((payload.length + 2) >> 8).toByte, ((payload.length + 2) & 0xff).toByte) ++ payload

  private def dhtPayload(tc: Int, th: Int, t: FixtureHuff): Array[Byte] =
    Array(((tc << 4) | th).toByte) ++ t.bits.map(_.toByte) ++ t.vals.map(_.toByte)

  /** Roughly every other JPEG document is PROGRESSIVE (SOF2) — same
    * authored coefficients, so the decoded pixels (and the oracle's
    * pixel formulas) are identical to the baseline encoding of the same
    * id; only the scan script differs. Keyed on id % 8 so the
    * progressive slice spans BOTH grayscale and 4:2:0 color ids (an
    * (id/6)-keyed split would leave every progressive id ≡ 3 mod 4 —
    * color only).
    */
  def isProgressive(id: Long): Boolean = id % 8 >= 4

  /** A real JFIF stream for document `id`: baseline sequential or (every
    * other id) progressive. Grayscale 1x1 or color 4:2:0, custom DQT/DHT,
    * COM segment (decoders must skip), partial edge MCUs; the baseline
    * stream additionally carries DRI with live restart markers.
    */
  def jpeg(id: Long): Array[Byte] =
    if (isProgressive(id)) jpegProgressive(id) else jpegBaseline(id)

  private[operators] def jpegBaseline(id: Long): Array[Byte] = {
    val w = jpegWidth(id); val h = jpegHeight(id)
    val gray = isGray(id)
    val dri = restartInterval(id)
    val hMax = if (gray) 1 else 2
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * hMax - 1) / (8 * hMax)
    val nMcus = mcusX * mcusY

    val bw = new BitWriter
    var predY = 0; var predCb = 0; var predCr = 0
    var rst = 0
    val coef = new Array[Int](64)
    def fill(dc: Int, a40: Int, a04: Int, a44: Int): Unit = {
      java.util.Arrays.fill(coef, 0)
      coef(0) = dc; coef(4) = a40; coef(32) = a04; coef(36) = a44
    }
    var mcu = 0
    while (mcu < nMcus) {
      if (dri > 0 && mcu > 0 && mcu % dri == 0) {
        bw.align()
        bw.raw(0xff); bw.raw(0xd0 + (rst % 8))
        rst += 1
        predY = 0; predCb = 0; predCr = 0
      }
      if (gray) {
        val b = mcu.toLong
        fill(lumaDc(id, b), lumaAc40(id, b), lumaAc04(id, b), lumaAc44(id, b))
        predY = encodeBlock(coef, predY, lumaDcT, lumaAcT, bw)
      } else {
        var by = 0
        while (by < 2) {
          var bx = 0
          while (bx < 2) {
            val b = mcu.toLong * 4 + by * 2 + bx
            fill(lumaDc(id, b), lumaAc40(id, b), lumaAc04(id, b), lumaAc44(id, b))
            predY = encodeBlock(coef, predY, lumaDcT, lumaAcT, bw)
            bx += 1
          }
          by += 1
        }
        val bc = mcu.toLong
        fill(chromaDc(id, bc, 1), chromaAc40(id, bc, 1), chromaAc04(id, bc, 1), chromaAc44(id, bc, 1))
        predCb = encodeBlock(coef, predCb, chromaDcT, chromaAcT, bw)
        fill(chromaDc(id, bc, 2), chromaAc40(id, bc, 2), chromaAc04(id, bc, 2), chromaAc44(id, bc, 2))
        predCr = encodeBlock(coef, predCr, chromaDcT, chromaAcT, bw)
      }
      mcu += 1
    }
    bw.align()

    val app0 = segment(0xe0, "JFIF".getBytes(US_ASCII) ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    val com = segment(0xfe, s"graft fixture $id".getBytes(US_ASCII))
    val dqt = segment(0xdb,
      (Array(0x00.toByte) ++ lumaQ.map(_.toByte)) ++
        (Array(0x01.toByte) ++ chromaQ.map(_.toByte)))
    val sofComps: Array[Byte] =
      if (gray) Array(1, 0x11, 0)
      else Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    val sof = segment(0xc0, Array[Byte](8,
      (h >> 8).toByte, (h & 0xff).toByte, (w >> 8).toByte, (w & 0xff).toByte,
      (if (gray) 1 else 3).toByte) ++ sofComps)
    val dht = segment(0xc4,
      dhtPayload(0, 0, lumaDcT) ++ dhtPayload(1, 0, lumaAcT) ++
        dhtPayload(0, 1, chromaDcT) ++ dhtPayload(1, 1, chromaAcT))
    val driSeg = segment(0xdd, Array(((dri >> 8) & 0xff).toByte, (dri & 0xff).toByte))
    val sosComps: Array[Byte] =
      if (gray) Array(1, 0x00) else Array[Byte](1, 0x00, 2, 0x11, 3, 0x11)
    val sos = segment(0xda, Array((if (gray) 1 else 3).toByte) ++ sosComps ++
      Array[Byte](0, 63, 0))

    Array(0xff.toByte, 0xd8.toByte) ++ app0 ++ com ++ dqt ++ sof ++ dht ++
      driSeg ++ sos ++ bw.bytes ++ Array(0xff.toByte, 0xd9.toByte)
  }

  // ---- progressive (SOF2) encoding ----------------------------------------

  /** Natural-order coefficient block for component `ci` (0=Y, 1=Cb, 2=Cr)
    * at formula index `b` — the SAME values the baseline encoder authors,
    * so both encodings decode to identical pixels.
    */
  private def blockCoefs(id: Long, ci: Int, b: Long): Array[Int] = {
    val c = new Array[Int](64)
    if (ci == 0) {
      c(0) = lumaDc(id, b); c(4) = lumaAc40(id, b)
      c(32) = lumaAc04(id, b); c(36) = lumaAc44(id, b)
    } else {
      c(0) = chromaDc(id, b, ci); c(4) = chromaAc40(id, b, ci)
      c(32) = chromaAc04(id, b, ci); c(36) = chromaAc44(id, b, ci)
    }
    c
  }

  /** AC point transform: divide by 2^al truncating toward ZERO (T.81
    * G.1.2.2 — plain arithmetic shift would round negatives down and
    * break the refinement's sign algebra).
    */
  private def pt(v: Int, al: Int): Int =
    if (v >= 0) v >> al else -((-v) >> al)

  /** AC-FIRST scan (Ah=0) for one block band: run-length over the
    * point-transformed coefficients with cross-block EOB-run
    * accumulation. Returns the updated eobrun (caller flushes at scan
    * end).
    */
  private def encodeAcFirst(coefNat: Array[Int], ss: Int, se: Int, al: Int,
      acT: FixtureHuff, bw: BitWriter, eobrun0: Int): Int = {
    def flushEob(n: Int): Unit = if (n > 0) {
      var r = 0
      while ((2 << r) <= n) r += 1 // r = floor(log2(n))
      val (c, l) = acT.code(r << 4)
      bw.put(c, l)
      if (r > 0) bw.put(n - (1 << r), r)
    }
    var eobrun = eobrun0
    val vals = (ss to se).map(k => pt(coefNat(Zigzag(k)), al))
    if (vals.forall(_ == 0)) {
      eobrun += 1
      // EOBn codes at most 2^7+ runs under the fixture table; flush early
      // far below that bound.
      if (eobrun == 255) { flushEob(eobrun); eobrun = 0 }
      eobrun
    } else {
      flushEob(eobrun)
      var run = 0
      var lastNz = -1
      for (i <- vals.indices.reverse if lastNz < 0 && vals(i) != 0) lastNz = i
      var i = 0
      while (i <= lastNz) {
        val t = vals(i)
        if (t == 0) run += 1
        else {
          while (run > 15) { val (z, zl) = acT.code(0xf0); bw.put(z, zl); run -= 16 }
          val s = sizeOf(t)
          val (c, l) = acT.code((run << 4) | s)
          bw.put(c, l)
          bw.put(if (t < 0) t + (1 << s) - 1 else t, s)
          run = 0
        }
        i += 1
      }
      if (lastNz < vals.length - 1) 1 else 0 // trailing zeros = this block EOBs
    }
  }

  /** AC-REFINEMENT scan (Ah=Al+1) for one block band — the T.81 G.1.2.3
    * encoder: correction bits for already-significant coefficients ride a
    * pending buffer and flush after the next symbol; newly-significant
    * (+/-1 << Al) coefficients code as (run, 1) + sign; trailing
    * correction bits attach to the EOB run. Returns (eobrun, pending
    * correction bits) for the caller to thread through the scan.
    */
  private def encodeAcRefine(coefNat: Array[Int], ss: Int, se: Int, al: Int,
      acT: FixtureHuff, bw: BitWriter,
      eobrun0: Int, pending0: Vector[Int]): (Int, Vector[Int]) = {
    def flushEob(n: Int, bits: Vector[Int]): Unit = {
      if (n > 0) {
        var r = 0
        while ((2 << r) <= n) r += 1
        val (c, l) = acT.code(r << 4)
        bw.put(c, l)
        if (r > 0) bw.put(n - (1 << r), r)
      }
      bits.foreach(bw.put(_, 1))
    }
    var eobrun = eobrun0
    var pending = pending0
    val abs = (ss to se).map(k => math.abs(pt(coefNat(Zigzag(k)), al)))
    // last position holding a NEWLY-significant coefficient (abs == 1):
    // everything after it rides the EOB run's correction bits
    var eobPos = -1
    for (i <- abs.indices if abs(i) == 1) eobPos = i
    if (eobPos < 0) {
      // no new significance in this block: correction bits join the run
      eobrun += 1
      for (i <- abs.indices if abs(i) > 1) pending = pending :+ (abs(i) & 1)
      if (eobrun == 255) { flushEob(eobrun, pending); eobrun = 0; pending = Vector() }
      (eobrun, pending)
    } else {
      flushEob(eobrun, pending)
      eobrun = 0; pending = Vector()
      var run = 0
      var corr = Vector.empty[Int] // correction bits since the last symbol
      var i = 0
      while (i <= eobPos) {
        val a = abs(i)
        if (a == 0) run += 1
        else if (a > 1) corr = corr :+ (a & 1) // history coef: ride along
        else {
          // ZRL in refinement spans exactly 16 ZERO-history positions;
          // correction bits interleaved INSIDE a spanned window would have
          // to split across the ZRL emissions. The fixture coefficient
          // layout never produces that shape (runs > 15 only occur in the
          // 21..63 band, whose single frequency leaves no history coefs to
          // interleave) — refuse loudly rather than emit a stream the
          // decoder would misalign on.
          require(run <= 15 || corr.isEmpty,
            "refinement ZRL with interleaved correction bits is not supported by the fixture encoder")
          while (run > 15) {
            val (z, zl) = acT.code(0xf0); bw.put(z, zl)
            run -= 16
          }
          val (c, l) = acT.code((run << 4) | 1)
          bw.put(c, l)
          val sign = if (pt(coefNat(Zigzag(ss + i)), al) >= 0) 1 else 0
          bw.put(sign, 1)
          corr.foreach(bw.put(_, 1)); corr = Vector()
          run = 0
        }
        i += 1
      }
      // the band's tail: history corrections after the last new coef join
      // the next EOB run
      var tailPending = Vector.empty[Int]
      var anyTail = false
      while (i < abs.length) {
        if (abs(i) > 1) tailPending = tailPending :+ (abs(i) & 1)
        anyTail = true
        i += 1
      }
      // leftover mid-block corrections (none possible: corr flushes with
      // the symbol that follows, and the loop above ends ON a symbol)
      require(corr.isEmpty, "refinement corrections stranded mid-block")
      if (anyTail || abs.length > eobPos + 1) (1, tailPending)
      else (0, Vector())
    }
  }

  /** A real PROGRESSIVE JFIF stream for document `id`: SOF2, then the
    * canonical scan script — interleaved DC first (Al=1) and DC
    * refinement, per-component AC first scans over two spectral bands
    * (1..20 covering the (4,0)/(0,4) frequencies, 21..63 covering (4,4))
    * at Al=1, then the matching AC refinement scans. Same coefficient
    * formulas (and custom Huffman tables) as the baseline stream, so
    * decoded pixels are identical; no DRI (restart coverage lives in the
    * baseline fixtures).
    */
  def jpegProgressive(id: Long): Array[Byte] = {
    val w = jpegWidth(id); val h = jpegHeight(id)
    val gray = isGray(id)
    val hMax = if (gray) 1 else 2
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * hMax - 1) / (8 * hMax)
    val nComps = if (gray) 1 else 3

    // Per-component non-interleaved block grids (T.81 A.2.2) and the
    // formula index of each block position.
    def grid(ci: Int): (Int, Int) =
      if (gray) ((w + 7) / 8, (h + 7) / 8)
      else if (ci == 0) ((w + 7) / 8, (h + 7) / 8)
      else ((w / 2 + w % 2 + 7) / 8, (h / 2 + h % 2 + 7) / 8)
    def formulaIndex(ci: Int, bx: Int, by: Int): Long =
      if (gray) (by * mcusX + bx).toLong
      else if (ci == 0)
        ((by / 2) * mcusX + bx / 2).toLong * 4 + (by % 2) * 2 + (bx % 2)
      else (by * mcusX + bx).toLong

    def dcT(ci: Int) = if (ci == 0) lumaDcT else chromaDcT
    def acT(ci: Int) = if (ci == 0) lumaAcT else chromaAcT

    // --- scan payloads ---
    def sosHeader(selIds: Seq[Int], tds: Seq[Int], tas: Seq[Int],
        ss: Int, se: Int, ah: Int, al: Int): Array[Byte] =
      segment(0xda, Array(selIds.length.toByte) ++
        selIds.indices.flatMap(i =>
          Seq(selIds(i).toByte, ((tds(i) << 4) | tas(i)).toByte)) ++
        Array(ss.toByte, se.toByte, ((ah << 4) | al).toByte))

    // DC first (interleaved, Al=1): diffs over the point-transformed DCs.
    val dcFirst = {
      val bw = new BitWriter
      val pred = new Array[Int](nComps)
      var mcu = 0
      while (mcu < mcusX * mcusY) {
        val mx = mcu % mcusX; val my = mcu / mcusX
        var ci = 0
        while (ci < nComps) {
          val (ch, cv) = if (gray || ci > 0) (1, 1) else (2, 2)
          var by = 0
          while (by < cv) {
            var bx = 0
            while (bx < ch) {
              val b =
                if (gray) mcu.toLong
                else if (ci == 0) mcu.toLong * 4 + by * 2 + bx
                else mcu.toLong
              val dc = blockCoefs(id, ci, b)(0) >> 1 // DC point transform: shift
              val diff = dc - pred(ci)
              pred(ci) = dc
              val s = sizeOf(diff)
              val (c, l) = dcT(ci).code(s)
              bw.put(c, l)
              if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
      }
      bw.align()
      bw.bytes
    }

    // DC refinement (interleaved, Ah=1, Al=0): one raw bit per block.
    val dcRefine = {
      val bw = new BitWriter
      var mcu = 0
      while (mcu < mcusX * mcusY) {
        var ci = 0
        while (ci < nComps) {
          val (ch, cv) = if (gray || ci > 0) (1, 1) else (2, 2)
          var by = 0
          while (by < cv) {
            var bx = 0
            while (bx < ch) {
              val b =
                if (gray) mcu.toLong
                else if (ci == 0) mcu.toLong * 4 + by * 2 + bx
                else mcu.toLong
              bw.put(blockCoefs(id, ci, b)(0) & 1, 1)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
      }
      bw.align()
      bw.bytes
    }

    def acFirstScan(ci: Int, ss: Int, se: Int, al: Int): Array[Byte] = {
      val bw = new BitWriter
      val (gw, gh) = grid(ci)
      var eobrun = 0
      var by = 0
      while (by < gh) {
        var bx = 0
        while (bx < gw) {
          eobrun = encodeAcFirst(
            blockCoefs(id, ci, formulaIndex(ci, bx, by)), ss, se, al,
            acT(ci), bw, eobrun)
          bx += 1
        }
        by += 1
      }
      if (eobrun > 0) {
        var r = 0
        while ((2 << r) <= eobrun) r += 1
        val (c, l) = acT(ci).code(r << 4)
        bw.put(c, l)
        if (r > 0) bw.put(eobrun - (1 << r), r)
      }
      bw.align()
      bw.bytes
    }

    def acRefineScan(ci: Int, ss: Int, se: Int, al: Int): Array[Byte] = {
      val bw = new BitWriter
      val (gw, gh) = grid(ci)
      var eobrun = 0
      var pending = Vector.empty[Int]
      var by = 0
      while (by < gh) {
        var bx = 0
        while (bx < gw) {
          val (e, p) = encodeAcRefine(
            blockCoefs(id, ci, formulaIndex(ci, bx, by)), ss, se, al,
            acT(ci), bw, eobrun, pending)
          eobrun = e; pending = p
          bx += 1
        }
        by += 1
      }
      if (eobrun > 0 || pending.nonEmpty) {
        if (eobrun > 0) {
          var r = 0
          while ((2 << r) <= eobrun) r += 1
          val (c, l) = acT(ci).code(r << 4)
          bw.put(c, l)
          if (r > 0) bw.put(eobrun - (1 << r), r)
        }
        pending.foreach(bw.put(_, 1))
      }
      bw.align()
      bw.bytes
    }

    val app0 = segment(0xe0, "JFIF".getBytes(US_ASCII) ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    val com = segment(0xfe, s"graft fixture $id (progressive)".getBytes(US_ASCII))
    val dqt = segment(0xdb,
      (Array(0x00.toByte) ++ lumaQ.map(_.toByte)) ++
        (Array(0x01.toByte) ++ chromaQ.map(_.toByte)))
    val sofComps: Array[Byte] =
      if (gray) Array(1, 0x11, 0)
      else Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    val sof2 = segment(0xc2, Array[Byte](8,
      (h >> 8).toByte, (h & 0xff).toByte, (w >> 8).toByte, (w & 0xff).toByte,
      nComps.toByte) ++ sofComps)
    val dht = segment(0xc4,
      dhtPayload(0, 0, lumaDcT) ++ dhtPayload(1, 0, lumaAcT) ++
        dhtPayload(0, 1, chromaDcT) ++ dhtPayload(1, 1, chromaAcT))

    val compIds = (1 to nComps)
    val dcTds = compIds.map(i => if (i == 1) 0 else 1)
    val scans = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    scans += sosHeader(compIds, dcTds, compIds.map(_ => 0), 0, 0, 0, 1) ++ dcFirst
    scans += sosHeader(compIds, compIds.map(_ => 0), compIds.map(_ => 0), 0, 0, 1, 0) ++ dcRefine
    for (ci <- 0 until nComps; (ss, se) <- Seq((1, 20), (21, 63)))
      scans += sosHeader(Seq(ci + 1), Seq(0), Seq(if (ci == 0) 0 else 1),
        ss, se, 0, 1) ++ acFirstScan(ci, ss, se, 1)
    for (ci <- 0 until nComps; (ss, se) <- Seq((1, 20), (21, 63)))
      scans += sosHeader(Seq(ci + 1), Seq(0), Seq(if (ci == 0) 0 else 1),
        ss, se, 1, 0) ++ acRefineScan(ci, ss, se, 0)

    Array(0xff.toByte, 0xd8.toByte) ++ app0 ++ com ++ dqt ++ sof2 ++ dht ++
      scans.flatten.toArray ++ Array(0xff.toByte, 0xd9.toByte)
  }
}
