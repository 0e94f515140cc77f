package graft.operators

import scala.collection.mutable.ArrayBuffer

/** MPEG-1 Audio Layer III (ISO/IEC 11172-3 §2.4.1.7 / §2.4.2.7 / §2.4.3.4)
  * — the prize rung of the audio-codec ladder after PCM WAV, IMA ADPCM and
  * Layer II: samples only exist through the full Layer III machinery —
  * 17-byte side info, the BIT RESERVOIR (`main_data_begin` pointing back
  * into earlier frames' main-data slots), scfsi-shared scalefactors under
  * the slen1/slen2 ladder, Huffman-coded big-value pairs across three
  * region-selected code tables with linbits escapes and per-value sign
  * bits, count1 quadruples, power-law requantization
  * (|is|^(4/3)·2^(q/4) with global_gain / scalefac_scale / preflag /
  * subblock_gain all folded into the quarter-power exponent q), alias
  * reduction across subband boundaries, the 36-point IMDCT with
  * long/start/short/stop windows + overlap-add, frequency inversion, and
  * the same 32-subband polyphase synthesis Layer II uses
  * ([[Mp3Codecs.Synthesis]] — shared Q30 cosine matrix and window).
  *
  * What is spec-exact here (reconstructible from the public spec text):
  * the frame/side-info bit layout, the bit-reservoir byte addressing, the
  * scalefac_compress→(slen1,slen2) table, scfsi band groups
  * {0-5, 6-10, 11-15, 16-20}, the pretab emphasis table, the Huffman
  * table STRUCTURE (per-region table_select, table dimensionalities, the
  * {1,2,3,4,6,8,10,13} / {4,5,6,7,8,9,11,13} linbits ladders, reserved
  * ids 4/14 rejected by name, count1 table B's 4-bit ones'-complement
  * codes, escape + sign-bit ordering), the requantization exponent
  * algebra, the alias-reduction butterfly structure over the Table B.9
  * ci ladder, the IMDCT definition and window shapes, frequency
  * inversion, and the synthesis filterbank. What is NOT reproducible
  * offline (pure data tables, same posture as Layer II's Table B.3/B.4):
  * the Table B.7 Huffman CODE WORDS — stood in by documented canonical
  * codebooks (length rule min(22, 2 + x + y), canonical assignment in
  * (length, symbol) order; count1 table A: 3 + popcount) — and the
  * per-sample-rate Table B.8 scalefactor-band BOUNDARY VALUES — stood in
  * by a documented even-width geometric table with the spec's structure
  * (22 long bands ending at 576, 12 short bands ending at 192, the
  * universal 0,4,8,12,16,20,24 prefix). Swapping in the conformance
  * tables changes only those literals; every parsing and filterbank
  * mechanism is real. Region boundaries for window-switching granules
  * follow the mainstream convention (region0 = first 36 values, no
  * region2).
  *
  * All arithmetic is FIXED-POINT (Q14 pow-4/3, Q12 quarter-power ladder,
  * Q24 spectra, Q30 trig tables, sign-magnitude truncating division), so
  * the DuckDB oracle replays the side-info bit accounting, scalefactor
  * cadence, Huffman value/escape/sign layout, requantization over EVERY
  * granule, and the granule-0 alias→IMDCT→window→inversion→polyphase
  * chain TWO synthesis steps deep (pinning the V-FIFO shift and the
  * odd-subband inversion) bit-exactly from the fixture formulas.
  *
  * Fail-loud contract ([[Mp3Codecs]] posture): bad sync, MPEG-2/2.5,
  * Layers I/II (by name), CRC, stereo, non-32 kHz, free format,
  * mid-stream bitrate switches, reserved Huffman ids, mixed blocks,
  * block_type 0 under window switching, preflag on short blocks, scfsi
  * into a short granule 1, reservoir underruns, part2_3 overruns, and
  * spectra outside the implemented Q-budget all throw with the offending
  * field named.
  *
  * Scale posture: decode is a pure per-row kernel behind mapPartitions —
  * payloads never cross a shuffle (reference stores opaque media URIs,
  * /root/reference/src/utils/subgraph.py; decode semantics come from the
  * public MPEG-1 spec).
  */
object Mp3L3Codecs {
  import Mp3Codecs.smDiv

  // ---- scalefactor-band geometry (documented B.8-shaped stand-in) ------
  /** Long-block band boundaries: 22 bands, even widths, ending at 576. */
  val LongIdx: Array[Int] = Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52,
    62, 74, 88, 106, 128, 154, 186, 224, 270, 326, 394, 576)
  /** Short-block band boundaries: 12 bands ending at 192 (per window). */
  val ShortIdx: Array[Int] = Array(0, 4, 8, 12, 18, 26, 36, 48, 64, 84, 110, 144, 192)
  /** Preemphasis table (spec data, reconstructed; band 21 carries none). */
  val Pretab: Array[Int] = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0)
  /** scalefac_compress → slen1/slen2 (spec §2.4.2.7). */
  val Slen1: Array[Int] = Array(0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4)
  val Slen2: Array[Int] = Array(0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3)

  // ---- alias reduction (Table B.9 ci ladder, reconstructed) ------------
  private val Ci = Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
  val CsQ30: Array[Long] =
    Ci.map(c => Math.round(1.0 / StrictMath.sqrt(1 + c * c) * (1L << 30)))
  val CaQ30: Array[Long] =
    Ci.map(c => Math.round(c / StrictMath.sqrt(1 + c * c) * (1L << 30)))

  // ---- IMDCT bases + windows (§2.4.3.4.8.3), Q30 ------------------------
  /** 36-point IMDCT: x(i) = Σ_k X(k)·cos(π/72·(2i+1+18)(2k+1)). */
  val Imdct36Q30: Array[Array[Long]] = Array.tabulate(36, 18) { (i, k) =>
    Math.round(StrictMath.cos(StrictMath.PI / 72.0 * (2 * i + 1 + 18) * (2 * k + 1)) * (1L << 30))
  }
  /** 12-point IMDCT for the three short windows. */
  val Imdct12Q30: Array[Array[Long]] = Array.tabulate(12, 6) { (i, k) =>
    Math.round(StrictMath.cos(StrictMath.PI / 24.0 * (2 * i + 1 + 6) * (2 * k + 1)) * (1L << 30))
  }
  val Win36Q30: Array[Long] = Array.tabulate(36)(i =>
    Math.round(StrictMath.sin(StrictMath.PI / 36.0 * (i + 0.5)) * (1L << 30)))
  val Win12Q30: Array[Long] = Array.tabulate(12)(i =>
    Math.round(StrictMath.sin(StrictMath.PI / 12.0 * (i + 0.5)) * (1L << 30)))
  /** Start window (block_type 1): long rise, flat, short fall, zero. */
  val WinStartQ30: Array[Long] = Array.tabulate(36)(i =>
    if (i < 18) Win36Q30(i) else if (i < 24) 1L << 30
    else if (i < 30) Win12Q30(i - 18) else 0L)
  /** Stop window (block_type 3): zero, short rise, flat, long fall. */
  val WinStopQ30: Array[Long] = Array.tabulate(36)(i =>
    if (i < 6) 0L else if (i < 12) Win12Q30(i - 6)
    else if (i < 18) 1L << 30 else Win36Q30(i))

  // ---- requantization fixed point --------------------------------------
  /** 2^(r/4) quarter-power ladder, Q12: {4096, 4871, 5793, 6889}. */
  val QuarterQ12: Array[Long] =
    Array.tabulate(4)(r => Math.round(StrictMath.pow(2.0, r / 4.0) * 4096.0))
  /** |is|^(4/3) in Q14 (StrictMath is bit-exact across JVMs; the oracle
    * embeds the same integers as literals over the fixture value range).
    */
  def pow43Q14(n: Int): Long =
    Math.round(StrictMath.pow(n.toDouble, 4.0 / 3.0) * (1L << 14))

  /** xr in Q24 from |is|, sign, and the quarter-power exponent
    * q = global_gain − 210 − 8·subblock_gain − 2(1+scalefac_scale)(scf+pre):
    * xr = ±|is|^(4/3)·2^(q/4). prod carries Q26; shifting by (2−⌊q/4⌋)
    * lands Q24 (truncating — prod ≥ 0, so >> == sign-magnitude division).
    */
  def requantQ24(absIs: Int, neg: Boolean, q: Int): Long = {
    val a = Math.floorDiv(q, 4)
    val r = q - 4 * a
    val prod = pow43Q14(absIs) * QuarterQ12(r)
    val mag =
      if (a >= 2) {
        require(a - 2 <= 16, s"requant exponent $q overflows the Q24 budget")
        prod << (a - 2)
      } else if (2 - a >= 63) 0L
      else prod >> (2 - a)
    if (neg) -mag else mag
  }

  // ---- Huffman codebooks ------------------------------------------------
  /** Canonical code assignment in (length, symbol-index) order. Returns
    * (code, len) per symbol; requires the lengths to satisfy Kraft.
    */
  def canonical(lens: Array[Int]): Array[(Int, Int)] = {
    val order = lens.indices.sortBy(i => (lens(i), i))
    val out = new Array[(Int, Int)](lens.length)
    var code = -1
    var prev = 0
    for (i <- order) {
      code = (code + 1) << (lens(i) - prev)
      prev = lens(i)
      out(i) = (code, lens(i))
      require(code < (1 << lens(i)), "canonical codebook overflows its lengths (Kraft violated)")
    }
    out
  }

  /** One big-values pair table: dim×dim symbols (x = sym/dim, y = sym%dim),
    * stand-in lengths min(22, 2 + x + y) — see the object scaladoc.
    */
  final case class PairTable(id: Int, dim: Int, linbits: Int) {
    val lens: Array[Int] =
      Array.tabulate(dim * dim)(v => math.min(22, 2 + v / dim + v % dim))
    val enc: Array[(Int, Int)] = canonical(lens)
    val dec: Map[(Int, Int), Int] =
      enc.zipWithIndex.map { case ((c, l), s) => ((l, c), s) }.toMap
    val maxLen: Int = lens.max
  }

  /** Table registry: ids 1-3 (2×2), 5/6 (4×4), 7-9 (6×6), 10-12 (8×8),
    * 13/15 (16×16), 16-23 and 24-31 (16×16 + linbits). Ids 4/14 reserved.
    */
  val PairTables: Map[Int, PairTable] = {
    val l16 = Array(1, 2, 3, 4, 6, 8, 10, 13)
    val l24 = Array(4, 5, 6, 7, 8, 9, 11, 13)
    (Seq(1 -> 2, 2 -> 2, 3 -> 2, 5 -> 4, 6 -> 4, 7 -> 6, 8 -> 6, 9 -> 6,
      10 -> 8, 11 -> 8, 12 -> 8, 13 -> 16, 15 -> 16)
      .map { case (id, d) => id -> PairTable(id, d, 0) } ++
      (0 until 8).map(k => (16 + k) -> PairTable(16 + k, 16, l16(k))) ++
      (0 until 8).map(k => (24 + k) -> PairTable(24 + k, 16, l24(k)))).toMap
  }

  /** count1 table A stand-in: len = 3 + popcount(vwxy), canonical. */
  val QuadALens: Array[Int] = Array.tabulate(16)(v => 3 + Integer.bitCount(v))
  val QuadAEnc: Array[(Int, Int)] = canonical(QuadALens)
  val QuadADec: Map[(Int, Int), Int] =
    QuadAEnc.zipWithIndex.map { case ((c, l), s) => ((l, c), s) }.toMap
  val QuadAMaxLen: Int = QuadALens.max

  // ---- bit cursor over the assembled main-data reservoir ---------------
  private[operators] final class BitCursor(bytes: Array[Byte], var bitPos: Int) {
    def read(n: Int): Int = {
      var v = 0
      var left = n
      while (left > 0) {
        require(bitPos < bytes.length * 8, "truncated main data: reservoir ended mid-field")
        val byteI = bitPos >> 3
        val bit = bitPos & 7
        val take = math.min(8 - bit, left)
        val cur = bytes(byteI) & 0xff
        v = (v << take) | ((cur >> (8 - bit - take)) & ((1 << take) - 1))
        bitPos += take
        left -= take
      }
      v
    }
    def read1(): Int = read(1)
  }

  private def decodeSym(r: BitCursor, dec: Map[(Int, Int), Int], maxLen: Int, what: String): Int = {
    var code = 0
    var len = 0
    while (len < maxLen) {
      code = (code << 1) | r.read1()
      len += 1
      val s = dec.getOrElse((len, code), -1)
      if (s >= 0) return s
    }
    throw new IllegalArgumentException(s"undecodable $what huffman code")
  }

  // ---- side info --------------------------------------------------------
  final case class GranuleInfo(
      part23: Int, bigValues: Int, globalGain: Int, sc: Int, ws: Boolean,
      bt: Int, tsel: Array[Int], sbg: Array[Int], r0: Int, r1: Int,
      preflag: Int, sfs: Int, c1t: Int)

  private final case class FrameInfo(
      mdBegin: Int, scfsi: Int, grs: Array[GranuleInfo], slotStart: Int)

  private val L3BitrateKbps =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** Decoded stream summary — all BIGINT for exact oracle replay.
    * sideSum proves the 17-byte side-info parse + reservoir pointers and
    * the part2_3 bit accounting, scfSum the slen/scfsi cadence, huffAbsSum
    * the Huffman pair/escape/sign + count1 decode over EVERY granule,
    * deqAbsSum the power-law requantization, and the granule-0 chain
    * (alias0Abs → imdct0Abs → vAbs/synAbs) the butterflies, windowed
    * IMDCT, frequency inversion, and TWO polyphase steps (V-FIFO shift).
    */
  final case class Mp3L3Decoded(
      nFrames: Long, sampleRate: Long, bitrateKbps: Long, nSamples: Long,
      sideSum: Long, scfSum: Long, huffAbsSum: Long, deqAbsSum: Long,
      alias0Abs: Long, imdct0Abs: Long, vAbs: Long, synAbs: Long)

  def decodeMp3L3(bytes: Array[Byte]): Mp3L3Decoded = {
    // ---- pass 1: headers + side info; gather main-data slots ----------
    var pos = 0
    var bitrate = -1
    val frames = ArrayBuffer.empty[FrameInfo]
    val md = new java.io.ByteArrayOutputStream()
    var slotTotal = 0
    while (pos < bytes.length) {
      require(pos + 21 <= bytes.length, "truncated MPEG frame: short header/side info")
      val r = new Mp3Codecs.BitReader(bytes, pos)
      require(r.read(12) == 0xfff, "bad syncword (not an MPEG audio frame)")
      require(r.read(1) == 1, "MPEG-2/2.5 streams are out of scope — reject, not mis-decode")
      val layerBits = r.read(2)
      require(layerBits == 1,
        s"not a Layer III frame (layer bits $layerBits; Layers I/II live in Mp3Codecs)")
      require(r.read(1) == 1, "CRC-protected frames are out of scope")
      val brIdx = r.read(4)
      require(brIdx >= 1 && brIdx <= 14, s"bitrate index $brIdx (free format is out of scope)")
      val kbps = L3BitrateKbps(brIdx)
      require(bitrate < 0 || bitrate == kbps, "mid-stream bitrate switch unsupported")
      bitrate = kbps
      require(r.read(2) == 2, "only the 32 kHz fixture profile is implemented")
      require(r.read(1) == 0, "padding is never needed at 32 kHz integer frame sizes")
      r.read(1) // private bit
      require(r.read(2) == 3, "stereo/joint/dual modes are out of scope (mono only)")
      r.read(2); r.read(1); r.read(1); r.read(2) // mode_ext, copyright, original, emphasis
      val frameBytes = 144 * kbps * 1000 / 32000
      require(pos + frameBytes <= bytes.length, "truncated MPEG frame body")
      val mdBegin = r.read(9)
      r.read(5) // private_bits
      val scfsi = r.read(4)
      val grs = Array.tabulate(2) { _ =>
        val part23 = r.read(12)
        val bv = r.read(9)
        val gg = r.read(8)
        val sc = r.read(4)
        val ws = r.read(1) == 1
        var bt = 0
        var tsel = Array(0, 0, 0)
        var sbg = Array(0, 0, 0)
        var r0 = 0
        var r1 = 0
        if (ws) {
          bt = r.read(2)
          require(bt != 0, "block_type 0 with window switching is invalid")
          require(r.read(1) == 0, "mixed blocks are out of scope")
          tsel = Array(r.read(5), r.read(5), 0)
          sbg = Array(r.read(3), r.read(3), r.read(3))
        } else {
          tsel = Array(r.read(5), r.read(5), r.read(5))
          r0 = r.read(4)
          r1 = r.read(3)
        }
        val pre = r.read(1)
        val sfs = r.read(1)
        val c1 = r.read(1)
        if (bt == 2) require(pre == 0, "preflag is not defined for short blocks")
        GranuleInfo(part23, bv, gg, sc, ws, bt, tsel, sbg, r0, r1, pre, sfs, c1)
      }
      require(scfsi == 0 || (grs(0).bt != 2 && grs(1).bt != 2),
        "scfsi sharing with a short granule is invalid")
      frames += FrameInfo(mdBegin, scfsi, grs, slotTotal)
      md.write(bytes, pos + 21, frameBytes - 21)
      slotTotal += frameBytes - 21
      pos += frameBytes
    }
    require(frames.nonEmpty, "no MPEG frames in payload")

    // ---- pass 2: main-data decode through the bit reservoir ------------
    val mdArr = md.toByteArray
    var sideSum = 0L
    var scfSum = 0L
    var huffAbs = 0L
    var deqAbs = 0L
    var alias0 = 0L
    var imdct0 = 0L
    var vAbs = 0L
    var synAbs = 0L

    var f = 0
    while (f < frames.length) {
      val fi = frames(f)
      val byteStart = fi.slotStart - fi.mdBegin
      require(byteStart >= 0, "bit-reservoir underrun: main_data_begin points before the stream")
      sideSum += fi.mdBegin + fi.scfsi
      val scf0L = new Array[Int](21) // granule-0 long scalefactors (scfsi source)
      var bitBase = byteStart * 8
      var g = 0
      while (g < 2) {
        val gi = fi.grs(g)
        sideSum += gi.part23 + gi.bigValues + gi.globalGain + gi.sc +
          (if (gi.ws) 1 else 0) +
          (if (gi.ws) gi.bt + gi.tsel(0) + gi.tsel(1) + gi.sbg.sum
           else gi.tsel.sum + gi.r0 + gi.r1) +
          gi.preflag + gi.sfs + gi.c1t
        val cur = new BitCursor(mdArr, bitBase)
        val end = bitBase + gi.part23

        // -- scalefactors (part2) --
        val s1 = Slen1(gi.sc)
        val s2 = Slen2(gi.sc)
        val scfL = new Array[Int](22) // band 21 always 0
        val scfS = Array.ofDim[Int](12, 3)
        if (gi.bt == 2) {
          var b = 0
          while (b < 12) {
            var w = 0
            while (w < 3) {
              val sl = if (b < 6) s1 else s2
              scfS(b)(w) = if (sl == 0) 0 else cur.read(sl)
              scfSum += scfS(b)(w)
              w += 1
            }
            b += 1
          }
        } else {
          var b = 0
          while (b < 21) {
            val group = if (b < 6) 0 else if (b < 11) 1 else if (b < 16) 2 else 3
            val shared = g == 1 && ((fi.scfsi >> (3 - group)) & 1) == 1
            val sl = if (b < 11) s1 else s2
            scfL(b) = if (shared) scf0L(b) else if (sl == 0) 0 else cur.read(sl)
            if (g == 0) scf0L(b) = scfL(b)
            scfSum += scfL(b)
            b += 1
          }
        }

        // -- big values (part3) --
        val absIs = new Array[Int](576)
        val negIs = new Array[Boolean](576)
        def readValue(raw: Int, linbits: Int, tid: Int): (Int, Boolean) = {
          val esc = if (linbits > 0 && raw == 15) cur.read(linbits) else 0
          val v = raw + esc
          val neg = v != 0 && cur.read1() == 1
          (v, neg)
        }
        var i = 0
        while (i < gi.bigValues) {
          val p0 = 2 * i
          require(p0 + 1 < 576, "big_values exceeds the 576-line spectrum")
          val region =
            if (gi.ws) { if (p0 < 36) 0 else 1 }
            else if (p0 < LongIdx(gi.r0 + 1)) 0
            else if (p0 < LongIdx(math.min(gi.r0 + gi.r1 + 2, 22))) 1
            else 2
          val tid = gi.tsel(region)
          if (tid != 0) {
            val pt = PairTables.getOrElse(tid, throw new IllegalArgumentException(
              s"huffman table $tid is not defined (ids 4 and 14 are reserved)"))
            val sym = decodeSym(cur, pt.dec, pt.maxLen, s"pair table $tid")
            val (vx, nx) = readValue(sym / pt.dim, pt.linbits, tid)
            val (vy, ny) = readValue(sym % pt.dim, pt.linbits, tid)
            absIs(p0) = vx; negIs(p0) = nx
            absIs(p0 + 1) = vy; negIs(p0 + 1) = ny
            huffAbs += vx.toLong + vy.toLong
          }
          i += 1
        }
        require(cur.bitPos <= end, "big-values decode overran part2_3_length")

        // -- count1 quadruples (stuffing-tolerant: rewind on overshoot) --
        var idx = 2 * gi.bigValues
        var done = false
        while (!done && cur.bitPos < end && idx + 4 <= 576) {
          val save = cur.bitPos
          val sym =
            if (gi.c1t == 0) decodeSym(cur, QuadADec, QuadAMaxLen, "count1 table A")
            else (~cur.read(4)) & 0xf
          val vs = Array((sym >> 3) & 1, (sym >> 2) & 1, (sym >> 1) & 1, sym & 1)
          val ns = vs.map(v => v != 0 && cur.read1() == 1)
          if (cur.bitPos > end) {
            cur.bitPos = save // trailing stuffing bits, not a quadruple
            done = true
          } else {
            var k = 0
            while (k < 4) {
              absIs(idx + k) = vs(k)
              negIs(idx + k) = ns(k)
              huffAbs += vs(k).toLong
              k += 1
            }
            idx += 4
          }
        }
        val nLines = idx

        // -- requantization over every decoded line --
        val xr = new Array[Long](576)
        var sumAbs0 = 0L
        var p = 0
        var lb = 0
        var sb12 = 0
        while (p < nLines) {
          if (absIs(p) != 0) {
            val q =
              if (gi.bt == 2) {
                while (3 * ShortIdx(sb12 + 1) <= p) sb12 += 1
                val width = ShortIdx(sb12 + 1) - ShortIdx(sb12)
                val win = (p - 3 * ShortIdx(sb12)) / width
                gi.globalGain - 210 - 8 * gi.sbg(win) -
                  2 * (1 + gi.sfs) * scfS(sb12)(win)
              } else {
                while (LongIdx(lb + 1) <= p) lb += 1
                gi.globalGain - 210 -
                  2 * (1 + gi.sfs) * (scfL(lb) + gi.preflag * Pretab(lb))
              }
            val x = requantQ24(absIs(p), negIs(p), q)
            require(math.abs(x) < (1L << 28),
              "spectral magnitude exceeds the implemented Q-budget — reject, not mis-decode")
            xr(p) = x
            deqAbs += math.abs(x)
            if (f == 0 && g == 0) sumAbs0 += math.abs(x)
          }
          p += 1
        }

        // -- granule-0 filterbank chain (long blocks; the oracle's probe) --
        if (f == 0 && g == 0 && !gi.ws) {
          require(sumAbs0 < (1L << 31),
            "granule-0 spectral energy exceeds the implemented Q-budget")
          // alias-reduction butterflies (positions are pairwise disjoint)
          val xa = xr.clone()
          var s = 1
          while (s < 32) {
            var k = 0
            while (k < 8) {
              val lo = 18 * s - 1 - k
              val hi = 18 * s + k
              val a = xr(lo)
              val b = xr(hi)
              if (a != 0 || b != 0) {
                xa(lo) = smDiv(CsQ30(k) * a, 1L << 30) - smDiv(CaQ30(k) * b, 1L << 30)
                xa(hi) = smDiv(CsQ30(k) * b, 1L << 30) + smDiv(CaQ30(k) * a, 1L << 30)
              }
              k += 1
            }
            s += 1
          }
          var ap = 0
          while (ap < 576) { alias0 += math.abs(xa(ap)); ap += 1 }
          // windowed 36-point IMDCT, zero overlap history -> first 18 samples
          val out0 = new Array[Long](32)
          val out1 = new Array[Long](32)
          var sb = 0
          while (sb < 32) {
            var t = 0
            while (t < 18) {
              var acc = 0L
              var k = 0
              while (k < 18) {
                val x = xa(18 * sb + k)
                if (x != 0) acc += smDiv(Imdct36Q30(t)(k) * x, 1L << 30)
                k += 1
              }
              val wv = smDiv(acc * Win36Q30(t), 1L << 30)
              imdct0 += math.abs(wv)
              val inv = if (sb % 2 == 1 && t % 2 == 1) -wv else wv
              if (t == 0) out0(sb) = inv
              if (t == 1) out1(sb) = inv
              t += 1
            }
            sb += 1
          }
          // two polyphase steps: pins the matrixing, the window taps, the
          // V-FIFO shift, and (through out1) the frequency inversion
          val va = new Array[Long](64)
          val vb = new Array[Long](64)
          var ii = 0
          while (ii < 64) {
            var a = 0L
            var b = 0L
            var k = 0
            while (k < 32) {
              if (out0(k) != 0) a += smDiv(Mp3Codecs.CosQ30(ii)(k) * out0(k), 1L << 30)
              if (out1(k) != 0) b += smDiv(Mp3Codecs.CosQ30(ii)(k) * out1(k), 1L << 30)
              k += 1
            }
            va(ii) = a
            vb(ii) = b
            vAbs += math.abs(a) + math.abs(b)
            ii += 1
          }
          var j = 0
          while (j < 32) {
            val p1 = smDiv(Mp3Codecs.WinQ30(j) * va(j), 1L << 30)
            val p2 = smDiv(Mp3Codecs.WinQ30(j) * vb(j), 1L << 30) +
              smDiv(Mp3Codecs.WinQ30(j + 32) * va(32 + j), 1L << 30)
            synAbs += math.abs(p1) + math.abs(p2)
            j += 1
          }
        }

        bitBase += gi.part23
        g += 1
      }
      f += 1
    }
    Mp3L3Decoded(frames.length.toLong, 32000L, bitrate.toLong,
      frames.length * 1152L, sideSum, scfSum, huffAbs, deqAbs,
      alias0, imdct0, vAbs, synAbs)
  }
}

/** Deterministic Layer III fixtures: the generator authors every side-info
  * field, scalefactor, Huffman pair/escape/sign and count1 quadruple by
  * doc_id formulas (never through an encoder's psychoacoustic search),
  * packs them through the real frame layout — INCLUDING a real bit
  * reservoir (frame n's main data starts `main_data_begin` bytes back in
  * frame n−1's slot, target (d·17+f·29) % 60) — and the oracle replays the
  * same formulas through the shared fixed-point tables. Granule 0 is
  * always a long block (the oracled filterbank chain); granule 1 cycles
  * long / start / short / stop, exercising subblock gains, short-window
  * scalefactors, the window-switching region convention, and the scfsi
  * ban on short granules. Tables cycle {1,5,7,10,13,16,24,30} per region
  * with a region-2 zero-table override; count1 alternates the canonical
  * table A and the spec-exact ones'-complement table B.
  *
  * global_gain ∈ [159, 193] keeps every requantized line under 2^27 and
  * the granule-0 chain provably inside the Long budget (the decoder's
  * Q-budget guards fail loud on anything wider).
  */
object Mp3L3Fixtures {
  import Mp3Codecs.BitWriter
  import Mp3L3Codecs._

  val Mp3Mime = "audio/mpeg"

  // ---- authored-field formulas (mirrored verbatim in the oracle SQL) ----
  def wk(d: Long): Long = d / 9
  def nFrames(d: Long): Int = (1 + wk(d) % 3).toInt
  def bitrateKbps(d: Long): Int =
    ((wk(d) + 2) % 3).toInt match { case 0 => 64; case 1 => 96; case _ => 128 }
  private def brIndex(k: Int): Int = k match { case 64 => 5; case 96 => 7; case _ => 9 }

  def blockType(d: Long, f: Int, g: Int): Int = if (g == 0) 0 else ((d + f) % 4).toInt
  def bigValues(d: Long, f: Int, g: Int): Int = (8 + (d + f * 3 + g * 5) % 7).toInt
  def region0Count(d: Long, f: Int): Int = ((d + f) % 3).toInt + 1
  def region1Count(d: Long, g: Int): Int = ((d + g) % 3).toInt + 1
  def scalefacCompress(d: Long, f: Int, g: Int): Int = ((d * 3 + f + g * 5) % 16).toInt
  def globalGain(d: Long, f: Int, g: Int): Int = (159 + (d * 5 + f * 7 + g * 11) % 35).toInt
  def scalefacScale(d: Long, g: Int): Int = ((d + g) % 2).toInt
  def preflagOf(d: Long, f: Int, g: Int): Int =
    if (blockType(d, f, g) == 2) 0 else if ((d + f + g) % 3 == 0) 1 else 0
  def count1Table(d: Long, f: Int, g: Int): Int = ((d + f + g) % 2).toInt
  def nQuads(d: Long, f: Int, g: Int): Int = (2 + (d + f + g) % 4).toInt
  def subblockGain(d: Long, f: Int, w: Int): Int = ((d + f + w) % 4).toInt
  def scfsiOf(d: Long, f: Int): Int =
    if (blockType(d, f, 1) == 2) 0 else ((d + f) % 16).toInt
  def mdBeginOf(d: Long, f: Int): Int =
    if (f == 0) 0 else ((d * 17 + f * 29) % 60).toInt

  val TSel: Array[Int] = Array(1, 5, 7, 10, 13, 16, 24, 30)
  def tableFor(d: Long, f: Int, g: Int, region: Int): Int =
    if (region == 2 && (d + g) % 5 == 0) 0
    else TSel(((d + f + g * 2 + region * 3) % 8).toInt)
  def regionOf(d: Long, f: Int, g: Int, p0: Int): Int =
    if (blockType(d, f, g) != 0) { if (p0 < 36) 0 else 1 }
    else if (p0 < LongIdx(region0Count(d, f) + 1)) 0
    else if (p0 < LongIdx(region0Count(d, f) + region1Count(d, g) + 2)) 1
    else 2
  def rawVal(d: Long, f: Int, g: Int, pos: Int, dim: Int): Int =
    if (dim <= 1) 0 else ((d * 13 + f * 7 + g * 3 + pos.toLong * 11) % dim).toInt
  def escVal(d: Long, f: Int, pos: Int, tid: Int): Int =
    ((d * 3 + f + pos) % (if (tid == 16) 2 else 13)).toInt
  def negOf(d: Long, f: Int, g: Int, pos: Int): Boolean = (d + f + g + pos) % 2 == 1
  def scfLong(d: Long, f: Int, g: Int, b: Int, slen: Int): Int =
    if (slen == 0) 0 else ((d * 7 + f * 3 + g + b * 5) % (1L << slen)).toInt
  def scfShort(d: Long, f: Int, g: Int, b: Int, w: Int, slen: Int): Int =
    if (slen == 0) 0 else ((d * 7 + f * 3 + g + b * 5 + w * 9) % (1L << slen)).toInt
  def quadBit(d: Long, f: Int, g: Int, p: Int, which: Int): Int = (which match {
    case 0 => (d + p) % 2
    case 1 => (f.toLong + p) % 2
    case 2 => (g.toLong + p) % 2
    case _ => (d + f + p) % 2
  }).toInt

  /** Largest |is| the fixtures author (escape ceiling 12 over raw 15). */
  val MaxIs: Int = 27

  // ---- bit-exact granule assembly ---------------------------------------
  private[operators] final class BitBuf {
    val bits = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    def write(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) { bits += ((v >> k) & 1) == 1; k -= 1 }
    }
    def append(o: BitBuf): Unit = bits ++= o.bits
    def length: Int = bits.length
    def toBytes: Array[Byte] = {
      val out = new Array[Byte]((bits.length + 7) / 8)
      var i = 0
      while (i < bits.length) {
        if (bits(i)) out(i >> 3) = (out(i >> 3) | (1 << (7 - (i & 7)))).toByte
        i += 1
      }
      out
    }
  }

  /** One granule's main-data bits (part2 scalefactors + part3 huffman);
    * also recomputes part2_3_length from the closed-form bit accounting
    * the oracle uses and asserts both agree (self-checking fixtures).
    */
  private[operators] def granuleBits(d: Long, f: Int, g: Int, scfsi: Int): BitBuf = {
    val bb = new BitBuf
    val bt = blockType(d, f, g)
    val ws = bt != 0
    val sc = scalefacCompress(d, f, g)
    val s1 = Slen1(sc)
    val s2 = Slen2(sc)
    var part2 = 0
    if (bt == 2) {
      for (b <- 0 until 12; w <- 0 until 3) {
        val sl = if (b < 6) s1 else s2
        if (sl > 0) { bb.write(scfShort(d, f, g, b, w, sl), sl); part2 += sl }
      }
    } else {
      for (b <- 0 until 21) {
        val group = if (b < 6) 0 else if (b < 11) 1 else if (b < 16) 2 else 3
        val shared = g == 1 && ((scfsi >> (3 - group)) & 1) == 1
        if (!shared) {
          val sl = if (b < 11) s1 else s2
          if (sl > 0) { bb.write(scfLong(d, f, g, b, sl), sl); part2 += sl }
        }
      }
    }
    var part3 = 0
    val bv = bigValues(d, f, g)
    for (p <- 0 until bv) {
      val p0 = 2 * p
      val tid = tableFor(d, f, g, regionOf(d, f, g, p0))
      if (tid != 0) {
        val pt = PairTables(tid)
        val rx = rawVal(d, f, g, p0, pt.dim)
        val ry = rawVal(d, f, g, p0 + 1, pt.dim)
        val (code, len) = pt.enc(rx * pt.dim + ry)
        bb.write(code, len)
        part3 += len
        for ((raw, pp) <- Seq((rx, p0), (ry, p0 + 1))) {
          val esc = if (pt.linbits > 0 && raw == 15) escVal(d, f, pp, tid) else 0
          if (pt.linbits > 0 && raw == 15) { bb.write(esc, pt.linbits); part3 += pt.linbits }
          if (raw + esc != 0) { bb.write(if (negOf(d, f, g, pp)) 1 else 0, 1); part3 += 1 }
        }
      }
    }
    val c1 = count1Table(d, f, g)
    for (p <- 0 until nQuads(d, f, g)) {
      val pos0 = 2 * bv + 4 * p
      val q = Array.tabulate(4)(k => quadBit(d, f, g, p, k))
      val sym = (q(0) << 3) | (q(1) << 2) | (q(2) << 1) | q(3)
      if (c1 == 0) { val (code, len) = QuadAEnc(sym); bb.write(code, len); part3 += len }
      else { bb.write((~sym) & 0xf, 4); part3 += 4 }
      for (k <- 0 until 4 if q(k) != 0) {
        bb.write(if (negOf(d, f, g, pos0 + k)) 1 else 0, 1)
        part3 += 1
      }
    }
    require(bb.length == part2 + part3 && bb.length < 4096,
      s"fixture bit accounting drifted: ${bb.length} != ${part2 + part3}")
    bb
  }

  def part23Of(d: Long, f: Int, g: Int): Int = granuleBits(d, f, g, scfsiOf(d, f)).length

  def mp3l3(d: Long): Array[Byte] = {
    val nf = nFrames(d)
    val kbps = bitrateKbps(d)
    val frameBytes = 144 * kbps * 1000 / 32000
    val slot = frameBytes - 21
    // main-data stream: per-frame byte-aligned starts, ancillary padding
    // between frames realizes the authored main_data_begin targets
    val mdStream = new java.io.ByteArrayOutputStream()
    val part23s = Array.ofDim[Int](nf, 2)
    var slotStart = 0
    for (f <- 0 until nf) {
      val scfsi = scfsiOf(d, f)
      val fb = new BitBuf
      for (g <- 0 until 2) {
        val gb = granuleBits(d, f, g, scfsi)
        part23s(f)(g) = gb.length
        fb.append(gb)
      }
      val startByte = slotStart - mdBeginOf(d, f)
      require(startByte >= mdStream.size,
        s"fixture reservoir underflow at frame $f (doc $d)")
      mdStream.write(new Array[Byte](startByte - mdStream.size))
      val mdBytes = fb.toBytes
      mdStream.write(mdBytes)
      require(startByte + mdBytes.length <= slotStart + slot,
        s"fixture main data overflows its slot window at frame $f (doc $d)")
      slotStart += slot
    }
    val mdAll = java.util.Arrays.copyOf(mdStream.toByteArray, nf * slot)
    val out = new java.io.ByteArrayOutputStream()
    for (f <- 0 until nf) {
      val w = new BitWriter
      w.write(0xfff, 12); w.write(1, 1); w.write(1, 2); w.write(1, 1)
      w.write(brIndex(kbps), 4); w.write(2, 2); w.write(0, 1); w.write(0, 1)
      w.write(3, 2); w.write(0, 2); w.write(0, 1); w.write(1, 1); w.write(0, 2)
      w.write(mdBeginOf(d, f), 9)
      w.write(0, 5)
      w.write(scfsiOf(d, f), 4)
      for (g <- 0 until 2) {
        val bt = blockType(d, f, g)
        val ws = bt != 0
        w.write(part23s(f)(g), 12)
        w.write(bigValues(d, f, g), 9)
        w.write(globalGain(d, f, g), 8)
        w.write(scalefacCompress(d, f, g), 4)
        w.write(if (ws) 1 else 0, 1)
        if (ws) {
          w.write(bt, 2); w.write(0, 1)
          w.write(tableFor(d, f, g, 0), 5); w.write(tableFor(d, f, g, 1), 5)
          for (k <- 0 until 3) w.write(subblockGain(d, f, k), 3)
        } else {
          for (reg <- 0 until 3) w.write(tableFor(d, f, g, reg), 5)
          w.write(region0Count(d, f), 4)
          w.write(region1Count(d, g), 3)
        }
        w.write(preflagOf(d, f, g), 1)
        w.write(scalefacScale(d, g), 1)
        w.write(count1Table(d, f, g), 1)
      }
      val head = w.bytes
      require(head.length == 21, s"side info misassembled: ${head.length} bytes")
      out.write(head)
      out.write(mdAll, f * slot, slot)
    }
    out.toByteArray
  }
}

/** Generated Layer III oracle (the minhash pattern): the SQL below is
  * built from the SAME fixed-point tables and authored-field formulas the
  * decoder and [[Mp3L3Fixtures]] use, so both engines move together. A
  * hash match proves the side-info bit accounting (part2_3_length is
  * recomputed symbolically from the codebook length rule), the
  * scfsi-shared scalefactor cadence, the Huffman value/escape/sign
  * layout, the bit-reservoir pointers, requantization over every granule
  * of every frame, and the granule-0 alias→IMDCT→window→inversion chain
  * through TWO polyphase synthesis steps.
  */
object Mp3L3Oracle {
  import Mp3L3Codecs._

  // ::BIGINT[] — a bare int list literal infers INT32 and its products
  // overflow in DuckDB; the Spark side is all Long
  private def lst(xs: Seq[Long]): String = xs.mkString("[", ",", "]::BIGINT[]")
  private def smd(t: String, d: String): String =
    s"(CASE WHEN ($t) < 0 THEN -(ABS($t) // ($d)) ELSE (ABS($t)) // ($d) END)"

  def sql: String = {
    val sl1 = lst(Slen1.map(_.toLong).toSeq)
    val sl2 = lst(Slen2.map(_.toLong).toSeq)
    val lidx = lst(LongIdx.map(_.toLong).toSeq)
    val pretab = lst(Pretab.map(_.toLong).toSeq)
    val tsel = lst(Mp3L3Fixtures.TSel.map(_.toLong).toSeq)
    val p43 = lst((0 to Mp3L3Fixtures.MaxIs).map(pow43Q14))
    val qq = lst(QuarterQ12.toSeq)
    val cs = lst(CsQ30.toSeq)
    val ca = lst(CaQ30.toSeq)
    val imd = lst(for (i <- 0 until 18; k <- 0 until 18) yield Imdct36Q30(i)(k))
    val w36 = lst(Win36Q30.take(18).toSeq)
    val cos = lst(for (i <- 0 until 64; k <- 0 until 32) yield Mp3Codecs.CosQ30(i)(k))
    val wq = lst(Mp3Codecs.WinQ30.take(64).toSeq)
    val lbLo = lst(LongIdx.take(22).map(_.toLong).toSeq)
    val lbHi = lst(LongIdx.drop(1).map(_.toLong).toSeq)
    val sbLo = lst(ShortIdx.take(12).map(i => 3L * i).toSeq)
    val sbHi = lst(ShortIdx.drop(1).map(i => 3L * i).toSeq)
    val sbW = lst((0 until 12).map(b => (ShortIdx(b + 1) - ShortIdx(b)).toLong))
    val q30 = "(1::BIGINT << 30)"
    s"""WITH a AS (
       |  SELECT doc_id AS d,
       |         CAST(1 + (doc_id // 9) % 3 AS BIGINT) AS nf,
       |         CAST(CASE (doc_id // 9 + 2) % 3 WHEN 0 THEN 64 WHEN 1 THEN 96 ELSE 128 END AS BIGINT) AS br
       |  FROM documents WHERE doc_id % 9 = 7),
       |fr AS (SELECT d, nf, br, unnest(generate_series(0, nf - 1)) AS f FROM a),
       |fr2 AS (SELECT d, f, CASE WHEN (d + f) % 4 = 2 THEN 0 ELSE (d + f) % 16 END AS scfsi FROM fr),
       |gr AS MATERIALIZED (
       |  SELECT fr2.d, fr2.f, gg.g, fr2.scfsi,
       |         CASE WHEN gg.g = 0 THEN 0 ELSE (fr2.d + fr2.f) % 4 END AS bt,
       |         8 + (fr2.d + fr2.f * 3 + gg.g * 5) % 7 AS bv,
       |         (fr2.d + fr2.f) % 3 + 1 AS r0,
       |         (fr2.d + gg.g) % 3 + 1 AS r1,
       |         (fr2.d * 3 + fr2.f + gg.g * 5) % 16 AS sc,
       |         159 + (fr2.d * 5 + fr2.f * 7 + gg.g * 11) % 35 AS ggn,
       |         (fr2.d + gg.g) % 2 AS sfs,
       |         (fr2.d + fr2.f + gg.g) % 2 AS c1t,
       |         2 + (fr2.d + fr2.f + gg.g) % 4 AS nq
       |  FROM fr2, (SELECT unnest([0, 1]) AS g) gg),
       |gr2 AS MATERIALIZED (
       |  SELECT gr.*,
       |         CASE WHEN bt = 2 THEN 0 WHEN (d + f + g) % 3 = 0 THEN 1 ELSE 0 END AS pre,
       |         list_extract($sl1, sc + 1) AS s1,
       |         list_extract($sl2, sc + 1) AS s2
       |  FROM gr),
       |pr1 AS (
       |  SELECT gr2.*, pp.p, 2 * pp.p AS p0
       |  FROM gr2, (SELECT unnest(generate_series(0, 13)) AS p) pp
       |  WHERE pp.p < gr2.bv),
       |pr2 AS (
       |  SELECT *, CASE WHEN bt != 0 THEN (CASE WHEN p0 < 36 THEN 0 ELSE 1 END)
       |                 WHEN p0 < list_extract($lidx, r0 + 2) THEN 0
       |                 WHEN p0 < list_extract($lidx, r0 + r1 + 3) THEN 1
       |                 ELSE 2 END AS region
       |  FROM pr1),
       |pr3 AS (
       |  SELECT *, CASE WHEN region = 2 AND (d + g) % 5 = 0 THEN 0
       |                 ELSE list_extract($tsel, ((d + f + g * 2 + region * 3) % 8) + 1) END AS tid
       |  FROM pr2),
       |pr4 AS (
       |  SELECT *,
       |    CASE tid WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 5 THEN 4 WHEN 7 THEN 6 WHEN 10 THEN 8 ELSE 16 END AS dim,
       |    CASE tid WHEN 16 THEN 1 WHEN 24 THEN 4 WHEN 30 THEN 11 ELSE 0 END AS lin
       |  FROM pr3),
       |pr5 AS (
       |  SELECT *,
       |    CASE WHEN dim = 1 THEN 0 ELSE (d * 13 + f * 7 + g * 3 + p0 * 11) % dim END AS rawx,
       |    CASE WHEN dim = 1 THEN 0 ELSE (d * 13 + f * 7 + g * 3 + (p0 + 1) * 11) % dim END AS rawy
       |  FROM pr4),
       |pr6 AS MATERIALIZED (
       |  SELECT *,
       |    rawx + CASE WHEN lin > 0 AND rawx = 15 THEN (d * 3 + f + p0) % (CASE WHEN tid = 16 THEN 2 ELSE 13 END) ELSE 0 END AS vx,
       |    rawy + CASE WHEN lin > 0 AND rawy = 15 THEN (d * 3 + f + p0 + 1) % (CASE WHEN tid = 16 THEN 2 ELSE 13 END) ELSE 0 END AS vy
       |  FROM pr5),
       |prb AS (
       |  SELECT d, f, g, SUM(CASE WHEN tid = 0 THEN 0 ELSE
       |      LEAST(22, 2 + rawx + rawy)
       |      + CASE WHEN lin > 0 AND rawx = 15 THEN lin ELSE 0 END
       |      + CASE WHEN lin > 0 AND rawy = 15 THEN lin ELSE 0 END
       |      + CASE WHEN vx > 0 THEN 1 ELSE 0 END
       |      + CASE WHEN vy > 0 THEN 1 ELSE 0 END END) AS bits
       |  FROM pr6 GROUP BY d, f, g),
       |qd AS MATERIALIZED (
       |  SELECT gr2.*, qp.p, 2 * gr2.bv + 4 * qp.p AS pos0,
       |         (gr2.d + qp.p) % 2 AS q0, (gr2.f + qp.p) % 2 AS q1,
       |         (gr2.g + qp.p) % 2 AS q2, (gr2.d + gr2.f + qp.p) % 2 AS q3
       |  FROM gr2, (SELECT unnest(generate_series(0, 5)) AS p) qp
       |  WHERE qp.p < gr2.nq),
       |qdb AS (
       |  SELECT d, f, g, SUM((CASE WHEN c1t = 0 THEN 3 + q0 + q1 + q2 + q3 ELSE 4 END) + q0 + q1 + q2 + q3) AS bits
       |  FROM qd GROUP BY d, f, g),
       |p23 AS MATERIALIZED (
       |  SELECT gr2.*,
       |    (CASE WHEN gr2.bt = 2 THEN 3 * (6 * gr2.s1 + 6 * gr2.s2)
       |          WHEN gr2.g = 0 THEN 11 * gr2.s1 + 10 * gr2.s2
       |          ELSE gr2.s1 * (6 * (1 - (gr2.scfsi // 8) % 2) + 5 * (1 - (gr2.scfsi // 4) % 2))
       |             + gr2.s2 * (5 * (1 - (gr2.scfsi // 2) % 2) + 5 * (1 - gr2.scfsi % 2)) END)
       |    + COALESCE(prb.bits, 0) + COALESCE(qdb.bits, 0) AS part23
       |  FROM gr2
       |  LEFT JOIN prb ON prb.d = gr2.d AND prb.f = gr2.f AND prb.g = gr2.g
       |  LEFT JOIN qdb ON qdb.d = gr2.d AND qdb.f = gr2.f AND qdb.g = gr2.g),
       |sde AS (
       |  SELECT d, SUM(part23 + bv + ggn + sc
       |    + CASE WHEN bt = 0 THEN 0 ELSE 1 END
       |    + CASE WHEN bt != 0 THEN bt
       |        + list_extract($tsel, ((d + f + g * 2) % 8) + 1)
       |        + list_extract($tsel, ((d + f + g * 2 + 3) % 8) + 1)
       |        + ((d + f) % 4) + ((d + f + 1) % 4) + ((d + f + 2) % 4)
       |      ELSE
       |        list_extract($tsel, ((d + f + g * 2) % 8) + 1)
       |        + list_extract($tsel, ((d + f + g * 2 + 3) % 8) + 1)
       |        + (CASE WHEN (d + g) % 5 = 0 THEN 0 ELSE list_extract($tsel, ((d + f + g * 2 + 6) % 8) + 1) END)
       |        + r0 + r1 END
       |    + pre + sfs + c1t) AS v
       |  FROM p23 GROUP BY d),
       |sdf AS (
       |  SELECT d, SUM(CASE WHEN f = 0 THEN 0 ELSE (d * 17 + f * 29) % 60 END + scfsi) AS v
       |  FROM fr2 GROUP BY d),
       |scl AS (
       |  SELECT gr2.d, gr2.f, gr2.g, bb.b,
       |    CASE WHEN gr2.g = 1 AND ((gr2.scfsi // (CASE WHEN bb.b < 6 THEN 8 WHEN bb.b < 11 THEN 4 WHEN bb.b < 16 THEN 2 ELSE 1 END)) % 2) = 1
       |         THEN 0 ELSE gr2.g END AS ge
       |  FROM gr2, (SELECT unnest(generate_series(0, 20)) AS b) bb
       |  WHERE gr2.bt != 2),
       |scl2 AS (SELECT d, f, b, ge, (d * 3 + f + ge * 5) % 16 AS sce FROM scl),
       |scl3 AS (SELECT d, f, b, ge,
       |    CASE WHEN b < 11 THEN list_extract($sl1, sce + 1) ELSE list_extract($sl2, sce + 1) END AS sl
       |  FROM scl2),
       |scv AS (
       |  SELECT d, CASE WHEN sl = 0 THEN 0 ELSE (d * 7 + f * 3 + ge + b * 5) % (1::BIGINT << sl) END AS v FROM scl3
       |  UNION ALL
       |  SELECT d, CASE WHEN sl = 0 THEN 0 ELSE (d * 7 + f * 3 + g + b * 5 + w * 9) % (1::BIGINT << sl) END AS v
       |  FROM (
       |    SELECT gr2.d, gr2.f, gr2.g, bb.b, ww.w,
       |      CASE WHEN bb.b < 6 THEN gr2.s1 ELSE gr2.s2 END AS sl
       |    FROM gr2, (SELECT unnest(generate_series(0, 11)) AS b) bb,
       |         (SELECT unnest(generate_series(0, 2)) AS w) ww
       |    WHERE gr2.bt = 2) t),
       |scfagg AS (SELECT d, SUM(v) AS scf_sum FROM scv GROUP BY d),
       |sv AS MATERIALIZED (
       |  SELECT * FROM (
       |    SELECT d, f, g, bt, ggn, sfs, pre, scfsi, sc, p0 AS pos, vx AS iv FROM pr6
       |    UNION ALL SELECT d, f, g, bt, ggn, sfs, pre, scfsi, sc, p0 + 1, vy FROM pr6
       |    UNION ALL SELECT d, f, g, bt, ggn, sfs, pre, scfsi, sc, pos0, q0 FROM qd
       |    UNION ALL SELECT d, f, g, bt, ggn, sfs, pre, scfsi, sc, pos0 + 1, q1 FROM qd
       |    UNION ALL SELECT d, f, g, bt, ggn, sfs, pre, scfsi, sc, pos0 + 2, q2 FROM qd
       |    UNION ALL SELECT d, f, g, bt, ggn, sfs, pre, scfsi, sc, pos0 + 3, q3 FROM qd
       |  ) u WHERE iv > 0),
       |huffagg AS (SELECT d, SUM(iv) AS huff FROM sv GROUP BY d),
       |lbd AS (SELECT unnest(generate_series(0, 21)) AS b, unnest($lbLo) AS lo, unnest($lbHi) AS hi),
       |sbd AS (SELECT unnest(generate_series(0, 11)) AS b, unnest($sbLo) AS lo3, unnest($sbHi) AS hi3, unnest($sbW) AS wdt),
       |dql1 AS (
       |  SELECT sv.*, lb.b FROM sv JOIN lbd lb ON sv.pos >= lb.lo AND sv.pos < lb.hi
       |  WHERE sv.bt != 2),
       |dql2 AS (
       |  SELECT *, CASE WHEN g = 1 AND ((scfsi // (CASE WHEN b < 6 THEN 8 WHEN b < 11 THEN 4 WHEN b < 16 THEN 2 ELSE 1 END)) % 2) = 1 THEN 0 ELSE g END AS ge
       |  FROM dql1),
       |dql3 AS (SELECT *, (d * 3 + f + ge * 5) % 16 AS sce FROM dql2),
       |dql4 AS (SELECT *,
       |    CASE WHEN b >= 21 THEN 0
       |         WHEN b < 11 THEN list_extract($sl1, sce + 1)
       |         ELSE list_extract($sl2, sce + 1) END AS sl
       |  FROM dql3),
       |dqall AS (
       |  SELECT d, f, g, pos, iv,
       |    ggn - 210 - 2 * (1 + sfs) * ((CASE WHEN sl = 0 THEN 0 ELSE (d * 7 + f * 3 + ge + b * 5) % (1::BIGINT << sl) END) + pre * list_extract($pretab, b + 1)) AS q
       |  FROM dql4
       |  UNION ALL
       |  SELECT d, f, g, pos, iv,
       |    ggn - 210 - 8 * ((d + f + (pos - lo3) // wdt) % 4)
       |      - 2 * (1 + sfs) * (CASE WHEN sl = 0 THEN 0 ELSE (d * 7 + f * 3 + g + b * 5 + ((pos - lo3) // wdt) * 9) % (1::BIGINT << sl) END) AS q
       |  FROM (
       |    SELECT sv.*, sb.b, sb.lo3, sb.wdt,
       |      CASE WHEN sb.b < 6 THEN list_extract($sl1, sv.sc + 1) ELSE list_extract($sl2, sv.sc + 1) END AS sl
       |    FROM sv JOIN sbd sb ON sv.pos >= sb.lo3 AND sv.pos < sb.hi3
       |    WHERE sv.bt = 2) s),
       |dq1 AS (SELECT d, f, g, pos, iv, q, ((q % 4) + 4) % 4 AS rr FROM dqall),
       |dq2 AS (SELECT d, f, g, pos, iv, rr, (q - rr) // 4 AS aa FROM dq1),
       |dq3 AS (SELECT d, f, g, pos,
       |    list_extract($p43, iv + 1) * list_extract($qq, rr + 1) AS prod, aa FROM dq2),
       |dq4 AS MATERIALIZED (
       |  SELECT d, f, g, pos,
       |    CASE WHEN (d + f + g + pos) % 2 = 0 THEN 1 ELSE -1 END AS sgn,
       |    CASE WHEN aa >= 2 THEN prod * (1::BIGINT << (aa - 2)) ELSE prod // (1::BIGINT << (2 - aa)) END AS mag
       |  FROM dq3),
       |deqagg AS (SELECT d, SUM(mag) AS deq FROM dq4 GROUP BY d),
       |x0 AS MATERIALIZED (SELECT d, pos, sgn * mag AS xr FROM dq4 WHERE f = 0 AND g = 0 AND mag != 0),
       |bgrid AS (
       |  SELECT ss.s, ii.i, 18 * ss.s - 1 - ii.i AS lo, 18 * ss.s + ii.i AS hi,
       |         list_extract($cs, ii.i + 1) AS csq, list_extract($ca, ii.i + 1) AS caq
       |  FROM (SELECT unnest(generate_series(1, 31)) AS s) ss,
       |       (SELECT unnest(generate_series(0, 7)) AS i) ii),
       |bx AS MATERIALIZED (
       |  SELECT dd.d, bg.lo, bg.hi, bg.csq, bg.caq,
       |         COALESCE(xl.xr, 0) AS xl, COALESCE(xh.xr, 0) AS xh
       |  FROM (SELECT DISTINCT d FROM x0) dd
       |  CROSS JOIN bgrid bg
       |  LEFT JOIN x0 xl ON xl.d = dd.d AND xl.pos = bg.lo
       |  LEFT JOIN x0 xh ON xh.d = dd.d AND xh.pos = bg.hi
       |  WHERE xl.xr IS NOT NULL OR xh.xr IS NOT NULL),
       |xa AS MATERIALIZED (
       |  SELECT d, pos, v FROM (
       |    SELECT d, lo AS pos, ${smd("csq * xl", q30)} - ${smd("caq * xh", q30)} AS v FROM bx
       |    UNION ALL
       |    SELECT d, hi AS pos, ${smd("csq * xh", q30)} + ${smd("caq * xl", q30)} AS v FROM bx
       |    UNION ALL
       |    SELECT d, pos, xr AS v FROM x0
       |    WHERE NOT ((pos >= 18 AND pos % 18 <= 7) OR (pos % 18 >= 10 AND pos < 558))
       |  ) u),
       |aliasagg AS (SELECT d, SUM(ABS(v)) AS alias0 FROM xa GROUP BY d),
       |im AS MATERIALIZED (
       |  SELECT d, pos // 18 AS sb, tt.t,
       |         SUM(${smd(s"v * list_extract($imd, tt.t * 18 + (pos % 18) + 1)", q30)}) AS acc
       |  FROM xa, (SELECT unnest(generate_series(0, 17)) AS t) tt
       |  WHERE v != 0
       |  GROUP BY d, pos // 18, tt.t),
       |wd AS MATERIALIZED (
       |  SELECT d, sb, t, ${smd(s"acc * list_extract($w36, t + 1)", q30)} AS wv FROM im),
       |imdagg AS (SELECT d, SUM(ABS(wv)) AS imdct0 FROM wd GROUP BY d),
       |o2 AS (
       |  SELECT d, sb,
       |    COALESCE(MAX(CASE WHEN t = 0 THEN wv END), 0) AS out0,
       |    CASE WHEN sb % 2 = 1 THEN -COALESCE(MAX(CASE WHEN t = 1 THEN wv END), 0)
       |         ELSE COALESCE(MAX(CASE WHEN t = 1 THEN wv END), 0) END AS out1
       |  FROM wd WHERE t < 2 GROUP BY d, sb),
       |mat AS MATERIALIZED (
       |  SELECT d, ii.i,
       |    SUM(${smd(s"out0 * list_extract($cos, ii.i * 32 + sb + 1)", q30)}) AS av,
       |    SUM(${smd(s"out1 * list_extract($cos, ii.i * 32 + sb + 1)", q30)}) AS bv2
       |  FROM o2, (SELECT unnest(generate_series(0, 63)) AS i) ii
       |  GROUP BY d, ii.i),
       |vagg AS (SELECT d, SUM(ABS(av) + ABS(bv2)) AS v_abs FROM mat GROUP BY d),
       |pcm AS (
       |  SELECT m1.d,
       |    ${smd(s"list_extract($wq, m1.i + 1) * m1.av", q30)} AS p1,
       |    ${smd(s"list_extract($wq, m1.i + 1) * m1.bv2", q30)} + ${smd(s"list_extract($wq, m1.i + 33) * m2.av", q30)} AS p2
       |  FROM mat m1 JOIN mat m2 ON m2.d = m1.d AND m2.i = m1.i + 32
       |  WHERE m1.i < 32),
       |synagg AS (SELECT d, SUM(ABS(p1) + ABS(p2)) AS syn_abs FROM pcm GROUP BY d)
       |SELECT a.d AS doc_id, 'audio/mpeg' AS mime, a.nf AS n_frames, a.br AS bitrate_kbps,
       |       CAST(32000 AS BIGINT) AS sample_rate,
       |       CAST(a.nf * 1152 AS BIGINT) AS n_samples,
       |       CAST(sde.v + sdf.v AS BIGINT) AS side_sum,
       |       CAST(scfagg.scf_sum AS BIGINT) AS scf_sum,
       |       CAST(COALESCE(huffagg.huff, 0) AS BIGINT) AS huff_abs_sum,
       |       CAST(COALESCE(deqagg.deq, 0) AS BIGINT) AS deq_abs_sum,
       |       CAST(COALESCE(aliasagg.alias0, 0) AS BIGINT) AS alias0_abs,
       |       CAST(COALESCE(imdagg.imdct0, 0) AS BIGINT) AS imdct0_abs,
       |       CAST(COALESCE(vagg.v_abs, 0) AS BIGINT) AS v_abs,
       |       CAST(COALESCE(synagg.syn_abs, 0) AS BIGINT) AS syn_abs
       |FROM a
       |JOIN sde ON sde.d = a.d
       |JOIN sdf ON sdf.d = a.d
       |JOIN scfagg ON scfagg.d = a.d
       |LEFT JOIN huffagg ON huffagg.d = a.d
       |LEFT JOIN deqagg ON deqagg.d = a.d
       |LEFT JOIN aliasagg ON aliasagg.d = a.d
       |LEFT JOIN imdagg ON imdagg.d = a.d
       |LEFT JOIN vagg ON vagg.d = a.d
       |LEFT JOIN synagg ON synagg.d = a.d
       |ORDER BY a.d""".stripMargin
  }
}
