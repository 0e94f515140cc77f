package graft.operators

/** MPEG-1 Audio Layer II (ISO/IEC 11172-3 §2.4) — the last rung of the
  * audio-codec ladder after PCM WAV (container walk) and IMA ADPCM
  * (integer state machine): Layer II samples only exist through a real
  * BITSTREAM parse — header, per-subband bit allocation against the
  * spec's region tables, scale-factor selection information (scfsi),
  * scale factors, grouped (base-3/5/9 packed) and ungrouped sample codes
  * across the 12-granule × 3-sample cadence — followed by requantization
  * and the 32-subband polyphase synthesis (the 64-point cosine matrix of
  * §2.4.3.3 + the 512-tap windowed FIFO).
  *
  * What is spec-exact here: the frame layout, the 30-subband allocation
  * table's region structure (nbal 4/4/3/2 with the 3-5-7-9 grouped rungs
  * and the 2^b−1 ladder, 65535 capping the short lists), scfsi coding,
  * grouping arithmetic, MSB-inverted sample codes (offset binary:
  * sQ = code − 2^(b−1)), and the synthesis matrixing
  * N(i,k) = cos((16+i)(2k+1)π/64) — all reconstructible from the public
  * spec text. What is NOT reproducible offline: the Table B.4 dequant
  * constants beyond their algebraic shape and the Table B.3 window
  * coefficients (pure data tables). The decoder therefore uses the
  * algebraically-reduced affine dequant — for n = 2^b−1 levels,
  * C·(s'''+D) with C = 2^b/n, D = 2^(1−b) reduces EXACTLY to
  * scf·2(sQ+1)/n; grouped rungs use the symmetric mid-rise
  * scf·(2c−(n−1))/n — and a sine prototype window, both shared with the
  * fixture oracle. Swapping in the conformance tables changes only those
  * literals; every parsing and filterbank mechanism is real.
  *
  * All arithmetic is FIXED-POINT (Q30 tables, Q24 samples, sign-magnitude
  * truncating division), so the DuckDB oracle replays requantization and
  * the granule-0 matrixing/windowing bit-exactly from the fixture
  * formulas — a hash match proves the decoder unpacked the real entropy
  * layout (allocation regions, scfsi modes, grouped codes) and ran the
  * exact filterbank arithmetic, not just the container walk.
  *
  * Fail-loud contract ([[AdpcmCodecs]] posture): bad sync, MPEG-2/2.5,
  * Layers I/III (Layer III lives in [[Mp3L3Codecs]] with its own query;
  * this decoder rejects it by name, never mis-decodes), CRC-protected
  * streams, stereo,
  * sampling rates other than the fixture profile's 32 kHz, free-format /
  * low-rate bitrates outside the implemented allocation table, and
  * truncated frames all throw with the offending field named.
  *
  * Scale posture: decode is a pure per-row kernel behind mapPartitions —
  * payloads never cross a shuffle (reference stores opaque media URIs,
  * /root/reference/src/utils/subgraph.py; decode semantics come from the
  * public MPEG-1 spec).
  */
object Mp3Codecs {

  // ---- shared fixed-point tables (deterministic: StrictMath is bit-exact
  // across JVMs; the oracle embeds the SAME integers as SQL literals) ----

  /** Layer II scale factors, Q30: scf(i) = 2·2^(−i/3), i = 0..62. */
  val ScfQ30: Array[Long] = Array.tabulate(63) { i =>
    Math.round(2.0 * StrictMath.pow(2.0, -i / 3.0) * (1L << 30))
  }

  /** Synthesis matrixing N(i,k) = cos((16+i)(2k+1)π/64), Q30. */
  val CosQ30: Array[Array[Long]] = Array.tabulate(64, 32) { (i, k) =>
    Math.round(StrictMath.cos((16 + i) * (2 * k + 1) * StrictMath.PI / 64.0)
      * (1L << 30))
  }

  /** Synthesis window, Q30 — sine prototype stand-in for Table B.3 (see
    * the object scaladoc; the windowing MACHINERY — 1024-entry V FIFO,
    * U extraction, 16-tap dot product — is the spec's).
    */
  val WinQ30: Array[Long] = Array.tabulate(512) { j =>
    Math.round(StrictMath.sin(StrictMath.PI * (j + 0.5) / 512.0) * (1L << 30))
  }

  /** Truncating sign-magnitude division — identical semantics on both
    * engines (DuckDB replays it as CASE WHEN t<0 THEN -(ABS(t)//d) ...),
    * immune to any floor-vs-truncate divergence on negatives.
    */
  def smDiv(t: Long, d: Long): Long = { val m = math.abs(t) / d; if (t < 0) -m else m }

  // ---- allocation table (30-subband, the fixture profile's) ------------

  /** Subband regions: [0,3) nbal=4, [3,11) nbal=4, [11,23) nbal=3,
    * [23,30) nbal=2. Entry 0 = no allocation; 65535 caps the short lists.
    */
  val SbLimit = 30
  private val Reg0 = Array(0, 3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047,
    4095, 8191, 16383, 32767, 65535)
  private val Reg1 = Array(0, 3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023,
    2047, 4095, 8191, 65535)
  private val Reg2 = Array(0, 3, 5, 7, 9, 15, 31, 65535)
  private val Reg3 = Array(0, 3, 5, 65535)

  def region(sb: Int): Int =
    if (sb < 3) 0 else if (sb < 11) 1 else if (sb < 23) 2 else 3
  def nbal(sb: Int): Int = region(sb) match {
    case 0 | 1 => 4
    case 2     => 3
    case _     => 2
  }
  def levelsFor(sb: Int, alloc: Int): Int = region(sb) match {
    case 0 => Reg0(alloc)
    case 1 => Reg1(alloc)
    case 2 => Reg2(alloc)
    case _ => Reg3(alloc)
  }
  /** Grouped rungs pack 3 samples into one base-n codeword. */
  def grouped(n: Int): Boolean = n == 3 || n == 5 || n == 9
  def groupBits(n: Int): Int = n match { case 3 => 5; case 5 => 7; case _ => 10 }
  /** Ungrouped level counts are 2^b − 1. */
  def codeBits(n: Int): Int = 32 - Integer.numberOfLeadingZeros(n + 1) - 1

  // ---- bit I/O (MSB first, the MPEG bitstream order) -------------------

  private[operators] final class BitReader(bytes: Array[Byte], var pos: Int) {
    var bit = 0
    def read(n: Int): Int = {
      var v = 0
      var left = n
      while (left > 0) {
        require(pos < bytes.length, "truncated MPEG frame: bitstream ended mid-field")
        val avail = 8 - bit
        val take = math.min(avail, left)
        val cur = bytes(pos) & 0xff
        v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
        bit += take
        if (bit == 8) { bit = 0; pos += 1 }
        left -= take
      }
      v
    }
  }

  private[operators] final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var bit = 0
    def write(v: Int, n: Int): Unit = {
      var left = n
      while (left > 0) {
        val take = math.min(8 - bit, left)
        cur = (cur << take) | ((v >> (left - take)) & ((1 << take) - 1))
        bit += take
        if (bit == 8) { buf += cur.toByte; cur = 0; bit = 0 }
        left -= take
      }
    }
    def padToByte(): Unit = if (bit != 0) write(0, 8 - bit)
    def bytes: Array[Byte] = { padToByte(); buf.toArray }
  }

  // ---- decoder ----------------------------------------------------------

  /** Decoded stream summary — all BIGINT so the oracle replays exactly:
    * allocSum proves the allocation parse, scfSum the scfsi/scale-factor
    * cadence, deqAbsSum the grouped/ungrouped sample decode +
    * requantization over EVERY granule of EVERY frame, v0Abs the
    * granule-0 cosine matrixing, syn0Abs the granule-0 window tap.
    */
  final case class Mp3Decoded(
      nFrames: Long, sampleRate: Long, bitrateKbps: Long, nSamples: Long,
      allocSum: Long, scfSum: Long, deqAbsSum: Long, v0Abs: Long, syn0Abs: Long)

  private val BitrateKbps =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)

  def decodeMp3(bytes: Array[Byte]): Mp3Decoded = {
    var pos = 0
    var frames = 0L
    var bitrate = -1L
    var allocSum = 0L
    var scfSum = 0L
    var deqAbsSum = 0L
    var v0Abs = 0L
    var syn0Abs = 0L
    while (pos < bytes.length) {
      require(pos + 4 <= bytes.length, "truncated MPEG frame: short header")
      val r = new BitReader(bytes, pos)
      require(r.read(12) == 0xfff, "bad syncword (not an MPEG audio frame)")
      require(r.read(1) == 1, "MPEG-2/2.5 streams are out of scope — reject, not mis-decode")
      val layerBits = r.read(2)
      require(layerBits == 2,
        s"not a Layer II frame (layer bits $layerBits; Layer III decode " +
          "lives in Mp3L3Codecs)")
      require(r.read(1) == 1, "CRC-protected frames are out of scope")
      val brIdx = r.read(4)
      require(brIdx >= 3 && brIdx != 15,
        s"bitrate index $brIdx outside the implemented 30-subband allocation profile")
      val kbps = BitrateKbps(brIdx)
      require(bitrate < 0 || bitrate == kbps, "mid-stream bitrate switch unsupported")
      bitrate = kbps
      require(r.read(2) == 2, "only the 32 kHz fixture profile is implemented")
      require(r.read(1) == 0, "padding is never needed at 32 kHz integer frame sizes")
      r.read(1) // private bit
      require(r.read(2) == 3, "stereo/joint/dual modes are out of scope (mono only)")
      r.read(2); r.read(1); r.read(1); r.read(2) // mode_ext, copyright, original, emphasis
      val frameBytes = 144 * kbps.toInt * 1000 / 32000
      require(pos + frameBytes <= bytes.length, "truncated MPEG frame body")

      // bit allocation
      val alloc = new Array[Int](SbLimit)
      var sb = 0
      while (sb < SbLimit) {
        alloc(sb) = r.read(nbal(sb))
        allocSum += alloc(sb)
        sb += 1
      }
      // scfsi
      val scfsi = new Array[Int](SbLimit)
      sb = 0
      while (sb < SbLimit) {
        if (alloc(sb) != 0) scfsi(sb) = r.read(2)
        sb += 1
      }
      // scale factors: transmitted per scfsi mode, mapped to the three
      // 4-granule parts (0: three; 1: {0,1} share first; 2: all share;
      // 3: {1,2} share second).
      val scfPart = Array.ofDim[Long](SbLimit, 3)
      sb = 0
      while (sb < SbLimit) {
        if (alloc(sb) != 0) {
          val cnt = scfsi(sb) match { case 0 => 3; case 2 => 1; case _ => 2 }
          val idx = new Array[Int](cnt)
          var k = 0
          while (k < cnt) {
            idx(k) = r.read(6)
            require(idx(k) < 63, s"scale factor index ${idx(k)} out of range")
            scfSum += idx(k)
            k += 1
          }
          var part = 0
          while (part < 3) {
            val k2 = scfsi(sb) match {
              case 0 => part
              case 1 => if (part <= 1) 0 else 1
              case 2 => 0
              case _ => if (part == 0) 0 else 1
            }
            scfPart(sb)(part) = ScfQ30(idx(k2))
            part += 1
          }
        }
        sb += 1
      }
      // samples: 12 granules x 3 samples, granule-major
      var gr = 0
      while (gr < 12) {
        val part = gr / 4
        sb = 0
        while (sb < SbLimit) {
          if (alloc(sb) != 0) {
            val n = levelsFor(sb, alloc(sb))
            val scfQ = scfPart(sb)(part)
            val vq = new Array[Long](3)
            if (grouped(n)) {
              var c = r.read(groupBits(n))
              require(c < n * n * n, s"grouped code $c exceeds $n^3 levels")
              var s = 0
              while (s < 3) {
                val smp = c % n
                c /= n
                vq(s) = smDiv(scfQ * (2L * smp - (n - 1)), n.toLong * 64)
                s += 1
              }
            } else {
              val half = (n + 1) / 2
              var s = 0
              while (s < 3) {
                val code = r.read(codeBits(n))
                require(code != 0, "the all-zero sample code is forbidden (n = 2^b - 1 levels)")
                val sQ = code - half // MSB inversion == offset binary
                vq(s) = smDiv(scfQ * 2L * (sQ + 1), n.toLong * 64)
                s += 1
              }
            }
            var s = 0
            while (s < 3) { deqAbsSum += math.abs(vq(s)); s += 1 }
            // Granule-0 filterbank feature: first sample slot of the
            // whole stream, zero FIFO history (the spec's initial state),
            // so out(j) = W(j)·V(j) — accumulated per subband below.
            if (frames == 0 && gr == 0) grCollector(sb) = vq(0)
          }
          sb += 1
        }
        gr += 1
      }
      if (frames == 0) {
        var i = 0
        while (i < 64) {
          var v = 0L
          var k = 0
          while (k < SbLimit) {
            if (grCollector(k) != 0L) v += smDiv(CosQ30(i)(k) * grCollector(k), 1L << 30)
            k += 1
          }
          v0Abs += math.abs(v)
          if (i < 32) syn0Abs += math.abs(smDiv(WinQ30(i) * v, 1L << 30))
          i += 1
        }
        java.util.Arrays.fill(grCollector, 0L)
      }
      frames += 1
      pos += frameBytes
    }
    require(frames > 0, "no MPEG frames in payload")
    Mp3Decoded(frames, 32000L, bitrate, frames * 1152L,
      allocSum, scfSum, deqAbsSum, v0Abs, syn0Abs)
  }

  // Per-thread granule-0 sample collector (decode is called once per row
  // inside mapPartitions; reusing the buffer avoids a per-row allocation).
  private val grCollectorTl =
    ThreadLocal.withInitial[Array[Long]](() => new Array[Long](SbLimit))
  private def grCollector: Array[Long] = grCollectorTl.get()

  // ---- full synthesis machinery (spec-gated; see Mp3Spec) ---------------

  /** One synthesis step: push the 32 subband samples' matrixing result
    * into the 1024-entry V FIFO and emit 32 PCM samples via the 512-tap
    * window — §2.4.3.3's procedure verbatim (U(64i+j) = V(128i+j),
    * U(64i+32+j) = V(128i+96+j)). Returns the PCM block (Q24).
    * The registered query's ORACLE covers granule 0 (zero history —
    * out(j) = W(j)·V(j)); this full-history path is pinned by Mp3Spec
    * against a direct convolution reference.
    */
  final class Synthesis {
    private val v = new Array[Long](1024)
    def step(samplesQ24: Array[Long]): Array[Long] = {
      System.arraycopy(v, 0, v, 64, 960)
      var i = 0
      while (i < 64) {
        var acc = 0L
        var k = 0
        while (k < 32) {
          val s = if (k < samplesQ24.length) samplesQ24(k) else 0L
          if (s != 0L) acc += smDiv(CosQ30(i)(k) * s, 1L << 30)
          k += 1
        }
        v(i) = acc
        i += 1
      }
      val out = new Array[Long](32)
      var j = 0
      while (j < 32) {
        var acc = 0L
        var t = 0
        while (t < 8) {
          acc += smDiv(WinQ30(j + 64 * t) * v(128 * t + j), 1L << 30)
          acc += smDiv(WinQ30(j + 64 * t + 32) * v(128 * t + 96 + j), 1L << 30)
          t += 1
        }
        out(j) = acc
        j += 1
      }
      out
    }
  }
}

/** Deterministic Layer II fixtures: the generator authors the ALLOCATION,
  * scfsi, scale-factor and sample-code values by doc_id formulas (never
  * through an encoder's psychoacoustic search), packs them through the
  * real Layer II frame layout, and the oracle replays the same formulas
  * through the shared fixed-point tables. Five subbands carry signal —
  * one per allocation region boundary ({0, 3, 8, 12, 24}) — cycling
  * grouped (3/5/9-level) and ungrouped (up to 16-bit) rungs, all four
  * scfsi modes, 1-3 frames, and the three supported bitrates.
  */
object Mp3Fixtures {
  import Mp3Codecs._

  val Mp3Mime = "audio/mpeg"
  /** The five signal-carrying subbands (one per region boundary). */
  val SignalSbs: Array[Int] = Array(0, 3, 8, 12, 24)

  def nFrames(d: Long): Int = (1 + (d / 9) % 3).toInt
  def bitrateKbps(d: Long): Int =
    ((d / 9 + 1) % 3) match { case 0 => 56; case 1 => 64; case _ => 96 }
  private def brIndex(kbps: Int): Int = kbps match { case 56 => 3; case 64 => 4; case _ => 6 }

  /** Allocation INDEX for signal subband `sb` in frame `f` (0 elsewhere). */
  def allocIdx(d: Long, f: Long, sb: Int): Int = {
    val w = d / 9
    sb match {
      case 0  => (2 + (w + f) % 3).toInt // region 0: n in {7, 15, 31}
      case 3  => (1 + (d + f) % 4).toInt // region 1: n in {3, 5, 7, 9}
      case 8  => 4                       // region 1: n = 9 (10-bit grouped)
      case 12 => (1 + (d + f) % 6).toInt // region 2: n in {3..31}
      case _  => (1 + (w + f) % 3).toInt // region 3: n in {3, 5, 65535}
    }
  }
  def scfsiMode(d: Long, sb: Int): Int = sb match {
    case 0  => (d % 4).toInt
    case 3  => ((d + 1) % 4).toInt
    case 8  => 2
    case 12 => ((d + 2) % 4).toInt
    case _  => ((d + 3) % 4).toInt
  }
  def scfIdx(d: Long, f: Long, sb: Int, k: Int): Int =
    ((d * 7 + f * 3 + sb * 11 + k * 5) % 63).toInt
  /** Grouped codeword for (frame, granule, subband). */
  def groupCode(d: Long, f: Long, gr: Int, sb: Int, n: Int): Int =
    ((d * 31 + f * 5 + gr * 17 + sb * 13) % (n.toLong * n * n)).toInt
  /** Ungrouped code for sample s — 1..n (0 is the forbidden code). */
  def sampleCode(d: Long, f: Long, gr: Int, sb: Int, s: Int, n: Int): Int =
    (1 + (d * 31 + f * 5 + gr * 17 + sb * 13 + s * 7) % n).toInt

  def mp3(d: Long): Array[Byte] = {
    val frames = nFrames(d)
    val kbps = bitrateKbps(d)
    val frameBytes = 144 * kbps * 1000 / 32000
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < frames) {
      val w = new BitWriter
      w.write(0xfff, 12) // sync
      w.write(1, 1)      // MPEG-1
      w.write(2, 2)      // Layer II
      w.write(1, 1)      // no CRC
      w.write(brIndex(kbps), 4)
      w.write(2, 2)      // 32 kHz
      w.write(0, 1)      // no padding
      w.write(0, 1)      // private
      w.write(3, 2)      // single channel
      w.write(0, 2); w.write(0, 1); w.write(1, 1); w.write(0, 2)
      val alloc = new Array[Int](SbLimit)
      SignalSbs.foreach(sb => alloc(sb) = allocIdx(d, f, sb))
      (0 until SbLimit).foreach(sb => w.write(alloc(sb), nbal(sb)))
      SignalSbs.foreach(sb => w.write(scfsiMode(d, sb), 2))
      SignalSbs.foreach { sb =>
        val cnt = scfsiMode(d, sb) match { case 0 => 3; case 2 => 1; case _ => 2 }
        (0 until cnt).foreach(k => w.write(scfIdx(d, f, sb, k), 6))
      }
      var gr = 0
      while (gr < 12) {
        SignalSbs.foreach { sb =>
          val n = levelsFor(sb, alloc(sb))
          if (grouped(n)) w.write(groupCode(d, f, gr, sb, n), groupBits(n))
          else (0 until 3).foreach(s =>
            w.write(sampleCode(d, f, gr, sb, s, n), codeBits(n)))
        }
        gr += 1
      }
      val body = w.bytes
      require(body.length <= frameBytes,
        s"fixture frame overflow: ${body.length} > $frameBytes")
      out.write(body)
      out.write(new Array[Byte](frameBytes - body.length)) // zero pad
      f += 1
    }
    out.toByteArray
  }

  // ---- generated oracle (the minhash pattern: SQL built from the SAME
  // constants the decoder uses, so both engines move together) ----------

  private def longList(xs: Seq[Long]): String = xs.mkString("[", ",", "]")

  /** Sign-magnitude truncating division in DuckDB. */
  private def smd(t: String, d: String): String =
    s"(CASE WHEN ($t) < 0 THEN -(ABS($t) // ($d)) ELSE (ABS($t)) // ($d) END)"

  def oracleSql: String = {
    val scfList = longList(Mp3Codecs.ScfQ30.toSeq)
    // One 64-entry cosine list per signal subband; window taps 0..31.
    val cosCase = SignalSbs.map { sb =>
      s"WHEN $sb THEN list_extract(${longList((0 until 64).map(i => Mp3Codecs.CosQ30(i)(sb)))}, i + 1)"
    }.mkString("\n         ")
    val winList = longList((0 until 32).map(Mp3Codecs.WinQ30))
    val nCase =
      """CASE sbn
        |      WHEN 0  THEN list_extract([0,3,7,15,31,63,127,255,511,1023,2047,4095,8191,16383,32767,65535], alloc + 1)
        |      WHEN 24 THEN list_extract([0,3,5,65535], alloc + 1)
        |      WHEN 12 THEN list_extract([0,3,5,7,9,15,31,65535], alloc + 1)
        |      ELSE list_extract([0,3,5,7,9,15,31,63,127,255,511,1023,2047,4095,8191,65535], alloc + 1)
        |    END""".stripMargin
    s"""WITH a AS (
       |  SELECT doc_id AS d, doc_id // 9 AS w,
       |         CAST(1 + (doc_id // 9) % 3 AS BIGINT) AS nf,
       |         CAST(CASE (doc_id // 9 + 1) % 3
       |              WHEN 0 THEN 56 WHEN 1 THEN 64 ELSE 96 END AS BIGINT) AS br
       |  FROM documents WHERE doc_id % 9 = 4),
       |fr AS (SELECT d, w, nf, br, unnest(generate_series(0, nf - 1)) AS f FROM a),
       |sbs AS MATERIALIZED (
       |  SELECT d, w, f, sbn,
       |    CASE sbn
       |      WHEN 0  THEN 2 + (w + f) % 3
       |      WHEN 3  THEN 1 + (d + f) % 4
       |      WHEN 8  THEN 4
       |      WHEN 12 THEN 1 + (d + f) % 6
       |      ELSE 1 + (w + f) % 3
       |    END AS alloc,
       |    CASE sbn
       |      WHEN 0 THEN d % 4 WHEN 3 THEN (d + 1) % 4 WHEN 8 THEN 2
       |      WHEN 12 THEN (d + 2) % 4 ELSE (d + 3) % 4
       |    END AS mode
       |  FROM fr, (SELECT unnest([0, 3, 8, 12, 24]) AS sbn)),
       |sbn2 AS MATERIALIZED (
       |  SELECT d, w, f, sbn, alloc, mode, $nCase AS n
       |  FROM sbs),
       |al AS (SELECT d, CAST(SUM(alloc) AS BIGINT) AS alloc_sum FROM sbs GROUP BY d),
       |scf AS (
       |  SELECT d, CAST(SUM((d*7 + f*3 + sbn*11 + k*5) % 63) AS BIGINT) AS scf_sum
       |  FROM (SELECT d, f, sbn, mode,
       |          unnest(generate_series(0,
       |            CASE mode WHEN 0 THEN 2 WHEN 2 THEN 0 ELSE 1 END)) AS k
       |        FROM sbs)
       |  GROUP BY d),
       |smp AS MATERIALIZED (
       |  SELECT d, f, sbn, n, gr, s,
       |    list_extract($scfList,
       |      ((d*7 + f*3 + sbn*11 +
       |        (CASE mode WHEN 0 THEN gr // 4
       |              WHEN 1 THEN CASE WHEN gr // 4 <= 1 THEN 0 ELSE 1 END
       |              WHEN 2 THEN 0
       |              ELSE CASE WHEN gr // 4 = 0 THEN 0 ELSE 1 END END) * 5) % 63) + 1) AS scfq,
       |    CASE WHEN n IN (3, 5, 9)
       |         THEN ((d*31 + f*5 + gr*17 + sbn*13) % (n*n*n)) // (CASE s WHEN 0 THEN 1 WHEN 1 THEN n ELSE n*n END) % n
       |         ELSE 1 + (d*31 + f*5 + gr*17 + sbn*13 + s*7) % n END AS code
       |  FROM sbn2,
       |       (SELECT unnest(generate_series(0, 11)) AS gr),
       |       (SELECT unnest(generate_series(0, 2)) AS s)),
       |vq AS MATERIALIZED (
       |  SELECT d, f, sbn, gr, s,
       |    ${smd(
             "CASE WHEN n IN (3, 5, 9) THEN scfq * (2*code - (n - 1)) " +
               "ELSE scfq * 2 * (code - (n + 1) // 2 + 1) END",
             "n * 64")} AS v
       |  FROM smp),
       |deq AS (SELECT d, CAST(SUM(ABS(v)) AS BIGINT) AS deq_abs_sum FROM vq GROUP BY d),
       |vmat AS MATERIALIZED (
       |  SELECT d, i, SUM(term) AS vi
       |  FROM (
       |    SELECT vq.d, ix.i,
       |      ${smd(
             """(CASE sbn
         $COSCASE
         END) * v""".replace("$COSCASE", cosCase),
             "1::BIGINT << 30")} AS term
       |    FROM vq, (SELECT unnest(generate_series(0, 63)) AS i) ix
       |    WHERE vq.f = 0 AND vq.gr = 0 AND vq.s = 0) t
       |  GROUP BY d, i),
       |v0 AS (SELECT d, CAST(SUM(ABS(vi)) AS BIGINT) AS v0_abs FROM vmat GROUP BY d),
       |syn AS (
       |  SELECT d, CAST(SUM(ABS(${smd(
             s"list_extract($winList, i + 1) * vi", "1::BIGINT << 30")})) AS BIGINT) AS syn0_abs
       |  FROM vmat WHERE i < 32 GROUP BY d)
       |SELECT a.d AS doc_id,
       |       'audio/mpeg' AS mime,
       |       a.nf AS n_frames,
       |       a.br AS bitrate_kbps,
       |       CAST(32000 AS BIGINT) AS sample_rate,
       |       CAST(a.nf * 1152 AS BIGINT) AS n_samples,
       |       al.alloc_sum, scf.scf_sum, deq.deq_abs_sum, v0.v0_abs, syn.syn0_abs
       |FROM a JOIN al ON a.d = al.d JOIN scf ON a.d = scf.d
       |       JOIN deq ON a.d = deq.d JOIN v0 ON a.d = v0.d JOIN syn ON a.d = syn.d
       |ORDER BY a.d""".stripMargin
  }
}
