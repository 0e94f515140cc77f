package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** IMA ADPCM (DVI4) WAV — the COMPRESSED audio member of the codec set
  * (PCM16 WAV is a container walk; ADPCM samples only exist through the
  * adaptive-delta state machine). Format tag 0x0011, the 4-bit codec of
  * the IMA Digital Audio Focus Group (the same tables RFC 3551's DVI4
  * payload uses), decoded with zero dependencies: RIFF chunk walk,
  * extended `fmt ` parse (cbSize + wSamplesPerBlock), `fact` total-count
  * validation, per-block headers (predictor int16 + step index + zero
  * reserved byte), low-nibble-first unpacking, and the exact integer
  * step/index adaptation with output clamping.
  *
  * Every operation is integer arithmetic on spec-fixed tables, so the
  * DuckDB oracle replays the ENTIRE decode as a recursive CTE over the
  * fixture's nibble formula — a hash match proves the state machine,
  * not just the container walk. Reference stores media URIs only; codec
  * semantics come from the public IMA/RFC specs.
  *
  * Fail-loud contract (as [[AudioCodecs]]/[[ImageCodecs]]): PCM fed to
  * the ADPCM decoder, stereo (out of the fixture's scope — rejected,
  * not mis-decoded), nonzero reserved bytes, out-of-range step indexes,
  * short blocks and fact-count mismatches all throw.
  */
object AdpcmCodecs {

  /** IMA step-size table (89 entries) — IMA ADPCM spec / RFC 3551 DVI4. */
  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Index-adaptation table, nibble -> step-index delta. */
  val IndexTable: Array[Int] = Array(
    -1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA adaptation step: (pred, idx, nibble) -> (pred', idx'). */
  def step(pred: Int, idx: Int, n: Int): (Int, Int) = {
    val s = StepTable(idx)
    var diff = s >> 3
    if ((n & 1) != 0) diff += s >> 2
    if ((n & 2) != 0) diff += s >> 1
    if ((n & 4) != 0) diff += s
    val p = if ((n & 8) != 0) pred - diff else pred + diff
    val clamped = math.max(-32768, math.min(32767, p))
    val i2 = math.max(0, math.min(88, idx + IndexTable(n)))
    (clamped, i2)
  }

  /** (sampleRate, nBlocks, nSamples, Σ|sample|, max |sample|). */
  final case class AdpcmDecoded(
      sampleRate: Long, nBlocks: Long, nSamples: Long, absSum: Long, peak: Long)

  def decodeAdpcmWav(bytes: Array[Byte]): AdpcmDecoded = {
    require(bytes.length >= 12, "truncated WAV: no RIFF header")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(tag(bytes, 0) == "RIFF", "not a WAV: bad RIFF magic")
    require(tag(bytes, 8) == "WAVE", "not a WAV: bad WAVE form type")

    var pos = 12
    var fmtSeen = false
    var sampleRate = 0L
    var blockAlign = 0
    var samplesPerBlock = 0
    var factSamples = -1L
    var out: AdpcmDecoded = null
    while (pos + 8 <= bytes.length && out == null) {
      val id = tag(bytes, pos)
      val size = buf.getInt(pos + 4).toLong & 0xffffffffL
      val body = pos + 8
      require(body + size <= bytes.length, s"truncated '$id' chunk")
      id match {
        case "fmt " =>
          require(size >= 16, "short fmt chunk")
          val audioFormat = buf.getShort(body) & 0xffff
          require(audioFormat == 0x11,
            f"unsupported WAV format 0x$audioFormat%04X (IMA ADPCM 0x0011 only)")
          require(size >= 20, "missing the ADPCM fmt extension fields")
          val channels = buf.getShort(body + 2) & 0xffff
          require(channels == 1,
            s"stereo IMA ADPCM is out of scope ($channels channels) — reject, not mis-decode")
          sampleRate = buf.getInt(body + 4).toLong & 0xffffffffL
          require((buf.getShort(body + 14) & 0xffff) == 4, "IMA ADPCM is 4 bits/sample")
          blockAlign = buf.getShort(body + 12) & 0xffff
          val cbSize = buf.getShort(body + 16) & 0xffff
          require(cbSize >= 2, "missing wSamplesPerBlock extension")
          samplesPerBlock = buf.getShort(body + 18) & 0xffff
          require(samplesPerBlock == (blockAlign - 4) * 2 + 1,
            s"wSamplesPerBlock $samplesPerBlock inconsistent with blockAlign $blockAlign")
          fmtSeen = true
        case "fact" =>
          require(size >= 4, "short fact chunk")
          factSamples = buf.getInt(body).toLong & 0xffffffffL
        case "data" =>
          require(fmtSeen, "data chunk before fmt")
          require(size % blockAlign == 0,
            s"data size $size is not whole ${blockAlign}-byte blocks")
          val nBlocks = (size / blockAlign).toInt
          var absSum = 0L
          var peak = 0L
          var b = 0
          while (b < nBlocks) {
            val base = body + b * blockAlign
            var pred: Int = buf.getShort(base).toInt
            var idx: Int = bytes(base + 2) & 0xff
            require(idx <= 88, s"block $b step index $idx out of range")
            require(bytes(base + 3) == 0, s"block $b nonzero reserved header byte")
            // The header predictor IS output sample 0 of the block.
            absSum += math.abs(pred); peak = math.max(peak, math.abs(pred).toLong)
            var j = 0
            val nNibbles = (blockAlign - 4) * 2
            while (j < nNibbles) {
              val byte = bytes(base + 4 + (j >> 1)) & 0xff
              val n = if ((j & 1) == 0) byte & 0x0f else byte >> 4 // low nibble first
              val (p2, i2) = step(pred, idx, n)
              pred = p2; idx = i2
              absSum += math.abs(pred); peak = math.max(peak, math.abs(pred).toLong)
              j += 1
            }
            b += 1
          }
          val nSamples = nBlocks.toLong * samplesPerBlock
          require(factSamples < 0 || factSamples == nSamples,
            s"fact count $factSamples != decoded $nSamples")
          out = AdpcmDecoded(sampleRate, nBlocks.toLong, nSamples, absSum, peak)
        case _ => () // LIST and friends: skip
      }
      pos = body + size.toInt + (size.toInt & 1)
    }
    require(out != null, "no data chunk")
    out
  }

  private def tag(bytes: Array[Byte], at: Int): String =
    new String(bytes, at, 4, US_ASCII)
}

/** Deterministic IMA-ADPCM fixtures: the generator authors the NIBBLE
  * STREAM and per-block header state by doc_id formulas (never through
  * an encoder's search), so the oracle can replay the adaptation state
  * machine from the same formulas. The container is a real extended-fmt
  * WAV with `fact` and the junk-LIST trap from [[AudioFixtures]].
  */
object AdpcmFixtures {
  val AdpcmMime = "audio/adpcm"
  val SampleRate = 8000
  /** 36-byte blocks: 4-byte header + 32 data bytes = 64 nibbles, so 65
    * samples per block ((blockAlign-4)*2 + 1).
    */
  val BlockAlign = 36
  val SamplesPerBlock = (BlockAlign - 4) * 2 + 1

  def nBlocks(id: Long): Int = (id % 4 + 2).toInt
  /** Block b's header sample (output sample 0 of the block). */
  def blockPred(id: Long, b: Long): Int = (((id * 31 + b * 97) % 8192) - 4096).toInt
  /** Block b's initial step index (0..88). */
  def blockIdx(id: Long, b: Long): Int = ((id * 7 + b * 13) % 89).toInt
  /** Nibble j (0-based) of block b. */
  def nibble(id: Long, b: Long, j: Long): Int = ((id * 31 + b * 5 + j * 11) % 16).toInt

  def adpcm(id: Long): Array[Byte] = {
    val blocks = nBlocks(id)
    val dataSize = blocks * BlockAlign
    val out = ByteBuffer.allocate(12 + 28 + 12 + 16 + 8 + dataSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(US_ASCII)).putInt(4 + 28 + 12 + 16 + 8 + dataSize)
    out.put("WAVE".getBytes(US_ASCII))
    out.put("fmt ".getBytes(US_ASCII)).putInt(20)
    out.putShort(0x11) // IMA ADPCM
    out.putShort(1) // mono
    out.putInt(SampleRate)
    out.putInt(SampleRate * BlockAlign / SamplesPerBlock) // nominal byte rate
    out.putShort(BlockAlign.toShort)
    out.putShort(4) // bits per sample
    out.putShort(2) // cbSize
    out.putShort(SamplesPerBlock.toShort)
    out.put("fact".getBytes(US_ASCII)).putInt(4)
    out.putInt(blocks * SamplesPerBlock)
    out.put("LIST".getBytes(US_ASCII)).putInt(8)
    var t = 0
    while (t < 8) { out.put(0xCD.toByte); t += 1 } // fixed-offset trap
    out.put("data".getBytes(US_ASCII)).putInt(dataSize)
    var b = 0
    while (b < blocks) {
      out.putShort(blockPred(id, b).toShort)
      out.put(blockIdx(id, b).toByte)
      out.put(0.toByte)
      var j = 0
      while (j < (BlockAlign - 4) * 2) {
        val lo = nibble(id, b, j)
        val hi = nibble(id, b, j + 1)
        out.put(((hi << 4) | lo).toByte)
        j += 2
      }
      b += 1
    }
    out.array()
  }
}
