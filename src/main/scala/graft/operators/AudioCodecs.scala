package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Real (if minimal) audio codec for the multimodal decode contract:
  * canonical RIFF/WAVE PCM16 — like [[ImageCodecs]], parseable with zero
  * external libraries, so the audio decode step of [[MultimodalOps]] runs
  * on ACTUAL sample bytes offline. The decoder sees only bytes: format,
  * channel count and sample rate come from walking the chunk list and
  * parsing the `fmt ` chunk, the sample statistics from the little-endian
  * int16 array in `data`.
  *
  * The fixture generator inserts a junk `LIST` chunk BETWEEN `fmt ` and
  * `data` (legal RIFF — readers must walk chunks, not assume `data` at
  * byte 44) filled with 0xCD — the audio analog of the BMP padding trap:
  * a decoder that slices samples at a fixed offset diverges from the
  * oracle.
  *
  * Fail-loud contract (same as [[ImageCodecs]]): bad magic, truncated
  * chunks, non-PCM16 variants throw — at 100 TB a silent zero-feature
  * row is corpus poison.
  */
object AudioCodecs {

  /** (sampleRate, channels, nSamples per channel, Σ|sample|, max |sample|). */
  final case class WavDecoded(
      sampleRate: Long, channels: Long, nSamples: Long, absSum: Long, peak: Long)

  def decodeWav(bytes: Array[Byte]): WavDecoded = {
    require(bytes.length >= 12, "truncated WAV: no RIFF header")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(tag(bytes, 0) == "RIFF", "not a WAV: bad RIFF magic")
    val riffSize = buf.getInt(4).toLong & 0xffffffffL
    require(riffSize == bytes.length - 8,
      s"RIFF size $riffSize != payload ${bytes.length - 8}")
    require(tag(bytes, 8) == "WAVE", "not a WAV: bad WAVE form type")

    var pos = 12
    var fmtSeen = false
    var channels = 0L
    var sampleRate = 0L
    var out: WavDecoded = null
    while (pos + 8 <= bytes.length && out == null) {
      val id = tag(bytes, pos)
      val size = buf.getInt(pos + 4).toLong & 0xffffffffL
      val body = pos + 8
      require(body + size <= bytes.length, s"truncated '$id' chunk")
      id match {
        case "fmt " =>
          require(size >= 16, "short fmt chunk")
          val audioFormat = buf.getShort(body) & 0xffff
          require(audioFormat == 1, s"unsupported WAV format $audioFormat (PCM only)")
          channels = (buf.getShort(body + 2) & 0xffff).toLong
          sampleRate = buf.getInt(body + 4).toLong & 0xffffffffL
          val bits = buf.getShort(body + 14) & 0xffff
          require(bits == 16, s"unsupported bit depth $bits (PCM16 only)")
          require(channels >= 1, "zero channels")
          fmtSeen = true
        case "data" =>
          require(fmtSeen, "data chunk before fmt")
          require(size % (2 * channels) == 0, "data size not sample-aligned")
          val n = size / (2 * channels)
          var absSum = 0L
          var peak = 0L
          var i = 0L
          while (i < size / 2) {
            val s = buf.getShort((body + 2 * i).toInt).toLong
            val a = math.abs(s)
            absSum += a
            if (a > peak) peak = a
            i += 1
          }
          out = WavDecoded(sampleRate, channels, n, absSum, peak)
        case _ => () // unknown chunk (LIST, fact, ...): skip
      }
      pos = body + size.toInt + (size.toInt & 1) // RIFF chunks word-align
    }
    require(out != null, "no data chunk")
    out
  }

  private def tag(bytes: Array[Byte], at: Int): String =
    new String(bytes, at, 4, US_ASCII)
}

/** Deterministic WAV fixtures (generator parameters never reach the
  * decoder). Sample i of document id is `((id·31 + i·7) % 8192) − 4096`
  * — SQL-replayable, so the DuckDB oracle re-derives the decoder's
  * statistics symbolically.
  */
object AudioFixtures {
  val WavMime = "audio/wav"
  val SampleRate = 8000

  def nSamples(id: Long): Int = (64 + id % 57).toInt

  def sample(id: Long, i: Long): Short = (((id * 31 + i * 7) % 8192) - 4096).toShort

  /** Mono PCM16 WAV: RIFF(12) + fmt(24) + junk LIST(16) + data(8 + 2n). */
  def wav(id: Long): Array[Byte] = {
    val n = nSamples(id)
    val out = ByteBuffer.allocate(60 + 2 * n).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(US_ASCII)).putInt(52 + 2 * n)
    out.put("WAVE".getBytes(US_ASCII))
    out.put("fmt ".getBytes(US_ASCII)).putInt(16)
    out.putShort(1) // PCM
    out.putShort(1) // mono
    out.putInt(SampleRate)
    out.putInt(SampleRate * 2) // byte rate
    out.putShort(2) // block align
    out.putShort(16) // bits
    out.put("LIST".getBytes(US_ASCII)).putInt(8)
    var j = 0
    while (j < 8) { out.put(0xCD.toByte); j += 1 } // the fixed-offset trap
    out.put("data".getBytes(US_ASCII)).putInt(2 * n)
    var i = 0
    while (i < n) { out.putShort(sample(id, i)); i += 1 }
    out.array()
  }
}
