package graft.operators

/** IMA-ADPCM contract: the decoder recovers the exact adaptation-state
  * expectation from real extended-fmt WAV blocks, the clamps behave per
  * spec at the table edges, cross-format streams reject rather than
  * mis-decode, and nibble corruption never passes silently.
  */
class AdpcmSpec extends org.scalatest.funsuite.AnyFunSuite {

  import AdpcmFixtures._

  /** Direct state-machine replay from the fixture formulas (the oracle
    * replays the same thing in SQL — this pins the container round-trip).
    */
  private def expected(id: Long): (Long, Long, Long, Long) = {
    var absSum = 0L; var peak = 0L
    val blocks = nBlocks(id)
    for (b <- 0 until blocks) {
      var pred = blockPred(id, b)
      var idx = blockIdx(id, b)
      absSum += math.abs(pred); peak = math.max(peak, math.abs(pred).toLong)
      for (j <- 0 until (BlockAlign - 4) * 2) {
        val (p2, i2) = AdpcmCodecs.step(pred, idx, nibble(id, b, j))
        pred = p2; idx = i2
        absSum += math.abs(pred); peak = math.max(peak, math.abs(pred).toLong)
      }
    }
    (blocks.toLong, blocks.toLong * SamplesPerBlock, absSum, peak)
  }

  private val ids = Seq(2L, 9L, 16L, 23L, 30L, 37L, 44L, 100L, 233L, 1002L)

  test("decode recovers the exact adaptation state from the block stream") {
    for (id <- ids) {
      val d = AdpcmCodecs.decodeAdpcmWav(adpcm(id))
      val (nb, ns, s, p) = expected(id)
      assert((d.sampleRate, d.nBlocks, d.nSamples) == ((8000L, nb, ns)), s"id=$id header")
      assert(d.absSum == s, s"id=$id abs_sum")
      assert(d.peak == p, s"id=$id peak")
    }
  }

  test("step clamps at the table edges per spec") {
    // Output clamp: from the max step, a full-magnitude nibble cannot
    // escape int16 range in either direction.
    assert(AdpcmCodecs.step(32767, 88, 7)._1 == 32767)
    assert(AdpcmCodecs.step(-32768, 88, 15)._1 == -32768)
    // Index clamp: decrement at 0 stays 0, increment at 88 stays 88.
    assert(AdpcmCodecs.step(0, 0, 0)._2 == 0)
    assert(AdpcmCodecs.step(0, 88, 7)._2 == 88)
    // And the adaptation direction: large nibbles raise the index.
    assert(AdpcmCodecs.step(0, 40, 7)._2 == 48)
    assert(AdpcmCodecs.step(0, 40, 0)._2 == 39)
  }

  test("cross-format streams reject rather than mis-decode") {
    // PCM16 WAV into the ADPCM decoder: format tag 0x0001 is named.
    val e1 = intercept[IllegalArgumentException](
      AdpcmCodecs.decodeAdpcmWav(AudioFixtures.wav(1L)))
    assert(e1.getMessage.contains("0x0001"))
    // ADPCM WAV into the PCM decoder: rejected there too.
    intercept[IllegalArgumentException](AudioCodecs.decodeWav(adpcm(2L)))
  }

  test("malformed blocks reject fail-loud") {
    val good = adpcm(9L)
    // Nonzero reserved header byte of block 0. data chunk starts after
    // RIFF(12) + fmt(28) + fact(12) + LIST(16) + data hdr(8) = 76.
    val dataAt = 76
    assert(new String(good, 68, 4, "US-ASCII") == "data", "fixture layout moved")
    val badReserved = good.clone()
    badReserved(dataAt + 3) = 1.toByte
    val e = intercept[IllegalArgumentException](AdpcmCodecs.decodeAdpcmWav(badReserved))
    assert(e.getMessage.contains("reserved"))
    // Step index out of range (89).
    val badIdx = good.clone()
    badIdx(dataAt + 2) = 89.toByte
    intercept[IllegalArgumentException](AdpcmCodecs.decodeAdpcmWav(badIdx))
    // fact count mismatch. fact value sits after RIFF(12)+fmt(28)+"fact"+size = 48.
    assert(new String(good, 40, 4, "US-ASCII") == "fact", "fixture layout moved")
    val badFact = good.clone()
    badFact(48) = (badFact(48) + 1).toByte
    val e2 = intercept[IllegalArgumentException](AdpcmCodecs.decodeAdpcmWav(badFact))
    assert(e2.getMessage.contains("fact"))
    // Truncated mid-block.
    intercept[Exception](AdpcmCodecs.decodeAdpcmWav(good.take(good.length - 5)))
  }

  test("a corrupted nibble never passes silently") {
    for (id <- Seq(2L, 16L)) {
      val good = adpcm(id)
      val want = AdpcmCodecs.decodeAdpcmWav(good).absSum
      val bad = good.clone()
      // Corrupt a mid-block data byte (block 0, data byte 10): both of
      // its nibbles change, and the adaptation error compounds through
      // the rest of the block.
      bad(76 + 4 + 10) = (bad(76 + 4 + 10) ^ 0x5a).toByte
      assert(AdpcmCodecs.decodeAdpcmWav(bad).absSum != want,
        s"id=$id nibble corruption was silently absorbed")
    }
  }
}
