package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Layer II contract: the decoder recovers EXACTLY the values the fixture
  * generator authored (bit-layout round trip over allocation regions,
  * scfsi modes, grouped/ungrouped codes), fails loud on everything
  * outside the profile, and the full-history synthesis machinery agrees
  * with a direct convolution reference.
  */
class Mp3Spec extends AnyFunSuite {
  import Mp3Codecs._

  /** Feature recompute straight from the fixture formulas — an
    * independent path to the same numbers the decoder must extract from
    * the packed bits.
    */
  private def expected(d: Long): Mp3Decoded = {
    val frames = Mp3Fixtures.nFrames(d)
    var allocSum = 0L
    var scfSum = 0L
    var deqAbs = 0L
    val g0 = new Array[Long](SbLimit)
    for (f <- 0 until frames; sb <- Mp3Fixtures.SignalSbs) {
      val a = Mp3Fixtures.allocIdx(d, f, sb)
      allocSum += a
      val n = levelsFor(sb, a)
      val mode = Mp3Fixtures.scfsiMode(d, sb)
      val cnt = mode match { case 0 => 3; case 2 => 1; case _ => 2 }
      (0 until cnt).foreach(k => scfSum += Mp3Fixtures.scfIdx(d, f, sb, k))
      for (gr <- 0 until 12) {
        val part = gr / 4
        val k = mode match {
          case 0 => part
          case 1 => if (part <= 1) 0 else 1
          case 2 => 0
          case _ => if (part == 0) 0 else 1
        }
        val scfQ = ScfQ30(Mp3Fixtures.scfIdx(d, f, sb, k))
        for (s <- 0 until 3) {
          val v =
            if (grouped(n)) {
              val c = Mp3Fixtures.groupCode(d, f, gr, sb, n)
              val smp = (c / math.pow(n, s).toInt) % n
              smDiv(scfQ * (2L * smp - (n - 1)), n.toLong * 64)
            } else {
              val code = Mp3Fixtures.sampleCode(d, f, gr, sb, s, n)
              smDiv(scfQ * 2L * (code - (n + 1) / 2 + 1), n.toLong * 64)
            }
          deqAbs += math.abs(v)
          if (f == 0 && gr == 0 && s == 0) g0(sb) = v
        }
      }
    }
    var v0Abs = 0L
    var syn0Abs = 0L
    for (i <- 0 until 64) {
      val v = (0 until SbLimit).map(k =>
        if (g0(k) == 0L) 0L else smDiv(CosQ30(i)(k) * g0(k), 1L << 30)).sum
      v0Abs += math.abs(v)
      if (i < 32) syn0Abs += math.abs(smDiv(WinQ30(i) * v, 1L << 30))
    }
    Mp3Decoded(frames.toLong, 32000L, Mp3Fixtures.bitrateKbps(d).toLong,
      frames * 1152L, allocSum, scfSum, deqAbs, v0Abs, syn0Abs)
  }

  test("decode(generate(id)) round-trips every authored value, ids spanning all variants") {
    // 27 consecutive stripe ids cover all (nFrames, bitrate, alloc, scfsi)
    // combinations the formulas cycle through.
    for (k <- 0 until 27) {
      val d = 4L + 9L * k
      val got = Mp3Codecs.decodeMp3(Mp3Fixtures.mp3(d))
      assert(got == expected(d), s"doc $d: $got != ${expected(d)}")
    }
  }

  test("fail-loud: out-of-profile streams are rejected by name, never mis-decoded") {
    val good = Mp3Fixtures.mp3(4L)
    def mut(i: Int, b: Int): Array[Byte] = {
      val c = good.clone(); c(i) = b.toByte; c
    }
    // Layer III: layer bits '01' -> byte1 = 1111 101 1? byte 1 is
    // (sync low 8 = FF..) actually byte0=FF, byte1 = 1111 1 01 1: sync
    // 1111, ID 1, layer 01 (III), prot 1 = 0xFB.
    val l3 = intercept[IllegalArgumentException] {
      Mp3Codecs.decodeMp3(mut(1, 0xFB))
    }
    assert(l3.getMessage.contains("Layer"), l3.getMessage)
    // stereo mode '00'
    val st = intercept[IllegalArgumentException] {
      Mp3Codecs.decodeMp3(mut(3, good(3) & 0x3f))
    }
    assert(st.getMessage.contains("mono"), st.getMessage)
    // broken sync
    assertThrows[IllegalArgumentException] {
      Mp3Codecs.decodeMp3(mut(0, 0x00))
    }
    // truncated frame body
    assertThrows[IllegalArgumentException] {
      Mp3Codecs.decodeMp3(good.take(good.length - 1))
    }
    // 44.1 kHz sampling bits '00' (byte2 = bitrate<<4 | sfreq<<2 | pad<<1)
    assertThrows[IllegalArgumentException] {
      Mp3Codecs.decodeMp3(mut(2, good(2) & 0xf3))
    }
  }

  test("synthesis FIFO agrees with a direct 512-tap convolution reference") {
    // Feed 20 deterministic subband-sample slots through the incremental
    // Synthesis machinery and through a from-scratch reference that keeps
    // ALL V slices and convolves per the spec indexing.
    val slots = Array.tabulate(20, 32) { (t, k) =>
      if (k % 7 == (t % 5)) ((t * 131 + k * 17) % 2001 - 1000).toLong * 1024 else 0L
    }
    def vSlice(s: Array[Long]): Array[Long] = Array.tabulate(64) { i =>
      (0 until 32).map(k =>
        if (s(k) == 0L) 0L else smDiv(CosQ30(i)(k) * s(k), 1L << 30)).sum
    }
    val vs = slots.map(vSlice) // vs(t) = slice pushed at step t
    val syn = new Synthesis
    for (t <- slots.indices) {
      val got = syn.step(slots(t))
      val want = Array.tabulate(32) { j =>
        (0 until 8).map { tap =>
          // U(64·tap + j)    = V(128·tap + j)       -> slice 2·tap,  index j
          // U(64·tap + 32+j) = V(128·tap + 96 + j)  -> slice 2·tap+1, index 32+j
          val a = if (t - 2 * tap >= 0)
            smDiv(WinQ30(j + 64 * tap) * vs(t - 2 * tap)(j), 1L << 30) else 0L
          val b = if (t - 2 * tap - 1 >= 0)
            smDiv(WinQ30(j + 64 * tap + 32) * vs(t - 2 * tap - 1)(32 + j), 1L << 30) else 0L
          a + b
        }.sum
      }
      assert(got.toSeq == want.toSeq, s"step $t synthesis diverged")
    }
  }
}
