package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the unigram tokenizer's float-parity bound (see
  * [[TextOps.unigramVocab]]'s scaladoc): logp_u = round(ln(q/1e6)·1e6)
  * must agree between JVM Math.log/Math.round and DuckDB ln()/round()
  * even though (a) neither ln is guaranteed correctly rounded and (b) the
  * two engines round negative .5 halves in OPPOSITE directions. Both
  * hazards vanish iff no quantized input ever lands near a half-boundary
  * — and the quantization means there are only 1e6 possible inputs, so
  * the claim is exhaustively checkable in milliseconds.
  */
class UnigramLogpParitySpec extends AnyFunSuite {

  test("ln(q/1e6)*1e6 stays > 1e-6 micro-units from every .5 boundary, all q") {
    var minDist = Double.MaxValue
    var argQ = 0L
    var q = 1L
    while (q <= 1000000L) {
      val x = Math.log(q / 1e6) * 1e6
      val frac = x - Math.floor(x)
      val d = math.abs(frac - 0.5)
      if (d < minDist) { minDist = d; argQ = q }
      q += 1
    }
    // Measured 1.3174e-6 at q=380004 — ~10^4 double ulps at |x|~1e6, so
    // a platform ln() thousands of ulps off still rounds identically and
    // the half-case rounding rules are never consulted.
    assert(minDist > 1e-6,
      s"ln parity margin collapsed: min dist $minDist at q=$argQ")
    assert(argQ == 380004L, s"worst-case q moved: $argQ (doc says 380004)")
  }

  test("LSE correction ln(1+exp(-d/1e6))*1e6 stays away from every .5 boundary, all d under the cutoff") {
    // The soft-EM fold's one float op (TextOps.lseCol): the correction is
    // a function of the integer gap d alone, so the whole domain
    // [0, LseCutU) is exhaustively checkable; past the cutoff the branch
    // returns 0 on the integer argument and no float runs at all.
    var minDist = Double.MaxValue
    var argD = -1L
    var d = 0L
    while (d < TextOps.LseCutU) {
      val x = Math.log(1 + Math.exp(-d / 1e6)) * 1e6
      val frac = x - Math.floor(x)
      val dist = math.abs(frac - 0.5)
      if (dist < minDist) { minDist = dist; argD = d }
      d += 1
    }
    info(f"min half-boundary distance $minDist%.3e at d=$argD")
    // Positive values: HALF_UP on both engines — the only hazard is a
    // near-boundary value meeting a multi-ulp ln/exp difference. The
    // measured margin (~1e-8, thousands of ulps at |x| <= 7e5) keeps the
    // rounding rules un-consulted.
    assert(minDist > 5e-9,
      s"LSE parity margin collapsed: min dist $minDist at d=$argD")
  }

  test("posterior weight exp(t/1e6)*1e6 stays away from every .5 boundary, all t under the cutoff") {
    var minDist = Double.MaxValue
    var argT = 1L
    var t = 0L
    while (t < TextOps.LseCutU) {
      val x = Math.exp(-t / 1e6) * 1e6
      val frac = x - Math.floor(x)
      val dist = math.abs(frac - 0.5)
      if (dist < minDist) { minDist = dist; argT = t }
      t += 1
    }
    info(f"min half-boundary distance $minDist%.3e at t=-$argT")
    assert(minDist > 5e-9,
      s"posterior parity margin collapsed: min dist $minDist at t=-$argT")
  }

  test("round-half semantics differ between engines only AT a boundary") {
    // The documented hazard this spec guards: Math.round(-2.5) == -2
    // (half toward +inf) while DuckDB round(-2.5) == -3 (half away from
    // zero). If this JVM fact ever changes, the scaladoc's framing is
    // stale and the margin argument needs re-derivation.
    assert(Math.round(-2.5d) == -2L)
  }
}
