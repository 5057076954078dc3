package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's per-query measurement protocol ([[Bench.measure]]) —
  * no Spark session needed, the sampler is a synthetic stream. The recovery
  * protocol rescued round 16's official artifact but had no spec: these
  * tests inject a poisoned sample set and assert (1) a clean fresh set
  * REPLACES it after recoveryPrep, and (2) a genuinely drifting query stays
  * flagged on its ORIGINAL set — the recovery can rescue a contaminated
  * session but can never mask a regression.
  */
class BenchProtocolSpec extends AnyFunSuite {

  /** A scripted sampler: returns the scripted values in order, then keeps
    * repeating the last one (so warm-settle loops terminate predictably).
    */
  private final class Script(vals: Double*) {
    private var i = 0
    var taken = 0
    def once(): Double = {
      taken += 1
      val v = vals(math.min(i, vals.length - 1))
      i += 1
      v
    }
  }

  test("stable query: no recovery, recoveryPrep never called, median over the timed set") {
    var preps = 0
    val s = new Script(2.0, 1.0, 1.0, /*timed*/ 1.0, 1.1, 0.9)
    val m = Bench.measure[Double](s.once _, identity, runs = 3,
      recoveryPrep = () => preps += 1)
    assert(!m.recovered && !m.recoveryRejected)
    assert(preps == 0)
    assert(m.samples == Seq(1.0, 1.1, 0.9))
    assert(Bench.median(m.samples) == 1.0)
    assert(!Bench.unstable(m.samples))
  }

  test("transient hiccup: one outlier is outvoted by adaptive resamples, no recovery") {
    var preps = 0
    // warms settle at 1.0/1.0; timed set (1.0, 9.0, 1.0) is unstable, three
    // clean extras make it 6 samples whose trimmed spread drops the outlier
    val s = new Script(1.0, 1.0, /*timed*/ 1.0, 9.0, 1.0, /*extras*/ 1.0, 1.0, 1.0)
    val m = Bench.measure[Double](s.once _, identity, runs = 3,
      recoveryPrep = () => preps += 1)
    assert(!m.recovered && !m.recoveryRejected)
    assert(preps == 0)
    assert(m.samples.length == 6) // 3 timed + up to 3 adaptive extras
    assert(!Bench.unstable(m.samples))
  }

  test("contaminated session: recovery replaces the poisoned set with the clean fresh set") {
    // The session is "contended" until recoveryPrep runs (the production
    // hook drops caches + GCs); afterwards samples are clean and tight.
    var contended = true
    var taken = 0
    def once(): Double = {
      taken += 1
      if (contended) { if (taken % 2 == 0) 9.0 else 1.0 } // alternating: never settles stable
      else 1.0
    }
    var preps = 0
    val diags = scala.collection.mutable.ListBuffer.empty[String]
    val m = Bench.measure[Double](once _, identity, runs = 3,
      recoveryPrep = () => { preps += 1; contended = false },
      diag = diags += _)
    assert(preps == 1)
    assert(m.recovered && !m.recoveryRejected)
    assert(m.samples == Seq(1.0, 1.0, 1.0)) // the fresh set, not a mix
    assert(!Bench.unstable(m.samples))
    assert(diags.exists(_.contains("recovery")))
  }

  test("genuine drift: fresh set also unstable — flag stays on the ORIGINAL set, no mixing") {
    // Alternating 1/9 forever: not contamination, the query itself swings.
    var taken = 0
    def once(): Double = { taken += 1; if (taken % 2 == 0) 9.0 else 1.0 }
    var preps = 0
    val m = Bench.measure[Double](once _, identity, runs = 3,
      recoveryPrep = () => preps += 1)
    assert(preps == 1) // recovery was attempted once
    assert(!m.recovered && m.recoveryRejected)
    // the reported set is the original (timed + adaptive extras), still
    // flagged unstable — the regression is NOT masked
    assert(m.samples.length == 6)
    assert(Bench.unstable(m.samples))
    // the rejected fresh samples ship as evidence only
    assert(m.recoverySamples.length == 3)
    assert(m.samples.intersect(m.recoverySamples).size < m.samples.size)
  }

  test("warm-to-settle: heavy first warm earns the deeper cap; sustained decline burns it") {
    // First warm 20s (heavy → cap 8), then a decline that never meets the
    // 12% criterion: warms stop at the cap and timing proceeds.
    val s = new Script(20.0, 16.0, 12.0, 9.0, 6.5, 4.5, 3.0, 2.0, /*timed*/ 1.0, 1.0, 1.0)
    val m = Bench.measure[Double](s.once _, identity, runs = 3)
    assert(m.warms == 8)
    assert(m.samples == Seq(1.0, 1.0, 1.0))
  }
}
