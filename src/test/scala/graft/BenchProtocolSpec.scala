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

  @volatile private var burnSink: Long = 0L

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

  /** A controllable gate: probe reads a shared contention flag, sleeper is a
    * hook (no real sleeping) so window transitions are deterministic.
    */
  private def syntheticGate(
      contended: () => Boolean, onDiscard: () => Unit,
      maxPerQuery: Int = 10, maxTotal: Int = 120): Bench.SentinelGate =
    new Bench.SentinelGate(
      probe = () => if (contended()) 0.05 else 0.01,
      factor = 1.6, maxDiscardsPerQuery = maxPerQuery,
      maxDiscardsTotal = maxTotal,
      sleepMsForDiscard = _ => 0L, sleeper = _ => onDiscard(),
      enabled = true)

  test("sentinel gate: samples inside a contended window are excluded; run stays stable") {
    // Quiet calibration, then a contended window that ends after the gate
    // has discarded two pre-sample probes. The sampler would return 9.0
    // inside the window and 1.0 outside — the 9.0s must never be sampled.
    var contended = false
    var discards = 0
    val gate = syntheticGate(() => contended, () => {
      discards += 1; if (discards >= 2) contended = false
    })
    gate.calibrate(3) // floor = 0.01 (quiet)
    contended = true
    def once(): Double = if (contended) 9.0 else 1.0
    val m = Bench.measure[Double](once _, identity, runs = 3, gate = gate)
    // warms are ungated (they settle at 9.0 inside the window — untimed),
    // but every TIMED sample was taken after the window closed
    assert(m.samples == Seq(1.0, 1.0, 1.0))
    assert(m.discarded == 2)
    assert(!Bench.unstable(m.samples))
  }

  test("sentinel gate: a window opening MID-sample discards the straddling sample") {
    // Probe script: quiet before the first sample, contended right after it
    // (the window opened while the sample ran), then quiet for good.
    val probes = Iterator(0.01, /*pre1*/ 0.01, /*post1*/ 0.05,
      /*pre2*/ 0.01, /*post2*/ 0.01) ++ Iterator.continually(0.01)
    var discards = 0
    val gate = new Bench.SentinelGate(
      probe = () => probes.next(), factor = 1.6, maxDiscardsPerQuery = 10,
      maxDiscardsTotal = 120, sleepMsForDiscard = _ => 0L,
      sleeper = _ => discards += 1, enabled = true)
    gate.calibrate(1)
    // first TIMED once() straddles the window (9.0) — must be discarded
    val s = new Script(1.0, 1.0, /*timed*/ 9.0, 1.0, 1.0, 1.0)
    val m = Bench.measure[Double](s.once _, identity, runs = 3, gate = gate)
    assert(m.samples == Seq(1.0, 1.0, 1.0))
    assert(m.discarded == 1)
  }

  test("full-width pprobe: recorded per accepted sample, never a discard criterion") {
    // A massively "contended" full-width probe (steady mild load: 32-thread
    // wall inflated, 1-thread probe quiet) must NOT gate — the whole point
    // of the pprobe is to RECORD the boundary case the gate deliberately
    // lets through, so validity stays decidable after the fact. Gating on
    // it would leave a mildly shared host unable to produce any band.
    var discards = 0
    val gate = new Bench.SentinelGate(
      probe = () => 0.01, factor = 1.6, maxDiscardsPerQuery = 10,
      maxDiscardsTotal = 120, sleepMsForDiscard = _ => 0L,
      sleeper = _ => discards += 1, enabled = true,
      pprobe = () => 0.99) // 99× the 1-thread probe: extreme steady load
    gate.calibrate(1)
    val s = new Script(1.0, 1.0, 1.0, 1.0, 1.0)
    val m = Bench.measure[Double](s.once _, identity, runs = 3, gate = gate)
    assert(discards == 0 && m.discarded == 0,
      "full-width probe must never cause a discard")
    assert(m.samples == Seq(1.0, 1.0, 1.0))
    // telemetry shipped: one (pre, post) full-width pair per accepted sample
    assert(m.pprobes.length == m.samples.length)
    assert(m.pprobes.forall { case (a, b) => a == 0.99 && b == 0.99 })
    assert(math.abs(gate.pfloorMs - 990.0) < 0.001)
  }

  test("full-width pprobe: real parallelProbe reads near the 1-thread probe on a quiet host") {
    // Sanity on the real implementation: all cores running the fixed work
    // concurrently should take roughly the single-thread time (each thread
    // gets a core), not N×. Generous 6× bound: the assert documents the
    // shape (parallel, not serialized), not a tight floor — CI hosts vary.
    (0 until 3).foreach { _ => Bench.sentinelProbe(); Bench.parallelProbe() }
    val one = (0 until 3).map(_ => Bench.sentinelProbe()).min
    val all = (0 until 3).map(_ => Bench.parallelProbe()).min
    assert(all < one * 6,
      f"parallelProbe serialized? 1-thread ${one * 1e3}%.1fms vs full-width ${all * 1e3}%.1fms")
  }

  test("sentinel gate: budget exhaustion degrades to ungated sampling, never deadlocks") {
    // Permanently contended host: after maxDiscardsPerQuery discards the
    // query samples ungated and the spread/validity flag owns the outcome.
    val gate = new Bench.SentinelGate(
      probe = { var first = true; () => if (first) { first = false; 0.01 } else 0.05 },
      factor = 1.6, maxDiscardsPerQuery = 3, maxDiscardsTotal = 120,
      sleepMsForDiscard = _ => 0L, sleeper = _ => (), enabled = true)
    gate.calibrate(1) // quiet floor, then contended forever
    val s = new Script(1.0, 1.0, /*timed, ungated after budget*/ 1.0, 1.1, 0.9)
    val m = Bench.measure[Double](s.once _, identity, runs = 3, gate = gate)
    assert(m.discarded == 3) // budget spent, then degraded
    assert(m.samples.length == 3) // sampling still completed
  }

  test("synthetic contention: a real CPU-burner inflates the sentinel, its window is excluded, run stays valid") {
    // The r18 contract test: inject genuine CPU contention (6× core
    // oversubscription), assert the REAL probe detects it, and assert a
    // gated measurement takes its samples only after the burner stops —
    // so the run ships valid instead of flagged (the r15/r17 failure).
    (0 until 5).foreach(_ => Bench.sentinelProbe()) // JIT-warm the probe
    val quietFloor = (0 until 7).map(_ => Bench.sentinelProbe()).min
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val burners = (0 until 6 * Runtime.getRuntime.availableProcessors()).map { _ =>
      val t = new Thread(() => {
        var x = 1L
        while (!stop.get()) { var i = 0; while (i < 100000) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 } }
        burnSink = x // defeat dead-code elimination of the spin loop
      })
      t.setDaemon(true); t.setPriority(Thread.NORM_PRIORITY); t.start(); t
    }
    try {
      // under 6× oversubscription a fixed-work probe gets ~1/7 of a core:
      // even the best of 5 probes must sit well above the 1.5× gate line
      val inflated = (0 until 5).map(_ => Bench.sentinelProbe()).min
      assert(inflated > quietFloor * 1.5,
        f"burner did not inflate the sentinel: quiet ${quietFloor * 1e3}%.1fms vs burned ${inflated * 1e3}%.1fms")
      var discards = 0
      val gate = new Bench.SentinelGate(
        probe = () => Bench.sentinelProbe(), factor = 1.5,
        maxDiscardsPerQuery = 40, maxDiscardsTotal = 400,
        sleepMsForDiscard = _ => 5L,
        sleeper = ms => {
          discards += 1
          if (discards >= 2) stop.set(true) // the window "ends"
          Thread.sleep(ms)
        }, enabled = true)
      gate.floorSeed(quietFloor)
      // the sampled quantity is itself fixed CPU work, so a sample taken
      // inside the burner window WOULD read several times slower
      def once(): Double = Bench.sentinelProbe() * 4
      val m = Bench.measure[Double](once _, identity, runs = 3, gate = gate)
      assert(gate.discards >= 2, "gate never saw the contended window")
      assert(!Bench.unstable(m.samples),
        s"gated samples still unstable: ${m.samples.mkString(", ")}")
      // every ACCEPTED sample was taken after the burner stopped: a sample
      // inside the 6×-oversubscribed window would read ≥4× the quiet value
      assert(m.samples.max < quietFloor * 4 * 2.0,
        f"an accepted sample looks contended: ${m.samples.max * 1e3}%.1fms vs quiet-4x ${quietFloor * 4e3}%.1fms")
    } finally {
      stop.set(true)
      burners.foreach(_.join(2000))
    }
  }
}
