package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.scalatest.funsuite.AnyFunSuite

/**
 * Bench contention guard: the calibration probe must move when the box
 * is deliberately loaded, and the pass-selection logic must discard
 * contended passes (falling back loudly, never silently, when no pass
 * was clean). This is the regression harness for the
 * contaminated-bench-rounds failure mode: a co-tenant burning the cores
 * inflated every timed pass and the median could not reject it.
 */
class BenchGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pick: min over clean passes; contended passes are discarded") {
    val ref = 0.020
    // pass 2 ran on a contended box (probe 0.09 > 2×ref) and its 1.2s
    // elapsed must not be considered; among clean passes the min wins
    val passes = Seq((0.021, 0.40), (0.090, 1.20), (0.025, 0.35))
    val (t, dirty) = BenchGuard.pick(passes, ref)
    assert(t == 0.35 && !dirty)
  }

  test("pick: all passes contended falls back to overall min and says so") {
    val ref = 0.020
    val passes = Seq((0.09, 1.2), (0.11, 1.5), (0.08, 1.1))
    val (t, dirty) = BenchGuard.pick(passes, ref)
    assert(t == 1.1 && dirty)
  }

  test("isContended: threshold is a factor over the reference") {
    assert(!BenchGuard.isContended(0.059, 0.020))
    assert(BenchGuard.isContended(0.061, 0.020))
  }

  test("uniform external load cannot pass as clean: absolute ceiling") {
    // the r12 escape: a box under UNIFORM load elevates every probe
    // equally (observed probe_ref 0.068 with times 1.7x inflated), so
    // the run-relative test sees every pass as clean. The absolute
    // ceiling must flag it anyway.
    val elevated = 0.068
    val ref = elevated // the run's own best probe is itself elevated
    assert(!(elevated > BenchGuard.ContendedFactor * ref),
      "sanity: the relative test alone cannot flag a uniform load")
    assert(BenchGuard.isContended(elevated, ref, ceiling = 0.05),
      "the absolute ceiling must flag a uniformly-elevated probe")

    // pick() over a uniformly-elevated run: no pass is clean -> dirty
    val passes = Seq((0.068, 1.7), (0.070, 1.8), (0.066, 1.65))
    val (t, dirty) = BenchGuard.pick(passes, ref = 0.066, ceiling = 0.05)
    assert(dirty, "a uniformly-elevated run must report contended=true")
    assert(t == 1.65)

    // and a healthy run under the same ceiling stays clean
    val (t2, dirty2) = BenchGuard.pick(
      Seq((0.040, 0.5), (0.042, 0.52)), ref = 0.040, ceiling = 0.05)
    assert(!dirty2 && t2 == 0.5)
  }

  test("default ceiling sits at ~2x the healthy floor") {
    // healthy floor on this box is 0.037-0.047; the guard must flag
    // anything materially above that band even when run-relative clean
    assert(BenchGuard.DefaultProbeCeiling <= 0.12)
    assert(BenchGuard.isContended(0.12, 0.12))
    assert(!BenchGuard.isContended(0.047, 0.040))
  }

  test("loadAvg reports three fields on Linux") {
    val la = BenchGuard.loadAvg()
    assert(la.isEmpty || la.split(" ").length == 3)
  }

  test("probe detects a deliberately loaded box") {
    // steady-state the probe first (JIT, first-stage costs)
    (1 to 3).foreach(_ => BenchGuard.probeSeconds(spark))
    val clean = (1 to 5).map(_ => BenchGuard.probeSeconds(spark)).min

    val stop = new AtomicBoolean(false)
    val spinners = (1 to 2 * Runtime.getRuntime.availableProcessors).map { _ =>
      val t = new Thread(() => {
        var x = 1L
        while (!stop.get()) { x = x * 6364136223846793005L + 1442695040888963407L }
        if (x == 42L) println(x) // keep the loop un-eliminable
      })
      t.setDaemon(true)
      t.start()
      t
    }
    try {
      val loaded = (1 to 3).map(_ => BenchGuard.probeSeconds(spark)).min
      // 2× CPU oversubscription should at least double the probe; assert
      // a conservative margin so scheduler luck can't flake the test
      assert(loaded > clean * 1.15,
        f"probe did not move under load: clean=$clean%.4f loaded=$loaded%.4f")
    } finally {
      stop.set(true)
      spinners.foreach(_.join(1000))
    }
  }
}
