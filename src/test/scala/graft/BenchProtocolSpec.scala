package graft

/** Pure-logic pins for the bench protocol's decision rules (the
  * forked-JVM machinery itself is exercised by every canonical run;
  * these pin the arithmetic the ADVICE r11 items fixed). */
class BenchProtocolSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def q(name: String, best: Double, ok: Boolean) =
    Bench.QResult(name, best, ok, env = None, reps = Seq(best))

  test("regroup cutoff: max(1.5 s, 2x certified)") {
    assert(Bench.regroupCutoff(0.0) === 1.5)
    assert(Bench.regroupCutoff(0.7) === 1.5)
    assert(Bench.regroupCutoff(0.76) === 1.52)
    assert(Bench.regroupCutoff(1.9) === 3.8)
  }

  test("pickAttempt: ok beats failed, regardless of order or speed") {
    val okSlow = q("a", 9.0, ok = true)
    val failFast = q("a", 0.1, ok = false)
    assert(Bench.pickAttempt(okSlow, failFast) === okSlow)
    assert(Bench.pickAttempt(failFast, okSlow) === okSlow)
  }

  test("pickAttempt: two ok attempts -> the faster (min-of-attempts)") {
    val a = q("a", 3.0, ok = true)
    val b = q("a", 2.0, ok = true)
    assert(Bench.pickAttempt(a, b) === b)
    assert(Bench.pickAttempt(b, a) === b)
    // ties keep the first (its env rides the record)
    val a2 = q("a", 2.0, ok = true)
    assert(Bench.pickAttempt(a2, b) === a2)
  }

  test("pickAttempt: two failures -> the retry (ran on the calmer host)") {
    val f1 = q("a", 5.0, ok = false)
    val f2 = q("a", 7.0, ok = false)
    assert(Bench.pickAttempt(f1, f2) === f2)
  }

  test("rerun calib gate sits above idle and below storm calibrations") {
    // idle host calib ≈ 0.5-0.95 on this box (canonical records);
    // the r11 storm measured 1.84 — the gate must separate them
    assert(Bench.RerunCalibGate > 1.0)
    assert(Bench.RerunCalibGate < 1.8)
  }

  test("rerun retry budget: more than one attempt, bounded (r14 #2)") {
    // one retry let a hot-calib retry's min stand in BENCH_r14 (q53
    // at 2.6× certified, calib 1.216); unbounded retries would let a
    // genuine regression stall the suite
    assert(Bench.RerunMaxAttempts >= 3)
    assert(Bench.RerunMaxAttempts <= 5)
  }
}
