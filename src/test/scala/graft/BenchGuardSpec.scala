package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench outlier-adjudication triggers (VERDICT r11 #3: the
  * new-query guard must demonstrably fire — e22's first in-suite reading
  * of 117.6 s was 12.5× its isolated cost and sailed through unflagged
  * because the 4× rule needs a baseline a first-time query never has). */
class BenchGuardSpec extends AnyFunSuite {

  test("existing query: >4x its previous entry and >0.5s re-runs; inside either bound doesn't") {
    assert(Bench.needsRerun(Some(1.0), 4.01))
    assert(!Bench.needsRerun(Some(1.0), 3.99), "4x is a strict bound")
    assert(!Bench.needsRerun(Some(0.1), 0.45),
      "sub-0.5s readings jitter 2x routinely and are too cheap to matter")
    assert(Bench.needsRerun(Some(0.1), 0.51))
    // a zero/failed prev entry is NO baseline: it must degrade to the
    // new-query >5s arm, never disable both guards (review finding —
    // a truncated prev file could otherwise mute the phantom detector)
    assert(Bench.needsRerun(Some(0.0), 9.9))
    assert(!Bench.needsRerun(Some(0.0), 4.9))
    // the r8 phantom that motivated the rule
    assert(Bench.needsRerun(Some(1.855), 23.2))
  }

  test("NEW query (no previous entry): >5s re-runs — the r11 e22 class") {
    assert(Bench.needsRerun(None, 117.6), "e22's r11 reading must flag")
    assert(Bench.needsRerun(None, 5.01))
    assert(!Bench.needsRerun(None, 4.99),
      "a new gate's legitimate fixed cost under 5s must not re-run")
  }
}
