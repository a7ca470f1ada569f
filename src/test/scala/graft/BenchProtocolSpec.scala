package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench retry trigger (round-8 verdict item 2 + ADVICE): the
  * predicate must catch weather victims without becoming a one-sided
  * lower-the-headline filter — stable entries, however heavy, never
  * retry; lucky-fast entries are left alone. */
class BenchProtocolSpec extends AnyFunSuite {
  private val med = 0.3 // a plausible catalog median

  test("referenced entries: retry only when min exceeds 3x the committed reference") {
    // genuinely heavy but stable: 6.0 vs ref 5.0 — never retried
    assert(!Bench.isSuspect(Some(5.0), med, 6.0, 6.2, 6.0))
    // weather victim: 4.0 vs ref 1.0 — retried
    assert(Bench.isSuspect(Some(1.0), med, 4.0, 22.6, 4.0))
    // exactly at the boundary stays (strictly greater triggers)
    assert(!Bench.isSuspect(Some(1.0), med, 3.0, 3.0, 3.1))
    // lucky-fast vs reference: never retried (min can't be unlucky-fast)
    assert(!Bench.isSuspect(Some(2.0), med, 0.5, 0.5, 0.6))
    // micro-entry references floor at 50 ms: 0.2 s vs ref 0.01 retries
    // (3 x max(0.01, 0.05) = 0.15), scheduler jitter below it doesn't
    assert(Bench.isSuspect(Some(0.01), med, 0.2, 0.2, 0.3))
    assert(!Bench.isSuspect(Some(0.01), med, 0.1, 0.1, 0.12))
  }

  test("in-catalog referenced entries: 2x the same-basis ref AND a material excess") {
    // 2.3x an 0.1 s ic ref but only +0.13 s over it: scheduler jitter,
    // not weather — min-of-2 already bounded it, no retry (r16 floor)
    assert(!Bench.isSuspect(None, med, 0.23, 0.3, 0.23, icRef = Some(0.1)))
    // 2x+ AND more than a quarter second over the ic ref: retried
    assert(Bench.isSuspect(None, med, 1.1, 2.2, 1.1, icRef = Some(0.4)))
    // material excess but under 2x: heavy-but-stable, never retried
    assert(!Bench.isSuspect(None, med, 5.5, 5.5, 5.8, icRef = Some(4.0)))
    // ic basis wins over the isolated ref when both exist (the
    // isolated minimum would have fired at 3x here)
    assert(!Bench.isSuspect(Some(0.2), med, 0.7, 0.7, 0.75, icRef = Some(0.6)))
  }

  test("unreferenced entries: need run disagreement AND a slow min") {
    // both runs agree, entry just heavy: not a suspect
    assert(!Bench.isSuspect(None, med, 5.0, 5.0, 5.4))
    // >2x disagreement with a slow min: suspect
    assert(Bench.isSuspect(None, med, 5.0, 5.0, 22.0))
    // disagreement but the min is healthy (fast): the min is trusted
    assert(!Bench.isSuspect(None, med, 0.4, 0.4, 2.0))
    // disagreement, above 3x median but under the 1 s absolute floor
    assert(!Bench.isSuspect(None, med, 0.95, 0.95, 2.5))
  }
}
