package graft

import org.scalatest.funsuite.AnyFunSuite

/** The post-board resample trigger ([[Bench.isResampleOutlier]]) — the
  * in-artifact host-vs-code attribution added round 16: the decision is
  * pure, so it is pinned here instead of waiting for a real host spike
  * to exercise the branch during an official run. */
class BenchResampleSpec extends AnyFunSuite {

  test("a reading >3x its committed floor and >0.5s resamples") {
    assert(Bench.isResampleOutlier(Some(0.85), 13.28)) // the r15 ann_ivf spike
    assert(Bench.isResampleOutlier(Some(0.19), 2.22))  // nested_pruning spike
  }

  test("within-band readings never resample") {
    assert(!Bench.isResampleOutlier(Some(0.85), 1.9))  // < 3x
    assert(!Bench.isResampleOutlier(Some(0.85), 2.55)) // exactly 3x is in-band
  }

  test("sub-half-second readings are jitter, not outliers") {
    assert(!Bench.isResampleOutlier(Some(0.05), 0.4)) // 8x but tiny
  }

  test("no committed history or a degenerate floor never resamples") {
    assert(!Bench.isResampleOutlier(None, 99.0))
    assert(!Bench.isResampleOutlier(Some(0.0), 99.0))
    assert(!Bench.isResampleOutlier(Some(-1.0), 99.0)) // failed-seat sentinel
  }
}
