package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's heat-retry rule ([[Bench.shouldHeatRetry]]) — pure
  * arithmetic, pinned here so anchor-refresh hygiene has a gate: anchors
  * ratchet down to each round's quiet minimums, and without the absolute
  * tolerance floor a sub-second query's normal noise band would read
  * "hot" against its own best-ever reading and burn retries on every
  * quiet run. */
class BenchSpec extends AnyFunSuite {

  private val cpus = 32
  private val hot = Bench.hotLoadThreshold(cpus) + 1.0 // clearly hot
  private val quiet = 0.1 // clearly quiet

  test("retry fires: far above anchor, hot box, retries available") {
    assert(Bench.shouldHeatRetry(3.0, Some(1.0), hot, cpus, retries = 0))
  }

  test("tolerance floor: relative excess without absolute excess never retries") {
    // 0.45 vs anchor 0.2 is 2.25x — but only +0.25 s, inside the noise
    // band of a ratcheted-down sub-second anchor
    assert(!Bench.shouldHeatRetry(0.45, Some(0.2), hot, cpus, retries = 0))
    // the same relative excess WITH absolute excess retries
    assert(Bench.shouldHeatRetry(4.5, Some(2.0), hot, cpus, retries = 0))
  }

  test("quiet box never retries (the reading is the query, not contamination)") {
    assert(!Bench.shouldHeatRetry(3.0, Some(1.0), quiet, cpus, retries = 0))
  }

  test("no anchor disables the retry for that query") {
    assert(!Bench.shouldHeatRetry(3.0, None, hot, cpus, retries = 0))
  }

  test("retry budget: exhausted retries stop the loop") {
    assert(Bench.shouldHeatRetry(3.0, Some(1.0), hot, cpus, retries = 1))
    assert(!Bench.shouldHeatRetry(3.0, Some(1.0), hot, cpus, retries = 2))
  }

  test("at-anchor and below-anchor readings never retry") {
    assert(!Bench.shouldHeatRetry(1.0, Some(1.0), hot, cpus, retries = 0))
    assert(!Bench.shouldHeatRetry(0.8, Some(1.0), hot, cpus, retries = 0))
    // 1.4x is inside the relative gate even with absolute excess
    assert(!Bench.shouldHeatRetry(2.8, Some(2.0), hot, cpus, retries = 0))
  }

  test("hot-load threshold scales with the cpu budget") {
    assert(Bench.hotLoadThreshold(16) == 1.5)
    assert(Bench.hotLoadThreshold(32) == 3.0)
  }
}
