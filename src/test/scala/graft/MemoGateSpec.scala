package graft

import org.scalatest.funsuite.AnyFunSuite

/** Decision table of the memo-phase degradation gate (VERDICT r15 #2):
  * the arithmetic that decides whether a bench's memo phase is
  * archivable must be pinned, not just exercised — r15's failure mode
  * was a 27× memo overrun archived as green because nothing gated the
  * phase.
  */
class MemoGateSpec extends AnyFunSuite {

  private val pins = Map("a" -> 2.0, "b" -> 1.0)

  private def close(x: Double, y: Double): Boolean = math.abs(x - y) < 1e-9

  test("a quiet phase is not degraded and names no overruns") {
    val v = MemoGate.evaluate(
      Seq(("a", 2.1, true), ("b", 0.9, true)), pins)
    assert(!v.degraded && v.overruns.isEmpty)
    assert(close(v.actualSec, 3.0) && close(v.expectedSec, 3.0))
  }

  test("phase degraded when the total exceeds 2x the pinned total") {
    // a alone blows the phase: 7.0 > 2 * (2.0 + 1.0)
    val v = MemoGate.evaluate(
      Seq(("a", 7.0, true), ("b", 0.5, true)), pins)
    assert(v.degraded)
    assert(v.overruns == Seq("a"))
  }

  test("an individual overrun is named even when the phase total holds") {
    // b is 3x its pin but the phase is 4.1 <= 6.0 — attribution
    // without a false phase alarm (the bpe_merges-in-r15 shape)
    val v = MemoGate.evaluate(
      Seq(("a", 1.1, true), ("b", 3.0, true)), pins)
    assert(!v.degraded)
    assert(v.overruns == Seq("b"))
  }

  test("an unpinned memo self-pins: visible, never degrading on its own") {
    val v = MemoGate.evaluate(Seq(("new_memo", 40.0, true)), pins)
    assert(!v.degraded && v.overruns.isEmpty)
    assert(close(v.expectedSec, 40.0))
  }

  test("failed builds are excluded from both totals") {
    // the failure is already a hard signal (-1 row + nonzero exit);
    // it must not also poison the degradation arithmetic
    val v = MemoGate.evaluate(
      Seq(("a", 123.0, false), ("b", 1.0, true)), pins)
    assert(close(v.actualSec, 1.0) && close(v.expectedSec, 1.0))
    assert(!v.degraded && v.overruns.isEmpty)
  }

  test("the boundary is strict: exactly 2x is not degraded") {
    val v = MemoGate.evaluate(Seq(("a", 4.0, true)), pins)
    assert(!v.degraded)
    assert(MemoGate.evaluate(Seq(("a", 4.0001, true)), pins).degraded)
  }

  test("pins are keyed by sf dir: any other scale neutralizes the gate") {
    // the pins are quiet-machine costs AT sf0.1 — applying them at a
    // larger sf would false-flag a healthy machine (ADVICE r16), at a
    // smaller one mask real degradation
    assert(Bench.memoPins(Bench.MemoPinnedSfDir).nonEmpty)
    assert(Bench.memoPins(Bench.MemoPinnedSfDir + "///").nonEmpty,
      "trailing slashes must not defeat the pin match")
    assert(Bench.memoPins("target/sf1_scaled").isEmpty)
    assert(Bench.memoPins("/root/testdata/sf0.01").isEmpty)
  }
}
