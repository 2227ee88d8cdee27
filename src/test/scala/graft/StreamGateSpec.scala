package graft

import org.scalatest.funsuite.AnyFunSuite

/** Decision table of the streaming-bench trust gate (VERDICT r16
  * #1/#2) — the stream phase's analogue of MemoGateSpec. The pinned
  * constants here mirror Bench's: quiet-canary max 13.0 s, self floor
  * 20,000 ev/s, baseline floor 2,000 ev/s (BASELINE.md). */
class StreamGateSpec extends AnyFunSuite {

  private def eval(attempts: Seq[Double], canary: Double) =
    StreamGate.evaluate(attempts, canary,
      canaryQuietMaxSec = 13.0, selfFloor = 20000.0, baselineFloor = 2000.0)

  test("healthy run: best attempt reported, exit 0, no flags") {
    val v = eval(Seq(22000, 25000, 24000), canary = 10.0)
    assert(v.reported == 25000.0 && v.exitCode == 0)
    assert(!v.dead && !v.degraded && !v.regressed && v.canaryQuiet)
  }

  test("one noise dip under the floor is absorbed by best-of-3 (the r16 rc=1 scenario)") {
    // r16's judge run archived rc=1 on a SINGLE 19,148 ev/s reading at
    // canary 12.0 s; with the protocol, one dip under the floor while
    // another attempt clears it is a healthy run
    val v = eval(Seq(19148, 26000, 23000), canary = 12.0)
    assert(v.reported == 26000.0 && v.exitCode == 0 && !v.degraded && !v.regressed)
  }

  test("all attempts under the self floor on a QUIET canary is a trusted regression: exit 4") {
    val v = eval(Seq(18000, 19000, 17500), canary = 11.0)
    assert(v.reported == 19000.0 && v.regressed && !v.degraded && v.exitCode == 4)
  }

  test("all attempts under the self floor on a NOISY canary is stream_degraded: exit 0") {
    val v = eval(Seq(18000, 19000, 17500), canary = 20.0)
    assert(v.reported == 19000.0 && v.degraded && !v.regressed && v.exitCode == 0)
    assert(!v.canaryQuiet)
  }

  test("dead stream (no successful attempt) exits 3 with reported -1") {
    val empty = eval(Seq.empty, canary = 10.0)
    assert(empty.dead && empty.reported == -1.0 && empty.exitCode == 3)
    val allFailed = eval(Seq(-1.0, -1.0, -1.0), canary = 10.0)
    assert(allFailed.dead && allFailed.exitCode == 3)
  }

  test("baseline floor (~2,000 req/s) is unconditional: exit 4 even on a noisy canary") {
    val quiet = eval(Seq(1500, 1800, 1700), canary = 10.0)
    assert(quiet.exitCode == 4 && !quiet.degraded)
    val noisy = eval(Seq(1500, 1800, 1700), canary = 30.0)
    assert(noisy.exitCode == 4 && !noisy.degraded,
      "losing the reference's one published parity figure is never just noise")
  }

  test("failed attempts are excluded from the best-of reading") {
    val v = eval(Seq(-1.0, 24000, -1.0), canary = 10.0)
    assert(!v.dead && v.reported == 24000.0 && v.exitCode == 0)
  }

  test("boundaries: exactly at the floor passes, exactly at the quiet max is quiet") {
    val atFloor = eval(Seq(20000), canary = 13.0)
    assert(atFloor.exitCode == 0 && !atFloor.degraded && !atFloor.regressed)
    assert(atFloor.canaryQuiet)
    val justUnder = eval(Seq(19999.9), canary = 13.0)
    assert(justUnder.regressed && justUnder.exitCode == 4)
    val justNoisy = eval(Seq(19999.9), canary = 13.1)
    assert(justNoisy.degraded && justNoisy.exitCode == 0)
  }

  test("a self floor below the baseline floor is a configuration error") {
    intercept[IllegalArgumentException] {
      StreamGate.evaluate(Seq(25000), 10.0,
        canaryQuietMaxSec = 13.0, selfFloor = 1000.0, baselineFloor = 2000.0)
    }
  }
}
