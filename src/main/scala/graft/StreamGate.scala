package graft

/** The streaming-bench trust decision (VERDICT r16 #1/#2), pure so the
  * decision table is spec-pinned (StreamGateSpec) like [[MemoGate]]'s:
  * given the per-attempt ev/s readings and the VM canary, decide the
  * reported throughput, whether the reading is trusted, and the run's
  * exit code. [[Bench]] owns the pins (floors, canary band) and the
  * artifact fields; this owns the arithmetic.
  *
  * Protocol (mirrors the query sweep's min-of-3): the stream is
  * measured N times over the same pre-built feed; the reported ev/s is
  * the MAX of the successful attempts — throughput's analogue of the
  * batch sweep's min-of-N seconds (both are the noise-floor estimate
  * of what the plan actually does; documented VM noise on streaming is
  * 2-3× and one-sided, BENCHNOTES "stream protocol").
  *
  * Exit policy (VERDICT r16 #1): HARD exits only for a dead stream
  * (no attempt produced a reading) and for the reference-baseline
  * floor (BASELINE.md's ~2,000 req/s — missing it means the engine
  * lost its one published parity figure). The self-imposed 20k floor
  * is gated on the canary band (VERDICT r16 #2): missing it with a
  * QUIET canary is a trusted regression and still fails hard; missing
  * it on a canary outside the quiet band is flagged
  * `stream_degraded` — re-run, don't archive (the memo-gate rule, one
  * phase later) — but exits 0, because the reading is not evidence of
  * a code regression.
  */
object StreamGate {

  /** Gate verdict. `reported` is -1 when dead. `degraded` = self-floor
    * missed on a noisy canary (untrusted reading, re-run the bench);
    * `regressed` = self-floor missed on a quiet canary (trusted
    * regression, hard fail). Exactly one of the exit codes applies:
    * 0 healthy-or-degraded, 3 dead, 4 floor (baseline always,
    * self-floor only when trusted). */
  final case class Verdict(reported: Double, dead: Boolean,
                           canaryQuiet: Boolean, degraded: Boolean,
                           regressed: Boolean, exitCode: Int)

  def evaluate(attempts: Seq[Double], canarySec: Double,
               canaryQuietMaxSec: Double, selfFloor: Double,
               baselineFloor: Double): Verdict = {
    require(selfFloor >= baselineFloor,
      s"self floor $selfFloor below baseline floor $baselineFloor")
    val ok = attempts.filter(_ > 0)
    val dead = ok.isEmpty
    val reported = if (dead) -1.0 else ok.max
    val canaryQuiet = canarySec <= canaryQuietMaxSec
    val belowBaseline = !dead && reported < baselineFloor
    val belowSelfFloor = !dead && reported < selfFloor
    val regressed = belowSelfFloor && !belowBaseline && canaryQuiet
    val degraded = belowSelfFloor && !belowBaseline && !canaryQuiet
    val exitCode =
      if (dead) 3
      else if (belowBaseline || regressed) 4
      else 0
    Verdict(reported, dead, canaryQuiet, degraded, regressed, exitCode)
  }
}
