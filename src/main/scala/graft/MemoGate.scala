package graft

/** The memo-phase degradation decision (VERDICT r15 #2), pure so the
  * decision table is spec-pinned (MemoGateSpec) instead of only
  * run-covered: given the measured memo builds and the pinned
  * quiet-machine costs, decide whether the phase is degraded and name
  * the individual overruns. [[Bench]] owns the pins and the artifact
  * fields; this owns the arithmetic.
  */
object MemoGate {

  /** Phase verdict: actual and expected totals over the SUCCESSFUL
    * builds, the degraded flag (actual > factor × expected), and the
    * names of successful memos individually above factor × their own
    * pin (the attribution list). */
  final case class Verdict(actualSec: Double, expectedSec: Double,
                           degraded: Boolean, overruns: Seq[String])

  /** An unpinned (new) memo contributes its own measured cost to the
    * expectation — visible in the artifact, gated once pinned. */
  def pin(pins: Map[String, Double])(name: String, sec: Double): Double =
    pins.getOrElse(name, sec)

  /** Evaluate the phase. `builds` rows are (name, seconds, succeeded);
    * failed builds are excluded from both totals (they are already a
    * hard artifact signal: -1 in memo_builds). */
  def evaluate(builds: Seq[(String, Double, Boolean)],
               pins: Map[String, Double],
               factor: Double = 2.0): Verdict = {
    val p = pin(pins) _
    val ok = builds.collect { case (n, v, true) => (n, v) }
    val actual = ok.map(_._2).sum
    val expected = ok.map { case (n, v) => p(n, v) }.sum
    Verdict(actual, expected,
      degraded = actual > factor * expected,
      overruns = ok.collect { case (n, v) if v > factor * p(n, v) => n })
  }
}
