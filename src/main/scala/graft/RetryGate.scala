package graft

/** Bounded retry-on-degraded for bench phases (VERDICT r18 #3), pure
  * so the decision table is spec-pinned (RetryGateSpec) instead of
  * only weather-covered: a phase whose verdict is degraded re-runs up
  * to the attempt cap, every attempt's measurement lands in the
  * artifact, and the LAST attempt is the operative one — the "re-run,
  * not archive" rule the driver cannot apply at judge time, executed
  * by the binary itself. [[Bench]] owns the phases and pins; this
  * owns the loop arithmetic.
  */
object RetryGate {

  /** `attempts` holds every attempt's result in order. `degraded` is
    * the LAST attempt's verdict (the phase is only degraded if it
    * stayed degraded through the cap). `healed` marks a retry that
    * recovered — attempt 1 was degraded, a later one was not. */
  final case class Outcome[A](attempts: Seq[A], degraded: Boolean,
                              healed: Boolean)

  /** Run `attempt` (passed the 0-based attempt index — retries may be
    * judged against a different pin than the cold first attempt, or
    * need to invalidate state before re-measuring) until `isDegraded`
    * clears or `maxAttempts` is reached. */
  def run[A](maxAttempts: Int)(attempt: Int => A)
            (isDegraded: (A, Int) => Boolean): Outcome[A] = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1: $maxAttempts")
    val buf = Vector.newBuilder[A]
    var i = 0
    var deg = true
    while (deg && i < maxAttempts) {
      val a = attempt(i)
      buf += a
      deg = isDegraded(a, i)
      i += 1
    }
    val attempts = buf.result()
    Outcome(attempts, degraded = deg, healed = attempts.size > 1 && !deg)
  }
}
