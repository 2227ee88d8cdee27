package graft.operators

import graft.config._

/** Scala-side rule evaluation for the incremental streaming state path
  * (flatMapGroupsWithState keeps per-user aggregates as plain values, so
  * rules are evaluated on the JVM rather than compiled to Columns).
  *
  * MUST stay semantically identical to the Column compiler in `Grants`:
  * null value ⇒ abides, divide-by-zero ⇒ null ⇒ abides, denom_min
  * override, missing aggregate ⇒ 0. Batch/stream parity is asserted by
  * StreamingParitySpec — the reference's core quality invariant
  * (SURVEY.md §7.5 #5).
  */
object RuleEval {

  /** Rule scalar value; None models SQL NULL (Grants.ruleValue). */
  def ruleValue(r: RuleSpec, agg: String => Double): Option[Double] = r.op match {
    case RuleOperation.Value => Some(agg(r.aggregate1))
    case RuleOperation.Divide =>
      val denom = agg(r.aggregate2.get)
      if (denom == 0.0) None else Some(agg(r.aggregate1) / denom)
  }

  /** Mirror of Grants.ruleAbides. */
  def abides(r: RuleSpec, agg: String => Double): Boolean = {
    val base = ruleValue(r, agg) match {
      case None => true
      case Some(v) => r.condition match {
        case RuleCondition.Gt => v > r.threshold
        case RuleCondition.Lt => v < r.threshold
      }
    }
    r.denomMin match {
      case Some(dm) if agg(r.aggregate2.get) < dm => true
      case _ => base
    }
  }

  /** Mirror of Grants.featureGranted for every feature. */
  def grants(cfg: EngineConfig, agg: String => Double): Map[String, Boolean] =
    cfg.features.map { f =>
      f.name -> f.rules.forall(rn => abides(cfg.rule(rn), agg))
    }.toMap
}
