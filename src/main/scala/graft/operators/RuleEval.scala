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

  /** How a Sum/DistinctCount aggregate reads its event field, resolved
    * ONCE per config instead of string-prefix-parsed per event. */
  sealed trait FieldRef
  case object ValueField extends FieldRef
  final case class PropsField(key: String) extends FieldRef
  case object NoField extends FieldRef

  /** Pre-resolved evaluation plan for a config — the streaming fold
    * runs per EVENT, and the naive path paid a linear `cfg.rule(name)`
    * scan per rule reference, a `filter` allocation per event, and a
    * fresh grants Map per event (~250 µs/event of fold CPU measured at
    * sf0.1, the dominant streaming cost). Everything name-shaped is
    * resolved to arrays here; semantics are untouched — the fold still
    * calls [[abides]] per rule. Cached per config (configs are tiny
    * case classes; a session holds a handful). */
  final class Compiled private[RuleEval] (cfg: EngineConfig) {
    val aggsByType: Map[String, Array[AggregateSpec]] =
      cfg.aggregates.groupBy(_.eventType)
        .map { case (t, as) => t -> as.toArray }
    val fieldRefs: Map[String, FieldRef] =
      cfg.aggregates.map { a =>
        a.name -> (a.field match {
          case Some("value") => ValueField
          case Some(f) if f.startsWith("props.") =>
            PropsField(f.stripPrefix("props."))
          case _ => NoField
        })
      }.toMap
    val featureNames: Array[String] = cfg.features.map(_.name).toArray
    val featureRules: Array[Array[RuleSpec]] =
      cfg.features.map(_.rules.map(cfg.rule).toArray).toArray
  }

  private val compiledCache =
    scala.collection.concurrent.TrieMap.empty[EngineConfig, Compiled]

  def compiled(cfg: EngineConfig): Compiled =
    compiledCache.getOrElseUpdate(cfg, new Compiled(cfg))
}
