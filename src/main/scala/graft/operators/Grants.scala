package graft.operators

import graft.config._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Compiles rules + features into grant columns over the per-user
  * aggregate frame (reference models/rules.py:25-121,
  * event_processer.py:40-63).
  *
  * Rules are pure `Column` expressions — no runtime join against a rule
  * table (the reference's aggregate→rule / rule→feature reverse indexes,
  * rules.py:88-90 and feature_registry.py:17-18, are config-time
  * structures; we resolve them at plan-build time so evaluation is one
  * whole-stage-codegen projection).
  */
object Grants {

  /** The rule's scalar value (rules.py:56-64). DIVIDE is null-safe:
    * x/0 → NULL (→ rule abides), replacing the reference's dead
    * `if denom == 0` branch that crashes instead (rules.py:56-62). */
  def ruleValue(r: RuleSpec): Column = r.op match {
    case RuleOperation.Value => col(r.aggregate1)
    case RuleOperation.Divide =>
      // when(...) with no otherwise yields NULL on denom == 0
      col(r.aggregate1) / when(col(r.aggregate2.get) =!= 0, col(r.aggregate2.get))
  }

  /** Whether the rule "abides" (rules.py:66-75): condition over the
    * value, NULL-abides, and the denom_min small-sample override
    * (rules.py:34,58-59,68-71): denom < denom_min ⇒ always abides. */
  def ruleAbides(r: RuleSpec): Column = {
    val v = ruleValue(r)
    val cond = r.condition match {
      case RuleCondition.Gt => v > lit(r.threshold)
      case RuleCondition.Lt => v < lit(r.threshold)
    }
    val base = coalesce(cond, lit(true))
    r.denomMin match {
      case Some(dm) =>
        when(coalesce(col(r.aggregate2.get), lit(0.0)) < lit(dm), lit(true)).otherwise(base)
      case None => base
    }
  }

  /** Feature grant = conjunction of its rules (event_processer.py:50-63);
    * boolean short-circuit comes free from codegen. */
  def featureGranted(cfg: EngineConfig, f: FeatureSpec): Column =
    f.rules.map(rn => ruleAbides(cfg.rule(rn))).reduce(_ && _).as(f.name)

  /** Wide per-user grants frame: user_id + one boolean column per feature. */
  def wide(userAggs: DataFrame, cfg: EngineConfig): DataFrame = {
    val cols = col("user_id") +: cfg.features.map(f => featureGranted(cfg, f))
    userAggs.select(cols: _*)
  }

  /** Long-form grants view `[user_id, feature, has_grant]` — the
    * materialized equivalent of the reference's per-user grant dicts
    * (user_feature.py:22). Unpivot is a zero-shuffle projection. */
  def long(userAggs: DataFrame, cfg: EngineConfig): DataFrame =
    longFromWide(wide(userAggs, cfg), cfg)

  /** Unpivot an already-built wide frame — callers that need BOTH
    * shapes build `wide` once (and may cache it) instead of
    * re-aggregating the event scan per shape. */
  def longFromWide(wideGrants: DataFrame, cfg: EngineConfig): DataFrame = {
    val stackArgs = cfg.features
      .map(f => s"'${f.name}', ${f.name}")
      .mkString(", ")
    wideGrants.selectExpr(
      "user_id",
      s"stack(${cfg.features.size}, $stackArgs) as (feature, has_grant)")
  }
}
