package graft.operators

import graft.config.EngineConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The read path (SURVEY.md §3.2, S4/J5/R8/R9): materialized grants
  * view + per-feature circuit state, served as point lookups.
  *
  * The reference answers `GET /can<feature>` from in-process dicts
  * (app.py:63-79, user_feature.py:46-55); here the grants view is a
  * small hash-joinable table (broadcast against any request batch) and
  * the circuit is the latest breaker window. `has_access =
  * circuit_open OR grant`, unseen users default to granted
  * (user_feature.py:75-79, rules.py:112).
  */
final class AccessService(
    spark: SparkSession,
    grants: DataFrame,       // [user_id, feature, has_grant]
    circuitOpen: Boolean) {

  private val g = grants.cache()

  /** Batch point-lookup: one row per (user_id, feature) request. */
  def check(requests: DataFrame): DataFrame =
    requests
      .join(broadcast(g), Seq("user_id", "feature"), "left_outer")
      .select(col("user_id"), col("feature"),
        coalesce(col("has_grant"), lit(true)).as("has_grant"),
        (lit(circuitOpen) || coalesce(col("has_grant"), lit(true)))
          .as("has_access"))

  /** Single lookup (the `GET /can<feature>` shape). */
  def canAccess(userId: Long, feature: String): Boolean = {
    import spark.implicits._
    check(Seq((userId, feature)).toDF("user_id", "feature"))
      .head().getBoolean(3)
  }

  /** `can<feature>` flag lookup, reference route shape (P5). */
  def canAccessFlag(userId: Long, flag: String): Option[Boolean] =
    AccessService.parseFlag(flag).map(canAccess(userId, _))
}

object AccessService {

  /** Feature-flag route parsing (SURVEY.md P5): `can<feature>` with a
    * lowercase feature of 1-16 chars (reference app.py:65-71; the
    * reference's possessive quantifier is an anti-backtracking detail,
    * not a semantic one). P6's `[a-z]+` name validation lives in
    * FeatureSpec's constructor. */
  private val FlagPattern = "^can([a-z]{1,16})$".r
  def parseFlag(flag: String): Option[String] =
    FlagPattern.findFirstMatchIn(flag).map(_.group(1))
  /** Build from raw events: aggregates → grants view + latest circuit
    * window state. */
  def fromEvents(spark: SparkSession, events: DataFrame,
                 cfg: EngineConfig): AccessService = {
    val grants = Grants.long(
      EventAggregates.perUser(events, cfg.aggregates), cfg)
    val circuit = Windowed.circuit(events)
      .orderBy(col("win_start").desc).limit(1)
      .select(col("circuit_open")).collect()
      .headOption.exists(_.getBoolean(0))
    new AccessService(spark, grants, circuit)
  }
}
