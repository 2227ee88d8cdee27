package graft

import graft.config._
import graft.operators.Grants
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Rule/feature semantics, mirroring tests/test_rules.py: DIVIDE
  * arithmetic (:8-26), abides vs threshold (:29-68), VALUE (:71-126),
  * denom_min override (:129-151) — plus the null-safe divide
  * divergence (rules.py:56-62 dead code → we return NULL → abides). */
class GrantsSpec extends AnyFunSuite {
  import RuleOperation._, RuleCondition._

  private lazy val spark = SparkTestSession.spark

  private def abidesFor(rule: RuleSpec, rows: Seq[(Long, Double, Double)]): Map[Long, Boolean] = {
    import spark.implicits._
    rows.toDF("user_id", "agg1", "agg2")
      .select(col("user_id"), Grants.ruleAbides(rule).as("abides"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
  }

  test("VALUE rule compares the aggregate against the threshold") {
    val r = RuleSpec("r", Value, "agg1", None, Lt, 2.0)
    val out = abidesFor(r, Seq((1L, 1.0, 0.0), (2L, 2.0, 0.0), (3L, 5.0, 0.0)))
    assert(out == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("DIVIDE computes agg1/agg2 and compares") {
    val r = RuleSpec("r", Divide, "agg1", Some("agg2"), Lt, 0.25)
    val out = abidesFor(r, Seq(
      (1L, 30.0, 300.0), // 0.1 < 0.25 → abides
      (2L, 100.0, 300.0))) // 0.33 → fails
    assert(out == Map(1L -> true, 2L -> false))
  }

  test("divide by zero yields NULL which abides (documented divergence)") {
    val r = RuleSpec("r", Divide, "agg1", Some("agg2"), Gt, 0.5)
    val out = abidesFor(r, Seq((1L, 10.0, 0.0)))
    assert(out(1L))
  }

  test("denom below denom_min always abides (small-sample guard)") {
    val r = RuleSpec("r", Divide, "agg1", Some("agg2"), Lt, 0.25,
      denomMin = Some(3.0))
    val out = abidesFor(r, Seq(
      (1L, 2.0, 2.0),  // ratio 1.0 fails, but denom 2 < 3 → abides
      (2L, 2.0, 4.0))) // denom 4 ≥ 3 → ratio 0.5 → fails
    assert(out == Map(1L -> true, 2L -> false))
  }

  test("feature is granted iff ALL its rules abide") {
    import RuleOperation._
    val cfg = EngineConfig(
      aggregates = Seq(
        AggregateSpec("agg1", "purchase", AggregateType.Sum, Some("value")),
        AggregateSpec("agg2", "error", AggregateType.Sum, Some("value"))),
      rules = Seq(
        RuleSpec("small", Value, "agg1", None, Lt, 10.0),
        RuleSpec("tiny", Value, "agg1", None, Lt, 5.0)),
      features = Seq(FeatureSpec("both", Seq("small", "tiny"))))
    import spark.implicits._
    val aggs = Seq((1L, 3.0, 0.0), (2L, 7.0, 0.0), (3L, 12.0, 0.0))
      .toDF("user_id", "agg1", "agg2")
    val out = Grants.wide(aggs, cfg).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("long-form grants unpivots one row per (user, feature)") {
    val cfg = EngineConfig(
      aggregates = Seq(AggregateSpec("agg1", "purchase", AggregateType.Count)),
      rules = Seq(RuleSpec("r", Value, "agg1", None, Lt, 2.0)),
      features = Seq(FeatureSpec("f", Seq("r")), FeatureSpec("g", Seq("r"))))
    import spark.implicits._
    val out = Grants.long(Seq((1L, 1.0)).toDF("user_id", "agg1"), cfg).collect()
    assert(out.length == 2)
    assert(out.map(_.getString(1)).toSet == Set("f", "g"))
  }
}
