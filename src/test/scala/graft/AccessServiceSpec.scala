package graft

import graft.config.DefaultConfig
import graft.operators.AccessService
import graft.streaming.EventPipeline.EventRow
import org.scalatest.funsuite.AnyFunSuite

/** Read path: grant lookup, default-grant for unseen users, circuit
  * override (reference tests test_user_feature_service.py:57-113). */
class AccessServiceSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def ev(id: Long, user: Long, typ: String, value: Double, minute: Int): EventRow =
    EventRow(id, java.sql.Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"),
      user, typ, value, """{"k": 1}""")

  test("revoked user denied; unseen user default-granted") {
    import spark.implicits._
    // enough background USERS that one denied user keeps the breaker
    // closed (distinct-user denial rate 1/42 < 5%) — otherwise the
    // open circuit correctly overrides the revocation
    val events = (Seq(
      ev(1, 1, "purchase", 600.0, 1),
      ev(2, 1, "error", 900.0, 2)) ++ // ratio 1.5 → purchase revoked
      (3 to 42).map(i => ev(i, i, "click", 1.0, 3))).toDF()
    val svc = AccessService.fromEvents(spark, events, DefaultConfig.config)
    assert(!svc.canAccess(1, "purchase"))
    assert(svc.canAccess(1, "message"))   // few_errors still abides
    assert(svc.canAccess(999, "purchase")) // unseen → default grant
  }

  test("flag parsing mirrors the reference route regex") {
    assert(AccessService.parseFlag("canpurchase").contains("purchase"))
    assert(AccessService.parseFlag("canx").contains("x"))
    assert(AccessService.parseFlag("can").isEmpty)
    assert(AccessService.parseFlag("canPurchase").isEmpty)
    assert(AccessService.parseFlag("cannotanactualfeatureXX").isEmpty)
    assert(AccessService.parseFlag("canabcdefghijklmnopq").isEmpty) // 17 chars
  }

  test("open circuit allows a revoked user (reference :57-74)") {
    import spark.implicits._
    val grants = Seq((1L, "purchase", false)).toDF("user_id", "feature", "has_grant")
    val open = Seq(("purchase", true)).toDF("feature", "circuit_open")
    assert(new AccessService(spark, grants, open).canAccess(1, "purchase"))
    val closed = Seq(("purchase", false)).toDF("feature", "circuit_open")
    assert(!new AccessService(spark, grants, closed).canAccess(1, "purchase"))
  }

  test("circuits are per feature: one open circuit doesn't leak") {
    import spark.implicits._
    // user 1 revoked on BOTH features; only message's circuit is open →
    // message accessible (circuit override), purchase still denied.
    val grants = Seq((1L, "purchase", false), (1L, "message", false))
      .toDF("user_id", "feature", "has_grant")
    val circuits = Seq(("purchase", false), ("message", true))
      .toDF("feature", "circuit_open")
    val svc = new AccessService(spark, grants, circuits)
    assert(!svc.canAccess(1, "purchase"))
    assert(svc.canAccess(1, "message"))
  }

  test("accessLog records the real grant, not the served has_access") {
    import spark.implicits._
    val grants = Seq((1L, "purchase", false)).toDF("user_id", "feature", "has_grant")
    val open = Seq(("purchase", true)).toDF("feature", "circuit_open")
    val svc = new AccessService(spark, grants, open)
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:01:00")
    val requests = Seq((t, 1L, "purchase"), (t, 2L, "purchase"))
      .toDF("ts", "user_id", "feature")
    // served: both allowed (circuit open); logged: user 1's attempt is
    // success=false — the reference logs the REAL grant
    // (user_feature.py:52-55)
    assert(svc.check(requests.select("user_id", "feature")).collect()
      .forall(_.getBoolean(4)))
    val log = svc.accessLog(requests).collect()
      .map(r => r.getLong(1) -> r.getBoolean(3)).toMap
    assert(log == Map(1L -> false, 2L -> true))
  }

  test("grants join is size-gated: shuffle-hash above the broadcast ceiling") {
    import spark.implicits._
    val grants = Seq((1L, "purchase", false), (2L, "purchase", true))
      .toDF("user_id", "feature", "has_grant")
    val circuits = Seq(("purchase", false)).toDF("feature", "circuit_open")
    val requests = Seq((1L, "purchase"), (2L, "purchase"), (3L, "purchase"))
      .toDF("user_id", "feature")
    val small = new AccessService(spark, grants, circuits)
    val huge = new AccessService(spark, grants, circuits, maxBroadcastGrants = 0L)
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    // below the ceiling: grants broadcast (requests stream shuffle-free)
    assert(planOf(small.check(requests)).contains("BroadcastHashJoin"))
    // above it: the grants join must NOT be a broadcast — shuffle hash
    // join building on the grants side (the circuits join, O(features),
    // stays broadcast)
    val hugePlan = planOf(huge.check(requests))
    assert(hugePlan.contains("ShuffledHashJoin"))
    // identical answers either side of the gate
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getString(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))
    assert(small.check(requests).collect().map(key).sorted.toSeq ==
      huge.check(requests).collect().map(key).sorted.toSeq)
  }
}
