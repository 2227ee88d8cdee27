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
    // enough background traffic that one error keeps the breaker
    // closed (denial rate 1/42 < 5%) — otherwise the open circuit
    // correctly overrides the revocation
    val events = (Seq(
      ev(1, 1, "purchase", 600.0, 1),
      ev(2, 1, "error", 900.0, 2)) ++ // ratio 1.5 → purchase revoked
      (3 to 42).map(i => ev(i, 2, "click", 1.0, 3))).toDF()
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
    val svc = new AccessService(spark, grants, circuitOpen = true)
    assert(svc.canAccess(1, "purchase"))
  }
}
