package graft

import graft.operators.{AccessService, Windowed}
import graft.sources.CircuitStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming breaker → persisted circuit table → served access checks:
  * the full control-path loop (reference §3.3) through storage. */
class CircuitStoreSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def t(minute: Int) = java.sql.Timestamp.valueOf(
    f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("breaker stream persists per-feature state served by AccessService") {
    import spark.implicits._
    val table = "cs_live"
    CircuitStore.drop(spark, table)
    try {
      val ms = MemoryStream[(java.sql.Timestamp, Long, String, Boolean)](spark)
      val q = CircuitStore.writer(Windowed.featureCircuitStream(
        ms.toDF().toDF("ts", "user_id", "feature", "success")), table).start()
      try {
        // purchase takes a 50% denied-user burst; message stays clean
        ms.addData((1 to 20).flatMap { u =>
          Seq((t(3), u.toLong, "purchase", u <= 10),
            (t(3), u.toLong, "message", true))
        })
        q.processAllAvailable()
        ms.addData(Seq((t(60), 1L, "purchase", true))) // advance watermark
        q.processAllAvailable()
      } finally q.stop()

      val circuits = CircuitStore.read(spark, table).collect()
        .map(r => r.getString(0) -> r.getBoolean(1)).toMap
      assert(circuits("purchase") == true && circuits("message") == false)

      // served: revoked user passes on purchase (open circuit), not on
      // message (closed) — live state, straight from the table
      val grants = Seq((1L, "purchase", false), (1L, "message", false))
        .toDF("user_id", "feature", "has_grant")
      val svc = new AccessService(spark, grants, CircuitStore.read(spark, table))
      assert(svc.canAccess(1L, "purchase"))
      assert(!svc.canAccess(1L, "message"))
    } finally CircuitStore.drop(spark, table)
  }

  test("upsert keeps features absent from the batch and takes the latest window") {
    import spark.implicits._
    val table = "cs_merge"
    CircuitStore.drop(spark, table)
    try {
      CircuitStore.upsert(spark,
        Seq(("purchase", t(0), true), ("message", t(0), false))
          .toDF("feature", "win_start", "circuit_open"), table)
      // next batch: purchase closes in a LATER window; message absent
      CircuitStore.upsert(spark,
        Seq(("purchase", t(5), true), ("purchase", t(10), false))
          .toDF("feature", "win_start", "circuit_open"), table)
      val got = CircuitStore.read(spark, table).collect()
        .map(r => r.getString(0) -> r.getBoolean(1)).toMap
      assert(got == Map("purchase" -> false, "message" -> false))
    } finally CircuitStore.drop(spark, table)
  }
}
