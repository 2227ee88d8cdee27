package graft

import graft.config.DefaultConfig
import graft.streaming.EventPipeline
import graft.streaming.EventPipeline.{EventRow, GrantChange}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** transformWithState (StatefulProcessor) path: identical grant flips
  * to the flatMapGroupsWithState path, including state carried across
  * micro-batches through the RocksDB-backed store v2. */
class TransformWithStateSpec extends AnyFunSuite {

  private def ev(id: Long, user: Long, typ: String, value: Double, minute: Int): EventRow =
    EventRow(id, java.sql.Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"),
      user, typ, value, """{"k": 1}""")

  test("tws pipeline emits the same flips across micro-batches") {
    // isolated session: transformWithState streaming requires the
    // RocksDB state store provider, a per-session conf
    val spark = SparkTestSession.spark.newSession()
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    val ms = MemoryStream[EventRow](spark)
    val q = EventPipeline.grantChangesTws(spark, ms.toDS(), DefaultConfig.config)
      .writeStream.format("memory").queryName("tws_flips")
      .outputMode("append").start()
    try {
      ms.addData(Seq(ev(1, 9, "purchase", 600.0, 1)))
      q.processAllAvailable()
      // second batch: state (purchase sum) must be read back
      ms.addData(Seq(ev(2, 9, "error", 900.0, 2))) // ratio 1.5 → revoke
      q.processAllAvailable()
      ms.addData(Seq(ev(3, 9, "purchase", 2000.0, 3))) // ratio 0.31 → re-grant
      q.processAllAvailable()
    } finally q.stop()
    val flips = spark.table("tws_flips").as[GrantChange].collect().toSeq
    assert(flips == Seq(
      GrantChange(9, "purchase", false), GrantChange(9, "purchase", true)))
  }

  test("tws and fmgws paths agree on a multi-user batch") {
    val spark = SparkTestSession.spark.newSession()
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    val events = Seq(
      ev(1, 1, "purchase", 600.0, 1), ev(2, 1, "error", 900.0, 2),
      ev(3, 2, "purchase", 100.0, 1), ev(4, 2, "purchase", 800.0, 3),
      ev(5, 3, "error", 1.0, 1), ev(6, 3, "error", 2.0, 2))

    def run(name: String,
            pipe: (org.apache.spark.sql.SparkSession,
                   org.apache.spark.sql.Dataset[EventRow],
                   graft.config.EngineConfig) =>
              org.apache.spark.sql.Dataset[GrantChange]): Set[GrantChange] = {
      val ms = MemoryStream[EventRow](spark)
      val q = pipe(spark, ms.toDS(), DefaultConfig.config)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try { ms.addData(events); q.processAllAvailable() } finally q.stop()
      spark.table(name).as[GrantChange].collect().toSet
    }

    val tws = run("parity_tws", EventPipeline.grantChangesTws)
    val fmg = run("parity_fmg", EventPipeline.grantChanges)
    assert(tws == fmg)
    assert(tws.contains(GrantChange(1, "purchase", false)))
  }
}
