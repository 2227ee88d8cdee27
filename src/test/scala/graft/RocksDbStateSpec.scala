package graft

import graft.config.DefaultConfig
import graft.streaming.EventPipeline
import graft.streaming.EventPipeline.{EventRow, GrantChange}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming pipeline on the RocksDB state store (the at-scale
  * backend GraftSession.withRocksDbState configures): same flips as the
  * default HDFS-backed store. Needs its own session — the provider is
  * per-session config. */
class RocksDbStateSpec extends AnyFunSuite {

  test("grant CDC produces identical flips on RocksDB state") {
    // isolated session: getOrCreate would apply the provider conf to
    // the SHARED session and pollute every other suite
    val spark = SparkTestSession.spark.newSession()
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    def ev(id: Long, user: Long, typ: String, value: Double, minute: Int): EventRow =
      EventRow(id, java.sql.Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"),
        user, typ, value, """{"k": 1}""")
    val ms = MemoryStream[EventRow](spark)
    val q = EventPipeline.grantChanges(spark, ms.toDS(), DefaultConfig.config)
      .writeStream.format("memory").queryName("rocks_flips")
      .outputMode("append").start()
    try {
      ms.addData(Seq(ev(1, 9, "purchase", 600.0, 1)))
      q.processAllAvailable()
      ms.addData(Seq(ev(2, 9, "error", 900.0, 2))) // state read back from RocksDB
      q.processAllAvailable()
    } finally q.stop()
    val flips = spark.table("rocks_flips").as[GrantChange].collect().toSeq
    assert(flips == Seq(GrantChange(9, "purchase", false)))
  }
}
