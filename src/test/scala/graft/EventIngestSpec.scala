package graft

import graft.sources.EventIngest
import graft.streaming.EventPipeline.EventRow
import org.scalatest.funsuite.AnyFunSuite

/** Ingest routing, mirroring the reference's 400 paths: unknown event
  * name (app.py:22-24) and schema-invalid properties (app.py:36-41) go
  * to the dead letter; valid rows come out typed. */
class EventIngestSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def ev(id: Long, typ: String, props: String): EventRow =
    EventRow(id, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      1L, typ, 1.0, props)

  test("routes unknown types, invalid JSON, and missing fields to dead letter") {
    import spark.implicits._
    val raw = Seq(
      ev(1, "click", """{"k": 5}"""),     // valid
      ev(2, "view", """{"k": 5}"""),      // unknown type
      ev(3, "click", """not json"""),     // unparseable
      ev(4, "click", """{"other": 1}"""), // missing required k
      ev(5, "purchase", """{"k": 0}""")   // k=0 is valid (no falsy drop)
    ).toDF()
    val (valid, dead) = EventIngest.parse(raw)
    assert(valid.select("event_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 5L))
    val reasons = dead.select("event_id", "reject_reason").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(reasons == Map(
      2L -> "unknown_event_type",
      3L -> "invalid_properties",
      4L -> "invalid_properties"))
  }

  test("valid rows expose the typed props struct") {
    import spark.implicits._
    val (valid, _) = EventIngest.parse(Seq(ev(1, "click", """{"k": 42}""")).toDF())
    assert(valid.select("props_parsed.k").head().getLong(0) == 42L)
  }

  test("heterogeneous registry: per-type schemas with distinct required fields") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // the reference's per-type property shapes (models/event.py:12-25):
    // add_credit_card{zipcode: str}, chargeback{amount: float},
    // scam_flag{} — one wide nullable struct per distinct schema
    val registry = Seq(
      EventIngest.EventTypeSchema("add_credit_card",
        StructType(Seq(StructField("zipcode", StringType))), Seq("zipcode")),
      EventIngest.EventTypeSchema("chargeback",
        StructType(Seq(StructField("amount", DoubleType))), Seq("amount")),
      EventIngest.EventTypeSchema("scam_flag",
        StructType(Seq(StructField("ignored", StringType))), Seq.empty))
    val raw = Seq(
      ev(1, "add_credit_card", """{"zipcode": "94110"}"""), // valid
      ev(2, "add_credit_card", """{"amount": 3.5}"""),      // missing zipcode
      ev(3, "chargeback", """{"amount": 12.5}"""),          // valid
      ev(4, "chargeback", """{"zipcode": "x"}"""),          // missing amount
      ev(5, "scam_flag", """{}""")                          // no required fields
    ).toDF()
    val (valid, dead) = EventIngest.parse(raw, registry)
    assert(valid.select("event_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L, 5L))
    assert(dead.select("event_id", "reject_reason").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(2L -> "invalid_properties", 4L -> "invalid_properties"))
  }

  test("observe metrics: batch counters equal the classify truth, no second pass") {
    import spark.implicits._
    val raw = Seq(
      ev(1, "click", """{"k": 5}"""),
      ev(2, "view", """{"k": 5}"""),
      ev(3, "click", """not json"""),
      ev(4, "click", """{"other": 1}"""),
      ev(5, "purchase", """{"k": 0}""")
    ).toDF()
    val obs = new org.apache.spark.sql.Observation("ingest_batch")
    val c = EventIngest.classify(raw)
      .observe(obs, EventIngest.metricExprs.head, EventIngest.metricExprs.tail: _*)
    c.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("n_total") == 5L && m("n_valid") == 2L &&
      m("n_unknown_type") == 1L && m("n_invalid_props") == 2L, m.toString)
  }

  test("observe metrics: streaming progress carries per-batch ingest counters") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[EventRow](spark)
    val q = EventIngest.observed(EventIngest.classify(ms.toDF()))
      .writeStream.format("noop")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ingest_obs").toString)
      .start()
    try {
      ms.addData(ev(1, "click", """{"k": 5}"""), ev(2, "view", """{"k": 5}"""),
        ev(3, "click", """not json"""))
      q.processAllAvailable()
      val om = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("ingest_metrics"))).lastOption
        .getOrElse(fail("no observed metrics in progress"))
      assert(om.getAs[Long]("n_total") == 3L && om.getAs[Long]("n_valid") == 1L &&
        om.getAs[Long]("n_unknown_type") == 1L &&
        om.getAs[Long]("n_invalid_props") == 1L)
    } finally q.stop()
  }
}
