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
}
