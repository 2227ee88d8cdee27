package graft

import graft.config._
import graft.operators.EventAggregates
import graft.streaming.EventPipeline.EventRow
import org.scalatest.funsuite.AnyFunSuite

/** Aggregate semantics, mirroring the reference suite
  * (tests/test_aggregates.py): uuid dedup (:104-130), per-user
  * isolation (:56-101), sum accumulation (:133-169) — plus the
  * documented divergence: zero field values are VALID here (the
  * reference's falsy-drop, aggregate.py:72-78, is a bug we fix). */
class EventAggregatesSpec extends AnyFunSuite {
  import AggregateType._

  private lazy val spark = SparkTestSession.spark

  private val specs = Seq(
    AggregateSpec("n_purchases", "purchase", Count),
    AggregateSpec("purchase_sum", "purchase", Sum, Some("value")),
    AggregateSpec("distinct_keys", "click", DistinctCount, Some("props.k")))

  private def ev(id: Long, user: Long, typ: String, value: Double = 0.0,
                 props: String = "{}"): EventRow =
    EventRow(id, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      user, typ, value, props)

  private def run(events: Seq[EventRow]): Map[Long, (Long, Double, Long)] = {
    import spark.implicits._
    EventAggregates.perUser(events.toDF(), specs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
  }

  test("duplicate event uuids are counted once (COUNT and SUM)") {
    val out = run(Seq(
      ev(1, 10, "purchase", 50.0),
      ev(1, 10, "purchase", 50.0), // same uuid → ignored
      ev(2, 10, "purchase", 30.0)))
    assert(out(10)._1 == 2)
    assert(out(10)._2 == 80.0)
  }

  test("users are isolated") {
    val out = run(Seq(
      ev(1, 10, "purchase", 5.0),
      ev(2, 20, "purchase", 7.0)))
    assert(out(10)._2 == 5.0 && out(20)._2 == 7.0)
  }

  test("distinct count over a JSON props field") {
    val out = run(Seq(
      ev(1, 10, "click", props = """{"k": 1}"""),
      ev(2, 10, "click", props = """{"k": 1}"""),
      ev(3, 10, "click", props = """{"k": 2}"""),
      ev(4, 10, "click", props = """{"k": 0}"""))) // 0 is a VALID value
    assert(out(10)._3 == 3)
  }

  test("zero-valued sums are not dropped (reference falsy-bug fixed)") {
    val out = run(Seq(
      ev(1, 10, "purchase", 0.0),
      ev(2, 10, "purchase", 10.0)))
    assert(out(10)._1 == 2)
    assert(out(10)._2 == 10.0)
  }

  test("events of other types do not contribute") {
    val out = run(Seq(
      ev(1, 10, "purchase", 5.0),
      ev(2, 10, "error", 99.0)))
    assert(out(10)._2 == 5.0)
  }
}
