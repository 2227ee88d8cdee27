package graft

import graft.config.DefaultConfig
import graft.operators.{EventAggregates, Grants}
import graft.streaming.EventPipeline.EventRow
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.3): uuid-dedup idempotence
  * and grant determinism under duplication/shuffling of the event log.
  * Raw ScalaCheck generators with fixed seeds (the scalatest bridge
  * artifact is not on the offline resolver). */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private lazy val spark = SparkTestSession.spark
  private val cfg = DefaultConfig.config

  private val genEvent: Gen[EventRow] = for {
    id <- Gen.choose(1L, 40L)
    user <- Gen.choose(1L, 4L)
    typ <- Gen.oneOf("click", "signup", "purchase", "error", "view")
    value <- Gen.choose(0.0, 500.0)
    k <- Gen.choose(0L, 5L)
    minute <- Gen.choose(0, 59)
  } yield EventRow(id, java.sql.Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"),
    user, typ, math.rint(value * 100) / 100, s"""{"k": $k}""")

  private def grantsOf(events: Seq[EventRow]): Map[(Long, String), Boolean] = {
    import spark.implicits._
    Grants.long(EventAggregates.perUser(events.toDF(), cfg.aggregates), cfg)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getBoolean(2)).toMap
  }

  test("re-sending any suffix of the event log never changes aggregates/grants") {
    samples(Gen.listOfN(25, genEvent), 8).foreach { events =>
      // uuid identifies payload: dedupe the generated ids first so
      // duplicates we add are true re-sends of the same event
      val base = events.groupBy(_.event_id).map(_._2.head).toSeq
      val withResends = base ++ base.takeRight(base.length / 2)
      assert(grantsOf(base) == grantsOf(withResends))
    }
  }

  test("event order within the log does not affect final aggregates") {
    samples(Gen.listOfN(20, genEvent), 8).foreach { events =>
      val base = events.groupBy(_.event_id).map(_._2.head).toSeq
      assert(grantsOf(base) == grantsOf(base.reverse))
    }
  }
}
