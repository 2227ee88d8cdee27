package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The fixture generator has shipped `events.ts` as three different
  * parquet physical types across rounds: TIMESTAMP(NANOS) (read as a
  * long under nanosAsLong), timestamp[us] WITHOUT isAdjustedToUTC
  * (Spark 4 infers TIMESTAMP_NTZ — which `unix_micros` and
  * session-window start extraction reject), and plain TIMESTAMP.
  * `Tables.normalizeTs` is the one seam that folds all three to a
  * microsecond TimestampType; this spec pins each branch so a future
  * fixture regeneration cannot silently knock out the
  * timestamp-consuming queries again (round 8 lost 4 of them to the
  * NTZ flip). */
class TablesTsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val usec = 1704067200000000L // 2024-01-01T00:00:00Z in epoch-µs

  test("NTZ ts normalizes to TimestampType at the same UTC instant") {
    import spark.implicits._
    val ntz = Seq(1L).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(usec)).cast(TimestampNTZType))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val out = graft.sources.Tables.normalizeTs(ntz)
    assert(out.schema("ts").dataType == TimestampType)
    // session tz is pinned UTC, so the naive wall-clock maps back to
    // the identical instant — unix_micros both resolves AND agrees
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == usec)
  }

  test("nanos-long ts floor-converts to µs TimestampType") {
    import spark.implicits._
    val nanos = Seq((1L, usec * 1000L + 999L)).toDF("event_id", "ts")
    val out = graft.sources.Tables.normalizeTs(nanos)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == usec)
  }

  test("already-TimestampType ts passes through untouched") {
    import spark.implicits._
    val tz = Seq(1L).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(usec)))
    val out = graft.sources.Tables.normalizeTs(tz)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == usec)
  }

  test("fixture events read lands on TimestampType (whatever the file has)") {
    val e = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    assert(e.schema("ts").dataType == TimestampType)
    // and the timestamp-consuming surface works end to end
    assert(e.select(unix_micros(col("ts"))).limit(5).count() == 5)
  }
}
