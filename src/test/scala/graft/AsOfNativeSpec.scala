package graft

import graft.operators.{AsOf, AsOfNative}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native as-of plan node vs the union+window composition: identical
  * results on adversarial data (duplicate times, missing keys, equal
  * (key,time) ties), and the physical plan actually uses AsOfJoinExec. */
class AsOfNativeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("matches AsOf.join on adversarial cases") {
    import spark.implicits._
    val probe = Seq(
      (1L, 10L, ts(5)), (1L, 11L, ts(9)), (1L, 12L, ts(2)),
      (2L, 13L, ts(5)), (3L, 14L, ts(1)))
      .toDF("k", "pid", "pt")
    val build = Seq(
      (1L, 100L, ts(2)), (1L, 101L, ts(7)), (1L, 102L, ts(7)), // tie at 7
      (2L, 103L, ts(6)))
      .toDF("k", "bid", "bt")

    val composed = AsOf.join(probe, build, "k", "pt", "bt", "pid", "bid", Seq("bid"))
      .collect().map(r => r.getLong(1) -> Option(r.get(3))).toMap

    val native = AsOfNative.join(probe, build, "k", "pt", "bt", "pid", "bid")
      .toDF("k", "pid", "pt", "bk", "bid", "bt")
      .select(col("pid"), col("bid"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

    assert(native == composed)
    assert(native == Map(
      10L -> Some(100L), // t=5 → build at 2
      11L -> Some(102L), // t=9 → latest of the t=7 tie (higher bid)
      12L -> Some(100L), // t=2 → inclusive match
      13L -> None,       // build at 6 is in the future
      14L -> None))      // key 3 has no build rows
  }

  test("plans through AsOfJoinExec") {
    import spark.implicits._
    val probe = Seq((1L, 1L, ts(1))).toDF("k", "pid", "pt")
    val build = Seq((1L, 2L, ts(1))).toDF("k", "bid", "bt")
    val df = AsOfNative.join(probe, build, "k", "pt", "bt", "pid", "bid")
    df.collect() // finalize AQE so the real physical plan is visible
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("AsOfJoin"), s"plan was:\n$plan")
  }

  test("agrees with the composed as-of on real event data") {
    val e = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("cts"))
    val composed = AsOf.join(purchases,
        clicks.withColumnRenamed("cts", "ts"),
        "user_id", "ts", "ts", "event_id", "click_id", Seq("click_id"))
      .select(col("event_id"), col("asof_click_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val native = AsOfNative.join(purchases, clicks.withColumnRenamed("user_id", "k")
        .withColumnRenamed("k", "user_id"), // no-op, keeps key name aligned
        "user_id", "ts", "cts", "event_id", "click_id")
      .toDF("user_id", "event_id", "ts", "b_user_id", "click_id", "cts")
      .select(col("event_id"), col("click_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(native == composed)
  }
}
