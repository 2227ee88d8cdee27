package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** checkpointKeepPartitioning's conf-toggle contract (VERDICT r21 #4):
  * the AQE flag is session-global, so concurrent materializations used
  * to race on set/restore — a thread snapshotting another's "false" as
  * its restore value left the session planning non-adaptively forever.
  * The per-session lock makes toggle → materialize → restore atomic. */
class PlanUtilSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("concurrent partitionedCheckpoints restore AQE and both keep their hash partitioning") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val fs = (1 to 4).map { i =>
        Future {
          val df = spark.range(1000 * i)
            .select((col("id") % 97).as("k"), col("id").as("v"))
          PlanUtil.partitionedCheckpoint(df, col("k"))
        }
      }
      val frames = Await.result(Future.sequence(fs), 120.seconds)
      // the toggle restored the session flag (the lost-update race left
      // it "false" here before the lock)
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
        "AQE flag not restored after concurrent memo builds")
      // and each materialization still reports its hash partitioning —
      // i.e. the toggle was actually in force for every build
      frames.foreach { f =>
        assert(PlanUtil.isHashPartitionedBy(f, "k"),
          "a concurrent build lost its hash partitioning")
      }
      // a query planned AFTER the builds is adaptive again
      val plan = spark.range(10).groupBy((col("id") % 3).as("g")).count()
        .queryExecution.executedPlan
      assert(plan.toString.contains("AdaptiveSparkPlan"),
        "session no longer plans adaptively after memo builds")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
