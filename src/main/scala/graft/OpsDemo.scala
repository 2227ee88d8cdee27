package graft

import org.apache.spark.sql.functions._

/** End-to-end walkthrough of the TELEMETRY-ANALYTICS side of the
  * engine — the ops dashboard a pipeline operator reads, plus the
  * supervised export it hands to a trainer. Each stage is a
  * registered (oracle-gated) query, here consumed through the SQL
  * view surface exactly as a dashboard would:
  *
  *   funnel report → retention triangle → gap-filled daily series
  *   with anomaly flags → behavioral motifs → point-in-time features
  *   ⨝ forward labels (the leak-free training_set) → streaming
  *   anomaly store stood up via GRAFT BUILD DAILY → multi-touch
  *   attribution → the basket recommender: GRAFT BUILD BASKET, a
  *   bucket-pruned "also bought" lookup, and its leave-one-out
  *   hit-rate eval.
  *
  * Usage: runMain graft.OpsDemo [sfDir]
  */
object OpsDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builder("local[4]", shufflePartitions = 4)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftViews.register(spark, sfDir)

    println("== 1. conversion funnel (24h step windows) ==")
    spark.sql("SELECT * FROM funnel_report ORDER BY stage").show(false)

    println("== 2. cohort retention triangle ==")
    spark.sql(
      """SELECT cohort_week, week_offset, n_users, retention_rate
        |FROM retention_triangle ORDER BY cohort_week, week_offset""".stripMargin)
      .show(20, false)

    println("== 3. daily series: gaps filled, anomalies flagged ==")
    spark.sql(
      """SELECT s.event_type, s.day, s.n_events, s.cum_revenue,
        |       a.anomaly
        |FROM daily_series s JOIN daily_anomalies a
        |  ON s.event_type = a.event_type AND s.day = a.day
        |WHERE a.anomaly ORDER BY s.event_type, s.day""".stripMargin)
      .show(10, false)

    println("== 4. behavioral motifs (top by support) ==")
    spark.sql(
      "SELECT * FROM behavior_motifs ORDER BY n DESC, motif LIMIT 10")
      .show(false)

    println("== 5. the leak-free supervised export ==")
    val ts = spark.table("training_examples")
    val n = ts.count()
    val pos = ts.filter(col("will_purchase_24h")).count()
    println(s"training examples: $n, positive rate ${"%.3f".format(pos.toDouble / n)}")
    ts.orderBy("click_id").show(5, false)

    println("== 6. the anomaly store, stood up from SQL ==")
    spark.sql("GRAFT BUILD DAILY ops_demo_daily FROM events BUCKETS 4").show(false)
    val flags = graft.streaming.AnomalyMonitorStream
      .anomalies(spark, "ops_demo_daily")
    println(s"store-served anomaly days: ${flags.filter(col("anomaly")).count()}")
    graft.streaming.AnomalyMonitorStream.drop(spark, "ops_demo_daily")

    println("== 7. multi-touch attribution (linear + time-decay) ==")
    SparkEntry.queries("attribution_multitouch")(spark, sfDir)
      .orderBy(col("purchase_id"), col("click_id")).show(5, false)

    println("== 8. the basket recommender: build, probe, evaluate ==")
    spark.sql("SELECT l_orderkey AS o, l_partkey AS i FROM lineitem")
      .createOrReplaceTempView("ops_demo_lines")
    spark.sql(
      "GRAFT BUILD BASKET ops_demo_mb_ FROM ops_demo_lines BUCKETS 4")
      .show(false)
    val top = graft.streaming.BasketStream.cosine(spark, "ops_demo_mb_")
      .orderBy(col("support_cnt").desc, col("i1")).limit(1).collect()
    top.headOption.foreach { r =>
      val item = r.getLong(0)
      println(s"customers who bought part $item also bought (bucket-pruned probe):")
      // bucket count resolves from the store's catalog (built above
      // with BUCKETS 4) — the caller doesn't track the layout
      graft.streaming.BasketStream
        .recsTopK(spark, item, 5, "ops_demo_mb_").show(false)
    }
    SparkEntry.queries("basket_rec_recall")(spark, sfDir).show(false)
    graft.streaming.BasketStream.drop(spark, "ops_demo_mb_")

    spark.stop()
  }
}
