package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Persisted per-feature circuit state `[feature, circuit_open]` — the
  * serve-path counterpart of GrantStore for the breaker side
  * (reference `_circuits`, user_feature.py:26). The per-feature
  * streaming breaker (`Windowed.featureCircuitStream`) appends
  * finalized windows; each batch upserts every feature's LATEST window
  * verdict, so `AccessService(grants = GrantStore.read, circuits =
  * CircuitStore.read)` serves live state across restarts. The table is
  * n_features rows — the merge cost is nil — and publishes through the
  * same generation-table + CREATE OR REPLACE VIEW pointer as
  * GrantStore: the repoint is one catalog operation, so readers never
  * see a missing table and a crash mid-publish leaves the old
  * generation served. */
object CircuitStore {

  val DefaultTable = "graft_circuits"

  private def generations(table: String): (String, String) =
    (table + "__a", table + "__b")

  private def inactiveGen(spark: SparkSession, table: String): String = {
    val (a, b) = generations(table)
    if (!spark.catalog.tableExists(table)) a
    else {
      val ddl = spark.sql(s"SHOW CREATE TABLE `$table`").head().getString(0)
      if (ddl.contains(a)) b else a
    }
  }

  private def publish(spark: SparkSession, table: String, gen: String): Unit =
    spark.sql(s"CREATE OR REPLACE VIEW `$table` AS SELECT * FROM `$gen`")

  /** Drop the view and both generations (test/cleanup utility). */
  def drop(spark: SparkSession, table: String): Unit = {
    val (a, b) = generations(table)
    spark.sql(s"DROP VIEW IF EXISTS `$table`")
    spark.sql(s"DROP TABLE IF EXISTS `$a`")
    spark.sql(s"DROP TABLE IF EXISTS `$b`")
  }

  def read(spark: SparkSession, table: String = DefaultTable): DataFrame =
    spark.table(table)

  /** Upsert the latest window verdict per feature from a batch of
    * breaker windows `[feature, win_start, ..., circuit_open]`. */
  def upsert(spark: SparkSession, windows: DataFrame,
             table: String = DefaultTable): Unit = {
    val latest = windows.groupBy(col("feature"))
      .agg(max_by(col("circuit_open"), col("win_start")).as("new_open"))
      .persist()
    try {
      if (latest.isEmpty) return
      val merged =
        if (!spark.catalog.tableExists(table))
          latest.select(col("feature"), col("new_open").as("circuit_open"))
        else spark.table(table)
          .join(broadcast(latest), Seq("feature"), "full_outer")
          .select(col("feature"),
            coalesce(col("new_open"), col("circuit_open")).as("circuit_open"))
      val gen = inactiveGen(spark, table)
      merged.write.format("parquet")
        .mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(gen)
      publish(spark, table, gen)
    } finally latest.unpersist()
  }

  /** Streaming sink over the per-feature breaker output. */
  def writer(circuitWindows: DataFrame,
             table: String = DefaultTable): DataStreamWriter[Row] =
    circuitWindows.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsert(batch.sparkSession, batch, table)
      }
}
