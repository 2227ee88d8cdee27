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
  * n_features rows — the merge cost is nil; the same staged-rename
  * swap as GrantStore keeps the write atomic for readers resolving the
  * table by name. */
object CircuitStore {

  val DefaultTable = "graft_circuits"

  def read(spark: SparkSession, table: String = DefaultTable): DataFrame =
    spark.table(table)

  /** Upsert the latest window verdict per feature from a batch of
    * breaker windows `[feature, win_start, ..., circuit_open]`. */
  def upsert(spark: SparkSession, windows: DataFrame,
             table: String = DefaultTable): Unit = {
    val latest = windows.groupBy(col("feature"))
      .agg(max_by(col("circuit_open"), col("win_start")).as("new_open"))
    if (latest.isEmpty) return
    if (!spark.catalog.tableExists(table)) {
      latest.select(col("feature"), col("new_open").as("circuit_open"))
        .write.format("parquet").saveAsTable(table)
    } else {
      val merged = spark.table(table)
        .join(broadcast(latest), Seq("feature"), "full_outer")
        .select(col("feature"),
          coalesce(col("new_open"), col("circuit_open")).as("circuit_open"))
      val staging = table + "__staging"
      merged.write.format("parquet").mode("overwrite").saveAsTable(staging)
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      spark.sql(s"ALTER TABLE `$staging` RENAME TO `$table`")
    }
  }

  /** Streaming sink over the per-feature breaker output. */
  def writer(circuitWindows: DataFrame,
             table: String = DefaultTable): DataStreamWriter[Row] =
    circuitWindows.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsert(batch.sparkSession, batch, table)
      }
}
