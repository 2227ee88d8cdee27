package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Time-partitioned event layout: the other half of the warehouse
  * story next to `Bucketed`. A 100 TB event table is written
  * `PARTITION BY event_date` so time-bounded queries (every sliding
  * window, every breaker evaluation, every incremental backfill) touch
  * only the matching date directories — partition PRUNING at planning
  * time, before a single row is read, complementing row-group predicate
  * pushdown inside each file. LayoutsSpec asserts the pruned scan reads
  * strictly fewer files and carries the predicate in `PartitionFilters`.
  */
object Layouts {

  /** Write events partitioned by UTC event date. */
  def writeEventsByDay(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("event_date")
      .parquet(path)

  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
