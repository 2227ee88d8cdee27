package graft.sources

import graft.functions.expressions.ZOrderCode
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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

  /** Z-value column over 2-4 numeric columns: each is min/max-scaled
    * to a 16-bit lane (ONE tiny stats action over the input — the
    * CorpusWriter pre-count convention) and Morton-interleaved
    * ([[ZOrderCode]]). NULLs scale to lane 0. */
  def zorderColumn(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.size >= 2 && cols.size <= 4,
      s"zorder needs 2-4 columns, got ${cols.size}")
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"min_$c"),
      max(col(c).cast("double")).as(s"max_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val lanes = cols.zipWithIndex.map { case (c, i) =>
      // empty/all-null input: any constant lane works; scale from 0
      val lo = if (stats.isNullAt(2 * i)) 0.0 else stats.getDouble(2 * i)
      val hi = if (stats.isNullAt(2 * i + 1)) 1.0 else stats.getDouble(2 * i + 1)
      val span = if (hi > lo) hi - lo else 1.0
      coalesce(
        ((col(c).cast("double") - lit(lo)) * lit(65535.0 / span)).cast("int"),
        lit(0))
    }
    ZOrderCode(lanes: _*)
  }

  /** Write `df` as ~`files` z-ordered parquet files: range-partition
    * on the z-value (so each FILE owns a compact z-range = a compact
    * hyper-rectangle of the lane space) and sort by it within files
    * (so ROW GROUPS do too). Every z-order column then has tight
    * per-file and per-row-group min/max stats — a range predicate on
    * ANY of them skips most of the layout, where a lexicographic sort
    * serves only its leading column (measured in LayoutsSpec). This is
    * the layout story for 100 TB corpus scans filtered by more than
    * one dimension (e.g. quality score x length x language id). */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                    files: Int): Unit =
    df.withColumn("__z", zorderColumn(df, cols))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
}
