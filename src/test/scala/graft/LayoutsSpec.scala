package graft

import graft.sources.Layouts
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Date-partitioned event layout: a time-bounded query must prune to
  * the matching date directories at PLANNING time (PartitionFilters),
  * not just push predicates into the row groups. */
class LayoutsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("a date-bounded scan prunes partitions, not just row groups") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val events = (0 until 300).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-${i % 10 + 1}%02d 12:00:00"),
        i.toLong % 50, "click", 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    Layouts.writeEventsByDay(events, dir)

    val bounded = Layouts.readEvents(spark, dir)
      .filter(col("event_date") === lit("2024-01-03"))
    assert(bounded.count() == 30)

    def scan(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
      df.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case s: FileSourceScanExec => s }.get

    val prunedScan = scan(bounded)
    val fullScan = scan(Layouts.readEvents(spark, dir))
    // the date predicate is a partition filter, applied at planning time
    assert(prunedScan.partitionFilters.nonEmpty,
      "date predicate did not reach PartitionFilters")
    // and the pruned scan reads strictly fewer files than the full scan
    val prunedFiles = prunedScan.relation.location
      .listFiles(prunedScan.partitionFilters, prunedScan.dataFilters)
      .map(_.files.length).sum
    val allFiles = fullScan.relation.location
      .listFiles(Nil, Nil).map(_.files.length).sum
    assert(prunedFiles < allFiles, s"pruned=$prunedFiles all=$allFiles")
  }
}
