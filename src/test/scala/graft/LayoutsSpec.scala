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

  /** Per-file (min,max) bounding box of two columns, one entry per
    * data file — the stats a reader prunes against. */
  private def bboxes(dir: String): Seq[((Long, Long), (Long, Long))] = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    files.toSeq.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("x"), max("x"), min("y"), max("y")).head()
      ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))
    }
  }

  private def touched(boxes: Seq[((Long, Long), (Long, Long))],
                      x: Option[(Long, Long)], y: Option[(Long, Long)]): Int =
    boxes.count { case ((xlo, xhi), (ylo, yhi)) =>
      x.forall { case (lo, hi) => xhi >= lo && xlo <= hi } &&
        y.forall { case (lo, hi) => yhi >= lo && ylo <= hi }
    }

  test("z-ordered files give BOTH dimensions pruning power; lex sort only the first") {
    import spark.implicits._
    val zdir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val ldir = java.nio.file.Files.createTempDirectory("graft_lex").toString
    // the full 256x256 grid: two independent uniform dimensions
    val grid = spark.range(65536)
      .selectExpr("id % 256 AS x", "id DIV 256 AS y", "id AS payload")
    Layouts.writeZOrdered(grid, zdir, Seq("x", "y"), files = 16)
    // the lexicographic strawman at the same file count: range by x
    // (the leading sort column), sort (x, y) within files
    grid.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(ldir)

    val zb = bboxes(zdir)
    val lb = bboxes(ldir)
    assert(zb.size == 16 && lb.size == 16, s"z=${zb.size} lex=${lb.size}")

    // box query on both dims (1/16 of the grid): z-order isolates it
    // to ~1 file (a 64x64 block is ONE contiguous z-range; range-
    // partition boundary slop can add a neighbor)
    val zBox = touched(zb, Some((0L, 63L)), Some((0L, 63L)))
    val lBox = touched(lb, Some((0L, 63L)), Some((0L, 63L)))
    assert(zBox <= 3, s"z-order box query touched $zBox files")
    assert(zBox <= lBox, s"z=$zBox lex=$lBox")

    // y-only strip (the dimension lex sort can't serve): every lex
    // file spans all y; z-order files are compact in y too
    val zStrip = touched(zb, None, Some((0L, 63L)))
    val lStrip = touched(lb, None, Some((0L, 63L)))
    assert(lStrip == 16, s"lex strip query should touch everything, got $lStrip")
    assert(zStrip <= 8, s"z-order strip query touched $zStrip of 16 files")

    // layout is lossless
    assert(spark.read.parquet(zdir).count() == 65536)
  }

  test("zorder_code SQL surface and null routing") {
    val z = spark.sql("SELECT zorder_code(3, 5) AS z").head().getLong(0)
    assert(z == graft.functions.expressions.ZOrderOps.z2(3, 5))
    // interleave identity: lane a in even bits, lane b in odd bits
    assert(graft.functions.expressions.ZOrderOps.z2(0xFFFF, 0) == 0x55555555L)
    assert(graft.functions.expressions.ZOrderOps.z2(0, 0xFFFF) == 0xAAAAAAAAL)
    val zn = spark.sql("SELECT zorder_code(CAST(NULL AS INT), 1) AS z").head().getLong(0)
    assert(zn == graft.functions.expressions.ZOrderOps.z2(0, 1))
  }
}
