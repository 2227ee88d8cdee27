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
                    files: Int): Unit = {
    val spark = df.sparkSession
    // File boundaries ARE the skipping index: range bounds off by a
    // percentile smear a z-block across an extra file, and Spark's
    // default range-exchange sample (100 rows/partition) leaves
    // exactly that slop — box queries touched a nondeterministic
    // 2-4 files in LayoutsSpec. A layout write is a once-per-table
    // maintenance pass, so pay for near-exact bounds: one denser
    // sample per write, restored afterwards.
    val key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "20000")
    try {
      df.withColumn("__z", zorderColumn(df, cols))
        .repartitionByRange(files, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(SaveMode.Overwrite).parquet(path)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  /** One leaf directory's before/after in a [[compactLeaves]] run. */
  final case class CompactionStat(dir: String, filesBefore: Int,
                                  filesAfter: Int, bytes: Long)

  /** Default compaction target: the usual parquet sweet spot, one
    * HDFS-block-ish file per split. */
  val DefaultTargetBytes: Long = 128L * 1024 * 1024

  private val CompactTmp = "_compacting"
  private val CompactMarker = "_compact_commit"

  /** Bin-pack the small files of a partitioned parquet layout — the
    * maintenance pass every streaming/incremental writer needs: each
    * micro-batch (or each salted writer task) leaves files far below
    * the scan-efficient size, and a 100 TB table accumulates millions
    * of them until listing and task scheduling dominate query time.
    *
    * Walks the tree under `root` (driver-side listing — bounded by the
    * layout, not the data), and for every LEAF directory whose data
    * files outnumber `ceil(bytes / targetBytes)` rewrites them into
    * exactly that many files via a shuffle-free `coalesce`. Rows of
    * each source file stay contiguous in the output, so existing
    * row-group min/max stats survive piecewise and sort-based skipping
    * keeps working. Leaves already at or under target are untouched
    * (idempotent: a second run is a no-op).
    *
    * Each leaf is rewritten through a hidden `_compacting` scratch dir
    * (invisible to Spark readers) and published by a COMMIT-MARKER
    * protocol: once the full replacement exists in scratch, a hidden
    * `_compact_commit` marker naming the original files is written,
    * THEN originals are deleted and the scratch files move in, then
    * the marker drops. A crash anywhere after the marker is recovered
    * by the next run (it finishes deleting the named originals and
    * adopting the scratch files — no row is ever lost or duplicated);
    * a crash before the marker just leaves stale scratch that the
    * next run rebuilds. Like any direct-filesystem rewrite this is
    * NOT atomic under CONCURRENT readers — run it as the
    * single-writer maintenance job it is, or target a table format
    * where the same operation commits through the log (Delta OPTIMIZE
    * / Iceberg rewrite_data_files).
    */
  def compactLeaves(spark: SparkSession, root: String,
                    targetBytes: Long = DefaultTargetBytes,
                    parallelism: Int = 8): Seq[CompactionStat] = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    require(parallelism > 0, s"parallelism must be positive, got $parallelism")
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def isHidden(name: String) = name.startsWith("_") || name.startsWith(".")

    // leaf dirs with visible parquet data files, depth-first
    def leaves(dir: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val entries = fs.listStatus(dir).filterNot(e => isHidden(e.getPath.getName))
      val subs = entries.filter(_.isDirectory).flatMap(e => leaves(e.getPath))
      if (entries.exists(e => e.isFile && e.getPath.getName.endsWith(".parquet")))
        subs.toSeq :+ dir
      else subs.toSeq
    }

    // Finish a publish whose marker is durable: the scratch dir held
    // the COMPLETE replacement when the marker was written, so delete
    // whichever named originals survive, adopt whatever is still in
    // scratch, drop the marker. Every step is idempotent — safe to
    // re-crash and re-resume any number of times.
    def finishPublish(leaf: org.apache.hadoop.fs.Path,
                      marker: org.apache.hadoop.fs.Path,
                      tmp: org.apache.hadoop.fs.Path): Unit = {
      val originals = {
        val in = fs.open(marker)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      }
      originals.foreach(name =>
        fs.delete(new org.apache.hadoop.fs.Path(leaf, name), false))
      if (fs.exists(tmp))
        fs.listStatus(tmp).filter(e =>
          e.isFile && e.getPath.getName.endsWith(".parquet")).foreach(f =>
          fs.rename(f.getPath, new org.apache.hadoop.fs.Path(leaf, f.getPath.getName)))
      fs.delete(marker, false)
      fs.delete(tmp, true)
    }

    def compactOne(leaf: org.apache.hadoop.fs.Path): Option[CompactionStat] = {
      val tmp = new org.apache.hadoop.fs.Path(leaf, CompactTmp)
      val marker = new org.apache.hadoop.fs.Path(leaf, CompactMarker)
      if (fs.exists(marker)) finishPublish(leaf, marker, tmp) // crashed run
      val dataFiles = fs.listStatus(leaf).filter(e =>
        e.isFile && !isHidden(e.getPath.getName) &&
          e.getPath.getName.endsWith(".parquet"))
      val bytes = dataFiles.map(_.getLen).sum
      val want = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      if (dataFiles.length <= want) None
      else {
        fs.delete(tmp, true) // stale marker-less scratch from a crashed run
        spark.read.parquet(leaf.toString)
          .coalesce(want)
          .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        val nCompacted = fs.listStatus(tmp).count(e =>
          e.isFile && e.getPath.getName.endsWith(".parquet"))
        // commit point: replacement is complete; record the originals
        val out = fs.create(marker, true)
        try out.write(dataFiles.map(_.getPath.getName).mkString("\n")
          .getBytes("UTF-8"))
        finally out.close()
        finishPublish(leaf, marker, tmp)
        Some(CompactionStat(leaf.toString, dataFiles.length, nCompacted, bytes))
      }
    }

    // Each leaf's rewrite is a tiny coalesce job that leaves most of
    // the cluster idle — run `parallelism` leaves' jobs concurrently
    // (Spark's scheduler interleaves them across executors; the
    // SparkContext is thread-safe for job submission). Serial
    // submission would make a million-leaf table's maintenance pass
    // latency-bound on job turnaround, not IO. Leaves never overlap,
    // so concurrent rewrites share nothing but the scheduler.
    val found = leaves(rootPath)
    if (found.isEmpty) return Seq.empty
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, found.size))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val futures = found.map(leaf =>
        scala.concurrent.Future(compactOne(leaf)))
      scala.concurrent.Await
        .result(scala.concurrent.Future.sequence(futures),
          scala.concurrent.duration.Duration.Inf)
        .flatten
    } finally pool.shutdown()
  }
}
