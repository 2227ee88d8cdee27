package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Curated-dataset export sink: the last step of the assembly pipeline,
  * where a selected corpus (e.g. `corpus_assemble`'s output joined back
  * to its text) becomes the partitioned parquet layout a training job
  * actually reads.
  *
  * What a naive `df.write.partitionBy(...)` gets wrong at 100 TB, and
  * this sink fixes:
  *
  *  - **File-count/size control.** Without layout control, every
  *    shuffle task that holds rows of a partition value writes its own
  *    file there: 32k tasks x 1k partition dirs = tens of millions of
  *    small files (the classic small-files problem), or — repartitioned
  *    naively by the partition columns — ONE multi-gigabyte file per
  *    dir written by one task (the skew problem). Here each partition
  *    value's rows are salted into `ceil(rows / rowsPerFile)` hash
  *    cells sized from a cheap pre-count of the (tiny) partition-value
  *    combinations, so every directory gets files of ~`rowsPerFile`
  *    rows regardless of partition skew, written in parallel.
  *  - **Scan-friendly row order.** Rows are sorted by `sortCol` WITHIN
  *    each file (`sortWithinPartitions`), so parquet row-group min/max
  *    stats support data skipping on the sort key at read time.
  *  - **Atomic-ish publish.** The `_manifest` table (per partition
  *    value: row count, token sum, file count, bytes) is written LAST;
  *    `read` refuses a directory without one, so a writer that died
  *    mid-write is invisible to readers (the BucketedUpsert
  *    publish-marker convention, minus the catalog).
  *  - **Exact round-trip.** The input schema is persisted next to the
  *    data (`_schema.json`) and pinned at read — partition-column type
  *    inference would otherwise hand back `source: int` for a corpus
  *    written with string values that happen to look numeric.
  *
  * On a real deployment the same shape targets a table format
  * (Delta/Iceberg), where the manifest is the table log; the layout
  * math (count -> cells -> salted exchange -> sorted files) is
  * identical.
  */
object CorpusWriter {

  val ManifestDir = "_manifest"
  val SchemaFile = "_schema.json"

  /** The manifest's stat columns; everything else is a partition
    * column. diff() and compact() both derive partitioning from this
    * one list — a new stat column added to buildManifest must land
    * here or both would misread it as a partition column. */
  private val ManifestStatCols = Set("n_rows", "n_tokens", "n_files", "bytes")
  private def partitionColsOf(m: DataFrame): Seq[String] =
    m.schema.fieldNames.filterNot(ManifestStatCols).toSeq

  /** Write `df` to `path` partitioned by `partitionCols`, ~`rowsPerFile`
    * rows per file, each file sorted by `sortCol`. Returns the manifest
    * (read back from its published location — no lazy re-scan of the
    * input on later actions).
    *
    * Cost: ONE aggregate over the partition-value combinations (tiny —
    * #combos rows, cached and reused for both the file-count broadcast
    * and the manifest), one salted exchange, one write.
    */
  def write(df: DataFrame, path: String, partitionCols: Seq[String],
            sortCol: String, rowsPerFile: Long = 1000000L,
            tokenCol: Option[String] = None): DataFrame = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    require(rowsPerFile > 0, s"rowsPerFile must be positive, got $rowsPerFile")
    val spark = df.sparkSession
    val pcols = partitionCols.map(col)
    // one pass over the combos: row/token counts for the manifest AND
    // the per-combo file-count for the salted layout. Integer ceil —
    // exact at any count, unlike a double division.
    val stats = df.groupBy(pcols: _*)
      .agg(count(lit(1)).as("n_rows"),
        tokenCol.map(t => sum(col(t))).getOrElse(lit(null).cast(LongType))
          .as("n_tokens"))
      .withColumn("__nfiles",
        expr(s"(n_rows + ${rowsPerFile - 1}) div $rowsPerFile"))
      .cache()
    try {
      // NULL-SAFE equi-join: a row with a null partition value must
      // still be written (the writer routes it to the default
      // partition), so plain `join(combos, cols)` — which drops null
      // keys — would silently lose data the manifest still counts.
      val rhs = stats.select(
        partitionCols.map(c => col(c).as(s"__p_$c")) :+ col("__nfiles"): _*)
      val cond = partitionCols.map(c => df(c) <=> rhs(s"__p_$c")).reduce(_ && _)
      // the cell salt folds in a per-row disambiguator: hashing the
      // sort key ALONE would send every tied value to one cell — a
      // low-cardinality sortCol (score buckets, dates) rebuilds the
      // giant-file skew this sink exists to prevent. The disambiguator
      // is a hash over ALL data columns, never a nondeterministic id:
      // repartition() on a key containing monotonically_increasing_id
      // is the SPARK-23207 bug class (a recomputed upstream stage
      // reorders rows, task attempts hash the same row to different
      // cells, reducers see duplicated/dropped rows). Fully identical
      // rows co-locating is acceptable bounded skew. Ties spread
      // evenly and file-internal sort order is unaffected (tied rows
      // share min/max stats wherever they land).
      val salted = df.join(broadcast(rhs), cond)
        .withColumn("__cell",
          pmod(hash(df.columns.map(df(_)): _*), col("__nfiles")))
      salted
        .repartition((pcols :+ col("__cell")): _*)
        // prefix-sorted by the partition columns: the dynamic-partition
        // writer's required ordering is already satisfied, so it inserts
        // no extra sort (which would be keyed on the partition columns
        // alone and destroy the sortCol order inside each file)
        .sortWithinPartitions((pcols :+ col(sortCol)): _*)
        .drop("__nfiles", "__cell")
        .drop(partitionCols.map(c => s"__p_$c"): _*)
        .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
      writeText(spark, s"$path/$SchemaFile", df.schema.json)
      // manifest last = publish marker
      buildManifest(spark, stats, path, partitionCols)
        .coalesce(1).write.mode("overwrite").parquet(s"$path/$ManifestDir")
    } finally stats.unpersist(false)
    manifest(spark, path)
  }

  /** Read a published corpus with its exact written schema. Refuses an
    * unpublished (manifest-less) directory — a half-written export must
    * never feed a training run. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val hfs = new org.apache.hadoop.fs.Path(path, ManifestDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(hfs.exists(new org.apache.hadoop.fs.Path(path, ManifestDir)),
      s"$path has no $ManifestDir — unpublished or partial export")
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(readText(spark, s"$path/$SchemaFile")).asInstanceOf[StructType]
    spark.read.schema(schema).parquet(path)
  }

  /** Version diff of two PUBLISHED corpora by their manifests — the
    * release-gate summary before a new export replaces the serving
    * one: which partitions appeared, vanished, or changed, and the
    * row/token drift per partition. Cost is the two manifests (a few
    * rows per partition VALUE — metadata, never a data scan), so the
    * gate is free even when the corpora are 100 TB. Statuses: `added`
    * (new only), `removed` (old only), `changed` (row or token count
    * moved), `unchanged`. Null partition values compare null-safely
    * (the default-partition rows diff like any other). */
  def diff(spark: SparkSession, oldPath: String, newPath: String): DataFrame = {
    val o = manifest(spark, oldPath)
    val n = manifest(spark, newPath)
    val pcols = partitionColsOf(o)
    val pcolsNew = partitionColsOf(n)
    require(pcols.sorted.sameElements(pcolsNew.sorted),
      s"manifests are partitioned differently: " +
        s"${pcols.mkString(",")} vs ${pcolsNew.mkString(",")}")
    val lhs = o.select(pcols.map(c => col(c).as(s"__o_$c")) ++
      Seq(col("n_rows").as("rows_old"), col("n_tokens").as("tokens_old")): _*)
    val rhs = n.select(pcols.map(c => col(c).as(s"__n_$c")) ++
      Seq(col("n_rows").as("rows_new"), col("n_tokens").as("tokens_new")): _*)
    val cond = pcols.map(c => lhs(s"__o_$c") <=> rhs(s"__n_$c")).reduce(_ && _)
    lhs.join(rhs, cond, "full_outer")
      .select(pcols.map(c =>
        coalesce(col(s"__o_$c"), col(s"__n_$c")).as(c)) ++ Seq(
        when(col("rows_old").isNull, "added")
          .when(col("rows_new").isNull, "removed")
          .when(col("rows_old") =!= col("rows_new") ||
            !(col("tokens_old") <=> col("tokens_new")), "changed")
          .otherwise("unchanged").as("status"),
        col("rows_old"), col("rows_new"),
        col("tokens_old"), col("tokens_new")): _*)
  }

  def manifest(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/$ManifestDir")

  /** Compact a published corpus in place ([[Layouts.compactLeaves]] —
    * single-writer maintenance pass, see its contract) and republish
    * the manifest so its per-partition `n_files`/`bytes` describe the
    * new layout. Row/token counts are carried over, not recounted: the
    * data is unchanged, only its file arrangement. */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = Layouts.DefaultTargetBytes): Seq[Layouts.CompactionStat] = {
    // snapshot the manifest OFF the path before rewriting it (overwrite
    // of a path being lazily read is refused; the manifest is tiny)
    val old = manifest(spark, path).localCheckpoint(true)
    val partitionCols = partitionColsOf(old)
    val report = Layouts.compactLeaves(spark, path, targetBytes)
    if (report.nonEmpty) {
      buildManifest(spark, old.drop("n_files", "bytes"), path, partitionCols)
        .coalesce(1).write.mode("overwrite").parquet(s"$path/$ManifestDir")
    }
    report
  }

  /** Per-partition-value stats: the cached data-side counts joined
    * (null-safely, on unescaped values) with a filesystem walk of the
    * written layout — file count + bytes per partition directory. */
  private def buildManifest(spark: SparkSession, stats: DataFrame,
                            path: String, partitionCols: Seq[String]): DataFrame = {
    // the walk lists #files entries on the driver — bounded by the
    // layout itself (combos x nfiles), not by the data
    val root = new org.apache.hadoop.fs.Path(path)
    val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = hfs.listFiles(root, true)
    val files = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next())
      .filter { f =>
        val rel = f.getPath.toString.stripPrefix(root.toString)
        f.getPath.getName.endsWith(".parquet") && !rel.contains(ManifestDir)
      }
      .map { f =>
        val rel = f.getPath.toString.stripPrefix(root.toString)
        val kv = rel.split("/").filter(_.contains("=")).map { seg =>
          val Array(k, v) = seg.split("=", 2)
          k -> unescapePathValue(v)
        }.toMap
        (partitionCols.map(kv.getOrElse(_, None).orNull), f.getLen)
      }.toSeq
    val fileRows = files.groupBy(_._1).toSeq.map { case (k, fs) =>
      Row.fromSeq(k ++ Seq(fs.size.toLong, fs.map(_._2).sum))
    }
    val fileSchema = StructType(
      partitionCols.map(c => StructField(s"__f_$c", StringType)) ++
        Seq(StructField("n_files", LongType), StructField("bytes", LongType)))
    val fileStats = spark.createDataFrame(
      spark.sparkContext.parallelize(fileRows, 1), fileSchema)
    // data side stringified exactly as the writer stringifies partition
    // path values (Cast to string); null <=> null matches the default
    // partition dir the unescape maps back to null
    val cond = partitionCols
      .map(c => stats(c).cast(StringType) <=> fileStats(s"__f_$c"))
      .reduce(_ && _)
    stats.join(fileStats, cond, "left_outer")
      .select(partitionCols.map(stats(_)) ++
        Seq(stats("n_rows"), stats("n_tokens"),
          fileStats("n_files"), fileStats("bytes")): _*)
  }

  /** Invert the dynamic-partition writer's path escaping via Spark's
    * OWN inverse (`ExternalCatalogUtils.unescapePathName` — the exact
    * counterpart of the escapePathName the writer applied, so the two
    * can never drift), with the default-partition sentinel back to
    * null (None). */
  private def unescapePathValue(v: String): Option[String] = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    if (v == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) None
    else Some(ExternalCatalogUtils.unescapePathName(v))
  }

  private def writeText(spark: SparkSession, path: String, text: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val out = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(p, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readText(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
    try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }
}
