package graft.sources

import graft.streaming.EventPipeline.GrantChange
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Materialized grants table — the storage layer of the serve path
  * (BASELINE north star: "Spark SQL feature transformations +
  * Parquet storage"; reference keeps grants in in-process dicts,
  * user_feature.py:22, which a restart loses).
  *
  * The long-form grants view `[user_id, feature, has_grant]` persists
  * as a catalog parquet table BUCKETED BY user_id, so every serve-path
  * join keyed on user_id scans co-located buckets with no exchange,
  * and is kept current by last-writer-wins upserts from the grant-flip
  * CDC (batch or foreachBatch streaming).
  *
  * Publish mechanics: `table` is a catalog VIEW pointing at the
  * current generation table (`table__a` / `table__b`). A publish
  * writes the INACTIVE generation (no reader points there, and the
  * merge reads the other generation — no read-overwrite conflict),
  * then repoints the view with one CREATE OR REPLACE VIEW — a single
  * catalog operation, so name-resolving readers move atomically and a
  * crash mid-publish leaves the view on the old, intact generation.
  * This sandbox has no Delta/Iceberg jars; on a real deployment the
  * same `collapse` + merge logic feeds `MERGE INTO` for file-level
  * pruning. Single-writer by construction (one streaming query owns
  * the table), like any foreachBatch MERGE sink.
  */
object GrantStore {

  val DefaultTable = "graft_grants"

  private def generations(table: String): (String, String) =
    (table + "__a", table + "__b")

  /** The generation NOT currently served — the safe write target. */
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

  /** Full materialization of a grants view, bucketed by user_id. */
  def materialize(grants: DataFrame, table: String = DefaultTable,
                  buckets: Int = 32): Unit = {
    val spark = grants.sparkSession
    val gen = inactiveGen(spark, table)
    Bucketed.write(grants, gen, "user_id", buckets)
    publish(spark, table, gen)
  }

  def read(spark: SparkSession, table: String = DefaultTable): DataFrame =
    spark.table(table)

  /** Collapse a CDC micro-batch to its NET effect per (user, feature).
    * Flip values for one key strictly alternate, so: equal true/false
    * counts ⇒ the key ended where it started (no-op, dropped); else the
    * majority value is the last flip's value. This resolves multiple
    * same-key flips without needing an ordering column. */
  def collapse(changes: DataFrame): DataFrame =
    changes.groupBy(col("user_id"), col("feature"))
      .agg(count(when(col("has_grant"), lit(1))).as("nt"),
        count(when(!col("has_grant"), lit(1))).as("nf"))
      .filter(col("nt") =!= col("nf"))
      .select(col("user_id"), col("feature"),
        (col("nt") > col("nf")).as("has_grant"))

  /** Filesystem directory of a generation table (managed catalog
    * table → warehouse path). */
  private[graft] def tableDir(spark: SparkSession, gen: String): java.nio.file.Path =
    java.nio.file.Paths.get(
      spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(gen))
        .location)

  /** Bucket id encoded in a bucketed-write file name
    * (`part-00000-<uuid>_00003.c000.snappy.parquet` → 3). */
  private[graft] def bucketIdOf(fileName: String): Option[Int] =
    "_(\\d{5})\\.".r.findFirstMatchIn(fileName).map(_.group(1).toInt)

  /** The bucket ids the delta's keys land in — Spark's bucketing hash
    * is `pmod(murmur3(key), n)`, identical to the SQL `hash()`
    * function, so the pruning computation matches the writer's
    * placement exactly. */
  private[graft] def affectedBuckets(delta: DataFrame, buckets: Int): Set[Int] =
    delta.select(pmod(hash(col("user_id")), lit(buckets)).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet

  /** Last-writer-wins upsert of a CDC batch, O(delta) not O(table):
    * only the buckets whose `pmod(hash(user_id), buckets)` intersects
    * the delta's keys are read (their parquet files addressed by the
    * bucket id in the file name — no full-table scan) and rewritten
    * into the inactive generation; every untouched bucket's files are
    * carried forward by hard link (fallback: copy), so a 10-row flip
    * batch against a 100 TB table touches ~10 buckets of IO, not
    * 100 TB. The view republish stays a single atomic catalog op.
    * On a real deployment the same collapse + merge feeds a Delta/
    * Iceberg `MERGE INTO`, where carry-forward is a manifest reference
    * instead of a link. */
  def upsert(spark: SparkSession, changes: DataFrame,
             table: String = DefaultTable, buckets: Int = 32): Unit = {
    val delta = collapse(changes)
      .select(col("user_id"), col("feature"),
        col("has_grant").as("new_grant"))
      .persist()
    try {
      // empty or net-zero CDC batches (common under foreachBatch) must
      // not pay a table rewrite
      if (delta.isEmpty) return
      val touched = affectedBuckets(delta, buckets)
      val gen = inactiveGen(spark, table)
      val (a, b) = generations(table)
      val active = if (gen == a) b else a
      val srcDir = tableDir(spark, active)
      val (touchedFiles, untouchedFiles) = {
        import scala.jdk.CollectionConverters._
        val all = java.nio.file.Files.list(srcDir).iterator().asScala
          .filter(p => bucketIdOf(p.getFileName.toString).isDefined).toSeq
        all.partition(p => touched(bucketIdOf(p.getFileName.toString).get))
      }
      // merge reads ONLY the touched buckets' files (bucket-file
      // addressing beats predicate pruning: no scan even plans over
      // the untouched 1 - |touched|/n of the table)
      val existing =
        if (touchedFiles.isEmpty) spark.table(table).limit(0)
        else spark.read.schema(spark.table(table).schema)
          .parquet(touchedFiles.map(_.toString): _*)
      val merged = existing
        .join(broadcast(delta), Seq("user_id", "feature"), "full_outer")
        .select(col("user_id"), col("feature"),
          coalesce(col("new_grant"), col("has_grant")).as("has_grant"))
      Bucketed.write(merged, gen, "user_id", buckets)
      // carry untouched buckets forward: link shares the bytes (the
      // "reference" half of generation-compose); copy is the fallback
      // for filesystems without links
      val dstDir = tableDir(spark, gen)
      untouchedFiles.foreach { f =>
        val dst = dstDir.resolve(f.getFileName.toString)
        try java.nio.file.Files.createLink(dst, f)
        catch { case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
          java.nio.file.Files.copy(f, dst)
        }
      }
      spark.sql(s"REFRESH TABLE `$gen`")
      publish(spark, table, gen)
    } finally delta.unpersist()
  }

  /** Streaming sink: grant-flip CDC → incremental table upserts. */
  def writer(changes: Dataset[GrantChange], table: String = DefaultTable,
             buckets: Int = 32): DataStreamWriter[GrantChange] =
    changes.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[GrantChange], _: Long) =>
        upsert(batch.sparkSession, batch.toDF(), table, buckets)
      }

  /** Serve-path lookup join: grants for a keyed frame of user_ids.
    * When `users` is bucketed by user_id with the same bucket count,
    * this join plans with NO exchange on either side (asserted in
    * GrantStoreSpec). */
  def grantsFor(spark: SparkSession, users: DataFrame,
                table: String = DefaultTable): DataFrame =
    users.join(read(spark, table), Seq("user_id"), "left_outer")
}
