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
  * CDC (batch or foreachBatch streaming). Storage mechanics — the
  * generation/view atomic publish and the O(delta) bucket-pruned
  * merge — live in [[BucketedUpsert]] (shared with AggStore).
  */
object GrantStore {

  val DefaultTable = "graft_grants"

  /** Drop the view and both generations (test/cleanup utility). */
  def drop(spark: SparkSession, table: String): Unit =
    BucketedUpsert.drop(spark, table)

  /** Full materialization of a grants view, bucketed by user_id. */
  def materialize(grants: DataFrame, table: String = DefaultTable,
                  buckets: Int = 32): Unit =
    BucketedUpsert.materialize(grants, table, "user_id", buckets)

  def read(spark: SparkSession, table: String = DefaultTable): DataFrame =
    BucketedUpsert.read(spark, table)

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

  /** Last-writer-wins upsert of a CDC batch, O(delta): the collapsed
    * net flips merge through BucketedUpsert's bucket-pruned
    * generation-compose — only buckets containing delta keys are read
    * and rewritten, untouched bucket files carry forward by link. */
  def upsert(spark: SparkSession, changes: DataFrame,
             table: String = DefaultTable, buckets: Int = 32,
             batchId: Option[Long] = None): Unit =
    BucketedUpsert.upsert(spark, table, collapse(changes),
      Seq("user_id", "feature"), "user_id", buckets, batchId = batchId)

  /** Delete every grant row for the given users — the account-wipe /
    * retention path (GDPR "right to erasure" applied to the grants
    * table). Same O(delta) cost shape as the CDC upsert: the user set
    * prunes to its buckets, only those are rewritten without the
    * users' rows, the rest of a 100 TB table carries forward by link.
    * Downstream semantics: a wiped user reverts to the default grant
    * (an absent row IS the default in the serve path), which is the
    * correct post-erasure state. */
  def deleteUsers(spark: SparkSession, users: DataFrame,
                  table: String = DefaultTable, buckets: Int = 32,
                  batchId: Option[Long] = None): Unit =
    BucketedUpsert.delete(spark, table, users.select(col("user_id")),
      Seq("user_id"), "user_id", buckets, batchId = batchId)

  /** Streaming sink: grant-flip CDC → incremental table upserts. The
    * micro-batch id feeds the replay guard, so a batch redelivered
    * after a crash-between-publish-and-commit skips the bucket
    * rewrite instead of re-running it (the merge itself is
    * last-writer-wins idempotent — the guard saves the I/O and the
    * generation flip, it does not protect correctness here). */
  def writer(changes: Dataset[GrantChange], table: String = DefaultTable,
             buckets: Int = 32): DataStreamWriter[GrantChange] =
    changes.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[GrantChange], id: Long) =>
        upsert(batch.sparkSession, batch.toDF(), table, buckets, Some(id))
      }

  /** Serve-path lookup join: grants for a keyed frame of user_ids.
    * When `users` is bucketed by user_id with the same bucket count,
    * this join plans with NO exchange on either side (asserted in
    * GrantStoreSpec). */
  def grantsFor(spark: SparkSession, users: DataFrame,
                table: String = DefaultTable): DataFrame =
    users.join(read(spark, table), Seq("user_id"), "left_outer")
}
