package graft.streaming

import graft.streaming.EventPipeline.GrantChange
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** Notification sink (SURVEY.md S3): on every grant flip, synthesize an
  * `access_granted` / `access_revoked` event envelope and hand it to a
  * transport — mirroring the reference's outbound webhook
  * (services/notifications.py:16-25, envelope built in
  * user_feature.py:81-96, where the transport is a stubbed print).
  *
  * The envelope's uuid must be deterministic for exactly-once delivery
  * under micro-batch retries: a random uuid() would re-randomize on
  * replay, so it is derived from (user, feature, grant, batch).
  */
object NotificationSink {

  final case class Notification(
      uuid: String, name: String, user_id: Long, feature: String)

  /** Pluggable transport; production = HTTP/Kafka producer per
    * partition, default = in-memory collector for tests/demos. */
  trait Transport extends Serializable {
    def send(batchId: Long, notifications: Iterator[Notification]): Unit
  }

  /** Batch-shaped envelope synthesis (shared by batch + streaming).
    * `batchId` is part of the uuid input: without it, a grant that
    * flips revoke→grant→revoke would give BOTH revocations the same
    * uuid, and a consumer deduping on uuid (the exactly-once
    * mechanism) would silently drop the second legitimate
    * notification. Within one micro-batch the CDC emits at most one
    * flip per (user, feature), so (batch, user, feature, grant) is
    * unique — and stable under micro-batch replay, unlike the
    * reference's per-send uuid4 (user_feature.py:88-96). */
  def envelope(changes: DataFrame, batchId: Long = 0L): DataFrame =
    changes.select(
      md5(concat_ws("|", lit(batchId), col("user_id"), col("feature"),
        col("has_grant"))).as("uuid"),
      when(col("has_grant"), lit("access_granted"))
        .otherwise(lit("access_revoked")).as("name"),
      col("user_id"), col("feature"))

  /** foreachBatch writer delivering grant-change notifications. */
  def writer(changes: Dataset[GrantChange], transport: Transport)
      : DataStreamWriter[GrantChange] =
    changes.writeStream.foreachBatch { (batch: Dataset[GrantChange], batchId: Long) =>
      val spark = batch.sparkSession
      import spark.implicits._
      val ns = envelope(batch.toDF(), batchId).as[Notification]
      // per-partition delivery: the transport connects once per
      // partition, not per notification
      ns.foreachPartition { it: Iterator[Notification] =>
        transport.send(batchId, it)
      }
    }

  /** Wire events → grant CDC → notifications, started. */
  def start(spark: org.apache.spark.sql.SparkSession,
            events: Dataset[EventPipeline.EventRow],
            cfg: graft.config.EngineConfig,
            transport: Transport): StreamingQuery =
    writer(EventPipeline.grantChanges(spark, events, cfg), transport).start()
}
