package graft.sources

import graft.functions.expressions.{QSketchQuantile, QuantileSketchBuild}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Materialized per-key quantile-sketch snapshots — the AggStore
  * pattern applied to percentiles. Exact `percentile` needs every
  * group's values in one place (a full sort at 100 TB, and
  * un-maintainable incrementally: yesterday's p99 + today's events
  * can't produce tomorrow's p99 from the exact values without
  * re-reading them). A log-bucketed quantile sketch column
  * ([[graft.functions.expressions.QuantileOps]]) fixes both: each
  * micro-batch reduces to O(batch keys) delta sketches with the SAME
  * aggregate the batch path uses, and merges into a key-bucketed
  * store by bucket-wise count addition — associative and exact, so
  * the streaming-maintained bytes are BIT-EQUAL to a one-shot batch
  * build over the same events (asserted in StreamingQuantileSpec),
  * and any rollup (key -> cohort) is a re-union of bytes.
  *
  * Exactly-once: count addition is NOT replay-idempotent, so every
  * micro-batch carries its foreachBatch batchId into the store's
  * replay guard (the AggStore contract).
  */
object QuantileStore {

  val DefaultTable = "graft_value_quantiles"
  val DefaultBuckets = 32
  val SketchCol = "q_sketch"

  /** One micro-batch's delta: per-key sketch bytes in one groupBy. */
  def snapshot(batch: DataFrame, keyCol: String, valueCol: String,
               alpha: Double = 0.01): DataFrame =
    batch.groupBy(col(keyCol))
      .agg(QuantileSketchBuild(col(valueCol), alpha).as(SketchCol))

  /** Create an empty store (idempotent); `like` only donates the key
    * column's type — no rows are read. */
  def init(spark: SparkSession, like: DataFrame, keyCol: String,
           valueCol: String, table: String = DefaultTable,
           buckets: Int = DefaultBuckets): Unit =
    if (!BucketedUpsert.adopt(spark, table))
      BucketedUpsert.materialize(snapshot(like.limit(0), keyCol, valueCol),
        table, keyCol, buckets)

  def drop(spark: SparkSession, table: String = DefaultTable): Unit =
    BucketedUpsert.drop(spark, table)

  /** Merge one micro-batch: sketch columns union bucket-wise,
    * O(delta) bucket rewrites. */
  def upsertBatch(spark: SparkSession, batch: DataFrame, keyCol: String,
                  valueCol: String, table: String = DefaultTable,
                  buckets: Int = DefaultBuckets, alpha: Double = 0.01,
                  batchId: Option[Long] = None): Unit =
    BucketedUpsert.upsert(spark, table,
      snapshot(batch, keyCol, valueCol, alpha),
      Seq(keyCol), keyCol, buckets,
      merge = (_, ex, dl) =>
        when(ex.isNull, dl).when(dl.isNull, ex)
          .otherwise(graft.functions.expressions.QSketchUnion(ex, dl)),
      batchId = batchId)

  /** Streaming sink: rows → per-batch delta sketches → unioned store. */
  def writer(rows: DataFrame, keyCol: String, valueCol: String,
             table: String = DefaultTable, buckets: Int = DefaultBuckets,
             alpha: Double = 0.01): DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        upsertBatch(batch.sparkSession, batch, keyCol, valueCol,
          table, buckets, alpha, Some(id))
      }

  /** The raw per-key sketch column. */
  def read(spark: SparkSession, table: String = DefaultTable): DataFrame =
    BucketedUpsert.read(spark, table)

  /** Serve-path projection: one column per requested quantile.
    * Labels keep enough precision to stay distinct (p50, p99, p99_9 —
    * rounding to whole percents would alias 0.999 and 1.0 both to
    * "p100" and break every downstream col() reference). */
  def quantiles(spark: SparkSession, qs: Seq[Double],
                table: String = DefaultTable): DataFrame = {
    def label(q: Double): String = {
      // via the double's shortest decimal repr — BigDecimal(q * 100)
      // would surface binary artifacts (0.999 → "p99_90000000000001")
      val s = (BigDecimal(q.toString) * 100).underlying
        .stripTrailingZeros.toPlainString
      "p" + s.replace("-", "m").replace(".", "_")
    }
    val labels = qs.map(label)
    require(labels.distinct.size == labels.size,
      s"quantiles: duplicate labels from $qs — ${labels.mkString(",")}")
    val base = read(spark, table)
    val keyCols = base.columns.filterNot(_ == SketchCol).map(col)
    base.select(keyCols ++ qs.zip(labels).map { case (q, l) =>
      QSketchQuantile(col(SketchCol), q).as(l)
    }: _*)
  }
}
