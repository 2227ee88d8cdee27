package graft

import graft.config.DefaultConfig
import graft.operators.EventAggregates
import graft.sources.{AggStore, BucketedUpsert}
import graft.streaming.EventPipeline.EventRow
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Incremental per-user aggregate snapshots: additive micro-batch
  * merges must converge to exactly the batch aggregation over the
  * union of all events, through the O(delta) bucket-pruned merge. */
class AggStoreSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val specs = DefaultConfig.config.aggregates

  private def ev(id: Long, user: Long, typ: String, value: Double, minute: Int): EventRow =
    EventRow(id, java.sql.Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"),
      user, typ, value, """{"k": 1}""")

  test("two micro-batch upserts equal one batch aggregation") {
    import spark.implicits._
    val table = "as_incr"
    AggStore.drop(spark, table)
    try {
      val batch1 = Seq(
        ev(1, 1, "signup", 1.0, 1), ev(2, 1, "purchase", 100.0, 2),
        ev(3, 2, "purchase", 50.0, 3))
      val batch2 = Seq(
        ev(4, 1, "purchase", 25.0, 4), ev(5, 3, "signup", 1.0, 5),
        ev(6, 2, "error", 10.0, 6))
      AggStore.materialize(batch1.toDF(), specs, table, buckets = 4)
      AggStore.upsert(spark, batch2.toDF(), specs, table, buckets = 4)

      def byName(df: org.apache.spark.sql.DataFrame): Map[Long, Map[String, Any]] =
        df.collect().map { r =>
          r.getLong(0) -> df.columns.tail.map(c => c -> r.get(r.fieldIndex(c))).toMap
        }.toMap
      // full batch aggregation over the union — including the EXACT
      // distinct count, which the incrementally-unioned sketch must
      // reproduce exactly at this cardinality
      val expect = byName(EventAggregates.perUser((batch1 ++ batch2).toDF(), specs))
      val got = byName(AggStore.readEstimates(spark, specs, table))
      assert(got == expect)
    } finally AggStore.drop(spark, table)
  }

  test("sketch column: batched union equals one-shot sketch, replay is idempotent") {
    import spark.implicits._
    val table = "as_sketch"
    AggStore.drop(spark, table)
    try {
      // overlapping distinct values across batches: k=1 appears in both
      val b1 = Seq(ev(1, 9, "click", 1.0, 1), ev(2, 9, "click", 1.0, 2))
      val b2 = Seq(ev(3, 9, "click", 1.0, 3), ev(4, 9, "click", 1.0, 4))
      AggStore.materialize(b1.toDF(), specs, table, buckets = 4)
      AggStore.upsert(spark, b2.toDF(), specs, table, buckets = 4)
      // replaying batch 2: the sketch must not change (union is
      // idempotent; the additive columns would double, which is why
      // THEY need the deduped feed — asserted on the sketch only)
      AggStore.upsert(spark, b2.toDF(), specs, table, buckets = 4)
      val sketchOfUnion = AggStore.snapshot((b1 ++ b2).toDF(), specs)
        .collect().head.getAs[Array[Byte]]("distinct_click_keys_sketch")
      val stored = AggStore.read(spark, table)
        .collect().head.getAs[Array[Byte]]("distinct_click_keys_sketch")
      assert(java.util.Arrays.equals(stored, sketchOfUnion),
        "incrementally-unioned sketch bytes must equal the one-shot sketch")
    } finally AggStore.drop(spark, table)
  }

  test("aggregate upsert inherits bucket pruning: untouched files survive") {
    import spark.implicits._
    val table = "as_prune"
    AggStore.drop(spark, table)
    try {
      val seed = (1 to 100).map(i => ev(i.toLong, i.toLong, "purchase", 10.0, 1))
      AggStore.materialize(seed.toDF(), specs, table, buckets = 8)
      import scala.jdk.CollectionConverters._
      def files(gen: String): Set[String] =
        java.nio.file.Files.list(BucketedUpsert.tableDir(spark, gen))
          .iterator().asScala.map(_.getFileName.toString)
          .filter(n => BucketedUpsert.bucketIdOf(n).isDefined).toSet
      val before = files(table + "__a")
      // delta touches ONE user
      AggStore.upsert(spark,
        Seq(ev(1000, 7, "purchase", 5.0, 2)).toDF(), specs, table, buckets = 8)
      val after = files(table + "__b")
      val touched = BucketedUpsert.affectedBuckets(
        Seq((7L, 0L)).toDF("user_id", "x"), "user_id", 8)
      val untouchedBefore = before.filterNot(n =>
        touched(BucketedUpsert.bucketIdOf(n).get))
      assert(untouchedBefore.nonEmpty && untouchedBefore.subsetOf(after),
        "untouched bucket files must carry forward by name")
      // correctness of the merged value
      val u7 = AggStore.read(spark, table)
        .filter("user_id = 7").collect().head
      assert(u7.getDouble(u7.fieldIndex("total_purchase_amount")) == 15.0)
    } finally AggStore.drop(spark, table)
  }

  test("at-least-once redelivery: same batchId applies once") {
    import spark.implicits._
    val table = "as_replay"
    AggStore.drop(spark, table)
    try {
      AggStore.materialize(
        Seq(ev(1, 8, "purchase", 10.0, 1)).toDF(), specs, table, buckets = 4)
      val batch = Seq(ev(2, 8, "purchase", 5.0, 2)).toDF()
      AggStore.upsert(spark, batch, specs, table, 4, batchId = Some(7L))
      // redelivered micro-batch (crash between publish and commit)
      AggStore.upsert(spark, batch, specs, table, 4, batchId = Some(7L))
      val r = AggStore.read(spark, table).filter("user_id = 8").collect().head
      assert(r.getDouble(r.fieldIndex("total_purchase_amount")) == 15.0,
        "replayed batch must not double-count")
      // the NEXT batch id applies normally
      AggStore.upsert(spark, Seq(ev(3, 8, "purchase", 1.0, 3)).toDF(),
        specs, table, 4, batchId = Some(8L))
      val r2 = AggStore.read(spark, table).filter("user_id = 8").collect().head
      assert(r2.getDouble(r2.fieldIndex("total_purchase_amount")) == 16.0)
    } finally AggStore.drop(spark, table)
  }

  test("streaming foreachBatch maintains the snapshot incrementally") {
    import spark.implicits._
    val table = "as_stream"
    AggStore.drop(spark, table)
    try {
      AggStore.materialize(Seq.empty[EventRow].toDF(), specs, table, buckets = 4)
      val ms = MemoryStream[EventRow](spark)
      val q = AggStore.writer(ms.toDS(), specs, table, buckets = 4).start()
      try {
        ms.addData(Seq(ev(1, 5, "purchase", 40.0, 1)))
        q.processAllAvailable()
        ms.addData(Seq(ev(2, 5, "purchase", 2.5, 2), ev(3, 6, "signup", 1.0, 3)))
        q.processAllAvailable()
      } finally q.stop()
      val rows = AggStore.read(spark, table).collect()
        .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("total_purchase_amount"))).toMap
      assert(rows(5L) == 42.5)
      assert(rows(6L) == 0.0)
    } finally AggStore.drop(spark, table)
  }
}
