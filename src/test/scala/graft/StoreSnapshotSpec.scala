package graft

import graft.sources.BucketedUpsert
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot pinning and one-step rollback on the generation store:
  * a snapshot taken between merges keeps reading the pinned state
  * after any number of later merges (zero-copy hard links), and
  * rollback serves the pre-merge generation then composes correctly
  * on top of it. */
class StoreSnapshotSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def stateOf(table: String): Map[Long, Int] =
    BucketedUpsert.read(spark, table).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).resolve("snap").toString

  test("a snapshot pins the exact state a run read, across later merges and drops") {
    import spark.implicits._
    val table = "snap_pin"
    val dir = tmp("snap_pin")
    BucketedUpsert.drop(spark, table)
    try {
      BucketedUpsert.materialize(
        (1L to 30L).map(k => k -> 1).toDF("k", "v"), table, "k", 8)
      BucketedUpsert.upsert(spark, table,
        Seq(3L -> 2, 31L -> 2).toDF("k", "v"), Seq("k"), "k", 8)
      val pinned = stateOf(table)
      val nFiles = BucketedUpsert.snapshot(spark, table, dir)
      assert(nFiles > 0)

      // two more merges — one flips back onto the generation dir the
      // snapshot linked from, overwriting those files
      BucketedUpsert.upsert(spark, table,
        Seq(5L -> 9, 32L -> 9).toDF("k", "v"), Seq("k"), "k", 8)
      BucketedUpsert.upsert(spark, table,
        Seq(3L -> 7, 6L -> 7).toDF("k", "v"), Seq("k"), "k", 8)
      assert(stateOf(table) != pinned)

      val snap = BucketedUpsert.readSnapshot(spark, dir, Some(table)).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(snap == pinned)

      // the pin outlives the store itself
      BucketedUpsert.drop(spark, table)
      val orphan = BucketedUpsert.readSnapshot(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(orphan == pinned)
    } finally BucketedUpsert.drop(spark, table)
  }

  test("rollback serves the pre-merge state; the next merge composes on top of it") {
    import spark.implicits._
    val table = "snap_rb"
    BucketedUpsert.drop(spark, table)
    try {
      BucketedUpsert.materialize(
        (1L to 20L).map(k => k -> 1).toDF("k", "v"), table, "k", 8)
      BucketedUpsert.upsert(spark, table,
        Seq(2L -> 5).toDF("k", "v"), Seq("k"), "k", 8)
      val good = stateOf(table)

      // the poisoned batch
      BucketedUpsert.upsert(spark, table,
        Seq(1L -> -999, 21L -> -999).toDF("k", "v"), Seq("k"), "k", 8)
      assert(stateOf(table) != good)

      BucketedUpsert.rollback(spark, table)
      assert(stateOf(table) == good, "rollback must serve the pre-merge state")

      // composing after rollback reads the restored state and
      // overwrites the quarantined generation
      BucketedUpsert.upsert(spark, table,
        Seq(4L -> 8).toDF("k", "v"), Seq("k"), "k", 8)
      assert(stateOf(table) == good + (4L -> 8),
        "post-rollback merge must not resurrect the rolled-back batch")
    } finally BucketedUpsert.drop(spark, table)
  }

  test("snapshot refuses a non-empty target — pins are immutable") {
    import spark.implicits._
    val table = "snap_immut"
    val dir = tmp("snap_immut")
    BucketedUpsert.drop(spark, table)
    try {
      BucketedUpsert.materialize(
        (1L to 5L).map(k => k -> 1).toDF("k", "v"), table, "k", 4)
      BucketedUpsert.snapshot(spark, table, dir)
      intercept[IllegalArgumentException] {
        BucketedUpsert.snapshot(spark, table, dir)
      }
    } finally BucketedUpsert.drop(spark, table)
  }

  test("bucket-count mismatch fails fast on both probe and merge paths") {
    import spark.implicits._
    val table = "snap_buckets"
    BucketedUpsert.drop(spark, table)
    try {
      BucketedUpsert.materialize(
        (1L to 10L).map(k => k -> 1).toDF("k", "v"), table, "k", 8)
      // probe under the wrong count would silently select the wrong
      // bucket files (missed duplicates, not an error) — must refuse
      intercept[IllegalArgumentException] {
        BucketedUpsert.readKeys(spark, table,
          Seq(3L).toDF("k"), "k", buckets = 32).collect()
      }
      // merge under the wrong count would link carried-forward files
      // into a generation declaring a different layout — must refuse
      intercept[IllegalArgumentException] {
        BucketedUpsert.upsert(spark, table,
          Seq(3L -> 9).toDF("k", "v"), Seq("k"), "k", buckets = 32)
      }
      // the matching count still works
      assert(BucketedUpsert.readKeys(spark, table,
        Seq(3L).toDF("k"), "k", buckets = 8).count() >= 1)
    } finally BucketedUpsert.drop(spark, table)
  }

  test("probing a store that does not exist fails with a clear message") {
    import spark.implicits._
    BucketedUpsert.drop(spark, "snap_missing")
    val e = intercept[IllegalStateException] {
      BucketedUpsert.readKeys(spark, "snap_missing",
        Seq(1L).toDF("k"), "k", 8)
    }
    assert(e.getMessage.contains("does not exist"))
  }

  test("rollback refuses when no previous generation exists") {
    val table = "snap_rb_none"
    BucketedUpsert.drop(spark, table)
    intercept[IllegalArgumentException] {
      BucketedUpsert.rollback(spark, table)
    }
  }
}
