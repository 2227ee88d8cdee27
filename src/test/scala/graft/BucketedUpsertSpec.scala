package graft

import graft.sources.BucketedUpsert
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Model-based check of the generic O(delta) merge: a random sequence
  * of upserts must leave the table exactly equal to a driver-side map
  * model, in both last-writer-wins and additive modes, across
  * generation flips (odd AND even upsert counts — the even case is
  * what exposed the cross-session relation-cache staleness). */
class BucketedUpsertSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("random last-writer-wins upsert sequences match a map model") {
    import spark.implicits._
    val table = "bu_lww"
    BucketedUpsert.drop(spark, table)
    try {
      val rnd = new scala.util.Random(11)
      var model = (1 to 40).map(i => i.toLong -> rnd.nextInt(100)).toMap
      BucketedUpsert.materialize(
        model.toSeq.toDF("k", "v"), table, "k", 8)
      for (step <- 1 to 4) {
        val delta = Seq.fill(1 + rnd.nextInt(6))(
          (rnd.nextInt(60).toLong + 1, rnd.nextInt(100))).distinctBy(_._1)
        model = model ++ delta.toMap
        BucketedUpsert.upsert(spark, table, delta.toDF("k", "v"),
          Seq("k"), "k", 8)
        val got = BucketedUpsert.read(spark, table).collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(got == model, s"diverged at step $step")
      }
    } finally BucketedUpsert.drop(spark, table)
  }

  test("additive merge sequences match a summing model") {
    import spark.implicits._
    val table = "bu_add"
    BucketedUpsert.drop(spark, table)
    try {
      val rnd = new scala.util.Random(13)
      var model = Map.empty[Long, Long]
      BucketedUpsert.materialize(
        Seq.empty[(Long, Long)].toDF("k", "v"), table, "k", 8)
      for (step <- 1 to 4) {
        val delta = Seq.fill(1 + rnd.nextInt(8))(
          (rnd.nextInt(20).toLong, rnd.nextInt(10).toLong + 1)).distinctBy(_._1)
        model = delta.foldLeft(model) { case (m, (k, v)) =>
          m.updated(k, m.getOrElse(k, 0L) + v)
        }
        BucketedUpsert.upsert(spark, table, delta.toDF("k", "v"),
          Seq("k"), "k", 8,
          merge = (_, ex, dl) => coalesce(ex, lit(0L)) + coalesce(dl, lit(0L)))
        val got = BucketedUpsert.read(spark, table).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == model, s"diverged at step $step")
      }
    } finally BucketedUpsert.drop(spark, table)
  }

  test("empty delta leaves generations and files untouched") {
    import spark.implicits._
    val table = "bu_empty"
    BucketedUpsert.drop(spark, table)
    try {
      BucketedUpsert.materialize(
        Seq((1L, 1), (2L, 2)).toDF("k", "v"), table, "k", 4)
      import scala.jdk.CollectionConverters._
      def files = java.nio.file.Files.list(
        BucketedUpsert.tableDir(spark, table + "__a"))
        .iterator().asScala.map(_.getFileName.toString).toSet
      val before = files
      BucketedUpsert.upsert(spark, table,
        Seq.empty[(Long, Int)].toDF("k", "v"), Seq("k"), "k", 4)
      assert(files == before, "empty delta must not rewrite anything")
      assert(BucketedUpsert.read(spark, table).count() == 2)
    } finally BucketedUpsert.drop(spark, table)
  }

  test("a crashed write (generation written, view never republished) is invisible and recovered") {
    import spark.implicits._
    val table = "bu_crash"
    BucketedUpsert.drop(spark, table)
    try {
      BucketedUpsert.materialize(
        Seq((1L, 10), (2L, 20)).toDF("k", "v"), table, "k", 8)
      // simulate a writer dying BETWEEN the generation write and the
      // view publish: the inactive generation holds orphan data the
      // catalog view never pointed at
      val orphanGen = BucketedUpsert.inactiveGen(spark, table)
      graft.sources.Bucketed.write(
        Seq((99L, 999)).toDF("k", "v"), orphanGen, "k", 8)
      val seen = BucketedUpsert.read(spark, table).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(seen == Map(1L -> 10, 2L -> 20),
        "readers must never observe an unpublished generation")
      // recovery needs no repair step: the next upsert rebuilds the
      // inactive generation wholesale (overwrite + link carry) from
      // the SERVED generation, so the orphan rows cannot leak in
      BucketedUpsert.upsert(spark, table, Seq((2L, 21)).toDF("k", "v"),
        Seq("k"), "k", 8)
      val after = BucketedUpsert.read(spark, table).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(after == Map(1L -> 10, 2L -> 21),
        s"orphan generation must be fully replaced, got $after")
    } finally BucketedUpsert.drop(spark, table)
  }

  test("delete removes keys O(delta): untouched bucket files survive by link") {
    import spark.implicits._
    val table = "bu_del"
    BucketedUpsert.drop(spark, table)
    try {
      val rows = (1L to 64L).map(k => (k, k.toInt * 10))
      BucketedUpsert.materialize(rows.toDF("k", "v"), table, "k", 8)
      import scala.jdk.CollectionConverters._
      def gen(t: String) = {
        val d = BucketedUpsert.tableDir(spark, t)
        java.nio.file.Files.list(d).iterator().asScala
          .map(p => p.getFileName.toString ->
            java.nio.file.Files.readAttributes(p,
              classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey())
          .toMap
      }
      val before = gen(table + "__a")
      BucketedUpsert.delete(spark, table, Seq(3L, 7L).toDF("k"), Seq("k"), "k", 8)
      val after = gen(table + "__b")
      // the two keys land in <= 2 buckets; every other bucket's file in
      // the new generation must be the SAME inode (hard link), not a
      // rewrite
      val sharedInodes = after.values.toSet.intersect(before.values.toSet)
      assert(sharedInodes.size >= 6,
        s"expected >= 6 linked bucket files, got ${sharedInodes.size}")
      val got = BucketedUpsert.read(spark, table).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == rows.toMap -- Seq(3L, 7L))
      // deleting an absent key is a no-op, not an error
      BucketedUpsert.delete(spark, table, Seq(999L).toDF("k"), Seq("k"), "k", 8)
      assert(BucketedUpsert.read(spark, table).count() == 62)
    } finally BucketedUpsert.drop(spark, table)
  }

  test("delete by key-prefix: GrantStore user wipe reverts to default grant") {
    import spark.implicits._
    import graft.sources.GrantStore
    val table = "bu_del_grants"
    GrantStore.drop(spark, table)
    try {
      GrantStore.materialize(
        Seq((1L, "purchase", false), (1L, "message", false),
          (2L, "purchase", true), (3L, "message", false))
          .toDF("user_id", "feature", "has_grant"), table, 8)
      GrantStore.deleteUsers(spark, Seq(1L).toDF("user_id"), table, 8)
      val left = GrantStore.read(spark, table).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(left == Set((2L, "purchase"), (3L, "message")),
        "every row of the wiped user must be gone, others untouched")
    } finally GrantStore.drop(spark, table)
  }
}
