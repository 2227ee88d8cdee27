package graft

import graft.sources.{BucketedUpsert, RunManifest}
import org.scalatest.funsuite.AnyFunSuite

/** Run-level pinning: one manifest ties several stores' snapshots
  * into an immutable, crash-detectable training-run record. */
class RunManifestSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def stateOf(table: String): Map[Long, Int] =
    BucketedUpsert.read(spark, table).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  private def tmpRun(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).resolve("run1").toString

  test("a pinned run reads every store AS OF the pin, across later merges") {
    import spark.implicits._
    val (ta, tb) = ("run_corpus", "run_grants")
    val runDir = tmpRun("rm_pin")
    Seq(ta, tb).foreach(BucketedUpsert.drop(spark, _))
    try {
      BucketedUpsert.materialize(
        (1L to 20L).map(k => k -> 1).toDF("k", "v"), ta, "k", 4)
      BucketedUpsert.materialize(
        (1L to 10L).map(k => k -> 5).toDF("k", "v"), tb, "k", 4)
      val (pinA, pinB) = (stateOf(ta), stateOf(tb))

      val counts = RunManifest.pin(spark, runDir, Seq(ta, tb))
      assert(counts.map(_._1) == Seq(ta, tb) && counts.forall(_._2 > 0))
      assert(RunManifest.tables(runDir) == Seq(ta, tb))

      // both stores move on; the run record must not
      BucketedUpsert.upsert(spark, ta,
        Seq(1L -> 9, 21L -> 9).toDF("k", "v"), Seq("k"), "k", 4)
      BucketedUpsert.upsert(spark, tb,
        Seq(2L -> 8).toDF("k", "v"), Seq("k"), "k", 4)
      assert(stateOf(ta) != pinA && stateOf(tb) != pinB)

      def runState(t: String) = RunManifest.read(spark, runDir, t).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(runState(ta) == pinA)
      assert(runState(tb) == pinB)

      // immutable: a second pin into the same run dir is refused
      intercept[IllegalArgumentException] {
        RunManifest.pin(spark, runDir, Seq(ta))
      }
      // and a table the run never pinned is refused
      intercept[IllegalArgumentException] {
        RunManifest.read(spark, runDir, "not_pinned")
      }
    } finally Seq(ta, tb).foreach(BucketedUpsert.drop(spark, _))
  }

  test("a pin that crashed before the manifest is refused as incomplete") {
    import spark.implicits._
    val t = "run_partial"
    val runDir = tmpRun("rm_partial")
    BucketedUpsert.drop(spark, t)
    try {
      BucketedUpsert.materialize(
        (1L to 5L).map(k => k -> 1).toDF("k", "v"), t, "k", 2)
      RunManifest.pin(spark, runDir, Seq(t))
      // simulate the crash window: snapshots on disk, marker gone
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(runDir, RunManifest.ManifestFile))
      intercept[IllegalArgumentException] { RunManifest.tables(runDir) }
      intercept[IllegalArgumentException] { RunManifest.read(spark, runDir, t) }
    } finally BucketedUpsert.drop(spark, t)
  }

  test("a truncated manifest is refused, not read as a smaller pin") {
    import spark.implicits._
    val (ta, tb) = ("run_trunc_a", "run_trunc_b")
    val runDir = tmpRun("rm_trunc")
    Seq(ta, tb).foreach(BucketedUpsert.drop(spark, _))
    try {
      Seq(ta, tb).foreach(t => BucketedUpsert.materialize(
        (1L to 5L).map(k => k -> 1).toDF("k", "v"), t, "k", 2))
      RunManifest.pin(spark, runDir, Seq(ta, tb))
      val p = java.nio.file.Paths.get(runDir, RunManifest.ManifestFile)
      val bytes = java.nio.file.Files.readString(p)
      // simulate a torn write that still yields ONE well-formed entry:
      // without the n_tables sentinel this would read as a complete
      // one-table pin
      val cut = bytes.substring(0, bytes.indexOf(s""""$tb""""))
      java.nio.file.Files.writeString(p, cut)
      val e = intercept[IllegalArgumentException] { RunManifest.tables(runDir) }
      assert(e.getMessage.contains("corrupt"))
    } finally Seq(ta, tb).foreach(BucketedUpsert.drop(spark, _))
  }

  test("GRAFT PIN RUN pins through plain SQL") {
    import spark.implicits._
    val (ta, tb) = ("run_sql_a", "run_sql_b")
    val runDir = tmpRun("rm_sql")
    Seq(ta, tb).foreach(BucketedUpsert.drop(spark, _))
    try {
      BucketedUpsert.materialize(
        (1L to 8L).map(k => k -> 1).toDF("k", "v"), ta, "k", 2)
      BucketedUpsert.materialize(
        (1L to 4L).map(k => k -> 2).toDF("k", "v"), tb, "k", 2)
      val before = stateOf(ta)

      val rows = spark.sql(s"GRAFT PIN RUN '$runDir' TABLES $ta, $tb")
        .collect()
      assert(rows.map(_.getString(0)).toSeq == Seq(ta, tb))
      assert(rows.forall(_.getInt(2) > 0))

      BucketedUpsert.upsert(spark, ta,
        Seq(1L -> 7).toDF("k", "v"), Seq("k"), "k", 2)
      val pinned = RunManifest.read(spark, runDir, ta).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(pinned == before)
      // statements still delegate: normal SQL unaffected
      assert(spark.sql("SELECT 1 AS one").collect().head.getInt(0) == 1)
    } finally Seq(ta, tb).foreach(BucketedUpsert.drop(spark, _))
  }
}
