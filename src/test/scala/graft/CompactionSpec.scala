package graft

import graft.sources.{CorpusWriter, Layouts, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Small-file compaction: bin-packs a partitioned layout's leaf dirs to
  * the target file size losslessly, leaves healthy leaves alone, is
  * idempotent, and (via CorpusWriter.compact) republishes the manifest
  * to describe the new layout. */
class CompactionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def tmp(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p.resolve("out").toString
  }

  private def parquetFiles(leaf: java.io.File): Array[java.io.File] =
    leaf.listFiles().filter(f =>
      f.isFile && f.getName.endsWith(".parquet") && !f.getName.startsWith("_")
        && !f.getName.startsWith("."))

  test("compactLeaves collapses fragmented date partitions losslessly and idempotently") {
    import spark.implicits._
    val dir = tmp("graft_compact")
    val events = (0 until 3000).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-02-${i % 5 + 1}%02d 09:00:00"),
        i.toLong % 50, "click", i.toDouble)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    // 16 writer tasks x 5 dates = ~80 small files, the post-ingest state
    Layouts.writeEventsByDay(events.repartition(16), dir)
    val leafDirs = new java.io.File(dir).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("event_date="))
    assert(leafDirs.forall(parquetFiles(_).length > 1), "fixture must be fragmented")
    val before = Layouts.readEvents(spark, dir)
      .orderBy("event_id").collect().toSeq

    val report = Layouts.compactLeaves(spark, dir) // default target >> data
    assert(report.size == 5, s"expected all 5 leaves compacted, got $report")
    report.foreach { st =>
      assert(st.filesAfter == 1 && st.filesBefore > 1, st.toString)
    }
    leafDirs.foreach(d => assert(parquetFiles(d).length == 1,
      s"${d.getName} not compacted"))
    // lossless, partition column intact
    val after = Layouts.readEvents(spark, dir).orderBy("event_id").collect().toSeq
    assert(after == before, "compaction must not change the data")
    // second run: everything already at target — no-op
    assert(Layouts.compactLeaves(spark, dir).isEmpty, "rerun must be a no-op")
  }

  test("a leaf already within target is untouched (its files keep their identity)") {
    import spark.implicits._
    val dir = tmp("graft_compact_noop")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.parquet(dir)
    val names = parquetFiles(new java.io.File(dir)).map(_.getName).toSet
    assert(Layouts.compactLeaves(spark, dir).isEmpty)
    assert(parquetFiles(new java.io.File(dir)).map(_.getName).toSet == names)
  }

  test("crash mid-publish: a rerun recovers the committed rewrite, no loss or duplication") {
    import spark.implicits._
    val dir = tmp("graft_compact_crash")
    (0 until 400).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(8).write.parquet(dir)
    val leaf = new java.io.File(dir)
    assert(parquetFiles(leaf).length > 1, "fixture must be fragmented")
    val before = spark.read.parquet(dir).orderBy("id").collect().toSeq

    // simulate the worst crash window: the replacement is complete in
    // scratch and the marker is durable, originals PARTIALLY deleted,
    // nothing moved in yet. Build that state by hand with the same
    // layout compactLeaves produces.
    val scratch = new java.io.File(leaf, "_compacting")
    spark.read.parquet(dir).coalesce(1)
      .write.mode("overwrite").parquet(scratch.toString)
    val originals = parquetFiles(leaf).map(_.getName)
    java.nio.file.Files.write(
      new java.io.File(leaf, "_compact_commit").toPath,
      originals.mkString("\n").getBytes("UTF-8"))
    // the "crash": half the originals already deleted
    originals.take(originals.length / 2).foreach(n =>
      java.nio.file.Files.delete(new java.io.File(leaf, n).toPath))

    // rerun recovers: adopts the scratch replacement, drops the rest
    val report = Layouts.compactLeaves(spark, dir)
    val after = spark.read.parquet(dir).orderBy("id").collect().toSeq
    assert(after == before, "recovery must restore exactly the original rows")
    assert(parquetFiles(leaf).length == 1, "leaf must end packed")
    assert(!new java.io.File(leaf, "_compact_commit").exists()
      && !scratch.exists(), "marker and scratch must be gone")
    // recovered leaf was already at target — the rerun itself reports
    // nothing further to do
    assert(report.isEmpty, report.toString)
  }

  test("CorpusWriter.compact republishes the manifest for the packed layout") {
    val path = tmp("graft_corpus_compact")
    val in = Tables.documents(spark, sf)
      .withColumn("n_tok", size(split(trim(col("text")), " ")).cast("long"))
      .select("doc_id", "lang", "n_tok", "text")
    // tiny rowsPerFile => many salted cells per lang dir. AQE off for
    // the write: on fixture-sized data it coalesces the salted exchange
    // to one partition = one file per dir, defeating the fragmentation
    // this test needs (at real scale the cells genuinely spread).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try CorpusWriter.write(in, path, Seq("lang"), "doc_id",
      rowsPerFile = 20, tokenCol = Some("n_tok"))
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val mBefore = CorpusWriter.manifest(spark, path)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(mBefore.values.exists(_._3 > 1), "fixture must start fragmented")

    val report = CorpusWriter.compact(spark, path)
    assert(report.nonEmpty)

    val mAfter = CorpusWriter.manifest(spark, path)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(mAfter.keySet == mBefore.keySet)
    mAfter.foreach { case (lang, (rows, toks, files)) =>
      assert(rows == mBefore(lang)._1 && toks == mBefore(lang)._2,
        s"$lang: row/token counts must carry over unchanged")
      assert(files == 1L, s"$lang: expected 1 packed file, got $files")
    }
    // the published read path still round-trips exactly
    val back = CorpusWriter.read(spark, path)
      .select("doc_id", "lang", "n_tok", "text")
    assert(back.exceptAll(in).isEmpty && in.exceptAll(back).isEmpty,
      "compacted corpus must round-trip row-for-row")
  }

  test("GRAFT COMPACT drives the maintenance pass through spark.sql") {
    val path = tmp("graft_sql_compact")
    val in = Tables.documents(spark, sf)
      .withColumn("n_tok", size(split(trim(col("text")), " ")).cast("long"))
      .select("doc_id", "lang", "n_tok", "text")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try CorpusWriter.write(in, path, Seq("lang"), "doc_id",
      rowsPerFile = 20, tokenCol = Some("n_tok"))
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")

    val report = spark.sql(s"GRAFT COMPACT '$path' TARGET 128 MB").collect()
    assert(report.nonEmpty, "fragmented corpus must report rewritten leaves")
    report.foreach { r =>
      assert(r.getInt(1) > r.getInt(2),
        s"${r.getString(0)}: files_before must shrink: $r")
      assert(r.getInt(2) == 1, s"128 MB target packs each leaf to 1 file: $r")
    }

    // manifest describes the packed layout; data round-trips exactly
    val m = CorpusWriter.manifest(spark, path).collect()
    assert(m.forall(_.getLong(3) == 1L), "manifest must see 1 file per leaf")
    val back = CorpusWriter.read(spark, path)
      .select("doc_id", "lang", "n_tok", "text")
    assert(back.exceptAll(in).isEmpty && in.exceptAll(back).isEmpty,
      "SQL-compacted corpus must round-trip row-for-row")

    // idempotent: a second statement finds nothing to rewrite
    assert(spark.sql(s"GRAFT COMPACT '$path'").collect().isEmpty)
  }
}
