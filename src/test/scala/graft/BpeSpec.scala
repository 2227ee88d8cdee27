package graft

import graft.operators.Bpe
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed BPE training vs a single-threaded reference
  * implementation (the Sennrich algorithm verbatim), plus the
  * determinism and segmentation contracts. */
object BpeSpec {

  /** Reference BPE: plain in-memory implementation, same tie-break
    * (count desc, then (left, right) lexicographic). */
  def referenceTrain(words: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    var wc: Map[Seq[String], Long] = words.map { case (w, n) =>
      (w.split("").toSeq :+ Bpe.Eow) -> n
    }.groupMapReduce(_._1)(_._2)(_ + _)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < numMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      wc.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + n
          case _ =>
        }
      }
      if (pairCounts.isEmpty || pairCounts.values.max < 2L) done = true
      else {
        val (pair, _) = pairCounts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }
        merges += pair
        wc = wc.map { case (syms, n) =>
          Bpe.mergeWord(syms, pair._1, pair._2) -> n
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    merges.toSeq
  }
}

class BpeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("distributed training equals the reference implementation, ties included") {
    import spark.implicits._
    // words engineered so several rounds TIE on count and the
    // lexicographic break decides (low/lot share 'lo'; est/west share
    // 'es'+'st' chains)
    val words = Map(
      "low" -> 5L, "lower" -> 2L, "lowest" -> 6L,
      "newest" -> 6L, "widest" -> 3L, "west" -> 5L, "nest" -> 5L)
    val docs = words.toSeq.flatMap { case (w, n) =>
      Seq.fill(n.toInt)(w)
    }.grouped(3).map(_.mkString(" ")).toSeq.toDF("text")
    val got = Bpe.train(docs, numMerges = 12)
      .map(m => (m.left, m.right))
    val want = BpeSpec.referenceTrain(words, numMerges = 12)
    assert(got == want, s"\ngot  $got\nwant $want")
  }

  test("fixture corpus: deterministic across partitionings, reference-equal") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select(col("text")).limit(80)
    val words = docs.select(explode(split(trim(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .as[(String, Long)].collect().toMap
    val a = Bpe.train(docs, numMerges = 12).map(m => (m.left, m.right))
    val b = Bpe.train(docs.repartition(7), numMerges = 12).map(m => (m.left, m.right))
    assert(a == b, "merge table must not depend on partitioning")
    assert(a == BpeSpec.referenceTrain(words, 12), "must match the reference")
    assert(a.size == 12, "fixture must support 12 merges")
  }

  test("segmentation round-trips: concatenated tokens minus markers rebuild the text") {
    import spark.implicits._
    val docs = Seq("the lowest west nest", "lower and lower").toDF("text")
    val merges = Bpe.train(docs, numMerges = 8)
    val seg = Bpe.segment(spark, docs, merges)
      .select(col("text"), concat_ws("", col("bpe_tokens")).as("joined"))
      .as[(String, String)].collect()
    seg.foreach { case (text, joined) =>
      val rebuilt = joined.replace(Bpe.Eow, " ").trim
      assert(rebuilt == text.trim.split("\\s+").mkString(" "),
        s"'$text' segmented to '$joined'")
    }
    // learned merges actually fire: some token longer than one char
    val anyMerged = Bpe.segment(spark, docs, merges)
      .select(explode(col("bpe_tokens")).as("t"))
      .filter(length(col("t")) > 1 && col("t") =!= Bpe.Eow).count()
    assert(anyMerged > 0, "no merge ever applied at segmentation")
  }

  test("wordSegments agrees with segment on every distinct word") {
    import spark.implicits._
    // includes tab/newline padding ON PURPOSE (ADVICE r13): segment
    // once used Java String.trim (strips all chars <= U+0020) while
    // wordSegments rides TextOps.tokens (Spark trim — spaces only);
    // the \t/\n rows pin the space-only convention on both paths
    val docs = Seq("the lowest west nest", "lower and lower",
      "newest nest  spaced", " padded ",
      "\ttab lowered\n", "mid\tword and\ntrailing newest\t").toDF("text")
    val merges = Bpe.train(docs, numMerges = 8)
    // per-word truth from the document-level encoder
    val viaSegment = Bpe.segment(spark, docs.select(
        explode(split(trim(col("text")), " ")).as("text"))
        .filter(length(col("text")) > 0).distinct(), merges)
      .select(col("text").as("w"), concat_ws("|", col("bpe_tokens")).as("s"))
      .as[(String, String)].collect().toMap
    val viaWords = Bpe.wordSegments(spark, docs, merges)
      .select(col("w"), concat_ws("|", col("syms")).as("s"))
      .as[(String, String)].collect().toMap
    assert(viaWords == viaSegment,
      "vocabulary-level encode must equal the document-level encode")
  }

  test("stops early when no pair repeats") {
    import spark.implicits._
    val docs = Seq("ab cd ef").toDF("text") // every pair count = 1
    assert(Bpe.train(docs, numMerges = 10).isEmpty)
  }

  test("vocab artifact round-trips; tampering fails fast") {
    import spark.implicits._
    val docs = Seq("the lowest west nest", "lower and lower", "newest nest").toDF("text")
    val merges = Bpe.train(docs, numMerges = 6)
    val dir = java.nio.file.Files.createTempDirectory("vocab").toString + "/v1"
    Bpe.save(spark, merges, dir)
    val loaded = Bpe.load(spark, dir)
    assert(loaded == merges.sortBy(_.rank))
    // segmentation through the loaded artifact is identical
    val a = Bpe.segment(spark, docs, merges)
      .select(concat_ws("|", col("bpe_tokens"))).collect().map(_.getString(0)).sorted
    val b = Bpe.segment(spark, docs, loaded)
      .select(concat_ws("|", col("bpe_tokens"))).collect().map(_.getString(0)).sorted
    assert(a.sameElements(b))
    // double-publish refused; missing manifest refused
    intercept[Exception](Bpe.save(spark, merges, dir))
    val bare = java.nio.file.Files.createTempDirectory("vocab2").toString + "/v2"
    spark.createDataFrame(Seq((0, "a", "b"))).toDF("rank", "left", "right")
      .write.parquet(s"$bare/merges.parquet")
    intercept[IllegalArgumentException](Bpe.load(spark, bare))
    // checksum mismatch (manifest from a different table) refused
    val other = java.nio.file.Files.createTempDirectory("vocab3").toString + "/v3"
    Bpe.save(spark, merges.take(3), other)
    val fs = new org.apache.hadoop.fs.Path(other)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // graft the full-table parquet beside the 3-merge manifest
    fs.delete(new org.apache.hadoop.fs.Path(s"$other/merges.parquet"), true)
    merges.sortBy(_.rank).map(m => (m.rank, m.left, m.right))
      .toDF("rank", "left", "right").repartition(1)
      .write.parquet(s"$other/merges.parquet")
    intercept[IllegalArgumentException](Bpe.load(spark, other))
  }

  test("bpe_encode query: every doc segmented, learned merges fire corpus-wide") {
    val out = SparkEntry.queries("bpe_encode")(spark, sf).cache()
    try {
      val nDocs = Tables.documents(spark, sf).count()
      assert(out.count() == nDocs, "one row per document")
      // a symbol never spans a whitespace word, so there are at least
      // as many symbols as words; merges must actually fire somewhere
      assert(out.filter(col("n_symbols") < col("n_ws_tokens")).count() == 0)
      assert(out.agg(sum(col("n_merged_symbols"))).head().getLong(0) > 0,
        "trained merges never applied")
    } finally out.unpersist()
  }
}
