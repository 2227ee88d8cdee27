package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed cases for the entropy quality score
  * (queries/QualityQueries.scala token_entropy_fp): exact fixed-point
  * values at the distribution extremes, and the kept-threshold
  * calibration on the driver corpus.
  */
class QualityQueriesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val S = graft.functions.FixedPointOps.FpScale

  test("token entropy: exact fp values for degenerate, uniform and mixed docs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ent_fix")
    dir.toFile.deleteOnExit()
    Seq(
      (1L, "a a a a"),   // one type: H = 0 exactly
      (2L, "a b c d"),   // uniform over 4: H = 2 bits exactly
      (3L, "a a b b"),   // two pairs: H = 1 bit exactly
      (4L, "x")          // single token: H = lg(1) = 0
    ).toDF("doc_id", "text").coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    val got = SparkEntry.queries("token_entropy_fp")(spark, dir.toString)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(got(1L) == ((4L, 0L, false)))
    assert(got(2L) == ((4L, 2L * S, false)))
    assert(got(3L) == ((4L, 1L * S, false)))
    assert(got(4L) == ((1L, 0L, false)))
  }

  test("ES weighted sample: exactly k distinct docs, skewed toward heavy weights") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.01"
    val sample = SparkEntry.queries("corpus_sample_es")(spark, sf).cache()
    try {
      assert(sample.count() == 100, "exact-k draw")
      assert(sample.select(col("doc_id")).distinct().count() == 100,
        "without replacement")
      // probability ∝ token count ⇒ the sample's mean length must
      // exceed the corpus mean (weights span ~5-60 tokens, k=100 of
      // 500 — far outside noise for a correct weighted draw)
      val sMean = sample.agg(avg(col("n_tokens"))).head().getDouble(0)
      val cMean = graft.sources.Tables.documents(spark, sf)
        .select(size(split(trim(col("text")), " ")).cast("double").as("n"))
        .agg(avg(col("n"))).head().getDouble(0)
      assert(sMean > cMean * 1.1,
        s"weighted draw must skew long: sample $sMean vs corpus $cMean")
    } finally sample.unpersist()
  }

  test("driver corpus: the 4-bit cut keeps most docs but filters a real tail") {
    val out = SparkEntry.queries("token_entropy_fp")(
      spark, "/root/testdata/sf0.01")
    val (kept, dropped) = {
      val rows = out.collect()
      (rows.count(_.getBoolean(3)), rows.count(!_.getBoolean(3)))
    }
    assert(kept > dropped, "most of the corpus passes")
    assert(dropped > 0, "a filter that only says yes tests nothing")
  }
}
