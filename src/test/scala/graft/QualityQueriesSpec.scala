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
