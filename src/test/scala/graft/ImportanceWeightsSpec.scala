package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR-shaped importance weighting: exact parity with a pure-scala
  * reference on a hand-built corpus, plus fixture-level invariants. */
class ImportanceWeightsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val run = SparkEntry.queries("importance_weights")

  /** The query's hash/bucket/weight arithmetic, reimplemented without
    * Spark: md5-hex-prefix bucket, 1e-6 fixed-point frequency ratio,
    * integer division end to end. */
  private object Ref {
    val B = 4096L
    val Scale = 1000000L
    def bucket(token: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(token.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % B
    }
    def weights(docs: Seq[(Long, String, String)]): Map[Long, (Long, Long)] = {
      val toks = docs.flatMap { case (id, text, lang) =>
        text.trim.split(" ").filter(_.nonEmpty).map(t => (id, lang, bucket(t)))
      }
      val sN = toks.groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
      val tN = toks.filter(_._2 == "en").groupBy(_._3)
        .map { case (b, xs) => b -> xs.size.toLong }
      val wFp = sN.map { case (b, s) => b -> (tN.getOrElse(b, 0L) * Scale) / s }
      toks.groupBy(_._1).map { case (id, xs) =>
        val n = xs.size.toLong
        val wsum = xs.groupBy(_._3).map { case (b, g) => g.size * wFp(b) }.sum
        id -> ((n, wsum / n))
      }
    }
  }

  test("matches the scala reference exactly on a hand-built corpus") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "aa aa bb", "en"),
      (1L, "aa bb bb cc", "en"),
      (2L, "cc cc dd dd", "zh"),
      (3L, "aa cc dd", "zh"),
      (4L, "bb", "fr"))
    val dir = Files.createTempDirectory("iw").toString
    corpus.map { case (id, text, lang) => (id, text, lang, "srcX", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    val got = run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Ref.weights(corpus))
    // sanity of the reference itself: the all-target-token doc
    // outranks the no-target-token doc
    assert(got(0L)._2 > got(2L)._2)
  }

  test("fixture: weights bounded, target slice scores above the corpus mean") {
    val out = run(spark, "/root/testdata/sf0.001").cache()
    try {
      assert(out.filter(col("weight_fp") < 0 || col("weight_fp") > 1000000L)
        .count() == 0, "fixed-point weight outside [0, 1e6]")
      val byLang = out
        .join(graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
          .select(col("doc_id"), col("lang")), Seq("doc_id"))
      val en = byLang.filter(col("lang") === "en")
        .agg(avg(col("weight_fp"))).head().getDouble(0)
      val all = byLang.agg(avg(col("weight_fp"))).head().getDouble(0)
      assert(en > all, s"en mean $en should exceed corpus mean $all")
    } finally out.unpersist()
  }
}
