package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The prefix-filter Jaccard plan (t = 0.8) vs the inverted-index
  * plan: the prefix lemma says candidate generation from the
  * n − ⌈t·n⌉ + 1 rarest shingles loses NO pair with J ≥ t, so the
  * prefix plan's rows must equal the full plan's rows filtered to the
  * same threshold.
  */
class JaccardPrefixSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("prefix-filter plan equals the inverted-index plan at its threshold") {
    val prefix = SparkEntry.queries("dedup_jaccard_prefix")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      .filter(col("jaccard") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(prefix == full,
      s"prefix filter must be lossless: only-in-full=${full -- prefix}, " +
        s"only-in-prefix=${prefix -- full}")
    assert(full.nonEmpty, "fixture must contain strong-duplicate pairs")
  }

  test("prefix lemma edge: a pair at exactly the threshold survives") {
    import spark.implicits._
    // J must land EXACTLY on 0.8: |A| = |B| = 9 trigram shingles
    // (11 tokens each), 8 shared => J = 8/(9+9-8) = 0.8. Prefix keeps
    // n − ⌈0.8n⌉ + 1 = 9 − 8 + 1 = 2 rarest shingles per doc: the
    // df=1 unique tail trigram plus the smallest df=2 shared one —
    // the shared prefix element is what surfaces the pair.
    val a = (1 to 11).map(i => s"w$i").mkString(" ")          // w1..w11
    val b = ((1 to 10).map(i => s"w$i") :+ "zz").mkString(" ") // last differs
    val fixture = Seq((1L, a), (2L, b))
    val dir = java.nio.file.Files.createTempDirectory("ppj_fix")
    dir.toFile.deleteOnExit()
    fixture.toDF("doc_id", "text").coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    val got = SparkEntry.queries("dedup_jaccard_prefix")(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 0.8)),
      s"threshold-exact pair must survive the prefix filter: ${got.toSeq}")
    graft.Caches.clearAll()
  }
}
