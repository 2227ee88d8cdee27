package graft

import graft.queries.TextQueries
import org.scalatest.funsuite.AnyFunSuite

/** Winnowing fingerprint selection: the two paper guarantees on
  * synthetic corpora — (1) any shared passage of >= W+k-1 tokens
  * yields a shared selected fingerprint, (2) selection density is
  * near the expected 2/(W+1). */
class WinnowingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def words(seed: Int, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)("w" + rnd.nextInt(5000))
  }

  test("a shared 10-token passage always yields a shared fingerprint") {
    import spark.implicits._
    val passage = words(1, 10)
    // the same passage embedded in fully different surroundings
    val docs = Seq(
      (1L, (words(2, 30) ++ passage ++ words(3, 30)).mkString(" ")),
      (2L, (words(4, 25) ++ passage ++ words(5, 40)).mkString(" ")),
      (3L, words(6, 60).mkString(" "))) // no shared passage
      .toDF("doc_id", "text")
    val sel = TextQueries.winnowSelect(docs)
    val byDoc = sel.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "guaranteed shared fingerprint missing")
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty ||
      (byDoc(1L) intersect byDoc(3L)).size < 2,
      "unrelated docs should share ~no fingerprints")
  }

  test("selection density is close to the expected 2/(W+1)") {
    import spark.implicits._
    val docs = (1 to 20).map(i => (i.toLong, words(100 + i, 400).mkString(" ")))
      .toDF("doc_id", "text")
    val sel = TextQueries.winnowSelect(docs)
    val density = sel.count().toDouble / (20 * (400 - 2))
    // W=4 → expectation 0.4; distinct-ing repeated minima pulls it
    // slightly below, random collisions wobble it
    assert(density > 0.25 && density < 0.55, s"density $density off 2/(W+1)")
  }
}
