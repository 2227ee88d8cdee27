package graft

import graft.functions.expressions.MisraGriesAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Misra–Gries frequent-items guarantees: no false negatives above
  * n/(capacity+1) — including across partition merges, which is where
  * a wrong merge rule silently loses items — and bounded summary
  * size. */
class MisraGriesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def candidates(items: Seq[String], capacity: Int, parts: Int): Set[String] = {
    import spark.implicits._
    items.toDF("x").repartition(parts)
      .agg(MisraGriesAgg(col("x"), capacity).as("c"))
      .head().getSeq[String](0).toSet
  }

  test("every item above n/(k+1) survives, across 8 partitions") {
    val rnd = new Random(7)
    // 3 heavy items at ~5% each in a sea of 20k-unique noise
    val heavy = Seq.fill(1500)("hot1") ++ Seq.fill(1200)("hot2") ++ Seq.fill(900)("hot3")
    val noise = Seq.fill(16000)(s"n${rnd.nextInt(20000)}")
    val all = rnd.shuffle(heavy ++ noise)
    val k = 49 // threshold n/50 = ~392 < 900
    val out = candidates(all, k, 8)
    assert(out.size <= k)
    Seq("hot1", "hot2", "hot3").foreach(h =>
      assert(out.contains(h), s"$h (freq > n/(k+1)) must be in the summary"))
  }

  test("adversarial: heavy item arriving last still survives the merge") {
    // all heavy occurrences in ONE partition, noise everywhere else —
    // the shape that breaks a merge that keeps only per-partition tops
    val heavy = Seq.fill(800)("late")
    val noise = (0 until 12000).map(i => s"u$i")
    val k = 19 // n/(k+1) = 12800/20 = 640 < 800
    import spark.implicits._
    val df = noise.map(("a", _)).toDF("p", "x")
      .union(heavy.map(("b", _)).toDF("p", "x"))
      .repartition(6, col("p"))
    val out = df.agg(MisraGriesAgg(col("x"), k).as("c"))
      .head().getSeq[String](0).toSet
    assert(out.contains("late"))
  }

  test("summary never exceeds capacity; exact when items fit") {
    val exact = (0 until 30).flatMap(i => Seq.fill(i + 1)(s"t$i"))
    val out = candidates(new Random(3).shuffle(exact), 50, 4)
    assert(out == (0 until 30).map(i => s"t$i").toSet,
      "with <= capacity distinct items the summary is the exact item set")
    val over = (0 until 500).map(i => s"x$i")
    assert(candidates(over, 20, 4).size <= 20)
  }

  test("streaming aggregation: heavy items survive incremental triggers") {
    // the summary is a mergeable TypedImperativeAggregate, so it runs
    // unchanged in a streaming complete-mode aggregation: partial
    // buffers merge across micro-batches exactly like across
    // partitions, and the no-false-negative guarantee holds over the
    // union of everything ingested so far.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[String](spark)
    val q = mem.toDF().toDF("x")
      .agg(MisraGriesAgg(col("x"), 19).as("c"))
      .writeStream.format("memory").queryName("mg_stream")
      .outputMode("complete").start()
    try {
      val rnd = new Random(5)
      // heavy item split ACROSS micro-batches — each batch alone is
      // noise-dominated, only the merged state sees it as heavy
      (1 to 4).foreach { _ =>
        mem.addData(rnd.shuffle(Seq.fill(200)("hot") ++
          (0 until 1500).map(_ => s"n${rnd.nextInt(5000)}")): _*)
        q.processAllAvailable()
      }
      val got = spark.table("mg_stream").head().getSeq[String](0).toSet
      // n = 4*(200+1500) = 6800; n/(k+1) = 340 < 800 occurrences
      assert(got.contains("hot"), "heavy-across-batches item must survive")
      assert(got.size <= 19)
    } finally q.stop()
  }

  test("a >64KB token survives the shuffle serialization") {
    // raw-corpus tokenization yields unbroken base64/minified-JS runs;
    // writeUTF-based serialization would throw UTFDataFormatException
    // at 65536 bytes and kill the whole aggregation
    val blob = "A" * 100000
    val items = Seq.fill(60)(blob) ++ (0 until 400).map(i => s"u$i")
    val out = candidates(new Random(11).shuffle(items), 9, 4)
    assert(out.contains(blob), "the oversized heavy token must survive")
  }
}
