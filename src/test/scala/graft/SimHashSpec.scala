package graft

import graft.functions.TextOps._
import graft.functions.expressions.SimHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused native SimHash must be bit-identical to the HOF
  * transform+aggregate formulation it replaced (which is what the
  * DuckDB oracle mirrors). */
class SimHashSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** The original interpreted formulation, kept here as the parity
    * reference. */
  private def hofSimhash = {
    val hl = transform(tokens(col("text")), t => portableHash(t))
    (0 until SimhashBits).map { b =>
      val bitsum = aggregate(hl, lit(0L),
        (acc, h) => acc + (shiftright(h, b) % lit(2L)) * lit(2L) - lit(1L))
      when(bitsum > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  test("native simhash is bit-identical to the HOF formulation") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",
      "einzelne wörter mit umlauten und 中文 mixed in",
      "x",
      "a a a a a a a a",
      "").toDF("text")
    val rows = docs.select(
      SimHash(tokens(col("text")), SimhashBits).as("native"),
      hofSimhash.as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("near-identical docs share a signature, distinct docs do not") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "totally different content about spark engines and parquet files"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), SimHash(tokens(col("text")), SimhashBits).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("hash60 matches TextOps.portableHash for unicode tokens") {
    import spark.implicits._
    val toks = Seq("hello", "wörld", "中文", "", "123").toDF("t")
    val rows = toks.select(portableHash(col("t")).as("p"),
      SimHash(array(col("t")), 1).as("dummy"), col("t")).collect()
    rows.foreach { r =>
      val expect = r.getLong(0)
      val got = SimHash.hash60(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(2)))
      assert(got == expect, s"token ${r.getString(2)}")
    }
  }

  test("sql function simhash is registered via GraftExtensions") {
    val s2 = spark.newSession()
    // extensions normally attach at build time via
    // spark.sql.extensions=graft.GraftExtensions; for the already-built
    // test session, register through the function registry directly
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash",
      exprs => graft.functions.expressions.SimHash(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    val sig = s2.sql(
      "SELECT simhash(array('alpha','beta'), 32) AS s").head().getLong(0)
    import spark.implicits._
    val expect = Seq("alpha beta").toDF("text")
      .select(SimHash(tokens(col("text")), SimhashBits)).head().getLong(0)
    assert(sig == expect)
  }
}
