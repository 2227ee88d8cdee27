package graft

import graft.operators.{DedupSumAggregator, SkewJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-path operators: one-pass dedup-sum Aggregator and the salted
  * skew join (equality with the plain join is the contract). */
class ScaleOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("DedupSumAggregator sums each uuid once, across partitions") {
    import spark.implicits._
    // same uuid in different input partitions → must still count once
    val ds = spark.sparkContext
      .parallelize(Seq((1L, 10.0), (2L, 5.0), (1L, 10.0), (3L, 2.5)), numSlices = 4)
      .toDS()
    val agg = new DedupSumAggregator().toColumn
    val out = ds.select(agg).head()
    assert(out == 17.5)
  }

  test("DedupSumAggregator per key via groupByKey") {
    import spark.implicits._
    val ds = Seq(
      (1L, (10L, 1.0)), (1L, (10L, 1.0)), (1L, (11L, 2.0)),
      (2L, (12L, 5.0)))
      .toDS()
    val out = ds.groupByKey(_._1).mapValues(_._2)
      .agg(new DedupSumAggregator().toColumn.name("s"))
      .collect().toMap
    assert(out == Map(1L -> 3.0, 2L -> 5.0))
  }

  test("salted join equals the plain join") {
    import spark.implicits._
    val big = (1 to 1000).map(i => (i % 3, i.toLong)).toDF("k", "id")
    val small = Seq((0, "a"), (1, "b"), (2, "c"), (9, "z")).toDF("k", "v")
    val plain = big.join(small, Seq("k")).select("k", "id", "v")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.salted(big, small, "k", 8,
      pmod(xxhash64(col("id")), lit(8)))
      .select("k", "id", "v").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("native l2_fp is bit-equal to the HOF formulation (and null-safe)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      (i.toLong,
        Seq.fill(64)(((rnd.nextDouble() * 2 - 1) * (1L << 20)).toLong),
        Seq.fill(64)(((rnd.nextDouble() * 2 - 1) * (1L << 20)).toLong))
    }.toDF("id", "a", "b")
    val both = rows.select(
      graft.functions.expressions.L2DistanceFp(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0L), _ + _).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    // SQL registration + null/length-mismatch behavior
    rows.limit(1).createOrReplaceTempView("l2_fp_t")
    val viaSql = spark.sql(
      "SELECT l2_fp(a, b) = aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0L, (s, v) -> s + v) FROM l2_fp_t")
      .head.getBoolean(0)
    assert(viaSql)
    assert(spark.sql("SELECT l2_fp(array(1L), array(1L, 2L))").head.isNullAt(0))
    assert(spark.sql("SELECT l2_fp(CAST(NULL AS ARRAY<BIGINT>), array(1L))")
      .head.isNullAt(0))
  }

  test("l2_fp fails loudly on long overflow instead of wrapping") {
    // SQL exposure means arbitrary array<bigint> input: inputs outside
    // the internal |q| <= 2^20 quantization contract must raise, never
    // return a silently wrapped wrong distance
    // constant inputs fold at the driver (raw ArithmeticException);
    // data-driven inputs surface it wrapped in a SparkException
    val e = intercept[Throwable] {
      spark.sql(s"SELECT l2_fp(array(${Long.MaxValue}L), array(-2L))").collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(causes(e).exists(_.isInstanceOf[ArithmeticException]),
      s"expected ArithmeticException in cause chain, got $e")
  }
}
