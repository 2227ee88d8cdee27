package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Market-basket family invariants (the DuckDB hash gate is the
  * primary check; these pin the algebra).
  */
class MarketBasketSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("copurchase_cosine: cosine bounded by (0, 1], support >= min-support") {
    val c = SparkEntry.queries("copurchase_cosine")(spark, sf)
    assert(c.count() > 0)
    assert(c.filter(col("cosine") <= 0 || col("cosine") > 1).count() == 0)
    assert(c.filter(col("support_cnt") < 2).count() == 0)
  }

  test("basket_rules: lift is symmetric across rule direction, confidence in (0, 1]") {
    val r = SparkEntry.queries("basket_rules")(spark, sf).cache()
    try {
    assert(r.filter(col("confidence") <= 0 || col("confidence") > 1).count() == 0)
    // lift(i→j) = c·N/(n_i·n_j) is direction-free: the reversed rule
    // must carry the identical value
    val asym = r.select(col("antecedent").as("a"), col("consequent").as("b"),
        col("lift"))
      .join(r.select(col("consequent").as("a"), col("antecedent").as("b"),
        col("lift").as("lift2")), Seq("a", "b"))
      .filter(col("lift") =!= col("lift2"))
    assert(asym.count() == 0, "lift must be symmetric")
    // every pair appears in both directions
    assert(r.count() ==
      2 * SparkEntry.queries("copurchase_cosine")(spark, sf).count())
    } finally r.unpersist()
  }
}
