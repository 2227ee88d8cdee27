package graft

import graft.functions.expressions.HllSketchAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HLL sketch accuracy + mergeability (partial aggregation across
  * partitions is the whole point of the sketch). */
class HllSketchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("estimates 100k distinct longs within 3%") {
    import spark.implicits._
    val df = spark.range(100000).toDF("v").repartition(8)
    val est = df.agg(HllSketchAgg(col("v")).as("est")).head().getLong(0)
    assert(math.abs(est - 100000.0) / 100000.0 < 0.03, s"estimate was $est")
  }

  test("small cardinalities hit the linear-counting path exactly-ish") {
    import spark.implicits._
    val df = (1 to 50).map(_.toLong).toDF("v").repartition(4)
    val est = df.agg(HllSketchAgg(col("v")).as("est")).head().getLong(0)
    assert(math.abs(est - 50) <= 2, s"estimate was $est")
  }

  test("duplicates do not inflate the estimate") {
    import spark.implicits._
    val df = (1 to 10000).map(i => (i % 100).toLong).toDF("v").repartition(8)
    val est = df.agg(HllSketchAgg(col("v")).as("est")).head().getLong(0)
    assert(math.abs(est - 100) <= 5, s"estimate was $est")
  }

  test("per-group sketches via groupBy") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (i % 2, i.toLong)).toDF("g", "v")
    val out = df.groupBy("g").agg(HllSketchAgg(col("v")).as("est"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    out.values.foreach(est =>
      assert(math.abs(est - 1000.0) / 1000.0 < 0.06, s"estimate was $est"))
  }

  test("sketch column family: build + union + estimate, SQL-registered") {
    import spark.implicits._
    val s2 = spark.newSession()
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_sketch",
      exprs => graft.functions.expressions.HllSketchBuild(exprs.head)
        .toAggregateExpression(), "built-in")
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_union",
      exprs => graft.functions.expressions.HllUnion(exprs(0), exprs(1)),
      "built-in")
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_estimate",
      exprs => graft.functions.expressions.HllEstimate(exprs.head),
      "built-in")
    // two halves with overlap: union estimate == whole-set estimate
    s2.range(0, 6000).selectExpr("id % 4000 AS v", "id % 2 AS half")
      .createOrReplaceTempView("hll_vals")
    val row = s2.sql("""
      WITH halves AS (
        SELECT half, hll_sketch(v) AS sk FROM hll_vals GROUP BY half),
      merged AS (
        SELECT hll_estimate(hll_union(a.sk, b.sk)) AS est_union
        FROM halves a JOIN halves b ON a.half = 0 AND b.half = 1),
      whole AS (SELECT hll_estimate(hll_sketch(v)) AS est_whole FROM hll_vals)
      SELECT est_union, est_whole FROM merged CROSS JOIN whole""").head()
    assert(row.getLong(0) == row.getLong(1),
      "union of half-sketches must estimate exactly like the one-shot sketch")
    assert(math.abs(row.getLong(0) - 4000.0) / 4000.0 < 0.05)
  }
}
