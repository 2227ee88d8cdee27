package graft

import graft.functions.expressions.CosineSimilarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native expression vs the HOF formulation: identical doubles
  * (same accumulation order), NULL on zero-norm/mismatch, SQL
  * registration via GraftExtensions. */
class CosineSimilaritySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def hofCosine = {
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  test("matches the HOF formulation bit-for-bit on real vectors") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, -5.0, 6.0)),
      (Seq(0.1, -0.2, 0.3), Seq(0.3, 0.2, -0.1)),
      (Seq(1e-8, 2e8, -3.0), Seq(7.0, 1e-9, 2e4)))
      .toDF("a", "b")
    val out = df.select(
      CosineSimilarity(col("a"), col("b")).as("native"),
      hofCosine(col("a"), col("b")).as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null on zero-norm and length mismatch") {
    import spark.implicits._
    val df = Seq(
      (Seq(0.0, 0.0), Seq(1.0, 2.0)),
      (Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
    val out = df.select(CosineSimilarity(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("interpreted eval matches codegen") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    val expr = CosineSimilarity(col("a"), col("b"))
    val fromDf = df.select(expr).head().getDouble(0)
    // force interpreted path
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1.0, 2.0)),
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(3.0, 4.0)))
    val interp = graft.functions.expressions.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType), true),
      org.apache.spark.sql.catalyst.expressions.BoundReference(1,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType), true))
      .eval(row).asInstanceOf[Double]
    assert(java.lang.Double.doubleToLongBits(fromDf) ==
      java.lang.Double.doubleToLongBits(interp))
  }

  test("SQL registration through GraftExtensions") {
    val s2 = spark.newSession()
    // extensions normally attach at build time via
    // spark.sql.extensions=graft.GraftExtensions; for the already-built
    // test session, register through the function registry directly
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => graft.functions.expressions.CosineSimilarity(exprs(0), exprs(1)),
      "built-in")
    val r = s2.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-15)
  }
}
