package graft

import graft.operators.TwoPhase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The shared two-phase total-order recipe: the distributed ntile must
  * be BIT-IDENTICAL to the engine's `ntile` window (rfm_segments and
  * revenue_pareto hash-gate on the assignment), and the plans it
  * emits must contain zero partition-less Window nodes — the whole
  * point of the recipe. */
class TwoPhaseSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** Deterministic pseudo-random frame: (id, v) with heavy ties in v
    * so the key tie-break is actually load-bearing. */
  private def frame(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, (i * 2654435761L % 97) % 13))
      .toDF("id", "v")
  }

  private def tiles(n: Int, buckets: Int): Unit = {
    val df = frame(n)
    val got = TwoPhase.withNtile(df, "tile", buckets,
        col("v").desc, col("id"))
      .select(col("id"), col("tile"))
    val want = df.withColumn("tile",
        ntile(buckets).over(Window.orderBy(col("v").desc, col("id"))))
      .select(col("id"), col("tile"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      s"ntile($buckets) over $n rows diverges from the engine")
  }

  test("withNtile matches the engine's ntile bit-for-bit") {
    tiles(1000, 5)   // q > 0, m > 0 (1000 = 5*200: m = 0 path too)
    tiles(997, 10)   // prime count: m = 7 uneven tiles
    tiles(13, 13)    // c == n: every tile exactly one row
    tiles(7, 10)     // c < n: q = 0, only the first c tiles populated
    tiles(1, 5)      // single row
  }

  test("withNtile on an empty frame yields an empty frame") {
    val empty = frame(10).filter(col("id") < 0)
    assert(TwoPhase.withNtile(empty, "tile", 5, col("id")).count() == 0)
  }

  test("globalRank equals a single-partition row_number, distributed") {
    val df = frame(500)
    val (ranked, total) = TwoPhase.globalRank(df, "rnk",
      col("v"), col("id").desc)
    assert(total == 500)
    val want = df.withColumn("rnk",
      row_number().over(Window.orderBy(col("v"), col("id").desc)))
    assert(ranked.select(col("id"), col("rnk"))
      .except(want.select(col("id"), col("rnk"))).isEmpty)
  }

  test("the recipe's own plans have no partition-less window") {
    val df = TwoPhase.withNtile(frame(100), "tile", 5, col("v"), col("id"))
    assert(PlanAudit.unboundedBareWindows(df).isEmpty,
      "TwoPhase must never plan the single-partition sort it replaces")
  }

  test("reserved column names in the input are refused, not clobbered") {
    val withPid = frame(10).withColumn("pid", lit(99))
    val e = intercept[IllegalArgumentException] {
      TwoPhase.withNtile(withPid, "tile", 2, col("v"), col("id"))
    }
    assert(e.getMessage.contains("pid"))
  }
}
