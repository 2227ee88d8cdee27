package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The forward as-of label join (asof_next_purchase_label),
  * rewritten r19 from join-then-min (per-user clicks × purchases
  * candidate fan-out — the PlanAudit cross-side-range-residual
  * class) to AsOf.join on negated timestamps (ONE user-keyed
  * shuffle + per-user sort). Pins:
  *
  *   1. parity vs an independent naive join-then-min re-derivation
  *      on the sf0.001 events fixture — identical rows including
  *      NULL labels (the property that lets the existing hash
  *      oracle gate the rewrite);
  *   2. tie-break: among purchases at the SAME earliest p_us the
  *      label is min(purchase_id) — planted equal-timestamp
  *      purchases prove the negated-id tie column preserves the
  *      oracle's min();
  *   3. inclusive boundary: a purchase at exactly the click's
  *      timestamp labels it (lag 0), and a click after the last
  *      purchase keeps a NULL label.
  */
class AsofLabelSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** Naive re-derivation: the pre-r19 join-then-min shape. */
  private def naive(c: DataFrame, p: DataFrame): DataFrame = {
    val firstUs = c.join(p, Seq("user_id"))
      .filter(col("p_us") >= col("c_us"))
      .groupBy(col("user_id"), col("click_id"), col("c_us"))
      .agg(min(col("p_us")).as("p_us"))
    val lbl = firstUs.join(p, Seq("user_id", "p_us"))
      .groupBy(col("click_id"), col("c_us"), col("p_us"))
      .agg(min(col("purchase_id")).as("purchase_id"))
    c.join(lbl.select(col("click_id"), col("purchase_id"), col("p_us")),
      Seq("click_id"), "left_outer")
      .select(col("click_id"), col("user_id"),
        col("purchase_id").as("label_purchase_id"),
        (col("p_us") - col("c_us")).as("label_lag_us"))
  }

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  private def run(name: String): DataFrame =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")

  test("parity vs the naive join-then-min shape on the sf0.001 fixture") {
    val e = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("us").as("c_us"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("us").as("p_us"))
    val got = run("asof_next_purchase_label")
    assert(got.filter(col("label_purchase_id").isNotNull).count() > 0)
    assert(got.filter(col("label_purchase_id").isNull).count() > 0,
      "fixture should include unlabeled clicks or the NULL path is untested")
    assertSameRows(got, naive(c, p))
  }

  test("planted ties and boundaries: min(purchase_id) at equal p_us, inclusive zero lag, NULL tail") {
    import spark.implicits._
    val c = Seq(
      (1L, 100L, 50L), // labeled by the tied pair at us=60 -> pid 7
      (1L, 101L, 60L), // purchase at EXACTLY c_us -> lag 0
      (1L, 102L, 99L), // after the last purchase -> NULL
      (2L, 200L, 10L) // user with no purchases at all -> NULL
    ).toDF("user_id", "click_id", "c_us")
    val p = Seq(
      (1L, 9L, 60L), // tied timestamp, larger id
      (1L, 7L, 60L), // tied timestamp, smaller id -> the label
      (1L, 8L, 70L)
    ).toDF("user_id", "purchase_id", "p_us")
    val got = AsofLabelSpec.viaAsof(c, p).collect()
      .map(r => r.getLong(0) -> (Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got(100L) == (Some(7L), Some(10L)),
      "equal-p_us tie must resolve to min(purchase_id)")
    assert(got(101L) == (Some(7L), Some(0L)),
      "a purchase at exactly c_us labels the click with lag 0")
    assert(got(102L) == (None, None))
    assert(got(200L) == (None, None))
    assertSameRows(AsofLabelSpec.viaAsof(c, p), naive(c, p))
  }
}

object AsofLabelSpec {
  import graft.operators.AsOf

  /** The registered query's exact core, over planted frames. */
  def viaAsof(c: DataFrame, p: DataFrame): DataFrame = {
    val cn = c.withColumn("neg_us", -col("c_us"))
    val pn = p.withColumn("neg_us", -col("p_us"))
      .withColumn("neg_pid", -col("purchase_id"))
    AsOf.join(cn, pn, "user_id", "neg_us", "neg_us",
      "click_id", "neg_pid", Seq("purchase_id", "p_us"))
      .select(col("click_id"), col("user_id"),
        col("asof_purchase_id").as("label_purchase_id"),
        (col("asof_p_us") - col("c_us")).as("label_lag_us"))
  }
}
