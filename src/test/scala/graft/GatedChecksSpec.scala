package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage of the round-18 gated-check query shapes — the 8
  * promoted approximate queries whose registered OUTPUT is the bound
  * check itself (exact scaffold + verdict). The DuckDB oracle gates
  * them at round close; this spec catches a wiring mistake (wrong
  * column, inverted floor comparison, broken exact recompute) inside
  * `sbt test`, where it costs seconds instead of an artifact cycle.
  * source_overlap_kmv's twin lives in KmvSketchSpec (it needs that
  * spec's exact-join fixtures).
  */
class GatedChecksSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("a2 approx/hll gates: exact side matches countDistinct, all bounds hold") {
    val exact = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .groupBy(col("user_id"))
      .agg(countDistinct(get_json_object(col("props"), "$.k").cast("long"))
        .as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq("a2_distinct_approx" -> "distinct_click_keys",
        "a2_distinct_hll" -> "exact_keys").foreach { case (q, cName) =>
      val got = rows(q)
      assert(got.length == exact.size, q)
      got.foreach { r =>
        assert(r.getLong(r.fieldIndex(cName)) == exact(r.getLong(0)),
          s"$q: exact column diverged for ${r.getLong(0)}")
        assert(r.getBoolean(r.fieldIndex("within_bound")),
          s"$q: bound violated: $r")
      }
    }
  }

  test("percentile gates: exact side matches the sort-based percentile, bounds hold") {
    val exact = graft.sources.Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    val approx = rows("percentiles_approx")
    assert(approx.length == exact.size)
    approx.foreach { r =>
      assert(r.getDouble(r.fieldIndex("exact_p50")) == exact(r.getString(0))._1)
      assert(r.getBoolean(r.fieldIndex("within_bound")), s"approx: $r")
    }
    val qsk = rows("percentiles_qsketch")
    assert(qsk.length == exact.size)
    qsk.foreach { r =>
      assert(r.getDouble(r.fieldIndex("exact_p50")) == exact(r.getString(0))._1)
      assert(r.getDouble(r.fieldIndex("exact_p95")) == exact(r.getString(0))._2)
      assert(r.getBoolean(r.fieldIndex("within_bound")), s"qsketch: $r")
    }
  }

  test("quality_classifier gate: counts recompute exactly, agreement floor holds") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val nDocs = docs.count()
    // the integer-halfspace rule, independently of the query path
    val t = split(trim(col("text")), " ")
    val nRule = docs.select(
        size(t).cast("long").as("n"),
        size(array_distinct(t)).cast("long").as("d"),
        size(filter(t, x => x.isin("the", "a", "and", "of")))
          .cast("long").as("st"))
      .filter(col("d") * 2 > col("n") && col("n") >= 10 &&
        col("st") * 10 < col("n") * 3)
      .count()
    val got = rows("quality_classifier")
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(r.fieldIndex("n_docs")) == nDocs)
    assert(r.getLong(r.fieldIndex("n_rule_quality")) == nRule)
    assert(r.getBoolean(r.fieldIndex("meets_agreement_floor")))
    // the verdict is consistent with the per-doc frame it aggregates
    val frame = graft.queries.TextQueries.qualityClassifierFrame(spark, sf)
    val agree = frame.filter(col("agrees")).count()
    assert(agree >= nDocs * 0.8,
      s"frame agreement $agree/$nDocs contradicts the gate verdict")
  }

  test("ANN recall gates: exact scaffold is the 20x3 sampled truth set, floors hold") {
    Seq("embed_ann_ivf_kmeans", "embed_ann_pq").foreach { q =>
      val got = rows(q)
      assert(got.length == 1, q)
      val r = got.head
      assert(r.getLong(r.fieldIndex("n_queries")) == 20L, s"$q: $r")
      assert(r.getLong(r.fieldIndex("n_exact_pairs")) == 60L, s"$q: $r")
      assert(r.getBoolean(r.fieldIndex("meets_recall_floor")), s"$q: $r")
    }
  }
}
