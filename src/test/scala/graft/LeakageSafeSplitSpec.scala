package graft

import graft.functions.TextOps.portableHash
import graft.queries.TextQueries
import graft.sources.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The invariant behind `corpus_split_leakage_safe`: keying the
  * 80/10/10 carve by near-dup cluster keeps every cluster in ONE
  * split, while the naive per-doc carve (corpus_split) demonstrably
  * leaks near-dup pairs across splits on the same fixture. */
class LeakageSafeSplitSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def splitOf(key: Column): Column = {
    val cell = portableHash(key.cast("string")) % 100
    when(cell < 80, "train").when(cell < 90, "val").otherwise("test")
  }

  private lazy val docs = Tables.documents(spark, sf)
    .select(col("doc_id"), col("text"))
  // (doc_id, canonical_id) for every doc in a verified near-dup cluster
  private lazy val labels = TextQueries.minhashClusterLabels(docs).cache()

  test("cluster-keyed carve: no near-dup cluster straddles splits") {
    val straddling = labels
      .withColumn("split", splitOf(col("canonical_id")))
      .groupBy(col("canonical_id"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
    assert(straddling.count() == 0)
  }

  test("the naive per-doc carve DOES leak clusters across splits on the same fixture") {
    val clusters = labels
      .withColumn("split", splitOf(col("doc_id")))
      .groupBy(col("canonical_id"))
      .agg(countDistinct(col("split")).as("n_splits"),
        count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
    assert(clusters.count() > 0, "fixture has no multi-doc near-dup clusters")
    assert(clusters.filter(col("n_splits") > 1).count() > 0,
      "naive split did not leak — the fixture no longer demonstrates the failure mode")
  }

  test("every doc gets exactly one split and singletons key by their own id") {
    val assigned = docs.join(labels, Seq("doc_id"), "left_outer")
      .withColumn("split", splitOf(coalesce(col("canonical_id"), col("doc_id"))))
    assert(assigned.count() == docs.count())
    // a singleton's assignment must equal the naive carve's (same key)
    val singletonMismatch = assigned.filter(col("canonical_id").isNull)
      .filter(col("split") =!= splitOf(col("doc_id")))
    assert(singletonMismatch.count() == 0)
  }
}
