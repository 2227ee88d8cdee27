package graft

import graft.multimodal.MediaPipeline
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The equivalence contract behind `image_dedup_ahash`'s distinct-hash
  * collapse (MultimodalQueries): docs with an identical ahash are dups
  * at Hamming 0, so the verified near-dup graph over DOCS is exactly
  * the blow-up of the graph over DISTINCT hash values — clustering
  * hash values and mapping labels back must reproduce the doc-level
  * all-pairs clustering bit-for-bit. This spec re-derives the
  * doc-level all-pairs reference (the quadratic plan the query
  * replaced for scale) and asserts equality; it is the independent
  * check the DuckDB oracle can't provide, since the oracle mirrors the
  * distinct-hash plan. A star-per-bucket candidate design was tried
  * first and REJECTED by this spec (18/500 rows diverged at sf0.001 —
  * hub edges under-merge when a member verifies against a peer but not
  * the hub); the distinct-hash collapse is equivalent by construction,
  * and the spec keeps it pinned.
  */
class ImageDedupClusteringSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("distinct-hash clustering equals doc-level all-pairs clustering") {
    val hashes = MediaPipeline.imageHashes(spark,
      MediaPipeline.attachPixelImages(Tables.documents(spark, dir)))
      .filter(col("decode_ok"))
      .select(col("doc_id"), col("ahash"))
      .localCheckpoint(true)

    // Reference semantics: all-pairs within each band bucket over
    // DOCS, exact verify, CC — quadratic in cluster size, used here
    // only as the sf0.001 ground truth.
    val banded = hashes.select(col("doc_id"), col("ahash"),
      explode(array((0 until 8).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("ahash"), b * 8)
            .bitwiseAND(lit(255L)).as("sig"))): _*)).as("bs"))
      .select(col("doc_id"), col("ahash"),
        col("bs.band").as("band"), col("bs.sig").as("sig"))
    val allPairs = banded.as("x")
      .join(banded.as("y"), Seq("band", "sig"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .filter(bit_count(col("x.ahash").bitwiseXOR(col("y.ahash"))) <= 6)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val expected = graft.operators.ConnectedComponents.components(allPairs)
      .select(col("node").as("doc_id"), col("component").as("canonical_id"))
    val expectedFull = hashes.select(col("doc_id"), col("ahash"))
      .join(expected, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("ahash"),
        coalesce(col("canonical_id"), col("doc_id")).as("canonical_id"))

    val got = SparkEntry.queries("image_dedup_ahash")(spark, dir)
      .select(col("doc_id"), col("ahash"), col("canonical_id"))

    val diff = got.exceptAll(expectedFull).count() +
      expectedFull.exceptAll(got).count()
    assert(diff == 0, "distinct-hash clustering diverged from all-pairs clustering")

    // The fixture must actually exercise merging: real multi-member
    // clusters, not the vacuous everyone-is-a-singleton case — and
    // multi-HASH components, so hash-graph edges (not just the
    // identical-hash collapse) are load-bearing.
    val out = got.cache()
    val multi = out.groupBy("canonical_id").count()
      .filter(col("count") > 1).count()
    assert(multi >= 10, s"expected >=10 multi-member planted clusters, got $multi")
    val multiHash = out.groupBy("canonical_id")
      .agg(countDistinct("ahash").as("nh"))
      .filter(col("nh") > 1).count()
    assert(multiHash >= 5,
      s"expected >=5 clusters spanning multiple distinct hashes, got $multiHash")
    out.unpersist()
  }
}
