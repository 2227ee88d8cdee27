package graft

import graft.sources.{BucketedUpsert, Tables}
import graft.streaming.MinHashDedupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental banded-MinHash near-dup dedup vs the batch ground
  * truth (dedup_clusters), plus the cluster-merge and replay
  * contracts that only exist on the streaming path. Mirrors
  * StreamingDocDedupSpec's structure for the exact-dedup store. */
object StreamingMinHashDedupSpec {
  case class Doc(doc_id: Long, text: String)
}

class StreamingMinHashDedupSpec extends AnyFunSuite {
  import StreamingMinHashDedupSpec.Doc

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def labelMap(prefix: String): Map[Long, Long] =
    MinHashDedupStream.labels(spark, prefix).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("doc_id-ordered stream converges to batch dedup_clusters labels") {
    import spark.implicits._
    val prefix = "mhs_converge"
    MinHashDedupStream.drop(spark, prefix)
    MinHashDedupStream.init(spark, prefix, buckets = 8)
    try {
      val docs = Tables.documents(spark, sf)
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
        .as[Doc].collect()
      val ms = MemoryStream[Doc](spark)
      val q = MinHashDedupStream.writer(ms.toDF(), prefix, buckets = 8)
        .queryName("mhs_converge_q").start()
      try {
        docs.grouped(math.max(1, docs.length / 3)).foreach { chunk =>
          ms.addData(chunk.toSeq); q.processAllAvailable()
        }
      } finally q.stop()

      // batch ground truth: CC component-min labels for clustered docs,
      // self for everything else
      val clustered = SparkEntry.queries("dedup_clusters")(spark, sf).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = docs.map(d => d.doc_id -> clustered.getOrElse(d.doc_id, d.doc_id)).toMap
      val got = labelMap(prefix)
      assert(got.size == docs.length, "every ingested doc must carry a label")
      val diff = want.keys.filter(k => got.get(k) != Some(want(k)))
      assert(diff.isEmpty,
        s"labels diverge for ${diff.take(5).map(k => s"$k: got=${got.get(k)} want=${want(k)}").mkString("; ")}")
    } finally MinHashDedupStream.drop(spark, prefix)
  }

  test("bridging doc merges two existing clusters onto the min canonical") {
    import spark.implicits._
    val prefix = "mhs_merge"
    MinHashDedupStream.drop(spark, prefix)
    MinHashDedupStream.init(spark, prefix, buckets = 4)
    try {
      // token windows chosen (searched offline over the REAL md5/minhash
      // constants) so that: A and C neither reach J >= 0.5 nor share a
      // band signature; E overlaps both at J ~ 0.565 AND band-collides
      // with both — the one-arrival-merges-two-clusters case
      val pool = (0 until 100).map(i => f"tok$i%02d")
      val textA = pool.slice(0, 20).mkString(" ")
      val textC = pool.slice(10, 30).mkString(" ")
      val textE = pool.slice(5, 25).mkString(" ")
      val frame = Seq(Doc(1L, textA), Doc(5L, textC), Doc(9L, textE)).toDF()

      MinHashDedupStream.upsertBatch(spark,
        Seq(Doc(1L, textA)).toDF(), prefix, 4, Some(0L))
      MinHashDedupStream.upsertBatch(spark,
        Seq(Doc(5L, textC)).toDF(), prefix, 4, Some(1L))
      assert(labelMap(prefix) == Map(1L -> 1L, 5L -> 5L),
        "A and C must start as separate clusters")
      MinHashDedupStream.upsertBatch(spark,
        Seq(Doc(9L, textE)).toDF(), prefix, 4, Some(2L))

      val got = labelMap(prefix)
      assert(got == Map(1L -> 1L, 5L -> 1L, 9L -> 1L),
        s"merge must relabel C's cluster through the merge log: $got")
      // and the batch pipeline over the same three docs agrees
      val batch = graft.queries.TextQueries.minhashClusterLabels(frame)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(batch == Map(1L -> 1L, 5L -> 1L, 9L -> 1L),
        s"crafted texts no longer exercise the batch merge: $batch")
    } finally MinHashDedupStream.drop(spark, prefix)
  }

  test("exact duplicate across batches joins the first arrival's cluster") {
    import spark.implicits._
    val prefix = "mhs_dup"
    MinHashDedupStream.drop(spark, prefix)
    MinHashDedupStream.init(spark, prefix, buckets = 4)
    try {
      val text = "alpha beta gamma delta epsilon zeta"
      MinHashDedupStream.upsertBatch(spark,
        Seq(Doc(10L, text)).toDF(), prefix, 4, Some(0L))
      MinHashDedupStream.upsertBatch(spark,
        Seq(Doc(20L, text), Doc(30L, "unrelated words entirely here now")).toDF(),
        prefix, 4, Some(1L))
      assert(labelMap(prefix) == Map(10L -> 10L, 20L -> 10L, 30L -> 30L))
    } finally MinHashDedupStream.drop(spark, prefix)
  }

  test("redelivered batch is a no-op: replay guard + first-writer-wins") {
    import spark.implicits._
    val prefix = "mhs_replay"
    MinHashDedupStream.drop(spark, prefix)
    MinHashDedupStream.init(spark, prefix, buckets = 4)
    try {
      def snapshot(): (Map[Long, Long], Map[String, Long]) = (
        labelMap(prefix),
        BucketedUpsert.read(spark, MinHashDedupStream.bandsTable(prefix))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      MinHashDedupStream.upsertBatch(spark,
        Seq(Doc(5L, "alpha beta gamma delta")).toDF(), prefix, 4, Some(7L))
      val before = snapshot()
      // exact redelivery (same batch id, mutated payload): the guard
      // must skip every store's merge outright
      MinHashDedupStream.upsertBatch(spark,
        Seq(Doc(1L, "alpha beta gamma delta")).toDF(), prefix, 4, Some(7L))
      // non-guarded re-send of the duplicate text (new batch id):
      // first arrival keeps the crown, the re-sent doc joins its cluster
      MinHashDedupStream.upsertBatch(spark,
        Seq(Doc(1L, "alpha beta gamma delta")).toDF(), prefix, 4, Some(8L))
      val after = snapshot()
      assert(after._2 == before._2, s"band store drifted: ${before._2} -> ${after._2}")
      assert(after._1 == before._1 + (1L -> 5L),
        s"re-sent duplicate must join doc 5's cluster: ${after._1}")
    } finally MinHashDedupStream.drop(spark, prefix)
  }

  test("batch exceeding the driver union-find edge cap fails fast with remediation") {
    import spark.implicits._
    val prefix = "mhs_cap"
    MinHashDedupStream.drop(spark, prefix)
    MinHashDedupStream.init(spark, prefix, buckets = 4)
    try {
      // seed the store with one doc, then send a batch of near-dups of
      // it: each verifies one edge to the owner, so a cap of 2 trips on
      // 3+ edges — the contract must surface as this error, not an OOM
      val base = "alpha beta gamma delta epsilon zeta eta theta"
      MinHashDedupStream.upsertBatch(spark,
        Seq(Doc(1L, base)).toDF(), prefix, 4, Some(0L))
      val flood = (2L to 6L).map(i => Doc(i, base)).toDF()
      val e = intercept[IllegalArgumentException] {
        MinHashDedupStream.upsertBatch(spark, flood, prefix, 4, Some(1L),
          maxDriverEdges = 2)
      }
      assert(e.getMessage.contains("maxDriverEdges") &&
        e.getMessage.contains("ConnectedComponents"),
        s"error must name the knob and the scale remediation: ${e.getMessage}")
      // the same batch under the default cap ingests fine
      MinHashDedupStream.upsertBatch(spark, flood, prefix, 4, Some(1L))
      val labels = labelMap(prefix)
      assert((2L to 6L).forall(labels(_) == 1L),
        s"post-failure retry with an adequate cap must cluster: $labels")
    } finally MinHashDedupStream.drop(spark, prefix)
  }
}
