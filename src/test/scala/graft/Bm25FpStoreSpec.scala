package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r22 store-served fp-BM25 pair vs the inline per-query
  * formulation it replaced: bm25_known_item_fp and bm25_prf_fp now
  * read the persisted PostingsStore (postings rows ARE the
  * (doc, token) tf frame, stats IS (n_docs, sum_dl)), so this spec
  * re-derives the ORIGINAL inline frames from the raw corpus and
  * asserts the registered queries return bit-identical rows — the
  * same plan-vs-plan parity pin JaccardPrefixSpec gives the prefix
  * rewrite. A store whose ingest drifted from the inline tokenize
  * (different tokens(), a lost doc, a stats miscount) fails here
  * before the oracle gate sees it. */
class Bm25FpStoreSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** The pre-r22 inline formulation of bm25_known_item_fp, verbatim
    * (modulo the shared-frame plumbing): tokenize → tfa/dfa/dl/stats →
    * signature terms → fp scoring → self-rank. */
  private def inlineKnownItem(s: SparkSession, dir: String): DataFrame = {
    val d = sources.Tables.documents(s, dir)
    val t = split(trim(col("text")), " ")
    val dl = d.select(col("doc_id"), size(t).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tfa = d.select(col("doc_id"), explode(t).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfa = tfa.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val idfFp = "((2 * n_docs - 2 * df + 1) * 1048576) div (2 * df + 1)"
    val qterms = tfa.filter(col("doc_id") < 20)
      .join(broadcast(dfa), Seq("token"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("tf").desc, col("df"), col("token"))))
      .filter(col("rn") <= 3)
      .select(col("doc_id").as("qid"), col("token"))
    val rk = tfa.join(broadcast(qterms), Seq("token"))
      .join(broadcast(dfa), Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_fp", expr(idfFp))
      .withColumn("tfc_fp", expr("(22 * tf * sum_dl * 1048576) div " +
        "(10 * tf * sum_dl + 3 * sum_dl + 9 * dl * n_docs)"))
      .withColumn("contrib", expr("(idf_fp * tfc_fp) div 1048576"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("contrib")).as("s2"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("s2").desc, col("doc_id"))))
    rk.filter(col("qid") === col("doc_id"))
      .select(col("qid"), col("rnk").as("self_rnk"), (col("rnk") <= 5).as("hit5"))
  }

  test("store-served bm25_known_item_fp ≡ the inline tokenize formulation") {
    val got = SparkEntry.queries("bm25_known_item_fp")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).sorted
    val want = inlineKnownItem(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).sorted
    assert(got.nonEmpty && got.sameElements(want),
      s"store-served self-ranks diverge from inline: got ${got.take(5).toSeq} " +
        s"want ${want.take(5).toSeq}")
  }

  test("the store's postings/stats frames equal the inline tfa/dl/stats frames") {
    val p = queries.TextQueries.postingsPrefix(spark, sf)
    val posts = sources.PostingsStore.postings(spark, p)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val d = sources.Tables.documents(spark, sf)
    val t = split(trim(col("text")), " ")
    val dl = d.select(col("doc_id"), size(t).cast("long").as("dl"))
    val want = d.select(col("doc_id"), explode(t).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .join(dl, Seq("doc_id"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(posts == want, s"postings ≠ inline tfa+dl " +
      s"(only-store: ${(posts -- want).take(3)}, only-inline: ${(want -- posts).take(3)})")
    val st = sources.PostingsStore.stats(spark, p).head()
    val wantStats = dl.agg(count(lit(1)), sum(col("dl"))).head()
    assert(st.getLong(0) == wantStats.getLong(0) &&
      st.getLong(1) == wantStats.getLong(1),
      s"stats (${st.getLong(0)}, ${st.getLong(1)}) ≠ inline " +
        s"(${wantStats.getLong(0)}, ${wantStats.getLong(1)})")
  }
}
