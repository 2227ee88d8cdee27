package graft.operators

import graft.functions.FixedPointOps._
import graft.functions.TextOps._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based bigram language model with stupid backoff (Brants et
  * al., EMNLP '07 — the web-scale LM recipe: no discounting, no
  * normalization constants, just counts and a fixed backoff penalty),
  * used as a CCNet-style quality filter: documents whose mean token
  * surprisal under a trusted-corpus LM is high are boilerplate,
  * gibberish, or wrong-language, and get filtered/bucketed before
  * training.
  *
  * Everything is integer fixed point so the score is bit-deterministic
  * and DuckDB-replayable (the `bm25_search_fp` discipline):
  *
  *  - hit:      s = log2fp(c1) − log2fp(c12)           (−log2 of c12/c1)
  *  - backoff:  s = log2fp(4·N) − log2fp(c2)           (α = 1/4, exactly
  *              −log2(0.25·c2/N) — the 0.4 of the paper rounded to a
  *              power of two so the penalty is exact integer 2·S)
  *  - OOV:      s = [[OovBitsFp]]                      (unseen w2)
  *
  * with log2fp = [[graft.functions.FixedPointOps.log2LinFp]], c12 the
  * training count of bigram (w1,w2), c1 = Σ_w c(w1,w), c2 the unigram
  * count of w2, and N total training tokens.
  *
  * Scale design (100 TB): the count frames are the standard sharded
  * LM artifact — hash-partitioned by token key, size O(distinct
  * bigrams) ≤ O(corpus tokens) and Zipf-concentrated in practice;
  * training is two groupBy passes (map-side partial aggregation does
  * the heavy lifting), scoring is three hash equi-joins against them
  * plus a one-row broadcast of N. No windows, no driver state, no
  * floats; per-doc reduction is an order-free integer sum. At serving
  * scale the counts persist once (BucketedUpsert by token key) and
  * every scoring pass probes them — the PostingsStore shape.
  */
object NgramLm {

  /** Surprisal charged to a bigram whose w2 never occurs in training:
    * 30 bits (probability 2^-30), safely above any in-vocabulary
    * surprisal of a sub-2^43-token corpus backoff (log2fp(4N) − 0). */
  val OovBitsFp: Long = 30L * FpScale

  /** Trained artifact: bigram counts `(w1, w2, c12)`, context sums
    * `(w1, c1)`, unigram counts `(token, c2)`, one-row totals
    * `(n_tok)`. All BIGINT. */
  final case class Counts(
      bigrams: DataFrame, contexts: DataFrame,
      unigrams: DataFrame, totals: DataFrame)

  /** Adjacent-token pairs of each doc: `(doc_id, w1, w2)`, duplicates
    * kept (counts are multiset). One projection + explode — the
    * shingle pass with n = 2. */
  def bigramRows(d: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    d.filter(size(t) >= 2)
      .select(col("doc_id"), explode(orderedShingles(t, 2)).as("bg"))
      .select(col("doc_id"),
        split_part(col("bg"), lit(" "), lit(1)).as("w1"),
        split_part(col("bg"), lit(" "), lit(2)).as("w2"))
  }

  /** Train the count tables from a `[doc_id, text]` corpus. */
  def train(d: DataFrame): Counts = {
    val bg = bigramRows(d)
    val c12 = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val uni = d.select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c2"))
    val tot = uni.agg(sum(col("c2")).as("n_tok"))
    Counts(c12, c1, uni, tot)
  }

  /** Fixed-point surprisal of one scored bigram row carrying nullable
    * `c12`, `c1`, `c2` and the corpus total `n_tok`. */
  def surprisalFp: Column =
    when(col("c12").isNotNull, log2LinFp(col("c1")) - log2LinFp(col("c12")))
      .when(col("c2").isNotNull,
        log2LinFp(lit(4) * col("n_tok")) - log2LinFp(col("c2")))
      .otherwise(lit(OovBitsFp))

  /** Score a `[doc_id, text]` frame against trained counts: per doc,
    * `(doc_id, n_bigrams, bits_fp)` where bits_fp is the mean bigram
    * surprisal at 2^20 fixed point (integer floor-div — order-free).
    * Docs with < 2 tokens have no bigrams and are absent. */
  def score(d: DataFrame, c: Counts): DataFrame =
    bigramRows(d)
      .join(c.bigrams, Seq("w1", "w2"), "left")
      .join(c.contexts, Seq("w1"), "left")
      .join(c.unigrams.withColumnRenamed("token", "w2"), Seq("w2"), "left")
      .crossJoin(broadcast(c.totals))
      .select(col("doc_id"), surprisalFp.as("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(s) div count(1)").as("bits_fp"))
}
