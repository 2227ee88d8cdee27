package graft.operators

import graft.functions.TextOps.{orderedShingles, tokens}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-span dedup (behavior target: Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better" —
  * ExactSubstr removes byte spans repeated anywhere in the corpus;
  * reference repo has no such operator, this is pipeline surface).
  * Their tool is a single-machine suffix array over the concatenated
  * corpus; the distributed equivalent is k-gram hash bucketing:
  *
  *  1. every ordered k-token gram with its (doc, pos) site — a
  *     projection + explode, no shuffle;
  *  2. grams at >= 2 sites corpus-wide (intra-doc repeats count, as
  *     in the paper) — ONE groupBy(gram) with map-side partial
  *     counts, the suffix-array replacement. Hash-partitioned on the
  *     gram, so per-reducer state is corpus-size-free;
  *  3. duplicated sites re-attach by gram KEY (semi-join shape) —
  *     a gram in 10^6 docs costs 10^6 rows, never 10^12 pairs;
  *  4. overlapping-or-ADJACENT marked token ranges merge to maximal
  *     spans per doc via one gaps-and-islands window (shuffle on
  *     doc_id; each partition holds single docs' grams).
  *
  * Guarantee: any passage of >= k tokens repeated anywhere is covered
  * by exactly one output span; no sub-k repeat ever marks a token.
  * Adjacent ranges merge because the tokens form one contiguous
  * duplicated run — the unit a cleaning pass cuts.
  */
object SubstringDedup {

  /** Maximal duplicated spans of a `(doc_id, text)` frame:
    * `(doc_id, span_start, span_end, span_tokens)`, positions 1-based
    * inclusive over the whitespace tokenization. */
  def spans(docs: DataFrame, k: Int = 8): DataFrame = {
    val t = tokens(col("text"))
    val g = docs.filter(size(t) >= k)
      .select(col("doc_id"),
        posexplode(orderedShingles(t, k)).as(Seq("pos0", "g")))
      .select(col("doc_id"),
        (col("pos0") + 1).cast("long").as("pos"), col("g"))
    val dup = g.groupBy(col("g"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      .select(col("g"))
    val hits = g.join(dup, Seq("g"))
      .select(col("doc_id"), col("pos").as("s"),
        (col("pos") + lit(k - 1)).as("e"))
    val byStart = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    val prevMaxEnd = max(col("e")).over(
      byStart.rowsBetween(Window.unboundedPreceding, -1))
    hits
      .withColumn("new_isl",
        when(prevMaxEnd.isNull || col("s") > prevMaxEnd + 1, 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("new_isl")).over(byStart))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("s")).as("span_start"), max(col("e")).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }
}
