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
  *  2.+3. sites of grams at >= 2 sites corpus-wide (intra-doc repeats
  *     count, as in the paper) — ONE count-window partitioned on the
  *     gram, the suffix-array replacement: a single hash shuffle of
  *     the site frame keys every gram's sites to one task and filters
  *     them in place, so per-task state is one gram's site list — a
  *     gram in 10^6 docs costs 10^6 rows, never 10^12 pairs — and the
  *     gram STRING crosses the wire once (the groupBy + join-back
  *     formulation shipped it twice);
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
    // Corpus-wide site count as ONE window over the gram key instead
    // of groupBy + join-back: the pre-r17 shape paid two g-keyed
    // exchanges — the full (doc_id, pos, g) site frame into the join,
    // plus the aggregate's (map-side-combined, so distinct-gram-sized)
    // partial-count exchange — and ReuseExchange cannot merge them.
    // The window pays exactly one full-frame exchange; the saving is
    // the second exchange's rows plus one whole gram-string column,
    // measured ~15-20% at sf0.1, not a halving. Skew is unchanged in
    // ROW PLACEMENT — a hyper-frequent gram's sites land in one task
    // under the shuffled join exactly as under the window partition —
    // but the per-task MEMORY profile is not: WindowExec is
    // sort-based and buffers (and spills) each gram's full site
    // partition before emitting, where the old hash-join probe side
    // streamed and the aggregate was map-side combined. An OOM/spill
    // spike on a boilerplate-gram task at scale is this trade, not a
    // regression — the df-style cap upstream (filter before the
    // window) is the lever if one gram ever dominates.
    val hits = g
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .filter(col("n") >= 2)
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
