package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. '16) — vocab
  * induction over a corpus, the step between curation and packing in
  * a training-data pipeline (the engine's other BPE surface,
  * `token_count_bpe`, only COUNTS with a fixed pretokenizer; this
  * LEARNS the merge table).
  *
  * Scale shape: training state is the distinct-WORD count frame, not
  * the corpus — one explode + groupBy collapses 100 TB of text to a
  * vocabulary-sized `(symbols, n)` frame (Zipf: orders of magnitude
  * smaller), and every merge round is a pair-explode + aggregate over
  * THAT, in parallel across words. The driver sees one row per round
  * (the argmax pair — `limit(1).collect`), never the corpus; each
  * round's frame is persisted and the previous unpersisted, so plan
  * depth and memory stay O(1) across rounds. The merge itself is a
  * per-word scala function (a UDF on purpose: leftmost-greedy pair
  * collapse is inherently sequential WITHIN a word's ~10 symbols, and
  * rows are independent — codegen would buy nothing on a loop this
  * size, while the word-level parallelism is where the time goes).
  *
  * Determinism: ties on pair count break by (left, right) ordering,
  * so the learned merge table is identical across partitionings,
  * cluster sizes, and runs — asserted by the spec, required for a
  * reproducible tokenizer artifact.
  */
object Bpe {

  /** End-of-word marker (Sennrich): lets merges distinguish suffixes
    * ("est</w>" vs "est" mid-word) and makes segmentation invertible. */
  val Eow = "</w>"

  final case class Merge(rank: Int, left: String, right: String)

  /** `(symbols, n)`: each distinct word as its initial symbol
    * sequence (chars + end-of-word marker), weighted by corpus
    * frequency. The ONLY pass over the full corpus. */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .select(initSymbols(col("w")).as("symbols"), col("n"))

  private def initSymbols(w: org.apache.spark.sql.Column) =
    // Spark's split(w, "") keeps a trailing "" (Java regex split,
    // limit -1) that scala's String.split drops — filter it, or the
    // trainer learns junk merges over empty symbols
    concat(filter(split(w, ""), s => length(s) > 0), array(lit(Eow)))

  /** Leftmost-greedy collapse of one (a,b) pair in one word's symbol
    * sequence — the per-row merge step shared by training and the
    * reference path in the spec. */
  private[graft] def mergeWord(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn `numMerges` merges from a corpus. Stops early when no pair
    * occurs twice (merging a count-1 pair memorizes noise). */
  def train(docs: DataFrame, numMerges: Int): Seq[Merge] =
    trainFromWordCounts(wordCounts(docs), numMerges)

  def trainFromWordCounts(wc0: DataFrame, numMerges: Int): Seq[Merge] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val mergeUdf = udf(mergeWord _)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    // localCheckpoint, NOT persist: an iterative loop that chains
    // frames through persist() nests each round's whole plan inside
    // the next round's InMemoryRelation — plan TREES (and the plan
    // strings Spark renders per execution) grow exponentially with
    // rounds; at ~20 rounds the driver spends minutes stringifying
    // plans, not running jobs. The eager local checkpoint cuts the
    // lineage to a LogicalRDD each round: one materialization job +
    // one aggregate job per round, plan depth O(1) forever. Old
    // checkpoint blocks are released by the ContextCleaner as each
    // round's frame goes unreferenced.
    var wc = wc0.localCheckpoint(true)
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      // adjacent-pair counts over the word frame (weights = word n).
      // sequence() needs the size >= 2 guard: on a fully-merged
      // single-symbol word it would run BACKWARDS ([0,-1]) and emit
      // null-padded junk pairs.
      val top = wc
        .filter(size(col("symbols")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(0, size(symbols) - 2), " +
            "i -> struct(symbols[i] AS l, symbols[i + 1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < 2L) done = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += Merge(round, l, r)
        wc = wc.select(
          mergeUdf(col("symbols"), lit(l), lit(r)).as("symbols"), col("n"))
          .localCheckpoint(true)
        round += 1
      }
    }
    merges.toSeq
  }

  /** Persist a learned merge table as a shippable artifact: one
    * parquet of `(rank, left, right)` plus a `_vocab_manifest.json`
    * recording the merge count and an md5 integrity checksum over the
    * canonical rank-ordered serialization. The manifest is written
    * LAST (the CorpusWriter publish-marker convention): a reader that
    * finds it can trust the parquet beside it. */
  def save(spark: SparkSession, merges: Seq[Merge], path: String): Unit = {
    require(merges.nonEmpty, "refusing to save an empty merge table")
    import spark.implicits._
    merges.sortBy(_.rank).map(m => (m.rank, m.left, m.right))
      .toDF("rank", "left", "right")
      .repartition(1) // vocabulary-sized: one file, stable layout
      .write.mode("errorifexists").parquet(s"$path/merges.parquet")
    val manifest = s"""{"n_merges": ${merges.size}, "checksum": "${checksum(merges)}"}"""
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(path, "_vocab_manifest.json"), false)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
  }

  /** Load a persisted merge table, failing fast (not quietly
    * mis-tokenizing) when the manifest is missing, the rank sequence
    * is not contiguous from 0, or the checksum disagrees — a tokenizer
    * artifact that silently drifts corrupts every downstream token. */
  def load(spark: SparkSession, path: String): Seq[Merge] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mf = new org.apache.hadoop.fs.Path(path, "_vocab_manifest.json")
    require(fs.exists(mf), s"no _vocab_manifest.json under $path — not a published vocab")
    val manifest = {
      val in = fs.open(mf)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val merges = spark.read.parquet(s"$path/merges.parquet")
      .collect()
      .map(r => Merge(r.getAs[Int]("rank"), r.getAs[String]("left"), r.getAs[String]("right")))
      .sortBy(_.rank).toSeq
    require(merges.zipWithIndex.forall { case (m, i) => m.rank == i },
      s"ranks not contiguous from 0 under $path")
    val want = s""""checksum": "${checksum(merges)}""""
    require(manifest.contains(want) && manifest.contains(s""""n_merges": ${merges.size}"""),
      s"manifest/content mismatch under $path — artifact corrupt or partially written")
    merges
  }

  private def checksum(merges: Seq[Merge]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    merges.sortBy(_.rank).foreach(m =>
      md.update(s"${m.rank} ${m.left} ${m.right}\n".getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Segment text with a learned merge table: whitespace words →
    * initial symbols → merges applied in rank order (the standard
    * encode; a production encoder uses rank-priority queues — same
    * result, this keeps the reference semantics obvious). The merge
    * table broadcasts; segmentation is embarrassingly parallel.
    *
    * Tokenization is space-split WITHOUT a leading Java `String.trim`
    * — `trim` strips every char <= U+0020 (tabs, newlines) where
    * [[TextOps.tokens]]' Spark `trim` strips spaces only, so a text
    * with leading/trailing tabs would segment differently here than
    * in [[wordCounts]]/[[wordSegments]]. Splitting on ' ' and
    * dropping empty fragments is exactly the `tokens` word list for
    * every input (BpeSpec pins the \t/\n case). */
  def segment(spark: SparkSession, docs: DataFrame,
              merges: Seq[Merge]): DataFrame = {
    val bc = spark.sparkContext.broadcast(
      merges.sortBy(_.rank).map(m => (m.left, m.right)))
    val seg = udf((text: String) => {
      if (text == null) null
      else text.split(" ").filter(_.nonEmpty).toSeq.flatMap { w =>
        var syms: Seq[String] = (w.split("").toSeq :+ Eow)
        bc.value.foreach { case (a, b) => syms = mergeWord(syms, a, b) }
        syms
      }
    })
    docs.withColumn("bpe_tokens", seg(col("text")))
  }

  /** Encode each DISTINCT word of `docs` with the merge table:
    * `(w, syms)`, vocabulary-sized (Zipf). Corpus-scale encodes
    * should JOIN against this frame instead of calling [[segment]] —
    * the sequential per-word merge loop then runs once per
    * vocabulary ENTRY, not once per corpus occurrence (the same
    * distinct-word collapse the trainer rides), and the corpus-sized
    * work left over is one explode + one token-keyed hash join, all
    * codegen. Same result as [[segment]] by construction: both
    * apply [[mergeWord]] in rank order to the same initial symbols. */
  def wordSegments(spark: SparkSession, docs: DataFrame,
                   merges: Seq[Merge]): DataFrame = {
    val bc = spark.sparkContext.broadcast(
      merges.sortBy(_.rank).map(m => (m.left, m.right)))
    val enc = udf((w: String) => {
      var syms: Seq[String] = (w.split("").toSeq :+ Eow)
      bc.value.foreach { case (a, b) => syms = mergeWord(syms, a, b) }
      syms
    })
    docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .distinct()
      .withColumn("syms", enc(col("w")))
  }

  /** Broadcast ceiling (rows) for the distinct-word frame in
    * [[vocabJoin]]. ~4M entries × (word + ~10 short symbols) is a few
    * hundred MB — comfortably inside Spark's 8 GiB broadcast hard
    * limit and a sane driver-memory budget. The FIXTURE vocabularies
    * are Zipf-small and always broadcast; the gate exists because a
    * raw web corpus has an UNBOUNDED "vocabulary" (typos, URLs, hex
    * blobs — 10^8-10^9 distinct tokens at 100 TB), where a forced
    * broadcast fails the job outright. */
  val VocabBroadcastMaxRows: Long = 4000000L

  /** Freeze a [[wordSegments]]-shaped frame and measure it: the
    * localCheckpoint materializes the per-word encode UDF ONCE, so
    * the row count (the [[vocabJoin]] strategy input) and every
    * downstream branch (corpus join, symbol-vocab rank) read the same
    * cheap LogicalRDD instead of re-running the encode per branch.
    * Executor-local checkpoint storage trades fault-tolerance for
    * lineage cuts (see PackingQueries.rangeParted). */
  def freezeVocab(wordSyms: DataFrame): (DataFrame, Long) = {
    val ws = wordSyms.localCheckpoint()
    (ws, ws.count())
  }

  /** Join a corpus-sized word frame against the frozen distinct-word
    * encode frame on `w`, picking the strategy from the MEASURED
    * vocab size: broadcast below [[VocabBroadcastMaxRows]] (the size
    * estimator cannot see post-explode row counts and would otherwise
    * build on the corpus-sized side — measured 900 s of CPU building
    * a 14M-entry broadcast map at the 10× sweep), shuffle hash join
    * building on the vocab side above it (never a forced broadcast
    * that dies at web scale; AQE's skew-join split handles stopword
    * skew on the corpus side of the shuffle). */
  def vocabJoin(wordRows: DataFrame, ws: DataFrame, nVocab: Long,
                maxBroadcast: Long = VocabBroadcastMaxRows): DataFrame =
    if (nVocab <= maxBroadcast)
      wordRows.join(org.apache.spark.sql.functions.broadcast(ws), Seq("w"))
    else wordRows.join(ws.hint("shuffle_hash"), Seq("w"))
}
