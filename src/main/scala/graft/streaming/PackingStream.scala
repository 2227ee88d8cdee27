package graft.streaming

import graft.operators.Bpe
import graft.queries.PackingQueries
import graft.sources.BucketedUpsert
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Incremental maintenance of the PACKED TRAINING STREAM — the ingest
  * path of `pack_sequences_bpe`. The batch packer
  * (PackingQueries.bpePackedTokens) recomputes the whole corpus; at
  * 100 TB the viable shape is this one: the tokenizer is a FROZEN
  * artifact (merge table + symbol vocab — what a tokenizer release
  * ships), each arriving micro-batch encodes only ITS documents
  * (batch-scoped distinct-word encode, the vocabulary-granularity
  * recipe), assigns global stream offsets as `persisted tail +
  * batch-local two-phase prefix` (the documented two-phase offset,
  * scoped to the batch), and appends the resulting `(seq_id,
  * position, token_id)` rows to a seq_id-bucketed store — only the
  * buckets the new sequences hash into are rewritten, the packed
  * history carries forward by hard link.
  *
  * Exactness contract: fed the corpus in doc_id order (the append-only
  * ingest convention — document ids are assigned monotonically, like
  * any event log), the accumulated store is EXACTLY the one-shot
  * batch frame under any batch split, because the pack is a pure
  * function of the concatenation order and the frozen vocab
  * (StreamingPackingSpec asserts bit-equality + replay no-op).
  *
  * Frozen-vocab contract: a symbol outside the artifact's vocab (a
  * character never seen at train time) keeps its consumed stream
  * offset and emits `PackingQueries.UnkTokenId` there — the id a
  * production tokenizer ships for exactly this case. The positional
  * skeleton is thus complete under any input: no holes, no shifted
  * offsets (StreamingPackingSpec pins the unseen-character case).
  *
  * Replay safety: the tokens append and the tail bump record the
  * foreachBatch batchId, so a redelivered batch is a no-op per store.
  * Write order matters for crash convergence: tokens FIRST, tail
  * second — a crash between them replays with the un-bumped tail,
  * recomputing the identical rows (skipped by the tokens guard) and
  * then catching the tail up. The reverse order would re-encode a
  * half-applied batch against an already-bumped tail and corrupt
  * every offset after the crash point.
  */
object PackingStream {

  val TokensTable = "pack_tokens" // (seq_id, position, token_id)
  val TailTable = "pack_tail"     // (k, n_sym), one row, k = 0
  val DefaultBuckets = 16

  private def additive: (String, org.apache.spark.sql.Column,
    org.apache.spark.sql.Column) => org.apache.spark.sql.Column =
    (_, ex, dl) => coalesce(ex, lit(0L)) + coalesce(dl, lit(0L))

  /** Create the two empty stores (idempotent); a store left on disk
    * by an earlier process is ADOPTED, so a restarted stream resumes
    * the packed history and its replay guards. */
  def init(spark: SparkSession, prefix: String = "",
           buckets: Int = DefaultBuckets): Unit = {
    import spark.implicits._
    def mk(table: String, df: DataFrame, key: String, b: Int): Unit =
      if (!BucketedUpsert.adopt(spark, table))
        BucketedUpsert.materialize(df, table, key, b)
    mk(prefix + TokensTable,
      Seq.empty[(Long, Long, Long)].toDF("seq_id", "position", "token_id"),
      "seq_id", buckets)
    mk(prefix + TailTable, Seq.empty[(Long, Long)].toDF("k", "n_sym"), "k", 1)
  }

  def drop(spark: SparkSession, prefix: String = ""): Unit =
    Seq(TokensTable, TailTable)
      .foreach(t => BucketedUpsert.drop(spark, prefix + t))

  /** The persisted global symbol count — the next batch's base offset. */
  def tail(spark: SparkSession, prefix: String = ""): Long =
    BucketedUpsert.read(spark, prefix + TailTable)
      .agg(coalesce(sum(col("n_sym")), lit(0L))).head().getLong(0)

  /** Append one micro-batch of `[doc_id, text]` documents to the
    * packed stream. O(batch) everywhere: batch-scoped encode, batch-
    * scoped two-phase offsets, and a bucketed append that rewrites
    * only the touched sequence buckets. */
  def upsertBatch(spark: SparkSession, batch: DataFrame,
                  merges: Seq[Bpe.Merge], vocab: DataFrame,
                  prefix: String = "", buckets: Int = DefaultBuckets,
                  batchId: Option[Long] = None): Unit = {
    val (ws, nVocab) = PackingQueries.encodeWords(spark, batch, merges)
    // freeze the batch's symbol stream: it feeds BOTH the token rows
    // and the tail bump, and the offsets must be the same in each
    val sst = PackingQueries.symbolStream(batch, ws, nVocab).localCheckpoint()
    val base = tail(spark, prefix)
    val cap = PackingQueries.SeqCap
    // frozen-vocab miss → UNK (PackingQueries.UnkTokenId): the symbol
    // consumed its offset, and a training loader needs a row there,
    // not a hole — the same contract as the batch twin
    val toks = sst.join(broadcast(vocab), Seq("sym"), "left_outer")
      .select(expr(s"(off + $base) div $cap").as("seq_id"),
        ((col("off") + base) % cap).as("position"),
        coalesce(col("token_id"), lit(PackingQueries.UnkTokenId)).as("token_id"))
    BucketedUpsert.upsert(spark, prefix + TokensTable, toks,
      Seq("seq_id", "position"), "seq_id", buckets, batchId = batchId)
    // tail advances by ALL encoded symbols — with the UNK mapping
    // that now equals the emitted rows, but the max-offset form stays
    // the authoritative definition (offsets consumed, not rows kept)
    val nSyms = sst.agg(coalesce(max(col("off")), lit(-1L)))
      .head().getLong(0) + 1L
    import spark.implicits._
    BucketedUpsert.upsert(spark, prefix + TailTable,
      Seq((0L, nSyms)).toDF("k", "n_sym"),
      Seq("k"), "k", 1, merge = additive, batchId = batchId)
  }

  /** Streaming sink: `docs.writeStream` → incremental packed-stream
    * appends against the frozen tokenizer artifact. Run with a
    * checkpointLocation so batch ids are monotone across restarts. */
  def writer(docs: DataFrame, merges: Seq[Bpe.Merge], vocab: DataFrame,
             prefix: String = "",
             buckets: Int = DefaultBuckets): DataStreamWriter[Row] =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        upsertBatch(batch.sparkSession, batch, merges, vocab,
          prefix, buckets, Some(id))
      }

  /** The accumulated packed stream `(seq_id, position, token_id)` —
    * what a training job's data loader reads (a loader wanting shard
    * files exports this through CorpusWriter, as the batch frame
    * does in CorpusWriterSpec). */
  def read(spark: SparkSession, prefix: String = ""): DataFrame =
    BucketedUpsert.read(spark, prefix + TokensTable)
      .select(col("seq_id"), col("position"), col("token_id"))
}
