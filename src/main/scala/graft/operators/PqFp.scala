package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-point product quantization, shared by the per-query
  * `embed_ann_pq_fp` plan and the persisted-index path
  * ([[graft.sources.IvfIndexStore]] codebooks/codes tables) — ONE
  * definition of quantize/train/encode/ADC, so the two are
  * bit-identical by construction and share one DuckDB oracle.
  *
  * The recipe (see embed_ann_pq_fp's scaladoc for the full argument):
  * vectors quantize to floor(x·2^20) (exponent shift, no rounding
  * ambiguity); the subspace is a KEY COLUMN (explode M ids, slice
  * Dsub dims each) so one k-means pass trains all M codebooks
  * together; training is integer seed centroids + one Lloyd round of
  * order-free integer sums and truncating division; assignment and
  * ADC rank on the native integer L2
  * ([[graft.functions.expressions.L2DistanceFp]]) with pid/vec_id
  * tie-breaks. Every step is bit-deterministic under any partitioning.
  */
object PqFp {

  /** Fixed-point scale 2^20 — an exponent shift on IEEE doubles. */
  val Scale: Long = 1L << 20
  /** Subspace count (M) and dims per subspace (Dsub): M·Dsub = 64. */
  val M = 4
  val Dsub = 16

  private def l2(a: Column, b: Column): Column =
    graft.functions.expressions.L2DistanceFp(a, b)

  /** `(vec_id, q)`: fixed-point quantization of `(vec_id, emb)`. */
  def quantize(vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id"),
      transform(col("emb"), x => floor(x * Scale).cast("long")).as("q"))

  /** `(vec_id, s, sq)`: the M×Dsub subvector explosion of a quantized
    * frame. */
  def subvectors(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("q"),
      explode(sequence(lit(0), lit(M - 1))).as("s"))
      .withColumn("sq", expr(s"slice(q, s * $Dsub + 1, $Dsub)"))
      .select(col("vec_id"), col("s"), col("sq"))

  /** Nearest-centroid assignment per (vec, subspace) against a
    * codebook frame `(s, pid, cq)` — broadcast-bounded by the
    * codebook size, integer L2, pid tie-break. */
  def assign(sub: DataFrame, cent: DataFrame): DataFrame =
    sub.join(broadcast(cent), Seq("s"))
      .withColumn("d", l2(col("sq"), col("cq")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"), col("s"))
          .orderBy(col("d"), col("pid"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("s"), col("sq"), col("pid"))

  /** Deterministic seed codebooks: the subvectors of vec_id < 16. */
  def defaultSeeds(sub: DataFrame): DataFrame =
    sub.filter(col("vec_id") < 16)
      .select(col("s"), col("vec_id").as("pid"), col("sq").as("cq"))

  /** One integer Lloyd round from `seeds`: assign, then per-centroid
    * order-free integer sums with truncating division. Returns the
    * trained codebooks `(s, pid, cq)`. */
  def trainCodebooks(sub: DataFrame, seeds: DataFrame): DataFrame =
    assign(sub, seeds)
      .select(col("s"), col("pid"), posexplode(col("sq")).as(Seq("i", "v")))
      .groupBy(col("s"), col("pid"), col("i"))
      .agg(expr("sum(v) div count(1)").as("cv"))
      .groupBy(col("s"), col("pid"))
      .agg(transform(
        array_sort(collect_list(struct(col("i"), col("cv")))),
        f => f.getField("cv")).as("cq"))

  /** The query-side ADC lookup table: per (query, subspace, centroid)
    * integer distance — M·|codebook| rows per query. `qsub` is
    * `(query_id, s, sq)`. */
  def lut(qsub: DataFrame, cent: DataFrame): DataFrame =
    qsub.join(broadcast(cent), Seq("s"))
      .withColumn("d", l2(col("sq"), col("cq")))
      .select(col("query_id"), col("s"), col("pid"), col("d"))

  /** ADC shortlist: join candidate codes `(vec_id, s, pid)` to the LUT
    * on (s, pid), sum the M per-subspace distances (pure integer
    * adds), keep the `rerank` closest per query. */
  def adcShortlist(codes: DataFrame, lutDf: DataFrame, rerank: Int): DataFrame =
    codes.join(lutDf, Seq("s", "pid"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("d")).as("adc"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("adc"), col("vec_id"))))
      .filter(col("rn") <= rerank)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))

  /** Exact integer re-rank of a shortlist against the full quantized
    * vectors `e = (vec_id, q)` (the +R of ADC+R). */
  def rerankTopK(short: DataFrame, e: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d_fp"), col("neighbor_id"))
    short
      .join(e.select(col("vec_id").as("query_id"), col("q").as("qq")),
        Seq("query_id"))
      .join(e.select(col("vec_id").as("neighbor_id"), col("q")),
        Seq("neighbor_id"))
      .withColumn("d_fp", l2(col("qq"), col("q")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("d_fp"))
  }
}
